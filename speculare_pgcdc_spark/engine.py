"""User-facing engine facade — the one-stop surface a user of the
reference service would switch to.

Maps the reference's three entry points (SURVEY §3) onto the engine:

- EP1 client subscription  -> :meth:`Engine.subscribe` (DSL string ->
  validated standing subscription; same error semantics as the
  reference's HTTP 400s, raised as :class:`dsl.DslError`)
- EP2 CDC ingestion        -> :meth:`Engine.watch` (change feed ->
  routed fan-out StreamingQuery with checkpointed offsets)
- EP3 change dispatch      -> the routed plan inside ``watch``; its
  batch twin is :meth:`Engine.route_batch` (oracle-testable)

plus the general analytics surface the routing layer is a special case
of: :meth:`table` / :meth:`sql` / :meth:`query`.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from speculare_pgcdc_spark.catalog import TABLES, register_views, table
from speculare_pgcdc_spark.cdc.pipeline import (
    normalize_hypertables,
    parse_wal2json,
    route,
    subscriptions_df,
)
from speculare_pgcdc_spark.dsl import WatchFor, parse_ws_query
from speculare_pgcdc_spark.queries import load_all
from speculare_pgcdc_spark.session import get_spark
from speculare_pgcdc_spark.streaming.fanout import (
    idempotent_outbox_deliver,
    outbox_deliver,
    start_fanout_query,
)
from speculare_pgcdc_spark.streaming.source import file_change_feed


class Engine:
    """A SparkSession + fixture catalog + subscription registry.

    >>> eng = Engine(sf_dir="/root/testdata/sf0.01")
    >>> eng.sql("SELECT COUNT(*) n FROM lineitem").show()
    >>> eng.subscribe(1, "insert,update:events_a:event_type.eq.click")
    >>> q = eng.watch(feed_dir, out_dir, ckpt_dir)   # streaming fan-out
    """

    def __init__(
        self,
        spark: Optional[SparkSession] = None,
        sf_dir: str = "/root/testdata/sf0.01",
        tables: Optional[list[str]] = None,
    ) -> None:
        self.spark = spark or get_spark()
        self.sf_dir = sf_dir
        #: catalog the subscriptions validate against (detect_tables
        #: analog — reference loads it once at startup, cdc/mod.rs:30-47)
        self.tables = list(tables) if tables is not None else list(TABLES)
        self._subs: dict[int, str] = {}  # sub_id -> DSL
        self._views_registered = False

    # -- batch analytics surface -------------------------------------

    def table(self, name: str) -> DataFrame:
        return table(self.spark, self.sf_dir, name)

    def sql(self, query: str) -> DataFrame:
        if not self._views_registered:
            register_views(self.spark, self.sf_dir)
            self._views_registered = True
        return self.spark.sql(query)

    def query(self, name: str) -> DataFrame:
        """Run a registered operator query (SURVEY §2B/§2D) by name."""
        return load_all()[name].fn(self.spark, self.sf_dir)

    # -- subscription registry (EP1, R17 analog) ----------------------

    def subscribe(
        self,
        sub_id: int,
        dsl_query: str,
        auth=None,
        authorizer=None,
    ) -> WatchFor:
        """Validate + register a standing subscription. Raises DslError
        exactly where the reference returns HTTP 400 (query.rs:27-49);
        when ``auth`` (cdc.auth.AuthInfo) and ``authorizer``
        (cdc.auth.SubscriptionAuthorizer) are supplied, applies the
        reference's restrict_auth gate (403 analog) before
        registering.

        A subscription registered (or removed) while a watch()/
        watch_db() query is running takes effect on that query's NEXT
        microbatch — the routing side is re-read from this registry at
        the top of every batch (the reference's live-forwarder
        semantics: new WebSocket subscriptions apply immediately,
        api/ws_handler.rs:79-143; pinned in tests/test_streaming.py::
        test_subscription_applies_mid_stream)."""
        watch = parse_ws_query(dsl_query, self.tables)
        if auth is not None:
            if authorizer is None:
                raise ValueError("auth requires an authorizer")
            authorizer.restrict(auth, watch)
        self._subs[sub_id] = dsl_query
        return watch

    def unsubscribe(self, sub_id: int) -> None:
        self._subs.pop(sub_id, None)

    def subscriptions(self) -> DataFrame:
        """The registry as the broadcast static side of the routing
        join (ServerState analog, ws_utils.rs:23-29)."""
        return subscriptions_df(
            self.spark, list(self._subs.items()), self.tables
        )

    # -- CDC dispatch (EP2 + EP3) --------------------------------------

    def _changes(
        self,
        payloads: DataFrame,
        lookup: Optional[DataFrame],
        seq_col: Optional[str] = None,
    ):
        changes = parse_wal2json(payloads, seq_col=seq_col)
        if lookup is not None:
            changes = normalize_hypertables(changes, lookup)
        else:
            changes = changes.withColumnRenamed("table", "table_name")
        if changes.isStreaming:
            # forwarder-loop observability: every watch query reports
            # per-microbatch change volume / kind mix / WAL bounds in
            # its progress (streaming/metrics.py) — the aggregates
            # ride the batch's execution, no extra pass over the feed
            from speculare_pgcdc_spark.streaming.metrics import (
                observe_changes,
            )

            changes = observe_changes(changes)
        return changes

    def route_batch(
        self,
        payloads: DataFrame,
        lookup: Optional[DataFrame] = None,
    ) -> DataFrame:
        """Batch twin of the dispatch path: one row per (subscriber,
        matching change). Oracle-checked via q35/q36."""
        return route(self._changes(payloads, lookup), self.subscriptions())

    def watch(
        self,
        feed_dir: str,
        out_dir: str,
        checkpoint_dir: str,
        lookup: Optional[DataFrame] = None,
        deliver: Optional[Callable] = None,
        max_files_per_trigger: int = 1,
        exactly_once: bool = False,
        available_now: bool = False,
        mode: str = "auto",
    ):
        """Start the streaming fan-out (EP2->EP3): change feed ->
        parse -> normalize -> route -> per-subscriber delivery, with
        at-least-once offsets in ``checkpoint_dir`` (LSN-ack analog).

        Subscription semantics are LIVE: the registry is re-read at
        the top of every microbatch, so subscribe()/unsubscribe()
        while the query runs applies on the next batch — matching the
        reference's immediate WebSocket-subscription application
        (api/ws_handler.rs:79-143; pinned in tests/test_streaming.py::
        test_subscription_applies_mid_stream).

        The file feed carries no WAL position, so per-subscriber
        payload order is per-message only (chg_idx); watch_db's lsn
        gives full per-batch WAL order."""
        stream = self._changes(
            file_change_feed(self.spark, feed_dir, max_files_per_trigger),
            lookup,
        )
        return start_fanout_query(
            stream,
            self.subscriptions,
            deliver
            or (
                idempotent_outbox_deliver(out_dir)
                if exactly_once
                else outbox_deliver(out_dir)
            ),
            checkpoint_dir,
            available_now=available_now,
            mode=mode,
        )

    def watch_db(
        self,
        db_path: str,
        out_dir: str,
        checkpoint_dir: str,
        lookup: Optional[DataFrame] = None,
        deliver: Optional[Callable] = None,
        exactly_once: bool = False,
        available_now: bool = False,
        mode: str = "auto",
    ):
        """Like :meth:`watch`, but the feed is a database polled with a
        monotonic LSN cursor (streaming.wal_source — the R1-R7
        replication-connection analog with acked offsets). ``db_path``
        is either a SQLite file (the harness backend) or a
        ``jdbc:postgresql://`` URL (the production backend — same
        cursor/ack protocol over psycopg). The lsn is carried through
        parse as the ``seq`` order key, so each subscriber's outbox is
        in WAL order within every microbatch (the reference's
        ordered-channel contract, forwarder/mod.rs:44). Subscription
        changes apply live per microbatch, as in :meth:`watch`."""
        from speculare_pgcdc_spark.streaming import wal_source

        wal_source.register(self.spark)
        opt = "url" if db_path.startswith("jdbc:") else "path"
        src = (
            self.spark.readStream.format("wal_poll")
            .option(opt, db_path)
            .load()
            .select("lsn", "payload")
        )
        return start_fanout_query(
            self._changes(src, lookup, seq_col="lsn"),
            self.subscriptions,
            deliver
            or (
                idempotent_outbox_deliver(out_dir)
                if exactly_once
                else outbox_deliver(out_dir)
            ),
            checkpoint_dir,
            available_now=available_now,
            mode=mode,
        )

    def watch_snapshot(
        self,
        feed_dir: str,
        snapshot_dir: str,
        checkpoint_dir: str,
        key_col: str,
        columns: dict,
        lookup: Optional[DataFrame] = None,
        tables: Optional[list] = None,
        max_files_per_trigger: int = 1,
        available_now: bool = False,
    ):
        """Maintain a queryable parquet snapshot from the change feed
        (cdc/apply.start_apply_query behind the facade) — the
        reference-consumer shape one step past fan-out: every real
        deployment's next stop after receiving changes is applying
        them somewhere queryable."""
        from speculare_pgcdc_spark.cdc.apply import start_apply_query
        from speculare_pgcdc_spark.streaming.source import (
            file_change_feed,
        )

        src = file_change_feed(
            self.spark, feed_dir,
            max_files_per_trigger=max_files_per_trigger,
        )
        return start_apply_query(
            self._changes(src, lookup), snapshot_dir, checkpoint_dir,
            key_col, columns, tables=tables,
            available_now=available_now,
        )

    def watch_matview(
        self,
        feed_dir: str,
        snapshot_dir: str,
        matview_dir: str,
        checkpoint_dir: str,
        key_col: str,
        columns: dict,
        group_col: str,
        agg_cols_fn: Callable,
        lookup: Optional[DataFrame] = None,
        tables: Optional[list] = None,
        max_files_per_trigger: int = 1,
        available_now: bool = False,
    ):
        """Maintain snapshot + incrementally-refreshed aggregate view
        from the change feed (cdc/apply.start_matview_query behind the
        facade — the q97 IVM consumer as a one-call streaming query)."""
        from speculare_pgcdc_spark.cdc.apply import start_matview_query
        from speculare_pgcdc_spark.streaming.source import (
            file_change_feed,
        )

        src = file_change_feed(
            self.spark, feed_dir,
            max_files_per_trigger=max_files_per_trigger,
        )
        return start_matview_query(
            self._changes(src, lookup), snapshot_dir, matview_dir,
            checkpoint_dir, key_col, columns, group_col, agg_cols_fn,
            tables=tables, available_now=available_now,
        )
