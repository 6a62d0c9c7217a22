"""Apply a parsed change feed to a base snapshot — the canonical
DOWNSTREAM consumer of the reference's change stream (speculare-pgcdc
stops at fan-out; every real deployment's next step is maintaining a
queryable copy: upsert inserts/updates, drop deletes).

Input is the normalized CHANGE_COLUMNS frame (cdc.pipeline). The key of
an insert/update comes from its row map; a delete carries no columns
(wal2json v1 ``oldkeys`` / v2 ``identity`` — the §2A quirk), so its key
is extracted from the raw payload (``change_json``), which both parse
branches preserve verbatim.

Scale shape: latest-change-per-key is ONE hash aggregation
(max_by over the (seq, chg_idx) WAL order — no window, no sort), the
merge is one equi-join on the key. With the base bucketed by key
(sources.write_bucketed) the join side is co-located and the whole
apply is a single shuffle of the (small) change batch. The snapshot
OVERWRITE in :func:`start_apply_query` is the local-parquet stand-in
for a real table format's row-level MERGE (Delta/Iceberg) — the apply
PLAN is the part that carries over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _change_key(key_col: str):
    """The change's key as a string: row map for inserts/updates,
    oldkeys (v1) / identity (v2) from the raw payload for deletes.

    The delete key is located BY NAME in oldkeys.keynames / the
    identity entries — never positionally: a composite or reordered
    REPLICA IDENTITY (e.g. (tenant_id, event_id)) puts key_col at an
    arbitrary index, and taking [0] would silently delete the wrong
    row. Values go through variant 'array<string>' coercion, the same
    lenient typed-cell rule the v1/v2 parse uses for columnvalues."""
    names = F.expr(
        "variant_get(try_parse_json(change_json), "
        "'$.oldkeys.keynames', 'array<string>')"
    )
    vals = F.expr(
        "variant_get(try_parse_json(change_json), "
        "'$.oldkeys.keyvalues', 'array<string>')"
    )
    pos = F.array_position(names, key_col)
    v1_del = F.when(pos > 0, F.try_element_at(vals, pos.cast("int")))
    idn = F.expr(
        "variant_get(try_parse_json(change_json), '$.identity', "
        "'array<struct<name:string,value:string>>')"
    )
    v2_del = F.try_element_at(
        F.filter(idn, lambda x: x["name"] == F.lit(key_col)), F.lit(1)
    )["value"]
    return F.coalesce(
        F.try_element_at("row_str", F.lit(key_col)), v1_del, v2_del
    )


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_col: str,
    columns: dict[str, str],
    tables: list[str] | None = None,
) -> DataFrame:
    """Merge a change batch into ``base``: the snapshot after applying,
    per key, the LATEST change in WAL order (seq, chg_idx) — upserts
    replace the row, deletes remove it, untouched keys pass through.

    ``columns`` maps output column name -> cast type; the result (and
    the base projection) has exactly ``key_col`` + these columns, in
    that order. ``tables`` restricts which normalized table_names apply
    (None = all). Assumes one logical key space across the applied
    tables (the hypertable-chunk case: all chunks of one table).
    """
    ordered = [key_col, *[c for c in columns if c != key_col]]
    rel = changes if tables is None else changes.filter(
        F.col("table_name").isin(tables)
    )
    key_t = columns.get(key_col, "string")
    keyed = rel.select(
        _change_key(key_col).cast(key_t).alias(key_col),
        F.struct("seq", "chg_idx").alias("_ord"),
        F.struct("kind", "row_str").alias("_chg"),
    ).filter(F.col(key_col).isNotNull())
    # latest feeds BOTH the upsert projection and the survivors
    # anti-join; without a checkpoint each consumer re-runs the whole
    # feed-parse lineage (the expensive part), doubling the parse
    # volume. The checkpointed frame is bounded by the batch's key
    # count, not the snapshot.
    latest = keyed.groupBy(key_col).agg(
        F.max_by("_chg", "_ord").alias("_chg")
    ).localCheckpoint(eager=False)
    upserts = latest.filter(F.col("_chg.kind") != "delete").select(
        F.col(key_col),
        *[
            F.try_element_at("_chg.row_str", F.lit(c))
            .cast(t)
            .alias(c)
            for c, t in columns.items()
            if c != key_col
        ],
    )
    survivors = base.select(
        *[F.col(c).cast(columns.get(c, "string")).alias(c) for c in ordered]
    ).join(latest.select(key_col), key_col, "left_anti")
    return survivors.unionByName(upserts)


def touched_groups(
    old_snapshot: DataFrame,
    changes: DataFrame,
    key_col: str,
    group_col: str,
    key_type: str = "bigint",
    tables: list[str] | None = None,
) -> DataFrame:
    """Distinct group values a change batch can affect: the OLD group
    of every changed key (updates/deletes pull their group from the
    pre-apply snapshot — wal2json deletes carry no columns) plus the
    NEW group of every upsert. One column (``group_col``), distinct.
    Bounded by the batch size, never by the snapshot."""
    rel = changes if tables is None else changes.filter(
        F.col("table_name").isin(tables)
    )
    keyed = rel.select(
        _change_key(key_col).cast(key_type).alias(key_col),
        F.try_element_at("row_str", F.lit(group_col)).alias("_new_g"),
        "kind",
    ).filter(F.col(key_col).isNotNull())
    old_side = (
        old_snapshot.select(key_col, group_col)
        .join(keyed.select(key_col).distinct(), key_col)
        .select(group_col)
    )
    new_side = keyed.filter(F.col("kind") != "delete").select(
        F.col("_new_g").cast(
            dict(old_snapshot.select(group_col).dtypes)[group_col]
        ).alias(group_col)
    )
    return old_side.unionByName(new_side).distinct()


def refresh_aggregates(
    matview: DataFrame,
    new_snapshot: DataFrame,
    groups: DataFrame,
    group_col: str,
    agg_cols: list,
) -> DataFrame:
    """Incremental materialized-view maintenance (IVM): re-aggregate
    ONLY the groups a batch touched, carry every other matview row
    forward untouched. ``groups`` is the one-column frame from
    :func:`touched_groups`; ``agg_cols`` the aliased aggregate
    expressions (the view definition).

    Why partial recompute instead of +/- deltas: wal2json deletes (and
    update-old-images) carry no value columns without REPLICA IDENTITY
    FULL, so subtractive maintenance has nothing to subtract — but the
    touched GROUPS are always derivable (old group via key join, new
    group from the upsert row). Cost is O(batch) + a scan of the
    touched groups' slice of the snapshot — with the snapshot
    partitioned/bucketed by group that slice is partition-pruned; the
    broadcast semi/anti joins never shuffle the snapshot or the view.
    A group whose last row was deleted drops out of both sides, i.e.
    the view row disappears, matching a full recompute."""
    g = F.broadcast(groups)
    recomputed = (
        new_snapshot.join(g, group_col, "left_semi")
        .groupBy(group_col)
        .agg(*agg_cols)
    )
    kept = matview.join(g, group_col, "left_anti")
    return kept.unionByName(recomputed)


def start_apply_query(
    changes_stream: DataFrame,
    snapshot_dir: str,
    checkpoint_dir: str,
    key_col: str,
    columns: dict[str, str],
    tables: list[str] | None = None,
    query_name: str = "cdc-apply",
    available_now: bool = False,
):
    """Maintain a parquet snapshot from the live change stream: each
    microbatch reads the current snapshot, applies the batch
    (:func:`apply_changes`), and atomically replaces it — the
    materialized-table consumer of watch()'s dataflow. foreachBatch +
    checkpointed offsets give at-least-once application; apply is
    idempotent per batch (latest-change-per-key), so replays converge.

    The full-overwrite is correct-but-local: a durable deployment
    swaps this writer for a table format with row-level merge; the
    upstream plan is unchanged."""
    import os
    import shutil

    spark = changes_stream.sparkSession
    ordered = [key_col, *[c for c in columns if c != key_col]]

    old = f"{snapshot_dir}.old"

    def recover() -> None:
        # crash between the two renames leaves only .old (no live
        # snapshot): restore it — the checkpoint replays the batch and
        # apply is idempotent, so converging from the pre-batch state
        # is correct. A crash AFTER the swap leaves both: the stale
        # .old is garbage. Leftover .tmp dirs are incomplete writes.
        if not os.path.exists(snapshot_dir) and os.path.exists(old):
            os.rename(old, snapshot_dir)
        elif os.path.exists(old):
            shutil.rmtree(old)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        recover()
        base = spark.read.parquet(snapshot_dir)
        out = apply_changes(base, batch_df, key_col, columns, tables)
        tmp = f"{snapshot_dir}.b{batch_id}.tmp"
        out.select(*ordered).write.mode("overwrite").parquet(tmp)
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(snapshot_dir, old)
        os.rename(tmp, snapshot_dir)
        shutil.rmtree(old)

    writer = (
        changes_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_matview_query(
    changes_stream: DataFrame,
    snapshot_dir: str,
    matview_dir: str,
    checkpoint_dir: str,
    key_col: str,
    columns: dict[str, str],
    group_col: str,
    agg_cols_fn,
    tables: list[str] | None = None,
    query_name: str = "cdc-matview",
    available_now: bool = False,
):
    """Maintain a parquet snapshot AND an incrementally-refreshed
    aggregate view from the live change stream — the streaming twin of
    q97's batch IVM (touched_groups + refresh_aggregates per
    microbatch, only touched groups recomputed, every other view row
    carried forward).

    ``agg_cols_fn`` is a zero-arg callable returning the aliased
    aggregate expressions (Column objects aren't reusable across
    microbatch plans, so the view definition is re-built per batch).

    Recovery doctrine matches :func:`start_apply_query`: checkpointed
    offsets give at-least-once batch delivery; apply is idempotent and
    the view refresh recomputes from the post-apply snapshot, so a
    replayed batch converges both artifacts. The snapshot swaps first,
    the view second — a crash between the swaps leaves a stale view
    whose touched groups are exactly the replayed batch's groups, so
    the replay re-syncs it.
    """
    import os
    import shutil

    spark = changes_stream.sparkSession
    ordered = [key_col, *[c for c in columns if c != key_col]]

    def _recover(d: str) -> None:
        old = f"{d}.old"
        if not os.path.exists(d) and os.path.exists(old):
            os.rename(old, d)
        elif os.path.exists(old):
            shutil.rmtree(old)

    def _commit(d: str, batch_id: int) -> None:
        old = f"{d}.old"
        tmp = f"{d}.b{batch_id}.tmp"
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(d, old)
        os.rename(tmp, d)
        shutil.rmtree(old)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        _recover(snapshot_dir)
        _recover(matview_dir)
        base = spark.read.parquet(snapshot_dir)
        mv_old = spark.read.parquet(matview_dir)
        new_snapshot = apply_changes(
            base, batch_df, key_col, columns, tables
        ).localCheckpoint(eager=True)
        groups = touched_groups(
            base, batch_df, key_col, group_col, tables=tables
        )
        mv_new = refresh_aggregates(
            mv_old, new_snapshot, groups, group_col, agg_cols_fn()
        )
        # BOTH tmp writes land before either directory swaps — the
        # view plan reads the PRE-swap snapshot (touched_groups'
        # old-group join) and the pre-swap view, so swapping the
        # snapshot first would pull files out from under a lazy scan
        new_snapshot.select(*ordered).write.mode("overwrite").parquet(
            f"{snapshot_dir}.b{batch_id}.tmp"
        )
        mv_new.select(*mv_old.columns).write.mode("overwrite").parquet(
            f"{matview_dir}.b{batch_id}.tmp"
        )
        _commit(snapshot_dir, batch_id)
        _commit(matview_dir, batch_id)

    writer = (
        changes_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
