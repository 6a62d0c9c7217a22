"""Per-subscriber fan-out sink (R15 analog: forwarder send_message +
per-client writer tasks, forwarder/mod.rs:44-72, ws_handler.rs:67-73).

The WebSocket transport itself is out of Spark's domain (BASELINE.json);
the engine's contract is: for every microbatch, deliver each routed
change to its subscriber's channel at-least-once. ``foreachBatch``
provides exactly that: offsets commit only after the batch function
returns, so a crash mid-batch redelivers (duplicates possible, loss not)
— the reference's LSN-ack contract.

Delivery adapters are pluggable; the default writes JSON-lines per
subscriber directory (an idempotent, replayable outbox a sidecar
WebSocket server tails). Tests use an in-memory collector.
"""

from __future__ import annotations

import inspect
import os
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: rows handed to a delivery adapter: (sub_id, change_json, batch_id)
Delivery = Callable[..., None]


def _takes_batch(deliver: Delivery) -> bool:
    # two-arg adapters (the original Delivery contract) keep working;
    # only batch-aware adapters receive the batch_id. Decided by
    # signature, not by retrying on TypeError — a retry would re-invoke
    # (and double-deliver through) an adapter that raised for its own
    # reasons.
    try:
        params = inspect.signature(deliver).parameters
        return len(params) >= 3 or any(
            p.kind == inspect.Parameter.VAR_POSITIONAL
            for p in params.values()
        )
    except (TypeError, ValueError):
        return True


#: ordering columns carried through the pipeline (cdc.pipeline
#: parse_wal2json); fan-out sorts each subscriber's payloads on these
#: when present, restoring the reference's per-client WAL order
#: (forwarder/mod.rs:44-72). Order scope: per microbatch.
ORDER_COLUMNS = ("seq", "chg_idx")


def fanout_batch(
    routed: DataFrame, deliver: Delivery, batch_id: int = -1
) -> None:
    """Group one (already-routed) microbatch by subscriber and deliver.

    The groupBy happens in Spark (one small shuffle over the batch);
    only the per-subscriber payload lists cross to the driver — mirroring
    the reference where the forwarder thread hands lists to per-client
    writer tasks. Payload lists are in WAL order (see ORDER_COLUMNS):
    collect_list after a shuffle is nondeterministically ordered, so the
    order key is collected WITH the payload and sort_array re-establishes
    it. For very large fan-outs use :func:`fanout_partitions`.
    """
    order = [c for c in ORDER_COLUMNS if c in routed.columns]
    if order:
        payloads = F.transform(
            F.sort_array(
                F.collect_list(F.struct(*order, "change_json"))
            ),
            lambda s: s.getField("change_json"),
        )
    else:
        payloads = F.collect_list("change_json")
    grouped = (
        routed.groupBy("sub_id").agg(payloads.alias("payloads")).collect()
    )
    takes_batch = _takes_batch(deliver)
    for row in grouped:
        if takes_batch:
            deliver(row["sub_id"], row["payloads"], batch_id)
        else:
            deliver(row["sub_id"], row["payloads"])


def fanout_partitions(
    routed: DataFrame, deliver: Delivery, batch_id: int = -1
) -> None:
    """Executor-side fan-out: no payload ever crosses to the driver.

    ``repartition(sub_id)`` co-locates each subscriber's changes (one
    shuffle, same cost as fanout_batch's groupBy), a within-partition
    sort restores (sub_id, WAL) order, and the delivery adapter runs
    INSIDE ``foreachPartition`` on the executors — ``itertools.groupby``
    over the sorted iterator hands each subscriber its ordered payload
    list without materializing the partition. This is the 100 TB path:
    driver memory is O(1) in fan-out size, and delivery parallelism
    scales with shuffle partitions. Requires a picklable adapter (the
    file-outbox adapters are; each subscriber lands in exactly one
    partition, so adapters never race on a subscriber's outbox).
    """
    order = [c for c in ORDER_COLUMNS if c in routed.columns]
    slim = routed.select("sub_id", *order, "change_json")
    # change_json joins the sort key as the final tiebreak: rows tying
    # on (seq, chg_idx) — e.g. a seq-less file feed where every message
    # gets seq=0 — would otherwise keep nondeterministic shuffle order,
    # and a crash-replay could rewrite an idempotent batch file with a
    # DIFFERENT line order than a consumer already tailed. fanout_batch
    # gets the same guarantee for free from its struct sort_array.
    parted = slim.repartition("sub_id").sortWithinPartitions(
        "sub_id", *order, "change_json"
    )
    takes_batch = _takes_batch(deliver)

    def run(rows) -> None:
        import itertools

        for sub_id, grp in itertools.groupby(
            rows, key=lambda r: r["sub_id"]
        ):
            payloads = [r["change_json"] for r in grp]
            if takes_batch:
                deliver(sub_id, payloads, batch_id)
            else:
                deliver(sub_id, payloads)

    parted.foreachPartition(run)


#: auto mode: a routed microbatch at or below this many rows delivers
#: via the driver (one collect — cheaper than a shuffle-write for small
#: batches and friendly to driver-local adapters); anything larger goes
#: executor-side, where driver memory stays O(1) in fan-out size. At
#: ~1 KB/change this bounds the driver's transient batch footprint to
#: ~100 MB — reference-scale fan-outs stay on the fast path, a 100×
#: burst cannot balloon the driver.
AUTO_DRIVER_MAX_ROWS = 100_000


def fanout_auto(
    routed: DataFrame, deliver: Delivery, batch_id: int = -1
) -> None:
    """Per-batch selection between :func:`fanout_batch` and
    :func:`fanout_partitions` by routed-row count (round-3 verdict:
    a fixed driver default is the wrong one at 100× — the decision
    belongs to the batch, not the query). The batch is persisted so
    the sizing count and the delivery pass share one evaluation of
    the routing join. Adapters must be executor-safe (picklable,
    shared-filesystem) for the large-batch path — the file-outbox
    adapters are."""
    routed = routed.persist()
    try:
        n = routed.count()
        fan = (
            fanout_batch
            if n <= AUTO_DRIVER_MAX_ROWS
            else fanout_partitions
        )
        fan(routed, deliver, batch_id)
    finally:
        routed.unpersist()


def outbox_deliver(out_dir: str) -> Delivery:
    """Append-mode file outbox under <out_dir>/<sub_id>/.

    At-least-once: a crash between delivery and offset commit replays
    the batch and appends duplicates — the reference's exact contract
    (WS push before LSN ack, replication.rs:198-203)."""

    def deliver(sub_id: int, payloads: list[str], batch_id: int = -1) -> None:
        d = os.path.join(out_dir, str(sub_id))
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "outbox.jsonl"), "a") as f:
            for p in payloads:
                f.write(p.rstrip("\n") + "\n")

    return deliver


def idempotent_outbox_deliver(out_dir: str) -> Delivery:
    """Exactly-once file outbox: one file per (subscriber, batch_id),
    written atomically (tmp + rename). Replaying a batch after a crash
    rewrites the same file instead of appending — foreachBatch's
    batch_id is stable across restarts, which upgrades the sink from
    at-least-once to exactly-once with no coordination (the idempotent-
    writer pattern from SURVEY §7's risk register)."""

    def deliver(sub_id: int, payloads: list[str], batch_id: int = -1) -> None:
        import uuid

        d = os.path.join(out_dir, str(sub_id))
        os.makedirs(d, exist_ok=True)
        final = os.path.join(d, f"batch-{batch_id}.jsonl")
        # attempt-unique tmp name: in fanout_partitions mode this runs
        # on executors, where a speculative/zombie duplicate attempt of
        # the same partition would interleave writes into a SHARED
        # fixed tmp path and os.replace could publish a corrupt file;
        # unique tmps make the last os.replace the only visible write
        tmp = f"{final}.{os.getpid()}.{uuid.uuid4().hex}.tmp"
        try:
            with open(tmp, "w") as f:
                for p in payloads:
                    f.write(p.rstrip("\n") + "\n")
            os.replace(tmp, final)
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)

    return deliver


def read_outbox(out_dir: str, sub_id: int) -> list[str]:
    """All delivered payloads for a subscriber, across both adapters'
    layouts, in batch order."""
    d = os.path.join(out_dir, str(sub_id))
    if not os.path.isdir(d):
        return []
    lines: list[str] = []
    def batch_no(n: str) -> int:
        # numeric batch order: lexicographic puts batch-10 before
        # batch-2
        try:
            return int(n.removeprefix("batch-").removesuffix(".jsonl"))
        except ValueError:
            return -1

    names = sorted(
        (n for n in os.listdir(d) if n.endswith(".jsonl")),
        key=lambda n: (n != "outbox.jsonl", batch_no(n)),
    )
    for n in names:
        with open(os.path.join(d, n)) as f:
            lines.extend(ln.rstrip("\n") for ln in f if ln.strip())
    return lines


def start_fanout_query(
    changes_stream: DataFrame,
    subscriptions,
    deliver: Delivery,
    checkpoint_dir: str,
    query_name: str = "cdc-fanout",
    available_now: bool = False,
    mode: str = "auto",
):
    """Wire the full streaming EP3: parse/normalize is upstream; here the
    stream-static routing join + foreachBatch fan-out, checkpointed.

    ``subscriptions`` is either a static DataFrame (registry snapshot,
    fixed for the query's lifetime) or a ZERO-ARG CALLABLE returning
    one — re-evaluated at the top of EVERY microbatch, so subscribe/
    unsubscribe on a live registry applies on the next batch without a
    restart: the reference's live-forwarder semantics (new WebSocket
    subscriptions take effect immediately, api/ws_handler.rs:79-143).
    The frame is registry-sized (broadcast side of the routing join),
    so the per-batch rebuild is a driver-side createDataFrame — noise
    next to the batch itself.

    mode="auto" (default) sizes each microbatch and picks the path:
    small batches funnel per-subscriber payload lists through the
    driver (fanout_batch — fine at reference-scale fan-out, where one
    forwarder thread does the same), batches over
    ``AUTO_DRIVER_MAX_ROWS`` deliver on the executors
    (fanout_partitions — the large-fan-out path; the adapter must be
    picklable and filesystem-shared). mode="driver" / mode="partitions"
    pin one path unconditionally.

    available_now=True runs in drain-and-stop mode (Trigger.AvailableNow):
    process everything committed so far in rate-limited microbatches,
    then terminate — the scheduled-backfill shape; the checkpoint makes
    consecutive drains resume where the last one stopped."""
    from speculare_pgcdc_spark.cdc.pipeline import route

    fans = {
        "auto": fanout_auto,
        "driver": fanout_batch,
        "partitions": fanout_partitions,
    }
    if mode not in fans:
        raise ValueError(f"unknown fan-out mode: {mode!r}")
    fan = fans[mode]

    def process(batch_df: DataFrame, batch_id: int) -> None:
        subs = subscriptions() if callable(subscriptions) else subscriptions
        routed = route(batch_df, subs)
        fan(routed, deliver, batch_id)

    writer = (
        changes_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


