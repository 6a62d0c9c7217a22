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

import json
import os
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: rows handed to a delivery adapter: (sub_id, change_json)
Delivery = Callable[[int, list[str]], None]


def fanout_batch(
    routed: DataFrame, deliver: Delivery
) -> None:
    """Group one (already-routed) microbatch by subscriber and deliver.

    The groupBy happens in Spark (one small shuffle over the batch);
    only the per-subscriber payload lists cross to the driver — mirroring
    the reference where the forwarder thread hands lists to per-client
    writer tasks. For very large fan-outs, swap the driver-side loop for
    a foreachPartition writer (adapter unchanged).
    """
    grouped = (
        routed.groupBy("sub_id")
        .agg(F.collect_list("change_json").alias("payloads"))
        .collect()
    )
    for row in grouped:
        deliver(row["sub_id"], row["payloads"])


def outbox_deliver(out_dir: str) -> Delivery:
    """File-outbox adapter: append JSON-lines under <out_dir>/<sub_id>/."""

    def deliver(sub_id: int, payloads: list[str]) -> None:
        d = os.path.join(out_dir, str(sub_id))
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "outbox.jsonl"), "a") as f:
            for p in payloads:
                f.write(p.rstrip("\n") + "\n")

    return deliver


def start_fanout_query(
    changes_stream: DataFrame,
    subscriptions: DataFrame,
    deliver: Delivery,
    checkpoint_dir: str,
    query_name: str = "cdc-fanout",
):
    """Wire the full streaming EP3: parse/normalize is upstream; here the
    stream-static routing join + foreachBatch fan-out, checkpointed."""
    from speculare_pgcdc_spark.cdc.pipeline import route

    def process(batch_df: DataFrame, batch_id: int) -> None:
        routed = route(batch_df, subscriptions)
        fanout_batch(routed, deliver)

    return (
        changes_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )


def to_payload_json(sub_id_col, change_json_col) -> str:
    """Canonical delivered-message shape (what the reference sends as
    WS text: the change object itself)."""
    return json.dumps({"sub_id": sub_id_col, "change": change_json_col})
