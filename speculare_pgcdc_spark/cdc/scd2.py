"""SCD2 incremental maintenance — the streaming twin of q281's batch
build (queries/downstream.py), closing the CDC-consumer loop the same
way the q279 parity test closed T4's: the versioned dimension a
change-history consumer maintains incrementally, batch by batch, must
equal the one-shot batch build over the full history.

The reference engine forwards changes (src/cdc/replication.rs:169-204)
and leaves materialization to its consumers; this module IS that
consumer for the SCD2 shape.

Contract: change batches arrive in per-key event order (valid_from
non-decreasing per key across batches — CDC commit order guarantees
this for transactional sources). Each batch:

1. ranks its own rows per key (the batch may carry several versions
   of one key);
2. pulls the key's CURRENT OPEN version from state and re-chains
   valid_to with one lead() over (open row ∪ batch rows) per key —
   the open row closes at the first new valid_from, the last new row
   stays open (valid_to NULL);
3. merges: untouched state rows pass through, touched keys' open
   rows are replaced by the re-chained slice.

Scale shape per batch: ONE key-partitioned window over (touched open
rows + batch) + one left-anti merge against state — both keyed on the
dimension key. At warehouse scale the merge is the standard MERGE
INTO / bucket-overwrite (state bucketed by key, only touched buckets
rewritten); the test-sized driver here rewrites one parquet dir,
which changes durability mechanics, not the per-batch plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: SCD2 state schema (q281's output shape)
STATE_COLS = [
    "o_custkey", "version", "valid_from", "valid_to", "status",
    "price_e2",
]


def scd2_batch_rows(batch: DataFrame) -> DataFrame:
    """Normalize a raw change batch (orders-shaped) to version rows."""
    return batch.select(
        "o_custkey",
        F.col("o_orderdate").alias("valid_from"),
        F.col("o_orderstatus").alias("status"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint")
        .alias("price_e2"),
        F.col("o_orderkey").alias("_tie"),
    )


def scd2_apply(state: DataFrame | None, batch: DataFrame) -> DataFrame:
    """Merge one change batch into the SCD2 state; returns new state.

    ``state`` is None (or empty) on the first batch. ``batch`` is
    orders-shaped raw changes. Per-key ordering inside the batch is
    (valid_from, o_orderkey) — q281's total order.
    """
    rows = scd2_batch_rows(batch)
    w_in = Window.partitionBy("o_custkey").orderBy("valid_from", "_tie")
    new = rows.withColumn(
        "_rn", F.row_number().over(w_in).cast("bigint")
    )
    if state is None:
        base = None
    else:
        touched = new.select("o_custkey").distinct()
        base = state.filter(F.col("valid_to").isNull()).join(
            touched, "o_custkey", "left_semi"
        )
    if base is not None:
        # the open version re-enters the chain as rank 0 so ONE lead()
        # re-chains it together with the batch's new versions
        opens = base.select(
            "o_custkey",
            F.col("version").alias("_base_v"),
            "valid_from",
            "status",
            "price_e2",
            F.lit(0).cast("bigint").alias("_rn"),
        )
        base_v = opens.select("o_custkey", "_base_v")
        chain = (
            new.join(F.broadcast(base_v), "o_custkey", "left")
            .select(
                "o_custkey",
                F.coalesce(F.col("_base_v"), F.lit(0)).alias("_base_v"),
                "valid_from",
                "status",
                "price_e2",
                "_rn",
            )
            .unionByName(
                opens.select(
                    "o_custkey",
                    F.col("_base_v"),
                    "valid_from",
                    "status",
                    "price_e2",
                    "_rn",
                )
            )
        )
    else:
        chain = new.select(
            "o_custkey",
            F.lit(0).cast("bigint").alias("_base_v"),
            "valid_from",
            "status",
            "price_e2",
            "_rn",
        )
    w_chain = Window.partitionBy("o_custkey").orderBy("_rn")
    updated = chain.select(
        "o_custkey",
        (F.col("_base_v") + F.col("_rn")).alias("version"),
        "valid_from",
        F.lead("valid_from").over(w_chain).alias("valid_to"),
        "status",
        "price_e2",
    )
    if state is None:
        return updated.select(*STATE_COLS)
    untouched = state.join(
        updated.select("o_custkey").distinct(), "o_custkey", "left_anti"
    )
    closed_kept = state.filter(F.col("valid_to").isNotNull()).join(
        updated.select("o_custkey").distinct(), "o_custkey", "left_semi"
    )
    return (
        untouched.unionByName(closed_kept)
        .unionByName(updated)
        .select(*STATE_COLS)
    )
