"""As-of join (SURVEY §2B J7): for each left row, the latest right row
whose time is at-or-before the left row's time, matched on an equi key.

Spark has no ASOF JOIN (DuckDB does); the scalable composition is:

    equi-join on key  (+ range residual right_time <= left_time)
    -> hash-aggregate argmax via max(struct(right_time, tiebreak...))

One shuffle per side on the equi key, then a partial+final hash agg on
the left row id — no window sort, no per-key materialized sort. At 100 TB
the join is the cost; AQE handles key skew (skewJoin split) and the
partial aggregation collapses the per-left-row candidate set map-side.

The max(struct(...)) trick is deterministic: struct comparison is
lexicographic, so ties on right_time resolve by the next field(s). Callers
must include a unique tiebreak column (value_col itself if unique).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from speculare_pgcdc_spark.functions import epoch_seconds


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    group_cols: Sequence[str],
    value_col: str,
    direction: str = "backward",
    strict: bool = False,
    tolerance: float | None = None,
) -> DataFrame:
    """Latest-right-at-or-before-left join.

    group_cols must uniquely identify a left row (e.g. its primary key).
    Returns group_cols + value_col (the argmax right value).

    direction='backward': right_time <= left_time (or < when strict).
    direction='forward' : right_time >= left_time (earliest instead).

    tolerance (seconds, pandas merge_asof's knob): additionally bound
    the match's staleness — |left_time - right_time| <= tolerance.
    Left rows whose only candidates are older drop out (join stays
    inner). At scale the tolerance predicate ALSO shrinks the
    candidate set the argmax aggregates over, which is the practical
    fix when keys are dense and the unbounded form materializes huge
    (left x rights-at-or-before) intermediates."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction}")
    lt, rt = F.col(left_time), F.col(right_time)
    if direction == "backward":
        time_cond = rt < lt if strict else rt <= lt
    else:
        time_cond = rt > lt if strict else rt >= lt
    cond = (F.col(left_key) == F.col(right_key)) & time_cond
    if tolerance is not None:
        if tolerance < 0:
            raise ValueError(f"tolerance must be >= 0, got {tolerance}")
        gap = (
            epoch_seconds(lt) - epoch_seconds(rt)
            if direction == "backward"
            else epoch_seconds(rt) - epoch_seconds(lt)
        )
        cond = cond & (gap <= tolerance)
    joined = left.join(right, cond, "inner")
    # max_by/min_by with a struct ordering key: hash-aggregable
    # (ObjectHashAggregate — no per-group sort), deterministic because
    # the value itself is the tiebreak inside the ordering struct.
    fn = "max_by" if direction == "backward" else "min_by"
    pick = F.expr(
        f"{fn}(`{value_col}`, struct(`{right_time}`, `{value_col}`))"
    )
    return joined.groupBy(*group_cols).agg(pick.alias(value_col))


def asof_join_merge(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    group_cols: Sequence[str],
    value_col: str,
    strict: bool = False,
    keep_unmatched: bool = False,
) -> DataFrame:
    """Merge as-of (backward): same semantics as :func:`asof_join`, but
    computed without a join node.

    Both sides are unioned into one frame partitioned by key and sorted
    by (time, side, value); each left row picks the last non-null right
    value in its preceding frame. Cost: ONE shuffle of n_left + n_right
    rows + an in-partition sort — the join form shuffles both sides AND
    materializes every (left, candidate-right) pair first, which blows
    up to n_left x rights-per-key intermediates when keys are dense
    (e.g. few users x many events). This is pandas' merge_asof
    distributed: the plan that survives 100 TB of dense keys.

    Tie semantics match asof_join exactly: at equal right_time the
    largest value wins (the struct-max tiebreak); with strict=True,
    rights at exactly left_time are excluded.
    """
    from pyspark.sql import Window

    vtype = dict(right.dtypes)[value_col]
    left_side, right_side = (0, 1) if strict else (1, 0)
    l_tag = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(left_side).alias("_side"),
        F.lit(None).cast(vtype).alias("_v"),
        *[F.col(c) for c in group_cols],
    )
    ltypes = dict(left.dtypes)
    r_tag = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(right_side).alias("_side"),
        F.col(value_col).alias("_v"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in group_cols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side", "_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    picked = (
        l_tag.unionByName(r_tag)
        .withColumn("_pick", F.last("_v", ignorenulls=True).over(w))
        .filter(F.col("_side") == left_side)
    )
    if not keep_unmatched:
        picked = picked.filter(F.col("_pick").isNotNull())
    return picked.select(
        *group_cols, F.col("_pick").alias(value_col)
    )
