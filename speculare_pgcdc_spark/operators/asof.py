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
) -> DataFrame:
    """Latest-right-at-or-before-left join.

    group_cols must uniquely identify a left row (e.g. its primary key).
    Returns group_cols + value_col (the argmax right value).

    direction='backward': right_time <= left_time (or < when strict).
    direction='forward' : right_time >= left_time (earliest instead).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction}")
    lt, rt = F.col(left_time), F.col(right_time)
    if direction == "backward":
        time_cond = rt < lt if strict else rt <= lt
    else:
        time_cond = rt > lt if strict else rt >= lt
    cond = (F.col(left_key) == F.col(right_key)) & time_cond
    joined = left.join(right, cond, "inner")
    # max_by/min_by with a struct ordering key: hash-aggregable
    # (ObjectHashAggregate — no per-group sort), deterministic because
    # the value itself is the tiebreak inside the ordering struct.
    fn = "max_by" if direction == "backward" else "min_by"
    pick = F.expr(
        f"{fn}(`{value_col}`, struct(`{right_time}`, `{value_col}`))"
    )
    return joined.groupBy(*group_cols).agg(pick.alias(value_col))
