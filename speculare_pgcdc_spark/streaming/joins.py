"""Stream-stream interval join (T-family extension): correlate two
live event streams on a key within a bounded time window — the CDC
consumer that pairs a replica's change stream with a second feed (the
reference forwards one stream per socket, api/ws_handler.rs; joining
two of them is the first thing a downstream consumer builds).

Spark's stream-stream inner join buffers BOTH sides in state and needs
(a) watermarks on both streams and (b) a time-range join condition to
know when buffered rows can never match again and purge them — without
both, state grows forever. :func:`interval_event_join` packages that
contract: the same builder works on static frames (no watermark,
identical join semantics), so the registered batch twin q263 and the
streaming behavior tests share one definition — twin parity holds by
construction, not by parallel maintenance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_event_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "15 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Pairs (l, r) with equal ``key`` and ``l.ts < r.ts <= l.ts +
    within``. Streaming inputs get ``withWatermark`` (state purge:
    a left row is droppable once the right watermark passes
    ``l.ts + within``; a right row once the left watermark passes its
    timestamp); static inputs skip it and produce the exact batch
    twin. Output columns: key, ts_l, ts_r plus all non-colliding
    payload columns from both sides.

    The strict ``>`` lower bound makes the join irreflexive so a
    stream joined with itself never pairs a row with its own echo.
    """
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    l = left.alias("l")
    r = right.alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") > F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within}")
        )
    )
    keep_l = [c for c in left.columns if c != key]
    keep_r = [c for c in right.columns if c != key]
    return l.join(r, cond, "inner").select(
        F.col(f"l.{key}").alias(key),
        *[F.col(f"l.{c}").alias(f"l_{c}") for c in keep_l],
        *[F.col(f"r.{c}").alias(f"r_{c}") for c in keep_r],
    )
