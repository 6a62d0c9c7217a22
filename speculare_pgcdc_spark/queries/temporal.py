"""Temporal / event-time operators in batch-oracle form (SURVEY §2B
T1/T3/T5, queries Q37-Q39). The streaming twins (F.window,
F.session_window, dropDuplicatesWithinWatermark under readStream) are
behavior-tested in tests/test_streaming.py; equivalence between the
arithmetic form here and the built-in window form is asserted in
tests/test_temporal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from speculare_pgcdc_spark.catalog import table
from speculare_pgcdc_spark.functions import (
    epoch_seconds,
    money_sum,
    oracle_money_sum,
)
from speculare_pgcdc_spark.queries import register


@register(
    "q37_tumbling_window",
    oracle=f"""
        SELECT CAST(FLOOR(epoch(ts) / 3600.0) AS BIGINT) AS bucket,
               event_type, COUNT(*) AS c,
               {oracle_money_sum('value', 's')}
        FROM events GROUP BY 1, 2 ORDER BY bucket, event_type
    """,
    doc="T1 tumbling 1h window aggregate, arithmetic (epoch-floor) form — "
    "identical semantics to F.window(ts, '1 hour') (equivalence pinned "
    "in tests/test_temporal.py). Partial+final hash agg; bucket count "
    "is bounded by time range so the shuffle is small at any scale.",
)
def q37(spark: SparkSession, sf: str) -> DataFrame:
    bucket = F.floor(epoch_seconds("ts") / 3600.0).cast("bigint")
    return (
        table(spark, sf, "events")
        .groupBy(bucket.alias("bucket"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("c"), money_sum("value", "s"))
        .orderBy("bucket", "event_type")
    )


@register(
    "q38_session_window",
    oracle="""
        WITH d AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN epoch(ts) - epoch(LAG(ts) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id))
                       > 1800 THEN 1 ELSE 0 END AS brk
            FROM events),
        s AS (
            SELECT user_id, ts, event_id,
                   CAST(SUM(brk) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS sess
            FROM d)
        SELECT user_id, sess, COUNT(*) AS n, MIN(ts) AS st, MAX(ts) AS en
        FROM s GROUP BY user_id, sess ORDER BY user_id, sess
    """,
    doc="T3 session windows (30-min gap) via gaps-and-islands: lag + "
    "cumulative break count + group. One shuffle on user_id; "
    "per-partition sort. Streaming twin: F.session_window "
    "(tests/test_temporal.py asserts the same sessions).",
)
def q38(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = epoch_seconds("ts") - F.lag(epoch_seconds("ts")).over(w)
    brk = F.when(gap > 1800, 1).otherwise(0)
    return (
        table(spark, sf, "events")
        .select("user_id", "ts", "event_id", brk.alias("brk"))
        .withColumn("sess", F.sum("brk").over(wrun))
        .groupBy("user_id", "sess")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("ts").alias("st"),
            F.max("ts").alias("en"),
        )
        .orderBy("user_id", "sess")
    )


@register(
    "q55_sliding_window",
    oracle=f"""
        WITH b AS (
            SELECT CAST(FLOOR(epoch(ts) / 1800) AS BIGINT) * 1800 AS ws,
                   event_type, value FROM events
            UNION ALL
            SELECT CAST(FLOOR(epoch(ts) / 1800) AS BIGINT) * 1800 - 1800,
                   event_type, value FROM events)
        SELECT ws, event_type, COUNT(*) AS c,
               {oracle_money_sum('value', 's')}
        FROM b GROUP BY ws, event_type ORDER BY ws, event_type
    """,
    doc="T2 sliding window (1h size, 30min slide) via F.window. Every "
    "event lands in exactly size/slide = 2 overlapping windows; the "
    "oracle materializes both window-start assignments arithmetically "
    "(epoch-grid UNION ALL) — same duplication Spark's TimeWindow "
    "expression generates. The fan-out factor is size/slide, so shuffle "
    "volume scales linearly with it; window count is bounded by the time "
    "range, keeping the final agg small at any data scale.",
)
def q55(spark: SparkSession, sf: str) -> DataFrame:
    w = F.window(F.col("ts"), "1 hour", "30 minutes")
    return (
        table(spark, sf, "events")
        .groupBy(w.alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("c"), money_sum("value", "s"))
        .select(
            epoch_seconds(F.col("w.start")).cast("bigint").alias("ws"),
            "event_type", "c", "s",
        )
        .orderBy("ws", "event_type")
    )


@register(
    "q39_dedup_distinct",
    oracle="""
        SELECT user_id, event_type, COUNT(*) AS c FROM (
            SELECT DISTINCT user_id, event_type, event_id FROM events)
        GROUP BY user_id, event_type ORDER BY user_id, event_type
    """,
    doc="T5/L1 exact dedup via distinct (partial agg collapses "
    "duplicates map-side before the shuffle).",
)
def q39a(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "events")
        .select("user_id", "event_type", "event_id")
        .distinct()
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("user_id", "event_type")
    )


@register(
    "q39_dedup_first_per_key",
    oracle="""
        SELECT user_id, event_type, event_id FROM (
            SELECT user_id, event_type, event_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS rn
            FROM events)
        WHERE rn = 1 ORDER BY user_id, event_type
    """,
    doc="T5/L1 keyed dedup keeping the FIRST row per key by (ts, "
    "event_id) — the deterministic form of dropDuplicates (which keeps "
    "an arbitrary row). At scale this is max_by/min_by-able too; the "
    "window form keeps one shuffle + sort on the dedup key.",
)
def q39b(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        table(spark, sf, "events")
        .select(
            "user_id", "event_type", "event_id",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
        .orderBy("user_id", "event_type")
    )


@register(
    "q263_stream_stream_join",
    oracle="""
        SELECT l.user_id,
               l.event_id AS l_event_id,
               r.event_id AS r_event_id,
               epoch_us(r.ts) - epoch_us(l.ts) AS gap_us
        FROM events l JOIN events r
          ON l.user_id = r.user_id
         AND l.event_type = 'purchase' AND r.event_type = 'error'
         AND r.ts > l.ts AND r.ts <= l.ts + INTERVAL 15 MINUTE
        ORDER BY l.user_id, l_event_id, r_event_id
    """,
    doc="Stream-stream interval join, batch twin: errors within 15 "
    "minutes AFTER a purchase by the same user — the two-live-feeds "
    "correlation a CDC consumer builds first (fraud/incident triage). "
    "The registered query runs streaming/joins.interval_event_join on "
    "STATIC frames; the identical builder on two readStream feeds "
    "adds the watermarks + time-range state-purge contract Spark "
    "requires of stream-stream inner joins (both sides buffered in "
    "state, rows purged once the opposing watermark passes their "
    "match window) — cross-mode parity and late-arrival drop are "
    "pinned in tests/test_streaming.py. Scale shape: one shuffle per "
    "side on the join key; state is bounded by watermark x arrival "
    "rate, not stream length. gap_us is exact integer MICROseconds "
    "(unix_micros / epoch_us — second-grain epoch() is fractional in "
    "one engine and floored in the other).",
)
def q263(spark: SparkSession, sf: str) -> DataFrame:
    from speculare_pgcdc_spark.streaming.joins import (
        interval_event_join,
    )

    ev = table(spark, sf, "events")
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    err = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id"
    )
    j = interval_event_join(pur, err, within="15 minutes")
    return j.select(
        "user_id",
        F.col("l_event_id").alias("l_event_id"),
        F.col("r_event_id").alias("r_event_id"),
        (
            F.unix_micros("r_ts") - F.unix_micros("l_ts")
        ).cast("bigint").alias("gap_us"),
    ).orderBy("user_id", "l_event_id", "r_event_id")
