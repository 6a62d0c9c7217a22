"""Change-history and lifecycle analytics (round 5, q153/q156/q157).

The reference's CDC feed is consumed by subscribers that maintain
their own downstream state (src/forwarder/mod.rs hands each change to
the client); these queries implement the three state shapes such a
consumer most commonly builds — a slowly-changing-dimension history
(SCD Type 2), an adoption curve (first-seen + cumulative), and a
text-format interchange scan (CSV round-trip) — each as one
declarative plan.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from speculare_pgcdc_spark.catalog import table
from speculare_pgcdc_spark.functions import money_sum, oracle_money_sum
from speculare_pgcdc_spark.queries import register


@register(
    "q153_scd2_history",
    oracle="""
        SELECT user_id,
               event_type AS attr_value,
               ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS valid_to,
               CAST(lead(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) IS NULL
                    AS BOOLEAN) AS is_current,
               CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS BIGINT) AS version
        FROM events
        ORDER BY user_id, version
    """,
    doc="SCD Type-2 dimension build from a change stream: each "
    "per-key change opens a validity interval [valid_from, valid_to) "
    "closed by the NEXT change's timestamp (lead over a total "
    "(ts, event_id) order — deterministic under timestamp ties), "
    "open-ended + flagged on the current version. This is the state "
    "shape a CDC subscriber (the reference's WS client) most commonly "
    "materializes; here it is one window over the per-key shuffle — "
    "no self-join, no driver state, and the partition key is the "
    "entity key so the build scales with keys, not history length "
    "per key beyond the per-partition sort.",
)
def q153(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        table(spark, sf, "events")
        .select("user_id", "event_type", "ts", "event_id")
        .select(
            "user_id",
            F.col("event_type").alias("attr_value"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
            F.lead("ts").over(w).isNull().alias("is_current"),
            F.row_number().over(w).cast("bigint").alias("version"),
        )
        .orderBy("user_id", "version")
    )


@register(
    "q156_new_users_curve",
    oracle="""
        WITH first_seen AS (
            SELECT user_id, CAST(MIN(ts) AS DATE) AS d
            FROM events GROUP BY user_id
        ),
        per_day AS (
            SELECT d, COUNT(*) AS new_users FROM first_seen GROUP BY d
        )
        SELECT d,
               CAST(new_users AS BIGINT) AS new_users,
               CAST(SUM(new_users) OVER (ORDER BY d
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cumulative_users
        FROM per_day
        ORDER BY d
    """,
    doc="Adoption curve: first-seen date per entity (one per-key min "
    "agg), daily new-entity counts, and the cumulative total via a "
    "running frame over the DAY-GRAIN aggregate — the unbounded "
    "window runs over rows bounded by distinct days, not events, so "
    "the single-partition window is a few thousand rows at ANY event "
    "volume. The same first-occurrence trick gives running distinct "
    "counts without any distinct-over-window operator.",
)
def q156(spark: SparkSession, sf: str) -> DataFrame:
    first_seen = (
        table(spark, sf, "events")
        .groupBy("user_id")
        .agg(F.min("ts").cast("date").alias("d"))
    )
    per_day = first_seen.groupBy("d").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_day.select(
            "d",
            F.col("new_users").cast("bigint").alias("new_users"),
            F.sum("new_users").over(w).cast("bigint")
            .alias("cumulative_users"),
        )
        .orderBy("d")
    )


@register(
    "q157_csv_roundtrip",
    oracle=f"""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               {oracle_money_sum('value', 'total')}
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc="CSV interchange scan (the S-family text-source contract "
    "beside q02's JSON-lines): project the parquet events table to "
    "CSV with an explicit schema, read it back with the SAME declared "
    "schema (header on, no inference — inference is a full extra "
    "pass and non-deterministic under sampling at scale), and "
    "aggregate. Hash-matching the parquet-side oracle proves the "
    "round trip is lossless for the projected columns. Timestamps "
    "deliberately stay out of the projection — CSV has no typed "
    "timestamp, and the NTZ/format pitfalls belong to the parquet "
    "contract (FIXTURES.md), not an interchange format.",
)
def q157(spark: SparkSession, sf: str) -> DataFrame:
    src = table(spark, sf, "events").select(
        "event_id", "event_type", "value"
    )
    out = os.path.join(
        tempfile.gettempdir(),
        f"spark_csv_roundtrip_{os.getpid()}",
        os.path.basename(os.path.normpath(sf)),
    )
    src.write.mode("overwrite").option("header", True).csv(out)
    back = (
        spark.read.option("header", True)
        .schema("event_id BIGINT, event_type STRING, value DOUBLE")
        .csv(out)
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            money_sum("value", "total"),
        )
        .orderBy("event_type")
    )
