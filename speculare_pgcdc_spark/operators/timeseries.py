"""Time-series gap filling (TimescaleDB `time_bucket_gapfill` + `locf`
analog — the reference's domain is Timescale monitoring data, where
dashboards expect dense per-bucket series even when sources go quiet;
cf. the hypertable machinery at /root/reference/src/cdc/mod.rs:49-72).

Shape: bucket-aggregate (sparse) -> per-key bucket span -> explode a
dense bucket grid -> left join the sparse aggs -> LOCF via
last-non-null window. All codegen'd; shuffles: one for the agg, one for
the window (same key — AQE reuses the exchange). Grid size is
(keys x buckets-in-range), independent of raw row count — at 100 TB
the dense grid is MUCH smaller than the input."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bucketize(
    df: DataFrame,
    ts_col: str = "ts",
    width_seconds: int = 3600,
) -> DataFrame:
    """Add an epoch-grid bucket column (`bucket`, bigint)."""
    b = F.floor(F.col(ts_col).cast("double") / width_seconds).cast("bigint")
    return df.withColumn("bucket", b)


def gapfill_locf(
    df: DataFrame,
    key: str,
    ts_col: str = "ts",
    val_col: str = "value",
    width_seconds: int = 3600,
) -> DataFrame:
    """Per key: dense hourly buckets from its first to last bucket, with
    the bucket's row count (0 where absent) and LOCF-filled mean value.

    Returns (key, bucket, c, v_locf): `c` = rows in the bucket, `v_locf`
    = that bucket's mean value, carried forward from the last non-empty
    bucket when the bucket is a gap (null only before the first
    observation — gapfill never invents a value)."""
    sparse = (
        bucketize(df, ts_col, width_seconds)
        .groupBy(key, "bucket")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.round(
                F.sum(F.col(val_col).cast("decimal(28,6)"))
                / F.count(F.lit(1)),
                4,
            ).cast("double").alias("_v"),
        )
    )
    grid = (
        sparse.groupBy(key)
        .agg(F.min("bucket").alias("_mn"), F.max("bucket").alias("_mx"))
        .select(
            key, F.explode(F.sequence("_mn", "_mx")).alias("bucket")
        )
    )
    w = (
        Window.partitionBy(key)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(sparse, [key, "bucket"], "left")
        .select(
            key,
            "bucket",
            F.coalesce("_c", F.lit(0)).alias("c"),
            F.last("_v", ignorenulls=True).over(w).alias("v_locf"),
        )
    )
