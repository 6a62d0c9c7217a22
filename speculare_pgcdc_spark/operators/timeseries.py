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


def gapfill_interpolate(
    df: DataFrame,
    key: str,
    ts_col: str = "ts",
    val_col: str = "value",
    width_seconds: int = 3600,
) -> DataFrame:
    """Like :func:`gapfill_locf` but gaps get LINEAR interpolation
    between the surrounding non-empty buckets (Timescale `interpolate`
    analog). Buckets before the first / after the last observation stay
    null. Same two-shuffle plan: the prev/next windows share the key
    partitioning.

    Cross-engine determinism: the bucket mean is quantized to integer
    MICRO-units (exact decimal sum x 1e6, one deterministic rounding),
    and the lerp is evaluated as an integer-weighted sum divided once
    at the end — every intermediate is an integer below 2^53, so Spark
    and any oracle engine produce bit-identical doubles regardless of
    aggregation/evaluation order. Naive double lerp drifts by 1 ulp
    between engines and flips the 4th decimal."""
    mu = F.round(
        (F.sum(F.col(val_col).cast("decimal(28,6)")) * 1_000_000)
        .cast("double")
        / F.count(F.lit(1))
    ).cast("bigint")
    sparse = (
        bucketize(df, ts_col, width_seconds)
        .groupBy(key, "bucket")
        .agg(F.count(F.lit(1)).alias("_c"), mu.alias("_mu"))
    )
    grid = (
        sparse.groupBy(key)
        .agg(F.min("bucket").alias("_mn"), F.max("bucket").alias("_mx"))
        .select(key, F.explode(F.sequence("_mn", "_mx")).alias("bucket"))
    )
    joined = grid.join(sparse, [key, "bucket"], "left")
    wp = (
        Window.partitionBy(key)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # "next non-null" via DESCENDING order + a running last() frame:
    # Spark evaluates (currentRow, unboundedFollowing) frames with
    # UnboundedFollowingWindowFunctionFrame, which recomputes the
    # aggregate from scratch per row — O(n^2) per partition. The
    # reversed running frame is the O(n) streaming path and shares the
    # same hash partitioning (one exchange, two sorts).
    wn = (
        Window.partitionBy(key)
        .orderBy(F.col("bucket").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    vb = F.struct("_mu", "bucket")
    prev = F.last(F.when(F.col("_mu").isNotNull(), vb), ignorenulls=True).over(wp)
    nxt = F.last(F.when(F.col("_mu").isNotNull(), vb), ignorenulls=True).over(wn)
    span = nxt["bucket"] - prev["bucket"]
    num = prev["_mu"] * (nxt["bucket"] - F.col("bucket")) + nxt["_mu"] * (
        F.col("bucket") - prev["bucket"]
    )
    # round in INTEGER deci-milli units (1e-4): integer halves are
    # exactly representable doubles, so the half-up tie-break agrees
    # across engines — ROUND(double, 4) does not (its .xxxx5 ties are
    # not representable and engines disagree on the stored neighbor)
    dm = F.when(
        span == 0, F.round(prev["_mu"].cast("double") / 100)
    ).otherwise(
        F.round(num.cast("double") / (span.cast("double") * 100))
    ).cast("bigint")
    return joined.select(
        key,
        "bucket",
        F.coalesce("_c", F.lit(0)).alias("c"),
        (dm.cast("double") / 10_000).alias("v_interp"),
    )
