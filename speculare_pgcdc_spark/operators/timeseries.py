"""Time-series gap filling (TimescaleDB `time_bucket_gapfill` + `locf`
analog — the reference's domain is Timescale monitoring data, where
dashboards expect dense per-bucket series even when sources go quiet;
cf. the hypertable machinery at /root/reference/src/cdc/mod.rs:49-72).

Shape: bucket-aggregate (sparse) -> window the SPARSE rows to attach
carry/interpolation anchors and each row's gap extent (lead) -> explode
each segment into its dense buckets with the fill computed inline. The
dense grid never exists as a join/window input: the windows sort only
the sparse aggregate (one row per non-empty bucket), and the explode is
map-side. Shuffles: one for the agg, one for the window. At 100 TB the
sparse aggregate is MUCH smaller than the input, and the dense fan-out
happens after the last sort."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from speculare_pgcdc_spark.functions import epoch_seconds


def bucketize(
    df: DataFrame,
    ts_col: str = "ts",
    width_seconds: int = 3600,
) -> DataFrame:
    """Add an epoch-grid bucket column (`bucket`, bigint)."""
    b = F.floor(epoch_seconds(ts_col) / width_seconds).cast("bigint")
    return df.withColumn("bucket", b)


def _segments(anchored: DataFrame, key: str) -> DataFrame:
    """Explode each sparse row's segment [bucket, next_bucket) into its
    dense buckets: `b` sweeps the row's own bucket plus the empty ones
    before the key's next observation (the last row emits only itself,
    so the grid ends at the key's max bucket). Map-side — runs after
    the window sort, so no shuffle sees the fan-out."""
    return anchored.withColumn(
        "b",
        F.explode(
            F.sequence(
                "bucket",
                F.coalesce(F.col("_nb") - 1, F.col("bucket")),
            )
        ),
    )


def _sum_e6(val_col: str) -> Column:
    """Exact per-bucket value sum in integer MICRO-units (x 1e6).

    The scaling happens PER ROW, before the aggregate: v ->
    decimal(28,6) (6-digit quantization, exact) -> x 1e6 (integer-
    valued decimal(36,6), exact) -> decimal(28,0) (exact for |v| <
    1e22 per row) -> SUM -> decimal(38,0). Headroom is therefore 1e38
    on the per-bucket SUM. The previous form multiplied AFTER the sum
    — SUM(decimal(28,6)) is decimal(38,6) and the x 1e6 product
    saturates precision 38, silently overflowing to NULL once a
    bucket's sum reaches ~1e26 while DuckDB's HUGEINT-backed decimal
    survives (round-10 advice). Values are bit-identical for all
    in-headroom inputs: both forms produce the same exact integer."""
    return F.sum(
        (F.col(val_col).cast("decimal(28,6)") * 1_000_000)
        .cast("decimal(28,0)")
    )


def _grid_count() -> Column:
    """Bucket row count on the dense grid: the sparse row's own count on
    its own bucket, 0 on the gap buckets it fans out."""
    return (
        F.when(F.col("b") == F.col("bucket"), F.col("_c"))
        .otherwise(F.lit(0))
        .alias("c")
    )


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
    observation — gapfill never invents a value).

    The carry value is resolved on the SPARSE rows (running last-non-
    null window), then exploded: every dense bucket of a segment shares
    its sparse row's carry — including the row's own bucket, whose mean
    (when present) IS the running last-non-null."""
    sparse = (
        bucketize(df, ts_col, width_seconds)
        # a null timestamp has no bucket: drop it BEFORE the windows,
        # or its row sorts first (asc-nulls-first), leaks its value
        # into the carry/anchor windows, then vanishes in the segment
        # explode — poisoning real buckets with an invented value
        .filter(F.col("bucket").isNotNull())
        .groupBy(key, "bucket")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            # bucket mean rounded to 4 decimals through ONE double
            # division on identical operands (e6-exact decimal sum ->
            # double, over count*100): both engines compute the same
            # correctly-rounded quotient and the same half-away
            # ROUND. The previous ROUND(decimal / count, 4) form let
            # each engine pick its own decimal-division scale and
            # rounding point — first seen diverging at a 4th-decimal
            # boundary on the skew01 sweep (SKEW_SWEEP_r10); this is
            # the q73 integer-quantized-mean contract applied to LOCF.
            (
                F.round(
                    _sum_e6(val_col).cast("double")
                    / (F.count(F.lit(1)) * 100),
                    0,
                ).cast("bigint").cast("double")
                / 10_000
            ).alias("_v"),
        )
    )
    w_asc = Window.partitionBy(key).orderBy("bucket")
    wp = w_asc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    anchored = sparse.select(
        key,
        "bucket",
        "_c",
        F.last("_v", ignorenulls=True).over(wp).alias("_locf"),
        F.lead("bucket").over(w_asc).alias("_nb"),
    )
    return _segments(anchored, key).select(
        key,
        F.col("b").alias("bucket"),
        _grid_count(),
        F.col("_locf").alias("v_locf"),
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
    null.

    The prev/next anchors are resolved on the SPARSE rows: `_p` = last
    non-null (mu, bucket) at-or-before the row, `_nx` = first non-null
    strictly after it (DESCENDING running frame excluding current —
    Spark's (currentRow, unboundedFollowing) frames recompute per row,
    O(n^2); the reversed running frame is the O(n) path and shares the
    key partitioning). A gap bucket `b` exploded from sparse row `s`
    then interpolates between `_p` (s itself when its mean exists) and
    `_nx`; `s`'s own bucket uses `_nx` only if its own mean is null.

    Cross-engine determinism: the bucket mean is quantized to integer
    MICRO-units (exact decimal sum x 1e6, one deterministic rounding),
    and the lerp is evaluated as an integer-weighted sum divided once
    at the end — every intermediate is an integer below 2^53, so Spark
    and any oracle engine produce bit-identical doubles regardless of
    aggregation/evaluation order. Naive double lerp drifts by 1 ulp
    between engines and flips the 4th decimal. The final rounding is in
    INTEGER deci-milli units (1e-4): integer halves are exactly
    representable doubles, so the half-up tie-break agrees across
    engines — ROUND(double, 4) does not (its .xxxx5 ties are not
    representable and engines disagree on the stored neighbor)."""
    mu = F.round(
        _sum_e6(val_col).cast("double") / F.count(F.lit(1))
    ).cast("bigint")
    sparse = (
        bucketize(df, ts_col, width_seconds)
        # null-timestamp rows have no bucket — drop before windowing
        # (see gapfill_locf: they would otherwise poison the anchors)
        .filter(F.col("bucket").isNotNull())
        .groupBy(key, "bucket")
        .agg(F.count(F.lit(1)).alias("_c"), mu.alias("_mu"))
    )
    w_asc = Window.partitionBy(key).orderBy("bucket")
    wp = w_asc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wn_excl = (
        Window.partitionBy(key)
        .orderBy(F.col("bucket").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    vb = F.struct("_mu", "bucket")
    anchor = F.when(F.col("_mu").isNotNull(), vb)
    anchored = sparse.select(
        key,
        "bucket",
        "_c",
        "_mu",
        F.last(anchor, ignorenulls=True).over(wp).alias("_p"),
        F.last(anchor, ignorenulls=True).over(wn_excl).alias("_nx"),
        F.lead("bucket").over(w_asc).alias("_nb"),
    )
    filled = _segments(anchored, key)
    on_own = F.col("b") == F.col("bucket")
    # the row's own bucket is its own "next" anchor when its mean
    # exists; gap buckets always look strictly ahead
    nxt = F.when(on_own & F.col("_mu").isNotNull(), vb).otherwise(
        F.col("_nx")
    )
    prev = F.col("_p")
    span = nxt["bucket"] - prev["bucket"]
    num = prev["_mu"] * (nxt["bucket"] - F.col("b")) + nxt["_mu"] * (
        F.col("b") - prev["bucket"]
    )
    dm = F.when(
        span == 0, F.round(prev["_mu"].cast("double") / 100)
    ).otherwise(
        F.round(num.cast("double") / (span.cast("double") * 100))
    ).cast("bigint")
    return filled.select(
        key,
        F.col("b").alias("bucket"),
        _grid_count(),
        (dm.cast("double") / 10_000).alias("v_interp"),
    )
