"""Skew and non-equi-join mitigation operators — the two plan shapes
that break naive engines at 100 TB, expressed as reusable DataFrame
rewrites with exact semantics (both oracle-checked in queries/extended).

1. ``bin_range_join``: a pure range predicate (no equality key) plans
   as a broadcast/cartesian nested-loop — O(n*m) compares. Binning
   rewrites it as an equi-join on a time bucket: each left row joins
   only rows in its own and adjacent buckets, then the exact predicate
   filters. Compares drop from n*m to sum-over-bins(n_b * m_b±1) —
   linear for bounded range width. (The same rewrite Databricks' range
   join optimization and Flink's interval join perform internally;
   Spark OSS has no native rule, so the engine ships it as an
   operator.)

2. ``salted_agg``: a group-by whose key distribution is dominated by a
   few heavy keys puts one reducer on the critical path. Two-phase
   aggregation over (key, salt) spreads each hot key over N partitions,
   then merges the partials — the classic salting rewrite. Exact for
   any algebraic aggregate (here: count + decimal sum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bin_range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    *,
    lower: int = 0,
    upper: int,
) -> DataFrame:
    """Pairs (l, r) with ``l.ts + lower < r.ts <= l.ts + upper`` (epoch
    seconds), as an equi-join on bucket = floor(epoch/upper) with the
    left side exploded to its two candidate buckets. Columns of both
    inputs are preserved (prefix-free inputs required).

    Bin width must be ``upper`` (not upper-lower): any r in
    (l+lower, l+upper] ⊆ [l, l+upper] lies in bin(l) or bin(l)+1 when
    bins are upper-wide; a narrower width would need bin(l)+2 for
    lower > 0 and silently drop pairs. Negative lower (r earlier than
    l) would need bin(l)-1 too — rejected rather than silently
    under-covered; swap the sides instead."""
    if not 0 <= lower < upper:
        raise ValueError(
            f"need 0 <= lower < upper, got lower={lower} upper={upper}; "
            "for windows reaching before the left row, swap the inputs"
        )
    width = upper
    lbin = F.floor(F.col(left_ts).cast("double") / width).cast("bigint")
    rbin = F.floor(F.col(right_ts).cast("double") / width).cast("bigint")
    l_exp = left.withColumn(
        "_bin", F.explode(F.array(lbin, lbin + F.lit(1)))
    )
    r_b = right.withColumn("_bin", rbin)
    lo = F.col(right_ts).cast("double") > F.col(left_ts).cast("double") + lower
    hi = F.col(right_ts).cast("double") <= F.col(left_ts).cast("double") + upper
    return l_exp.join(r_b, on="_bin").filter(lo & hi).drop("_bin")


def salted_agg(
    df: DataFrame,
    key: str,
    value: str,
    *,
    salt_buckets: int = 16,
    sum_alias: str = "s",
    count_alias: str = "c",
) -> DataFrame:
    """Two-phase skew-proof aggregate: exact count + decimal-exact sum
    per key, with each key's rows first reduced across `salt_buckets`
    independent partials. The salt hashes ROW CONTENT (key + value),
    never partition position: monotonically_increasing_id/rand are
    recompute-unstable — a fetch-failure stage retry would re-salt rows
    into different partials and double-count/drop them (the SPARK-23207
    failure mode). Identical (key, value) duplicates share a salt; they
    pre-combine map-side, so that concentration is harmless."""
    salt = F.pmod(F.xxhash64(F.col(key), F.col(value)), F.lit(salt_buckets))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_pc"),
            F.sum(F.col(value).cast("decimal(28,6)")).alias("_ps"),
        )
    )
    return (
        partial.groupBy(key)
        .agg(
            F.sum("_pc").alias(count_alias),
            F.round(F.sum("_ps"), 2).cast("double").alias(sum_alias),
        )
    )
