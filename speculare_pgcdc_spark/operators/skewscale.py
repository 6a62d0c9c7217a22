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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from speculare_pgcdc_spark.functions import epoch_seconds


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
    lbin = F.floor(epoch_seconds(left_ts) / width).cast("bigint")
    rbin = F.floor(epoch_seconds(right_ts) / width).cast("bigint")
    l_exp = left.withColumn(
        "_bin", F.explode(F.array(lbin, lbin + F.lit(1)))
    )
    r_b = right.withColumn("_bin", rbin)
    lo = epoch_seconds(right_ts) > epoch_seconds(left_ts) + lower
    hi = epoch_seconds(right_ts) <= epoch_seconds(left_ts) + upper
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


def binned_range_count(
    df: DataFrame,
    val_col: str,
    *,
    preceding: float,
    out_col: str = "cnt",
) -> DataFrame:
    """``COUNT(*) OVER (ORDER BY val RANGE BETWEEN preceding PRECEDING
    AND CURRENT ROW)`` — the scale-safe companion to the global RANGE
    window (q23), which Spark executes as ONE task holding every row.

    Decomposition: frame-count(p) = N(<= p) - N(< p-preceding), both
    prefix counts of the global value order. The prefix counts come
    from a two-phase scan, the distributed-prefix-sum classic:

    1. collapse to distinct values with multiplicities (one shuffle),
    2. union in one "query point" per distinct value at v-preceding
       (multiplicity 0, sorted BEFORE an equal real value so the lower
       bound is strict-<; the upper bound keeps RANGE's peer-inclusive
       semantics because the full multiplicity of v sits on one row),
    3. bin by floor(v/preceding): per-bin subtotals (tiny frame, one
       row per bin) get a cumulative sum, and a bin-partitioned window
       ranks within bins — prefix(v) = cum(bins below) + within-bin.

    Every data-sized stage is hash-partitioned (by value, then by bin);
    the only unpartitioned window runs over the bins frame, which is
    |value range| / preceding rows — at 100 TB still a few-MB frame
    (recurse the same trick on super-bins if it ever isn't). The bins
    frame is broadcast back, so the data path is: agg, window-by-bin,
    one equi-join to reattach rows. Exact, including duplicate values
    and frame bounds landing exactly on a value (double arithmetic on
    the bound matches the window engines' own p - preceding).

    Null/NaN semantics: NULL-valued rows form their own peer group in
    every engine's RANGE frame (their count is the null count; they
    never enter a non-null row's frame) — handled exactly via a
    separate null branch. NaN has no portable RANGE semantics (engines
    disagree on frame-bound arithmetic vs ordering comparators), so a
    NaN value fails loudly instead of returning silently wrong counts."""
    c = F.count(F.lit(1)).alias("_c")
    # r14 optimization (guide §1.2/§5): the distinct-value frame feeds
    # FIVE consumers (prices, queries, the bins subtotal, the null
    # branch — and pts twice via bins_cum + cum). Catalyst has no
    # cross-DAG CSE, so the unpinned plan re-ran the scan + agg per
    # consumer (measured: 7 source scans in the q80 physical plan).
    # Pin it once — the frame is |distinct values| rows, the operator's
    # own documented bounded grain, exactly the q46/q343 checkpoint
    # doctrine.
    d_all = df.groupBy(val_col).agg(c).localCheckpoint(eager=True)
    d = d_all.filter(F.col(val_col).isNotNull())
    null_cnt = d_all.filter(F.col(val_col).isNull()).select(
        F.col("_c").alias("_null_cnt")
    )
    v_raw = F.col(val_col).cast("double")
    v = F.when(
        F.isnan(v_raw),
        F.raise_error(
            F.lit(
                "binned_range_count: NaN values have no portable RANGE-"
                "frame semantics; filter or impute them first"
            )
        ).cast("double"),
    ).otherwise(v_raw)
    prices = d.select(
        F.col(val_col).alias("_orig"),
        v.alias("_v"),
        F.col("_c"),
        F.lit(1).alias("_typ"),
    )
    queries = d.select(
        F.col(val_col).alias("_orig"),
        (v - F.lit(float(preceding))).alias("_v"),
        F.lit(0).alias("_c"),
        F.lit(0).alias("_typ"),
    )
    pts = prices.unionByName(queries).withColumn(
        "_bin", F.floor(F.col("_v") / F.lit(float(preceding))).cast("bigint")
    )
    bins = pts.groupBy("_bin").agg(F.sum("_c").alias("_bt"))
    wb = Window.orderBy("_bin").rowsBetween(Window.unboundedPreceding, -1)
    bins_cum = bins.select(
        "_bin", F.coalesce(F.sum("_bt").over(wb), F.lit(0)).alias("_below")
    )
    wv = (
        Window.partitionBy("_bin")
        .orderBy("_v", "_typ")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = pts.join(F.broadcast(bins_cum), "_bin").select(
        "_orig",
        "_typ",
        (F.col("_below") + F.sum("_c").over(wv)).alias("_cum"),
    )
    # each _orig has exactly one real row (typ 1) and one query row
    # (typ 0); a conditional agg pairs them in ONE pass — a
    # filter+self-join would execute the whole cum subtree twice
    per_val = cum.groupBy("_orig").agg(
        (
            F.max(F.when(F.col("_typ") == 1, F.col("_cum")))
            - F.max(F.when(F.col("_typ") == 0, F.col("_cum")))
        )
        .cast("bigint")
        .alias(out_col)
    )
    nonnull = (
        df.filter(F.col(val_col).isNotNull())
        .join(per_val, df[val_col] == per_val["_orig"])
        .drop("_orig")
    )
    nulls = (
        df.filter(F.col(val_col).isNull())
        .crossJoin(F.broadcast(null_cnt))
        .withColumn(out_col, F.col("_null_cnt").cast("bigint"))
        .drop("_null_cnt")
    )
    return nonnull.unionByName(nulls)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    *,
    salt_buckets: int = 8,
    salt_on: str | None = None,
) -> DataFrame:
    """Skew-proof equi-join: the hot-key remedy for a join whose key
    distribution concentrates on few values (the join-side complement
    of salted_agg). The BIG side gets a content-derived salt (hashing
    `salt_on` when given, else the whole row — see note), the
    SMALL side is replicated once per
    bucket, and the join runs on (key, salt): each hot key's rows
    spread over `salt_buckets` reducers instead of one straggler.

    The salt hashes ROW CONTENT (never partition position or rand()):
    a stage retry re-salts identically, so no row is lost or doubled
    (the SPARK-23207 failure mode salted_agg documents). Replication
    multiplies the small side by `salt_buckets` — the technique's
    price; use it when the small side is modest but too big or too
    dynamic to broadcast. AQE's skew-join handles sort-merge skew
    automatically at runtime; explicit salting remains the portable
    form and the one that composes with bucketed layouts.

    Result is EXACTLY the plain `big.join(small, key)` rows (plus a
    `_salt` column dropped before return).

    ``salt_on`` names a high-cardinality column to derive the salt
    from; by DEFAULT the salt hashes the WHOLE row (every big-side
    column), which spreads a hot key's rows as long as they differ
    anywhere. Hashing only the join key would give every row of a hot
    key the SAME salt — zero mitigation — so that is never done.
    CAVEAT on the default: if a hot key's rows are IDENTICAL in every
    probed column (low-entropy payloads), they all hash to one salt
    and the skew survives — pass ``salt_on`` naming a per-row-unique
    column (an id, an offset) when payloads can repeat. MAP-typed
    columns are rejected up front (xxhash64 cannot hash maps; with
    the whole-row default that would surface as a confusing
    AnalysisException deep in the plan)."""
    probe_cols = [salt_on] if salt_on else list(big.columns)

    def _has_map(dt) -> bool:
        # xxhash64 rejects MAP anywhere in the type tree (top-level,
        # inside a struct field, inside an array element)
        tn = dt.typeName()
        if tn == "map":
            return True
        if tn == "struct":
            return any(_has_map(f.dataType) for f in dt.fields)
        if tn == "array":
            return _has_map(dt.elementType)
        return False

    maps = [
        f.name
        for f in big.schema.fields
        if f.name in probe_cols and _has_map(f.dataType)
    ]
    if maps:
        raise ValueError(
            f"salted_join cannot hash MAP-typed columns {maps}: "
            "pass salt_on=<a non-map, per-row-unique column>"
        )
    probe = [F.col(c) for c in probe_cols]
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*probe), F.lit(salt_buckets))
    )
    replicated = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    return salted_big.join(replicated, on=[key, "_salt"]).drop("_salt")


def null_isolated_left_join(
    big: DataFrame,
    dim: DataFrame,
    key: str,
) -> DataFrame:
    """LEFT join with the null-key population ISOLATED from the
    shuffle: rows whose join key is NULL can never match, yet a plain
    left outer join still ships every one of them through the
    exchange — and they all hash to the SAME reducer, the silent hot
    key that no salting helps (salting spreads VALUES; null is one
    value). At a 100 TB fact table where a nullable foreign key is
    10-30% unfilled, that one reducer is the job.

    The rewrite: non-null rows take the real join; null rows bypass it
    entirely and re-enter with the dimension columns as typed NULLs —
    exactly the rows the outer join would have produced for them.
    Result is EXACTLY ``big.join(dim, big[key] == dim[key2], "left")``
    rows for a dim keyed on its own column; column set is big's
    columns plus dim's non-key columns.

    ``dim`` must carry the join key under the SAME name ``key`` (the
    usual dimension shape); its other columns are appended, so they
    must be DISJOINT from big's columns — a shared non-key name would
    make the post-join column selection ambiguous, so it is rejected
    up front (alias dim's columns before calling).
    """
    overlap = sorted(
        (set(big.columns) & set(dim.columns)) - {key}
    )
    if overlap:
        raise ValueError(
            "null_isolated_left_join: dim's non-key columns "
            f"{overlap} collide with big's; alias them first"
        )
    dim_cols = [c for c in dim.columns if c != key]
    matched = big.filter(F.col(key).isNotNull()).join(dim, key, "left")
    dim_fields = {f.name: f.dataType for f in dim.schema.fields}
    nulls = big.filter(F.col(key).isNull()).select(
        *big.columns,
        *[
            F.lit(None).cast(dim_fields[c]).alias(c)
            for c in dim_cols
        ],
    )
    # align column order (join moves the key first)
    return matched.select(*nulls.columns).unionAll(nulls)
