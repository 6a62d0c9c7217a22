"""Extended relational surface beyond SURVEY §2B (queries Q61-Q65):
pivot, correlated subqueries, exact percentiles, ordered array
aggregation, and character-shingle (n-gram) Jaccard near-dup.

These round out what a user of a general analytics engine expects on
top of the §2B contract; each is oracle-checked like the core rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from speculare_pgcdc_spark.catalog import register_views, table
from speculare_pgcdc_spark.queries import register


@register(
    "q61_pivot",
    oracle="""
        SELECT o_orderpriority,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS F,
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                    AS BIGINT) AS O,
               CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)
                    AS BIGINT) AS P
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="Pivot (wide conditional aggregation). The pivot value list is "
    "EXPLICIT — with it, Spark plans a single partial+final hash agg "
    "pass; without it, it first runs a distinct scan to discover "
    "values (an extra full pass at 100 TB). Oracle is the equivalent "
    "CASE-WHEN form.",
)
def q61(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .orderBy("o_orderpriority")
    )


@register(
    "q62_correlated_subqueries",
    oracle="""
        SELECT c_custkey FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_totalprice > (SELECT AVG(o_totalprice) FROM orders))
        ORDER BY c_custkey
    """,
    doc="Correlated EXISTS + scalar subquery, expressed in SQL so "
    "Catalyst's subquery decorrelation owns the plan: the EXISTS "
    "rewrites to a left-semi join on o_custkey and the scalar AVG "
    "becomes a one-row broadcast — no per-row re-execution (the naive "
    "interpretation would be O(rows * subquery)).",
)
def q62(spark: SparkSession, sf: str) -> DataFrame:
    register_views(spark, sf)
    return spark.sql(
        """
        SELECT c_custkey FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_totalprice > (SELECT AVG(o_totalprice) FROM orders))
        ORDER BY c_custkey
        """
    )


@register(
    "q63_percentiles",
    oracle="""
        SELECT event_type,
               ROUND(quantile_cont(value, 0.5), 2) AS p50,
               ROUND(quantile_cont(value, 0.9), 2) AS p90
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Exact interpolated percentiles per group (Spark `percentile` "
    "== DuckDB quantile_cont, both linear-interpolation). Exact "
    "percentile buffers each group's values — the oracle form. The "
    "scale path is approx_percentile (t-digest sketch, constant "
    "memory, map-side mergeable), same call shape.",
)
def q63(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "events")
        .groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 2).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 2).alias("p90"),
        )
        .orderBy("event_type")
    )


@register(
    "q64_ordered_array_agg",
    oracle="""
        SELECT user_id,
               string_agg(DISTINCT event_type, ','
                          ORDER BY event_type) AS types
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    doc="Ordered set aggregation: collect_set -> array_sort -> join. "
    "collect_* is unordered and partial-merged across partitions, so "
    "determinism REQUIRES the explicit array_sort — pinned here so "
    "nobody 'simplifies' it away and gets shuffle-order-dependent "
    "output at scale.",
)
def q64(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "events")
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("event_type")), ","
            ).alias("types")
        )
        .orderBy("user_id")
    )


@register(
    "q65_shingle_jaccard",
    oracle="""
        WITH sh AS (
            SELECT DISTINCT doc_id,
                   substr(text, CAST(i AS INT), 3) AS s
            FROM documents, unnest(range(1, len(text) - 1)) AS t(i)
            WHERE doc_id < 100),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id)
        SELECT da, db,
               ROUND(i * 1.0 / (sa.n + sb.n - i), 4) AS j
        FROM inter
        JOIN sizes sa ON sa.doc_id = da
        JOIN sizes sb ON sb.doc_id = db
        WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.5
        ORDER BY da, db
    """,
    doc="L2 character-3-gram (shingle) Jaccard near-dup pairs (tau=0.5, "
    "bounded scope) — the n-gram variant of q42's token Jaccard, "
    "robust to whitespace/tokenization differences. Same scale story: "
    "exact form is the oracle; MinHash+LSH over the same shingles "
    "(operators/dedup.py, q46) is the linear-cost path at 100 TB.",
)
def q65(spark: SparkSession, sf: str) -> DataFrame:
    # length >= 3 pre-filter: sequence(1, n) is DESCENDING for n < 1
    # (not empty), which would fabricate shingles for tiny docs; the
    # oracle's range(1, len-1) is empty for them
    docs = table(spark, sf, "documents").filter(
        (F.col("doc_id") < 100) & (F.length("text") >= 3)
    )
    sh = (
        docs.select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.length("text") - 2)
            ).alias("i"),
            "text",
        )
        .select("doc_id", F.expr("substring(text, i, 3)").alias("s"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db")
        )
        .agg(F.count(F.lit(1)).alias("i"))
    )
    j = F.col("i") / (F.col("sa.n") + F.col("sb.n") - F.col("i"))
    return (
        inter.join(sizes.alias("sa"), F.col("da") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("db") == F.col("sb.doc_id"))
        .filter(j >= 0.5)
        .select("da", "db", F.round(j, 4).alias("j"))
        .orderBy("da", "db")
    )


@register(
    "q67_binned_range_join",
    oracle="""
        SELECT a.event_id AS ea, b.event_id AS eb
        FROM events a JOIN events b
          ON epoch(b.ts) > epoch(a.ts)
         AND epoch(b.ts) <= epoch(a.ts) + 300
        ORDER BY ea, eb
    """,
    doc="Pure range join (NO equality key): all event pairs within 5 "
    "minutes, global. Naive plan is a nested-loop over n*m pairs; the "
    "engine's operators/skewscale.bin_range_join rewrites it to an "
    "equi-join on a time bucket (left exploded to 2 candidate "
    "buckets) + exact filter — plan-linted to contain NO "
    "BroadcastNestedLoopJoin/CartesianProduct. This is the rewrite "
    "that keeps interval analytics linear at 100 TB.",
)
def q67(spark: SparkSession, sf: str) -> DataFrame:
    from speculare_pgcdc_spark.operators.skewscale import bin_range_join

    ev = table(spark, sf, "events").select("event_id", "ts")
    pairs = bin_range_join(
        ev.withColumnRenamed("event_id", "ea").withColumnRenamed("ts", "ta"),
        ev.withColumnRenamed("event_id", "eb").withColumnRenamed("ts", "tb"),
        "ta",
        "tb",
        upper=300,
    )
    return pairs.select("ea", "eb").orderBy("ea", "eb")


@register(
    "q68_salted_agg",
    oracle="""
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(28,6))), 2) AS DOUBLE)
                   AS s
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Skew-proof two-phase aggregation: events has only 5 event_type "
    "keys (pathological skew for a single-phase shuffle agg); "
    "operators/skewscale.salted_agg spreads each key over 16 salted "
    "partials before the final merge. Exact (count + decimal sum) — "
    "the oracle is the plain one-phase GROUP BY.",
)
def q68(spark: SparkSession, sf: str) -> DataFrame:
    from speculare_pgcdc_spark.operators.skewscale import salted_agg

    return salted_agg(
        table(spark, sf, "events"), "event_type", "value"
    ).orderBy("event_type")


@register(
    "q69_rank_family",
    oracle="""
        SELECT o_orderkey,
               RANK() OVER w AS rnk,
               DENSE_RANK() OVER w AS drnk,
               NTILE(4) OVER w AS quartile,
               ROUND(PERCENT_RANK() OVER w, 4) AS prnk
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice DESC, o_orderkey)
        ORDER BY o_orderkey
    """,
    doc="W1 completion: rank / dense_rank / ntile / percent_rank over "
    "one window definition (q20 covers row_number). One shuffle on the "
    "partition key; all four functions share the same sort.",
)
def q69(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        table(spark, sf, "orders")
        .select(
            "o_orderkey",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 4).alias("prnk"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "q70_multiset_ops",
    oracle="""
        SELECT x, CAST(COUNT(*) AS BIGINT) AS c FROM (
            SELECT c_nationkey AS x FROM customer
            EXCEPT ALL
            SELECT s_nationkey FROM supplier)
        GROUP BY x ORDER BY x
    """,
    doc="U2 multiset variant: EXCEPT ALL keeps per-row multiplicity "
    "(count-aware anti-difference) — Spark exceptAll plans it as an "
    "aggregate of signed counts, one shuffle, no row explosion.",
)
def q70(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer").select(F.col("c_nationkey").alias("x"))
    s = table(spark, sf, "supplier").select(F.col("s_nationkey").alias("x"))
    return (
        c.exceptAll(s)
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("x")
    )


@register(
    "q72_gapfill_locf",
    oracle="""
        WITH sparse AS (
            SELECT user_id,
                   CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS c,
                   CAST(CAST(ROUND(CAST(
                            SUM(CAST(value AS DECIMAL(28,6))) * 1000000
                            AS DOUBLE) / (COUNT(*) * 100))
                        AS BIGINT) AS DOUBLE) / 10000 AS v
            FROM events GROUP BY 1, 2),
        grid AS (
            SELECT user_id, unnest(generate_series(mn, mx)) AS bucket
            FROM (SELECT user_id, MIN(bucket) mn, MAX(bucket) mx
                  FROM sparse GROUP BY user_id)),
        joined AS (
            SELECT g.user_id, g.bucket, COALESCE(s.c, 0) AS c, s.v
            FROM grid g LEFT JOIN sparse s
              ON s.user_id = g.user_id AND s.bucket = g.bucket)
        SELECT user_id, bucket, c,
               last_value(v IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS v_locf
        FROM joined ORDER BY user_id, bucket
    """,
    doc="Time-series gap fill + LOCF (TimescaleDB time_bucket_gapfill/"
    "locf analog — the reference's monitoring domain): dense per-user "
    "hourly grid from each user's first to last bucket, zero counts in "
    "gaps, mean value carried forward. operators/timeseries.gapfill_"
    "locf; grid size is keys x buckets, independent of raw row count.",
)
def q72(spark: SparkSession, sf: str) -> DataFrame:
    from speculare_pgcdc_spark.operators.timeseries import gapfill_locf

    return gapfill_locf(
        table(spark, sf, "events"), key="user_id"
    ).orderBy("user_id", "bucket")


@register(
    "q73_gapfill_interpolate",
    oracle="""
        WITH sparse AS (
            SELECT user_id,
                   CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS c,
                   CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6)))
                        * 1000000 AS DOUBLE) / COUNT(*)) AS BIGINT) AS mu
            FROM events GROUP BY 1, 2),
        grid AS (
            SELECT user_id, unnest(generate_series(mn, mx)) AS bucket
            FROM (SELECT user_id, MIN(bucket) mn, MAX(bucket) mx
                  FROM sparse GROUP BY user_id)),
        joined AS (
            SELECT g.user_id, g.bucket, COALESCE(s.c, 0) AS c, s.mu
            FROM grid g LEFT JOIN sparse s
              ON s.user_id = g.user_id AND s.bucket = g.bucket),
        fr AS (
            SELECT user_id, bucket, c,
                   last_value(CASE WHEN mu IS NOT NULL THEN
                       struct_pack(mu := mu, b := bucket) END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY bucket
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS p,
                   first_value(CASE WHEN mu IS NOT NULL THEN
                       struct_pack(mu := mu, b := bucket) END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY bucket
                             ROWS BETWEEN CURRENT ROW
                             AND UNBOUNDED FOLLOWING) AS n
            FROM joined)
        SELECT user_id, bucket, c,
               CAST(CAST(ROUND(CASE WHEN n.b = p.b
                     THEN CAST(p.mu AS DOUBLE) / 100
                     ELSE CAST(p.mu * (n.b - bucket)
                               + n.mu * (bucket - p.b) AS DOUBLE)
                          / (CAST(n.b - p.b AS DOUBLE) * 100)
                     END) AS BIGINT) AS DOUBLE) / 10000 AS v_interp
        FROM fr ORDER BY user_id, bucket
    """,
    doc="Time-series gap fill with LINEAR interpolation between the "
    "surrounding non-empty buckets (Timescale interpolate analog; LOCF "
    "variant is q72). Ends of the series stay null. Bucket means are "
    "quantized to integer micro-units so the lerp is exact integer "
    "arithmetic + one final double division — bit-identical across "
    "engines (naive double lerp drifts 1 ulp and flips the 4th "
    "decimal). operators/timeseries.gapfill_interpolate.",
)
def q73(spark: SparkSession, sf: str) -> DataFrame:
    from speculare_pgcdc_spark.operators.timeseries import (
        gapfill_interpolate,
    )

    return gapfill_interpolate(
        table(spark, sf, "events"), key="user_id"
    ).orderBy("user_id", "bucket")


@register(
    "q74_string_funcs2",
    oracle="""
        SELECT p_partkey,
               lpad(p_brand, 12, '*') AS pad,
               translate(p_type, 'ae', 'AE') AS tr,
               reverse(p_name) AS rev,
               repeat(left(p_brand, 2), 2) AS rep,
               CAST(instr(p_name, 'a') AS BIGINT) AS pos,
               split_part(p_type, ' ', 1) AS first_word,
               CAST(ascii(p_name) AS INT) AS a0
        FROM part ORDER BY p_partkey
    """,
    doc="F1 completion: lpad / translate / reverse / repeat / left / "
    "instr / split_part / ascii (q28 covers the first batch). All "
    "codegen'd column expressions — map-only.",
)
def q74(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "part")
        .select(
            "p_partkey",
            F.lpad("p_brand", 12, "*").alias("pad"),
            F.translate("p_type", "ae", "AE").alias("tr"),
            F.reverse("p_name").alias("rev"),
            F.repeat(F.substring("p_brand", 1, 2), 2).alias("rep"),
            F.instr("p_name", "a").cast("bigint").alias("pos"),
            F.split_part("p_type", F.lit(" "), F.lit(1)).alias("first_word"),
            F.ascii("p_name").alias("a0"),
        )
        .orderBy("p_partkey")
    )


@register(
    "q76_cube",
    oracle="""
        SELECT COALESCE(o_orderstatus, 'ALL') AS st,
               COALESCE(o_orderpriority, 'ALL') AS pri,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY st, pri, c
    """,
    doc="A4 completion: CUBE (all 2^k grouping sets in one pass — "
    "Spark expands to a single Expand + hash agg, not k separate "
    "scans; q17 covers ROLLUP). GROUPING-normalized labels so both "
    "engines agree on NULL-vs-label.",
)
def q76(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("st"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("pri"),
            "c",
        )
        .orderBy("st", "pri", "c")
    )


@register(
    "q77_approx_percentiles",
    oracle=None,  # t-digest estimates are engine-specific; exact twin q63
    doc="Approximate percentiles via approx_percentile (t-digest-style "
    "sketch, accuracy=10000): constant memory per group, map-side "
    "mergeable — the percentile path at 100 TB, where exact "
    "percentile (q63) must buffer each group. Estimate-vs-exact error "
    "is pinned in tests/test_oracle.py.",
)
def q77(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "events")
        .groupBy("event_type")
        .agg(
            F.round(
                F.expr("approx_percentile(value, 0.5, 10000)"), 2
            ).alias("p50"),
            F.round(
                F.expr("approx_percentile(value, 0.9, 10000)"), 2
            ).alias("p90"),
        )
        .orderBy("event_type")
    )


@register(
    "q78_stratified_sample",
    oracle=None,  # sampling is engine-specific by construction
    doc="Stratified sampling (training-data selection primitive): "
    "sampleBy(event_type) with per-stratum fractions and a FIXED seed "
    "— Bernoulli per row, so it is a narrow map (no shuffle) and "
    "deterministic for a given seed + partitioning, which makes "
    "dataset builds reproducible. tests/test_oracle.py pins "
    "determinism and per-stratum rates; downsampling hot strata / "
    "upweighting rare ones is THE curriculum knob at 100 TB.",
)
def q78(spark: SparkSession, sf: str) -> DataFrame:
    fractions = {
        "click": 0.1,
        "view": 0.5,
        "purchase": 1.0,
        "signup": 1.0,
        "error": 1.0,
    }
    return (
        table(spark, sf, "events")
        .sampleBy("event_type", fractions, seed=42)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("event_type")
    )


@register(
    "q80_range_frame_binned",
    oracle="""
        SELECT o_orderkey,
               COUNT(*) OVER (ORDER BY o_totalprice
                   RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS cnt
        FROM orders ORDER BY o_orderkey
    """,
    doc="W4 at scale: the SAME rows as q23's global RANGE frame, "
    "computed without a single-partition window over the data — "
    "operators/skewscale.binned_range_count decomposes the frame count "
    "into two binned prefix counts (distinct-value agg -> per-bin "
    "cumulative -> bin-partitioned window -> broadcast reattach). The "
    "only unpartitioned stage is over the one-row-per-bin frame. Same "
    "oracle SQL as q23; plan-linted in tests/test_plans.py.",
)
def q80(spark: SparkSession, sf: str) -> DataFrame:
    from speculare_pgcdc_spark.operators.skewscale import binned_range_count

    orders = table(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    return (
        binned_range_count(orders, "o_totalprice", preceding=100)
        .select("o_orderkey", "cnt")
        .orderBy("o_orderkey")
    )


@register(
    "q94_asof_tolerance",
    oracle="""
        SELECT event_id, prior_id FROM (
            SELECT l.event_id, r.event_id AS prior_id,
                   ROW_NUMBER() OVER (PARTITION BY l.event_id
                       ORDER BY r.ts DESC, r.event_id DESC) AS rn
            FROM events l JOIN events r
              ON l.user_id = r.user_id
             AND r.ts < l.ts
             AND epoch(l.ts) - epoch(r.ts) <= 300)
        WHERE rn = 1 ORDER BY event_id
    """,
    doc="J7 as-of join with TOLERANCE (pandas merge_asof's staleness "
    "bound): latest strictly-prior event of the same user no older "
    "than 300 s; staler-only matches drop out. The tolerance predicate "
    "both changes semantics AND bounds the candidate set the argmax "
    "aggregates over — the practical fix for dense keys where the "
    "unbounded as-of materializes (left x all-priors) intermediates. "
    "operators/asof.asof_join(tolerance=300).",
)
def q94(spark: SparkSession, sf: str) -> DataFrame:
    from speculare_pgcdc_spark.operators.asof import asof_join

    e = table(spark, sf, "events")
    left = e.select(
        "event_id",
        F.col("user_id").alias("l_user"),
        F.col("ts").alias("l_ts"),
    )
    right = e.select(
        F.col("user_id").alias("r_user"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("prior_id"),
    )
    return asof_join(
        left,
        right,
        left_key="l_user",
        right_key="r_user",
        left_time="l_ts",
        right_time="r_ts",
        group_cols=["event_id"],
        value_col="prior_id",
        strict=True,
        tolerance=300,
    ).orderBy("event_id")


@register(
    "q98_funnel",
    oracle="""
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'click' GROUP BY user_id),
    s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
        JOIN s1 ON s1.user_id = e.user_id
        WHERE e.event_type = 'view' AND e.ts > s1.t1
        GROUP BY e.user_id),
    s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
        JOIN s2 ON s2.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        GROUP BY e.user_id)
    SELECT * FROM (
        SELECT 1 AS step, 'click' AS event_type,
               CAST(COUNT(*) AS BIGINT) AS users FROM s1
        UNION ALL
        SELECT 2, 'view', CAST(COUNT(*) AS BIGINT) FROM s2
        UNION ALL
        SELECT 3, 'purchase', CAST(COUNT(*) AS BIGINT) FROM s3)
    ORDER BY step
    """,
    doc="ORDERED funnel (click -> view -> purchase, strictly "
    "increasing ts): per-user first-click, first view AFTER it, first "
    "purchase after THAT — the product-analytics workload the "
    "subscription stream feeds. Plan: each step is one filtered "
    "aggregation plus an equi-join on user_id against the previous "
    "step's (user, ts) frame — all three shuffles hash on the SAME "
    "key, so a cluster reuses the partitioning (no window over the "
    "whole event stream; per-step frames shrink monotonically). "
    "Identical step chain in the DuckDB oracle.",
)
def q98(spark: SparkSession, sf: str) -> DataFrame:
    e = table(spark, sf, "events").select("user_id", "event_type", "ts")

    def first_after(prev: DataFrame, etype: str, tcol: str, prev_t: str):
        return (
            e.filter(F.col("event_type") == etype)
            .join(prev.select("user_id", prev_t), "user_id")
            .filter(F.col("ts") > F.col(prev_t))
            .groupBy("user_id")
            .agg(F.min("ts").alias(tcol))
        )

    s1 = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = first_after(s1, "view", "t2", "t1")
    s3 = first_after(s2, "purchase", "t3", "t2")

    def row(step, etype, frame):
        return frame.agg(
            F.lit(step).alias("step"),
            F.lit(etype).alias("event_type"),
            F.count(F.lit(1)).cast("bigint").alias("users"),
        )

    return (
        row(1, "click", s1)
        .unionByName(row(2, "view", s2))
        .unionByName(row(3, "purchase", s3))
        .orderBy("step")
    )


@register(
    "q99_retention_cohorts",
    oracle="""
    WITH firsts AS (
        SELECT user_id, MIN(ts) AS t0 FROM events GROUP BY user_id),
    marks AS (
        SELECT DISTINCT e.user_id,
               CAST(FLOOR(epoch(f.t0) / 604800.0) AS BIGINT) AS cohort_week,
               CAST(FLOOR((epoch(e.ts) - epoch(f.t0)) / 604800.0) AS BIGINT)
                   AS week_offset
        FROM events e JOIN firsts f ON f.user_id = e.user_id)
    SELECT cohort_week, week_offset,
           CAST(COUNT(*) AS BIGINT) AS active_users
    FROM marks GROUP BY cohort_week, week_offset
    ORDER BY cohort_week, week_offset
    """,
    doc="Retention cohort matrix: users bucketed by the week of their "
    "FIRST event; active_users counts distinct users per (cohort_week, "
    "week offset since their own t0). Week arithmetic is pure epoch "
    "division (functions.epoch_seconds — identical in DuckDB's "
    "epoch(), and NTZ-proof against the fixture dtype flip) rather "
    "than calendar date_trunc, so engines cannot disagree on week "
    "boundaries. Plan: one per-user min agg + one equi-join back on "
    "user_id + DISTINCT + one final agg — both shuffles key on "
    "user_id first, reusable partitioning; no window.",
)
def q99(spark: SparkSession, sf: str) -> DataFrame:
    from speculare_pgcdc_spark.functions import epoch_seconds

    e = table(spark, sf, "events").select("user_id", "ts")
    firsts = e.groupBy("user_id").agg(F.min("ts").alias("t0"))
    week = 604800.0
    marks = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            F.floor(epoch_seconds("t0") / week)
            .cast("bigint")
            .alias("cohort_week"),
            F.floor(
                (epoch_seconds("ts") - epoch_seconds("t0")) / week
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .distinct()
    )
    return (
        marks.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("bigint").alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "q114_ewma",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_id,
                   list(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 7 PRECEDING AND CURRENT ROW
                   ) AS xs
            FROM events
        )
        SELECT user_id, event_id,
               CAST(ROUND(
                   list_sum(list_transform(range(len(xs)),
                       i -> xs[i + 1] * pow(0.5, len(xs) - 1 - i)))
                   / list_sum(list_transform(range(len(xs)),
                       i -> pow(0.5, len(xs) - 1 - i))), 4)
               AS DOUBLE) AS ewma
        FROM seq
        ORDER BY user_id, event_id
    """,
    doc="Exponentially weighted moving average per user (half-life "
    "smoothing, the time-series feature-engineering staple): a "
    "BOUNDED 8-row window frame collects the trailing values, then a "
    "JVM-side higher-order-function fold (zip_with + aggregate) "
    "applies the 0.5^age decay — no Python, no unbounded frame, one "
    "shuffle on user_id. The bounded frame is the scale contract: "
    "state per row is O(8), not O(history), at any corpus size.",
)
def q114(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-7, 0)
    )
    xs = F.collect_list("value").over(w)
    weights = F.expr(
        "transform(sequence(size(xs) - 1, 0),"
        " a -> pow(0.5, cast(a as double)))"
    )
    num = F.expr(
        "aggregate(zip_with(xs, ws, (x, w) -> x * w),"
        " cast(0 as double), (acc, v) -> acc + v)"
    )
    den = F.expr(
        "aggregate(ws, cast(0 as double), (acc, v) -> acc + v)"
    )
    return (
        table(spark, sf, "events")
        .select("user_id", "event_id", "ts", "value")
        .withColumn("xs", xs)
        .withColumn("ws", weights)
        .select(
            "user_id",
            "event_id",
            F.round(num / den, 4).cast("double").alias("ewma"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "q115_fuzzy_match",
    oracle="""
        SELECT a.p_brand, CAST(COUNT(*) AS BIGINT) AS pairs
        FROM part a JOIN part b
          ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        WHERE levenshtein(a.p_name, b.p_name) <= 2
        GROUP BY a.p_brand
        ORDER BY a.p_brand
    """,
    doc="Edit-distance fuzzy matching (entity-resolution primitive): "
    "candidate pairs come from an EQUI-join on the blocking key "
    "(p_brand) — never an all-pairs cross join — and levenshtein() "
    "evaluates JVM-side on the bucketed candidates only. At 100 TB "
    "the blocking key bounds the quadratic term to the largest "
    "bucket, the same contract as the LSH band join in "
    "operators/dedup.py; a coarser/finer key (brand+first-token) "
    "tunes bucket occupancy without touching the plan shape.",
)
def q115(spark: SparkSession, sf: str) -> DataFrame:
    part = table(spark, sf, "part").select("p_partkey", "p_brand", "p_name")
    a = part.select(
        F.col("p_brand"),
        F.col("p_partkey").alias("a_key"),
        F.col("p_name").alias("a_name"),
    )
    b = part.select(
        F.col("p_brand").alias("b_brand"),
        F.col("p_partkey").alias("b_key"),
        F.col("p_name").alias("b_name"),
    )
    return (
        a.join(
            b,
            (F.col("p_brand") == F.col("b_brand"))
            & (F.col("a_key") < F.col("b_key")),
        )
        .filter(F.levenshtein(F.col("a_name"), F.col("b_name")) <= 2)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("pairs"))
        .orderBy("p_brand")
    )


@register(
    "q116_stats_aggregates",
    oracle="""
        SELECT l_returnflag,
               CAST(ROUND(corr(l_extendedprice, l_quantity), 6) AS DOUBLE)
                   AS corr_pq,
               CAST(ROUND(covar_samp(l_extendedprice, l_quantity), 2)
                   AS DOUBLE) AS covar_pq,
               CAST(ROUND(regr_slope(l_extendedprice, l_quantity), 4)
                   AS DOUBLE) AS slope,
               CAST(ROUND(regr_intercept(l_extendedprice, l_quantity), 2)
                   AS DOUBLE) AS intercept
        FROM lineitem
        GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="Statistical aggregates (feature-engineering staple): per-group "
    "Pearson correlation, sample covariance, and OLS slope/intercept "
    "via the built-in regr_* family — single-pass, map-side partial, "
    "JVM-side (Welford-style merge states under the hood, the same "
    "reason they scale: no per-group buffering). Ratio-of-sums "
    "quantities are rounded at matched precision for the cross-engine "
    "hash (corr is scale-free -> 6dp; covar/intercept carry price "
    "units -> 2dp).",
)
def q116(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_extendedprice", "l_quantity"), 6)
            .cast("double").alias("corr_pq"),
            F.round(F.covar_samp("l_extendedprice", "l_quantity"), 2)
            .cast("double").alias("covar_pq"),
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4)
            .cast("double").alias("slope"),
            F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 2)
            .cast("double").alias("intercept"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q117_unpivot",
    oracle="""
        SELECT metric,
               CAST(ROUND(SUM(CAST(val AS DECIMAL(28,6))), 2) AS DOUBLE)
                   AS total
        FROM (
            SELECT 'l_quantity' AS metric, l_quantity AS val FROM lineitem
            UNION ALL
            SELECT 'l_extendedprice', l_extendedprice FROM lineitem
            UNION ALL
            SELECT 'l_discount', l_discount FROM lineitem
            UNION ALL
            SELECT 'l_tax', l_tax FROM lineitem
        )
        GROUP BY metric ORDER BY metric
    """,
    doc="Unpivot/melt (wide -> long reshaping): DataFrame.unpivot "
    "compiles to a single Expand node — one pass over the fact, rows "
    "multiplied map-side, NO join/union of N scans (the UNION ALL "
    "oracle phrasing would scan lineitem 4x; Expand reads it once). "
    "The long-form sum per metric is the hash check.",
)
def q117(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    return (
        li.unpivot(
            ids=[],
            values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
            variableColumnName="metric",
            valueColumnName="val",
        )
        .groupBy("metric")
        .agg(
            F.round(F.sum(F.col("val").cast("decimal(28,6)")), 2)
            .cast("double")
            .alias("total")
        )
        .orderBy("metric")
    )


@register(
    "q118_distribution_windows",
    oracle="""
        SELECT event_id,
               CAST(ROW_NUMBER() OVER w * 1000000
                    // CAST(COUNT(*) OVER (PARTITION BY user_id)
                            AS HUGEINT) AS BIGINT) AS cd_ppm,
               nth_value(value, 2) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS second_seen
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY event_id
    """,
    doc="Distribution window family completion (W1 tail): the "
    "per-user empirical CDF position (cume_dist's definition — "
    "rows-at-or-before over partition size; under the TOTAL "
    "(ts, event_id) order every row is its own peer group, so it is "
    "exactly rn/n) and nth_value with an explicit running frame for "
    "the second-observed value. The CDF publishes as exact integer "
    "ppm (rn * 1e6 DIV n): ROUND(cume_dist(), 6) let the two "
    "engines' c/n doubles land on opposite sides of a 6th-decimal "
    "tie — first seen when the skew01 fixture's hot user produced a "
    "dyadic rank ratio (SKEW_SWEEP_r10). Both partition on user_id "
    "(one shuffle, no global window).",
)
def q118(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wp = Window.partitionBy("user_id")
    return (
        table(spark, sf, "events")
        .select(
            "event_id",
            F.row_number().over(wo).cast("bigint").alias("rn"),
            F.count(F.lit(1)).over(wp).alias("n"),
            F.nth_value("value", 2).over(wf).alias("second_seen"),
        )
        .select(
            "event_id",
            F.expr("CAST(rn * 1000000 DIV n AS BIGINT)")
            .alias("cd_ppm"),
            "second_seen",
        )
        .orderBy("event_id")
    )


@register(
    "q119_sequence_transitions",
    oracle="""
        SELECT event_type AS src, next_type AS dst,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM (
            SELECT event_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS next_type
            FROM events
        )
        WHERE next_type IS NOT NULL
        GROUP BY src, dst ORDER BY src, dst
    """,
    doc="Sequence-transition (bigram) matrix over per-user event "
    "streams — the Markov-chain / session-flow primitive (and the "
    "token-bigram shape for corpus statistics): one lead() window on "
    "the user_id shuffle, then a hash agg over the 25 (src, dst) "
    "pairs. No self-join of the event stream (the naive phrasing "
    "joins events to itself on consecutive ranks).",
)
def q119(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        table(spark, sf, "events")
        .select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("src", "dst")
    )


@register(
    "q120_histogram",
    oracle="""
        SELECT CAST(CASE
                 WHEN o_totalprice < 0 THEN 0
                 WHEN o_totalprice >= 600000 THEN 21
                 ELSE 1 + FLOOR(o_totalprice / 30000)
               END AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,6))), 2)
                    AS DOUBLE) AS total
        FROM orders
        GROUP BY bucket ORDER BY bucket
    """,
    doc="Equi-width histogram via width_bucket(0, 600000, 20): bucket "
    "assignment is a map-side expression (no sort, no sampling pass), "
    "one hash agg over at most 22 buckets — the profile-a-column "
    "primitive that stays O(buckets) at any scale. Oracle phrases the "
    "same binning as clamped FLOOR arithmetic.",
)
def q120(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "orders")
        .select(
            F.width_bucket(
                "o_totalprice", F.lit(0.0), F.lit(600000.0), F.lit(20)
            ).alias("bucket"),
            "o_totalprice",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(28,6)")), 2)
            .cast("double")
            .alias("total"),
        )
        .orderBy("bucket")
    )


def _pagerank_oracle(iters: int = 5) -> str:
    """Unroll operators/graph.pagerank's iterations as staged CTEs —
    the same determinism trick as _kmeans_sql.py: per-iteration
    ROUND(..., 12) + DECIMAL(28,18) contribution sums make every
    iteration bit-identical across engines."""
    pair = (
        "SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,\n"
        "                's' || CAST(l_suppkey AS VARCHAR) AS dst\n"
        "  FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    )
    ctes = [
        f"edges AS ({pair}\n  UNION\n"
        "  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR),\n"
        "                  'c' || CAST(o_custkey AS VARCHAR)\n"
        "  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)",
        "nodes AS (SELECT DISTINCT src AS node FROM edges)",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)",
        "deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src)",
        "r0 AS (SELECT node,"
        " ROUND(CAST(1.0 AS DOUBLE) / (SELECT n FROM nn), 12) AS rank"
        " FROM nodes)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"r{i} AS (SELECT e.dst AS node,\n"
            "    ROUND(CAST(0.15 AS DOUBLE) / (SELECT n FROM nn)\n"
            "          + CAST(0.85 AS DOUBLE) * CAST(SUM(CAST(\n"
            f"              r.rank / deg.d AS DECIMAL(28,18))) AS DOUBLE),\n"
            "          12) AS rank\n"
            f"  FROM edges e JOIN r{i - 1} r ON e.src = r.node\n"
            "  JOIN deg ON e.src = deg.src\n"
            "  GROUP BY e.dst)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, rank FROM r{iters} ORDER BY node"
    )


@register(
    "q121_pagerank",
    oracle=_pagerank_oracle(),
    doc="PageRank (5 damped iterations) over the bidirected bipartite "
    "customer-supplier trade graph — the iterative-algorithm shape "
    "(driver loop, distributed joins; operators/graph.py). Per "
    "iteration: one edges-to-ranks equi-join + one incoming-edge hash "
    "agg, lineage truncated per round via localCheckpoint. "
    "Deterministic by the same contract as the k-means oracle "
    "(per-iteration rounding + exact DECIMAL contribution sums), so "
    "the staged-CTE unroll hash-matches bit-for-bit.",
)
def q121(spark: SparkSession, sf: str) -> DataFrame:
    from speculare_pgcdc_spark.operators.graph import pagerank

    li = table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    orders = table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias(
                "cnode"
            ),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias(
                "snode"
            ),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("cnode").alias("src"), F.col("snode").alias("dst")
    ).union(
        pairs.select(
            F.col("snode").alias("src"), F.col("cnode").alias("dst")
        )
    )
    return pagerank(edges, iters=5).orderBy("node")


@register(
    "q124_market_basket",
    oracle="""
        WITH items AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        )
        SELECT a.l_partkey AS pa, b.l_partkey AS pb,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY pa, pb
        ORDER BY n_orders DESC, pa, pb
        LIMIT 20
    """,
    doc="Market-basket co-occurrence (frequent-pair mining, the "
    "first pass of FP-growth-style association rules): distinct "
    "(order, part) items self-join on the ORDER key — quadratic only "
    "in basket size (~4-7 items), never in catalog or order count — "
    "then one pair hash agg + TakeOrdered top-20. The basket-bounded "
    "self-join is the same blocking contract as q115's brand key.",
)
def q124(spark: SparkSession, sf: str) -> DataFrame:
    items = (
        table(spark, sf, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = items.select(
        "l_orderkey", F.col("l_partkey").alias("pa")
    )
    b = items.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("pb")
    )
    return (
        a.join(
            b,
            (F.col("l_orderkey") == F.col("ok2"))
            & (F.col("pa") < F.col("pb")),
        )
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "pa", "pb")
        .limit(20)
    )


@register(
    "q125_session_assignment",
    oracle="""
        WITH gaps AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN ts - lag(ts) OVER w <= INTERVAL 30 MINUTE
                        THEN 0 ELSE 1 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sessioned AS (
            SELECT user_id, ts,
                   SUM(new_s) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS session_idx
            FROM gaps
        )
        SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MIN(ts) AS t_start, MAX(ts) AS t_end
        FROM sessioned
        GROUP BY user_id, session_idx
        ORDER BY user_id, session_idx
    """,
    doc="Gap-based session ASSIGNMENT (30-min timeout): unlike q38's "
    "session_window AGGREGATE, this returns the per-event session id "
    "— the labeling a feature pipeline joins back onto raw events. "
    "lag + running integer SUM on one user_id shuffle (both windows "
    "share the same partitioning, so Spark plans ONE exchange); "
    "integer cumsum is order-exact, so no rounding contract needed.",
)
def q125(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # microsecond-exact gap test: cast-to-long is SECONDS (truncated),
    # which moves the 30-min boundary by up to 1 s against the
    # oracle's INTERVAL comparison — first seen as 3 phantom sessions
    # on the skew01 sweep (SKEW_SWEEP_r10) when reshuffled users
    # produced gaps within a second of exactly 30 min
    gap_new = F.when(
        F.unix_micros(F.col("ts"))
        - F.lag(F.unix_micros(F.col("ts"))).over(wo)
        <= 1800 * 1_000_000,
        0,
    ).otherwise(1)
    return (
        table(spark, sf, "events")
        .select("user_id", "event_id", "ts")
        .withColumn("new_s", gap_new)
        .withColumn("session_idx", F.sum("new_s").over(wrun))
        .groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("t_start"),
            F.max("ts").alias("t_end"),
        )
        .orderBy("user_id", "session_idx")
    )


@register(
    "q127_time_weighted_avg",
    oracle="""
        WITH pts AS (
            SELECT user_id, value,
                   CAST(FLOOR(epoch(ts)) AS BIGINT) AS t,
                   CAST(FLOOR(epoch(lead(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ))) AS BIGINT) AS t_next
            FROM events
        )
        SELECT user_id,
               CAST(ROUND(
                   (SUM(CAST(ROUND(value * (t_next - t) * 1000000, 0)
                             AS BIGINT)) / 1000000.0)
                   / SUM(t_next - t), 4) AS DOUBLE) AS twa
        FROM pts
        WHERE t_next IS NOT NULL AND t_next > t
        GROUP BY user_id
        HAVING SUM(t_next - t) > 0
        ORDER BY user_id
    """,
    doc="Time-weighted average over irregular samples (the TimescaleDB "
    "time_weight('LOCF') staple — the honest mean when sampling is "
    "bursty): each point is held until the next one (left-Riemann / "
    "LOCF), weighted by its holding interval. One lead() window on "
    "the user shuffle + one agg reusing the same partitioning. "
    "Interval-weighted products are rounded to exact integer "
    "micro-units before the sum (BIGINT addition is exact and "
    "order-free) so shuffle order can't move the accumulation — the "
    "integer flavor of the decimal determinism contract, dodging "
    "cross-engine double->decimal cast rounding.",
)
def q127(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    from speculare_pgcdc_spark.functions import epoch_seconds

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # FLOOR, not cast: double->bigint CAST truncates in Spark but
    # rounds in DuckDB — on sub-second timestamps that skews dt by
    # +/-1s per row and the mismatch compounds across the weighted sum
    t = F.floor(epoch_seconds("ts")).cast("bigint")
    pts = (
        table(spark, sf, "events")
        .select("user_id", "event_id", "ts", "value")
        .withColumn("t", t)
        .withColumn("t_next", F.lead("t").over(w))
        .filter(F.col("t_next").isNotNull() & (F.col("t_next") > F.col("t")))
        .withColumn("dt", F.col("t_next") - F.col("t"))
    )
    return (
        pts.groupBy("user_id")
        .agg(
            F.round(
                (
                    F.sum(
                        F.round(
                            F.col("value") * F.col("dt") * 1000000, 0
                        ).cast("bigint")
                    )
                    / F.lit(1000000.0)
                )
                / F.sum("dt"),
                4,
            ).cast("double").alias("twa"),
        )
        .orderBy("user_id")
    )


@register(
    "q128_ohlc_bars",
    oracle="""
        WITH ranked AS (
            SELECT event_type, value,
                   date_trunc('day', ts) AS day,
                   ROW_NUMBER() OVER w_asc AS rn_a,
                   ROW_NUMBER() OVER w_desc AS rn_d
            FROM events
            WINDOW w_asc AS (PARTITION BY event_type, date_trunc('day', ts)
                             ORDER BY ts, event_id),
                   w_desc AS (PARTITION BY event_type, date_trunc('day', ts)
                              ORDER BY ts DESC, event_id DESC)
        )
        SELECT event_type, day,
               MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
               MAX(value) AS high,
               MIN(value) AS low,
               MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM ranked
        GROUP BY event_type, day
        ORDER BY event_type, day
    """,
    doc="OHLC candlestick bars per (series, day) — the downsample-for- "
    "display / financial-rollup staple (TimescaleDB ohlc/candlestick "
    "agg): open/close are first/last by a TOTAL (ts, event_id) order "
    "(two row_number windows sharing ONE (event_type, day) shuffle), "
    "high/low/count ride the same grouped agg. No value rounding "
    "needed: open/high/low/close are SELECTED values, not arithmetic.",
)
def q128(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    day = F.date_trunc("day", F.col("ts"))
    base = (
        table(spark, sf, "events")
        .select("event_type", "event_id", "ts", "value")
        .withColumn("day", day)
    )
    wa = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    wd = Window.partitionBy("event_type", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        base.withColumn("rn_a", F.row_number().over(wa))
        .withColumn("rn_d", F.row_number().over(wd))
        .groupBy("event_type", "day")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "q129_grouping_sets",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,6))), 2)
                    AS DOUBLE) AS total,
               CAST(GROUPING(o_orderstatus) * 2
                    + GROUPING(o_orderpriority) AS BIGINT) AS gid
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY gid, o_orderstatus, o_orderpriority
    """,
    doc="Explicit GROUPING SETS (A4 completion beyond rollup q17 / "
    "cube q76): three hand-picked sets — per-status, per-priority, "
    "grand total — computed in ONE Expand pass (3x row multiplication "
    "map-side, one shuffle), not three scans UNIONed. grouping_id "
    "disambiguates the NULL-as-aggregate rows from genuine NULLs. "
    "Phrased through the spark.sql entry (the engine's SQL surface, "
    "engine.sql) over registered views — same Catalyst plan as the "
    "DataFrame form.",
)
def q129(spark: SparkSession, sf: str) -> DataFrame:
    register_views(spark, sf)
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,6))), 2)
                    AS DOUBLE) AS total,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT)
                   AS gid
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY gid, o_orderstatus, o_orderpriority
    """)


@register(
    "q130_rfm_segmentation",
    oracle="""
        WITH base AS (
            SELECT o_custkey,
                   MAX(o_orderdate) AS last_order,
                   COUNT(*) AS freq,
                   SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS monetary
            FROM orders GROUP BY o_custkey
        )
        SELECT o_custkey,
               CAST(NTILE(4) OVER (ORDER BY last_order, o_custkey)
                    AS BIGINT) AS r_bucket,
               CAST(NTILE(4) OVER (ORDER BY freq, o_custkey)
                    AS BIGINT) AS f_bucket,
               CAST(NTILE(4) OVER (ORDER BY monetary, o_custkey)
                    AS BIGINT) AS m_bucket
        FROM base
        ORDER BY o_custkey
    """,
    doc="RFM segmentation (recency/frequency/monetary quartiles — the "
    "canonical customer-scoring rollup): one hash agg per customer, "
    "then all three EXACT quartile assignments in ONE banded-rank "
    "pass (operators/rankband.py with by=['metric'] — the r9-verdict "
    "one-pass rewrite): the customer aggregate unpivots to (metric, "
    "value, bin) rows via stack(), each metric's strictly-before "
    "count assembles from a metric-partitioned cumsum over a tiny "
    "bin-grain aggregate plus an in-(metric,bin) PARTITIONED prefix "
    "window, and a single o_custkey regroup pivots the buckets back "
    "— so no data-grain single-partition sort exists anywhere even "
    "though quartiles are a global property, and the three metrics "
    "share one subplan instead of paying 3x scheduling overhead on a "
    "customer-sized aggregate. ntile(4) is integer arithmetic on "
    "(row_number, n-per-metric) — bit-identical to the oracle's "
    "NTILE spec. Values compare as DECIMAL(38,6) (timestamps via "
    "unix_micros, both engines' sort order preserved); monetary sums "
    "ride decimal; every order key is totalized by o_custkey.",
)
def q130(spark: SparkSession, sf: str) -> DataFrame:
    from speculare_pgcdc_spark.operators.rankband import banded_ntile

    base = table(spark, sf, "orders").groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias(
            "monetary"
        ),
    )
    # unpivot to (metric, val, bin): val is the metric's sort key in a
    # common exactly-ordered type; bin is coarse + monotone in val
    long = base.select(
        "o_custkey",
        F.expr(
            "stack(3, "
            " 'r', CAST(unix_micros(last_order) AS DECIMAL(38,6)), "
            "      CAST(year(last_order) * 12 + month(last_order) "
            "           AS BIGINT), "
            " 'f', CAST(freq AS DECIMAL(38,6)), "
            "      CAST(freq AS BIGINT), "
            " 'm', CAST(monetary AS DECIMAL(38,6)), "
            "      CAST(FLOOR(monetary / 10000) AS BIGINT)"
            ") AS (metric, val, bin)"
        ),
    )
    ranked = banded_ntile(
        long,
        [F.col("val"), F.col("o_custkey")],
        F.col("bin"),
        4,
        out="bucket",
        by=["metric"],
    )

    def pick(m: str) -> F.Column:
        return F.max(
            F.when(F.col("metric") == m, F.col("bucket"))
        ).cast("bigint")

    return (
        ranked.groupBy("o_custkey")
        .agg(
            pick("r").alias("r_bucket"),
            pick("f").alias("f_bucket"),
            pick("m").alias("m_bucket"),
        )
        .orderBy("o_custkey")
    )


@register(
    "q131_ratio_to_report",
    oracle="""
        SELECT event_id,
               CAST(ROUND(
                   CAST(CAST(value AS DECIMAL(28,6)) AS DOUBLE)
                   / CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER (
                         PARTITION BY event_type) AS DOUBLE), 8)
               AS DOUBLE) AS share
        FROM events
        ORDER BY event_id
    """,
    doc="Ratio-to-report (share-of-group window): each event's value "
    "as a fraction of its type's total — an UNFRAMED aggregate window "
    "(one value per partition, broadcast back to every row by the "
    "same WindowExec pass; no join-back needed). The group total "
    "accumulates in decimal so the denominator is shuffle-order-"
    "exact; one event_type shuffle total.",
)
def q131(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("event_type")
    vdec = F.col("value").cast("decimal(28,6)")
    return (
        table(spark, sf, "events")
        .select(
            "event_id",
            F.round(
                vdec.cast("double")
                / F.sum(vdec).over(w).cast("double"),
                8,
            ).cast("double").alias("share"),
        )
        .orderBy("event_id")
    )


@register(
    "q132_mad_robust_stats",
    oracle="""
        WITH med AS (
            SELECT event_type,
                   quantile_cont(value, 0.5) AS med
            FROM events GROUP BY event_type
        )
        SELECT e.event_type,
               CAST(ROUND(m.med, 4) AS DOUBLE) AS med,
               CAST(ROUND(quantile_cont(abs(e.value - m.med), 0.5), 4)
                    AS DOUBLE) AS mad
        FROM events e JOIN med m ON e.event_type = m.event_type
        GROUP BY e.event_type, m.med
        ORDER BY e.event_type
    """,
    doc="Median absolute deviation per group (the robust spread "
    "statistic outlier filters want when stddev is poisoned by the "
    "outliers themselves): per-group median, broadcast back by an "
    "equi-join on the group key, median of absolute deviations. Two "
    "exact-percentile aggs on the same group shuffle; the scale "
    "variant swaps both for approx_percentile (same call shape, "
    "t-digest memory bound). Spark percentile == DuckDB "
    "quantile_cont (both linear-interpolation, pinned by q63).",
)
def q132(spark: SparkSession, sf: str) -> DataFrame:
    events = table(spark, sf, "events").select("event_type", "value")
    med = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    return (
        events.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(
            F.round(
                F.expr("percentile(abs(value - med), 0.5)"), 4
            ).cast("double").alias("mad")
        )
        .select(
            "event_type",
            F.round("med", 4).cast("double").alias("med"),
            "mad",
        )
        .orderBy("event_type")
    )


@register(
    "q133_topn_per_group",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders
        ) WHERE rn <= 3
        ORDER BY o_custkey, o_totalprice DESC, o_orderkey
    """,
    doc="Top-N per group (every analyst's second query): rank window "
    "on the group shuffle + filter — unlike global top-k (q25's "
    "TakeOrderedAndProject) this SHOULD window, because the cut is "
    "per-group; the (o_totalprice DESC, o_orderkey) key makes the cut "
    "total. At scale the window's sort is per-group within one "
    "shuffle — never global.",
)
def q133(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        table(spark, sf, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
        .orderBy("o_custkey", F.col("o_totalprice").desc(), "o_orderkey")
    )


@register(
    "q134_percent_change",
    oracle="""
        SELECT event_id,
               CAST(ROUND(
                   (value - lag(value) OVER w)
                   / nullif(abs(lag(value) OVER w), 0) * 100, 6)
               AS DOUBLE) AS pct_change
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY event_id
    """,
    doc="Percent change vs the previous observation per series (the "
    "returns/delta-encoding primitive): one lag() on the user "
    "shuffle; NULL for each series' first point and for zero "
    "baselines (nullif guards the division identically in both "
    "engines). Pure per-row arithmetic on identical operands — no "
    "accumulation, so no rounding contract beyond the final display "
    "round.",
)
def q134(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    return (
        table(spark, sf, "events")
        .select("event_id", "user_id", "ts", "value")
        .select(
            "event_id",
            F.round(
                (F.col("value") - prev)
                / F.nullif(F.abs(prev), F.lit(0.0))
                * 100,
                6,
            ).cast("double").alias("pct_change"),
        )
        .orderBy("event_id")
    )


@register(
    "q135_benford_digits",
    oracle="""
        SELECT digit, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (), 6)
                    AS DOUBLE) AS frac,
               CAST(ROUND(log10(1.0 + 1.0 / digit), 6) AS DOUBLE)
                   AS benford_expected
        FROM (
            SELECT CAST(FLOOR(o_totalprice
                       / pow(10, FLOOR(log10(o_totalprice))))
                   AS BIGINT) AS digit
            FROM orders WHERE o_totalprice > 0
        )
        GROUP BY digit ORDER BY digit
    """,
    doc="Benford first-digit distribution (the fraud/synthetic-data "
    "smell test): leading digit via log10/pow arithmetic (map-side, "
    "no string casts), one 9-group agg, observed fraction next to the "
    "log10(1+1/d) expectation. The share uses an unframed aggregate "
    "window over the 9-row aggregate — trivially small at any scale.",
)
def q135(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    digit = F.floor(
        F.col("o_totalprice")
        / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
    ).cast("bigint")
    counts = (
        table(spark, sf, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy()
    return (
        counts.select(
            "digit",
            "n",
            F.round(F.col("n") * 1.0 / F.sum("n").over(w), 6)
            .cast("double").alias("frac"),
            F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6)
            .cast("double").alias("benford_expected"),
        )
        .orderBy("digit")
    )


@register(
    "q136_entropy",
    oracle="""
        WITH c AS (
            SELECT user_id, event_type, COUNT(*) AS n
            FROM events GROUP BY user_id, event_type
        ),
        tot AS (
            SELECT user_id, SUM(n) AS tot FROM c GROUP BY user_id
        )
        SELECT c.user_id,
               CAST(ROUND(
                   SUM(CAST(
                       -(n * 1.0 / tot) * log2(n * 1.0 / tot)
                       AS DECIMAL(28,12))), 6)
               AS DOUBLE) AS entropy
        FROM c JOIN tot ON c.user_id = tot.user_id
        GROUP BY c.user_id
        ORDER BY c.user_id
    """,
    doc="Shannon entropy of each user's event-type distribution (the "
    "diversity/curation metric — low entropy flags bot-like or "
    "template-heavy sources in training-data pipelines): counts from "
    "one (user, type) agg, totals from its 5-row-per-user rollup "
    "joined back, -p*log2(p) terms summed in DECIMAL so shuffle order "
    "cannot move the double accumulation. Probabilities are exact "
    "integer ratios, so both engines compute identical term doubles.",
)
def q136(spark: SparkSession, sf: str) -> DataFrame:
    c = (
        table(spark, sf, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = c.groupBy("user_id").agg(F.sum("n").alias("tot"))
    p = F.col("n") * 1.0 / F.col("tot")
    term = (-p * F.log2(p)).cast("decimal(28,12)")
    return (
        c.join(tot, "user_id")
        .groupBy("user_id")
        .agg(
            # decimal-domain ROUND (q169 skew01 lesson, SCALING §6m)
            F.round(F.sum(term), 6)
            .cast("double").alias("entropy")
        )
        .orderBy("user_id")
    )


@register(
    "q137_gini_coefficient",
    oracle="""
        WITH ranked AS (
            SELECT c_nationkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY c_nationkey
                       ORDER BY o_totalprice, o_orderkey) AS rk
            FROM orders JOIN customer ON o_custkey = c_custkey
        )
        SELECT c_nationkey,
               CAST(ROUND(
                   (2.0 * CAST(SUM(CAST(rk * o_totalprice
                                        AS DECIMAL(28,6))) AS DOUBLE))
                   / (COUNT(*) * CAST(SUM(CAST(o_totalprice
                                        AS DECIMAL(28,6))) AS DOUBLE))
                   - (COUNT(*) + 1.0) / COUNT(*), 6)
               AS DOUBLE) AS gini
        FROM ranked
        GROUP BY c_nationkey
        ORDER BY c_nationkey
    """,
    doc="Gini coefficient of order-value concentration per nation (the "
    "inequality/skew metric — in pipelines, how concentrated a "
    "source's contribution is): rank within group by a TOTAL "
    "(value, key) order, then the closed-form "
    "G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n in one agg. Both weighted "
    "sums accumulate in DECIMAL; the rank window and the agg share "
    "the group shuffle.",
)
def q137(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    orders = table(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    w = Window.partitionBy("c_nationkey").orderBy(
        "o_totalprice", "o_orderkey"
    )
    ranked = (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .withColumn("rk", F.row_number().over(w))
    )
    wsum = F.sum(
        (F.col("rk") * F.col("o_totalprice")).cast("decimal(28,6)")
    ).cast("double")
    tsum = F.sum(F.col("o_totalprice").cast("decimal(28,6)")).cast("double")
    n = F.count(F.lit(1))
    return (
        ranked.groupBy("c_nationkey")
        .agg(
            F.round(
                (2.0 * wsum) / (n * tsum) - (n + 1.0) / n, 6
            ).cast("double").alias("gini")
        )
        .orderBy("c_nationkey")
    )


@register(
    "q140_winsorized_mean",
    oracle="""
        WITH bounds AS (
            SELECT event_type,
                   quantile_cont(value, 0.05) AS lo,
                   quantile_cont(value, 0.95) AS hi
            FROM events GROUP BY event_type
        )
        SELECT e.event_type,
               CAST(ROUND(
                   CAST(SUM(CAST(
                       CASE WHEN value < lo THEN lo
                            WHEN value > hi THEN hi
                            ELSE value END AS DECIMAL(28,6)))
                        AS DOUBLE) / COUNT(*), 4)
               AS DOUBLE) AS wmean
        FROM events e JOIN bounds b ON e.event_type = b.event_type
        GROUP BY e.event_type
        ORDER BY e.event_type
    """,
    doc="Winsorized mean per group (robust location: clamp to the "
    "[p05, p95] band, then average — the outlier-tolerant mean "
    "pipelines use for monitoring noisy metrics): one exact-"
    "percentile agg for the bounds, broadcast join-back, clamp via "
    "least/greatest, decimal-summed mean. Same two-pass shape as "
    "q132's MAD; the approx_percentile swap is the scale variant.",
)
def q140(spark: SparkSession, sf: str) -> DataFrame:
    events = table(spark, sf, "events").select("event_type", "value")
    bounds = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("lo"),
        F.expr("percentile(value, 0.95)").alias("hi"),
    )
    clamped = F.least(
        F.greatest(F.col("value"), F.col("lo")), F.col("hi")
    ).cast("decimal(28,6)")
    return (
        events.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(
                F.sum(clamped).cast("double") / F.count(F.lit(1)), 4
            ).cast("double").alias("wmean")
        )
        .orderBy("event_type")
    )
