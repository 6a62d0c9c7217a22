"""Training-pipeline run-prep queries (round 8): the operations a team
performs between "the corpus is curated" and "the training job reads
batches" — reproducible epoch ordering, duplicate-cluster shape audits,
robust outlier gates, snapshot drift checks, weighted medians for
mixture design, filter-reason accounting, and the one-row dataset card
that summarizes a corpus for a model card — q253-q259.

Reference scope note: the reference engine (src/) is a CDC forwarder
with no analytics; these rows extend SURVEY.md §2D with the
training-data-pipeline surface the build brief names as first-class.

Engine-stability conventions as everywhere: md5-derived determinism for
anything order/sample-shaped, FLOOR-scaled integer units for doubles,
exact integer DIV for ppm shares, value-grain windows instead of
data-grain global sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from speculare_pgcdc_spark.catalog import table
from speculare_pgcdc_spark.operators import textstats as ts
from speculare_pgcdc_spark.queries import register

#: q253: epochs in the demo permutation and rows emitted per epoch
SHUFFLE_EPOCHS = 3
SHUFFLE_TOPK = 8

#: q254/q259: duplicate-candidate grain — docs agreeing on their first
#: PREFIX_FP_CHARS characters. Exact-md5 clusters are all singletons in
#: the fixtures (and nearly so in a deduped corpus); the prefix grain is
#: the boilerplate/mirror-detection bucket that actually clusters.
PREFIX_FP_CHARS = 64

#: q255: outlier gate |dev| > MAD_K * mad (integer comparison)
MAD_K = 3

#: q258: gate thresholds (integer-exact; chosen non-vacuous on the
#: fixtures: every bit fires at sf0.001, three at sf0.01+)
GATE_MIN_TOKENS = 20       # bit 1: too short
GATE_STOP_NUM, GATE_STOP_DEN = 2, 10  # bit 2: stopword share > 2/10
GATE_MAX_CHARS = 450       # bit 4: too long
#: bit 8: zero known stopwords -> likely non-target-language


@register(
    "q253_seeded_epoch_shuffle",
    oracle=f"""
        WITH s AS (
            SELECT e.epoch, d.doc_id,
                   md5(CAST(e.epoch AS VARCHAR) || ':'
                       || CAST(d.doc_id AS VARCHAR)) AS k
            FROM documents d,
                 (SELECT UNNEST(range({SHUFFLE_EPOCHS})) AS epoch) e
        ),
        r AS (
            SELECT CAST(epoch AS BIGINT) AS epoch, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY epoch ORDER BY k)
                       AS pos
            FROM s
        )
        SELECT epoch, pos, doc_id FROM r
        WHERE pos <= {SHUFFLE_TOPK}
        ORDER BY epoch, pos
    """,
    doc="Reproducible per-epoch data ordering: every (epoch, doc) gets "
    "the md5 of 'epoch:doc_id' as its shuffle key — a deterministic, "
    "restart/replay-stable permutation per epoch (the q89/q188 "
    "md5-threshold convention applied to ORDERING; rand(seed) would "
    "depend on partitioning). The demo emits the first "
    f"{SHUFFLE_TOPK} positions of {SHUFFLE_EPOCHS} epochs; rank<=k "
    "rides WindowGroupLimit so no epoch's full permutation is ever "
    "sorted on one task. At corpus scale the full epoch order is a "
    "sort-by-key WRITE (repartitionByRange on the same md5 key) — "
    "the key design, not the top-k, is the operator.",
)
def q253(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    epochs = F.explode(
        F.sequence(F.lit(0), F.lit(SHUFFLE_EPOCHS - 1))
    ).alias("epoch")
    keyed = (
        table(spark, sf, "documents")
        .select("doc_id", epochs)
        .select(
            F.col("epoch").cast("bigint").alias("epoch"),
            "doc_id",
            F.md5(
                F.concat(
                    F.col("epoch").cast("string"),
                    F.lit(":"),
                    F.col("doc_id").cast("string"),
                )
            ).alias("k"),
        )
    )
    w = Window.partitionBy("epoch").orderBy("k")
    return (
        keyed.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= SHUFFLE_TOPK)
        .select("epoch", "pos", "doc_id")
        .orderBy("epoch", "pos")
    )


@register(
    "q254_dup_cluster_stats",
    oracle=f"""
        WITH c AS (
            SELECT md5(substr(COALESCE(text, ''), 1,
                       {PREFIX_FP_CHARS})) AS fp,
                   CAST(COUNT(*) AS BIGINT) AS cluster_size
            FROM documents GROUP BY 1
        )
        SELECT cluster_size,
               CAST(COUNT(*) AS BIGINT) AS n_clusters,
               CAST(SUM(cluster_size) AS BIGINT) AS n_docs
        FROM c GROUP BY cluster_size ORDER BY cluster_size
    """,
    doc="Duplicate-cluster size histogram at the prefix-fingerprint "
    f"grain (first {PREFIX_FP_CHARS} chars): the corpus-health view "
    "behind every dedup decision — how much mass sits in how-large "
    "clusters decides keep-first (q45/q143) vs component-resolution "
    "(q86) treatment. Two map-side-combinable aggregates, no window, "
    "no join: the cheapest possible full-corpus audit at 100 TB. "
    "Exact-md5 clusters are singletons in a deduped corpus; the "
    "prefix grain is the boilerplate/mirror candidate bucket (same "
    "grain family as q66's rolling fingerprints).",
)
def q254(spark: SparkSession, sf: str) -> DataFrame:
    fp = F.md5(
        F.substring(F.coalesce(F.col("text"), F.lit("")), 1,
                    PREFIX_FP_CHARS)
    )
    clusters = (
        table(spark, sf, "documents")
        .groupBy(fp.alias("fp"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cluster_size"))
    )
    return (
        clusters.groupBy("cluster_size")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
            F.sum("cluster_size").cast("bigint").alias("n_docs"),
        )
        .orderBy("cluster_size")
    )


@register(
    "q255_group_mad_outliers",
    oracle=f"""
        WITH v AS (
            SELECT event_type AS t,
                   CAST(FLOOR(value * 1000000) AS BIGINT) AS v
            FROM events WHERE value IS NOT NULL
        ),
        m AS (
            SELECT t, v,
                   ROW_NUMBER() OVER (PARTITION BY t ORDER BY v) AS rn,
                   COUNT(*) OVER (PARTITION BY t) AS n
            FROM v
        ),
        med AS (
            SELECT t, CAST(MAX(n) AS BIGINT) AS n, MIN(v) AS med
            FROM m WHERE rn = (n + 1) // 2 GROUP BY t
        ),
        d AS (
            SELECT v.t, ABS(v.v - med.med) AS dev
            FROM v JOIN med ON v.t = med.t
        ),
        md AS (
            SELECT t, dev,
                   ROW_NUMBER() OVER (PARTITION BY t ORDER BY dev)
                       AS rn,
                   COUNT(*) OVER (PARTITION BY t) AS n
            FROM d
        ),
        mad AS (
            SELECT t, MIN(dev) AS mad
            FROM md WHERE rn = (n + 1) // 2 GROUP BY t
        ),
        outs AS (
            SELECT d.t,
                   CAST(SUM(CASE WHEN d.dev > {MAD_K} * mad.mad
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_out
            FROM d JOIN mad ON d.t = mad.t GROUP BY d.t
        )
        SELECT med.t AS event_type, med.n AS n,
               med.med AS med_e6, mad.mad AS mad_e6,
               outs.n_out AS n_out,
               outs.n_out * 1000000 // med.n AS out_ppm
        FROM med JOIN mad ON med.t = mad.t
                 JOIN outs ON med.t = outs.t
        ORDER BY event_type
    """,
    doc="Robust per-group outlier gate: median and MAD (median "
    "absolute deviation) of the e6-scaled value per event type, "
    f"flagging |dev| > {MAD_K}*MAD — the outlier rule that, unlike "
    "the z-score (q242), is itself immune to the outliers it hunts "
    "(50% breakdown point). Both medians are LOWER medians (type-1, "
    "position (n+1) DIV 2) so the whole computation stays in BIGINT. "
    "Scale shape: both median passes run at the DISTINCT-VALUE grain "
    "(the q194 banding specialized per group) — windows touch one "
    "row per (type, value), never the data grain; the oracle states "
    "the same spec with raw-row ROW_NUMBER windows.",
)
def q255(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    e = (
        table(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.col("event_type").alias("t"),
            F.floor(F.col("value") * 1000000).cast("bigint").alias("v"),
        )
    )

    def lower_median(vals: DataFrame, col: str) -> DataFrame:
        """Per-group lower median at the distinct-value grain.

        vals: (t, <col>, cnt). Returns (t, n, med)."""
        w_below = (
            Window.partitionBy("t")
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        w_all = Window.partitionBy("t")
        spans = (
            vals.withColumn(
                "below", F.coalesce(F.sum("cnt").over(w_below), F.lit(0))
            )
            .withColumn("n", F.sum("cnt").over(w_all))
            .withColumn("lo", F.col("below") + 1)
            .withColumn("hi", F.col("below") + F.col("cnt"))
        )
        pos = F.expr("(n + 1) DIV 2")
        return (
            spans.filter((F.col("lo") <= pos) & (pos <= F.col("hi")))
            .select(
                "t",
                F.col("n").cast("bigint").alias("n"),
                F.col(col).alias("med"),
            )
        )

    g = e.groupBy("t", "v").agg(F.count(F.lit(1)).alias("cnt"))
    g = g.localCheckpoint(eager=True)
    med = lower_median(g, "v").withColumnRenamed("med", "med_e6")

    devs = (
        g.join(F.broadcast(med.select("t", "med_e6")), "t")
        .select(
            "t",
            F.abs(F.col("v") - F.col("med_e6")).alias("dev"),
            "cnt",
        )
        .groupBy("t", "dev")
        .agg(F.sum("cnt").alias("cnt"))
    )
    devs = devs.localCheckpoint(eager=True)
    mad = (
        lower_median(devs, "dev")
        .select("t", F.col("med").alias("mad_e6"))
    )
    outs = (
        devs.join(F.broadcast(mad), "t")
        .groupBy("t")
        .agg(
            F.sum(
                F.when(
                    F.col("dev") > F.lit(MAD_K) * F.col("mad_e6"),
                    F.col("cnt"),
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("n_out")
        )
    )
    return (
        med.join(mad, "t")
        .join(outs, "t")
        .select(
            F.col("t").alias("event_type"),
            "n",
            "med_e6",
            "mad_e6",
            "n_out",
            F.expr("n_out * 1000000 DIV n").alias("out_ppm"),
        )
        .orderBy("event_type")
    )


@register(
    "q256_profile_drift",
    oracle="""
        WITH s AS (
            SELECT event_type AS t, event_id % 2 AS snap, user_id
            FROM events
        ),
        g AS (
            SELECT t,
                   CAST(SUM(CASE WHEN snap = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS cnt_a,
                   CAST(SUM(CASE WHEN snap = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS cnt_b,
                   CAST(COUNT(DISTINCT CASE WHEN snap = 0
                              THEN user_id END) AS BIGINT) AS users_a,
                   CAST(COUNT(DISTINCT CASE WHEN snap = 1
                              THEN user_id END) AS BIGINT) AS users_b
            FROM s GROUP BY t
        ),
        tot AS (
            -- SUM(BIGINT) is DECIMAL in DuckDB and DECIMAL // rounds
            -- before flooring; HUGEINT // is the exact twin of
            -- Spark's BIGINT DIV (the q246 convention)
            SELECT CAST(SUM(cnt_a) AS HUGEINT) AS ta,
                   CAST(SUM(cnt_b) AS HUGEINT) AS tb
            FROM g
        )
        SELECT t AS event_type, cnt_a, cnt_b, users_a, users_b,
               CAST(cnt_a * 1000000 // GREATEST(ta, 1) AS BIGINT)
                   AS share_a_ppm,
               CAST(cnt_b * 1000000 // GREATEST(tb, 1) AS BIGINT)
                   AS share_b_ppm,
               CAST(ABS(cnt_a * 1000000 // GREATEST(ta, 1)
                   - cnt_b * 1000000 // GREATEST(tb, 1)) AS BIGINT)
                   AS drift_ppm
        FROM g, tot ORDER BY event_type
    """,
    doc="Column-profile drift between two corpus snapshots (the data-"
    "contract monitor a replica consumer runs per sync): per-type row "
    "share and distinct-user reach in each snapshot, with the "
    "per-type share drift in exact integer ppm. The demo's snapshot "
    "key is event_id parity (deterministic at every scale); swapping "
    "in ingest-date partitions changes nothing structurally. One "
    "grouped aggregate + a broadcast 1-row total — no window, no "
    "data-grain join; count(DISTINCT CASE...) rides Spark's expand "
    "exactly like q19's conditional multi-distinct.",
)
def q256(spark: SparkSession, sf: str) -> DataFrame:
    s = table(spark, sf, "events").select(
        F.col("event_type").alias("t"),
        F.pmod(F.col("event_id"), F.lit(2)).alias("snap"),
        "user_id",
    )
    g = s.groupBy("t").agg(
        F.sum(F.when(F.col("snap") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("cnt_a"),
        F.sum(F.when(F.col("snap") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("cnt_b"),
        F.countDistinct(
            F.when(F.col("snap") == 0, F.col("user_id"))
        ).cast("bigint").alias("users_a"),
        F.countDistinct(
            F.when(F.col("snap") == 1, F.col("user_id"))
        ).cast("bigint").alias("users_b"),
    )
    tot = g.agg(
        F.sum("cnt_a").alias("ta"), F.sum("cnt_b").alias("tb")
    )
    share_a = F.expr("cnt_a * 1000000 DIV greatest(ta, 1)")
    share_b = F.expr("cnt_b * 1000000 DIV greatest(tb, 1)")
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            F.col("t").alias("event_type"),
            "cnt_a",
            "cnt_b",
            "users_a",
            "users_b",
            share_a.alias("share_a_ppm"),
            share_b.alias("share_b_ppm"),
            F.abs(share_a - share_b).alias("drift_ppm"),
        )
        .orderBy("event_type")
    )


@register(
    "q257_weighted_median",
    oracle="""
        WITH li AS (
            SELECT l_returnflag AS flag,
                   CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS p,
                   CAST(l_quantity AS BIGINT) AS w
            FROM lineitem
        ),
        g AS (
            SELECT flag, p, SUM(w) AS w FROM li GROUP BY flag, p
        ),
        c AS (
            SELECT flag, p,
                   SUM(w) OVER (PARTITION BY flag ORDER BY p) AS cum,
                   SUM(w) OVER (PARTITION BY flag) AS tot
            FROM g
        )
        SELECT flag,
               CAST(MAX(tot) AS BIGINT) AS total_w,
               CAST(MIN(p) AS BIGINT) AS wmed_e2
        FROM c WHERE 2 * cum >= tot GROUP BY flag ORDER BY flag
    """,
    doc="Exact weighted median (lower, 2*cum >= total rule) of the "
    "e2-scaled extended price per return flag, weighted by quantity "
    "— the mixture-design statistic (median cost per delivered unit) "
    "that a plain median gets wrong whenever weights correlate with "
    "values. Exact integers end to end: FLOOR-scaled price, BIGINT "
    "weights, integer crossing rule — no quantile interpolation to "
    "diverge between engines. Scale shape: the cumulative window "
    "runs at the DISTINCT-(flag, price) grain after a map-side-"
    "combinable weight aggregate, never the row grain (q194's "
    "banding argument, weighted).",
)
def q257(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    g = (
        table(spark, sf, "lineitem")
        .select(
            F.col("l_returnflag").alias("flag"),
            F.floor(F.col("l_extendedprice") * 100)
            .cast("bigint")
            .alias("p"),
            F.col("l_quantity").cast("bigint").alias("w"),
        )
        .groupBy("flag", "p")
        .agg(F.sum("w").alias("w"))
    )
    w_cum = (
        Window.partitionBy("flag")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("flag")
    c = g.select(
        "flag",
        "p",
        F.sum("w").over(w_cum).alias("cum"),
        F.sum("w").over(w_all).alias("tot"),
    )
    return (
        c.filter(2 * F.col("cum") >= F.col("tot"))
        .groupBy("flag")
        .agg(
            F.max("tot").cast("bigint").alias("total_w"),
            F.min("p").cast("bigint").alias("wmed_e2"),
        )
        .orderBy("flag")
    )


@register(
    "q258_quality_gate_bitmask",
    oracle=f"""
        WITH f AS (
            SELECT len(list_filter(string_split(COALESCE(text, ''), ' '),
                       t -> t <> '')) AS nt,
                   len(list_filter(string_split(COALESCE(text, ''), ' '),
                       t -> list_contains(
                           ['the','a','of','and','to','in'], t)))
                       AS st,
                   n_chars AS nc
            FROM documents
        )
        SELECT (CASE WHEN nt < {GATE_MIN_TOKENS} THEN 1 ELSE 0 END)
             + (CASE WHEN {GATE_STOP_DEN} * st
                      > {GATE_STOP_NUM} * nt THEN 2 ELSE 0 END)
             + (CASE WHEN nc > {GATE_MAX_CHARS} THEN 4 ELSE 0 END)
             + (CASE WHEN st = 0 THEN 8 ELSE 0 END) AS reasons,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM f GROUP BY 1 ORDER BY reasons
    """,
    doc="Filter-reason accounting for the curation gate: each doc gets "
    "a bitmask of WHY it would be filtered (bit 1 too-short, bit 2 "
    "stopword-heavy > "
    f"{GATE_STOP_NUM}/{GATE_STOP_DEN}, bit 4 too-long, bit 8 zero "
    "known stopwords = likely non-target-language), aggregated to "
    "reasons -> doc count — the audit that distinguishes 'we dropped "
    "12% for length' from 'we dropped 12%' (the C4/Gopher-style "
    "rules of q50/q152 made attributable). All comparisons integer "
    "(share thresholds as num/den cross-multiplication); one narrow "
    "codegen'd projection + one tiny aggregate, no shuffle beyond "
    "the 16-row group-by. reasons = 0 is the pass bucket.",
)
def q258(spark: SparkSession, sf: str) -> DataFrame:
    t = F.coalesce(F.col("text"), F.lit(""))
    toks = F.split(t, " ")
    nt = F.size(F.filter(toks, lambda x: x != ""))
    st = F.size(F.filter(toks, lambda x: x.isin(*ts.STOPWORDS)))
    nc = F.col("n_chars")
    reasons = (
        F.when(nt < GATE_MIN_TOKENS, 1).otherwise(0)
        + F.when(
            F.lit(GATE_STOP_DEN) * st > F.lit(GATE_STOP_NUM) * nt, 2
        ).otherwise(0)
        + F.when(nc > GATE_MAX_CHARS, 4).otherwise(0)
        + F.when(st == 0, 8).otherwise(0)
    )
    return (
        table(spark, sf, "documents")
        .select(reasons.alias("reasons"))
        .groupBy("reasons")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("reasons")
    )


@register(
    "q259_dataset_card",
    oracle=f"""
        WITH base AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
                   CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
                   CAST(SUM(n_chars) AS BIGINT) AS total_chars,
                   CAST(COUNT(DISTINCT md5(substr(COALESCE(text, ''),
                        1, {PREFIX_FP_CHARS}))) AS BIGINT) AS n_fp
            FROM documents
        ),
        top AS (
            SELECT lang AS top_lang,
                   CAST(COUNT(*) AS BIGINT) AS top_cnt
            FROM documents GROUP BY lang
            ORDER BY top_cnt DESC, top_lang LIMIT 1
        )
        SELECT n_docs, n_sources, n_langs, total_chars,
               total_chars // GREATEST(n_docs, 1) AS mean_chars,
               (n_docs - n_fp) * 1000000 // GREATEST(n_docs, 1)
                   AS dup_ppm,
               top_lang,
               top_cnt * 1000000 // GREATEST(n_docs, 1)
                   AS top_lang_ppm
        FROM base, top
    """,
    doc="The one-row dataset card: corpus size, source/language "
    "breadth, mean length (exact DIV), duplicate mass at the prefix-"
    "fingerprint grain (q254's histogram reduced to one ppm), and "
    "the dominant language with its share — the summary a model card "
    "or a data-governance review asks for first. Everything is one "
    "full-scan aggregate (count-distincts ride Spark's expand) plus "
    "a 1-row TakeOrdered for the top language, broadcast-joined; "
    "ties on the top language break lexicographically in both "
    "engines.",
)
def q259(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    fp = F.md5(
        F.substring(F.coalesce(F.col("text"), F.lit("")), 1,
                    PREFIX_FP_CHARS)
    )
    base = docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.countDistinct(fp).cast("bigint").alias("n_fp"),
    )
    top = (
        docs.groupBy(F.col("lang").alias("top_lang"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("top_cnt"))
        .orderBy(F.col("top_cnt").desc(), "top_lang")
        .limit(1)
    )
    return base.crossJoin(F.broadcast(top)).select(
        "n_docs",
        "n_sources",
        "n_langs",
        "total_chars",
        F.expr("total_chars DIV greatest(n_docs, 1)").alias(
            "mean_chars"
        ),
        F.expr(
            "(n_docs - n_fp) * 1000000 DIV greatest(n_docs, 1)"
        ).alias("dup_ppm"),
        "top_lang",
        F.expr("top_cnt * 1000000 DIV greatest(n_docs, 1)").alias(
            "top_lang_ppm"
        ),
    )
