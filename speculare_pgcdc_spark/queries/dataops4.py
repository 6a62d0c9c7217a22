"""Data-ops batch (round 14 extension, q332-q339): distribution-drift
PSI, readability curriculum buckets, embedding anisotropy audit,
importance-weight effective sample size, directional copy attribution,
bitext candidate mining, mixture rebalance planning, and the n-gram
novelty curve — monitoring, curriculum, and mixing ops a 100 TB
training-data pipeline runs beside the CDC surface.

Reference scope note: the reference engine (src/) is a CDC forwarder
with no analytics; these rows extend SURVEY.md §2D (the build brief's
first-class training/ops tier) like q281-q331 before them.

Engine-stability conventions as everywhere: integer-ppm via exact DIV
(HUGEINT // in DuckDB, BIGINT DIV in Spark), ln only on
integer-valued arguments (the q276/q286 contract), FLOOR on
operand-identical doubles, DECIMAL(38,0) with ``(a - a%b)/b`` for the
one Spark decimal division, md5 determinism, left-to-right list-order
double dot products (the q43/q85 parity contract), and deterministic
tie-breaks on every ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from speculare_pgcdc_spark.catalog import spread_scan, table
from speculare_pgcdc_spark.operators.similarity import _dot
from speculare_pgcdc_spark.queries import register

#: q332: power-of-two doc-length bucket caps (the q329 ladder family,
#: explicit CASE — never CEIL(LOG2)); the last bucket is open-ended.
PSI_CAPS = [64, 128, 256, 512, 1024, 2048, 4096, 8192]
#: q333: Flesch-Kincaid grade tier bounds in e6 grade units.
FK_TIERS = [(5_000_000, "g0_elementary"), (8_000_000, "g1_middle"),
            (12_000_000, "g2_high"), (16_000_000, "g3_college")]
FK_TOP_TIER = "g4_graduate"
#: q334: high-similarity flag threshold on the e4 cosine grid.
ANISO_HI_E4 = 5000
#: q335: importance-weight cap (chars; the padding-ladder cap family).
ESS_W_CAP = 4096
#: q336: directional-copy key width = q322's 3_prefix tier grain.
COPY_PREFIX_W = 32
#: q337: token-count band width for length-ratio candidate mining.
BITEXT_BAND_W = 8
#: q339: ingestion batch width in doc_ids (doc_id is the ingestion
#: order proxy, the q197 convention) and the output cap.
NOV_BATCH_W = 50
NOV_N = 8
NOV_LIMIT = 20

#: Spark-side whitespace tokens (the q44 convention) + DuckDB twin.
_TOKS = "filter(split(coalesce(text, ''), ' '), x -> x <> '')"
_TOKS_SQL = "list_filter(string_split(coalesce(text, ''), ' '), x -> x <> '')"

#: q322's normalization (lower, strip non-alnum, collapse spaces).
_NORM = (
    "trim(regexp_replace(regexp_replace(lower(coalesce(text, '')), "
    "'[^a-z0-9 ]', ''), ' +', ' '))"
)
_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower(COALESCE(text, '')), "
    "'[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"
)


def _bucket_case(col: str) -> str:
    """Shared CASE ladder: smallest power-of-two cap >= col (open top).

    Identical SQL text works in both engines — integer compares only.
    """
    whens = " ".join(
        f"WHEN {col} <= {c} THEN {c}" for c in PSI_CAPS
    )
    return f"CASE {whens} ELSE {PSI_CAPS[-1] * 2} END"


@register(
    "q332_psi_length_drift",
    oracle=f"""
        WITH h AS (
            SELECT {_bucket_case('n_chars')} AS bucket,
                   doc_id % 2 AS half
            FROM documents),
        c AS (
            SELECT bucket,
                   COUNT(CASE WHEN half = 0 THEN 1 END) AS n_ref,
                   COUNT(CASE WHEN half = 1 THEN 1 END) AS n_cur
            FROM h GROUP BY bucket),
        t AS (
            SELECT SUM(n_ref) AS tr, SUM(n_cur) AS tc,
                   COUNT(*) AS k
            FROM c),
        p AS (
            SELECT bucket, n_ref, n_cur,
                   CAST(CAST(1000000 * (n_ref + 1) AS HUGEINT)
                        // CAST(t.tr + t.k AS HUGEINT) AS BIGINT)
                       AS p_ppm,
                   CAST(CAST(1000000 * (n_cur + 1) AS HUGEINT)
                        // CAST(t.tc + t.k AS HUGEINT) AS BIGINT)
                       AS q_ppm
            FROM c, t)
        SELECT bucket, CAST(n_ref AS BIGINT) AS n_ref,
               CAST(n_cur AS BIGINT) AS n_cur, p_ppm, q_ppm,
               CAST(FLOOR((p_ppm - q_ppm)
                    * (LN(CAST(p_ppm AS DOUBLE))
                       - LN(CAST(q_ppm AS DOUBLE)))) AS BIGINT)
                   AS psi_term_e6
        FROM p ORDER BY bucket
    """,
    doc="Population-stability-index drift over the doc-length "
    "distribution: the corpus split into reference/current halves "
    "(doc_id parity — the ingestion-order proxy), per power-of-two "
    "length bucket the smoothed (+1, Laplace over the K observed "
    "buckets) ppm shares of each half and the PSI contribution "
    "(p-q)*ln(p/q) — the drift monitor a continuously-ingesting "
    "pipeline alarms on before mixing weights go stale. Value "
    "stability: shares are exact integer ppm, ln runs on the "
    "integer-valued ppm (the q276/q286 contract), ln(p)-ln(q) keeps "
    "both args integer-valued (never ln of a ratio), and the term is "
    "FLOORed on operand-identical doubles. Shape: scan -> 9-key agg "
    "-> scalar totals broadcast; no shuffle beyond the tiny bucket "
    "agg — at 100 TB this is one pass and a map-side combine.",
)
def q332(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    h = docs.select(
        F.expr(_bucket_case("n_chars")).alias("bucket"),
        (F.col("doc_id") % 2).alias("half"),
    )
    c = h.groupBy("bucket").agg(
        F.count(F.when(F.col("half") == 0, 1)).alias("n_ref"),
        F.count(F.when(F.col("half") == 1, 1)).alias("n_cur"),
    )
    t = c.agg(
        F.sum("n_ref").alias("tr"),
        F.sum("n_cur").alias("tc"),
        F.count(F.lit(1)).alias("k"),
    )
    p = c.crossJoin(F.broadcast(t)).select(
        "bucket", "n_ref", "n_cur",
        F.expr("CAST((1000000 * (n_ref + 1)) DIV (tr + k) AS BIGINT)")
        .alias("p_ppm"),
        F.expr("CAST((1000000 * (n_cur + 1)) DIV (tc + k) AS BIGINT)")
        .alias("q_ppm"),
    )
    return p.select(
        "bucket",
        F.col("n_ref").cast("bigint").alias("n_ref"),
        F.col("n_cur").cast("bigint").alias("n_cur"),
        "p_ppm", "q_ppm",
        F.expr(
            "CAST(FLOOR((p_ppm - q_ppm) * (LN(CAST(p_ppm AS DOUBLE)) "
            "- LN(CAST(q_ppm AS DOUBLE)))) AS BIGINT)"
        ).alias("psi_term_e6"),
    ).orderBy("bucket")


def _fk_tier_case(col: str) -> str:
    whens = " ".join(
        f"WHEN {col} < {bound} THEN '{name}'" for bound, name in FK_TIERS
    )
    return f"CASE {whens} ELSE '{FK_TOP_TIER}' END"


@register(
    "q333_readability_buckets",
    oracle=f"""
        WITH m AS (
            SELECT len({_TOKS_SQL}) AS w,
                   GREATEST(length(COALESCE(text, ''))
                       - length(replace(replace(replace(
                             COALESCE(text, ''),
                             '.', ''), '!', ''), '?', '')), 1) AS s,
                   GREATEST(len(regexp_split_to_array(
                       lower(COALESCE(text, '')), '[aeiou]+')) - 1, 1)
                       AS v
            FROM documents),
        g AS (
            SELECT w,
                   (390000 * w) // s + (11800000 * v) // w - 15590000
                       AS grade_e6
            FROM m WHERE w > 0),
        tiers AS (
            SELECT {_fk_tier_case('grade_e6')} AS tier, w, grade_e6
            FROM g),
        t AS (SELECT COUNT(*) AS total FROM tiers)
        SELECT tier, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(w) AS BIGINT) AS token_mass,
               CAST(SUM(grade_e6 + 20000000) // COUNT(*) - 20000000
                    AS BIGINT) AS avg_grade_e6,
               CAST(CAST(1000000 * COUNT(*) AS HUGEINT)
                    // CAST(t.total AS HUGEINT) AS BIGINT) AS share_ppm
        FROM tiers, t GROUP BY tier, t.total ORDER BY tier
    """,
    doc="Readability curriculum buckets: a Flesch-Kincaid grade proxy "
    "(0.39*words/sentence + 11.8*syllables/word - 15.59, syllables "
    "approximated by vowel-group count — the standard heuristic) "
    "computed ENTIRELY in e6 integer units via exact truncating "
    "division, then bucketed into five curriculum tiers with doc "
    "count, token mass, integer-exact mean grade and share ppm per "
    "tier — the difficulty-ordering signal curriculum schedules and "
    "kid-safe filters both read. Parity: sentence count via nested "
    "replace (never translate — not portable), vowel groups via the "
    "identical '[aeiou]+' split in both engines (split keeps empty "
    "edge fields in both). Shape: pure scan -> 5-key agg; no joins, "
    "no windows — the cheapest possible 100 TB pass.",
)
def q333(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    m = docs.select(
        F.expr(f"size({_TOKS})").alias("w"),
        F.expr(
            "GREATEST(length(coalesce(text, '')) "
            "- length(replace(replace(replace("
            "coalesce(text, ''), '.', ''), '!', ''), '?', '')), 1)"
        ).alias("s"),
        F.expr(
            "GREATEST(size(split(lower(coalesce(text, '')), "
            "'[aeiou]+')) - 1, 1)"
        ).alias("v"),
    )
    g = m.filter(F.col("w") > 0).select(
        "w",
        F.expr(
            "(390000 * w) DIV s + (11800000 * v) DIV w - 15590000"
        ).alias("grade_e6"),
    )
    tiers = g.select(
        F.expr(_fk_tier_case("grade_e6")).alias("tier"), "w", "grade_e6"
    )
    t = tiers.agg(F.count(F.lit(1)).alias("total"))
    return (
        tiers.groupBy("tier")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("w").cast("bigint").alias("token_mass"),
            # +2e7 offset keeps the dividend non-negative: DuckDB //
            # floors while Spark DIV truncates toward zero, and they
            # only agree on non-negative operands (min grade term is
            # > -1.6e7, so every offset term is positive)
            F.expr(
                "CAST(SUM(grade_e6 + 20000000) DIV COUNT(*) "
                "- 20000000 AS BIGINT)"
            ).alias("avg_grade_e6"),
        )
        .crossJoin(F.broadcast(t))
        .select(
            "tier", "n_docs", "token_mass", "avg_grade_e6",
            F.expr("CAST((1000000 * n_docs) DIV total AS BIGINT)")
            .alias("share_ppm"),
        )
        .orderBy("tier")
    )


@register(
    "q334_embedding_anisotropy",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, label,
                   CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings),
        cen AS (
            SELECT list(m ORDER BY pos) AS c FROM (
                SELECT pos, round(avg(v[pos]), 6) AS m
                FROM e, UNNEST(generate_series(1, len(v))) AS u(pos)
                GROUP BY pos)),
        sc AS (
            SELECT e.label,
                   CASE WHEN sqrt(list_dot_product(e.v, e.v))
                             * sqrt(list_dot_product(cen.c, cen.c)) = 0
                        THEN -20000
                        ELSE CAST(FLOOR(10000 * list_dot_product(e.v, cen.c)
                             / (sqrt(list_dot_product(e.v, e.v))
                                * sqrt(list_dot_product(cen.c, cen.c))))
                             AS BIGINT)
                   END AS cos_e4
            FROM e CROSS JOIN cen)
        SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
               CAST(SUM(cos_e4 + 20000) // COUNT(*) - 20000
                    AS BIGINT) AS avg_cos_e4,
               CAST(CAST(1000000 * COUNT(CASE WHEN cos_e4 >= {ANISO_HI_E4}
                                         THEN 1 END) AS HUGEINT)
                    // CAST(COUNT(*) AS HUGEINT) AS BIGINT) AS hi_cos_ppm
        FROM sc GROUP BY label ORDER BY label
    """,
    doc="Embedding anisotropy audit: cosine of every vector to the "
    "GLOBAL mean direction (the anisotropy/'common direction' "
    "diagnostic — representation collapse shows up as everything "
    "hugging the centroid), reported per label as integer-exact mean "
    "e4-cosine and the ppm of vectors above the 0.5 hug threshold. "
    "Value stability: the centroid is round(avg, 6) per dim (the q85 "
    "kmeans contract — sub-ulp summation drift cannot flip a bucket), "
    "dot products fold left-to-right in list order in both engines "
    "(the q43 parity contract), the cosine lands on the e4 integer "
    "grid via FLOOR on operand-identical doubles, zero-norm vectors "
    "take the -2.0-grid sentinel, and all aggregation above the grid "
    "is BIGINT-exact. Shape: one posexplode -> dim-grain agg (dims "
    "rows), the centroid broadcasts back, per-vector math is scan-"
    "local, label-grain agg — no vector-pair work anywhere.",
)
def q334(spark: SparkSession, sf: str) -> DataFrame:
    emb = table(spark, sf, "embeddings").select(
        "label",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    )
    cen = (
        emb.select(F.posexplode("v").alias("pos0", "x"))
        .groupBy("pos0")
        .agg(F.round(F.avg("x"), 6).alias("m"))
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos0, m))), "
                "p -> p.m)"
            ).alias("c")
        )
    )
    sc = emb.crossJoin(F.broadcast(cen)).select(
        "label",
        F.when(
            F.sqrt(_dot(F.col("v"), F.col("v")))
            * F.sqrt(_dot(F.col("c"), F.col("c"))) == 0,
            F.lit(-20000).cast("bigint"),
        )
        .otherwise(
            F.floor(
                10000
                * _dot(F.col("v"), F.col("c"))
                / (
                    F.sqrt(_dot(F.col("v"), F.col("v")))
                    * F.sqrt(_dot(F.col("c"), F.col("c")))
                )
            ).cast("bigint")
        )
        .alias("cos_e4"),
    )
    return (
        sc.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            # offset by the sentinel magnitude so the dividend is
            # non-negative (floor vs truncate parity, the q333 note)
            F.expr(
                "CAST(SUM(cos_e4 + 20000) DIV COUNT(*) - 20000 "
                "AS BIGINT)"
            ).alias("avg_cos_e4"),
            F.expr(
                f"CAST((1000000 * COUNT(CASE WHEN cos_e4 >= "
                f"{ANISO_HI_E4} THEN 1 END)) DIV COUNT(*) AS BIGINT)"
            ).alias("hi_cos_ppm"),
        )
        .orderBy("label")
    )


@register(
    "q335_importance_ess",
    oracle=f"""
        WITH w AS (
            SELECT source,
                   CAST(GREATEST(LEAST(n_chars, {ESS_W_CAP}), 1)
                        AS HUGEINT) AS w
            FROM documents),
        a AS (
            SELECT source, COUNT(*) AS n, SUM(w) AS sw,
                   SUM(w * w) AS sw2
            FROM w GROUP BY source)
        SELECT source, CAST(n AS BIGINT) AS n_docs,
               CAST(sw AS BIGINT) AS sum_w,
               CAST((sw * sw) // sw2 AS BIGINT) AS ess,
               CAST(CAST(1000000 AS HUGEINT) * ((sw * sw) // sw2)
                    // CAST(n AS HUGEINT) AS BIGINT) AS ess_ppm
        FROM a ORDER BY source
    """,
    doc="Importance-weight effective sample size per source: with "
    f"length-capped weights w = clamp(n_chars, 1, {ESS_W_CAP}) — the "
    "standard proxy for a quality-weighted resampling pass — ESS = "
    "(sum w)^2 / sum w^2 (Kish), the number of equally-weighted docs "
    "the weighted source is actually worth; ess_ppm = ESS/n flags "
    "sources whose weight mass concentrates on few docs (ppm near "
    "1e6 = uniform, low = a handful of giants dominate the sample). "
    "Value stability: all sums ride HUGEINT (DuckDB) / DECIMAL(38,0) "
    "(Spark), the squares and divisions are exact integer ops — "
    "(a - a%b)/b is the Spark decimal floor-div twin of HUGEINT //. "
    "Shape: pure scan -> source-grain agg with map-side combine; "
    "sum-of-squares headroom holds to ~1e31 << the 38-digit cap at "
    "100 TB.",
)
def q335(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    w = docs.select(
        "source",
        F.expr(
            f"CAST(GREATEST(LEAST(n_chars, {ESS_W_CAP}), 1) "
            "AS DECIMAL(38,0))"
        ).alias("w"),
    )
    a = w.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("w").alias("sw"),
        F.sum(F.expr("CAST(w * w AS DECIMAL(38,0))")).alias("sw2"),
    )
    e = a.select(
        "source", "n", "sw",
        # exact floor-div on DECIMAL(38,0): (a - a%b)/b, the HUGEINT
        # // twin (all operands positive)
        F.expr(
            "CAST((sw * sw - (sw * sw) % sw2) / sw2 AS DECIMAL(38,0))"
        ).alias("essd"),
    )
    return e.select(
        "source",
        F.col("n").cast("bigint").alias("n_docs"),
        F.col("sw").cast("bigint").alias("sum_w"),
        F.col("essd").cast("bigint").alias("ess"),
        F.expr(
            "CAST((1000000 * essd - (1000000 * essd) % n) / n "
            "AS BIGINT)"
        ).alias("ess_ppm"),
    ).orderBy("source")


@register(
    "q336_copy_direction",
    oracle=f"""
        WITH n AS (
            SELECT doc_id, source, {_NORM_SQL} AS norm
            FROM documents),
        k AS (
            SELECT doc_id, source,
                   md5(substr(norm, 1, {COPY_PREFIX_W})) AS fp
            FROM n WHERE length(norm) >= {COPY_PREFIX_W}),
        multi AS (
            SELECT fp FROM k GROUP BY fp
            HAVING COUNT(DISTINCT source) >= 2),
        o AS (
            SELECT fp, MIN(doc_id) AS origin_doc
            FROM k JOIN multi USING (fp) GROUP BY fp),
        org AS (
            SELECT o.fp, k.source AS origin
            FROM o JOIN k ON k.fp = o.fp AND k.doc_id = o.origin_doc),
        cp AS (
            SELECT org.origin, k.source AS copier,
                   k.fp, k.doc_id
            FROM k JOIN org ON k.fp = org.fp
            WHERE k.source <> org.origin)
        SELECT origin, copier,
               CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_keys,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM cp GROUP BY origin, copier
        ORDER BY n_docs DESC, origin, copier LIMIT 20
    """,
    doc="Directional copy attribution: for every normalized "
    f"{COPY_PREFIX_W}-char prefix key (q322's 3_prefix dedup tier "
    "grain) that appears in >= 2 sources, the source of the EARLIEST "
    "doc_id (ingestion order, the q197 convention) is the origin; "
    "every other source holding the key is a copier. Output: "
    "origin -> copier pairs with distinct shared keys and copied-doc "
    "counts, top-20 — q252's overlap matrix says WHO overlaps, this "
    "says WHICH WAY the content flowed, the signal that decides which "
    "side of a mirror pair to drop. Shape: key-grain agg (multi-"
    "source filter bounds everything downstream to the duplicated "
    "mass), a min-doc attribution join at key grain, pair-grain agg, "
    "TakeOrdered top-20 — no doc-pair materialization anywhere.",
)
def q336(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    # the key frame is consumed by FOUR downstream ops (multi-source
    # filter, origin agg, origin tag, copier scan) — checkpoint it
    # ONCE so the regex normalization + md5 never recompute (the q326
    # single-parse doctrine; 100x probe: 159s -> the narrow
    # (bigint, source, 32-hex) frame replays from executor storage)
    k = docs.select(
        "doc_id", "source", F.expr(_NORM).alias("norm")
    ).filter(F.length("norm") >= COPY_PREFIX_W).select(
        "doc_id", "source",
        F.md5(F.expr(f"substr(norm, 1, {COPY_PREFIX_W})")).alias("fp"),
    )
    # one (fp, source)-grain partial aggregate replaces the old
    # multi/o/org chain, which joined k against a FULL re-aggregation
    # of k once per consumer (3x): per (fp, source), the doc count and
    # the earliest doc; per fp, the source count and the origin =
    # min_by(source, earliest-doc) — doc_id is unique, so exactly one
    # source attains the fp's MIN(doc_id) and min_by is deterministic,
    # equivalent to the oracle's k.doc_id = origin_doc join. The pair
    # aggregate then reads g once: g is (fp, source)-unique, so
    # n_keys = COUNT(*) with no countDistinct.
    g = (
        k.groupBy("fp", "source")
        .agg(
            F.count(F.lit(1)).alias("nd"),
            F.min("doc_id").alias("md"),
        )
        .localCheckpoint(eager=True)
    )
    fpagg = (
        g.groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("ns"),
            F.min_by("source", "md").alias("origin"),
        )
        .filter(F.col("ns") >= 2)
        .select("fp", "origin")
    )
    cp = g.join(F.broadcast(fpagg), "fp").filter(
        F.col("source") != F.col("origin")
    )
    return (
        cp.groupBy("origin", F.col("source").alias("copier"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum("nd").cast("bigint").alias("n_docs"),
        )
        .orderBy(F.desc("n_docs"), "origin", "copier")
        .limit(20)
    )


@register(
    "q337_bitext_candidates",
    oracle=f"""
        WITH b AS (
            SELECT lang,
                   len({_TOKS_SQL}) // {BITEXT_BAND_W} AS band
            FROM documents
            WHERE len({_TOKS_SQL}) > 0),
        c AS (
            SELECT lang, band, CAST(COUNT(*) AS HUGEINT) AS n
            FROM b GROUP BY lang, band),
        p AS (
            SELECT a.lang AS lang_a, z.lang AS lang_b,
                   SUM(a.n * z.n) AS pairs,
                   SUM(a.n) AS mass_a, SUM(z.n) AS mass_b
            FROM c a JOIN c z
              ON a.band = z.band AND a.lang < z.lang
            GROUP BY a.lang, z.lang)
        SELECT lang_a, lang_b,
               CAST(pairs AS BIGINT) AS candidate_pairs,
               CAST(mass_a AS BIGINT) AS banded_docs_a,
               CAST(mass_b AS BIGINT) AS banded_docs_b
        FROM p ORDER BY lang_a, lang_b
    """,
    doc="Bitext candidate mining, stage one: translation-pair "
    "candidates across languages gated by the Gale-Church length "
    f"prior — docs land in {BITEXT_BAND_W}-token-wide length bands "
    "and only same-band cross-language pairs are candidates. Reports "
    "per language pair the candidate-pair count and each side's "
    "banded doc mass — the budget estimate that decides whether the "
    "expensive lexical-alignment stage is affordable per pair. "
    "Scale honesty: candidate counts are computed as SUM(n_a * n_b) "
    "over band-grain COUNTS — the pairs themselves are NEVER "
    "materialized; the whole query is two small-key aggs and a "
    "band-grain self-join over (langs x bands) rows, HUGEINT/"
    "DECIMAL(38,0) products for 100 TB headroom.",
)
def q337(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    b = docs.select(
        "lang", F.expr(f"size({_TOKS})").alias("nt")
    ).filter(F.col("nt") > 0).select(
        "lang", F.expr(f"nt DIV {BITEXT_BAND_W}").alias("band")
    )
    c = b.groupBy("lang", "band").agg(
        F.expr("CAST(COUNT(*) AS DECIMAL(38,0))").alias("n")
    )
    a = c.select(
        F.col("lang").alias("lang_a"), "band", F.col("n").alias("na")
    )
    z = c.select(
        F.col("lang").alias("lang_b"), "band", F.col("n").alias("nb")
    )
    return (
        a.join(z, "band")
        .filter(F.col("lang_a") < F.col("lang_b"))
        .groupBy("lang_a", "lang_b")
        .agg(
            F.sum(F.expr("CAST(na * nb AS DECIMAL(38,0))"))
            .cast("bigint").alias("candidate_pairs"),
            F.sum("na").cast("bigint").alias("banded_docs_a"),
            F.sum("nb").cast("bigint").alias("banded_docs_b"),
        )
        .orderBy("lang_a", "lang_b")
    )


@register(
    "q338_mixture_rebalance",
    oracle=f"""
        WITH m AS (
            SELECT source,
                   CAST(SUM(len({_TOKS_SQL})) AS HUGEINT) AS toks
            FROM documents GROUP BY source),
        t AS (
            SELECT SUM(toks) AS total, COUNT(*) AS k FROM m),
        s AS (
            SELECT source, toks,
                   CAST(CAST(1000000 AS HUGEINT) * toks
                        // t.total AS BIGINT) AS cur_ppm,
                   CAST(1000000 // t.k AS BIGINT) AS target_ppm
            FROM m, t),
        r AS (
            SELECT *,
                   CAST(CAST(1000000 AS HUGEINT)
                        * CAST(target_ppm AS HUGEINT)
                        // CAST(GREATEST(cur_ppm, 1) AS HUGEINT)
                        AS BIGINT) AS raw_rate
            FROM s),
        mx AS (SELECT MAX(raw_rate) AS rmax FROM r)
        SELECT source, CAST(toks AS BIGINT) AS cur_toks, cur_ppm,
               target_ppm,
               CAST(CAST(1000000 AS HUGEINT)
                    * CAST(raw_rate AS HUGEINT)
                    // CAST(mx.rmax AS HUGEINT) AS BIGINT) AS rate_ppm,
               CAST(CAST(toks AS HUGEINT)
                    * (CAST(1000000 AS HUGEINT)
                       * CAST(raw_rate AS HUGEINT)
                       // CAST(mx.rmax AS HUGEINT))
                    // CAST(1000000 AS HUGEINT) AS BIGINT) AS kept_toks
        FROM r, mx ORDER BY source
    """,
    doc="Mixture rebalance plan: given the uniform target mixture "
    "over observed sources (the stated policy — swap the target map, "
    "keep the arithmetic), compute each source's current token-mass "
    "ppm, the downsampling rate that moves the mixture toward the "
    "target (rates proportional to target/current, normalized so the "
    "most under-represented source keeps everything — the standard "
    "no-upsampling rebalance), and the resulting kept-token budget. "
    "All arithmetic is exact integer ppm over HUGEINT/DECIMAL(38,0); "
    "the normalization max is a scalar broadcast. Shape: source-"
    "grain agg -> two scalar broadcasts -> scan-grain math; one "
    "map-side-combined shuffle at source grain total.",
)
def q338(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    m = docs.groupBy("source").agg(
        F.expr(f"CAST(SUM(size({_TOKS})) AS DECIMAL(38,0))")
        .alias("toks")
    )
    t = m.agg(
        F.sum("toks").alias("total"), F.count(F.lit(1)).alias("k")
    )
    s = m.crossJoin(F.broadcast(t)).select(
        "source", "toks",
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * toks "
            "- (CAST(1000000 AS DECIMAL(38,0)) * toks) % total) "
            "/ total AS BIGINT)"
        ).alias("cur_ppm"),
        F.expr("CAST(1000000 DIV k AS BIGINT)").alias("target_ppm"),
    )
    r = s.select(
        "*",
        F.expr(
            "CAST((1000000 * target_ppm) DIV GREATEST(cur_ppm, 1) "
            "AS BIGINT)"
        ).alias("raw_rate"),
    )
    mx = r.agg(F.max("raw_rate").alias("rmax"))
    return (
        r.crossJoin(F.broadcast(mx))
        .select(
            "source",
            F.col("toks").cast("bigint").alias("cur_toks"),
            "cur_ppm", "target_ppm",
            F.expr(
                "CAST((1000000 * raw_rate) DIV rmax AS BIGINT)"
            ).alias("rate_ppm"),
            # DECIMAL(38,0) floor-div: toks * rate_ppm can pass the
            # BIGINT line at 100 TB token counts
            F.expr(
                "CAST((toks * CAST((1000000 * raw_rate) DIV rmax "
                "AS DECIMAL(38,0)) - (toks * CAST((1000000 * raw_rate) "
                "DIV rmax AS DECIMAL(38,0))) % 1000000) / 1000000 "
                "AS BIGINT)"
            ).alias("kept_toks"),
        )
        .orderBy("source")
    )


@register(
    "q339_ngram_novelty",
    oracle=f"""
        WITH t AS (
            SELECT doc_id // {NOV_BATCH_W} AS batch,
                   {_TOKS_SQL} AS toks
            FROM documents),
        g AS (
            SELECT DISTINCT batch,
                   unnest(list_distinct(list_transform(
                       generate_series(1, len(toks) - {NOV_N - 1}),
                       i -> array_to_string(toks[i:i + {NOV_N - 1}],
                                            ' ')))) AS gm
            FROM t WHERE len(toks) >= {NOV_N}),
        f AS (
            SELECT batch, gm,
                   MIN(batch) OVER (PARTITION BY gm) AS first_batch
            FROM g)
        SELECT batch, CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(COUNT(CASE WHEN first_batch = batch THEN 1 END)
                    AS BIGINT) AS n_novel,
               CAST(CAST(1000000 * COUNT(CASE WHEN first_batch = batch
                                         THEN 1 END) AS HUGEINT)
                    // CAST(COUNT(*) AS HUGEINT) AS BIGINT)
                   AS novelty_ppm
        FROM f GROUP BY batch ORDER BY batch LIMIT {NOV_LIMIT}
    """,
    doc="N-gram novelty curve: the corpus in ingestion batches "
    f"(doc_id DIV {NOV_BATCH_W}, the q197 order proxy); per batch, "
    f"the fraction of its distinct {NOV_N}-grams never seen in any "
    "earlier batch — the freshness signal that tells a continuously-"
    "crawling pipeline when a source has gone stale (novelty decays "
    "toward boilerplate-only), first "
    f"{NOV_LIMIT} batches. Shape: per-doc distinct grams union to "
    "(gram, batch) grain, then two PARTIAL-AGGREGATING passes over "
    "that frame — per-batch gram counts and per-gram min batch whose "
    "first-batch histogram is the novel count (gram-grain hash agg, "
    "the q87/q324 class — no hot key, and unlike a gram-partitioned "
    "window the maps collapse duplicates before the exchange and "
    "nothing sorts); the two batch-grain outputs join as a "
    "broadcast; novelty is exact integer ppm. At 100 TB the "
    "(gram, batch) frame is the bounded one — distinct grams per "
    "batch, not gram occurrences.",
)
def q339(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    # r14: spread the single-task scan before the tokenize/explode
    # (catalog.spread_scan; counts/min are order-exact)
    # r14: no min-length filter on t (it re-ran the tokenize via
    # pushdown substitution, guide §4.4 — see q324); the gram CASE
    # short-circuits short docs to NULL, which explode drops
    t = spread_scan(docs.select("doc_id", "text")).select(
        F.expr(f"doc_id DIV {NOV_BATCH_W}").alias("batch"),
        F.expr(_TOKS).alias("toks"),
    )
    g = t.select(
        "batch",
        F.explode(
            F.expr(
                f"CASE WHEN size(toks) >= {NOV_N} THEN array_distinct("
                f"transform(sequence(1, size(toks) - "
                f"{NOV_N - 1}), i -> array_join(slice(toks, i, "
                f"{NOV_N}), ' '))) END"
            )
        ).alias("gm"),
    ).distinct().localCheckpoint(eager=True)
    # the (batch, gm) frame is the query's own documented bounded
    # grain (distinct grams per batch) and feeds BOTH aggregates
    # below — pinned so the tokenize + explode + distinct corpus pass
    # runs once, not twice (guide §1.2/§5).
    # r14 optimization (guide §2.3/§2.4): the min-over-gram-window
    # shuffled and SORTED every (batch, gm) row, then re-aggregated
    # the full frame by batch. Equivalent with partial aggregation
    # instead: per batch the gram count; per gram the min batch (maps
    # collapse duplicate grams before the exchange — the window
    # shipped them all), whose first-batch histogram is the novel
    # count; both are batch-grain tiny and join as a broadcast.
    # Exactly one gram's row has batch == min(batch), so
    # count(first_batch = batch) == count per first-batch bucket;
    # batches with no novel grams take COALESCE 0.
    n_grams = g.groupBy("batch").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams")
    )
    n_novel = (
        g.groupBy("gm")
        .agg(F.min("batch").alias("fb"))
        .groupBy("fb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_novel"))
    )
    return (
        n_grams.join(
            F.broadcast(n_novel),
            n_grams["batch"] == n_novel["fb"],
            "left",
        )
        .select(
            "batch",
            "n_grams",
            F.coalesce("n_novel", F.lit(0)).cast("bigint")
            .alias("n_novel"),
            F.expr(
                "CAST((1000000 * COALESCE(n_novel, 0)) DIV n_grams "
                "AS BIGINT)"
            ).alias("novelty_ppm"),
        )
        .orderBy("batch")
        .limit(NOV_LIMIT)
    )
