"""Feature-engineering & corpus-ops batch (round 11, q292-q299): the
statistics a training-data pipeline derives ON TOP of the engine's
scan/agg/window surface — per-group trend fits, balanced subsampling,
source freshness SLAs, audience-overlap matrices, burstiness indices,
vocabulary-health (hapax) audits, embedding-norm outlier gates, and
the since-last-event feature column.

Reference scope note: the reference engine (src/) is a CDC forwarder
with no analytics; these rows extend SURVEY.md §2D's training-data
surface (the build brief's first-class tier) the same way q281-q291
did in round 10.

Engine-stability conventions as everywhere: integer-ppm shares via
exact DIV (HUGEINT // on the DuckDB side), sufficient statistics in
DECIMAL(38,0)/HUGEINT with per-row scaling BEFORE the sum (the
round-11 _sum_e6 headroom lesson), FLOOR-scaled doubles only on
operand-identical values, md5 determinism for anything order-shaped,
and quotient-type ROUNDs only on identically-derived doubles
(SCALING.md §6m's accepted measure-zero class).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from speculare_pgcdc_spark.catalog import table
from speculare_pgcdc_spark.queries import register

#: fixed x-origin for the OLS fit (2023-11-14T22:13:20Z): centering
#: epoch-seconds near the fixtures' 2024 window keeps x ~1e6-1e7, so
#: the integer moment sums sit far inside DECIMAL(38,0)/HUGEINT
#: headroom (x*y per row <= ~1e16, summed <= ~1e21 at sf0.1)
OLS_X0 = 1_704_000_000


@register(
    "q292_group_ols_trend",
    oracle=f"""
        WITH f AS (
            SELECT event_type,
                   epoch_us(ts) // 1000000 - {OLS_X0} AS x,
                   CAST(FLOOR(value * 1000000) AS BIGINT) AS y
            FROM events
            WHERE value IS NOT NULL AND isfinite(value)
        ),
        s AS (
            SELECT event_type,
                   CAST(COUNT(*) AS HUGEINT) AS n,
                   SUM(CAST(x AS HUGEINT)) AS sx,
                   SUM(CAST(y AS HUGEINT)) AS sy,
                   SUM(CAST(x AS HUGEINT) * x) AS sxx,
                   SUM(CAST(x AS HUGEINT) * y) AS sxy,
                   SUM(CAST(y AS HUGEINT) * y) AS syy
            FROM f GROUP BY event_type
        )
        SELECT event_type,
               CAST(n AS BIGINT) AS n,
               ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                     / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0.0),
                     6) AS slope_e6_per_s,
               ROUND((CAST(sy AS DOUBLE)
                      - (CAST(n * sxy - sx * sy AS DOUBLE)
                         / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE),
                                  0.0))
                        * CAST(sx AS DOUBLE))
                     / CAST(n AS DOUBLE), 2) AS intercept_e6,
               ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                     * CAST(n * sxy - sx * sy AS DOUBLE)
                     / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE)
                              * CAST(n * syy - sy * sy AS DOUBLE),
                              0.0), 6) AS r2
        FROM s ORDER BY event_type
    """,
    doc="Per-group ordinary-least-squares trend (value vs time) from "
    "ONE pass of integer sufficient statistics: x = epoch-seconds "
    f"centered on {OLS_X0}, y = value floor-scaled to e6 micro-units "
    "(both FLOOR on operand-identical doubles), then n/Σx/Σy/Σxy/Σx²/"
    "Σy² as map-side-combinable DECIMAL(38,0) sums with the per-row "
    "products cast BEFORE summing. slope/intercept/r² come out of the "
    "exact integer deltas (n·Σxy−ΣxΣy etc.) cast to double ONCE and "
    "combined with identical parenthesization on both engines — no "
    "accumulation-order dependence anywhere, so the only rounding is "
    "the accepted quotient-type class. Headroom bound (the q287/q291 "
    "convention): the n·Σxy delta reaches DECIMAL(38,0)/HUGEINT "
    "saturation near 1e11 rows PER GROUP at this x/y scale — both "
    "engines fail together there (Spark nulls, DuckDB raises); "
    "re-center OLS_X0 per epoch before that. The trend-per-cohort "
    "fit is "
    "the drift detector behind q243/q256; this is its parametric "
    "sibling. Zero joins, zero windows, |groups| output.",
)
def q292(spark: SparkSession, sf: str) -> DataFrame:
    f = (
        table(spark, sf, "events")
        .filter(
            F.col("value").isNotNull()
            & ~F.isnan("value")
            & (F.abs("value") != float("inf"))
        )
        .select(
            "event_type",
            F.expr(
                f"unix_micros(ts) DIV 1000000 - {OLS_X0}"
            ).alias("x"),
            F.expr(
                "CAST(FLOOR(value * 1000000) AS BIGINT)"
            ).alias("y"),
        )
    )
    dec = "decimal(38,0)"
    s = f.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum((F.col("x").cast("decimal(19,0)") * F.col("x"))
              .cast(dec)).alias("sxx"),
        F.sum((F.col("x").cast("decimal(19,0)") * F.col("y"))
              .cast(dec)).alias("sxy"),
        F.sum((F.col("y").cast("decimal(19,0)") * F.col("y"))
              .cast(dec)).alias("syy"),
    )
    return s.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.expr(
            "ROUND(CAST(n * sxy - sx * sy AS DOUBLE)"
            " / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0.0D), 6)"
        ).alias("slope_e6_per_s"),
        F.expr(
            "ROUND((CAST(sy AS DOUBLE)"
            " - (CAST(n * sxy - sx * sy AS DOUBLE)"
            "    / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0.0D))"
            "   * CAST(sx AS DOUBLE))"
            " / CAST(n AS DOUBLE), 2)"
        ).alias("intercept_e6"),
        F.expr(
            "ROUND(CAST(n * sxy - sx * sy AS DOUBLE)"
            " * CAST(n * sxy - sx * sy AS DOUBLE)"
            " / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE)"
            "          * CAST(n * syy - sy * sy AS DOUBLE), 0.0D), 6)"
        ).alias("r2"),
    ).orderBy("event_type")


@register(
    "q293_balanced_lang_subsample",
    oracle="""
        WITH c AS (
            SELECT lang, COUNT(*) AS nl FROM documents GROUP BY lang
        ),
        m AS (SELECT MIN(nl) AS m FROM c),
        r AS (
            SELECT doc_id, lang,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS BIGINT) AS rk
            FROM documents
        )
        SELECT doc_id, lang, rk FROM r, m WHERE rk <= m.m
        ORDER BY lang, rk
    """,
    doc="Label-balanced subsample — the class-rebalancing primitive "
    "of every training mix: per language, take exactly m documents "
    "where m = the smallest language's count, selected by "
    "md5(doc_id) rank (content-hash determinism, the q78/q95 seed "
    "convention — re-runs and engines agree byte-for-byte). The "
    "per-lang rank rides operators/rankband.banded_row_number with "
    "by=lang and a 256-way md5-prefix band: lang is LOW-cardinality, "
    "so a plain per-lang window would sort each language on one task "
    "at 100 TB — the band splits every language's sort 256 ways "
    "while provably equalling the oracle's plain ROW_NUMBER (the "
    "md5-prefix band is monotone in the md5 order). The min-count is "
    "a |langs|-row broadcast.",
)
def q293(spark: SparkSession, sf: str) -> DataFrame:
    from speculare_pgcdc_spark.operators.rankband import (
        banded_row_number,
    )

    d = table(spark, sf, "documents").select(
        "doc_id",
        "lang",
        F.md5(F.col("doc_id").cast("string")).alias("_h"),
    )
    ranked = banded_row_number(
        d,
        [F.col("_h"), F.col("doc_id")],
        F.conv(F.substring("_h", 1, 2), 16, 10).cast("bigint"),
        out="rk",
        by=["lang"],
    )
    m = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("nl"))
        .agg(F.min("nl").alias("m"))
    )
    return (
        ranked.crossJoin(F.broadcast(m))
        .filter(F.col("rk") <= F.col("m"))
        .select("doc_id", "lang", F.col("rk").cast("bigint").alias("rk"))
        .orderBy("lang", "rk")
    )


@register(
    "q294_freshness_audit",
    oracle="""
        WITH g AS (SELECT MAX(epoch_us(ts)) AS g FROM events)
        SELECT event_type,
               CAST((g.g - MAX(epoch_us(ts))) // 3600000000 AS BIGINT)
                   AS stale_hours,
               CAST(SUM(CASE WHEN epoch_us(ts) > g.g - 604800000000
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_7d,
               CAST(COUNT(DISTINCT CASE
                        WHEN epoch_us(ts) > g.g - 2592000000000
                        THEN epoch_us(ts) // 86400000000 END)
                    AS BIGINT) AS active_days_30d,
               CAST(COUNT(DISTINCT CASE
                        WHEN epoch_us(ts) > g.g - 2592000000000
                        THEN epoch_us(ts) // 86400000000 END)
                    * 1000000 // 30 AS BIGINT) AS coverage_30d_ppm
        FROM events, g GROUP BY event_type, g.g
        ORDER BY event_type
    """,
    doc="Per-source freshness / SLA audit anchored on the corpus "
    "watermark (global max ts): staleness in whole hours, trailing-"
    "7-day volume, and trailing-30-day active-day coverage (distinct "
    "epoch-days, exact ppm of 30) — the ingest-health dashboard every "
    "pipeline runs before trusting a source for the next epoch "
    "(complements q197 incremental ingest and q256 profile drift, "
    "which compare CONTENT; this audits ARRIVAL). Microsecond-integer "
    "time arithmetic end-to-end; the watermark is a 1-row broadcast "
    "cross join; one conditional aggregate per type (the distinct-day "
    "count expands to (type, day) grain internally — bounded at 30 "
    "days x |types|).",
)
def q294(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events").select(
        "event_type", F.unix_micros("ts").alias("us")
    )
    g = ev.agg(F.max("us").alias("g"))
    day = F.expr("us DIV 86400000000")
    in30 = F.col("us") > F.col("g") - 2_592_000_000_000
    return (
        ev.crossJoin(F.broadcast(g))
        .groupBy("event_type", "g")
        .agg(
            F.max("us").alias("last_us"),
            F.sum(
                (F.col("us") > F.col("g") - 604_800_000_000)
                .cast("int")
            ).cast("bigint").alias("n_7d"),
            F.countDistinct(F.when(in30, day))
            .cast("bigint").alias("active_days_30d"),
        )
        .select(
            "event_type",
            F.expr("(g - last_us) DIV 3600000000").cast("bigint")
            .alias("stale_hours"),
            "n_7d",
            "active_days_30d",
            F.expr("CAST(active_days_30d * 1000000 DIV 30 AS BIGINT)")
            .alias("coverage_30d_ppm"),
        )
        .orderBy("event_type")
    )


@register(
    "q295_type_cooccurrence_jaccard",
    oracle="""
        WITH ut AS (
            SELECT DISTINCT user_id, event_type FROM events
        ),
        n AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nu
            FROM ut GROUP BY event_type
        ),
        p AS (
            SELECT a.event_type AS ta, b.event_type AS tb,
                   CAST(COUNT(*) AS BIGINT) AS inter
            FROM ut a JOIN ut b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY a.event_type, b.event_type
        )
        SELECT p.ta, p.tb, na.nu AS na, nb.nu AS nb, p.inter,
               CAST(p.inter * 1000000
                    // (na.nu + nb.nu - p.inter) AS BIGINT)
                   AS jaccard_ppm
        FROM p JOIN n na ON p.ta = na.event_type
               JOIN n nb ON p.tb = nb.event_type
        ORDER BY p.ta, p.tb
    """,
    doc="Audience-overlap matrix: exact Jaccard of USER SETS for "
    "every event-type pair — the segment-overlap / co-engagement "
    "audit behind audience dedup and feature redundancy pruning "
    "(q124's basket lift counts co-occurrence per ORDER; this "
    "measures per-user set overlap corpus-wide). Grain control is "
    "the whole design: distinct (user, type) first (|users| x "
    "|types| upper bound), then the self-join fans out at most "
    "C(|types|,2) rows PER USER — a constant (10 at 5 types) — so "
    "the pair stage is linear in users at any scale; per-type "
    "distinct counts broadcast back onto the constant-sized pair "
    "table. Pairs sharing zero users are absent by construction "
    "(inner join), documented shape on both engines. Exact-ppm DIV.",
)
def q295(spark: SparkSession, sf: str) -> DataFrame:
    # r14 optimization (guide §1.2/§5): the distinct (user, type)
    # frame — the query's own documented bounded grain — feeds both
    # self-join sides AND both per-type count broadcasts; unpinned,
    # each consumer re-ran the corpus distinct (4 events scans in the
    # plan). Pin it once.
    ut = (
        table(spark, sf, "events")
        .select("user_id", "event_type")
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = ut.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("nu")
    )
    a = ut.select("user_id", F.col("event_type").alias("ta"))
    b = ut.select("user_id", F.col("event_type").alias("tb"))
    p = (
        a.join(b, "user_id")
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("inter"))
    )
    return (
        p.join(
            F.broadcast(n.select(F.col("event_type").alias("ta"),
                                 F.col("nu").alias("na"))), "ta")
        .join(
            F.broadcast(n.select(F.col("event_type").alias("tb"),
                                 F.col("nu").alias("nb"))), "tb")
        .select(
            "ta", "tb", "na", "nb", "inter",
            F.expr(
                "CAST(inter * 1000000 DIV (na + nb - inter) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
        .orderBy("ta", "tb")
    )


@register(
    "q296_fano_burstiness",
    oracle="""
        WITH b AS (
            SELECT event_type,
                   epoch_us(ts) // 3600000000 AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY event_type, bucket
        ),
        span AS (
            SELECT MAX(epoch_us(ts) // 3600000000)
                   - MIN(epoch_us(ts) // 3600000000) + 1 AS nb
            FROM events
        ),
        s AS (
            SELECT event_type,
                   CAST(SUM(c) AS HUGEINT) AS n,
                   SUM(CAST(c AS HUGEINT) * c) AS ss
            FROM b GROUP BY event_type
        )
        SELECT event_type,
               CAST(n AS BIGINT) AS n,
               CAST(span.nb AS BIGINT) AS n_buckets,
               CAST((CAST(span.nb AS HUGEINT) * ss - n * n) * 1000000
                    // (CAST(span.nb AS HUGEINT) * n) AS BIGINT)
                   AS fano_ppm
        FROM s, span ORDER BY event_type
    """,
    doc="Index of dispersion (Fano factor) per event type over the "
    "corpus's dense hourly grid: var/mean of per-hour counts, with "
    "empty hours counted as zero — ~1e6 ppm for a Poisson-like "
    "arrival process, far above it for bursty types (the statistic "
    "behind rate-limiter sizing and the q168 burst detector's "
    "threshold calibration; q168 flags WHEN, this measures HOW "
    "bursty). The dense grid never materializes: with B = global "
    "span buckets, var/mean = (B·Σc² − N²)/(B·N) EXACTLY from the "
    "sparse (type, hour) counts — zero-buckets contribute zero to "
    "every sum — so the whole query is two map-side-combinable "
    "aggregates, a 1-row span broadcast, and one exact-ppm DIV in "
    "HUGEINT/DECIMAL(38,0) headroom (B·Σc²·1e6 <= ~1e19 at sf0.1; "
    "bound ~1e32 before saturation).",
)
def q296(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events").select(
        "event_type",
        F.expr("unix_micros(ts) DIV 3600000000").alias("bucket"),
    )
    b = ev.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    span = ev.agg(
        (F.max("bucket") - F.min("bucket") + 1).alias("nb")
    )
    s = b.groupBy("event_type").agg(
        F.sum("c").cast("decimal(38,0)").alias("n"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
        .alias("ss"),
    )
    num = (
        F.col("nb").cast("decimal(38,0)") * F.col("ss")
        - F.col("n") * F.col("n")
    ) * 1_000_000
    den = F.col("nb").cast("decimal(38,0)") * F.col("n")
    return (
        s.crossJoin(F.broadcast(span))
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n"),
            F.col("nb").cast("bigint").alias("n_buckets"),
            # exact floor-division on DECIMAL(38,0): (a - a % b) / b
            # (the q291 convention — plain a/b would HALF_UP first)
            ((num - num % den) / den).cast("bigint").alias("fano_ppm"),
        )
        .orderBy("event_type")
    )


@register(
    "q297_hapax_legomena",
    oracle="""
        WITH w AS (
            SELECT source, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ),
        cw AS (
            SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
            FROM w WHERE tok <> '' GROUP BY source, tok
        )
        SELECT source,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hapax,
               CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000
                    // CAST(COUNT(*) AS HUGEINT) AS BIGINT)
                   AS hapax_ppm,
               CAST(COUNT(*) * 1000000
                    // CAST(SUM(c) AS HUGEINT) AS BIGINT) AS ttr_ppm
        FROM cw GROUP BY source ORDER BY source
    """,
    doc="Vocabulary-health audit per source: token count, type count, "
    "hapax legomena (words seen exactly once) and their exact-ppm "
    "share of the vocabulary, plus the type-token ratio — the "
    "classic 'is this source natural text or template spam' signal "
    "(a templated source has near-zero hapax share; q285's n-gram "
    "diversity measures the corpus, this localizes per source, at "
    "word grain, with the hapax tail q285's type/token ratio can't "
    "see). Shape: explode -> (source, word) partial+final hash agg "
    "-> |sources| reduce — the q44 word-count plan with one more "
    "combinable layer; vocabulary grain is the only shuffle and it "
    "is the SMALL side of the explode.",
)
def q297(spark: SparkSession, sf: str) -> DataFrame:
    cw = (
        table(spark, sf, "documents")
        .select("source", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    return (
        cw.groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            F.sum((F.col("c") == 1).cast("int")).cast("bigint")
            .alias("n_hapax"),
        )
        .select(
            "source",
            "n_tokens",
            "n_types",
            "n_hapax",
            F.expr("CAST(n_hapax * 1000000 DIV n_types AS BIGINT)")
            .alias("hapax_ppm"),
            F.expr("CAST(n_types * 1000000 DIV n_tokens AS BIGINT)")
            .alias("ttr_ppm"),
        )
        .orderBy("source")
    )


@register(
    "q298_embedding_norm_outliers",
    oracle="""
        WITH v AS (
            SELECT vec_id,
                   CAST(FLOOR(list_dot_product(
                        CAST(embedding AS DOUBLE[]),
                        CAST(embedding AS DOUBLE[])) * 1000000)
                       AS BIGINT) AS n2_e6
            FROM embeddings
        ),
        s AS (
            SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                   SUM(CAST(n2_e6 AS HUGEINT)) AS s1,
                   SUM(CAST(n2_e6 AS HUGEINT) * n2_e6) AS s2
            FROM v
        )
        SELECT v.vec_id, v.n2_e6,
               (s.n * v.n2_e6 - s.s1) * (s.n * v.n2_e6 - s.s1)
                   > 9 * (s.n * s.s2 - s.s1 * s.s1) AS is_outlier
        FROM v, s ORDER BY v.vec_id
    """,
    doc="Embedding-norm outlier gate: flag vectors whose squared L2 "
    "norm sits more than 3 population standard deviations from the "
    "corpus mean — the cheap pre-filter every embedding ingest runs "
    "before indexing (degenerate/exploded vectors poison IVF "
    "centroids and cosine ranking; q190 profiles per-DIMENSION "
    "stats, this gates per-VECTOR). The norm is the q43 fold "
    "(left-to-right double, bit-identical cross-engine), floor-"
    "scaled to e6; the 3-sigma test is then EXACT integer "
    "arithmetic — (N·x − S1)² > 9·(N·S2 − S1²) clears the division "
    "— in HUGEINT/DECIMAL(38,0) headroom. One narrow map, a 1-row "
    "moment broadcast, zero shuffles beyond the global agg; output "
    "is every vector with its verdict (the gate column), so the "
    "hash pins the full decision surface, not just the outliers.",
)
def q298(spark: SparkSession, sf: str) -> DataFrame:
    from speculare_pgcdc_spark.operators.similarity import _dot

    v = (
        table(spark, sf, "embeddings")
        .select(
            "vec_id",
            _dot(F.col("embedding"), F.col("embedding")).alias("__n2"),
        )
        .select(
            "vec_id",
            F.expr("CAST(FLOOR(__n2 * 1000000) AS BIGINT)")
            .alias("n2_e6"),
        )
    )
    dec = "decimal(38,0)"
    s = v.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.col("n2_e6").cast(dec)).alias("s1"),
        F.sum((F.col("n2_e6").cast("decimal(19,0)") * F.col("n2_e6"))
              .cast(dec)).alias("s2"),
    )
    d = F.col("n") * F.col("n2_e6") - F.col("s1")
    return (
        v.crossJoin(F.broadcast(s))
        .select(
            "vec_id",
            "n2_e6",
            (d * d > 9 * (F.col("n") * F.col("s2")
                          - F.col("s1") * F.col("s1")))
            .alias("is_outlier"),
        )
        .orderBy("vec_id")
    )


@register(
    "q299_events_since_purchase",
    oracle="""
        WITH r AS (
            SELECT event_id, user_id, epoch_us(ts) AS tu, event_type,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id) AS BIGINT) AS rn
            FROM events
        )
        SELECT event_id, user_id,
               CAST(rn - MAX(CASE WHEN event_type = 'purchase'
                                  THEN rn END)
                    OVER (PARTITION BY user_id ORDER BY tu, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS BIGINT)
                   AS since_purchase
        FROM r ORDER BY user_id, rn
    """,
    doc="The 'events since last purchase' feature column — the "
    "recency-in-events covariate of churn/propensity models (q130's "
    "RFM measures recency in TIME at customer grain; this is per-"
    "EVENT, in sequence position): per user-ordered row, its "
    "row_number minus the running max row_number of a purchase "
    "(NULL before the first purchase — the row's own purchase makes "
    "it 0). Both windows share ONE partitioning and sort "
    "(user_id, ts, event_id), so Catalyst plans a single exchange + "
    "sort; user_id is high-cardinality so no band is needed (the "
    "band rule targets low-cardinality keys). Output is event-grain "
    "— it streams, nothing aggregates on the driver. Ties totalized "
    "by event_id; time in integer microseconds.",
)
def q299(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), "event_id"
    )
    r = table(spark, sf, "events").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("tu"),
        "event_type",
        F.row_number().over(w).cast("bigint").alias("rn"),
    )
    wr = Window.partitionBy("user_id").orderBy(
        "tu", "event_id"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return r.select(
        "event_id",
        "user_id",
        (
            F.col("rn")
            - F.max(
                F.when(F.col("event_type") == "purchase", F.col("rn"))
            ).over(wr)
        ).cast("bigint").alias("since_purchase"),
    ).orderBy("user_id", F.col("event_id"))
