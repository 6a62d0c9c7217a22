"""Data-ops batch (round 12, q308-q315): boilerplate-trailer
detection, order-total reconciliation, session entry/exit and
sequential-pattern mining, dormancy reactivation, zone-map skipping
audit, t-closeness, and the Brier-score decomposition — layout,
reconciliation, lifecycle, and eval ops a 100 TB training-data
pipeline runs beside the CDC surface.

Reference scope note: the reference engine (src/) is a CDC forwarder
with no analytics; these rows extend SURVEY.md §2D (the build brief's
first-class training/ops tier) like q281-q307 before them.

Engine-stability conventions as everywhere: integer-ppm via exact DIV
(HUGEINT // in DuckDB, BIGINT DIV or the (a - a%b)/b DECIMAL(38,0)
floor-division in Spark), microsecond-integer time arithmetic, md5
determinism, FLOOR only on operand-identical doubles, all squared /
cross-multiplied moments held in DECIMAL(38,0)/HUGEINT headroom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from speculare_pgcdc_spark.catalog import table
from speculare_pgcdc_spark.queries import register
from speculare_pgcdc_spark.queries.productops import SESSION_GAP_US

#: q308: normalized-trailer fingerprint length (chars) — sized so the
#: synthetic corpus has real clusters at every fixture scale (48 chars
#: only clusters at sf0.1; 16 normalized chars ~ a 3-word sign-off)
TRAILER_LEN = 16
#: q311: dormancy threshold — a gap above this marks a reactivation
DORMANCY_US = 172_800_000_000  # 2 days
#: q312: zone-map bucket width (the file-size stand-in) + predicate
ZONE_BUCKET_US = 21_600_000_000  # 6 h
ZONE_PRED_MIN = 300.0
#: q313: number of fixed n_chars bands for the t-closeness EMD
TC_BANDS = 6
#: q314: reliability-diagram bins for the Brier decomposition
BRIER_BINS = 10

# Shared sessionization CTE (the q300 one-exchange form) for the
# DuckDB oracles of q310/q315.
_SESSION_CTE = f"""
        r AS (
            SELECT user_id, epoch_us(ts) AS tu, event_id, event_type,
                   ROW_NUMBER() OVER w AS rn,
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                             OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                                > {SESSION_GAP_US}
                        THEN 1 ELSE 0 END AS ns
            FROM events
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY epoch_us(ts), event_id)
        ),
        s AS (
            SELECT *,
                   SUM(ns) OVER (PARTITION BY user_id
                                 ORDER BY tu, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess
            FROM r
        )
"""


def _sessionized(spark: SparkSession, sf: str) -> DataFrame:
    """Events with (rn, sess) session ids — q300's one-exchange
    sessionizer (window + running sum both ride the user_id
    exchange), shared by q310/q315."""
    w = Window.partitionBy("user_id").orderBy("tu", "event_id")
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r = table(spark, sf, "events").select(
        "user_id",
        F.unix_micros("ts").alias("tu"),
        "event_id",
        "event_type",
    )
    r = r.select(
        "*",
        F.row_number().over(w).alias("rn"),
        F.when(
            F.lag("tu").over(w).isNull()
            | ((F.col("tu") - F.lag("tu").over(w)) > SESSION_GAP_US),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("ns"),
    )
    return r.select("*", F.sum("ns").over(wr).alias("sess"))


@register(
    "q308_boilerplate_trailers",
    oracle=f"""
        WITH n AS (
            SELECT doc_id, source,
                   trim(regexp_replace(regexp_replace(
                       lower(COALESCE(text, '')),
                       '[^a-z0-9 ]', '', 'g'),
                       ' +', ' ', 'g')) AS norm
            FROM documents
        ),
        t AS (
            SELECT doc_id, source,
                   md5(substr(norm,
                              length(norm) - {TRAILER_LEN} + 1))
                       AS trailer_fp
            FROM n WHERE length(norm) >= {TRAILER_LEN}
        )
        SELECT trailer_fp,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
               CAST(MIN(doc_id) AS BIGINT) AS exemplar_doc
        FROM t GROUP BY trailer_fp HAVING COUNT(*) >= 2
        ORDER BY n_docs DESC, trailer_fp LIMIT 20
    """,
    doc="Boilerplate-trailer detection: fingerprint the LAST "
    f"{TRAILER_LEN} chars of the q215-normalized text and surface "
    "fingerprints shared by >= 2 docs (with distinct-source spread "
    "and an exemplar doc id) — footers, license blurbs, and template "
    "sign-offs that whole-document dedup (q45/q215) misses because "
    "the bodies differ. Trailer-grain complements q143's segment "
    "grain (any chunk) by targeting the suffix, where crawl "
    "boilerplate concentrates. Normalization + substring are pure "
    "scan-time expressions; the rollup is one hash agg on an "
    "unskewable md5 key, then TakeOrdered top-20 — no window, no "
    "join, one shuffle at 100 TB.",
)
def q308(spark: SparkSession, sf: str) -> DataFrame:
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.lower(F.coalesce(F.col("text"), F.lit(""))),
                "[^a-z0-9 ]", ""),
            " +", " ",
        )
    )
    t = (
        table(spark, sf, "documents")
        .select("doc_id", "source", norm.alias("norm"))
        .filter(F.length("norm") >= TRAILER_LEN)
        .select(
            "doc_id",
            "source",
            F.md5(
                F.expr(
                    f"substring(norm, length(norm) - {TRAILER_LEN}"
                    f" + 1, {TRAILER_LEN})"
                )
            ).alias("trailer_fp"),
        )
    )
    return (
        t.groupBy("trailer_fp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("source").cast("bigint")
            .alias("n_sources"),
            F.min("doc_id").cast("bigint").alias("exemplar_doc"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.col("n_docs").desc(), "trailer_fp")
        .limit(20)
    )


@register(
    "q309_order_total_audit",
    oracle="""
        WITH r AS (
            SELECT l_orderkey,
                   SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
                                  * (1 + l_tax) * 100) AS BIGINT))
                       AS recomputed_c
            FROM lineitem GROUP BY l_orderkey
        ),
        j AS (
            SELECT CAST(FLOOR(o.o_totalprice * 100) AS BIGINT)
                       AS stated_c,
                   r.recomputed_c
            FROM orders o LEFT JOIN r ON o.o_orderkey = r.l_orderkey
        ),
        b AS (
            SELECT stated_c,
                   CASE
                     WHEN recomputed_c IS NULL THEN 'no_lineitems'
                     WHEN CAST(recomputed_c AS HUGEINT) * 1000000
                          < CAST(stated_c AS HUGEINT) * 500000
                        THEN 'lt_0.5x'
                     WHEN CAST(recomputed_c AS HUGEINT) * 1000000
                          < CAST(stated_c AS HUGEINT) * 900000
                        THEN '0.5x_to_0.9x'
                     WHEN CAST(recomputed_c AS HUGEINT) * 1000000
                          <= CAST(stated_c AS HUGEINT) * 1100000
                        THEN '0.9x_to_1.1x'
                     WHEN CAST(recomputed_c AS HUGEINT) * 1000000
                          <= CAST(stated_c AS HUGEINT) * 2000000
                        THEN '1.1x_to_2x'
                     ELSE 'ge_2x'
                   END AS ratio_band,
                   COALESCE(recomputed_c, 0) AS rc
            FROM j
        )
        SELECT ratio_band,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(stated_c) AS BIGINT) AS stated_total_c,
               CAST(SUM(rc) AS BIGINT) AS recomputed_total_c
        FROM b GROUP BY ratio_band ORDER BY ratio_band
    """,
    doc="Order-total reconciliation audit: recompute each order's "
    "total from its lineitems in exact cents (per-row FLOOR of the "
    "operand-identical double product ext*(1-disc)*(1+tax)*100 — "
    "the doctrine's only sanctioned double->int step), band the "
    "recomputed/stated ratio (cross-multiplied in HUGEINT, no float "
    "division), and report order counts + value per band, with "
    "lineitem-less orders as their own band. This is the value-level "
    "referential audit q220's key-level integrity check cannot see "
    "(a present-but-wrong total). One partial-agg over lineitem "
    "keyed on l_orderkey, one join to orders on the same key, a "
    "5-ish-group rollup: two shuffles at 100 TB, both on the "
    "natural key.",
)
def q309(spark: SparkSession, sf: str) -> DataFrame:
    r = (
        table(spark, sf, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice")
                    * (F.lit(1.0) - F.col("l_discount"))
                    * (F.lit(1.0) + F.col("l_tax"))
                    * F.lit(100.0)
                ).cast("bigint")
            ).alias("recomputed_c")
        )
    )
    j = (
        table(spark, sf, "orders")
        .select(
            "o_orderkey",
            F.floor(F.col("o_totalprice") * 100).cast("bigint")
            .alias("stated_c"),
        )
        .join(r, F.col("o_orderkey") == F.col("l_orderkey"), "left")
    )
    rc6 = F.col("recomputed_c") * F.lit(1_000_000)
    st = F.col("stated_c")
    band = (
        F.when(F.col("recomputed_c").isNull(), "no_lineitems")
        .when(rc6 < st * 500_000, "lt_0.5x")
        .when(rc6 < st * 900_000, "0.5x_to_0.9x")
        .when(rc6 <= st * 1_100_000, "0.9x_to_1.1x")
        .when(rc6 <= st * 2_000_000, "1.1x_to_2x")
        .otherwise("ge_2x")
    )
    return (
        j.select(
            band.alias("ratio_band"),
            "stated_c",
            F.coalesce(F.col("recomputed_c"), F.lit(0)).alias("rc"),
        )
        .groupBy("ratio_band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("stated_c").cast("bigint").alias("stated_total_c"),
            F.sum("rc").cast("bigint").alias("recomputed_total_c"),
        )
        .orderBy("ratio_band")
    )


@register(
    "q310_entry_exit_matrix",
    oracle=f"""
        WITH {_SESSION_CTE},
        es AS (
            SELECT user_id, sess,
                   arg_min(event_type, rn) AS entry_type,
                   arg_max(event_type, rn) AS exit_type,
                   COUNT(*) AS depth
            FROM s GROUP BY user_id, sess
        ),
        t AS (SELECT COUNT(*) AS total FROM es)
        SELECT entry_type, exit_type,
               CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(COUNT(*) FILTER (depth = 1) AS BIGINT)
                   AS n_single,
               CAST(CAST(COUNT(*) AS HUGEINT) * 1000000
                    // t.total AS BIGINT) AS share_ppm
        FROM es CROSS JOIN t
        GROUP BY entry_type, exit_type, t.total
        ORDER BY entry_type, exit_type
    """,
    doc="Session entry->exit matrix: for each 30-min-gap session, "
    "the (first event type, last event type) pair — landing/exit "
    "analysis with single-event-session (bounce) counts and exact "
    "ppm share. q300 mines whole paths and q290 adjacent "
    "transitions; this is the boundary view product teams read "
    "first ('sessions that START with error END with error'). "
    "Sessionize + min_by/max_by ride ONE user exchange (rn is "
    "unique within a session so min_by/arg_min are deterministic); "
    "the matrix agg lands on <= |types|^2 groups with a broadcast "
    "1-row total — constant output at any scale.",
)
def q310(spark: SparkSession, sf: str) -> DataFrame:
    es = (
        _sessionized(spark, sf)
        .groupBy("user_id", "sess")
        .agg(
            F.min_by("event_type", "rn").alias("entry_type"),
            F.max_by("event_type", "rn").alias("exit_type"),
            F.count(F.lit(1)).alias("depth"),
        )
    )
    t = es.agg(F.count(F.lit(1)).alias("total"))
    return (
        es.crossJoin(F.broadcast(t))
        .groupBy("entry_type", "exit_type", "total")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum((F.col("depth") == 1).cast("int"))
            .cast("bigint").alias("n_single"),
        )
        .select(
            "entry_type",
            "exit_type",
            "n_sessions",
            "n_single",
            F.expr("CAST(n_sessions * 1000000 DIV total AS BIGINT)")
            .alias("share_ppm"),
        )
        .orderBy("entry_type", "exit_type")
    )


@register(
    "q311_dormancy_reactivation",
    oracle=f"""
        WITH g AS (
            SELECT event_type, user_id,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id) AS gap
            FROM events
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_reactivations,
               CAST(COUNT(DISTINCT user_id) AS BIGINT)
                   AS n_users,
               CAST(SUM(gap) // COUNT(*) // 1000000 AS BIGINT)
                   AS avg_gap_s,
               CAST(MAX(gap) // 1000000 AS BIGINT) AS max_gap_s
        FROM g WHERE gap > {DORMANCY_US}
        GROUP BY event_type ORDER BY event_type
    """,
    doc="Dormancy reactivation: events that arrive after a > 2-day "
    "per-user silence, grouped by the RETURNING event's type — "
    "which actions bring users back, how many distinct users "
    "resurrect, and the average/max dormant gap in whole seconds "
    "(microsecond-integer lag, exact integer DIV twice: sum->mean "
    "then us->s; no float time math). q306 finds the last action "
    "before churn, q99 cohort retention — this is the re-entry "
    "edge both miss. One lag window on the high-cardinality user "
    "key, then a per-type rollup: one exchange + one small agg at "
    "100 TB.",
)
def q311(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("tu", "event_id")
    g = table(spark, sf, "events").select(
        "event_type",
        "user_id",
        F.unix_micros("ts").alias("tu"),
        "event_id",
    ).select(
        "event_type",
        "user_id",
        (F.col("tu") - F.lag("tu").over(w)).alias("gap"),
    )
    return (
        g.filter(F.col("gap") > DORMANCY_US)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_reactivations"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.expr(
                "CAST(sum(gap) DIV count(1) DIV 1000000 AS BIGINT)"
            ).alias("avg_gap_s"),
            F.expr("CAST(max(gap) DIV 1000000 AS BIGINT)")
            .alias("max_gap_s"),
        )
        .orderBy("event_type")
    )


@register(
    "q312_zonemap_skipping",
    oracle=f"""
        WITH b AS (
            SELECT epoch_us(ts) // {ZONE_BUCKET_US} AS bucket,
                   MAX(value) AS mx,
                   COUNT(*) AS n,
                   COUNT(*) FILTER (value >= {ZONE_PRED_MIN})
                       AS n_match
            FROM events GROUP BY bucket
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
               CAST(COUNT(*) FILTER (mx < {ZONE_PRED_MIN}) AS BIGINT)
                   AS n_skippable,
               CAST(SUM(n) AS BIGINT) AS rows_total,
               CAST(SUM(CASE WHEN mx < {ZONE_PRED_MIN}
                             THEN n ELSE 0 END) AS BIGINT)
                   AS rows_skipped,
               CAST(SUM(CASE WHEN mx < {ZONE_PRED_MIN}
                             THEN n ELSE 0 END)
                    * 1000000 // SUM(n) AS BIGINT) AS skip_ppm,
               CAST(SUM(n_match) AS BIGINT) AS rows_matching,
               CAST(SUM(n_match) * 1000000 // SUM(n) AS BIGINT)
                   AS selectivity_ppm,
               CAST((SUM(n) - SUM(CASE WHEN mx < {ZONE_PRED_MIN}
                                       THEN n ELSE 0 END))
                    * 1000000
                    // GREATEST(SUM(n_match), 1) AS BIGINT)
                   AS read_amplification_ppm
        FROM b
    """,
    doc="Zone-map skipping audit: bucket the table by 6-hour time "
    "windows (the stand-in for parquet files/row-groups in a "
    "time-partitioned layout — in production the min/max come from "
    "file footer metadata, computed here from the rows), take "
    f"per-bucket MAX(value), and measure how much of a `value >= "
    f"{ZONE_PRED_MIN}` scan the zone maps could skip vs the "
    "predicate's TRUE selectivity — read_amplification_ppm is "
    "rows-actually-read per matching row, the number that tells "
    "you whether the layout (q260 z-order, q192 compaction) earns "
    "its keep for this predicate class. One bucket-grain partial "
    "agg + a 1-row fold: single shuffle onto time buckets, "
    "unskewable, constant output at any scale.",
)
def q312(spark: SparkSession, sf: str) -> DataFrame:
    b = (
        table(spark, sf, "events")
        .select(
            F.expr(f"unix_micros(ts) DIV {ZONE_BUCKET_US}")
            .alias("bucket"),
            "value",
        )
        .groupBy("bucket")
        .agg(
            F.max("value").alias("mx"),
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("value") >= ZONE_PRED_MIN).cast("int"))
            .alias("n_match"),
        )
    )
    skip_n = F.sum(
        F.when(F.col("mx") < ZONE_PRED_MIN, F.col("n")).otherwise(0)
    )
    return b.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.sum((F.col("mx") < ZONE_PRED_MIN).cast("int"))
        .cast("bigint").alias("n_skippable"),
        F.sum("n").cast("bigint").alias("rows_total"),
        skip_n.cast("bigint").alias("rows_skipped"),
        F.expr(
            f"CAST(sum(CASE WHEN mx < {ZONE_PRED_MIN} THEN n ELSE 0 "
            "END) * 1000000 DIV sum(n) AS BIGINT)"
        ).alias("skip_ppm"),
        F.sum("n_match").cast("bigint").alias("rows_matching"),
        F.expr(
            "CAST(sum(n_match) * 1000000 DIV sum(n) AS BIGINT)"
        ).alias("selectivity_ppm"),
        F.expr(
            f"CAST((sum(n) - sum(CASE WHEN mx < {ZONE_PRED_MIN} "
            "THEN n ELSE 0 END)) * 1000000 "
            "DIV GREATEST(sum(n_match), 1) AS BIGINT)"
        ).alias("read_amplification_ppm"),
    )


@register(
    "q313_t_closeness",
    oracle=f"""
        WITH m AS (SELECT MAX(n_chars) AS mx FROM documents),
        r AS (
            SELECT lang, source,
                   LEAST(CAST(n_chars AS HUGEINT) * {TC_BANDS} // mx,
                         {TC_BANDS - 1}) AS band
            FROM documents CROSS JOIN m
        ),
        grp AS (
            SELECT lang, source, band, COUNT(*) AS c
            FROM r GROUP BY lang, source, band
        ),
        gn AS (
            SELECT lang, source, SUM(c) AS gn
            FROM grp GROUP BY lang, source
        ),
        gl AS (SELECT band, COUNT(*) AS c FROM r GROUP BY band),
        tot AS (SELECT COUNT(*) AS t FROM r),
        grid AS (
            SELECT gn.lang, gn.source, b.band, gn.gn,
                   COALESCE(grp.c, 0) AS c,
                   COALESCE(gl.c, 0) AS qc, tot.t
            FROM gn
            CROSS JOIN (SELECT UNNEST(range({TC_BANDS})) AS band) b
            CROSS JOIN tot
            LEFT JOIN grp ON grp.lang = gn.lang
                         AND grp.source = gn.source
                         AND grp.band = b.band
            LEFT JOIN gl ON gl.band = b.band
        ),
        cum AS (
            SELECT lang, source, gn,
                   SUM(CAST(c AS HUGEINT) * 1000000 // gn) OVER (
                       PARTITION BY lang, source ORDER BY band
                       ROWS UNBOUNDED PRECEDING) AS cp,
                   SUM(CAST(qc AS HUGEINT) * 1000000 // t) OVER (
                       PARTITION BY lang, source ORDER BY band
                       ROWS UNBOUNDED PRECEDING) AS cq
            FROM grid
        )
        SELECT lang, source,
               CAST(MAX(gn) AS BIGINT) AS n_docs,
               CAST(SUM(ABS(cp - cq)) // {TC_BANDS - 1} AS BIGINT)
                   AS emd_ppm
        FROM cum GROUP BY lang, source
        ORDER BY emd_ppm DESC, lang, source LIMIT 20
    """,
    doc="t-closeness audit (privacy tier, after q261 k-anonymity "
    "and q283 l-diversity): per quasi-identifier group "
    "(lang, source), the earth-mover's distance between the "
    "group's distribution of the ordinal sensitive attribute "
    f"(n_chars in {TC_BANDS} fixed global-max bands, q199-style "
    "integer cross-multiplied binning) and the table-wide "
    "distribution — groups with high EMD leak the sensitive "
    "attribute even when k-anon/l-div pass. Ordinal EMD = "
    "sum of |cumulative ppm deltas| / (bands-1), all exact "
    "integers. The dense group x band grid materializes at GROUP "
    "grain (|langs x sources| x 6 — catalog-sized at 100 TB), the "
    "cumsum window partitions on the group key, and the only "
    "data-grain work is one (lang,source,band) hash agg.",
)
def q313(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    m = docs.agg(F.max("n_chars").alias("mx"))
    r = docs.crossJoin(F.broadcast(m)).select(
        "lang",
        "source",
        F.least(
            F.expr(f"n_chars * {TC_BANDS} DIV mx"),
            F.lit(TC_BANDS - 1),
        ).alias("band"),
    )
    grp = r.groupBy("lang", "source", "band").agg(
        F.count(F.lit(1)).alias("c")
    )
    gn = grp.groupBy("lang", "source").agg(F.sum("c").alias("gn"))
    gl = r.groupBy("band").agg(F.count(F.lit(1)).alias("qc"))
    tot = r.agg(F.count(F.lit(1)).alias("t"))
    bands = spark.range(TC_BANDS).select(F.col("id").alias("band"))
    grid = (
        gn.crossJoin(F.broadcast(bands))
        .crossJoin(F.broadcast(tot))
        .join(grp, ["lang", "source", "band"], "left")
        .join(F.broadcast(gl), ["band"], "left")
        .select(
            "lang",
            "source",
            "band",
            "gn",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
            F.coalesce(F.col("qc"), F.lit(0)).alias("qc"),
            "t",
        )
    )
    wc = (
        Window.partitionBy("lang", "source")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.select(
        "lang",
        "source",
        "gn",
        F.sum(F.expr("c * 1000000 DIV gn")).over(wc).alias("cp"),
        F.sum(F.expr("qc * 1000000 DIV t")).over(wc).alias("cq"),
    )
    return (
        cum.groupBy("lang", "source")
        .agg(
            F.max("gn").cast("bigint").alias("n_docs"),
            F.expr(
                "CAST(sum(abs(cp - cq)) DIV "
                f"{TC_BANDS - 1} AS BIGINT)"
            ).alias("emd_ppm"),
        )
        .orderBy(F.col("emd_ppm").desc(), "lang", "source")
        .limit(20)
    )


@register(
    "q314_brier_decomposition",
    oracle=f"""
        WITH m AS (SELECT MAX(n_chars) AS mx FROM documents),
        r AS (
            SELECT CAST(n_chars AS HUGEINT) * 1000000 // mx AS p,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
            FROM documents CROSS JOIN m
        ),
        g AS (
            SELECT LEAST(p * {BRIER_BINS} // 1000000,
                         {BRIER_BINS - 1}) AS bin,
                   COUNT(*) AS n, SUM(p) AS sp, SUM(y) AS sy
            FROM r GROUP BY bin
        ),
        t AS (
            SELECT SUM(n) AS nn, SUM(sy) AS tsy,
                   SUM(sy) * 1000000 // SUM(n) AS ybar
            FROM g
        ),
        bs AS (
            SELECT SUM((p - y * 1000000) * (p - y * 1000000)) AS q
            FROM r
        ),
        bb AS (
            SELECT g.n, g.sp // g.n AS pb,
                   g.sy * 1000000 // g.n AS yb
            FROM g
        ),
        parts AS (
            SELECT SUM(bb.n * (bb.pb - bb.yb) * (bb.pb - bb.yb))
                       AS rel_num,
                   SUM(bb.n * (bb.yb - t.ybar) * (bb.yb - t.ybar))
                       AS res_num
            FROM bb CROSS JOIN t
        )
        SELECT CAST(t.nn AS BIGINT) AS n,
               CAST(bs.q // t.nn AS BIGINT) AS brier_e12,
               CAST(parts.rel_num // t.nn AS BIGINT)
                   AS reliability_e12,
               CAST(parts.res_num // t.nn AS BIGINT)
                   AS resolution_e12,
               CAST(t.ybar * (1000000 - t.ybar) AS BIGINT)
                   AS uncertainty_e12,
               CAST(bs.q // t.nn
                    - (parts.rel_num // t.nn
                       - parts.res_num // t.nn
                       + t.ybar * (1000000 - t.ybar)) AS BIGINT)
                   AS decomp_gap_e12
        FROM t CROSS JOIN bs CROSS JOIN parts
    """,
    doc="Murphy decomposition of the Brier score (reliability - "
    "resolution + uncertainty) for the q198/q199 score/label pair "
    "(score = n_chars/max in exact ppm, label = lang='en'), "
    f"binned into {BRIER_BINS} reliability bins — the eval that "
    "says WHY a score is miscalibrated (systematic bias vs no "
    "discrimination), not just THAT it is (q199 shows the curve; "
    "this reduces it to the three standard scalars + the exact "
    "binning/truncation gap, reported honestly as decomp_gap_e12 "
    "rather than hidden in float noise). Everything is integer: "
    "ppm scores, squared ppm deltas (<= 1e12/row) summed in "
    "HUGEINT/DECIMAL(38,0) (~1e23 at 1e11 rows; saturation at "
    "~1e26), bin means via exact floor DIV. Two passes over the "
    f"scan (global sum + {BRIER_BINS}-group agg), a 1-row "
    "broadcast, constant output.",
)
def q314(spark: SparkSession, sf: str) -> DataFrame:
    dec = "decimal(38,0)"
    docs = table(spark, sf, "documents")
    m = docs.agg(F.max("n_chars").alias("mx"))
    r = docs.crossJoin(F.broadcast(m)).select(
        F.expr("CAST(n_chars AS BIGINT) * 1000000 DIV mx").alias("p"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    g = r.groupBy(
        F.least(
            F.expr(f"p * {BRIER_BINS} DIV 1000000"),
            F.lit(BRIER_BINS - 1),
        ).alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("p").alias("sp"),
        F.sum("y").alias("sy"),
    )
    t = g.agg(
        F.sum("n").cast(dec).alias("nn"),
        F.expr(
            "CAST(sum(sy) * 1000000 DIV sum(n) AS BIGINT)"
        ).alias("ybar"),
    )
    bs = r.agg(
        F.sum(
            ((F.col("p") - F.col("y") * 1_000_000).cast(dec))
            * (F.col("p") - F.col("y") * 1_000_000)
        ).alias("q")
    )
    bb = g.select(
        F.col("n").cast(dec).alias("n"),
        F.expr("sp DIV n").alias("pb"),
        F.expr("sy * 1000000 DIV n").alias("yb"),
    )
    parts = (
        bb.crossJoin(F.broadcast(t))
        .agg(
            F.sum(
                F.col("n")
                * (F.col("pb") - F.col("yb"))
                * (F.col("pb") - F.col("yb"))
            ).alias("rel_num"),
            F.sum(
                F.col("n")
                * (F.col("yb") - F.col("ybar"))
                * (F.col("yb") - F.col("ybar"))
            ).alias("res_num"),
        )
    )

    def _fdiv(a, b):
        # exact floor-division on DECIMAL(38,0): (a - a % b) / b
        # (the q291/q296 convention; numerators here are >= 0)
        return ((a - a % b) / b).cast("bigint")

    return (
        t.crossJoin(F.broadcast(bs))
        .crossJoin(F.broadcast(parts))
        .select(
            F.col("nn").cast("bigint").alias("n"),
            _fdiv(F.col("q"), F.col("nn")).alias("brier_e12"),
            _fdiv(F.col("rel_num"), F.col("nn"))
            .alias("reliability_e12"),
            _fdiv(F.col("res_num"), F.col("nn"))
            .alias("resolution_e12"),
            (F.col("ybar") * (F.lit(1_000_000) - F.col("ybar")))
            .cast("bigint").alias("uncertainty_e12"),
            (
                _fdiv(F.col("q"), F.col("nn"))
                - (
                    _fdiv(F.col("rel_num"), F.col("nn"))
                    - _fdiv(F.col("res_num"), F.col("nn"))
                    + F.col("ybar")
                    * (F.lit(1_000_000) - F.col("ybar"))
                )
            ).cast("bigint").alias("decomp_gap_e12"),
        )
    )


@register(
    "q315_sequential_pattern_support",
    oracle=f"""
        WITH {_SESSION_CTE},
        fo AS (
            SELECT user_id, sess, event_type, MIN(rn) AS first_rn
            FROM s GROUP BY user_id, sess, event_type
        ),
        t AS (
            SELECT COUNT(DISTINCT (user_id, sess)) AS total FROM s
        ),
        pairs AS (
            SELECT a.event_type AS first_type,
                   b.event_type AS then_type
            FROM fo a JOIN fo b
              ON a.user_id = b.user_id AND a.sess = b.sess
             AND a.event_type <> b.event_type
             AND a.first_rn < b.first_rn
        )
        SELECT first_type, then_type,
               CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(CAST(COUNT(*) AS HUGEINT) * 1000000
                    // t.total AS BIGINT) AS support_ppm
        FROM pairs CROSS JOIN t
        GROUP BY first_type, then_type, t.total
        ORDER BY n_sessions DESC, first_type, then_type LIMIT 20
    """,
    doc="Sequential-pattern support ('A then B', any gap, within a "
    "session): for each ordered pair of DISTINCT event types, the "
    "number of 30-min-gap sessions where A's first occurrence "
    "precedes B's — the sequence-mining primitive under funnels "
    "(q182 fixes the pattern upfront; q290 only sees ADJACENT "
    "transitions; this counts every ordered pair). First "
    "occurrences collapse each session to <= |types| rows before "
    "pairing, so the self-join fan-out is C(|types|,2) per session "
    "— bounded by the type vocabulary, not session length — on the "
    "(user,sess) key co-partitioned by the sessionizer's own "
    "exchange. Support is exact ppm over total sessions via a "
    "broadcast 1-row count.",
)
def q315(spark: SparkSession, sf: str) -> DataFrame:
    s = _sessionized(spark, sf)
    # r14 optimization (guide §1.2/§5): the first-occurrence frame is
    # (session x <=|event types|) grain and feeds BOTH self-join sides
    # plus the session total — unpinned, each consumer re-ran the
    # whole sessionize lineage (3 events scans in the plan). Pin it
    # once; the session total derives from it exactly (every session
    # contributes >= 1 first-occurrence row, so distinct (user, sess)
    # is identical in s and fo).
    fo = (
        s.groupBy("user_id", "sess", "event_type")
        .agg(F.min("rn").alias("first_rn"))
        .localCheckpoint(eager=True)
    )
    t = fo.select("user_id", "sess").distinct().agg(
        F.count(F.lit(1)).alias("total")
    )
    a = fo.select(
        "user_id",
        "sess",
        F.col("event_type").alias("first_type"),
        F.col("first_rn").alias("rn_a"),
    )
    b = fo.select(
        "user_id",
        "sess",
        F.col("event_type").alias("then_type"),
        F.col("first_rn").alias("rn_b"),
    )
    pairs = a.join(b, ["user_id", "sess"]).filter(
        (F.col("first_type") != F.col("then_type"))
        & (F.col("rn_a") < F.col("rn_b"))
    )
    return (
        pairs.crossJoin(F.broadcast(t))
        .groupBy("first_type", "then_type", "total")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
        .select(
            "first_type",
            "then_type",
            "n_sessions",
            F.expr("CAST(n_sessions * 1000000 DIV total AS BIGINT)")
            .alias("support_ppm"),
        )
        .orderBy(F.col("n_sessions").desc(), "first_type", "then_type")
        .limit(20)
    )
