"""Data-ops batch (round 14 extension 2, q340-q347): hash-fold balance
audit, sliding-window chunking plan, code-switching detection,
template-gram provenance, rapid-repeat event audit, user-concentration
shares, label-centroid separation, and the curation-gate redundancy
matrix — split hygiene, batching, event integrity, and class-geometry
ops a 100 TB training-data pipeline runs beside the CDC surface.

Reference scope note: the reference engine (src/) is a CDC forwarder
with no analytics; these rows extend SURVEY.md §2D (the build brief's
first-class training/ops tier) like q281-q339 before them.

Engine-stability conventions as everywhere: integer-ppm via exact DIV
(HUGEINT // in DuckDB, BIGINT DIV in Spark, non-negative dividends
only — they disagree on negatives), md5 determinism with a portable
hex->int (instr over the hex alphabet — no engine-specific conv),
exact micro-epoch time differences, left-to-right list-order double
dot products with the FLOOR e4 grid (the q334 contract), and
deterministic tie-breaks on every ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from speculare_pgcdc_spark.catalog import spread_scan, table
from speculare_pgcdc_spark.operators.similarity import _dot
from speculare_pgcdc_spark.queries import register
from speculare_pgcdc_spark.queries.dataops3 import _MARKERS, TMPL_N

#: q340: fold count and the chi-square(k-1 = 4 df) critical value at
#: alpha = 0.05, ppm-scaled (floor(9.487729... * 1e6)).
FOLD_K = 5
CHI2_CRIT4_PPM = 9_487_729
#: q341: context length and stride (tokens) for sliding-window
#: chunking; overlap per extra chunk = C - S.
CHUNK_C = 128
CHUNK_S = 96
#: q343: how many top template grams get provenance rows.
PROV_K = 10
#: q344: consecutive same-(user, type) events closer than this many
#: seconds count as rapid repeats (double-fire suspects).
RAPID_S = 3600
#: q345: how many top users define the concentration share.
CONC_K = 10

#: Spark-side whitespace tokens (the q44 convention) + DuckDB twin.
_TOKS = "filter(split(coalesce(text, ''), ' '), x -> x <> '')"
_TOKS_SQL = "list_filter(string_split(coalesce(text, ''), ' '), x -> x <> '')"

#: Portable hex digit -> 0..15: instr is 1-based in BOTH engines.
_HEX = "0123456789abcdef"


def _fold_expr(idcol: str) -> str:
    """First two md5 hex chars -> 0..255 -> mod FOLD_K. Identical SQL
    text runs in both engines (instr + substr + md5 + CAST only)."""
    h = f"md5(CAST({idcol} AS STRING))"  # STRING parses in both engines
    return (
        f"((instr('{_HEX}', substr({h}, 1, 1)) - 1) * 16 "
        f"+ instr('{_HEX}', substr({h}, 2, 1)) - 1) % {FOLD_K}"
    )


@register(
    "q340_fold_balance",
    oracle=f"""
        WITH f AS (
            SELECT source, {_fold_expr('doc_id')} AS fold
            FROM documents),
        c AS (
            SELECT source, COUNT(*) AS n,
                   {", ".join(
                       f"SUM(CASE WHEN fold = {i} THEN 1 ELSE 0 END)"
                       f" AS n{i}" for i in range(FOLD_K))}
            FROM f GROUP BY source)
        SELECT source, CAST(n AS BIGINT) AS n_docs,
               {", ".join(
                   f"CAST(n{i} AS BIGINT) AS fold{i}"
                   for i in range(FOLD_K))},
               CAST({" + ".join(
                   f"(1000000 * ({FOLD_K} * n{i} - n)"
                   f" * ({FOLD_K} * n{i} - n)) // ({FOLD_K} * n)"
                   for i in range(FOLD_K))} AS BIGINT) AS chi2_ppm,
               ({" + ".join(
                   f"(1000000 * ({FOLD_K} * n{i} - n)"
                   f" * ({FOLD_K} * n{i} - n)) // ({FOLD_K} * n)"
                   for i in range(FOLD_K))}) < {CHI2_CRIT4_PPM}
                   AS balanced
        FROM c ORDER BY source
    """,
    doc=f"Cross-validation fold-balance audit: docs hash into "
    f"{FOLD_K} folds via the first two md5 hex nibbles (portable "
    "instr-based hex->int — no engine-specific conv), and per SOURCE "
    "stratum the chi-square(4) statistic against the uniform split "
    "is held integer-exact in ppm (per-fold terms (5n_i-n)^2/(5n), "
    "each floored identically in both engines, dividends "
    "non-negative) and compared to the 9.487729 critical value — the "
    "q321 SRM gate generalized from 2 arms to k folds: a flagged "
    "source means its eval folds are not exchangeable. Shape: "
    "scan-time md5 into a (source, fold) agg, pivot at source grain; "
    "one map-side-combined shuffle, no join, no window.",
)
def q340(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    f = docs.select(
        "source", F.expr(_fold_expr("doc_id")).alias("fold")
    )
    c = f.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.when(F.col("fold") == i, 1).otherwise(0)).alias(f"n{i}")
            for i in range(FOLD_K)
        ],
    )
    chi = " + ".join(
        f"(1000000 * ({FOLD_K} * n{i} - n) * ({FOLD_K} * n{i} - n)) "
        f"DIV ({FOLD_K} * n)"
        for i in range(FOLD_K)
    )
    return c.select(
        "source",
        F.col("n").cast("bigint").alias("n_docs"),
        *[
            F.col(f"n{i}").cast("bigint").alias(f"fold{i}")
            for i in range(FOLD_K)
        ],
        F.expr(f"CAST({chi} AS BIGINT)").alias("chi2_ppm"),
        F.expr(f"({chi}) < {CHI2_CRIT4_PPM}").alias("balanced"),
    ).orderBy("source")


@register(
    "q341_window_chunking",
    oracle=f"""
        WITH m AS (
            SELECT source, len({_TOKS_SQL}) AS w FROM documents),
        c AS (
            SELECT source, w,
                   CASE WHEN w <= {CHUNK_C} THEN 1
                        ELSE 1 + (w - {CHUNK_C} + {CHUNK_S - 1})
                                 // {CHUNK_S} END AS nc
            FROM m WHERE w > 0)
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(w) AS BIGINT) AS tok_mass,
               CAST(SUM(nc) AS BIGINT) AS n_chunks,
               CAST(SUM((nc - 1) * {CHUNK_C - CHUNK_S}) AS BIGINT)
                   AS overlap_tokens,
               CAST(SUM(nc * {CHUNK_C}
                        - (w + (nc - 1) * {CHUNK_C - CHUNK_S}))
                    AS BIGINT) AS pad_tokens,
               CAST(CAST(1000000 * SUM(nc * {CHUNK_C} - w) AS HUGEINT)
                    // CAST(SUM(nc) * {CHUNK_C} AS HUGEINT) AS BIGINT)
                   AS overhead_ppm
        FROM c GROUP BY source ORDER BY source
    """,
    doc="Sliding-window chunking plan: every doc is cut into "
    f"context windows of C={CHUNK_C} tokens at stride S={CHUNK_S} "
    "(the long-doc training layout — overlap preserves cross-chunk "
    "context, unlike q161's concat-and-pack which loses it); per "
    "source the exact chunk count (1 + ceil((W-C)/S) via integer "
    "arithmetic), re-emitted overlap tokens ((nc-1)*(C-S)), final-"
    "chunk padding, and total overhead ppm (overlap+pad over the "
    "emitted chunk budget) — the storage/compute multiplier this "
    "layout costs vs raw tokens. Shape: scan-grain size() and CASE "
    "into one source-grain agg; no explode (the plan is priced, the "
    "chunks are never materialized), no join, no window.",
)
def q341(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    m = docs.select("source", F.expr(f"size({_TOKS})").alias("w"))
    c = m.filter(F.col("w") > 0).select(
        "source", "w",
        F.expr(
            f"CASE WHEN w <= {CHUNK_C} THEN 1 "
            f"ELSE 1 + (w - {CHUNK_C} + {CHUNK_S - 1}) "
            f"DIV {CHUNK_S} END"
        ).alias("nc"),
    )
    return (
        c.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("w").cast("bigint").alias("tok_mass"),
            F.sum("nc").cast("bigint").alias("n_chunks"),
            F.sum(F.expr(f"(nc - 1) * {CHUNK_C - CHUNK_S}"))
            .cast("bigint").alias("overlap_tokens"),
            F.sum(
                F.expr(
                    f"nc * {CHUNK_C} - (w + (nc - 1) "
                    f"* {CHUNK_C - CHUNK_S})"
                )
            ).cast("bigint").alias("pad_tokens"),
            F.expr(
                f"CAST((1000000 * SUM(nc * {CHUNK_C} - w)) "
                f"DIV (SUM(nc) * {CHUNK_C}) AS BIGINT)"
            ).alias("overhead_ppm"),
        )
        .orderBy("source")
    )


@register(
    "q342_code_switch",
    oracle=f"""
        WITH h AS (
            SELECT lang,
                   {", ".join(
                       f"CASE WHEN contains(' ' || coalesce(text, '')"
                       f" || ' ', '{m}') THEN 1 ELSE 0 END AS h_{ml}"
                       for ml, m in _MARKERS)}
            FROM documents),
        a AS (
            SELECT lang, COUNT(*) AS n,
                   {", ".join(
                       f"SUM(h_{ml}) AS s_{ml}" for ml, _ in _MARKERS)}
            FROM h GROUP BY lang),
        s AS (
            {" UNION ALL ".join(
                f"SELECT lang, '{ml}' AS marker_lang, n, s_{ml} AS hits"
                f" FROM a" for ml, _ in _MARKERS)})
        SELECT lang, marker_lang,
               CAST(hits AS BIGINT) AS n_docs_hit,
               CAST((1000000 * hits) // n AS BIGINT) AS hit_ppm
        FROM s WHERE lang <> marker_lang
        ORDER BY lang, marker_lang
    """,
    doc="Code-switching detection: per labeled language, the ppm of "
    "docs containing another language's marker word (the q49 "
    "heuristic's markers) — mixed-language contamination that "
    "degrades monolingual models and flags mislabeled spans; the "
    "doc-level complement of q248's confusion matrix (which scores "
    "the PREDICTED label, not foreign-content presence). Shape: "
    "four scan-grain contains() flags into one lang-grain agg, then "
    "a 4-way unpivot of the aggregate row — no join against the "
    "corpus, no explode. (The oracle's window form is row-identical "
    "because doc_id is unique; Spark aggregates directly.)",
)
def q342(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    h = docs.select(
        "lang",
        *[
            F.expr(
                f"CASE WHEN contains(' ' || coalesce(text, '') || ' ', "
                f"'{m}') THEN 1 ELSE 0 END"
            ).alias(f"h_{ml}")
            for ml, m in _MARKERS
        ],
    )
    a = h.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(f"h_{ml}").alias(f"s_{ml}") for ml, _ in _MARKERS],
    )
    # explode-based unpivot: the lang-grain agg runs ONCE (a union of
    # per-marker selects would re-run the corpus scan per branch)
    stack = ", ".join(
        f"struct('{ml}' AS marker_lang, s_{ml} AS hits)"
        for ml, _ in _MARKERS
    )
    return (
        a.select(
            "lang", "n",
            F.explode(F.expr(f"array({stack})")).alias("m"),
        )
        .filter(F.col("lang") != F.col("m.marker_lang"))
        .select(
            "lang",
            F.col("m.marker_lang").alias("marker_lang"),
            F.col("m.hits").cast("bigint").alias("n_docs_hit"),
            F.expr("CAST((1000000 * m.hits) DIV n AS BIGINT)")
            .alias("hit_ppm"),
        )
        .orderBy("lang", "marker_lang")
    )


@register(
    "q343_template_provenance",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, source, {_TOKS_SQL} AS toks
            FROM documents),
        g AS (
            SELECT DISTINCT doc_id, source,
                   unnest(list_distinct(list_transform(
                       generate_series(1, len(toks) - {TMPL_N - 1}),
                       i -> array_to_string(toks[i:i + {TMPL_N - 1}],
                                            ' ')))) AS gm
            FROM t WHERE len(toks) >= {TMPL_N}),
        top AS (
            SELECT gm, COUNT(*) AS df FROM g GROUP BY gm
            ORDER BY df DESC, gm LIMIT {PROV_K})
        SELECT g.gm, g.source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST((1000000 * COUNT(*)) // MAX(top.df) AS BIGINT)
                   AS share_ppm
        FROM g JOIN top ON g.gm = top.gm
        GROUP BY g.gm, g.source
        ORDER BY g.gm, g.source
    """,
    doc=f"Template-gram provenance: the top-{PROV_K} boilerplate "
    f"{TMPL_N}-grams by document frequency (q325's exact ranking) "
    "drilled down to WHICH sources carry them and each source's "
    "share of the gram's df — the attribution step after q325 says "
    "'there is boilerplate': a gram concentrated in one source is a "
    "crawler artifact to fix there, one spread evenly is a "
    "language-level template to keep. Shape: ONE corpus-scale "
    "count agg collapses straight to (gram, source) grain (COUNT(*) "
    "== the oracle's distinct-doc count because (gm, source, doc) "
    "is distinct by construction; partials collapse map-side), each "
    "gram's df is a window SUM "
    "over that already-tiny frame, and only the aggregated frame is "
    f"checkpointed (it feeds both the top-{PROV_K} ranking and the "
    "provenance join); the top-K list broadcasts back; output is "
    "(grams x sources) grain. The gram agg is the one corpus-scale "
    "shuffle (the q87/q325 class).",
)
def q343(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    # r14: single-row-group input scans as ONE task — spread the raw
    # projection so the tokenize + gram explode + partial agg run at
    # session parallelism (catalog.spread_scan; counts are order-exact)
    pre = spread_scan(docs.select("doc_id", "source", "text"))
    # r14: no min-length filter on t (it re-ran the tokenize via
    # pushdown substitution, guide §4.4 — see q324); the gram CASE
    # short-circuits short docs to NULL, which explode drops
    t = pre.select(
        "doc_id", "source", F.expr(_TOKS).alias("toks")
    )
    g = t.select(
        "doc_id", "source",
        F.explode(
            F.expr(
                f"CASE WHEN size(toks) >= {TMPL_N} THEN array_distinct("
                f"transform(sequence(1, size(toks) - "
                f"{TMPL_N - 1}), i -> array_join(slice(toks, i, "
                f"{TMPL_N}), ' '))) END"
            )
        ).alias("gm"),
    )
    # r14 optimization (guide §2.3/§2.4): aggregate to (gm, source)
    # grain FIRST, then derive each gram's total df as a window SUM
    # over the already-tiny (grams x sources) frame. The previous
    # shape checkpointed the full distinct (doc, source, gm) frame
    # and re-shuffled it twice (df agg + provenance join); now only
    # the aggregated frame is checkpointed (it feeds both the top-K
    # ranking and the final join) and the corpus-scale data crosses
    # exactly one exchange. COUNT(*) == the oracle's COUNT(DISTINCT
    # doc triples) here because (gm, source, doc_id) is distinct by
    # construction — doc_id is unique per documents row (the fixture
    # invariant q336's min_by determinism already rests on), source
    # is functionally dependent on doc_id, and the per-doc gram list
    # is array_distinct'ed before the explode — so the planner's
    # two-phase distinct machinery (an extra corpus-scale exchange at
    # (gm, source, doc_id) grain) is pure overhead and count's
    # map-side partials collapse the shuffle to (gm, source) grain.
    gs = (
        g.groupBy("gm", "source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .withColumn(
            "df", F.sum("n_docs").over(Window.partitionBy("gm"))
        )
        .localCheckpoint(eager=True)
    )
    top = (
        gs.select("gm", "df")
        .distinct()
        .orderBy(F.desc("df"), "gm")
        .limit(PROV_K)
        .select("gm")
    )
    return (
        gs.join(F.broadcast(top), "gm")
        .select(
            "gm",
            "source",
            "n_docs",
            F.expr(
                "CAST((1000000 * n_docs) DIV df AS BIGINT)"
            ).alias("share_ppm"),
        )
        .orderBy("gm", "source")
    )


@register(
    "q344_rapid_repeat_audit",
    oracle=f"""
        WITH w AS (
            SELECT event_type,
                   epoch_us(ts) AS us,
                   lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS pus
            FROM events),
        gaps AS (
            SELECT event_type, (us - pus) // 1000000 AS gap_s
            FROM w WHERE pus IS NOT NULL)
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(CASE WHEN gap_s <= {RAPID_S} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_rapid,
               CAST((1000000 * SUM(CASE WHEN gap_s <= {RAPID_S}
                                   THEN 1 ELSE 0 END)) // COUNT(*)
                    AS BIGINT) AS rapid_ppm,
               CAST(MIN(gap_s) AS BIGINT) AS min_gap_s
        FROM gaps GROUP BY event_type ORDER BY event_type
    """,
    doc="Rapid-repeat event audit: consecutive same-(user, type) "
    f"events closer than {RAPID_S} s — double-fire / retry suspects "
    "that inflate engagement metrics and create near-duplicate "
    "training rows; per type the pair count, rapid count, exact ppm "
    "and the minimum observed gap. Gaps are exact integer seconds "
    "from micro-epoch differences (micros are the fixtures' native "
    "precision; the floor-div dividend is non-negative because the "
    "lag is ordered by ts). Shape: ONE (user, type)-partitioned lag "
    "window — the per-entity-ordered class that scales by key "
    "hashing, never a global sort — into a 5-key agg.",
)
def q344(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events")
    w = ev.select(
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.lag(F.unix_micros("ts")).over(
            Window.partitionBy("user_id", "event_type").orderBy(
                "ts", "event_id"
            )
        ).alias("pus"),
    )
    gaps = w.filter(F.col("pus").isNotNull()).select(
        "event_type", F.expr("(us - pus) DIV 1000000").alias("gap_s")
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.when(F.col("gap_s") <= RAPID_S, 1).otherwise(0))
            .cast("bigint").alias("n_rapid"),
            F.expr(
                f"CAST((1000000 * SUM(CASE WHEN gap_s <= {RAPID_S} "
                "THEN 1 ELSE 0 END)) DIV COUNT(*) AS BIGINT)"
            ).alias("rapid_ppm"),
            F.min("gap_s").cast("bigint").alias("min_gap_s"),
        )
        .orderBy("event_type")
    )


@register(
    "q345_user_concentration",
    oracle=f"""
        WITH c AS (
            SELECT event_type, user_id, COUNT(*) AS c
            FROM events GROUP BY event_type, user_id),
        r AS (
            SELECT event_type, c,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY c DESC, user_id) AS rn
            FROM c)
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(c) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN rn <= {CONC_K} THEN c ELSE 0 END)
                    AS BIGINT) AS top{CONC_K}_events,
               CAST((1000000 * SUM(CASE WHEN rn <= {CONC_K} THEN c
                                   ELSE 0 END)) // SUM(c) AS BIGINT)
                   AS top{CONC_K}_share_ppm
        FROM r GROUP BY event_type ORDER BY event_type
    """,
    doc=f"User-concentration audit: per event type, the top-{CONC_K} "
    "users' exact ppm share of all events — bot/power-user "
    "concentration that a per-user training cap (or the q293 "
    "balanced subsample) must know about; the event-log twin of "
    "q335's document ESS. Deterministic ranking (count desc, "
    "user_id). Shape: the rank window runs at (type, USER) grain — "
    "the aggregated frame, orders of magnitude below event grain — "
    "after one map-side-combined count agg; no join.",
)
def q345(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events")
    c = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    r = c.select(
        "event_type", "c",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(
                F.desc("c"), "user_id"
            )
        ).alias("rn"),
    )
    return (
        r.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("c").cast("bigint").alias("n_events"),
            F.sum(F.when(F.col("rn") <= CONC_K, F.col("c")).otherwise(0))
            .cast("bigint").alias(f"top{CONC_K}_events"),
            F.expr(
                f"CAST((1000000 * SUM(CASE WHEN rn <= {CONC_K} "
                "THEN c ELSE 0 END)) DIV SUM(c) AS BIGINT)"
            ).alias(f"top{CONC_K}_share_ppm"),
        )
        .orderBy("event_type")
    )


@register(
    "q346_centroid_separation",
    oracle="""
        WITH e AS (
            SELECT label, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings),
        cen AS (
            SELECT label, list(m ORDER BY pos) AS c FROM (
                SELECT label, pos, round(avg(v[pos]), 6) AS m
                FROM e, UNNEST(generate_series(1, len(v))) AS u(pos)
                GROUP BY label, pos)
            GROUP BY label),
        p AS (
            SELECT a.label AS label_a, b.label AS label_b,
                   CASE WHEN sqrt(list_dot_product(a.c, a.c))
                             * sqrt(list_dot_product(b.c, b.c)) = 0
                        THEN -20000
                        ELSE CAST(FLOOR(10000
                             * list_dot_product(a.c, b.c)
                             / (sqrt(list_dot_product(a.c, a.c))
                                * sqrt(list_dot_product(b.c, b.c))))
                             AS BIGINT)
                   END AS cos_e4
            FROM cen a JOIN cen b ON a.label < b.label)
        SELECT label_a, label_b, cos_e4
        FROM p ORDER BY label_a, label_b
    """,
    doc="Label-centroid separation matrix: pairwise cosine between "
    "per-label mean directions on the e4 integer grid — the class-"
    "geometry report behind q178's silhouette (which scores POINTS; "
    "this scores the CLASS structure itself): near-1e4 pairs are "
    "merge candidates or label noise, near-0 pairs are well "
    "separated. Same stability contract as q334: round(avg,6) "
    "centroids, list-order dot folds, FLOOR e4, zero-norm sentinel. "
    "Shape: posexplode -> (label, dim) agg (|labels| x dims rows), "
    "centroids assemble per label, the pairing is a |labels|-row "
    "self-join — model-grain, never data-grain.",
)
def q346(spark: SparkSession, sf: str) -> DataFrame:
    emb = table(spark, sf, "embeddings").select(
        "label",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    )
    cen = (
        emb.select("label", F.posexplode("v").alias("pos0", "x"))
        .groupBy("label", "pos0")
        .agg(F.round(F.avg("x"), 6).alias("m"))
        .groupBy("label")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos0, m))), "
                "p -> p.m)"
            ).alias("c")
        )
    )
    a = cen.select(F.col("label").alias("label_a"), F.col("c").alias("ca"))
    b = cen.select(F.col("label").alias("label_b"), F.col("c").alias("cb"))
    p = a.join(b, F.col("label_a") < F.col("label_b")).select(
        "label_a", "label_b",
        F.when(
            F.sqrt(_dot(F.col("ca"), F.col("ca")))
            * F.sqrt(_dot(F.col("cb"), F.col("cb"))) == 0,
            F.lit(-20000).cast("bigint"),
        )
        .otherwise(
            F.floor(
                10000
                * _dot(F.col("ca"), F.col("cb"))
                / (
                    F.sqrt(_dot(F.col("ca"), F.col("ca")))
                    * F.sqrt(_dot(F.col("cb"), F.col("cb")))
                )
            ).cast("bigint")
        )
        .alias("cos_e4"),
    )
    return p.orderBy("label_a", "label_b")


@register(
    "q347_gate_redundancy",
    oracle=f"""
        WITH f AS (
            SELECT CASE WHEN n_chars >= 100 THEN 0 ELSE 1 END AS f1,
                   CASE WHEN ({" OR ".join(
                       f"contains(' ' || coalesce(text, '') || ' ', '{m}')"
                       for _, m in _MARKERS)}) THEN 0 ELSE 1 END AS f2,
                   CASE WHEN len({_TOKS_SQL}) >= 30 THEN 0 ELSE 1 END
                       AS f3
            FROM documents),
        s AS (
            SELECT CAST(SUM(f1) AS BIGINT) AS a1,
                   CAST(SUM(f2) AS BIGINT) AS a2,
                   CAST(SUM(f3) AS BIGINT) AS a3,
                   CAST(SUM(f1 * f2) AS BIGINT) AS b12,
                   CAST(SUM(f1 * f3) AS BIGINT) AS b13,
                   CAST(SUM(f2 * f3) AS BIGINT) AS b23
            FROM f)
        SELECT pair, n_fail_a, n_fail_b, n_fail_both,
               CAST((1000000 * n_fail_both)
                    // GREATEST(n_fail_a + n_fail_b - n_fail_both, 1)
                    AS BIGINT) AS overlap_ppm
        FROM (
            SELECT '1_length|2_langid' AS pair, a1 AS n_fail_a,
                   a2 AS n_fail_b, b12 AS n_fail_both FROM s
            UNION ALL SELECT '1_length|3_toklen', a1, a3, b13 FROM s
            UNION ALL SELECT '2_langid|3_toklen', a2, a3, b23 FROM s)
        ORDER BY pair
    """,
    doc="Curation-gate redundancy matrix: for each pair of q331's "
    "funnel gates (length, marker lang-id, token-length), how many "
    "docs fail BOTH vs each alone, and the failure-set Jaccard "
    "overlap in exact ppm — near-1e6 overlap means the later gate is "
    "redundant and can be dropped from the (expensive) sequential "
    "funnel; near-0 means the gates catch different garbage. Shape: "
    "three scan-grain fail flags, ONE global agg of six sums, a "
    "3-row unpivot — the cheapest possible audit over any corpus "
    "size; no join, no window, no explode.",
)
def q347(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    marker_or = " OR ".join(
        f"contains(' ' || coalesce(text, '') || ' ', '{m}')"
        for _, m in _MARKERS
    )
    f = docs.select(
        F.expr("CASE WHEN n_chars >= 100 THEN 0 ELSE 1 END").alias("f1"),
        F.expr(f"CASE WHEN ({marker_or}) THEN 0 ELSE 1 END").alias("f2"),
        F.expr(f"CASE WHEN size({_TOKS}) >= 30 THEN 0 ELSE 1 END")
        .alias("f3"),
    )
    s = f.agg(
        F.sum("f1").cast("bigint").alias("a1"),
        F.sum("f2").cast("bigint").alias("a2"),
        F.sum("f3").cast("bigint").alias("a3"),
        F.sum(F.expr("f1 * f2")).cast("bigint").alias("b12"),
        F.sum(F.expr("f1 * f3")).cast("bigint").alias("b13"),
        F.sum(F.expr("f2 * f3")).cast("bigint").alias("b23"),
    )
    # explode-based unpivot: the global agg runs ONCE (a union of
    # per-pair selects would re-scan the corpus per branch)
    rows = [
        ("1_length|2_langid", "a1", "a2", "b12"),
        ("1_length|3_toklen", "a1", "a3", "b13"),
        ("2_langid|3_toklen", "a2", "a3", "b23"),
    ]
    stack = ", ".join(
        f"struct('{pair}' AS pair, {ca} AS n_fail_a, {cb} AS n_fail_b, "
        f"{cboth} AS n_fail_both)"
        for pair, ca, cb, cboth in rows
    )
    return (
        s.select(F.explode(F.expr(f"array({stack})")).alias("r"))
        .select(
            F.col("r.pair").alias("pair"),
            F.col("r.n_fail_a").alias("n_fail_a"),
            F.col("r.n_fail_b").alias("n_fail_b"),
            F.col("r.n_fail_both").alias("n_fail_both"),
            F.expr(
                "CAST((1000000 * r.n_fail_both) DIV "
                "GREATEST(r.n_fail_a + r.n_fail_b - r.n_fail_both, 1) "
                "AS BIGINT)"
            ).alias("overlap_ppm"),
        )
        .orderBy("pair")
    )
