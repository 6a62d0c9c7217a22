"""Data-ops batch (round 14, q324-q331): positional duplicate-span
masking, cross-doc template n-grams, dedup mixture-shift audit, BPE
first-merge pair statistics, vocabulary coverage curve, length-bucket
padding waste, int8-quantized retrieval recall, and the sequential
curation funnel — span-grain dedup, tokenizer-training, batching, and
curation ops a 100 TB training-data pipeline runs beside the CDC
surface.

Reference scope note: the reference engine (src/) is a CDC forwarder
with no analytics; these rows extend SURVEY.md §2D (the build brief's
first-class training/ops tier) like q281-q323 before them.

Engine-stability conventions as everywhere: integer-ppm via exact DIV
(HUGEINT // in DuckDB, BIGINT DIV in Spark), md5 determinism, integer
quantized dot products (BIGINT — bit-exact cross-engine where float
ranking would tie-shift), ROUND(x, 4) on the one double ranking key
(the q43 precedent), and deterministic tie-breaks on every ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from speculare_pgcdc_spark.catalog import spread_scan, table
from speculare_pgcdc_spark.queries import register

#: q324: duplicate-span gram width (the ExactSubstr-style masking
#: grain; 8 matches q87's contamination window)
SPAN_N = 8
#: q325: template gram width (5 collides often enough to rank
#: boilerplate while 8 stays near-unique on clean text)
TMPL_N = 5
#: q326/q331: normalized near-exact dedup key width (q322's prefix
#: tier grain)
PREFIX_W = 32
#: q330: number of query vectors / neighbourhood size
RECALL_Q = 5
RECALL_K = 10

#: Spark-side whitespace tokens (the q44 convention)
_TOKS = "filter(split(coalesce(text, ''), ' '), x -> x <> '')"
#: DuckDB twin
_TOKS_SQL = "list_filter(string_split(coalesce(text, ''), ' '), x -> x <> '')"


@register(
    "q324_duplicate_span_mask",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
        tk AS (
            SELECT doc_id, toks, len(toks) AS n_tok
            FROM t WHERE len(toks) >= {SPAN_N}),
        g AS (
            SELECT doc_id, u.i AS s,
                   array_to_string(toks[u.i:u.i + {SPAN_N - 1}], ' ') AS gm
            FROM tk, UNNEST(generate_series(1, n_tok - {SPAN_N - 1}))
                 AS u(i)),
        d AS (
            SELECT gm FROM (
                SELECT gm, COUNT(DISTINCT doc_id) AS df
                FROM g GROUP BY gm)
            WHERE df >= 2),
        cov AS (
            SELECT DISTINCT doc_id, s + v.o AS p
            FROM g JOIN d USING (gm),
                 UNNEST(generate_series(0, {SPAN_N - 1})) AS v(o)),
        m AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_masked
            FROM cov GROUP BY doc_id)
        SELECT tk.doc_id, CAST(n_tok AS BIGINT) AS n_tok,
               CAST(COALESCE(n_masked, 0) AS BIGINT) AS n_masked,
               CAST((1000000 * COALESCE(n_masked, 0)) // n_tok
                    AS BIGINT) AS masked_ppm
        FROM tk LEFT JOIN m USING (doc_id)
        ORDER BY masked_ppm DESC, doc_id LIMIT 20
    """,
    doc="ExactSubstr-style duplicate-SPAN masking (the span-grain tier "
    "above q322's doc-grain waterfall): a token position is masked if "
    f"any {SPAN_N}-gram window covering it also occurs in ANOTHER doc; "
    "reports per-doc token count, masked tokens, and integer-exact "
    "masked ppm, top-20 most-templated docs. Shape: the dup-gram "
    "detection is ONE gram-keyed min/max agg (distinct-doc df >= 2 "
    "<=> min != max; partials collapse map-side, the q87/q322 "
    "class); the coverage explode is 8x the DUP-gram "
    "rows only (bounded by the duplicate mass, not the corpus), the "
    "position dedup and count are doc-grain, and the final ranking is "
    "TakeOrdered top-20 — no all-pairs, no global window.",
)
def q324(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    # r14: single-row-group input scans as ONE task — spread the raw
    # projection so BOTH gram passes (tokenize + explode + agg) run at
    # session parallelism (catalog.spread_scan; min/max/counts are
    # order-exact)
    # r14: NO min-length filter on tok — a filter on the projected
    # toks is pushed below the projection with the tokenize
    # substituted (split runs twice per row, guide §4.4); instead the
    # gram transform short-circuits to NULL for short docs, which
    # explode drops — the same rows, one tokenize. toks is a projected
    # attribute inside the CASE, so its three references are free.
    tok = spread_scan(docs.select("doc_id", "text")).select(
        "doc_id", F.expr(_TOKS).alias("toks")
    )
    grams = tok.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN size(toks) >= {SPAN_N} THEN "
                f"transform(sequence(1, size(toks) - {SPAN_N - 1}), "
                f"i -> struct(i AS s, array_join(slice(toks, i, "
                f"{SPAN_N}), ' ') AS gm)) END"
            )
        ).alias("sg"),
    ).select("doc_id", F.col("sg.s").alias("s"), F.col("sg.gm").alias("gm"))
    # df >= 2 (distinct docs) <=> min(doc_id) != max(doc_id) over the
    # gram's rows — exact for any data (duplicate in-doc positions
    # cannot move min/max), and min/max partials collapse map-side to
    # one row per (partition, gm), so the exchange ships gram-grain
    # partials instead of the full distinct (gm, doc_id) frame the
    # previous distinct+COUNT formulation shuffled (r14 optimization:
    # guide §2.3 "aggregate before you shuffle" — one Exchange
    # removed, shuffle bytes now bounded by distinct grams per map
    # partition, skew-safe under hot boilerplate grams where a
    # window-by-gm variant would buffer the hot gram's rows)
    dup = (
        grams.groupBy("gm")
        .agg(F.min("doc_id").alias("_mn"), F.max("doc_id").alias("_mx"))
        .filter(F.col("_mn") != F.col("_mx"))
        .select("gm")
    )
    cov = (
        grams.join(dup, "gm")
        .select(
            "doc_id",
            F.explode(F.expr(f"sequence(s, s + {SPAN_N - 1})")).alias("p"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_masked"))
    )
    # r14 optimization (guide §1.2/§5): the two gram passes (dup
    # detection, coverage) are deliberate streaming re-scans — the
    # gram frame is corpus-sized, so re-reading parquet beats
    # materializing it (guide §8's decide-small/re-attach pattern).
    # The THIRD tokenize pass only produced doc-grain (doc_id, n_tok)
    # — pin that bounded frame instead of re-running scan+split.
    # the min-length filter moved HERE, after the checkpoint: the
    # checkpoint is a hard pushdown barrier, so filtering on the
    # materialized n_tok costs an integer compare instead of the
    # substituted second tokenize the old pre-projection filter paid
    sizes = (
        tok.select(
            "doc_id", F.size("toks").cast("bigint").alias("n_tok")
        )
        .localCheckpoint(eager=True)
        .filter(F.col("n_tok") >= SPAN_N)
    )
    return (
        sizes
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            "n_tok",
            F.coalesce("n_masked", F.lit(0)).cast("bigint")
            .alias("n_masked"),
            F.expr(
                "CAST((1000000 * coalesce(n_masked, 0)) DIV n_tok "
                "AS BIGINT)"
            ).alias("masked_ppm"),
        )
        .orderBy(F.desc("masked_ppm"), "doc_id")
        .limit(20)
    )


@register(
    "q325_template_ngrams",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
        tk AS (SELECT doc_id, toks FROM t WHERE len(toks) >= {TMPL_N}),
        n AS (SELECT COUNT(*) AS total FROM tk),
        g AS (
            SELECT DISTINCT doc_id,
                   unnest(list_transform(
                       generate_series(1, len(toks) - {TMPL_N - 1}),
                       i -> array_to_string(toks[i:i + {TMPL_N - 1}],
                                            ' '))) AS gm
            FROM tk)
        SELECT gm, CAST(COUNT(*) AS BIGINT) AS df,
               CAST((1000000 * COUNT(*)) // n.total AS BIGINT)
                   AS df_ppm
        FROM g, n GROUP BY gm, n.total
        ORDER BY df DESC, gm LIMIT 20
    """,
    doc="Cross-doc template n-grams (the C4/RefinedWeb boilerplate "
    f"signal): top-20 {TMPL_N}-grams by DOCUMENT frequency with "
    "integer-exact df ppm over gram-eligible docs — the phrases a "
    "curation pass would strip corpus-wide. Shape: per-doc DISTINCT "
    "grams (explode + array_distinct, no position carry) into ONE "
    "gram-keyed hash agg with map-side partials, a 1-row broadcast "
    "total, TakeOrdered top-20. The gram agg is the same shuffle "
    "class the dedup family (q87/q322/q324) rides — skew = real "
    "boilerplate, which is exactly what the query reports.",
)
def q325(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    # r14: spread the single-task scan before the tokenize/explode
    # (catalog.spread_scan; counts are order-exact)
    # r14: no min-length filter on tk (it re-ran the tokenize via
    # pushdown substitution, guide §4.4 — see q324); the gram CASE
    # short-circuits short docs to NULL (explode drops them) and the
    # qualifying-doc count rides a conditional sum over the projected
    # toks attribute (free reference)
    tk = spread_scan(docs.select("doc_id", "text")).select(
        "doc_id", F.expr(_TOKS).alias("toks")
    )
    total = tk.agg(
        F.coalesce(
            F.sum(
                F.when(F.size("toks") >= TMPL_N, F.lit(1)).otherwise(
                    F.lit(0)
                )
            ),
            F.lit(0),
        ).alias("total")
    )
    g = tk.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN size(toks) >= {TMPL_N} THEN array_distinct("
                f"transform(sequence(1, size(toks) - {TMPL_N - 1}),"
                f" i -> array_join(slice(toks, i, {TMPL_N}), ' '))) END"
            )
        ).alias("gm"),
    )
    return (
        g.groupBy("gm")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
        .crossJoin(F.broadcast(total))
        .select(
            "gm",
            "df",
            F.expr("CAST((1000000 * df) DIV total AS BIGINT)")
            .alias("df_ppm"),
        )
        .orderBy(F.desc("df"), "gm")
        .limit(20)
    )


@register(
    "q326_dedup_mixture_shift",
    oracle=f"""
        WITH f AS (
            SELECT doc_id, lang,
                   substr(coalesce(text, ''), 1, {PREFIX_W}) AS k
            FROM documents),
        s AS (
            SELECT doc_id, lang,
                   ROW_NUMBER() OVER (PARTITION BY k ORDER BY doc_id)
                       AS rn
            FROM f),
        b AS (
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_before,
                   CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_after
            FROM s GROUP BY lang),
        t AS (
            SELECT SUM(n_before) AS tb, SUM(n_after) AS ta FROM b)
        SELECT lang, n_before, n_after,
               CAST((1000000 * n_before) // t.tb AS BIGINT)
                   AS ppm_before,
               CAST((1000000 * n_after) // t.ta AS BIGINT) AS ppm_after,
               CAST((1000000 * n_after) // t.ta AS BIGINT)
                   - CAST((1000000 * n_before) // t.tb AS BIGINT)
                   AS shift_ppm
        FROM b, t ORDER BY lang
    """,
    doc="Dedup mixture-shift audit: what keep-lowest-doc_id dedup on "
    f"the {PREFIX_W}-char prefix key (q322's prefix tier) does to the "
    "LANGUAGE mixture — per lang, docs before/after, integer-ppm "
    "shares of each population, and the signed ppm shift. The number "
    "a curation owner checks before shipping a dedup stage: dedup "
    "that silently drains a low-resource language is a regression "
    "even when the dedup itself is correct. Shape: the (doc_id, "
    "lang, key) frame is checkpointed ONCE at doc grain (text read "
    "exactly once); the survivor is min_by(lang, doc_id) per key — a "
    "hash agg, no window — then lang-grain counts and a 1-row "
    "broadcast totals join. Scales as the dedup pass it audits.",
)
def q326(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    keyed = docs.select(
        "doc_id",
        "lang",
        F.expr(f"substring(coalesce(text, ''), 1, {PREFIX_W})").alias("k"),
    ).localCheckpoint(eager=True)
    before = keyed.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_before")
    )
    after = (
        keyed.groupBy("k")
        .agg(F.expr("min_by(lang, doc_id)").alias("lang"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_after"))
    )
    b = before.join(after, "lang", "left").select(
        "lang",
        "n_before",
        F.coalesce("n_after", F.lit(0)).cast("bigint").alias("n_after"),
    )
    t = keyed.agg(
        F.count(F.lit(1)).alias("tb"),
        F.countDistinct("k").alias("ta"),
    )
    return (
        b.crossJoin(F.broadcast(t))
        .select(
            "lang",
            "n_before",
            "n_after",
            F.expr("CAST((1000000 * n_before) DIV tb AS BIGINT)")
            .alias("ppm_before"),
            F.expr("CAST((1000000 * n_after) DIV ta AS BIGINT)")
            .alias("ppm_after"),
            F.expr(
                "CAST((1000000 * n_after) DIV ta AS BIGINT) - "
                "CAST((1000000 * n_before) DIV tb AS BIGINT)"
            ).alias("shift_ppm"),
        )
        .orderBy("lang")
    )


@register(
    "q327_bpe_pair_stats",
    oracle=f"""
        WITH w AS (
            SELECT unnest({_TOKS_SQL}) AS w FROM documents),
        p AS (
            SELECT substr(w, u.i, 2) AS pair
            FROM w, UNNEST(generate_series(1, len(w) - 1)) AS u(i)
            WHERE len(w) >= 2)
        SELECT pair, CAST(COUNT(*) AS BIGINT) AS c
        FROM p GROUP BY pair ORDER BY c DESC, pair LIMIT 20
    """,
    doc="BPE first-merge pair statistics (tokenizer training's step "
    "one): corpus-wide counts of ADJACENT CHARACTER pairs inside "
    "whitespace tokens, top-20 merge candidates — the pair a BPE "
    "trainer would merge first, straight off the corpus. Distinct "
    "from q123 (word-bigram LM) and q217 (fertility): this is "
    "sub-word. Shape: token explode -> in-row pair explode (length-1 "
    "pairs per token) -> ONE small-key hash agg (pair vocabulary is "
    "at most |charset|^2) with map-side partials; TakeOrdered "
    "top-20. The agg key domain is tiny, so the reduce side is "
    "near-free at any corpus size.",
)
def q327(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    return (
        docs.select(F.explode(F.expr(_TOKS)).alias("w"))
        .filter(F.length("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(w) - 1), "
                    "i -> substring(w, i, 2))"
                )
            ).alias("pair")
        )
        .groupBy("pair")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .orderBy(F.desc("c"), "pair")
        .limit(20)
    )


@register(
    "q328_vocab_coverage_curve",
    oracle=f"""
        WITH tok AS (
            SELECT unnest({_TOKS_SQL}) AS tok FROM documents),
        fr AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
            FROM tok GROUP BY tok),
        r AS (
            SELECT tok, c,
                   ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS rn,
                   SUM(c) OVER (ORDER BY c DESC, tok
                                ROWS UNBOUNDED PRECEDING) AS cum
            FROM fr),
        t AS (SELECT SUM(c) AS total FROM fr),
        th AS (SELECT unnest([50, 90, 99]) AS pct)
        SELECT pct, CAST(MIN(rn) AS BIGINT) AS k_tokens,
               CAST((1000000 * MIN_BY(cum, rn)) // MIN(t.total)
                    AS BIGINT) AS mass_ppm
        FROM r, t, th
        WHERE cum * 100 >= t.total * pct
        GROUP BY pct ORDER BY pct
    """,
    doc="Vocabulary coverage curve (tokenizer budget planning): the "
    "number of highest-frequency tokens needed to cover 50/90/99% of "
    "corpus token MASS, with the integer-exact ppm mass actually "
    "achieved at that k — integer cross-multiply (cum*100 >= "
    "total*pct) decides the threshold, never a float share. "
    "Complements q320 (fixed-k OOV) and q187 (Zipf slope). Shape: "
    "one token-keyed hash agg (the q44 shuffle), then ranking and "
    "the cumulative sum run over the VOCABULARY (orders of magnitude "
    "smaller than the corpus — a global window over vocab rows is "
    "the declared exception to the no-global-window rule, same as "
    "q187), 1-row broadcast total, 3-row threshold explode.",
)
def q328(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    fr = (
        docs.select(F.explode(F.expr(_TOKS)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    w = Window.orderBy(F.desc("c"), "tok")
    r = fr.select(
        "c",
        F.row_number().over(w).alias("rn"),
        F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
    )
    t = fr.agg(F.sum("c").alias("total"))
    th = spark.range(1).select(
        F.explode(F.array(F.lit(50), F.lit(90), F.lit(99))).alias("pct")
    )
    return (
        r.crossJoin(F.broadcast(t))
        .crossJoin(F.broadcast(th))
        .filter(F.col("cum") * 100 >= F.col("total") * F.col("pct"))
        .groupBy("pct")
        .agg(
            F.min("rn").cast("bigint").alias("k_tokens"),
            F.expr(
                "CAST((1000000 * min_by(cum, rn)) DIV min(total) "
                "AS BIGINT)"
            ).alias("mass_ppm"),
        )
        .orderBy("pct")
    )


#: q329: the power-of-two batch-bucket ladder (16 .. 2048, 4096 cap)
_BUCKETS = [16, 32, 64, 128, 256, 512, 1024, 2048]


def _bucket_case(col: str) -> str:
    whens = " ".join(
        f"WHEN {col} <= {b} THEN {b}" for b in _BUCKETS
    )
    return f"CASE {whens} ELSE 4096 END"


@register(
    "q329_padding_waste",
    oracle=f"""
        WITH t AS (
            SELECT len({_TOKS_SQL}) AS n_tok FROM documents),
        b AS (
            SELECT {_bucket_case('n_tok')} AS bucket, n_tok FROM t)
        SELECT CAST(bucket AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS docs,
               CAST(SUM(LEAST(n_tok, bucket)) AS BIGINT) AS tok_mass,
               CAST(SUM(bucket - LEAST(n_tok, bucket)) AS BIGINT)
                   AS pad_tokens,
               CAST(SUM(GREATEST(n_tok - bucket, 0)) AS BIGINT)
                   AS trunc_tokens,
               CAST((1000000 * SUM(bucket - LEAST(n_tok, bucket)))
                    // (COUNT(*) * bucket) AS BIGINT) AS pad_ppm
        FROM b GROUP BY bucket ORDER BY bucket
    """,
    doc="Length-bucket padding waste (the batching audit q161's "
    "sequence PACKING is the alternative to): docs binned to the "
    "power-of-two token-length ladder 16..2048 (4096 cap), per "
    "bucket the real token mass, the padding tokens a pad-to-bucket "
    "batcher burns, the truncation loss at the cap, and integer-ppm "
    "padding share of the padded batch mass. The ladder is a CASE "
    "chain (exact integers — never CEIL(LOG2()) whose float edge "
    "misbuckets exact powers of two). Shape: scan-grain token count "
    "-> ONE 9-key hash agg; scales as a pure scan.",
)
def q329(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    b = docs.select(
        F.expr(f"size({_TOKS})").alias("n_tok")
    ).select(F.expr(_bucket_case("n_tok")).alias("bucket"), "n_tok")
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("docs"),
            F.sum(F.least("n_tok", "bucket")).cast("bigint")
            .alias("tok_mass"),
            F.sum(F.col("bucket") - F.least("n_tok", "bucket"))
            .cast("bigint")
            .alias("pad_tokens"),
            F.sum(F.greatest(F.col("n_tok") - F.col("bucket"), F.lit(0)))
            .cast("bigint")
            .alias("trunc_tokens"),
            F.expr(
                "CAST((1000000 * SUM(bucket - LEAST(n_tok, bucket))) "
                "DIV (COUNT(*) * bucket) AS BIGINT)"
            ).alias("pad_ppm"),
        )
        .select(
            F.col("bucket").cast("bigint").alias("bucket"),
            "docs", "tok_mass", "pad_tokens", "trunc_tokens", "pad_ppm",
        )
        .orderBy("bucket")
    )


@register(
    "q330_quantized_recall",
    oracle=f"""
        WITH g AS (
            SELECT MAX(list_max(list_transform(
                       CAST(embedding AS DOUBLE[]), x -> abs(x))))
                   AS gmax
            FROM embeddings),
        qz AS (
            SELECT vec_id,
                   CAST(embedding AS DOUBLE[]) AS ev,
                   list_transform(CAST(embedding AS DOUBLE[]),
                       x -> CAST(ROUND((x * 127.0) / g.gmax) AS BIGINT))
                       AS qv
            FROM embeddings, g),
        qs AS (SELECT * FROM qz WHERE vec_id < {RECALL_Q}),
        pairs AS (
            SELECT qs.vec_id AS query_id, c.vec_id,
                   ROUND(list_dot_product(c.ev, qs.ev), 4) AS dot4,
                   list_sum(list_transform(
                       generate_series(1, len(c.qv)),
                       i -> c.qv[i] * qs.qv[i])) AS idot
            FROM qz c, qs WHERE c.vec_id <> qs.vec_id),
        ex AS (
            SELECT query_id, vec_id FROM (
                SELECT query_id, vec_id,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                           ORDER BY dot4 DESC, vec_id) AS rn
                FROM pairs) WHERE rn <= {RECALL_K}),
        qt AS (
            SELECT query_id, vec_id FROM (
                SELECT query_id, vec_id,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                           ORDER BY idot DESC, vec_id) AS rn
                FROM pairs) WHERE rn <= {RECALL_K})
        SELECT ex.query_id,
               CAST(COUNT(qt.vec_id) AS BIGINT) AS n_overlap,
               CAST((1000000 * COUNT(qt.vec_id)) // {RECALL_K}
                    AS BIGINT) AS recall_ppm
        FROM ex LEFT JOIN qt USING (query_id, vec_id)
        GROUP BY ex.query_id ORDER BY ex.query_id
    """,
    doc="Int8-quantization retrieval recall (the go/no-go audit "
    "before shipping a quantized ANN index; q154 reports the vector "
    "ERROR, this reports the retrieval consequence): per query "
    f"vector (vec_id < {RECALL_Q}), the overlap between exact-dot "
    f"top-{RECALL_K} and GLOBAL-scale int8 quantized-dot "
    f"top-{RECALL_K}, as integer recall ppm. The quantized ranking "
    "key is a BIGINT integer dot (bit-exact cross-engine); the exact "
    "key is ROUND(dot, 4) with vec_id tie-break (the q43 "
    "determinism pattern). Shape: 1-row broadcast global scale, "
    f"{RECALL_Q}-row broadcast query side against a single candidate "
    "scan (brute force IS the audit's ground truth — the production "
    "search path is q53/q126), two rank windows partitioned by "
    "query_id over the same pair frame, one overlap join at "
    f"({RECALL_Q}x{RECALL_K})-row grain.",
)
def q330(spark: SparkSession, sf: str) -> DataFrame:
    emb = table(spark, sf, "embeddings")
    g = emb.agg(
        F.max(
            F.array_max(
                F.expr("transform(embedding, x -> abs(CAST(x AS DOUBLE)))")
            )
        ).alias("gmax")
    )
    qz = emb.crossJoin(F.broadcast(g)).select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("ev"),
        F.expr(
            "transform(embedding, x -> CAST(ROUND((CAST(x AS DOUBLE) "
            "* 127.0) / gmax) AS BIGINT))"
        ).alias("qv"),
    )
    # r14 optimization (guide §1.2/§5): the query side is RECALL_Q
    # rows — pin it so the broadcast build does not re-run the global
    # scale agg + quantize scan (the unpinned q330 plan re-read
    # embeddings 8x: qs re-derived qz inside each pairs consumer)
    qs = (
        qz.filter(F.col("vec_id") < RECALL_Q)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("ev").alias("q_ev"),
            F.col("qv").alias("q_qv"),
        )
        .localCheckpoint(eager=True)
    )
    pairs = (
        qz.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                F.expr(
                    "aggregate(zip_with(ev, q_ev, (x, y) -> x * y), "
                    "0.0D, (a, x) -> a + x)"
                ),
                4,
            ).alias("dot4"),
            F.expr(
                "aggregate(zip_with(qv, q_qv, (x, y) -> x * y), "
                "CAST(0 AS BIGINT), (a, x) -> a + x)"
            ).alias("idot"),
        )
    )
    w_ex = Window.partitionBy("query_id").orderBy(
        F.desc("dot4"), "vec_id"
    )
    w_qt = Window.partitionBy("query_id").orderBy(
        F.desc("idot"), "vec_id"
    )
    # both rank filters read ONE evaluation of the pair frame: filter
    # to the <= 2*Q*K candidate rows first, then pin that tiny frame
    # (unpinned, the ex and qt branches each re-ran the whole
    # pair-construction lineage — the other half of the 8x scan)
    ranked = (
        pairs.select(
            "query_id",
            "vec_id",
            F.row_number().over(w_ex).alias("rn_ex"),
            F.row_number().over(w_qt).alias("rn_qt"),
        )
        .filter(
            (F.col("rn_ex") <= RECALL_K) | (F.col("rn_qt") <= RECALL_K)
        )
        .localCheckpoint(eager=True)
    )
    ex = ranked.filter(F.col("rn_ex") <= RECALL_K).select(
        "query_id", "vec_id"
    )
    qt = ranked.filter(F.col("rn_qt") <= RECALL_K).select(
        "query_id", "vec_id", F.lit(1).alias("_hit")
    )
    return (
        ex.join(qt, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(F.sum(F.coalesce("_hit", F.lit(0))).cast("bigint")
             .alias("n_overlap"))
        .select(
            "query_id",
            "n_overlap",
            F.expr(
                f"CAST((1000000 * n_overlap) DIV {RECALL_K} AS BIGINT)"
            ).alias("recall_ppm"),
        )
        .orderBy("query_id")
    )


#: q331: the q49/q248 marker-token language heuristic, funnel form
_MARKERS = [("en", " the "), ("de", " der "), ("es", " el "),
            ("fr", " le ")]


@register(
    "q331_curation_funnel",
    oracle=f"""
        WITH f AS (
            SELECT doc_id,
                   coalesce(text, '') AS t,
                   n_chars >= 100 AS g1,
                   ({" OR ".join(
                       f"contains(' ' || coalesce(text, '') || ' ', '{m}')"
                       for _, m in _MARKERS)}) AS g2,
                   len({_TOKS_SQL}) >= 30 AS g3,
                   substr(coalesce(text, ''), 1, {PREFIX_W}) AS k
            FROM documents),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n0,
                   CAST(SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n1,
                   CAST(SUM(CASE WHEN g1 AND g2 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n2,
                   CAST(SUM(CASE WHEN g1 AND g2 AND g3 THEN 1 ELSE 0
                        END) AS BIGINT) AS n3
            FROM f),
        d AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n4 FROM (
                SELECT ROW_NUMBER() OVER (PARTITION BY k
                           ORDER BY doc_id) AS rn
                FROM f WHERE g1 AND g2 AND g3) WHERE rn = 1)
        SELECT stage, n_docs, dropped,
               CAST((1000000 * n_docs) // n0 AS BIGINT)
                   AS remaining_ppm
        FROM (
            SELECT '0_all' AS stage, n0 AS n_docs,
                   CAST(0 AS BIGINT) AS dropped, n0 FROM s, d
            UNION ALL SELECT '1_length', n1, n0 - n1, n0 FROM s, d
            UNION ALL SELECT '2_langid', n2, n1 - n2, n0 FROM s, d
            UNION ALL SELECT '3_toklen', n3, n2 - n3, n0 FROM s, d
            UNION ALL SELECT '4_dedup', n4, n3 - n4, n0 FROM s, d)
        ORDER BY stage
    """,
    doc="Sequential curation funnel (the multi-GATE sibling of q322's "
    "dedup-tier waterfall): length gate (n_chars >= 100) -> marker "
    "language-id gate (the q49 heuristic) -> token-length gate "
    "(>= 30) -> prefix-key dedup survivor gate, each reporting "
    "survivors, marginal drop, and integer-ppm of the original "
    "corpus remaining — the report a curation owner reads to see "
    "which gate is eating the corpus. Shape: per-doc flags at scan "
    "grain, ONE global count agg (5 scalars), one dedup-key window "
    "over the triple-gated subset (the dedup pass it prices), and a "
    "5-row stack — no corpus-scale join anywhere.",
)
def q331(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    padded = F.concat(F.lit(" "), F.coalesce("text", F.lit("")),
                      F.lit(" "))
    g2 = None
    for _, m in _MARKERS:
        c = F.contains(padded, F.lit(m))
        g2 = c if g2 is None else (g2 | c)
    f = docs.select(
        "doc_id",
        (F.col("n_chars") >= 100).alias("g1"),
        g2.alias("g2"),
        (F.expr(f"size({_TOKS})") >= 30).alias("g3"),
        F.expr(f"substring(coalesce(text, ''), 1, {PREFIX_W})")
        .alias("k"),
    )
    s = f.agg(
        F.count(F.lit(1)).cast("bigint").alias("n0"),
        F.sum(F.when(F.col("g1"), 1).otherwise(0)).cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("g1") & F.col("g2"), 1).otherwise(0))
        .cast("bigint").alias("n2"),
        F.sum(
            F.when(F.col("g1") & F.col("g2") & F.col("g3"), 1)
            .otherwise(0)
        ).cast("bigint").alias("n3"),
    )
    w = Window.partitionBy("k").orderBy("doc_id")
    d = (
        f.filter(F.col("g1") & F.col("g2") & F.col("g3"))
        .select(F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n4"))
    )
    return (
        s.crossJoin(F.broadcast(d))
        .selectExpr(
            "stack(5, "
            "'0_all', n0, CAST(0 AS BIGINT), "
            "'1_length', n1, n0 - n1, "
            "'2_langid', n2, n1 - n2, "
            "'3_toklen', n3, n2 - n3, "
            "'4_dedup', n4, n3 - n4"
            ") AS (stage, n_docs, dropped)",
            "n0",
        )
        .select(
            "stage",
            "n_docs",
            "dropped",
            F.expr("CAST((1000000 * n_docs) DIV n0 AS BIGINT)")
            .alias("remaining_ppm"),
        )
        .orderBy("stage")
    )
