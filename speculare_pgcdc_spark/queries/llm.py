"""LLM-data-pipeline queries (SURVEY §2B L1-L5 + extensions, Q42-Q53):
dedup (exact / Jaccard / MinHash-LSH / SimHash), similarity search
(brute-force + IVF), text analysis, multimodal plumbing.

Oracle=Y where the computation is SQL-mirrorable; sketch/approx ops
(LSH, SimHash, IVF) are rows-only here and property-tested in
tests/test_llm.py (recall vs exact, invariants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from speculare_pgcdc_spark.catalog import table
from speculare_pgcdc_spark.operators import dedup as dd
from speculare_pgcdc_spark.operators import multimodal as mm
from speculare_pgcdc_spark.operators import similarity as sim
from speculare_pgcdc_spark.operators import textstats as ts
from speculare_pgcdc_spark.queries import _kmeans_sql, _pq_sql, register


def _docs_subset(spark, sf, limit_id=200):
    return table(spark, sf, "documents").filter(F.col("doc_id") < limit_id)


@register(
    "q42_jaccard_neardup",
    oracle="""
        WITH docs AS (SELECT * FROM documents WHERE doc_id < 200),
        tokens AS (
            SELECT DISTINCT doc_id, tok FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM docs) WHERE tok <> ''),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM tokens GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
            FROM tokens a JOIN tokens b
              ON a.tok = b.tok AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id)
        SELECT da, db, ROUND(i * 1.0 / (sa.n + sb.n - i), 4) AS j
        FROM inter
        JOIN sizes sa ON sa.doc_id = da
        JOIN sizes sb ON sb.doc_id = db
        WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.6
        ORDER BY da, db
    """,
    doc="L2 exact token-Jaccard near-dup pairs (tau=0.6) over a bounded "
    "doc subset — the oracle twin of the MinHash-LSH scale path (q46). "
    "Engine impl: operators/dedup.jaccard_pairs.",
    bench=True,
)
def q42(spark: SparkSession, sf: str) -> DataFrame:
    tok = dd.tokens(_docs_subset(spark, sf))
    return dd.jaccard_pairs(tok, 0.6).orderBy("da", "db")


@register(
    "q43_cosine_topk",
    oracle="""
        WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id = 0)
        SELECT e.vec_id,
               ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                   / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                            CAST(e.embedding AS DOUBLE[])))
                      * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cos
        FROM embeddings e, q WHERE e.vec_id <> 0
        ORDER BY cos DESC, e.vec_id LIMIT 5
    """,
    doc="L3 brute-force cosine top-5 neighbors of vec_id=0. Spark path: "
    "zip_with+aggregate fold in double (no explode, no shuffle; final "
    "top-k is TakeOrderedAndProject). operators/similarity.cosine_topk.",
    bench=True,
)
def q43(spark: SparkSession, sf: str) -> DataFrame:
    emb = table(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    return sim.cosine_topk(emb.filter(F.col("vec_id") != 0), q, k=5)


@register(
    "q44_token_topk",
    oracle="""
        SELECT tok, COUNT(*) AS c FROM (
            SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        WHERE tok <> '' GROUP BY tok ORDER BY c DESC, tok LIMIT 20
    """,
    doc="L4 corpus token frequency top-20 (explode -> partial+final hash "
    "agg -> TakeOrdered; the canonical word-count shape).",
    bench=True,
)
def q44(spark: SparkSession, sf: str) -> DataFrame:
    # r14: catalog.spread_scan was A/B'd here and REVERTED (+95%
    # per-round ratio median) — the single-token explode collapses
    # map-side so cheaply that the extra exchange only costs
    return (
        table(spark, sf, "documents")
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "tok")
        .limit(20)
    )


@register(
    "q45_fingerprint_dedup",
    oracle="""
        SELECT doc_id, substr(md5(lower(trim(text))), 1, 16) AS fp FROM (
            SELECT doc_id, text,
                   ROW_NUMBER() OVER (PARTITION BY md5(lower(trim(text)))
                       ORDER BY doc_id) AS rn
            FROM documents)
        WHERE rn = 1 ORDER BY doc_id
    """,
    doc="L1 exact content dedup by md5 fingerprint, keep-lowest-doc_id "
    "(deterministic dropDuplicates). operators/textstats.fingerprint.",
)
def q45(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    w = Window.partitionBy(F.md5(F.lower(F.trim("text")))).orderBy("doc_id")
    return (
        docs.select(
            "doc_id",
            ts.fingerprint(F.col("text")).alias("fp"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
        .orderBy("doc_id")
    )


@register(
    "q46_minhash_lsh",
    oracle=None,  # sketch op: recall-vs-exact property test in test_llm.py
    doc="L2 scale path: MinHash(32) + LSH(8 bands x 4 rows) candidates, "
    "exact-Jaccard verified (tau=0.6). Output is a recall-bounded "
    "subset of q42. operators/dedup.minhash_lsh_pairs.",
    bench=True,
)
def q46(spark: SparkSession, sf: str) -> DataFrame:
    return dd.minhash_lsh_pairs(_docs_subset(spark, sf), 0.6).orderBy(
        "da", "db"
    )


@register(
    "q47_simhash",
    oracle=None,  # property-tested: identical text => identical simhash
    doc="L2 SimHash-64 per document (bitwise majority of token hashes); "
    "near-dup = small Hamming distance. operators/dedup.simhash64.",
)
def q47(spark: SparkSession, sf: str) -> DataFrame:
    return dd.simhash64(_docs_subset(spark, sf)).orderBy("doc_id")


@register(
    "q48_embedding_neardup",
    oracle="""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings WHERE vec_id < 300)
        SELECT a.vec_id AS va, b.vec_id AS vb,
               ROUND(list_dot_product(a.v, b.v)
                   / (sqrt(list_dot_product(a.v, a.v))
                      * sqrt(list_dot_product(b.v, b.v))), 4) AS cos
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, b.v)
                   / (sqrt(list_dot_product(a.v, a.v))
                      * sqrt(list_dot_product(b.v, b.v))) >= 0.3
        ORDER BY va, vb
    """,
    doc="L2/L3 embedding-cosine near-dup pairs (tau=0.3 fits the random "
    "fixture distribution) over a bounded subset; the all-pairs join is "
    "the exactness baseline whose scale path is LSH bucketing (random "
    "hyperplanes) — same shape as q46 vs q42.",
)
def q48(spark: SparkSession, sf: str) -> DataFrame:
    # norms precomputed ONCE per vector (n folds), not per pair
    # (n^2 folds would triple the pair-stage work); the per-pair
    # expression stays dot/(na*nb) — the exact arithmetic of the
    # oracle, so results are bit-identical
    e = (
        table(spark, sf, "embeddings")
        .filter(F.col("vec_id") < 300)
        .select(
            "vec_id",
            "embedding",
            sim._norm(F.col("embedding")).alias("nrm"),
        )
    )
    a = e.select(
        F.col("vec_id").alias("va"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = e.select(
        F.col("vec_id").alias("vb"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    pairs = a.join(b, F.col("va") < F.col("vb"))
    cos = sim._dot(F.col("ea"), F.col("eb")) / (
        F.col("na") * F.col("nb")
    )
    return (
        pairs.withColumn("_cos_raw", cos)
        .filter(F.col("_cos_raw") >= 0.3)
        .select("va", "vb", F.round("_cos_raw", 4).alias("cos"))
        .orderBy("va", "vb")
    )


@register(
    "q49_lang_id",
    oracle="""
        SELECT doc_id,
               CASE WHEN contains(' ' || text || ' ', ' the ') THEN 'en'
                    WHEN contains(' ' || text || ' ', ' der ') THEN 'de'
                    WHEN contains(' ' || text || ' ', ' el ') THEN 'es'
                    WHEN contains(' ' || text || ' ', ' le ') THEN 'fr'
                    ELSE 'unk' END AS lang_guess
        FROM documents ORDER BY doc_id
    """,
    doc="L4 language-ID heuristic (marker-token priority match; the seam "
    "where an n-gram profile model plugs in). "
    "operators/textstats.lang_guess.",
)
def q49(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "documents")
        .select("doc_id", ts.lang_guess(F.col("text")).alias("lang_guess"))
        .orderBy("doc_id")
    )


@register(
    "q50_quality_score",
    oracle="""
        SELECT doc_id,
               CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
                   AS BIGINT) AS n_tok_ws,
               ROUND(len(list_filter(string_split(text, ' '),
                       t -> list_contains(['the','a','of','and','to','in'], t)))
                   * 1.0 / greatest(len(list_filter(string_split(text, ' '),
                       t -> t <> '')), 1), 4) AS stop_ratio,
               ROUND((least(len(list_filter(string_split(text, ' '),
                           t -> t <> '')) / 20.0, 1.0)
                      + (1.0 - len(list_filter(string_split(text, ' '),
                           t -> list_contains(['the','a','of','and','to','in'], t)))
                          * 1.0 / greatest(len(list_filter(string_split(text, ' '),
                           t -> t <> '')), 1))) / 2.0, 4) AS quality
        FROM documents ORDER BY doc_id
    """,
    doc="L4 quality scoring: token count, stopword ratio, composite "
    "score — narrow codegen'd projection. operators/textstats.",
)
def q50(spark: SparkSession, sf: str) -> DataFrame:
    t = F.col("text")
    return (
        table(spark, sf, "documents")
        .select(
            "doc_id",
            ts.token_count_ws(t).alias("n_tok_ws"),
            ts.stopword_ratio(t).alias("stop_ratio"),
            ts.quality_score(t).alias("quality"),
        )
        .orderBy("doc_id")
    )


@register(
    "q51_token_count",
    oracle="""
        SELECT doc_id,
               CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
                   AS BIGINT) AS n_ws,
               CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_re
        FROM documents ORDER BY doc_id
    """,
    doc="L4 token counting: whitespace and regex tokenizers side by side.",
)
def q51(spark: SparkSession, sf: str) -> DataFrame:
    t = F.col("text")
    return (
        table(spark, sf, "documents")
        .select(
            "doc_id",
            ts.token_count_ws(t).alias("n_ws"),
            ts.token_count_re(t).alias("n_re"),
        )
        .orderBy("doc_id")
    )


@register(
    "q52_multimodal_meta",
    oracle="""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               substr(sha256(text), 1, 16) AS digest
        FROM documents ORDER BY doc_id
    """,
    doc="L5 multimodal binary-column plumbing: opaque payload bytes + "
    "typed metadata + content digest (UTF-8 text bytes stand in for "
    "media payloads; identical plumbing for JPEG/PCM). The mapInPandas "
    "featurizer with the stubbed decoder is behavior-tested in "
    "tests/test_llm.py. operators/multimodal.",
)
def q52(spark: SparkSession, sf: str) -> DataFrame:
    with_payload = mm.attach_payload(table(spark, sf, "documents"))
    return (
        with_payload.select(
            "doc_id",
            F.col("meta.n_bytes").alias("n_bytes"),
            F.substring(F.sha2(F.decode("payload", "UTF-8"), 256), 1, 16)
            .alias("digest"),
        )
        .orderBy("doc_id")
    )


@register(
    "q164_frame_sampling",
    oracle="""
        WITH sized AS (
            -- DuckDB cannot slice BLOBs; the fixture corpus is pure
            -- ASCII (octet_length(encode(text)) == length(text) for
            -- every row), so CHARACTER slicing before encode() is
            -- byte-exact
            SELECT doc_id, text,
                   LEAST(8, GREATEST(octet_length(encode(text)), 1) // 32)
                       AS nf
            FROM documents
        )
        SELECT doc_id,
               CAST(t.i AS INTEGER) AS frame_idx,
               hex(encode(substring(text, CAST(t.i * 32 + 1 AS BIGINT),
                                    32))) AS frame_hex,
               CAST(t.i * 1000 AS BIGINT) AS ts_ms
        FROM sized,
             LATERAL (SELECT unnest(range(0, nf)) AS i) t
        ORDER BY doc_id, frame_idx
    """,
    doc="L5 multimodal 1:N frame sampling over mapInPandas — the row "
    "EXPLOSION shape (one video payload -> up to max_frames frame "
    "rows) that a scalar pandas_udf cannot express. The ffmpeg seam "
    "is stubbed (operators/multimodal.sample_frames); the stand-in "
    "slices the payload every 32 bytes with index-derived "
    "timestamps, which — being pure byte arithmetic — lets a DuckDB "
    "oracle hash-check the FULL Arrow-batched 1:N path end-to-end "
    "(payload construction, batch iteration, per-row fan-out, "
    "schema), not just run it. Frames project as hex so both engines "
    "compare strings, not engine-specific binary types. Narrow map, "
    "no shuffle; output volume is input rows x max_frames, bounded.",
)
def q164(spark: SparkSession, sf: str) -> DataFrame:
    with_payload = mm.attach_payload(table(spark, sf, "documents"))
    frames = mm.sample_frames(with_payload)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.hex("frame").alias("frame_hex"),
        "ts_ms",
    ).orderBy("doc_id", "frame_idx")


@register(
    "q178_silhouette",
    oracle="""
        WITH e AS (
            SELECT vec_id, label,
                   unnest(generate_series(1, len(embedding))) AS pos,
                   unnest(CAST(embedding AS DOUBLE[])) AS x
            FROM embeddings
        ),
        cents AS (
            SELECT label AS clabel, pos,
                   CAST(SUM(CAST(x AS DECIMAL(28,8))) AS DOUBLE)
                       / COUNT(DISTINCT vec_id) AS m
            FROM e GROUP BY label, pos
        ),
        d2 AS (
            SELECT e.vec_id, e.label, c.clabel,
                   sqrt(CAST(SUM(CAST((x - m) * (x - m)
                        AS DECIMAL(38,12))) AS DOUBLE)) AS dist
            FROM e JOIN cents c ON e.pos = c.pos
            GROUP BY e.vec_id, e.label, c.clabel
        ),
        ab AS (
            SELECT vec_id, label,
                   MIN(CASE WHEN label = clabel THEN dist END) AS a,
                   MIN(CASE WHEN label <> clabel THEN dist END) AS b
            FROM d2 GROUP BY vec_id, label
        )
        SELECT label,
               CAST(COUNT(*) AS BIGINT) AS n_vecs,
               CAST(ROUND(CAST(SUM(CAST(
                   (b - a) / GREATEST(a, b) AS DECIMAL(28,12)))
                   AS DOUBLE) / COUNT(*), 4) AS DOUBLE) AS silhouette
        FROM ab WHERE GREATEST(a, b) > 0
        GROUP BY label
        ORDER BY label
    """,
    doc="Silhouette score (centroid form) per label — the cluster-"
    "quality metric for an embedding space: a = distance to the OWN "
    "label's centroid, b = distance to the nearest OTHER centroid, "
    "s = (b-a)/max(a,b) averaged per label. Evaluates exactly the "
    "structure the IVF/cluster-neardup paths (q53/q91) depend on. "
    "One (label, dim) centroid agg (decimal means, the q83 "
    "contract), then a broadcast of the dims x labels model onto the "
    "exploded vectors — per-(vec, centroid) squared distances "
    "accumulate in DECIMAL so the 64-term sums are shuffle-order-"
    "proof, sqrt is IEEE-exact, and the per-label average is "
    "DECIMAL-summed again. Cost: vecs x labels x dims narrow rows, "
    "one wide stage on (vec, centroid).",
)
def q178(spark: SparkSession, sf: str) -> DataFrame:
    e = (
        table(spark, sf, "embeddings")
        .select(
            "vec_id", "label", F.posexplode("embedding").alias("pos", "xf")
        )
        .select(
            "vec_id",
            "label",
            (F.col("pos") + 1).alias("pos"),
            F.col("xf").cast("double").alias("x"),
        )
    )
    # pin the exploded (vec, dim) frame: the centroid agg and the
    # distance join both consume it — without the checkpoint the
    # scan + posexplode (the widest intermediate) runs twice
    e = e.localCheckpoint(eager=True)
    cents = e.groupBy(
        F.col("label").alias("clabel"), "pos"
    ).agg(
        (
            F.sum(F.col("x").cast("decimal(28,8)")).cast("double")
            / F.countDistinct("vec_id")
        ).alias("m")
    )
    d2 = (
        e.join(F.broadcast(cents), "pos")
        .groupBy("vec_id", "label", "clabel")
        .agg(
            F.sqrt(
                F.sum(
                    ((F.col("x") - F.col("m")) * (F.col("x") - F.col("m")))
                    .cast("decimal(38,12)")
                ).cast("double")
            ).alias("dist")
        )
    )
    ab = d2.groupBy("vec_id", "label").agg(
        F.min(
            F.when(F.col("label") == F.col("clabel"), F.col("dist"))
        ).alias("a"),
        F.min(
            F.when(F.col("label") != F.col("clabel"), F.col("dist"))
        ).alias("b"),
    )
    s_term = (
        (F.col("b") - F.col("a")) / F.greatest(F.col("a"), F.col("b"))
    ).cast("decimal(28,12)")
    return (
        ab.filter(F.greatest(F.col("a"), F.col("b")) > 0)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(
                F.sum(s_term).cast("double") / F.count(F.lit(1)), 4
            ).cast("double").alias("silhouette"),
        )
        .orderBy("label")
    )


@register(
    "q183_knn_accuracy",
    oracle="""
        WITH e AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ),
        probes AS (SELECT * FROM e WHERE vec_id < 20),
        train AS (SELECT * FROM e WHERE vec_id >= 20),
        scored AS (
            SELECT p.vec_id, p.label AS true_label,
                   t.label AS nlabel,
                   ROW_NUMBER() OVER (PARTITION BY p.vec_id
                       ORDER BY list_dot_product(p.v, t.v)
                           / (sqrt(list_dot_product(p.v, p.v))
                              * sqrt(list_dot_product(t.v, t.v))) DESC,
                           t.vec_id) AS rk
            FROM probes p CROSS JOIN train t
        ),
        votes AS (
            SELECT vec_id, true_label, nlabel, COUNT(*) AS n
            FROM scored WHERE rk <= 5
            GROUP BY vec_id, true_label, nlabel
        ),
        top AS (
            SELECT vec_id, true_label, nlabel AS predicted,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                       ORDER BY n DESC, nlabel) AS vrk
            FROM votes
        )
        SELECT vec_id, true_label, predicted,
               CAST(true_label = predicted AS BOOLEAN) AS correct
        FROM top WHERE vrk = 1
        ORDER BY vec_id
    """,
    doc="kNN label prediction accuracy — the labeled-embedding "
    "evaluation that closes the eval suite (q178's silhouette "
    "measures geometry; this measures whether geometry predicts "
    "LABELS): each probe takes its 5 nearest train vectors by exact "
    "cosine (total (cosine desc, id) order — deterministic under "
    "ties), majority vote with a (count desc, label) tie-break. The "
    "probe set is bounded so the exact cross join is probes x train "
    "— the verification-sized twin of the q43 top-k, whose ANN "
    "variants (q53/q71/q126) are the scale path for large probe "
    "sets. Identical IEEE cosines both engines; even the vote is "
    "integer.",
)
def q183(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = table(spark, sf, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").alias("v"),
        sim._norm(F.col("embedding")).alias("nrm"),
    )
    probes = (
        e.filter(F.col("vec_id") < 20)
        .select(
            F.col("vec_id").alias("pid"),
            F.col("label").alias("true_label"),
            F.col("v").alias("pv"),
            F.col("nrm").alias("pn"),
        )
    )
    train = e.filter(F.col("vec_id") >= 20).select(
        F.col("vec_id").alias("tid"),
        F.col("label").alias("nlabel"),
        F.col("v").alias("tv"),
        F.col("nrm").alias("tn"),
    )
    cos = sim._dot(F.col("pv"), F.col("tv")) / (
        F.col("pn") * F.col("tn")
    )
    rk = W.partitionBy("pid").orderBy(F.col("_cos").desc(), "tid")
    scored = (
        probes.crossJoin(train)
        .withColumn("_cos", cos)
        .withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") <= 5)
    )
    votes = scored.groupBy("pid", "true_label", "nlabel").agg(
        F.count(F.lit(1)).alias("n")
    )
    vrk = W.partitionBy("pid").orderBy(F.col("n").desc(), "nlabel")
    return (
        votes.withColumn("vrk", F.row_number().over(vrk))
        .filter(F.col("vrk") == 1)
        .select(
            F.col("pid").alias("vec_id"),
            "true_label",
            F.col("nlabel").alias("predicted"),
            (F.col("true_label") == F.col("nlabel")).alias("correct"),
        )
        .orderBy("vec_id")
    )


@register(
    "q185_mutual_information",
    oracle="""
        WITH joint AS (
            SELECT event_type AS t,
                   CAST(EXTRACT(hour FROM ts) AS INTEGER) AS h,
                   COUNT(*) AS c
            FROM events GROUP BY t, h
        ),
        mt AS (SELECT t, SUM(c) AS ct FROM joint GROUP BY t),
        mh AS (SELECT h, SUM(c) AS ch FROM joint GROUP BY h),
        tot AS (SELECT SUM(c) AS n FROM joint)
        SELECT CAST(tot.n AS BIGINT) AS n,
               CAST(ROUND(SUM(CAST(
                   (c * 1.0 / n) * ln((c * 1.0 / n)
                       / ((ct * 1.0 / n) * (ch * 1.0 / n)))
                   AS DECIMAL(28,12))), 6) AS DOUBLE)
                   AS mutual_info
        FROM joint
        JOIN mt ON joint.t = mt.t
        JOIN mh ON joint.h = mh.h
        CROSS JOIN tot
        GROUP BY tot.n
    """,
    doc="Mutual information I(event_type; hour-of-day) — the "
    "dependence measure between two categorical columns (feature "
    "selection, drift detection between a label and a covariate; "
    "near zero here because the synthetic stream is "
    "time-homogeneous, which is itself the finding). One joint "
    "(t, h) agg feeds both marginals; probabilities are exact "
    "integer ratios so the p*ln terms are identical doubles, summed "
    "in DECIMAL (the q136/q144 contract). Output is a single row — "
    "at any scale only the types x 24 joint table exists after the "
    "first aggregation.",
)
def q185(spark: SparkSession, sf: str) -> DataFrame:
    joint = (
        table(spark, sf, "events")
        .groupBy(
            F.col("event_type").alias("t"),
            F.hour("ts").cast("int").alias("h"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    joint = joint.localCheckpoint(eager=True)
    mt = joint.groupBy("t").agg(F.sum("c").alias("ct"))
    mh = joint.groupBy("h").agg(F.sum("c").alias("ch"))
    tot = joint.agg(F.sum("c").alias("n"))
    p_th = F.col("c") * 1.0 / F.col("n")
    term = (
        p_th
        * F.log(
            p_th
            / (
                (F.col("ct") * 1.0 / F.col("n"))
                * (F.col("ch") * 1.0 / F.col("n"))
            )
        )
    ).cast("decimal(28,12)")
    return (
        joint.join(F.broadcast(mt), "t")
        .join(F.broadcast(mh), "h")
        .crossJoin(F.broadcast(tot))
        .groupBy("n")
        .agg(
            # decimal-domain ROUND (q169 skew01 lesson)
            F.round(F.sum(term), 6)
            .cast("double").alias("mutual_info")
        )
        .select(F.col("n").cast("bigint").alias("n"), "mutual_info")
    )


@register(
    "q175_image_resize_standin",
    oracle="""
        -- stand-in pixel path: truncate/pad the payload to w*h bytes.
        -- ASCII corpus => char slicing before encode() is byte-exact
        -- (the q164 note); rpad's NUL fill mirrors ljust(b'\\0')
        SELECT doc_id,
               hex(encode(rpad(substring(text, 1, 64), 64, chr(0))))
                   AS px_hex,
               CAST(8 AS INTEGER) AS width,
               CAST(8 AS INTEGER) AS height
        FROM documents
        ORDER BY doc_id
    """,
    doc="L5 multimodal 1:1 resize over mapInPandas, oracle-checked "
    "end-to-end like q164's 1:N sampler: the PIL seam "
    "(operators/multimodal.resize_images) falls back to the "
    "deterministic truncate/pad stand-in in codec-less environments, "
    "and that byte arithmetic lets DuckDB hash-verify the whole "
    "Arrow-batched path — batch iteration, per-row transform, "
    "declared dims, exact output size. The real-decode branch is "
    "separately exercised via an injected fake decoder in "
    "tests/test_llm.py; payloads project as hex (the q164 binary "
    "comparator contract). Narrow map, no shuffle.",
)
def q175(spark: SparkSession, sf: str) -> DataFrame:
    with_payload = mm.attach_payload(table(spark, sf, "documents"))
    resized = mm.resize_images(with_payload, width=8, height=8)
    return resized.select(
        "doc_id",
        F.hex("payload").alias("px_hex"),
        "width",
        "height",
    ).orderBy("doc_id")


@register(
    "q53_ann_ivf",
    oracle=None,  # invariant-tested: nprobe=all == brute force (test_llm)
    doc="L3 scale path: IVF approximate nearest neighbor over a TRAINED "
    "quantizer — DataFrame Lloyd's k-means (k=8, deterministic init, "
    "one n*dim shuffle per iteration, only the k*dim model crosses to "
    "the driver), probe the 3 nearest cells, exact top-5 within. "
    "operators/similarity.kmeans_centroids + ivf_topk_trained; recall "
    "on clustered data and the nprobe=k==exact degradation are pinned "
    "in tests/test_llm.py.",
)
def q53(spark: SparkSession, sf: str) -> DataFrame:
    emb = table(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    data = emb.filter(F.col("vec_id") != 0)
    cents = sim.kmeans_centroids(data, k=8, iters=2)
    return sim.ivf_topk_trained(data, q, cents, k=5, nprobe=3)


@register(
    "q66_rolling_fingerprint",
    oracle="""
        WITH h AS (
            SELECT doc_id, i,
                   SUM(ascii(substr(text, CAST(i + j AS INT), 1))
                       * CAST(pow(31, j) AS BIGINT)) AS hash
            FROM documents,
                 unnest(range(1, len(text) - 6)) t(i),
                 unnest(range(0, 8)) o(j)
            WHERE doc_id < 200
            GROUP BY doc_id, i),
        d AS (SELECT DISTINCT doc_id, hash FROM h),
        r AS (SELECT doc_id, hash,
                     ROW_NUMBER() OVER (PARTITION BY doc_id
                                        ORDER BY hash) AS rn
              FROM d)
        SELECT doc_id,
               string_agg(CAST(hash AS VARCHAR), ',' ORDER BY hash) AS fp
        FROM r WHERE rn <= 4 GROUP BY doc_id ORDER BY doc_id
    """,
    doc="L1/L2 rolling-hash document fingerprint: polynomial hash of "
    "every 8-gram, bottom-4 sketch per document "
    "(operators/textstats.rolling_fingerprint). Unlike md5 (q45) the "
    "fingerprint is shift-invariant, so it flags near-dups, and it is "
    "a pure map-side column expression — no shuffle, no Python; the "
    "oracle recomputes the same hashes via SQL unnest arithmetic.",
)
def q66(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", ts.rolling_fingerprint("text").alias("fp"))
        .orderBy("doc_id")
    )


@register(
    "q71_srp_neardup",
    oracle=None,  # LSH sketch path; exactness baseline is q48
    doc="L2/L3 embedding near-dup SCALE path: deterministic signed-"
    "random-projection signatures (operators/similarity.srp_signature) "
    "-> banded bucket join -> exact cosine verification of candidates "
    "only. Subset-of-q48 with ~97% recall at tau=0.3 is pinned in "
    "tests/test_llm.py — the embedding analog of q46-vs-q42.",
)
def q71(spark: SparkSession, sf: str) -> DataFrame:
    emb = (
        table(spark, sf, "embeddings")
        .filter(F.col("vec_id") < 300)
        .select("vec_id", "embedding")
    )
    return sim.srp_neardup_pairs(emb, threshold=0.3).orderBy("da", "db")


@register(
    "q79_jaccard_df_capped",
    oracle="""
        WITH tokens AS (
            SELECT DISTINCT doc_id, tok FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM documents WHERE doc_id < 200)
            WHERE tok <> ''),
        dfreq AS (
            SELECT tok, COUNT(DISTINCT doc_id) AS df
            FROM tokens GROUP BY tok),
        capped AS (
            SELECT t.doc_id, t.tok FROM tokens t
            JOIN dfreq USING (tok) WHERE df <= 40),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM capped GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
            FROM capped a JOIN capped b
              ON a.tok = b.tok AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id)
        SELECT da, db, ROUND(i * 1.0 / (sa.n + sb.n - i), 4) AS j
        FROM inter
        JOIN sizes sa ON sa.doc_id = da
        JOIN sizes sb ON sb.doc_id = db
        WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.6
        ORDER BY da, db
    """,
    doc="L2 df-capped exact Jaccard (max_df=40): the documented scale "
    "prefilter for q42 made real — ubiquitous tokens are dropped "
    "BEFORE the pairwise join, bounding its fan-out to corpus*max_df "
    "instead of sum(df^2). operators/dedup.df_capped_tokens; the "
    "oracle recomputes the identical capped token sets in SQL.",
)
def q79(spark: SparkSession, sf: str) -> DataFrame:
    from speculare_pgcdc_spark.operators.dedup import (
        df_capped_tokens,
        jaccard_pairs,
        tokens,
    )

    docs = table(spark, sf, "documents").filter(F.col("doc_id") < 200)
    capped = df_capped_tokens(tokens(docs), max_df=40)
    return jaccard_pairs(capped, threshold=0.6).orderBy("da", "db")


@register(
    "q82_repetition_signal",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split(coalesce(text, ''), ' '),
                               x -> x <> '') AS toks
            FROM documents),
        g AS (
            SELECT doc_id, toks,
                   list_transform(
                       generate_series(1, len(toks) - 1),
                       i -> array_to_string(toks[i:i+1], ' ')) AS bg
            FROM t)
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tok,
               CAST(len(list_distinct(toks)) AS BIGINT) AS n_tok_distinct,
               CAST(len(bg) AS BIGINT) AS n_gram,
               CAST(len(list_distinct(bg)) AS BIGINT) AS n_gram_distinct,
               (len(bg) - len(list_distinct(bg))) * 5 > len(bg)
                   AS is_repetitive
        FROM g ORDER BY doc_id
    """,
    doc="L4 repetition quality signal (Gopher-style duplicate-n-gram "
    "filter): per-doc token/bigram totals and distinct counts, plus a "
    "duplicate-bigram-fraction > 0.2 flag evaluated by integer cross-"
    "multiply (a float ratio of two ints can land on a .xxxx5 rounding "
    "tie that engines break differently — the counts ARE the contract). "
    "Pure JVM array expressions, narrow map over the corpus. "
    "operators/textstats.repetition_counts.",
)
def q82(spark: SparkSession, sf: str) -> DataFrame:
    cnt = ts.repetition_counts(F.col("text"), n=2)
    return (
        table(spark, sf, "documents")
        .select(
            "doc_id",
            cnt["n_tok"].alias("n_tok"),
            cnt["n_tok_distinct"].alias("n_tok_distinct"),
            cnt["n_gram"].alias("n_gram"),
            cnt["n_gram_distinct"].alias("n_gram_distinct"),
            (
                (cnt["n_gram"] - cnt["n_gram_distinct"]) * 5
                > cnt["n_gram"]
            ).alias("is_repetitive"),
        )
        .orderBy("doc_id")
    )


@register(
    "q83_label_centroids",
    oracle="""
        WITH e AS (
            SELECT label,
                   unnest(generate_series(1, len(embedding))) AS pos,
                   unnest(CAST(embedding AS DOUBLE[])) AS x
            FROM embeddings),
        dims AS (
            SELECT label, pos,
                   CAST(SUM(CAST(x AS DECIMAL(28,8))) AS DOUBLE)
                       / COUNT(*) AS m,
                   COUNT(*) AS n
            FROM e GROUP BY label, pos),
        cents AS (
            SELECT label, MAX(n) AS n_vecs,
                   list(m ORDER BY pos) AS c
            FROM dims GROUP BY label)
        SELECT label, CAST(n_vecs AS BIGINT) AS n_vecs,
               ROUND(sqrt(list_dot_product(c, c)), 4) AS centroid_l2,
               ROUND(c[1] / nullif(sqrt(list_dot_product(c, c)), 0), 4)
                   AS unit0
        FROM cents ORDER BY label
    """,
    doc="L3/L5 per-label embedding centroid + L2 normalization — the "
    "class-prototype / embedding-averaging stage of a training "
    "pipeline. Dimension-wise mean via posexplode -> hash agg on "
    "(label, pos) (partial map-side agg; dims x labels output rows "
    "regardless of corpus size), re-assembled with an ordered "
    "collect_list, normalized by operators/similarity.l2_normalize. "
    "Sum goes through decimal(28,8) so shuffle order cannot change "
    "the mean; float inputs are dyadic rationals so the decimal cast "
    "has no rounding ties cross-engine.",
)
def q83(spark: SparkSession, sf: str) -> DataFrame:
    e = table(spark, sf, "embeddings").select(
        "label", F.posexplode("embedding").alias("pos", "x")
    )
    dims = e.groupBy("label", "pos").agg(
        (
            F.sum(F.col("x").cast("decimal(28,8)")).cast("double")
            / F.count(F.lit(1))
        ).alias("m"),
        F.count(F.lit(1)).alias("n"),
    )
    cents = dims.groupBy("label").agg(
        F.max("n").cast("bigint").alias("n_vecs"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))),
            lambda s: s["m"],
        ).alias("c"),
    )
    unit = sim.l2_normalize(F.col("c"))
    return cents.select(
        "label",
        "n_vecs",
        F.round(sim._norm(F.col("c")), 4).alias("centroid_l2"),
        F.round(F.element_at(unit, 1), 4).alias("unit0"),
    ).orderBy("label")


@register(
    "q84_pii_redaction",
    oracle="""
        WITH m AS (
            SELECT c_nationkey,
                   length(c_name)
                     - length(regexp_replace(c_name, '[0-9]', '', 'g'))
                       AS d,
                   CASE WHEN length(c_name) <= 4 THEN c_name
                        ELSE regexp_replace(
                                 substr(c_name, 1, length(c_name) - 4),
                                 '[0-9]', 'X', 'g')
                             || substr(c_name, length(c_name) - 3, 4)
                   END AS masked
            FROM customer)
        SELECT c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_cust,
               CAST(SUM(d) AS BIGINT) AS digits_redacted,
               CAST(COUNT(DISTINCT masked) AS BIGINT) AS n_mask_shapes
        FROM m GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    doc="PII-scrub audit over customer identifier strings (the "
    "redaction stage of a training-data pipeline): digits masked "
    "keep-last-4, with the per-nation audit counters a compliance "
    "pass must emit (rows scrubbed, characters redacted, surviving "
    "mask shapes). Pure regexp_replace maps + one hash agg; patterns "
    "stay in the char-class subset Java regex and RE2 read "
    "identically. operators/pii.",
)
def q84(spark: SparkSession, sf: str) -> DataFrame:
    from speculare_pgcdc_spark.operators import pii

    cust = table(spark, sf, "customer")
    phone = F.col("c_name")
    return (
        cust.select(
            "c_nationkey",
            pii.digit_count(phone).alias("d"),
            pii.redact_digits(phone, keep_last=4).alias("masked"),
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cust"),
            F.sum("d").cast("bigint").alias("digits_redacted"),
            F.countDistinct("masked").cast("bigint").alias(
                "n_mask_shapes"
            ),
        )
        .orderBy("c_nationkey")
    )


@register(
    "q85_kmeans_clusters",
    oracle=_kmeans_sql.kmeans_clusters_sql(
        "SELECT vec_id AS vid, embedding AS e FROM embeddings",
        k=8,
        iters=3,
    ),
    doc="L3 k-means clustering as a first-class query: train a k=8 "
    "quantizer with DataFrame Lloyd's iterations (operators/"
    "similarity.kmeans_centroids — per iteration one narrow assign "
    "map + one skinny (cluster, dim) shuffle; only the model crosses "
    "to the driver), then report per-cluster population and mean "
    "cosine-to-centroid. Deterministic end-to-end (md5-ranked init, "
    "6-decimal centroid rounding, decimal-summed cohesion) so reruns "
    "are bit-stable — which is what makes the oracle possible: the "
    "fixed Lloyd iterations unroll as staged CTEs in DuckDB "
    "(queries/_kmeans_sql.py), the q93 recursive-CTE move applied to "
    "training. Invariants (sizes sum to corpus, cohesion bounds, "
    "determinism) additionally pinned in tests/test_llm.py.",
)
def q85(spark: SparkSession, sf: str) -> DataFrame:
    emb = table(spark, sf, "embeddings")
    cents = sim.kmeans_centroids(emb, k=8, iters=3)
    assigned = sim.assign_nearest(emb, cents, out_score="_cos")
    # assign_nearest scores zero-norm vectors with a -2.0 sentinel
    # (no cosine exists); averaging it in would push mean_cos below
    # -1 — exclude such vectors from cohesion, keep them in n_vecs
    valid = F.when(
        F.col("_cos") >= -1.0,
        F.round(F.col("_cos"), 6).cast("decimal(28,6)"),
    )
    n_valid = F.count(valid)
    return (
        assigned.groupBy(F.col("_cid").alias("cluster"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.when(
                n_valid > 0, F.sum(valid).cast("double") / n_valid
            ).alias("_mc"),
        )
        .select(
            "cluster",
            "n_vecs",
            F.round(F.col("_mc"), 4).alias("mean_cos"),
        )
        .orderBy("cluster")
    )


@register(
    "q86_dup_components",
    oracle="""
        WITH RECURSIVE docs AS (
            SELECT * FROM documents WHERE doc_id < 200),
        tokens AS (
            SELECT DISTINCT doc_id, tok FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM docs) WHERE tok <> ''),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM tokens GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
            FROM tokens a JOIN tokens b
              ON a.tok = b.tok AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id),
        pairs AS (
            SELECT da, db FROM inter
            JOIN sizes sa ON sa.doc_id = da
            JOIN sizes sb ON sb.doc_id = db
            WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.6),
        edges AS (
            SELECT da AS a, db AS b FROM pairs
            UNION SELECT db, da FROM pairs),
        reach(a, b) AS (
            SELECT DISTINCT a, a FROM edges
            UNION
            SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
        SELECT a AS id, CAST(MIN(b) AS BIGINT) AS comp,
               a = MIN(b) AS is_canonical
        FROM reach GROUP BY a ORDER BY id
    """,
    doc="L1/L2 near-dup CLUSTERS: connected components over the exact "
    "Jaccard pairs (tau=0.6, q42's pair set), component = min doc_id, "
    "`is_canonical` marks the keep-one survivor — the step that turns "
    "pairwise near-dup output into a dedup decision. Iterative min-"
    "label propagation (operators/dedup.dup_components): groupBy-min "
    "+ equi-join per round, converges in graph-diameter rounds; only "
    "a changed-count scalar reaches the driver. Oracle: DuckDB "
    "recursive-CTE transitive closure over the same pairs.",
)
def q86(spark: SparkSession, sf: str) -> DataFrame:
    tok = dd.tokens(_docs_subset(spark, sf))
    pairs = dd.jaccard_pairs(tok, 0.6)
    comp = dd.dup_components(pairs)
    return comp.select(
        "id",
        F.col("comp").cast("bigint").alias("comp"),
        (F.col("id") == F.col("comp")).alias("is_canonical"),
    ).orderBy("id")


@register(
    "q87_contamination",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split(coalesce(text, ''), ' '),
                               x -> x <> '') AS toks
            FROM documents),
        g AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       generate_series(1, len(toks) - 7),
                       i -> array_to_string(toks[i:i+7], ' '))) AS gs
            FROM t),
        train AS (
            SELECT doc_id, unnest(gs) AS gram FROM g
            WHERE doc_id % 25 <> 0),
        ev AS (
            SELECT DISTINCT unnest(gs) AS gram FROM g
            WHERE doc_id % 25 = 0),
        total AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams
            FROM train GROUP BY doc_id),
        hit AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit
            FROM train JOIN ev USING (gram) GROUP BY doc_id)
        SELECT doc_id, n_grams,
               CAST(COALESCE(n_hit, 0) AS BIGINT) AS n_hit,
               COALESCE(n_hit, 0) * 20 > n_grams AS contaminated
        FROM total LEFT JOIN hit USING (doc_id)
        ORDER BY doc_id
    """,
    doc="Benchmark decontamination: per training doc (doc_id % 25 != "
    "0), how many of its distinct 8-gram windows appear in any eval-"
    "set doc (doc_id % 25 == 0), flagged at >5% overlap by integer "
    "cross-multiply. The eval gram set broadcasts (benchmarks are "
    "small); the corpus side is ONE gram construction + mark-join + "
    "hash agg whose map-side combine collapses the shuffle to doc "
    "grain. A semi-join gram prefilter was implemented and A/B'd in "
    "round 14 and REVERTED on measurement — 2.8x slower, because "
    "gram construction (re-inlined by the filter/second branch) "
    "dominates, not the shuffle (see "
    "operators/dedup.contaminated_docs's measurement note).",
)
def q87(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    train = docs.filter(F.col("doc_id") % 25 != 0)
    ev = docs.filter(F.col("doc_id") % 25 == 0)
    out = dd.contaminated_docs(train, ev, n=8)
    return out.select(
        "doc_id",
        "n_grams",
        "n_hit",
        (F.col("n_hit") * 20 > F.col("n_grams")).alias("contaminated"),
    ).orderBy("doc_id")


@register(
    "q88_chunking",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split(coalesce(text, ''), ' '),
                               x -> x <> '') AS toks
            FROM documents),
        c AS (
            SELECT doc_id, toks,
                   CASE WHEN len(toks) <= 0 THEN 0
                        WHEN len(toks) <= 50 THEN 1
                        ELSE 1 + CAST(FLOOR(
                            (len(toks) - 50 + 39) / 40.0) AS BIGINT)
                   END AS nch
            FROM t)
        SELECT doc_id, CAST(i - 1 AS INTEGER) AS chunk_idx,
               CAST(len(toks[(i-1)*40+1 : (i-1)*40+50]) AS BIGINT)
                   AS n_tok_chunk,
               substr(md5(lower(trim(array_to_string(
                   toks[(i-1)*40+1 : (i-1)*40+50], ' ')))), 1, 16) AS fp
        FROM (SELECT doc_id, toks, unnest(generate_series(1, nch)) AS i
              FROM c WHERE nch > 0)
        ORDER BY doc_id, chunk_idx
    """,
    doc="Context-window packing: overlapping 50-token chunks every 40 "
    "tokens per doc (final chunk may be short), each with its token "
    "count and md5-prefix fingerprint so chunk-level exact dedup can "
    "chain on. Pure array expressions + one posexplode — narrow 1:N "
    "map, no shuffle. operators/textstats.chunk_texts.",
)
def q88(spark: SparkSession, sf: str) -> DataFrame:
    return ts.chunk_texts(
        table(spark, sf, "documents"), chunk=50, stride=40
    ).orderBy("doc_id", "chunk_idx")


@register(
    "q89_source_mixing",
    oracle="""
        WITH r AS (
            SELECT doc_id, source,
                   CAST(CAST(concat('0x', substr(
                       md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER)
                       AS BIGINT) AS hv,
                   (CAST(regexp_extract(source, '([0-9]+)', 1) AS INT)
                       % 4 + 1) * 13107 AS thr
            FROM documents)
        SELECT doc_id, source, hv FROM r
        WHERE hv < thr ORDER BY doc_id
    """,
    doc="Data-mixing stage: per-source weighted sampling with a "
    "CONTENT-DETERMINISTIC keep rule — keep a doc iff the first 16 "
    "bits of md5(doc_id) fall under the source's rate threshold "
    "(source tier -> 20/40/60/80%). md5 is bit-identical in every "
    "engine, so the sample is exactly reproducible (and exactly "
    "auditable by the oracle) across engines, restarts, and "
    "speculative re-execution — unlike rand(seed), whose draw depends "
    "on partitioning. Narrow map, no shuffle.",
)
def q89(spark: SparkSession, sf: str) -> DataFrame:
    hv = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("bigint")
    tier = (
        F.regexp_extract(F.col("source"), "([0-9]+)", 1).cast("int") % 4
    )
    thr = (tier + 1) * 13107
    return (
        table(spark, sf, "documents")
        .select("doc_id", "source", hv.alias("hv"), thr.alias("_thr"))
        .filter(F.col("hv") < F.col("_thr"))
        .drop("_thr")
        .orderBy("doc_id")
    )


@register(
    "q90_token_budget",
    oracle="""
        WITH scored AS (
            SELECT doc_id, source,
                   CAST(len(list_filter(string_split(text, ' '),
                       t -> t <> '')) AS BIGINT) AS n_tok,
                   ROUND((least(len(list_filter(string_split(text, ' '),
                           t -> t <> '')) / 20.0, 1.0)
                      + (1.0 - len(list_filter(string_split(text, ' '),
                           t -> list_contains(
                               ['the','a','of','and','to','in'], t)))
                          * 1.0 / greatest(len(list_filter(
                               string_split(text, ' '), t -> t <> '')),
                               1))) / 2.0, 4) AS quality
            FROM documents),
        ranked AS (
            SELECT doc_id, source, n_tok, quality,
                   CAST(SUM(n_tok) OVER (
                       PARTITION BY source
                       ORDER BY quality DESC, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS cum_tok
            FROM scored)
        SELECT doc_id, source, n_tok, quality, cum_tok
        FROM ranked WHERE cum_tok <= 800
        ORDER BY doc_id
    """,
    doc="Curation under a token budget: per source, keep the highest-"
    "quality docs until an 800-token budget fills (quality desc, "
    "doc_id tiebreak -> total order, so the cumulative window is "
    "deterministic; token counts are INTEGER so the running sum has "
    "no float drift). One window shuffle on source — the standard "
    "per-domain curation pass of a pretraining mix.",
)
def q90(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        ts.token_count_ws(F.col("text")).alias("n_tok"),
        ts.quality_score(F.col("text")).alias("quality"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("quality").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        scored.withColumn(
            "cum_tok", F.sum("n_tok").over(w).cast("bigint")
        )
        .filter(F.col("cum_tok") <= 800)
        .orderBy("doc_id")
    )


@register(
    "q91_cluster_neardup",
    oracle=_kmeans_sql.cluster_neardup_sql(
        "SELECT vec_id AS vid, embedding AS e FROM embeddings"
        " WHERE vec_id < 300",
        k=10,
        iters=4,
        probes=3,
        threshold=0.3,
    ),
    doc="L2/L3 LOW-threshold embedding near-dup scale path: deterministic "
    "k-means coarse quantizer -> multi-probe (3) cell bucketing -> "
    "same-cell candidate pairs -> exact cosine verify (tau=0.3). The "
    "structure-aware complement to q71's SRP-LSH, which is provably "
    "unselective below ~0.7 cosine (operators/similarity."
    "cluster_neardup_pairs regime note). Candidates are bounded by cell "
    "occupancy, not corpus²; at ingest the cell id becomes a partition "
    "column and the candidate join is partition-local. Oracle: the "
    "deterministic quantizer unrolls as staged CTEs "
    "(queries/_kmeans_sql.py); recall/selectivity additionally "
    "property-tested in tests/test_llm.py.",
)
def q91(spark: SparkSession, sf: str) -> DataFrame:
    emb = (
        table(spark, sf, "embeddings")
        .filter(F.col("vec_id") < 300)
        .select("vec_id", "embedding")
    )
    return sim.cluster_neardup_pairs(
        emb, threshold=0.3, k=10, iters=4, probes=3
    ).orderBy("da", "db")


@register(
    "q92_window_dup_signal",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS ts
            FROM documents),
        grams AS (
            SELECT DISTINCT doc_id, array_to_string(ts[i:i+4], ' ') AS g
            FROM toks, UNNEST(generate_series(1, len(ts) - 4)) AS u(i)),
        dfc AS (SELECT g, COUNT(*) AS df FROM grams GROUP BY g),
        per_doc AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_windows,
                   CAST(SUM(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_shared
            FROM grams JOIN dfc USING (g) GROUP BY doc_id)
        SELECT d.doc_id,
               COALESCE(p.n_windows, 0) AS n_windows,
               COALESCE(p.n_shared, 0) AS n_shared
        FROM documents d LEFT JOIN per_doc p USING (doc_id)
        ORDER BY d.doc_id
    """,
    doc="Cross-document repeated-window signal (the window-based form "
    "of exact-substring dedup, cf. Lee et al. 2022 'Deduplicating "
    "Training Data Makes Language Models Better'): for each doc, how "
    "many of its distinct 5-token windows also occur in ANOTHER doc. "
    "Docs with high n_shared/n_windows are template/boilerplate "
    "duplicates that survive doc-level near-dup checks. Plan: one "
    "explode -> gram-frequency hash agg -> one equi-join back -> "
    "per-doc agg: two shuffles total, no self-join, no broadcast "
    "needed (unlike q87 the 'needle' set is the corpus itself). At "
    "100 TB the gram key would be xxhash64-ed to a bigint to cut "
    "shuffle width (kept as strings here for oracle exactness); "
    "within-doc windows are already distinct so the frequency agg's "
    "COUNT equals distinct-doc frequency.",
)
def q92(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    t = F.coalesce(F.col("text"), F.lit(""))
    grams = docs.select(
        "doc_id",
        F.explode(F.array_distinct(ts.word_ngrams(t, 5))).alias("g"),
    )
    # grams feeds the frequency agg AND the join-back: materialize once
    # (same no-cross-DAG-CSE rule as the dedup pipelines)
    grams = grams.localCheckpoint(eager=True)
    dfc = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (
        grams.join(dfc, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_windows"),
            F.sum(F.when(F.col("df") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_shared"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_windows", F.lit(0)).cast("bigint").alias("n_windows"),
            F.coalesce("n_shared", F.lit(0)).cast("bigint").alias("n_shared"),
        )
        .orderBy("doc_id")
    )


@register(
    "q93_canonical_dedup",
    oracle="""
        WITH RECURSIVE docs AS (
            SELECT * FROM documents WHERE doc_id < 200),
        tokens AS (
            SELECT DISTINCT doc_id, tok FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM docs) WHERE tok <> ''),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM tokens GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
            FROM tokens a JOIN tokens b
              ON a.tok = b.tok AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id),
        pairs AS (
            SELECT da, db FROM inter
            JOIN sizes sa ON sa.doc_id = da
            JOIN sizes sb ON sb.doc_id = db
            WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.6),
        edges AS (
            SELECT da AS a, db AS b FROM pairs
            UNION SELECT db, da FROM pairs),
        reach(a, b) AS (
            SELECT DISTINCT a, a FROM edges
            UNION
            SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        comp AS (
            SELECT a AS id, CAST(MIN(b) AS BIGINT) AS comp
            FROM reach GROUP BY a),
        scored AS (
            SELECT doc_id,
                   ROUND((least(len(list_filter(string_split(text, ' '),
                           t -> t <> '')) / 20.0, 1.0)
                      + (1.0 - len(list_filter(string_split(text, ' '),
                           t -> list_contains(
                               ['the','a','of','and','to','in'], t)))
                          * 1.0 / greatest(len(list_filter(
                               string_split(text, ' '), t -> t <> '')),
                               1))) / 2.0, 4) AS quality
            FROM docs),
        merged AS (
            SELECT s.doc_id,
                   CAST(COALESCE(c.comp, s.doc_id) AS BIGINT) AS comp,
                   s.quality
            FROM scored s LEFT JOIN comp c ON c.id = s.doc_id),
        ranked AS (
            SELECT doc_id, comp, quality,
                   ROW_NUMBER() OVER (PARTITION BY comp
                       ORDER BY quality DESC, doc_id) AS rn
            FROM merged)
        SELECT doc_id, comp, quality, rn = 1 AS keep
        FROM ranked ORDER BY doc_id
    """,
    doc="Dedup RESOLUTION — the decision a real pipeline ships: group "
    "near-duplicates (q86's connected components over exact tau=0.6 "
    "Jaccard pairs), then per component KEEP the highest-quality doc "
    "(q90's deterministic quality signal; doc_id tiebreak), singletons "
    "keep themselves. Unlike keep-min-id (q45/q86), quality-argmax is "
    "what curation actually wants. Plan: pair+component machinery as "
    "q86 (bounded subset; LSH scale path per q46), plus one narrow "
    "quality map and one window over components — components are "
    "dup-cluster-sized, so the window shuffle is tiny at any scale.",
)
def q93(spark: SparkSession, sf: str) -> DataFrame:
    docs = _docs_subset(spark, sf)
    tok = dd.tokens(docs)
    pairs = dd.jaccard_pairs(tok, 0.6)
    comp = dd.dup_components(pairs)
    scored = docs.select(
        "doc_id", ts.quality_score(F.col("text")).alias("quality")
    )
    merged = (
        scored.join(
            comp.withColumnRenamed("id", "doc_id"), "doc_id", "left"
        )
        .withColumn(
            "comp", F.coalesce("comp", "doc_id").cast("bigint")
        )
    )
    w = Window.partitionBy("comp").orderBy(F.col("quality").desc(), "doc_id")
    return (
        merged.withColumn("rn", F.row_number().over(w))
        .select(
            "doc_id", "comp", "quality", (F.col("rn") == 1).alias("keep")
        )
        .orderBy("doc_id")
    )


@register(
    "q95_weighted_sampling",
    oracle="""
        WITH s AS (
            SELECT doc_id, source,
                   ROUND((least(len(list_filter(string_split(text, ' '),
                           t -> t <> '')) / 20.0, 1.0)
                      + (1.0 - len(list_filter(string_split(text, ' '),
                           t -> list_contains(
                               ['the','a','of','and','to','in'], t)))
                          * 1.0 / greatest(len(list_filter(
                               string_split(text, ' '), t -> t <> '')),
                               1))) / 2.0, 4) AS quality,
                   CAST(CAST(concat('0x', substr(
                       md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER)
                       AS BIGINT) AS hv
            FROM documents)
        SELECT doc_id, source, quality, hv FROM s
        WHERE hv < FLOOR(quality * 65536) ORDER BY doc_id
    """,
    doc="Importance sampling for curation: each doc's keep probability "
    "IS its quality score — keep iff the first 16 bits of md5(doc_id) "
    "fall under floor(quality * 65536). Upweights high-quality docs "
    "smoothly instead of a hard quality threshold (q90's budget cut), "
    "the standard quality-weighted resampling stage of a pretraining "
    "mix. Content-deterministic like q89: md5 and IEEE multiply are "
    "bit-identical across engines/restarts/speculation, so the sample "
    "is exactly reproducible and oracle-auditable; rand(seed) is "
    "neither (draw depends on partitioning). Narrow map, no shuffle.",
)
def q95(spark: SparkSession, sf: str) -> DataFrame:
    hv = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("bigint")
    return (
        table(spark, sf, "documents")
        .select(
            "doc_id",
            "source",
            ts.quality_score(F.col("text")).alias("quality"),
            hv.alias("hv"),
        )
        .filter(F.col("hv") < F.floor(F.col("quality") * 65536))
        .orderBy("doc_id")
    )


@register(
    "q100_heavy_hitters",
    # Exact oracle is sound here despite the sketch: MG guarantees any
    # token with global frequency > N/(summary_size+1) reaches the
    # candidate set, the recount is exact, and the fixtures' 20th token
    # clears that bar (pinned in tests/test_llm.py) — so the output
    # EQUALS the exact top-20 under the same (c DESC, tok) total order.
    oracle="""
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
        FROM (
            SELECT unnest(string_split(COALESCE(text, ''), ' ')) AS tok
            FROM documents
        )
        WHERE tok <> ''
        GROUP BY tok
        ORDER BY c DESC, tok
        LIMIT 20
    """,
    doc="Heavy hitters: top-20 corpus tokens via per-partition "
    "Misra-Gries summaries (bounded mapInPandas sketch — at most "
    "summary_size rows leave a partition), merged bounds -> candidate "
    "set -> EXACT recount of candidates only (broadcast semi-join; "
    "the corpus never shuffles on the token key). Any token with "
    "global frequency > N/(summary_size+1) is guaranteed into the "
    "candidate set, so on all fixtures the result EQUALS exact q44 "
    "(pinned). operators/heavyhitters.",
)
def q100(spark: SparkSession, sf: str) -> DataFrame:
    from speculare_pgcdc_spark.operators.heavyhitters import (
        misra_gries_topk,
    )

    docs = table(spark, sf, "documents")
    toks = docs.select(
        F.explode(
            F.split(F.coalesce(F.col("text"), F.lit("")), " ")
        ).alias("tok")
    ).filter(F.col("tok") != "")
    return misra_gries_topk(toks, "tok", k=20)


@register(
    "q122_tfidf",
    oracle="""
        WITH toks AS (
            SELECT doc_id, tok FROM (
                SELECT doc_id,
                       unnest(string_split(COALESCE(text, ''), ' ')) AS tok
                FROM documents
            ) WHERE tok <> ''
        ),
        tf AS (
            SELECT doc_id, tok, COUNT(*) AS tf
            FROM toks GROUP BY doc_id, tok
        ),
        df AS (
            SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok
        ),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.tok,
                   CAST(ROUND(
                       tf.tf * ln(((SELECT n_docs FROM n) + 1.0)
                                  / (df.df + 1.0)), 6) AS DOUBLE) AS tfidf
            FROM tf JOIN df ON tf.tok = df.tok
        )
        SELECT doc_id, tok, tfidf FROM (
            SELECT doc_id, tok, tfidf,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                       ORDER BY tfidf DESC, tok) AS rn
            FROM scored
        ) WHERE rn <= 3
        ORDER BY doc_id, tfidf DESC, tok
    """,
    doc="TF-IDF top-3 terms per document (retrieval / keyword-extract "
    "staple): term frequency as one (doc_id, tok) hash agg, document "
    "frequency as one tok agg, smoothed idf = ln((N+1)/(df+1)) "
    "attached by an equi-join on tok, per-doc top-3 via a rank window "
    "on the doc_id shuffle. Every stage is a bounded hash agg or "
    "equi-join — no all-pairs, no Python; the (tfidf DESC, tok) order "
    "key is total so the cut is deterministic cross-engine.",
)
def q122(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.split(F.coalesce(F.col("text"), F.lit("")), " ")
        ).alias("tok"),
    ).filter(F.col("tok") != "")
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_ = toks.groupBy("tok").agg(
        F.countDistinct("doc_id").alias("df")
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "tok")
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "tok",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)),
                6,
            ).cast("double").alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), "tok"
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "tok", "tfidf")
        .orderBy("doc_id", F.col("tfidf").desc(), "tok")
    )


@register(
    "q123_bigram_lm_score",
    oracle="""
        WITH toks AS (
            SELECT doc_id, tok, pos FROM (
                SELECT doc_id, t.tok, t.pos
                FROM documents,
                     LATERAL (
                        SELECT unnest(string_split(COALESCE(text,''), ' '))
                                   AS tok,
                               generate_subscripts(
                                   string_split(COALESCE(text,''), ' '), 1)
                                   AS pos
                     ) t
            ) WHERE tok <> ''
        ),
        bigrams AS (
            SELECT doc_id, tok AS w1,
                   lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
            FROM toks
        ),
        pairs AS (SELECT doc_id, w1, w2 FROM bigrams WHERE w2 IS NOT NULL),
        uni AS (SELECT w1, COUNT(*) AS c1 FROM pairs GROUP BY w1),
        bi AS (SELECT w1, w2, COUNT(*) AS c2 FROM pairs GROUP BY w1, w2)
        SELECT p.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(ROUND(
                   CAST(SUM(CAST(ln(bi.c2 / uni.c1) AS DECIMAL(28,12)))
                        AS DOUBLE) / COUNT(*), 6) AS DOUBLE) AS avg_logp
        FROM pairs p
        JOIN bi ON p.w1 = bi.w1 AND p.w2 = bi.w2
        JOIN uni ON p.w1 = uni.w1
        GROUP BY p.doc_id
        ORDER BY p.doc_id
    """,
    doc="Bigram language-model fluency score per document (the "
    "KenLM-style perplexity filter of training-data pipelines, with "
    "the corpus itself as the LM): token bigrams via one lead() "
    "window per doc, MLE probabilities c(w1 w2)/c(w1) from two hash "
    "aggs joined back, per-doc mean log-prob. The log-prob sum runs "
    "in DECIMAL(28,12) so shuffle order can't perturb the double "
    "accumulation — same determinism contract as the PageRank/k-means "
    "oracles. All equi-joins on token keys; no Python.",
)
def q123(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.split(F.coalesce(F.col("text"), F.lit("")), " ")
        ).alias("pos", "tok"),
    ).filter(F.col("tok") != "")
    w = Window.partitionBy("doc_id").orderBy("pos")
    pairs = (
        toks.select(
            "doc_id",
            F.col("tok").alias("w1"),
            F.lead("tok").over(w).alias("w2"),
        )
        .filter(F.col("w2").isNotNull())
        .localCheckpoint(eager=False)
    )
    uni = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    bi = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    logp = F.log(F.col("c2") / F.col("c1")).cast("decimal(28,12)")
    return (
        pairs.join(bi, ["w1", "w2"])
        .join(uni, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum(logp).cast("double") / F.count(F.lit(1)), 6
            ).cast("double").alias("avg_logp"),
        )
        .orderBy("doc_id")
    )


@register(
    "q126_pq_ann",
    # staged deterministic oracle (the q85/q91 _kmeans_sql precedent):
    # the full train -> encode -> ADC -> exact-rerank pipeline unrolled
    # as CTEs — every arithmetic step mirrors the Spark fold order, so
    # the trained codebooks (and hence the candidate pool and final
    # top-k) hash-match. Recall vs brute force + compression invariants
    # remain pinned in tests/test_llm.py.
    oracle=_pq_sql.pq_ann_sql(
        m=4, k=8, iters=1, topk=5, candidate_factor=8, dim=64
    ),
    doc="Product-quantization ANN (m=8 subspaces x 16 codewords over "
    "the 64-dim embeddings): per-subspace k-means codebooks "
    "(deterministic trainer), m-byte codes assigned by a narrow "
    "literal-model map, ADC scoring via an (m x k) driver-computed "
    "lookup table inlined as a literal (m array lookups + fold per "
    "row — no per-row vector math), exact cosine re-rank of the "
    "TakeOrdered candidate pool. The third ANN memory/compute "
    "trade-off next to IVF (q53, partition pruning) and SRP-LSH "
    "(q71, banded buckets): PQ trades a little recall for an index "
    "of m small codes per vector. The registered demo (and its "
    "hash-checked staged oracle) uses m=4 subspaces x 8 codewords, "
    "candidate pool 8*k — fixture-sized knobs; production defaults "
    "like m=8 x 256 give ~32x compression with the identical plan. "
    "operators/similarity.pq_*.",
)
def q126(spark: SparkSession, sf: str) -> DataFrame:
    emb = table(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q")
    )
    data = emb.filter(F.col("vec_id") != 0)
    # small training knobs for the registered demo (each subspace's
    # Lloyd loop is driver-round-trip bound on tiny fixtures); the
    # operator's full knobs are exercised in tests/test_llm.py
    books = sim.pq_train(data, m=4, k=8, iters=1)
    return sim.pq_topk(data, q, books, k=5)


@register(
    "q138_containment",
    oracle="""
        WITH docs AS (SELECT * FROM documents WHERE doc_id < 200),
        tokens AS (
            SELECT DISTINCT doc_id, tok FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM docs) WHERE tok <> ''),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM tokens GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
            FROM tokens a JOIN tokens b
              ON a.tok = b.tok AND a.doc_id <> b.doc_id
            GROUP BY a.doc_id, b.doc_id)
        SELECT da, db,
               CAST(ROUND(i * 1.0 / sa.n, 4) AS DOUBLE) AS containment
        FROM inter
        JOIN sizes sa ON sa.doc_id = da
        WHERE i * 1.0 / sa.n >= 0.8
        ORDER BY da, db
    """,
    doc="Asymmetric token containment C(A,B) = |A∩B| / |A| (the "
    "quote/subset detector Jaccard misses: a tweet fully contained in "
    "an article scores ~1.0 containment but low Jaccard because the "
    "union is article-sized). Same bucketed token equi-join shape as "
    "q42 — ORDERED pairs, both directions — with the da-side size as "
    "the denominator. Bounded oracle-twin subset; the LSH banding in "
    "operators/dedup.py is the scale path for candidate generation.",
)
def q138(spark: SparkSession, sf: str) -> DataFrame:
    tok = dd.tokens(_docs_subset(spark, sf))
    a = tok.select(F.col("doc_id").alias("da"), "tok")
    b = tok.select(F.col("doc_id").alias("db"), F.col("tok").alias("tok_b"))
    inter = (
        a.join(
            b,
            (F.col("tok") == F.col("tok_b"))
            & (F.col("da") != F.col("db")),
        )
        .groupBy("da", "db")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sizes = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    cont = F.col("i") * 1.0 / F.col("n")
    return (
        inter.join(sizes, F.col("da") == F.col("doc_id"))
        .filter(cont >= 0.8)
        .select(
            "da", "db", F.round(cont, 4).cast("double").alias("containment")
        )
        .orderBy("da", "db")
    )


@register(
    "q139_charset_stats",
    oracle="""
        SELECT doc_id,
               CAST(ROUND(
                   len(regexp_replace(text, '[^0-9]', '', 'g'))
                   * 1.0 / len(text), 4) AS DOUBLE) AS digit_ratio,
               CAST(ROUND(
                   len(regexp_replace(text, '[^A-Z]', '', 'g'))
                   * 1.0 / len(text), 4) AS DOUBLE) AS upper_ratio,
               CAST(ROUND(
                   len(regexp_replace(text, '[^ ]', '', 'g'))
                   * 1.0 / len(text), 4) AS DOUBLE) AS space_ratio
        FROM documents
        WHERE len(text) > 0
        ORDER BY doc_id
    """,
    doc="Character-class composition per document (L4 companion to "
    "q50's quality score — digit/upper/space ratios are the cheapest "
    "boilerplate, table-dump, and SHOUTING detectors in corpus "
    "filters): three regexp strips + length arithmetic, pure map-side "
    "codegen, no shuffle at all before the presentation sort. "
    "Integer-length ratios, so both engines compute identical "
    "doubles.",
)
def q139(spark: SparkSession, sf: str) -> DataFrame:
    ln = F.length("text")

    def ratio(pattern, alias):
        kept = F.length(F.regexp_replace(F.col("text"), pattern, ""))
        return F.round(kept * 1.0 / ln, 4).cast("double").alias(alias)

    return (
        table(spark, sf, "documents")
        .filter(ln > 0)
        .select(
            "doc_id",
            ratio("[^0-9]", "digit_ratio"),
            ratio("[^A-Z]", "upper_ratio"),
            ratio("[^ ]", "space_ratio"),
        )
        .orderBy("doc_id")
    )


@register(
    "q141_ngram_novelty",
    oracle="""
        WITH toks AS (
            SELECT doc_id, tok, pos FROM (
                SELECT doc_id, t.tok, t.pos
                FROM documents,
                     LATERAL (
                        SELECT unnest(string_split(COALESCE(text,''), ' '))
                                   AS tok,
                               generate_subscripts(
                                   string_split(COALESCE(text,''), ' '), 1)
                                   AS pos
                     ) t
            ) WHERE tok <> ''
        ),
        grams AS (
            SELECT doc_id,
                   tok || ' ' || lead(tok, 1) OVER w || ' '
                       || lead(tok, 2) OVER w AS g
            FROM toks
            WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        ),
        doc_grams AS (
            SELECT DISTINCT doc_id, g FROM grams WHERE g IS NOT NULL
        ),
        df AS (
            SELECT g, COUNT(*) AS df FROM doc_grams GROUP BY g
        )
        SELECT d.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(ROUND(
                   SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) * 1.0
                   / COUNT(*), 4) AS DOUBLE) AS novelty
        FROM doc_grams d JOIN df ON d.g = df.g
        GROUP BY d.doc_id
        ORDER BY d.doc_id
    """,
    doc="N-gram novelty per document: the fraction of a doc's distinct "
    "3-grams that appear in NO other document — the inverse of the "
    "boilerplate signal (q92 flags shared windows; this scores what "
    "is unique), a direct diversity-selection knob for corpus "
    "curation. Gram construction via two lead() calls on the per-doc "
    "shuffle, corpus df as one gram-keyed agg joined back; integer "
    "ratio so no rounding contract needed beyond display.",
)
def q141(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.split(F.coalesce(F.col("text"), F.lit("")), " ")
        ).alias("pos", "tok"),
    ).filter(F.col("tok") != "")
    w = Window.partitionBy("doc_id").orderBy("pos")
    grams = (
        toks.select(
            "doc_id",
            F.concat_ws(
                " ",
                F.col("tok"),
                F.lead("tok", 1).over(w),
                F.lead("tok", 2).over(w),
            ).alias("g"),
            F.lead("tok", 2).over(w).alias("_t2"),
        )
        .filter(F.col("_t2").isNotNull())
        .select("doc_id", "g")
        .distinct()
        .localCheckpoint(eager=False)
    )
    df_ = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    return (
        grams.join(df_, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.round(
                F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
                * 1.0
                / F.count(F.lit(1)),
                4,
            ).cast("double").alias("novelty"),
        )
        .orderBy("doc_id")
    )


@register(
    "q142_effective_sources",
    oracle="""
        WITH c AS (
            SELECT source, COUNT(*) AS n FROM documents GROUP BY source
        ),
        tot AS (SELECT SUM(n) AS tot FROM c)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
               CAST(ROUND(
                   1.0 / SUM(CAST(pow(n * 1.0 / (SELECT tot FROM tot), 2)
                                  AS DECIMAL(28,12))), 4)
               AS DOUBLE) AS effective_sources
        FROM c
    """,
    doc="Effective source count (inverse Simpson index, 1/sum(p^2)): "
    "the single number a mixture designer checks — 100 sources where "
    "one holds 90% of documents is ~1.2 effective sources, not 100. "
    "Per-source counts from one agg; the squared-share terms sum in "
    "DECIMAL (exact integer-ratio inputs, so both engines square "
    "identical doubles). Companion to the q89 source-mixing operator.",
)
def q142(spark: SparkSession, sf: str) -> DataFrame:
    c = (
        table(spark, sf, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = c.agg(F.sum("n").alias("tot"))
    share2 = F.pow(F.col("n") * 1.0 / F.col("tot"), 2).cast(
        "decimal(28,12)"
    )
    return (
        c.join(F.broadcast(tot))
        .agg(
            F.count(F.lit(1)).alias("n_sources"),
            F.round(F.lit(1.0) / F.sum(share2), 4)
            .cast("double")
            .alias("effective_sources"),
        )
    )
