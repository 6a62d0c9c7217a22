"""Corpus-operations queries (round 6): split management, skew
diagnostics, embedding-space profiling, and lake maintenance — the
operational layer AROUND the curation pipeline (dedup/sampling/quality
live in llm.py and curation.py; these are the ops a team runs to keep
a 100 TB corpus trainable and a cluster healthy).

Reference scope note: the reference engine (src/) is a CDC forwarder
with no analytics; these rows extend SURVEY.md §2D with the
training-data-pipeline surface the build brief names as first-class.

- q188: deterministic stratified train/val/test split (md5-threshold,
  the q89 reproducibility contract applied to split assignment);
- q189: join-key skew profile — the diagnostic that DECIDES when
  q173's salted join or AQE skew handling is needed;
- q190: per-dimension embedding statistics (the q154 quantizer's and
  q53/q126 ANN trainers' health check);
- q191: cross-split exact-content leakage audit (the q87
  contamination check applied to the q188 split);
- q192: small-file compaction planner over a partitioned lake dir
  (rows-only: file bytes are compression-dependent by contract);
- q193: exact join-size prediction from per-key counts (the
  self-join cost model next to q189's skew profile);
- q194: exact global median via banded-rank order statistics;
- q195: fixed-K weighted sample (A-Res, md5-derived uniforms);
- q196: bucketed table checksum (CDC replica verification);
- q197: incremental ingest dedup — a new batch admitted against the
  historical fingerprint store (the daily-ingestion form of q45);
- q198: exact tie-corrected rank-sum AUC (Mann-Whitney U) of a score
  column against a binary label, via the banded rank — the metric
  that gates a quality-classifier filter before it touches a corpus;
- q199: calibration (reliability) bins for the same score/label pair;
- q200: mergeable per-group HLL sketches + their union (the
  sketch-per-partition / merge-centrally distinct-count architecture);
- q201: BM25 top-k retrieval (term-filtered tf shuffle, broadcast
  df/N/avgdl, DECIMAL-summed scores, integer-ranked TakeOrdered);
- q202: hard-negative / far-positive mining over a bounded anchor set
  (contrastive-training data prep; ANN is the corpus-scale tier);
- q271: q202's mining through the trained-IVF candidate tier.

q203-q213 (eval metrics + distribution tests) live in corpus_eval.py
(split in round 9); q214-q236 (training-prep builders, lifecycle/
experiment analytics, replica + sampling design, SQL-surface edges,
sequence analytics, forecasting) live in corpus_analytics.py;
q237-q252 (the hygiene + audit families) live in corpus_audit.py —
all split to keep every query module under ~2.5k lines (r7 verdict
item 7, r8 item 8).
"""

from __future__ import annotations

import math
import os
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from speculare_pgcdc_spark.catalog import table
from speculare_pgcdc_spark.operators import dedup as dd
from speculare_pgcdc_spark.queries import register
from speculare_pgcdc_spark.queries.history import _scratch

#: 16-bit md5-prefix thresholds for the 80/10/10 split (65536 * 0.8,
#: * 0.9 — the q89 convention: content-deterministic, engine-exact,
#: restart/replay stable; rand(seed) depends on partitioning)
SPLIT_TRAIN_MAX = 52429
SPLIT_VAL_MAX = 58982


def _hv16(col):
    """First 16 bits of md5(col as string) as BIGINT 0..65535 —
    bit-identical across engines (q89's sampling hash)."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 4), 16, 10
    ).cast("bigint")


def _split_col(hv):
    return (
        F.when(hv < SPLIT_TRAIN_MAX, "train")
        .when(hv < SPLIT_VAL_MAX, "val")
        .otherwise("test")
    )


_ORACLE_SPLIT = f"""
            CASE WHEN CAST(CAST(concat('0x', substr(
                       md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER)
                       AS BIGINT) < {SPLIT_TRAIN_MAX} THEN 'train'
                 WHEN CAST(CAST(concat('0x', substr(
                       md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER)
                       AS BIGINT) < {SPLIT_VAL_MAX} THEN 'val'
                 ELSE 'test' END
"""


@register(
    "q188_train_split",
    oracle=f"""
        WITH assigned AS (
            SELECT source, {_ORACLE_SPLIT} AS split, n_chars
            FROM documents
        ),
        agg AS (
            SELECT source, split,
                   COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS chars
            FROM assigned GROUP BY source, split
        ),
        tot AS (
            SELECT source, SUM(n_docs) AS src_docs FROM agg
            GROUP BY source
        )
        SELECT a.source, a.split,
               CAST(a.n_docs AS BIGINT) AS n_docs, a.chars,
               CAST(a.n_docs * 1000000 // t.src_docs AS BIGINT)
                   AS doc_share_ppm
        FROM agg a JOIN tot t ON a.source = t.source
        ORDER BY a.source, a.split
    """,
    doc="Deterministic stratified train/val/test split (80/10/10): "
    "assignment is a pure column expression on the first 16 bits of "
    "md5(doc_id) — content-deterministic (the q89 contract), so the "
    "split is identical across engines, restarts, partitionings, and "
    "speculative re-execution, and any doc's split is answerable "
    "without a lookup table. Per-(source, split) doc/char counts with "
    "integer-ppm within-source shares: one narrow map + one hash agg "
    "+ a tiny per-source rollup joined back broadcast. At 100 TB the "
    "assignment column is free at scan time; no shuffle is keyed on "
    "anything skewed.",
)
def q188(spark: SparkSession, sf: str) -> DataFrame:
    hv = _hv16(F.col("doc_id"))
    agg = (
        table(spark, sf, "documents")
        .select("source", _split_col(hv).alias("split"), "n_chars")
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("chars"),
        )
    )
    agg = agg.localCheckpoint(eager=True)
    tot = agg.groupBy("source").agg(F.sum("n_docs").alias("src_docs"))
    return (
        agg.join(F.broadcast(tot), "source")
        .select(
            "source",
            "split",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            "chars",
            F.expr("n_docs * 1000000 DIV src_docs").cast("bigint")
            .alias("doc_share_ppm"),
        )
        .orderBy("source", "split")
    )


@register(
    "q189_skew_profile",
    oracle="""
        WITH per_key AS (
            SELECT o_custkey, COUNT(*) AS cnt
            FROM orders GROUP BY o_custkey
        ),
        tot AS (
            SELECT COUNT(*) AS n_keys, SUM(cnt) AS n_rows,
                   MAX(cnt) AS max_cnt
            FROM per_key
        ),
        tiers AS (
            -- warm/hot = frequency above 1.5x / 2x the mean rows per
            -- key; compares are integer cross-multiplied
            -- (cnt/mean > 2 <=> cnt * n_keys > 2 * n_rows), no float
            -- ratio in a predicate. Two tiers so the profile
            -- discriminates at every fixture scale (the 2x tier is
            -- legitimately empty on the smallest, near-uniform one).
            SELECT SUM(CASE WHEN cnt * n_keys * 2 > 3 * n_rows
                       THEN 1 ELSE 0 END) AS n_warm,
                   SUM(CASE WHEN cnt * n_keys > 2 * n_rows
                       THEN 1 ELSE 0 END) AS n_hot,
                   COALESCE(SUM(CASE WHEN cnt * n_keys > 2 * n_rows
                       THEN cnt ELSE 0 END), 0) AS hot_rows
            FROM per_key CROSS JOIN tot
        )
        SELECT CAST(n_keys AS BIGINT) AS n_keys,
               CAST(n_rows AS BIGINT) AS n_rows,
               CAST(max_cnt AS BIGINT) AS max_cnt,
               CAST(max_cnt * 1000000 // n_rows AS BIGINT)
                   AS max_share_ppm,
               CAST(n_warm AS BIGINT) AS n_warm,
               CAST(n_hot AS BIGINT) AS n_hot,
               CAST(hot_rows * 1000000 // n_rows AS BIGINT)
                   AS hot_rows_ppm
        FROM tot CROSS JOIN tiers
    """,
    doc="Join-key skew profile — the measurement that DECIDES the "
    "strategy question every big join at 100 TB poses (plain shuffle "
    "vs q173 salting vs AQE skew split): per-key counts in one hash "
    "agg, then a constant-size profile — key count, max key's rows "
    "and ppm share, and warm/hot tiers (keys above 1.5x / 2x the "
    "mean, integer cross-multiplied; no float ratio in a predicate). "
    "Profiled over orders.o_custkey, the fixture's skewest real join "
    "key. The per-key aggregate is the only corpus-sized shuffle; "
    "everything downstream is broadcast-sized. Run it per join key "
    "at ingest and the salting decision becomes data, not folklore.",
)
def q189(spark: SparkSession, sf: str) -> DataFrame:
    per_key = (
        table(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    tot = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
    )
    warm = F.col("cnt") * F.col("n_keys") * 2 > 3 * F.col("n_rows")
    hot = F.col("cnt") * F.col("n_keys") > 2 * F.col("n_rows")
    tiers = per_key.crossJoin(F.broadcast(tot)).agg(
        F.sum(F.when(warm, 1).otherwise(0)).alias("n_warm"),
        F.sum(F.when(hot, 1).otherwise(0)).alias("n_hot"),
        F.coalesce(
            F.sum(F.when(hot, F.col("cnt")).otherwise(0)), F.lit(0)
        ).alias("hot_rows"),
    )
    return tot.crossJoin(F.broadcast(tiers)).select(
        F.col("n_keys").cast("bigint").alias("n_keys"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("max_cnt").cast("bigint").alias("max_cnt"),
        F.expr("max_cnt * 1000000 DIV n_rows").cast("bigint")
        .alias("max_share_ppm"),
        F.col("n_warm").cast("bigint").alias("n_warm"),
        F.col("n_hot").cast("bigint").alias("n_hot"),
        F.expr("hot_rows * 1000000 DIV n_rows").cast("bigint")
        .alias("hot_rows_ppm"),
    )


@register(
    "q190_embedding_dim_profile",
    oracle="""
        WITH vals AS (
            SELECT g.idx AS dim, CAST(g.v AS DOUBLE) AS v
            FROM embeddings,
                 LATERAL (
                    SELECT unnest(embedding) AS v,
                           generate_subscripts(embedding, 1) AS idx
                 ) g
        ),
        sums AS (
            SELECT dim, COUNT(*) AS n,
                   CAST(SUM(CAST(v AS DECIMAL(38,12))) AS DOUBLE)
                       AS sx,
                   CAST(SUM(CAST(v * v AS DECIMAL(38,12))) AS DOUBLE)
                       AS sxx,
                   MIN(v) AS lo, MAX(v) AS hi
            FROM vals GROUP BY dim
        )
        SELECT CAST(dim AS INTEGER) AS dim, CAST(n AS BIGINT) AS n,
               CAST(ROUND(sx / n, 6) AS DOUBLE) AS mean,
               CAST(ROUND(sqrt((sxx - sx * sx / n) / n), 6) AS DOUBLE)
                   AS std,
               CAST(ROUND(lo, 6) AS DOUBLE) AS lo,
               CAST(ROUND(hi, 6) AS DOUBLE) AS hi
        FROM sums ORDER BY dim
    """,
    doc="Per-dimension embedding statistics (mean/std/min/max over "
    "every vector): the health check in FRONT of the vector stack — "
    "q154's scalar quantizer assumes finite per-dim ranges, q53/q126 "
    "k-means assumes no dead or runaway dimension, and drift here is "
    "the earliest signal an embedding model changed under the corpus. "
    "One posexplode + one 64-group agg — constant output regardless "
    "of corpus size, fully partial-aggregatable map-side. Float32 "
    "values widen to identical IEEE doubles in both engines; the "
    "moment sums ride DECIMAL(38,12) (the q187 contract) so shuffle "
    "order can't wiggle the doubles; population std from the moments.",
)
def q190(spark: SparkSession, sf: str) -> DataFrame:
    vals = (
        table(spark, sf, "embeddings")
        .select(F.posexplode("embedding").alias("pos", "v0"))
        .select(
            (F.col("pos") + 1).alias("dim"),
            F.col("v0").cast("double").alias("v"),
        )
    )
    dec = lambda c: F.sum(c.cast("decimal(38,12)")).cast(  # noqa: E731
        "double"
    )
    sums = vals.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        dec(F.col("v")).alias("sx"),
        dec(F.col("v") * F.col("v")).alias("sxx"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )
    return sums.select(
        F.col("dim").cast("int").alias("dim"),
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("sx") / F.col("n"), 6).cast("double")
        .alias("mean"),
        F.round(
            F.sqrt(
                (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
                / F.col("n")
            ),
            6,
        ).cast("double").alias("std"),
        F.round("lo", 6).cast("double").alias("lo"),
        F.round("hi", 6).cast("double").alias("hi"),
    ).orderBy("dim")


#: tokens per leakage segment — q143's SEG grain (the "line"
#: granularity of RefinedWeb-style corpus dedup)
LEAK_SEG = 16


@register(
    "q191_split_leakage",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split(coalesce(text, ''), ' '),
                               x -> x <> '') AS arr
            FROM documents
        ),
        segs AS (
            SELECT doc_id,
                   md5(array_to_string(
                       arr[g * {LEAK_SEG} + 1 :
                           g * {LEAK_SEG} + {LEAK_SEG}], ' ')) AS fp
            FROM t,
                 LATERAL (
                    SELECT unnest(generate_series(0,
                        CAST(ceil(len(arr) / {LEAK_SEG}.0) AS BIGINT)
                        - 1)) AS g
                 ) u
            WHERE len(arr) > 0
        ),
        assigned AS (
            SELECT fp, {_ORACLE_SPLIT} AS split FROM segs
        ),
        per_fp AS (
            SELECT fp, COUNT(DISTINCT split) AS n_splits,
                   COUNT(*) AS n_occ
            FROM assigned GROUP BY fp
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_fps,
               CAST(SUM(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_leaked,
               -- greatest(,1): an empty corpus must yield ppm 0, not
               -- a DuckDB div-by-zero / Spark NULL split (q170 lesson)
               CAST(SUM(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END)
                    * 1000000 // greatest(COUNT(*), 1) AS BIGINT)
                   AS leaked_ppm,
               CAST(SUM(CASE WHEN n_splits > 1 THEN n_occ ELSE 0 END)
                    AS BIGINT) AS leaked_occurrences
        FROM per_fp
    """,
    doc="Cross-split leakage audit at the 16-token SEGMENT grain "
    "(q143's dedup granularity): segment fingerprints that occur in "
    "MORE than one q188 split — the eval-integrity failure a split "
    "on doc_id cannot see when near-duplicate content spans "
    "documents (split by doc id, leak by content; the fixture's "
    "repeated cross-doc segments make every count non-vacuous at "
    "every scale). Contract companion to q87's n-gram eval "
    "contamination: q87 guards the eval SET, this guards the split "
    "boundary itself. Segmentation is the q143 pipeline (filter-"
    "split + index slices); one fingerprint-grain agg whose keys are "
    "content hashes — uniform by construction — then a constant-size "
    "rollup. The standing fix is segment dedup (q143) BEFORE "
    "splitting, and this query is the audit that proves it happened.",
)
def q191(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    arr = F.filter(
        F.split(F.coalesce(F.col("text"), F.lit("")), " "),
        lambda x: x != "",
    )
    # r14: no non-empty filter on base (it re-ran the tokenize via
    # pushdown substitution, guide §4.4 — see q324); the seg-index
    # sequence short-circuits empty docs to NULL, which explode drops
    base = docs.select("doc_id", arr.alias("arr"))
    segs = base.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("arr") > 0,
                F.sequence(
                    F.lit(0),
                    F.ceil(F.size("arr") / float(LEAK_SEG))
                    .cast("bigint") - 1,
                ),
            )
        ).alias("g"),
        F.col("arr"),
    ).select(
        "doc_id",
        F.md5(
            F.array_join(
                F.slice(
                    F.col("arr"),
                    (F.col("g") * LEAK_SEG + 1).cast("int"),
                    LEAK_SEG,
                ),
                " ",
            )
        ).alias("fp"),
    )
    hv = _hv16(F.col("doc_id"))
    assigned = segs.select("fp", _split_col(hv).alias("split"))
    per_fp = assigned.groupBy("fp").agg(
        F.countDistinct("split").alias("n_splits"),
        F.count(F.lit(1)).alias("n_occ"),
    )
    leaked = F.when(F.col("n_splits") > 1, 1).otherwise(0)
    return per_fp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fps"),
        F.sum(leaked).cast("bigint").alias("n_leaked"),
        F.expr(
            "sum(case when n_splits > 1 then 1 else 0 end) "
            "* 1000000 DIV greatest(count(1), 1)"
        ).cast("bigint").alias("leaked_ppm"),
        F.sum(
            F.when(F.col("n_splits") > 1, F.col("n_occ")).otherwise(0)
        ).cast("bigint").alias("leaked_occurrences"),
    )


#: compaction target bytes per output file (the planner's knob; real
#: lakes use 128 MB-1 GB — the fixture files are tiny, so the demo
#: target is small enough that the plan is non-trivial)
COMPACTION_TARGET_BYTES = 64 * 1024


@register(
    "q192_compaction_plan",
    oracle=None,  # file sizes are compression/layout-dependent by
    # contract — rows-only; the plan invariants are pinned in
    # tests/test_operators_random.py
    doc="Small-file compaction planner — the lake-maintenance pass "
    "that keeps a partitioned table scannable (a 100 TB table that "
    "accretes one file per micro-batch per partition dies of file-"
    "listing and scheduler overhead long before it dies of bytes): "
    "write events partitioned by event_type, list the resulting "
    "layout, and emit per-partition (n_files, bytes, target_files, "
    "merge_needed) against a target file size. The listing is driver-"
    "side here (a local-FS stand-in for the catalog/manifest listing "
    "a lake format provides); the output is partition-grain — "
    "bounded by partition count, never by data. The REWRITE the plan "
    "prescribes is a per-partition repartition(target_files) write — "
    "exactly q166's layout machinery.",
)
def q192(spark: SparkSession, sf: str) -> DataFrame:
    out = _scratch("spark_compaction_plan", sf)
    (
        table(spark, sf, "events")
        .select("event_id", "event_type", "value")
        # many small files per partition: the pathological layout the
        # planner exists to detect (repartition before the write so
        # every partition dir gets multiple files)
        .repartition(8)
        .write.mode("overwrite")
        .partitionBy("event_type")
        .parquet(out)
    )
    rows = []
    for name in sorted(os.listdir(out)):
        pdir = os.path.join(out, name)
        if not (os.path.isdir(pdir) and name.startswith("event_type=")):
            continue
        files = [
            os.path.join(pdir, f)
            for f in os.listdir(pdir)
            if f.endswith(".parquet")
        ]
        nbytes = sum(os.path.getsize(f) for f in files)
        target = max(1, math.ceil(nbytes / COMPACTION_TARGET_BYTES))
        # dir tokens are Hive URI-escaped ('a b' -> 'a%20b'); unquote
        # so the plan's partition value matches the real column value
        # (NULL partitions keep Spark's __HIVE_DEFAULT_PARTITION__
        # sentinel — there is no in-band value to restore)
        token = unquote(name.split("=", 1)[1])
        rows.append(
            (
                token,
                len(files),
                nbytes,
                target,
                len(files) > target,
            )
        )
    return spark.createDataFrame(
        rows,
        "partition string, n_files int, bytes bigint, "
        "target_files int, merge_needed boolean",
    ).orderBy("partition")


@register(
    "q193_join_size_estimate",
    oracle="""
        WITH per_key AS (
            SELECT user_id, COUNT(*) AS c
            FROM events GROUP BY user_id
        ),
        est AS (
            SELECT COUNT(*) AS n_keys, SUM(c) AS n_rows,
                   SUM(c * c) AS join_rows, MAX(c * c) AS max_key_pairs
            FROM per_key
        )
        SELECT CAST(n_keys AS BIGINT) AS n_keys,
               CAST(n_rows AS BIGINT) AS n_rows,
               CAST(join_rows AS BIGINT) AS join_rows,
               CAST(join_rows // greatest(n_rows, 1) AS BIGINT)
                   AS amplification,
               CAST(max_key_pairs * 1000000 // greatest(join_rows, 1)
                    AS BIGINT) AS max_key_share_ppm
        FROM est
    """,
    doc="Exact join-size prediction WITHOUT executing the join: "
    "|A self-join on k| = sum over keys of c(k)^2, from the per-key "
    "counts alone — the cost model to consult BEFORE paying a "
    "self-join shuffle (near-dup candidate generation q42/q65, "
    "sessionization, graph edge building are all self-joins, and "
    "their blow-up is decided entirely by this sum). Companion to "
    "q189: that profiles shuffle skew, this predicts output "
    "cardinality — amplification (output rows per input row) and the "
    "worst key's share of all pairs, integer-division exact. One "
    "per-key agg + a constant-size rollup; generalizes to A JOIN B "
    "as sum(cA * cB) over the shared keys by the same shape.",
)
def q193(spark: SparkSession, sf: str) -> DataFrame:
    per_key = (
        table(spark, sf, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return per_key.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("c").cast("bigint").alias("n_rows"),
        F.sum(F.col("c") * F.col("c")).cast("bigint")
        .alias("join_rows"),
        F.expr(
            "sum(c * c) DIV greatest(sum(c), 1)"
        ).cast("bigint").alias("amplification"),
        F.expr(
            "max(c * c) * 1000000 DIV greatest(sum(c * c), 1)"
        ).cast("bigint").alias("max_key_share_ppm"),
    )


@register(
    "q194_exact_global_median",
    oracle="""
        WITH ranked AS (
            SELECT o_totalprice AS v,
                   ROW_NUMBER() OVER (ORDER BY o_totalprice) AS rn,
                   COUNT(*) OVER () AS n
            FROM orders
        )
        SELECT CAST(MAX(n) AS BIGINT) AS n,
               AVG(v) AS median
        FROM ranked
        WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
    """,
    doc="EXACT global median without any data-grain global sort: "
    "reduce to the distinct-value grain with counts (the q170 "
    "banding), cumsum over the tiny value-bin aggregate gives every "
    "value's global rank interval [below+1, below+cnt], and the "
    "median positions (n+1) DIV 2 and n DIV 2 + 1 select at most two "
    "values whose intervals cover them — averaged exactly as the "
    "oracle's AVG of the two middle rows (same IEEE (a+b)/2 in both "
    "engines; quantile_cont's lower+(upper-lower)*f phrasing is NOT "
    "bit-identical to it and is deliberately avoided). approx_"
    "percentile gives the fast sketch answer (q77); this is the "
    "exact one at unlimited scale — the oracle states the same spec "
    "with the single-partition window this plan exists to avoid.",
)
def q194(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    g = (
        table(spark, sf, "orders")
        .groupBy(F.col("o_totalprice").alias("v"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("b", F.floor(F.col("v") / 10_000).cast("bigint"))
        .localCheckpoint(eager=True)
    )
    bins = g.groupBy("b").agg(F.sum("cnt").alias("bcnt"))
    w_bins = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bins = bins.select(
        "b",
        F.coalesce(F.sum("bcnt").over(w_bins), F.lit(0))
        .alias("below_bins"),
    )
    w_in = (
        Window.partitionBy("b")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n = g.agg(F.sum("cnt").alias("n"))
    spans = (
        g.withColumn(
            "below_in", F.coalesce(F.sum("cnt").over(w_in), F.lit(0))
        )
        .join(F.broadcast(bins), "b")
        .crossJoin(F.broadcast(n))
        .withColumn("lo", F.col("below_bins") + F.col("below_in") + 1)
        .withColumn("hi", F.col("lo") + F.col("cnt") - 1)
    )
    p1 = F.expr("(n + 1) DIV 2")
    p2 = F.expr("n DIV 2 + 1")
    mids = spans.filter(
        ((F.col("lo") <= p1) & (p1 <= F.col("hi")))
        | ((F.col("lo") <= p2) & (p2 <= F.col("hi")))
    )
    # a value spanning BOTH positions contributes twice, exactly like
    # the oracle's two qualifying rows
    weight = (
        F.when((F.col("lo") <= p1) & (p1 <= F.col("hi")), 1)
        .otherwise(0)
        + F.when((F.col("lo") <= p2) & (p2 <= F.col("hi")), 1)
        .otherwise(0)
    )
    return mids.select(
        F.col("n"), (F.col("v") * weight).alias("vw"), weight.alias("w")
    ).agg(
        F.max("n").cast("bigint").alias("n"),
        (F.sum("vw") / F.sum("w")).alias("median"),
    )


#: fixed sample size for the weighted top-k sample (q195)
WSAMPLE_K = 50


@register(
    "q195_weighted_topk_sample",
    oracle=f"""
        WITH keyed AS (
            SELECT doc_id, n_chars,
                   -- A-Res order key ln(u)/w with u derived from md5
                   -- (content-deterministic; 48 bits -> exact double
                   -- in (0,1]); larger key = selected
                   ln((CAST(CAST(concat('0x', substr(
                           md5(CAST(doc_id AS VARCHAR)), 1, 12))
                           AS BIGINT) AS DOUBLE) + 1)
                      / 281474976710656.0)
                   / greatest(n_chars, 1) AS k
            FROM documents
        )
        SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars
        FROM keyed
        ORDER BY k DESC, doc_id
        LIMIT {WSAMPLE_K}
    """,
    doc="Fixed-size weighted sample without replacement (Efraimidis-"
    "Spirakis A-Res): order key ln(u)/w with u a content-"
    "deterministic md5-derived uniform — each doc's inclusion "
    "probability is proportional to its weight (chars here; tokens "
    "or quality scores in production), and the whole sample is "
    "reproducible across engines/restarts/partitionings like every "
    "sampling pass in this repo (q89/q95/q162 are Bernoulli/PPS-"
    "systematic; this is the fixed-K companion). ln of identical "
    "IEEE doubles is engine-stable (the q123/q136/q187 contract). "
    "Plan: narrow map + TakeOrdered top-K — no global sort, no "
    "shuffle beyond the K-row reduction; output is the selected ids "
    "(no float in the contract).",
)
def q195(spark: SparkSession, sf: str) -> DataFrame:
    u48 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12),
        16,
        10,
    ).cast("bigint")
    key = F.log(
        (u48.cast("double") + 1) / float(1 << 48)
    ) / F.greatest(F.col("n_chars"), F.lit(1))
    return (
        table(spark, sf, "documents")
        .select("doc_id", "n_chars", key.alias("k"))
        .orderBy(F.col("k").desc(), "doc_id")
        .limit(WSAMPLE_K)
        .select(
            "doc_id", F.col("n_chars").cast("bigint").alias("n_chars")
        )
    )


#: checksum buckets (q196) — compare per bucket to LOCALIZE divergence
CHECKSUM_BUCKETS = 64


@register(
    "q196_table_checksum",
    oracle=f"""
        WITH digests AS (
            SELECT event_id % {CHECKSUM_BUCKETS} AS bucket,
                   -- 48-bit md5 prefix of a float-free row rendering
                   -- (doubles are FLOOR-scaled to integer cents:
                   -- double->string formatting differs across
                   -- engines, integer rendering does not)
                   CAST(CAST(concat('0x', substr(md5(concat_ws('|',
                       CAST(event_id AS VARCHAR),
                       event_type,
                       CAST(user_id AS VARCHAR),
                       CAST(CAST(FLOOR(value * 100) AS BIGINT)
                            AS VARCHAR))), 1, 12)) AS BIGINT)
                       AS BIGINT) AS d
            FROM events
        )
        SELECT CAST(bucket AS INTEGER) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(d AS HUGEINT))
                    % 1000000000000000000 AS BIGINT) AS checksum
        FROM digests GROUP BY bucket ORDER BY bucket
    """,
    doc="Bucketed table checksum — the replication-verification "
    "primitive the CDC stack needs ABOVE the feed (the reference "
    "forwards changes, src/forwarder/mod.rs; proving the APPLIED "
    "replica equals the source is this): every row digests to a "
    "48-bit md5 prefix over a float-free rendering (doubles enter as "
    "FLOOR-scaled cents — double->string formatting is not engine-"
    "stable, integer rendering is), digests SUM per id-band bucket "
    "(order-independent, so shuffle order is irrelevant) modulo 1e18 "
    "in exact DECIMAL. Two replicas compare checksum-by-bucket and "
    "re-sync only divergent buckets — a 100 TB table verifies with "
    "{CHECKSUM_BUCKETS} numbers per side, and after q96 apply_changes "
    "only TOUCHED buckets need recomputation (bucket = key band).",
)
def q196(spark: SparkSession, sf: str) -> DataFrame:
    digest = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("event_id").cast("string"),
                    F.col("event_type"),
                    F.col("user_id").cast("string"),
                    F.floor(F.col("value") * 100).cast("bigint")
                    .cast("string"),
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("bigint")
    return (
        table(spark, sf, "events")
        .select(
            (F.col("event_id") % CHECKSUM_BUCKETS).cast("int")
            .alias("bucket"),
            digest.alias("d"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            (
                F.sum(F.col("d").cast("decimal(38,0)"))
                % F.lit(10 ** 18).cast("decimal(38,0)")
            ).cast("bigint").alias("checksum"),
        )
        .orderBy("bucket")
    )


#: leading tokens hashed into the ingest fingerprint (q197) — a prefix
#: sketch, not the full text: near-identical docs produced by suffix
#: edits (boilerplate appends, truncation) still collide, which is the
#: point of an INGEST gate; the full-content md5 form is q45
INGEST_FP_TOKENS = 8


@register(
    "q197_incremental_ingest",
    oracle=f"""
        WITH fp AS (
            SELECT doc_id, lang, source, n_chars,
                   md5(array_to_string(
                       list_filter(string_split(COALESCE(text, ''), ' '),
                                   x -> x <> '')[1:{INGEST_FP_TOKENS}],
                       ' ')) AS fp
            FROM documents
        ),
        store AS (
            SELECT DISTINCT fp FROM fp WHERE length(source) = 4
        ),
        inc AS (
            SELECT f.lang, f.n_chars,
                   ROW_NUMBER() OVER (PARTITION BY f.fp
                                      ORDER BY f.doc_id) AS rn,
                   CASE WHEN s.fp IS NOT NULL THEN 1 ELSE 0 END AS hit
            FROM fp f LEFT JOIN store s ON f.fp = s.fp
            WHERE length(f.source) = 5
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_incoming,
               CAST(SUM(CASE WHEN hit = 0 AND rn = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_admitted,
               CAST(SUM(hit) AS BIGINT) AS n_dup_store,
               CAST(SUM(CASE WHEN hit = 0 AND rn > 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dup_batch,
               CAST(SUM(CASE WHEN hit = 0 AND rn = 1 THEN n_chars
                        ELSE 0 END) AS BIGINT) AS admitted_chars
        FROM inc GROUP BY lang ORDER BY lang
    """,
    doc="Incremental corpus ingestion: admit an incoming batch (the "
    "len-5 sources, src10..src19) against the historical fingerprint "
    "store (the len-4 sources) — the DAILY form of dedup, where the "
    "corpus is append-only and re-deduping 100 TB per batch is not an "
    "option. Fingerprint = md5 of the first "
    f"{INGEST_FP_TOKENS} tokens (a prefix sketch: suffix edits still "
    "collide; q45 is the full-content form). A doc is admitted iff "
    "its fingerprint misses the store AND it is the first occurrence "
    "within its own batch (keep-lowest doc_id); store hits trump "
    "batch dups. Per-lang admission report. Scale: the store side is "
    "a DISTINCT fingerprint projection (in production: the persisted "
    "fingerprint table, bucketed by fp so this join is co-located and "
    "shuffle-free); both the left join and the first-occurrence "
    "window shuffle ONCE on the uniformly-distributed fp key — "
    "batch-sized, not corpus-sized, work per ingest.",
)
def q197(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    toks = F.filter(
        F.split(F.coalesce(F.col("text"), F.lit("")), " "),
        lambda x: x != "",
    )
    fp = F.md5(F.array_join(F.slice(toks, 1, INGEST_FP_TOKENS), " "))
    docs = table(spark, sf, "documents").select(
        "doc_id", "lang", "source", "n_chars", fp.alias("fp")
    )
    store = (
        docs.filter(F.length("source") == 4)
        .select("fp").distinct()
        .withColumn("hit", F.lit(1))
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    inc = (
        docs.filter(F.length("source") == 5)
        .withColumn("rn", F.row_number().over(w))
        .join(store, "fp", "left")
        .withColumn("hit", F.coalesce("hit", F.lit(0)))
    )
    admitted = (F.col("hit") == 0) & (F.col("rn") == 1)
    return (
        inc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_incoming"),
            F.sum(admitted.cast("int")).cast("bigint")
            .alias("n_admitted"),
            F.sum("hit").cast("bigint").alias("n_dup_store"),
            F.sum(((F.col("hit") == 0) & (F.col("rn") > 1)).cast("int"))
            .cast("bigint").alias("n_dup_batch"),
            F.sum(F.when(admitted, F.col("n_chars")).otherwise(0))
            .cast("bigint").alias("admitted_chars"),
        )
        .orderBy("lang")
    )


#: value-bin width for q198's banded cumulative counts (n_chars grain)
AUC_BIN = 64


@register(
    "q198_rank_auc",
    oracle="""
        WITH g AS (
            SELECT n_chars AS v,
                   SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                       AS pos_cnt,
                   COUNT(*) - SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0
                       END) AS neg_cnt
            FROM documents GROUP BY v
        ),
        c AS (
            SELECT pos_cnt, neg_cnt,
                   COALESCE(SUM(neg_cnt) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS neg_below
            FROM g
        ),
        t AS (
            SELECT CAST(SUM(pos_cnt) AS HUGEINT) AS n_pos,
                   CAST(SUM(neg_cnt) AS HUGEINT) AS n_neg,
                   CAST(SUM(2 * pos_cnt * neg_below
                            + pos_cnt * neg_cnt) AS HUGEINT) AS u2
            FROM c
        )
        SELECT CAST(n_pos AS BIGINT) AS n_pos,
               CAST(n_neg AS BIGINT) AS n_neg,
               CAST(u2 * 1000000 // greatest(2 * n_pos * n_neg, 1)
                    AS BIGINT) AS auc_ppm
        FROM t
    """,
    doc="Exact tie-corrected rank-sum AUC (Mann-Whitney U) of a score "
    "column (n_chars) against a binary label (lang = 'en') — the "
    "metric that decides whether a quality-classifier filter is good "
    "enough to gate a corpus, computed WITHOUT sklearn and WITHOUT a "
    "data-grain global window. Reduce to the distinct-score grain "
    "(pos/neg counts per value), assemble each value's "
    "strictly-below negative count from the q170 banding (cumsum "
    "over the one-row-per-bin aggregate + an in-bin prefix window), "
    "then 2U = sum(2*pos*neg_below + pos*neg) — the pos*neg term IS "
    "the half-credit tie correction, doubled so everything stays "
    "integer. AUC emitted as ppm by exact integer division: Spark "
    "accumulates in DECIMAL(38,0) and divides via the pmod identity "
    "((x - pmod(x, d)) / d, exact because the numerator is a "
    "multiple), the oracle in HUGEINT — BIGINT would overflow at "
    "~4e6 rows since U ~ n_pos * n_neg. Scale: the only corpus-sized "
    "shuffle is the distinct-value aggregate; every window runs at "
    "bin or in-bin grain.",
)
def q198(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    pos = F.when(F.col("lang") == "en", 1).otherwise(0)
    g = (
        table(spark, sf, "documents")
        .groupBy(F.col("n_chars").alias("v"))
        .agg(
            F.sum(pos).alias("pos_cnt"),
            (F.count(F.lit(1)) - F.sum(pos)).alias("neg_cnt"),
        )
        .withColumn("b", F.expr(f"v DIV {AUC_BIN}"))
    )
    g = g.localCheckpoint(eager=True)
    bins = g.groupBy("b").agg(F.sum("neg_cnt").alias("bcnt"))
    w_bins = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bins = bins.withColumn(
        "below_bins", F.coalesce(F.sum("bcnt").over(w_bins), F.lit(0))
    )
    w_in = (
        Window.partitionBy("b")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scored = (
        g.withColumn(
            "neg_in_bin",
            F.coalesce(F.sum("neg_cnt").over(w_in), F.lit(0)),
        )
        .join(F.broadcast(bins.select("b", "below_bins")), "b")
        .withColumn(
            "neg_below", F.col("below_bins") + F.col("neg_in_bin")
        )
    )
    dec = "decimal(38,0)"
    u2_term = (
        2 * F.col("pos_cnt") * F.col("neg_below")
        + F.col("pos_cnt") * F.col("neg_cnt")
    ).cast(dec)
    return (
        scored.agg(
            F.sum("pos_cnt").cast(dec).alias("n_pos"),
            F.sum("neg_cnt").cast(dec).alias("n_neg"),
            F.sum(u2_term).alias("u2"),
        )
        .select(
            F.col("n_pos").cast("bigint").alias("n_pos"),
            F.col("n_neg").cast("bigint").alias("n_neg"),
            F.expr(
                # exact integer quotient in DECIMAL: strip the
                # remainder first so the decimal division cannot round
                "CAST((u2 * 1000000 - pmod(u2 * 1000000, "
                "  greatest(2 * n_pos * n_neg, 1))) "
                " / greatest(2 * n_pos * n_neg, 1) AS BIGINT)"
            ).alias("auc_ppm"),
        )
    )


#: fixed reliability-diagram bins for q199 (deciles of score/max)
CAL_BINS = 10


@register(
    "q199_calibration_bins",
    oracle=f"""
        WITH m AS (SELECT MAX(n_chars) AS mx FROM documents),
        b AS (
            SELECT least(n_chars * {CAL_BINS} // mx,
                         {CAL_BINS - 1}) AS score_bin,
                   n_chars,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
            FROM documents CROSS JOIN m
        )
        SELECT CAST(score_bin AS BIGINT) AS score_bin,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) // COUNT(*) AS BIGINT) AS mean_chars,
               CAST(SUM(pos) * 1000000 // COUNT(*) AS BIGINT)
                   AS pos_rate_ppm
        FROM b GROUP BY score_bin ORDER BY score_bin
    """,
    doc="Calibration (reliability-diagram) bins for a score/label "
    "pair — q198's AUC says whether the score RANKS well; this says "
    "whether its magnitude can be thresholded: docs bucketed into "
    f"{CAL_BINS} fixed bins of score/max (integer cross-multiplied, "
    "no float ratio), per-bin count, mean score, and positive-rate "
    "ppm. The max is a broadcast scalar; binning is then a pure "
    "column expression at scan time and the per-bin rollup is one "
    f"hash agg onto {CAL_BINS} groups — no window, no data-grain "
    "anything, the cheapest possible second pass at 100 TB.",
)
def q199(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    m = docs.agg(F.max("n_chars").alias("mx"))
    pos = F.when(F.col("lang") == "en", 1).otherwise(0)
    return (
        docs.crossJoin(F.broadcast(m))
        .select(
            F.least(
                F.expr(f"n_chars * {CAL_BINS} DIV mx"),
                F.lit(CAL_BINS - 1),
            ).cast("bigint").alias("score_bin"),
            "n_chars",
            pos.alias("pos"),
        )
        .groupBy("score_bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.expr("SUM(n_chars) DIV COUNT(*)").cast("bigint")
            .alias("mean_chars"),
            F.expr("SUM(pos) * 1000000 DIV COUNT(*)").cast("bigint")
            .alias("pos_rate_ppm"),
        )
        .orderBy("score_bin")
    )


@register(
    "q200_hll_user_sketch",
    oracle=None,  # sketch estimates; accuracy pinned in test_oracle.py
    doc="Mergeable distinct-count sketches — the architecture that "
    "replaces COUNT(DISTINCT) at 100 TB: one Datasketches HLL per "
    "event_type (hll_sketch_agg, register-max semantics, so the "
    "result is order- and partitioning-insensitive => deterministic "
    "and restart-stable), estimates per group, plus the 'ALL' row "
    "from hll_union_agg over the PER-GROUP sketches — the point is "
    "that the union never rescans the data: sketch once per "
    "partition/day/shard, merge centrally forever after. Accuracy "
    "vs the exact counts is pinned at 5% in test_oracle.py "
    "(rows-only by the q46/q54 sketch-family contract: estimates "
    "have no cross-engine oracle).",
)
def q200(spark: SparkSession, sf: str) -> DataFrame:
    sk = (
        table(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        # pin: the per-type sketches feed BOTH outputs; without it the
        # union branch would re-aggregate the whole table
        .localCheckpoint(eager=True)
    )
    per = sk.select(
        "event_type",
        F.hll_sketch_estimate("sk").cast("bigint").alias("est_users"),
    )
    merged = (
        sk.agg(F.hll_union_agg("sk").alias("u"))
        .select(
            F.lit("ALL").alias("event_type"),
            F.hll_sketch_estimate("u").cast("bigint")
            .alias("est_users"),
        )
    )
    return per.unionAll(merged).orderBy("event_type")


#: q201 BM25 parameters (the standard Robertson defaults) and the
#: fixed query — one rare term ('dup' appears in ~5% of docs) plus two
#: near-stopwords, so idf separation is what the scores exercise
BM25_TERMS = ("dup", "spark", "vector")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10


@register(
    "q201_bm25_topk",
    oracle=f"""
        WITH base AS (
            SELECT doc_id,
                   list_filter(string_split(COALESCE(text, ''), ' '),
                               x -> x <> '') AS arr
            FROM documents
        ),
        stats AS (
            SELECT COUNT(*) AS n_docs,
                   CAST(SUM(len(arr)) AS DOUBLE) / COUNT(*) AS avgdl
            FROM base
        ),
        tf AS (
            SELECT doc_id, len(arr) AS dl, tok, COUNT(*) AS tf
            FROM (SELECT doc_id, arr, unnest(arr) AS tok FROM base)
            WHERE tok IN ('dup', 'spark', 'vector')
            GROUP BY doc_id, dl, tok
        ),
        dfs AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        scored AS (
            SELECT t.doc_id,
                   SUM(CAST(
                       ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
                       * t.tf * ({BM25_K1} + 1)
                       / (t.tf + {BM25_K1} * (1 - {BM25_B}
                          + {BM25_B} * t.dl / s.avgdl))
                       AS DECIMAL(38,18))) AS score,
                   COUNT(*) AS n_terms
            FROM tf t JOIN dfs d ON t.tok = d.tok
                 CROSS JOIN stats s
            GROUP BY t.doc_id
        )
        SELECT doc_id,
               CAST(FLOOR(score * 1000000) AS BIGINT) AS score_e6,
               CAST(n_terms AS BIGINT) AS n_terms
        FROM scored
        ORDER BY score_e6 DESC, doc_id
        LIMIT {BM25_TOPK}
    """,
    doc="BM25 top-k retrieval — the lexical ranking function behind "
    "corpus search and retrieval-based eval-set construction, scored "
    "for a fixed 3-term query with the Robertson k1/b defaults. "
    "Pipeline: token lengths from the split array at scan time (no "
    "explode for the length pass), the term filter applied BEFORE "
    "the only corpus-sized shuffle (the per-(doc, term) tf "
    "aggregate, which carries dl along so no doc-length join "
    "exists), df and the N/avgdl scalars broadcast back, per-term "
    "partial scores DECIMAL-summed (shuffle-order-independent, the "
    "q136 contract), floor-scaled to integer micro-units BEFORE the "
    "rank so the top-k cutoff never rides a raw double, TakeOrdered "
    "for the final k. At 100 TB the tf aggregate keys on (doc_id, "
    "term) post-filter — query-matched rows only, not the corpus; "
    "the batch-retrieval form (many queries) broadcasts a term list "
    "and adds query_id to the same shape. ln() on identical IEEE "
    "operands agrees across engines (the q136/q144 precedent).",
)
def q201(spark: SparkSession, sf: str) -> DataFrame:
    arr = F.filter(
        F.split(F.coalesce(F.col("text"), F.lit("")), " "),
        lambda x: x != "",
    )
    # r14: catalog.spread_scan was A/B'd here and REVERTED (+26%
    # per-round ratio median) — the term filter drops almost every
    # token before any shuffle, so the scan stage is too cheap for
    # the extra exchange to pay
    base = table(spark, sf, "documents").select(
        "doc_id", arr.alias("arr")
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.size("arr")).cast("double") / F.count(F.lit(1))
        ).alias("avgdl"),
    )
    matched = base.select(
        "doc_id",
        F.size("arr").alias("dl"),
        F.explode(
            F.filter(F.col("arr"), lambda x: x.isin(*BM25_TERMS))
        ).alias("tok"),
    )
    # r14 optimization (guide §1.2/§5): the (doc, term) tf frame is
    # bounded by docs x |BM25_TERMS| and feeds both the df agg and the
    # scoring join — unpinned, each consumer re-ran the tokenize +
    # explode corpus lineage (3 documents scans in the plan). Pin it
    # once; only the corpus-stats agg still reads the source.
    tf = matched.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl")
    ).localCheckpoint(eager=True)
    dfs = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        + 1.0
    )
    term_score = (
        idf
        * F.col("tf")
        * (BM25_K1 + 1)
        / (
            F.col("tf")
            + BM25_K1
            * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        )
    ).cast("decimal(38,18)")
    return (
        tf.join(F.broadcast(dfs), "tok")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.sum(term_score).alias("score"),
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        )
        .select(
            "doc_id",
            F.floor(F.col("score") * 1000000).cast("bigint")
            .alias("score_e6"),
            "n_terms",
        )
        .orderBy(F.col("score_e6").desc(), "doc_id")
        .limit(BM25_TOPK)
    )


#: q202 anchor set bound — the exact cross join is anchors x corpus,
#: verification-sized by the q183 convention (ANN is the scale path)
HARDNEG_ANCHORS = 32


@register(
    "q202_hard_negatives",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ),
        anchors AS (
            SELECT vec_id AS aid, label AS albl, v AS av
            FROM e WHERE vec_id < {HARDNEG_ANCHORS}
        ),
        pairs AS (
            SELECT a.aid, a.albl, c.vec_id AS cid, c.label AS clbl,
                   CAST(FLOOR(list_dot_product(a.av, c.v)
                       / (sqrt(list_dot_product(a.av, a.av))
                          * sqrt(list_dot_product(c.v, c.v)))
                       * 1000000) AS BIGINT) AS sim_ppm
            FROM anchors a CROSS JOIN e c
            WHERE c.vec_id <> a.aid
        ),
        neg AS (
            SELECT aid, cid, sim_ppm,
                   ROW_NUMBER() OVER (PARTITION BY aid
                       ORDER BY sim_ppm DESC, cid) AS rk
            FROM pairs WHERE clbl <> albl
        ),
        pos AS (
            SELECT aid, cid, sim_ppm,
                   ROW_NUMBER() OVER (PARTITION BY aid
                       ORDER BY sim_ppm ASC, cid) AS rk
            FROM pairs WHERE clbl = albl
        )
        SELECT a.aid AS vec_id, a.albl AS label,
               n.cid AS hard_neg_id, n.sim_ppm AS hard_neg_sim_ppm,
               p.cid AS far_pos_id, p.sim_ppm AS far_pos_sim_ppm
        FROM anchors a
        LEFT JOIN neg n ON n.aid = a.aid AND n.rk = 1
        LEFT JOIN pos p ON p.aid = a.aid AND p.rk = 1
        ORDER BY vec_id
    """,
    doc="Hard-negative / far-positive mining for contrastive training "
    "— per anchor, the most-similar OTHER-label vector (the hard "
    "negative that makes a triplet informative) and the least-similar "
    "SAME-label vector (the hardest positive): exact cosines over a "
    f"bounded {HARDNEG_ANCHORS}-anchor probe set, floor-scaled to "
    "integer ppm BEFORE ranking so the argmax/argmin never order on "
    "a raw double (ties then break on candidate id — fully "
    "engine-stable). LEFT joins keep anchors whose label class is a "
    "singleton. Scale: the cross join is the verification-sized "
    "exact twin (the q183 contract); at corpus scale the candidate "
    "set per anchor comes from the ANN tier (q53 IVF / q126 PQ) "
    "through similarity.mine_triplets(candidates=...) — one (aid, "
    "cid) frame swap, mining logic identical (hook parity pinned "
    "in tests/test_llm.py).",
)
def q202(spark: SparkSession, sf: str) -> DataFrame:
    from speculare_pgcdc_spark.operators import similarity as sim

    e = table(spark, sf, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").alias("v"),
        sim._norm(F.col("embedding")).alias("nrm"),
    )
    anchors = e.filter(F.col("vec_id") < HARDNEG_ANCHORS).select(
        F.col("vec_id").alias("aid"),
        F.col("label").alias("albl"),
        F.col("v").alias("av"),
        F.col("nrm").alias("an"),
    )
    cands = e.select(
        F.col("vec_id").alias("cid"),
        F.col("label").alias("clbl"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    # candidates=None = the exact cross-join twin (the registered,
    # oracle-checked form). At corpus scale callers pass the ANN
    # shortlist through mine_triplets(candidates=...) — parity with
    # this exact path under a lossless candidate set is pinned in
    # tests/test_llm.py::test_mine_triplets_candidates_hook_parity.
    return sim.mine_triplets(anchors, cands)


#: q271 IVF knobs — the q53 quantizer (k=8 trained cells), multi-probe
#: 2 so anchors near a cell boundary still meet their cross-boundary
#: neighbors
HARDNEG_IVF_K = 8
HARDNEG_IVF_ITERS = 2
HARDNEG_IVF_PROBES = 2
#: per-cell candidate cap (similarity.capped_cell_pairs): bounds the
#: candidate tier under Zipf cell occupancy — far above every fixture
#: cell (<= ~500 vectors at sf0.1), so it only engages on skewed data
#: (probed in SKEW_PROBE_r10_ann.json); per-anchor work is then
#: <= PROBES x CAP no matter how hot a cluster gets.
HARDNEG_CELL_CAP = 1024


@register(
    "q271_hard_negatives_ann",
    oracle=None,  # ANN-fed by contract (candidate subset is the point);
    # recall vs the exact q202 twin is pinned in tests/test_llm.py
    doc="q202's hard-negative mining THROUGH the ANN candidate tier, "
    "end to end: train the q53 IVF quantizer (DataFrame Lloyd's "
    f"k-means, k={HARDNEG_IVF_K}, deterministic md5 init — only the "
    "k x dim model crosses to the driver), assign anchors and corpus "
    f"to their {HARDNEG_IVF_PROBES} nearest cells (multi-probe "
    "literal-model narrow map, no join), candidates = same-cell "
    "(aid, cid) pairs under a per-cell candidate cap of "
    f"{HARDNEG_CELL_CAP} (similarity.capped_cell_pairs — md5-rank "
    "deterministic, WindowGroupLimit map-side, inactive at fixture "
    "occupancy), then similarity.mine_triplets(candidates=...) "
    "scores ONLY those pairs — the corpus-scale shape where per-"
    "anchor work is bounded by probes x cap even under Zipf cell "
    "occupancy (SKEW_PROBE_r10_ann.json), not corpus size. "
    "Multi-probe duplicate pairs are collapsed inside the hook; "
    "subset bounds (ANN hard-neg sim <= exact argmax, far-pos >= "
    "exact argmin) and exact-match recall on the fixture quantizer "
    "are pinned in tests/test_llm.py::test_q271_ann_recall_vs_exact. "
    "Engine-side feature (no reference analog; the reference has no "
    "vector surface).",
)
def q271(spark: SparkSession, sf: str) -> DataFrame:
    from speculare_pgcdc_spark.operators import similarity as sim

    e = table(spark, sf, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").alias("v"),
        sim._norm(F.col("embedding")).alias("nrm"),
    )
    anchors = e.filter(F.col("vec_id") < HARDNEG_ANCHORS).select(
        F.col("vec_id").alias("aid"),
        F.col("label").alias("albl"),
        F.col("v").alias("av"),
        F.col("nrm").alias("an"),
    )
    cands = e.select(
        F.col("vec_id").alias("cid"),
        F.col("label").alias("clbl"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    cents = sim.kmeans_centroids(
        e.select("vec_id", F.col("v").alias("embedding")),
        k=HARDNEG_IVF_K,
        iters=HARDNEG_IVF_ITERS,
    )
    a_cells = sim.assign_probe_cells(
        anchors, cents, probes=HARDNEG_IVF_PROBES, vec_col="av"
    ).select("aid", "_cell")
    c_cells = sim.assign_probe_cells(
        cands, cents, probes=HARDNEG_IVF_PROBES, vec_col="cv"
    ).select("cid", "_cell")
    pairs = sim.capped_cell_pairs(a_cells, c_cells, HARDNEG_CELL_CAP)
    return sim.mine_triplets(anchors, cands, candidates=pairs)


