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
- q203-q208: retrieval/classifier eval + trend metrics — NDCG@10, MRR,
  threshold sweep, Cohen's kappa, autocorrelation, Theil-Sen slope;
- q209-q213: distribution tests + repetition filter — Gopher bigram
  repetition, KS, chi-squared, JS divergence, Kaplan-Meier;
- q214-q217: training-prep table builders — negative-sampling
  distribution, normalization dedup tier, inverted index, fertility;
- q218-q220: warehouse lifecycle — cohort LTV, SCD2 state-at-purchase
  attribution, referential-integrity audit;
- q221-q224: experiment analysis — pairwise Welch t-test, score-decile
  lift, last-touch attribution, Q-Q quantile pairs;
- q225-q227: replica + design ops — LWW multi-master merge, Neyman
  audit allocation, mutual information;
- q228-q229: SQL-surface edges — null-safe join equality, array set
  operations over collected sets;
- q230-q232: sequence/behavior analytics — gaps-and-islands streaks,
  deterministic per-group mode, per-user max drawdown;
- q233: stratified exact sample — the E179 Neyman design executed by
  per-stratum md5-rank pick;
- q234-q235: forecasting — Holt linear-trend smoothing + h-step
  forecast, lead/lag cross-correlation between event series.
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
    base = docs.select("doc_id", arr.alias("arr")).filter(
        F.size("arr") > 0
    )
    segs = base.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.ceil(F.size("arr") / float(LEAK_SEG)).cast("bigint")
                - 1,
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
    tf = matched.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl")
    )
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
    "set per anchor comes from the ANN tier (q53 IVF / q126 PQ) and "
    "this ranking runs per bucket — the mining logic is unchanged, "
    "only candidate generation swaps.",
)
def q202(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window as W

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
    sim_ppm = F.floor(
        sim._dot(F.col("av"), F.col("cv"))
        / (F.col("an") * F.col("cn"))
        * 1000000
    ).cast("bigint")
    pairs = (
        anchors.crossJoin(cands)
        .filter(F.col("cid") != F.col("aid"))
        .withColumn("sim_ppm", sim_ppm)
        .select("aid", "albl", "cid", "clbl", "sim_ppm")
    )
    pairs = pairs.localCheckpoint(eager=True)
    neg_rk = W.partitionBy("aid").orderBy(
        F.col("sim_ppm").desc(), "cid"
    )
    neg = (
        pairs.filter(F.col("clbl") != F.col("albl"))
        .withColumn("rk", F.row_number().over(neg_rk))
        .filter(F.col("rk") == 1)
        .select(
            "aid",
            F.col("cid").alias("hard_neg_id"),
            F.col("sim_ppm").alias("hard_neg_sim_ppm"),
        )
    )
    pos_rk = W.partitionBy("aid").orderBy("sim_ppm", "cid")
    pos = (
        pairs.filter(
            (F.col("clbl") == F.col("albl"))
        )
        .withColumn("rk", F.row_number().over(pos_rk))
        .filter(F.col("rk") == 1)
        .select(
            "aid",
            F.col("cid").alias("far_pos_id"),
            F.col("sim_ppm").alias("far_pos_sim_ppm"),
        )
    )
    return (
        anchors.select(
            F.col("aid"), F.col("albl").alias("label")
        )
        .join(neg, "aid", "left")
        .join(pos, "aid", "left")
        .select(
            F.col("aid").alias("vec_id"),
            "label",
            "hard_neg_id",
            "hard_neg_sim_ppm",
            "far_pos_id",
            "far_pos_sim_ppm",
        )
        .orderBy("vec_id")
    )


# --------------------------------------------------------------------
# Retrieval / classifier evaluation metrics (round 6, batch 3): the
# measurements a team runs on every ranking function and quality
# classifier BEFORE letting it filter or order a corpus. All outputs
# follow the engine-stability convention: integer e9-scaled discount
# constants, exact BIGINT/DECIMAL arithmetic, ppm via exact DIV.
# --------------------------------------------------------------------

#: NDCG@k cutoff and the e9-scaled rank discounts 1e9/log2(r+1),
#: r = 1..k, precomputed as INTEGER literals so both engines sum the
#: exact same numbers (no ln/log2 call in either plan); _NDCG_IDCG_E9
#: holds the ideal-DCG prefix sums (index m = ideal DCG of m
#: relevant docs).
NDCG_K = 10
_NDCG_DISC_E9 = (
    1000000000, 630929753, 500000000, 430676558, 386852807,
    356207187, 333333333, 315464876, 301029995, 289064826,
)
_NDCG_IDCG_E9 = (
    0, 1000000000, 1630929753, 2130929753, 2561606311, 2948459118,
    3304666305, 3637999638, 3953464514, 4254494509, 4543559335,
)

_NDCG_DISC_SQL = "CASE rk " + " ".join(
    f"WHEN {r + 1} THEN {d}" for r, d in enumerate(_NDCG_DISC_E9)
) + " END"
_NDCG_IDCG_SQL = "CASE least(n_rel, 10) " + " ".join(
    f"WHEN {m} THEN {v}" for m, v in enumerate(_NDCG_IDCG_E9)
) + " END"


@register(
    "q203_ndcg_at_k",
    oracle=f"""
        WITH ranked AS (
            SELECT source, doc_id,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS rel,
                   ROW_NUMBER() OVER (PARTITION BY source
                       ORDER BY n_chars DESC, doc_id) AS rk
            FROM documents
        ),
        dcg AS (
            SELECT source,
                   SUM(rel * ({_NDCG_DISC_SQL})) AS dcg_e9
            FROM ranked WHERE rk <= {NDCG_K} GROUP BY source
        ),
        stats AS (
            SELECT source, COUNT(*) AS n_docs,
                   SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                       AS n_rel
            FROM documents GROUP BY source
        )
        SELECT s.source, CAST(s.n_docs AS BIGINT) AS n_docs,
               CAST(s.n_rel AS BIGINT) AS n_rel,
               CAST(COALESCE(d.dcg_e9, 0) * 1000000
                    // greatest({_NDCG_IDCG_SQL}, 1) AS BIGINT)
                   AS ndcg_ppm
        FROM stats s LEFT JOIN dcg d ON s.source = d.source
        ORDER BY s.source
    """,
    doc="NDCG@10 of a ranking (score = n_chars desc, doc_id "
    "tiebreak) against binary relevance (lang = 'en'), per query "
    "group (source) — the retrieval-eval metric behind every search "
    "and eval-set ranking change. Engine-stable by construction: the "
    "1/log2(rank+1) discounts are precomputed e9-scaled INTEGER "
    "literals (no transcendental call in either plan), DCG is a "
    "BIGINT sum, ideal DCG is a prefix-sum lookup on "
    "least(n_rel, k), and NDCG is exact integer DIV to ppm. Scale: "
    "the rank filter rk <= k sits directly on the window, which "
    "Spark's WindowGroupLimit rewrite turns into per-partition "
    "partial top-k before the shuffle — the full sort of each "
    "source's documents never happens; everything after is "
    "group-grain.",
)
def q203(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    docs = table(spark, sf, "documents")
    rel = F.when(F.col("lang") == "en", 1).otherwise(0)
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), "doc_id"
    )
    disc = F.lit(None)
    for r, d in enumerate(_NDCG_DISC_E9):
        disc = F.when(F.col("rk") == r + 1, d).otherwise(disc)
    dcg = (
        docs.select("source", rel.alias("rel"),
                    F.col("n_chars"), F.col("doc_id"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= NDCG_K)
        .groupBy("source")
        .agg(F.sum(F.col("rel") * disc).alias("dcg_e9"))
    )
    stats = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(rel).cast("bigint").alias("n_rel"),
    )
    idcg = F.lit(None)
    for m, v in enumerate(_NDCG_IDCG_E9):
        idcg = F.when(
            F.least(F.col("n_rel"), F.lit(NDCG_K)) == m, v
        ).otherwise(idcg)
    return (
        stats.join(dcg, "source", "left")
        .select(
            "source", "n_docs", "n_rel",
            (F.coalesce(F.col("dcg_e9"), F.lit(0)) * 1000000)
            .cast("bigint").alias("_num"),
            idcg.alias("_idcg"),
        )
        .select(
            "source", "n_docs", "n_rel",
            F.expr("CAST(_num DIV greatest(_idcg, 1) AS BIGINT)")
            .alias("ndcg_ppm"),
        )
        .orderBy("source")
    )


@register(
    "q204_mrr",
    oracle="""
        WITH ranked AS (
            SELECT source, lang,
                   ROW_NUMBER() OVER (PARTITION BY source
                       ORDER BY n_chars DESC, doc_id) AS rk
            FROM documents
        ),
        firstrel AS (
            SELECT source, MIN(rk) AS r FROM ranked
            WHERE lang = 'en' GROUP BY source
        )
        SELECT s.source,
               CAST(f.r AS BIGINT) AS first_rel_rank,
               CAST(COALESCE(1000000 // f.r, 0) AS BIGINT) AS rr_ppm
        FROM (SELECT DISTINCT source FROM documents) s
        LEFT JOIN firstrel f ON s.source = f.source
        ORDER BY s.source
    """,
    doc="Mean-reciprocal-rank inputs per query group (source): the "
    "rank of the FIRST relevant document (lang = 'en') under the "
    "(n_chars desc, doc_id) ordering, and its reciprocal as exact "
    "integer ppm (1000000 DIV rank). Computed WITHOUT ranking the "
    "group: the best relevant doc per source is one max(struct(...)) "
    "aggregate, and its rank is 1 + the count of docs ordered "
    "strictly above it — a broadcast join of the group-grain best "
    "row against the scan plus one hash agg. No window at all, so "
    "at 100 TB the cost is two scans and group-grain joins, "
    "independent of group size or skew. Sources with no relevant "
    "doc keep a NULL rank and rr_ppm 0 (LEFT join).",
)
def q204(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents").select(
        "source", "doc_id", "n_chars", "lang"
    )
    best = (
        docs.filter(F.col("lang") == "en")
        .groupBy("source")
        .agg(
            F.max(
                F.struct(
                    F.col("n_chars").alias("nc"),
                    (-F.col("doc_id")).alias("nd"),
                )
            ).alias("b")
        )
        .select(
            "source",
            F.col("b.nc").alias("bnc"),
            (-F.col("b.nd")).alias("bid"),
        )
    )
    above = (
        docs.join(F.broadcast(best), "source")
        .filter(
            (F.col("n_chars") > F.col("bnc"))
            | (
                (F.col("n_chars") == F.col("bnc"))
                & (F.col("doc_id") < F.col("bid"))
            )
        )
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_above"))
    )
    return (
        docs.select("source").distinct()
        .join(F.broadcast(best.select("source", "bnc")), "source",
              "left")
        .join(F.broadcast(above), "source", "left")
        .select(
            "source",
            F.when(
                F.col("bnc").isNotNull(),
                F.coalesce(F.col("n_above"), F.lit(0)) + 1,
            ).cast("bigint").alias("first_rel_rank"),
        )
        .select(
            "source",
            "first_rel_rank",
            F.coalesce(
                F.expr("1000000 DIV first_rel_rank"), F.lit(0)
            ).cast("bigint").alias("rr_ppm"),
        )
        .orderBy("source")
    )


#: q205 threshold grid resolution (score-bin count, q199's convention)
SWEEP_BINS = 20


@register(
    "q205_threshold_sweep",
    oracle=f"""
        WITH m AS (SELECT MAX(n_chars) AS mx FROM documents),
        b AS (
            SELECT least(n_chars * {SWEEP_BINS} // mx,
                         {SWEEP_BINS - 1}) AS score_bin,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
            FROM documents CROSS JOIN m
        ),
        g AS (
            SELECT score_bin, SUM(pos) AS pos_cnt,
                   COUNT(*) - SUM(pos) AS neg_cnt
            FROM b GROUP BY score_bin
        ),
        t AS (
            SELECT SUM(pos_cnt) AS total_pos FROM g
        ),
        c AS (
            SELECT score_bin,
                   SUM(pos_cnt) OVER (ORDER BY score_bin DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS tp,
                   SUM(neg_cnt) OVER (ORDER BY score_bin DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS fp
            FROM g
        )
        SELECT CAST(score_bin AS BIGINT) AS thresh_bin,
               CAST(tp + fp AS BIGINT) AS n_pred,
               CAST(tp AS BIGINT) AS tp,
               CAST(tp * 1000000 // greatest(tp + fp, 1) AS BIGINT)
                   AS precision_ppm,
               CAST(tp * 1000000 // greatest(t.total_pos, 1)
                    AS BIGINT) AS recall_ppm,
               CAST(2 * tp * 1000000
                    // greatest(tp + fp + t.total_pos, 1) AS BIGINT)
                   AS f1_ppm
        FROM c CROSS JOIN t
        ORDER BY thresh_bin
    """,
    doc="Operating-point sweep for a score/label pair: "
    "precision / recall / F1 at every threshold of a "
    f"{SWEEP_BINS}-bin score grid (predict positive when score-bin "
    ">= t) — the curve a team reads to PICK the quality-filter "
    "threshold that q198's AUC only summarizes. Shape: one hash agg "
    "to bin grain, then reverse-cumulative windows over the "
    f"<= {SWEEP_BINS}-row bin table (the q198 banding contract: "
    "windows only ever run at bin grain), totals broadcast; every "
    "metric is exact integer ppm (F1 = 2*tp // (2*tp + fp + fn) "
    "with fn folded via total_pos). Scale: the corpus touches one "
    "scan + one agg; the sweep itself is O(bins).",
)
def q205(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    docs = table(spark, sf, "documents")
    m = docs.agg(F.max("n_chars").alias("mx"))
    pos = F.when(F.col("lang") == "en", 1).otherwise(0)
    g = (
        docs.crossJoin(F.broadcast(m))
        .select(
            F.least(
                F.expr(f"n_chars * {SWEEP_BINS} DIV mx"),
                F.lit(SWEEP_BINS - 1),
            ).alias("score_bin"),
            pos.alias("pos"),
        )
        .groupBy("score_bin")
        .agg(
            F.sum("pos").alias("pos_cnt"),
            (F.count(F.lit(1)) - F.sum("pos")).alias("neg_cnt"),
        )
    )
    g = g.localCheckpoint(eager=True)
    t = g.agg(F.sum("pos_cnt").alias("total_pos"))
    w = Window.orderBy(F.col("score_bin").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        g.select(
            "score_bin",
            F.sum("pos_cnt").over(w).alias("tp"),
            F.sum("neg_cnt").over(w).alias("fp"),
        )
        .crossJoin(F.broadcast(t))
        .select(
            F.col("score_bin").cast("bigint").alias("thresh_bin"),
            (F.col("tp") + F.col("fp")).cast("bigint")
            .alias("n_pred"),
            F.col("tp").cast("bigint").alias("tp"),
            F.expr(
                "CAST(tp * 1000000 DIV greatest(tp + fp, 1) "
                "AS BIGINT)"
            ).alias("precision_ppm"),
            F.expr(
                "CAST(tp * 1000000 DIV greatest(total_pos, 1) "
                "AS BIGINT)"
            ).alias("recall_ppm"),
            F.expr(
                "CAST(2 * tp * 1000000 DIV "
                "greatest(tp + fp + total_pos, 1) AS BIGINT)"
            ).alias("f1_ppm"),
        )
        .orderBy("thresh_bin")
    )


#: q206 rater A threshold: docs with n_chars >= this count as "long"
KAPPA_CHARS = 300


@register(
    "q206_cohens_kappa",
    oracle=f"""
        WITH r AS (
            SELECT CASE WHEN n_chars >= {KAPPA_CHARS} THEN 1 ELSE 0
                   END AS a,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS b
            FROM documents
        ),
        c AS (
            SELECT COUNT(*) AS n,
                   SUM(a) AS a1, SUM(b) AS b1,
                   SUM(a * b) AS n11,
                   SUM((1 - a) * (1 - b)) AS n00,
                   SUM(a * (1 - b)) AS n10,
                   SUM((1 - a) * b) AS n01
            FROM r
        )
        SELECT CAST(n AS BIGINT) AS n,
               CAST(n00 AS BIGINT) AS n00,
               CAST(n01 AS BIGINT) AS n01,
               CAST(n10 AS BIGINT) AS n10,
               CAST(n11 AS BIGINT) AS n11,
               CAST(FLOOR(
                   CAST(n * (n00 + n11)
                        - (a1 * b1 + (n - a1) * (n - b1)) AS DOUBLE)
                   / CAST(greatest(n * n
                        - (a1 * b1 + (n - a1) * (n - b1)), 1)
                        AS DOUBLE) * 1000000) AS BIGINT) AS kappa_e6
        FROM c
    """,
    doc="Cohen's kappa between two labelling functions — rater A = "
    f"'long doc' (n_chars >= {KAPPA_CHARS}), rater B = 'is English' "
    "(lang = 'en') — the chance-corrected agreement measure used to "
    "decide whether two annotation pipelines (or a classifier and a "
    "human pass) measure the same thing before one replaces the "
    "other. One scan, one 6-counter hash agg to a single row; kappa "
    "= (n*(n00+n11) - chance) / (n^2 - chance) with chance = "
    "a1*b1 + a0*b0 kept as exact BIGINTs, the final ratio taken in "
    "DOUBLE on identical integer operands and floored to e6 (floor "
    "is toward -inf in both engines, so negative kappa — "
    "worse-than-chance agreement — stays engine-stable). The full "
    "2x2 contingency table is emitted alongside so any other "
    "agreement statistic is derivable without a rescan.",
)
def q206(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    a = F.when(F.col("n_chars") >= KAPPA_CHARS, 1).otherwise(0)
    b = F.when(F.col("lang") == "en", 1).otherwise(0)
    c = docs.select(a.alias("a"), b.alias("b")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("a").alias("a1"),
        F.sum("b").alias("b1"),
        F.sum(F.col("a") * F.col("b")).alias("n11"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).alias("n00"),
        F.sum(F.col("a") * (1 - F.col("b"))).alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).alias("n01"),
    )
    return c.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("n00").cast("bigint").alias("n00"),
        F.col("n01").cast("bigint").alias("n01"),
        F.col("n10").cast("bigint").alias("n10"),
        F.col("n11").cast("bigint").alias("n11"),
        F.floor(
            (
                F.col("n") * (F.col("n00") + F.col("n11"))
                - (
                    F.col("a1") * F.col("b1")
                    + (F.col("n") - F.col("a1"))
                    * (F.col("n") - F.col("b1"))
                )
            ).cast("double")
            / F.greatest(
                F.col("n") * F.col("n")
                - (
                    F.col("a1") * F.col("b1")
                    + (F.col("n") - F.col("a1"))
                    * (F.col("n") - F.col("b1"))
                ),
                F.lit(1),
            ).cast("double")
            * 1000000
        ).cast("bigint").alias("kappa_e6"),
    )


#: q207 maximum autocorrelation lag (days)
ACF_MAX_LAG = 7


@register(
    "q207_autocorrelation",
    oracle=f"""
        WITH days AS (
            SELECT CAST(ts AS DATE) AS d, COUNT(*) AS x
            FROM events GROUP BY d
        ),
        s AS (
            SELECT COUNT(*) AS n, SUM(x) AS sx FROM days
        ),
        den AS (
            SELECT SUM(CAST((s.n * d.x - s.sx) AS HUGEINT)
                       * (s.n * d.x - s.sx)) AS den
            FROM days d CROSS JOIN s
        ),
        lags AS (
            SELECT CAST(x AS BIGINT) AS lag
            FROM generate_series(1, {ACF_MAX_LAG}) t(x)
        ),
        num AS (
            SELECT l.lag, COUNT(*) AS n_pairs,
                   SUM(CAST((s.n * a.x - s.sx) AS HUGEINT)
                       * (s.n * b.x - s.sx)) AS num
            FROM lags l
            JOIN days a ON TRUE
            JOIN days b ON b.d = a.d + CAST(l.lag AS INTEGER)
            CROSS JOIN s
            GROUP BY l.lag
        )
        SELECT num.lag,
               CAST(num.n_pairs AS BIGINT) AS n_pairs,
               CAST(FLOOR(CAST(num.num AS DOUBLE)
                    / CAST(greatest(den.den, 1) AS DOUBLE)
                    * 1000000) AS BIGINT) AS acf_ppm
        FROM num CROSS JOIN den
        ORDER BY num.lag
    """,
    doc="Lag-1..7 autocorrelation of the daily event-count series — "
    "the seasonality detector behind capacity planning and the "
    "q168/q177 anomaly thresholds (a strong lag-7 says 'weekly "
    "cycle', a high lag-1 says 'bursts persist'). Exact arithmetic "
    "throughout: with S = sum(x) and n = days, the centered product "
    "(x_t - S/n)(x_{{t+k}} - S/n) is scaled by n^2 to the all-integer "
    "(n*x_t - S)(n*x_{{t+k}} - S), DECIMAL/HUGEINT-summed; only the "
    "final num/den ratio is taken in DOUBLE (identical operands -> "
    "identical IEEE result) and floored to ppm. Shape: one "
    "corpus-sized agg to day grain, then everything — the lag "
    "self-join on d = d + k, the scalar den — runs on the tiny day "
    "table; missing days simply drop pairs (n_pairs reports "
    "coverage). At 100 TB the day table is still thousands of rows.",
)
def q207(spark: SparkSession, sf: str) -> DataFrame:
    days = (
        table(spark, sf, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("x"))
        .localCheckpoint(eager=True)
    )
    s = days.agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx")
    )
    dec = "decimal(38,0)"
    den = (
        days.crossJoin(F.broadcast(s))
        .select(
            (
                (F.col("n") * F.col("x") - F.col("sx")).cast(dec)
                * (F.col("n") * F.col("x") - F.col("sx"))
            ).alias("t")
        )
        .agg(F.sum("t").alias("den"))
    )
    lags = spark.range(1, ACF_MAX_LAG + 1).select(
        F.col("id").cast("bigint").alias("lag")
    )
    a = days.select(F.col("d").alias("da"), F.col("x").alias("xa"))
    b = days.select(F.col("d").alias("db"), F.col("x").alias("xb"))
    num = (
        lags.crossJoin(a)
        .join(
            b,
            F.col("db")
            == F.date_add(F.col("da"), F.col("lag").cast("int")),
        )
        .crossJoin(F.broadcast(s))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(
                (F.col("n") * F.col("xa") - F.col("sx")).cast(dec)
                * (F.col("n") * F.col("xb") - F.col("sx"))
            ).alias("num"),
        )
    )
    return (
        num.crossJoin(F.broadcast(den))
        .select(
            "lag",
            "n_pairs",
            F.floor(
                F.col("num").cast("double")
                / F.greatest(
                    F.col("den"), F.lit(1).cast(dec)
                ).cast("double")
                * 1000000
            ).cast("bigint").alias("acf_ppm"),
        )
        .orderBy("lag")
    )


@register(
    "q208_theil_sen_trend",
    oracle="""
        WITH days AS (
            SELECT CAST(ts AS DATE) AS d, COUNT(*) AS x
            FROM events GROUP BY d
        ),
        t AS (
            SELECT CAST(d - (SELECT MIN(d) FROM days) AS BIGINT)
                       AS t, x
            FROM days
        ),
        pairs AS (
            SELECT CAST(b.x - a.x AS DOUBLE)
                   / CAST(b.t - a.t AS DOUBLE) AS slope
            FROM t a JOIN t b ON b.t > a.t
        ),
        ranked AS (
            SELECT slope, ROW_NUMBER() OVER (ORDER BY slope) AS rn,
                   COUNT(*) OVER () AS np
            FROM pairs
        ),
        sel AS (
            SELECT AVG(slope) AS med, MAX(np) AS np FROM ranked
            WHERE rn IN ((np + 1) // 2, (np + 2) // 2)
        )
        SELECT CAST((SELECT COUNT(*) FROM days) AS BIGINT)
                   AS n_days,
               CAST(np AS BIGINT) AS n_pairs,
               CAST(FLOOR(med * 1000000) AS BIGINT) AS slope_ppm
        FROM sel
    """,
    doc="Theil-Sen robust trend of the daily event-count series: the "
    "exact median of all pairwise slopes (x_j - x_i)/(t_j - t_i) — "
    "the slope estimator that shrugs off the outlier days that make "
    "OLS (q187's fit) lie about traffic trends. Median selection is "
    "explicit order statistics (row_number, pick positions "
    "(n+1)//2 and (n+2)//2, AVG the one or two values) so both "
    "engines average the SAME two IEEE doubles — no reliance on "
    "matching quantile-interpolation conventions — and the result "
    "is floored to ppm (floor toward -inf: negative trends stay "
    "stable). Shape: one corpus-sized agg to day grain; the "
    "O(days^2) pair join is day-grain (3.65k days = 6.6M pairs at a "
    "decade of data). Median selection rides the q194 banded "
    "order-statistics path — distinct-slope grain with counts, "
    "millislope-bin cumsum for the global rank interval, in-bin "
    "window partitioned by bin — so NO data-grain single-partition "
    "sort remains even as the pair count grows quadratically in "
    "days. Slope units: events/day.",
)
def q208(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    days = (
        table(spark, sf, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("x"))
        .localCheckpoint(eager=True)
    )
    tmin = days.agg(F.min("d").alias("d0"))
    t = days.crossJoin(F.broadcast(tmin)).select(
        F.datediff("d", "d0").cast("bigint").alias("t"), "x"
    )
    a = t.select(F.col("t").alias("ta"), F.col("x").alias("xa"))
    b = t.select(F.col("t").alias("tb"), F.col("x").alias("xb"))
    pairs = (
        a.join(b, F.col("tb") > F.col("ta"))
        .select(
            (
                (F.col("xb") - F.col("xa")).cast("double")
                / (F.col("tb") - F.col("ta")).cast("double")
            ).alias("slope")
        )
    )
    # q194-style banded order statistics over the slope multiset:
    # collapse to distinct-slope grain (ties carry counts), bin by
    # millislope; rank interval [lo, hi] per distinct value, median
    # positions select at most two values — both engines average the
    # same IEEE doubles the oracle's ROW_NUMBER form picks.
    g = (
        pairs.groupBy("slope")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "b", F.floor(F.col("slope") * 1000).cast("bigint")
        )
        .localCheckpoint(eager=True)
    )
    w_bins = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bins = (
        g.groupBy("b")
        .agg(F.sum("cnt").alias("bcnt"))
        .select(
            "b",
            F.coalesce(F.sum("bcnt").over(w_bins), F.lit(0)).alias(
                "below_bins"
            ),
        )
    )
    w_in = (
        Window.partitionBy("b")
        .orderBy("slope")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n = g.agg(F.sum("cnt").alias("np"))
    spans = (
        g.withColumn(
            "below_in", F.coalesce(F.sum("cnt").over(w_in), F.lit(0))
        )
        .join(F.broadcast(bins), "b")
        .crossJoin(F.broadcast(n))
        .withColumn("lo", F.col("below_bins") + F.col("below_in") + 1)
        .withColumn("hi", F.col("lo") + F.col("cnt") - 1)
    )
    p1 = F.expr("(np + 1) DIV 2")
    p2 = F.expr("(np + 2) DIV 2")
    in1 = (F.col("lo") <= p1) & (p1 <= F.col("hi"))
    in2 = (F.col("lo") <= p2) & (p2 <= F.col("hi"))
    weight = F.when(in1, 1).otherwise(0) + F.when(in2, 1).otherwise(0)
    sel = (
        spans.filter(in1 | in2)
        .select(
            F.col("np"),
            (F.col("slope") * weight).alias("vw"),
            weight.alias("w"),
        )
        .agg(
            (F.sum("vw") / F.sum("w")).alias("med"),
            F.max("np").alias("np"),
        )
    )
    n_days = days.agg(F.count(F.lit(1)).alias("n_days"))
    return (
        sel.crossJoin(F.broadcast(n_days))
        .select(
            F.col("n_days").cast("bigint").alias("n_days"),
            F.col("np").cast("bigint").alias("n_pairs"),
            F.floor(F.col("med") * 1000000).cast("bigint")
            .alias("slope_ppm"),
        )
    )


# --------------------------------------------------------------------
# Distribution tests + corpus-hygiene filters (round 6, batch 4):
# repetition filtering (the Gopher-style duplicate-n-gram rule),
# two-sample KS, chi-squared independence, JS divergence, and a
# Kaplan-Meier time-to-event curve — the statistical toolkit behind
# "did this corpus / cohort actually change" decisions.
# --------------------------------------------------------------------

#: q209: docs whose duplicate-bigram fraction is at/above this ppm are
#: flagged repetitive (fixture range: median ~28k, max ~133k ppm)
REP_FLAG_PPM = 60000


@register(
    "q209_repetition_ratio",
    oracle=f"""
        WITH b AS (
            SELECT source,
                   list_filter(string_split(COALESCE(text, ''), ' '),
                               x -> x <> '') AS a
            FROM documents
        ),
        g AS (
            SELECT source,
                   CASE WHEN len(a) >= 2 THEN
                       list_transform(generate_series(1, len(a) - 1),
                           i -> a[i] || ' ' || a[i + 1])
                   ELSE [] END AS bg
            FROM b
        ),
        r AS (
            SELECT source,
                   (len(bg) - len(list_distinct(bg))) * 1000000
                       // greatest(len(bg), 1) AS rep_ppm
            FROM g
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(rep_ppm) // COUNT(*) AS BIGINT)
                   AS mean_rep_ppm,
               CAST(SUM(CASE WHEN rep_ppm >= {REP_FLAG_PPM}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
        FROM r GROUP BY source ORDER BY source
    """,
    doc="Intra-document repetition filter (the Gopher-family "
    "duplicate-n-gram rule): per doc, the fraction of bigrams that "
    "are repeats of an earlier bigram in the same doc — template "
    "spam, keyword stuffing, and decode-loop artifacts all light "
    "this up. rep_ppm = (n_bigrams - n_distinct_bigrams) exact "
    "integer ppm; per-source rollup emits mean rep and the count "
    f"over the {REP_FLAG_PPM} ppm flag line. Entirely map-side: "
    "bigrams, distinct count, and the ratio are per-row array "
    "expressions (transform over index sequence + array_distinct — "
    "no explode, no shuffle at token grain); the only shuffle is "
    "the source-grain rollup. At 100 TB this is the cheapest shape "
    "a token-level filter can have.",
)
def q209(spark: SparkSession, sf: str) -> DataFrame:
    from speculare_pgcdc_spark.operators.textstats import (
        repetition_counts,
    )

    # the property-tested Gopher primitive: BIGINT-cast counts, so the
    # *1e6 scaling below cannot overflow 32-bit on a highly repetitive
    # long doc (size() alone is INT — the trap this helper exists for)
    counts = repetition_counts(F.col("text"), n=2)
    r = table(spark, sf, "documents").select(
        "source",
        counts["n_gram"].alias("ng"),
        counts["n_gram_distinct"].alias("ngd"),
    ).select(
        "source",
        F.expr(
            "(ng - ngd) * 1000000 DIV greatest(ng, 1)"
        ).alias("rep_ppm"),
    )
    return (
        r.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.expr("SUM(rep_ppm) DIV COUNT(*)").cast("bigint")
            .alias("mean_rep_ppm"),
            F.sum(
                (F.col("rep_ppm") >= REP_FLAG_PPM).cast("int")
            ).cast("bigint").alias("n_flagged"),
        )
        .orderBy("source")
    )


#: q210 value-bin width (n_chars grain, the q198 banding)
KS_BIN = 64


@register(
    "q210_ks_test",
    oracle="""
        WITH g AS (
            SELECT n_chars AS v,
                   SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                       AS a_cnt,
                   SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)
                       AS b_cnt
            FROM documents GROUP BY v
        ),
        t AS (
            SELECT CAST(SUM(a_cnt) AS HUGEINT) AS na,
                   CAST(SUM(b_cnt) AS HUGEINT) AS nb
            FROM g
        ),
        c AS (
            SELECT SUM(a_cnt) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS ca,
                   SUM(b_cnt) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cb
            FROM g
        )
        SELECT CAST(t.na AS BIGINT) AS n_en,
               CAST(t.nb AS BIGINT) AS n_other,
               CAST(MAX(abs(CAST(ca AS HUGEINT) * t.nb
                            - CAST(cb AS HUGEINT) * t.na))
                    * 1000000 // greatest(t.na * t.nb, 1) AS BIGINT)
                   AS ks_ppm
        FROM c CROSS JOIN t
        GROUP BY t.na, t.nb
    """,
    doc="Two-sample Kolmogorov-Smirnov statistic between the en and "
    "non-en n_chars distributions — the distribution-shift test a "
    "team runs before blaming a metric move on a pipeline change "
    "(q144's KL needs binning and misses location shifts; KS is "
    "binning-free). Exact integer throughout: D = max |F1 - F2| is "
    "computed as max |ca*n2 - cb*n1| over distinct values (one "
    "cross-multiplication per value, no float CDFs), emitted as "
    "exact ppm of n1*n2. The cumulative counts come from the q198 "
    "two-level banding (bin cumsum + in-bin prefix), so no window "
    "ever sees data grain — value grain is bounded by the score "
    "range, not the corpus. Spark accumulates the cross products "
    "in DECIMAL(38,0) (HUGEINT in the oracle): n1*n2 overflows "
    "BIGINT at ~3e9 rows per class.",
)
def q210(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    pos = F.when(F.col("lang") == "en", 1).otherwise(0)
    g = (
        table(spark, sf, "documents")
        .groupBy(F.col("n_chars").alias("v"))
        .agg(
            F.sum(pos).alias("a_cnt"),
            (F.count(F.lit(1)) - F.sum(pos)).alias("b_cnt"),
        )
        .withColumn("b", F.expr(f"v DIV {KS_BIN}"))
        .localCheckpoint(eager=True)
    )
    t = g.agg(
        F.sum("a_cnt").alias("na"), F.sum("b_cnt").alias("nb")
    )
    bins = g.groupBy("b").agg(
        F.sum("a_cnt").alias("ba"), F.sum("b_cnt").alias("bb")
    )
    w_bins = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bins = bins.select(
        "b",
        F.coalesce(F.sum("ba").over(w_bins), F.lit(0))
        .alias("below_a"),
        F.coalesce(F.sum("bb").over(w_bins), F.lit(0))
        .alias("below_b"),
    )
    w_in = (
        Window.partitionBy("b")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dec = "decimal(38,0)"
    c = (
        g.withColumn("ia", F.sum("a_cnt").over(w_in))
        .withColumn("ib", F.sum("b_cnt").over(w_in))
        .join(F.broadcast(bins), "b")
        .crossJoin(F.broadcast(t))
        .select(
            F.abs(
                (F.col("below_a") + F.col("ia")).cast(dec)
                * F.col("nb")
                - (F.col("below_b") + F.col("ib")).cast(dec)
                * F.col("na")
            ).alias("d"),
            F.col("na").cast(dec).alias("na"),
            F.col("nb").cast(dec).alias("nb"),
        )
    )
    return c.groupBy("na", "nb").agg(
        F.max("d").alias("mx")
    ).select(
        F.col("na").cast("bigint").alias("n_en"),
        F.col("nb").cast("bigint").alias("n_other"),
        F.expr(
            "CAST((mx * 1000000 - pmod(mx * 1000000, "
            "greatest(na * nb, 1))) / greatest(na * nb, 1) "
            "AS BIGINT)"
        ).alias("ks_ppm"),
    )


@register(
    "q211_chi_squared",
    oracle="""
        WITH o AS (
            SELECT lang, source, COUNT(*) AS obs
            FROM documents GROUP BY lang, source
        ),
        rt AS (SELECT lang, SUM(obs) AS r FROM o GROUP BY lang),
        ct AS (SELECT source, SUM(obs) AS c FROM o GROUP BY source),
        n AS (SELECT SUM(obs) AS n FROM o),
        grid AS (
            SELECT rt.lang, ct.source, rt.r, ct.c, n.n,
                   COALESCE(o.obs, 0) AS obs
            FROM rt CROSS JOIN ct CROSS JOIN n
            LEFT JOIN o ON o.lang = rt.lang AND o.source = ct.source
        )
        SELECT CAST(MAX(n) AS BIGINT) AS n,
               CAST((COUNT(DISTINCT lang) - 1)
                    * (COUNT(DISTINCT source) - 1) AS BIGINT)
                   AS dof,
               CAST(ROUND(CAST(SUM(CAST(
                   CAST(obs * n - r * c AS DOUBLE)
                   * CAST(obs * n - r * c AS DOUBLE)
                   / CAST(n * r * c AS DOUBLE)
                   AS DECIMAL(28,12))) AS DOUBLE), 6) AS DOUBLE)
                   AS chi2
        FROM grid
    """,
    doc="Chi-squared test of independence for the lang x source "
    "contingency table — 'does language mix depend on source?', the "
    "stratification check run before pooling sources into one "
    "training blend. Each cell's (O - E)^2 / E is algebraically "
    "rescaled to (O*n - r*c)^2 / (n*r*c): the difference O*n - r*c "
    "is EXACT integer arithmetic — DECIMAL(38,0) here, HUGEINT in "
    "the oracle, since LONG products overflow at ~1e9-row marginals "
    "— rounded ONCE to double, then squared and divided in IEEE "
    "doubles both engines evaluate identically (zero cells included "
    "via the row x column grid — they contribute r*c/n), "
    "accumulating in DECIMAL(28,12) with the final "
    "round->double output (the q144 contract). Shape: one hash agg "
    "to cell grain, marginals re-aggregated from the cells (the "
    "corpus is scanned once), and the grid is category-sized.",
)
def q211(spark: SparkSession, sf: str) -> DataFrame:
    o = (
        table(spark, sf, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("obs"))
        .localCheckpoint(eager=True)
    )
    rt = o.groupBy("lang").agg(F.sum("obs").alias("r"))
    ct = o.groupBy("source").agg(F.sum("obs").alias("c"))
    n = o.agg(F.sum("obs").alias("n"))
    grid = (
        rt.crossJoin(F.broadcast(ct))
        .crossJoin(F.broadcast(n))
        .join(F.broadcast(o), ["lang", "source"], "left")
        .withColumn("obs", F.coalesce(F.col("obs"), F.lit(0)))
    )
    # exact integer difference in DECIMAL(38,0) (HUGEINT in the
    # oracle — LONG products overflow at ~1e9-row marginals), ONE
    # rounding to double, then square/divide in IEEE doubles both
    # engines evaluate identically
    dec = lambda c: F.col(c).cast("decimal(20,0)")  # noqa: E731
    d = (dec("obs") * dec("n") - dec("r") * dec("c")).cast("double")
    nrc = (dec("n") * dec("r") * dec("c")).cast("double")
    term = (d * d / nrc).cast("decimal(28,12)")
    return grid.agg(
        F.max("n").cast("bigint").alias("n"),
        (
            (F.countDistinct("lang") - 1)
            * (F.countDistinct("source") - 1)
        ).cast("bigint").alias("dof"),
        F.round(F.sum(term).cast("double"), 6).cast("double")
        .alias("chi2"),
    )


@register(
    "q212_js_divergence",
    oracle="""
        WITH toks AS (
            SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS grp,
                   t.tok
            FROM documents,
                 LATERAL (
                    SELECT unnest(string_split(COALESCE(text, ''), ' '))
                        AS tok
                 ) t
            WHERE t.tok <> ''
        ),
        per AS (
            SELECT tok,
                   SUM(grp) AS c1,
                   COUNT(*) - SUM(grp) AS c2
            FROM toks GROUP BY tok
        ),
        t AS (
            SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM per
        )
        SELECT CAST(t.n1 AS BIGINT) AS n_tokens_en,
               CAST(t.n2 AS BIGINT) AS n_tokens_other,
               CAST(ROUND(CAST(SUM(CAST(
                   0.5 * (CASE WHEN c1 > 0 THEN
                       (c1 * 1.0 / t.n1) * ln((c1 * 1.0 / t.n1)
                           / (((c1 * 1.0 / t.n1)
                               + (c2 * 1.0 / t.n2)) / 2))
                       ELSE 0 END)
                   + 0.5 * (CASE WHEN c2 > 0 THEN
                       (c2 * 1.0 / t.n2) * ln((c2 * 1.0 / t.n2)
                           / (((c1 * 1.0 / t.n1)
                               + (c2 * 1.0 / t.n2)) / 2))
                       ELSE 0 END)
                   AS DECIMAL(28,12))) AS DOUBLE), 6) AS DOUBLE)
                   AS js_divergence
        FROM per CROSS JOIN t
        GROUP BY t.n1, t.n2
    """,
    doc="Jensen-Shannon divergence between the en and non-en unigram "
    "distributions — the SYMMETRIC, bounded (<= ln 2) cousin of "
    "q144's KL, the standard 'how different are these two corpora' "
    "number (KL is infinite on any token one side lacks; JS "
    "handles disjoint support, which real corpus pairs always "
    "have). One (tok)-keyed agg carries both class counts, totals "
    "are a broadcast scalar; p, q, m = (p+q)/2 are doubles from "
    "exact integer ratios so both engines form identical IEEE "
    "terms, zero-count sides contribute exactly 0 by CASE (not by "
    "float underflow), and terms accumulate in DECIMAL(28,12) with "
    "round->double output (the q144/q136 contract). Scale: "
    "token-vocabulary grain after one corpus scan.",
)
def q212(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents").select("lang", "text")
    grp = F.when(F.col("lang") == "en", 1).otherwise(0)
    toks = docs.select(
        grp.alias("grp"),
        F.explode(
            F.split(F.coalesce(F.col("text"), F.lit("")), " ")
        ).alias("tok"),
    ).filter(F.col("tok") != "")
    per = toks.groupBy("tok").agg(
        F.sum("grp").alias("c1"),
        (F.count(F.lit(1)) - F.sum("grp")).alias("c2"),
    )
    t = per.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    p = F.col("c1") * 1.0 / F.col("n1")
    q = F.col("c2") * 1.0 / F.col("n2")
    m = (p + q) / 2
    term = (
        0.5 * F.when(F.col("c1") > 0, p * F.log(p / m)).otherwise(0.0)
        + 0.5
        * F.when(F.col("c2") > 0, q * F.log(q / m)).otherwise(0.0)
    ).cast("decimal(28,12)")
    return (
        per.crossJoin(F.broadcast(t))
        .groupBy("n1", "n2")
        .agg(
            F.round(F.sum(term).cast("double"), 6).cast("double")
            .alias("js_divergence")
        )
        .select(
            F.col("n1").cast("bigint").alias("n_tokens_en"),
            F.col("n2").cast("bigint").alias("n_tokens_other"),
            "js_divergence",
        )
    )


#: q213 step encoding base: step = n_risk * KM_ENC + d_events, so the
#: recurrence can ride a BIGINT-typed list fold in both engines
KM_ENC = 100000000


@register(
    "q213_kaplan_meier",
    oracle=f"""
        WITH oe AS (
            SELECT MAX(CAST(ts AS DATE)) AS oe FROM events
        ),
        u AS (
            SELECT user_id, MIN(CAST(ts AS DATE)) AS f,
                   MIN(CASE WHEN event_type = 'purchase'
                       THEN CAST(ts AS DATE) END) AS fp
            FROM events GROUP BY user_id
        ),
        u2 AS (
            SELECT CASE WHEN fp IS NOT NULL
                        THEN CAST(fp - f AS BIGINT)
                        ELSE CAST((SELECT oe FROM oe) - f AS BIGINT)
                   END AS t,
                   CASE WHEN fp IS NOT NULL THEN 1 ELSE 0 END AS ev
            FROM u
        ),
        tot AS (SELECT COUNT(*) AS n FROM u2),
        pts AS (
            SELECT t, SUM(ev) AS d, COUNT(*) AS c_all
            FROM u2 GROUP BY t
        ),
        pts2 AS (
            SELECT t, d,
                   n - COALESCE(SUM(c_all) OVER (ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS r
            FROM pts CROSS JOIN tot
        ),
        steps AS (
            SELECT list(struct_pack(t := t, r := r, d := d)
                        ORDER BY t) AS arr
            FROM pts2 WHERE d > 0
        ),
        curve AS (
            SELECT unnest(generate_series(1, len(arr))) AS i, arr
            FROM steps
        )
        SELECT CAST((arr[i]).t AS BIGINT) AS t,
               CAST((arr[i]).r AS BIGINT) AS n_risk,
               CAST((arr[i]).d AS BIGINT) AS d_events,
               CAST(list_reduce(
                   list_prepend(CAST(1000000 AS BIGINT),
                       list_transform(list_slice(arr, 1, i),
                           x -> CAST(x.r * {KM_ENC} + x.d
                                     AS BIGINT))),
                   (a, b) -> a * ((b // {KM_ENC}) - (b % {KM_ENC}))
                             // (b // {KM_ENC})) AS BIGINT)
                   AS surv_ppm
        FROM curve ORDER BY t
    """,
    doc="Kaplan-Meier curve for time-to-first-purchase per user, "
    "right-censored at the observation window's end for users who "
    "never converted — the estimator that makes conversion-latency "
    "claims honest when the window cuts users off (q167's latency "
    "distribution silently drops non-converters; KM keeps them in "
    "the denominator until censored). Survival is the product "
    "S(t) = prod(1 - d_i/n_i), which no engine exposes as an "
    "aggregate — computed here as an exact INTEGER recurrence "
    "S_i = S_(i-1) * (n_i - d_i) DIV n_i from 1e6, folded over the "
    "(time, at-risk, deaths) step list per output row (Spark "
    "aggregate() over slice(); DuckDB list_reduce over an encoded "
    "BIGINT list) — deterministic floor at each step, zero "
    "float products, zero exp/ln. Shape: one user-grain agg is the "
    "only corpus-sized work; the step table is day-grain and the "
    "O(T^2) slice-folds are over tens of rows.",
)
def q213(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = table(spark, sf, "events")
    oe = ev.agg(F.max(F.to_date("ts")).alias("oe"))
    u = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("f"),
        F.min(
            F.when(
                F.col("event_type") == "purchase", F.to_date("ts")
            )
        ).alias("fp"),
    )
    u2 = u.crossJoin(F.broadcast(oe)).select(
        F.when(
            F.col("fp").isNotNull(), F.datediff("fp", "f")
        )
        .otherwise(F.datediff("oe", "f"))
        .cast("bigint").alias("t"),
        F.when(F.col("fp").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    tot = u2.agg(F.count(F.lit(1)).alias("n"))
    pts = u2.groupBy("t").agg(
        F.sum("ev").alias("d"), F.count(F.lit(1)).alias("c_all")
    )
    w = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    pts2 = (
        pts.crossJoin(F.broadcast(tot))
        .select(
            "t",
            "d",
            (
                F.col("n")
                - F.coalesce(F.sum("c_all").over(w), F.lit(0))
            ).alias("r"),
        )
    )
    steps = pts2.filter(F.col("d") > 0).agg(
        F.sort_array(
            F.collect_list(F.struct("t", "r", "d"))
        ).alias("arr")
    )
    return (
        steps.select(
            F.col("arr"),
            F.posexplode("arr").alias("i", "s"),
        )
        .select(
            F.col("s.t").cast("bigint").alias("t"),
            F.col("s.r").cast("bigint").alias("n_risk"),
            F.col("s.d").cast("bigint").alias("d_events"),
            F.expr(
                "CAST(aggregate(slice(arr, 1, i + 1), "
                "CAST(1000000 AS BIGINT), "
                "(acc, x) -> (acc * (x.r - x.d)) DIV x.r) "
                "AS BIGINT)"
            ).alias("surv_ppm"),
        )
        .orderBy("t")
    )


# --------------------------------------------------------------------
# Training-prep table builders (round 6, batch 5): the negative-
# sampling distribution, the normalization tier under exact dedup,
# posting lists, and tokenizer fertility — artifacts a training
# pipeline materializes from the corpus rather than questions it
# asks of it.
# --------------------------------------------------------------------

#: q214: how many top-frequency tokens the sampling table reports
NEGSAMP_TOPK = 50


@register(
    "q214_negative_sampling",
    oracle=f"""
        WITH toks AS (
            SELECT t.tok
            FROM documents,
                 LATERAL (
                    SELECT unnest(string_split(COALESCE(text, ''), ' '))
                        AS tok
                 ) t
            WHERE t.tok <> ''
        ),
        c AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
        w AS (
            SELECT tok, c,
                   sqrt(CAST(c AS DOUBLE)
                        * sqrt(CAST(c AS DOUBLE))) AS w
            FROM c
        ),
        t AS (
            SELECT CAST(SUM(CAST(w AS DECIMAL(28,12))) AS DOUBLE)
                       AS tw,
                   SUM(c) AS n
            FROM w
        )
        SELECT tok, CAST(c AS BIGINT) AS c,
               CAST(FLOOR(w / t.tw * 1000000) AS BIGINT)
                   AS sample_ppm,
               CAST(c * 1000000 // t.n AS BIGINT) AS uniform_ppm
        FROM w CROSS JOIN t
        ORDER BY c DESC, tok
        LIMIT {NEGSAMP_TOPK}
    """,
    doc="Negative-sampling table (the word2vec unigram^0.75 "
    "distribution): per token, its smoothed sampling probability "
    "next to its raw frequency — the table a contrastive/skip-gram "
    "trainer draws negatives from, with the 3/4 power that damps "
    "head tokens and lifts the tail. Engine-stable exponent: "
    "c^0.75 is computed as sqrt(c * sqrt(c)) — IEEE 754 requires "
    "sqrt to be correctly rounded (pow is NOT), so both engines "
    "produce bit-identical weights; the normalizer accumulates in "
    "DECIMAL(28,12) (shuffle-order-proof) and probabilities are "
    "floored to ppm. Shape: one token agg, a broadcast scalar, "
    f"TakeOrdered top-{NEGSAMP_TOPK}; at corpus scale the full "
    "table would be written out partitioned by token bucket "
    "instead of top-k'd.",
)
def q214(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents").select("text")
    toks = docs.select(
        F.explode(
            F.split(F.coalesce(F.col("text"), F.lit("")), " ")
        ).alias("tok")
    ).filter(F.col("tok") != "")
    c = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    w = c.withColumn(
        "w",
        F.sqrt(
            F.col("c").cast("double")
            * F.sqrt(F.col("c").cast("double"))
        ),
    )
    t = w.agg(
        F.sum(F.col("w").cast("decimal(28,12)")).cast("double")
        .alias("tw"),
        F.sum("c").alias("n"),
    )
    return (
        w.crossJoin(F.broadcast(t))
        .select(
            "tok",
            F.col("c").cast("bigint").alias("c"),
            F.floor(F.col("w") / F.col("tw") * 1000000)
            .cast("bigint").alias("sample_ppm"),
            F.expr("CAST(c * 1000000 DIV n AS BIGINT)")
            .alias("uniform_ppm"),
        )
        .orderBy(F.col("c").desc(), "tok")
        .limit(NEGSAMP_TOPK)
    )


@register(
    "q215_normalized_dedup",
    oracle="""
        WITH n AS (
            SELECT source,
                   md5(COALESCE(text, '')) AS raw_fp,
                   md5(trim(regexp_replace(regexp_replace(
                       lower(COALESCE(text, '')),
                       '[^a-z0-9 ]', '', 'g'),
                       ' +', ' ', 'g'))) AS norm_fp
            FROM documents
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(*) - COUNT(DISTINCT raw_fp) AS BIGINT)
                   AS raw_dupes,
               CAST(COUNT(*) - COUNT(DISTINCT norm_fp) AS BIGINT)
                   AS norm_dupes,
               CAST(COUNT(DISTINCT raw_fp)
                    - COUNT(DISTINCT norm_fp) AS BIGINT)
                   AS extra_from_norm
        FROM n GROUP BY source ORDER BY source
    """,
    doc="The normalization tier under exact dedup: lowercase, strip "
    "non-alphanumerics, collapse whitespace — the canonical form "
    "that catches near-identical docs exact md5 dedup (q45) misses "
    "(case flips, punctuation-only edits, whitespace reflow: the "
    "most common crawl-duplicate classes BEFORE real near-dup "
    "models are needed). Per source: raw-fingerprint dupes vs "
    "normalized-fingerprint dupes and the extra yield from "
    "normalizing. Normalization is pure scan-time string "
    "expressions (both engines replace-all with character-class "
    "regexes that mean the same thing in Java regex and RE2); the "
    "count-distincts are per-source two-level aggs — one shuffle "
    "each at 100 TB, keyed on fingerprints that cannot be skewed "
    "(md5).",
)
def q215(spark: SparkSession, sf: str) -> DataFrame:
    txt = F.coalesce(F.col("text"), F.lit(""))
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(txt), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    n = table(spark, sf, "documents").select(
        "source",
        F.md5(txt).alias("raw_fp"),
        F.md5(norm).alias("norm_fp"),
    )
    return (
        n.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            (F.count(F.lit(1)) - F.countDistinct("raw_fp"))
            .cast("bigint").alias("raw_dupes"),
            (F.count(F.lit(1)) - F.countDistinct("norm_fp"))
            .cast("bigint").alias("norm_dupes"),
            (F.countDistinct("raw_fp") - F.countDistinct("norm_fp"))
            .cast("bigint").alias("extra_from_norm"),
        )
        .orderBy("source")
    )


#: q216 posting-list caps: report the top-INDEX_TOPK tokens by doc
#: frequency, each with its first INDEX_POSTINGS doc ids
INDEX_TOPK = 20
INDEX_POSTINGS = 8


@register(
    "q216_inverted_index",
    oracle=f"""
        WITH pairs AS (
            SELECT DISTINCT doc_id, t.tok
            FROM documents,
                 LATERAL (
                    SELECT unnest(string_split(COALESCE(text, ''), ' '))
                        AS tok
                 ) t
            WHERE t.tok <> ''
        ),
        ranked AS (
            SELECT tok, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY tok
                       ORDER BY doc_id) AS rn,
                   COUNT(*) OVER (PARTITION BY tok) AS df
            FROM pairs
        )
        SELECT tok, CAST(df AS BIGINT) AS df,
               array_to_string(list(CAST(doc_id AS VARCHAR)
                   ORDER BY doc_id), ',') AS postings
        FROM ranked
        WHERE rn <= {INDEX_POSTINGS}
        GROUP BY tok, df
        ORDER BY df DESC, tok
        LIMIT {INDEX_TOPK}
    """,
    doc="Inverted-index construction (the retrieval-side twin of "
    "q201's BM25 scoring): per token, document frequency and the "
    f"head of its sorted posting list (first {INDEX_POSTINGS} doc "
    f"ids, comma-joined), reported for the top-{INDEX_TOPK} tokens "
    "by df. The posting-list head comes from a rank filter "
    "DIRECTLY on the per-token window, which Spark's "
    "WindowGroupLimit turns into per-partition partial bottom-k — "
    "a hot token's full posting list is never materialized on one "
    "task (the classic inverted-index skew trap); df rides the "
    "same distinct-pair agg. At 100 TB the full index would write "
    "per-token-bucket partitions; the plan shape (distinct pairs "
    "-> group-limit -> group agg) is unchanged.",
)
def q216(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    docs = table(spark, sf, "documents")
    pairs = (
        docs.select(
            "doc_id",
            F.explode(
                F.split(F.coalesce(F.col("text"), F.lit("")), " ")
            ).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .distinct()
    )
    df_cnt = pairs.groupBy("tok").agg(
        F.count(F.lit(1)).alias("df")
    )
    w = Window.partitionBy("tok").orderBy("doc_id")
    heads = (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= INDEX_POSTINGS)
        .groupBy("tok")
        .agg(
            # sort as BIGINT first, stringify after — a string sort
            # would order "10" before "2"
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings")
        )
    )
    return (
        df_cnt.join(heads, "tok")
        .select(
            "tok", F.col("df").cast("bigint").alias("df"), "postings"
        )
        .orderBy(F.col("df").desc(), "tok")
        .limit(INDEX_TOPK)
    )


#: q217's subword proxy: letter runs, digit runs, or single symbols —
#: the shape a byte-level BPE's pre-tokenizer carves text into
FERTILITY_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


@register(
    "q217_token_fertility",
    oracle=f"""
        WITH d AS (
            SELECT lang, n_chars,
                   len(list_filter(string_split(
                       COALESCE(text, ''), ' '), x -> x <> ''))
                       AS ws_toks,
                   len(regexp_extract_all(COALESCE(text, ''),
                       '{FERTILITY_RE}')) AS sub_toks
            FROM documents
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS chars,
               CAST(SUM(ws_toks) AS BIGINT) AS ws_tokens,
               CAST(SUM(sub_toks) AS BIGINT) AS subword_tokens,
               CAST(SUM(n_chars) * 1000000
                    // greatest(SUM(sub_toks), 1) AS BIGINT)
                   AS chars_per_subword_ppm,
               CAST(SUM(sub_toks) * 1000000
                    // greatest(SUM(ws_toks), 1) AS BIGINT)
                   AS fertility_ppm
        FROM d GROUP BY lang ORDER BY lang
    """,
    doc="Tokenizer fertility per language: characters per subword "
    "token and subword tokens per whitespace word — the numbers "
    "that decide how many TRAINING tokens a corpus is actually "
    "worth and which languages a tokenizer punishes (fertility "
    "near 1 = words survive whole; high fertility = heavy "
    "fragmentation, inflated sequence lengths, wasted context "
    "window). Subword proxy: letter runs / digit runs / single "
    "symbols via one regexp_extract_all whose character-class "
    "pattern means the same thing in Java regex and RE2. Entirely "
    "map-side per-row counts + one lang-grain agg; ratios are "
    "exact integer ppm. At 100 TB this is a single scan.",
)
def q217(spark: SparkSession, sf: str) -> DataFrame:
    txt = F.coalesce(F.col("text"), F.lit(""))
    d = table(spark, sf, "documents").select(
        "lang",
        "n_chars",
        F.size(
            F.filter(F.split(txt, " "), lambda x: x != "")
        ).alias("ws_toks"),
        F.size(
            F.expr(
                f"regexp_extract_all(COALESCE(text, ''), "
                f"'{FERTILITY_RE}', 0)"
            )
        ).alias("sub_toks"),
    )
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("chars"),
            F.sum("ws_toks").cast("bigint").alias("ws_tokens"),
            F.sum("sub_toks").cast("bigint")
            .alias("subword_tokens"),
            # DECIMAL + pmod-identity exact quotient (q198 pattern):
            # SUM(n_chars)*1e6 overflows LONG at ~9 TB of text per
            # language; the oracle's HUGEINT // is already exact
            F.expr(
                "CAST((CAST(SUM(n_chars) AS DECIMAL(38,0)) * 1000000"
                " - pmod(CAST(SUM(n_chars) AS DECIMAL(38,0)) *"
                " 1000000, greatest(SUM(sub_toks), 1)))"
                " / greatest(SUM(sub_toks), 1) AS BIGINT)"
            ).alias("chars_per_subword_ppm"),
            F.expr(
                "CAST((CAST(SUM(sub_toks) AS DECIMAL(38,0)) * 1000000"
                " - pmod(CAST(SUM(sub_toks) AS DECIMAL(38,0)) *"
                " 1000000, greatest(SUM(ws_toks), 1)))"
                " / greatest(SUM(ws_toks), 1) AS BIGINT)"
            ).alias("fertility_ppm"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------
# Warehouse-side lifecycle analytics (round 6, batch 6): cohort LTV,
# point-in-time state attribution over an SCD2 change stream, and the
# referential-integrity audit — the downstream consumers a CDC
# replica (the reference's whole purpose) feeds.
# --------------------------------------------------------------------


@register(
    "q218_cohort_ltv",
    oracle="""
        WITH o AS (
            SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
                   o_totalprice
            FROM orders
        ),
        first AS (
            SELECT o_custkey,
                   year(MIN(d)) * 12 + (month(MIN(d)) - 1) AS ym
            FROM o GROUP BY o_custkey
        ),
        csize AS (
            SELECT ym, COUNT(*) AS cohort_size FROM first GROUP BY ym
        ),
        g AS (
            SELECT f.ym,
                   (year(o.d) * 12 + (month(o.d) - 1)) - f.ym
                       AS month_offset,
                   COUNT(*) AS n_orders,
                   COUNT(DISTINCT o.o_custkey) AS n_active,
                   SUM(CAST(o.o_totalprice AS DECIMAL(28,6))) AS rev,
                   CAST(SUM(FLOOR(CAST(o.o_totalprice
                        AS DECIMAL(28,6)))) AS BIGINT) AS rev_u
            FROM o JOIN first f ON o.o_custkey = f.o_custkey
            GROUP BY f.ym, month_offset
        )
        SELECT make_date(g.ym // 12, g.ym % 12 + 1, 1)
                   AS cohort_month,
               CAST(g.month_offset AS BIGINT) AS month_offset,
               CAST(g.n_orders AS BIGINT) AS n_orders,
               CAST(g.n_active AS BIGINT) AS n_active,
               CAST(ROUND(g.rev, 2) AS DOUBLE) AS rev,
               CAST(SUM(g.rev_u) OVER (PARTITION BY g.ym
                        ORDER BY g.month_offset
                        ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW)
                    // c.cohort_size AS BIGINT)
                   AS cum_ltv_per_cust_u
        FROM g JOIN csize c ON g.ym = c.ym
        ORDER BY cohort_month, month_offset
    """,
    doc="Cohort lifetime value: customers grouped by first-order "
    "month, revenue tracked per month offset since acquisition, "
    "plus cumulative LTV per cohort member — the retention-economics "
    "view a subscriber materializes from a CDC order stream. Month "
    "arithmetic is pure integers (year*12 + month-1: no "
    "months_between float, no calendar-diff engine drift); revenue "
    "follows the q184 unit contract — DECIMAL(28,6) sums with "
    "round->double display, whole-dollar FLOOR units for the "
    "integer DIV per-customer LTV (dollar grain survives SF 1000 "
    "where cents overflow). Shape: a customer-grain min-agg joined "
    "back on the same key (one shuffle partitioning reused), then "
    "everything is (cohort x offset) grain incl. the running-sum "
    "window.",
)
def q218(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    o = table(spark, sf, "orders").select(
        "o_custkey",
        F.to_date("o_orderdate").alias("d"),
        "o_totalprice",
    )
    ym = lambda c: F.year(c) * 12 + (F.month(c) - 1)  # noqa: E731
    first = o.groupBy("o_custkey").agg(
        ym(F.min("d")).alias("ym")
    )
    csize = first.groupBy("ym").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    g = (
        o.join(first, "o_custkey")
        .withColumn("month_offset", ym(F.col("d")) - F.col("ym"))
        .groupBy("ym", "month_offset")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.countDistinct("o_custkey").cast("bigint")
            .alias("n_active"),
            F.sum(
                F.col("o_totalprice").cast("decimal(28,6)")
            ).alias("rev"),
            F.sum(
                F.floor(F.col("o_totalprice").cast("decimal(28,6)"))
            ).cast("bigint").alias("rev_u"),
        )
    )
    w = (
        Window.partitionBy("ym")
        .orderBy("month_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        g.join(F.broadcast(csize), "ym")
        .select(
            F.make_date(
                F.expr("ym DIV 12"), F.col("ym") % 12 + 1, F.lit(1)
            ).alias("cohort_month"),
            F.col("month_offset").cast("bigint")
            .alias("month_offset"),
            "n_orders",
            "n_active",
            F.round(F.col("rev"), 2).cast("double").alias("rev"),
            F.expr(
                "CAST(SUM(rev_u) OVER (PARTITION BY ym "
                "ORDER BY month_offset ROWS BETWEEN UNBOUNDED "
                "PRECEDING AND CURRENT ROW) DIV cohort_size "
                "AS BIGINT)"
            ).alias("cum_ltv_per_cust_u"),
        )
        .orderBy("cohort_month", "month_offset")
    )


@register(
    "q219_state_at_purchase",
    oracle="""
        WITH u AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN event_type = 'purchase' THEN NULL
                        ELSE event_type END AS state_ev,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                        END AS is_fact
            FROM events
            ),
        f AS (
            SELECT user_id, is_fact,
                   last_value(state_ev IGNORE NULLS) OVER (
                       PARTITION BY user_id
                       ORDER BY ts, is_fact, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS state
            FROM u
        )
        SELECT COALESCE(state, 'none') AS state_at_purchase,
               CAST(COUNT(*) AS BIGINT) AS n_purchases,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM f WHERE is_fact = 1
        GROUP BY state_at_purchase
        ORDER BY state_at_purchase
    """,
    doc="Point-in-time state attribution over an SCD2 change stream: "
    "for every purchase, the user's last non-purchase event type "
    "strictly before it (ties at the same timestamp resolve "
    "change-before-fact, then event_id) — 'what state converts', "
    "the question an SCD2 dimension (q153) exists to answer. "
    "Executed as the JOIN-FREE merge form of the as-of join "
    "(operators/asof.py, J7): facts and changes union into one "
    "stream, one user-partitioned window carries the last "
    "non-null state forward — a single shuffle on the entity key, "
    "no range join, no per-fact probe. Purchases before any state "
    "change attribute to 'none' (the LEFT semantic). At 100 TB "
    "this scales with per-user history like any SCD2 build.",
)
def q219(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = table(spark, sf, "events")
    u = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.col("event_type") == "purchase", F.lit(None)
        ).otherwise(F.col("event_type")).alias("state_ev"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        .alias("is_fact"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_fact", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    f = u.select(
        "user_id",
        "is_fact",
        F.last("state_ev", ignorenulls=True).over(w).alias("state"),
    )
    return (
        f.filter(F.col("is_fact") == 1)
        .groupBy(
            F.coalesce(F.col("state"), F.lit("none"))
            .alias("state_at_purchase")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.countDistinct("user_id").cast("bigint")
            .alias("n_users"),
        )
        .orderBy("state_at_purchase")
    )


@register(
    "q220_referential_integrity",
    oracle="""
        WITH cnts AS (
            SELECT l_orderkey, COUNT(*) AS c
            FROM lineitem GROUP BY l_orderkey
        ),
        per_order AS (
            SELECT o.o_orderkey, COALESCE(c.c, 0) AS l_cnt
            FROM orders o LEFT JOIN cnts c
                 ON o.o_orderkey = c.l_orderkey
        ),
        hist AS (
            SELECT l_cnt, COUNT(*) AS n_orders
            FROM per_order GROUP BY l_cnt
        ),
        orphans AS (
            SELECT CAST(-1 AS BIGINT) AS l_cnt, COUNT(*) AS n_orders
            FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)
        )
        SELECT CAST(l_cnt AS BIGINT) AS l_cnt,
               CAST(n_orders AS BIGINT) AS n
        FROM (SELECT * FROM hist UNION ALL
              SELECT * FROM orphans WHERE n_orders > 0)
        ORDER BY l_cnt
    """,
    doc="Referential-integrity audit between a fact table and its "
    "parent — the first report run against any CDC-replicated pair "
    "(a replica that dropped deletes or reordered applies shows up "
    "HERE before any aggregate drifts): the per-order lineitem-count "
    "histogram with childless orders surfacing as l_cnt = 0 (LEFT "
    "join + coalesce, not an inner join that would hide them) and "
    "parentless lineitems as the l_cnt = -1 row (anti-join count, "
    "emitted only when non-zero so a clean pair has a clean "
    "report). Both probes shuffle once on the same join key; the "
    "histogram is count-grain. The fixture pair is intentionally "
    "dirty (~250 childless orders at sf0.01), so the gate is "
    "non-vacuous by construction.",
)
def q220(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    orders = table(spark, sf, "orders")
    cnts = li.groupBy(F.col("l_orderkey")).agg(
        F.count(F.lit(1)).alias("c")
    )
    per_order = (
        orders.select("o_orderkey")
        .join(cnts, orders.o_orderkey == cnts.l_orderkey, "left")
        .select(F.coalesce(F.col("c"), F.lit(0)).alias("l_cnt"))
    )
    hist = per_order.groupBy("l_cnt").agg(
        F.count(F.lit(1)).alias("n")
    )
    orphans = (
        li.join(
            orders.select("o_orderkey"),
            li.l_orderkey == orders.o_orderkey,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit(-1).cast("long").alias("l_cnt"), "n")
        .filter(F.col("n") > 0)
    )
    return (
        hist.unionByName(orphans)
        .select(
            F.col("l_cnt").cast("bigint").alias("l_cnt"),
            F.col("n").cast("bigint").alias("n"),
        )
        .orderBy("l_cnt")
    )


# --------------------------------------------------------------------
# Experiment-analysis + marketing-attribution layer (round 6,
# batch 7): the pairwise Welch test an A/B platform runs over a CDC
# replica, score-decile lift for a quality classifier, last-touch
# revenue attribution over the event stream, and Q-Q quantile pairs
# for distribution comparison.
# --------------------------------------------------------------------

#: Welch t-test arithmetic, shared verbatim by the Spark projection
#: and the DuckDB oracle so both engines evaluate the IDENTICAL IEEE
#: scalar expression over identical exact integer moments (n, sum,
#: sumsq) — same ops in the same order => bit-identical doubles =>
#: floor-scaled outputs hash-match. Variance is the textbook
#: (sumsq - sum^2/n) / (n-1) on doubles derived from exact BIGINT /
#: DECIMAL(38,0) sums (n_chars is integer, so the moments are exact).
#: per-side "variance / n" building block (clamped at 0 so FP
#: cancellation can't go negative; the n-1 divisor is why the query
#: filters pairs to n >= 2 — see the degenerate-input guard below)
_W_VA = "(greatest(sumsq_a - sum_a * sum_a / n_a, 0) / (n_a - 1)) / n_a"
_W_VB = "(greatest(sumsq_b - sum_b * sum_b / n_b, 0) / (n_b - 1)) / n_b"

_WELCH_EXPRS = {
    "mean_a_e3": "CAST(FLOOR(sum_a / n_a * 1000) AS BIGINT)",
    "mean_b_e3": "CAST(FLOOR(sum_b / n_b * 1000) AS BIGINT)",
    # zero pooled variance (both sides constant) => t/df defined as 0
    # rather than a NaN/Inf that neither engine can cast to BIGINT
    "t_e6": (
        f"CAST(CASE WHEN {_W_VA} + {_W_VB} = 0 THEN 0 ELSE "
        f"FLOOR((sum_a / n_a - sum_b / n_b) / "
        f"sqrt({_W_VA} + {_W_VB}) * 1000000) END AS BIGINT)"
    ),
    "df_e3": (
        f"CAST(CASE WHEN {_W_VA} + {_W_VB} = 0 THEN 0 ELSE "
        f"FLOOR(power({_W_VA} + {_W_VB}, 2) / "
        f"(power({_W_VA}, 2) / (n_a - 1) + "
        f"power({_W_VB}, 2) / (n_b - 1)) * 1000) END AS BIGINT)"
    ),
}


@register(
    "q221_welch_ttest",
    oracle=f"""
        WITH m AS (
            SELECT source,
                   CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(n_chars) AS DOUBLE) AS s,
                   CAST(SUM(CAST(n_chars AS DECIMAL(38,0))
                            * n_chars) AS DOUBLE) AS sq
            FROM documents GROUP BY source
        ),
        p AS (
            SELECT a.source AS source_a, b.source AS source_b,
                   a.n AS n_a, a.s AS sum_a, a.sq AS sumsq_a,
                   b.n AS n_b, b.s AS sum_b, b.sq AS sumsq_b
            FROM m a JOIN m b ON a.source < b.source
            WHERE a.n >= 2 AND b.n >= 2
        )
        SELECT source_a, source_b,
               CAST(n_a AS BIGINT) AS n_a,
               CAST(n_b AS BIGINT) AS n_b,
               {_WELCH_EXPRS['mean_a_e3']} AS mean_a_e3,
               {_WELCH_EXPRS['mean_b_e3']} AS mean_b_e3,
               {_WELCH_EXPRS['t_e6']} AS t_e6,
               {_WELCH_EXPRS['df_e3']} AS df_e3
        FROM p ORDER BY source_a, source_b
    """,
    doc="Pairwise Welch t-test matrix: every source pair's unequal-"
    "variance t statistic and Welch-Satterthwaite df over document "
    "length — the test an experimentation platform runs when 'did "
    "source X start shipping longer documents than Y'. Engine "
    "stability: the group moments (n, sum, sum-of-squares) are EXACT "
    "integers (DECIMAL(38,0) for the squares), and the t/df "
    "arithmetic is one shared scalar-expression string evaluated by "
    "both engines over those identical doubles — floor-scaled e6/e3 "
    "outputs. Shape: one source-grain agg (20 rows) then a tiny "
    "driver-size pair self-join; at 100 TB the agg is the only scan "
    "and the K^2 pair frame stays broadcast-trivial for any "
    "realistic source count.",
)
def q221(spark: SparkSession, sf: str) -> DataFrame:
    m = (
        table(spark, sf, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("n_chars").cast("double").alias("s"),
            F.expr(
                "CAST(SUM(CAST(n_chars AS DECIMAL(38,0)) * n_chars) "
                "AS DOUBLE)"
            ).alias("sq"),
        )
    )
    a = m.select(
        F.col("source").alias("source_a"),
        F.col("n").alias("n_a"),
        F.col("s").alias("sum_a"),
        F.col("sq").alias("sumsq_a"),
    )
    b = m.select(
        F.col("source").alias("source_b"),
        F.col("n").alias("n_b"),
        F.col("s").alias("sum_b"),
        F.col("sq").alias("sumsq_b"),
    )
    p = a.join(
        F.broadcast(b), F.col("source_a") < F.col("source_b")
    ).filter((F.col("n_a") >= 2) & (F.col("n_b") >= 2))
    return p.select(
        "source_a",
        "source_b",
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.expr(_WELCH_EXPRS["mean_a_e3"]).alias("mean_a_e3"),
        F.expr(_WELCH_EXPRS["mean_b_e3"]).alias("mean_b_e3"),
        F.expr(_WELCH_EXPRS["t_e6"]).alias("t_e6"),
        F.expr(_WELCH_EXPRS["df_e3"]).alias("df_e3"),
    ).orderBy("source_a", "source_b")


@register(
    "q222_decile_lift",
    oracle="""
        WITH r AS (
            SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS pos,
                   NTILE(10) OVER (ORDER BY value, event_id) AS decile
            FROM events
        ),
        d AS (
            SELECT decile, COUNT(*) AS n, SUM(pos) AS n_pos
            FROM r GROUP BY decile
        ),
        t AS (SELECT SUM(n) AS tn, SUM(n_pos) AS tpos FROM d)
        SELECT CAST(decile AS BIGINT) AS decile,
               CAST(n AS BIGINT) AS n,
               CAST(n_pos AS BIGINT) AS n_pos,
               CAST(n_pos * 1000000 // greatest(n, 1) AS BIGINT)
                   AS rate_ppm,
               CAST(SUM(n_pos) OVER (ORDER BY decile DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) * 1000000
                    // greatest(SUM(n) OVER (ORDER BY decile DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW), 1) AS BIGINT)
                   AS cum_rate_top_ppm,
               CAST(SUM(n_pos) OVER (ORDER BY decile DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) * t.tn * 1000
                    // greatest(SUM(n) OVER (ORDER BY decile DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) * t.tpos, 1) AS BIGINT)
                   AS lift_e3
        FROM d CROSS JOIN t
        ORDER BY decile
    """,
    doc="Score-decile lift/gains table: events ranked into value "
    "deciles, per-decile positive ('purchase') rate, plus the "
    "cumulative capture rate and lift scanning from the TOP decile "
    "down — the chart that decides whether a quality-classifier "
    "score is worth filtering a corpus by. Decile assignment uses "
    "the banded exact ntile (operators/rankband.py, one window row "
    "per value bin — never a data-grain global sort; the oracle's "
    "plain NTILE is the spec); the cumulative windows then run over "
    "exactly 10 rows. Ratios are integer ppm / e3 division. At "
    "100 TB the only data-grain work is the bin aggregate.",
)
def q222(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    from speculare_pgcdc_spark.operators.rankband import banded_ntile

    ev = table(spark, sf, "events").select(
        "event_id",
        "value",
        (F.col("event_type") == "purchase").cast("int").alias("pos"),
    )
    ranked = banded_ntile(
        ev,
        order_cols=["value", "event_id"],
        bin_col=F.floor(F.col("value") / 10).cast("bigint"),
        k=10,
        out="decile",
    )
    d = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("pos").alias("n_pos")
    )
    t = d.agg(
        F.sum("n").alias("tn"), F.sum("n_pos").alias("tpos")
    )
    w = Window.orderBy(F.col("decile").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        d.crossJoin(F.broadcast(t))
        .withColumn("cn", F.sum("n").over(w))
        .withColumn("cp", F.sum("n_pos").over(w))
        .select(
            F.col("decile").cast("bigint").alias("decile"),
            F.col("n").cast("bigint").alias("n"),
            F.col("n_pos").cast("bigint").alias("n_pos"),
            F.expr("n_pos * 1000000 DIV greatest(n, 1)")
            .cast("bigint").alias("rate_ppm"),
            F.expr("cp * 1000000 DIV greatest(cn, 1)")
            .cast("bigint").alias("cum_rate_top_ppm"),
            # DECIMAL + pmod-identity exact quotient: the triple
            # product cp*tn*1000 overflows LONG at ~3e8 events (the
            # oracle's window SUMs are HUGEINT, already exact)
            F.expr(
                "CAST((CAST(cp AS DECIMAL(38,0)) * tn * 1000"
                " - pmod(CAST(cp AS DECIMAL(38,0)) * tn * 1000,"
                " greatest(CAST(cn AS DECIMAL(38,0)) * tpos, 1)))"
                " / greatest(CAST(cn AS DECIMAL(38,0)) * tpos, 1)"
                " AS BIGINT)"
            ).alias("lift_e3"),
        )
        .orderBy("decile")
    )


@register(
    "q223_last_touch_attribution",
    oracle="""
        WITH e AS (
            SELECT user_id, ts, event_id, value,
                   event_type = 'purchase' AS is_purchase,
                   LAST_VALUE(CASE WHEN event_type <> 'purchase'
                                   THEN event_type END IGNORE NULLS)
                       OVER (PARTITION BY user_id
                             ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS touch
            FROM events
        )
        SELECT COALESCE(touch, 'none') AS touch,
               CAST(COUNT(*) AS BIGINT) AS n_purchases,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(28,6))), 2)
                    AS DOUBLE) AS attributed_rev
        FROM e WHERE is_purchase
        GROUP BY COALESCE(touch, 'none') ORDER BY touch
    """,
    doc="Last-touch revenue attribution: each purchase's value is "
    "credited to the user's most recent preceding non-purchase "
    "event type ('none' when the purchase is the user's first "
    "event) — the marketing-analytics consumer of a CDC event "
    "replica. One user-grain running last_value(IGNORE NULLS) "
    "window (user cardinality partitions — embarrassingly parallel "
    "at any scale, never a global sort; ties totalized by "
    "event_id), then a touch-grain agg. Revenue follows the money "
    "convention: DECIMAL(28,6) accumulation, round->double on "
    "output only.",
)
def q223(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    e = table(spark, sf, "events").select(
        "user_id",
        "ts",
        "event_id",
        "value",
        (F.col("event_type") == "purchase").alias("is_purchase"),
        F.last(
            F.when(
                F.col("event_type") != "purchase", F.col("event_type")
            ),
            ignorenulls=True,
        ).over(w).alias("touch"),
    )
    return (
        e.filter("is_purchase")
        .groupBy(F.coalesce("touch", F.lit("none")).alias("touch"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.round(
                F.sum(F.col("value").cast("decimal(28,6)")), 2
            ).cast("double").alias("attributed_rev"),
        )
        .orderBy("touch")
    )


#: Q-Q probe points: 5%..95% in 5% steps (endpoints excluded — min
#: and max are covered by q116's stats aggregates)
QQ_STEPS = [round(0.05 * i, 2) for i in range(1, 20)]


@register(
    "q224_qq_quantiles",
    oracle=f"""
        WITH qa AS (
            SELECT unnest(quantile_cont(n_chars,
                       {QQ_STEPS})) AS qv,
                   generate_subscripts(quantile_cont(n_chars,
                       {QQ_STEPS}), 1) AS i
            FROM documents WHERE lang = 'en'
        ),
        qb AS (
            SELECT unnest(quantile_cont(n_chars,
                       {QQ_STEPS})) AS qv,
                   generate_subscripts(quantile_cont(n_chars,
                       {QQ_STEPS}), 1) AS i
            FROM documents WHERE lang <> 'en'
        )
        SELECT CAST(ROUND(0.05 * qa.i, 2) AS DOUBLE) AS p,
               CAST(FLOOR(qa.qv * 10000) AS BIGINT) AS q_en_e4,
               CAST(FLOOR(qb.qv * 10000) AS BIGINT) AS q_rest_e4,
               CAST(FLOOR((qa.qv - qb.qv) * 10000) AS BIGINT)
                   AS gap_e4
        FROM qa JOIN qb ON qa.i = qb.i
        ORDER BY p
    """,
    doc="Q-Q quantile pairs: exact interpolated quantiles of document "
    "length for lang='en' vs the rest, side by side at 19 probe "
    "points — the distribution-shift diagnostic behind a Q-Q plot "
    "(q210's KS statistic says IF the distributions differ; this "
    "says WHERE). Spark percentile(col, array) == DuckDB "
    "quantile_cont(col, list), both linear interpolation (the q63 "
    "precedent), emitted floor-e4 per the stability convention. "
    "Shape: two single-group percentile aggs (exact buffers — the "
    "oracle form; approx_percentile is the same call shape at "
    "corpus scale) + a 19-row zip.",
)
def q224(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    steps = ", ".join(str(s) for s in QQ_STEPS)
    qa = (
        docs.filter(F.col("lang") == "en")
        .agg(F.expr(f"percentile(n_chars, array({steps}))").alias("q"))
        .select(F.posexplode("q").alias("i0", "qa"))
    )
    qb = (
        docs.filter(F.col("lang") != "en")
        .agg(F.expr(f"percentile(n_chars, array({steps}))").alias("q"))
        .select(F.posexplode("q").alias("i0", "qb"))
    )
    return (
        qa.join(qb, "i0")
        .select(
            F.round((F.col("i0") + 1) * 0.05, 2)
            .cast("double").alias("p"),
            F.floor(F.col("qa") * 10000).cast("bigint")
            .alias("q_en_e4"),
            F.floor(F.col("qb") * 10000).cast("bigint")
            .alias("q_rest_e4"),
            F.floor((F.col("qa") - F.col("qb")) * 10000)
            .cast("bigint").alias("gap_e4"),
        )
        .orderBy("p")
    )


# --------------------------------------------------------------------
# Replica-merge + sampling-design + feature-analysis layer (round 6,
# batch 8): last-writer-wins conflict resolution between CDC
# replicas, Neyman sampling allocation, and mutual information.
# --------------------------------------------------------------------


@register(
    "q225_lww_replica_merge",
    oracle="""
        WITH a AS (
            SELECT user_id, ts, event_id, event_type, value
            FROM events WHERE event_id % 3 <> 0
        ),
        b AS (
            SELECT user_id, ts, event_id, event_type, value
            FROM events WHERE event_id % 3 <> 1
        ),
        u AS (
            SELECT * FROM a UNION ALL SELECT * FROM b
        ),
        w AS (
            SELECT user_id, ts, event_id, event_type, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC) AS rn
            FROM u
        )
        SELECT user_id, ts AS won_ts,
               CAST(event_id AS BIGINT) AS won_event_id,
               event_type AS won_type,
               CAST(FLOOR(value * 100) AS BIGINT) AS won_value_e2
        FROM w WHERE rn = 1 ORDER BY user_id
    """,
    doc="Last-writer-wins replica merge: two overlapping CDC replicas "
    "of the same key space (simulated by event_id mod slices — each "
    "drops a third, they share a third) are unioned and resolved to "
    "one winning row per key by (ts, event_id) — the conflict rule a "
    "multi-master CDC deployment applies when the same key was "
    "written on both sides (reference analog: the single-master slot "
    "at src/cdc/replication.rs makes this moot upstream; a consumer "
    "merging two slots needs exactly this). Spark resolves via ONE "
    "hash agg of max(struct(ts, event_id, ...)) — lexicographic "
    "struct comparison with a unique tiebreak column, so no window, "
    "no duplicate-row ambiguity; the oracle states the spec as the "
    "classic ROW_NUMBER()=1 form. A duplicate row appearing in both "
    "replicas is idempotent under max — at-least-once delivery "
    "across replicas cannot corrupt the merge. Per-key agg "
    "partitions by user_id: embarrassingly parallel at any scale.",
)
def q225(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    a = ev.filter(F.col("event_id") % 3 != 0)
    b = ev.filter(F.col("event_id") % 3 != 1)
    u = a.unionByName(b)
    won = u.groupBy("user_id").agg(
        F.max(
            F.struct("ts", "event_id", "event_type", "value")
        ).alias("w")
    )
    return won.select(
        "user_id",
        F.col("w.ts").alias("won_ts"),
        F.col("w.event_id").cast("bigint").alias("won_event_id"),
        F.col("w.event_type").alias("won_type"),
        F.floor(F.col("w.value") * 100).cast("bigint")
        .alias("won_value_e2"),
    ).orderBy("user_id")


#: total sample budget the Neyman allocation distributes
NEYMAN_K = 1000

#: shared Neyman arithmetic: stddev from exact integer moments
#: (n, sum, sumsq as doubles derived from BIGINT/DECIMAL(38,0) sums),
#: one expression string evaluated by both engines. Guards: a
#: singleton stratum has no sample variance (S_h := 0, not a 0/0
#: NaN -> DECIMAL-cast error), and the moment difference is clamped
#: at 0 so FP cancellation can't feed sqrt a tiny negative.
_NEYMAN_NS = (
    "n_h * (CASE WHEN n_h > 1 THEN "
    "sqrt(greatest(sumsq - s * s / n_h, 0) / (n_h - 1)) "
    "ELSE 0 END)"
)


def _neyman_alloc_sql(k: int) -> str:
    """The allocation CTE chain (DuckDB dialect) for a k-row budget,
    ending in `afinal(source, n_h, alloc)` — shared by the q226 and
    q233 oracles so design and execution state identical SQL."""
    return f"""
        m AS (
            SELECT source,
                   CAST(COUNT(*) AS DOUBLE) AS n_h,
                   CAST(SUM(n_chars) AS DOUBLE) AS s,
                   CAST(SUM(CAST(n_chars AS DECIMAL(38,0))
                            * n_chars) AS DOUBLE) AS sumsq
            FROM documents GROUP BY source
        ),
        w AS (
            SELECT source, n_h, {_NEYMAN_NS} AS ns FROM m
        ),
        t AS (SELECT SUM(CAST(ns AS DECIMAL(28,6))) AS tns FROM w),
        alloc AS (
            SELECT source, n_h,
                   CAST(FLOOR(ns * {k}
                        / CAST(t.tns AS DOUBLE)) AS BIGINT)
                       AS base,
                   ns * {k} / CAST(t.tns AS DOUBLE)
                       - FLOOR(ns * {k}
                               / CAST(t.tns AS DOUBLE)) AS rem
            FROM w CROSS JOIN t
        ),
        ranked AS (
            SELECT source, n_h, base,
                   ROW_NUMBER() OVER (ORDER BY rem DESC, source)
                       AS rr,
                   {k} - SUM(base) OVER () AS short
            FROM alloc
        ),
        afinal AS (
            SELECT source, n_h,
                   base + CASE WHEN rr <= short THEN 1 ELSE 0 END
                       AS alloc
            FROM ranked
        )"""


@register(
    "q226_neyman_allocation",
    oracle="WITH" + _neyman_alloc_sql(NEYMAN_K) + """
        SELECT source, CAST(n_h AS BIGINT) AS n_h,
               CAST(alloc AS BIGINT) AS alloc
        FROM afinal ORDER BY source
    """,
    doc=f"Neyman sampling allocation: a {NEYMAN_K}-row audit budget "
    "split across sources proportional to n_h * S_h (stratum size x "
    "stddev) — the design that minimizes the variance of a "
    "stratified estimate, used to size per-source quality-audit "
    "samples. Stddev comes from EXACT integer moments (BIGINT / "
    "DECIMAL(38,0) sums, the q221 contract) through one shared "
    "expression string; fractional seats resolve by largest "
    "remainder (floor + top-remainder bonus, source tiebreak) so "
    "allocations are integers that sum exactly to the budget. All "
    "windows run over the source-grain frame (tens of rows); the "
    "corpus is touched by exactly one scan-agg.",
)
def q226(spark: SparkSession, sf: str) -> DataFrame:
    return _neyman_alloc(spark, sf, NEYMAN_K)


def _neyman_alloc(spark: SparkSession, sf: str, k: int) -> DataFrame:
    """(source, n_h, alloc) Neyman allocation of a k-row budget —
    shared by q226 (the design table) and q233 (its execution)."""
    from pyspark.sql import Window

    m = (
        table(spark, sf, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_h"),
            F.sum("n_chars").cast("double").alias("s"),
            F.expr(
                "CAST(SUM(CAST(n_chars AS DECIMAL(38,0)) * n_chars) "
                "AS DOUBLE)"
            ).alias("sumsq"),
        )
    )
    w = m.select("source", "n_h", F.expr(_NEYMAN_NS).alias("ns"))
    t = w.agg(
        F.sum(F.col("ns").cast("decimal(28,6)")).alias("tns")
    )
    alloc = w.crossJoin(F.broadcast(t)).select(
        "source",
        "n_h",
        F.expr(
            f"CAST(FLOOR(ns * {k} / CAST(tns AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("base"),
        F.expr(
            f"ns * {k} / CAST(tns AS DOUBLE) "
            f"- FLOOR(ns * {k} / CAST(tns AS DOUBLE))"
        ).alias("rem"),
    )
    wr = Window.orderBy(F.col("rem").desc(), "source")
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = alloc.select(
        "source",
        "n_h",
        "base",
        F.row_number().over(wr).alias("rr"),
        (F.lit(k) - F.sum("base").over(wall)).alias("short"),
    )
    return ranked.select(
        "source",
        F.col("n_h").cast("bigint").alias("n_h"),
        (
            F.col("base")
            + F.when(F.col("rr") <= F.col("short"), 1).otherwise(0)
        ).cast("bigint").alias("alloc"),
    ).orderBy("source")


@register(
    "q227_mutual_information",
    oracle="""
        WITH o AS (
            SELECT lang, source, COUNT(*) AS obs
            FROM documents GROUP BY lang, source
        ),
        rt AS (SELECT lang, SUM(obs) AS r FROM o GROUP BY lang),
        ct AS (SELECT source, SUM(obs) AS c FROM o GROUP BY source),
        n AS (SELECT SUM(obs) AS n FROM o)
        SELECT CAST(MAX(n.n) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST(ROUND(CAST(SUM(CAST(
                   (o.obs * 1.0 / n.n)
                   * ln((o.obs * 1.0 * n.n) / (rt.r * 1.0 * ct.c))
                   AS DECIMAL(28,12))) AS DOUBLE), 6) AS DOUBLE)
                   AS mi_nats
        FROM o
        JOIN rt ON o.lang = rt.lang
        JOIN ct ON o.source = ct.source
        CROSS JOIN n
    """,
    doc="Mutual information I(lang; source) in nats — the feature-"
    "association strength behind q211's chi-squared verdict (chi2 "
    "says WHETHER the blend depends on source; MI says HOW MUCH, in "
    "information units comparable across feature pairs — the "
    "feature-selection ranking metric). Zero cells contribute "
    "exactly 0 and are simply absent (unlike chi-squared, MI needs "
    "no zero-cell grid). Probabilities are exact integer ratios so "
    "both engines compute identical term doubles, ln applies to an "
    "exact ratio, and terms accumulate in DECIMAL(28,12) — the "
    "q144 KL contract. One cell-grain agg; marginals re-aggregate "
    "from the cells and broadcast back.",
)
def q227(spark: SparkSession, sf: str) -> DataFrame:
    o = (
        table(spark, sf, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("obs"))
        .localCheckpoint(eager=True)
    )
    rt = o.groupBy("lang").agg(F.sum("obs").alias("r"))
    ct = o.groupBy("source").agg(F.sum("obs").alias("c"))
    n = o.agg(F.sum("obs").alias("n"))
    cells = (
        o.join(F.broadcast(rt), "lang")
        .join(F.broadcast(ct), "source")
        .crossJoin(F.broadcast(n))
    )
    term = (
        (F.col("obs") * 1.0 / F.col("n"))
        * F.log(
            (F.col("obs") * 1.0 * F.col("n"))
            / (F.col("r") * 1.0 * F.col("c"))
        )
    ).cast("decimal(28,12)")
    return cells.agg(
        F.max("n").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.round(F.sum(term).cast("double"), 6).cast("double")
        .alias("mi_nats"),
    )


# --------------------------------------------------------------------
# SQL-surface completeness (round 6, batch 9): null-safe join
# equality and array set operations — §2B J/F-family edges users hit
# when porting warehouse SQL.
# --------------------------------------------------------------------


@register(
    "q228_null_safe_join",
    oracle="""
        WITH c AS (
            SELECT c_custkey, c_nationkey,
                   NULLIF(c_mktsegment, 'MACHINERY') AS tier
            FROM customer
        )
        SELECT a.c_nationkey AS nation,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(CASE WHEN a.tier IS NULL
                        THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_null_tier_pairs
        FROM c a JOIN c b
          ON a.c_nationkey = b.c_nationkey
         AND a.tier IS NOT DISTINCT FROM b.tier
         AND a.c_custkey < b.c_custkey
        GROUP BY a.c_nationkey ORDER BY nation
    """,
    doc="Null-safe join equality (Spark `<=>` == SQL IS NOT DISTINCT "
    "FROM): customer pairs matched within a nation by a NULLABLE "
    "tier key (NULLIF-derived), where NULL must match NULL — the "
    "semantics `=` silently drops and every SCD/dimension merge "
    "with optional attributes needs. EqualNullSafe is a first-class "
    "HASH join key in Spark (nulls hash to one bucket, the plan "
    "stays an equi shuffle/broadcast join, never a nested loop — "
    "lint-pinned); the n_null_tier_pairs column proves the NULL "
    "matches are present, i.e. the query is non-vacuous. Pair "
    "dedup by key inequality keeps the output pair-set canonical.",
)
def q228(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.expr("NULLIF(c_mktsegment, 'MACHINERY')").alias("tier"),
    )
    a = c.select(
        F.col("c_custkey").alias("k_a"),
        F.col("c_nationkey").alias("nation"),
        F.col("tier").alias("tier_a"),
    )
    b = c.select(
        F.col("c_custkey").alias("k_b"),
        F.col("c_nationkey").alias("nation"),
        F.col("tier").alias("tier_b"),
    )
    pairs = a.join(
        b,
        on=[
            a["nation"] == b["nation"],
            F.col("tier_a").eqNullSafe(F.col("tier_b")),
            F.col("k_a") < F.col("k_b"),
        ],
    )
    return (
        pairs.groupBy(a["nation"].alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(
                F.col("tier_a").isNull().cast("int")
            ).cast("bigint").alias("n_null_tier_pairs"),
        )
        .orderBy("nation")
    )


@register(
    "q229_array_set_ops",
    oracle="""
        WITH s AS (
            SELECT user_id,
                   list_distinct(list(event_type)
                       FILTER (WHERE event_id % 2 = 0)) AS even_t,
                   list_distinct(list(event_type)
                       FILTER (WHERE event_id % 2 = 1)) AS odd_t
            FROM events GROUP BY user_id
        )
        SELECT user_id,
               CAST(len(COALESCE(even_t, [])) AS BIGINT) AS n_even,
               CAST(len(COALESCE(odd_t, [])) AS BIGINT) AS n_odd,
               CAST(len(list_intersect(COALESCE(even_t, []),
                                       COALESCE(odd_t, [])))
                    AS BIGINT) AS n_both,
               CAST(len(list_filter(COALESCE(even_t, []),
                        x -> NOT list_contains(COALESCE(odd_t, []),
                                               x)))
                    AS BIGINT) AS n_even_only
        FROM s ORDER BY user_id
    """,
    doc="Array set operations (F4 completeness: array_intersect / "
    "array_except over collected sets): per user, the event-type "
    "vocabulary of even- vs odd-numbered events and their overlap — "
    "the A/B-exposure-overlap shape ('which behaviors appear in "
    "both halves of a user's traffic'). collect_set is partial-"
    "merged and unordered, so the contract columns are SIZES of the "
    "set operations (order-free), with the empty-set edge handled "
    "by coalesce on both engines. One user-grain agg, then pure "
    "map-side array expressions.",
)
def q229(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events")
    s = ev.groupBy("user_id").agg(
        F.collect_set(
            F.when(F.col("event_id") % 2 == 0, F.col("event_type"))
        ).alias("even_t"),
        F.collect_set(
            F.when(F.col("event_id") % 2 == 1, F.col("event_type"))
        ).alias("odd_t"),
    )
    return s.select(
        "user_id",
        F.size("even_t").cast("bigint").alias("n_even"),
        F.size("odd_t").cast("bigint").alias("n_odd"),
        F.size(F.array_intersect("even_t", "odd_t")).cast("bigint")
        .alias("n_both"),
        F.size(F.array_except("even_t", "odd_t")).cast("bigint")
        .alias("n_even_only"),
    ).orderBy("user_id")


# --------------------------------------------------------------------
# Sequence/behavior analytics (round 6, batch 10): gaps-and-islands
# activity streaks, deterministic per-group mode, and per-entity
# drawdown — the classic SQL-interview shapes users port from
# warehouse SQL, each with the tie-break/stability contract pinned.
# --------------------------------------------------------------------


@register(
    "q230_streak_islands",
    oracle="""
        WITH d AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
            FROM events
        ),
        r AS (
            SELECT user_id, day,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY day) AS rn
            FROM d
        ),
        isl AS (
            SELECT user_id,
                   day - CAST(rn AS INTEGER) AS grp,
                   COUNT(*) AS len,
                   MIN(day) AS streak_start
            FROM r GROUP BY user_id, day - CAST(rn AS INTEGER)
        ),
        best AS (
            SELECT user_id, len AS best_streak,
                   streak_start AS best_start,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY len DESC, streak_start) AS pick
            FROM isl
        )
        SELECT user_id,
               CAST(best_streak AS BIGINT) AS best_streak,
               best_start
        FROM best WHERE pick = 1 ORDER BY user_id
    """,
    doc="Gaps-and-islands: each user's LONGEST run of consecutive "
    "active days (day minus per-user day-rank is constant within a "
    "consecutive island — the classic rewrite that needs no "
    "self-join), tie-broken to the earliest streak. All three "
    "levels (distinct day grain, island agg, best-pick) stay "
    "PARTITIONED by user_id — one shuffle key end to end, no "
    "global window; date-minus-integer arithmetic is identical in "
    "both engines. The product-analytics 'engagement streak' "
    "metric a CDC event replica feeds.",
)
def q230(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    d = (
        table(spark, sf, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    r = d.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("user_id").orderBy("day")
        ),
    )
    isl = (
        r.withColumn("grp", F.expr("day - CAST(rn AS INT)"))
        .groupBy("user_id", "grp")
        .agg(
            F.count(F.lit(1)).alias("len"),
            F.min("day").alias("streak_start"),
        )
    )
    best = isl.withColumn(
        "pick",
        F.row_number().over(
            Window.partitionBy("user_id").orderBy(
                F.col("len").desc(), "streak_start"
            )
        ),
    )
    return (
        best.filter("pick = 1")
        .select(
            "user_id",
            F.col("len").cast("bigint").alias("best_streak"),
            F.col("streak_start").alias("best_start"),
        )
        .orderBy("user_id")
    )


@register(
    "q231_mode_per_group",
    oracle="""
        WITH c AS (
            SELECT user_id, event_type, COUNT(*) AS cnt
            FROM events GROUP BY user_id, event_type
        ),
        p AS (
            SELECT user_id, event_type, cnt,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY cnt DESC, event_type) AS rk
            FROM c
        )
        SELECT user_id, event_type AS mode_type,
               CAST(cnt AS BIGINT) AS mode_cnt
        FROM p WHERE rk = 1 ORDER BY user_id
    """,
    doc="Deterministic per-group mode: each user's most frequent "
    "event type with the tie broken ALPHABETICALLY — built-in "
    "mode() is tie-nondeterministic in both engines (Spark docs "
    "say so outright), which is exactly the kind of silent "
    "instability a replicated metric cannot carry. The engine form "
    "is min_by over the (-count, tie-key) struct on the (user, "
    "type) aggregate: two hash aggs on the same leading key, no "
    "window, order-proof by construction; the oracle states the "
    "same pick as the classic ROW_NUMBER()=1 spec.",
)
def q231(spark: SparkSession, sf: str) -> DataFrame:
    c = (
        table(spark, sf, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        c.groupBy("user_id")
        .agg(
            F.expr(
                "min_by(event_type, struct(-cnt, event_type))"
            ).alias("mode_type"),
            F.max("cnt").cast("bigint").alias("mode_cnt"),
        )
        .orderBy("user_id")
    )


@register(
    "q232_max_drawdown",
    oracle="""
        WITH eq AS (
            SELECT user_id, ts, event_id,
                   SUM(CAST(value AS DECIMAL(28,6)))
                       OVER (PARTITION BY user_id
                             ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS equity
            FROM events
        ),
        dd AS (
            SELECT user_id,
                   MAX(CAST(equity AS DECIMAL(28,6)))
                       OVER (PARTITION BY user_id
                             ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) - equity
                       AS draw
            FROM eq
        )
        SELECT user_id,
               CAST(ROUND(MAX(draw), 2) AS DOUBLE) AS max_drawdown
        FROM dd GROUP BY user_id ORDER BY user_id
    """,
    doc="Per-user maximum drawdown: running DECIMAL equity curve "
    "(cumulative value), its running peak, and the largest "
    "peak-to-trough gap — the risk metric shape (and the general "
    "'how far below its high-water mark did this series fall' "
    "monitor). Both windows are ROWS frames PARTITIONED by "
    "user_id over a total (ts, event_id) order; sums accumulate "
    "in DECIMAL(28,6) (order-proof — a double cumsum would be "
    "tie-unstable) with round->double only at output. One "
    "user-keyed shuffle feeds both windows and the final agg.",
)
def q232(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    eq = table(spark, sf, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.sum(F.col("value").cast("decimal(28,6)")).over(w)
        .alias("equity"),
    )
    dd = eq.select(
        "user_id",
        (
            F.max(F.col("equity").cast("decimal(28,6)")).over(w)
            - F.col("equity")
        ).alias("draw"),
    )
    return (
        dd.groupBy("user_id")
        .agg(
            F.round(F.max("draw"), 2).cast("double")
            .alias("max_drawdown")
        )
        .orderBy("user_id")
    )


#: q233 audit-sample budget — smaller than the smallest fixture's
#: document count so the per-stratum rank filter is non-vacuous (a
#: budget >= the corpus would select everything) at every scale
SAMPLE_K = 200


@register(
    "q233_stratified_exact_sample",
    oracle="WITH" + _neyman_alloc_sql(SAMPLE_K) + """,
        r AS (
            SELECT doc_id, source,
                   ROW_NUMBER() OVER (PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                doc_id) AS rk
            FROM documents
        )
        SELECT r.source, CAST(r.rk AS BIGINT) AS rk, r.doc_id
        FROM r JOIN afinal a
          ON r.source = a.source AND r.rk <= a.alloc
        ORDER BY r.source, r.rk
    """,
    doc=f"Executes the q226 Neyman design: draw EXACTLY alloc_h "
    f"documents per source (budget {SAMPLE_K}) by ranking each "
    "stratum on md5(doc_id) — the q89 content-deterministic uniform "
    "stand-in, so the sample is reproducible across engines, "
    "restarts, and partitionings (rand() is none of those). The "
    "allocation CTE is the SAME SQL builder q226's oracle uses "
    "(design and execution can't drift); Spark reuses "
    "_neyman_alloc and broadcast-joins the tiny per-source quota "
    "onto a rank window PARTITIONED by source. At corpus scale the "
    "md5 rank is per-stratum work and the quota frame is "
    "stratum-count-sized — no global window anywhere.",
)
def q233(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    alloc = _neyman_alloc(spark, sf, SAMPLE_K).select(
        "source", "alloc"
    )
    r = table(spark, sf, "documents").select(
        "doc_id",
        "source",
        F.row_number().over(
            Window.partitionBy("source").orderBy(
                F.md5(F.col("doc_id").cast("string")), "doc_id"
            )
        ).alias("rk"),
    )
    return (
        r.join(F.broadcast(alloc), "source")
        .filter(F.col("rk") <= F.col("alloc"))
        .select(
            "source",
            F.col("rk").cast("bigint").alias("rk"),
            "doc_id",
        )
        .orderBy("source", "rk")
    )


# --------------------------------------------------------------------
# Forecasting layer (round 6, batch 12): Holt double-exponential
# smoothing with a linear-trend forecast, and lead/lag
# cross-correlation between event series.
# --------------------------------------------------------------------

#: Holt smoothing constants (level, trend) — written as the exact
#: decimal literals both engines parse to the same doubles
HOLT_ALPHA = "0.3"
HOLT_GAMMA = "0.1"

#: forecast horizon (days ahead)
HOLT_H = 7


@register(
    "q234_holt_forecast",
    oracle=f"""
        WITH RECURSIVE d AS MATERIALIZED (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6)))
                        AS DOUBLE) AS y
            FROM orders GROUP BY day
        ),
        s AS MATERIALIZED (
            SELECT ROW_NUMBER() OVER (ORDER BY day) AS i, y FROM d
        ),
        n AS (SELECT COUNT(*) AS n_days FROM s),
        r AS (
            SELECT i, l, b FROM (
                SELECT i, y AS l, CAST(0 AS DOUBLE) AS b
                FROM s WHERE i = 1)
            UNION ALL
            SELECT s.i,
                   {HOLT_ALPHA} * s.y
                   + (1 - {HOLT_ALPHA}) * (r.l + r.b) AS l,
                   {HOLT_GAMMA} * ({HOLT_ALPHA} * (s.y - r.l)
                       + (1 - {HOLT_ALPHA}) * r.b)
                   + (1 - {HOLT_GAMMA}) * r.b AS b
            FROM r JOIN s ON s.i = r.i + 1
        ),
        fin AS (
            SELECT l, b FROM r CROSS JOIN n WHERE i = n_days
        )
        SELECT CAST(h AS BIGINT) AS h,
               CAST(n_days AS BIGINT) AS n_days,
               CAST(FLOOR(l * 10000) AS BIGINT) AS level_e4,
               CAST(FLOOR(b * 10000) AS BIGINT) AS trend_e4,
               CAST(FLOOR((l + h * b) * 10000) AS BIGINT)
                   AS forecast_e4
        FROM fin CROSS JOIN n CROSS JOIN
             (SELECT unnest(generate_series(1, {HOLT_H})) AS h)
        ORDER BY h
    """,
    doc="Holt double-exponential smoothing over the daily revenue "
    "series with a linear-trend h-step forecast (q114's EWMA tracks "
    "level only; Holt adds the trend state, the standard next tier "
    "before full seasonal Holt-Winters). Recursion contract: "
    "l_1 = y_1, b_1 = 0; l_t = a*y_t + (1-a)*(l+b); b_t = "
    "g*(a*(y_t - l) + (1-a)*b) + (1-g)*b — the expanded trend form "
    "whose operands are all PRE-update state, because DuckDB's "
    "list_reduce mutates struct accumulator fields sequentially "
    "(field exprs see partially-updated acc — unusable for coupled "
    "recursions), so the oracle states the recursion as a standard "
    "RECURSIVE CTE over the row-numbered series while Spark folds "
    "with aggregate(): identical IEEE ops over identical "
    "DECIMAL-exact daily sums in identical order => identical "
    "doubles either way. Floor-e4 outputs. The day-grain series "
    "stays thousands of rows at any corpus size (the corpus-sized "
    "work is the one day agg).",
)
def q234(spark: SparkSession, sf: str) -> DataFrame:
    d = (
        table(spark, sf, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
            .cast("double").alias("y")
        )
    )
    arr = d.agg(
        F.expr(
            "aggregate(array_sort(collect_list(struct(day, y))), "
            "CAST(NULL AS STRUCT<l: DOUBLE, b: DOUBLE>), "
            "(acc, x) -> CASE WHEN acc IS NULL THEN "
            "named_struct('l', x.y, 'b', CAST(0 AS DOUBLE)) "
            "ELSE named_struct("
            f"'l', {HOLT_ALPHA} * x.y "
            f"+ (1 - {HOLT_ALPHA}) * (acc.l + acc.b), "
            f"'b', {HOLT_GAMMA} * ({HOLT_ALPHA} * (x.y - acc.l) "
            f"+ (1 - {HOLT_ALPHA}) * acc.b) "
            f"+ (1 - {HOLT_GAMMA}) * acc.b) END)"
        ).alias("s"),
        F.count(F.lit(1)).alias("n_days"),
    )
    return (
        arr.crossJoin(
            F.broadcast(
                arr.sparkSession.range(1, HOLT_H + 1)
                .select(F.col("id").alias("h"))
            )
        )
        .select(
            F.col("h").cast("bigint").alias("h"),
            F.col("n_days").cast("bigint").alias("n_days"),
            F.floor(F.col("s.l") * 10000).cast("bigint")
            .alias("level_e4"),
            F.floor(F.col("s.b") * 10000).cast("bigint")
            .alias("trend_e4"),
            F.floor((F.col("s.l") + F.col("h") * F.col("s.b"))
                    * 10000).cast("bigint").alias("forecast_e4"),
        )
        .orderBy("h")
    )


#: cross-correlation shared arithmetic: Pearson r from exact integer
#: moments, one expression string for both engines; zero-variance
#: sides yield r := 0 rather than a NaN
_XCORR_R = (
    "CASE WHEN (n * sx2 - sx * sx) * (n * sy2 - sy * sy) <= 0 "
    "THEN CAST(0 AS BIGINT) "
    "ELSE CAST(FLOOR((n * sxy - sx * sy) / "
    "(sqrt(n * sx2 - sx * sx) * sqrt(n * sy2 - sy * sy)) "
    "* 1000000) AS BIGINT) END"
)


@register(
    "q235_lag_cross_correlation",
    oracle=f"""
        WITH d AS (
            SELECT CAST(ts AS DATE) AS day,
                   SUM(CASE WHEN event_type = 'error'
                       THEN 1 ELSE 0 END) AS ec,
                   SUM(CASE WHEN event_type = 'purchase'
                       THEN 1 ELSE 0 END) AS pc
            FROM events GROUP BY day
        ),
        lags AS (
            SELECT unnest(generate_series(-3, 3)) AS lag
        ),
        j AS (
            SELECT l.lag,
                   CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(a.ec) AS DOUBLE) AS sx,
                   CAST(SUM(b.pc) AS DOUBLE) AS sy,
                   CAST(SUM(CAST(a.ec AS DECIMAL(38,0)) * b.pc)
                        AS DOUBLE) AS sxy,
                   CAST(SUM(CAST(a.ec AS DECIMAL(38,0)) * a.ec)
                        AS DOUBLE) AS sx2,
                   CAST(SUM(CAST(b.pc AS DECIMAL(38,0)) * b.pc)
                        AS DOUBLE) AS sy2
            FROM lags l
            JOIN d a ON TRUE
            JOIN d b ON b.day = a.day + CAST(l.lag AS INTEGER)
            GROUP BY l.lag
        )
        SELECT CAST(lag AS BIGINT) AS lag,
               CAST(n AS BIGINT) AS n_days,
               {_XCORR_R} AS r_e6
        FROM j ORDER BY lag
    """,
    doc="Lead/lag cross-correlation: Pearson r between the daily "
    "'error' count and the daily 'purchase' count shifted by "
    "-3..+3 days — the lead-indicator detector (q207's ACF "
    "correlates a series with ITSELF; this correlates two metrics "
    "to ask 'do errors precede purchase dips'). Moments are EXACT "
    "(DECIMAL(38,0) products — counts overflow LONG products at "
    "~1e9/day); r comes from one shared expression string over "
    "identical doubles, floor-e6, with degenerate (zero-variance) "
    "windows pinned to 0. Shape: one day-grain agg, a 7-row lag "
    "frame, and a self-join keyed on the shifted day — day-grain "
    "work no matter the corpus size.",
)
def q235(spark: SparkSession, sf: str) -> DataFrame:
    d = (
        table(spark, sf, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum((F.col("event_type") == "error").cast("int"))
            .alias("ec"),
            F.sum((F.col("event_type") == "purchase").cast("int"))
            .alias("pc"),
        )
        .localCheckpoint(eager=True)
    )
    lags = d.sparkSession.range(-3, 4).select(
        F.col("id").cast("int").alias("lag")
    )
    a = d.select("day", "ec")
    b = d.select(F.col("day").alias("bday"), "pc")
    j = (
        F.broadcast(lags)
        .join(a, F.lit(True))
        .join(b, F.col("bday") == F.expr("day + lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("ec").cast("double").alias("sx"),
            F.sum("pc").cast("double").alias("sy"),
            F.expr(
                "CAST(SUM(CAST(ec AS DECIMAL(38,0)) * pc) AS DOUBLE)"
            ).alias("sxy"),
            F.expr(
                "CAST(SUM(CAST(ec AS DECIMAL(38,0)) * ec) AS DOUBLE)"
            ).alias("sx2"),
            F.expr(
                "CAST(SUM(CAST(pc AS DECIMAL(38,0)) * pc) AS DOUBLE)"
            ).alias("sy2"),
        )
    )
    return j.select(
        F.col("lag").cast("bigint").alias("lag"),
        F.col("n").cast("bigint").alias("n_days"),
        F.expr(_XCORR_R).alias("r_e6"),
    ).orderBy("lag")


#: Holt-Winters additive seasonal constants (level, trend, season) —
#: exact decimal literals both engines parse to the same doubles
HW_ALPHA = "0.3"
HW_BETA = "0.1"
HW_GAMMA = "0.2"

#: season length: day-of-week
HW_PERIOD = 7


def _hw_step(
    y: str, acc_l: str, acc_b: str, acc_s1: str
) -> tuple[str, str, str]:
    """The three HW update expressions with every operand PRE-update
    state (the q234 expanded-form contract: no engine may reference a
    just-computed field, so l' is textually duplicated inside b' and
    s'). Shared between the Spark fold and the DuckDB recursion so the
    IEEE op sequence is identical."""
    lnew = (
        f"{HW_ALPHA} * ({y} - {acc_s1}) "
        f"+ (1 - {HW_ALPHA}) * ({acc_l} + {acc_b})"
    )
    bnew = (
        f"{HW_BETA} * (({lnew}) - {acc_l}) + (1 - {HW_BETA}) * {acc_b}"
    )
    snew = (
        f"{HW_GAMMA} * ({y} - ({lnew})) + (1 - {HW_GAMMA}) * {acc_s1}"
    )
    return lnew, bnew, snew


_HW_L, _HW_B, _HW_S = _hw_step("s.y", "r.l", "r.b", "r.sa[1]")
_HW_L_SP, _HW_B_SP, _HW_S_SP = _hw_step(
    "x", "acc.l", "acc.b", "element_at(acc.sa, 1)"
)


@register(
    "q236_holt_winters_seasonal",
    oracle=f"""
        WITH RECURSIVE d AS MATERIALIZED (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS yd
            FROM orders GROUP BY day
        ),
        s AS MATERIALIZED (
            SELECT ROW_NUMBER() OVER (ORDER BY day) AS i,
                   CAST(yd AS DOUBLE) AS y, yd
            FROM d
        ),
        n AS (SELECT COUNT(*) AS n_days FROM s),
        m AS (
            SELECT CAST((SELECT SUM(yd) FROM s WHERE i <= {HW_PERIOD})
                        AS DOUBLE) / {HW_PERIOD} AS m1,
                   CAST((SELECT SUM(yd) FROM s
                         WHERE i BETWEEN {HW_PERIOD} + 1
                                     AND 2 * {HW_PERIOD})
                        AS DOUBLE) / {HW_PERIOD} AS m2
        ),
        r AS (
            SELECT {HW_PERIOD} AS i, m1 AS l,
                   (m2 - m1) / {HW_PERIOD} AS b,
                   (SELECT list(s.y - m.m1 ORDER BY s.i) FROM s
                    WHERE s.i <= {HW_PERIOD}) AS sa
            FROM m
            UNION ALL
            SELECT s.i,
                   {_HW_L} AS l,
                   {_HW_B} AS b,
                   list_concat(r.sa[2:{HW_PERIOD}], [{_HW_S}]) AS sa
            FROM r JOIN s ON s.i = r.i + 1
        ),
        fin AS (
            SELECT l, b, sa FROM r CROSS JOIN n WHERE i = n_days
        )
        SELECT CAST(h AS BIGINT) AS h,
               CAST(n_days AS BIGINT) AS n_days,
               CAST(FLOOR(l * 10000) AS BIGINT) AS level_e4,
               CAST(FLOOR(b * 10000) AS BIGINT) AS trend_e4,
               CAST(FLOOR(sa[h] * 10000) AS BIGINT) AS season_e4,
               CAST(FLOOR((l + h * b + sa[h]) * 10000) AS BIGINT)
                   AS forecast_e4
        FROM fin CROSS JOIN n CROSS JOIN
             (SELECT unnest(generate_series(1, {HW_PERIOD})) AS h)
        ORDER BY h
    """,
    doc="Additive seasonal Holt-Winters over the daily revenue series "
    "— the full level+trend+season tier above q234's Holt (its "
    "docstring names this as the standard next step). Classic "
    "two-period init: l_P = mean(week 1), b_P = (mean(week 2) - "
    "mean(week 1)) / P, s_i = y_i - mean(week 1); both init means "
    "are DECIMAL-exact sums (order-free) cast to double once, so "
    "neither engine's aggregation order matters. Recursion from day "
    "P+1 carries (l, b, season ring-buffer): the season array is "
    "kept ROTATED so sa[1] is always the factor applying to the "
    "current step, making the update a slice+append instead of an "
    "indexed write; every update operand is pre-update state with "
    "l' textually duplicated inside b' and s' (the q234 expanded-"
    "form contract — identical IEEE op sequence in the Spark "
    "aggregate() fold and the DuckDB RECURSIVE CTE). h-step "
    "forecast: l + h*b + sa[h]; floor-e4 outputs. Contract: needs "
    ">= 2P+1 observed days. The day-grain series stays thousands of "
    "rows at any corpus size — the corpus-sized work is the one "
    "day agg.",
)
def q236(spark: SparkSession, sf: str) -> DataFrame:
    p = HW_PERIOD
    row = (
        table(spark, sf, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
            .alias("yd")
        )
        .agg(
            F.expr("array_sort(collect_list(struct(day, yd)))")
            .alias("arr"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .withColumn(
            "ys", F.expr("transform(arr, x -> CAST(x.yd AS DOUBLE))")
        )
        .withColumn(
            "m1",
            F.expr(
                f"CAST(aggregate(slice(arr, 1, {p}), "
                "CAST(0 AS DECIMAL(38,6)), "
                "(a, x) -> CAST(a + x.yd AS DECIMAL(38,6))) "
                f"AS DOUBLE) / {p}"
            ),
        )
        .withColumn(
            "m2",
            F.expr(
                f"CAST(aggregate(slice(arr, {p} + 1, {p}), "
                "CAST(0 AS DECIMAL(38,6)), "
                "(a, x) -> CAST(a + x.yd AS DECIMAL(38,6))) "
                f"AS DOUBLE) / {p}"
            ),
        )
    )
    st = row.withColumn(
        "st",
        F.expr(
            f"aggregate(slice(ys, {p} + 1, size(ys) - {p}), "
            f"named_struct('l', m1, 'b', (m2 - m1) / {p}, "
            f"'sa', transform(slice(ys, 1, {p}), v -> v - m1)), "
            f"(acc, x) -> named_struct("
            f"'l', {_HW_L_SP}, "
            f"'b', {_HW_B_SP}, "
            f"'sa', concat(slice(acc.sa, 2, {p} - 1), "
            f"array({_HW_S_SP}))))"
        ),
    )
    return (
        st.crossJoin(
            F.broadcast(
                st.sparkSession.range(1, p + 1)
                .select(F.col("id").alias("h"))
            )
        )
        .select(
            F.col("h").cast("bigint").alias("h"),
            F.col("n_days").cast("bigint").alias("n_days"),
            F.floor(F.col("st.l") * 10000).cast("bigint")
            .alias("level_e4"),
            F.floor(F.col("st.b") * 10000).cast("bigint")
            .alias("trend_e4"),
            F.floor(
                F.expr("element_at(st.sa, CAST(h AS INT))") * 10000
            ).cast("bigint").alias("season_e4"),
            F.floor(
                (
                    F.col("st.l")
                    + F.col("h") * F.col("st.b")
                    + F.expr("element_at(st.sa, CAST(h AS INT))")
                ) * 10000
            ).cast("bigint").alias("forecast_e4"),
        )
        .orderBy("h")
    )


# --------------------------------------------------------------------
# Round 7: corpus hygiene + replica tooling + mixing design —
# blocklist scrub (the C4-style term filter), row-level snapshot diff
# (q196 checksum's "which rows" companion), the event-type correlation
# matrix (q235 generalized all-pairs), and temperature-scaled source
# mixing weights (the multilingual-LM sampling design).
# --------------------------------------------------------------------

#: blocklist terms for the scrub demo — drawn from the fixture vocab
#: so the gate is NON-VACUOUS at every scale (a PII-shaped regex would
#: match zero rows of the synthetic corpus and prove nothing); the
#: pattern shape (word-boundary alternation) is exactly a production
#: blocklist's. Both engines' regex dialects (Java util.regex, RE2)
#: agree on \b and alternation.
BLOCKLIST_PATTERN = r"\b(slow|big)\b"

#: redaction token replacing each blocklist hit
REDACT_TOKEN = "[REDACTED]"


@register(
    "q237_blocklist_scrub",
    oracle=f"""
        WITH scrubbed AS (
            SELECT source,
                   len(regexp_extract_all(COALESCE(text, ''),
                       '{BLOCKLIST_PATTERN}', 0)) AS hits,
                   regexp_replace(COALESCE(text, ''),
                       '{BLOCKLIST_PATTERN}', '{REDACT_TOKEN}', 'g')
                       AS clean
            FROM documents
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS docs_flagged,
               CAST(SUM(hits) AS BIGINT) AS total_hits,
               CAST(SUM(CAST(CAST(concat('0x',
                        substr(md5(clean), 1, 12)) AS BIGINT)
                        AS HUGEINT)) % 1000000000000000000 AS BIGINT)
                   AS clean_checksum
        FROM scrubbed GROUP BY source ORDER BY source
    """,
    doc="Blocklist scrub — the C4-style bad-term filter every corpus "
    "pipeline runs before training: count word-boundary blocklist "
    "hits per document, redact them, and report per source (docs "
    "flagged, total hits, and a 48-bit-md5 checksum of the REDACTED "
    "text summed mod 1e18 — the q196 order-free convention — so the "
    "oracle pins the transform output itself, not just the counts). "
    "Shape: one narrow regex map over the scan + one source-grain "
    "agg; no join, no window — embarrassingly parallel at 100 TB. "
    "The blocklist rides as a literal pattern; a big lexicon would "
    "compile to an Aho-Corasick UDF or a broadcast join on tokens "
    "(the q44 explode path).",
)
def q237(spark: SparkSession, sf: str) -> DataFrame:
    txt = F.coalesce(F.col("text"), F.lit(""))
    hits = F.size(
        F.regexp_extract_all(txt, F.lit(BLOCKLIST_PATTERN), F.lit(0))
    )
    clean = F.regexp_replace(txt, BLOCKLIST_PATTERN, REDACT_TOKEN)
    digest = F.conv(
        F.substring(F.md5(clean), 1, 12), 16, 10
    ).cast("bigint")
    return (
        table(spark, sf, "documents")
        .select("source", hits.alias("hits"), digest.alias("d"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum((F.col("hits") > 0).cast("int")).cast("bigint")
            .alias("docs_flagged"),
            F.sum("hits").cast("bigint").alias("total_hits"),
            (
                F.sum(F.col("d").cast("decimal(38,0)"))
                % F.lit(10 ** 18).cast("decimal(38,0)")
            ).cast("bigint").alias("clean_checksum"),
        )
        .orderBy("source")
    )


#: snapshot-diff perturbation mods (deterministic replica drift: keys
#: divisible by these are dropped / value-drifted / late-inserted)
DIFF_DROP_MOD = 101
DIFF_DRIFT_MOD = 97
DIFF_INSERT_MOD = 103

#: key offset for the simulated late-arriving inserts
DIFF_INSERT_OFFSET = 100_000_000


def _diff_rowhash_sql(price_expr: str) -> str:
    """48-bit md5 digest of a float-free row rendering (the q196
    contract: doubles enter as floor-scaled cents, dates as ISO
    strings — both render identically in Spark and DuckDB)."""
    return f"""CAST(CAST(concat('0x', substr(md5(concat_ws('|',
        CAST(o_orderkey AS VARCHAR),
        CAST(o_custkey AS VARCHAR),
        o_orderstatus,
        CAST(CAST(FLOOR(({price_expr}) * 100) AS BIGINT) AS VARCHAR),
        CAST(CAST(o_orderdate AS DATE) AS VARCHAR),
        o_orderpriority)), 1, 12)) AS BIGINT) AS BIGINT)"""


@register(
    "q238_snapshot_diff",
    oracle=f"""
        WITH old AS (
            SELECT o_orderkey AS k,
                   {_diff_rowhash_sql('o_totalprice')} AS h
            FROM orders
        ),
        new AS (
            SELECT o_orderkey AS k,
                   {_diff_rowhash_sql(
                       'o_totalprice + CASE WHEN o_orderkey % '
                       + str(DIFF_DRIFT_MOD)
                       + ' = 0 THEN 1.5 ELSE 0 END')} AS h
            FROM orders WHERE o_orderkey % {DIFF_DROP_MOD} <> 0
            UNION ALL
            SELECT o_orderkey + {DIFF_INSERT_OFFSET} AS k,
                   {_diff_rowhash_sql('o_totalprice')} AS h
            FROM orders WHERE o_orderkey % {DIFF_INSERT_MOD} = 0
        ),
        d AS (
            SELECT COALESCE(o.k, n.k) AS k,
                   CASE WHEN o.k IS NULL THEN 'added'
                        WHEN n.k IS NULL THEN 'removed'
                        WHEN o.h <> n.h THEN 'changed'
                        ELSE 'unchanged' END AS change_type
            FROM old o FULL OUTER JOIN new n ON o.k = n.k
        )
        SELECT change_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(k AS HUGEINT))
                    % 1000000000000000000 AS BIGINT) AS key_checksum
        FROM d GROUP BY change_type ORDER BY change_type
    """,
    doc="Row-level snapshot diff between a table and a drifted "
    "replica — q196's bucketed checksum answers 'do the replicas "
    "differ'; this answers 'WHICH rows, and how': full outer join "
    "on the key, rows classified added / removed / changed / "
    "unchanged by comparing the q196-convention float-free row "
    "digest, per-class counts plus an order-free key checksum "
    "pinning the membership of each class. The replica is a "
    "deterministic in-query perturbation (drop keys % "
    f"{DIFF_DROP_MOD}, drift price on % {DIFF_DRIFT_MOD}, "
    f"late-insert copies of % {DIFF_INSERT_MOD} at a key offset) — "
    "in production the two sides are source and applied replica "
    "(cdc/apply.py). Shape: ONE key-partitioned full-outer "
    "self-join (both sides shuffle on k once) + a 4-group agg; at "
    "100 TB this is the standard keyed reconciliation pass, and "
    "combining it with q196's buckets confines the row-level join "
    "to divergent buckets only.",
)
def q238(spark: SparkSession, sf: str) -> DataFrame:
    def rowhash(price: F.Column) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("o_orderkey").cast("string"),
                        F.col("o_custkey").cast("string"),
                        F.col("o_orderstatus"),
                        F.floor(price * 100).cast("bigint")
                        .cast("string"),
                        F.col("o_orderdate").cast("date")
                        .cast("string"),
                        F.col("o_orderpriority"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("bigint")

    orders = table(spark, sf, "orders")
    old = orders.select(
        F.col("o_orderkey").alias("k"),
        rowhash(F.col("o_totalprice")).alias("h"),
    )
    drift = F.col("o_totalprice") + F.when(
        F.col("o_orderkey") % DIFF_DRIFT_MOD == 0, F.lit(1.5)
    ).otherwise(F.lit(0.0))
    new = (
        orders.filter(F.col("o_orderkey") % DIFF_DROP_MOD != 0)
        .select(
            F.col("o_orderkey").alias("k"),
            rowhash(drift).alias("h"),
        )
        .unionAll(
            orders.filter(
                F.col("o_orderkey") % DIFF_INSERT_MOD == 0
            ).select(
                (F.col("o_orderkey") + DIFF_INSERT_OFFSET).alias("k"),
                rowhash(F.col("o_totalprice")).alias("h"),
            )
        )
    )
    d = old.alias("o").join(
        new.alias("n"), F.col("o.k") == F.col("n.k"), "full_outer"
    ).select(
        F.coalesce(F.col("o.k"), F.col("n.k")).alias("k"),
        F.when(F.col("o.k").isNull(), "added")
        .when(F.col("n.k").isNull(), "removed")
        .when(F.col("o.h") != F.col("n.h"), "changed")
        .otherwise("unchanged")
        .alias("change_type"),
    )
    return (
        d.groupBy("change_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            (
                F.sum(F.col("k").cast("decimal(38,0)"))
                % F.lit(10 ** 18).cast("decimal(38,0)")
            ).cast("bigint").alias("key_checksum"),
        )
        .orderBy("change_type")
    )


#: the fixture's event types — stated as a FIXED list so the day grid
#: zero-fills days where a type is absent (a dynamic pivot would drop
#: them and bias the correlation)
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "q239_correlation_matrix",
    oracle=f"""
        WITH d AS (
            SELECT CAST(ts AS DATE) AS day,
                   {", ".join(
                       f"SUM(CASE WHEN event_type = '{t}' "
                       f"THEN 1 ELSE 0 END) AS c_{t}"
                       for t in EVENT_TYPES)}
            FROM events GROUP BY day
        ),
        u AS (
            {" UNION ALL ".join(
                f"SELECT day, '{t}' AS typ, c_{t} AS cnt FROM d"
                for t in EVENT_TYPES)}
        ),
        j AS (
            SELECT a.typ AS type_a, b.typ AS type_b,
                   CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(a.cnt) AS DOUBLE) AS sx,
                   CAST(SUM(b.cnt) AS DOUBLE) AS sy,
                   CAST(SUM(CAST(a.cnt AS DECIMAL(38,0)) * b.cnt)
                        AS DOUBLE) AS sxy,
                   CAST(SUM(CAST(a.cnt AS DECIMAL(38,0)) * a.cnt)
                        AS DOUBLE) AS sx2,
                   CAST(SUM(CAST(b.cnt AS DECIMAL(38,0)) * b.cnt)
                        AS DOUBLE) AS sy2
            FROM u a JOIN u b ON a.day = b.day AND a.typ < b.typ
            GROUP BY a.typ, b.typ
        )
        SELECT type_a, type_b,
               CAST(n AS BIGINT) AS n_days,
               {_XCORR_R} AS r_e6
        FROM j ORDER BY type_a, type_b
    """,
    doc="Same-day correlation matrix across all event-type pairs — "
    "q235 correlates two chosen series at shifted lags; this is the "
    "all-pairs lag-0 screen you run FIRST to find which metric "
    "pairs co-move at all (then q235 resolves lead/lag for the "
    "interesting ones). The per-day type counts come from one "
    "conditional-sum day agg over a FIXED type list (zero-filled "
    "grid — a dynamic pivot would silently drop absent types and "
    "bias r); the unpivoted day×type frame self-joins on day with "
    "typ_a < typ_b giving each unordered pair once; moments are "
    "DECIMAL(38,0)-exact and r comes from the shared q235 "
    "expression (floor-e6, zero-variance pinned to 0). Shape: one "
    "corpus-sized day agg; everything after is day-grain × a "
    "constant type count.",
)
def q239(spark: SparkSession, sf: str) -> DataFrame:
    d = (
        table(spark, sf, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            *[
                F.sum((F.col("event_type") == t).cast("int"))
                .alias(f"c_{t}")
                for t in EVENT_TYPES
            ]
        )
    )
    stack = ", ".join(f"'{t}', c_{t}" for t in EVENT_TYPES)
    u = d.select(
        "day",
        F.expr(
            f"stack({len(EVENT_TYPES)}, {stack}) AS (typ, cnt)"
        ),
    ).localCheckpoint(eager=True)
    a = u.select("day", F.col("typ").alias("type_a"),
                 F.col("cnt").alias("ca"))
    b = u.select(F.col("day").alias("day_b"),
                 F.col("typ").alias("type_b"),
                 F.col("cnt").alias("cb"))
    j = (
        a.join(
            b,
            (F.col("day") == F.col("day_b"))
            & (F.col("type_a") < F.col("type_b")),
        )
        .groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("ca").cast("double").alias("sx"),
            F.sum("cb").cast("double").alias("sy"),
            F.expr(
                "CAST(SUM(CAST(ca AS DECIMAL(38,0)) * cb) AS DOUBLE)"
            ).alias("sxy"),
            F.expr(
                "CAST(SUM(CAST(ca AS DECIMAL(38,0)) * ca) AS DOUBLE)"
            ).alias("sx2"),
            F.expr(
                "CAST(SUM(CAST(cb AS DECIMAL(38,0)) * cb) AS DOUBLE)"
            ).alias("sy2"),
        )
    )
    return j.select(
        "type_a",
        "type_b",
        F.col("n").cast("bigint").alias("n_days"),
        F.expr(_XCORR_R).alias("r_e6"),
    ).orderBy("type_a", "type_b")


#: temperature-mix ppm budget (weights sum EXACTLY to this)
MIX_PPM = 1_000_000


@register(
    "q240_temperature_mix",
    oracle=f"""
        WITH m AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n
            FROM documents GROUP BY source
        ),
        w AS (
            SELECT source, n, sqrt(CAST(n AS DOUBLE)) AS ns FROM m
        ),
        t AS (SELECT SUM(CAST(ns AS DECIMAL(28,6))) AS tns FROM w),
        alloc AS (
            SELECT source, n,
                   CAST(FLOOR(ns * {MIX_PPM}
                        / CAST(t.tns AS DOUBLE)) AS BIGINT) AS base,
                   ns * {MIX_PPM} / CAST(t.tns AS DOUBLE)
                       - FLOOR(ns * {MIX_PPM}
                               / CAST(t.tns AS DOUBLE)) AS rem
            FROM w CROSS JOIN t
        ),
        ranked AS (
            SELECT source, n, base,
                   ROW_NUMBER() OVER (ORDER BY rem DESC, source)
                       AS rr,
                   {MIX_PPM} - SUM(base) OVER () AS short
            FROM alloc
        )
        SELECT source, n AS n_docs,
               CAST(base + CASE WHEN rr <= short THEN 1 ELSE 0 END
                    AS BIGINT) AS weight_ppm
        FROM ranked ORDER BY source
    """,
    doc="Temperature-scaled source-mixing weights (the multilingual-"
    "LM sampling design: w_s ∝ p_s^(1/T), here T=2 so the exponent "
    "is 0.5): sqrt damps the big sources and boosts the small ones "
    "before drawing a training mixture. Exponent 0.5 is computed "
    "via sqrt — IEEE-correctly-rounded in every engine — because "
    "general pow(x, α) is NOT correctly rounded cross-libm and "
    "could flip a largest-remainder tie; a production α ≠ 0.5 "
    "would floor-scale exp(α·ln p) and accept the documented ulp "
    "risk. Normalization uses the q226 largest-remainder contract "
    "(floor + top-remainder bonus, source tiebreak), so the ppm "
    "weights are integers summing EXACTLY to 1e6 — hash-stable and "
    "directly usable as sampling thresholds by the q90/q188 "
    "md5-threshold assigners. Shape: one corpus-sized source agg; "
    "the allocation windows run at source grain (constant).",
)
def q240(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    m = (
        table(spark, sf, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .withColumn("ns", F.sqrt(F.col("n").cast("double")))
    )
    t = m.agg(
        F.sum(F.col("ns").cast("decimal(28,6)")).alias("tns")
    )
    alloc = m.crossJoin(F.broadcast(t)).select(
        "source",
        "n",
        F.floor(
            F.col("ns") * MIX_PPM / F.col("tns").cast("double")
        ).cast("bigint").alias("base"),
        (
            F.col("ns") * MIX_PPM / F.col("tns").cast("double")
            - F.floor(
                F.col("ns") * MIX_PPM / F.col("tns").cast("double")
            )
        ).alias("rem"),
    )
    w_r = Window.orderBy(F.col("rem").desc(), F.col("source"))
    ranked = alloc.select(
        "source",
        "n",
        "base",
        F.row_number().over(w_r).alias("rr"),
        (F.lit(MIX_PPM) - F.sum("base").over(
            Window.partitionBy()
        )).alias("short"),
    )
    return ranked.select(
        "source",
        F.col("n").alias("n_docs"),
        (
            F.col("base")
            + F.when(F.col("rr") <= F.col("short"), 1).otherwise(0)
        ).cast("bigint").alias("weight_ppm"),
    ).orderBy("source")


# --------------------------------------------------------------------
# Round 7, batch 2: lossless similarity join, seasonal anomaly flags,
# embedding drift, and the sweep-line concurrency curve.
# --------------------------------------------------------------------

#: q241 similarity threshold as an exact rational (tau = 1/2): float
#: tau would make ceil(tau*n) and the final test engine-dependent at
#: boundaries; integer arithmetic cannot disagree
PF_TAU_NUM, PF_TAU_DEN = 1, 2

#: q241 oracle-twin subset bound (the q42/q138 convention: the oracle
#: states the quadratic SPEC, so it runs on a capped doc set; the
#: prefix-filter ALGORITHM is subset-free and is the scale path)
PF_DOC_LIMIT = 300


@register(
    "q241_prefix_filter_join",
    oracle=f"""
        WITH docs AS (SELECT * FROM documents
                      WHERE doc_id < {PF_DOC_LIMIT}),
        tokens AS (
            SELECT DISTINCT doc_id, tok FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM docs) WHERE tok <> ''),
        sizes AS (SELECT doc_id, COUNT(*) AS n
                  FROM tokens GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
            FROM tokens a JOIN tokens b
              ON a.tok = b.tok AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id)
        SELECT da, db,
               ROUND(i * 1.0 / (sa.n + sb.n - i), 4) AS j
        FROM inter
        JOIN sizes sa ON sa.doc_id = da
        JOIN sizes sb ON sb.doc_id = db
        WHERE ({PF_TAU_DEN} + {PF_TAU_NUM}) * i
              >= {PF_TAU_NUM} * (sa.n + sb.n)
        ORDER BY da, db
    """,
    doc="EXACT Jaccard >= 1/2 similarity join via prefix filtering "
    "(the PPJoin/AllPairs family, operators/dedup.prefix_filter_"
    "pairs): docs' tokens are ordered by global rarity, only the "
    "first n - ceil(tau*n) + 1 (the prefix) generate candidates, "
    "and the prefix lemma guarantees NO qualifying pair is lost — "
    "the lossless alternative to MinHash-LSH (q46) when recall must "
    "be 1.0 (legal holds, exact-dedup contracts). The oracle states "
    "the brute-force quadratic SPEC on a capped subset; algorithm "
    "vs spec equality is the losslessness proof, re-attested at "
    "every scale. Thresholds are integer-exact ((den+num)*i >= "
    "num*(na+nb)); j is presentation-rounded. Scale shape: the "
    "candidate join fans out on RARE tokens only (df-ascending "
    "prefix), so cost tracks rare-df^2, not stopword-df^2; all "
    "windows are doc-grain.",
)
def q241(spark: SparkSession, sf: str) -> DataFrame:
    from speculare_pgcdc_spark.queries.llm import _docs_subset

    tok = dd.tokens(_docs_subset(spark, sf, limit_id=PF_DOC_LIMIT))
    return dd.prefix_filter_pairs(
        tok, PF_TAU_NUM, PF_TAU_DEN
    ).orderBy("da", "db")


#: q242 anomaly threshold |z| >= Z_NUM/Z_DEN (= 1.5), tested exactly
#: as Z_DEN^2 * (n*x - S)^2 >= Z_NUM^2 * (n*Q - S^2) in integers.
#: NB the fixture's (type, dow) strata hold ~4-5 days and a sample
#: z-score is bounded by sqrt(n-1) ~= 1.7-2.0, so a 2.0 threshold
#: would be VACUOUS (flag nothing at every scale); 1.5 keeps the
#: gate discriminating in-fixture while the integer form accepts any
#: rational threshold in production
Z_NUM, Z_DEN = 3, 2


@register(
    "q242_seasonal_anomaly",
    oracle=f"""
        WITH d AS (
            SELECT CAST(ts AS DATE) AS day,
                   event_type,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY day, event_type
        ),
        g AS (
            -- dayofweek: DuckDB is 0-based (Sun=0), Spark 1-based
            -- (Sun=1); +1 aligns the stratum labels
            SELECT event_type,
                   CAST(dayofweek(day) + 1 AS BIGINT) AS dow,
                   day, x,
                   COUNT(*) OVER w AS n,
                   SUM(CAST(x AS DECIMAL(38,0))) OVER w AS s,
                   SUM(CAST(x AS DECIMAL(38,0)) * x) OVER w AS q
            FROM d
            WINDOW w AS (PARTITION BY event_type, dayofweek(day))
        ),
        f AS (
            SELECT event_type, dow, day, x, n, s, q,
                   (n * q - s * s) AS nvar,
                   (n * CAST(x AS DECIMAL(38,0)) - s) AS dev
            FROM g
        )
        SELECT event_type,
               CAST(dow AS BIGINT) AS dow,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(CASE WHEN nvar > 0
                         AND {Z_DEN * Z_DEN} * dev * dev
                             >= {Z_NUM * Z_NUM} * nvar
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
               CAST(FLOOR(MAX(CASE WHEN nvar > 0 THEN
                    abs(CAST(dev AS DOUBLE))
                    / sqrt(CAST(nvar AS DOUBLE)) ELSE 0 END)
                    * 10000) AS BIGINT) AS max_absz_e4
        FROM f GROUP BY event_type, dow
        ORDER BY event_type, dow
    """,
    doc="Seasonally-adjusted anomaly flags: each (event_type, "
    "day-of-week) stratum's daily counts are z-scored against the "
    "stratum's own mean/std (the q181 seasonal-profile insight made "
    "operational — Monday dips are not anomalies, Monday-shaped "
    "Fridays are). The |z| >= 3/2 flag is INTEGER-exact: z^2 >= 9/4 "
    "rewrites to 4*(n*x - S)^2 >= 9*(n*Q - S^2) over DECIMAL(38,0) "
    "moments, so no sqrt or division can flip a boundary day between "
    "engines; zero-variance strata are pinned unflagged (their only "
    "possible dev is 0, which the >= would flag vacuously). max|z| "
    "is floor-e4 presentation from the same exact integers. Shape: "
    "one corpus-sized (day,type) agg; stratum windows run at "
    "day-grain x 5 types x 7 dows.",
)
def q242(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    d = (
        table(spark, sf, "events")
        .groupBy(
            F.to_date("ts").alias("day"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    w = Window.partitionBy("event_type", F.dayofweek("day"))
    g = d.select(
        "event_type",
        F.dayofweek("day").cast("bigint").alias("dow"),
        "day",
        "x",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).over(w).alias("s"),
        F.sum(
            F.col("x").cast("decimal(38,0)") * F.col("x")
        ).over(w).alias("q"),
    )
    f = g.select(
        "event_type",
        "dow",
        "x",
        "n",
        (F.col("n") * F.col("q") - F.col("s") * F.col("s"))
        .alias("nvar"),
        (F.col("n") * F.col("x").cast("decimal(38,0)") - F.col("s"))
        .alias("dev"),
    )
    flagged = F.when(
        (F.col("nvar") > 0)
        & (
            F.lit(Z_DEN * Z_DEN) * F.col("dev") * F.col("dev")
            >= F.lit(Z_NUM * Z_NUM) * F.col("nvar")
        ),
        1,
    ).otherwise(0)
    absz = F.when(
        F.col("nvar") > 0,
        F.abs(F.col("dev").cast("double"))
        / F.sqrt(F.col("nvar").cast("double")),
    ).otherwise(F.lit(0.0))
    return (
        f.groupBy("event_type", "dow")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum(flagged).cast("bigint").alias("n_anomalies"),
            F.floor(F.max(absz) * 10000).cast("bigint")
            .alias("max_absz_e4"),
        )
        .orderBy("event_type", "dow")
    )


#: q243: a dimension counts as drifted when the 6-decimal means of
#: the two halves differ by >= this many e-6 units (exact integers)
DRIFT_E6_THRESH = 1000


@register(
    "q243_embedding_drift",
    oracle=f"""
        WITH e AS (
            SELECT vec_id % 2 AS half,
                   CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings WHERE vec_id <> 0
        ),
        m AS (
            SELECT half, pos, round(avg(v[pos]), 6) AS m
            FROM e, UNNEST(generate_series(1, 64)) AS u(pos)
            GROUP BY half, pos
        ),
        p AS (
            SELECT a.pos,
                   CAST(a.m AS DECIMAL(19,6)) AS mo,
                   CAST(b.m AS DECIMAL(19,6)) AS mn
            FROM m a JOIN m b ON a.pos = b.pos
            WHERE a.half = 0 AND b.half = 1
        ),
        s AS (
            SELECT SUM(CAST(mo * mn AS DECIMAL(38,12))) AS dot,
                   SUM(CAST(mo * mo AS DECIMAL(38,12))) AS no,
                   SUM(CAST(mn * mn AS DECIMAL(38,12))) AS nn,
                   MAX(abs(CAST((mo - mn) * 1000000 AS BIGINT)))
                       AS max_shift_e6,
                   SUM(CASE WHEN abs(CAST((mo - mn) * 1000000
                            AS BIGINT)) >= {DRIFT_E6_THRESH}
                       THEN 1 ELSE 0 END) AS n_dims_drifted
            FROM p
        ),
        c AS (
            SELECT CAST(FLOOR(CAST(dot AS DOUBLE)
                   / (sqrt(CAST(no AS DOUBLE))
                      * sqrt(CAST(nn AS DOUBLE))) * 1000000)
                   AS BIGINT) AS centroid_cos_e6,
                   max_shift_e6, n_dims_drifted
            FROM s
        )
        SELECT (SELECT COUNT(*) FROM e WHERE half = 0) AS n_old,
               (SELECT COUNT(*) FROM e WHERE half = 1) AS n_new,
               centroid_cos_e6,
               CAST(max_shift_e6 AS BIGINT) AS max_shift_e6,
               CAST(n_dims_drifted AS BIGINT) AS n_dims_drifted
        FROM c
    """,
    doc="Embedding drift between two corpus halves (vec_id parity "
    "stands in for before/after — in production the split is a "
    "snapshot date): per-dimension 6-decimal-rounded means (the q85 "
    "determinism contract) are compared as DECIMAL(19,6) — diffs, "
    "the e-6 shift integers, and all three centroid moments "
    "(dot/norms as DECIMAL(38,12) sums of exact 12-decimal "
    "products) are ORDER-FREE EXACT, so the drifted-dimension count "
    "and max shift cannot waver with aggregation order; only the "
    "final cosine division is floating (identical doubles both "
    "sides, floor-e6). The monitoring primitive behind 'did the "
    "embedding model or the corpus move under us' — run per "
    "ingestion batch, alert on centroid_cos or n_dims_drifted. "
    "Shape: one posexplode agg to (2 x 64) grain; everything after "
    "is constant-size.",
)
def q243(spark: SparkSession, sf: str) -> DataFrame:
    e = (
        table(spark, sf, "embeddings")
        .filter(F.col("vec_id") != 0)
        .select(
            (F.col("vec_id") % 2).alias("half"),
            F.posexplode("embedding").alias("pos0", "val"),
        )
    )
    m = (
        e.groupBy("half", (F.col("pos0") + 1).alias("pos"))
        .agg(
            F.round(F.avg(F.col("val").cast("double")), 6).alias("m")
        )
    )
    a = m.filter(F.col("half") == 0).select(
        "pos", F.col("m").cast("decimal(19,6)").alias("mo")
    )
    b = m.filter(F.col("half") == 1).select(
        F.col("pos").alias("pos_b"),
        F.col("m").cast("decimal(19,6)").alias("mn"),
    )
    p = a.join(b, F.col("pos") == F.col("pos_b"))
    shift = F.abs(
        ((F.col("mo") - F.col("mn")) * 1000000).cast("bigint")
    )
    s = p.agg(
        F.sum(
            (F.col("mo") * F.col("mn")).cast("decimal(38,12)")
        ).alias("dot"),
        F.sum(
            (F.col("mo") * F.col("mo")).cast("decimal(38,12)")
        ).alias("no"),
        F.sum(
            (F.col("mn") * F.col("mn")).cast("decimal(38,12)")
        ).alias("nn"),
        F.max(shift).alias("max_shift_e6"),
        F.sum(
            (shift >= DRIFT_E6_THRESH).cast("int")
        ).alias("n_dims_drifted"),
    )
    counts = (
        table(spark, sf, "embeddings")
        .filter(F.col("vec_id") != 0)
        .agg(
            F.sum((F.col("vec_id") % 2 == 0).cast("int"))
            .cast("bigint").alias("n_old"),
            F.sum((F.col("vec_id") % 2 == 1).cast("int"))
            .cast("bigint").alias("n_new"),
        )
    )
    cos = F.floor(
        F.col("dot").cast("double")
        / (
            F.sqrt(F.col("no").cast("double"))
            * F.sqrt(F.col("nn").cast("double"))
        )
        * 1000000
    ).cast("bigint")
    return (
        s.crossJoin(F.broadcast(counts))
        .select(
            "n_old",
            "n_new",
            cos.alias("centroid_cos_e6"),
            F.col("max_shift_e6").cast("bigint").alias("max_shift_e6"),
            F.col("n_dims_drifted").cast("bigint")
            .alias("n_dims_drifted"),
        )
    )


#: q244 synthetic interval duration: 1 + key % this many days (the
#: fixtures carry no close date; the SWEEP-LINE is the operator under
#: test, the duration rule just has to be deterministic)
CONC_DUR_MOD = 28


@register(
    "q244_concurrency_sweepline",
    oracle=f"""
        WITH iv AS (
            SELECT CAST(o_orderdate AS DATE) AS s,
                   CAST(o_orderdate AS DATE)
                       + CAST(1 + o_orderkey % {CONC_DUR_MOD}
                              AS INTEGER) AS e
            FROM orders
        ),
        deltas AS (
            SELECT s AS day, 1 AS d FROM iv
            UNION ALL
            SELECT e AS day, -1 AS d FROM iv
        ),
        byday AS (
            SELECT day, CAST(SUM(d) AS BIGINT) AS delta
            FROM deltas GROUP BY day
        )
        SELECT day,
               delta,
               CAST(SUM(delta) OVER (ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS open_count
        FROM byday ORDER BY day
    """,
    doc="Interval concurrency curve by sweep line: how many orders "
    "are OPEN on each day (open interval [start, start + 1 + "
    f"key % {CONC_DUR_MOD} days) — a deterministic synthetic close "
    "date; production supplies a real one). The naive form is an "
    "interval self-overlap join (quadratic in busy windows; q14's "
    "shape); the sweep line is the linear rewrite: every interval "
    "becomes a +1 at its start day and a -1 at its end day, one "
    "day-grain agg collapses the corpus, and a running sum over the "
    "day axis reconstructs the exact concurrency at every day. The "
    "one unpartitioned window is DAY-grain (thousands of rows at "
    "any corpus size — the q234/history.py sanctioned exception), "
    "never data-grain. This is the occupancy/backlog primitive "
    "behind connection-pool sizing, WIP limits, and hotel-calendar "
    "questions.",
)
def q244(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    iv = table(spark, sf, "orders").select(
        F.to_date("o_orderdate").alias("s"),
        F.date_add(
            F.to_date("o_orderdate"),
            (1 + F.col("o_orderkey") % CONC_DUR_MOD).cast("int"),
        ).alias("e"),
    )
    deltas = iv.select(F.col("s").alias("day"), F.lit(1).alias("d")).unionAll(
        iv.select(F.col("e").alias("day"), F.lit(-1).alias("d"))
    )
    byday = deltas.groupBy("day").agg(
        F.sum("d").cast("bigint").alias("delta")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return byday.select(
        "day",
        "delta",
        F.sum("delta").over(w).cast("bigint").alias("open_count"),
    ).orderBy("day")


# --------------------------------------------------------------------
# Round 7, batch 3: per-group exact quantile bands, daily concentration
# (HHI), and balanced stratified k-fold assignment.
# --------------------------------------------------------------------

#: q245 quantile points (percent, type-1 / lower order statistic at
#: position ceil(p*n/100) — integer-exact, no interpolation convention
#: to disagree on)
QBAND_PTS = [25, 50, 75, 95]


@register(
    "q245_group_quantile_bands",
    oracle=f"""
        WITH r AS (
            SELECT source, n_chars,
                   ROW_NUMBER() OVER (PARTITION BY source
                       ORDER BY n_chars, doc_id) AS rn,
                   COUNT(*) OVER (PARTITION BY source) AS n
            FROM documents
        )
        SELECT source,
               CAST(MAX(n) AS BIGINT) AS n_docs,
               {", ".join(
                   f"CAST(MAX(CASE WHEN rn = ({p} * n + 99) // 100 "
                   f"THEN n_chars END) AS BIGINT) AS p{p}"
                   for p in QBAND_PTS)}
        FROM r GROUP BY source ORDER BY source
    """,
    doc="Exact per-group quantile bands (P25/P50/P75/P95 of document "
    "length per source) as type-1 order statistics: position "
    "ceil(p*n/100) computed in integers ((p*n + 99) DIV 100), the "
    "value at that rank selected by conditional aggregation — no "
    "quantile-interpolation convention exists to diverge on, unlike "
    "percentile_cont/approx_percentile (q77 is the sketch tier; "
    "this is the exact tier for the per-source length profile a "
    "curriculum/packing design needs). Ranking windows are "
    "PARTITIONED by source, so per-group work is group-sized; ties "
    "in n_chars are totalized by doc_id but the value at any rank "
    "is tie-invariant. One shuffle on source.",
)
def q245(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wn = Window.partitionBy("source")
    r = table(spark, sf, "documents").select(
        "source",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    aggs = [F.max("n").cast("bigint").alias("n_docs")]
    for p in QBAND_PTS:
        pos = F.expr(f"({p} * n + 99) DIV 100")
        aggs.append(
            F.max(
                F.when(F.col("rn") == pos, F.col("n_chars"))
            ).cast("bigint").alias(f"p{p}")
        )
    return (
        r.groupBy("source").agg(*aggs).orderBy("source")
    )


@register(
    "q246_hhi_concentration",
    oracle="""
        WITH u AS (
            SELECT CAST(ts AS DATE) AS day, user_id,
                   CAST(COUNT(*) AS DECIMAL(38,0)) AS c
            FROM events GROUP BY day, user_id
        ),
        d AS (
            SELECT day,
                   CAST(COUNT(*) AS BIGINT) AS n_users,
                   SUM(c) AS total,
                   SUM(c * c) AS sq,
                   MAX(c) AS cmax
            FROM u GROUP BY day
        )
        SELECT day,
               n_users,
               CAST(total AS BIGINT) AS n_events,
               -- HUGEINT // HUGEINT: true integer division. DECIMAL //
               -- in DuckDB rounds the decimal quotient BEFORE flooring
               -- (off-by-one vs Spark's truncating DIV near .999 edges)
               CAST(CAST(1000000 * sq AS HUGEINT)
                    // CAST(total * total AS HUGEINT) AS BIGINT)
                   AS hhi_ppm,
               CAST(CAST(1000000 * cmax AS HUGEINT)
                    // CAST(total AS HUGEINT) AS BIGINT)
                   AS top_user_share_ppm
        FROM d ORDER BY day
    """,
    doc="Daily traffic concentration: the Herfindahl-Hirschman index "
    "of per-user event shares, HHI = sum_u (c_u/C)^2 — the bot/"
    "crawler-domination monitor (a day where one scraper is 40% of "
    "traffic jumps out as hhi_ppm even when total volume looks "
    "normal; 1/n_users <= HHI <= 1). Computed INTEGER-exact: "
    "(1e6 * sum c^2) DIV C^2 over DECIMAL(38,0) sums — no float "
    "shares to round differently. Shape: one (day, user) agg (the "
    "corpus-sized shuffle), then a day-grain agg; both map-side "
    "combinable, no window, no join.",
)
def q246(spark: SparkSession, sf: str) -> DataFrame:
    u = (
        table(spark, sf, "events")
        .groupBy(F.to_date("ts").alias("day"), "user_id")
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("c"))
    )
    d = u.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("c").alias("total"),
        F.sum(F.col("c") * F.col("c")).alias("sq"),
        F.max("c").alias("cmax"),
    )
    return d.select(
        "day",
        "n_users",
        F.col("total").cast("bigint").alias("n_events"),
        F.expr("CAST((1000000 * sq) DIV (total * total) AS BIGINT)")
        .alias("hhi_ppm"),
        F.expr("CAST((1000000 * cmax) DIV total AS BIGINT)")
        .alias("top_user_share_ppm"),
    ).orderBy("day")


#: q247 fold count
KFOLD_K = 5


@register(
    "q247_stratified_kfold",
    oracle=f"""
        WITH r AS (
            SELECT source, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY source
                       ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn
            FROM documents
        )
        SELECT source,
               CAST((rn - 1) % {KFOLD_K} AS BIGINT) AS fold,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CAST(doc_id AS HUGEINT))
                    % 1000000000000000000 AS BIGINT) AS id_checksum
        FROM r GROUP BY source, fold ORDER BY source, fold
    """,
    doc=f"Balanced stratified {KFOLD_K}-fold cross-validation "
    "assignment: within each source stratum, docs are md5-rank "
    "shuffled (deterministic, the q90/q188 assignment convention) "
    "and dealt round-robin — fold sizes within a stratum differ by "
    "at most 1 BY CONSTRUCTION (a pure hash-mod fold, by contrast, "
    "is only balanced in expectation and wobbles per stratum). "
    "Output pins membership, not just counts: the per-(source, "
    "fold) id checksum is the q196 order-free digest, so a changed "
    "assignment cannot hash-match. q188 is the one-shot "
    "train/val/test splitter; this is its K-fold companion for "
    "eval protocols. Ranking windows are source-partitioned; one "
    "shuffle.",
)
def q247(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    r = table(spark, sf, "documents").select(
        "source",
        "doc_id",
        F.row_number().over(w).alias("rn"),
    )
    return (
        r.select(
            "source",
            ((F.col("rn") - 1) % KFOLD_K).cast("bigint").alias("fold"),
            "doc_id",
        )
        .groupBy("source", "fold")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            (
                F.sum(F.col("doc_id").cast("decimal(38,0)"))
                % F.lit(10 ** 18).cast("decimal(38,0)")
            ).cast("bigint").alias("id_checksum"),
        )
        .orderBy("source", "fold")
    )


# --------------------------------------------------------------------
# Round 7, batch 4: classifier-vs-label confusion matrix and the
# two-tier (checksum -> row diff) replica reconciliation composite.
# --------------------------------------------------------------------


@register(
    "q248_langid_confusion",
    oracle="""
        WITH p AS (
            SELECT lang,
                   CASE WHEN contains(' ' || text || ' ', ' the ')
                            THEN 'en'
                        WHEN contains(' ' || text || ' ', ' der ')
                            THEN 'de'
                        WHEN contains(' ' || text || ' ', ' el ')
                            THEN 'es'
                        WHEN contains(' ' || text || ' ', ' le ')
                            THEN 'fr'
                        ELSE 'unk' END AS guess
            FROM documents
        ),
        c AS (
            SELECT lang, guess, CAST(COUNT(*) AS BIGINT) AS n
            FROM p GROUP BY lang, guess
        ),
        t AS (
            SELECT lang, SUM(n) AS total FROM c GROUP BY lang
        )
        SELECT c.lang, c.guess, c.n,
               CAST(CAST(1000000 * c.n AS HUGEINT)
                    // CAST(t.total AS HUGEINT) AS BIGINT)
                   AS row_share_ppm
        FROM c JOIN t USING (lang)
        ORDER BY lang, guess
    """,
    doc="Language-ID confusion matrix: the q49 marker-token classifier "
    "evaluated against the fixture's ground-truth lang column — per "
    "(true, predicted) cell count plus its integer-exact share of "
    "the true-label row ((1e6*n) DIV total; the diagonal shares ARE "
    "per-class recall in ppm). The eval loop every corpus classifier "
    "needs before its labels gate anything (q50 quality, q90 "
    "sampling): a heuristic upgrade lands with a before/after "
    "confusion diff. Shape: one narrow classify map over the scan + "
    "a (langs x guesses)-grain agg + a broadcast-size totals join; "
    "no window.",
)
def q248(spark: SparkSession, sf: str) -> DataFrame:
    from speculare_pgcdc_spark.operators import textstats as ts

    c = (
        table(spark, sf, "documents")
        .select("lang", ts.lang_guess(F.col("text")).alias("guess"))
        .groupBy("lang", "guess")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=True)
    )
    t = c.groupBy("lang").agg(F.sum("n").alias("total"))
    return (
        c.join(F.broadcast(t), "lang")
        .select(
            "lang",
            "guess",
            "n",
            F.expr(
                "CAST((1000000 * n) DIV total AS BIGINT)"
            ).alias("row_share_ppm"),
        )
        .orderBy("lang", "guess")
    )


#: q249 perturbed key range (contiguous, so RANGE-banded buckets show
#: real confinement: only the bands containing the range — plus the
#: late-insert band — diverge, at every fixture scale)
RECON_LO, RECON_HI = 1000, 1200

#: q249 key-band width (bucket = key DIV width; q196 uses % for its
#: id-band demo, but reconciliation wants RANGE bands so contiguous
#: damage stays in few buckets)
RECON_BAND = 256


@register(
    "q249_bucket_reconcile",
    oracle=f"""
        WITH old AS (
            SELECT o_orderkey AS k,
                   o_orderkey // {RECON_BAND} AS b,
                   {_diff_rowhash_sql('o_totalprice')} AS h
            FROM orders
        ),
        new AS (
            SELECT o_orderkey AS k,
                   o_orderkey // {RECON_BAND} AS b,
                   {_diff_rowhash_sql(
                       'o_totalprice + CASE WHEN o_orderkey >= '
                       + str(RECON_LO) + ' AND o_orderkey < '
                       + str(RECON_HI)
                       + ' AND o_orderkey % 3 = 1 THEN 1.5 ELSE 0 '
                       + 'END')} AS h
            FROM orders
            WHERE NOT (o_orderkey >= {RECON_LO}
                       AND o_orderkey < {RECON_HI}
                       AND o_orderkey % 3 = 0)
            UNION ALL
            SELECT o_orderkey + 100000000 AS k,
                   (o_orderkey + 100000000) // {RECON_BAND} AS b,
                   {_diff_rowhash_sql('o_totalprice')} AS h
            FROM orders
            WHERE o_orderkey >= {RECON_LO}
              AND o_orderkey < {RECON_HI}
              AND o_orderkey % 3 = 2
        ),
        co AS (
            SELECT b, COUNT(*) AS n,
                   SUM(CAST(h AS HUGEINT))
                       % 1000000000000000000 AS cs
            FROM old GROUP BY b
        ),
        cn AS (
            SELECT b, COUNT(*) AS n,
                   SUM(CAST(h AS HUGEINT))
                       % 1000000000000000000 AS cs
            FROM new GROUP BY b
        ),
        div AS (
            SELECT COALESCE(co.b, cn.b) AS b
            FROM co FULL OUTER JOIN cn ON co.b = cn.b
            WHERE co.b IS NULL OR cn.b IS NULL
               OR co.n <> cn.n OR co.cs <> cn.cs
        ),
        d AS (
            SELECT CASE WHEN o.k IS NULL THEN 'added'
                        WHEN n.k IS NULL THEN 'removed'
                        WHEN o.h <> n.h THEN 'changed'
                        ELSE 'unchanged' END AS ct
            FROM (SELECT * FROM old WHERE b IN (SELECT b FROM div)) o
            FULL OUTER JOIN
                 (SELECT * FROM new WHERE b IN (SELECT b FROM div)) n
              ON o.k = n.k
        )
        SELECT (SELECT COUNT(*) FROM co) AS n_buckets,
               (SELECT COUNT(*) FROM div) AS n_divergent,
               CAST(SUM(CASE WHEN ct = 'added' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_added,
               CAST(SUM(CASE WHEN ct = 'removed' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_removed,
               CAST(SUM(CASE WHEN ct = 'changed' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_changed,
               CAST(COUNT(*) AS BIGINT) AS rows_compared
        FROM d
    """,
    doc="Two-tier replica reconciliation — the composition q196 and "
    "q238 document separately, executed as one plan: tier 1 "
    "checksums RANGE-banded key buckets on both sides (two linear "
    "scans, band-grain compare), tier 2 runs the row-level keyed "
    "diff ONLY inside divergent bands. The replica here carries a "
    f"deterministic contiguous damage window (keys {RECON_LO}.."
    f"{RECON_HI}: every 3rd removed / drifted / late-inserted at a "
    "key offset), so at every fixture scale most bands compare "
    "clean and rows_compared stays a small fraction of the table — "
    "the confinement that makes 100 TB replica verification "
    "affordable (without it the keyed full-outer join touches "
    "every row; with it, only damaged bands shuffle). All digests "
    "and checksums are the q196 float-free order-free convention.",
)
def q249(spark: SparkSession, sf: str) -> DataFrame:
    def rowhash(price: F.Column) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("o_orderkey").cast("string"),
                        F.col("o_custkey").cast("string"),
                        F.col("o_orderstatus"),
                        F.floor(price * 100).cast("bigint")
                        .cast("string"),
                        F.col("o_orderdate").cast("date")
                        .cast("string"),
                        F.col("o_orderpriority"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("bigint")

    orders = table(spark, sf, "orders")
    in_rng = (F.col("o_orderkey") >= RECON_LO) & (
        F.col("o_orderkey") < RECON_HI
    )
    old = orders.select(
        F.col("o_orderkey").alias("k"),
        F.expr(f"o_orderkey DIV {RECON_BAND}").alias("b"),
        rowhash(F.col("o_totalprice")).alias("h"),
    ).localCheckpoint(eager=True)
    drift = F.col("o_totalprice") + F.when(
        in_rng & (F.col("o_orderkey") % 3 == 1), F.lit(1.5)
    ).otherwise(F.lit(0.0))
    new = (
        orders.filter(~(in_rng & (F.col("o_orderkey") % 3 == 0)))
        .select(
            F.col("o_orderkey").alias("k"),
            F.expr(f"o_orderkey DIV {RECON_BAND}").alias("b"),
            rowhash(drift).alias("h"),
        )
        .unionAll(
            orders.filter(in_rng & (F.col("o_orderkey") % 3 == 2))
            .select(
                (F.col("o_orderkey") + 100000000).alias("k"),
                F.expr(
                    f"(o_orderkey + 100000000) DIV {RECON_BAND}"
                ).alias("b"),
                rowhash(F.col("o_totalprice")).alias("h"),
            )
        )
        .localCheckpoint(eager=True)
    )

    def bucket_sums(df):
        return df.groupBy("b").agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.col("h").cast("decimal(38,0)"))
                % F.lit(10 ** 18).cast("decimal(38,0)")
            ).alias("cs"),
        )

    co = bucket_sums(old)
    cn = bucket_sums(new)
    div = (
        co.alias("o")
        .join(cn.alias("n"), F.col("o.b") == F.col("n.b"), "full_outer")
        .filter(
            F.col("o.b").isNull()
            | F.col("n.b").isNull()
            | (F.col("o.n") != F.col("n.n"))
            | (F.col("o.cs") != F.col("n.cs"))
        )
        .select(F.coalesce(F.col("o.b"), F.col("n.b")).alias("b"))
        .localCheckpoint(eager=True)
    )
    od = old.join(F.broadcast(div), "b", "left_semi")
    nd = new.join(F.broadcast(div), "b", "left_semi")
    d = od.alias("o").join(
        nd.alias("n"), F.col("o.k") == F.col("n.k"), "full_outer"
    ).select(
        F.when(F.col("o.k").isNull(), "added")
        .when(F.col("n.k").isNull(), "removed")
        .when(F.col("o.h") != F.col("n.h"), "changed")
        .otherwise("unchanged")
        .alias("ct")
    )
    counts = d.agg(
        F.sum((F.col("ct") == "added").cast("int")).cast("bigint")
        .alias("n_added"),
        F.sum((F.col("ct") == "removed").cast("int")).cast("bigint")
        .alias("n_removed"),
        F.sum((F.col("ct") == "changed").cast("int")).cast("bigint")
        .alias("n_changed"),
        F.count(F.lit(1)).cast("bigint").alias("rows_compared"),
    )
    scalars = co.agg(F.count(F.lit(1)).alias("n_buckets")).crossJoin(
        F.broadcast(div.agg(F.count(F.lit(1)).alias("n_divergent")))
    )
    return (
        F.broadcast(scalars)
        .crossJoin(counts)
        .select(
            "n_buckets",
            "n_divergent",
            "n_added",
            "n_removed",
            "n_changed",
            "rows_compared",
        )
    )


# --------------------------------------------------------------------
# Round 7, batch 5: the LSH quality audit made hash-checkable — an
# md5-based MinHash whose ENTIRE pipeline (signatures, banding,
# candidate join, exact verify, recall/precision) mirrors into SQL,
# so the sketch-quality contract itself gets a driver-green row
# instead of a rows-only declaration.
# --------------------------------------------------------------------

#: q250 MinHash geometry: 16 md5-derived hashes in 4 bands x 4 rows
#: (s-curve threshold (1/4)^(1/4) ~= 0.71 — deliberately ABOVE the
#: tau=3/5 target so recall is a real <1 measurement, not vacuously 1)
MHQ_HASHES, MHQ_BANDS = 16, 4
MHQ_ROWS = MHQ_HASHES // MHQ_BANDS

#: q250 similarity threshold (exact rational, the q241 convention)
MHQ_NUM, MHQ_DEN = 3, 5

#: q250 audit subset bound (quality is estimated on a capped sample;
#: the production pipeline is q46's xxhash64 fast path, whose recall
#: this audit certifies)
MHQ_DOC_LIMIT = 1000


@register(
    "q250_minhash_quality",
    oracle=f"""
        WITH docs AS (SELECT * FROM documents
                      WHERE doc_id < {MHQ_DOC_LIMIT}),
        tokens AS (
            SELECT DISTINCT doc_id, tok FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM docs) WHERE tok <> ''),
        sizes AS (SELECT doc_id, COUNT(*) AS n
                  FROM tokens GROUP BY doc_id),
        hashes AS (
            SELECT doc_id, i,
                   CAST(concat('0x', substr(md5(
                       CAST(i AS VARCHAR) || ':' || tok), 1, 12))
                       AS BIGINT) AS h
            FROM tokens,
                 UNNEST(generate_series(0, {MHQ_HASHES - 1})) AS u(i)),
        sig AS (
            SELECT doc_id, i, MIN(h) AS m
            FROM hashes GROUP BY doc_id, i),
        bandkeys AS (
            SELECT doc_id, i // {MHQ_ROWS} AS band,
                   string_agg(m::VARCHAR, '|' ORDER BY i) AS bk
            FROM sig GROUP BY doc_id, i // {MHQ_ROWS}),
        cands AS (
            SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
            FROM bandkeys a JOIN bandkeys b
              ON a.band = b.band AND a.bk = b.bk
                 AND a.doc_id < b.doc_id),
        inter AS (
            SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
            FROM tokens a JOIN tokens b
              ON a.tok = b.tok AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id),
        scored AS (
            SELECT i.da, i.db,
                   ({MHQ_DEN} + {MHQ_NUM}) * i.i
                       >= {MHQ_NUM} * (sa.n + sb.n) AS is_dup
            FROM inter i
            JOIN sizes sa ON sa.doc_id = i.da
            JOIN sizes sb ON sb.doc_id = i.db),
        stats AS (
            SELECT
                (SELECT COUNT(*) FROM sizes) AS n_docs,
                (SELECT COUNT(*) FROM scored WHERE is_dup)
                    AS n_exact,
                (SELECT COUNT(*) FROM cands) AS n_candidates,
                (SELECT COUNT(*) FROM cands c JOIN scored s
                    ON c.da = s.da AND c.db = s.db WHERE s.is_dup)
                    AS n_verified)
        SELECT CAST(n_docs AS BIGINT) AS n_docs,
               CAST(n_exact AS BIGINT) AS n_exact,
               CAST(n_candidates AS BIGINT) AS n_candidates,
               CAST(n_verified AS BIGINT) AS n_verified,
               CAST(CAST(1000000 * n_verified AS HUGEINT)
                    // CAST(greatest(n_exact, 1) AS HUGEINT)
                    AS BIGINT) AS recall_ppm,
               CAST(CAST(1000000 * n_verified AS HUGEINT)
                    // CAST(greatest(n_candidates, 1) AS HUGEINT)
                    AS BIGINT) AS cand_precision_ppm
        FROM stats
    """,
    doc="MinHash-LSH quality audit, HASH-CHECKED end to end: an "
    f"md5-derived MinHash ({MHQ_HASHES} hashes, {MHQ_BANDS} bands x "
    f"{MHQ_ROWS} rows) is deterministic AND SQL-expressible, so the "
    "whole sketch pipeline — signatures, band keys, candidate "
    "self-join, exact verify — mirrors into the DuckDB oracle, and "
    "the recall/candidate-precision ppm of LSH against brute-force "
    "Jaccard >= 3/5 gets a driver-attestable row. This certifies "
    "the CONTRACT the rows-only q46 xxhash64 fast path rides on "
    "(same banding geometry reasoning; xxhash64 is JVM-only, which "
    "is why q46 itself is rows-only). The band s-curve threshold "
    "(1/4)^(1/4) ~= 0.71 sits above tau = 0.6, so measured recall "
    "is a real sub-1 number, not a vacuous 1.0. All ratios are "
    "integer-exact ppm (HUGEINT // in the oracle). Shape: one "
    "tokenize pass, one signature agg, a banded self-join bounded "
    "by bucket occupancy, candidate-only verify — the audit runs on "
    f"a doc_id < {MHQ_DOC_LIMIT} sample; at 100 TB you audit a "
    "sample, never the corpus.",
)
def q250(spark: SparkSession, sf: str) -> DataFrame:
    from speculare_pgcdc_spark.queries.llm import _docs_subset

    tok = dd.tokens(
        _docs_subset(spark, sf, limit_id=MHQ_DOC_LIMIT)
    ).localCheckpoint(eager=True)
    sizes = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))

    def h(i: int):
        return F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(str(i)), F.col("tok"))),
                1,
                12,
            ),
            16,
            10,
        ).cast("bigint")

    mins = [
        F.min(h(i)).alias(f"m{i}") for i in range(MHQ_HASHES)
    ]
    sig = tok.groupBy("doc_id").agg(*mins)
    bandcols = []
    for b in range(MHQ_BANDS):
        key = F.concat_ws(
            "|",
            *[
                F.col(f"m{i}").cast("string")
                for i in range(b * MHQ_ROWS, (b + 1) * MHQ_ROWS)
            ],
        )
        bandcols.append(
            F.struct(F.lit(b).alias("band"), key.alias("bk"))
        )
    buckets = sig.select(
        "doc_id", F.explode(F.array(*bandcols)).alias("s")
    ).select("doc_id", "s.band", "s.bk")
    cands = (
        buckets.alias("a")
        .join(
            buckets.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("da"),
            F.col("b.doc_id").alias("db"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    a = tok.select(F.col("doc_id").alias("da"), "tok")
    b = tok.select(F.col("doc_id").alias("db"), "tok")
    inter = (
        a.join(b, ["tok"])
        .filter(F.col("da") < F.col("db"))
        .groupBy("da", "db")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("da"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("db"), F.col("n").alias("nb"))
    scored = (
        inter.join(sa, "da")
        .join(sb, "db")
        .select(
            "da",
            "db",
            (
                F.lit(MHQ_DEN + MHQ_NUM) * F.col("i")
                >= F.lit(MHQ_NUM) * (F.col("na") + F.col("nb"))
            ).alias("is_dup"),
        )
        .localCheckpoint(eager=True)
    )
    n_docs = sizes.agg(F.count(F.lit(1)).alias("n_docs"))
    n_exact = scored.filter("is_dup").agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    n_cand = cands.agg(F.count(F.lit(1)).alias("n_candidates"))
    n_ver = (
        cands.join(scored, ["da", "db"])
        .filter("is_dup")
        .agg(F.count(F.lit(1)).alias("n_verified"))
    )
    return (
        n_docs.crossJoin(F.broadcast(n_exact))
        .crossJoin(F.broadcast(n_cand))
        .crossJoin(F.broadcast(n_ver))
        .select(
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("n_exact").cast("bigint").alias("n_exact"),
            F.col("n_candidates").cast("bigint")
            .alias("n_candidates"),
            F.col("n_verified").cast("bigint").alias("n_verified"),
            F.expr(
                "CAST((1000000 * n_verified) DIV greatest(n_exact, 1)"
                " AS BIGINT)"
            ).alias("recall_ppm"),
            F.expr(
                "CAST((1000000 * n_verified) DIV "
                "greatest(n_candidates, 1) AS BIGINT)"
            ).alias("cand_precision_ppm"),
        )
    )


# --------------------------------------------------------------------
# Round 7, batch 6: macro-F1 over the classifier confusion matrix and
# the cross-source duplicate-overlap matrix.
# --------------------------------------------------------------------


@register(
    "q251_macro_f1",
    oracle="""
        WITH p AS (
            SELECT lang,
                   CASE WHEN contains(' ' || text || ' ', ' the ')
                            THEN 'en'
                        WHEN contains(' ' || text || ' ', ' der ')
                            THEN 'de'
                        WHEN contains(' ' || text || ' ', ' el ')
                            THEN 'es'
                        WHEN contains(' ' || text || ' ', ' le ')
                            THEN 'fr'
                        ELSE 'unk' END AS guess
            FROM documents
        ),
        cls AS (
            SELECT lang AS c FROM p GROUP BY lang
        ),
        m AS (
            SELECT c.c,
                   (SELECT COUNT(*) FROM p
                    WHERE p.lang = c.c AND p.guess = c.c) AS tp,
                   (SELECT COUNT(*) FROM p
                    WHERE p.guess = c.c AND p.lang <> c.c) AS fp,
                   (SELECT COUNT(*) FROM p
                    WHERE p.lang = c.c AND p.guess <> c.c) AS fn
            FROM cls c
        ),
        f AS (
            SELECT c, tp, fp, fn,
                   CAST(CAST(1000000 * tp AS HUGEINT)
                        // CAST(greatest(tp + fp, 1) AS HUGEINT)
                        AS BIGINT) AS precision_ppm,
                   CAST(CAST(1000000 * tp AS HUGEINT)
                        // CAST(greatest(tp + fn, 1) AS HUGEINT)
                        AS BIGINT) AS recall_ppm,
                   CAST(CAST(1000000 * 2 * tp AS HUGEINT)
                        // CAST(greatest(2 * tp + fp + fn, 1)
                                AS HUGEINT) AS BIGINT) AS f1_ppm
            FROM m
        )
        SELECT c AS lang,
               CAST(tp AS BIGINT) AS tp,
               CAST(fp AS BIGINT) AS fp,
               CAST(fn AS BIGINT) AS fn,
               precision_ppm, recall_ppm, f1_ppm,
               CAST(CAST((SELECT SUM(f1_ppm) FROM f) AS HUGEINT)
                    // CAST((SELECT COUNT(*) FROM f) AS HUGEINT)
                    AS BIGINT) AS macro_f1_ppm
        FROM f ORDER BY lang
    """,
    doc="Per-class precision / recall / F1 and the macro-F1 for the "
    "q49 language classifier against ground truth — completing the "
    "eval family (q198 AUC, q203 NDCG, q206 kappa, q248 confusion "
    "counts) with the metric multi-class work actually reports. "
    "EVERYTHING is integer-exact ppm: F1's 2PR/(P+R) simplifies to "
    "2tp/(2tp+fp+fn) — a ratio of integers, no float P and R to "
    "round first — and macro-F1 is the integer mean of per-class "
    "ppms (classes = DISTINCT TRUE labels; a predicted-only class "
    "like 'unk' counts inside fp/fn totals but not as a row — the "
    "standard macro-over-gold convention, stated so both engines "
    "agree). Shape: one classify map + one (lang, guess) cell agg; "
    "per-class totals derive from broadcast-size cells.",
)
def q251(spark: SparkSession, sf: str) -> DataFrame:
    from speculare_pgcdc_spark.operators import textstats as ts

    cells = (
        table(spark, sf, "documents")
        .select("lang", ts.lang_guess(F.col("text")).alias("guess"))
        .groupBy("lang", "guess")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    tp = (
        cells.filter(F.col("lang") == F.col("guess"))
        .select(F.col("lang").alias("c"), F.col("n").alias("tp"))
    )
    truth = cells.groupBy("lang").agg(F.sum("n").alias("n_true"))
    pred = cells.groupBy("guess").agg(F.sum("n").alias("n_pred"))
    m = (
        truth.select(F.col("lang").alias("c"), "n_true")
        .join(tp, "c", "left")
        .join(
            pred.select(F.col("guess").alias("c"), "n_pred"),
            "c",
            "left",
        )
        .select(
            "c",
            F.coalesce(F.col("tp"), F.lit(0)).alias("tp"),
            (
                F.coalesce(F.col("n_pred"), F.lit(0))
                - F.coalesce(F.col("tp"), F.lit(0))
            ).alias("fp"),
            (F.col("n_true") - F.coalesce(F.col("tp"), F.lit(0)))
            .alias("fn"),
        )
    )
    f = m.select(
        "c",
        "tp",
        "fp",
        "fn",
        F.expr(
            "CAST((1000000 * tp) DIV greatest(tp + fp, 1) AS BIGINT)"
        ).alias("precision_ppm"),
        F.expr(
            "CAST((1000000 * tp) DIV greatest(tp + fn, 1) AS BIGINT)"
        ).alias("recall_ppm"),
        F.expr(
            "CAST((1000000 * 2 * tp) DIV "
            "greatest(2 * tp + fp + fn, 1) AS BIGINT)"
        ).alias("f1_ppm"),
    ).localCheckpoint(eager=True)
    macro = f.agg(
        F.expr(
            "CAST(SUM(f1_ppm) DIV COUNT(*) AS BIGINT)"
        ).alias("macro_f1_ppm")
    )
    return (
        f.crossJoin(F.broadcast(macro))
        .select(
            F.col("c").alias("lang"),
            F.col("tp").cast("bigint").alias("tp"),
            F.col("fp").cast("bigint").alias("fp"),
            F.col("fn").cast("bigint").alias("fn"),
            "precision_ppm",
            "recall_ppm",
            "f1_ppm",
            "macro_f1_ppm",
        )
        .orderBy("lang")
    )


#: q252 fingerprint grain: the first N normalized tokens (the q197
#: ingest-fingerprint convention). Whole-text md5 would be VACUOUS
#: below sf0.1 — the fixture has no full-text duplicates across
#: sources at small scales — while prefix collisions exist at every
#: scale; production picks the grain per contamination policy.
OVERLAP_PREFIX_TOKENS = 8


@register(
    "q252_source_overlap_matrix",
    oracle=f"""
        WITH fp AS (
            SELECT DISTINCT source,
                   md5(array_to_string(list_slice(list_filter(
                       string_split(lower(trim(text)), ' '),
                       x -> x <> ''), 1, {OVERLAP_PREFIX_TOKENS}),
                       ' ')) AS f
            FROM documents
        ),
        sz AS (SELECT source, COUNT(*) AS n FROM fp GROUP BY source),
        ov AS (
            SELECT a.source AS src_a, b.source AS src_b,
                   COUNT(*) AS shared
            FROM fp a JOIN fp b
              ON a.f = b.f AND a.source < b.source
            GROUP BY a.source, b.source
        )
        SELECT src_a, src_b,
               CAST(shared AS BIGINT) AS shared,
               CAST(CAST(1000000 * shared AS HUGEINT)
                    // CAST(least(sa.n, sb.n) AS HUGEINT) AS BIGINT)
                   AS containment_ppm
        FROM ov
        JOIN sz sa ON sa.source = src_a
        JOIN sz sb ON sb.source = src_b
        ORDER BY src_a, src_b
    """,
    doc="Cross-source duplicate-overlap matrix: for every source pair, "
    "how many duplicate fingerprints (md5 of the first "
    f"{OVERLAP_PREFIX_TOKENS} normalized tokens — the q197 ingest-"
    "fingerprint grain) they share, and that count as a ppm of the "
    "SMALLER side's distinct corpus — the mirror detector ('is src17 "
    "a re-crawl of src3?') that decides which source to drop before "
    "mixing weights (q240) are even computed. Containment uses "
    "min(|A|,|B|) so a small source fully contained in a big one "
    "reads 1e6 regardless of the big side's size. Shape: one "
    "fingerprint agg, one fp-keyed equi-join whose fan-out is "
    "bounded by per-fingerprint source multiplicity (<= sources, "
    "never corpus-sized), source-pair-grain output. Only pairs "
    "sharing at least one fingerprint appear.",
)
def q252(spark: SparkSession, sf: str) -> DataFrame:
    prefix = F.array_join(
        F.slice(
            F.filter(
                F.split(F.lower(F.trim(F.col("text"))), " "),
                lambda x: x != "",
            ),
            1,
            OVERLAP_PREFIX_TOKENS,
        ),
        " ",
    )
    fp = (
        table(spark, sf, "documents")
        .select("source", F.md5(prefix).alias("f"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sz = fp.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = fp.select(F.col("source").alias("src_a"), "f")
    b = fp.select(F.col("source").alias("src_b"), "f")
    ov = (
        a.join(b, ["f"])
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sz.select(F.col("source").alias("src_a"), F.col("n").alias("na"))
    sb = sz.select(F.col("source").alias("src_b"), F.col("n").alias("nb"))
    return (
        ov.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("shared").cast("bigint").alias("shared"),
            F.expr(
                "CAST((1000000 * shared) DIV least(na, nb) AS BIGINT)"
            ).alias("containment_ppm"),
        )
        .orderBy("src_a", "src_b")
    )
