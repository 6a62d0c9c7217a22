"""Product/ingest-ops batch (round 11, second batch, q300-q306): the
session-path miner, the PSI score-drift gate, ingestion order audits,
the coverage matrix, rate-cap throttling, inter-arrival cadence, and
the churn last-action table — operations a product-analytics or
ingest-ops consumer runs on the engine's event surface.

Reference scope note: the reference engine (src/) is a CDC forwarder
with no analytics; these rows extend SURVEY.md §2D (the build brief's
first-class training/ops tier) like q281-q291 and q292-q299 before
them.

Engine-stability conventions as everywhere: integer-ppm via exact
DIV, microsecond-integer time arithmetic, ln only on INTEGER-valued
arguments under the pinned bit-identity contract with per-term
DECIMAL(28,12) truncation before order-free sums (the q276/q286
convention), md5 determinism, struct/tuple sorts for order-shaped
collections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from speculare_pgcdc_spark.catalog import table
from speculare_pgcdc_spark.queries import register

#: q300: session gap (30 min, microseconds) and path prefix cap
SESSION_GAP_US = 1_800_000_000
PATH_PREFIX = 8


@register(
    "q300_session_paths",
    oracle=f"""
        WITH r AS (
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
                   rn - MAX(CASE WHEN ns = 1 THEN rn END) OVER wr + 1
                       AS ris,
                   SUM(ns) OVER wr AS sess
            FROM r
            WINDOW wr AS (PARTITION BY user_id
                          ORDER BY tu, event_id
                          ROWS UNBOUNDED PRECEDING)
        ),
        p AS (
            SELECT user_id, sess,
                   string_agg(event_type, '>'
                              ORDER BY tu, event_id) AS path
            FROM s WHERE ris <= {PATH_PREFIX}
            GROUP BY user_id, sess
        )
        SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
        FROM p GROUP BY path
        ORDER BY n_sessions DESC, path LIMIT 20
    """,
    doc="Session-path mining: the 20 most common event-type paths "
    "over 30-min-gap sessions (path = first "
    f"{PATH_PREFIX} events joined by '>'; the prefix cap is standard "
    "path-mining practice AND the scale guard — unbounded paths make "
    "the group key grow with session length). q125 assigns sessions, "
    "q290 counts single transitions; this surfaces whole JOURNEYS "
    "('view>click>purchase vs view>error>view'). Sessionize, "
    "in-session rank, and session id all ride ONE user exchange (the "
    "rank derives from the running max of session-start row_numbers "
    "— no second window partitioning); the path assembles via "
    "struct-sorted collect (tie order (ts, event_id) totalized), and "
    "the path-frequency agg is partial+final with a TakeOrdered "
    "top-20 — the output is constant-sized at any corpus scale.",
)
def q300(spark: SparkSession, sf: str) -> DataFrame:
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
    s = r.select(
        "*",
        (
            F.col("rn")
            - F.max(F.when(F.col("ns") == 1, F.col("rn"))).over(wr)
            + 1
        ).alias("ris"),
        F.sum("ns").over(wr).alias("sess"),
    )
    p = (
        s.filter(F.col("ris") <= PATH_PREFIX)
        .groupBy("user_id", "sess")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("tu", "event_id", "event_type")
                        )
                    ),
                    lambda x: x.getField("event_type"),
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        p.groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(20)
    )


#: q301: PSI value-bin width
PSI_BIN = 25.0


@register(
    "q301_psi_drift",
    oracle=f"""
        WITH f AS (
            SELECT event_type, epoch_us(ts) AS tu,
                   CAST(FLOOR(value / {PSI_BIN}) AS BIGINT) AS bin
            FROM events
            WHERE value IS NOT NULL AND isfinite(value)
        ),
        mid AS (
            SELECT (MIN(tu) + MAX(tu)) // 2 AS tmid FROM f
        ),
        c AS (
            SELECT event_type, bin,
                   CAST(SUM(CASE WHEN tu <= mid.tmid THEN 1 ELSE 0
                            END) AS BIGINT) AS ca,
                   CAST(SUM(CASE WHEN tu > mid.tmid THEN 1 ELSE 0
                            END) AS BIGINT) AS cb
            FROM f, mid GROUP BY event_type, bin
        ),
        n AS (
            SELECT event_type,
                   CAST(SUM(ca) AS BIGINT) AS na,
                   CAST(SUM(cb) AS BIGINT) AS nb
            FROM c GROUP BY event_type
        ),
        t AS (
            SELECT c.event_type,
                   CAST(c.ca * 1000000 // CAST(n.na AS HUGEINT)
                        AS BIGINT) AS pa,
                   CAST(c.cb * 1000000 // CAST(n.nb AS HUGEINT)
                        AS BIGINT) AS pb
            FROM c JOIN n ON c.event_type = n.event_type
            WHERE c.ca > 0 AND c.cb > 0
        )
        SELECT n.event_type, n.na, n.nb,
               CAST(COUNT(*) AS BIGINT) AS n_bins,
               ROUND(CAST(SUM(CAST((t.pa - t.pb)
                        * (ln(CAST(t.pa AS DOUBLE))
                           - ln(CAST(t.pb AS DOUBLE)))
                        AS DECIMAL(28,12))) AS DOUBLE)
                     / 1000000, 6) AS psi
        FROM t JOIN n ON t.event_type = n.event_type
        WHERE t.pa > 0 AND t.pb > 0
        GROUP BY n.event_type, n.na, n.nb
        ORDER BY n.event_type
    """,
    doc="Population-stability index per event type: the model-ops "
    "score-drift gate between the corpus's FIRST and SECOND time "
    "half — PSI = Σ_bins (p_a − p_b)·ln(p_a/p_b) over fixed "
    f"{PSI_BIN}-wide value bins (q144's KL reads token categories, "
    "q210's KS is binning-free location-shift; PSI is THE industry "
    "binned-share gate with its 0.1/0.25 action thresholds). "
    "Engine-stable by construction: shares are exact-ppm integers, "
    "ln takes INTEGER arguments only (the pinned bit-identity "
    "contract), each term truncates to DECIMAL(28,12) before the "
    "order-free sum, one ROUND-6 publish. Bins empty on either side "
    "are excluded exactly (ca>0 AND cb>0 AND both ppm>0 — the "
    "epsilon-clamp analog, deterministic instead of additive). One "
    "(type, bin) agg + tiny broadcast normalizers; constant output.",
)
def q301(spark: SparkSession, sf: str) -> DataFrame:
    f = (
        table(spark, sf, "events")
        .filter(
            F.col("value").isNotNull()
            & ~F.isnan("value")
            & (F.abs("value") != float("inf"))
        )
        .select(
            "event_type",
            F.unix_micros("ts").alias("tu"),
            F.expr(f"CAST(FLOOR(value / {PSI_BIN}) AS BIGINT)")
            .alias("bin"),
        )
    )
    mid = f.agg(
        F.expr("(MIN(tu) + MAX(tu)) DIV 2").alias("tmid")
    )
    c = (
        f.crossJoin(F.broadcast(mid))
        .groupBy("event_type", "bin")
        .agg(
            F.sum((F.col("tu") <= F.col("tmid")).cast("int"))
            .cast("bigint").alias("ca"),
            F.sum((F.col("tu") > F.col("tmid")).cast("int"))
            .cast("bigint").alias("cb"),
        )
    )
    n = c.groupBy("event_type").agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
    )
    t = (
        c.join(F.broadcast(n), "event_type")
        .filter((F.col("ca") > 0) & (F.col("cb") > 0))
        .select(
            "event_type",
            "na",
            "nb",
            F.expr("CAST(ca * 1000000 DIV na AS BIGINT)").alias("pa"),
            F.expr("CAST(cb * 1000000 DIV nb AS BIGINT)").alias("pb"),
        )
        .filter((F.col("pa") > 0) & (F.col("pb") > 0))
    )
    return (
        t.groupBy("event_type", "na", "nb")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bins"),
            F.sum(
                (
                    (F.col("pa") - F.col("pb"))
                    * (
                        F.log(F.col("pa").cast("double"))
                        - F.log(F.col("pb").cast("double"))
                    )
                ).cast("decimal(28,12)")
            ).alias("_s"),
        )
        .select(
            "event_type",
            "na",
            "nb",
            "n_bins",
            F.round(F.col("_s").cast("double") / 1_000_000, 6)
            .alias("psi"),
        )
        .orderBy("event_type")
    )


@register(
    "q302_order_inversions",
    oracle="""
        WITH r AS (
            SELECT event_type, epoch_us(ts) AS tu,
                   lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY event_id) AS ptu
            FROM events
        )
        SELECT event_type,
               CAST(COUNT(ptu) AS BIGINT) AS n_pairs,
               CAST(SUM(CASE WHEN ptu > tu THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_inversions,
               CAST(SUM(CASE WHEN ptu > tu THEN 1 ELSE 0 END)
                    * 1000000
                    // GREATEST(CAST(COUNT(ptu) AS HUGEINT), 1)
                    AS BIGINT) AS inversion_ppm
        FROM r GROUP BY event_type ORDER BY event_type
    """,
    doc="Ingestion order audit: per user, walk events in EVENT-ID "
    "order (the write/commit order) and count adjacent pairs whose "
    "event-times run BACKWARDS — the out-of-order-arrival rate that "
    "sizes T4's watermark and explains late-drop counts (q279 "
    "measures lateness vs the stream's own high watermark; this "
    "attributes disorder to the producer, per event type, in exact "
    "ppm). One lag window on the high-cardinality user key, one "
    "combinable agg, constant output; adjacent-pair (not all-pair) "
    "inversions keep it O(n) — the full Kendall tau lives in q262's "
    "Spearman instead.",
)
def q302(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("event_id")
    r = table(spark, sf, "events").select(
        "event_type",
        F.unix_micros("ts").alias("tu"),
        F.lag(F.unix_micros("ts")).over(w).alias("ptu"),
    )
    return (
        r.groupBy("event_type")
        .agg(
            F.count("ptu").cast("bigint").alias("n_pairs"),
            F.coalesce(
                F.sum((F.col("ptu") > F.col("tu")).cast("int")),
                F.lit(0),
            ).cast("bigint").alias("n_inversions"),
        )
        .select(
            "event_type",
            "n_pairs",
            "n_inversions",
            F.expr(
                "CAST(n_inversions * 1000000"
                " DIV GREATEST(n_pairs, 1) AS BIGINT)"
            ).alias("inversion_ppm"),
        )
        .orderBy("event_type")
    )


@register(
    "q303_coverage_grid",
    oracle="""
        WITH langs AS (SELECT DISTINCT lang FROM documents),
        srcs AS (SELECT DISTINCT source FROM documents),
        obs AS (
            SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
            FROM documents GROUP BY lang, source
        ),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM documents)
        SELECT l.lang, s.source,
               COALESCE(o.n, 0) AS n_docs,
               CAST(COALESCE(o.n, 0) * 1000000
                    // CAST(tot.t AS HUGEINT) AS BIGINT) AS share_ppm
        FROM langs l CROSS JOIN srcs s
        LEFT JOIN obs o ON o.lang = l.lang AND o.source = s.source
        CROSS JOIN tot
        ORDER BY l.lang, s.source
    """,
    doc="Corpus coverage matrix: the FULL lang x source grid with "
    "document counts and exact-ppm shares, ZEROS INCLUDED — the "
    "missing-cell report a mixture designer reads before setting "
    "per-(lang, source) sampling weights (q89/q240 assume the cell "
    "exists; q291 scores a source's mix; this is the grid itself, "
    "where an absent cell is the finding). The grid assembles from "
    "two tiny distinct frames (a |langs| x |sources| broadcast cross "
    "join — constant-sized at any corpus scale); observed counts "
    "LEFT-join back so absent cells surface as 0 rather than "
    "vanishing; corpus total is a 1-row broadcast.",
)
def q303(spark: SparkSession, sf: str) -> DataFrame:
    d = table(spark, sf, "documents")
    langs = d.select("lang").distinct()
    srcs = d.select("source").distinct()
    obs = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = d.agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    return (
        langs.crossJoin(F.broadcast(srcs))
        .join(F.broadcast(obs), ["lang", "source"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "source",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint")
            .alias("n_docs"),
            F.expr(
                "CAST(COALESCE(n, 0) * 1000000 DIV t AS BIGINT)"
            ).alias("share_ppm"),
        )
        .orderBy("lang", "source")
    )


#: q304: events kept per (user, hour)
RATE_CAP = 3


@register(
    "q304_rate_cap_throttle",
    oracle=f"""
        WITH r AS (
            SELECT event_type,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id,
                                    epoch_us(ts) // 3600000000
                       ORDER BY epoch_us(ts), event_id) AS rn
            FROM events
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN rn > {RATE_CAP} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dropped,
               CAST(SUM(CASE WHEN rn > {RATE_CAP} THEN 1 ELSE 0 END)
                    * 1000000 // CAST(COUNT(*) AS HUGEINT) AS BIGINT)
                   AS drop_ppm
        FROM r GROUP BY event_type ORDER BY event_type
    """,
    doc=f"Rate-cap throttle simulation: keep the first {RATE_CAP} "
    "events per (user, hour) — FIFO by (ts, event_id) — and report "
    "what a quota at that cap would drop, per event type, in exact "
    "ppm. The capacity-planning dry-run behind ingestion quotas and "
    "per-user API limits (q296's Fano says HOW bursty; this prices a "
    "specific cap). One window on the (user, hour) composite key — "
    "higher cardinality than user alone, so the partitioning only "
    "sharpens at scale — plus one combinable agg; constant output.",
)
def q304(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy(
        "user_id", F.expr("unix_micros(ts) DIV 3600000000")
    ).orderBy(F.unix_micros("ts"), "event_id")
    r = table(spark, sf, "events").select(
        "event_type", F.row_number().over(w).alias("rn")
    )
    return (
        r.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum((F.col("rn") > RATE_CAP).cast("int"))
            .cast("bigint").alias("n_dropped"),
        )
        .select(
            "event_type",
            "n_events",
            "n_dropped",
            F.expr(
                "CAST(n_dropped * 1000000 DIV n_events AS BIGINT)"
            ).alias("drop_ppm"),
        )
        .orderBy("event_type")
    )


@register(
    "q305_interarrival_stats",
    oracle="""
        WITH g AS (
            SELECT event_type,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY epoch_us(ts), event_id) AS gap
            FROM events
        ),
        s AS (
            SELECT event_type,
                   CAST(COUNT(gap) AS BIGINT) AS n_gaps,
                   SUM(CAST(gap AS HUGEINT)) AS sg,
                   CAST(MAX(gap) AS BIGINT) AS max_gap_us
            FROM g WHERE gap IS NOT NULL GROUP BY event_type
        )
        SELECT event_type, n_gaps,
               CAST(sg // CAST(n_gaps AS HUGEINT) AS BIGINT)
                   AS mean_gap_us,
               max_gap_us
        FROM s ORDER BY event_type
    """,
    doc="Per-type cadence: the inter-arrival gap between a user's "
    "consecutive events OF THE SAME TYPE — exact floor-mean and max "
    "in integer microseconds (q167 times the view->purchase "
    "TRANSITION; this measures each signal's own period, the number "
    "that sizes session gaps, poll intervals, and the q294 "
    "freshness SLA). One lag window on the (user, type) composite "
    "key, one combinable agg; gap sums ride HUGEINT/DECIMAL(38,0) "
    "(30-day-span gaps x 1e11 rows would pass 2^63). Constant "
    "output.",
)
def q305(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.unix_micros("ts"), "event_id"
    )
    g = table(spark, sf, "events").select(
        "event_type",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w))
        .alias("gap"),
    )
    s = (
        g.filter(F.col("gap").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("gap").cast("bigint").alias("n_gaps"),
            F.sum(F.col("gap").cast("decimal(38,0)")).alias("sg"),
            F.max("gap").cast("bigint").alias("max_gap_us"),
        )
    )
    ng = F.col("n_gaps").cast("decimal(38,0)")
    return s.select(
        "event_type",
        "n_gaps",
        # exact floor-division on DECIMAL(38,0): (a - a % b) / b
        ((F.col("sg") - F.col("sg") % ng) / ng).cast("bigint")
        .alias("mean_gap_us"),
        "max_gap_us",
    ).orderBy("event_type")


#: q306: churn horizon (14 days, microseconds)
CHURN_US = 1_209_600_000_000


@register(
    "q306_churn_last_action",
    oracle=f"""
        WITH g AS (SELECT MAX(epoch_us(ts)) AS g FROM events),
        l AS (
            SELECT user_id, event_type, epoch_us(ts) AS tu,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(ts) DESC, event_id DESC)
                       AS rn
            FROM events
        ),
        u AS (
            SELECT l.event_type AS last_action,
                   l.tu < g.g - {CHURN_US} AS churned
            FROM l, g WHERE l.rn = 1
        ),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM u)
        SELECT last_action, churned,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(COUNT(*) * 1000000 // CAST(tot.t AS HUGEINT)
                    AS BIGINT) AS user_ppm
        FROM u, tot GROUP BY last_action, churned, tot.t
        ORDER BY last_action, churned
    """,
    doc="Churn last-action table: each user's FINAL event (latest by "
    "(ts, event_id)), crossed with whether the user then went silent "
    "for the corpus's last 14 days — 'what do people do right before "
    "they leave' (q99's retention counts WHO returns; q289 times "
    "conversion; this names the exit ramp). The last event is rank 1 "
    "of ONE descending user window (high-cardinality key, no band); "
    "churn tests against the 1-row corpus-watermark broadcast; "
    "output is |types| x 2 with exact-ppm user shares.",
)
def q306(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events").select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("tu"),
        "event_id",
    )
    g = ev.agg(F.max("tu").alias("g"))
    w = Window.partitionBy("user_id").orderBy(
        F.col("tu").desc(), F.col("event_id").desc()
    )
    last = (
        ev.select(
            "event_type", "tu", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") == 1)
        .crossJoin(F.broadcast(g))
        .select(
            F.col("event_type").alias("last_action"),
            (F.col("tu") < F.col("g") - CHURN_US).alias("churned"),
        )
    )
    tot = last.agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    return (
        last.groupBy("last_action", "churned")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .crossJoin(F.broadcast(tot))
        .select(
            "last_action",
            "churned",
            "n_users",
            F.expr("CAST(n_users * 1000000 DIV t AS BIGINT)")
            .alias("user_ppm"),
        )
        .orderBy("last_action", "churned")
    )


#: q307: documents per growth-curve checkpoint, buckets per prefix band
VOCAB_BUCKET_DOCS = 100
VOCAB_BAND = 64


@register(
    "q307_vocab_growth",
    oracle=f"""
        WITH w AS (
            SELECT doc_id // {VOCAB_BUCKET_DOCS} AS bucket,
                   unnest(string_split(text, ' ')) AS tok
            FROM documents
        ),
        wf AS (
            SELECT tok, MIN(bucket) AS fb
            FROM w WHERE tok <> '' GROUP BY tok
        ),
        tb AS (
            SELECT bucket, CAST(COUNT(*) AS BIGINT) AS nt
            FROM w WHERE tok <> '' GROUP BY bucket
        ),
        nb AS (
            SELECT fb AS bucket, CAST(COUNT(*) AS BIGINT) AS nv
            FROM wf GROUP BY fb
        ),
        g AS (
            SELECT tb.bucket, tb.nt, COALESCE(nb.nv, 0) AS nv
            FROM tb LEFT JOIN nb ON tb.bucket = nb.bucket
        )
        SELECT bucket,
               CAST(SUM(nt) OVER wc AS BIGINT) AS tokens_cum,
               CAST(SUM(nv) OVER wc AS BIGINT) AS vocab_cum,
               CAST(SUM(nv) OVER wc * 1000000
                    // CAST(SUM(nt) OVER wc AS HUGEINT) AS BIGINT)
                   AS ttr_cum_ppm
        FROM g
        WINDOW wc AS (ORDER BY bucket
                      ROWS UNBOUNDED PRECEDING)
        ORDER BY bucket
    """,
    doc="Heaps'-law vocabulary growth curve: cumulative token count, "
    "cumulative vocabulary size (distinct words whose FIRST "
    f"occurrence is at or before the checkpoint), and the running "
    "type-token ratio in exact ppm, at one checkpoint per "
    f"{VOCAB_BUCKET_DOCS} documents in doc_id order — the "
    "corpus-size planning curve ('how much new vocabulary does the "
    "next shard actually buy') behind tokenizer sizing and "
    "deduplication ROI estimates (q297 reads the hapax tail at one "
    "point; this is the whole trajectory). Cumulative distinct "
    "WITHOUT any distinct-over-window: a word contributes at exactly "
    "its min-bucket (one word-grain agg), so the curve is a plain "
    "prefix SUM over bucket-grain rows — computed with the q279 "
    f"banded prefix-COMBINE ({VOCAB_BAND}-bucket bands: per-band "
    "sums, band-grain strict-prefix, in-band running sum) so the "
    "only unpartitioned window is band grain; the oracle states the "
    "plain running-sum spec the composition provably equals.",
)
def q307(spark: SparkSession, sf: str) -> DataFrame:
    w = (
        table(spark, sf, "documents")
        .select(
            F.expr(f"doc_id DIV {VOCAB_BUCKET_DOCS}").alias("bucket"),
            F.explode(F.split("text", " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    wf = w.groupBy("tok").agg(F.min("bucket").alias("fb"))
    tb = w.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("nt")
    )
    nb = wf.groupBy(F.col("fb").alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("nv")
    )
    g = (
        tb.join(nb, "bucket", "left")
        .select(
            "bucket",
            "nt",
            F.coalesce(F.col("nv"), F.lit(0)).cast("bigint")
            .alias("nv"),
        )
        .withColumn(
            "__band", F.expr(f"bucket DIV {VOCAB_BAND}")
        )
        .localCheckpoint(eager=True)
    )
    bsum = g.groupBy("__band").agg(
        F.sum("nt").alias("bnt"), F.sum("nv").alias("bnv")
    )
    wb = Window.orderBy("__band").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prefix = bsum.select(
        "__band",
        F.coalesce(F.sum("bnt").over(wb), F.lit(0)).alias("pnt"),
        F.coalesce(F.sum("bnv").over(wb), F.lit(0)).alias("pnv"),
    )
    wi = Window.partitionBy("__band").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        g.join(F.broadcast(prefix), "__band")
        .select(
            "bucket",
            (F.col("pnt") + F.sum("nt").over(wi)).cast("bigint")
            .alias("tokens_cum"),
            (F.col("pnv") + F.sum("nv").over(wi)).cast("bigint")
            .alias("vocab_cum"),
        )
        .select(
            "bucket",
            "tokens_cum",
            "vocab_cum",
            F.expr(
                "CAST(vocab_cum * 1000000 DIV tokens_cum AS BIGINT)"
            ).alias("ttr_cum_ppm"),
        )
        .orderBy("bucket")
    )
