"""Corpus hygiene + audit queries (split from corpus.py, round 8):
the round-7 families — blocklist scrub, snapshot diff, correlation
matrix, temperature-scaled mixing, lossless similarity join, seasonal
anomaly, embedding drift, concurrency sweepline, quantile bands, HHI
concentration, stratified k-fold, lang-ID confusion, two-tier replica
reconcile, MinHash quality audit, macro-F1, and the cross-source
duplicate-overlap matrix — q237-q252.

Reference scope note: the reference engine (src/) is a CDC forwarder
with no analytics; these rows extend SURVEY.md §2D with the
training-data-pipeline surface the build brief names as first-class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from speculare_pgcdc_spark.catalog import table
from speculare_pgcdc_spark.operators import dedup as dd
from speculare_pgcdc_spark.queries import register
from speculare_pgcdc_spark.queries.corpus_analytics import _XCORR_R

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


def diff_rowhash_col(price: F.Column) -> F.Column:
    """Spark twin of :func:`_diff_rowhash_sql` — the SAME 48-bit
    orders-row digest as a Column expression. Defined once here and
    imported by every consumer (q238's row-level diff, q272's
    partition-digest diff) so the two renderings cannot drift apart
    on a schema/field change: any edit to the hashed field list must
    touch this pair side by side."""
    return F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("o_orderkey").cast("string"),
                    F.col("o_custkey").cast("string"),
                    F.col("o_orderstatus"),
                    F.floor(price * 100).cast("bigint").cast("string"),
                    F.col("o_orderdate").cast("date").cast("string"),
                    F.col("o_orderpriority"),
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("bigint")


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
    rowhash = diff_rowhash_col
    # r14 optimization (guide §1.2/§5): the old side and BOTH new-side
    # legs (drift + synthetic inserts) hash the same six columns —
    # unpinned, each leg re-scanned the parquet source (3 orders scans
    # in the plan). Pin the hashed-field projection once; the legs
    # are map-only over it.
    orders = (
        table(spark, sf, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )
        .localCheckpoint(eager=True)
    )
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
        tok, PF_TAU_NUM, PF_TAU_DEN, assume_distinct=True
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
