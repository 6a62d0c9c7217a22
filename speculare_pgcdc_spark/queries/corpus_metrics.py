"""Corpus/event metrics & integrity analytics (rounds 8-9): layout
(Z-order), privacy (k-anonymity), rank statistics (Spearman, trimmed
mean, quantile normalization), behavioral funnels and sessionization,
integrity digests (column checksums, partition-digest diff), graph
structure (triangle count, k-core), novelty/quality curves (n-gram
novelty, unigram log-prob), copy detection (winnowing/MOSS), skew
isolation (null-isolated join) and the watermark-lateness accounting
that picks T4's withWatermark bound — q260-q280. Split out of
corpus_pipeline.py (run-prep q253-q259) at the round-8/9 seam when
that module crossed the 2.5k-line rule.

Reference scope note: the reference engine (src/) is a CDC forwarder
with no analytics; these rows extend SURVEY.md §2D with the
training-data-pipeline surface the build brief names as first-class.

Engine-stability conventions as everywhere: md5-derived determinism for
anything order/sample-shaped, FLOOR-scaled integer units for doubles,
exact integer DIV for ppm shares, value-grain windows instead of
data-grain global sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from speculare_pgcdc_spark.catalog import spread_scan, table
from speculare_pgcdc_spark.operators import textstats as ts
from speculare_pgcdc_spark.queries import register

#: q260: bits per dimension of the Morton (Z-order) key and the bucket
#: width (z DIV 2^ZB_SHIFT) — 8+8 bits interleaved, 16-z-value tiles
Z_BITS = 8
ZB_SHIFT = 4


def _morton_sql(u: str, d: str, div: str) -> str:
    """Bit-interleave two Z_BITS-wide nonneg ints as pure arithmetic
    ((x DIV 2^i) % 2 scaled by 4^i / 2*4^i) so the SAME formula renders
    for Spark (div='DIV') and DuckDB (div='//') with no engine bit-op
    differences."""
    terms = []
    for i in range(Z_BITS):
        p = 1 << i
        terms.append(f"(({u} {div} {p}) % 2) * {4 ** i}")
        terms.append(f"(({d} {div} {p}) % 2) * {2 * (4 ** i)}")
    return " + ".join(terms)


@register(
    "q260_zorder_layout",
    oracle=f"""
        WITH z AS (
            SELECT ({_morton_sql(
                "(user_id % 256)", "(dayofyear(ts) % 256)", "//"
            )}) // {1 << ZB_SHIFT} AS zbucket,
                   user_id, CAST(ts AS DATE) AS day
            FROM events
        )
        SELECT CAST(zbucket AS BIGINT) AS zbucket,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days
        FROM z GROUP BY zbucket ORDER BY zbucket
    """,
    doc="Z-order (Morton) layout key for multi-dimensional data "
    "clustering: interleave the low 8 bits of user_id and day-of-year "
    "so rows close in BOTH dimensions land in the same key range — "
    "the lake-layout technique (Delta Z-ORDER, Hudi space-filling "
    "curves) that makes (user, time-range) scans prune files in both "
    "predicates, where a linear sort key prunes only its leading "
    "column. The demo profiles the bucket occupancy (each 16-z tile "
    "holds a bounded 4x4 patch of the user x day grid — n_users and "
    "n_days per bucket stay <= 4 whatever the row count, which IS "
    "the locality guarantee). The interleave is pure integer "
    "arithmetic ((x DIV 2^i) % 2 scaled by powers of 4) — one "
    "codegen'd projection, no shuffle before the bucket agg; at "
    "scale the key feeds repartitionByRange + sortWithinPartitions "
    "writers (the q160 bucketed-layout path).",
)
def q260(spark: SparkSession, sf: str) -> DataFrame:
    z = F.expr(
        f"({_morton_sql('(user_id % 256)', '(dayofyear(ts) % 256)', 'DIV')})"
        f" DIV {1 << ZB_SHIFT}"
    )
    return (
        table(spark, sf, "events")
        .select(
            z.cast("bigint").alias("zbucket"),
            "user_id",
            F.to_date("ts").alias("day"),
        )
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.countDistinct("day").cast("bigint").alias("n_days"),
        )
        .orderBy("zbucket")
    )


#: q261: the k in k-anonymity — groups smaller than K on the
#: quasi-identifier tuple are re-identification risks
K_ANON = 5


@register(
    "q261_k_anonymity",
    oracle=f"""
        WITH g AS (
            SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS c
            FROM documents GROUP BY lang, source
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(SUM(CASE WHEN c < {K_ANON} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_small_groups,
               CAST(SUM(CASE WHEN c < {K_ANON} THEN c ELSE 0 END)
                    AS BIGINT) AS rows_at_risk,
               CAST(MIN(c) AS BIGINT) AS min_group_size,
               CAST(SUM(CASE WHEN c < {K_ANON} THEN c ELSE 0 END)
                    * 1000000 // GREATEST(CAST(SUM(c) AS HUGEINT), 1)
                    AS BIGINT) AS at_risk_ppm
        FROM g
    """,
    doc=f"k-anonymity audit (k={K_ANON}) on the (lang, source) quasi-"
    "identifier tuple: how many equivalence classes exist, how many "
    "are smaller than k, and how many rows those classes expose — "
    "the privacy/governance gate run before releasing a corpus "
    "slice or joining it to anything identifying (suppression and "
    "generalization act on exactly the groups this query lists). "
    "One grouped count + one 5-column reduce over the group frame; "
    "map-side combinable, no window, no join — the cheapest "
    "full-corpus governance scan at any scale. The ppm rides the "
    "HUGEINT // convention (DuckDB SUM(BIGINT) is DECIMAL and "
    "DECIMAL // rounds before flooring).",
)
def q261(spark: SparkSession, sf: str) -> DataFrame:
    g = (
        table(spark, sf, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    small = F.when(F.col("c") < K_ANON, F.col("c")).otherwise(F.lit(0))
    return g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum((F.col("c") < K_ANON).cast("int"))
        .cast("bigint")
        .alias("n_small_groups"),
        F.sum(small).cast("bigint").alias("rows_at_risk"),
        F.min("c").cast("bigint").alias("min_group_size"),
        F.expr(
            f"CAST(sum(CASE WHEN c < {K_ANON} THEN c ELSE 0 END) "
            f"* 1000000 DIV greatest(sum(c), 1) AS BIGINT)"
        ).alias("at_risk_ppm"),
    )


#: q262: rank-window band widths (x = per-user event count, small
#: integer range; y = e6-scaled per-user value sum, wide range). Width
#: only affects task balance, never the ranks — any monotone binning
#: yields identical below-counts.
RANK_BAND_X = 8
RANK_BAND_Y = 10_000_000


@register(
    "q262_spearman_rank",
    oracle="""
        WITH u AS (
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT) AS x,
                   CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT))
                        AS BIGINT) AS y
            FROM events GROUP BY user_id
        ),
        gx AS (
            SELECT x, COUNT(*) AS cnt,
                   COALESCE(SUM(COUNT(*)) OVER (ORDER BY x
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS below
            FROM u GROUP BY x
        ),
        gy AS (
            SELECT y, COUNT(*) AS cnt,
                   COALESCE(SUM(COUNT(*)) OVER (ORDER BY y
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS below
            FROM u GROUP BY y
        ),
        r AS (
            SELECT (2 * gx.below + gx.cnt + 1) AS rx2,
                   (2 * gy.below + gy.cnt + 1) AS ry2
            FROM u JOIN gx ON u.x = gx.x JOIN gy ON u.y = gy.y
        ),
        m AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(rx2) AS DOUBLE) AS sx,
                   CAST(SUM(ry2) AS DOUBLE) AS sy,
                   CAST(SUM(CAST(rx2 AS DECIMAL(38,0)) * ry2)
                        AS DOUBLE) AS sxy,
                   CAST(SUM(CAST(rx2 AS DECIMAL(38,0)) * rx2)
                        AS DOUBLE) AS sx2,
                   CAST(SUM(CAST(ry2 AS DECIMAL(38,0)) * ry2)
                        AS DOUBLE) AS sy2
            FROM r
        )
        SELECT CAST(n AS BIGINT) AS n_users,
               CASE WHEN (n * sx2 - sx * sx) * (n * sy2 - sy * sy) <= 0
                    THEN CAST(0 AS BIGINT)
                    ELSE CAST(FLOOR((n * sxy - sx * sy) /
                         (sqrt(n * sx2 - sx * sx)
                          * sqrt(n * sy2 - sy * sy))
                         * 1000000) AS BIGINT) END AS rho_e6
        FROM m
    """,
    doc="Spearman rank correlation between per-user event count and "
    "per-user total value — the monotone-association twin of q239's "
    "Pearson screen, robust to the heavy-tailed spend distributions "
    "where Pearson is dominated by whales. Tie handling is EXACT in "
    "integers: the average rank of a tie group is (lo+hi)/2, so both "
    "variables use DOUBLED average ranks rx2 = 2*below + cnt + 1 "
    "(always integer; scaling both variables by 2 leaves r "
    "unchanged), computed at the DISTINCT-VALUE grain and BANDED "
    "(q194/q270 two-level form: y is nearly unique per user, so the "
    "value grain is user-cardinality — the only unpartitioned "
    "cumulative window runs over the one-row-per-band aggregate, and "
    "the data-sized window partitions by band). Moments accumulate in "
    "DECIMAL(38,0); rho floors to e6 via the shared q235/q239 "
    "expression (zero-variance pinned to 0).",
)
def q262(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    u = (
        table(spark, sf, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("x"),
            F.sum(F.floor(F.col("value") * 1000000).cast("bigint"))
            .cast("bigint")
            .alias("y"),
        )
    )
    u = u.localCheckpoint(eager=True)

    def ranks2(col: str, band_width: int) -> DataFrame:
        # y (per-user value sum) is nearly unique per user, so the
        # distinct-value grain IS user cardinality — an unpartitioned
        # cumulative window there is a single-task sort at scale. Band
        # it with the q194/q270 two-level form: the only unpartitioned
        # window runs over the one-row-per-band aggregate; the
        # data-sized cumulative window partitions by band.
        g = (
            u.groupBy(col)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn(
                "b",
                F.floor(F.col(col) / F.lit(band_width)).cast("bigint"),
            )
            .localCheckpoint(eager=True)
        )
        bins = g.groupBy("b").agg(F.sum("cnt").alias("bcnt"))
        w_bins = Window.orderBy("b").rowsBetween(
            Window.unboundedPreceding, -1
        )
        bins = bins.select(
            "b",
            F.coalesce(F.sum("bcnt").over(w_bins), F.lit(0)).alias(
                "below_bins"
            ),
        )
        w_in = (
            Window.partitionBy("b")
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return (
            g.withColumn(
                "below_in",
                F.coalesce(F.sum("cnt").over(w_in), F.lit(0)),
            )
            .join(F.broadcast(bins), "b")
            .select(
                col,
                (
                    2 * (F.col("below_bins") + F.col("below_in"))
                    + F.col("cnt")
                    + 1
                ).alias(f"r2_{col}"),
            )
        )

    r = (
        u.join(ranks2("x", RANK_BAND_X), "x")
        .join(ranks2("y", RANK_BAND_Y), "y")
        .select(
            F.col("r2_x").cast("decimal(38,0)").alias("rx2"),
            F.col("r2_y").cast("decimal(38,0)").alias("ry2"),
        )
    )
    m = r.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("rx2").cast("double").alias("sx"),
        F.sum("ry2").cast("double").alias("sy"),
        F.sum(F.col("rx2") * F.col("ry2")).cast("double").alias("sxy"),
        F.sum(F.col("rx2") * F.col("rx2")).cast("double").alias("sx2"),
        F.sum(F.col("ry2") * F.col("ry2")).cast("double").alias("sy2"),
    )
    rho = (
        "CASE WHEN (n * sx2 - sx * sx) * (n * sy2 - sy * sy) <= 0 "
        "THEN CAST(0 AS BIGINT) "
        "ELSE CAST(FLOOR((n * sxy - sx * sy) / "
        "(sqrt(n * sx2 - sx * sx) * sqrt(n * sy2 - sy * sy)) "
        "* 1000000) AS BIGINT) END"
    )
    return m.select(
        F.col("n").cast("bigint").alias("n_users"),
        F.expr(rho).alias("rho_e6"),
    )


#: q264: funnel stage gates — click within 24h of first view, purchase
#: within 72h of that click (tight-enough windows to create the
#: dropout the funnel exists to measure: 150 -> 60 -> 45 at sf0.01)
FUNNEL_CLICK_HOURS = 24
FUNNEL_PURCHASE_HOURS = 72


@register(
    "q264_funnel_conversion",
    oracle=f"""
        WITH t1 AS (
            SELECT user_id, MIN(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ),
        t2 AS (
            SELECT e.user_id, MIN(e.ts) AS t2
            FROM events e JOIN t1 USING (user_id)
            WHERE e.event_type = 'click' AND e.ts > t1.t1
              AND e.ts <= t1.t1 + INTERVAL {FUNNEL_CLICK_HOURS} HOUR
            GROUP BY e.user_id
        ),
        t3 AS (
            SELECT e.user_id, MIN(e.ts) AS t3
            FROM events e JOIN t2 USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts > t2.t2
              AND e.ts <= t2.t2 + INTERVAL {FUNNEL_PURCHASE_HOURS} HOUR
            GROUP BY e.user_id
        )
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM t1) AS n_view,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM t2) AS n_click,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM t3) AS n_purchase,
               CAST((SELECT COUNT(*) FROM t2) * 1000000
                    // GREATEST((SELECT COUNT(*) FROM t1), 1)
                    AS BIGINT) AS view_click_ppm,
               CAST((SELECT COUNT(*) FROM t3) * 1000000
                    // GREATEST((SELECT COUNT(*) FROM t2), 1)
                    AS BIGINT) AS click_purchase_ppm
    """,
    doc="Ordered funnel conversion: users whose first view is followed "
    f"by a click within {FUNNEL_CLICK_HOURS}h, then a purchase within "
    f"{FUNNEL_PURCHASE_HOURS}h of that click — the strict-ordering "
    "funnel (each stage anchors on the PREVIOUS stage's timestamp, "
    "not any-time-cooccurrence, which overcounts). Three stage-"
    "filtered min-aggregates chained by user-key joins — each stage "
    "frame shrinks monotonically, every join is on the one user key "
    "(broadcast once the funnel narrows), no window at all. "
    "Stage-to-stage conversion in exact integer ppm.",
)
def q264(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events").select(
        "user_id", "event_type", "ts"
    )
    t1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(
            (F.col("ts") > F.col("t1"))
            & (
                F.col("ts")
                <= F.col("t1")
                + F.expr(f"INTERVAL {FUNNEL_CLICK_HOURS} HOUR")
            )
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (
                F.col("ts")
                <= F.col("t2")
                + F.expr(f"INTERVAL {FUNNEL_PURCHASE_HOURS} HOUR")
            )
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    c1 = t1.agg(F.count(F.lit(1)).cast("bigint").alias("n_view"))
    c2 = t2.agg(F.count(F.lit(1)).cast("bigint").alias("n_click"))
    c3 = t3.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchase")
    )
    return (
        c1.crossJoin(F.broadcast(c2))
        .crossJoin(F.broadcast(c3))
        .select(
            "n_view",
            "n_click",
            "n_purchase",
            F.expr(
                "n_click * 1000000 DIV greatest(n_view, 1)"
            ).alias("view_click_ppm"),
            F.expr(
                "n_purchase * 1000000 DIV greatest(n_click, 1)"
            ).alias("click_purchase_ppm"),
        )
    )


#: q265: events columns profiled by the column-level checksum
CHECKSUM_COLUMNS = ["event_id", "user_id", "event_type", "value", "ts"]


@register(
    "q265_column_checksums",
    oracle="""
        WITH s AS (
            SELECT 'event_id' AS col_name,
                   CAST(event_id AS VARCHAR) AS v FROM events
            UNION ALL
            SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events
            UNION ALL
            SELECT 'event_type', event_type FROM events
            UNION ALL
            SELECT 'value',
                   CAST(CAST(FLOOR(value * 1000000) AS BIGINT)
                        AS VARCHAR) FROM events
            UNION ALL
            SELECT 'ts', CAST(epoch_us(ts) AS VARCHAR) FROM events
        )
        SELECT col_name,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct,
               CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_null,
               CAST(SUM(CAST(CAST(concat('0x', substr(
                        md5(COALESCE(v, '')), 1, 12)) AS BIGINT)
                        AS HUGEINT)) % 1000000000000000000
                    AS BIGINT) AS checksum
        FROM s GROUP BY col_name ORDER BY col_name
    """,
    doc="COLUMN-level replica checksums: per column an order-free "
    "additive digest (sum of 48-bit md5 prefixes — commutative, so "
    "partition order and shuffle order cannot change it), plus row/"
    "distinct/null counts. q196 checksums ROWS (which bucket "
    "diverged); this checksums COLUMNS (which FIELD a lossy pipeline "
    "mangled — the typical CDC bug is one badly-cast column, not a "
    "lost row). Values canonicalize before hashing (e6-floored "
    "doubles, epoch-micros timestamps, everything as its exact "
    "string) so the digest is type-representation-independent. One "
    "unpivot (stack) + one grouped aggregate; the sum accumulates "
    "exactly (DECIMAL(38,0) / HUGEINT — 48-bit terms overflow a "
    "BIGINT past ~65 billion values) and the published digest is "
    "the exact sum mod 1e18.",
)
def q265(spark: SparkSession, sf: str) -> DataFrame:
    # r14: spread the single-task scan — the 5-way stack + per-cell md5
    # otherwise run single-core (catalog.spread_scan; counts/decimal
    # sums are order-exact)
    ev = spread_scan(table(spark, sf, "events")).select(
        F.col("event_id").cast("string").alias("event_id"),
        F.col("user_id").cast("string").alias("user_id"),
        F.col("event_type").alias("event_type"),
        F.floor(F.col("value") * 1000000)
        .cast("bigint")
        .cast("string")
        .alias("value"),
        F.unix_micros(F.col("ts").cast("timestamp"))
        .cast("string")
        .alias("ts"),
    )
    stack = ", ".join(f"'{c}', {c}" for c in CHECKSUM_COLUMNS)
    s = ev.select(
        F.expr(
            f"stack({len(CHECKSUM_COLUMNS)}, {stack}) AS (col_name, v)"
        )
    )
    h48 = F.conv(
        F.substring(F.md5(F.coalesce(F.col("v"), F.lit(""))), 1, 12),
        16,
        10,
    ).cast("bigint")
    return (
        s.groupBy("col_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.countDistinct("v").cast("bigint").alias("n_distinct"),
            F.sum(F.col("v").isNull().cast("int"))
            .cast("bigint")
            .alias("n_null"),
            F.pmod(
                F.sum(h48.cast("decimal(38,0)")),
                F.lit(10 ** 18).cast("decimal(38,0)"),
            )
            .cast("bigint")
            .alias("checksum"),
        )
        .orderBy("col_name")
    )


#: q266: session gap (the q38 convention) and depth buckets
SESSION_GAP_S = 1800


@register(
    "q266_session_depth",
    oracle=f"""
        WITH d AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN epoch(ts) - epoch(LAG(ts) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id))
                       > {SESSION_GAP_S} THEN 1 ELSE 0 END AS brk
            FROM events),
        s AS (
            SELECT user_id,
                   SUM(brk) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS sess
            FROM d),
        g AS (
            SELECT user_id, sess, COUNT(*) AS n
            FROM s GROUP BY user_id, sess),
        b AS (
            SELECT CASE WHEN n = 1 THEN '1_bounce'
                        WHEN n <= 3 THEN '2_shallow'
                        WHEN n <= 10 THEN '3_engaged'
                        ELSE '4_deep' END AS depth,
                   n
            FROM g),
        tot AS (SELECT CAST(COUNT(*) AS HUGEINT) AS t FROM g)
        SELECT depth,
               CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(SUM(n) AS BIGINT) AS n_events,
               CAST(COUNT(*) * 1000000 // GREATEST(t, 1) AS BIGINT)
                   AS share_ppm
        FROM b, tot GROUP BY depth, t ORDER BY depth
    """,
    doc="Session-depth histogram over 30-min-gap sessions (the q38 "
    "sessionization reused): bounce (1 event), shallow (2-3), "
    "engaged (4-10), deep (>10) buckets with session/event counts "
    "and exact-ppm shares — the engagement-shape summary product "
    "analytics reads before any funnel. One user-partitioned "
    "lag+cumsum pass (sessionization's one shuffle), then a "
    "session-grain aggregate; the depth buckets keep the output "
    "4 rows at any scale.",
)
def q266(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    from speculare_pgcdc_spark.functions import epoch_seconds

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = epoch_seconds("ts") - F.lag(epoch_seconds("ts")).over(w)
    brk = F.when(gap > SESSION_GAP_S, 1).otherwise(0)
    g = (
        table(spark, sf, "events")
        .select("user_id", "ts", "event_id", brk.alias("brk"))
        .withColumn("sess", F.sum("brk").over(wrun))
        .groupBy("user_id", "sess")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    depth = (
        F.when(F.col("n") == 1, "1_bounce")
        .when(F.col("n") <= 3, "2_shallow")
        .when(F.col("n") <= 10, "3_engaged")
        .otherwise("4_deep")
    )
    b = g.select(depth.alias("depth"), "n")
    tot = g.agg(F.count(F.lit(1)).alias("t"))
    return (
        b.groupBy("depth")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum("n").cast("bigint").alias("n_events"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "depth",
            "n_sessions",
            "n_events",
            F.expr(
                "n_sessions * 1000000 DIV greatest(t, 1)"
            ).alias("share_ppm"),
        )
        .orderBy("depth")
    )


def _q267_edges(spark: SparkSession, sf: str) -> DataFrame:
    """Undirected K-successor adjacency edges, BANDED.

    The day's total order is never materialized on one task: each
    row's day-global position rn is the banded two-level cumsum
    (q194/q80 form) — in-band row_number over (d, minute-band) plus
    the per-day cumulative band offset (the only per-day window runs
    at the BAND grain, <=1440 rows/day). K-successor adjacency is
    then the pure equi-join on (d, rn + k) — the oracle's own
    ROW_NUMBER self-join spec, shuffle-parallel on the position key,
    with no data-grain window partitioned by the date alone (the
    hardening the r8 density lesson asks for: a day's volume grows
    linearly with corpus scale while its task count stayed 1).
    """
    from pyspark.sql import Window

    p = (
        table(spark, sf, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("u"),
            F.to_date("ts").alias("d"),
            # minute band: monotone in ts, so in-band (ts, event_id)
            # order concatenated across ascending bands IS the day
            # order; correctness never depends on band/day alignment
            # (bands are keyed jointly with d)
            F.floor(F.unix_timestamp("ts") / 60)
            .cast("bigint")
            .alias("b"),
            "ts",
            "event_id",
        )
    )
    w_in = Window.partitionBy("d", "b").orderBy("ts", "event_id")
    p = p.withColumn("rn_in", F.row_number().over(w_in))
    bandcnt = p.groupBy("d", "b").agg(
        F.count(F.lit(1)).alias("c")
    )
    w_bands = (
        Window.partitionBy("d")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = bandcnt.select(
        "d",
        "b",
        F.coalesce(F.sum("c").over(w_bands), F.lit(0)).alias("off"),
    )
    pos = p.join(offs, ["d", "b"]).select(
        "d", "u", (F.col("off") + F.col("rn_in")).alias("rn")
    )
    succ = pos.select(
        "d",
        "u",
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("k"),
        "rn",
    ).select("d", "u", (F.col("rn") + F.col("k")).alias("rn2"))
    nxt = pos.select(
        "d", F.col("u").alias("v"), F.col("rn").alias("rn2")
    )
    pairs = succ.join(nxt, ["d", "rn2"]).filter(
        F.col("u") != F.col("v")
    )
    return pairs.select(
        F.least("u", "v").alias("ua"),
        F.greatest("u", "v").alias("ub"),
    ).distinct()


@register(
    "q267_triangle_count",
    oracle="""
        WITH p AS (
            SELECT user_id AS u, CAST(ts AS DATE) AS d, ts, event_id
            FROM events WHERE event_type = 'purchase'
        ),
        r AS (
            SELECT u, d,
                   ROW_NUMBER() OVER (PARTITION BY d
                       ORDER BY ts, event_id) AS rn
            FROM p
        ),
        e AS (
            SELECT DISTINCT LEAST(a.u, b.u) AS ua,
                   GREATEST(a.u, b.u) AS ub
            FROM r a JOIN r b
              ON a.d = b.d AND b.rn > a.rn AND b.rn <= a.rn + 3
             AND a.u <> b.u
        ),
        deg AS (
            SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM (
                SELECT ua AS u FROM e UNION ALL SELECT ub FROM e
            ) GROUP BY u
        ),
        tri AS (
            SELECT COUNT(*) AS t
            FROM e e1 JOIN e e2 ON e2.ua = e1.ub
                      JOIN e e3 ON e3.ua = e1.ua AND e3.ub = e2.ub
        ),
        wedges AS (
            -- d*(d-1) is even, so // 2 is exact; integer arithmetic
            -- end to end (a / here returns DOUBLE and the sum would
            -- accumulate FP error past 2^53)
            SELECT CAST(SUM(d * (d - 1) // 2) AS HUGEINT) AS w FROM deg
        )
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
               (SELECT CAST(t AS BIGINT) FROM tri) AS n_triangles,
               CAST((SELECT t FROM tri) * 3000000
                    // GREATEST((SELECT w FROM wedges), 1) AS BIGINT)
                   AS clustering_ppm
    """,
    doc="Triangle count + global clustering coefficient of the "
    "purchase temporal-adjacency graph (users adjacent when their "
    "purchases fall within 3 positions of each other in a day's "
    "purchase sequence): the classic distributed-graph audit behind "
    "community and collusion detection. The K-successor edge "
    "definition keeps |E| LINEAR in the row count at every scale — "
    "a same-bucket co-occurrence grain densifies toward a complete "
    "graph as volume grows (the 10x probe of the hour-grain variant "
    "filled the shuffle disk; wedges are cubic on dense graphs). "
    "Day positions are computed BANDED (minute-band row_number + "
    "per-day band-grain cumsum — no window partitioned by the date "
    "alone, so no task ever owns a whole day's total order), and "
    "adjacency is the equi-join on (d, rn + k), the oracle's own "
    "ROW_NUMBER self-join spec. "
    "The Spark plan then uses DEGREE ORIENTATION — each undirected "
    "edge points from its (degree, id)-smaller to its larger "
    "endpoint, so every triangle is counted exactly once and wedge "
    "fan-out is bounded by max OUT-degree (the trick that survives "
    "power-law hubs: the celebrity node's edges all point IN), and "
    "the closure test is a pure EQUI semi-join against the "
    "id-ordered edge set (an OR-of-directions closure is a "
    "nested-loop join — plan-linted). The oracle states the "
    "orientation-free id-ordered spec — equal counts prove the "
    "oriented plan loses/duplicates nothing. Clustering coefficient "
    "= 3*triangles / wedges in exact ppm.",
)
def q267(spark: SparkSession, sf: str) -> DataFrame:
    e = _q267_edges(spark, sf)
    e = e.localCheckpoint(eager=True)
    # r14 optimization (guide §1.2/§5): node-grain (bounded |V|) and
    # feeds THREE consumers (both orientation sides + the wedge-count
    # stats agg) — pinned so the union+agg over the edge set runs
    # once, not three times.
    deg = (
        e.select(F.col("ua").alias("u"))
        .unionAll(e.select(F.col("ub").alias("u")))
        .groupBy("u")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
        .localCheckpoint(eager=True)
    )
    da = deg.select(
        F.col("u").alias("ua"), F.col("d").alias("dega")
    )
    db = deg.select(
        F.col("u").alias("ub"), F.col("d").alias("degb")
    )
    # orient each edge (deg, id)-ascending: src -> dst
    keyed = e.join(da, "ua").join(db, "ub")
    a_first = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("ua") < F.col("ub"))
    )
    o = keyed.select(
        F.when(a_first, F.col("ua")).otherwise(F.col("ub")).alias("src"),
        F.when(a_first, F.col("ub")).otherwise(F.col("ua")).alias("dst"),
    ).localCheckpoint(eager=True)
    # wedges at the low-degree apex: (x->y, x->z), id-canonicalized
    # to y < z; the closure test is then a pure EQUI semi-join against
    # the undirected id-ordered edge set e itself (an OR of the two
    # oriented directions would be a nested-loop join — the one plan
    # shape this operator exists to avoid)
    o1 = o.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    o2 = o.select(F.col("src").alias("x"), F.col("dst").alias("z"))
    wedge = o1.join(o2, "x").filter(F.col("y") < F.col("z"))
    closer = e.select(
        F.col("ua").alias("y"), F.col("ub").alias("z")
    )
    tri = wedge.join(
        closer, ["y", "z"], "left_semi"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    stats = e.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges")
    ).crossJoin(
        F.broadcast(
            deg.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
                F.sum(
                    # d*(d-1) even => DIV 2 exact; stay integer (the
                    # Column `/` is a DOUBLE division) then widen to
                    # DECIMAL for the overflow-proof sum
                    F.expr("CAST(d * (d - 1) DIV 2 AS DECIMAL(38,0))")
                ).alias("w"),
            )
        )
    )
    return stats.crossJoin(F.broadcast(tri)).select(
        "n_nodes",
        "n_edges",
        "n_triangles",
        F.expr(
            "CAST(n_triangles * 3000000 DIV greatest(w, 1) AS BIGINT)"
        ).alias("clustering_ppm"),
    )


@register(
    "q268_cusum_changepoint",
    oracle="""
        WITH d AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events WHERE event_type = 'purchase' GROUP BY day
        ),
        p AS (
            SELECT day, x,
                   SUM(x) OVER (ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS pre,
                   ROW_NUMBER() OVER (ORDER BY day) AS i,
                   SUM(x) OVER () AS tot,
                   COUNT(*) OVER () AS n
            FROM d
        ),
        c AS (
            SELECT day, x, n, ABS(n * pre - i * tot) AS cdev FROM p
        )
        SELECT day AS change_day, x AS day_count,
               CAST(MAX(n) OVER () AS BIGINT) AS n_days,
               CAST(cdev AS BIGINT) AS max_cusum_scaled
        FROM c ORDER BY cdev DESC, day LIMIT 1
    """,
    doc="CUSUM change-point scan over the daily purchase series: the "
    "day maximizing |cumulative deviation from the mean| — the "
    "standard level-shift detector a pipeline runs on every metric "
    "it publishes. Integer-exact throughout: the mean is never "
    "materialized; the scaled form n*prefix_i - i*total equals "
    "n * (prefix_i - i*mean) so the argmax is identical and every "
    "term is BIGINT (no float accumulation to drift the argmax; "
    "ties break to the earliest day). Day-grain windows — the "
    "series is bounded by the time range, not the corpus size.",
)
def q268(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    d = (
        table(spark, sf, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    w_pre = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    p = d.select(
        "day",
        "x",
        F.sum("x").over(w_pre).alias("pre"),
        F.row_number().over(Window.orderBy("day")).alias("i"),
        F.sum("x").over(w_all).alias("tot"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    c = p.select(
        F.col("day").alias("change_day"),
        F.col("x").alias("day_count"),
        F.col("n").cast("bigint").alias("n_days"),
        F.abs(F.col("n") * F.col("pre") - F.col("i") * F.col("tot"))
        .cast("bigint")
        .alias("max_cusum_scaled"),
    )
    return c.orderBy(
        F.col("max_cusum_scaled").desc(), "change_day"
    ).limit(1)


#: Benford expected first-digit shares, floor(log10(1+1/d)*1e6) —
#: precomputed literals so neither engine evaluates a log
BENFORD_PPM = {
    1: 301029, 2: 176091, 3: 124938, 4: 96910, 5: 79181,
    6: 66946, 7: 57991, 8: 51152, 9: 45757,
}

_BENFORD_SQL = "CASE dig " + " ".join(
    f"WHEN {d} THEN {p}" for d, p in BENFORD_PPM.items()
) + " END"


@register(
    "q269_benford_digits",
    oracle=f"""
        WITH v AS (
            SELECT CAST(substr(CAST(CAST(FLOOR(value * 1000000)
                       AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS dig
            FROM events WHERE value > 0
        ),
        g AS (
            SELECT dig, CAST(COUNT(*) AS BIGINT) AS n_obs,
                   CAST(SUM(COUNT(*)) OVER () AS HUGEINT) AS tot
            FROM v GROUP BY dig
        )
        SELECT dig AS digit, n_obs,
               CAST(n_obs * 1000000 // tot AS BIGINT) AS obs_ppm,
               {_BENFORD_SQL} AS benford_ppm,
               CAST(ABS(n_obs * 1000000 // tot - {_BENFORD_SQL})
                    AS BIGINT) AS dev_ppm
        FROM g ORDER BY digit
    """,
    doc="Benford first-digit audit of the value column: observed vs "
    "expected leading-digit shares with per-digit deviation — the "
    "classic anomaly/fraud screen for any magnitude-spanning metric "
    "(fabricated or clipped values flatten the digit curve). The "
    "Benford shares are PRECOMPUTED integer-ppm literals (no log "
    "evaluated in either engine); observed shares are exact integer "
    "DIV; the e6-floored value's first digit equals the raw value's "
    "first significant digit for every value >= 1e-6. One narrow "
    "projection + a 9-row aggregate.",
)
def q269(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    dig = F.substring(
        F.floor(F.col("value") * 1000000).cast("bigint").cast("string"),
        1,
        1,
    ).cast("bigint")
    g = (
        table(spark, sf, "events")
        .filter(F.col("value") > 0)
        .select(dig.alias("dig"))
        .groupBy("dig")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
        .withColumn(
            "tot", F.sum("n_obs").over(Window.partitionBy())
        )
    )
    bexp = "CASE dig " + " ".join(
        f"WHEN {d} THEN {p}" for d, p in BENFORD_PPM.items()
    ) + " END"
    return g.select(
        F.col("dig").alias("digit"),
        "n_obs",
        F.expr("n_obs * 1000000 DIV tot").alias("obs_ppm"),
        F.expr(bexp).alias("benford_ppm"),
        F.expr(
            f"CAST(ABS(n_obs * 1000000 DIV tot - ({bexp})) AS BIGINT)"
        ).alias("dev_ppm"),
    ).orderBy("digit")


@register(
    "q270_pareto_skyline",
    oracle="""
        WITH c AS (
            SELECT o_custkey AS cust,
                   CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(28,6)))
                        * 100) AS BIGINT) AS spend_e2,
                   MAX(CAST(o_orderdate AS DATE)) AS last_order
            FROM orders GROUP BY o_custkey
        )
        SELECT cust, spend_e2, last_order
        FROM c p
        WHERE NOT EXISTS (
            SELECT 1 FROM c q
            WHERE q.spend_e2 >= p.spend_e2
              AND q.last_order >= p.last_order
              AND (q.spend_e2 > p.spend_e2
                   OR q.last_order > p.last_order)
        )
        ORDER BY spend_e2 DESC, cust
    """,
    doc="2-D skyline (Pareto front) of customers over (total spend, "
    "recency): the rows no other row beats on both axes — the "
    "standard multi-criteria shortlist (best-customer, best-offer, "
    "cost/quality frontiers). The Spark plan is the LINEAR monotone "
    "rewrite: reduce to the distinct-spend grain, take max recency "
    "per spend, then a BANDED suffix-max (the spend grain is "
    "customer-cardinality, so the only unpartitioned window runs "
    "over the one-row-per-bin aggregate; in-bin windows partition "
    "by bin — the q194/q80 two-level form). A point survives iff no "
    "strictly-higher spend reaches its recency and no equal-spend "
    "point beats it — O(n) + bin-grain work instead of the "
    "quadratic dominance self-join. The oracle states exactly that "
    "quadratic NOT EXISTS spec — equality is the losslessness proof "
    "(the q241 pattern). Spend is the exact DECIMAL money sum, "
    "FLOOR-scaled to integer cents; ties on both axes keep BOTH "
    "points (strict dominance), matching the spec.",
)
def q270(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    c = (
        table(spark, sf, "orders")
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(
            F.floor(
                F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
                * 100
            )
            .cast("bigint")
            .alias("spend_e2"),
            F.max(F.to_date("o_orderdate")).alias("last_order"),
        )
    )
    c = c.localCheckpoint(eager=True)
    # spend-grain frame: cardinality ~ distinct spends ~ customers, so
    # the suffix max must be BANDED (the q194/q80 two-level rewrite):
    # the only unpartitioned window runs over the one-row-per-bin
    # aggregate; every data-sized window partitions by bin
    xg = c.groupBy("spend_e2").agg(
        F.max("last_order").alias("maxy")
    ).withColumn(
        "b", F.floor(F.col("spend_e2") / 1_000_000).cast("bigint")
    )
    xg = xg.localCheckpoint(eager=True)
    bins = xg.groupBy("b").agg(F.max("maxy").alias("bmax"))
    w_bins = Window.orderBy(F.col("b").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    bins = bins.select(
        "b", F.max("bmax").over(w_bins).alias("rmax_bins")
    )
    w_in = (
        Window.partitionBy("b")
        .orderBy(F.col("spend_e2").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    xg = (
        xg.withColumn("rmax_in", F.max("maxy").over(w_in))
        .join(F.broadcast(bins), "b")
        .withColumn(
            "rmax", F.greatest(F.col("rmax_bins"), F.col("rmax_in"))
        )
    )
    keep = (
        (F.col("rmax").isNull() | (F.col("rmax") < F.col("last_order")))
        & (F.col("maxy") <= F.col("last_order"))
    )
    return (
        c.join(xg.select("spend_e2", "maxy", "rmax"), "spend_e2")
        .filter(keep)
        .select("cust", "spend_e2", "last_order")
        .orderBy(F.col("spend_e2").desc(), "cust")
    )


# --------------------------------------------------------------------
# Round-9 batch: partition-level divergence localization, corpus
# novelty decay, and robust means — the maintenance/monitoring ops
# between q238's row-level diff and q265's column checksums.
# --------------------------------------------------------------------

#: q273: docs per novelty bucket (doc_id DIV this)
NOVELTY_BUCKET_DOCS = 50

#: q274: two-sided trim — drop n DIV TRIM_DEN rows from each end
TRIM_DEN = 10


def _q272_oracle() -> str:
    from speculare_pgcdc_spark.queries.corpus_audit import (
        DIFF_DRIFT_MOD,
        DIFF_DROP_MOD,
        DIFF_INSERT_MOD,
        DIFF_INSERT_OFFSET,
        _diff_rowhash_sql,
    )

    return f"""
        WITH old_rows AS (
            SELECT CAST(o_orderdate AS DATE) AS d,
                   {_diff_rowhash_sql('o_totalprice')} AS h
            FROM orders
        ),
        new_rows AS (
            SELECT CAST(o_orderdate AS DATE) AS d,
                   {_diff_rowhash_sql(
                       'o_totalprice + CASE WHEN o_orderkey % '
                       + str(DIFF_DRIFT_MOD)
                       + ' = 0 THEN 1.5 ELSE 0 END')} AS h
            FROM orders WHERE o_orderkey % {DIFF_DROP_MOD} <> 0
            UNION ALL
            SELECT CAST(o_orderdate AS DATE) AS d,
                   {_diff_rowhash_sql('o_totalprice')} AS h
            FROM orders WHERE o_orderkey % {DIFF_INSERT_MOD} = 0
        ),
        o AS (
            SELECT d, CAST(COUNT(*) AS BIGINT) AS cnt,
                   CAST(SUM(CAST(h AS HUGEINT))
                        % 1000000000000000000 AS BIGINT) AS dig
            FROM old_rows GROUP BY d
        ),
        n AS (
            SELECT d, CAST(COUNT(*) AS BIGINT) AS cnt,
                   CAST(SUM(CAST(h AS HUGEINT))
                        % 1000000000000000000 AS BIGINT) AS dig
            FROM new_rows GROUP BY d
        ),
        j AS (
            SELECT COALESCE(o.d, n.d) AS d,
                   COALESCE(o.cnt, 0) AS ocnt,
                   COALESCE(n.cnt, 0) AS ncnt,
                   CASE WHEN o.d IS NULL OR n.d IS NULL
                             OR o.cnt <> n.cnt OR o.dig <> n.dig
                        THEN 1 ELSE 0 END AS div
            FROM o FULL OUTER JOIN n ON o.d = n.d
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(div) AS BIGINT) AS n_days_diverged,
               CAST(SUM(CASE WHEN div = 1 THEN ocnt ELSE 0 END)
                    AS BIGINT) AS rows_old_diverged,
               CAST(SUM(CASE WHEN div = 1 THEN ncnt ELSE 0 END)
                    AS BIGINT) AS rows_new_diverged,
               CAST(SUM(CASE WHEN div = 1 THEN
                        date_diff('day', DATE '1970-01-01', d)
                        ELSE 0 END) % 1000000000000000000 AS BIGINT)
                   AS diverged_day_checksum
        FROM j
    """


@register(
    "q272_partition_digest_diff",
    oracle=_q272_oracle(),
    doc="Partition-level divergence LOCALIZATION for replica "
    "verification: per-day (order date) digests — row count + "
    "order-free additive 48-bit md5 row-hash sum mod 1e18, the "
    "q196/q265 digest convention — computed on a table and its "
    "drifted replica (q238's deterministic drop/drift/late-insert "
    "perturbation), then compared at the DAY grain. The payoff at "
    "100 TB: the comparison itself touches only #days rows (a "
    "broadcast-sized join), and q238's row-level full-outer diff "
    "then runs ONLY on the diverged partitions — the output's "
    "rows_old/new_diverged are exactly that rescan bill, vs the "
    "full-table shuffle a naive diff pays. Two map-side-combinable "
    "day aggregates + a tiny full-outer join; the diverged-day "
    "checksum (epoch-day sum) pins WHICH days, order-free.",
)
def q272(spark: SparkSession, sf: str) -> DataFrame:
    from speculare_pgcdc_spark.queries.corpus_audit import (
        DIFF_DRIFT_MOD,
        DIFF_DROP_MOD,
        DIFF_INSERT_MOD,
        diff_rowhash_col as rowhash,
    )

    orders = table(spark, sf, "orders")
    d = F.col("o_orderdate").cast("date").alias("d")

    def day_digest(rows):
        return rows.groupBy("d").agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            (
                F.sum(F.col("h").cast("decimal(38,0)"))
                % F.lit(10**18).cast("decimal(38,0)")
            ).cast("bigint").alias("dig"),
        )

    old = day_digest(orders.select(d, rowhash(F.col("o_totalprice")).alias("h")))
    drift = F.col("o_totalprice") + F.when(
        F.col("o_orderkey") % DIFF_DRIFT_MOD == 0, F.lit(1.5)
    ).otherwise(F.lit(0.0))
    new = day_digest(
        orders.filter(F.col("o_orderkey") % DIFF_DROP_MOD != 0)
        .select(d, rowhash(drift).alias("h"))
        .unionAll(
            orders.filter(F.col("o_orderkey") % DIFF_INSERT_MOD == 0)
            .select(d, rowhash(F.col("o_totalprice")).alias("h"))
        )
    )
    j = old.alias("o").join(
        new.alias("n"), F.col("o.d") == F.col("n.d"), "full_outer"
    ).select(
        F.coalesce(F.col("o.d"), F.col("n.d")).alias("d"),
        F.coalesce(F.col("o.cnt"), F.lit(0)).alias("ocnt"),
        F.coalesce(F.col("n.cnt"), F.lit(0)).alias("ncnt"),
        F.when(
            F.col("o.d").isNull()
            | F.col("n.d").isNull()
            | (F.col("o.cnt") != F.col("n.cnt"))
            | (F.col("o.dig") != F.col("n.dig")),
            1,
        ).otherwise(0).alias("div"),
    )
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("div").cast("bigint").alias("n_days_diverged"),
        F.sum(F.when(F.col("div") == 1, F.col("ocnt")).otherwise(0))
        .cast("bigint").alias("rows_old_diverged"),
        F.sum(F.when(F.col("div") == 1, F.col("ncnt")).otherwise(0))
        .cast("bigint").alias("rows_new_diverged"),
        (
            F.sum(
                F.when(
                    F.col("div") == 1,
                    F.datediff(F.col("d"), F.lit("1970-01-01"))
                    .cast("decimal(38,0)"),
                ).otherwise(F.lit(0).cast("decimal(38,0)"))
            )
            % F.lit(10**18).cast("decimal(38,0)")
        ).cast("bigint").alias("diverged_day_checksum"),
    )


@register(
    "q273_ngram_novelty",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id // {NOVELTY_BUCKET_DOCS} AS bucket,
                   list_filter(string_split(COALESCE(text, ''), ' '),
                               t -> t <> '') AS ts
            FROM documents
        ),
        tri AS (
            SELECT DISTINCT bucket,
                   ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2] AS g
            FROM toks,
                 LATERAL unnest(range(1, greatest(len(ts) - 1, 1)))
                     t(i)
        ),
        fb AS (SELECT g, MIN(bucket) AS fb FROM tri GROUP BY g)
        SELECT bucket,
               CAST(COUNT(*) AS BIGINT) AS n_ngrams,
               CAST(SUM(CASE WHEN fb = bucket THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_novel,
               CAST(SUM(CASE WHEN fb = bucket THEN 1 ELSE 0 END)
                    * 1000000 // COUNT(*) AS BIGINT) AS novelty_ppm
        FROM tri JOIN fb USING (g)
        GROUP BY bucket ORDER BY bucket
    """,
    doc="Corpus novelty decay: token TRIGRAMS attributed to the first "
    f"doc-id bucket ({NOVELTY_BUCKET_DOCS} docs) that contains them; "
    "per bucket, the share of its distinct trigrams seen for the "
    "first time — the curve that tells a collection pipeline when "
    "additional crawl/source volume stops contributing new content "
    "(novelty falling toward 0 = the marginal data is rehash; the "
    "aggregate view behind dedup-threshold and stop-crawling "
    "decisions). Shape: trigram explode -> DISTINCT (gram, bucket) "
    "-> min-bucket attribution -> gram-keyed join back — every "
    "shuffle keyed on the gram (high cardinality, no hot key), "
    "counts map-side-combinable, exact integer ppm. First-occurrence "
    "attribution is the same primitive as q197's incremental-ingest "
    "dedup, lifted from exact-doc to content-ngram grain.",
)
def q273(spark: SparkSession, sf: str) -> DataFrame:
    toks = F.filter(
        F.split(F.coalesce(F.col("text"), F.lit("")), " "),
        lambda t: t != "",
    )
    tri = F.expr(
        "CASE WHEN size(_ts) >= 3 THEN "
        "transform(sequence(0, size(_ts) - 3), i -> "
        "concat_ws(' ', _ts[i], _ts[i + 1], _ts[i + 2])) "
        "ELSE array() END"
    )
    pairs = (
        table(spark, sf, "documents")
        .select(
            F.expr(f"doc_id DIV {NOVELTY_BUCKET_DOCS}").alias("bucket"),
            toks.alias("_ts"),
        )
        .select("bucket", F.explode(tri).alias("g"))
        .distinct()
    )
    pairs = pairs.localCheckpoint(eager=True)
    fb = pairs.groupBy("g").agg(F.min("bucket").alias("fb"))
    return (
        pairs.join(fb, "g")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_ngrams"),
            F.sum((F.col("fb") == F.col("bucket")).cast("int"))
            .cast("bigint").alias("n_novel"),
        )
        .select(
            "bucket",
            "n_ngrams",
            "n_novel",
            F.expr("n_novel * 1000000 DIV n_ngrams").cast("bigint")
            .alias("novelty_ppm"),
        )
        .orderBy("bucket")
    )


@register(
    "q274_trimmed_mean",
    oracle=f"""
        WITH li AS (
            SELECT l_returnflag AS flag,
                   CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS p
            FROM lineitem
        ),
        r AS (
            SELECT flag, p,
                   ROW_NUMBER() OVER (PARTITION BY flag ORDER BY p)
                       AS rn,
                   COUNT(*) OVER (PARTITION BY flag) AS n
            FROM li
        )
        SELECT flag,
               CAST(MAX(n) AS BIGINT) AS n,
               CAST(MAX(n) - 2 * (MAX(n) // {TRIM_DEN}) AS BIGINT)
                   AS trimmed_n,
               CAST(SUM(CASE WHEN rn > n // {TRIM_DEN}
                             AND rn <= n - n // {TRIM_DEN}
                        THEN CAST(p AS HUGEINT) ELSE 0 END)
                    // (MAX(n) - 2 * (MAX(n) // {TRIM_DEN}))
                    AS BIGINT) AS tmean_e2
        FROM r GROUP BY flag ORDER BY flag
    """,
    doc="Exact two-sided trimmed mean (drop n DIV "
    f"{TRIM_DEN} rows from each tail) of the e2-scaled extended price "
    "per return flag — the robust location estimate between the "
    "mean (outlier-dominated) and the median (throws away 98% of "
    "the data); the standard guard for cost/latency KPIs. The Spark "
    "plan never materializes a row-grain rank: reduce to the "
    "distinct-(flag, price) grain with counts, compute each value's "
    "global rank INTERVAL via the banded two-level cumsum (in-band "
    "window over (flag, band), band-grain cumsum per flag — the "
    "q194/q257/q262 form), and each value's trimmed contribution is "
    "the measure of its interval's overlap with [lo+1, hi] — "
    "tie-order-free, so the oracle's row-grain ROW_NUMBER spec sums "
    "to the identical integer. DECIMAL-accumulated sum, exact floor "
    "division for the published e2 mean.",
)
def q274(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    g = (
        table(spark, sf, "lineitem")
        .select(
            F.col("l_returnflag").alias("flag"),
            F.floor(F.col("l_extendedprice") * 100)
            .cast("bigint").alias("p"),
        )
        .groupBy("flag", "p")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "b", F.floor(F.col("p") / 1_000_000).cast("bigint")
        )
        .localCheckpoint(eager=True)
    )
    bins = g.groupBy("flag", "b").agg(F.sum("cnt").alias("bcnt"))
    w_bins = (
        Window.partitionBy("flag")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bins = bins.select(
        "flag",
        "b",
        F.coalesce(F.sum("bcnt").over(w_bins), F.lit(0))
        .alias("below_bins"),
    )
    w_in = (
        Window.partitionBy("flag", "b")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n_flag = g.groupBy("flag").agg(F.sum("cnt").alias("n"))
    spans = (
        g.withColumn(
            "below_in", F.coalesce(F.sum("cnt").over(w_in), F.lit(0))
        )
        .join(F.broadcast(bins), ["flag", "b"])
        .join(F.broadcast(n_flag), "flag")
        .withColumn("below", F.col("below_bins") + F.col("below_in"))
        .withColumn("lo", F.expr(f"n DIV {TRIM_DEN}"))
        .withColumn("hi", F.col("n") - F.col("lo"))
        # overlap of (below, below+cnt] with (lo, hi]
        .withColumn(
            "w",
            F.greatest(
                F.least(F.col("below") + F.col("cnt"), F.col("hi"))
                - F.greatest(F.col("below"), F.col("lo")),
                F.lit(0),
            ),
        )
    )
    return (
        spans.groupBy("flag")
        .agg(
            F.max("n").cast("bigint").alias("n"),
            (F.max("n") - 2 * F.expr(f"max(n) DIV {TRIM_DEN}"))
            .cast("bigint").alias("trimmed_n"),
            F.sum(
                (F.col("p") * F.col("w")).cast("decimal(38,0)")
            ).alias("tsum"),
        )
        .select(
            "flag",
            "n",
            "trimmed_n",
            F.expr(
                "CAST((tsum - pmod(tsum, trimmed_n)) / trimmed_n "
                "AS BIGINT)"
            ).alias("tmean_e2"),
        )
        .orderBy("flag")
    )


#: q275: a third of the fact rows carry a NULL foreign key
NULLJOIN_MOD = 3

#: q276: per-doc output cap (the q66/q202 verification-sized contract)
LOGPROB_DOC_CAP = 300


@register(
    "q275_null_skew_join",
    oracle=f"""
        WITH dim AS (
            SELECT user_id AS ref_user,
                   CAST(COUNT(*) AS BIGINT) AS purchases
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id
        ),
        b AS (
            SELECT event_id,
                   CASE WHEN event_id % {NULLJOIN_MOD} <> 0
                        THEN user_id END AS ref_user
            FROM events
        ),
        j AS (
            SELECT b.ref_user, d.purchases
            FROM b LEFT JOIN dim d ON b.ref_user = d.ref_user
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN ref_user IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_null_key,
               CAST(SUM(CASE WHEN purchases IS NOT NULL THEN 1
                        ELSE 0 END) AS BIGINT) AS n_matched,
               CAST(SUM(COALESCE(purchases, 0)) AS BIGINT)
                   AS sum_purchases
        FROM j
    """,
    doc="Null-isolated LEFT join (operators/skewscale."
    "null_isolated_left_join): a nullable foreign key is the silent "
    "hot key no salting fixes — NULL rows can never match, yet a "
    "plain left outer join ships them ALL through the exchange onto "
    "ONE reducer (salting spreads values; null is one value). The "
    f"rewrite: the {100 // NULLJOIN_MOD}%-null population bypasses "
    "the join entirely (filter isNull, dimension columns re-enter as "
    "typed NULL literals) and unions back; only non-null keys "
    "shuffle. The fact side's derived key is NULL on event_id % "
    f"{NULLJOIN_MOD} = 0; the oracle is the PLAIN left join — row "
    "equality proves the isolation is lossless. The dim side is "
    "shuffle_hash-hinted so the fixture plan exercises the shuffled "
    "regime the operator exists for (the q173 convention); the plan "
    "lint pins the isnotnull filter + union shape.",
)
def q275(spark: SparkSession, sf: str) -> DataFrame:
    from speculare_pgcdc_spark.operators.skewscale import (
        null_isolated_left_join,
    )

    ev = table(spark, sf, "events")
    dim = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("ref_user"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("purchases"))
    )
    big = ev.select(
        "event_id",
        F.when(
            F.col("event_id") % NULLJOIN_MOD != 0, F.col("user_id")
        ).alias("ref_user"),
    )
    j = null_isolated_left_join(
        big, dim.hint("shuffle_hash"), "ref_user"
    )
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col("ref_user").isNull().cast("int"))
        .cast("bigint").alias("n_null_key"),
        F.sum(F.col("purchases").isNotNull().cast("int"))
        .cast("bigint").alias("n_matched"),
        F.sum(F.coalesce(F.col("purchases"), F.lit(0)))
        .cast("bigint").alias("sum_purchases"),
    )


@register(
    "q276_unigram_logprob",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest(list_filter(
                       string_split(COALESCE(text, ''), ' '),
                       t -> t <> '')) AS t
            FROM documents
        ),
        vocab AS (SELECT t, COUNT(*) AS f FROM tok GROUP BY t),
        tot AS (SELECT SUM(f) AS tt FROM vocab),
        terms AS (
            SELECT doc_id,
                   CAST(ln(CAST(tt AS DOUBLE) / f)
                        AS DECIMAL(28,12)) AS s
            FROM tok JOIN vocab USING (t) CROSS JOIN tot
            WHERE doc_id < {LOGPROB_DOC_CAP}
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(ROUND(CAST(SUM(s) AS DOUBLE) / COUNT(*), 6)
                    AS DOUBLE) AS avg_surprisal
        FROM terms GROUP BY doc_id ORDER BY doc_id
    """,
    doc="Self-perplexity proxy: per-doc mean unigram surprisal "
    "-ln p(token) under the corpus's OWN unigram distribution — the "
    "classic cheap LM-quality signal (a doc of globally rare tokens "
    "scores high = gibberish/OCR noise; a doc of stopwords scores "
    "low = boilerplate), the shape Wikipedia-LM / CCNet filters use "
    "with a real LM. Two shuffles, both on high-cardinality keys: "
    "vocab build (token-keyed count) and the token->frequency join; "
    "the corpus total crosses as a broadcast single row; per-doc "
    "reduce is map-side combinable. Determinism: ln terms are "
    "identical IEEE doubles in both engines on identical integer "
    "ratios (the q159 exp-sum-log contract) — a BIT-IDENTITY "
    "assumption stronger than IEEE's ~1-ulp log bound, so it is "
    "pinned directly by test_q276_ln_contract_bit_identity_vs_duckdb "
    "over every fixture ratio (a libm divergence fails there with "
    "the offending ratio, not as an opaque hash mismatch) — each "
    "truncated to DECIMAL(28,12) before the order-free sum, "
    "published ROUND 6. "
    f"Per-doc rows capped at doc_id < {LOGPROB_DOC_CAP} (q66's "
    "verification-sized convention); the vocab/join tier is "
    "corpus-wide.",
)
def q276(spark: SparkSession, sf: str) -> DataFrame:
    toks = F.filter(
        F.split(F.coalesce(F.col("text"), F.lit("")), " "),
        lambda t: t != "",
    )
    tok = (
        table(spark, sf, "documents")
        .select("doc_id", F.explode(toks).alias("t"))
    )
    tok = tok.localCheckpoint(eager=True)
    vocab = tok.groupBy("t").agg(F.count(F.lit(1)).alias("f"))
    tot = vocab.agg(F.sum("f").alias("tt"))
    terms = (
        tok.filter(F.col("doc_id") < LOGPROB_DOC_CAP)
        .join(vocab, "t")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.log(F.col("tt").cast("double") / F.col("f"))
            .cast("decimal(28,12)").alias("s"),
        )
    )
    return (
        terms.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(
                F.sum("s").cast("double") / F.count(F.lit(1)), 6
            ).cast("double").alias("avg_surprisal"),
        )
        .orderBy("doc_id")
    )


@register(
    "q277_quantile_normalize",
    oracle="""
        WITH r AS (
            SELECT source, n_chars AS v,
                   ROW_NUMBER() OVER (PARTITION BY source
                       ORDER BY n_chars) AS rn,
                   COUNT(*) OVER (PARTITION BY source) AS n
            FROM documents
        ),
        rp AS (
            SELECT n_chars AS v,
                   ROW_NUMBER() OVER (ORDER BY n_chars) AS rn,
                   COUNT(*) OVER () AS n
            FROM documents
        ),
        ks AS (SELECT unnest(range(1, 10)) AS decile),
        src AS (
            SELECT r.source, ks.decile, r.v
            FROM r JOIN ks
              ON r.rn = greatest(ks.decile * r.n // 10, 1)
        ),
        pool AS (
            SELECT ks.decile, rp.v
            FROM rp JOIN ks
              ON rp.rn = greatest(ks.decile * rp.n // 10, 1)
        )
        SELECT s.source, CAST(s.decile AS BIGINT) AS decile,
               CAST(s.v AS BIGINT) AS src_v,
               CAST(p.v AS BIGINT) AS pooled_v
        FROM src s JOIN pool p ON s.decile = p.decile
        ORDER BY s.source, s.decile
    """,
    doc="Quantile-normalization remap table: for each source and "
    "decile k, the source's k-th decile value of n_chars next to the "
    "POOLED corpus's — the lookup that maps any source's length (or "
    "score) distribution onto the corpus-wide one, the standard "
    "cross-source calibration before mixing heterogeneous scores "
    "(quality classifiers trained per source, length-balanced "
    "sampling). Exact order statistics, NO row-grain rank on the "
    "Spark side: value-grain counts + the banded rank-interval form "
    "(q194/q274) select the value whose interval covers position "
    "(k*n) DIV 10 — tie-order-free, identical to the oracle's "
    "ROW_NUMBER spec. Every window partitions by (source, band) or "
    "rides a band-grain aggregate; decile positions join broadcast.",
)
def q277(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    def decile_values(g, part_cols):
        # g: (*part_cols, v, cnt); returns (*part_cols, decile, v)
        band = F.floor(F.col("v") / 512).cast("bigint")
        g = g.withColumn("b", band).localCheckpoint(eager=True)
        bins = g.groupBy(*part_cols, "b").agg(
            F.sum("cnt").alias("bcnt")
        )
        w_bins = (
            Window.partitionBy(*part_cols)
            .orderBy("b")
            .rowsBetween(Window.unboundedPreceding, -1)
        ) if part_cols else (
            Window.orderBy("b")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        bins = bins.select(
            *part_cols,
            "b",
            F.coalesce(F.sum("bcnt").over(w_bins), F.lit(0))
            .alias("below_bins"),
        )
        w_in = (
            Window.partitionBy(*(part_cols + ["b"]))
            .orderBy("v")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        n = g.groupBy(*part_cols).agg(F.sum("cnt").alias("n")) \
            if part_cols else g.agg(F.sum("cnt").alias("n"))
        spans = g.withColumn(
            "below_in", F.coalesce(F.sum("cnt").over(w_in), F.lit(0))
        ).join(F.broadcast(bins), part_cols + ["b"])
        if part_cols:
            spans = spans.join(F.broadcast(n), part_cols)
        else:
            spans = spans.crossJoin(F.broadcast(n))
        spans = spans.withColumn(
            "lo", F.col("below_bins") + F.col("below_in") + 1
        ).withColumn("hi", F.col("lo") + F.col("cnt") - 1)
        ks = spark.range(1, 10).select(
            F.col("id").cast("bigint").alias("decile")
        )
        return (
            spans.crossJoin(F.broadcast(ks))
            .withColumn(
                "p",
                F.greatest(
                    F.expr("decile * n DIV 10"), F.lit(1)
                ),
            )
            .filter(
                (F.col("lo") <= F.col("p"))
                & (F.col("p") <= F.col("hi"))
            )
            .select(*part_cols, "decile", "v")
        )

    docs = table(spark, sf, "documents")
    per_src = docs.groupBy(
        "source", F.col("n_chars").alias("v")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    pooled = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    src = decile_values(per_src, ["source"]).select(
        "source", "decile", F.col("v").cast("bigint").alias("src_v")
    )
    pool = decile_values(pooled, []).select(
        "decile", F.col("v").cast("bigint").alias("pooled_v")
    )
    return (
        src.join(F.broadcast(pool), "decile")
        .select("source", "decile", "src_v", "pooled_v")
        .orderBy("source", "decile")
    )


#: q278: doc cap for the pair join; a pair surfaces when the shared
#: fingerprints cover >= this ppm of the SMALLER doc's fingerprint set
#: (MOSS reports this containment-style overlap — an absolute shared
#: count is non-discriminating on a corpus with shared boilerplate
#: vocabulary: at threshold "2 shared" 92% of all fixture pairs fired)
WINNOW_DOC_CAP = 200
WINNOW_MIN_SHARE_PPM = 250_000


@register(
    "q278_winnowing_pairs",
    oracle=f"""
        WITH h AS (
            SELECT doc_id, i,
                   SUM(ascii(substr(text, CAST(i + j AS INT), 1))
                       * CAST(pow(31, j) AS BIGINT)) AS hash
            FROM documents,
                 unnest(range(1, len(text) - 6)) t(i),
                 unnest(range(0, 8)) o(j)
            WHERE doc_id < {WINNOW_DOC_CAP}
            GROUP BY doc_id, i
        ),
        w AS (
            SELECT doc_id, i,
                   MIN(hash) OVER (PARTITION BY doc_id ORDER BY i
                       ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING)
                       AS fp,
                   MAX(i) OVER (PARTITION BY doc_id) AS m
            FROM h
        ),
        d AS (
            SELECT DISTINCT doc_id, fp FROM w WHERE i <= m - 7
        ),
        sizes AS (
            SELECT doc_id, COUNT(*) AS nf FROM d GROUP BY doc_id
        ),
        pairs AS (
            SELECT a.doc_id AS da, b.doc_id AS db,
                   CAST(COUNT(*) AS BIGINT) AS n_shared_fp
            FROM d a JOIN d b
              ON a.fp = b.fp AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT da, db, n_shared_fp,
               CAST(n_shared_fp * 1000000
                    // LEAST(sa.nf, sb.nf) AS BIGINT) AS share_ppm
        FROM pairs
        JOIN sizes sa ON sa.doc_id = da
        JOIN sizes sb ON sb.doc_id = db
        WHERE n_shared_fp * 1000000
              >= {WINNOW_MIN_SHARE_PPM} * LEAST(sa.nf, sb.nf)
        ORDER BY da, db
    """,
    doc="Winnowing copy-detection pairs (Schleimer/Wilkerson/Aiken — "
    "the MOSS algorithm, the alignment-robust answer to shared-SPAN "
    "dedup that q66's bottom-k sketch and q46's MinHash don't give): "
    "each doc's fingerprints are the distinct minima of every "
    "8-window over its 8-gram rolling hashes, so ANY shared "
    "substring of >= 15 chars yields an identical fingerprint in "
    "both docs regardless of offset (a strided sampler misses "
    "copies at non-stride offsets); density ~2/(w+1) keeps the set "
    "~4x smaller than all positions. Pairs surface as span-level "
    "near-dups when the shared set covers >= 25% of the smaller "
    "doc's fingerprints (the containment-style overlap MOSS "
    "reports; an absolute count is non-discriminating under shared "
    "boilerplate vocabulary). Fingerprinting is ONE narrow array "
    "expression per "
    "doc (operators/textstats.winnow_fingerprints, no explode, no "
    "Python); the only shuffles are fingerprint-keyed — at corpus "
    "scale candidates are bounded by fingerprint-bucket occupancy, "
    "the q65/q241 blocking grammar at the span grain. Doc cap "
    f"{WINNOW_DOC_CAP} is the verification-sized contract (q66).",
)
def q278(spark: SparkSession, sf: str) -> DataFrame:
    fps = (
        table(spark, sf, "documents")
        .filter(F.col("doc_id") < WINNOW_DOC_CAP)
        .select(
            "doc_id",
            F.explode(ts.winnow_fingerprints("text")).alias("fp"),
        )
        .distinct()
    )
    fps = fps.localCheckpoint(eager=True)
    sizes = fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("nf")
    )
    a = fps.select(F.col("doc_id").alias("da"), "fp")
    b = fps.select(F.col("doc_id").alias("db"), "fp")
    pairs = (
        a.join(b, "fp")
        .filter(F.col("da") < F.col("db"))
        .groupBy("da", "db")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_fp"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("da"), F.col("nf").alias("na")
    )
    sb = sizes.select(
        F.col("doc_id").alias("db"), F.col("nf").alias("nb")
    )
    return (
        pairs.join(F.broadcast(sa), "da")
        .join(F.broadcast(sb), "db")
        .filter(
            F.col("n_shared_fp") * 1_000_000
            >= WINNOW_MIN_SHARE_PPM
            * F.least(F.col("na"), F.col("nb"))
        )
        .select(
            "da",
            "db",
            "n_shared_fp",
            F.expr(
                "CAST(n_shared_fp * 1000000 DIV least(na, nb) "
                "AS BIGINT)"
            ).alias("share_ppm"),
        )
        .orderBy("da", "db")
    )


#: q279: candidate watermarks (seconds) for the lateness accounting
WATERMARKS_S = (60, 300, 3600)

#: q279: max simulated ingest delay (seconds). The fixture's event_id
#: order IS event-time order, so measured lateness against raw arrival
#: would be identically zero (a vacuous gate — the r5 lesson); the
#: arrival process is modeled as ts + an md5(event_id)-derived delay
#: in [0, MAX_DELAY) — deterministic, cross-engine-exact, and bounded
#: so the three candidate watermarks split the distribution (1m and
#: 5m drop real counts; 1h provably drops nothing).
LATE_MAX_DELAY_S = 900


@register(
    "q279_watermark_lateness",
    oracle=f"""
        WITH a AS (
            SELECT epoch_us(ts) AS t,
                   epoch_us(ts) + 1000000 * (
                       CAST(CAST(concat('0x', substr(
                           md5(CAST(event_id AS VARCHAR)), 1, 8))
                           AS BIGINT) AS BIGINT)
                       % {LATE_MAX_DELAY_S}) AS arr,
                   event_id
            FROM events
        ),
        r AS (
            SELECT t,
                   MAX(t) OVER (ORDER BY arr, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS hw
            FROM a
        ),
        l AS (
            SELECT GREATEST(COALESCE(hw, t) - t, 0) AS late_us FROM r
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN late_us > {WATERMARKS_S[0]}000000
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_late_1m,
               CAST(SUM(CASE WHEN late_us > {WATERMARKS_S[1]}000000
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_late_5m,
               CAST(SUM(CASE WHEN late_us > {WATERMARKS_S[2]}000000
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_late_1h,
               CAST(MAX(late_us) AS BIGINT) AS max_late_us
        FROM l
    """,
    doc="Watermark-lateness accounting: for each event, its lateness "
    "against the running event-time high watermark in ARRIVAL order, "
    "then the exact drop "
    "counts a streaming watermark of 1m/5m/1h would have caused — "
    "the measurement that picks T4's withWatermark bound from data "
    "instead of folklore (too tight silently drops the tail this "
    "query counts; too loose holds state). Arrival is the modeled "
    "ingest process ts + md5(event_id)-derived delay < "
    f"{LATE_MAX_DELAY_S}s (the fixture's raw id order IS time order, "
    "which would measure nothing — vacuity pinned in tests); "
    "lateness is then provably < the delay bound, so the 1h "
    "watermark drops zero BY CONSTRUCTION while 1m/5m count real "
    "tails. The running MAX is the "
    "prefix-COMBINE twin of the banded cumsum: per-band maxima, "
    "band-grain strict-prefix max (the only unpartitioned window, "
    "band grain), in-band strict-prefix max partitioned by band — "
    "greatest of the two is the exact high watermark, no data-grain "
    "global window (the q194/q262/q267 contract; any associative "
    "combine bands this way). Microsecond-exact integers end to end "
    "(epoch_us / unix_micros).",
)
def q279(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    delay_s = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 8),
        16,
        10,
    ).cast("bigint") % LATE_MAX_DELAY_S
    arr = (
        F.unix_micros(F.col("ts")) + 1_000_000 * delay_s
    ).alias("arr")
    ev = table(spark, sf, "events").select(
        "event_id",
        F.unix_micros(F.col("ts")).alias("t"),
        arr,
    ).withColumn(
        # band on the ARRIVAL minute: monotone in the arrival order,
        # so in-band + strict-prefix-band maxima compose exactly
        "b", F.floor(F.col("arr") / 60_000_000).cast("bigint")
    )
    bmax = ev.groupBy("b").agg(F.max("t").alias("bm"))
    w_bands = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bands = bmax.select(
        "b", F.max("bm").over(w_bands).alias("prev_bands")
    )
    w_in = (
        Window.partitionBy("b")
        .orderBy("arr", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    late = (
        ev.withColumn("prev_in", F.max("t").over(w_in))
        .join(F.broadcast(bands), "b")
        .select(
            F.greatest(
                F.coalesce(
                    F.greatest(
                        F.col("prev_bands"), F.col("prev_in")
                    ),
                    F.col("prev_bands"),
                    F.col("prev_in"),
                    F.col("t"),
                )
                - F.col("t"),
                F.lit(0),
            ).alias("late_us")
        )
    )
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(
            (F.col("late_us") > WATERMARKS_S[0] * 1_000_000)
            .cast("int")
        ).cast("bigint").alias("n_late_1m"),
        F.sum(
            (F.col("late_us") > WATERMARKS_S[1] * 1_000_000)
            .cast("int")
        ).cast("bigint").alias("n_late_5m"),
        F.sum(
            (F.col("late_us") > WATERMARKS_S[2] * 1_000_000)
            .cast("int")
        ).cast("bigint").alias("n_late_1h"),
        F.max("late_us").cast("bigint").alias("max_late_us"),
    ]
    return late.agg(*aggs)


#: q280: k-core threshold. The graph matters more than k: the q267
#: temporal-adjacency graph is near-REGULAR (everyone close to avg
#: degree), where k-core is all-or-nothing — k=3 peeled nothing and
#: k=avg+1 cascaded to empty at every scale. The customer-supplier
#: bipartite graph has the heterogeneous degrees k-core is FOR
#: (customer side: min 1-3, p25 10-30; supplier side: 139+), and
#: orders-per-customer is scale-invariant, so k=8 peels some but
#: never all nodes at every fixture scale (non-vacuity pinned).
KCORE_K = 8


@register(
    "q280_kcore_decomposition",
    oracle=None,  # iterative peeling is not one SQL query; the
    # defining invariants (every core node has >= k in-core
    # neighbors; no removed node does) are pinned exactly in
    # tests/test_llm.py::test_q280_kcore_invariants
    doc=f"K-core decomposition (k={KCORE_K}) of the customer-"
    "supplier bipartite graph (distinct (custkey, suppkey) trade "
    "pairs; ids disambiguated 2c / 2s+1): iteratively peel nodes "
    "of degree < k "
    "to the unique maximal subgraph where every node keeps >= k "
    "neighbors — the periphery-robustness audit run before "
    "community detection (operators/graph.kcore; the graph-family "
    "sibling of q121 PageRank / q86 components / q267 triangles). "
    "Each round is one degree aggregate + two node-keyed semi-joins "
    "with only per-round edge COUNTS crossing to the driver (the "
    "q121/kmeans bounded-loop convention), localCheckpointed to "
    "constant lineage depth. Output is the one-row summary (k, "
    "core nodes/edges, peel rounds, an order-free node checksum "
    "pinning MEMBERSHIP, and the core's share of all nodes in "
    "exact ppm); rows-only by contract — recursive peeling is not "
    "a single SQL query — with the defining maximality invariants "
    "exact-tested instead.",
)
def q280(spark: SparkSession, sf: str) -> DataFrame:
    from speculare_pgcdc_spark.operators.graph import kcore

    li = table(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    orders = table(spark, sf, "orders").select(
        "o_orderkey", "o_custkey"
    )
    e = (
        li.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        )
        .select(
            (F.col("o_custkey") * 2).alias("ua"),
            (F.col("l_suppkey") * 2 + 1).alias("ub"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    core, iters = kcore(e, KCORE_K)
    nodes_all = (
        e.select(F.col("ua").alias("u"))
        .unionAll(e.select(F.col("ub").alias("u")))
        .distinct()
    )
    core_nodes = (
        core.select(F.col("ua").alias("u"))
        .unionAll(core.select(F.col("ub").alias("u")))
        .distinct()
    )
    stats = core_nodes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_core_nodes"),
        (
            F.sum(F.col("u").cast("decimal(38,0)"))
            % F.lit(10**18).cast("decimal(38,0)")
        ).cast("bigint").alias("core_node_checksum"),
    )
    return (
        stats.crossJoin(
            F.broadcast(
                core.agg(
                    F.count(F.lit(1)).cast("bigint")
                    .alias("n_core_edges")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                nodes_all.agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_nodes")
                )
            )
        )
        .select(
            F.lit(KCORE_K).cast("bigint").alias("k"),
            "n_nodes",
            "n_core_nodes",
            "n_core_edges",
            F.lit(iters).cast("bigint").alias("n_peel_rounds"),
            "core_node_checksum",
            F.expr(
                "n_core_nodes * 1000000 DIV greatest(n_nodes, 1)"
            ).cast("bigint").alias("core_share_ppm"),
        )
    )
