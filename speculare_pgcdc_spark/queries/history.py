"""Change-history, lifecycle, and lake-layout analytics (round 5).

The reference's CDC feed is consumed by subscribers that maintain
their own downstream state (src/forwarder/mod.rs hands each change to
the client); this module implements the state shapes and serving-side
analytics such a consumer builds, plus the storage-layout contracts a
lake deployment needs:

- history/state: SCD Type-2 build (q153), adoption curve (q156),
  run-length encoding (q174);
- detection/statistics: rolling distinct (q158), compound growth
  (q159), conversion latency (q167), burst detection (q168),
  recency-decay engagement (q169), banded percent_rank (q170),
  weighted median (q176), CUSUM changepoints (q177), two-proportion
  z-test (q180);
- layout/interchange proofs: bucketed co-located join (q160), CSV
  (q157) and ORC (q179) round trips, schema evolution (q165),
  partition pruning (q166).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from speculare_pgcdc_spark.catalog import table
from speculare_pgcdc_spark.functions import money_sum, oracle_money_sum
from speculare_pgcdc_spark.queries import register

#: per-pid scratch roots registered for atexit cleanup (the layout/
#: interchange queries write real files; a long-lived session must not
#: leak one tree per run into the system tempdir)
_SCRATCH_ROOTS: set[str] = set()


def _scratch(tag: str, sf: str) -> str:
    """Per-pid, per-fixture scratch dir, removed at interpreter exit."""
    root = os.path.join(tempfile.gettempdir(), f"{tag}_{os.getpid()}")
    if root not in _SCRATCH_ROOTS:
        _SCRATCH_ROOTS.add(root)
        atexit.register(shutil.rmtree, root, ignore_errors=True)
    return os.path.join(root, os.path.basename(os.path.normpath(sf)))


@register(
    "q153_scd2_history",
    oracle="""
        SELECT user_id,
               event_type AS attr_value,
               ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS valid_to,
               CAST(lead(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) IS NULL
                    AS BOOLEAN) AS is_current,
               CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS BIGINT) AS version
        FROM events
        ORDER BY user_id, version
    """,
    doc="SCD Type-2 dimension build from a change stream: each "
    "per-key change opens a validity interval [valid_from, valid_to) "
    "closed by the NEXT change's timestamp (lead over a total "
    "(ts, event_id) order — deterministic under timestamp ties), "
    "open-ended + flagged on the current version. This is the state "
    "shape a CDC subscriber (the reference's WS client) most commonly "
    "materializes; here it is one window over the per-key shuffle — "
    "no self-join, no driver state, and the partition key is the "
    "entity key so the build scales with keys, not history length "
    "per key beyond the per-partition sort.",
)
def q153(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        table(spark, sf, "events")
        .select("user_id", "event_type", "ts", "event_id")
        .select(
            "user_id",
            F.col("event_type").alias("attr_value"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
            F.lead("ts").over(w).isNull().alias("is_current"),
            F.row_number().over(w).cast("bigint").alias("version"),
        )
        .orderBy("user_id", "version")
    )


@register(
    "q156_new_users_curve",
    oracle="""
        WITH first_seen AS (
            SELECT user_id, CAST(MIN(ts) AS DATE) AS d
            FROM events GROUP BY user_id
        ),
        per_day AS (
            SELECT d, COUNT(*) AS new_users FROM first_seen GROUP BY d
        )
        SELECT d,
               CAST(new_users AS BIGINT) AS new_users,
               CAST(SUM(new_users) OVER (ORDER BY d
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cumulative_users
        FROM per_day
        ORDER BY d
    """,
    doc="Adoption curve: first-seen date per entity (one per-key min "
    "agg), daily new-entity counts, and the cumulative total via a "
    "running frame over the DAY-GRAIN aggregate — the unbounded "
    "window runs over rows bounded by distinct days, not events, so "
    "the single-partition window is a few thousand rows at ANY event "
    "volume. The same first-occurrence trick gives running distinct "
    "counts without any distinct-over-window operator.",
)
def q156(spark: SparkSession, sf: str) -> DataFrame:
    first_seen = (
        table(spark, sf, "events")
        .groupBy("user_id")
        .agg(F.min("ts").cast("date").alias("d"))
    )
    per_day = first_seen.groupBy("d").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_day.select(
            "d",
            F.col("new_users").cast("bigint").alias("new_users"),
            F.sum("new_users").over(w).cast("bigint")
            .alias("cumulative_users"),
        )
        .orderBy("d")
    )


@register(
    "q158_rolling_distinct_users",
    oracle="""
        WITH active AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        ),
        bounds AS (SELECT MAX(d) AS max_d FROM active),
        contrib AS (
            SELECT t.target_d, user_id
            FROM active,
                 LATERAL (
                    SELECT unnest(generate_series(
                        d, d + 6, INTERVAL 1 DAY)) AS target_d
                 ) t
        )
        SELECT CAST(target_d AS DATE) AS d,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users_7d
        FROM contrib CROSS JOIN bounds
        WHERE CAST(target_d AS DATE) <= max_d
        GROUP BY d
        ORDER BY d
    """,
    doc="Rolling 7-day distinct active users — the sliding-DISTINCT "
    "aggregate, which no window frame can express directly (COUNT "
    "DISTINCT over a moving range is not decomposable). The scalable "
    "rewrite: dedup to (user, day) grain first (one shuffle that "
    "collapses event volume to active-pairs), then each pair "
    "CONTRIBUTES to its 7 covered target days via a bounded explode "
    "— a fixed 7x fan-out of the already-deduped grain, never of raw "
    "events — and one distinct-agg per target day. Cost scales with "
    "active pairs x window days, independent of per-day event "
    "volume; the same shape yields any 'distinct over trailing K "
    "periods' metric.",
)
def q158(spark: SparkSession, sf: str) -> DataFrame:
    # r14 optimization (guide §1.2/§5): the distinct (user, day) frame
    # feeds both the max-day bound and the 7-day contribution explode
    # — unpinned, each consumer re-ran the corpus distinct (2 events
    # scans in the plan). Pin it once; it is the query's bounded
    # |users| x |days| grain.
    active = (
        table(spark, sf, "events")
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    bounds = active.agg(F.max("d").alias("max_d"))
    contrib = active.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("d"), F.date_add(F.col("d"), 6)
            )
        ).alias("d"),
    )
    return (
        contrib.crossJoin(F.broadcast(bounds))
        .filter(F.col("d") <= F.col("max_d"))
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("users_7d"))
        .orderBy("d")
    )


@register(
    "q159_compound_growth",
    oracle="""
        WITH s AS (
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT) AS n_periods,
                   SUM(CAST(ln(1.0 + fmod(value, 10.0) / 100.0)
                            AS DECIMAL(28,12))) AS ls
            FROM events GROUP BY user_id
        )
        SELECT user_id, n_periods,
               CAST(ROUND(ls, 6) AS DOUBLE) AS log_factor,
               CAST(ROUND(exp(LEAST(CAST(ls AS DOUBLE), 20.0)), 6)
                    AS DOUBLE) AS compound_factor
        FROM s ORDER BY user_id
    """,
    doc="Compound growth per entity — the PRODUCT aggregate, which "
    "Spark (and SQL) lack natively, via the exp-sum-log identity: "
    "prod(1+r) = exp(sum(ln(1+r))). Each period's growth factor is "
    "derived arithmetically from the value column; the log terms are "
    "identical IEEE doubles in both engines and accumulate in "
    "DECIMAL (the q136 contract) so shuffle order cannot move the "
    "sum. The EXACT result is published in the log domain "
    "(log_factor, decimal-rounded); the linear-domain factor clamps "
    "the exp argument at 20 — the skew01 sweep proved exp(), unlike "
    "ln(), is NOT bit-identical across libms at large arguments "
    "(a hot entity's 13k-period sum reached e^76 ~ 1e33, where a "
    "2-ulp exp spread sits far above any ROUND grid; below e^20 "
    "~ 4.9e8 the 6-decimal round absorbs ulp spread), and a product "
    "past e^20 is not a meaningful double anyway — the log column "
    "carries it exactly. One hash agg — the product distributes "
    "exactly like a sum, partial-merged map-side.",
)
def q159(spark: SparkSession, sf: str) -> DataFrame:
    term = F.log(1.0 + F.col("value") % 10.0 / 100.0).cast(
        "decimal(28,12)"
    )
    return (
        table(spark, sf, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_periods"),
            F.sum(term).alias("ls"),
        )
        .select(
            "user_id",
            "n_periods",
            F.round(F.col("ls"), 6).cast("double").alias("log_factor"),
            F.round(
                F.exp(F.least(F.col("ls").cast("double"), F.lit(20.0))),
                6,
            ).cast("double").alias("compound_factor"),
        )
        .orderBy("user_id")
    )


@register(
    "q160_bucketed_join",
    oracle=f"""
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               {oracle_money_sum('o_totalprice', 'total')}
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    doc="Co-located join via bucketing — the layout that removes the "
    "per-query shuffle from a repeated big-big join (the 100 TB "
    "answer when neither side broadcasts): both tables are written "
    "bucketed AND sorted on the join key into the same bucket count, "
    "so the join runs bucket-to-bucket with NO Exchange on either "
    "side (lint-asserted); the only shuffle left is the final "
    "aggregate. Bucketing cost is paid ONCE at layout time and "
    "amortized over every subsequent join on that key — the "
    "warehouse pattern for fact-fact joins; the z-order layout "
    "(SCALING.md) is the same idea for range predicates.",
)
def q160(spark: SparkSession, sf: str) -> DataFrame:
    q160_build_layout(spark, sf)
    return q160_join_only(spark, sf)


def _q160_db(sf: str) -> str:
    # per-FIXTURE database name: LOCATION is fixed at first creation,
    # so a shared name would silently write a second sf_dir's buckets
    # under the first fixture's directory (round-5 advice finding)
    return "bucket_demo_" + (
        os.path.basename(os.path.normpath(sf))
        .replace(".", "_").replace("-", "_")
    )


def q160_build_layout(spark: SparkSession, sf: str) -> None:
    """The LAYOUT leg of q160: two bucketed+sorted table writes. Split
    out (round-13 verdict #4) so bench.py can price it separately —
    the layout is a once-per-dataset cost a warehouse amortizes over
    every later join, and folding it into the per-query timing made
    the join read as a 93x 'regression' against a join-only oracle
    (BENCH_DETAIL_r13 footnote)."""
    loc = _scratch("spark_bucket_demo", sf)
    db = _q160_db(sf)
    # explicit LOCATION: warehouse.dir is static config on a running
    # session, and the driver's cwd must never grow a spark-warehouse
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{loc}'"
    )
    for name, key in (("orders", "o_custkey"), ("customer", "c_custkey")):
        tbl = f"{db}.{name}_b"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        (
            table(spark, sf, name)
            .write.bucketBy(8, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(tbl)
        )


def q160_join_only(spark: SparkSession, sf: str) -> DataFrame:
    """The JOIN leg of q160: bucket-to-bucket sort-merge over the
    already-built layout — the per-query cost that actually recurs.
    Requires :func:`q160_build_layout` to have run for this sf."""
    db = _q160_db(sf)
    orders_b = spark.table(f"{db}.orders_b").select(
        "o_custkey", "o_totalprice"
    )
    cust_b = spark.table(f"{db}.customer_b").select(
        "c_custkey", "c_mktsegment"
    )
    # MERGE hint: at fixture scale Catalyst would broadcast the small
    # side (also shuffle-free, but trivially); the claim under test is
    # the big-big case — bucket-to-bucket sort-merge with NO exchange
    # and NO per-query sort, which is what remains at 100 TB
    return (
        orders_b.hint("merge")
        .join(cust_b, orders_b.o_custkey == cust_b.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum("o_totalprice", "total"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "q167_conversion_latency",
    oracle="""
        WITH firsts AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'view' THEN ts END)
                       AS first_view,
                   MIN(CASE WHEN event_type = 'purchase' THEN ts END)
                       AS first_purchase
            FROM events GROUP BY user_id
        )
        SELECT user_id, first_view, first_purchase,
               CAST(date_diff('second', first_view, first_purchase)
                    AS BIGINT) AS latency_s
        FROM firsts
        WHERE first_view IS NOT NULL
          AND first_purchase IS NOT NULL
          AND first_purchase >= first_view
        ORDER BY user_id
    """,
    doc="Conversion latency: per entity, the time from first exposure "
    "(view) to first conversion (purchase) — the product-analytics "
    "companion to q98's ordered funnel (which counts converters; this "
    "measures HOW LONG). Both firsts come from one conditional-min "
    "hash agg — no self-join, no window; the latency is an exact "
    "integer second difference, engine-stable by construction. "
    "Same single-shuffle shape at any volume.",
)
def q167(spark: SparkSession, sf: str) -> DataFrame:
    firsts = (
        table(spark, sf, "events")
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "view", F.col("ts"))
            ).alias("first_view"),
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            ).alias("first_purchase"),
        )
    )
    return (
        firsts.filter(
            F.col("first_view").isNotNull()
            & F.col("first_purchase").isNotNull()
            & (F.col("first_purchase") >= F.col("first_view"))
        )
        .select(
            "user_id",
            "first_view",
            "first_purchase",
            (
                F.unix_timestamp("first_purchase")
                - F.unix_timestamp("first_view")
            ).cast("bigint").alias("latency_s"),
        )
        .orderBy("user_id")
    )


@register(
    "q168_burst_detection",
    oracle="""
        WITH minutes AS (
            SELECT event_type, date_trunc('minute', ts) AS m,
                   COUNT(*) AS x
            FROM events GROUP BY event_type, m
        ),
        stats AS (
            SELECT event_type,
                   COUNT(*) AS n,
                   SUM(x) AS sx,
                   SUM(x * x) AS sxx
            FROM minutes GROUP BY event_type
        )
        SELECT mi.event_type, m, CAST(x AS BIGINT) AS x,
               CAST(sx * 1000000 // n AS BIGINT) AS mean_rate_ppm
        FROM minutes mi JOIN stats st ON mi.event_type = st.event_type
        WHERE n > 1
          AND x - sx * 1.0 / n
              > 3 * sqrt((n * sxx - sx * sx) * 1.0 / (n * (n - 1)))
        ORDER BY mi.event_type, m
    """,
    doc="Burst detection on the per-minute event-rate series: flag "
    "minutes more than 3 sigma above their type's mean rate — the "
    "time-series spike audit (abuse, retry storms, scraper bursts) "
    "at the AGGREGATED grain, vs q147's per-event outliers. The "
    "variance comes from EXACT integer sums (n*Sxx - Sx^2 over "
    "n(n-1)) — never a float accumulation whose shuffle order could "
    "move the threshold — and sqrt is IEEE-correctly-rounded in both "
    "engines, so the 3-sigma compare is engine-stable. Two stacked "
    "aggs (minute grain, then per-type moments broadcast back).",
)
def q168(spark: SparkSession, sf: str) -> DataFrame:
    minutes = (
        table(spark, sf, "events")
        .groupBy(
            "event_type", F.date_trunc("minute", "ts").alias("m")
        )
        .agg(F.count(F.lit(1)).alias("x"))
        # shared by the moments agg AND the flag join — checkpointing
        # the (tiny) minute grain scans events once, not twice
        .localCheckpoint(eager=True)
    )
    stats = minutes.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    mean = F.col("sx") * 1.0 / F.col("n")
    sigma = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * 1.0
        / (F.col("n") * (F.col("n") - 1))
    )
    return (
        minutes.join(F.broadcast(stats), "event_type")
        .filter(
            (F.col("n") > 1) & (F.col("x") - mean > 3 * sigma)
        )
        .select(
            "event_type",
            "m",
            F.col("x").cast("bigint").alias("x"),
            # exact-rational output as integer ppm, never round():
            # sx/n hits 4-decimal ties (e.g. 1/160) that Spark and
            # DuckDB round differently from the same double
            F.expr("sx * 1000000 DIV n").cast("bigint")
            .alias("mean_rate_ppm"),
        )
        .orderBy("event_type", "m")
    )


@register(
    "q169_decay_engagement",
    oracle="""
        WITH ref AS (SELECT MAX(CAST(ts AS DATE)) AS ref_d FROM events)
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(ROUND(SUM(CAST(
                   value / (1 + date_diff('day', CAST(ts AS DATE), ref_d))
                   AS DECIMAL(28,10))), 4) AS DOUBLE)
                   AS engagement
        FROM events CROSS JOIN ref
        GROUP BY user_id
        ORDER BY user_id
    """,
    doc="Recency-weighted engagement score: each event contributes "
    "value/(1 + age_days) relative to the corpus's latest day — the "
    "feature-store scoring pattern where recent activity dominates. "
    "Hyperbolic decay is deliberate: the weight is an exact rational "
    "of an integer day difference (identical IEEE division in both "
    "engines), where an exponential exp(-lambda*age) would put a "
    "libm call inside the SUM and last-ulp differences could "
    "accumulate. Terms sum in DECIMAL (the q136 contract) and the "
    "final ROUND runs IN the decimal domain (rounding after a "
    "decimal->double cast let an exact .xxxx5 sum round differently "
    "per engine — caught by the skew01 sweep, SKEW_SWEEP_r10); the "
    "reference day is a 1-row broadcast, the score one hash agg.",
)
def q169(spark: SparkSession, sf: str) -> DataFrame:
    events = table(spark, sf, "events").select(
        "user_id", "value", F.col("ts").cast("date").alias("d")
    )
    ref = events.agg(F.max("d").alias("ref_d"))
    term = (
        F.col("value") / (1 + F.datediff(F.col("ref_d"), F.col("d")))
    ).cast("decimal(28,10)")
    return (
        events.crossJoin(F.broadcast(ref))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(term), 4).cast("double").alias("engagement"),
        )
        .orderBy("user_id")
    )


#: value-bin width for the banded global rank (q170)
RANK_BIN = 10_000


@register(
    "q170_banded_percent_rank",
    oracle="""
        WITH g AS (
            SELECT o_totalprice AS v, COUNT(*) AS cnt
            FROM orders GROUP BY v
        ),
        t AS (SELECT SUM(cnt) AS n FROM g)
        SELECT v, CAST(cnt AS BIGINT) AS cnt,
               CAST(COALESCE(SUM(cnt) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0) * 1000000
                    -- greatest(,1): a single-row input must yield
                    -- ppm 0, not NULL (Spark) / div-by-zero (DuckDB)
                    // greatest(n - 1, 1)
                    AS BIGINT) AS pr_ppm
        FROM g CROSS JOIN t
        ORDER BY v
    """,
    doc="Exact global percent_rank WITHOUT a global data-grain window "
    "— the distributed form of the rank/CDF feature-scaling pass "
    "(quantile-normalizing a score column). Reduce to the distinct-"
    "value grain, then strictly-smaller counts assemble from (a) a "
    "cumsum over the tiny value-BIN aggregate and (b) an in-bin "
    "prefix window — the q80/q163 banding, so the only unpartitioned "
    "window runs over one row per bin. percent_rank's tie semantics "
    "((strictly smaller)/(n-1)) fall out exactly, emitted as "
    "integer-division ppm so no float rounding sits in the contract. "
    "The oracle states the same thing with DuckDB's single-partition "
    "window — correct as a spec, the very plan shape this query "
    "exists to avoid.",
)
def q170(spark: SparkSession, sf: str) -> DataFrame:
    g = (
        table(spark, sf, "orders")
        .groupBy(F.col("o_totalprice").alias("v"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("b", F.floor(F.col("v") / RANK_BIN))
    )
    g = g.localCheckpoint(eager=True)
    bins = g.groupBy("b").agg(F.sum("cnt").alias("bcnt"))
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
    n = g.agg(F.sum("cnt").alias("n"))
    return (
        g.withColumn(
            "below_in_bin",
            F.coalesce(F.sum("cnt").over(w_in), F.lit(0)),
        )
        .join(F.broadcast(bins.select("b", "below_bins")), "b")
        .crossJoin(F.broadcast(n))
        .select(
            "v",
            F.col("cnt").cast("bigint").alias("cnt"),
            F.expr(
                "(below_bins + below_in_bin) * 1000000 "
                "DIV greatest(n - 1, 1)"
            ).cast("bigint").alias("pr_ppm"),
        )
        .orderBy("v")
    )


@register(
    "q184_lorenz_deciles",
    oracle="""
        WITH per_cust AS (
            SELECT o_custkey,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6)))
                        AS DECIMAL(28,6)) AS rev
            FROM orders GROUP BY o_custkey
        ),
        ranked AS (
            SELECT o_custkey, rev,
                   NTILE(10) OVER (ORDER BY rev, o_custkey) AS decile
            FROM per_cust
        ),
        by_decile AS (
            -- whole-DOLLAR BIGINT units (FLOOR, not CAST — DuckDB
            -- casts decimal->int by rounding, Spark by truncation):
            -- the ppm math must stay pure integer (decimal // in
            -- DuckDB rounds its intermediate quotient), and dollar
            -- grain keeps total*1e6 inside int64 past SF 1000 where
            -- cents would overflow around SF 0.4
            SELECT decile, COUNT(*) AS n, SUM(rev) AS rev,
                   CAST(SUM(FLOOR(rev)) AS BIGINT) AS rev_u
            FROM ranked GROUP BY decile
        ),
        tot AS (SELECT SUM(rev_u) AS total_u FROM by_decile)
        SELECT CAST(decile AS INTEGER) AS decile,
               CAST(n AS BIGINT) AS n,
               -- round->double on OUTPUT only (registry stability
               -- convention); the ppm math stays integer/decimal
               CAST(ROUND(rev, 2) AS DOUBLE) AS rev,
               CAST(SUM(rev_u * 1000000) OVER (ORDER BY decile
                        ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) // total_u AS BIGINT)
                   AS cum_share_ppm
        FROM by_decile CROSS JOIN tot
        ORDER BY decile
    """,
    doc="Lorenz curve by revenue decile — the distributional "
    "companion to q137's Gini scalar (the curve SHOWS the "
    "concentration the coefficient summarizes): customers ranked by "
    "exact decimal revenue under a total (rev, key) order, decile "
    "assignment via the banded global rank (operators/rankband.py — "
    "no entity-grain single-partition window; the oracle's NTILE is "
    "the spec, the banded integer arithmetic is the plan), "
    "cumulative revenue share as integer ppm over the 10-row decile "
    "aggregate. Decimal sums end-to-end; output money renders "
    "round->double per the registry convention.",
)
def q184(spark: SparkSession, sf: str) -> DataFrame:
    from speculare_pgcdc_spark.operators.rankband import banded_ntile

    # raw DECIMAL revenue (not money_sum, whose display cast rounds
    # through double): the ppm integer division needs exact decimals
    per_cust = (
        table(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
            .cast("decimal(28,6)").alias("rev")
        )
    )
    ranked = banded_ntile(
        per_cust,
        [F.col("rev"), F.col("o_custkey")],
        F.floor(F.col("rev") / 10_000).cast("bigint"),
        10,
        out="decile",
    )
    by_decile = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rev").alias("rev"),
        F.sum(F.floor("rev")).cast("bigint").alias("rev_u"),
    )
    # pin the 10-row aggregate: tot and the crossJoin are two
    # consumers, and without the checkpoint the per-customer agg plus
    # the ntile window would execute twice
    by_decile = by_decile.localCheckpoint(eager=True)
    tot = by_decile.agg(F.sum("rev_u").alias("total_u"))
    return (
        by_decile.crossJoin(F.broadcast(tot))
        .withColumn(
            "cum_share_ppm",
            F.expr(
                "sum(rev_u * 1000000) OVER (ORDER BY decile "
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
                "DIV total_u"
            ),
        )
        .select(
            F.col("decile").cast("int").alias("decile"),
            F.col("n").cast("bigint").alias("n"),
            # round->double on output only; ppm math stayed decimal
            F.round("rev", 2).cast("double").alias("rev"),
            "cum_share_ppm",
        )
        .orderBy("decile")
    )


@register(
    "q181_seasonal_profile",
    oracle="""
        WITH hourly AS (
            SELECT event_type,
                   CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hr,
                   COUNT(*) AS n
            FROM events GROUP BY event_type, hr
        ),
        tot AS (
            SELECT event_type, SUM(n) AS total, MAX(n) AS peak
            FROM hourly GROUP BY event_type
        )
        SELECT h.event_type, hr, CAST(n AS BIGINT) AS n,
               CAST(n * 1000000 // total AS BIGINT) AS share_ppm,
               CAST(n = peak AS BOOLEAN) AS is_peak
        FROM hourly h JOIN tot t ON h.event_type = t.event_type
        ORDER BY h.event_type, hr
    """,
    doc="Seasonality profile: each event type's hour-of-day activity "
    "distribution with integer-ppm shares and a peak-hour flag — the "
    "baseline that turns raw burst detection (q168) into "
    "seasonality-AWARE monitoring (an 09:00 spike can be normal; the "
    "same rate at 03:00 is not). Output is bounded at types x 24 "
    "rows regardless of volume; one hour-grain agg plus its tiny "
    "per-type rollup joined back broadcast. The ppm share keeps "
    "float rounding out of the contract (the q170 convention).",
)
def q181(spark: SparkSession, sf: str) -> DataFrame:
    hourly = (
        table(spark, sf, "events")
        .groupBy(
            "event_type", F.hour("ts").cast("int").alias("hr")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    hourly = hourly.localCheckpoint(eager=True)
    tot = hourly.groupBy("event_type").agg(
        F.sum("n").alias("total"), F.max("n").alias("peak")
    )
    return (
        hourly.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "hr",
            F.col("n").cast("bigint").alias("n"),
            F.expr("n * 1000000 DIV total").cast("bigint")
            .alias("share_ppm"),
            (F.col("n") == F.col("peak")).alias("is_peak"),
        )
        .orderBy("event_type", "hr")
    )


@register(
    "q182_windowed_funnel",
    oracle="""
        WITH fv AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'view' THEN ts END)
                       AS first_view
            FROM events GROUP BY user_id
        ),
        conv AS (
            SELECT f.user_id, f.first_view,
                   MAX(CASE WHEN e.event_type = 'purchase'
                             AND e.ts >= f.first_view
                             AND e.ts < f.first_view + INTERVAL 3 DAY
                            THEN 1 ELSE 0 END) AS converted
            FROM fv f JOIN events e ON f.user_id = e.user_id
            WHERE f.first_view IS NOT NULL
            GROUP BY f.user_id, f.first_view
        )
        SELECT CAST(first_view AS DATE) AS cohort_d,
               CAST(COUNT(*) AS BIGINT) AS n_viewers,
               CAST(SUM(converted) AS BIGINT) AS n_converted_3d,
               CAST(SUM(converted) * 1000000 // COUNT(*) AS BIGINT)
                   AS rate_ppm
        FROM conv
        GROUP BY cohort_d
        ORDER BY cohort_d
    """,
    doc="Time-constrained funnel: conversion counts only if the "
    "purchase lands within 3 days AFTER the user's first exposure — "
    "the windowed variant of q98's ordered funnel (which accepts any "
    "later step) and the cohorted companion to q167's latency "
    "distribution. First-exposure from one conditional-min agg, the "
    "window test as a same-key equi-join back onto the event stream "
    "(co-partitioned on user_id — the join reuses the agg's "
    "shuffle), then a date-grain cohort rollup with integer-ppm "
    "rates. No theta-join: the time window rides the user_id "
    "equi-join as a post-join filter.",
)
def q182(spark: SparkSession, sf: str) -> DataFrame:
    events = table(spark, sf, "events").select(
        "user_id", "event_type", "ts"
    )
    fv = (
        events.groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "view", F.col("ts"))
            ).alias("first_view")
        )
        .filter(F.col("first_view").isNotNull())
    )
    conv = (
        fv.join(events, "user_id")
        .groupBy("user_id", "first_view")
        .agg(
            F.max(
                (
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("first_view"))
                    & (
                        F.col("ts")
                        < F.col("first_view") + F.expr("INTERVAL 3 DAY")
                    )
                ).cast("int")
            ).alias("converted")
        )
    )
    return (
        conv.groupBy(
            F.col("first_view").cast("date").alias("cohort_d")
        )
        .agg(
            F.count(F.lit(1)).alias("n_viewers"),
            F.sum("converted").alias("n_converted_3d"),
        )
        .select(
            "cohort_d",
            F.col("n_viewers").cast("bigint").alias("n_viewers"),
            F.col("n_converted_3d").cast("bigint")
            .alias("n_converted_3d"),
            F.expr("n_converted_3d * 1000000 DIV n_viewers")
            .cast("bigint").alias("rate_ppm"),
        )
        .orderBy("cohort_d")
    )


@register(
    "q180_ab_significance",
    oracle="""
        WITH assign AS (
            SELECT user_id,
                   CAST(user_id % 2 AS INTEGER) AS variant,
                   MAX(CASE WHEN event_type = 'purchase'
                                 AND value > 150
                            THEN 1 ELSE 0 END) AS converted
            FROM events GROUP BY user_id
        ),
        arms AS (
            SELECT variant, COUNT(*) AS n, SUM(converted) AS x
            FROM assign GROUP BY variant
        ),
        wide AS (
            SELECT MAX(CASE WHEN variant = 0 THEN n END) AS n0,
                   MAX(CASE WHEN variant = 0 THEN x END) AS x0,
                   MAX(CASE WHEN variant = 1 THEN n END) AS n1,
                   MAX(CASE WHEN variant = 1 THEN x END) AS x1
            FROM arms
        )
        SELECT CAST(n0 AS BIGINT) AS n0, CAST(x0 AS BIGINT) AS x0,
               CAST(n1 AS BIGINT) AS n1, CAST(x1 AS BIGINT) AS x1,
               CAST(ROUND(
                   (x1 * 1.0 / n1 - x0 * 1.0 / n0)
                   / sqrt(((x0 + x1) * 1.0 / (n0 + n1))
                          * (1 - (x0 + x1) * 1.0 / (n0 + n1))
                          * (1.0 / n0 + 1.0 / n1)), 4)
               AS DOUBLE) AS z,
               CAST(abs(
                   (x1 * 1.0 / n1 - x0 * 1.0 / n0)
                   / sqrt(((x0 + x1) * 1.0 / (n0 + n1))
                          * (1 - (x0 + x1) * 1.0 / (n0 + n1))
                          * (1.0 / n0 + 1.0 / n1))) > 1.96
               AS BOOLEAN) AS significant_95
        FROM wide
    """,
    doc="Two-proportion z-test — A/B experiment significance on "
    "conversion rates (variant = a deterministic hash split; here "
    "user parity stands in for the assignment column). Per-user "
    "conversion from one conditional-max agg, per-arm counts from a "
    "2-row rollup, then the pooled-proportion z statistic computed "
    "entirely from exact integer ratios — both engines build "
    "identical IEEE doubles, sqrt is correctly rounded, so even the "
    "boolean significance verdict is engine-stable. The entire test "
    "is two tiny aggregations over one scan; at any scale the "
    "statistics cross to the driver as a single row.",
)
def q180(spark: SparkSession, sf: str) -> DataFrame:
    assign = (
        table(spark, sf, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                (
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > 150)
                ).cast("int")
            ).alias("converted")
        )
        .select(
            (F.col("user_id") % 2).cast("int").alias("variant"),
            "converted",
        )
    )
    arms = assign.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("x")
    )
    wide = arms.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("x"))).alias("x0"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("x"))).alias("x1"),
    )
    p0 = F.col("x0") * 1.0 / F.col("n0")
    p1 = F.col("x1") * 1.0 / F.col("n1")
    pp = (F.col("x0") + F.col("x1")) * 1.0 / (F.col("n0") + F.col("n1"))
    z = (p1 - p0) / F.sqrt(
        pp * (1 - pp) * (1.0 / F.col("n0") + 1.0 / F.col("n1"))
    )
    return wide.select(
        F.col("n0").cast("bigint").alias("n0"),
        F.col("x0").cast("bigint").alias("x0"),
        F.col("n1").cast("bigint").alias("n1"),
        F.col("x1").cast("bigint").alias("x1"),
        F.round(z, 4).cast("double").alias("z"),
        (F.abs(z) > 1.96).alias("significant_95"),
    )


@register(
    "q179_orc_roundtrip",
    oracle=f"""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               {oracle_money_sum('value', 'total')},
               CAST(MIN(event_id) AS BIGINT) AS min_id,
               CAST(MAX(event_id) AS BIGINT) AS max_id
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc="ORC interchange scan (the columnar alternative beside q157's "
    "CSV and the parquet default): project events to ORC via the "
    "sources writer, read it back, aggregate — hash-matching the "
    "parquet-side oracle proves the round trip lossless including "
    "the typed bigint/double columns. ORC carries the same "
    "pushdown/pruning machinery as parquet in Spark (predicate "
    "pushdown, column projection, stripe-level statistics), so the "
    "scan-side scale story is unchanged; the format exists for "
    "warehouses standardized on Hive-era layouts.",
)
def q179(spark: SparkSession, sf: str) -> DataFrame:
    from speculare_pgcdc_spark.sources import read_orc, write_orc

    src = table(spark, sf, "events").select(
        "event_id", "event_type", "value"
    )
    out = _scratch("spark_orc_roundtrip", sf)
    write_orc(src, out)
    return (
        read_orc(spark, out)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            money_sum("value", "total"),
            F.min("event_id").cast("bigint").alias("min_id"),
            F.max("event_id").cast("bigint").alias("max_id"),
        )
        .orderBy("event_type")
    )


@register(
    "q176_weighted_median",
    oracle="""
        WITH w AS (
            SELECT l_returnflag, l_extendedprice AS price,
                   CAST(l_quantity AS DECIMAL(18,2)) AS qty,
                   SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
                       PARTITION BY l_returnflag
                       ORDER BY l_extendedprice, l_orderkey, l_linenumber
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cumw,
                   SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
                       PARTITION BY l_returnflag) AS total_w
            FROM lineitem
        )
        SELECT l_returnflag,
               -- round->double on OUTPUT only (registry stability
               -- convention): the half-mass predicate above stays
               -- DECIMAL-exact; raw decimal output columns render
               -- engine-dependently in the driver's canonicalizer
               CAST(ROUND(total_w, 2) AS DOUBLE) AS total_w,
               MIN(price) AS wmedian
        FROM w
        WHERE cumw * 2 >= total_w
        GROUP BY l_returnflag, total_w
        ORDER BY l_returnflag
    """,
    doc="Weighted median (lower): the smallest price whose cumulative "
    "QUANTITY weight reaches half the group's total — the "
    "volume-weighted robust center (plain median treats a 1-unit and "
    "a 1000-unit line equally; this doesn't). One cumulative window "
    "over a TOTAL (price, orderkey, linenumber) order per group plus "
    "the group-total as an unframed window on the same shuffle; the "
    "half-mass test is DECIMAL-exact (cumw*2 >= W, no float division "
    "anywhere), and the qualifying-row pick is a plain MIN — no "
    "second window. Same shape yields any weighted percentile.",
)
def q176(spark: SparkSession, sf: str) -> DataFrame:
    qty = F.col("l_quantity").cast("decimal(18,2)")
    worder = Window.partitionBy("l_returnflag").orderBy(
        "price", "l_orderkey", "l_linenumber"
    )
    li = table(spark, sf, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").alias("price"),
        "l_orderkey",
        "l_linenumber",
        qty.alias("qty"),
    )
    w = li.select(
        "l_returnflag",
        "price",
        F.sum("qty")
        .over(worder.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cumw"),
        F.sum("qty")
        .over(Window.partitionBy("l_returnflag"))
        .alias("total_w"),
    )
    return (
        w.filter(F.col("cumw") * 2 >= F.col("total_w"))
        .groupBy("l_returnflag", "total_w")
        .agg(F.min("price").alias("wmedian"))
        .select(
            "l_returnflag",
            # round->double on output only; half-mass test was decimal
            F.round("total_w", 2).cast("double").alias("total_w"),
            "wmedian",
        )
        .orderBy("l_returnflag")
    )


@register(
    "q177_cusum_changepoints",
    oracle="""
        WITH minutes AS (
            SELECT event_type, date_trunc('minute', ts) AS m,
                   COUNT(*) AS x
            FROM events GROUP BY event_type, m
        ),
        stats AS (
            SELECT event_type, COUNT(*) AS n, SUM(x) AS sx,
                   SUM(x * x) AS sxx
            FROM minutes GROUP BY event_type
        ),
        curve AS (
            -- integer-scaled cumsum: C*n = sum(x*n - sx) is EXACT
            -- BIGINT arithmetic, immune to windowed-float
            -- accumulation order (DuckDB's segment-tree vs Spark's
            -- sequential summation disagree in the last ulp)
            SELECT mi.event_type, m, x, n, sx, sxx,
                   SUM(x * n - sx) OVER (
                       PARTITION BY mi.event_type ORDER BY m
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cn
            FROM minutes mi JOIN stats st
              ON mi.event_type = st.event_type
            WHERE n > 1
        ),
        s AS (
            SELECT event_type, m, x, n, sxx, sx,
                   cn - MIN(cn) OVER (PARTITION BY event_type ORDER BY m
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS sn
            FROM curve
        )
        SELECT event_type, m, CAST(x AS BIGINT) AS x,
               CAST(sn * 10000 // n AS BIGINT) AS s_x10000
        FROM s
        WHERE sn > 3 * sqrt((n * sxx - sx * sx) * 1.0
                            / (n * (n - 1))) * n
        ORDER BY event_type, m
    """,
    doc="CUSUM changepoint detection on the per-minute rate series — "
    "the sustained-drift detector (q168's 3-sigma catches single "
    "spikes; CUSUM accumulates small persistent shifts). The "
    "textbook recursion S_t = max(0, S_{t-1} + x_t - mu) is not "
    "window-expressible, but its CLOSED FORM is: S_t = C_t - "
    "min_{j<=t}(C_j) with C the cumsum of deviations — two running "
    "windows on one per-series ordered shuffle, no recursion, no "
    "UDF. The cumsum runs INTEGER-SCALED (C*n = sum of x*n - sx, "
    "exact BIGINT) because windowed FLOAT accumulation is not "
    "engine-stable — DuckDB's segment-tree summation and Spark's "
    "sequential one can differ in the last ulp; the statistic, the "
    "3-sigma compare (scaled by n), and the x10000 output are all "
    "integer arithmetic on top of it.",
)
def q177(spark: SparkSession, sf: str) -> DataFrame:
    minutes = (
        table(spark, sf, "events")
        .groupBy("event_type", F.date_trunc("minute", "ts").alias("m"))
        .agg(F.count(F.lit(1)).alias("x"))
        .localCheckpoint(eager=True)
    )
    stats = minutes.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    run = (
        Window.partitionBy("event_type")
        .orderBy("m")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    curve = (
        minutes.join(F.broadcast(stats), "event_type")
        .filter(F.col("n") > 1)
        .withColumn(
            "cn",
            F.sum(
                F.col("x") * F.col("n") - F.col("sx")
            ).over(run),
        )
    )
    s = curve.withColumn("sn", F.col("cn") - F.min("cn").over(run))
    sigma = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * 1.0
        / (F.col("n") * (F.col("n") - 1))
    )
    return (
        s.filter(F.col("sn") > 3 * sigma * F.col("n"))
        .select(
            "event_type",
            "m",
            F.col("x").cast("bigint").alias("x"),
            F.expr("sn * 10000 DIV n").cast("bigint")
            .alias("s_x10000"),
        )
        .orderBy("event_type", "m")
    )


@register(
    "q174_run_length_encoding",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type, ts, event_id,
                   CASE WHEN lag(event_type) OVER w IS DISTINCT FROM
                             event_type THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        runs AS (
            SELECT user_id, event_type,
                   SUM(brk) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS run_id
            FROM seq
        )
        SELECT user_id, CAST(run_id AS BIGINT) AS run_id,
               event_type, CAST(COUNT(*) AS BIGINT) AS run_len
        FROM runs
        GROUP BY user_id, run_id, event_type
        ORDER BY user_id, run_id
    """,
    doc="Run-length encoding of per-entity event sequences — collapse "
    "consecutive equal values into (value, length) runs (the "
    "gaps-and-islands pattern; in pipelines, the compression step "
    "before sequence modeling and the repetition detector on "
    "behavioral streams). Break flags from one lag() comparison, run "
    "ids from the running sum of breaks — both windows share the "
    "same per-entity (ts, id)-ordered shuffle, then one hash agg "
    "collapses runs. IS DISTINCT FROM semantics make null values "
    "form runs like any other value.",
)
def q174(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    seq = table(spark, sf, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    brk = (
        ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type"))
    ).cast("int")
    runs = seq.withColumn("brk", brk).withColumn(
        "run_id", F.sum("brk").over(wrun)
    )
    return (
        runs.groupBy("user_id", "run_id", "event_type")
        .agg(F.count(F.lit(1)).alias("run_len"))
        .select(
            "user_id",
            F.col("run_id").cast("bigint").alias("run_id"),
            "event_type",
            F.col("run_len").cast("bigint").alias("run_len"),
        )
        .orderBy("user_id", "run_id")
    )


@register(
    "q165_schema_evolution",
    oracle=f"""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(value_sq) AS BIGINT) AS n_with_new_col,
               {oracle_money_sum('COALESCE(value_sq, 0)', 'total_sq')}
        FROM (
            SELECT event_type,
                   CASE WHEN event_id % 2 = 0
                        THEN value * value END AS value_sq
            FROM events
        )
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc="Schema evolution on the lake: two parquet generations of the "
    "same table — the second adds a value_sq column — read back as "
    "ONE frame via mergeSchema, with the missing column NULL for "
    "old-generation rows (counted next to the total so the "
    "generation mix is visible). This is the 100 TB reality check "
    "every long-lived ingest hits: columns get added mid-stream and "
    "history cannot be rewritten. mergeSchema pays a footer-read per "
    "file at planning — the note to pin it per-table, not globally; "
    "the data read stays columnar either way.",
)
def q165(spark: SparkSession, sf: str) -> DataFrame:
    src = table(spark, sf, "events").select(
        "event_id", "event_type", "value"
    )
    out = _scratch("spark_schema_evo", sf)
    gen1 = src.filter(F.col("event_id") % 2 == 1)
    gen2 = src.filter(F.col("event_id") % 2 == 0).withColumn(
        "value_sq", F.col("value") * F.col("value")
    )
    gen1.write.mode("overwrite").parquet(os.path.join(out, "gen=1"))
    gen2.write.mode("overwrite").parquet(os.path.join(out, "gen=2"))
    merged = (
        spark.read.option("mergeSchema", True)
        .option("recursiveFileLookup", True)
        .parquet(out)
    )
    return (
        merged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("value_sq").alias("n_with_new_col"),
            money_sum(
                F.coalesce(F.col("value_sq"), F.lit(0.0)), "total_sq"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "q166_partition_pruning",
    oracle=f"""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               {oracle_money_sum('value', 'total')}
        FROM events
        WHERE event_type IN ('click', 'view')
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc="Partition pruning end-to-end: the events table re-written "
    "partitioned by event_type (the ingest layout for a "
    "predicate-bearing column), then read with an IN filter — the "
    "plan must show the pruning in PartitionFilters, i.e. "
    "non-matching directories are never opened (lint-asserted in "
    "tests/test_plans.py). At 100 TB this is the difference between "
    "scanning 2/5 of the table and all of it before the first "
    "filter runs; the same mechanics drive the IVF cell-partition "
    "scale path. The partitioned write is the one-off layout cost, "
    "reported in the query's own time like q160's bucketing.",
)
def q166(spark: SparkSession, sf: str) -> DataFrame:
    src = table(spark, sf, "events").select(
        "event_id", "event_type", "value"
    )
    out = _scratch("spark_part_prune", sf)
    src.write.mode("overwrite").partitionBy("event_type").parquet(out)
    return (
        spark.read.parquet(out)
        .filter(F.col("event_type").isin("click", "view"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            money_sum("value", "total"),
        )
        .orderBy("event_type")
    )


@register(
    "q157_csv_roundtrip",
    oracle=f"""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               {oracle_money_sum('value', 'total')}
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc="CSV interchange scan (the S-family text-source contract "
    "beside q02's JSON-lines): project the parquet events table to "
    "CSV with an explicit schema, read it back with the SAME declared "
    "schema (header on, no inference — inference is a full extra "
    "pass and non-deterministic under sampling at scale), and "
    "aggregate. Hash-matching the parquet-side oracle proves the "
    "round trip is lossless for the projected columns. Timestamps "
    "deliberately stay out of the projection — CSV has no typed "
    "timestamp, and the NTZ/format pitfalls belong to the parquet "
    "contract (FIXTURES.md), not an interchange format.",
)
def q157(spark: SparkSession, sf: str) -> DataFrame:
    src = table(spark, sf, "events").select(
        "event_id", "event_type", "value"
    )
    out = _scratch("spark_csv_roundtrip", sf)
    src.write.mode("overwrite").option("header", True).csv(out)
    back = (
        spark.read.option("header", True)
        .schema("event_id BIGINT, event_type STRING, value DOUBLE")
        .csv(out)
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            money_sum("value", "total"),
        )
        .orderBy("event_type")
    )
