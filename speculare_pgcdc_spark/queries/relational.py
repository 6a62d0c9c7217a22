"""Batch relational operator surface (SURVEY §2B rows S1-F7, queries Q1-Q34).

Every query is written DataFrame-first so Catalyst owns the physical plan
(pushdown, pruning, join selection, partial aggregation); the paired
DuckDB oracle SQL states the semantics. Scale annotations on each query
say why the plan survives 100 TB.

Reference analogs cited per query (file:line into /root/reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from speculare_pgcdc_spark.catalog import dim, table
from speculare_pgcdc_spark.functions import (
    money_avg,
    money_sum,
    oracle_money_avg,
    oracle_money_sum,
)
from speculare_pgcdc_spark.queries import register

# ---------------------------------------------------------------------------
# S — sources / scans
# ---------------------------------------------------------------------------


@register(
    "q01_scan_count",
    oracle="SELECT COUNT(*) AS n FROM lineitem",
    doc="S1 parquet scan. Count-only: Catalyst prunes to zero columns "
    "(metadata-level count at scale). Ref analog: source scan R1-R5 "
    "(src/cdc/connection.rs:8-66).",
)
def q01(spark: SparkSession, sf: str) -> DataFrame:
    return table(spark, sf, "lineitem").agg(F.count(F.lit(1)).alias("n"))


@register(
    "q02_json_extract",
    oracle="""
        SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        FROM events ORDER BY event_id
    """,
    doc="S2/F6 JSON-in-string scan via get_json_object; JVM-side Jackson "
    "path eval, no Python. Ref analog: simd-json parse R8 "
    "(src/forwarder/mod.rs:83).",
)
def q02(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "events")
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# P — projection / filter / explode
# ---------------------------------------------------------------------------


@register(
    "q03_projection",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS net
        FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
    doc="P1 projection (select/withColumn); per-row IEEE arithmetic is "
    "deterministic so no rounding needed. Ref analog: R10 project "
    "(src/forwarder/mod.rs:95-97).",
)
def q03(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "q04_filter_predicates",
    oracle="""
        SELECT o_orderkey FROM orders
        WHERE o_totalprice BETWEEN 1000 AND 5000
          AND o_orderstatus <> 'F'
          AND o_orderpriority LIKE '1-%'
        ORDER BY o_orderkey
    """,
    doc="P2 standard predicates (BETWEEN/<>/LIKE, conjunction). All three "
    "push down to the parquet scan (PushedFilters). Ref analog: R14 "
    "per-client predicate (src/utils/specific_filter.rs:17-50).",
)
def q04(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "orders")
        .filter(
            F.col("o_totalprice").between(1000, 5000)
            & (F.col("o_orderstatus") != "F")
            & F.col("o_orderpriority").like("1-%")
        )
        .select("o_orderkey")
        .orderBy("o_orderkey")
    )


@register(
    "q05_dsl_eq",
    oracle="SELECT event_id FROM events WHERE event_type = 'click' "
    "ORDER BY event_id",
    doc="P3 reference-DSL eq predicate (col.eq.val -> col == lit). Ref "
    "analog: src/utils/specific_filter.rs:36-42.",
)
def q05a(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "events")
        .filter(F.col("event_type") == F.lit("click"))
        .select("event_id")
        .orderBy("event_id")
    )


@register(
    "q05_dsl_in",
    oracle="SELECT event_id FROM events WHERE event_type IN ('click','view') "
    "ORDER BY event_id",
    doc="P3 reference-DSL in predicate (col.in.(v1,v2) -> isin). Ref "
    "analog: src/utils/specific_filter.rs:43-46.",
)
def q05b(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .select("event_id")
        .orderBy("event_id")
    )


@register(
    "q06_explode",
    oracle="""
        SELECT doc_id, tok FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ) WHERE tok <> '' ORDER BY doc_id, tok
    """,
    doc="P4 explode/flatten (generator runs inside codegen; no shuffle). "
    "Ref analog: R9 change-array explode (src/forwarder/mod.rs:85-93).",
)
def q06(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .orderBy("doc_id", "tok")
    )


# ---------------------------------------------------------------------------
# J — joins
# ---------------------------------------------------------------------------


@register(
    "q07_join_agg",
    oracle=f"""
        SELECT c.c_custkey, {oracle_money_sum('o.o_totalprice', 'spent')}
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey ORDER BY c.c_custkey
    """,
    doc="J1 inner equi-join + agg. At scale: orders partial-aggregates on "
    "o_custkey BEFORE the join (Catalyst pushes the agg), then "
    "shuffle-joins on the same key — one shuffle each side, AQE picks "
    "broadcast if customer is small. Ref analog: R13 routing semi-join "
    "(src/forwarder/mod.rs:110-124).",
    bench=True,
)
def q07(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_custkey")
        .agg(money_sum("o_totalprice", "spent"))
        .orderBy("c_custkey")
    )


@register(
    "q08_left_join",
    oracle="""
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS n
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey ORDER BY c.c_custkey
    """,
    doc="J2 left outer join preserving unmatched customers (COUNT(col) "
    "skips the null-extended rows).",
)
def q08a(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n"))
        .orderBy("c_custkey")
    )


@register(
    "q08_full_join",
    oracle="""
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS n
        FROM customer c FULL JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey ORDER BY c.c_custkey
    """,
    doc="J2 full outer join (sort-merge; broadcast is not legal for full "
    "outer, Catalyst knows).",
)
def q08b(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "full")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n"))
        .orderBy("c_custkey")
    )


@register(
    "q08_right_join",
    oracle="""
        SELECT o.o_orderkey, COALESCE(c.c_name, 'none') AS cname
        FROM customer c RIGHT JOIN orders o ON o.o_custkey = c.c_custkey
        ORDER BY o.o_orderkey
    """,
    doc="J2 right outer join (planned as a mirrored left-outer; the "
    "preserved side's nulls coalesce to a label).",
)
def q08c(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "right")
        .select(
            "o_orderkey",
            F.coalesce("c_name", F.lit("none")).alias("cname"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "q09_semi_join",
    oracle="""
        SELECT p_partkey FROM part WHERE p_partkey IN
            (SELECT l_partkey FROM lineitem WHERE l_quantity > 49)
        ORDER BY p_partkey
    """,
    doc="J3 left-semi join; the l_quantity filter pushes below the join so "
    "only qualifying partkeys shuffle. Ref analog: routing/auth semi-join "
    "R13/R20 (src/api/auth.rs:126-224).",
)
def q09(spark: SparkSession, sf: str) -> DataFrame:
    p = table(spark, sf, "part")
    li = table(spark, sf, "lineitem").filter(F.col("l_quantity") > 49)
    return (
        p.join(li, p.p_partkey == li.l_partkey, "left_semi")
        .select("p_partkey")
        .orderBy("p_partkey")
    )


@register(
    "q10_anti_join",
    oracle="""
        SELECT c_custkey FROM customer WHERE c_custkey NOT IN
            (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
        ORDER BY c_custkey
    """,
    doc="J4 left-anti join (o_custkey is non-null so NOT IN == anti-join). "
    "Customers with no 'P'-status order — non-empty on the fixtures "
    "(every customer has SOME order) so the anti-join semantics are "
    "actually exercised.",
)
def q10(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders").filter(F.col("o_orderstatus") == "P")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@register(
    "q11_cross_join",
    oracle="""
        SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
        ORDER BY r.r_name, n.n_name
    """,
    doc="J5 cross join — only ever between bounded dimension tables; "
    "broadcast NL join, no shuffle.",
)
def q11(spark: SparkSession, sf: str) -> DataFrame:
    r = dim(spark, sf, "region").select("r_name")
    n = table(spark, sf, "nation").select("n_name")
    return n.crossJoin(r).select("r_name", "n_name").orderBy("r_name", "n_name")


@register(
    "q12_range_join",
    oracle="""
        SELECT o.o_orderkey, COUNT(*) AS late_lines
        FROM orders o JOIN lineitem l
          ON l.l_orderkey = o.o_orderkey
         AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
        GROUP BY o.o_orderkey ORDER BY o.o_orderkey
    """,
    doc="J6 theta/range join. The equi conjunct (l_orderkey = o_orderkey) "
    "keeps this a hash/sort-merge join with the range term as a "
    "post-join residual — NOT a BNL join; that is the scale-critical "
    "property.",
)
def q12(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders")
    li = table(spark, sf, "lineitem")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.join(li, cond, "inner")
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("late_lines"))
        .orderBy("o_orderkey")
    )


@register(
    "q13_asof_join",
    oracle="""
        WITH ranked AS (
            SELECT a.event_id AS event_id, b.event_id AS prior_id,
                   ROW_NUMBER() OVER (PARTITION BY a.event_id
                       ORDER BY b.ts DESC, b.event_id DESC) AS rn
            FROM events a JOIN events b
              ON b.user_id = a.user_id AND b.ts < a.ts)
        SELECT event_id, prior_id FROM ranked WHERE rn = 1
        ORDER BY event_id
    """,
    doc="J7 as-of join: for each event, the latest STRICTLY-earlier event "
    "of the same user (self as-of — orders/events don't overlap in "
    "time on the fixtures, so the self form exercises real matches). "
    "Engine path: MERGE as-of (operators/asof.asof_join_merge) — union "
    "both sides, one shuffle on the key, one in-partition sort, window "
    "last-non-null. No join node, so dense keys (few users x many "
    "events) never materialize the per-key candidate cross product "
    "the join+argmax form pays. Both forms are implemented and "
    "equivalence-pinned in tests/test_llm.py. Oracle: ROW_NUMBER ts "
    "DESC, id DESC.",
    bench=True,
)
def q13(spark: SparkSession, sf: str) -> DataFrame:
    from speculare_pgcdc_spark.operators.asof import asof_join_merge

    e = table(spark, sf, "events")
    left = e.select(
        F.col("event_id"), F.col("user_id").alias("l_user"),
        F.col("ts").alias("l_ts"),
    )
    right = e.select(
        F.col("user_id").alias("r_user"), F.col("ts").alias("r_ts"),
        F.col("event_id").alias("prior_id"),
    )
    return (
        asof_join_merge(
            left, right,
            left_key="l_user", right_key="r_user",
            left_time="l_ts", right_time="r_ts",
            group_cols=["event_id"],
            value_col="prior_id",
            strict=True,
        )
        .select("event_id", "prior_id")
        .orderBy("event_id")
    )


@register(
    "q14_interval_join",
    oracle="""
        SELECT a.event_id AS event_a, b.event_id AS event_b
        FROM events a JOIN events b
          ON a.user_id = b.user_id AND b.ts > a.ts
         AND b.ts <= a.ts + INTERVAL 1 HOUR
        ORDER BY event_a, event_b
    """,
    doc="J8 interval/overlap self-join. Equi on user_id bounds the blow-up "
    "to per-user pairs; at scale you'd additionally bucket ts into "
    "coarse epochs and join on (user_id, bucket±1) to cap the per-key "
    "working set.",
)
def q14(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events").select("event_id", "user_id", "ts")
    a = ev.alias("a")
    b = ev.alias("b")
    cond = (
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 1 HOUR"))
    )
    return (
        a.join(b, cond, "inner")
        .select(
            F.col("a.event_id").alias("event_a"),
            F.col("b.event_id").alias("event_b"),
        )
        .orderBy("event_a", "event_b")
    )


# ---------------------------------------------------------------------------
# A — aggregation
# ---------------------------------------------------------------------------


@register(
    "q15_groupby_agg",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {oracle_money_sum('l_quantity', 'sum_qty')},
               {oracle_money_sum('l_extendedprice', 'sum_base')},
               {oracle_money_sum('l_extendedprice * (1 - l_discount)', 'sum_disc')},
               {oracle_money_avg('l_quantity', 'avg_qty')},
               COUNT(*) AS cnt
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    doc="A1 hash aggregate, TPC-H Q1 shape. Partial (map-side) + final "
    "aggregation; ~6 groups so the shuffle is trivial at any scale. "
    "Decimal-exact money sums (see functions/__init__).",
    bench=True,
)
def q15(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity", "sum_qty"),
            money_sum("l_extendedprice", "sum_base"),
            money_sum(disc, "sum_disc"),
            money_avg("l_quantity", "avg_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q16_count_distinct",
    oracle="SELECT COUNT(DISTINCT o_custkey) AS u FROM orders",
    doc="A2 exact count-distinct (expand+two-phase agg under the hood). "
    "A3's approx_count_distinct is the scale path (see tests).",
)
def q16a(spark: SparkSession, sf: str) -> DataFrame:
    return table(spark, sf, "orders").agg(
        F.countDistinct("o_custkey").alias("u")
    )


@register(
    "q16_distinct",
    oracle="SELECT DISTINCT o_orderstatus FROM orders ORDER BY o_orderstatus",
    doc="A2 distinct (= group-by-all-cols; partial agg collapses early).",
)
def q16b(spark: SparkSession, sf: str) -> DataFrame:
    return table(spark, sf, "orders").select("o_orderstatus").distinct().orderBy(
        "o_orderstatus"
    )


@register(
    "q17_rollup",
    oracle="""
        SELECT COALESCE(n_name, 'ALL') AS nname,
               COALESCE(r_name, 'ALL') AS rname,
               COUNT(*) AS c
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name)
        ORDER BY rname, nname, c
    """,
    doc="A4 rollup/grouping-sets (Expand operator multiplies rows by "
    "grouping-set count pre-shuffle; fine because it follows the join "
    "of two dimension tables).",
)
def q17(spark: SparkSession, sf: str) -> DataFrame:
    n = table(spark, sf, "nation")
    r = dim(spark, sf, "region")
    return (
        n.join(r, n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            F.coalesce("n_name", F.lit("ALL")).alias("nname"),
            F.coalesce("r_name", F.lit("ALL")).alias("rname"),
            "c",
        )
        .orderBy("rname", "nname", "c")
    )


@register(
    "q18_having",
    oracle="""
        SELECT o_custkey, COUNT(*) AS c FROM orders GROUP BY o_custkey
        HAVING COUNT(*) >= 5 ORDER BY o_custkey
    """,
    doc="A5 HAVING = post-aggregation filter.",
)
def q18(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 5)
        .orderBy("o_custkey")
    )


@register(
    "q19_conditional_agg",
    oracle=f"""
        SELECT event_type,
               {oracle_money_sum("CASE WHEN value > 100 THEN value ELSE 0 END", 'big')},
               COUNT(DISTINCT user_id) AS users
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="A6 conditional agg (sum(when)) mixed with exact distinct in one "
    "aggregate (Catalyst plans the expand for the distinct).",
)
def q19(spark: SparkSession, sf: str) -> DataFrame:
    big = F.when(F.col("value") > 100, F.col("value")).otherwise(F.lit(0))
    return (
        table(spark, sf, "events")
        .groupBy("event_type")
        .agg(
            money_sum(big, "big"),
            F.countDistinct("user_id").alias("users"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# W — window functions
# ---------------------------------------------------------------------------


@register(
    "q20_row_number",
    oracle="""
        SELECT o_custkey, o_orderkey, rn FROM (
            SELECT o_custkey, o_orderkey,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders
        ) WHERE rn <= 3 ORDER BY o_custkey, rn
    """,
    doc="W1 ranking window (top-3 per customer). Single shuffle on the "
    "partition key; per-partition sort only. Ties broken by o_orderkey "
    "=> deterministic.",
)
def q20(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        table(spark, sf, "orders")
        .select(
            "o_custkey", "o_orderkey", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


@register(
    "q21_lag_lead",
    oracle="""
        SELECT event_id,
               LAG(value) OVER w AS prev,
               LEAD(value) OVER w AS nxt
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY event_id
    """,
    doc="W2 analytic lag/lead; (ts, event_id) is a total order per user "
    "=> deterministic neighbors.",
)
def q21(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        table(spark, sf, "events")
        .select(
            "event_id",
            F.lag("value").over(w).alias("prev"),
            F.lead("value").over(w).alias("nxt"),
        )
        .orderBy("event_id")
    )


@register(
    "q22_rows_frame",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,6)))
                   OVER (PARTITION BY l_orderkey
                         ORDER BY l_linenumber, l_extendedprice
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   2) AS DOUBLE) AS run
        FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
    doc="W3 running aggregate over a ROWS frame (decimal-exact running "
    "money sum). (l_orderkey, l_linenumber) is NOT unique in the "
    "fixtures, so the frame order adds l_extendedprice: rows tying on "
    "the full sort key carry equal values, making prefix sums "
    "order-invariant => deterministic across engines.",
    bench=True,
)
def q22(spark: SparkSession, sf: str) -> DataFrame:
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = F.sum(F.col("l_extendedprice").cast("decimal(28,6)")).over(w)
    return (
        table(spark, sf, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(run, 2).cast("double").alias("run"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "q23_range_frame",
    oracle="""
        SELECT o_orderkey,
               COUNT(*) OVER (ORDER BY o_totalprice
                   RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS cnt
        FROM orders ORDER BY o_orderkey
    """,
    doc="W4 RANGE frame over a numeric key. NOTE the empty OVER "
    "partition is DELIBERATE here (the SURVEY-declared oracle query "
    "has no partition key) and means a single-task global sort — "
    "correct but not scalable; production windows must carry a "
    "partitionBy, and this is the only registered query without one.",
)
def q23(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.orderBy("o_totalprice").rangeBetween(-100, Window.currentRow)
    return (
        table(spark, sf, "orders")
        .select("o_orderkey", F.count(F.lit(1)).over(w).alias("cnt"))
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# O — ordering / top-k
# ---------------------------------------------------------------------------


@register(
    "q24_multikey_sort",
    oracle="""
        SELECT event_id FROM events
        ORDER BY event_type ASC, value DESC, event_id ASC
    """,
    doc="O1 global multi-key sort (range-partitioned exchange + per-part "
    "sort).",
)
def q24(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "events")
        .orderBy(F.col("event_type").asc(), F.col("value").desc(),
                 F.col("event_id").asc())
        .select("event_id")
    )


@register(
    "q25_topk",
    oracle="""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    doc="O2 top-k => TakeOrderedAndProject (per-partition heap + driver "
    "merge of k rows; never a full sort). Verified in plan tests.",
)
def q25(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# U — set operations
# ---------------------------------------------------------------------------


@register(
    "q26_union_all",
    oracle="""
        SELECT x FROM (
            SELECT c_nationkey AS x FROM customer
            UNION ALL SELECT s_nationkey FROM supplier
        ) ORDER BY x
    """,
    doc="U1 union all (no shuffle — pure concatenation of partitions).",
)
def q26a(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer").select(F.col("c_nationkey").alias("x"))
    s = table(spark, sf, "supplier").select(F.col("s_nationkey").alias("x"))
    return c.unionAll(s).orderBy("x")


@register(
    "q26_union_distinct",
    oracle="""
        SELECT x FROM (
            SELECT c_nationkey AS x FROM customer
            UNION SELECT s_nationkey FROM supplier
        ) ORDER BY x
    """,
    doc="U1 union distinct (union all + aggregate on all columns).",
)
def q26b(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer").select(F.col("c_nationkey").alias("x"))
    s = table(spark, sf, "supplier").select(F.col("s_nationkey").alias("x"))
    return c.union(s).distinct().orderBy("x")


@register(
    "q27_intersect",
    oracle="""
        SELECT n_nationkey FROM nation
        INTERSECT SELECT c_nationkey FROM customer
        ORDER BY n_nationkey
    """,
    doc="U2 intersect (left-semi under distinct).",
)
def q27a(spark: SparkSession, sf: str) -> DataFrame:
    n = table(spark, sf, "nation").select("n_nationkey")
    c = table(spark, sf, "customer").select(
        F.col("c_nationkey").alias("n_nationkey")
    )
    return n.intersect(c).orderBy("n_nationkey")


@register(
    "q27_except",
    oracle="""
        SELECT CAST(o_orderdate AS DATE) AS d FROM orders
        EXCEPT SELECT CAST(l_shipdate AS DATE) FROM lineitem
        ORDER BY d
    """,
    doc="U2 except (left-anti under distinct): order dates on which "
    "nothing shipped. Operands chosen to be NON-EMPTY at every "
    "fixture SF — the original nation-minus-customer form was "
    "vacuously empty (every nation has customers), so its gate only "
    "ever proved 0 == 0.",
)
def q27b(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders").select(
        F.col("o_orderdate").cast("date").alias("d")
    )
    l = table(spark, sf, "lineitem").select(
        F.col("l_shipdate").cast("date").alias("d")
    )
    # subtract == SQL EXCEPT (set semantics): a date with 5 order
    # occurrences and 3 shipment occurrences must be EXCLUDED —
    # exceptAll's multiset subtraction would leave 2 copies standing
    # (q70 covers the multiset form deliberately)
    return o.subtract(l).orderBy("d")


# ---------------------------------------------------------------------------
# F — scalar function surface
# ---------------------------------------------------------------------------


@register(
    "q28_string_funcs",
    oracle="""
        SELECT p_partkey,
               UPPER(p_brand) AS up_brand,
               SUBSTRING(p_name, 1, 5) AS sub_name,
               CAST(LENGTH(p_type) AS INT) AS len_type,
               regexp_extract(p_name, '([a-z]+)', 1) AS rex,
               CONCAT(p_brand, '#', p_type) AS cat
        FROM part ORDER BY p_partkey
    """,
    doc="F1 string functions — all JVM-side codegen'd expressions. Ref "
    "analog: R11's regexp on '_hyper_' chunk names "
    "(src/cdc/mod.rs:12-18).",
)
def q28(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "part")
        .select(
            "p_partkey",
            F.upper("p_brand").alias("up_brand"),
            F.substring("p_name", 1, 5).alias("sub_name"),
            F.length("p_type").cast("int").alias("len_type"),
            F.regexp_extract("p_name", "([a-z]+)", 1).alias("rex"),
            # concat (not concat_ws): the oracle's CONCAT skips only
            # NULL values, while concat_ws also drops the separator —
            # they diverge on null inputs
            F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias(
                "cat"
            ),
        )
        .orderBy("p_partkey")
    )


@register(
    "q29_datetime_funcs",
    oracle="""
        SELECT o_orderkey,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
               CAST(year(o_orderdate) AS INT) AS y,
               CAST(datediff('day', CAST(o_orderdate AS DATE),
                             DATE '1996-01-01') AS INT) AS dd
        FROM orders ORDER BY o_orderkey
    """,
    doc="F2 date/time functions; datediff arg order differs Spark/DuckDB — "
    "pinned here (Spark datediff(end, start)).",
)
def q29(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "orders")
        .select(
            "o_orderkey",
            F.date_trunc("month", "o_orderdate").cast("date").alias("m"),
            F.year("o_orderdate").cast("int").alias("y"),
            F.datediff(
                F.lit("1996-01-01").cast("date"),
                F.col("o_orderdate").cast("date"),
            ).cast("int").alias("dd"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "q30_math_funcs",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               ROUND(l_extendedprice, 0) AS r,
               ABS(l_discount - 0.05) AS a,
               CAST(CEIL(l_quantity) AS DOUBLE) AS c,
               CAST(FLOOR(l_tax * 100) AS DOUBLE) AS f,
               CAST(MOD(l_partkey, 7) AS BIGINT) AS m
        FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
    doc="F3 math functions (ceil/floor return types differ across engines "
    "— normalized to DOUBLE on both sides).",
)
def q30(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 0).alias("r"),
            F.abs(F.col("l_discount") - 0.05).alias("a"),
            F.ceil("l_quantity").cast("double").alias("c"),
            F.floor(F.col("l_tax") * 100).cast("double").alias("f"),
            (F.col("l_partkey") % 7).cast("bigint").alias("m"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "q31_array_funcs",
    oracle="""
        SELECT vec_id,
               CAST(len(embedding) AS INT) AS n,
               CAST(ROUND(CAST(embedding[1] AS DOUBLE), 4) AS DOUBLE) AS e1
        FROM embeddings ORDER BY vec_id
    """,
    doc="F4 array functions (size / element_at; 1-based in both engines). "
    "Ref analog: R14 in-list (src/utils/specific_filter.rs:43-46).",
)
def q31(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "embeddings")
        .select(
            "vec_id",
            F.size("embedding").cast("int").alias("n"),
            F.round(F.element_at("embedding", 1).cast("double"), 4)
            .alias("e1"),
        )
        .orderBy("vec_id")
    )


@register(
    "q32_map_funcs",
    oracle="""
        SELECT n_nationkey, CAST(n_regionkey AS VARCHAR) AS v
        FROM nation ORDER BY n_nationkey
    """,
    doc="F5 map functions: map_from_arrays + element_at — the exact "
    "normalization the CDC layer uses for columnnames/columnvalues "
    "(SURVEY §1.1). DuckDB oracle states the expected value directly "
    "(map semantics differ across engines; declared in SURVEY Q32 note).",
)
def q32(spark: SparkSession, sf: str) -> DataFrame:
    m = F.map_from_arrays(
        F.array(F.lit("k"), F.lit("r")),
        F.array(
            F.col("n_nationkey").cast("string"),
            F.col("n_regionkey").cast("string"),
        ),
    )
    return (
        table(spark, sf, "nation")
        .select("n_nationkey", F.element_at(m, "r").alias("v"))
        .orderBy("n_nationkey")
    )


@register(
    "q33_json_filter",
    oracle="""
        SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS INT) >= 50
        ORDER BY event_id
    """,
    doc="F6 JSON path extraction used in a predicate (common subexpression "
    "eliminated by Catalyst).",
)
def q33(spark: SparkSession, sf: str) -> DataFrame:
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        table(spark, sf, "events")
        .select("event_id", k.alias("k"))
        .filter(F.col("k") >= 50)
        .orderBy("event_id")
    )


@register(
    "q54_approx_distinct",
    oracle=None,  # sketch output is engine-specific; exact twin is q16
    doc="A3 approx_count_distinct (HyperLogLog++, rsd=0.01). No SQL "
    "oracle by design — the sketch estimate differs per engine; the "
    "exact companion q16_count_distinct is the hash-checked twin and "
    "tests/test_oracle.py pins the estimate within 5x rsd of exact. At "
    "100 TB this is THE distinct-count path: the HLL sketch merges "
    "map-side in constant memory per partition instead of shuffling "
    "every distinct key the way COUNT(DISTINCT) must.",
)
def q54(spark: SparkSession, sf: str) -> DataFrame:
    return table(spark, sf, "orders").agg(
        F.approx_count_distinct("o_custkey", rsd=0.01).alias("u")
    )


@register(
    "q34_case_coalesce",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_totalprice > 3000 THEN 'hi'
                    WHEN o_totalprice > 1000 THEN 'mid'
                    ELSE 'lo' END AS tier,
               COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS st
        FROM orders ORDER BY o_orderkey
    """,
    doc="F7 CASE WHEN / coalesce / nullif. Ref analog: R11's "
    "fallback-to-raw-name coalesce (src/forwarder/mod.rs:28-38).",
)
def q34(spark: SparkSession, sf: str) -> DataFrame:
    tier = (
        F.when(F.col("o_totalprice") > 3000, "hi")
        .when(F.col("o_totalprice") > 1000, "mid")
        .otherwise("lo")
    )
    st = F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open"))
    return (
        table(spark, sf, "orders")
        .select("o_orderkey", tier.alias("tier"), st.alias("st"))
        .orderBy("o_orderkey")
    )
