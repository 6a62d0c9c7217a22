"""Corpus-curation and analytic-pattern queries (round 5).

Families, all first-class training-data-pipeline operators plus the
TPC-H shapes the fixture schema (no partsupp table, FIXTURES.md)
kept out of the main suite:

- curation passes: exact segment-level corpus dedup q143, per-source
  KL drift q144, composite quality rules q152, PMI collocations q155,
  sequence packing q161, PPS sampling q162, Pareto frontier q163,
  table profiling q171, cross-source overlap q172 — the
  RefinedWeb/Gopher-style passes applied before training;
- embedding ops: scalar quantization q154;
- graph shape statistics over the trade graph (degree distribution
  q145, triangle count q146) — the structural audits a dedup/link
  graph needs at 100 TB;
- outlier detection (z-score q147, IQR fences q148), the salted skew
  join q173, and the partsupp-free re-shapes of TPC-H Q11
  (share-of-global HAVING q149), Q2 (argmin supplier q150) and Q20
  (dominant-supplier q151).

Scale notes follow each query's doc; the common contracts:
double-valued sums accumulate in DECIMAL so shuffle order cannot move
the result (the q136 entropy contract), world-bounded dimension sides
carry explicit broadcast hints, and nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from speculare_pgcdc_spark.catalog import dim, table
from speculare_pgcdc_spark.functions import money_sum, oracle_money_sum
from speculare_pgcdc_spark.queries import register

SEG = 16  # tokens per dedup segment (q143) — the "line" granularity


def _doc_tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, tok) with empty tokens dropped — the shared
    tokenizer shape used across the llm queries."""
    return docs.select(
        "doc_id",
        F.posexplode(
            F.split(F.coalesce(F.col("text"), F.lit("")), " ")
        ).alias("pos", "tok"),
    ).filter(F.col("tok") != "")


@register(
    "q143_segment_dedup",
    oracle=f"""
        WITH base AS (
            SELECT doc_id,
                   list_filter(string_split(COALESCE(text, ''), ' '),
                               x -> x <> '') AS arr
            FROM documents
        ),
        segs AS (
            SELECT doc_id, t.g AS seg_idx,
                   array_to_string(
                       arr[t.g * {SEG} + 1 : t.g * {SEG} + {SEG}],
                       ' ') AS seg_text
            FROM base,
                 LATERAL (
                    SELECT unnest(range(0,
                        CAST(ceil(len(arr) / {SEG}.0) AS BIGINT))) AS g
                 ) t
            WHERE len(arr) > 0
        ),
        marked AS (
            SELECT doc_id, seg_idx, seg_text,
                   ROW_NUMBER() OVER (PARTITION BY seg_text
                       ORDER BY doc_id, seg_idx) AS occ
            FROM segs
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_segs,
               CAST(SUM(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dropped,
               COALESCE(string_agg(
                   CASE WHEN occ = 1 THEN seg_text END, ' '
                   ORDER BY seg_idx), '') AS cleaned_text
        FROM marked
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    doc="Exact segment-level corpus dedup with keep-first semantics "
    "(the RefinedWeb/Dolma 'line dedup' pass at fixed 16-token "
    "segment granularity, since the synthetic docs carry no "
    "newlines): cut each doc into deterministic segments, keep only "
    "the globally FIRST occurrence of each segment text (ordered by "
    "doc_id, seg_idx — one row_number over the segment-text shuffle), "
    "and reassemble the cleaned doc with an order-pinned array sort. "
    "Per-doc outputs: segment count, dropped count, cleaned text. At "
    "scale the segment shuffle is the only wide stage and its keys "
    "are content hashes — uniform by construction; the reassembly "
    "groups by doc_id, the same key the scan is already laid out on.",
)
def q143(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    arr = F.filter(
        F.split(F.coalesce(F.col("text"), F.lit("")), " "),
        lambda x: x != "",
    )
    # r14: catalog.spread_scan was A/B'd here and REVERTED (+32%
    # per-round ratio median) — segment construction is array slicing
    # over a few chunks per doc, too cheap for the extra exchange
    # r14: no non-empty filter on base (it re-ran the tokenize via
    # pushdown substitution, guide §4.4 — see q324); the seg-index
    # sequence short-circuits empty docs to NULL, which explode drops
    # (sequence(0, -1) would be DESCENDING, not empty)
    base = docs.select("doc_id", arr.alias("arr"))
    segs = base.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("arr") > 0,
                F.sequence(
                    F.lit(0),
                    F.ceil(F.size("arr") / float(SEG)).cast("bigint")
                    - 1,
                ),
            )
        ).alias("seg_idx"),
        F.col("arr"),
    ).select(
        "doc_id",
        "seg_idx",
        F.array_join(
            F.slice(
                F.col("arr"),
                (F.col("seg_idx") * SEG + 1).cast("int"),
                SEG,
            ),
            " ",
        ).alias("seg_text"),
    )
    occ = Window.partitionBy("seg_text").orderBy("doc_id", "seg_idx")
    marked = segs.withColumn("occ", F.row_number().over(occ))
    kept_sorted = F.transform(
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("occ") == 1,
                    F.struct(
                        F.col("seg_idx"), F.col("seg_text").alias("t")
                    ),
                )
            )
        ),
        lambda s: s["t"],
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segs"),
            F.sum((F.col("occ") > 1).cast("bigint")).alias("n_dropped"),
            F.array_join(kept_sorted, " ").alias("cleaned_text"),
        )
        .orderBy("doc_id")
    )


@register(
    "q144_kl_source_drift",
    oracle="""
        WITH toks AS (
            SELECT source, t.tok
            FROM documents,
                 LATERAL (
                    SELECT unnest(string_split(COALESCE(text, ''), ' '))
                        AS tok
                 ) t
            WHERE t.tok <> ''
        ),
        per_src AS (
            SELECT source, tok, COUNT(*) AS c
            FROM toks GROUP BY source, tok
        ),
        src_tot AS (
            SELECT source, SUM(c) AS n_s FROM per_src GROUP BY source
        ),
        corpus AS (
            SELECT tok, SUM(c) AS c_t FROM per_src GROUP BY tok
        ),
        corpus_tot AS (SELECT SUM(c_t) AS n FROM corpus)
        SELECT p.source,
               CAST(s.n_s AS BIGINT) AS n_tokens,
               CAST(ROUND(SUM(CAST(
                   (p.c * 1.0 / s.n_s)
                   * ln((p.c * 1.0 / s.n_s) / (g.c_t * 1.0 / ct.n))
                   AS DECIMAL(28,12))), 6) AS DOUBLE)
                   AS kl_divergence
        FROM per_src p
        JOIN src_tot s ON p.source = s.source
        JOIN corpus g ON p.tok = g.tok
        CROSS JOIN corpus_tot ct
        GROUP BY p.source, s.n_s
        ORDER BY p.source
    """,
    doc="Per-source distribution drift: KL(source unigram dist || "
    "corpus unigram dist) — the curation metric that flags a source "
    "whose token mix diverges from the blend (domain skew, template "
    "spam, wrong-language shards). One (source, tok) agg feeds both "
    "marginals; the corpus side is a tok-keyed agg joined back on the "
    "same key, the totals are tiny broadcast sides. Probabilities are "
    "exact integer ratios so both engines compute identical term "
    "doubles, and the term sum accumulates in DECIMAL (the q136 "
    "entropy contract) so shuffle order cannot move it.",
)
def q144(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents").select("source", "text")
    toks = docs.select(
        "source",
        F.explode(
            F.split(F.coalesce(F.col("text"), F.lit("")), " ")
        ).alias("tok"),
    ).filter(F.col("tok") != "")
    per_src = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    src_tot = per_src.groupBy("source").agg(F.sum("c").alias("n_s"))
    corpus = per_src.groupBy("tok").agg(F.sum("c").alias("c_t"))
    corpus_tot = corpus.agg(F.sum("c_t").alias("n"))
    p_s = F.col("c") * 1.0 / F.col("n_s")
    p_c = F.col("c_t") * 1.0 / F.col("n")
    term = (p_s * F.log(p_s / p_c)).cast("decimal(28,12)")
    return (
        per_src.join(F.broadcast(src_tot), "source")
        .join(corpus, "tok")
        .crossJoin(F.broadcast(corpus_tot))
        .groupBy("source", "n_s")
        .agg(
            # decimal-domain ROUND (q169 skew01 lesson)
            F.round(F.sum(term), 6)
            .cast("double").alias("kl_divergence")
        )
        .select(
            "source",
            F.col("n_s").cast("bigint").alias("n_tokens"),
            "kl_divergence",
        )
        .orderBy("source")
    )


@register(
    "q145_degree_distribution",
    oracle="""
        WITH pairs AS (
            SELECT DISTINCT o_custkey, l_suppkey
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ),
        degs AS (
            SELECT 'c' AS side, o_custkey AS node,
                   COUNT(*) AS degree
            FROM pairs GROUP BY o_custkey
            UNION ALL
            SELECT 's' AS side, l_suppkey AS node,
                   COUNT(*) AS degree
            FROM pairs GROUP BY l_suppkey
        )
        SELECT side, CAST(degree AS BIGINT) AS degree,
               CAST(COUNT(*) AS BIGINT) AS n_nodes
        FROM degs
        GROUP BY side, degree
        ORDER BY side, degree
    """,
    doc="Degree distribution of the customer-supplier trade graph — "
    "the first structural audit run on any dedup/link graph (a heavy "
    "tail predicts skewed joins downstream; q68's salting is the "
    "remedy this histogram justifies). Distinct edge list from one "
    "fact join, per-node degree agg per side, then a tiny "
    "(side, degree) histogram agg. Three shuffles total, each on "
    "uniform keys; output is bounded by max degree, not node count.",
)
def q145(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    orders = table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    degs = (
        pairs.groupBy(F.col("o_custkey").alias("node"))
        .agg(F.count(F.lit(1)).alias("degree"))
        .select(F.lit("c").alias("side"), "degree")
    ).unionAll(
        pairs.groupBy(F.col("l_suppkey").alias("node"))
        .agg(F.count(F.lit(1)).alias("degree"))
        .select(F.lit("s").alias("side"), "degree")
    )
    return (
        degs.groupBy("side", "degree")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .select(
            "side",
            F.col("degree").cast("bigint").alias("degree"),
            "n_nodes",
        )
        .orderBy("side", "degree")
    )


#: minimum co-purchase support for a part pair to become a graph edge
#: (q146) — bounds the edge list before the triangle join; 2 keeps the
#: wedge machinery EXERCISED at every fixture SF (support 3 leaves the
#: sf0.01 graph triangle-free — a vacuous gate)
TRI_SUPPORT = 2


@register(
    "q146_triangle_count",
    oracle=f"""
        WITH items AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        edges AS (
            SELECT a.l_partkey AS lo, b.l_partkey AS hi
            FROM items a JOIN items b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
            GROUP BY lo, hi
            HAVING COUNT(*) >= {TRI_SUPPORT}
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS triangles,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_edges
        FROM edges e1
        JOIN edges e2 ON e2.lo = e1.hi
        JOIN edges e3 ON e3.lo = e1.lo AND e3.hi = e2.hi
    """,
    doc="Triangle count over the part co-purchase graph (clustering "
    "signal: how cliquish the co-occurrence structure is — the "
    "second-pass audit after q145's degree histogram). Edges are "
    "basket-bounded pairs (the q124 contract — quadratic only in "
    "basket size) thresholded on support; triangles enumerate once "
    "each via the canonical lo<hi orientation: wedge join on the "
    "middle node, then a closing equi-join on (lo, hi). The "
    "orientation bounds each wedge list by out-degree in the DAG "
    "order — the standard compact-forward bound; a degree-ordered "
    "re-orientation is the further skew remedy at extreme scale.",
)
def q146(spark: SparkSession, sf: str) -> DataFrame:
    items = (
        table(spark, sf, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = items.alias("a")
    b = items.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("lo"),
            F.col("b.l_partkey").alias("hi"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= TRI_SUPPORT)
        .select("lo", "hi")
    )
    # one shared edge materialization feeds all three join legs
    edges = edges.localCheckpoint(eager=True)
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.lo") == F.col("e1.hi"))
        .join(
            e3,
            (F.col("e3.lo") == F.col("e1.lo"))
            & (F.col("e3.hi") == F.col("e2.hi")),
        )
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return tri.crossJoin(F.broadcast(n_edges))


@register(
    "q147_zscore_outliers",
    oracle="""
        WITH stats AS (
            SELECT event_type,
                   avg(value) AS mu,
                   stddev_samp(value) AS sigma
            FROM events GROUP BY event_type
        )
        SELECT event_id, e.event_type, value,
               CAST(ROUND((value - mu) / sigma, 4) AS DOUBLE) AS z
        FROM events e JOIN stats s ON e.event_type = s.event_type
        WHERE sigma > 0 AND abs((value - mu) / sigma) > 2
        ORDER BY e.event_type, event_id
    """,
    doc="Z-score outlier detection per event type — the monitoring "
    "pass over a metric stream (and over per-doc quality scores in a "
    "curation pipeline). One tiny per-type moment agg broadcast back "
    "over the fact scan; the filter is map-side after the join, so "
    "the only wide stage is the 5-group agg. avg/stddev_samp both "
    "accumulate identically in the two engines on these integer-"
    "valued doubles; z rounds at display only.",
)
def q147(spark: SparkSession, sf: str) -> DataFrame:
    events = table(spark, sf, "events").select(
        "event_id", "event_type", "value"
    )
    stats = events.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        events.join(F.broadcast(stats), "event_type")
        .filter((F.col("sigma") > 0) & (F.abs(z) > 2))
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(z, 4).cast("double").alias("z"),
        )
        .orderBy("event_type", "event_id")
    )


@register(
    "q148_iqr_outliers",
    oracle="""
        WITH fences AS (
            SELECT event_type,
                   quantile_cont(value, 0.25) AS q1,
                   quantile_cont(value, 0.75) AS q3
            FROM events GROUP BY event_type
        )
        SELECT event_id, e.event_type, value,
               CASE WHEN value < q1 - 1.5 * (q3 - q1) THEN 'low'
                    ELSE 'high' END AS fence
        FROM events e JOIN fences f ON e.event_type = f.event_type
        WHERE value < q1 - 1.5 * (q3 - q1)
           OR value > q3 + 1.5 * (q3 - q1)
        ORDER BY e.event_type, event_id
    """,
    doc="IQR-fence (Tukey) outlier detection per event type — the "
    "robust companion to q147 (immune to the outliers it hunts). "
    "Exact interpolated quartiles per group (Spark percentile == "
    "DuckDB quantile_cont, the q63 parity contract), fences joined "
    "back broadcast, map-side filter. The scale path swaps "
    "approx_percentile for the exact quartiles — the q140/q77 "
    "sketch swap, same plan otherwise.",
)
def q148(spark: SparkSession, sf: str) -> DataFrame:
    events = table(spark, sf, "events").select(
        "event_id", "event_type", "value"
    )
    fences = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.expr("percentile(value, 0.75)").alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    lo = F.col("q1") - 1.5 * iqr
    hi = F.col("q3") + 1.5 * iqr
    return (
        events.join(F.broadcast(fences), "event_type")
        .filter((F.col("value") < lo) | (F.col("value") > hi))
        .select(
            "event_id",
            "event_type",
            "value",
            F.when(F.col("value") < lo, "low")
            .otherwise("high").alias("fence"),
        )
        .orderBy("event_type", "event_id")
    )


@register(
    "q149_value_share",
    oracle=f"""
        WITH per_part AS (
            SELECT l_partkey,
                   {oracle_money_sum(
                       'l_extendedprice * (1 - l_discount)', 'revenue')}
            FROM lineitem GROUP BY l_partkey
        ),
        tot AS (SELECT SUM(revenue) AS total FROM per_part)
        SELECT l_partkey, revenue,
               CAST(ROUND(CAST(revenue AS DOUBLE)
                          / CAST(total AS DOUBLE), 6) AS DOUBLE)
                   AS share
        FROM per_part CROSS JOIN tot
        WHERE revenue * 10000 > 5 * total
        ORDER BY revenue DESC, l_partkey
    """,
    doc="TPC-H Q11 shape without partsupp: per-part revenue filtered "
    "against a FRACTION OF THE GLOBAL SUM — the share-of-total HAVING "
    "pattern (important-stock identification). The global total is a "
    "1-row agg over the already-aggregated per-part table, broadcast "
    "into the comparison — no second fact scan. Revenue sums are "
    "DECIMAL-exact so the threshold compare is exact; only the "
    "display share rounds through double.",
)
def q149(spark: SparkSession, sf: str) -> DataFrame:
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = (
        table(spark, sf, "lineitem")
        .select("l_partkey", "l_extendedprice", "l_discount")
        .groupBy("l_partkey")
        .agg(money_sum(net, "revenue"))
    )
    per_part = per_part.localCheckpoint(eager=True)
    tot = per_part.agg(F.sum("revenue").alias("total"))
    return (
        per_part.crossJoin(F.broadcast(tot))
        # integer-scaled DECIMAL predicate (the q151 convention):
        # 0.0005 * total as a double literal would coerce the exact
        # decimals and the two engines could disagree at the boundary
        .filter(F.col("revenue") * 10000 > 5 * F.col("total"))
        .select(
            "l_partkey",
            "revenue",
            F.round(
                F.col("revenue").cast("double")
                / F.col("total").cast("double"),
                6,
            ).cast("double").alias("share"),
        )
        .orderBy(F.col("revenue").desc(), "l_partkey")
    )


@register(
    "q150_min_cost_supplier",
    oracle="""
        WITH costs AS (
            SELECT l_partkey, l_suppkey,
                   min(l_extendedprice / l_quantity) AS unit_cost
            FROM lineitem
            WHERE l_quantity > 0
            GROUP BY l_partkey, l_suppkey
        ),
        best AS (
            SELECT l_partkey, l_suppkey, unit_cost,
                   ROW_NUMBER() OVER (PARTITION BY l_partkey
                       ORDER BY unit_cost, l_suppkey) AS rk
            FROM costs
        )
        SELECT p.p_partkey, b.l_suppkey AS s_suppkey, s.s_name, n.n_name,
               -- FLOOR-scaled integer, not ROUND(double, 4): the two
               -- engines' double ROUND can split a .xxxx5 half-tie
               -- (observed at sf0.1: 147.70135 -> 147.7013 vs
               -- 147.7014); floor of identical IEEE doubles is
               -- engine-stable (the q152 lesson)
               CAST(FLOOR(b.unit_cost * 10000) AS BIGINT)
                   AS unit_cost_e4
        FROM best b
        JOIN part p ON b.l_partkey = p.p_partkey
        JOIN supplier s ON b.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE b.rk = 1 AND p.p_size < 10
        ORDER BY p.p_partkey
    """,
    doc="TPC-H Q2 shape without partsupp: the cheapest supplier per "
    "part (argmin-per-group + detail join-back), unit cost observed "
    "from lineitem. The correlated-min subquery becomes one "
    "(part, supp) agg plus a row_number argmin with a total "
    "(cost, suppkey) tie-break order — deterministic at any "
    "parallelism. part/supplier/nation join AFTER the argmin, so the "
    "detail joins see one row per part; the p_size filter pushes "
    "into the part scan. IEEE division is order-independent and min "
    "is exact; the display cost is FLOOR-scaled e4 integer because "
    "double ROUND half-ties split across engines (seen at sf0.1).",
)
def q150(spark: SparkSession, sf: str) -> DataFrame:
    costs = (
        table(spark, sf, "lineitem")
        .filter(F.col("l_quantity") > 0)
        .select(
            "l_partkey",
            "l_suppkey",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("uc"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("uc").alias("unit_cost"))
    )
    w = Window.partitionBy("l_partkey").orderBy("unit_cost", "l_suppkey")
    best = costs.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") == 1
    )
    part = (
        table(spark, sf, "part")
        .filter(F.col("p_size") < 10)
        .select("p_partkey")
    )
    supplier = dim(spark, sf, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = dim(spark, sf, "nation").select("n_nationkey", "n_name")
    return (
        best.join(part, best.l_partkey == part.p_partkey)
        .join(supplier, best.l_suppkey == supplier.s_suppkey)
        .join(nation, supplier.s_nationkey == nation.n_nationkey)
        .select(
            "p_partkey",
            F.col("l_suppkey").alias("s_suppkey"),
            "s_name",
            "n_name",
            # floor-scaled e4 integer: double ROUND half-ties are not
            # engine-stable (q152 lesson; sf0.1 regression)
            F.floor(F.col("unit_cost") * 10000).cast("bigint")
            .alias("unit_cost_e4"),
        )
        .orderBy("p_partkey")
    )


@register(
    "q151_dominant_supplier",
    oracle="""
        WITH per_pair AS (
            SELECT l_partkey, l_suppkey,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                        AS DECIMAL(18,2)) AS qty
            FROM lineitem GROUP BY l_partkey, l_suppkey
        ),
        per_part AS (
            SELECT l_partkey, SUM(qty) AS total_qty,
                   COUNT(*) AS n_suppliers
            FROM per_pair GROUP BY l_partkey
        )
        SELECT p.l_partkey, p.l_suppkey,
               -- round->double on OUTPUT only (registry stability
               -- convention, functions/money_sum): the driver's
               -- canonicalizer renders raw DECIMAL columns engine-
               -- dependently; the threshold math above stays decimal
               CAST(ROUND(p.qty, 2) AS DOUBLE) AS qty,
               CAST(ROUND(t.total_qty, 2) AS DOUBLE) AS total_qty,
               CAST(ROUND(CAST(p.qty AS DOUBLE)
                          / CAST(t.total_qty AS DOUBLE), 4) AS DOUBLE)
                   AS share
        FROM per_pair p JOIN per_part t ON p.l_partkey = t.l_partkey
        WHERE t.n_suppliers >= 2 AND p.qty * 10 > t.total_qty
        ORDER BY p.l_partkey, p.l_suppkey
    """,
    doc="TPC-H Q20 shape without partsupp: dominant-supplier "
    "detection — suppliers shipping MORE THAN 10%% of a part's total "
    "quantity, a strong concentration outlier against the fixture's "
    "~4%% fair share (every part has 13+ suppliers here, so a "
    "majority threshold would be vacuously empty — the gate must "
    "exercise the filter, not match on zero rows). Two stacked aggs "
    "on the same partkey prefix — the rollup reuses the pair agg's "
    "shuffle partitioning, so one wide stage total. The threshold "
    "compare is integer-scaled DECIMAL (qty*10 > total), no doubles "
    "in the predicate; single-supplier parts are excluded as "
    "trivially concentrated.",
)
def q151(spark: SparkSession, sf: str) -> DataFrame:
    per_pair = (
        table(spark, sf, "lineitem")
        .select("l_partkey", "l_suppkey", "l_quantity")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("decimal(18,2)").alias("qty")
        )
    )
    per_part = per_pair.groupBy("l_partkey").agg(
        F.sum("qty").alias("total_qty"),
        F.count(F.lit(1)).alias("n_suppliers"),
    )
    return (
        per_pair.join(per_part, "l_partkey")
        .filter(
            (F.col("n_suppliers") >= 2)
            & (F.col("qty") * 10 > F.col("total_qty"))
        )
        .select(
            "l_partkey",
            "l_suppkey",
            # round->double on output only; predicate math stays decimal
            F.round("qty", 2).cast("double").alias("qty"),
            F.round("total_qty", 2).cast("double").alias("total_qty"),
            F.round(
                F.col("qty").cast("double")
                / F.col("total_qty").cast("double"),
                4,
            ).cast("double").alias("share"),
        )
        .orderBy("l_partkey", "l_suppkey")
    )


@register(
    "q154_embedding_quantization",
    oracle="""
        WITH vals AS (
            SELECT vec_id, g.idx,
                   CAST(g.v AS DOUBLE) AS v
            FROM embeddings,
                 LATERAL (
                    SELECT unnest(embedding) AS v,
                           generate_subscripts(embedding, 1) AS idx
                 ) g
        ),
        dims AS (
            SELECT idx, MIN(v) AS lo, MAX(v) AS hi
            FROM vals GROUP BY idx
        )
        SELECT vec_id, vals.idx AS dim,
               CAST(LEAST(FLOOR((v - lo) * 255.0 / (hi - lo)), 255)
                    AS BIGINT) AS q_code
        FROM vals JOIN dims ON vals.idx = dims.idx
        WHERE vec_id < 10 AND hi > lo
        ORDER BY vec_id, dim
    """,
    doc="Scalar (int8-range) embedding quantization — the compression "
    "pass in front of a vector index (the IVF/PQ family q53/q126 "
    "assume it): per-DIMENSION min/max trained over the full corpus "
    "(one 64-group agg — constant-size model regardless of row "
    "count), broadcast back, code = floor((v-lo)*255/(hi-lo)) "
    "clamped. Every value is cast to DOUBLE before any arithmetic so "
    "both engines run identical IEEE ops on the widened float32s, "
    "and floor of identical doubles is engine-stable (the q152 "
    "lesson). Codes are emitted for a bounded vec_id probe set; the "
    "trained (lo, hi) model is the part that ships.",
)
def q154(spark: SparkSession, sf: str) -> DataFrame:
    vals = (
        table(spark, sf, "embeddings")
        .select("vec_id", F.posexplode("embedding").alias("idx0", "vf"))
        .select(
            "vec_id",
            (F.col("idx0") + 1).alias("dim"),
            F.col("vf").cast("double").alias("v"),
        )
    )
    dims = vals.groupBy("dim").agg(
        F.min("v").alias("lo"), F.max("v").alias("hi")
    )
    code = F.least(
        F.floor((F.col("v") - F.col("lo")) * 255.0
                / (F.col("hi") - F.col("lo"))),
        F.lit(255),
    ).cast("bigint")
    return (
        vals.filter(F.col("vec_id") < 10)
        .join(F.broadcast(dims.filter(F.col("hi") > F.col("lo"))), "dim")
        .select("vec_id", "dim", code.alias("q_code"))
        .orderBy("vec_id", "dim")
    )


#: minimum pair support for a PMI estimate (q155) — below this the
#: log-ratio is noise
PMI_SUPPORT = 10


@register(
    "q155_pmi_cooccurrence",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, t.tok, t.pos FROM (
                SELECT doc_id, t.tok, t.pos
                FROM documents,
                     LATERAL (
                        SELECT unnest(string_split(COALESCE(text,''), ' '))
                                   AS tok,
                               generate_subscripts(
                                   string_split(COALESCE(text,''), ' '), 1)
                                   AS pos
                     ) t
            ) t WHERE tok <> ''
        ),
        pairs AS (
            SELECT LEAST(a.tok, b.tok) AS ta,
                   GREATEST(a.tok, b.tok) AS tb,
                   COUNT(*) AS n_ab
            FROM toks a
            JOIN toks b ON a.doc_id = b.doc_id
                       AND b.pos - a.pos IN (1, 2)
            GROUP BY ta, tb
            HAVING COUNT(*) >= {PMI_SUPPORT}
        ),
        occ AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok),
        tot AS (
            SELECT (SELECT SUM(n) FROM occ) AS n_occ,
                   (SELECT SUM(n_ab) FROM pairs) AS n_pairs
        )
        SELECT ta, tb, CAST(n_ab AS BIGINT) AS n_ab,
               CAST(ROUND(
                   ln((n_ab * 1.0 / n_pairs)
                      / ((oa.n * 1.0 / n_occ) * (ob.n * 1.0 / n_occ))),
                   6) AS DOUBLE) AS pmi
        FROM pairs
        JOIN occ oa ON pairs.ta = oa.tok
        JOIN occ ob ON pairs.tb = ob.tok
        CROSS JOIN tot
        ORDER BY pmi DESC, ta, tb
        LIMIT 50
    """,
    doc="Pointwise mutual information of token pairs co-occurring "
    "within a ±2-position window — the association score behind "
    "collocation mining and embedding-corpus prep. The window join is "
    "an EQUI-join on (doc_id, pos+δ) with δ exploded from {1,2} — "
    "linear in corpus size, never the per-doc quadratic blowup a "
    "doc_id-only self-join would be. Marginals come from one token "
    "agg; all probabilities are exact integer ratios so both engines "
    "compute identical term doubles; top-50 orders by the identical "
    "pmi with a total (ta, tb) tie-break.",
)
def q155(spark: SparkSession, sf: str) -> DataFrame:
    toks = _doc_tokens(
        table(spark, sf, "documents").select("doc_id", "text")
    ).withColumn("pos", F.col("pos") + 1)
    a = toks.alias("a").withColumn(
        "delta", F.explode(F.array(F.lit(1), F.lit(2)))
    )
    b = toks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.pos") + F.col("delta") == F.col("b.pos")),
        )
        .groupBy(
            F.least(F.col("a.tok"), F.col("b.tok")).alias("ta"),
            F.greatest(F.col("a.tok"), F.col("b.tok")).alias("tb"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= PMI_SUPPORT)
    )
    pairs = pairs.localCheckpoint(eager=True)
    occ = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    tot = occ.agg(F.sum("n").alias("n_occ")).crossJoin(
        pairs.agg(F.sum("n_ab").alias("n_pairs"))
    )
    oa = occ.select(
        F.col("tok").alias("ta"), F.col("n").alias("na")
    )
    ob = occ.select(
        F.col("tok").alias("tb"), F.col("n").alias("nb")
    )
    pmi = F.log(
        (F.col("n_ab") * 1.0 / F.col("n_pairs"))
        / (
            (F.col("na") * 1.0 / F.col("n_occ"))
            * (F.col("nb") * 1.0 / F.col("n_occ"))
        )
    )
    return (
        pairs.join(oa, "ta")
        .join(ob, "tb")
        .crossJoin(F.broadcast(tot))
        .select(
            "ta",
            "tb",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.round(pmi, 6).cast("double").alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "ta", "tb")
        .limit(50)
    )


#: context-window size (tokens) for sequence packing (q161)
PACK_WINDOW = 256


@register(
    "q161_sequence_packing",
    oracle=f"""
        WITH sized AS (
            SELECT doc_id, source,
                   len(list_filter(string_split(COALESCE(text, ''), ' '),
                                   x -> x <> '')) AS n_tokens
            FROM documents
        ),
        placed AS (
            SELECT doc_id, source, n_tokens,
                   COALESCE(SUM(n_tokens) OVER (PARTITION BY source
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS start_off
            FROM sized WHERE n_tokens > 0
        )
        SELECT doc_id, source,
               CAST(start_off AS BIGINT) AS start_off,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(start_off // {PACK_WINDOW} AS BIGINT) AS first_bin,
               CAST((start_off + n_tokens - 1) // {PACK_WINDOW}
                    AS BIGINT) AS last_bin,
               CAST(start_off // {PACK_WINDOW}
                    <> (start_off + n_tokens - 1) // {PACK_WINDOW}
                    AS BOOLEAN) AS straddles
        FROM placed
        ORDER BY source, doc_id
    """,
    doc="Sequence packing — lay documents end-to-end into fixed "
    f"{PACK_WINDOW}-token context windows (the pre-training batch "
    "layout; docs may straddle bins, the concat-and-chunk packing "
    "GPT-style pipelines use). Each doc's start offset is a running "
    "token cumsum per source stream (one window over the per-source "
    "shuffle — deterministic under the total doc_id order), bin ids "
    "are integer division; the straddle flag is the attention-mask "
    "boundary signal. At scale the stream key (source) is the "
    "parallelism unit: packing is embarrassingly parallel across "
    "streams, and a salted sub-stream split (the q68 pattern) "
    "handles a single giant source.",
)
def q161(spark: SparkSession, sf: str) -> DataFrame:
    sized = table(spark, sf, "documents").select(
        "doc_id",
        "source",
        F.size(
            F.filter(
                F.split(F.coalesce(F.col("text"), F.lit("")), " "),
                lambda x: x != "",
            )
        ).alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = sized.withColumn(
        "start_off", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    first_bin = F.floor(F.col("start_off") / PACK_WINDOW)
    last_bin = F.floor(
        (F.col("start_off") + F.col("n_tokens") - 1) / PACK_WINDOW
    )
    return placed.select(
        "doc_id",
        "source",
        F.col("start_off").cast("bigint").alias("start_off"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        first_bin.cast("bigint").alias("first_bin"),
        last_bin.cast("bigint").alias("last_bin"),
        (first_bin != last_bin).alias("straddles"),
    ).orderBy("source", "doc_id")


#: ticks per source stream for systematic PPS sampling (q162)
PPS_K = 100


@register(
    "q162_pps_systematic_sample",
    oracle=f"""
        WITH sized AS (
            SELECT doc_id, source,
                   CAST(n_chars AS BIGINT) AS w
            FROM documents WHERE n_chars > 0
        ),
        placed AS (
            SELECT doc_id, source, w,
                   COALESCE(SUM(w) OVER (PARTITION BY source
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS cumb,
                   SUM(w) OVER (PARTITION BY source) AS tot
            FROM sized
        )
        SELECT doc_id, source, w,
               CAST(
                 (2 * {PPS_K} * (cumb + w) + tot - 1) // (2 * tot)
                 - (2 * {PPS_K} * cumb + tot - 1) // (2 * tot)
                 AS BIGINT) AS n_copies
        FROM placed
        WHERE (2 * {PPS_K} * (cumb + w) + tot - 1) // (2 * tot)
            > (2 * {PPS_K} * cumb + tot - 1) // (2 * tot)
        ORDER BY source, doc_id
    """,
    doc="Systematic PPS (probability-proportional-to-size) sampling "
    f"without replacement — {PPS_K} evenly-spaced ticks per source "
    "stream land in the cumulative-weight axis; a doc is drawn once "
    "per tick inside its weight interval (heavy docs can draw "
    "multiple copies — the importance-resampling multiplicity). "
    "Inclusion probability is exactly k*w/W with ZERO transcendental "
    "math: tick membership is counted by pure BIGINT division, so "
    "the sample is bit-reproducible across engines, restarts, and "
    "speculative re-execution — no libm pow/ln whose last-ulp "
    "differences could flip an Efraimidis-Spirakis key order at the "
    "selection boundary. One cumsum window per source stream (the "
    "q161 packing shuffle), then map-side arithmetic.",
)
def q162(spark: SparkSession, sf: str) -> DataFrame:
    sized = (
        table(spark, sf, "documents")
        .filter(F.col("n_chars") > 0)
        .select(
            "doc_id", "source", F.col("n_chars").cast("bigint").alias("w")
        )
    )
    wsum = Window.partitionBy("source")
    wcum = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = sized.select(
        "doc_id",
        "source",
        "w",
        F.coalesce(F.sum("w").over(wcum), F.lit(0)).alias("cumb"),
        F.sum("w").over(wsum).alias("tot"),
    )
    # ticks_before(x) = #{j >= 0 : (2j+1)*tot < 2k*x}
    #                 = (2k*x + tot - 1) DIV (2*tot)   for x >= 0
    ticks_lo = F.expr(
        f"(2 * {PPS_K} * cumb + tot - 1) DIV (2 * tot)"
    )
    ticks_hi = F.expr(
        f"(2 * {PPS_K} * (cumb + w) + tot - 1) DIV (2 * tot)"
    )
    return (
        placed.withColumn(
            "n_copies", (ticks_hi - ticks_lo).cast("bigint")
        )
        .filter(F.col("n_copies") > 0)
        .select("doc_id", "source", "w", "n_copies")
        .orderBy("source", "doc_id")
    )


#: x-axis bin width for the banded skyline sweep (q163)
SKYLINE_BIN = 64


@register(
    "q163_pareto_frontier",
    oracle="""
        WITH pts AS (
            SELECT len(list_filter(string_split(COALESCE(text, ''), ' '),
                       t -> t <> '')) AS x,
                   COUNT(*) AS n_docs,
                   MAX(len(list_distinct(list_filter(
                       string_split(COALESCE(text, ''), ' '),
                       t -> t <> '')))) AS y
            FROM documents
            GROUP BY x
            HAVING x > 0
        )
        SELECT CAST(p.x AS BIGINT) AS x,
               CAST(p.y AS BIGINT) AS y,
               CAST(p.n_docs AS BIGINT) AS n_docs
        FROM pts p
        WHERE NOT EXISTS (
            SELECT 1 FROM pts q WHERE q.x > p.x AND q.y >= p.y
        )
        ORDER BY x
    """,
    doc="Pareto frontier (skyline) over (doc length, vocabulary "
    "size) — the multi-objective selection pass that keeps documents "
    "not dominated on BOTH axes (longer AND at-least-as-diverse), "
    "the curation alternative to a single blended quality score. "
    "Reduced to the distinct-x grain first (max y + doc count per "
    "x), then the strictly-above running max that decides domination "
    "is computed BANDED (the q80 trick): per-bin max, a cummax over "
    "the tiny bin aggregate, and an in-bin prefix window — no "
    "single-partition window ever sees the data grain, so the sweep "
    "scales with distinct x values per bin. The oracle states the "
    "same frontier as a NOT EXISTS — quadratic, fine for DuckDB at "
    "fixture scale, and a readable spec of the semantics.",
)
def q163(spark: SparkSession, sf: str) -> DataFrame:
    arr = F.filter(
        F.split(F.coalesce(F.col("text"), F.lit("")), " "),
        lambda t: t != "",
    )
    pts = (
        table(spark, sf, "documents")
        .select(
            F.size(arr).alias("x"),
            F.size(F.array_distinct(arr)).alias("y"),
        )
        .filter(F.col("x") > 0)
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.max("y").alias("y"))
    )
    pts = pts.withColumn("b", F.expr(f"x DIV {SKYLINE_BIN}"))
    # pin the distinct-x grain: bins and the join-back are two
    # consumers, and the shared subtree (documents scan + tokenize +
    # per-x agg) is the dominant cost — without the checkpoint it
    # would execute twice (no cross-DAG CSE in Spark)
    pts = pts.localCheckpoint(eager=True)
    bins = pts.groupBy("b").agg(F.max("y").alias("bmax"))
    w_bins = Window.orderBy(F.col("b").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    bins = bins.withColumn("above_bins", F.max("bmax").over(w_bins))
    w_in = (
        Window.partitionBy("b")
        .orderBy(F.col("x").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        pts.join(F.broadcast(bins.select("b", "above_bins")), "b")
        .withColumn("above_in_bin", F.max("y").over(w_in))
        .filter(
            F.col("y")
            > F.greatest(
                F.coalesce(F.col("above_bins"), F.lit(-1)),
                F.coalesce(F.col("above_in_bin"), F.lit(-1)),
            )
        )
        .select(
            F.col("x").cast("bigint").alias("x"),
            F.col("y").cast("bigint").alias("y"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
        )
        .orderBy("x")
    )


@register(
    "q173_salted_join",
    oracle="""
        WITH dim AS (
            SELECT event_type,
                   CAST(ROUND(SUM(CAST(value AS DECIMAL(28,6)))
                              / COUNT(*), 4) AS DOUBLE) AS type_avg
            FROM events GROUP BY event_type
        )
        SELECT e.event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               d.type_avg,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(28,6))), 2)
                    AS DOUBLE) AS s
        FROM events e JOIN dim d ON e.event_type = d.event_type
        GROUP BY e.event_type, d.type_avg
        ORDER BY e.event_type
    """,
    doc="Skew-proof equi-join: events concentrates on 5 event_type "
    "keys — the pathological hot-key case for a shuffled join — so "
    "the fact side is salted by content hash and the dimension side "
    "replicated per bucket (operators/skewscale.salted_join), "
    "spreading each hot key over 8 reducers instead of one "
    "straggler; the join-side complement of q68's salted agg, for "
    "the regime where the small side is too big or too dynamic to "
    "broadcast. The result is pinned to the PLAIN join's rows by the "
    "oracle; the decimal mean avoids float-accumulation drift in "
    "the joined dimension value.",
)
def q173(spark: SparkSession, sf: str) -> DataFrame:
    from speculare_pgcdc_spark.operators.skewscale import salted_join

    events = table(spark, sf, "events").select(
        "event_id", "event_type", "value"
    )
    dim_df = events.groupBy("event_type").agg(
        F.round(
            F.sum(F.col("value").cast("decimal(28,6)"))
            / F.count(F.lit(1)),
            4,
        ).cast("double").alias("type_avg")
    )
    # shuffle_hash hint: at fixture scale Catalyst would broadcast the
    # 5-row dim (hiding the point); the operator exists for the
    # non-broadcastable regime, so pin the shuffled plan and let the
    # lint verify the exchange spreads on (key, _salt)
    joined = salted_join(
        events,
        dim_df.hint("shuffle_hash"),
        "event_type",
        salt_buckets=8,
        salt_on="event_id",
    )
    return (
        joined.groupBy("event_type", "type_avg")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(28,6)")), 2)
            .cast("double").alias("s"),
        )
        .select("event_type", "n", "type_avg", "s")
        .orderBy("event_type")
    )


@register(
    "q171_table_profile",
    oracle="""
        SELECT 'event_id' AS col, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(*) - COUNT(event_id) AS BIGINT) AS n_null,
               CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct,
               CAST(MIN(event_id) AS VARCHAR) AS min_v,
               CAST(MAX(event_id) AS VARCHAR) AS max_v
        FROM events
        UNION ALL
        SELECT 'event_type', CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) - COUNT(event_type) AS BIGINT),
               CAST(COUNT(DISTINCT event_type) AS BIGINT),
               MIN(event_type), MAX(event_type)
        FROM events
        UNION ALL
        SELECT 'user_id', CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) - COUNT(user_id) AS BIGINT),
               CAST(COUNT(DISTINCT user_id) AS BIGINT),
               CAST(MIN(user_id) AS VARCHAR), CAST(MAX(user_id) AS VARCHAR)
        FROM events
        ORDER BY col
    """,
    doc="Table profiling — per-column row/null/distinct counts and "
    "min/max in ONE aggregation pass (the data-quality audit run "
    "before any pipeline trusts a new table; the deterministic "
    "df.summary() analog). All columns' aggregates compute in a "
    "single hash agg over one scan — never one scan per column, the "
    "difference between 1x and C-times the table read at 100 TB — "
    "then unpivot to the (col, stat) report grain. min/max render as "
    "strings so heterogeneous column types share one report schema. "
    "The oracle's per-column UNION is the readable spec; its "
    "three-scan shape is exactly what the implementation avoids.",
)
def q171(spark: SparkSession, sf: str) -> DataFrame:
    agg = (
        table(spark, sf, "events")
        .select("event_id", "event_type", "user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("event_id").alias("nn_event_id"),
            F.countDistinct("event_id").alias("nd_event_id"),
            F.min("event_id").cast("string").alias("mn_event_id"),
            F.max("event_id").cast("string").alias("mx_event_id"),
            F.count("event_type").alias("nn_event_type"),
            F.countDistinct("event_type").alias("nd_event_type"),
            F.min("event_type").alias("mn_event_type"),
            F.max("event_type").alias("mx_event_type"),
            F.count("user_id").alias("nn_user_id"),
            F.countDistinct("user_id").alias("nd_user_id"),
            F.min("user_id").cast("string").alias("mn_user_id"),
            F.max("user_id").cast("string").alias("mx_user_id"),
        )
    )
    profile = agg.selectExpr(
        """stack(3,
            'event_id',  n, n - nn_event_id,  nd_event_id,
                         mn_event_id,  mx_event_id,
            'event_type', n, n - nn_event_type, nd_event_type,
                         mn_event_type, mx_event_type,
            'user_id',   n, n - nn_user_id,   nd_user_id,
                         mn_user_id,   mx_user_id
        ) AS (col, n, n_null, n_distinct, min_v, max_v)"""
    )
    return profile.select(
        "col",
        F.col("n").cast("bigint").alias("n"),
        F.col("n_null").cast("bigint").alias("n_null"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        "min_v",
        "max_v",
    ).orderBy("col")


@register(
    "q172_source_overlap",
    oracle="""
        WITH base AS (
            SELECT source,
                   list_filter(string_split(COALESCE(text, ''), ' '),
                               x -> x <> '') AS arr
            FROM documents
        ),
        fps AS (
            SELECT DISTINCT source,
                   md5(array_to_string(
                       arr[t.g * 16 + 1 : t.g * 16 + 16], ' ')) AS fp
            FROM base,
                 LATERAL (
                    SELECT unnest(range(0,
                        CAST(ceil(len(arr) / 16.0) AS BIGINT))) AS g
                 ) t
            WHERE len(arr) > 0
        ),
        sizes AS (
            SELECT source, COUNT(*) AS n FROM fps GROUP BY source
        ),
        inter AS (
            SELECT a.source AS sa, b.source AS sb, COUNT(*) AS i
            FROM fps a JOIN fps b
              ON a.fp = b.fp AND a.source < b.source
            GROUP BY sa, sb
        )
        SELECT sa, sb, CAST(i AS BIGINT) AS n_shared,
               CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b,
               CAST(i * 1000000 // (na.n + nb.n - i) AS BIGINT)
                   AS jaccard_ppm
        FROM inter
        JOIN sizes na ON inter.sa = na.source
        JOIN sizes nb ON inter.sb = nb.source
        ORDER BY sa, sb
    """,
    doc="Cross-source duplication report: exact-fingerprint Jaccard "
    "overlap between every source PAIR at the 16-token SEGMENT grain "
    "(the q143 dedup grain — whole-doc hashes never collide across "
    "shards, so doc-level fingerprints would make this gate vacuous; "
    "segment grain measures shared content MASS, which is what "
    "curation acts on). q87 checks corpus-vs-evalset; this checks "
    "corpus-vs-itself by shard. The pair join is an EQUI-join on "
    "the fingerprint — "
    "only docs sharing a hash ever meet, so cost is bounded by "
    "duplicate mass, not source-pair count times corpus. Output is "
    "bounded by sources^2 regardless of volume; Jaccard emits as "
    "integer ppm (the q170 contract) so no float sits in the "
    "report.",
)
def q172(spark: SparkSession, sf: str) -> DataFrame:
    arr = F.filter(
        F.split(F.coalesce(F.col("text"), F.lit("")), " "),
        lambda x: x != "",
    )
    # r14: no non-empty filter (pushdown re-ran the tokenize — see
    # q324); the seg-index sequence short-circuits empty docs to NULL
    base = (
        table(spark, sf, "documents")
        .select("source", arr.alias("arr"))
    )
    fps = (
        base.select(
            "source",
            F.explode(
                F.when(
                    F.size("arr") > 0,
                    F.sequence(
                        F.lit(0),
                        F.ceil(F.size("arr") / 16.0).cast("bigint") - 1,
                    ),
                )
            ).alias("g"),
            F.col("arr"),
        )
        .select(
            "source",
            F.md5(
                F.array_join(
                    F.slice(
                        F.col("arr"),
                        (F.col("g") * 16 + 1).cast("int"),
                        16,
                    ),
                    " ",
                )
            ).alias("fp"),
        )
        .distinct()
    )
    fps = fps.localCheckpoint(eager=True)
    sizes = fps.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = fps.select(F.col("source").alias("sa"), "fp")
    b = fps.select(F.col("source").alias("sb"), "fp")
    inter = (
        a.join(b, "fp")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    na = sizes.select(F.col("source").alias("sa"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("source").alias("sb"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(na), "sa")
        .join(F.broadcast(nb), "sb")
        .select(
            "sa",
            "sb",
            F.col("i").cast("bigint").alias("n_shared"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.expr("i * 1000000 DIV (n_a + n_b - i)")
            .cast("bigint").alias("jaccard_ppm"),
        )
        .orderBy("sa", "sb")
    )


@register(
    "q186_dup_cluster_sizes",
    oracle="""
        WITH segs AS (
            SELECT md5(array_to_string(
                       arr[t.g * 16 + 1 : t.g * 16 + 16], ' ')) AS fp
            FROM (
                SELECT list_filter(string_split(COALESCE(text, ''), ' '),
                                   x -> x <> '') AS arr
                FROM documents
            ),
            LATERAL (
                SELECT unnest(range(0,
                    CAST(ceil(len(arr) / 16.0) AS BIGINT))) AS g
            ) t
            WHERE len(arr) > 0
        ),
        groups AS (
            SELECT fp, COUNT(*) AS sz FROM segs GROUP BY fp
        )
        SELECT CAST(sz AS BIGINT) AS cluster_size,
               CAST(COUNT(*) AS BIGINT) AS n_clusters,
               CAST(SUM(sz) AS BIGINT) AS n_segments,
               CAST(SUM(sz - 1) AS BIGINT) AS n_removable
        FROM groups
        GROUP BY sz
        ORDER BY sz
    """,
    doc="Duplicate-cluster size distribution at the segment grain — "
    "the dedup IMPACT report (how much mass keep-first removal "
    "(q143) will strip, and whether duplication is many small pairs "
    "or a few giant clusters — which decides LSH band tuning and "
    "whether connected components are even needed). One fingerprint "
    "agg then a size-histogram agg; output bounded by max cluster "
    "size. n_removable = sum(size-1) is exactly q143's drop count, "
    "tying the report to the operator it plans for.",
)
def q186(spark: SparkSession, sf: str) -> DataFrame:
    arr = F.filter(
        F.split(F.coalesce(F.col("text"), F.lit("")), " "),
        lambda x: x != "",
    )
    base = (
        table(spark, sf, "documents")
        .select(arr.alias("arr"))
    )
    # r14: no non-empty filter (pushdown re-ran the tokenize — see
    # q324); the seg-index sequence short-circuits empty docs to NULL
    segs = base.select(
        F.explode(
            F.when(
                F.size("arr") > 0,
                F.sequence(
                    F.lit(0),
                    F.ceil(F.size("arr") / 16.0).cast("bigint") - 1,
                ),
            )
        ).alias("g"),
        F.col("arr"),
    ).select(
        F.md5(
            F.array_join(
                F.slice(F.col("arr"), (F.col("g") * 16 + 1).cast("int"), 16),
                " ",
            )
        ).alias("fp")
    )
    groups = segs.groupBy("fp").agg(F.count(F.lit(1)).alias("sz"))
    return (
        groups.groupBy("sz")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("sz").alias("n_segments"),
            F.sum(F.col("sz") - 1).alias("n_removable"),
        )
        .select(
            F.col("sz").cast("bigint").alias("cluster_size"),
            F.col("n_clusters").cast("bigint").alias("n_clusters"),
            F.col("n_segments").cast("bigint").alias("n_segments"),
            F.col("n_removable").cast("bigint").alias("n_removable"),
        )
        .orderBy("cluster_size")
    )


@register(
    "q187_zipf_regression",
    oracle="""
        WITH freqs AS (
            SELECT t.tok, COUNT(*) AS f
            FROM documents,
                 LATERAL (
                    SELECT unnest(string_split(COALESCE(text, ''), ' '))
                        AS tok
                 ) t
            WHERE t.tok <> ''
            GROUP BY t.tok
        ),
        ranked AS (
            SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, tok) AS r
            FROM freqs
        ),
        pts AS (
            SELECT ln(r) AS x, ln(f) AS y FROM ranked
        ),
        sums AS (
            SELECT COUNT(*) AS n,
                   CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) AS sx,
                   CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
                   CAST(SUM(CAST(x * y AS DECIMAL(28,12))) AS DOUBLE)
                       AS sxy,
                   CAST(SUM(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE)
                       AS sxx
            FROM pts
        )
        SELECT CAST(n AS BIGINT) AS n,
               CAST(ROUND((n * sxy - sx * sy)
                          / (n * sxx - sx * sx), 6) AS DOUBLE) AS slope,
               CAST(ROUND((sy - (n * sxy - sx * sy)
                          / (n * sxx - sx * sx) * sx) / n, 6) AS DOUBLE)
                   AS intercept
        FROM sums
    """,
    doc="OLS linear regression as a distributed aggregate, fitted to "
    "the corpus's rank-frequency curve in log-log space (the Zipf "
    "slope — natural text sits near -1; template spam and synthetic "
    "corpora deviate, making this a corpus-health signal AND the "
    "general closed-form regression shape: slope from the four "
    "moment sums, all partial-aggregatable map-side). Ranks come "
    "from the banded global rank over the total (freq desc, tok) "
    "order (operators/rankband.py, binned by -f: distinct-frequency "
    "cardinality is O(sqrt(corpus tokens)) under any Zipf-ish law, "
    "so the only unpartitioned window runs over the tiny frequency-"
    "grain aggregate — no vocabulary-grain sort); the ln terms are "
    "identical IEEE doubles in both engines and every moment "
    "accumulates in DECIMAL. The regression reduces to one 4-number "
    "row; the oracle states the same rank with DuckDB's plain "
    "ROW_NUMBER — correct as a spec, the plan shape this rewrite "
    "avoids.",
)
def q187(spark: SparkSession, sf: str) -> DataFrame:
    from speculare_pgcdc_spark.operators.rankband import (
        banded_row_number,
    )

    toks = _doc_tokens(
        table(spark, sf, "documents").select("doc_id", "text")
    )
    freqs = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("f"))
    # bin = -f is monotone along the (f DESC, tok) order; in-bin rows
    # share f, so the partitioned prefix window orders by tok alone
    pts = banded_row_number(
        freqs,
        [F.col("f").desc(), F.col("tok")],
        (-F.col("f")).cast("bigint"),
        out="r",
    ).select(F.log("r").alias("x"), F.log("f").alias("y"))
    dec = lambda c: F.sum(c.cast("decimal(28,12)")).cast("double")
    sums = pts.agg(
        F.count(F.lit(1)).alias("n"),
        dec(F.col("x")).alias("sx"),
        dec(F.col("y")).alias("sy"),
        dec(F.col("x") * F.col("y")).alias("sxy"),
        dec(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    return sums.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(slope, 6).cast("double").alias("slope"),
        F.round(
            (F.col("sy") - slope * F.col("sx")) / F.col("n"), 6
        ).cast("double").alias("intercept"),
    )


@register(
    "q152_quality_rules",
    oracle="""
        WITH toks AS (
            SELECT doc_id, t.tok
            FROM documents,
                 LATERAL (
                    SELECT unnest(string_split(COALESCE(text, ''), ' '))
                        AS tok
                 ) t
            WHERE t.tok <> ''
        ),
        stats AS (
            SELECT doc_id,
                   COUNT(*) AS n_words,
                   COUNT(DISTINCT tok) AS n_uniq,
                   SUM(len(tok)) AS n_chars,
                   MAX(CASE WHEN tok IN ('the', 'a') THEN 1 ELSE 0 END)
                       AS has_stop
            FROM toks GROUP BY doc_id
        )
        SELECT doc_id,
               CAST(n_words AS BIGINT) AS n_words,
               CAST(FLOOR(n_chars * 100.0 / n_words) AS BIGINT)
                   AS mwl_x100,
               CAST(FLOOR(n_uniq * 10000.0 / n_words) AS BIGINT)
                   AS uniq_x10000,
               CAST(n_words BETWEEN 20 AND 100000 AS BOOLEAN)
                   AS rule_length,
               CAST(n_chars * 1.0 / n_words BETWEEN 3 AND 4.5 AS BOOLEAN)
                   AS rule_word_len,
               CAST(n_uniq * 1.0 / n_words >= 0.4 AS BOOLEAN)
                   AS rule_uniq,
               CAST(has_stop = 1 AS BOOLEAN) AS rule_stopword,
               CAST(n_words BETWEEN 20 AND 100000
                    AND n_chars * 1.0 / n_words BETWEEN 3 AND 4.5
                    AND n_uniq * 1.0 / n_words >= 0.4
                    AND has_stop = 1 AS BOOLEAN) AS passes
        FROM stats
        ORDER BY doc_id
    """,
    doc="Gopher-style composite quality rules per document: word-count "
    "band, mean-word-length band, distinct-token ratio floor, "
    "stopword presence — each exposed as its own boolean next to the "
    "combined verdict, the shape a curation pipeline needs to TUNE "
    "rules (per-rule rejection rates) rather than only apply them. "
    "One token explode feeding a single per-doc agg; every rule is a "
    "column expression over exact integer ratios — no second pass, "
    "no UDF. The 'the'/'a' stopword set matches the synthetic "
    "corpus's vocabulary.",
)
def q152(spark: SparkSession, sf: str) -> DataFrame:
    toks = _doc_tokens(
        table(spark, sf, "documents").select("doc_id", "text")
    )
    stats = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.countDistinct("tok").alias("n_uniq"),
        F.sum(F.length("tok")).alias("n_chars"),
        F.max(
            F.col("tok").isin("the", "a").cast("int")
        ).alias("has_stop"),
    )
    mwl = F.col("n_chars") * 1.0 / F.col("n_words")
    uniq = F.col("n_uniq") * 1.0 / F.col("n_words")
    rule_length = F.col("n_words").between(20, 100000)
    # bands tuned to DISCRIMINATE on this corpus (mwl spans 3.7-5.3,
    # uniq 0.28-1.0): thresholds outside the observed range would make
    # a rule constant-true — a flag the gate never exercises
    rule_word_len = mwl.between(3.0, 4.5)
    rule_uniq = uniq >= 0.4
    rule_stop = F.col("has_stop") == 1
    return stats.select(
        "doc_id",
        F.col("n_words").cast("bigint").alias("n_words"),
        # floor-scaled integers, not round(): both engines compute the
        # identical IEEE double, and floor of identical doubles is
        # engine-stable — round() is not (Spark rounds the shortest
        # decimal repr, DuckDB the binary value; 4.475 splits them)
        F.floor(F.col("n_chars") * 100.0 / F.col("n_words"))
        .cast("bigint").alias("mwl_x100"),
        F.floor(F.col("n_uniq") * 10000.0 / F.col("n_words"))
        .cast("bigint").alias("uniq_x10000"),
        rule_length.alias("rule_length"),
        rule_word_len.alias("rule_word_len"),
        rule_uniq.alias("rule_uniq"),
        rule_stop.alias("rule_stopword"),
        (rule_length & rule_word_len & rule_uniq & rule_stop)
        .alias("passes"),
    ).orderBy("doc_id")
