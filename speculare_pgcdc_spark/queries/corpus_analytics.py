"""Corpus analytics queries (split from corpus.py, round 8):
training-prep table builders, warehouse lifecycle analytics,
experiment analysis, replica/sampling design, SQL-surface edges,
sequence analytics, and forecasting — q214-q236.

Reference scope note: the reference engine (src/) is a CDC forwarder
with no analytics; these rows extend SURVEY.md §2D with the
training-data-pipeline surface the build brief names as first-class.

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
- q234-q236: forecasting — Holt linear-trend smoothing + h-step
  forecast, lead/lag cross-correlation, Holt-Winters seasonal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from speculare_pgcdc_spark.catalog import table
from speculare_pgcdc_spark.operators import dedup as dd
from speculare_pgcdc_spark.queries import register

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
               CAST(ROUND(SUM(CAST(
                   (o.obs * 1.0 / n.n)
                   * ln((o.obs * 1.0 * n.n) / (rt.r * 1.0 * ct.c))
                   AS DECIMAL(28,12))), 6) AS DOUBLE)
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
        # ROUND in the decimal domain, cast after: the sum lives on
        # the exact 1e-12 grid, where half-ties at the 1e-6 grid are
        # reachable and a decimal->double cast resolves them
        # engine-specifically (the q169 skew01 lesson, SCALING §6m)
        F.round(F.sum(term), 6).cast("double")
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
