"""Interleaved A/B of the batch-8 gram-family filter removal (r14).

Arm A is the verbatim pre-change shape of q324/q343 (min-length filter
above the tokenize projection, pushed below with the split
substituted); arm B is the shipped guarded-CASE form. Order-alternating
per round (ab_spread protocol).
"""
import json, statistics, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from speculare_pgcdc_spark.catalog import spread_scan, table
from speculare_pgcdc_spark.queries import load_all
from speculare_pgcdc_spark.queries.dataops3 import SPAN_N
from speculare_pgcdc_spark.queries.dataops5 import TMPL_N
from speculare_pgcdc_spark.session import get_spark
_TOKS = "filter(split(coalesce(text, ''), ' '), x -> x <> '')"

def old_q324(spark, sf):
    docs = table(spark, sf, "documents")
    tok = spread_scan(docs.select("doc_id", "text")).select(
        "doc_id", F.expr(_TOKS).alias("toks")
    ).filter(F.size("toks") >= SPAN_N)
    grams = tok.select(
        "doc_id",
        F.explode(F.expr(
            f"transform(sequence(1, size(toks) - {SPAN_N - 1}), "
            f"i -> struct(i AS s, array_join(slice(toks, i, {SPAN_N}), ' ') AS gm))"
        )).alias("sg"),
    ).select("doc_id", F.col("sg.s").alias("s"), F.col("sg.gm").alias("gm"))
    dup = (grams.groupBy("gm")
        .agg(F.min("doc_id").alias("_mn"), F.max("doc_id").alias("_mx"))
        .filter(F.col("_mn") != F.col("_mx")).select("gm"))
    cov = (grams.join(dup, "gm")
        .select("doc_id", F.explode(F.expr(f"sequence(s, s + {SPAN_N - 1})")).alias("p"))
        .distinct().groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_masked")))
    sizes = tok.select("doc_id", F.size("toks").cast("bigint").alias("n_tok")).localCheckpoint(eager=True)
    return (sizes.join(cov, "doc_id", "left")
        .select("doc_id", "n_tok",
            F.coalesce("n_masked", F.lit(0)).cast("bigint").alias("n_masked"),
            F.expr("CAST((1000000 * coalesce(n_masked, 0)) DIV n_tok AS BIGINT)").alias("masked_ppm"))
        .orderBy(F.desc("masked_ppm"), "doc_id").limit(20))

def old_q343(spark, sf):
    from pyspark.sql import Window
    PROV_K = 20
    docs = table(spark, sf, "documents")
    pre = spread_scan(docs.select("doc_id", "source", "text"))
    t = pre.select("doc_id", "source", F.expr(_TOKS).alias("toks")).filter(F.size("toks") >= TMPL_N)
    g = t.select("doc_id", "source",
        F.explode(F.expr(
            f"array_distinct(transform(sequence(1, size(toks) - {TMPL_N - 1}),"
            f" i -> array_join(slice(toks, i, {TMPL_N}), ' ')))"
        )).alias("gm"))
    gs = (g.groupBy("gm", "source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .withColumn("df", F.sum("n_docs").over(Window.partitionBy("gm")))
        .localCheckpoint(eager=True))
    top = (gs.select("gm", "df").distinct().orderBy(F.desc("df"), "gm").limit(PROV_K).select("gm"))
    return (gs.join(F.broadcast(top), "gm")
        .select("gm", "source", "n_docs", "df",
            F.expr("CAST((1000000 * n_docs) DIV df AS BIGINT)").alias("share_ppm"))
        .orderBy(F.desc("df"), "gm", "source"))

reg = load_all()
ARMS = {
 "q324_duplicate_span_mask": (old_q324, reg["q324_duplicate_span_mask"].fn),
 "q343_template_provenance": (old_q343, reg["q343_template_provenance"].fn),
}
rounds = 9
sf_dir = "/root/testdata/sf0.1"
spark = get_spark(app_name="ab-nofilter"); spark.sparkContext.setLogLevel("ERROR")
for q,(a,b) in ARMS.items():
    a(spark, sf_dir).write.format("noop").mode("overwrite").save()
    b(spark, sf_dir).write.format("noop").mode("overwrite").save()
res = {q: {"A": [], "B": []} for q in ARMS}
for r in range(rounds):
    first_new = r % 2 == 1
    for q,(oldf,newf) in ARMS.items():
        for new in ([first_new, not first_new]):
            fn = newf if new else oldf
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            res[q]["B" if new else "A"].append(time.perf_counter() - t0)
    print(f"round {r}: " + " ".join(f"{q[:8]}: A={res[q]['A'][-1]:.3f} B={res[q]['B'][-1]:.3f}" for q in ARMS), flush=True)
for q in ARMS:
    a, b = res[q]["A"], res[q]["B"]
    ratios = [y/x for x, y in zip(a, b)]
    print(q, json.dumps({"A_min": round(min(a),3), "B_min": round(min(b),3),
     "A_median": round(statistics.median(a),3), "B_median": round(statistics.median(b),3),
     "ratio_median": round(statistics.median(ratios),3)}))
