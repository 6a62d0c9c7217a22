"""Interleaved A/B for STATIC Spark confs (fresh JVM per sample).

``ab_conf.py`` alternates runtime-settable confs inside one session;
static confs (e.g. ``spark.io.compression.codec``) are read at
SparkContext start and cannot be A/B'd that way. This harness spawns a
fresh subprocess per sample and ALTERNATES arms (A,B,B,A,A,B,... —
order flipped per round) so both arms see the same box-noise window —
the repo's measurement doctrine for a host with visible CPU steal.

Usage:
    python scripts/ab_jvm_conf.py spark.io.compression.codec lz4 zstd \
        --queries q267_triangle_count,q255_group_mad_outliers \
        --rounds 4 --runs 3

Each subprocess warms every query once, then times ``--runs`` noop
materializations and reports the per-query min; the parent reports
per-round pairs and the paired ratio per query.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from speculare_pgcdc_spark.queries import load_all
from speculare_pgcdc_spark.session import get_spark
conf_k, conf_v = sys.argv[1], sys.argv[2]
names = sys.argv[3].split(",")
runs = int(sys.argv[4])
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="ab-jvm", extra_conf={{conf_k: conf_v}})
spark.sparkContext.setLogLevel("ERROR")
assert spark.sparkContext.getConf().get(conf_k) == conf_v, conf_k
reg = load_all()
out = {{}}
for n in names:
    fn = reg[n].fn
    fn(spark, sf).write.format("noop").mode("overwrite").save()
    ss = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        ss.append(time.perf_counter() - t0)
    out[n] = round(min(ss), 3)
print("CHILD_RESULT " + json.dumps(out))
"""


def run_child(conf_key, value, queries, runs):
    code = CHILD.format(repo=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    p = subprocess.run(
        [sys.executable, "-c", code, conf_key, value,
         ",".join(queries), str(runs)],
        capture_output=True, text=True, timeout=1800,
    )
    for line in p.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            return json.loads(line[len("CHILD_RESULT "):])
    raise RuntimeError(
        f"child failed ({value}): {p.stdout[-500:]} {p.stderr[-500:]}"
    )


def main():
    conf_key, a_val, b_val = sys.argv[1:4]
    queries = ["q267_triangle_count", "q255_group_mad_outliers"]
    rounds, runs = 4, 3
    for arg in sys.argv[4:]:
        if arg.startswith("--queries"):
            queries = arg.split("=", 1)[1].split(",") if "=" in arg \
                else queries
        elif arg.startswith("--rounds="):
            rounds = int(arg.split("=", 1)[1])
        elif arg.startswith("--runs="):
            runs = int(arg.split("=", 1)[1])
    i = sys.argv.index("--queries") if "--queries" in sys.argv else -1
    if i > 0:
        queries = sys.argv[i + 1].split(",")
    res = {a_val: [], b_val: []}
    for r in range(rounds):
        order = (a_val, b_val) if r % 2 == 0 else (b_val, a_val)
        for v in order:
            res[v].append(run_child(conf_key, v, queries, runs))
            print(f"round {r} {v}: {res[v][-1]}", flush=True)
    summary = {}
    for q in queries:
        ra = [s[q] for s in res[a_val]]
        rb = [s[q] for s in res[b_val]]
        ratios = sorted(b / a for a, b in zip(ra, rb))
        summary[q] = {
            a_val: ra, b_val: rb,
            "paired_ratio_median": round(ratios[len(ratios) // 2], 3),
        }
    print(json.dumps({"conf": conf_key, "summary": summary}, indent=1))


if __name__ == "__main__":
    main()
