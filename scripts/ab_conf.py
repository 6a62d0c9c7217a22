"""A/B a set of runtime-settable SQL confs over named registry queries.

Usage: python scripts/ab_conf.py "k1=v1,k2=v2" qA qB ... [--runs=N]

Times each query (bench.py methodology: noop sink, warm pass, min +
median of N runs) twice in ONE engine session: first with the session
defaults, then with the candidate confs applied via spark.conf.set —
the edit-measure tool for config experiments on knobs that are
runtime-settable (join strategy thresholds, AQE knobs). Restores the
defaults afterwards.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from speculare_pgcdc_spark.queries import load_all  # noqa: E402
from speculare_pgcdc_spark.session import get_spark  # noqa: E402


def time_query(spark, fn, sf_dir, runs):
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    return {
        "min": round(min(samples), 3),
        "median": round(sorted(samples)[len(samples) // 2], 3),
    }


def main() -> None:
    conf_arg = sys.argv[1]
    names = [a for a in sys.argv[2:] if not a.startswith("--")]
    runs = 5
    for a in sys.argv[2:]:
        if a.startswith("--runs"):
            runs = int(a.split("=", 1)[1])
    confs = dict(kv.split("=", 1) for kv in conf_arg.split(","))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    spark = get_spark(app_name="ab-conf")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"confs": confs, "queries": {}}
    saved = {k: spark.conf.get(k, None) for k in confs}
    # interleave modes per query so box drift hits both arms equally
    for name in names:
        fn = registry[name].fn
        spark.sparkContext.setJobDescription(f"ab-conf base:{name}")
        base = time_query(spark, fn, sf_dir, runs)
        for k, v in confs.items():
            spark.conf.set(k, v)
        spark.sparkContext.setJobDescription(f"ab-conf cand:{name}")
        cand = time_query(spark, fn, sf_dir, runs)
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        out["queries"][name] = {"base": base, "cand": cand}
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
