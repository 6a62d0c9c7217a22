"""Focused A/B timing for individual registry queries.

Usage: python scripts/ab_bench.py q324_duplicate_span_mask [more...] \
        [--runs N]

Same methodology as bench.py (engine session, noop materialization,
1 untimed warm pass then N timed runs, min + median reported) but only
for the named queries — the edit-measure loop tool, not the artifact
generator.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from speculare_pgcdc_spark.queries import load_all  # noqa: E402
from speculare_pgcdc_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 5
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    spark = get_spark(app_name="ab-bench")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in args:
        spec = registry[name]
        spark.sparkContext.setJobDescription(f"ab:{name}")
        spec.fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()  # warm
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(time.perf_counter() - t0)
        out[name] = {
            "min": round(min(samples), 3),
            "median": round(sorted(samples)[len(samples) // 2], 3),
            "samples": [round(s, 3) for s in samples],
        }
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
