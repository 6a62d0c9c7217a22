"""Engine benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Materialization is a noop datasource write (no driver collect — measuring
the engine, not Arrow transfer to Python).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from speculare_pgcdc_spark.queries import load_all
from speculare_pgcdc_spark.session import get_spark


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    bench_specs = {n: s for n, s in sorted(registry.items()) if s.bench}

    spark = get_spark(app_name="speculare-pgcdc-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once (not timed), and materialize the
    # CDC feed fixture — it is INPUT to the q35/q36 pipeline (in
    # production it arrives from the replication connection), so its
    # construction is scaffolding, not engine work
    registry["q01_scan_count"].fn(spark, sf_dir).collect()
    from speculare_pgcdc_spark.cdc.feedgen import feed_messages

    feed_messages(spark, sf_dir)

    # steady-state measurement: one untimed warm run (plan compilation,
    # codegen JIT, broadcast build), then the best of two timed runs —
    # the amortized cost a resident engine pays per query, comparable
    # to the DuckDB same-machine numbers in BASELINE.md (also measured
    # warm). Min-of-2 filters same-machine interference noise (observed
    # up to 1.5x run-to-run on a busy 32-core box).
    timings: dict[str, float] = {}
    for name, spec in bench_specs.items():
        materialize(spec.fn(spark, sf_dir))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            materialize(spec.fn(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
