"""Driver-sweep simulator: run every ``__spark_entry__.queries()`` entry
at sf0.01 on a VANILLA SparkSession (exactly what the driver hands us),
compare against ``oracle_sql()`` via DuckDB with the driver's comparator,
and print per-query wall time.

The driver's sweep is wall-clock budgeted, so per-query time here is the
signal that decides whether the whole registry gets a CORRECTNESS row
(round-1 lesson: the sweep truncated mid-registry). Run after any change
that could slow a query:

    python scripts/verify_sim.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from speculare_pgcdc_spark.catalog import TABLES  # noqa: E402
from tests.conftest import assert_oracle_match  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # vanilla session, like the driver's: only the static ns conf (the
    # driver sets it at build per __spark_entry__'s RuntimeError contract)
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", "8g")
        .appName("verify-sim")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results: dict[str, dict] = {}
    t_total = time.time()
    for name, fn in qs.items():
        t0 = time.time()
        status = "ok"
        err = None
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                assert_oracle_match(df, con, oracles[name], name=name)
            else:
                n = df.count()
                assert n >= 0
                status = "rows_only"
        except Exception as e:  # noqa: BLE001
            status = "FAIL"
            err = str(e)[:200]
        dt = time.time() - t0
        results[name] = {"status": status, "sec": round(dt, 2), "err": err}
        print(f"{name:36s} {status:9s} {dt:6.2f}s", flush=True)
    total = time.time() - t_total
    fails = [n for n, r in results.items() if r["status"] == "FAIL"]
    slow = sorted(results.items(), key=lambda kv: -kv[1]["sec"])[:8]
    print(f"\nTOTAL {total:.1f}s over {len(results)} queries; "
          f"fails={len(fails)} {fails}")
    print("slowest:", json.dumps({n: r["sec"] for n, r in slow}))


if __name__ == "__main__":
    main()
