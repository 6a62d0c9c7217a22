"""Targeted oracle check for individual registry queries at all scales.

Usage: python scripts/ab_verify.py q324_duplicate_span_mask [more...]

Runs each named query on a VANILLA session (the driver's protocol, as
in verify_sim.py) against its DuckDB oracle at sf0.001/sf0.01/sf0.1 —
the edit-verify loop tool for optimization work on a single query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from speculare_pgcdc_spark.catalog import TABLES  # noqa: E402
from tests.conftest import assert_oracle_match  # noqa: E402

SCALES = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
          "/root/testdata/sf0.1"]


def main() -> None:
    names = sys.argv[1:]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", "8g")
        .appName("ab-verify")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_fail = 0
    for sf_dir in SCALES:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        for name in names:
            try:
                df = qs[name](spark, sf_dir)
                if name in oracles:
                    assert_oracle_match(
                        df, con, oracles[name], name=name
                    )
                    print(f"{sf_dir} {name}: HASH-MATCH")
                else:
                    print(f"{sf_dir} {name}: rows_only "
                          f"({df.count()} rows)")
            except Exception as e:  # noqa: BLE001
                n_fail += 1
                print(f"{sf_dir} {name}: FAIL {str(e)[:300]}")
        con.close()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
