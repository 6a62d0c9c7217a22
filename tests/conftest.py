"""Shared fixtures: one SparkSession per test session, a DuckDB oracle
connection with the fixture tables registered as views, and the canonical
result comparator that mirrors the driver's check (row count + schema
column names + order-insensitive value match)."""

from __future__ import annotations

import datetime as _dt
import decimal
import math
import os

import duckdb
import pytest

from speculare_pgcdc_spark.catalog import TABLES
from speculare_pgcdc_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="speculare-pgcdc-spark-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon_cell(v):
    """Canonicalize one cell so Spark/DuckDB representations compare
    equal when values are equal. Floats are compared EXACTLY (repr) —
    the engine's determinism policy (decimal money sums, explicit
    rounding) is what makes that possible."""
    if v is None:
        return "␀"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return "0.0"  # normalize -0.0
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return _dt.datetime(v.year, v.month, v.day).isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canonical_rows(cols, rows):
    """Sort columns by name (as the driver does), canonicalize cells,
    sort rows -> list of tuples."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def assert_oracle_match(spark_df, duck_con, oracle_sql, name=""):
    import pandas as pd  # noqa: F401

    sdf = spark_df.toPandas()
    ddf = duck_con.execute(oracle_sql).df()

    s_cols = [c.lower() for c in sdf.columns]
    d_cols = [c.lower() for c in ddf.columns]
    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column-name mismatch spark={sorted(s_cols)} "
        f"duckdb={sorted(d_cols)}"
    )

    # pandas timestamps -> python datetimes for uniform canonicalization
    def to_rows(df):
        return [
            tuple(x.to_pydatetime() if hasattr(x, "to_pydatetime") else x
                  for x in row)
            for row in df.itertuples(index=False, name=None)
        ]

    s_rows = to_rows(sdf)
    d_rows = to_rows(ddf)
    assert len(s_rows) == len(d_rows), (
        f"{name}: row-count mismatch spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    _, s_canon = canonical_rows(s_cols, s_rows)
    _, d_canon = canonical_rows(d_cols, d_rows)
    if s_canon != d_canon:
        diffs = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(s_canon, d_canon))
            if a != b
        ][:5]
        raise AssertionError(
            f"{name}: value mismatch; first diffs (row, spark, duckdb): "
            f"{diffs}"
        )
