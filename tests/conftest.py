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


# ---------------------------------------------------------------------------
# Digest comparator (round-12: the collect-free mode for outputs too
# large to toPandas — r11's q72/q73 100x gap was a comparator limit,
# not an engine defect). Both engines reduce the SAME canonical row
# rendering to q196's order-free digest-sum (48-bit md5 prefix, SUM
# mod 1e18) entirely engine-side; Python compares ONE (n, checksum)
# row per engine. Doubles enter the rendering FLOOR-scaled to 1e-8
# integers (double->string formatting is not engine-stable, integer
# rendering is — the q196 rule), so the digest attests doubles to
# 1e-8; exact-collect compare remains the primary mode where the
# output fits.
# ---------------------------------------------------------------------------

_DIGEST_MOD = 1_000_000_000_000_000_000  # 1e18, as q196


# Doubles are FLOOR-scaled to 1e-8 integers before rendering. Two
# guards (round-12 advice) keep the scaled value identical cross-engine
# at the edges: (1) float/real columns are cast to DOUBLE FIRST — Spark
# would otherwise multiply in single precision while DuckDB promotes;
# (2) the scaled double is clamped to +/-9.2e18 (inside BIGINT range,
# exactly representable as a double) BEFORE the BIGINT cast — above
# that, Spark's non-ANSI cast silently saturates while DuckDB raises,
# so without the clamp a |x| > ~9.2e10 value either crashes the oracle
# side or diverges. Clamped values compare equal iff both sides clamp
# identically, which the shared constant guarantees.
_F64_CLAMP = "9200000000000000000.0"  # 9.2e18, exact in float64


def _clamped_scale(expr: str) -> str:
    # NULL must short-circuit BEFORE the clamp: GREATEST/LEAST skip
    # NULL args in both engines, so without the CASE a NULL double
    # would render as the clamp constant (-9.2e18) instead of falling
    # through to the COALESCE '␀' sentinel — and a Spark NULL vs an
    # oracle -1e12 divergence would silently hash-match (round-14
    # advice fix, pinned by test_digest_null_double_sentinel).
    clamped = (
        f"CAST(FLOOR(LEAST(GREATEST(CAST({expr} AS DOUBLE) * 100000000,"
        f" -{_F64_CLAMP}), {_F64_CLAMP})) AS BIGINT)"
    )
    return f"CASE WHEN ({expr}) IS NULL THEN NULL ELSE {clamped} END"


def _spark_canon_expr(name, dtype):
    d = dtype.lower()
    q = f"`{name}`"
    if d in ("double", "float"):
        inner = _clamped_scale(q)
    elif d.startswith("timestamp"):
        inner = f"unix_micros(CAST({q} AS TIMESTAMP))"
    elif d == "boolean":
        inner = f"CAST({q} AS INT)"
    else:  # integral, decimal, string
        inner = q
    return f"COALESCE(CAST({inner} AS STRING), '␀')"


def _duck_canon_expr(name, dtype):
    d = dtype.lower()
    q = f'"{name}"'
    if d in ("double", "float", "real"):
        inner = _clamped_scale(q)
    elif d.startswith("timestamp"):
        inner = f"epoch_us(CAST({q} AS TIMESTAMP))"
    elif d == "boolean":
        inner = f"CAST({q} AS INTEGER)"
    else:
        inner = q
    return f"COALESCE(CAST({inner} AS VARCHAR), '␀')"


def spark_digest(spark_df):
    """(n_rows, checksum) of a DataFrame, computed executor-side."""
    from pyspark.sql import functions as F

    cols = sorted(spark_df.columns, key=lambda c: c.lower())
    dtypes = dict(spark_df.dtypes)
    rendered = ", ".join(_spark_canon_expr(c, dtypes[c]) for c in cols)
    d = F.expr(
        f"CAST(conv(substring(md5(concat_ws('|', {rendered})), 1, 12),"
        " 16, 10) AS DECIMAL(38,0))"
    )
    row = spark_df.select(d.alias("d")).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("d") % _DIGEST_MOD).cast("long").alias("checksum"),
    ).collect()[0]
    return int(row["n"]), int(row["checksum"] or 0)


def duck_digest(duck_con, oracle_sql):
    """(n_rows, checksum) of an oracle query, computed inside DuckDB
    (a lazy view — nothing materializes into Python)."""
    duck_con.execute(
        f"CREATE OR REPLACE TEMP VIEW __digest_q AS ({oracle_sql})"
    )
    desc = duck_con.execute("DESCRIBE __digest_q").fetchall()
    cols = sorted((r[0] for r in desc), key=lambda c: c.lower())
    types = {r[0]: r[1] for r in desc}
    rendered = ", ".join(_duck_canon_expr(c, types[c]) for c in cols)
    n, checksum = duck_con.execute(
        "SELECT COUNT(*), "
        "COALESCE(SUM(CAST(CAST(concat('0x', substr(md5("
        f"concat_ws('|', {rendered})), 1, 12)) AS BIGINT) AS HUGEINT))"
        f" % {_DIGEST_MOD}, 0) FROM __digest_q"
    ).fetchone()
    duck_con.execute("DROP VIEW __digest_q")
    return int(n), int(checksum)


def assert_oracle_digest_match(spark_df, duck_con, oracle_sql, name=""):
    """Collect-free oracle compare: column names must match, then both
    engines' (row count, order-free row-digest sum) must agree."""
    s_cols = sorted(c.lower() for c in spark_df.columns)
    d_cols = sorted(
        r[0].lower()
        for r in duck_con.execute(
            f"DESCRIBE (SELECT * FROM ({oracle_sql}))"
        ).fetchall()
    )
    assert s_cols == d_cols, (
        f"{name}: column-name mismatch spark={s_cols} duckdb={d_cols}"
    )
    sn, sd = spark_digest(spark_df)
    dn, dd = duck_digest(duck_con, oracle_sql)
    assert sn == dn, (
        f"{name}: row-count mismatch spark={sn} duckdb={dn}"
    )
    assert sd == dd, (
        f"{name}: digest mismatch over {sn} rows "
        f"(spark={sd} duckdb={dd})"
    )
