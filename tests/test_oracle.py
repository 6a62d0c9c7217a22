"""The oracle gate: every registered query with an oracle must
hash-match DuckDB on the same fixtures (SURVEY §5.1). Queries without an
oracle are smoke-checked for executability and stable schema."""

from __future__ import annotations

import pytest

from speculare_pgcdc_spark.queries import load_all
from tests.conftest import assert_oracle_match

REGISTRY = load_all()
ORACLE_NAMES = sorted(n for n, s in REGISTRY.items() if s.oracle)
BEHAVIOR_NAMES = sorted(n for n, s in REGISTRY.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle(name, spark, duck, sf_dir):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert_oracle_match(df, duck, spec.oracle, name=name)


@pytest.mark.parametrize("name", BEHAVIOR_NAMES)
def test_behavior_runs(name, spark, sf_dir):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert df.schema.fieldNames()


def test_approx_distinct_within_bound(spark, duck, sf_dir):
    """A3: the HLL++ estimate (rsd=0.01) must land within 5x rsd of the
    exact distinct count (its hash-checked twin q16)."""
    est = REGISTRY["q54_approx_distinct"].fn(spark, sf_dir).collect()[0]["u"]
    exact = duck.execute(
        "SELECT COUNT(DISTINCT o_custkey) FROM orders"
    ).fetchone()[0]
    assert abs(est - exact) / exact <= 0.05, (est, exact)
