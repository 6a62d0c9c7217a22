"""The driver contract (__spark_entry__): entry smoke, registry/oracle
key alignment, and the bench suite's registry flags — pinned locally so
a contract regression fails here before the driver sees it."""

from __future__ import annotations

import __spark_entry__ as E
from speculare_pgcdc_spark.queries import load_all


def test_entry_returns_rows(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.schema.fieldNames()


def test_queries_mirror_registry():
    registry = load_all()
    qs = E.queries()
    assert set(qs) == set(registry)
    assert len(qs) >= 86


def test_every_oracle_key_is_a_query():
    qs, os_ = E.queries(), E.oracle_sql()
    assert set(os_) <= set(qs)
    # the oracle-checked share is the correctness surface — keep it high
    assert len(os_) >= 0.9 * len(qs)
    assert all(isinstance(sql, str) and sql.strip() for sql in os_.values())


def test_bench_suite_flags():
    registry = load_all()
    benched = [n for n, s in registry.items() if s.bench]
    assert 8 <= len(benched) <= 15  # headline suite stays focused
    assert "q15_groupby_agg" in benched  # the flagship stays benched


def test_entry_runs_on_vanilla_session_conf(spark):
    # the driver builds its own session; _configure must be enough
    E._configure(spark)
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
