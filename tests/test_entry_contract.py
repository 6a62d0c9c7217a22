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


def test_session_enables_aqe_shj_rewrite(spark):
    """r14 optimization: the engine session opts in to AQE's runtime
    SMJ->SHJ rewrite with a bounded per-partition build side (64 MB
    default, env-overridable) — runtime sizes, not estimates, decide,
    so the setting is scale-safe (guide §3.1)."""
    assert (
        spark.conf.get(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold"
        )
        == str(64 * 1024 * 1024)
    )


def test_preflight_accepts_fixtures(spark, sf_dir):
    E._configure(spark)
    E.preflight(spark, sf_dir)  # must not raise


def test_preflight_catches_ntz(spark, sf_dir, tmp_path):
    """A session missing the inferTimestampNTZ override must fail the
    pre-flight with an actionable message, not four cryptic CAST errors
    downstream (the round-2 failure mode)."""
    import shutil

    import pytest

    for t in E._EXPECTED_DTYPES:
        shutil.copy(f"{sf_dir}/{t}.parquet", tmp_path / f"{t}.parquet")
    E._configure(spark)
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try:
        with pytest.raises(RuntimeError, match="inferTimestampNTZ"):
            E.preflight(spark, str(tmp_path))
    finally:
        spark.conf.set(
            "spark.sql.parquet.inferTimestampNTZ.enabled", "false"
        )


def test_sweep_first_heads_registry():
    from speculare_pgcdc_spark.queries import SWEEP_FIRST

    names = list(load_all())
    assert names[: len(SWEEP_FIRST)] == SWEEP_FIRST
