"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Everything is delegated to the ``speculare_pgcdc_spark`` package: the
query registry (speculare_pgcdc_spark/queries) is the single source of
truth for the implemented operator inventory (SURVEY.md §2B).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from speculare_pgcdc_spark.queries import load_all  # noqa: E402


def _configure(spark: SparkSession) -> SparkSession:
    """Apply engine session conf to a driver-provided session."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        # the conf is static on some builds — acceptable ONLY if it was
        # already set at session build; the catalog's ns->us truncation
        # requires it, so fail loudly rather than let every timestamp
        # query error confusingly downstream
        if (
            spark.conf.get(
                "spark.sql.legacy.parquet.nanosAsLong", "false"
            ).lower()
            != "true"
        ):
            raise RuntimeError(
                "spark.sql.legacy.parquet.nanosAsLong must be true to "
                "read the timestamp[ns] fixtures; set it when building "
                "the SparkSession"
            )
    # naive (isAdjustedToUTC=false) fixture timestamps must read as
    # session-TZ timestamps, not TIMESTAMP_NTZ — epoch arithmetic
    # (cast to double) is illegal on NTZ and every temporal query
    # would throw (round-2 regression: fixtures flipped to naive)
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    # The driver verifies at sf<=0.01 (~10 MB) on a vanilla session whose
    # default of 200 shuffle partitions is pure scheduling overhead at
    # that size; 8 keeps every query's task count proportional to the
    # data so the budgeted sweep covers the whole registry. Cluster-scale
    # sizing lives in session.get_spark (cores-proportional), not here.
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    return spark


#: Fixture columns whose Spark read-back dtype the engine depends on.
#: ``ts`` MUST come back as zoned ``timestamp`` — if it reads as
#: ``timestamp_ntz`` the fixtures were regenerated with naive
#: timestamps and the session is missing
#: inferTimestampNTZ.enabled=false (round-2 failure mode: four cryptic
#: CAST errors instead of one diagnosis).
_EXPECTED_DTYPES = {
    "events": {"ts": "timestamp", "event_id": "bigint", "value": "double"},
    "orders": {"o_orderdate": "timestamp"},
    "lineitem": {"l_shipdate": "timestamp", "l_quantity": "double"},
    "embeddings": {"embedding": "array<float>"},
}


def preflight(spark: SparkSession, sf_dir: str) -> None:
    """Fail fast (and actionably) if the fixtures read back with dtypes
    the engine's epoch arithmetic can't handle."""
    from speculare_pgcdc_spark.catalog import table

    problems = []
    for tname, cols in _EXPECTED_DTYPES.items():
        dtypes = dict(table(spark, sf_dir, tname).dtypes)
        for col, want in cols.items():
            got = dtypes.get(col)
            if got != want:
                problems.append(f"{tname}.{col}: want {want}, got {got}")
    if problems:
        raise RuntimeError(
            "fixture dtype pre-flight failed: "
            + "; ".join(problems)
            + ". If a timestamp column reads as timestamp_ntz, set "
            "spark.sql.parquet.inferTimestampNTZ.enabled=false (naive "
            "parquet timestamps must map to session-TZ timestamps); if "
            "it reads as bigint, spark.sql.legacy.parquet.nanosAsLong "
            "handling in catalog.table applies. See session.get_spark."
        )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Q15, TPC-H Q1 shape) on /root/testdata/sf0.001."""
    _configure(spark)
    preflight(spark, "/root/testdata/sf0.001")
    registry = load_all()
    return registry["q15_groupby_agg"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    registry = load_all()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _configure(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(spec.fn) for name, spec in registry.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every SQL-expressible query."""
    registry = load_all()
    return {
        name: spec.oracle
        for name, spec in registry.items()
        if spec.oracle is not None
    }
