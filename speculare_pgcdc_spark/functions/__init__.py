"""Shared column-expression helpers.

The engine's determinism policy for float aggregates (SURVEY §2C
conventions): never hash-compare an order-dependent double SUM/AVG.
Instead, cast to DECIMAL before the aggregate — decimal addition is exact
and associative, so partial/final aggregation order (Spark) vs sequential
aggregation (DuckDB) cannot diverge — then ROUND and cast back to DOUBLE
so both engines emit the identical bit pattern.

At 100 TB this matters doubly: a 1000-executor sum is re-ordered by every
shuffle, so decimal aggregation is the only way to get run-to-run
reproducible money totals at scale. Decimal aggs stay inside whole-stage
codegen (no UDFs), so the cost is a few % over double sums.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Wide enough for a 100 TB fact table: sum of 1e12 rows x 1e6 magnitude
#: fits in Spark's auto-widened sum(decimal(28,6)) -> decimal(38,6).
MONEY = "decimal(28,6)"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def epoch_seconds(col: str | Column) -> Column:
    """Epoch seconds (double, fractional µs preserved) from a timestamp
    column, robust to the column arriving as TIMESTAMP_NTZ (naive
    parquet + inferTimestampNTZ on): NTZ has no direct numeric cast, but
    NTZ -> TIMESTAMP (session TZ; the engine pins UTC, so naive == UTC)
    -> DOUBLE is always legal. On an already-zoned timestamp the first
    cast is a no-op. Matches DuckDB's epoch(ts) bit-for-bit on the
    shared fixtures."""
    return _c(col).cast("timestamp").cast("double")


def money_sum(col: str | Column, alias: str, scale: int = 2) -> Column:
    """Order-independent SUM for float money columns (exact in decimal)."""
    return F.round(F.sum(_c(col).cast(MONEY)), scale).cast("double").alias(alias)


def money_avg(col: str | Column, alias: str, scale: int = 2) -> Column:
    """Order-independent AVG: exact decimal sum / exact count."""
    avg = F.sum(_c(col).cast(MONEY)) / F.count(_c(col))
    return F.round(avg, scale).cast("double").alias(alias)


def oracle_money_sum(expr: str, alias: str, scale: int = 2) -> str:
    """DuckDB phrasing of money_sum (same decimal-exact contract)."""
    return (
        f"CAST(ROUND(SUM(CAST(({expr}) AS DECIMAL(28,6))), {scale}) AS DOUBLE)"
        f" AS {alias}"
    )


def oracle_money_avg(expr: str, alias: str, scale: int = 2) -> str:
    return (
        f"CAST(ROUND(SUM(CAST(({expr}) AS DECIMAL(28,6))) / COUNT({expr}),"
        f" {scale}) AS DOUBLE) AS {alias}"
    )
