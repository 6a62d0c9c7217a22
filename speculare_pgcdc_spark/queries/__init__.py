"""Query registry — the engine's declared operator inventory.

Every implemented operator from SURVEY.md §2B registers here as a
``QuerySpec``: a Spark DataFrame builder plus (when SQL-expressible) the
equivalent DuckDB oracle SQL. The driver's correctness gate and the pytest
oracle harness both iterate this registry, so "implemented" ==
"registered and hash-matching".
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: Optional[str]  # DuckDB SQL; None => rows-only behavior check
    doc: str = ""
    bench: bool = False  # include in bench.py headline suite


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str] = None, doc: str = "",
             bench: bool = False):
    def deco(fn: SparkQuery) -> SparkQuery:
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""),
            bench=bench,
        )
        return fn
    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module so the registry is fully populated.

    Imports are STRICT: a broken module must fail loudly here, not
    silently shrink the declared operator inventory (the driver counts
    registry entries as the correctness surface).

    Import ORDER is load-bearing: the driver sweeps the registry in
    insertion order under a wall-clock budget, so the SURVEY §2B
    contract core (relational -> temporal -> udf -> tpch -> cdc)
    registers FIRST; the §2D extensions and LLM-pipeline queries
    follow. A budget-truncated sweep then still covers the contract
    surface (round-1 lesson: the sweep stopped mid-registry and left
    38 core queries without a driver row).
    """
    from speculare_pgcdc_spark.queries import (  # noqa: F401
        relational,
        temporal,
        udf_q,
        tpch,
        cdc_q,
        llm,
        extended,
    )

    return REGISTRY
