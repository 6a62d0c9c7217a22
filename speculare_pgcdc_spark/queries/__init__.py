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
    """
    from speculare_pgcdc_spark.queries import (  # noqa: F401
        cdc_q,
        extended,
        llm,
        relational,
        temporal,
        tpch,
        udf_q,
    )

    return REGISTRY
