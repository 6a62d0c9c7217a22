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

#: Names promoted to the FRONT of the registry's iteration order. The
#: driver sweeps ~50 queries per round in iteration order under a
#: wall-clock budget; after two rounds the q01-q55/q61-q79 block has
#: multiple green driver rows while this tail has none (round-2 verdict:
#: "17 registered queries have never had a driver row"). Front-loading
#: them — plus the six queries whose NTZ breakage was fixed this round —
#: gets each its attested CORRECTNESS row; the long-green block fills
#: whatever budget remains.
SWEEP_FIRST = [
    # never driver-swept (rounds 1-2)
    "q56_tpch_q3_shipping_priority",
    "q57_tpch_q5_local_supplier",
    "q58_tpch_q10_returned_items",
    "q59_tpch_q12_late_lines",
    "q60_tpch_q18_large_orders",
    "q75_udtf_ngrams",
    "q80_range_frame_binned",
    "q81_cdc_pipeline_v2",
    "q82_repetition_signal",
    "q83_label_centroids",
    "q84_pii_redaction",
    "q85_kmeans_clusters",
    "q86_dup_components",
    "q87_contamination",
    "q88_chunking",
    "q89_source_mixing",
    "q90_token_budget",
    "q91_cluster_neardup",
    "q92_window_dup_signal",
    "q93_canonical_dedup",
    "q94_asof_tolerance",
    "q95_weighted_sampling",
    # broken in round 2 (TIMESTAMP_NTZ), fixed this round — need a
    # fresh driver row attesting the fix
    "q37_tumbling_window",
    "q38_session_window",
    "q55_sliding_window",
    "q67_binned_range_join",
    "q72_gapfill_locf",
    "q73_gapfill_interpolate",
]


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

    Iteration ORDER is load-bearing: the driver sweeps the registry in
    iteration order under a wall-clock budget (~50 queries/round), so
    the names in SWEEP_FIRST — queries with no driver row yet, plus
    this round's regression fixes — are promoted to the front; the
    already-multiply-attested block follows in its original
    (relational -> temporal -> udf -> tpch -> cdc -> llm -> extended)
    order.
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

    missing = [n for n in SWEEP_FIRST if n not in REGISTRY]
    if missing:  # a rename must fail loudly, not silently de-prioritize
        raise KeyError(f"SWEEP_FIRST names not in registry: {missing}")
    head = {n: REGISTRY[n] for n in SWEEP_FIRST}
    tail = {n: s for n, s in REGISTRY.items() if n not in head}
    return {**head, **tail}
