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
#: wall-clock budget; queries without a driver CORRECTNESS row yet go
#: first so each gets its attested row, then the queries whose oracle
#: or implementation changed this round, then the long-green block in
#: its original (relational -> temporal -> udf -> tpch -> cdc -> llm ->
#: extended) order filling whatever budget remains.
SWEEP_FIRST = [
    # Round 10. Three tiers for the driver's ~50-query budget:
    #
    # (1) CHANGED THIS ROUND — re-attest after change (the r9
    # precedent: a green row attesting superseded semantics misleads
    # the ledger). The skew01-scale sweep exposed five cross-engine
    # value-stability defects (q125 seconds-truncated gap, q72
    # decimal-division rounding, q118 ROUND(cume_dist) tie, q159
    # non-bit-identical exp, q169 round-through-double), and the
    # registry-wide audit fixed the same rounding class in six more
    # (q136/q144/q185/q211/q212/q227); q130 is the one-pass grouped
    # banded-ntile rewrite and q271 adopted the per-cell candidate
    # cap (inactive at fixture occupancy — output unchanged, plan
    # changed). All hash-verified at 3 driver scales + 2 skew scales
    # this round (SWEEP_r10 / SKEW_SWEEP_r10).
    "q125_session_assignment",
    "q72_gapfill_locf",
    "q118_distribution_windows",
    "q159_compound_growth",
    "q169_decay_engagement",
    "q136_entropy",
    "q144_kl_source_drift",
    "q185_mutual_information",
    "q211_chi_squared",
    "q212_js_divergence",
    "q227_mutual_information",
    "q130_rfm_segmentation",
    "q271_hard_negatives_ann",
    # (2) the attestation-rotation tail (r9 verdict item 1): the 51
    # r02/r03-era rows, oldest first — 7 r02 rows, then q02-q18,
    # q37-q38, q55-q60, then q81-q95; whatever the budget cannot
    # reach falls to the round-11 front (all are sweep-green at five
    # fixture configurations this round).
    "q39_dedup_distinct",
    "q39_dedup_first_per_key",
    "q40_pandas_udf",
    "q40_python_udf",
    "q41_grouped_agg_udaf",
    "q41_grouped_map_zscore",
    "q54_approx_distinct",
    "q02_json_extract",
    "q03_projection",
    "q04_filter_predicates",
    "q05_dsl_eq",
    "q05_dsl_in",
    "q06_explode",
    "q07_join_agg",
    "q08_full_join",
    "q08_left_join",
    "q08_right_join",
    "q09_semi_join",
    "q10_anti_join",
    "q11_cross_join",
    "q12_range_join",
    "q13_asof_join",
    "q14_interval_join",
    "q15_groupby_agg",
    "q16_count_distinct",
    "q16_distinct",
    "q17_rollup",
    "q18_having",
    "q37_tumbling_window",
    "q38_session_window",
    "q55_sliding_window",
    "q56_tpch_q3_shipping_priority",
    "q57_tpch_q5_local_supplier",
    "q58_tpch_q10_returned_items",
    "q59_tpch_q12_late_lines",
    "q60_tpch_q18_large_orders",
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
    # (3) NEW this round (q281-q291, the downstream-consumer batch) —
    # first driver attestation when the budget reaches here.
    "q281_scd2_intervals",
    "q282_last_touch_attribution",
    "q283_l_diversity",
    "q284_mmr_diversified_topk",
    "q285_ngram_diversity",
    "q286_char_bigram_entropy",
    "q287_poisson_bootstrap_ci",
    "q288_count_min_sketch",
    "q289_time_to_convert",
    "q290_markov_transitions",
    "q291_source_label_gini",
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
        curation,
        history,
        corpus,
        corpus_eval,
        corpus_analytics,
        corpus_audit,
        corpus_pipeline,
        corpus_metrics,
        downstream,
    )

    missing = [n for n in SWEEP_FIRST if n not in REGISTRY]
    if missing:  # a rename must fail loudly, not silently de-prioritize
        raise KeyError(f"SWEEP_FIRST names not in registry: {missing}")
    head = {n: REGISTRY[n] for n in SWEEP_FIRST}
    tail = {n: s for n, s in REGISTRY.items() if n not in head}
    return {**head, **tail}
