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
    # (1) changed this round (round 9) — re-attest after change:
    # q258's oracle canonicalizes NULL text like the Spark side
    # (ADVICE r8); q262's rank windows and q267's day-position
    # computation are rewritten banded (r8 verdict item 3 + ADVICE),
    # and q267's oracle wedge sum moves to exact integer //.
    # q271-q280 are NEW this round: the ANN-fed hard-negative miner
    # (rows-only; recall-vs-exact pinned in tests/test_llm), then the
    # round-9 operator batch (partition-digest diff, ngram novelty,
    # trimmed mean, null-isolated join, unigram log-prob, quantile
    # normalization, winnowing pairs, watermark lateness, k-core
    # decomposition — all oracle-checked except q271/q280, whose
    # invariants are pinned in tests).
    "q271_hard_negatives_ann",
    "q272_partition_digest_diff",
    "q273_ngram_novelty",
    "q274_trimmed_mean",
    "q275_null_skew_join",
    "q276_unigram_logprob",
    "q277_quantile_normalize",
    "q278_winnowing_pairs",
    "q279_watermark_lateness",
    "q280_kcore_decomposition",
    "q258_quality_gate_bitmask",
    "q262_spearman_rank",
    "q267_triangle_count",
    # (2) oldest-first re-attestation, continued (r8 verdict item 1):
    # the r02/r05-era block the r8 budget ran out before (q63-q79),
    # then the r02 block (q19-q34), then the r03 block (q01-q18);
    # budget overflow simply falls to next round's front.
    "q63_percentiles",
    "q64_ordered_array_agg",
    "q65_shingle_jaccard",
    "q66_rolling_fingerprint",
    "q67_binned_range_join",
    "q68_salted_agg",
    "q69_rank_family",
    "q70_multiset_ops",
    "q71_srp_neardup",
    "q72_gapfill_locf",
    "q73_gapfill_interpolate",
    "q74_string_funcs2",
    "q75_udtf_ngrams",
    "q76_cube",
    "q77_approx_percentiles",
    "q78_stratified_sample",
    "q79_jaccard_df_capped",
    "q80_range_frame_binned",
    "q19_conditional_agg",
    "q20_row_number",
    "q21_lag_lead",
    "q22_rows_frame",
    "q23_range_frame",
    "q24_multikey_sort",
    "q25_topk",
    "q26_union_all",
    "q26_union_distinct",
    "q27_except",
    "q27_intersect",
    "q28_string_funcs",
    "q29_datetime_funcs",
    "q30_math_funcs",
    "q31_array_funcs",
    "q32_map_funcs",
    "q33_json_filter",
    "q34_case_coalesce",
    "q01_scan_count",
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
    # (3) remaining r02/r03-era rows for the r10 front if the budget
    # reaches this far:
    "q37_tumbling_window",
    "q38_session_window",
    "q39_dedup_distinct",
    "q39_dedup_first_per_key",
    "q40_pandas_udf",
    "q40_python_udf",
    "q41_grouped_agg_udaf",
    "q41_grouped_map_zscore",
    "q54_approx_distinct",
    "q55_sliding_window",
    "q56_tpch_q3_shipping_priority",
    "q57_tpch_q5_local_supplier",
    "q58_tpch_q10_returned_items",
    "q59_tpch_q12_late_lines",
    "q60_tpch_q18_large_orders",
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
    )

    missing = [n for n in SWEEP_FIRST if n not in REGISTRY]
    if missing:  # a rename must fail loudly, not silently de-prioritize
        raise KeyError(f"SWEEP_FIRST names not in registry: {missing}")
    head = {n: REGISTRY[n] for n in SWEEP_FIRST}
    tail = {n: s for n, s in REGISTRY.items() if n not in head}
    return {**head, **tail}
