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
    # (1) round-8 priority: the 14 round-7 additions that have never
    # had a driver CORRECTNESS row (sweep- and pytest-green at three
    # scales, but the r7 ~50-query budget ran out at q238; r7 verdict
    # item 1). Attesting these closes the registry: every entry will
    # have at least one driver row.
    "q239_correlation_matrix",
    "q240_temperature_mix",
    "q241_prefix_filter_join",
    "q242_seasonal_anomaly",
    "q243_embedding_drift",
    "q244_concurrency_sweepline",
    "q245_group_quantile_bands",
    "q246_hhi_concentration",
    "q247_stratified_kfold",
    "q248_langid_confusion",
    "q249_bucket_reconcile",
    "q250_minhash_quality",
    "q251_macro_f1",
    "q252_source_overlap_matrix",
    # (2) new this round (round-8 pipeline batch) — first attestation:
    "q253_seeded_epoch_shuffle",
    "q254_dup_cluster_stats",
    "q255_group_mad_outliers",
    "q256_profile_drift",
    "q257_weighted_median",
    "q258_quality_gate_bitmask",
    "q259_dataset_card",
    "q260_zorder_layout",
    "q261_k_anonymity",
    "q262_spearman_rank",
    "q263_stream_stream_join",
    "q264_funnel_conversion",
    "q265_column_checksums",
    "q266_session_depth",
    "q267_triangle_count",
    "q268_cusum_changepoint",
    "q269_benford_digits",
    "q270_pareto_skyline",
    # (3) implementation changed this round — re-attest after change:
    # q126's query-vector norm moves from `** 0.5` to math.sqrt
    # (ADVICE r7 cross-libm item); q202 gains the ANN `candidates=`
    # hook (r7 verdict item 6).
    "q126_pq_ann",
    "q202_hard_negatives",
    # (4) oldest-first re-attestation (r7 verdict item 4): the r01-
    # attested block (7 rounds stale), then the r02 block. Budget
    # overflow past ~50 simply falls to next round's front.
    "q35_cdc_pipeline",
    "q36_dsl_route",
    "q42_jaccard_neardup",
    "q43_cosine_topk",
    "q44_token_topk",
    "q45_fingerprint_dedup",
    "q46_minhash_lsh",
    "q47_simhash",
    "q48_embedding_neardup",
    "q49_lang_id",
    "q50_quality_score",
    "q51_token_count",
    "q52_multimodal_meta",
    "q53_ann_ivf",
    "q61_pivot",
    "q62_correlated_subqueries",
    "q63_percentiles",
    "q64_ordered_array_agg",
    "q65_shingle_jaccard",
    "q66_rolling_fingerprint",
    "q68_salted_agg",
    "q69_rank_family",
    "q70_multiset_ops",
    "q71_srp_neardup",
    "q74_string_funcs2",
    "q76_cube",
    "q77_approx_percentiles",
    "q78_stratified_sample",
    "q79_jaccard_df_capped",
    "q19_conditional_agg",
    "q20_row_number",
    "q21_lag_lead",
    "q22_rows_frame",
    "q23_range_frame",
    "q24_multikey_sort",
    "q25_topk",
    "q26_union_all",
    "q26_union_distinct",
    "q27_intersect",
    "q28_string_funcs",
    "q29_datetime_funcs",
    "q30_math_funcs",
    "q31_array_funcs",
    "q32_map_funcs",
    "q33_json_filter",
    "q34_case_coalesce",
    "q39_dedup_distinct",
    "q39_dedup_first_per_key",
    "q40_pandas_udf",
    "q40_python_udf",
    "q41_grouped_agg_udaf",
    "q41_grouped_map_zscore",
    "q54_approx_distinct",
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
