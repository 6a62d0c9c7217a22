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
    # Round 11. Five tiers for the driver's ~50-query budget:
    #
    # (1) CHANGED THIS ROUND — re-attest after change (the r9
    # precedent): the gapfill bucket-mean sum now scales PER ROW
    # before aggregating (operators/timeseries._sum_e6 — values
    # bit-identical in-headroom, plan changed, headroom 1e26 -> 1e38).
    "q72_gapfill_locf",
    "q73_gapfill_interpolate",
    # ... and the repetition primitive's gram-count identity (operators/
    # textstats.repetition_counts: n_gram = max(n_tok - n + 1, 0), no
    # gram array for the total — halves the per-sweep cold compile;
    # values identical). Its consumers q82 (tier 3 below) and q209:
    "q209_repetition_ratio",
    # (2) NEVER driver-attested: the round-10 downstream-consumer
    # batch (SWEEP_r10 + SKEW_SWEEP_r10 green, no CORRECTNESS row —
    # r10 verdict item 1). q289 additionally changed this round
    # (empty-conversion shape guard; value unchanged on non-empty
    # fixtures).
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
    # (3) the r3-era rows — 7 rounds stale, the oldest attested block
    # (r10 verdict item 1; the r10 budget ended exactly at q81).
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
    # (4) NEW this round: the feature-engineering batch (q292-q299),
    # oracle-green at 3 driver scales + skew01 in the r11 sweeps.
    "q292_group_ols_trend",
    "q293_balanced_lang_subsample",
    "q294_freshness_audit",
    "q295_type_cooccurrence_jaccard",
    "q296_fano_burstiness",
    "q297_hapax_legomena",
    "q298_embedding_norm_outliers",
    "q299_events_since_purchase",
    "q300_session_paths",
    "q301_psi_drift",
    "q302_order_inversions",
    "q303_coverage_grid",
    "q304_rate_cap_throttle",
    "q305_interarrival_stats",
    "q306_churn_last_action",
    "q307_vocab_growth",
    # (5) the r5-era rotation block (r10 verdict item 4: keep the "no
    # attested row older than ~5 rounds" invariant): all 40 rows last
    # attested in round 5, oldest tier next in line — the driver
    # budget reaches as far as it reaches; the remainder leads r12.
    "q101_tpch_q4_order_priority",
    "q102_tpch_q6_forecast_revenue",
    "q103_tpch_q7_volume_shipping",
    "q113_tpch_q22_dormant_customers",
    "q164_frame_sampling",
    "q178_silhouette",
    "q183_knn_accuracy",
    "q175_image_resize_standin",
    "q143_segment_dedup",
    "q145_degree_distribution",
    "q146_triangle_count",
    "q147_zscore_outliers",
    "q148_iqr_outliers",
    "q149_value_share",
    "q154_embedding_quantization",
    "q155_pmi_cooccurrence",
    "q161_sequence_packing",
    "q162_pps_systematic_sample",
    "q163_pareto_frontier",
    "q173_salted_join",
    "q171_table_profile",
    "q172_source_overlap",
    "q186_dup_cluster_sizes",
    "q152_quality_rules",
    "q153_scd2_history",
    "q156_new_users_curve",
    "q158_rolling_distinct_users",
    "q160_bucketed_join",
    "q167_conversion_latency",
    "q168_burst_detection",
    "q170_banded_percent_rank",
    "q181_seasonal_profile",
    "q182_windowed_funnel",
    "q180_ab_significance",
    "q179_orc_roundtrip",
    "q177_cusum_changepoints",
    "q174_run_length_encoding",
    "q165_schema_evolution",
    "q166_partition_pruning",
    "q157_csv_roundtrip",
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
        featureeng,
        productops,
    )

    missing = [n for n in SWEEP_FIRST if n not in REGISTRY]
    if missing:  # a rename must fail loudly, not silently de-prioritize
        raise KeyError(f"SWEEP_FIRST names not in registry: {missing}")
    head = {n: REGISTRY[n] for n in SWEEP_FIRST}
    tail = {n: s for n, s in REGISTRY.items() if n not in head}
    return {**head, **tail}
