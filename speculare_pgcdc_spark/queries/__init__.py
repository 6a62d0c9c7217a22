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
    # Round 12. The round's whole sweep order serves the rotation
    # invariant ("no attested row older than ~5 rounds"): 79 rows are
    # now at r5/r6 against a ~50-row driver budget, so tiers are:
    #
    # (1) CHANGED THIS ROUND — re-attest after change (the r9
    # precedent): q302's all-NULL-ptu group now reports 0 (coalesce)
    # instead of NULL, per r11 ADVICE; value unchanged on the driver
    # fixtures (every event_type has at least one adjacent pair) but
    # the plan changed, so it leads.
    "q302_order_inversions",
    # (2) NEW this round (round-12 batch, never attested):
    "q308_boilerplate_trailers",
    "q309_order_total_audit",
    "q310_entry_exit_matrix",
    "q311_dormancy_reactivation",
    "q312_zonemap_skipping",
    "q313_t_closeness",
    "q314_brier_decomposition",
    "q315_sequential_pattern_support",
    # (3) the r5-era block — 7 rounds stale, the r11 verdict's top
    # item (34 rows; the exact `latest-round == 5` set in the
    # cumulative ledger):
    "q143_segment_dedup",
    "q145_degree_distribution",
    "q146_triangle_count",
    "q147_zscore_outliers",
    "q148_iqr_outliers",
    "q149_value_share",
    "q152_quality_rules",
    "q153_scd2_history",
    "q154_embedding_quantization",
    "q155_pmi_cooccurrence",
    "q156_new_users_curve",
    "q157_csv_roundtrip",
    "q158_rolling_distinct_users",
    "q160_bucketed_join",
    "q161_sequence_packing",
    "q162_pps_systematic_sample",
    "q163_pareto_frontier",
    "q165_schema_evolution",
    "q166_partition_pruning",
    "q167_conversion_latency",
    "q168_burst_detection",
    "q170_banded_percent_rank",
    "q171_table_profile",
    "q172_source_overlap",
    "q173_salted_join",
    "q174_run_length_encoding",
    "q175_image_resize_standin",
    "q177_cusum_changepoints",
    "q179_orc_roundtrip",
    "q180_ab_significance",
    "q181_seasonal_profile",
    "q182_windowed_funnel",
    "q183_knn_accuracy",
    "q186_dup_cluster_sizes",
    # (4) the r6-era block, oldest-first fill: 45 rows at r6 turn 6
    # rounds old this round; the driver budget reaches as far as it
    # reaches and the remainder leads r13.
    "q96_cdc_apply",
    "q97_cdc_incremental_matview",
    "q98_funnel",
    "q99_retention_cohorts",
    "q100_heavy_hitters",
    "q104_tpch_q8_market_share",
    "q105_tpch_q9_product_profit",
    "q106_tpch_q13_custdist",
    "q107_tpch_q14_promo_revenue",
    "q108_tpch_q15_top_supplier",
    "q109_tpch_q16_supplier_variety",
    "q110_tpch_q17_small_qty_revenue",
    "q111_tpch_q19_disjunctive_pred",
    "q112_tpch_q21_waiting_suppliers",
    "q114_ewma",
    "q115_fuzzy_match",
    "q116_stats_aggregates",
    "q117_unpivot",
    "q119_sequence_transitions",
    "q120_histogram",
    "q121_pagerank",
    "q122_tfidf",
    "q123_bigram_lm_score",
    "q124_market_basket",
    "q127_time_weighted_avg",
    "q128_ohlc_bars",
    "q129_grouping_sets",
    "q131_ratio_to_report",
    "q132_mad_robust_stats",
    "q133_topn_per_group",
    "q134_percent_change",
    "q135_benford_digits",
    "q137_gini_coefficient",
    "q138_containment",
    "q139_charset_stats",
    "q140_winsorized_mean",
    "q141_ngram_novelty",
    "q142_effective_sources",
    "q150_min_cost_supplier",
    "q151_dominant_supplier",
    "q176_weighted_median",
    "q184_lorenz_deciles",
    "q187_zipf_regression",
    "q188_train_split",
    "q189_skew_profile",
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
        dataops,
    )

    missing = [n for n in SWEEP_FIRST if n not in REGISTRY]
    if missing:  # a rename must fail loudly, not silently de-prioritize
        raise KeyError(f"SWEEP_FIRST names not in registry: {missing}")
    head = {n: REGISTRY[n] for n in SWEEP_FIRST}
    tail = {n: s for n, s in REGISTRY.items() if n not in head}
    return {**head, **tail}
