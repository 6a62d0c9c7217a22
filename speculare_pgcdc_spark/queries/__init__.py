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
    # semantics/oracle changed in round 5 — must be re-attested first
    "q27_except",
    "q113_tpch_q22_dormant_customers",
    "q146_triangle_count",
    "q151_dominant_supplier",
    "q172_source_overlap",
    # round-5 additions — no driver row yet
    "q143_segment_dedup",
    "q144_kl_source_drift",
    "q145_degree_distribution",
    "q147_zscore_outliers",
    "q148_iqr_outliers",
    "q149_value_share",
    "q150_min_cost_supplier",
    "q152_quality_rules",
    "q153_scd2_history",
    "q154_embedding_quantization",
    "q155_pmi_cooccurrence",
    "q156_new_users_curve",
    "q157_csv_roundtrip",
    "q158_rolling_distinct_users",
    "q159_compound_growth",
    "q160_bucketed_join",
    "q161_sequence_packing",
    "q162_pps_systematic_sample",
    "q163_pareto_frontier",
    "q164_frame_sampling",
    "q165_schema_evolution",
    "q166_partition_pruning",
    "q167_conversion_latency",
    "q168_burst_detection",
    "q169_decay_engagement",
    "q170_banded_percent_rank",
    "q171_table_profile",
    "q173_salted_join",
    "q174_run_length_encoding",
    "q175_image_resize_standin",
    "q176_weighted_median",
    "q177_cusum_changepoints",
    "q178_silhouette",
    "q179_orc_roundtrip",
    "q180_ab_significance",
    "q181_seasonal_profile",
    "q182_windowed_funnel",
    "q183_knn_accuracy",
    "q184_lorenz_deciles",
    "q185_mutual_information",
    "q186_dup_cluster_sizes",
    "q187_zipf_regression",
    # round-4 additions — no driver row yet
    "q101_tpch_q4_order_priority",
    "q102_tpch_q6_forecast_revenue",
    "q103_tpch_q7_volume_shipping",
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
    "q118_distribution_windows",
    "q119_sequence_transitions",
    "q120_histogram",
    "q121_pagerank",
    "q122_tfidf",
    "q123_bigram_lm_score",
    "q124_market_basket",
    "q125_session_assignment",
    "q126_pq_ann",
    "q127_time_weighted_avg",
    "q128_ohlc_bars",
    "q129_grouping_sets",
    "q130_rfm_segmentation",
    "q131_ratio_to_report",
    "q132_mad_robust_stats",
    "q133_topn_per_group",
    "q134_percent_change",
    "q135_benford_digits",
    "q136_entropy",
    "q137_gini_coefficient",
    "q138_containment",
    "q139_charset_stats",
    "q140_winsorized_mean",
    "q141_ngram_novelty",
    "q142_effective_sources",
    # new or newly-oracled since the r3 sweep — first driver row with
    # an oracle attached happens this round
    "q85_kmeans_clusters",
    "q91_cluster_neardup",
    "q96_cdc_apply",
    "q97_cdc_incremental_matview",
    "q98_funnel",
    "q99_retention_cohorts",
    "q100_heavy_hitters",
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
    )

    missing = [n for n in SWEEP_FIRST if n not in REGISTRY]
    if missing:  # a rename must fail loudly, not silently de-prioritize
        raise KeyError(f"SWEEP_FIRST names not in registry: {missing}")
    head = {n: REGISTRY[n] for n in SWEEP_FIRST}
    tail = {n: s for n, s in REGISTRY.items() if n not in head}
    return {**head, **tail}
