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
    # Round 13. Rotation invariant (restated per r12 verdict item 2,
    # see BASELINE.md "Attestation rotation"): oldest-first rotation
    # with a full cycle every ceil(324/50)+1 = 8 rounds; SWEEP_r{N}
    # (3-scale, committed) is the interim proof for rows the driver
    # budget doesn't reach. Tiers:
    #
    # (1) CHANGED THIS ROUND (the r9 precedent — re-attest after
    # change): q96/q97 ride apply_changes/touched_groups, whose
    # internals were restructured into latest_changes + apply_latest
    # (+ the latest-based group derivation) for the banded IVM
    # consumer. Values unchanged (oracle-tested), plans re-shaped.
    "q96_cdc_apply",
    "q97_cdc_incremental_matview",
    # (2) NEW this round (round-13 batch, never attested):
    "q316_band_layout_audit",
    "q317_reciprocal_rank_fusion",
    "q318_decayed_value",
    "q319_bytes_per_token_by_lang",
    "q320_oov_rate",
    "q321_srm_check",
    "q322_dedup_waterfall",
    "q323_generalization_ladder",
    # (3) the r6-era block, 7 rounds stale (38 rows, the exact
    # `latest-round == 6` set in the cumulative ledger):
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
    # (4) the r7-era block, oldest-first fill (44 rows at r7; the
    # ~50-row driver budget reaches into the front of this tier and
    # the remainder leads r14):
    "q190_embedding_dim_profile",
    "q191_split_leakage",
    "q192_compaction_plan",
    "q193_join_size_estimate",
    "q194_exact_global_median",
    "q195_weighted_topk_sample",
    "q196_table_checksum",
    "q197_incremental_ingest",
    "q198_rank_auc",
    "q199_calibration_bins",
    "q200_hll_user_sketch",
    "q201_bm25_topk",
    "q203_ndcg_at_k",
    "q204_mrr",
    "q205_threshold_sweep",
    "q206_cohens_kappa",
    "q207_autocorrelation",
    "q208_theil_sen_trend",
    "q210_ks_test",
    "q213_kaplan_meier",
    "q214_negative_sampling",
    "q215_normalized_dedup",
    "q216_inverted_index",
    "q217_token_fertility",
    "q218_cohort_ltv",
    "q219_state_at_purchase",
    "q220_referential_integrity",
    "q221_welch_ttest",
    "q222_decile_lift",
    "q223_last_touch_attribution",
    "q224_qq_quantiles",
    "q225_lww_replica_merge",
    "q226_neyman_allocation",
    "q228_null_safe_join",
    "q229_array_set_ops",
    "q230_streak_islands",
    "q231_mode_per_group",
    "q232_max_drawdown",
    "q233_stratified_exact_sample",
    "q234_holt_forecast",
    "q235_lag_cross_correlation",
    "q236_holt_winters_seasonal",
    "q237_blocklist_scrub",
    "q238_snapshot_diff",
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
        dataops2,
    )

    missing = [n for n in SWEEP_FIRST if n not in REGISTRY]
    if missing:  # a rename must fail loudly, not silently de-prioritize
        raise KeyError(f"SWEEP_FIRST names not in registry: {missing}")
    head = {n: REGISTRY[n] for n in SWEEP_FIRST}
    tail = {n: s for n, s in REGISTRY.items() if n not in head}
    return {**head, **tail}
