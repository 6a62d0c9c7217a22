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
    # Round 14. Rotation invariant (BASELINE.md "Attestation
    # rotation"): oldest-first, full cycle every ceil(332/50)+1 = 8
    # rounds; SWEEP_r{N} (3-scale, committed) is the interim proof for
    # rows the driver budget doesn't reach. Tiers:
    #
    # (1) the r6 trio — oldest in the ledger (7 rounds, at the
    # bound's edge; they MUST land this round):
    "q187_zipf_regression",
    "q188_train_split",
    "q189_skew_profile",
    # (2) CHANGED THIS ROUND: q87 was A/B'd against the r13-verdict
    # semi-join prefilter shape and REVERTED on measurement (2.8x
    # slower — gram construction dominates; see dedup.py note), so
    # its final plan equals r13's but it re-attests for the audit
    # trail; q316 now derives its band width via
    # write_banded_snapshot's auto-selection formula and reports it
    # (r13 verdict #5) — new column, must re-attest.
    "q87_contamination",
    "q316_band_layout_audit",
    # (3) the r7-era block, 7 rounds stale after this round if not
    # re-attested (44 rows = the exact latest-round==7 ledger set):
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
    # (4) NEW this round (round-14 batch, never attested — the
    # driver budget reaches ~50 rows; any overflow here carries
    # SWEEP_r14 3-scale proof and leads r15):
    "q324_duplicate_span_mask",
    "q325_template_ngrams",
    "q326_dedup_mixture_shift",
    "q327_bpe_pair_stats",
    "q328_vocab_coverage_curve",
    "q329_padding_waste",
    "q330_quantized_recall",
    "q331_curation_funnel",
    "q332_psi_length_drift",
    "q333_readability_buckets",
    "q334_embedding_anisotropy",
    "q335_importance_ess",
    "q336_copy_direction",
    "q337_bitext_candidates",
    "q338_mixture_rebalance",
    "q339_ngram_novelty",
    "q340_fold_balance",
    "q341_window_chunking",
    "q342_code_switch",
    "q343_template_provenance",
    "q344_rapid_repeat_audit",
    "q345_user_concentration",
    "q346_centroid_separation",
    "q347_gate_redundancy",
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
        dataops3,
        dataops4,
        dataops5,
    )

    missing = [n for n in SWEEP_FIRST if n not in REGISTRY]
    if missing:  # a rename must fail loudly, not silently de-prioritize
        raise KeyError(f"SWEEP_FIRST names not in registry: {missing}")
    head = {n: REGISTRY[n] for n in SWEEP_FIRST}
    tail = {n: s for n, s in REGISTRY.items() if n not in head}
    return {**head, **tail}
