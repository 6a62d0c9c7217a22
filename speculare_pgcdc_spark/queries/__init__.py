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
    # (1) round-7 priority: the 46 round-6 additions that have never
    # had a driver CORRECTNESS row (sweep- and pytest-green only;
    # r6 verdict item 1). Highest user-frequency first per the
    # verdict: exact median, table checksum, ingest dedup, BM25.
    # q192/q200 will report rows-only by declared contract.
    "q194_exact_global_median",
    "q196_table_checksum",
    "q197_incremental_ingest",
    "q201_bm25_topk",
    "q190_embedding_dim_profile",
    "q191_split_leakage",
    "q192_compaction_plan",
    "q193_join_size_estimate",
    "q195_weighted_topk_sample",
    "q198_rank_auc",
    "q199_calibration_bins",
    "q200_hll_user_sketch",
    "q202_hard_negatives",
    "q203_ndcg_at_k",
    "q204_mrr",
    "q205_threshold_sweep",
    "q206_cohens_kappa",
    "q207_autocorrelation",
    "q208_theil_sen_trend",
    "q209_repetition_ratio",
    "q210_ks_test",
    "q211_chi_squared",
    "q212_js_divergence",
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
    "q227_mutual_information",
    "q228_null_safe_join",
    "q229_array_set_ops",
    "q230_streak_islands",
    "q231_mode_per_group",
    "q232_max_drawdown",
    "q233_stratified_exact_sample",
    "q234_holt_forecast",
    "q235_lag_cross_correlation",
    # (2) plan/oracle changes this round — re-attest after change:
    # q126 gains a staged deterministic oracle (r6 verdict item 2),
    # q208 is rewritten through rankband (r6 verdict item 5; also
    # listed above in its never-checked slot).
    "q126_pq_ann",
    # (3) new this round (r6 verdict item 6 + round-7 additions)
    "q236_holt_winters_seasonal",
    "q237_blocklist_scrub",
    "q238_snapshot_diff",
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
    )

    missing = [n for n in SWEEP_FIRST if n not in REGISTRY]
    if missing:  # a rename must fail loudly, not silently de-prioritize
        raise KeyError(f"SWEEP_FIRST names not in registry: {missing}")
    head = {n: REGISTRY[n] for n in SWEEP_FIRST}
    tail = {n: s for n, s in REGISTRY.items() if n not in head}
    return {**head, **tail}
