"""Heavy hitters (approximate top-k frequent items) via per-partition
Misra-Gries summaries — the frequency member of the sketch family
(MinHash/SimHash/SRP/HLL/t-digest elsewhere in operators/), and the
100 TB path for vocabulary / stopword / boilerplate-token discovery
where an exact global token count is an avoidable full-corpus shuffle.

Shape: mapInPandas computes a BOUNDED summary (``summary_size``
counters) per partition — the only Python in the plan, Arrow-batched,
emitting at most summary_size rows per partition regardless of input
size — then candidates merge with one (tiny) hash agg, and the final
counts come from an EXACT recount of the candidate set (broadcast
semi-join + hash agg), so the reported counts carry no sketch error.

Guarantee (standard MG merge bound): any item with global frequency
f > N/(summary_size+1) survives at least one partition summary, so for
data whose true k-th frequency clears that bar the result EQUALS the
exact top-k (pinned on the fixtures and on constructed Zipf data in
tests/test_llm.py). Below the bar the tail of the ranking may differ —
that is the declared approximation, same contract as the other
sketches (SURVEY §2D E14 rows).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_summaries(col: str, summary_size: int):
    """Per-partition batched Misra-Gries: merge each Arrow batch's
    value_counts into the summary; on overflow subtract the
    (summary_size+1)-th largest count from everything and drop the
    non-positive rest — the weighted-decrement generalization of MG's
    counter eviction, error still bounded by N_p/summary_size."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: pd.Series = pd.Series(dtype="int64")
        for pdf in batches:
            batch = pdf[col].dropna().value_counts()
            counts = counts.add(batch, fill_value=0)
            if len(counts) > summary_size:
                counts = counts.sort_values(ascending=False)
                cut = counts.iloc[summary_size]
                counts = (counts - cut)[lambda s: s > 0]
        if len(counts):
            yield pd.DataFrame(
                {col: counts.index, "mg_bound": counts.values.astype("int64")}
            )

    return run


def misra_gries_topk(
    items: DataFrame,
    col: str,
    k: int = 20,
    summary_size: int = 4096,
    candidate_factor: int = 4,
) -> DataFrame:
    """Top-k items of ``items[col]`` by exact count, discovered through
    Misra-Gries summaries: sketch per partition, merge bounds, keep the
    top ``k * candidate_factor`` candidates, exactly recount ONLY those
    (broadcast semi-join — the corpus never shuffles on the item key),
    then rank. Returns (col, c) ordered by (c desc, col)."""
    summaries = items.select(col).mapInPandas(
        _mg_summaries(col, summary_size),
        schema=f"{col} string, mg_bound bigint",
    )
    candidates = (
        summaries.groupBy(col)
        .agg(F.sum("mg_bound").alias("_bound"))
        .orderBy(F.col("_bound").desc(), col)
        .limit(k * candidate_factor)
        .select(col)
    )
    exact = (
        items.join(F.broadcast(candidates), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    return exact.orderBy(F.col("c").desc(), col).limit(k)
