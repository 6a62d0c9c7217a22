"""Pipeline observability via Spark's observe() metrics.

The reference logs per-message counters as the forwarder loop runs
(src/forwarder/mod.rs's trace/debug lines); the Spark-native analog is
`Dataset.observe`: named aggregates evaluated AS the plan executes —
zero extra passes, zero extra actions — surfaced through
`pyspark.sql.Observation` in batch and through each microbatch's
`lastProgress["observedMetrics"]` in streaming. The SAME observed plan
works in both modes, like every other operator in this engine.

The metric set mirrors what an operator of the CDC pipeline actually
watches: change volume, kind mix, WAL-position bounds, and
poison-message drops (rows whose payload failed the variant parse —
the try_parse_json tolerance path). Unroutable (unknown-table) volume
is a routing-layer concern: it needs the table catalog, so it belongs
to a route()-level observation, not this parse-level set.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

#: name under which the CDC pipeline registers its observed metrics —
#: streaming consumers find them at lastProgress.observedMetrics[NAME]
CDC_METRICS = "cdc_metrics"


def _metric_columns():
    return [
        F.count(F.lit(1)).alias("n_changes"),
        F.sum((F.col("kind") == "insert").cast("long")).alias("n_inserts"),
        F.sum((F.col("kind") == "update").cast("long")).alias("n_updates"),
        F.sum((F.col("kind") == "delete").cast("long")).alias("n_deletes"),
        F.min("seq").alias("first_seq"),
        F.max("seq").alias("last_seq"),
    ]


def observe_changes(
    changes: DataFrame, name: str = CDC_METRICS
) -> DataFrame | Tuple[DataFrame, Observation]:
    """Attach the CDC counter set to a parsed change frame.

    Streaming frames return the observed DataFrame (read the counters
    from ``query.lastProgress["observedMetrics"][name]`` per
    microbatch — the forwarder-loop logging analog). Batch frames
    return ``(df, Observation)``; ``observation.get`` blocks until the
    first action and yields the dict. Either way the aggregates ride
    the existing execution — no second scan of the feed."""
    if changes.isStreaming:
        return changes.observe(name, *_metric_columns())
    obs = Observation(name)
    return changes.observe(obs, *_metric_columns()), obs


def observe_parse_health(
    payloads: DataFrame,
    parsed_col: str = "variant",
    name: str = "parse_health",
) -> DataFrame | Tuple[DataFrame, Observation]:
    """Poison-message accounting on the parse boundary: count rows
    whose payload failed try_parse_json (NULL variant) next to the
    total, without filtering them — the caller keeps its drop/forward
    policy, the metric just makes the drop rate visible (the silent
    failure mode of an at-least-once feed)."""
    cols = [
        F.count(F.lit(1)).alias("n_messages"),
        F.sum(F.col(parsed_col).isNull().cast("long")).alias("n_poison"),
    ]
    if payloads.isStreaming:
        return payloads.observe(name, *cols)
    obs = Observation(name)
    return payloads.observe(obs, *cols), obs
