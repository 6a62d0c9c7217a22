"""SparkSession factory tuned for the engine.

Scale notes (100 TB north star): every setting here is either
scale-neutral or the local-mode analog of a cluster setting — AQE is the
big one (runtime shuffle-partition coalescing, skew-join splitting,
dynamic broadcast selection), and it behaves identically on a 1000
executor cluster. ``spark.sql.shuffle.partitions`` is sized to cores
locally; on a real cluster you would size it to ~2-3x total cores and let
AQE coalesce down.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "speculare-pgcdc-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    - AQE on: runtime coalescing, skew handling, adaptive broadcast.
    - Arrow on: vectorized pandas UDF / toPandas transfer.
    - Session timezone pinned to UTC so timestamp semantics are
      deterministic and match the DuckDB oracle (naive == UTC).
    """
    cpus = default_cpus()
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # r14 optimization (guide §3.1): let AQE rewrite a sort-merge
        # join to a shuffled-hash join at runtime when every map
        # output for a post-shuffle partition fits under this bound —
        # decided from ACTUAL shuffle sizes, not estimates, so it is
        # scale-adaptive by construction (at 100 TB a partition whose
        # build side exceeds the bound keeps the spill-safe SMJ).
        # Default 0 (off) upstream; 64 MB bounds the per-task hash
        # table well under executor task memory at any scale.
        # Measured (interleaved A/B, sf0.1): q267 -43% min / -59%
        # median, q255 -32% min, q112 -12% min, q238 -35% median,
        # q330/q46 neutral.
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_LOCAL_MAP_MAX",
                           str(64 * 1024 * 1024)),
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Fixtures store timestamp[ns]; Spark's TimestampType is µs-only.
        # Read nanos as long and let the catalog truncate to µs — the same
        # truncation DuckDB applies on read, so both engines see identical
        # values (verified in tests/test_oracle.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Fixtures may carry isAdjustedToUTC=false (naive timestamps);
        # with NTZ inference on, Spark reads them as TIMESTAMP_NTZ and
        # every epoch-arithmetic cast(ts as double) throws. Read them as
        # session-TZ (UTC) timestamps instead — identical values to
        # DuckDB's epoch(ts) on the same file (UTC session, naive==UTC).
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # full PushedFilters/ReadSchema in plan strings (plan lints read
        # them; default truncates at 100 chars)
        .config("spark.sql.maxMetadataStringLength", "10000")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
