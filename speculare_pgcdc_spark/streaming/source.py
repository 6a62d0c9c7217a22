"""Change-feed streaming sources (R1-R7 analog).

Test/CI source: JSON-lines files written by cdc/feedgen — each file is a
batch of wal2json transaction messages; ``maxFilesPerTrigger`` is the
admission-control analog of the reference's bounded mpsc(128)
(inner.rs:30).

Production source (design, no PG in this harness): JDBC polling with a
monotonic cursor — SELECT ... WHERE cursor > :last ORDER BY cursor LIMIT
:batch — where the cursor column (an LSN, a serial, or a commit
timestamp) becomes the streaming offset; exactly the shape Spark's
rate/file sources use (start/end offsets per microbatch) and the same
at-least-once contract the reference implements by acking LSNs only
after handoff (replication.rs:198-203). The poll loop lives in the
connector, not the query plan, so the downstream pipeline
(cdc.pipeline.parse_wal2json -> route) is byte-identical to the batch
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def file_change_feed(
    spark: SparkSession,
    feed_dir: str,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """Unbounded frame of wal2json payload lines from a feed directory."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(feed_dir).withColumnRenamed("value", "payload")


def rate_feed(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Synthetic ticking source (for watermark/latency tests)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
