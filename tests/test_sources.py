"""S1-S3/S5 source + sink behavior (SURVEY §2B rows without oracles):
sink round-trips, partition pruning through a partitioned write, JDBC
parallelism validation (no database in the harness — configuration and
refusal paths only)."""

from __future__ import annotations

import pytest

from speculare_pgcdc_spark.catalog import table
from speculare_pgcdc_spark.plans import plan_string, read_schemas
from speculare_pgcdc_spark.sources import (
    jdbc_scan,
    read_jsonl,
    write_jsonl,
    write_parquet,
)


def test_parquet_roundtrip_partitioned(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orders_by_status")
    src = table(spark, sf_dir, "orders")
    write_parquet(src, out, partition_by=["o_orderstatus"])
    back = spark.read.parquet(out)
    assert back.count() == src.count()
    # partition pruning: a filter on the partition column must reach the
    # scan as a PartitionFilter, reading only that directory
    pruned = back.filter(back.o_orderstatus == "F")
    p = plan_string(pruned)
    assert "PartitionFilters" in p and "o_orderstatus" in p.split(
        "PartitionFilters"
    )[1].split("]")[0]
    duck_n = src.filter(src.o_orderstatus == "F").count()
    assert pruned.count() == duck_n


def test_jsonl_roundtrip_with_explicit_schema(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_jsonl")
    src = table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    write_jsonl(src, out)
    back = read_jsonl(
        spark, out, "event_id bigint, event_type string, value double"
    )
    assert back.count() == src.count()
    assert set(back.columns) == {"event_id", "event_type", "value"}
    # schema came from the contract, not inference
    assert dict(back.dtypes)["event_id"] == "bigint"


def test_jsonl_read_prunes_columns(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_jsonl2")
    write_jsonl(
        table(spark, sf_dir, "events").select("event_id", "event_type"), out
    )
    back = read_jsonl(spark, out, "event_id bigint, event_type string")
    schemas = read_schemas(back.select("event_id"))
    assert schemas and schemas[0] == {"event_id"}


def test_jdbc_scan_range_partitioned_config(spark):
    reader = jdbc_scan(
        spark,
        "jdbc:postgresql://db/x",
        "events",
        partition_column="event_id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=32,
    )
    # configured, not connected — load() is where the wire would start
    assert reader is not None


def test_jdbc_scan_refuses_half_specified_partitioning(spark):
    with pytest.raises(ValueError, match="half-specified"):
        jdbc_scan(
            spark,
            "jdbc:postgresql://db/x",
            "events",
            partition_column="event_id",
            num_partitions=32,
        )


def test_jdbc_scan_refuses_silent_single_task(spark):
    with pytest.raises(ValueError, match="one task"):
        jdbc_scan(spark, "jdbc:postgresql://db/x", "events")


def test_jdbc_scan_allows_explicitly_tiny(spark):
    assert (
        jdbc_scan(
            spark, "jdbc:postgresql://db/x", "nation", num_partitions=1
        )
        is not None
    )


def test_jdbc_scan_predicates_exclusive_with_range(spark):
    with pytest.raises(ValueError, match="exclusive"):
        jdbc_scan(
            spark,
            "jdbc:postgresql://db/x",
            "events",
            partition_column="event_id",
            lower_bound=0,
            upper_bound=10,
            num_partitions=2,
            predicates=["user_id < 50", "user_id >= 50"],
        )


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    """The 100 TB fact-fact join path: both sides bucketed on the join
    key with equal bucket counts -> sort-merge join with ZERO exchanges
    (bucket locality replaces the shuffle)."""
    from pyspark.sql import functions as F

    from speculare_pgcdc_spark.plans import exchange_count
    from speculare_pgcdc_spark.sources import write_bucketed

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    od = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(
        li, "li_bucketed", ["l_orderkey"], 8,
        path=str(tmp_path / "li_b"), sort_cols=["l_orderkey"],
    )
    write_bucketed(
        od, "od_bucketed", ["o_orderkey"], 8,
        path=str(tmp_path / "od_b"), sort_cols=["o_orderkey"],
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("li_bucketed").join(
            spark.table("od_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        assert exchange_count(j, "hashpartitioning") == 0
        assert j.count() == li.count()  # every line has its order
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS od_bucketed")


def test_csv_roundtrip_with_explicit_schema(spark, sf_dir, tmp_path):
    """S-family: CSV sink + schema-first scan (header for humans, the
    schema contract for the engine — never inferSchema)."""
    out = str(tmp_path / "nation_csv")
    src = table(spark, sf_dir, "nation")
    src.write.mode("overwrite").option("header", "true").csv(out)
    back = (
        spark.read.schema("n_nationkey int, n_name string, n_regionkey int")
        .option("header", "true")
        .csv(out)
    )
    assert sorted(r.n_nationkey for r in back.collect()) == sorted(
        r.n_nationkey for r in src.collect()
    )
    assert dict(back.dtypes)["n_nationkey"] == "int"


def test_jdbc_scan_predicates_returns_loader(spark):
    """Predicate partitioning has no reader-option form; the helper
    must hand back a real loader bound to DataFrameReader.jdbc, not a
    reader with a fake option that degrades to one task."""
    loader = jdbc_scan(
        spark,
        "jdbc:postgresql://db/x",
        "events",
        predicates=["user_id < 50", "user_id >= 50"],
    )
    assert callable(loader) and not hasattr(loader, "option")
