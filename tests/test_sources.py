"""S1-S3/S5 source + sink behavior (SURVEY §2B rows without oracles):
sink round-trips, partition pruning through a partitioned write, JDBC
parallelism validation (no database in the harness — configuration and
refusal paths only)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

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


def test_jdbc_reader_config_matrix():
    """The generated option map IS what .load() runs with — pin it
    across dialect URLs and partitioning modes."""
    from speculare_pgcdc_spark.sources import jdbc_reader_config

    urls = [
        "jdbc:postgresql://db:5432/app",
        "jdbc:mysql://db:3306/app",
        "jdbc:sqlite:/tmp/x.db",
        "jdbc:oracle:thin:@db:1521:app",
    ]
    for url in urls:
        cfg = jdbc_reader_config(
            url,
            "events",
            partition_column="event_id",
            lower_bound=0,
            upper_bound=1_000_000,
            num_partitions=32,
            sessionInitStatement="SET search_path TO app",
        )
        assert cfg == {
            "url": url,
            "dbtable": "events",
            "fetchsize": "10000",
            "partitionColumn": "event_id",
            "lowerBound": "0",
            "upperBound": "1000000",
            "numPartitions": "32",
            "sessionInitStatement": "SET search_path TO app",
        }
    # tiny-table mode carries no partitioning keys at all
    tiny = jdbc_reader_config(urls[0], "nation", num_partitions=1)
    assert "partitionColumn" not in tiny and tiny["dbtable"] == "nation"


def test_jdbc_reader_config_rejects_bad_input():
    from speculare_pgcdc_spark.sources import jdbc_reader_config

    with pytest.raises(ValueError, match="not a JDBC url"):
        jdbc_reader_config("postgresql://db/x", "t", num_partitions=1)
    with pytest.raises(ValueError, match="empty JDBC bound range"):
        jdbc_reader_config(
            "jdbc:postgresql://db/x",
            "t",
            partition_column="id",
            lower_bound=10,
            upper_bound=10,
            num_partitions=4,
        )


def test_pg_lsn_text_ordering_trap():
    """pg_lsn as TEXT sorts '0/9' after '0/10'; the integer conversion
    must restore WAL order — the cursor-type trap this source's bigint
    lsn exists to avoid."""
    from speculare_pgcdc_spark.streaming.wal_source import (
        int_to_pg_lsn,
        pg_lsn_to_int,
    )

    lsns = ["0/10", "0/9", "1/0", "0/FFFFFFFF", "A/1"]
    text_order = sorted(lsns)
    wal_order = sorted(lsns, key=pg_lsn_to_int)
    assert wal_order == ["0/9", "0/10", "0/FFFFFFFF", "1/0", "A/1"]
    assert text_order != wal_order  # the trap is real
    for s in lsns:  # round-trip
        assert int_to_pg_lsn(pg_lsn_to_int(s)) == s
    for bad in ["junk", "0/", "1/FFFFFFFFF", None]:
        with pytest.raises(ValueError):
            pg_lsn_to_int(bad)


def test_wal_ack_is_single_row_high_water_mark(tmp_path):
    """commit() must keep wal_ack bounded (one row) and never move the
    ack backwards on a late/replayed commit."""
    import sqlite3

    from speculare_pgcdc_spark.streaming.wal_source import (
        WalPollReader,
        acked_lsn,
        ensure_wal_tables,
    )

    db = str(tmp_path / "wal.sqlite")
    ensure_wal_tables(db)
    reader = WalPollReader({"path": db})
    for lsn in (10, 20, 15, 20, 30):  # includes a replayed/late ack
        reader.commit({"lsn": lsn})
    assert acked_lsn(db) == 30  # high-water mark, 15 never regressed it
    con = sqlite3.connect(db)
    try:
        n = con.execute("SELECT COUNT(*) FROM wal_ack").fetchone()[0]
    finally:
        con.close()
    assert n == 1  # bounded forever, not one row per microbatch


def test_wal_poll_rejects_non_monotonic_replay_range(tmp_path):
    from speculare_pgcdc_spark.streaming.wal_source import (
        WalPollReader,
        ensure_wal_tables,
    )

    db = str(tmp_path / "wal.sqlite")
    ensure_wal_tables(db)
    reader = WalPollReader({"path": db})
    with pytest.raises(ValueError, match="non-monotonic"):
        reader.readBetweenOffsets({"lsn": 50}, {"lsn": 10})


def test_orc_roundtrip_pushdown_and_pruning(spark, sf_dir, tmp_path):
    """S-family: ORC sink + scan with the same scale contract as
    parquet — values round-trip, partition_by prunes directories, and
    a filter over the scan reads only matching rows."""
    from speculare_pgcdc_spark.sources import read_orc, write_orc

    out = str(tmp_path / "orders_orc")
    src = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    write_orc(src, out, partition_by=["o_orderstatus"])

    back = read_orc(spark, out)
    assert back.count() == src.count()
    assert sorted(
        r.o_orderkey for r in back.filter("o_orderstatus = 'F'").collect()
    ) == sorted(
        r.o_orderkey for r in src.filter("o_orderstatus = 'F'").collect()
    )

    # partition pruning: the 'F' scan must touch only the F directory
    pruned = read_orc(spark, out).filter("o_orderstatus = 'F'")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "o_orderstatus=F" in plan or "PartitionFilters" in plan


def test_zorder_write_skips_more_files_than_single_sort(spark, tmp_path):
    """Layout proof for write_zordered: for a 2-D box predicate over
    uniform (x, y) data, the number of files whose footer [min,max]
    ranges intersect the box is strictly smaller under z-order
    clustering than under a single-column sort — multi-dimensional
    file skipping, measured on the real parquet footers. (Synthetic
    uniform data: the fixture tables' key cardinality at the test SF
    is too coarse to resolve a 2-D curve.)"""
    import random as _random

    import pyarrow.parquet as pq

    from speculare_pgcdc_spark.sources import write_zordered

    rng = _random.Random(3)
    rows = [
        (rng.randrange(4096), rng.randrange(4096)) for _ in range(20_000)
    ]
    df = spark.createDataFrame(rows, "x int, y int")
    zdir = str(tmp_path / "zorder")
    sdir = str(tmp_path / "plain_sort")
    write_zordered(df, zdir, ("x", "y"), num_files=64)
    (
        df.repartitionByRange(64, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(sdir)
    )

    # 10% x 10% box in the middle of the domain
    lo, hi, vlo, vhi = 1843, 2252, 1843, 2252

    def files_hit(d):
        hit = total = 0
        for name in os.listdir(d):
            if not name.endswith(".parquet"):
                continue
            total += 1
            meta = pq.ParquetFile(os.path.join(d, name)).metadata
            stats = {}
            for gi in range(meta.num_row_groups):
                rg = meta.row_group(gi)
                for ci in range(rg.num_columns):
                    col = rg.column(ci)
                    st = col.statistics
                    if st is None:
                        continue
                    mn, mx = stats.get(
                        col.path_in_schema, (st.min, st.max)
                    )
                    stats[col.path_in_schema] = (
                        min(mn, st.min), max(mx, st.max)
                    )
            u, v = stats["x"], stats["y"]
            if u[0] <= hi and u[1] >= lo and v[0] <= vhi and v[1] >= vlo:
                hit += 1
        return hit, total

    z_hit, z_total = files_hit(zdir)
    s_hit, s_total = files_hit(sdir)
    assert z_total == 64 and s_total == 64
    # single-column sort: y spans the full domain in every file, so
    # every file whose x range intersects the box is hit (~10% of 64);
    # the z-curve confines the box to the cells it actually crosses
    assert z_hit < s_hit, (z_hit, s_hit)


def test_catalog_table_reads_directory_layout(spark, sf_dir, tmp_path):
    # warehouse writers land tables as DIRECTORIES of part files (and
    # Spark's INT96 default makes pyarrow sniff their timestamps as
    # ns); catalog.table must read that layout identically to the
    # driver's flat single-file fixtures, without misapplying the
    # nanosAsLong long->timestamp conversion to INT96 columns
    src = table(spark, sf_dir, "orders")
    dst = str(tmp_path / "orders.parquet")
    src.repartition(4).write.parquet(dst)
    got = table(spark, str(tmp_path), "orders")
    assert dict(got.dtypes) == dict(src.dtypes)
    assert got.count() == src.count()
    a = src.agg(F.sum(F.unix_timestamp("o_orderdate"))).first()[0]
    b = got.agg(F.sum(F.unix_timestamp("o_orderdate"))).first()[0]
    assert a == b


def test_spread_scan_widens_single_task_scan(spark, sf_dir):
    """catalog.spread_scan (r14, guide §2.5 input under-parallelism):
    a single-row-group fixture file scans as ONE task; the helper
    round-robins it to the session's parallelism, exactly preserves
    the row multiset, keeps column pruning at the scan, and no-ops on
    a frame that is already at least as wide as the session."""
    from speculare_pgcdc_spark.catalog import spread_scan

    target = spark.sparkContext.defaultParallelism
    narrow = table(spark, sf_dir, "documents").select("doc_id", "text")
    assert narrow.rdd.getNumPartitions() < target  # the fixture layout
    spread = spread_scan(narrow)
    assert spread.rdd.getNumPartitions() == target
    # round-robin exchange, not a keyed one
    assert "RoundRobinPartitioning" in plan_string(spread)
    # pruning still reaches the scan through the exchange (the plan
    # string may list the scan more than once under AQE)
    schemas = read_schemas(spread)
    assert schemas and all(s == {"doc_id", "text"} for s in schemas)
    # the row multiset is untouched
    a = sorted(r["doc_id"] for r in spread.collect())
    b = sorted(r["doc_id"] for r in narrow.collect())
    assert a == b
    # no-op branch: already wide enough
    wide = spread.repartition(target)
    assert spread_scan(wide) is wide
