"""Batch sources and sinks (SURVEY §2B S1-S3, S5).

The reference's only source is the PostgreSQL replication connection
(/root/reference/src/cdc/connection.rs:8-66) and its only sink is the
per-client WebSocket channel (/root/reference/src/api/ws_handler.rs:67-73).
The engine generalizes both ends: columnar files and JDBC in, columnar
files + streaming fan-out (streaming/fanout.py) out.

Scale rules encoded here:
- JSON is read with an EXPLICIT schema, never inferSchema — inference is
  a full extra pass over 100 TB before the real job starts.
- JDBC reads must be range-partitioned (partitionColumn/bounds/
  numPartitions) or they execute as ONE task on one executor; this
  module refuses half-specified partitioning instead of silently
  degrading the way raw spark.read.jdbc does.
- Parquet writes cap file size via maxRecordsPerFile and support
  partitionBy so downstream scans get partition pruning; writers never
  coalesce(1) — a single output file is a single writing core.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    """S2: JSON-lines scan with a mandatory schema (no inference pass)."""
    return spark.read.schema(schema).json(path)


def jdbc_reader_config(
    url: str,
    table: str,
    *,
    partition_column: Optional[str] = None,
    lower_bound: Optional[int] = None,
    upper_bound: Optional[int] = None,
    num_partitions: Optional[int] = None,
    fetch_size: int = 10_000,
    predicates: Optional[list[str]] = None,
    **options: str,
) -> dict[str, str]:
    """Validate + build the option map a JDBC read will run with.

    Split out from :func:`jdbc_scan` so the generated configuration is
    directly assertable without a database on the wire (tests pin it
    against a URL/partitioning matrix): what you test is exactly what
    ``.load()`` will use.
    """
    if not url.startswith("jdbc:"):
        raise ValueError(f"not a JDBC url: {url!r}")
    range_opts = (partition_column, lower_bound, upper_bound)
    if predicates and any(o is not None for o in range_opts):
        raise ValueError("predicates and range partitioning are exclusive")
    if any(o is not None for o in range_opts) or (
        num_partitions is not None and num_partitions > 1
    ):
        if any(o is None for o in range_opts) or num_partitions is None:
            raise ValueError(
                "half-specified JDBC range partitioning (need all of "
                "partition_column, lower_bound, upper_bound, "
                "num_partitions) — refusing to fall back to a "
                "single-task read"
            )
        if upper_bound <= lower_bound:
            raise ValueError(
                f"empty JDBC bound range [{lower_bound}, {upper_bound})"
            )
    elif not predicates and num_partitions != 1:
        raise ValueError(
            "unpartitioned JDBC scan executes as one task; pass "
            "num_partitions=1 to confirm the table is tiny, or supply "
            "range partitioning / predicates"
        )
    cfg = {
        "url": url,
        "dbtable": table,
        "fetchsize": str(fetch_size),
    }
    if partition_column is not None:
        cfg.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    cfg.update(options)
    return cfg


def jdbc_scan(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: Optional[str] = None,
    lower_bound: Optional[int] = None,
    upper_bound: Optional[int] = None,
    num_partitions: Optional[int] = None,
    fetch_size: int = 10_000,
    predicates: Optional[list[str]] = None,
    **options: str,
):
    """S3: parallel JDBC scan (R1/R18 analog — the catalog + snapshot
    reads the reference does over its replication connection).

    Returns the configured reader; ``.load()`` triggers the connection
    (no database ships in this harness, so tests exercise configuration
    and validation, not the wire).

    Two parallelism modes, mutually exclusive:
    - range partitioning: all four of partition_column/lower_bound/
      upper_bound/num_partitions (each executor reads one range slice);
    - explicit ``predicates``: one partition per predicate (for
      non-numeric or skewed split keys).
    Specifying neither would read the whole table in ONE task — allowed
    only for explicitly tiny tables via num_partitions=1.
    """
    cfg = jdbc_reader_config(
        url,
        table,
        partition_column=partition_column,
        lower_bound=lower_bound,
        upper_bound=upper_bound,
        num_partitions=num_partitions,
        fetch_size=fetch_size,
        predicates=predicates,
        **options,
    )
    reader = spark.read.format("jdbc").options(**cfg)
    if predicates:
        # Predicate partitioning has no reader-option form —
        # DataFrameReader.jdbc(predicates=...) is the only public route,
        # and it resolves the schema (connects) immediately. Return a
        # zero-arg loader so configuration stays connection-free and the
        # predicates genuinely take effect at load time (a fake option
        # would silently degrade to ONE task — the exact failure this
        # module exists to refuse).
        props = {"fetchsize": str(fetch_size), **options}

        def load_with_predicates():
            return spark.read.jdbc(
                url, table, predicates=list(predicates), properties=props
            )

        return load_with_predicates
    return reader


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    partition_by: Optional[list[str]] = None,
    max_records_per_file: int = 5_000_000,
    mode: str = "overwrite",
) -> None:
    """S5: parquet sink. partition_by gives downstream partition pruning;
    maxRecordsPerFile bounds file size regardless of task count."""
    w = df.write.mode(mode).option(
        "maxRecordsPerFile", str(max_records_per_file)
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_jsonl(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """S5: JSON-lines sink (one object per line, splittable on read)."""
    df.write.mode(mode).json(path)


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    num_buckets: int,
    *,
    path: Optional[str] = None,
    sort_cols: Optional[list[str]] = None,
    mode: str = "overwrite",
) -> None:
    """S5 warehouse form: hash-bucketed (and optionally sorted) table.

    This is the zero-shuffle join path for repeated fact-fact joins: two
    tables bucketed on their join key with the same bucket count join
    with NO exchange (proven in tests/test_sources.py) — at 100 TB that
    removes the single largest cost of the pipeline, the fact shuffle,
    for every downstream query instead of once. sort_cols additionally
    removes the sort of a sort-merge join."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(name)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """S1 companion: ORC scan — same pushdown/pruning contract as the
    parquet scan (predicate + column pruning reach the ORC reader;
    round-trip + pruning proven in tests/test_sources.py). Completes
    the columnar-format surface next to parquet/CSV/JSON-lines."""
    return spark.read.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    *,
    partition_by: Optional[list[str]] = None,
    mode: str = "overwrite",
) -> None:
    """S5: ORC sink (snappy by default, like the parquet sink)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def zorder_value(
    a, b, bits: int = 16, a_min=None, a_max=None, b_min=None, b_max=None
):
    """Morton (z-order) interleave of two numeric columns, each min/max
    scaled to ``bits`` bits. Pure column expression (shift/mask terms,
    JVM codegen) — the computation is map-side; the caller provides the
    global min/max (one cheap agg) so no per-row pass depends on a
    global."""
    from pyspark.sql import functions as F

    def scaled(col, lo, hi):
        lo, hi = float(lo), float(hi)
        span = F.lit(hi - lo + 1e-12)
        x = (
            (col.cast("double") - F.lit(lo)) / span * F.lit(float(2**bits - 1))
        )
        return F.least(
            F.greatest(F.round(x, 0).cast("bigint"), F.lit(0)),
            F.lit(2**bits - 1),
        )

    sa, sb = scaled(a, a_min, a_max), scaled(b, b_min, b_max)
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        bit_a = F.shiftright(sa, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(sb, i).bitwiseAND(F.lit(1))
        z = z + F.shiftleft(bit_a, 2 * i) + F.shiftleft(bit_b, 2 * i + 1)
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: tuple[str, str],
    *,
    num_files: int = 8,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """S5 layout optimization: write parquet clustered on the Morton
    curve of two columns, so BOTH columns' per-file min/max footer
    ranges are tight and a two-dimensional box predicate skips most
    files (the OPTIMIZE ZORDER BY of lakehouse table formats, done with
    plain Spark: one min/max agg + a map-side z-value +
    repartitionByRange on it). Sorting by (a, b) instead would make b's
    ranges span the whole domain in every file; the z-curve shares the
    tightness between dimensions. Skipping effectiveness is proven
    against footer stats in tests/test_sources.py."""
    from pyspark.sql import functions as F

    ca, cb = cols
    agg = df.agg(
        F.min(ca), F.max(ca), F.min(cb), F.max(cb)
    ).first()
    z = zorder_value(
        F.col(ca), F.col(cb), bits=bits,
        a_min=agg[0], a_max=agg[1], b_min=agg[2], b_max=agg[3],
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
