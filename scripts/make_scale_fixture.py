"""Synthesize an sf1-shaped fixture by deterministically scaling the
sf0.1 tables FACTOR x (default 10) — the round-7 empirical scale probe
(r6 verdict item 3: "plan lints prove shape; one empirical run proves
no hidden driver-side or single-task blowup").

Scaling contract (referential integrity preserved, skew shape kept):

- dims (region/nation/part/supplier/customer) copy unchanged — at
  100 TB the dims stay broadcast-sized; growing them would change the
  join strategy the probe is meant to exercise, not its scale.
- facts cross-join a FACTOR-row copies frame; every primary key maps
  injectively as key*FACTOR + copy, and lineitem.l_orderkey shifts by
  the SAME formula as orders.o_orderkey so the order join fans out
  identically.
- o_totalprice gets a +copy*0.01 deterministic jitter so the DISTINCT
  VALUE grain (what the banded order-statistics queries aggregate to)
  also grows ~FACTOR x — duplicating values verbatim would leave the
  q194/q208 value-bin aggregates at sf0.1 size and prove nothing.
- events keep their timestamps (day grain is corpus-size-independent
  by design — that invariance is exactly what the probe checks) but
  shift user_id so user-partitioned windows see FACTOR x more keys.

Usage: python scripts/make_scale_fixture.py [dst] [factor] [src]
Writes one parquet dir per table under dst (default /tmp/scale10).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from speculare_pgcdc_spark.session import get_spark  # noqa: E402

DIMS = ["region", "nation", "part", "supplier", "customer"]


def scale(spark, src: str, dst: str, factor: int) -> None:
    copies = spark.range(factor).select(F.col("id").alias("__c"))
    # part count scales with the factor: each part file lands as one
    # parquet row group, and row groups are the real unit of scan
    # parallelism (splits can't subdivide one). 32 parts at 100x made
    # every fact scan a 32-owning-task stage behind 128 mostly-empty
    # splits — the r9 probe read that writer artifact as 650x "skew"
    # on a scan with zero shuffle. factor*3 parts (floor 32, cap 256)
    # keeps row groups near the size a real 100 TB table's would be
    # relative to tasks.
    parts = max(32, min(factor * 3, 256))

    def fanout(df):
        # repartition so the written table is many splittable parts
        # (a single-part write lands ONE giant row group, which no
        # reader can parallelize — the probe would then measure the
        # writer's layout, not the query plans)
        return df.crossJoin(F.broadcast(copies)).repartition(parts)

    os.makedirs(dst, exist_ok=True)
    for t in DIMS:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{dst}/{t}.parquet")

    orders = fanout(spark.read.parquet(f"{src}/orders.parquet")).select(
        (F.col("o_orderkey") * factor + F.col("__c")).alias("o_orderkey"),
        "o_custkey",
        "o_orderstatus",
        (F.col("o_totalprice") + F.col("__c") * 0.01).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    orders.write.mode("overwrite").parquet(f"{dst}/orders.parquet")

    li = fanout(spark.read.parquet(f"{src}/lineitem.parquet"))
    li.select(
        (F.col("l_orderkey") * factor + F.col("__c")).alias("l_orderkey"),
        *[c for c in li.columns if c not in ("l_orderkey", "__c")],
    ).write.mode("overwrite").parquet(f"{dst}/lineitem.parquet")

    ev = fanout(spark.read.parquet(f"{src}/events.parquet"))
    ev.select(
        (F.col("event_id") * factor + F.col("__c")).alias("event_id"),
        "ts",
        (F.col("user_id") * factor + F.col("__c")).alias("user_id"),
        "event_type",
        "value",
        "props",
    ).write.mode("overwrite").parquet(f"{dst}/events.parquet")

    docs = fanout(spark.read.parquet(f"{src}/documents.parquet"))
    docs.select(
        (F.col("doc_id") * factor + F.col("__c")).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    ).write.mode("overwrite").parquet(f"{dst}/documents.parquet")

    emb = fanout(spark.read.parquet(f"{src}/embeddings.parquet"))
    emb.select(
        (F.col("vec_id") * factor + F.col("__c")).alias("vec_id"),
        "embedding",
        "label",
    ).write.mode("overwrite").parquet(f"{dst}/embeddings.parquet")


if __name__ == "__main__":
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale10"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    # µs output keeps the written tables on the same read path as the
    # driver fixtures (Spark's INT96 default sniffs as timestamp[ns]
    # in pyarrow)
    spark = get_spark(
        app_name="scale-fixture",
        extra_conf={
            "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS"
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    scale(spark, src, dst, factor)
    for t in DIMS + ["orders", "lineitem", "events", "documents",
                     "embeddings"]:
        n = spark.read.parquet(f"{dst}/{t}.parquet").count()
        print(f"{t}: {n} rows")
