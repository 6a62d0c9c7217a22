"""Zipf-skew events variant (r8 verdict item 5): the TPC-H-ish
fixtures are near-uniform, so the salting tier (q68/q173) and the
hub-resilient shapes (q158 rolling distinct, q267 degree-oriented
triangles) never face a genuinely hot key at probe time. This script
rewrites ``events.user_id`` with a bounded-Pareto (Zipf-like,
alpha ~= 1.1) rank draw — the hottest user absorbs ~10% of ALL events
at N=10^4 — and copies every other table unchanged.

Determinism: the uniform draw is md5(event_id)-derived (48 bits ->
exact double in (0,1]), the same content-hash convention as the
engine's sampling operators — regeneration is byte-stable, no RNG
state.

The inverse-CDF of the bounded Pareto on [1, N]:

    x = (1 - u * (1 - N^(1-a)))^(1/(1-a)),  rank = clamp(floor(x), 1, N)

so P(rank = 1) ~= (1 - 2^(1-a)) / (1 - N^(1-a)) — at a = 1.1, N = 1e4
that is ~11%: one pathologically hot user, a realistic power-law tail
behind it.

Usage: python scripts/make_skew_fixture.py [dst] [src] [alpha]
Writes one parquet dir per table under dst (default /tmp/skew01).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from speculare_pgcdc_spark.session import get_spark  # noqa: E402

COPY = [
    "region", "nation", "part", "supplier", "customer",
    "orders", "lineitem", "documents", "embeddings",
]


def skew(spark, src: str, dst: str, alpha: float = 1.1) -> None:
    # single-FILE tables like the driver fixtures (DuckDB oracle views
    # glob a file path, and verify_sim runs the full oracle sweep on
    # this fixture to prove hash equality under skew)
    import shutil

    os.makedirs(dst, exist_ok=True)
    for t in COPY:
        s, d = f"{src}/{t}.parquet", f"{dst}/{t}.parquet"
        # a source table may be a flat file (driver fixtures) or a
        # parquet dir (make_scale_fixture / any Spark writer)
        if os.path.isdir(s):
            if os.path.isdir(d):
                shutil.rmtree(d)
            shutil.copytree(s, d)
        else:
            shutil.copy(s, d)

    ev = spark.read.parquet(f"{src}/events.parquet")
    n_users = int(ev.agg(F.max("user_id")).first()[0]) + 1
    # md5 -> 48-bit uniform in (0,1]
    u = (
        F.conv(
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 12),
            16,
            10,
        ).cast("bigint")
        + 1
    ) / F.lit(float(1 << 48))
    one_minus_na = 1.0 - n_users ** (1.0 - alpha)
    x = F.pow(1.0 - u * F.lit(one_minus_na), F.lit(1.0 / (1.0 - alpha)))
    rank = F.least(
        F.greatest(F.floor(x).cast("bigint"), F.lit(1)),
        F.lit(n_users),
    )
    import pyarrow.dataset as ds
    import pyarrow.parquet as pq

    tmp = f"{dst}/_events_tmp"
    ev.withColumn("user_id", (rank - 1).cast(
        dict(ev.dtypes)["user_id"]
    )).repartition(32).write.mode("overwrite").parquet(tmp)
    # concat the Spark parts into one file with row groups preserved
    # (32 row groups -> the scan still splits for the probe)
    tbl = ds.dataset(tmp, format="parquet").to_table()
    # normalize timestamps to NAIVE us — the driver fixtures' flavor
    # (Spark's TIMESTAMP_MICROS writes isAdjustedToUTC=true, which
    # DuckDB would surface as TIMESTAMPTZ and skew oracle rendering)
    import pyarrow as pa

    fields = [
        pa.field(f.name, pa.timestamp("us"))
        if pa.types.is_timestamp(f.type)
        else f
        for f in tbl.schema
    ]
    tbl = tbl.cast(pa.schema(fields))
    pq.write_table(
        tbl, f"{dst}/events.parquet", row_group_size=max(len(tbl) // 32, 1)
    )
    import shutil as _sh

    _sh.rmtree(tmp)


if __name__ == "__main__":
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/skew01"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    alpha = float(sys.argv[3]) if len(sys.argv) > 3 else 1.1
    spark = get_spark(
        app_name="skew-fixture",
        extra_conf={
            "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS"
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    skew(spark, src, dst, alpha)
    top = (
        spark.read.parquet(f"{dst}/events.parquet")
        .groupBy("user_id")
        .count()
        .orderBy(F.col("count").desc())
        .limit(5)
        .collect()
    )
    n = spark.read.parquet(f"{dst}/events.parquet").count()
    print(f"events: {n} rows; top users: "
          + ", ".join(f"{r.user_id}={r['count']}" for r in top))
