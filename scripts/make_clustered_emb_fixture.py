"""Clustered-skew EMBEDDINGS variant (r9 verdict item 6): the fixture
embeddings are near-uniform across IVF cells, so the similarity tier
(q53/q126/q271) had never faced the ANN failure mode — Zipf CELL
occupancy, where one hot cluster concentrates a constant fraction of
all vectors and the same-cell candidate join goes quadratic in it.

This script synthesizes N vectors in G planted clusters whose sizes
follow the same bounded-Pareto (alpha ~= 1.1) rank draw as
make_skew_fixture.py: the hot cluster absorbs ~a third of ALL vectors
at G=8. A trained coarse quantizer recovers planted structure, so the
IVF cell occupancy inherits the skew — exactly the regime
similarity.capped_cell_pairs exists for.

Determinism (the engine's content-hash convention, no RNG state):
- cluster of vector i: bounded-Pareto inverse-CDF on a 48-bit
  md5(i)-derived uniform;
- cluster centers: unit-ish axis bumps — center g has +3.0 on
  dimensions (2g, 2g+1), 0 elsewhere (well separated at dim 64);
- per-coordinate noise: md5(i:d)-derived uniform in [-0.5, 0.5].

Writes a single-file embeddings.parquet (vec_id, label, embedding)
under dst so query fns can read it as a fixture dir table.

Usage: python scripts/make_clustered_emb_fixture.py [dst] [n] [g] [alpha]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from speculare_pgcdc_spark.session import get_spark  # noqa: E402

DIM = 64
BUMP = 3.0


def build(spark, dst: str, n: int, g: int, alpha: float) -> None:
    os.makedirs(dst, exist_ok=True)
    base = spark.range(n).select(F.col("id").alias("vec_id"))

    def u48(key):
        return (
            F.conv(F.substring(F.md5(key), 1, 12), 16, 10).cast("bigint")
            + 1
        ) / F.lit(float(1 << 48))

    one_minus_na = 1.0 - g ** (1.0 - alpha)
    x = F.pow(
        1.0 - u48(F.col("vec_id").cast("string")) * F.lit(one_minus_na),
        F.lit(1.0 / (1.0 - alpha)),
    )
    cluster = (
        F.least(F.greatest(F.floor(x).cast("int"), F.lit(1)), F.lit(g))
        - 1
    )

    def coord(d: int):
        noise = u48(
            F.concat(
                F.col("vec_id").cast("string"), F.lit(f":{d}")
            )
        ) - F.lit(0.5)
        bump = (
            F.when(
                (F.col("_c") * 2 == d) | (F.col("_c") * 2 + 1 == d),
                F.lit(BUMP),
            ).otherwise(F.lit(0.0))
        )
        return (bump + noise).cast("double")

    df = (
        base.withColumn("_c", cluster)
        .select(
            "vec_id",
            F.col("_c").cast("string").alias("label"),
            F.array(*[coord(d) for d in range(DIM)]).alias("embedding"),
        )
    )
    import pyarrow.dataset as ds
    import pyarrow.parquet as pq

    tmp = f"{dst}/_emb_tmp"
    df.repartition(32).write.mode("overwrite").parquet(tmp)
    tbl = ds.dataset(tmp, format="parquet").to_table().sort_by("vec_id")
    pq.write_table(
        tbl, f"{dst}/embeddings.parquet", row_group_size=max(n // 32, 1)
    )
    import shutil

    shutil.rmtree(tmp)
    print(f"wrote {dst}/embeddings.parquet: n={n} g={g} alpha={alpha}")


if __name__ == "__main__":
    argv = sys.argv[1:]
    dst = argv[0] if argv else "/tmp/skewemb"
    n = int(argv[1]) if len(argv) > 1 else 50_000
    g = int(argv[2]) if len(argv) > 2 else 8
    alpha = float(argv[3]) if len(argv) > 3 else 1.1
    spark = get_spark(app_name="make-clustered-emb-fixture")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark, dst, n, g, alpha)
