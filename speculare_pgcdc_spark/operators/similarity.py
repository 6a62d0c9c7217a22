"""Vector similarity search over ArrayType(FloatType) embedding columns.

- brute-force cosine top-k: exact baseline. The dot product is a
  zip_with + aggregate fold — pure JVM expressions, no explode, no
  shuffle until the final top-k (TakeOrderedAndProject). All arithmetic
  in double for cross-engine determinism.
- IVF (inverted file): coarse-quantize by centroid, search only the
  nprobe nearest partitions — the 100 TB path. Centroids here come from
  per-label means (the fixtures' label column stands in for a k-means
  assignment; swapping in trained centroids changes nothing
  structurally). With nprobe == num_partitions IVF degrades to exact
  brute force — pinned as an invariant test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_scores(
    emb: DataFrame,
    query: DataFrame,
    vec_col: str = "embedding",
    query_col: str = "q",
) -> DataFrame:
    """Cross-join the (single-row, broadcast) query vector and score every
    embedding: adds column ``cos`` (rounded to 4)."""
    scored = emb.crossJoin(F.broadcast(query))
    cos = _dot(F.col(vec_col), F.col(query_col)) / (
        _norm(F.col(vec_col)) * _norm(F.col(query_col))
    )
    return scored.withColumn("cos", F.round(cos, 4)).drop(query_col)


def cosine_topk(
    emb: DataFrame,
    query: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine (desc), id asc tiebreak — the rounded score
    is the sort key so result sets are reproducible across engines."""
    return (
        cosine_scores(emb, query, vec_col)
        .select(id_col, "cos")
        .orderBy(F.col("cos").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_centroids(
    emb: DataFrame,
    part_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-partition mean vector: posexplode -> avg per (part, pos) ->
    re-assemble ordered array. Two small shuffles over (parts x dim)."""
    exploded = emb.select(
        F.col(part_col), F.posexplode(vec_col).alias("pos", "val")
    )
    means = exploded.groupBy(part_col, "pos").agg(
        F.avg(F.col("val").cast("double")).alias("m")
    )
    return (
        means.groupBy(part_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s.getField("m"),
            ).alias("centroid")
        )
    )


def ivf_topk(
    emb: DataFrame,
    query: DataFrame,
    k: int = 5,
    nprobe: int = 3,
    id_col: str = "vec_id",
    part_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: pick the nprobe centroids nearest the query (by
    cosine), then exact top-k within those partitions only. The partition
    filter is a broadcast semi-join, so the big table is scanned with a
    pushable predicate instead of scored row-by-row."""
    cents = ivf_centroids(emb, part_col, vec_col)
    probed = (
        cosine_scores(cents, query, vec_col="centroid")
        .orderBy(F.col("cos").desc(), F.col(part_col))
        .limit(nprobe)
        .select(part_col)
    )
    candidates = emb.join(F.broadcast(probed), part_col, "left_semi")
    return cosine_topk(candidates, query, k, id_col, vec_col)
