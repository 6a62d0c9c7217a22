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


def srp_signature(
    emb: DataFrame,
    planes: int = 16,
    dim: int = 64,
    vec_col: str = "embedding",
) -> DataFrame:
    """Signed-random-projection (cosine LSH) bit signature: bit p =
    sign(<v, h_p>) with hyperplane entries ±1 derived from xxhash64(p,
    d) — deterministic, so speculative re-execution and engine restarts
    produce identical signatures (no RNG state to ship). Adds `sig`
    (bigint, one bit per plane). Pure codegen fold, no shuffle."""
    bits = []
    for p in range(planes):
        dot = F.expr(
            f"aggregate(sequence(0, {dim - 1}), CAST(0.0 AS DOUBLE),"
            f" (acc, d) -> acc + element_at({vec_col}, d + 1) *"
            f"  (CAST(pmod(xxhash64({p}, d), 2) AS DOUBLE) * 2.0 - 1.0))"
        )
        bits.append(F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return emb.withColumn("sig", sig.cast("bigint"))


def srp_candidate_pairs(
    emb: DataFrame,
    planes: int = 16,
    bands: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine-LSH banding over the SRP signature: vectors agreeing on
    all bits of any band become candidates (da < db). Equi-join on
    (band, band_bits) — bounded bucket fan-out, the q46 shape for
    embeddings. With planes=16/bands=8 (2 bits per band), a pair at
    cos >= 0.3 is caught with ~97% probability while the bucket join
    stays tiny."""
    rows = planes // bands
    sigs = srp_signature(emb, planes, dim, vec_col).select(id_col, "sig")
    mask = (1 << rows) - 1
    band_vals = F.expr(
        f"transform(sequence(0, {bands - 1}),"
        f" b -> (shiftright(sig, b * {rows}) & {mask}))"
    )
    buckets = sigs.select(
        F.col(id_col), F.posexplode(band_vals).alias("band", "bval")
    )
    a = buckets.select(F.col(id_col).alias("da"), "band", "bval")
    b = buckets.select(F.col(id_col).alias("db"), "band", "bval")
    return (
        a.join(b, ["band", "bval"])
        .filter(F.col("da") < F.col("db"))
        .select("da", "db")
        .distinct()
    )


def srp_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.3,
    planes: int = 16,
    bands: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup scale path: SRP-LSH candidates -> exact cosine
    verification of candidates ONLY (the q48 all-pairs form is the
    exactness baseline). Returns (da, db, cos) with cos >= threshold."""
    cands = srp_candidate_pairs(emb, planes, bands, dim, id_col, vec_col)
    va = emb.select(F.col(id_col).alias("da"), F.col(vec_col).alias("_ea"))
    vb = emb.select(F.col(id_col).alias("db"), F.col(vec_col).alias("_eb"))
    paired = cands.join(va, "da").join(vb, "db")
    cos = _dot(F.col("_ea"), F.col("_eb")) / (
        _norm(F.col("_ea")) * _norm(F.col("_eb"))
    )
    return (
        paired.withColumn("_c", cos)
        .filter(F.col("_c") >= threshold)
        .select("da", "db", F.round("_c", 4).alias("cos"))
    )
