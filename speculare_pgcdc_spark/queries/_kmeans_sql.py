"""DuckDB oracle SQL for the k-means-backed queries (q85, q91).

``kmeans_centroids`` (operators/similarity.py) is deterministic by
construction: md5-ranked init, a FIXED number of Lloyd iterations,
6-decimal centroid rounding, first-index tie-breaks, empty clusters
keeping their previous centroid. That makes the whole training loop
SQL-expressible by *unrolling* the iterations as staged CTEs — the same
move q93's recursive-CTE oracle made for connected components. Every
arithmetic step mirrors the Spark side bit-for-bit where it matters:

- dot products run left-to-right in double in both engines
  (Spark: ``aggregate(zip_with(...))`` fold; DuckDB:
  ``list_dot_product`` over ``DOUBLE[]``),
- assignment is argmax with smallest-index tie-break
  (Spark: ``array_position(scores, array_max(scores))``; DuckDB:
  ``row_number() OVER (ORDER BY score DESC, cid)``),
- zero-norm vectors score the -2.0 sentinel in both,
- centroid means are ``round(avg(x), 6)`` in both, so sub-ulp
  summation-order drift cannot flip a later assignment.

The reference has no clustering surface; this backs the engine-layer
L3 rows (SURVEY §2D E36 and the q85 clustering query).
"""

from __future__ import annotations


def _iteration(t: int) -> str:
    """CTEs for Lloyd iteration t: score vs c{t-1} -> assign -> new
    means -> c{t} (empty clusters keep the previous centroid)."""
    p = t - 1
    return f"""
        s{t} AS (
            SELECT n.vid, n.e, c.cid,
                   CASE WHEN n.ne * sqrt(list_dot_product(c.c, c.c)) = 0
                        THEN -2.0
                        ELSE list_dot_product(n.e, c.c)
                             / (n.ne * sqrt(list_dot_product(c.c, c.c)))
                   END AS score
            FROM norms n CROSS JOIN c{p} c),
        a{t} AS (
            SELECT vid, e, cid FROM (
                SELECT vid, e, cid,
                       row_number() OVER (PARTITION BY vid
                                          ORDER BY score DESC, cid) AS rn
                FROM s{t})
            WHERE rn = 1),
        m{t} AS (
            SELECT cid, pos, round(avg(e[pos]), 6) AS m
            FROM a{t}, UNNEST(generate_series(1, len(e))) AS u(pos)
            GROUP BY cid, pos),
        c{t} AS (
            SELECT p.cid, COALESCE(nn.c, p.c) AS c
            FROM c{p} p LEFT JOIN (
                SELECT cid, list(m ORDER BY pos) AS c
                FROM m{t} GROUP BY cid) nn USING (cid))"""


def _training_ctes(source_sql: str, k: int, iters: int) -> str:
    """Shared prefix: source -> norms -> md5-ranked init c0 -> unrolled
    Lloyd iterations ending at c{iters}."""
    parts = [
        f"""
        emb AS (
            SELECT vid, e::DOUBLE[] AS e FROM ({source_sql})),
        norms AS (
            SELECT vid, e, sqrt(list_dot_product(e, e)) AS ne FROM emb),
        c0 AS (
            SELECT CAST(rn - 1 AS INTEGER) AS cid, e AS c FROM (
                SELECT vid, e,
                       row_number() OVER (
                           ORDER BY md5(vid::VARCHAR), vid) AS rn
                FROM emb)
            WHERE rn <= {k})"""
    ]
    parts.extend(_iteration(t) for t in range(1, iters + 1))
    return ",".join(parts)


def _final_scores(iters: int) -> str:
    """Score every vector against the trained model c{iters}."""
    return f"""
        fs AS (
            SELECT n.vid, c.cid,
                   CASE WHEN n.ne * sqrt(list_dot_product(c.c, c.c)) = 0
                        THEN -2.0
                        ELSE list_dot_product(n.e, c.c)
                             / (n.ne * sqrt(list_dot_product(c.c, c.c)))
                   END AS score
            FROM norms n CROSS JOIN c{iters} c)"""


def kmeans_clusters_sql(
    source_sql: str, k: int, iters: int
) -> str:
    """Oracle for q85: per-cluster population + mean cosine cohesion.

    Mirrors q85's Spark aggregation exactly: the -2.0 zero-norm
    sentinel is excluded from cohesion (kept in n_vecs), per-row scores
    are rounded to 6 and summed as DECIMAL(28,6) (exact, order-free),
    and the mean is cast to double and rounded to 4.
    """
    return f"""
        WITH {_training_ctes(source_sql, k, iters)},
        {_final_scores(iters)},
        fa AS (
            SELECT vid, cid, score FROM (
                SELECT vid, cid, score,
                       row_number() OVER (PARTITION BY vid
                                          ORDER BY score DESC, cid) AS rn
                FROM fs)
            WHERE rn = 1)
        SELECT cid AS cluster,
               CAST(COUNT(*) AS BIGINT) AS n_vecs,
               round(
                   CASE WHEN COUNT(CASE WHEN score >= -1.0 THEN 1 END) > 0
                        THEN SUM(CASE WHEN score >= -1.0 THEN
                                 round(score, 6)::DECIMAL(28,6) END)::DOUBLE
                             / COUNT(CASE WHEN score >= -1.0 THEN 1 END)
                   END, 4) AS mean_cos
        FROM fa GROUP BY cid ORDER BY cluster
    """


def cluster_neardup_sql(
    source_sql: str, k: int, iters: int, probes: int, threshold: float
) -> str:
    """Oracle for q91: multi-probe cell assignment over the trained
    model -> same-cell candidate pairs (da < db) -> exact cosine verify
    of candidates only, cos >= threshold, rounded to 4.
    """
    return f"""
        WITH {_training_ctes(source_sql, k, iters)},
        {_final_scores(iters)},
        cells AS (
            SELECT DISTINCT vid, cid FROM (
                SELECT vid, cid,
                       row_number() OVER (PARTITION BY vid
                                          ORDER BY score DESC, cid) AS rn
                FROM fs)
            WHERE rn <= {probes}),
        cands AS (
            SELECT DISTINCT a.vid AS da, b.vid AS db
            FROM cells a JOIN cells b
              ON a.cid = b.cid AND a.vid < b.vid),
        pairs AS (
            SELECT c.da, c.db,
                   list_dot_product(na.e, nb.e) / (na.ne * nb.ne) AS cosv
            FROM cands c
            JOIN norms na ON na.vid = c.da
            JOIN norms nb ON nb.vid = c.db)
        SELECT da, db, round(cosv, 4) AS cos
        FROM pairs WHERE cosv >= {threshold}
        ORDER BY da, db
    """
