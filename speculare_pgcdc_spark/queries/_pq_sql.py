"""DuckDB oracle SQL for the product-quantization ANN query (q126).

Follows the q85/q91 precedent (_kmeans_sql.py): the PQ trainer
(operators/similarity.pq_train -> _kmeans_l2) is deterministic by
construction — md5-ranked init, a FIXED number of Lloyd iterations,
6-decimal-rounded means, first-index (smallest-cid) tie-breaks, empty
clusters keeping the previous centroid — so the whole
train -> encode -> ADC-score -> exact-rerank pipeline unrolls into
staged CTEs whose arithmetic mirrors the Spark side step for step:

- the full vector is l2-normalized FIRST (l2_normalize: components
  become x / ||x||, null-guarded at norm <= 0), then sliced into m
  contiguous subspaces — both pq_train and pq_encode normalize, so
  training, encoding and the ADC table all see the same doubles;
- per-subspace L2 assignment is argmin of list_dot_product(d, d) with
  d = elementwise difference — the same left-to-right fold as Spark's
  ``aggregate(zip_with(x-y)*(x-y))``; ties resolve to the smallest
  cid in both engines;
- the ADC lookup value is dot(q_sub_j, codeword) — Spark computes it
  driver-side as a left-to-right Python-float sum, DuckDB as
  list_dot_product: both IEEE double, same order;
- the per-row ADC score sums the m looked-up values left-to-right
  (Spark: aggregate fold seeded 0.0; SQL: ``((t0+t1)+t2)+t3``);
- the candidate cut is ORDER BY adc DESC, vid LIMIT cf*k — bitwise
  comparable because every upstream double matched — and the final
  answer re-ranks candidates by EXACT cosine rounded to 4, so any
  residual sub-ulp risk is confined to the pool boundary, not the
  reported scores.

The reference has no vector surface; this backs SURVEY §2D's PQ row
and retires q126's ``err: no_oracle`` driver slot (r6 verdict item 2).
"""

from __future__ import annotations


def _subspace_training(j: int, sub: int, k: int, iters: int) -> str:
    """CTEs training subspace ``j``: slice -> md5-ranked init c{j}0 ->
    unrolled Lloyd iterations ending at c{j}{iters}."""
    a, b = j * sub + 1, (j + 1) * sub
    parts = [
        f"""
        sub{j} AS (
            SELECT vid, ne[{a}:{b}] AS s FROM norms),
        c{j}0 AS (
            SELECT CAST(rn - 1 AS INTEGER) AS cid, ne[{a}:{b}] AS c
            FROM init WHERE rn <= {k})"""
    ]
    for t in range(1, iters + 1):
        p = t - 1
        parts.append(f"""
        d{j}{t} AS (
            SELECT n.vid, n.s, c.cid,
                   list_transform(generate_series(1, {sub}),
                                  i -> n.s[i] - c.c[i]) AS d
            FROM sub{j} n CROSS JOIN c{j}{p} c),
        a{j}{t} AS (
            SELECT vid, s, cid FROM (
                SELECT vid, s, cid,
                       row_number() OVER (
                           PARTITION BY vid
                           ORDER BY list_dot_product(d, d), cid) AS rn
                FROM d{j}{t})
            WHERE rn = 1),
        m{j}{t} AS (
            SELECT cid, pos, round(avg(s[pos]), 6) AS m
            FROM a{j}{t}, UNNEST(generate_series(1, {sub})) AS u(pos)
            GROUP BY cid, pos),
        c{j}{t} AS (
            SELECT p.cid, COALESCE(nn.c, p.c) AS c
            FROM c{j}{p} p LEFT JOIN (
                SELECT cid, list(m ORDER BY pos) AS c
                FROM m{j}{t} GROUP BY cid) nn USING (cid))""")
    return ",".join(parts)


def _subspace_encode(j: int, sub: int, iters: int) -> str:
    """CTEs encoding every vector in subspace ``j`` (nearest codeword
    of the TRAINED book, argmin L2, smallest-cid ties) and the ADC
    lookup table t{j} (dot of the normalized query slice with each
    codeword)."""
    a, b = j * sub + 1, (j + 1) * sub
    return f"""
        de{j} AS (
            SELECT n.vid, c.cid,
                   list_transform(generate_series(1, {sub}),
                                  i -> n.s[i] - c.c[i]) AS d
            FROM sub{j} n CROSS JOIN c{j}{iters} c),
        e{j} AS (
            SELECT vid, cid AS k{j} FROM (
                SELECT vid, cid,
                       row_number() OVER (
                           PARTITION BY vid
                           ORDER BY list_dot_product(d, d), cid) AS rn
                FROM de{j})
            WHERE rn = 1),
        t{j} AS (
            SELECT c.cid, list_dot_product(q.qs, c.c) AS v
            FROM c{j}{iters} c
            CROSS JOIN (SELECT qn[{a}:{b}] AS qs FROM qnorm) q)"""


def pq_ann_sql(
    m: int = 4,
    k: int = 8,
    iters: int = 1,
    topk: int = 5,
    candidate_factor: int = 8,
    dim: int = 64,
    query_vid: int = 0,
) -> str:
    """Full q126 oracle: train m codebooks, encode, ADC-rank the
    candidate pool, exact-cosine re-rank to the final top-k."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    train = ",".join(_subspace_training(j, sub, k, iters) for j in range(m))
    encode = ",".join(_subspace_encode(j, sub, iters) for j in range(m))
    code_joins = " ".join(
        f"JOIN e{j} USING (vid)" for j in range(1, m)
    )
    tbl_joins = " ".join(
        f"JOIN t{j} ON t{j}.cid = e{j}.k{j}" for j in range(m)
    )
    # left-to-right sum, exactly Spark's aggregate fold over m entries
    adc_sum = " + ".join(f"t{j}.v" for j in range(m))
    return f"""
        WITH emb AS (
            SELECT vec_id AS vid, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings WHERE vec_id <> {query_vid}),
        qraw AS (
            SELECT CAST(embedding AS DOUBLE[]) AS q0
            FROM embeddings WHERE vec_id = {query_vid}),
        qnorm AS (
            -- pq_topk normalizes the query DRIVER-side with `or 1.0`
            -- on a zero norm (not the l2_normalize null guard)
            SELECT list_transform(
                       q0, x -> x / CASE WHEN
                           sqrt(list_dot_product(q0, q0)) = 0
                           THEN 1.0
                           ELSE sqrt(list_dot_product(q0, q0)) END)
                   AS qn
            FROM qraw),
        norms AS (
            SELECT vid,
                   list_transform(
                       e, x -> x / CASE WHEN
                           sqrt(list_dot_product(e, e)) > 0
                           THEN sqrt(list_dot_product(e, e)) END) AS ne
            FROM emb),
        init AS (
            SELECT vid, ne,
                   row_number() OVER (
                       ORDER BY md5(vid::VARCHAR), vid) AS rn
            FROM norms),
        {train},
        {encode},
        adc AS (
            SELECT e0.vid, {adc_sum} AS adcv
            FROM e0 {code_joins} {tbl_joins}),
        cand AS (
            SELECT vid FROM adc
            ORDER BY adcv DESC, vid LIMIT {candidate_factor * topk}),
        rerank AS (
            SELECT n.vid,
                   ROUND(list_dot_product(n.ne, q.q0)
                         / (sqrt(list_dot_product(n.ne, n.ne))
                            * sqrt(list_dot_product(q.q0, q.q0))), 4)
                       AS cos
            FROM norms n JOIN cand USING (vid) CROSS JOIN qraw q)
        SELECT vid AS vec_id, cos FROM rerank
        ORDER BY cos DESC, vec_id LIMIT {topk}
    """
