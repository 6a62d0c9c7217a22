"""Iterative graph algorithms on DataFrames — PageRank with a fixed
iteration count, the canonical "driver loop over distributed joins"
shape (same execution pattern as the k-means trainer in
operators/similarity.py and the min-label propagation in
operators/dedup.py: the LOOP runs on the driver but touches only
DataFrame lineage; all data movement is joins + aggregations).

Determinism contract (what makes a DuckDB oracle possible, mirroring
_kmeans_sql.py): every iteration's rank is rounded to ``round_dp``
decimals, per-edge contributions are cast to DECIMAL(28,18) before the
incoming-edge sum (decimal addition is exact and order-independent, so
shuffle order can't perturb the result), and the damping update is a
pure double expression over those identical inputs. Unrolling the same
iterations as staged CTEs reproduces the exact bits on any engine.

Scale shape: per iteration, one equi-join of edges to the rank frame
(shuffles on src — with edges pre-partitioned by src the partitioning
is reused every round) + one hash agg on dst. Rank/degree frames are
node-bounded. localCheckpoint per round truncates the lineage so the
plan doesn't grow with iteration count (the classic iterative-Spark
trap). No driver-side data movement at all — only the loop counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    round_dp: int = 12,
) -> DataFrame:
    """PageRank over a directed edge list (``src``, ``dst``), returning
    (node, rank) for every node that appears as a source.

    Assumes every node has at least one outgoing edge (callers with
    dangling nodes should bidirect or self-loop first — the bipartite
    customer/supplier graph in q121 bidirects), so rank mass is
    conserved up to the per-iteration rounding.
    """
    edges = edges.select("src", "dst").localCheckpoint(eager=False)
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n_df = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    ranks = nodes.join(F.broadcast(n_df)).select(
        "node",
        F.round(F.lit(1.0) / F.col("n_nodes"), round_dp).alias("rank"),
    )
    for _ in range(iters):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("out_deg"))
                .cast("decimal(28,18)")
                .alias("c"),
            )
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (
            sums.join(F.broadcast(n_df))
            .select(
                "node",
                F.round(
                    F.lit(1.0 - damping) / F.col("n_nodes")
                    + F.lit(damping) * F.col("s").cast("double"),
                    round_dp,
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def kcore(
    edges: DataFrame,
    k: int,
    max_iters: int = 30,
) -> tuple[DataFrame, int]:
    """K-core of an undirected graph: the (unique, maximal) subgraph
    in which every node has degree >= k — the standard density filter
    before community detection and the robustness audit behind
    "how much of this graph survives removing the periphery".

    ``edges`` carries one row per undirected edge as (ua, ub) with
    ua < ub (the q267 convention). Returns (core_edges, n_iters):
    the surviving edge set and how many peeling rounds ran.

    Algorithm: iterative peeling — drop every node with current
    degree < k, restrict the edge set, repeat to fixed point. Each
    round is ONE degree aggregate + two semi-joins, all keyed on the
    node id; the driver loop carries only per-round edge COUNTS
    (the q121/kmeans bounded-driver-loop convention) and stops at
    the fixed point, bounded by ``max_iters``. Rounds needed equal
    the longest peel chain — small for real (power-law) graphs;
    every intermediate edge set is localCheckpointed so lineage
    stays constant-depth.

    Correctness invariants (pinned in tests/test_plans.py-adjacent
    suites rather than a SQL oracle — recursive peeling is not
    expressible as a single DuckDB query): (a) every core node has
    >= k neighbors INSIDE the core; (b) no removed node has >= k
    neighbors in the core (degrees only shrink while peeling, so
    such a node could never have been removed) — together these are
    exactly the k-core's defining maximality."""
    if max_iters < 1:
        # zero rounds can never certify a fixed point, and the
        # non-convergence message below reads the last round's counts
        raise ValueError(f"kcore: max_iters must be >= 1, got {max_iters}")
    cur = edges.select("ua", "ub").localCheckpoint(eager=True)
    n_prev = cur.count()
    iters = 0
    converged = False
    n_before = n_prev  # edge count entering the most recent round
    n_next = n_prev
    for _ in range(max_iters):
        n_before = n_prev
        deg = (
            cur.select(F.col("ua").alias("u"))
            .unionAll(cur.select(F.col("ub").alias("u")))
            .groupBy("u")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg.filter(F.col("d") >= k).select("u")
        nxt = (
            cur.join(
                keep.select(F.col("u").alias("ua")), "ua", "left_semi"
            )
            .join(
                keep.select(F.col("u").alias("ub")), "ub", "left_semi"
            )
            .localCheckpoint(eager=True)
        )
        n_next = nxt.count()
        iters += 1
        cur = nxt
        if n_next == n_prev:
            converged = True
            break
        n_prev = n_next
    if not converged:
        # An edge set that is still shrinking when max_iters runs out
        # is NOT a k-core (some node may have degree < k): publishing
        # it would violate the defining invariant with no signal, so
        # truncation is an error, not a result.
        raise RuntimeError(
            f"kcore(k={k}) did not reach a fixed point within "
            f"{max_iters} peeling rounds ({n_before} -> {n_next} edges "
            "in the last round); raise max_iters"
        )
    return cur, iters
