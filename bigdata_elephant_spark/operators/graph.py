"""Iterative graph algorithms over pair/edge DataFrames.

Connected components lives in dedup.py (duplicate_groups); here is
PageRank — the canonical "iterative joins at scale" workload. Each
iteration is one join (ranks ⋈ edges) + one aggregation; lineage is
truncated per round with ``localCheckpoint`` (without it the plan
doubles every iteration); ranks are rounded to 9 decimals each round
so the float state stays engine-replayable (summation order inside
one round differs between engines; rounding re-synchronizes before
drift can reach the comparison precision).

At 100 TB: edges are the big table — they shuffle ONCE per iteration
keyed by src (a fixed partitioning that a bucketed edge table turns
into zero shuffles); ranks are node-sized. Dangling nodes (no
out-edges) leak mass like in the classic formulation; handle by
adding self-loops upstream if mass conservation matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROUND = 9


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """``(node, rank)`` after ``iterations`` synchronous updates.

    rank_0 = 1/N;
    rank_{i+1}(v) = (1-d)/N + d * Σ_{u→v} rank_i(u) / outdeg(u).
    """
    # Materialize the edge list ONCE before it fans out into nodes,
    # outdeg and w — edges typically arrive as an expensive pipeline
    # (LSH pair mining) that would otherwise re-execute per branch.
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    # edge weight = 1/outdeg(src), fixed across iterations
    w = (
        e.join(outdeg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w"))
        .localCheckpoint()
    )
    base = float(1.0 - damping) / n
    ranks = nodes.select(
        "node", F.round(F.lit(1.0 / n), ROUND).alias("rank")
    ).localCheckpoint()
    for i in range(iterations):
        contribs = (
            w.join(ranks, w["src"] == ranks["node"])
            .select("dst", (F.col("rank") * F.col("w")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = nodes.join(
            contribs, nodes["node"] == contribs["dst"], "left"
        ).select(
            "node",
            F.round(
                F.lit(base)
                + F.lit(damping) * F.coalesce("inflow", F.lit(0.0)),
                ROUND,
            ).alias("rank"),
        )
        # Each rank table is consumed exactly once by the next
        # iteration, so nothing recomputes without a checkpoint;
        # lineage only DEEPENS (2 joins/iteration — linear, unlike
        # the exponential growth in label propagation). Truncate
        # every other round: half the materialization jobs, while
        # the plan never grows past ~4 join levels.
        if i % 2 == 1 or i == iterations - 1:
            ranks = ranks.localCheckpoint()
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def triangle_counts(pairs: DataFrame) -> DataFrame:
    """Per-node triangle counts over an undirected edge list given as
    canonical ``(doc_a < doc_b)`` pairs.

    Compact-forward algorithm: with every edge stored once in id
    order, each triangle {x < y < z} is found exactly once as the
    wedge (x-y, y-z) closed by the edge (x-z) — two equi-joins, no
    double counting, no post-dedup. Per-node counts come from
    exploding each triangle's three corners into one groupBy.

    At 100 TB: the wedge join fans out by the square of the hottest
    node's *forward* degree. Id-ordering is used here because the
    oracle must replay it exactly; production would rank nodes by
    (degree, id) first — same joins, provably minimal wedge count —
    at the cost of a degree computation. Both shuffles key on node
    ids; skew follows the dup-cluster size, which upstream LSH
    already caps per band.
    """
    e1 = pairs.select(
        F.col("doc_a").alias("x"), F.col("doc_b").alias("y")
    )
    e2 = pairs.select(
        F.col("doc_a").alias("y2"), F.col("doc_b").alias("z")
    )
    e3 = pairs.select(
        F.col("doc_a").alias("x3"), F.col("doc_b").alias("z3")
    )
    tri = (
        e1.join(e2, F.col("y") == F.col("y2"))
        .join(
            e3,
            (F.col("x") == F.col("x3")) & (F.col("z") == F.col("z3")),
            "left_semi",
        )
        .select("x", "y", "z")
    )
    corners = tri.select(
        F.explode(F.array("x", "y", "z")).alias("doc_id")
    )
    return (
        corners.groupBy("doc_id")
        .agg(F.count("*").alias("n_triangles"))
        .orderBy("doc_id")
    )
