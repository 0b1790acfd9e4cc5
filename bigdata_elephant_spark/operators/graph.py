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
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
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
    for _ in range(iterations):
        contribs = (
            w.join(ranks, w["src"] == ranks["node"])
            .select("dst", (F.col("rank") * F.col("w")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(
                contribs, nodes["node"] == contribs["dst"], "left"
            )
            .select(
                "node",
                F.round(
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("inflow", F.lit(0.0)),
                    ROUND,
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks.select("node", F.round("rank", 6).alias("rank"))
