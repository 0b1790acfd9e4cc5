"""PageRank sanity on hand-analyzable graphs."""

from __future__ import annotations

import pytest

from bigdata_elephant_spark.operators.graph import pagerank


def test_pagerank_symmetric_cycle_uniform(spark):
    # 3-cycle both directions: perfect symmetry => uniform ranks
    edges = spark.createDataFrame(
        [(a, b) for a, b in [(1, 2), (2, 3), (3, 1), (2, 1), (3, 2), (1, 3)]],
        "src long, dst long",
    )
    ranks = {r["node"]: r["rank"] for r in pagerank(edges).collect()}
    assert set(ranks) == {1, 2, 3}
    assert all(v == pytest.approx(1 / 3, abs=1e-6) for v in ranks.values())


def test_pagerank_star_center_dominates(spark):
    # leaves all point at the hub (and hub points back)
    leaves = list(range(2, 8))
    pairs = [(leaf, 1) for leaf in leaves] + [(1, leaf) for leaf in leaves]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    ranks = {r["node"]: r["rank"] for r in pagerank(edges).collect()}
    hub = ranks.pop(1)
    assert all(hub > v for v in ranks.values())
    assert sum(ranks.values()) + hub == pytest.approx(1.0, abs=1e-4)


def test_triangle_counts_known_graph(spark):
    """K4 on {1,2,3,4} (4 triangles, each node in 3) plus a pendant
    edge 4-5 (no triangle) plus an isolated edge 6-7."""
    from bigdata_elephant_spark.operators.graph import triangle_counts

    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (6, 7)]
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {r["doc_id"]: r["n_triangles"]
           for r in triangle_counts(pairs).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_pagerank_dangling_conserves_mass(spark):
    """A chain 1->2->3 (node 3 dangles): without handling, mass
    leaks every round; with handle_dangling=True total rank stays 1
    and matches a hand-computed reference iteration."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3)], "src long, dst long"
    )
    leaky = {r["node"]: r["rank"]
             for r in pagerank(edges, iterations=5).collect()}
    assert sum(leaky.values()) < 0.999  # the documented leak
    fixed = {
        r["node"]: r["rank"]
        for r in pagerank(
            edges, iterations=5, handle_dangling=True
        ).collect()
    }
    assert sum(fixed.values()) == pytest.approx(1.0, abs=1e-5)
    # hand-rolled synchronous updates with redistribution
    d, n = 0.85, 3
    ranks = {1: round(1 / n, 9), 2: round(1 / n, 9), 3: round(1 / n, 9)}
    for _ in range(5):
        dm = ranks[3]
        ranks = {
            1: round((1 - d) / n + d * (0.0 + dm / n), 9),
            2: round((1 - d) / n + d * (ranks[1] + dm / n), 9),
            3: round((1 - d) / n + d * (ranks[2] + dm / n), 9),
        }
    for node, r in ranks.items():
        assert fixed[node] == pytest.approx(round(r, 6), abs=2e-6)


def test_triangle_counts_degree_ordered_equivalent(spark):
    """Degree-ordered orientation changes cost, never counts: both
    forms agree on a graph with hubs, chains, ties and isolates."""
    from bigdata_elephant_spark.operators.graph import triangle_counts

    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (5, 6), (4, 6), (6, 7), (8, 9),
             (1, 5), (2, 6), (7, 9), (7, 8)]
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    base = {r["doc_id"]: r["n_triangles"]
            for r in triangle_counts(pairs).collect()}
    deg = {r["doc_id"]: r["n_triangles"]
           for r in triangle_counts(
               pairs, degree_ordered=True).collect()}
    assert base == deg
    assert base[1] == 4 and base[4] == 6


def test_pagerank_round_frame_is_one_production_iteration(spark):
    """The plan-audit round frame (pagerank_round_frame) IS one
    production iteration: rounding its 9-decimal ranks to the output
    precision reproduces pagerank(iterations=1) exactly — so the
    plan PLANS.md dumps is the plan production runs, not a lookalike."""
    from pyspark.sql import functions as F

    from bigdata_elephant_spark.operators.graph import (
        pagerank,
        pagerank_round_frame,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1)],
        "src long, dst long",
    )
    got = {
        (r.node, r.rank)
        for r in pagerank_round_frame(edges)
        .select("node", F.round("rank", 6).alias("rank"))
        .collect()
    }
    want = {
        (r.node, r.rank)
        for r in pagerank(edges, iterations=1).collect()
    }
    assert got == want
    # and the empty-edge graph returns the typed empty frame, like
    # pagerank (r12 ANSI-division audit)
    empty = spark.createDataFrame([], "src long, dst long")
    out = pagerank_round_frame(empty)
    assert out.count() == 0 and out.columns == ["node", "rank"]


def test_pagerank_driver_path_equals_distributed(spark):
    """The size-gated driver fast path (_pr_driver) reproduces the
    distributed loop exactly on non-dangling graphs (both paths are
    deterministic, so exact float equality is a stable pin);
    driver_max_edges=0 forces the distributed loop."""
    import random

    from bigdata_elephant_spark.operators.graph import pagerank

    rng = random.Random(7)
    rand_edges = [
        (rng.randrange(0, 40), rng.randrange(0, 40)) for _ in range(120)
    ]
    cases = [
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1)],  # cycle + tail
        rand_edges,                                # fixed-seed random
        [(i, i + 1) for i in range(25)],           # long chain
    ]
    for rows in cases:
        edges = spark.createDataFrame(rows, "src long, dst long")
        fast = {
            (r.node, r.rank)
            for r in pagerank(edges, iterations=5).collect()
        }
        slow = {
            (r.node, r.rank)
            for r in pagerank(
                edges, iterations=5, driver_max_edges=0
            ).collect()
        }
        assert fast == slow, rows[:5]


def test_pagerank_driver_rounding_fuzz_across_gate(spark):
    """r14 ADVICE: the driver twin rounds via Decimal(repr(x)) to
    mirror Spark Round's BigDecimal.valueOf(shortest-repr) semantics;
    keep the empirical pin honest with a seed-swept random-graph
    comparison across the gate (exact float equality, both paths
    deterministic). Graphs include dangling nodes (no correction —
    handle_dangling stays False, the only driver-wired mode)."""
    import random

    from bigdata_elephant_spark.operators.graph import pagerank

    for seed in range(6):
        rng = random.Random(100 + seed)
        n_nodes = rng.choice([7, 19, 53])
        rows = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(rng.choice([10, 60, 150]))
        ]
        edges = spark.createDataFrame(rows, "src long, dst long")
        fast = {
            (r.node, r.rank)
            for r in pagerank(edges, iterations=4).collect()
        }
        slow = {
            (r.node, r.rank)
            for r in pagerank(
                edges, iterations=4, driver_max_edges=0
            ).collect()
        }
        assert fast == slow, (seed, n_nodes, rows[:5])


def test_pagerank_dangling_keeps_distributed_path(spark):
    """handle_dangling=True never takes the driver path (the dm/n
    correction makes 6-decimal HALF_UP rounding summation-order
    sensitive — see _pr_driver docstring): the result plan must NOT
    be a LocalRelation."""
    from bigdata_elephant_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    out = pagerank(edges, iterations=2, handle_dangling=True)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LocalRelation" not in plan
