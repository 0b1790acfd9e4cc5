"""Adversarially SKEWED fixtures — the regime the uniform driver
testdata never exercises (r9 verdict: "every fixture is uniform").

Three planted hazards, mirroring what a real web-scale corpus always
contains:

- one mega-duplicate cluster (the same text repeated ``DUP_COPIES``
  times — boilerplate / mirrored pages),
- one hot source (zipf-ish source distribution),
- one hot join/window key (one user owning half the event stream).

The dedup tests pin the round-10 mega-bucket guard with COUNTS, not
wall time (counts are the deterministic proxy for the plan's
asymptotics): the all-pairs miner emits Θ(copies²) candidate rows on
the cluster while ``lsh_candidate_edges`` emits copies−1 star edges —
and both miners' graphs close to IDENTICAL duplicate groups. The
join/window/aggregate tests assert the skewed key computes the same
answer as an independent formulation (correctness under skew; the
salted operators' scale story lives in operators/skew.py).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_elephant_spark.operators import dedup

DUP_COPIES = 400  # all-pairs => 79,800 pairs; star => 399 edges
N_UNIQUE = 40

_DUP_TEXT = (
    "breaking news wire syndicated boilerplate copyright notice all "
    "rights reserved subscribe to our newsletter for daily updates"
)


def _word(i: int) -> str:
    # letters only: the tokenizer drops all-digit tokens
    return "w" + "abcdefghij"[i % 10] + "klmnopqrst"[(i // 10) % 10] + (
        "uvwxy"[(i // 100) % 5]
    )


@pytest.fixture(scope="module")
def skewed_docs(spark):
    """Corpus with one DUP_COPIES-strong identical-text cluster, a
    planted near-dup pair, and N_UNIQUE distinct documents; source is
    zipf-ish (the cluster all comes from one hot source)."""
    rows = []
    for i in range(DUP_COPIES):
        rows.append((i, _DUP_TEXT, "hot_src", len(_DUP_TEXT)))
    base = 10_000
    for i in range(N_UNIQUE):
        words = " ".join(_word(7 * i + j) for j in range(12))
        text = f"document {words} tail marker {_word(i)}"
        rows.append((base + i, text, f"src{i % 5}", len(text)))
    # planted near-dup pair: same 12 words, one appended token
    nd = " ".join(_word(3 * k + 1) for k in range(12))
    t_a = f"shared prefix {nd} ending one"
    t_b = f"shared prefix {nd} ending one extra"
    rows.append((20_000, t_a, "src0", len(t_a)))
    rows.append((20_001, t_b, "src1", len(t_b)))
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    ).coalesce(4)


@pytest.fixture(scope="module")
def skewed_events(spark):
    """Event stream where user 0 owns ~half the rows (hot join and
    window key) and one event_type dominates."""
    n = 4_000
    df = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise((F.col("id") % 97) + 1)
        .alias("user_id"),
        F.when(F.col("id") % 10 < 7, F.lit("view"))
        .otherwise(F.lit("click"))
        .alias("event_type"),
        (F.col("id") % 1000).cast("double").alias("value"),
    )
    return df


# ------------------------------------------------ dedup under skew


def test_star_edges_linear_all_pairs_quadratic(spark, skewed_docs):
    """The guard's asymptotic claim as exact counts: the cluster
    costs copies−1 star edges, not copies·(copies−1)/2 pairs."""
    sigs = dedup.minhash_signatures(skewed_docs)
    edges = dedup.lsh_candidate_edges(sigs)
    n_edges = edges.count()
    # star edges for the cluster + a handful of rep-level edges
    assert n_edges < DUP_COPIES + 50
    star = edges.filter(F.col("doc_b") < DUP_COPIES)
    assert star.count() == DUP_COPIES - 1
    assert star.filter(F.col("est_sim") != 1.0).count() == 0
    assert star.filter(F.col("doc_a") != 0).count() == 0  # rep = min id

    # the old plan on the same corpus IS quadratic on the cluster
    pairs = dedup.lsh_candidate_pairs(sigs)
    n_pairs = pairs.count()
    assert n_pairs >= DUP_COPIES * (DUP_COPIES - 1) // 2


def test_star_edges_same_components_as_all_pairs(spark, skewed_docs):
    """Component preservation under the est_sim threshold — the
    contract that lets every groups consumer switch miners."""
    sigs = dedup.minhash_signatures(skewed_docs)
    thr = 0.5
    g_star = {
        (r.doc_id, r.group_id)
        for r in dedup.duplicate_groups(
            dedup.lsh_candidate_edges(sigs).filter(
                F.col("est_sim") >= thr
            )
        ).collect()
    }
    g_pairs = {
        (r.doc_id, r.group_id)
        for r in dedup.duplicate_groups(
            dedup.lsh_candidate_pairs(sigs).filter(
                F.col("est_sim") >= thr
            )
        ).collect()
    }
    assert g_star == g_pairs
    # the mega-cluster is one component rooted at doc 0
    assert {(i, 0) for i in range(DUP_COPIES)} <= g_star


def test_exact_dedup_map_collapses_cluster(spark, skewed_docs):
    cmap = dedup.exact_dedup_map(skewed_docs)
    assert cmap.count() == skewed_docs.count()  # every doc mapped
    cluster = cmap.filter(F.col("doc_id") < DUP_COPIES)
    assert (
        cluster.filter(F.col("canonical_doc_id") != 0).count() == 0
    )
    uniq = cmap.filter(F.col("doc_id") >= 10_000).filter(
        F.col("doc_id") < 20_000
    )
    assert (
        uniq.filter(F.col("doc_id") != F.col("canonical_doc_id")).count()
        == 0
    )


def test_dup_group_histogram_star_mined_on_cluster(spark, skewed_docs):
    """`dup_group_size_histogram` (r11: switched from
    `lsh_candidate_pairs` to the star-collapsed `lsh_candidate_edges`)
    only consumes the connected components, so on the mega-cluster
    corpus its input stays O(cluster) rows while the histogram is
    IDENTICAL to the all-pairs derivation — including the one
    DUP_COPIES-sized bucket."""
    from bigdata_elephant_spark.plans.pipeline_queries import (
        LSH_EST_SIM_MIN,
    )

    sigs = dedup.minhash_signatures(skewed_docs)

    def histogram(candidates):
        groups = dedup.duplicate_groups(
            candidates.filter(F.col("est_sim") >= LSH_EST_SIM_MIN)
        )
        sizes = groups.groupBy("group_id").agg(
            F.count("*").alias("group_size")
        )
        return {
            r.group_size: r.n_groups
            for r in sizes.groupBy("group_size")
            .agg(F.count("*").alias("n_groups"))
            .collect()
        }

    edges = dedup.lsh_candidate_edges(sigs)
    assert edges.count() < DUP_COPIES + 50  # linear input, not pairs
    h_star = histogram(edges)
    h_pairs = histogram(dedup.lsh_candidate_pairs(sigs))
    assert h_star == h_pairs
    assert h_star[DUP_COPIES] == 1  # the planted cluster, one group


def test_curate_pipeline_on_skewed_corpus(spark, skewed_docs):
    """The end-to-end chain survives the mega-cluster: at most one
    cluster member can be selected (the elected canonical), and the
    pipeline runs the collapsed miners (star edge count asserted
    above) rather than the quadratic all-pairs join."""
    from bigdata_elephant_spark.operators.curation import curate_pipeline

    sel = curate_pipeline(skewed_docs, frac_out=1.0).collect()
    cluster_sel = [r for r in sel if r.doc_id < DUP_COPIES]
    assert len(cluster_sel) <= 1


def test_incremental_edges_collapse_corpus_cluster(
    spark, skewed_docs
):
    """The daily-ingest guard: a new doc colliding with the
    mega-cluster yields ONE edge carrying n_members, where the pair
    API yields one row per member."""
    new_doc = spark.createDataFrame(
        [(50_000, _DUP_TEXT, "ingest", len(_DUP_TEXT))],
        "doc_id long, text string, source string, n_chars long",
    )
    new_sigs = dedup.minhash_signatures(new_doc)
    corpus_sigs = dedup.minhash_signatures(skewed_docs)
    edges = dedup.incremental_dedup_edges(
        new_sigs, corpus_sigs
    ).collect()
    hits = [r for r in edges if r.est_sim == 1.0]
    assert len(hits) == 1
    assert hits[0].corpus_rep_id == 0  # cluster representative
    assert hits[0].n_members == DUP_COPIES
    assert len(edges) < 10  # no fan-out by cluster size

    pairs = dedup.incremental_dedup_pairs(new_sigs, corpus_sigs)
    assert pairs.count() >= DUP_COPIES  # the unguarded fan-out


def test_semantic_dedup_edges_collapse_identical_vectors(spark):
    """The embedding-space twin of the star-edge guard: a planted
    cluster of bit-identical vectors (what exact-dup documents
    produce) costs copies−1 star edges in semantic_dedup_edges vs
    copies·(copies−1)/2 within-cell rows in semantic_dedup_pairs,
    with identical connected components."""
    import math

    from bigdata_elephant_spark.operators import similarity

    copies, dim = 300, 8
    hot = [1.0] * dim
    rows = [(i, hot) for i in range(copies)]
    for i in range(40):
        rows.append(
            (10_000 + i,
             [math.sin(0.7 * i + j) for j in range(dim)])
        )
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).coalesce(4)
    thr = 0.9
    edges = similarity.semantic_dedup_edges(emb, thr, n_cells=4)
    star = edges.filter(F.col("id_b") < copies)
    assert star.count() == copies - 1
    assert star.filter(F.col("id_a") != 0).count() == 0
    assert star.filter(F.col("cos_sim") != 1.0).count() == 0
    assert edges.count() < copies + 200  # no quadratic blowup

    pairs = similarity.semantic_dedup_pairs(emb, thr, n_cells=4)
    assert pairs.count() >= copies * (copies - 1) // 2

    def comps(df):
        return {
            (r.doc_id, r.group_id)
            for r in dedup.duplicate_groups(
                df.select("id_a", "id_b"), "id_a", "id_b"
            ).collect()
        }

    assert comps(edges) == comps(pairs)

    # the hyperplane-LSH miner behind the same collapse
    planes = similarity.hyperplanes(3, dim)
    nd_edges = similarity.near_dup_edges(emb, thr, planes=planes)
    nd_star = nd_edges.filter(F.col("id_b") < copies)
    assert nd_star.count() == copies - 1
    nd_pairs = similarity.near_dup_pairs(emb, thr, planes=planes)
    assert nd_pairs.count() >= copies * (copies - 1) // 2
    assert comps(nd_edges) == comps(nd_pairs)


def test_bucket_histogram_sees_the_mega_bucket(spark, skewed_docs):
    """The observability claim behind lsh_bucket_histogram: the
    planted cluster surfaces as exactly one sz=DUP_COPIES bucket in
    EVERY band — the pre-flight signal that all-pairs mining would
    cost sz²/2 per band — while every other bucket stays small."""
    from bigdata_elephant_spark.operators.dedup import (
        N_BANDS,
        N_MINHASH,
        _band_explode,
    )

    sigs = dedup.minhash_signatures(skewed_docs)
    bands = _band_explode(sigs, "doc_id", N_MINHASH, N_BANDS)
    sizes = bands.groupBy("band", "bkey").agg(
        F.count("*").alias("sz")
    )
    hist = (
        sizes.groupBy("band", "sz")
        .agg(F.count("*").alias("n_buckets"))
        .collect()
    )
    mega = [r for r in hist if r.sz >= DUP_COPIES]
    assert len(mega) == N_BANDS  # one per band
    assert all(r.sz == DUP_COPIES and r.n_buckets == 1 for r in mega)
    assert all(r.sz <= 3 for r in hist if r.sz < DUP_COPIES)


def test_graph_queries_on_reps_stay_linear(spark, skewed_docs):
    """The documented mitigation for the structure-sensitive graph
    analyses (pagerank_dupgraph, dupgraph_triangles): they NEED the
    all-pairs miner (a star is not a clique), so on a skewed corpus
    they run downstream of exact_dedup_map REPRESENTATIVES. Pinned
    here: the rep-level corpus mines O(reps²) candidate pairs — the
    mega-cluster contributes exactly one node — while the unguarded
    miner on the raw corpus is Θ(copies²) (asserted in
    test_star_edges_linear_all_pairs_quadratic)."""
    from bigdata_elephant_spark.operators.graph import (
        pagerank,
        triangle_counts,
    )

    cmap = dedup.exact_dedup_map(skewed_docs)
    reps = skewed_docs.join(
        cmap.filter(
            F.col("doc_id") == F.col("canonical_doc_id")
        ).select("doc_id"),
        "doc_id",
    )
    n_reps = reps.count()
    assert n_reps == 1 + N_UNIQUE + 2  # cluster -> one node

    pairs = dedup.lsh_candidate_pairs(
        dedup.minhash_signatures(reps)
    )
    n_pairs = pairs.count()
    assert n_pairs <= n_reps * (n_reps - 1) // 2  # O(reps²) bound
    assert n_pairs < DUP_COPIES  # nowhere near the Θ(copies²) regime
    # at most the elected canonical represents the cluster
    assert pairs.filter(
        (F.col("doc_a") < DUP_COPIES) & (F.col("doc_a") != 0)
    ).count() == 0

    # both consumers run end-to-end on the rep-level graph
    edges = pairs.select("doc_a", "doc_b")
    tri = triangle_counts(edges)
    assert tri.count() >= 0
    sym = edges.selectExpr(
        "doc_a AS src", "doc_b AS dst"
    ).union(edges.selectExpr("doc_b AS src", "doc_a AS dst"))
    pr = pagerank(sym)
    assert pr.count() == sym.select("src").distinct().count()


# --------------------------------------- joins/windows under skew


def test_salted_aggregate_on_hot_key(spark, skewed_events):
    from bigdata_elephant_spark.operators import skew

    direct = {
        (r.user_id, r.event_type): (r.n, round(r.s, 6))
        for r in skewed_events.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    salted = {
        (r.user_id, r.event_type): (r.n, round(r.s, 6))
        for r in skew.salted_aggregate(
            skewed_events,
            ["user_id", "event_type"],
            [F.count("*").alias("pn"), F.sum("value").alias("ps")],
            [F.sum("pn").alias("n"), F.sum("ps").alias("s")],
        ).collect()
    }
    assert salted == direct


def test_salted_join_on_hot_key(spark, skewed_events):
    from bigdata_elephant_spark.operators import skew

    dim = spark.range(98).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit("tier_"), (F.col("id") % 3)).alias("tier"),
    )
    direct = (
        skewed_events.join(dim, "user_id")
        .groupBy("tier")
        .agg(F.count("*").alias("n"))
    )
    salted = (
        skew.salted_join(skewed_events, dim, "user_id")
        .groupBy("tier")
        .agg(F.count("*").alias("n"))
    )
    assert {
        (r.tier, r.n) for r in direct.collect()
    } == {(r.tier, r.n) for r in salted.collect()}


def test_window_over_hot_partition(spark, skewed_events):
    """row_number over the hot user's 2000-row partition: dense,
    gapless, and consistent with the groupBy count (window results
    don't silently truncate on a skewed partition)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("event_id")
    rn = skewed_events.select(
        "user_id", F.row_number().over(w).alias("rn")
    )
    per_user_max = rn.groupBy("user_id").agg(
        F.max("rn").alias("mx"), F.count("*").alias("n")
    )
    assert per_user_max.filter(F.col("mx") != F.col("n")).count() == 0
    hot = per_user_max.filter(F.col("user_id") == 0).collect()[0]
    assert hot.n == 2_000
