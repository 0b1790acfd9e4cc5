"""Behavioral tests for cosine top-k (exact + LSH) vs NumPy oracle."""

from __future__ import annotations

import numpy as np
import pytest

from bigdata_elephant_spark.operators import similarity

DIM = 8
N = 60


@pytest.fixture(scope="module")
def vectors():
    rng = np.random.default_rng(123)
    return rng.normal(size=(N, DIM)).astype(np.float32)


@pytest.fixture(scope="module")
def emb_df(spark, vectors):
    rows = [(i, [float(x) for x in vectors[i]]) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_matches_numpy(emb_df, vectors):
    got = similarity.cosine_topk(emb_df, query_vec_id=0, k=5).collect()
    v = vectors.astype(np.float64)
    sims = v @ v[0] / (np.linalg.norm(v, axis=1) * np.linalg.norm(v[0]))
    sims[0] = -np.inf
    expect = list(np.argsort(-sims)[:5])
    assert [r["vec_id"] for r in got] == expect
    for r in got:
        assert r["cos_sim"] == pytest.approx(sims[r["vec_id"]], abs=1e-6)


def test_cosine_topk_lsh_subset_of_bucket(emb_df, vectors):
    planes = similarity.hyperplanes(3, DIM)
    buckets = {
        r["vec_id"]: r["bucket"]
        for r in similarity.lsh_bucket_assignments(emb_df, planes).collect()
    }
    got = similarity.cosine_topk_lsh(emb_df, 0, planes, k=5).collect()
    # every result shares the query's bucket, ordered by true cosine
    assert all(buckets[r["vec_id"]] == buckets[0] for r in got)
    sims = [r["cos_sim"] for r in got]
    assert sims == sorted(sims, reverse=True)


def test_near_dup_lsh_subset_of_exact(emb_df):
    planes = similarity.hyperplanes(3, DIM)
    exact = {
        (r["id_a"], r["id_b"])
        for r in similarity.near_dup_pairs(emb_df, 0.2).collect()
    }
    bucketed = {
        (r["id_a"], r["id_b"])
        for r in similarity.near_dup_pairs(emb_df, 0.2, planes=planes).collect()
    }
    assert bucketed <= exact
    # random hyperplanes keep most high-cosine pairs in one bucket
    assert len(bucketed) > 0


def test_near_dup_pairs_canonical_order(emb_df):
    for r in similarity.near_dup_pairs(emb_df, 0.2).collect():
        assert r["id_a"] < r["id_b"]


def test_ivf_full_probe_equals_exact(emb_df):
    """Probing every cell makes IVF exact."""
    exact = similarity.cosine_topk(emb_df, 3, k=5).collect()
    ivf = similarity.ivf_topk(
        emb_df, 3, n_cells=8, n_probe=8, k=5
    ).collect()
    assert [(r["vec_id"], r["cos_sim"]) for r in ivf] == [
        (r["vec_id"], r["cos_sim"]) for r in exact
    ]


def test_ivf_assign_partitions_all_vectors(emb_df):
    cents = similarity.ivf_centroids(emb_df, 8)
    assigned = similarity.ivf_assign(emb_df, cents).collect()
    assert len(assigned) == N
    assert {r["cell_id"] for r in assigned} <= set(range(8))


def test_bucket_determinism(emb_df):
    planes = similarity.hyperplanes(3, DIM)
    a = similarity.lsh_bucket_assignments(emb_df, planes).collect()
    b = similarity.lsh_bucket_assignments(emb_df, planes).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
