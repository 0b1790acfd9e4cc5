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


def test_bucket_determinism(emb_df):
    planes = similarity.hyperplanes(3, DIM)
    a = similarity.lsh_bucket_assignments(emb_df, planes).collect()
    b = similarity.lsh_bucket_assignments(emb_df, planes).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
