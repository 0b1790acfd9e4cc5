"""Curation operators: surprisal banding, source overlap,
token-budget selection, embedding outliers."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from bigdata_elephant_spark.operators import curation
from bigdata_elephant_spark.sources.corpus import read_table


def test_surprisal_scores_match_bruteforce(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="aa bb aa"),
            Row(doc_id=2, text="bb cc"),
        ]
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_surprisal"])
        for r in curation.unigram_surprisal_scores(docs).collect()
    }
    # corpus counts: aa=2, bb=2, cc=1, total=5
    s = {
        w: round(math.log(5) - math.log(c), 6)
        for w, c in {"aa": 2, "bb": 2, "cc": 1}.items()
    }
    exp1 = round((2 * s["aa"] + s["bb"]) / 3, 6)
    exp2 = round((s["bb"] + s["cc"]) / 2, 6)
    assert got[1] == (3, exp1)
    assert got[2] == (2, exp2)


def test_band_sample_bands_partition_into_quartiles(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    out = curation.surprisal_band_sample(
        docs, fractions={0: 1.0, 1: 1.0, 2: 1.0, 3: 1.0}
    )
    counts = {
        r["band"]: r["n"]
        for r in out.groupBy("band").agg(F.count("*").alias("n")).collect()
    }
    n = docs.count()
    assert sum(counts.values()) == n  # keep-all fractions: a partition
    # each band holds ~n/4 (value ties can shift a boundary slightly)
    for b in (0, 1, 2, 3):
        assert 0.15 * n < counts[b] < 0.35 * n
    # band order respects score order
    rows = out.select("band", "avg_surprisal").collect()
    max_per_band: dict[int, float] = {}
    min_per_band: dict[int, float] = {}
    for r in rows:
        max_per_band[r["band"]] = max(
            max_per_band.get(r["band"], -1e9), r["avg_surprisal"]
        )
        min_per_band[r["band"]] = min(
            min_per_band.get(r["band"], 1e9), r["avg_surprisal"]
        )
    for b in (0, 1, 2):
        assert max_per_band[b] <= min_per_band[b + 1]


def test_band_sample_membership_is_partition_stable(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    a = {r["doc_id"] for r in curation.surprisal_band_sample(docs).collect()}
    b = {
        r["doc_id"]
        for r in curation.surprisal_band_sample(
            docs.repartition(17)
        ).collect()
    }
    assert a == b


def test_source_overlap_known_counts(spark):
    # src A: shingles of "a b c d" -> {a b c, b c d}
    # src B: shingles of "b c d e" -> {b c d, c d e}; common = {b c d}
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c d", source="A"),
            Row(doc_id=2, text="b c d e", source="B"),
        ]
    )
    rows = curation.source_overlap_matrix(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["src_a"], r["src_b"]) == ("A", "B")
    assert (r["n_a"], r["n_b"], r["n_common"]) == (2, 2, 1)
    assert r["jaccard"] == round(1 / 3, 6)


def test_source_overlap_no_shared_shingles_emits_nothing(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c", source="A"),
            Row(doc_id=2, text="x y z", source="B"),
        ]
    )
    assert curation.source_overlap_matrix(docs).count() == 0


def test_token_budget_greedy_and_maximal(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    budget = 800
    sel = curation.token_budget_selection(docs, budget).collect()
    by_src: dict[str, list] = {}
    for r in sel:
        by_src.setdefault(r["source"], []).append(r)
    assert by_src  # something selected
    for src, rows in by_src.items():
        rows.sort(key=lambda r: (-r["n_tokens"], r["doc_id"]))
        cum = 0
        for r in rows:
            cum += r["n_tokens"]
            assert r["cum_tokens"] == cum
        assert cum <= budget
    # maximality: the next (longest unselected) doc would bust the
    # budget for at least the sources that stopped early
    toks = {
        (r["source"], r["doc_id"]): r["n_tokens"]
        for r in docs.select(
            "source",
            "doc_id",
            F.size(
                curation.tokens_array("text")
            ).alias("n_tokens"),
        ).collect()
    }
    for src, rows in by_src.items():
        chosen = {r["doc_id"] for r in rows}
        cum = sum(r["n_tokens"] for r in rows)
        rest = sorted(
            (
                (-n, d)
                for (s, d), n in toks.items()
                if s == src and d not in chosen
            ),
        )
        if rest:
            nxt = -rest[0][0]
            assert cum + nxt > budget


def test_embedding_outliers_flags_planted_outlier(spark):
    base = [
        Row(vec_id=i, label=0, embedding=[1.0, 0.0, float(i % 2) * 0.01])
        for i in range(20)
    ]
    planted = [Row(vec_id=99, label=0, embedding=[-5.0, 8.0, 3.0])]
    emb = spark.createDataFrame(base + planted)
    out = curation.embedding_outliers(emb, n_sigma=2.0).collect()
    assert 99 in {r["vec_id"] for r in out}
    for r in out:
        assert r["dist"] > r["threshold"]


def test_embedding_outliers_uniform_cluster_has_none(spark):
    emb = spark.createDataFrame(
        [Row(vec_id=i, label=0, embedding=[1.0, 2.0]) for i in range(10)]
    )
    assert curation.embedding_outliers(emb).count() == 0


def test_gram_matrix_ignores_empty_embeddings(spark, tmp_path):
    """An empty embedding array must contribute nothing: Spark's
    sequence(0, -1) yields the DESCENDING [0, -1], which without the
    size guard would emit spurious i/j rows with null products that
    the DuckDB oracle (range-based, empty on len 0) never produces."""
    import pandas as pd

    from bigdata_elephant_spark.plans.curation_queries import (
        q_embedding_gram_matrix,
    )

    d = str(tmp_path)
    pd.DataFrame(
        {
            "vec_id": [1, 2, 3],
            "embedding": [
                [1.0, 2.0],
                [],            # must be skipped entirely
                [3.0, 4.0],
            ],
            "label": [0, 0, 0],
        }
    ).to_parquet(f"{d}/embeddings.parquet")
    rows = q_embedding_gram_matrix(spark, d).collect()
    got = {(r["i"], r["j"]): r["gram"] for r in rows}
    # dim 2 -> exactly the 3 upper-triangle cells, no null-product rows
    assert set(got) == {(0, 0), (0, 1), (1, 1)}
    assert got[(0, 0)] == 1.0 + 9.0
    assert got[(0, 1)] == 2.0 + 12.0
    assert got[(1, 1)] == 4.0 + 16.0
    assert all(r["gram"] is not None for r in rows)
