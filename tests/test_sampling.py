"""Hash sampling: determinism, split disjointness, stratification."""

from __future__ import annotations

from bigdata_elephant_spark.operators import sampling
from bigdata_elephant_spark.sources.corpus import read_table


def test_hash_sample_deterministic_and_partition_stable(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    a = {r["doc_id"] for r in sampling.hash_sample(docs, "doc_id", 0.5).collect()}
    b = {r["doc_id"] for r in
         sampling.hash_sample(docs.repartition(13), "doc_id", 0.5).collect()}
    assert a == b  # repartitioning must not change membership
    n = docs.count()
    assert 0.35 * n < len(a) < 0.65 * n


def test_hash_sample_splits_are_disjoint_and_cover(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    train = {r["doc_id"] for r in sampling.hash_sample(docs, "doc_id", 0.8).collect()}
    val = {r["doc_id"] for r in
           sampling.hash_sample(docs, "doc_id", 0.1, offset=0.8).collect()}
    test = {r["doc_id"] for r in
            sampling.hash_sample(docs, "doc_id", 0.1, offset=0.9).collect()}
    assert not (train & val) and not (train & test) and not (val & test)
    assert len(train | val | test) == docs.count()


def test_stratified_hash_sample_respects_fractions(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    got = sampling.stratified_hash_sample(
        docs, "doc_id", "lang", {"en": 1.0}
    )
    langs = {r["lang"] for r in got.select("lang").distinct().collect()}
    assert langs <= {"en"}
