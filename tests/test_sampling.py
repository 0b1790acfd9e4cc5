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


def test_mixture_rebalance_up_and_down(spark):
    """Down-sampled strata keep a subset (every epoch == 1); up-
    sampled strata repeat docs with epochs as even as integers allow
    (copies differ by at most 1 across docs); per-stratum totals hit
    the target exactly; zero-weight strata drop."""
    from collections import Counter

    from bigdata_elephant_spark.operators.sampling import (
        mixture_rebalance,
    )

    rows = [(i, "big") for i in range(50)] + \
           [(i + 100, "small") for i in range(7)] + \
           [(i + 200, "unlisted") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, stratum string")
    out = mixture_rebalance(
        df, "stratum", {"big": 0.5, "small": 0.5}, 40, "doc_id"
    ).collect()
    by_stratum = Counter(r["stratum"] for r in out)
    assert by_stratum == {"big": 20, "small": 20}
    big_docs = Counter(
        r["doc_id"] for r in out if r["stratum"] == "big"
    )
    assert set(big_docs.values()) == {1}  # pure subset, no repeats
    small_docs = Counter(
        r["doc_id"] for r in out if r["stratum"] == "small"
    )
    # 20 rows over 7 docs: 6 docs x 3 epochs + 1 doc x 2 epochs
    assert sorted(small_docs.values()) == [2, 3, 3, 3, 3, 3, 3]
    for doc, n in small_docs.items():
        epochs = sorted(
            r["epoch"] for r in out
            if r["stratum"] == "small" and r["doc_id"] == doc
        )
        assert epochs == list(range(1, n + 1))


def test_hash_sample_float_boundary_offsets(spark, sf_dir):
    """Regression: offsets whose float sum lands just under a bucket
    boundary ((0.7+0.1)*10000 == 7999.999...) must not drop or
    double-count a bucket — the three splits partition the corpus."""
    from bigdata_elephant_spark.sources.corpus import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    a = {r["doc_id"] for r in
         sampling.hash_sample(docs, "doc_id", 0.7).collect()}
    b = {r["doc_id"] for r in
         sampling.hash_sample(docs, "doc_id", 0.1, offset=0.7).collect()}
    c = {r["doc_id"] for r in
         sampling.hash_sample(docs, "doc_id", 0.2, offset=0.8).collect()}
    everything = {r["doc_id"] for r in docs.collect()}
    assert a | b | c == everything
    assert not (a & b) and not (b & c) and not (a & c)
