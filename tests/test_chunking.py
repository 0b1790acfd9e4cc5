"""Behavioral tests for training-data assembly operators."""

from __future__ import annotations

import pytest

from bigdata_elephant_spark.operators import chunking


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        (0, "a" * 1234),
        (1, "short doc"),
        (2, ""),
        (3, "x " * 600),            # 600 tokens
        (4, "mail me at bob@example.com or 123456789 now"),
        (5, "word " * 50),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunks_cover_text_with_overlap(docs_df):
    out = chunking.chunk_documents(
        docs_df, chunk_size=500, overlap=100
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: len 1234 -> starts 1, 401, 801 -> 3 chunks covering all
    c0 = sorted(by_doc[0], key=lambda r: r["chunk_id"])
    assert [r["chunk_id"] for r in c0] == [0, 1, 2]
    assert [r["chunk_len"] for r in c0] == [500, 500, 434]
    # consecutive chunks overlap by exactly 100 chars
    assert c0[0]["chunk"][-100:] == c0[1]["chunk"][:100]
    # short and empty docs produce exactly one chunk
    assert len(by_doc[1]) == 1 and by_doc[1][0]["chunk"] == "short doc"
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_len"] == 0


def test_pack_sequences_bins_are_contiguous_and_bounded(spark):
    rows = [(i, "tok " * 100) for i in range(200)]  # 100 tokens each
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunking.pack_sequences(
        docs, capacity=1000, n_shards=4
    ).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) == {0, 1, 2, 3}
    for shard, rs in by_shard.items():
        rs = sorted(rs, key=lambda r: r["doc_id"])
        # bins increase monotonically along the shard order...
        bins = [r["bin_in_shard"] for r in rs]
        assert bins == sorted(bins)
        # ...and every bin's pre-assignment cumsum stays < capacity
        # (10 docs of 100 tokens per 1000-capacity bin)
        from collections import Counter

        per_bin = Counter(bins)
        assert all(v == 10 for v in per_bin.values())


def test_shuffle_assignments_is_deterministic_permutation(docs_df):
    a = chunking.shuffle_assignments(docs_df, n_shards=4, seed="s1")
    b = chunking.shuffle_assignments(docs_df, n_shards=4, seed="s1")
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb  # reproducible
    # every doc appears exactly once; positions are dense per shard
    assert len(ra) == docs_df.count()
    by_shard = {}
    for doc_id, shard, pos in ra:
        by_shard.setdefault(shard, []).append(pos)
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # a different seed reshuffles (at least one doc moves)
    c = sorted(
        map(tuple, chunking.shuffle_assignments(
            docs_df, n_shards=4, seed="s2"
        ).collect())
    )
    assert c != ra


def test_redact_pii_counts_and_scrubs(docs_df, spark):
    out = {r["doc_id"]: r for r in chunking.redact_pii(docs_df).collect()}
    assert out[4]["n_emails"] == 1
    assert out[4]["n_long_numbers"] == 1
    assert out[0]["n_emails"] == 0
    # the hash equals md5 of the scrubbed text
    import hashlib

    expect = hashlib.md5(
        b"mail me at <EMAIL> or <NUM> now"
    ).hexdigest()
    assert out[4]["clean_hash"] == expect
