"""End-to-end search pipeline on a tiny hand-computed corpus.

Golden scores computed by hand from the reference's F3 semantics:
``score = sum_w (tf_doc / df) * (tf_query / df)`` (``Query.java:113-115``).
"""

from __future__ import annotations

import pytest

from bigdata_elephant_spark.operators.index import build_index, parse_documents
from bigdata_elephant_spark.operators.search import search
from bigdata_elephant_spark.operators.vocab import build_vocabulary

CORPUS = [
    # (doc_id, url, title, text)
    (1, "u1", "t1", "the good person"),
    (2, "u2", "t2", "the the bad person"),
    (3, "u3", "t3", "good good good wine"),
    (4, "u4", "t4", "1234 booook zzzz"),  # all tokens filtered
    (5, "u5", "t5", "unrelated words here"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        CORPUS, "doc_id long, url string, title string, text string"
    )


@pytest.fixture(scope="module")
def vocab(corpus):
    return build_vocabulary(corpus)


def test_vocabulary(vocab):
    rows = {r["word"]: (r["word_id"], r["df"]) for r in vocab.collect()}
    # df counts: distinct docs per word
    assert rows["the"][1] == 2
    assert rows["good"][1] == 2
    assert rows["person"][1] == 2
    assert rows["wine"][1] == 1
    assert "1234" not in rows and "booook" not in rows and "zzzz" not in rows
    # dense deterministic ids: row_number over (order by word) - 1
    words = sorted(rows)
    assert [rows[w][0] for w in words] == list(range(len(words)))


def test_vocabulary_id_mode_equivalence(spark, sf_dir, monkeypatch):
    """The three id paths assign IDENTICAL ids: the distributed
    partition-offset assigner and the auto threshold switch are pure
    partitioning tricks (vocab.py:40-88); any divergence would remap
    every id in a persisted postings artifact."""
    import pytest as _pytest

    from bigdata_elephant_spark.operators import vocab as vocab_mod
    from bigdata_elephant_spark.sources.corpus import read_table

    docs = read_table(spark, sf_dir, "documents")
    base = sorted(
        tuple(r) for r in
        build_vocabulary(docs, id_mode="window").collect()
    )
    dist = sorted(
        tuple(r) for r in
        build_vocabulary(docs, id_mode="distributed").collect()
    )
    assert dist == base
    # auto flips to the distributed path once the corpus
    # plan-statistics size crosses the threshold — same rows
    monkeypatch.setattr(
        vocab_mod, "VOCAB_DISTRIBUTED_IDS_BYTES", 0
    )
    auto = sorted(
        tuple(r) for r in
        build_vocabulary(docs, id_mode="auto").collect()
    )
    assert auto == base
    with _pytest.raises(ValueError):
        build_vocabulary(docs, id_mode="bogus")
    # stat-less sources (createDataFrame over an RDD reports the
    # Long.MaxValue never-broadcast sentinel, not a size) must stay
    # on the window path under auto
    rdd_docs = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(1, "alpha beta"), (2, "beta gamma")]
        ),
        "doc_id long, text string",
    )
    assert vocab_mod._plan_size_bytes(rdd_docs) == 0
    # empty input: the distributed assigner degrades to the window
    # path instead of building an un-indexable empty map
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert build_vocabulary(empty, id_mode="distributed").count() == 0


def test_postings(corpus, vocab):
    postings = build_index(corpus, vocab)
    v = {r["word"]: r["word_id"] for r in vocab.collect()}
    tf = {(r["doc_id"], r["word_id"]): r["tf"] for r in postings.collect()}
    assert tf[(2, v["the"])] == 2
    assert tf[(3, v["good"])] == 3
    assert tf[(1, v["the"])] == 1
    assert (4, v.get("wine", -1)) not in tf  # doc 4 fully filtered


def test_search_reference_scoring(spark, corpus, vocab):
    postings = build_index(corpus, vocab)
    res = search(spark, "the good person", vocab, postings, k=10)
    got = {r["doc_id"]: r["score"] for r in res.collect()}
    # hand-computed with df(the)=df(good)=df(person)=2, q_tf=1:
    # doc1: (1/2)(1/2)*3 terms = 0.75
    # doc2: the tf=2 -> (2/2)(1/2)=0.5 ; person -> 0.25 ; total 0.75
    # doc3: good tf=3 -> (3/2)(1/2) = 0.75
    # doc5: no overlap -> absent
    assert got == {1: 0.75, 2: 0.75, 3: 0.75}
    # deterministic ordering: equal scores tie-broken by doc_id
    assert [r["doc_id"] for r in res.collect()] == [1, 2, 3]


def test_search_k_limit(spark, corpus, vocab):
    postings = build_index(corpus, vocab)
    res = search(spark, "the good person", vocab, postings, k=2)
    assert res.count() == 2  # exact k, not the reference's k+1 (flaw F2)


def test_search_with_doc_meta(spark, corpus, vocab):
    postings = build_index(corpus, vocab)
    meta = parse_documents(corpus)
    res = search(spark, "wine", vocab, postings, doc_meta=meta, k=3)
    rows = res.collect()
    assert len(rows) == 1
    assert rows[0]["title"] == "t3" and rows[0]["url"] == "u3"


def test_search_smooth_scoring(spark, corpus, vocab):
    import math

    postings = build_index(corpus, vocab)
    res = search(
        spark, "wine", vocab, postings, k=3, scoring="smooth", n_docs=5
    )
    rows = res.collect()
    idf = math.log(6.0 / 2.0) + 1.0
    assert rows[0]["doc_id"] == 3
    assert rows[0]["score"] == pytest.approx(idf * idf, abs=1e-6)


def test_reference_off_by_one_replica(spark, sf_dir):
    """Flaw F2 (Query.java:229-234): the reference emits K+1 rows.
    The faithful-diff mode replicates that; the public API does not."""
    from bigdata_elephant_spark.sources.corpus import read_table

    corpus = read_table(spark, sf_dir, "documents")
    vocab = build_vocabulary(corpus)
    postings = build_index(corpus, vocab)
    exact = search(spark, "hash join", vocab, postings, k=5).collect()
    faithful = search(
        spark, "hash join", vocab, postings, k=5,
        replicate_off_by_one=True,
    ).collect()
    assert len(exact) == 5
    assert len(faithful) == 6
    assert [r["doc_id"] for r in faithful[:5]] == [
        r["doc_id"] for r in exact
    ]


def test_search_edge_cases(spark, sf_dir):
    """All-filtered query -> 0 rows; k >> corpus; empty query."""
    from bigdata_elephant_spark.sources.corpus import read_table

    corpus = read_table(spark, sf_dir, "documents")
    vocab = build_vocabulary(corpus)
    postings = build_index(corpus, vocab)
    # every token dropped by filterText (digits / 4x-repeat / punct)
    assert (
        search(spark, "1234 aaaa !!!", vocab, postings, k=5).count() == 0
    )
    # empty query string
    assert search(spark, "", vocab, postings, k=5).count() == 0
    # k far beyond the corpus: returns every scored doc, no crash
    n = search(spark, "hash join", vocab, postings, k=10_000_000).count()
    assert 0 < n <= corpus.count()


def test_bm25_edge_cases_and_ordering(spark, sf_dir):
    """BM25: sane on degenerate queries, and actually *different*
    ranking math from the reference scorer (length normalization)."""
    from bigdata_elephant_spark.operators.search import bm25_search
    from bigdata_elephant_spark.operators.index import build_index
    from bigdata_elephant_spark.operators.vocab import build_vocabulary
    from bigdata_elephant_spark.sources.corpus import read_table

    corpus = read_table(spark, sf_dir, "documents")
    vocab = build_vocabulary(corpus)
    postings = build_index(corpus, vocab)
    # all tokens filtered -> empty result, no crash
    assert bm25_search(spark, "1234 aaaa !!!", vocab, postings).count() == 0
    # k larger than the corpus -> bounded by matches
    out = bm25_search(spark, "the good person", vocab, postings, k=10**6)
    n = out.count()
    assert 0 < n <= corpus.count()
    rows = out.collect()
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_phrase_search_semantics(spark, sf_dir):
    """Adjacency is real: a planted corpus distinguishes 'spark
    stream' from the words appearing separately; occurrence counting
    and the missing-term / empty-phrase zero-match contracts hold."""
    from bigdata_elephant_spark.operators.index import (
        build_positional_index,
        phrase_search,
    )
    from bigdata_elephant_spark.operators.vocab import build_vocabulary

    docs = spark.createDataFrame(
        [
            (1, "spark stream spark stream"),   # 2 occurrences
            (2, "spark fast stream"),           # words, not the phrase
            (3, "stream spark"),                # reversed
            (4, "the spark stream runs"),       # 1 occurrence
        ],
        "doc_id long, text string",
    )
    vocab = build_vocabulary(docs)
    pos = build_positional_index(docs, vocab)
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_search("Spark, STREAM!", vocab, pos).collect()
    }
    assert got == {1: 2, 4: 1}
    assert phrase_search("spark nosuchword", vocab, pos).count() == 0
    assert phrase_search("1234 !!", vocab, pos).count() == 0  # filtered
    # single-term phrase degrades to term lookup with counts
    single = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_search("spark", vocab, pos).collect()
    }
    assert single == {1: 2, 2: 1, 3: 1, 4: 1}


def test_phrase_search_slop(spark, sf_dir):
    """slop=1 tolerates one intervening token, order-preserving;
    slop=0 remains the exact phrase; each anchor counts once."""
    from bigdata_elephant_spark.operators.index import (
        build_positional_index,
        phrase_search,
    )
    from bigdata_elephant_spark.operators.vocab import build_vocabulary

    docs = spark.createDataFrame(
        [
            (1, "spark fast stream"),    # gap 1 -> slop>=1 only
            (2, "spark stream"),         # exact
            (3, "stream then spark"),    # wrong order, never matches
            (4, "spark very fast stream"),  # gap 2 -> slop>=2 only
        ],
        "doc_id long, text string",
    )
    vocab = build_vocabulary(docs)
    pos = build_positional_index(docs, vocab)

    def hits(slop):
        return {
            r["doc_id"]: r["n_occurrences"]
            for r in phrase_search(
                "spark stream", vocab, pos, slop=slop
            ).collect()
        }

    assert hits(0) == {2: 1}
    assert hits(1) == {1: 1, 2: 1}
    assert hits(2) == {1: 1, 2: 1, 4: 1}


def test_incremental_index_equals_rebuild(spark, sf_dir):
    """Splitting the corpus into base + delta and updating must give
    word-identical df and (doc, word, tf) postings to a full rebuild,
    while every base word keeps its original id."""
    from pyspark.sql import functions as F

    from bigdata_elephant_spark.operators.index import (
        build_index,
        update_index,
    )
    from bigdata_elephant_spark.operators.vocab import (
        build_vocabulary,
        update_vocabulary,
    )

    from bigdata_elephant_spark.sources.corpus import read_table

    corpus = read_table(spark, sf_dir, "documents")
    base = corpus.filter(F.col("doc_id") < 400)
    delta = corpus.filter(F.col("doc_id") >= 400)

    v_base = build_vocabulary(base)
    p_base = build_index(base, v_base)
    v_inc = update_vocabulary(v_base, delta)
    p_inc = update_index(delta, v_inc, p_base)

    v_full = build_vocabulary(corpus)
    p_full = build_index(corpus, v_full)

    # df parity by word
    a = {r["word"]: r["df"] for r in v_inc.collect()}
    b = {r["word"]: r["df"] for r in v_full.collect()}
    assert a == b
    # id stability for base words; appended ids dense after max
    base_ids = {r["word"]: r["word_id"] for r in v_base.collect()}
    inc_ids = {r["word"]: r["word_id"] for r in v_inc.collect()}
    for w, i in base_ids.items():
        assert inc_ids[w] == i
    new_ids = sorted(i for w, i in inc_ids.items() if w not in base_ids)
    assert new_ids == list(
        range(max(base_ids.values()) + 1,
              max(base_ids.values()) + 1 + len(new_ids))
    )
    # postings parity on (doc, WORD, tf)
    def by_word(postings, vocab):
        return {
            (r["doc_id"], r["word"], r["tf"])
            for r in postings.join(vocab, "word_id").select(
                "doc_id", "word", "tf"
            ).collect()
        }

    assert by_word(p_inc, v_inc) == by_word(p_full, v_full)


def test_update_vocabulary_from_empty_base(spark):
    """Bootstrapping: updating an EMPTY vocabulary equals building
    from scratch (ids dense from 0)."""
    from bigdata_elephant_spark.operators.vocab import (
        build_vocabulary,
        update_vocabulary,
    )

    docs = spark.createDataFrame(
        [(1, "spark stream"), (2, "stream batch")],
        "doc_id long, text string",
    )
    empty = build_vocabulary(
        spark.createDataFrame([], "doc_id long, text string")
    )
    inc = {(r["word"], r["word_id"], r["df"])
           for r in update_vocabulary(empty, docs).collect()}
    full = {(r["word"], r["word_id"], r["df"])
            for r in build_vocabulary(docs).collect()}
    assert inc == full


def test_bm25_batch_matches_single(spark, sf_dir):
    """The one-plan batch scorer must agree per query with the
    single-query BM25 path (same index, same constants), including
    per-query rank assignment, empty-after-filter queries, and
    queries with zero matches."""
    from bigdata_elephant_spark.operators.index import build_index
    from bigdata_elephant_spark.operators.search import (
        bm25_search,
        bm25_search_batch,
    )
    from bigdata_elephant_spark.operators.vocab import build_vocabulary
    from bigdata_elephant_spark.sources.corpus import read_table

    corpus = read_table(spark, sf_dir, "documents")
    vocab = build_vocabulary(corpus).cache()
    postings = build_index(corpus, vocab).cache()
    queries = {
        7: "the good person",
        9: "hash join stream",
        11: "1234 aaaa !!!",  # all tokens filtered -> no rows
    }
    k = 7
    batch = bm25_search_batch(
        spark, queries, vocab, postings, k=k
    ).collect()
    by_q: dict[int, list] = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append(r)
    assert 11 not in by_q
    for qid, qs in ((7, queries[7]), (9, queries[9])):
        single = bm25_search(
            spark, qs, vocab, postings, k=k
        ).collect()
        got = [(r["doc_id"], r["score"]) for r in by_q.get(qid, [])]
        want = [(r["doc_id"], r["score"]) for r in single]
        assert got == want, qid
        assert [r["rank"] for r in by_q.get(qid, [])] == list(
            range(1, len(got) + 1)
        )


def test_delete_docs_removes_all_postings(corpus, vocab):
    from pyspark.sql import functions as F

    from bigdata_elephant_spark.operators.index import (
        build_index,
        delete_docs,
    )

    postings = build_index(corpus, vocab)
    kept = delete_docs(postings, [2, 3, 999])  # 999: absent, no-op
    assert kept.filter(F.col("doc_id").isin([2, 3])).count() == 0
    assert (
        kept.count()
        == postings.filter(~F.col("doc_id").isin([2, 3])).count()
    )
    # DataFrame form (the scale shape) gives the same survivors
    ids_df = corpus.filter(F.col("doc_id").isin([2, 3])).select(
        "doc_id"
    )
    kept2 = delete_docs(postings, ids_df)
    assert {tuple(r) for r in kept.collect()} == {
        tuple(r) for r in kept2.collect()
    }


def test_reingest_docs_replaces_not_stacks(spark, corpus, vocab):
    """Re-ingesting a doc with edited text must REPLACE its postings
    (Lucene updateDocument), never stack a second set; untouched docs
    keep byte-identical postings; and an identity re-ingest (same
    text) is a no-op on the relation."""
    from pyspark.sql import functions as F

    from bigdata_elephant_spark.operators.index import (
        build_index,
        reingest_docs,
    )

    postings = build_index(corpus, vocab)

    def rows(p):
        return {(r["doc_id"], r["word_id"], r["tf"])
                for r in p.collect()}

    # identity re-ingest: same text -> same relation
    same = reingest_docs(
        corpus.filter("doc_id = 1"), vocab, postings
    )
    assert rows(same) == rows(postings)

    # edited re-ingest: doc 1 becomes "good good" (tf changes, terms
    # drop); frozen vocab keeps ids
    edited = corpus.filter("doc_id = 1").withColumn(
        "text", F.lit("good good")
    )
    up = reingest_docs(edited, vocab, postings)
    wid = {
        r["word"]: r["word_id"] for r in vocab.collect()
    }
    got = rows(up)
    assert (1, wid["good"], 2) in got
    assert not any(
        d == 1 and w in (wid["the"], wid["person"])
        for d, w, _ in got
    )
    # untouched docs identical
    assert {t for t in got if t[0] != 1} == {
        t for t in rows(postings) if t[0] != 1
    }


def test_doc_lengths_from_corpus_equals_postings_aggregate(spark):
    """When the vocabulary covers the whole corpus (the inline-build
    case), dl computed straight from the corpus equals the postings
    aggregate row-for-row — the invariant behind passing
    dl=doc_lengths_from_corpus(corpus) into the inline BM25 queries."""
    from bigdata_elephant_spark.operators.index import build_index
    from bigdata_elephant_spark.operators.search import (
        doc_lengths,
        doc_lengths_from_corpus,
    )
    from bigdata_elephant_spark.operators.vocab import build_vocabulary
    from bigdata_elephant_spark.sources.corpus import read_table

    corpus = read_table(spark, "/root/testdata/sf0.01", "documents")
    vocab = build_vocabulary(corpus)
    postings = build_index(corpus, vocab)
    a = {(r.doc_id, r.dl) for r in doc_lengths(postings).collect()}
    b = {
        (r.doc_id, r.dl)
        for r in doc_lengths_from_corpus(corpus).collect()
    }
    assert a == b and len(a) > 0
