"""Property-based checks (SURVEY §5.4) over generated mini-corpora.

Hypothesis drives the corpus shapes; example counts are small because
each example runs real Spark jobs.

Marked ``slow`` (several minutes of Spark jobs): deselected from the
default/driver pytest run (pytest.ini); run locally with ``-m ""``.
"""

from __future__ import annotations

import os

import pytest

pytestmark = pytest.mark.slow
from hypothesis import (
    HealthCheck, example, given, settings, strategies as st,
)

from bigdata_elephant_spark.operators.search import search
from bigdata_elephant_spark.operators.index import build_index
from bigdata_elephant_spark.operators.vocab import build_vocabulary
from bigdata_elephant_spark.functions.text import tokenize_str

WORDS = ["spark", "hash", "join", "query", "stream", "the", "scan"]

doc_strategy = st.lists(
    st.sampled_from(WORDS), min_size=0, max_size=12
).map(" ".join)

corpus_strategy = st.lists(doc_strategy, min_size=1, max_size=8)

# ELEPHANT_HYPOTHESIS_EXAMPLES multiplies the default example
# budget for local deep shakes (the r11 lesson: a thin randomized
# draw can ship committed-green over a crashing input class); the
# committed default keeps suite wall time bounded, the documented
# edge classes are pinned as @example regardless.
SETTINGS = settings(
    max_examples=int(
        os.environ.get("ELEPHANT_HYPOTHESIS_EXAMPLES", "8")
    ),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _corpus_df(spark, texts, order=None):
    rows = [(i, t) for i, t in enumerate(texts)]
    if order is not None:
        rows = [rows[i] for i in order]
    return spark.createDataFrame(rows, "doc_id long, text string")


@given(texts=corpus_strategy)
@SETTINGS
def test_vocab_df_matches_bruteforce(spark, texts):
    got = {
        r["word"]: r["df"]
        for r in build_vocabulary(_corpus_df(spark, texts)).collect()
    }
    expect: dict[str, set[int]] = {}
    for i, t in enumerate(texts):
        for w in set(tokenize_str(t)):
            expect.setdefault(w, set()).add(i)
    assert got == {w: len(d) for w, d in expect.items()}


@given(texts=corpus_strategy, data=st.data())
@SETTINGS
def test_score_permutation_invariant(spark, texts, data):
    perm = data.draw(st.permutations(range(len(texts))))

    def run(order):
        corpus = _corpus_df(spark, texts, order)
        vocab = build_vocabulary(corpus)
        postings = build_index(corpus, vocab)
        return sorted(
            (r["doc_id"], r["score"])
            for r in search(
                spark, "spark join query", vocab, postings, k=100
            ).collect()
        )

    assert run(None) == run(list(perm))


@given(texts=corpus_strategy)
@SETTINGS
def test_topk_is_prefix_of_topk_plus_one(spark, texts):
    corpus = _corpus_df(spark, texts)
    vocab = build_vocabulary(corpus)
    postings = build_index(corpus, vocab)

    def topk(k):
        return [
            (r["doc_id"], r["score"])
            for r in search(spark, "hash the scan", vocab, postings, k=k)
            .collect()
        ]

    k3, k4 = topk(3), topk(4)
    assert k3 == k4[: len(k3)]


@given(texts=corpus_strategy)
@SETTINGS
def test_word_ids_dense_and_alphabetical(spark, texts):
    rows = sorted(
        build_vocabulary(_corpus_df(spark, texts)).collect(),
        key=lambda r: r["word"],
    )
    assert [r["word_id"] for r in rows] == list(range(len(rows)))


def test_distributed_ids_equal_window_ids(spark):
    """The two-phase partition-offset scheme produces exactly the
    global dense rank the single-partition window produces."""
    from bigdata_elephant_spark.operators.vocab import (
        assign_dense_ids,
        assign_dense_ids_distributed,
    )
    from bigdata_elephant_spark.sources.corpus import read_table
    import os

    sf = os.environ.get("ELEPHANT_TEST_SF_DIR", "/root/testdata/sf0.001")
    vocab_words = (
        read_table(spark, sf, "documents")
        .selectExpr("explode(split(lower(text), ' ')) AS word")
        .filter("word <> ''")
        .distinct()
    )
    a = {
        r["word"]: r["word_id"]
        for r in assign_dense_ids(vocab_words, "word").collect()
    }
    b = {
        r["word"]: r["word_id"]
        for r in assign_dense_ids_distributed(
            vocab_words, "word", n_parts=7
        ).collect()
    }
    assert a == b and len(a) > 20


@given(
    n=st.integers(10, 60),
    frac=st.floats(0.1, 0.9),
)
@example(n=10, frac=0.1)
@example(n=60, frac=0.9)
@SETTINGS
def test_hash_sample_split_properties(spark, n, frac):
    """Sampling is deterministic, and [0,frac) + [frac,1) partition
    the id space for ANY id set and fraction."""
    from bigdata_elephant_spark.operators.sampling import hash_sample

    df = spark.createDataFrame(
        [(i * 7 + 3,) for i in range(n)], "doc_id long"
    )
    lo = {r["doc_id"] for r in hash_sample(df, "doc_id", frac).collect()}
    hi = {
        r["doc_id"]
        for r in hash_sample(df, "doc_id", 1.0 - frac, offset=frac).collect()
    }
    again = {r["doc_id"] for r in hash_sample(df, "doc_id", frac).collect()}
    assert lo == again
    assert not (lo & hi)
    assert len(lo | hi) == n


@given(texts=corpus_strategy)
@example(texts=[""])
@example(texts=["the the", "the  the", "spark"])
@SETTINGS
def test_exact_dedup_partitions_corpus(spark, texts):
    """Every doc lands in exactly one dedup group; group sizes sum to
    the corpus size; canonical id is the min of its group."""
    from pyspark.sql import functions as F
    from bigdata_elephant_spark.operators.dedup import exact_dedup

    df = _corpus_df(spark, texts)
    groups = exact_dedup(df).collect()
    assert sum(r["n_dups"] for r in groups) == len(texts)
    norm = {}
    for i, t in enumerate(texts):
        key = " ".join(t.lower().split())
        norm.setdefault(key, []).append(i)
    expect_canon = {min(v) for v in norm.values()}
    assert {r["canonical_doc_id"] for r in groups} == expect_canon


def _brute_force_passages(texts, shingle_n, min_run):
    """Reference implementation: all maximal shared runs via direct
    diagonal walking over tokenized docs."""
    from bigdata_elephant_spark.functions.text import tokenize_str

    toks = {i: tokenize_str(t) for i, t in enumerate(texts)}
    out = {}
    for a in toks:
        for b in toks:
            if a >= b:
                continue
            ta, tb = toks[a], toks[b]
            runs = []
            # diagonals: offset d = pos_a - pos_b
            for d in range(-(len(tb)), len(ta) + 1):
                run = 0
                for pa in range(len(ta) + 1):
                    pb = pa - d
                    match = (
                        pa < len(ta)
                        and 0 <= pb < len(tb)
                        and ta[pa] == tb[pb]
                    )
                    if match:
                        run += 1
                    else:
                        if run >= min_run and run >= shingle_n:
                            runs.append(run)
                        run = 0
            if runs:
                out[(a, b)] = (max(runs), len(runs))
    return out


@given(texts=st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=20)
    .map(" ".join),
    min_size=2, max_size=5,
))
@example(texts=["", ""])
@example(texts=["spark hash join query", "spark hash join query"])
@SETTINGS
def test_duplicate_passages_matches_bruteforce(spark, texts):
    """The shingle-join + islands pipeline must agree with a direct
    diagonal-walk reference on arbitrary corpora. shingle_n=2 keeps
    every >=min_run run representable as a shingle run (a maximal
    token run of length L >= n appears as exactly L-n+1 consecutive
    shingle matches on one diagonal)."""
    from bigdata_elephant_spark.operators.dedup import (
        duplicate_passages,
    )

    shingle_n, min_run = 2, 3
    docs = _corpus_df(spark, texts)
    got = {
        (r["doc_a"], r["doc_b"]): (r["max_run_tokens"], r["n_runs"])
        for r in duplicate_passages(
            docs, shingle_n=shingle_n, min_run=min_run
        ).collect()
    }
    assert got == _brute_force_passages(texts, shingle_n, min_run)


# ---------------------------------------- sequence op properties

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),      # user_id
        st.integers(min_value=0, max_value=7200),   # start offset s
        st.integers(min_value=0, max_value=3600),   # duration s
        st.sampled_from(["a", "b", "c"]),           # event_type
    ),
    min_size=1,
    max_size=14,
)


def _events_df(spark, rows):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (
                i,
                base + dt.timedelta(seconds=off),
                uid,
                et,
                float(dur),
                "",
            )
            for i, (uid, off, dur, et) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )


@given(rows=events_strategy)
@SETTINGS
def test_transitions_equal_bruteforce_property(spark, rows):
    from bigdata_elephant_spark.operators.sequences import (
        event_transitions,
    )

    ev = _events_df(spark, rows)
    got = {
        (r.from_type, r.to_type): r.n
        for r in event_transitions(ev).collect()
    }
    ordered = sorted(
        enumerate(rows), key=lambda x: (x[1][0], x[1][1], x[0])
    )
    expect: dict[tuple[str, str], int] = {}
    for (_, a), (_, b) in zip(ordered, ordered[1:]):
        if a[0] == b[0]:
            k = (a[3], b[3])
            expect[k] = expect.get(k, 0) + 1
    assert got == expect


@given(rows=events_strategy)
@SETTINGS
def test_concurrency_equal_bruteforce_property(spark, rows):
    import datetime as dt

    from bigdata_elephant_spark.operators.sequences import (
        concurrency_timeline,
    )

    ev = _events_df(spark, rows)
    got = {
        r.hour: r.max_concurrent
        for r in concurrency_timeline(ev).collect()
    }
    base = dt.datetime(2024, 1, 1)
    edges = []
    for uid, off, dur, et in rows:
        t0 = base + dt.timedelta(seconds=off)
        edges.append((t0, 1))
        edges.append((t0 + dt.timedelta(seconds=dur), -1))
    edges.sort(key=lambda e: (e[0], e[1]))
    level, expect = 0, {}
    for t, d in edges:
        h = t.replace(minute=0, second=0, microsecond=0)
        if h not in expect:
            expect[h] = level  # hour's entering (carry-in) level
        level += d
        expect[h] = max(expect[h], level)
    assert got == expect


@SETTINGS
@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-4.0, max_value=4.0,
                allow_nan=False, allow_infinity=False, width=32,
            ),
            min_size=3, max_size=3,
        ),
        min_size=1, max_size=12,
    )
)
@example(vecs=[[0.0, 0.0, 0.0]])
def test_gram_two_phase_matches_numpy(spark, tmp_path_factory, vecs):
    """The scaled-long partial / decimal merge gram sum must equal
    the direct float upper-triangle X^T X within the 6-decimal
    output rounding, for arbitrary (non-unit) vectors — exercising
    the overflow-guarded two-phase path end to end."""
    import numpy as np
    import pandas as pd

    from bigdata_elephant_spark.plans.curation_queries import (
        q_embedding_gram_matrix,
    )

    d = str(tmp_path_factory.mktemp("gram"))
    pd.DataFrame(
        {
            "vec_id": list(range(len(vecs))),
            "embedding": vecs,
            "label": [0] * len(vecs),
        }
    ).to_parquet(f"{d}/embeddings.parquet")
    got = {
        (r["i"], r["j"]): r["gram"]
        for r in q_embedding_gram_matrix(spark, d).collect()
    }
    # reference: same per-term rounding discipline, float64 sums
    x = np.round(np.array(vecs, dtype=np.float64), 7)
    for i in range(3):
        for j in range(i, 3):
            want = float(np.sum(np.round(x[:, i] * x[:, j], 12)))
            assert abs(got[(i, j)] - want) < 2e-6, (i, j)


@SETTINGS
@given(texts=corpus_strategy, data=st.data())
def test_bm25_batch_equals_singles_property(spark, texts, data):
    """For ANY corpus and probe set, the one-plan batch scorer
    returns per query exactly the single-query BM25 ranking."""
    from bigdata_elephant_spark.operators.index import build_index
    from bigdata_elephant_spark.operators.search import (
        bm25_search,
        bm25_search_batch,
    )
    from bigdata_elephant_spark.operators.vocab import build_vocabulary

    docs = spark.createDataFrame(
        [(i, "u", "t", t) for i, t in enumerate(texts)],
        "doc_id long, url string, title string, text string",
    )
    vocab = build_vocabulary(docs)
    postings = build_index(docs, vocab)
    queries = {
        qid: data.draw(doc_strategy, label=f"q{qid}")
        for qid in (1, 2)
    }
    k = data.draw(st.integers(min_value=1, max_value=4), label="k")
    batch = bm25_search_batch(spark, queries, vocab, postings, k=k)
    by_q: dict[int, list] = {}
    for r in batch.collect():
        by_q.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["score"])
        )
    for qid, qs in queries.items():
        single = [
            (r["doc_id"], r["score"])
            for r in bm25_search(
                spark, qs, vocab, postings, k=k
            ).collect()
        ]
        assert by_q.get(qid, []) == single, (qid, qs)


# ---------------- parallel-BPE batch selection (pure-python model)


def _py_merge_seq(syms, lhs, rhs, merged):
    out = [syms[0]]
    for x in syms[1:]:
        if out[-1] == lhs and x == rhs:
            out[-1] = merged
        else:
            out.append(x)
    return out


def _py_pair_counts(words):
    from collections import Counter

    c = Counter()
    for syms, freq in words:
        for a, b in zip(syms, syms[1:]):
            c[(a, b)] += freq
    return c


def _py_train(words, n_merges, max_batch, alphabet):
    """Reference BPE trainer driving the SAME selection code the
    Spark operator uses: max_batch=1 is plain sequential greedy;
    the property below pins batched == sequential transcripts."""
    from bigdata_elephant_spark.operators.bpe import (
        _select_merge_batch,
    )

    words = [(list(s), f) for s, f in words]
    known = set(alphabet)
    rules = []
    while len(rules) < n_merges:
        counts = _py_pair_counts(words)
        if not counts:
            break
        rows = [
            {"lhs": a, "rhs": b, "pair_count": c}
            for (a, b), c in counts.items()
        ]
        rows.sort(key=lambda r: (-r["pair_count"], r["lhs"], r["rhs"]))
        batch = _select_merge_batch(
            rows,
            min(max_batch, n_merges - len(rules)),
            known,
            slice_complete=True,
        )
        if not batch:
            break
        for lhs, rhs, merged, cnt in batch:
            rules.append((lhs, rhs, merged, cnt))
            known.add(merged)
            words = [
                (_py_merge_seq(s, lhs, rhs, merged), f)
                for s, f in words
            ]
    return rules


@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abc", min_size=1, max_size=8),
            st.integers(min_value=1, max_value=5),
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=10),
    st.sampled_from([2, 4, 8]),
)
@example([("a", 1)], 1, 2)
@example([("abababab", 5)], 10, 8)
@settings(max_examples=300, deadline=None)
def test_bpe_batch_selection_reproduces_sequential(
    words, n_merges, max_batch
):
    """The transcript-safety property of the parallel-BPE batch
    rule, exhaustively: for ANY word-frequency table, training with
    batched selection produces bit-for-bit the sequential greedy
    transcript (rules AND their pick-time counts). Sequential =
    max_batch=1 through the same code path, so the property isolates
    exactly the batching conditions (disjointness, fresh merged
    symbols, strict dominance over symbol-sharing pairs)."""
    seq = _py_train(words, n_merges, 1, "abc")
    bat = _py_train(words, n_merges, max_batch, "abc")
    assert bat == seq


# ------------------------ LSH star-edge collapse (r10 guard)

# Corpora with forced duplicate structure: few distinct words and
# repeated picks make identical and near-identical docs likely, so
# the identical-signature collapse actually fires.
dup_doc_strategy = st.lists(
    st.sampled_from(WORDS[:4]), min_size=3, max_size=6
).map(" ".join)
dup_corpus_strategy = st.lists(
    dup_doc_strategy, min_size=2, max_size=10
)


@given(texts=dup_corpus_strategy, thr_x10=st.sampled_from([0, 5, 8, 10]))
@example(texts=["spark hash join", "spark hash join"], thr_x10=10)
@SETTINGS
def test_star_edges_components_equal_all_pairs(spark, texts, thr_x10):
    """lsh_candidate_edges' contract, property-tested: for ANY corpus
    and ANY est_sim threshold t <= 1, the star-collapsed edge graph
    has the same connected components (hence the same duplicate
    groups) as the all-pairs candidate graph — est_sim and bucket
    membership are pure functions of the two signatures."""
    from pyspark.sql import functions as F

    from bigdata_elephant_spark.operators import dedup

    docs = _corpus_df(spark, texts)
    sigs = dedup.minhash_signatures(docs).localCheckpoint()
    thr = thr_x10 / 10.0

    def groups(edges):
        return {
            (r.doc_id, r.group_id)
            for r in dedup.duplicate_groups(
                edges.filter(F.col("est_sim") >= thr)
            ).collect()
        }

    assert groups(dedup.lsh_candidate_edges(sigs)) == groups(
        dedup.lsh_candidate_pairs(sigs)
    )


@given(
    new_texts=dup_corpus_strategy,
    corpus_texts=dup_corpus_strategy,
    thr_x10=st.sampled_from([0, 5, 8, 10]),
)
@example(
    new_texts=["spark hash join"],
    corpus_texts=["spark hash join"],
    thr_x10=10,
)
@SETTINGS
def test_incremental_edges_admission_equals_pairs(
    spark, new_texts, corpus_texts, thr_x10
):
    """incremental_dedup_edges' contract, property-tested: for ANY
    delta, ANY corpus, and ANY threshold, the rep-collapsed ingest
    join yields the SAME admission verdict per new doc as the
    unguarded pair join — est_sim is a pure function of the two
    signatures, so a new doc clears the threshold against a cluster's
    representative iff it clears it against every member — and the
    per-doc best score is identical."""
    from pyspark.sql import functions as F

    from bigdata_elephant_spark.operators import dedup

    thr = thr_x10 / 10.0
    new_docs = _corpus_df(spark, new_texts)
    corpus = spark.createDataFrame(
        [(10_000 + i, t) for i, t in enumerate(corpus_texts)],
        "doc_id long, text string",
    )
    new_sigs = dedup.minhash_signatures(new_docs).localCheckpoint()
    corpus_sigs = dedup.minhash_signatures(corpus).localCheckpoint()

    def best(df, id_col):
        return {
            r[id_col]: r.s
            for r in df.filter(F.col("est_sim") >= thr)
            .groupBy(id_col)
            .agg(F.max("est_sim").alias("s"))
            .collect()
        }

    pairs = dedup.incremental_dedup_pairs(new_sigs, corpus_sigs)
    edges = dedup.incremental_dedup_edges(
        new_sigs, corpus_sigs, materialize=False
    )
    assert best(pairs, "new_id") == best(edges, "new_id")
    # and feeding pre-collapsed reps (the production artifact shape)
    # changes nothing
    reps = dedup.signature_reps(corpus_sigs)
    edges_reps = dedup.incremental_dedup_edges(
        new_sigs, reps, corpus_is_reps=True, materialize=False
    )
    assert best(edges_reps, "new_id") == best(edges, "new_id")


# small-dim integer vectors with duplicates encouraged: identical
# vectors are what exact-dup documents embed to, so the collapse
# actually fires; a zero vector is deliberately possible in the
# tail (both miners must treat it identically).
vec_strategy = st.lists(
    st.integers(min_value=-2, max_value=2), min_size=4, max_size=4
)
emb_strategy = st.lists(
    st.sampled_from(
        [[1, 1, 1, 1], [1, 0, 1, 0], [0, 2, 0, 2]]
    ) | vec_strategy,
    min_size=2,
    max_size=12,
)


@given(vecs=emb_strategy, thr_x10=st.sampled_from([5, 8, 10]))
@example(vecs=[[1, 1, 1, 1], [0, 0, 0, 0]], thr_x10=5)
@example(vecs=[[0, 0, 0, 0], [0, 0, 0, 0]], thr_x10=10)
@example(vecs=[[1, 1, 1, 1], [1, 1, 1, 1], [1, 0, 1, 0]], thr_x10=5)
@SETTINGS
def test_semantic_edges_components_equal_pairs(
    spark, vecs, thr_x10
):
    """The embedding-side collapse, property-tested: for ANY vector
    set (duplicates, zero vectors, any mix) and ANY threshold, the
    star-collapsed SemDeDup edge graph and the hyperplane-LSH edge
    graph each close to the same connected components as their
    all-pairs twins — cos_sim is a pure function of the two vectors,
    and bit-identical vectors land in the same cell/bucket by
    construction."""
    from bigdata_elephant_spark.operators import dedup, similarity

    thr = thr_x10 / 10.0
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    ).localCheckpoint()

    def comps(df):
        return {
            (r.doc_id, r.group_id)
            for r in dedup.duplicate_groups(
                df.select("id_a", "id_b"), "id_a", "id_b"
            ).collect()
        }

    assert comps(
        similarity.semantic_dedup_edges(emb, thr, n_cells=3)
    ) == comps(similarity.semantic_dedup_pairs(emb, thr, n_cells=3))

    planes = similarity.hyperplanes(2, 4)
    assert comps(
        similarity.near_dup_edges(emb, thr, planes=planes)
    ) == comps(similarity.near_dup_pairs(emb, thr, planes=planes))


# vectors drawn with NaN/±Inf deliberately in range: the finite-floats
# contract (similarity.py, r12) was declared but unenforced — NaN
# norms pass the norm>0 filter (NaN > 0 is TRUE under Spark's
# NaN-greatest ordering) and silently poison cosine ranks. The
# quarantine lane is the enforcement; this property proves the
# composed pipeline (quarantine -> pair miner) equals the miner over
# the finite-only subset for ANY mix of broken vectors.
_SPECIALS = [float("nan"), float("inf"), float("-inf")]
dirty_vec_strategy = st.lists(
    st.sampled_from([-2.0, -1.0, 0.0, 1.0, 2.0] + _SPECIALS),
    min_size=4,
    max_size=4,
)
dirty_emb_strategy = st.lists(
    st.sampled_from(
        [[1.0, 1.0, 1.0, 1.0], [1.0, 0.0, 1.0, 0.0]]
    ) | dirty_vec_strategy,
    min_size=2,
    max_size=10,
)


def _is_clean(v):
    import math

    return all(math.isfinite(x) for x in v) and any(x != 0 for x in v)


@given(vecs=dirty_emb_strategy, thr_x10=st.sampled_from([5, 10]))
@example(  # the headline case: a NaN vector next to a real dup pair
    vecs=[[float("nan"), 1.0, 1.0, 1.0], [1.0, 1.0, 1.0, 1.0],
          [1.0, 1.0, 1.0, 1.0]],
    thr_x10=5,
)
@example(  # ±Inf and the zero vector in one corpus
    vecs=[[float("inf"), 0.0, 0.0, 0.0],
          [float("-inf"), 1.0, 0.0, 1.0], [0.0, 0.0, 0.0, 0.0],
          [1.0, 1.0, 1.0, 1.0]],
    thr_x10=10,
)
@example(vecs=[[float("nan")] * 4, [float("nan")] * 4], thr_x10=5)
@SETTINGS
def test_quarantine_enforces_finite_contract(spark, vecs, thr_x10):
    from bigdata_elephant_spark.operators import similarity

    thr = thr_x10 / 10.0
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    ).localCheckpoint()
    clean, quar = similarity.quarantine_embeddings(emb, expected_dim=4)
    clean_rows = clean.collect()
    quar_rows = quar.collect()
    # the split is a partition of the input
    assert len(clean_rows) + len(quar_rows) == len(vecs)
    assert {r.vec_id for r in clean_rows}.isdisjoint(
        {r.vec_id for r in quar_rows}
    )
    # lane membership matches the python-side contract predicate
    assert {r.vec_id for r in clean_rows} == {
        i for i, v in enumerate(vecs) if _is_clean(v)
    }
    # every quarantined row carries a non-ok reason from the declared
    # class set
    bad = set(similarity.EMB_VALIDITY_CLASSES) - {"ok"}
    assert all(r.validity in bad for r in quar_rows)
    # composed pipeline == miner over the manually-filtered finite
    # subset: quarantining is exactly "remove out-of-contract rows",
    # nothing else
    manual = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs) if _is_clean(v)],
        "vec_id long, embedding array<float>",
    )

    def pairs(df):
        return {
            (r.id_a, r.id_b, r.cos_sim)
            for r in similarity.semantic_dedup_pairs(
                df, thr, n_cells=3
            ).collect()
        }

    assert pairs(clean) == pairs(manual)


# Media-bytes lane (r14): media_validity must agree with the plain
# python reference predicate over ANY mutation of a valid RIFF/WAV
# container — the Spark side reads the container with column
# expressions (octet_length + hex byte reads), so this property is
# the proof that the byte-level parse implements the documented
# decision procedure, not something merely close to it. Mutations
# compose (Hypothesis draws a per-row op), and the documented edge
# classes are pinned as @example per the r11 lesson.
def _ref_media_class(b):
    if b is None:
        return "null_media"
    if len(b) == 0:
        return "empty"
    if len(b) < 12:
        return "truncated_header"
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return "bad_magic"
    if int.from_bytes(b[4:8], "little") + 8 != len(b):
        return "size_mismatch"
    return "ok"


def _mutate_payload(base, op, k):
    if op == "keep":
        return base
    if op == "null":
        return None
    if op == "truncate":
        return base[: k % 12]  # always below the 12-byte preamble
    if op == "flip_riff":
        return b"JUNK" + base[4:]
    if op == "flip_wave":
        return base[:8] + b"EVAW" + base[12:]
    if op == "chop":
        return base[: len(base) - 1 - (k % 16)]
    if op == "pad":
        return base + bytes(1 + k % 16)
    if op == "declared":  # rewrite the declared size field itself
        return base[:4] + k.to_bytes(4, "little") + base[8:]
    raise AssertionError(op)


media_op_strategy = st.tuples(
    st.sampled_from(
        ["keep", "null", "truncate", "flip_riff", "flip_wave",
         "chop", "pad", "declared"]
    ),
    st.integers(min_value=0, max_value=300),
)

_MIN_RIFF = b"RIFF" + (4).to_bytes(4, "little") + b"WAVE"


@given(ops=st.lists(media_op_strategy, min_size=1, max_size=10))
@example(ops=[("declared", 4)])    # 12-byte zero-chunk container: ok
@example(ops=[("declared", 5)])    # off-by-one declared size
@example(ops=[("truncate", 11)])   # one byte short of the preamble
@example(ops=[("pad", 0)])         # one trailing pad byte
@example(ops=[("chop", 0)])        # one byte chopped
@example(ops=[("null", 0), ("keep", 0), ("flip_wave", 0)])
@SETTINGS
def test_media_validity_matches_reference_predicate(spark, ops):
    import numpy as np

    from bigdata_elephant_spark.operators import multimodal as mm

    base = mm.encode_wav(
        (np.arange(40) % 7 - 3).astype(np.int16), 8000
    )
    payloads = [
        _mutate_payload(_MIN_RIFF if op == "declared" else base, op, k)
        for op, k in ops
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)],
        "doc_id long, media binary",
    ).localCheckpoint()
    got = {
        r.doc_id: r.validity
        for r in mm.media_validity(df).collect()
    }
    want = {i: _ref_media_class(p) for i, p in enumerate(payloads)}
    assert got == want
    # the split is a partition and the clean side is exactly the
    # reference-ok subset
    clean, quar = mm.quarantine_media(df)
    ids_clean = {r.doc_id for r in clean.collect()}
    ids_quar = {r.doc_id for r in quar.collect()}
    assert ids_clean.isdisjoint(ids_quar)
    assert ids_clean | ids_quar == set(want)
    assert ids_clean == {i for i, c in want.items() if c == "ok"}
