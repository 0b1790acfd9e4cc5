"""BPE merge training (operators/bpe.py).

The registry oracles (tests/test_oracle_parity.py: bpe_merges,
bpe_subword_vocab, bpe_encode_sample) hash-verify the trained rules
and vocabulary against a fully unrolled DuckDB replay; these tests
pin the algorithmic edges the corpus may not exercise — the
left-to-right non-overlap rule, merged-symbol cascading, rule-order
sensitivity of the encoder — plus the invariants any trainer must
hold (monotone corpus compression, count conservation).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_elephant_spark.operators import bpe


def _wf(spark, rows):
    """(word, freq) literal vocab -> the trainer's char-split shape."""
    return spark.createDataFrame(rows, ["word", "freq"]).select(
        "word", F.split("word", "").alias("syms"), "freq"
    )


def test_merge_fold_non_overlapping(spark):
    """`bbbb` merges to [bb, bb], never [bb, b, b] (the fused tail
    must not re-match as lhs) — and an odd run leaves the orphan."""
    df = _wf(spark, [("bbbb", 1), ("bbb", 1), ("b", 1)])
    out = {
        r["word"]: r["syms"]
        for r in df.withColumn(
            "syms", bpe._merge_fold(F.col("syms"), "b", "b", "bb")
        ).collect()
    }
    assert out["bbbb"] == ["bb", "bb"]
    assert out["bbb"] == ["bb", "b"]
    assert out["b"] == ["b"]


def test_pair_counts_weighted_and_overlapping(spark):
    """Counts weight by word freq and count every adjacent position:
    `aaa` (freq 5) contributes 2*5 (a,a) pairs."""
    counts = {
        (r["lhs"], r["rhs"]): r["pair_count"]
        for r in bpe._pair_counts(
            _wf(spark, [("aaa", 5), ("ab", 3), ("a", 99)])
        ).collect()
    }
    assert counts == {("a", "a"): 10, ("a", "b"): 3}


def test_train_greedy_sequence_and_cascade(spark):
    """On a crafted vocab the argmax sequence is checkable by hand,
    including a cascaded merge (rule 2 consumes rule 1's output)."""
    docs = spark.createDataFrame(
        [(1, "the the the the thy")], ["doc_id", "text"]
    )
    merges, wf = bpe.bpe_train(docs, n_merges=3)
    got = [(r["lhs"], r["rhs"], r["merged"], r["pair_count"])
           for r in merges.orderBy("merge_rank").collect()]
    # 'the' x4, 'thy' x1: (t,h)=5 wins, then (th,e)=4, then (th,y)=1
    assert got == [("t", "h", "th", 5), ("th", "e", "the", 4),
                   ("th", "y", "thy", 1)]
    final = {r["word"]: r["syms"] for r in wf.collect()}
    assert final == {"the": ["the"], "thy": ["thy"]}


def test_subword_count_conservation(spark, sf_dir):
    """Every merge conserves total character mass: sum over subwords
    of freq*len(subword) equals the pre-merge character count."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    _, wf = bpe.bpe_train(docs, n_merges=4)
    chars_after = wf.select(
        F.sum(
            F.aggregate(
                F.transform("syms", lambda s: F.length(s)),
                F.lit(0),
                lambda a, x: a + x,
            )
            * F.col("freq")
        ).alias("n")
    ).collect()[0]["n"]
    chars_before = (
        bpe.word_frequencies(docs)
        .select(F.sum(F.length("word") * F.col("freq")).alias("n"))
        .collect()[0]["n"]
    )
    assert chars_after == chars_before


def test_train_compresses_monotonically(spark, sf_dir):
    """Each round strictly reduces the total symbol count by exactly
    that round's pair_count (each merge fuses pair_count adjacent
    occurrences into one symbol)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges, wf = bpe.bpe_train(docs, n_merges=3)
    n_syms_final = wf.select(
        F.sum(F.size("syms") * F.col("freq")).alias("n")
    ).collect()[0]["n"]
    n_syms_start = (
        bpe.word_frequencies(docs)
        .select(F.sum(F.length("word") * F.col("freq")).alias("n"))
        .collect()[0]["n"]
    )
    total_merged = sum(r["pair_count"] for r in merges.collect())
    assert n_syms_final == n_syms_start - total_merged


def test_encode_applies_rules_in_order(spark):
    """The encoder is order-sensitive: rules [(a,b),(ab,c)] encode
    'abc' as [abc], while the reversed order cannot (no 'ab' symbol
    exists when (ab,c) runs first)."""
    docs = spark.createDataFrame([(1, "abc abc")], ["doc_id", "text"])
    fwd = bpe.bpe_encode(
        docs, [("a", "b", "ab"), ("ab", "c", "abc")]
    ).collect()
    assert all(r["subwords"] == ["abc"] for r in fwd)
    rev = bpe.bpe_encode(
        docs, [("ab", "c", "abc"), ("a", "b", "ab")]
    ).collect()
    assert all(r["subwords"] == ["ab", "c"] for r in rev)


def test_encode_matches_trained_vocab(spark, sf_dir):
    """Encoding fresh text with the learned rules reproduces the
    trainer's own final word representations (train/inference
    round-trip)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges, wf = bpe.bpe_train(docs, n_merges=5)
    rules = [(r["lhs"], r["rhs"], r["merged"])
             for r in merges.orderBy("merge_rank").collect()]
    enc = (
        bpe.bpe_encode(docs.limit(20), rules)
        .select("word", "subwords")
        .distinct()
    )
    joined = enc.join(
        wf.select("word", F.col("syms").alias("trained")), "word"
    ).collect()
    assert joined and all(
        r["subwords"] == r["trained"] for r in joined
    )


def test_train_exhausts_gracefully(spark):
    """More requested merges than learnable pairs: the loop stops at
    exhaustion instead of emitting degenerate rules."""
    docs = spark.createDataFrame([(1, "ab ab cd")], ["doc_id", "text"])
    merges, wf = bpe.bpe_train(docs, n_merges=10)
    got = merges.orderBy("merge_rank").collect()
    assert [r["merged"] for r in got] == ["ab", "cd"]
    assert {tuple(r["syms"]) for r in wf.collect()} == {("ab",), ("cd",)}


@pytest.mark.parametrize("word,rules,want", [
    ("mississippi", [("s", "s", "ss"), ("ss", "i", "ssi")],
     ["m", "i", "ssi", "ssi", "p", "p", "i"]),
    ("aaaa", [("a", "a", "aa"), ("aa", "aa", "aaaa")], ["aaaa"]),
])
def test_fold_golden(spark, word, rules, want):
    df = spark.createDataFrame([(word,)], ["word"]).select(
        F.split("word", "").alias("syms")
    )
    col = F.col("syms")
    for lhs, rhs, merged in rules:
        col = bpe._merge_fold(col, lhs, rhs, merged)
    assert df.select(col.alias("out")).collect()[0]["out"] == want


def _py_merge(syms, lhs, rhs, merged):
    """Pure-Python reference of the left-to-right non-overlap fold."""
    out = [syms[0]]
    for x in syms[1:]:
        if out[-1] == lhs and x == rhs:
            out[-1] = merged
        else:
            out.append(x)
    return out


def test_fold_matches_python_reference_exhaustively(spark):
    """EVERY word up to length 6 over {a, b} (126 words), under each
    of three rules — including the adversarial self-merge rules
    (a,a) and (b,b) where overlap handling matters most. One Spark
    job per rule; the Python fold is the independent referee."""
    from itertools import product

    words = [
        "".join(p)
        for n in range(1, 7)
        for p in product("ab", repeat=n)
    ]
    df = spark.createDataFrame([(w,) for w in words], ["word"]).select(
        "word", F.split("word", "").alias("syms")
    )
    for lhs, rhs in [("a", "b"), ("a", "a"), ("b", "b")]:
        merged = lhs + rhs
        got = {
            r["word"]: r["out"]
            for r in df.select(
                "word",
                bpe._merge_fold(F.col("syms"), lhs, rhs, merged).alias(
                    "out"
                ),
            ).collect()
        }
        for w in words:
            assert got[w] == _py_merge(list(w), lhs, rhs, merged), (
                w, lhs, rhs, got[w],
            )


def test_batched_transcript_equals_sequential(spark, sf_dir):
    """max_batch>1 must reproduce the fully sequential greedy
    transcript bit-for-bit — the whole point of the transcript-safe
    batch criterion (_select_merge_batch): interacting pairs stop the
    batch, so batching changes the JOB COUNT, never the rules."""
    from bigdata_elephant_spark.operators import bpe
    from bigdata_elephant_spark.sources.corpus import read_table

    docs = read_table(spark, sf_dir, "documents")
    # driver_max_words=0 forces the DISTRIBUTED loop on both arms —
    # the r15 driver twin would otherwise swallow both sides of this
    # comparison (the corpus vocab is far under the gate)
    m_seq, _ = bpe.bpe_train(
        docs, n_merges=40, max_batch=1, driver_max_words=0
    )
    m_bat, _ = bpe.bpe_train(
        docs, n_merges=40, max_batch=16, driver_max_words=0
    )
    assert [tuple(r) for r in m_seq.collect()] == [
        tuple(r) for r in m_bat.collect()
    ]


def test_driver_twin_equals_distributed(spark, sf_dir):
    """The r15 size-gated driver fast path (BPE_DRIVER_MAX_WORDS)
    must reproduce the distributed trainer exactly: same rule table,
    same rewritten vocabulary, same dtypes — on the real corpus and
    on the self-pair/cascade edge the batch criterion trips over."""
    from bigdata_elephant_spark.sources.corpus import read_table

    docs = read_table(spark, sf_dir, "documents")
    m_drv, wf_drv = bpe.bpe_train(docs, n_merges=12)
    m_dst, wf_dst = bpe.bpe_train(docs, n_merges=12, driver_max_words=0)
    assert [tuple(r) for r in m_drv.collect()] == [
        tuple(r) for r in m_dst.collect()
    ]
    key = lambda r: r["word"]  # noqa: E731
    rows_drv = sorted(wf_drv.collect(), key=key)
    rows_dst = sorted(wf_dst.collect(), key=key)
    assert [tuple(r) for r in rows_drv] == [tuple(r) for r in rows_dst]
    assert [f.dataType for f in m_drv.schema] == [
        f.dataType for f in m_dst.schema
    ]
    # the hypothesis-found batching edge (bb/aaa: self-pair creates
    # (aa, a) which outranks (b, b) at equal count) must come out the
    # same from the python twin and the distributed sequential loop
    def train_edge(gate):
        m, _ = bpe.bpe_train(
            spark.createDataFrame(
                [("d1", "bb bb aaa aaa")], ["doc_id", "text"]
            ),
            n_merges=3,
            driver_max_words=gate,
        )
        return [tuple(r) for r in m.collect()]

    assert train_edge(1 << 17) == train_edge(0)


def test_select_merge_batch_criteria():
    """Driver-side unit pins of the batch-selection rules."""
    from bigdata_elephant_spark.operators.bpe import (
        _select_merge_batch,
    )

    def row(lhs, rhs, c):
        return {"lhs": lhs, "rhs": rhs, "pair_count": c}

    known = set("abcdefghijklmnopqrstuvwxyz0123456789")

    # disjoint, strictly dominating pairs batch together
    rows = [row("a", "b", 100), row("c", "d", 90), row("e", "f", 80)]
    got = _select_merge_batch(rows, 8, known, slice_complete=True)
    assert [(g[0], g[1]) for g in got] == [("a", "b"), ("c", "d"),
                                          ("e", "f")]

    # an interacting pair stops the batch (prefix rule)
    rows = [row("a", "b", 100), row("b", "c", 90), row("e", "f", 80)]
    got = _select_merge_batch(rows, 8, known, slice_complete=True)
    assert [(g[0], g[1]) for g in got] == [("a", "b")]

    # dominance: a later member may not tie a pair that shares a
    # symbol with an earlier member (its count could be the source
    # of a created pair's count)
    rows = [row("a", "b", 100), row("a", "c", 90), row("e", "f", 90)]
    got = _select_merge_batch(rows, 8, known, slice_complete=True)
    assert [(g[0], g[1]) for g in got] == [("a", "b")]
    rows = [row("a", "b", 100), row("e", "f", 90), row("a", "c", 90)]
    got = _select_merge_batch(rows, 8, known, slice_complete=True)
    assert [(g[0], g[1]) for g in got] == [("a", "b")]

    # a merged string colliding with an existing symbol can boost
    # existing pairs: it merges alone
    rows = [row("a", "b", 100), row("c", "d", 90)]
    got = _select_merge_batch(rows, 8, known | {"ab"}, True)
    assert [(g[0], g[1]) for g in got] == [("a", "b")]

    # incomplete slice: the floor forbids non-dominant additions
    rows = [row("a", "b", 100), row("c", "d", 100)]
    got = _select_merge_batch(rows, 8, known, slice_complete=False)
    assert [(g[0], g[1]) for g in got] == [("a", "b")]

    # a SELF-pair closes the batch: merging (a,a) over a run creates
    # (aa,a) whose count only (a,a) itself bounds — sequential's next
    # pick may be that created pair (hypothesis counterexample
    # bb/aaa), so nothing may batch behind it
    rows = [row("a", "a", 100), row("c", "d", 90)]
    got = _select_merge_batch(rows, 8, known, slice_complete=True)
    assert [(g[0], g[1]) for g in got] == [("a", "a")]
    # ...but a self-pair may legally be the LAST member
    rows = [row("c", "d", 100), row("a", "a", 90)]
    got = _select_merge_batch(rows, 8, known, slice_complete=True)
    assert [(g[0], g[1]) for g in got] == [("c", "d"), ("a", "a")]


def test_encode_chunked_equals_monolithic(spark):
    """Segmented fold (chunk=2, forcing localCheckpoint boundaries
    mid-rule-list) encodes identically to the single-expression
    plan — chunking is a plan-shape change only."""
    docs = spark.createDataFrame(
        [(1, "abcd abcd xy"), (2, "ab cd abcd")], ["doc_id", "text"]
    )
    rules = [
        ("a", "b", "ab"),
        ("c", "d", "cd"),
        ("ab", "cd", "abcd"),
        ("x", "y", "xy"),
        ("ab", "c", "abc"),  # dead after rule 3; exercises no-ops
    ]
    mono = sorted(
        bpe.bpe_encode(docs, rules, chunk=64).collect(),
        key=lambda r: (r["doc_id"], r["word"]),
    )
    seg = sorted(
        bpe.bpe_encode(docs, rules, chunk=2).collect(),
        key=lambda r: (r["doc_id"], r["word"]),
    )
    assert [r.asDict() for r in mono] == [r.asDict() for r in seg]
