"""Adversarial inputs: unicode, huge docs, randomized as-of."""

from __future__ import annotations

import os

from datetime import datetime, timedelta

import pytest

from hypothesis import (
    HealthCheck, example, given, settings, strategies as st,
)

from pyspark.sql import functions as F

from bigdata_elephant_spark.functions.text import tokenize
from bigdata_elephant_spark.operators import temporal
from bigdata_elephant_spark.operators.dedup import doc_shingles

# ELEPHANT_HYPOTHESIS_EXAMPLES multiplies the default example
# budget for local deep shakes (the r11 lesson: a thin randomized
# draw can ship committed-green over a crashing input class); the
# committed default keeps suite wall time bounded, the documented
# edge classes are pinned as @example regardless.
SETTINGS = settings(
    max_examples=int(
        os.environ.get("ELEPHANT_HYPOTHESIS_EXAMPLES", "6")
    ),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def test_tokenize_unicode_matches_duckdb(spark, duck):
    """The decomposed filterText must agree cross-engine on unicode:
    [a-z0-9] classes are ASCII in both Java regex and RE2, and both
    operate on codepoints, so emoji/CJK/diacritics become spaces."""
    texts = [
        (1, "héllo wörld"),            # diacritics -> split tokens
        (2, "日本語のテキスト mixed ascii"),
        (3, "emoji 😀 test aaaa"),
        (4, "tabs\tand\nnewlines stay whitespace"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["word"]) for r in tokenize(df).collect()
    )
    duck.execute("DROP TABLE IF EXISTS u_docs")
    duck.execute(
        "CREATE TABLE u_docs (doc_id BIGINT, text VARCHAR)"
    )
    duck.executemany(
        "INSERT INTO u_docs VALUES (?, ?)", texts
    )
    repeat4 = " OR ".join(
        f"w LIKE '%{c * 4}%'" for c in "abcdefghijklmnopqrstuvwxyz0123456789"
    )
    expect = sorted(
        tuple(r)
        for r in duck.execute(f"""
            SELECT doc_id, w FROM (
                SELECT doc_id,
                       unnest(string_split_regex(
                           regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
                           '\\s+')) AS w
                FROM u_docs
            ) WHERE w <> ''
              AND NOT regexp_full_match(w, '[0-9]+')
              AND NOT ({repeat4})
        """).fetchall()
    )
    assert got == expect


def test_huge_doc_shingles(spark):
    """A 1 MB document flows through shingling without error and
    yields the expected shingle count."""
    words = " ".join(f"w{i % 997}x" for i in range(150_000))
    df = spark.createDataFrame([(1, words)], "doc_id long, text string")
    n = doc_shingles(df).count()
    assert n == 150_000 - 2  # n_tokens - (shingle_n - 1)


@given(
    n_left=st.integers(1, 15),
    n_right=st.integers(0, 10),
    data=st.data(),
)
@SETTINGS
def test_asof_random_matches_bruteforce(spark, n_left, n_right, data):
    t0 = datetime(2024, 1, 1)
    lefts = [
        (i, data.draw(st.integers(0, 2)),
         t0 + timedelta(minutes=data.draw(st.integers(0, 500))))
        for i in range(n_left)
    ]
    rights = {}
    for j in range(n_right):
        k = data.draw(st.integers(0, 2))
        ts = t0 + timedelta(minutes=data.draw(st.integers(0, 500)))
        rights[(k, ts)] = f"p{j}"  # unique per (key, ts) by dict
    right_rows = [(k, ts, p) for (k, ts), p in rights.items()]
    left_df = spark.createDataFrame(
        lefts, "event_id long, k long, ts timestamp"
    )
    right_df = spark.createDataFrame(
        right_rows or [(99, t0, "none")],
        "rk long, rts timestamp, payload string",
    )
    if not right_rows:
        right_df = right_df.filter(F.lit(False))
    got = {
        r["event_id"]: r["payload"]
        for r in temporal.asof_join(
            left_df, right_df, "k", "rk", "ts", "rts"
        ).collect()
    }
    for (i, k, ts) in lefts:
        cands = [
            (rts, p) for (rk, rts), p in rights.items()
            if rk == k and rts <= ts
        ]
        expect = max(cands)[1] if cands else None
        assert got[i] == expect, (i, k, ts)


@settings(max_examples=25, deadline=None)
@given(
    n_left=st.integers(1, 12),
    n_right=st.integers(0, 12),
    tol=st.one_of(st.none(), st.integers(0, 120)),
    data=st.data(),
)
def test_asof_forward_tolerance_matches_bruteforce(
    spark, n_left, n_right, tol, data
):
    """Forward direction + optional tolerance (minutes as seconds)
    against a brute-force min-following-candidate reference."""
    t0 = datetime(2024, 1, 1)
    lefts = [
        (i, data.draw(st.integers(0, 2)),
         t0 + timedelta(minutes=data.draw(st.integers(0, 500))))
        for i in range(n_left)
    ]
    rights = {}
    for j in range(n_right):
        k = data.draw(st.integers(0, 2))
        ts = t0 + timedelta(minutes=data.draw(st.integers(0, 500)))
        rights[(k, ts)] = f"p{j}"
    right_rows = [(k, ts, p) for (k, ts), p in rights.items()]
    left_df = spark.createDataFrame(
        lefts, "event_id long, k long, ts timestamp"
    )
    right_df = spark.createDataFrame(
        right_rows or [(99, t0, "none")],
        "rk long, rts timestamp, payload string",
    )
    if not right_rows:
        right_df = right_df.filter(F.lit(False))
    tol_s = None if tol is None else tol * 60
    got = {
        r["event_id"]: r["payload"]
        for r in temporal.asof_join(
            left_df, right_df, "k", "rk", "ts", "rts",
            direction="forward", tolerance_s=tol_s,
        ).collect()
    }
    for (i, k, ts) in lefts:
        cands = [
            (rts, p) for (rk, rts), p in rights.items()
            if rk == k and rts >= ts
            and (tol_s is None
                 or (rts - ts).total_seconds() <= tol_s)
        ]
        expect = min(cands)[1] if cands else None
        assert got[i] == expect, (i, k, ts, tol_s)


def test_new_operators_on_empty_inputs(spark):
    """Degenerate-input sweep for the round-2 operators: empty frames
    must produce empty (or identity) results, never crash — the
    guarantee a scheduled 100 TB pipeline needs when one partition
    of the lake is legitimately empty."""
    from pyspark.sql import functions as F

    from bigdata_elephant_spark.operators import (
        layout,
        multimodal,
        reconcile,
        similarity,
        skew,
    )
    from bigdata_elephant_spark.operators.merge import scd2_history
    from bigdata_elephant_spark.operators.sampling import (
        mixture_rebalance,
    )
    from bigdata_elephant_spark.operators.sketches import (
        cms_counts,
        cms_point_estimate,
    )

    empty_docs = spark.createDataFrame([], "doc_id long, media binary")
    assert multimodal.ahash_hashes(empty_docs).count() == 0
    hashes = spark.createDataFrame(
        [], "doc_id long, h_hi long, h_lo long"
    )
    assert multimodal.phash_near_dup_pairs(hashes).count() == 0

    emb = spark.createDataFrame(
        [], "vec_id long, embedding array<float>"
    )
    assert similarity.pq_codebooks(emb).count() == 0
    assert similarity.kmeanspp_seeds(emb, 4).count() == 0

    ev = spark.createDataFrame(
        [], "user_id long, ts long, event_id long, state string"
    )
    assert scd2_history(ev, ["user_id"], ["ts", "event_id"]).count() == 0

    e = spark.createDataFrame([], "k long, v string")
    assert reconcile.table_diff(e, e, ["k"]).count() == 0

    assert cms_counts(e, "k").count() == 0
    est = cms_point_estimate(
        cms_counts(e, "k"), spark.createDataFrame([(1,)], "k long"), "k"
    )
    # empty sketch -> every probed key correctly estimates 0 (the
    # r5 left-join fix; the old inner join dropped the key entirely)
    assert [(r["k"], r["est"]) for r in est.collect()] == [(1, 0)]

    assert mixture_rebalance(
        spark.createDataFrame([], "doc_id long, stratum string"),
        "stratum", {"a": 1.0}, 10, "doc_id",
    ).count() == 0

    manifest = spark.createDataFrame([], "unit string, bytes long")
    assert layout.compaction_plan(manifest, 100).count() == 0

    big = spark.createDataFrame([], "k long, x long")
    small = spark.createDataFrame([], "k long, y long")
    assert skew.salted_join(big, small, "k").count() == 0


@given(
    sizes=st.lists(st.integers(1, 12), min_size=1, max_size=4),
    weights=st.lists(
        st.integers(1, 5), min_size=1, max_size=4
    ),
    n_out=st.integers(1, 60),
)
@example(sizes=[1], weights=[1], n_out=1)
@example(sizes=[1], weights=[5], n_out=60)
@SETTINGS
def test_mixture_rebalance_quota_property(spark, sizes, weights, n_out):
    """For ANY strata sizes / weights / target: per-stratum output
    hits round(n_out * weight) exactly, per-doc copies are within one
    of each other inside a stratum, and epochs per doc are dense
    1..copies."""
    from collections import Counter

    from bigdata_elephant_spark.operators.sampling import (
        mixture_rebalance,
    )

    k = min(len(sizes), len(weights))
    sizes, weights = sizes[:k], weights[:k]
    total_w = sum(weights)
    wmap = {f"s{i}": w / total_w for i, w in enumerate(weights)}
    rows = [
        (i * 1000 + j, f"s{i}")
        for i, n in enumerate(sizes)
        for j in range(n)
    ]
    df = spark.createDataFrame(rows, "doc_id long, stratum string")
    out = mixture_rebalance(df, "stratum", wmap, n_out, "doc_id").collect()

    per_stratum = Counter(r["stratum"] for r in out)
    for s, w in wmap.items():
        assert per_stratum.get(s, 0) == int(round(n_out * w)), (s, wmap)
    per_doc = Counter((r["stratum"], r["doc_id"]) for r in out)
    for i, s in enumerate(f"s{i}" for i in range(k)):
        copies = [per_doc.get((s, i * 1000 + j), 0)
                  for j in range(sizes[i])]
        if copies:
            assert max(copies) - min(copies) <= 1, (s, copies)
    for (s, doc), n in per_doc.items():
        epochs = sorted(
            r["epoch"] for r in out
            if r["stratum"] == s and r["doc_id"] == doc
        )
        assert epochs == list(range(1, n + 1))


def test_round3_operators_on_empty_inputs(spark):
    """Degenerate-input sweep for the round-3 operators."""
    from bigdata_elephant_spark.operators import curation
    from bigdata_elephant_spark.operators.sketches import (
        bloom_bits,
        bloom_probe,
        bottomk_quantiles,
    )

    empty_docs = spark.createDataFrame(
        [], "doc_id long, text string, source string"
    )
    assert curation.surprisal_band_sample(empty_docs).count() == 0
    assert curation.source_overlap_matrix(empty_docs).count() == 0
    assert curation.token_budget_selection(empty_docs, 100).count() == 0

    emb = spark.createDataFrame(
        [], "vec_id long, label int, embedding array<float>"
    )
    assert curation.embedding_outliers(emb).count() == 0

    e = spark.createDataFrame([], "k long, x double")
    assert bottomk_quantiles(e, "k", "x", (0.5,)).count() == 0
    bits = bloom_bits(e, "k")
    assert bits.count() == 0
    # probing an empty filter: every probe key is a clean miss
    probe = spark.createDataFrame([(1,), (2,)], "k long")
    rows = bloom_probe(probe, "k", bits).collect()
    assert len(rows) == 2 and not any(r["bloom_hit"] for r in rows)


def test_round3_batch2_operators_on_empty_inputs(spark):
    """Degenerate-input sweep for the second round-3 batch: empty
    frames produce empty results, never crash."""
    from bigdata_elephant_spark.operators import (
        curation,
        robust,
        sequences,
    )
    from bigdata_elephant_spark.operators.sampling import (
        neyman_allocation_sample,
    )
    from bigdata_elephant_spark.operators.similarity import (
        cosine_topk_batch,
        ivfpq_topk,
    )
    from bigdata_elephant_spark.operators.sketches import (
        kmv_pairwise_setops,
    )
    from bigdata_elephant_spark.operators.textstats import (
        bigram_surprisal_scores,
        hashed_doc_vectors,
    )

    ev = spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    assert sequences.event_transitions(ev).count() == 0
    assert sequences.concurrency_timeline(ev).count() == 0
    assert (
        kmv_pairwise_setops(ev, "user_id", "event_type", 8).count()
        == 0
    )
    assert (
        robust.mad_outliers(
            ev, "event_type", "value", "event_id"
        ).count()
        == 0
    )

    docs = spark.createDataFrame(
        [], "doc_id long, text string, source string, n_chars long"
    )
    assert curation.temperature_mixture(docs, 0.5, 0.3).count() == 0
    assert curation.quality_logit_scores(docs).count() == 0
    assert hashed_doc_vectors(docs).count() == 0
    assert bigram_surprisal_scores(docs).count() == 0
    groups = spark.createDataFrame([], "doc_id long, group_id long")
    assert curation.dedup_survivors(groups, docs).count() == 0

    orders = spark.createDataFrame(
        [],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string",
    )
    assert (
        neyman_allocation_sample(
            orders, "o_orderpriority", "o_totalprice",
            "o_orderkey", 10,
        ).count()
        == 0
    )

    emb = spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    )
    assert cosine_topk_batch(emb, [0, 1], k=5).count() == 0
    assert ivfpq_topk(emb, 0, k=5).count() == 0


def test_round4_operators_on_empty_and_degenerate_inputs(spark):
    """Round-4 operators on empty / degenerate inputs: no crashes,
    sensible empties."""
    from bigdata_elephant_spark.operators.dedup import (
        ngram_contamination,
    )
    from bigdata_elephant_spark.operators.graph import (
        pagerank,
        triangle_counts,
    )
    from bigdata_elephant_spark.operators import multimodal as mm

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id long, text string"
    )
    # empty eval set: nothing can leak, rates all zero
    out = ngram_contamination(docs, empty_docs).collect()
    assert [(r.n_overlap, r.flagged) for r in out] == [(0, False)]
    # empty train set: empty result
    assert ngram_contamination(empty_docs, docs).count() == 0
    # degree-ordered triangles on an empty pair list
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert triangle_counts(pairs, degree_ordered=True).count() == 0
    # dangling handling on a graph that is ALL dangling targets
    # (single edge): ranks stay finite and sum to 1
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    ranks = pagerank(e, iterations=3, handle_dangling=True).collect()
    assert abs(sum(r["rank"] for r in ranks) - 1.0) < 1e-5
    # truncated P6 header fails the task with a parse error, not a
    # hang or a silent zero vector
    bad = spark.createDataFrame(
        [(1, bytearray(b"P6\n10 10"))], "doc_id long, media binary"
    )
    import pytest as _pt

    with _pt.raises(Exception, match="truncated|netpbm"):
        mm.decode_media(bad, fake=False).collect()


def test_round5_operators_on_empty_and_degenerate_inputs(spark):
    """Round-5 operators on empty / degenerate inputs: no crashes,
    sensible empties."""
    from bigdata_elephant_spark.operators.index import build_index
    from bigdata_elephant_spark.operators.search import (
        bm25_search_batch,
    )
    from bigdata_elephant_spark.operators.vocab import build_vocabulary

    docs = spark.createDataFrame(
        [(1, "u", "t", "alpha beta gamma"),
         (2, "u", "t", "beta gamma delta")],
        "doc_id long, url string, title string, text string",
    )
    vocab = build_vocabulary(docs)
    postings = build_index(docs, vocab)
    # empty batch: empty result with the full output schema
    out = bm25_search_batch(spark, {}, vocab, postings, k=3)
    assert out.columns == ["query_id", "doc_id", "score", "rank"]
    assert out.count() == 0
    # batch where every query is filtered to nothing
    assert (
        bm25_search_batch(
            spark, {1: "1234", 2: "!!!"}, vocab, postings, k=3
        ).count()
        == 0
    )
    # k=1 returns exactly one row per matching query
    rows = bm25_search_batch(
        spark, {5: "alpha", 6: "delta"}, vocab, postings, k=1
    ).collect()
    assert sorted((r.query_id, r.rank) for r in rows) == [(5, 1), (6, 1)]


def test_ivf_batch_degenerate_inputs(spark, sf_dir):
    """Batched IVF on degenerate probe sets: unknown ids and empty
    batches produce empty results, not crashes."""
    from bigdata_elephant_spark.operators.similarity import (
        ivf_topk_batch,
    )
    from bigdata_elephant_spark.sources.corpus import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    # no such query ids -> empty, full schema
    out = ivf_topk_batch(emb, [10**9, 10**9 + 1], n_cells=4, k=3)
    assert out.columns == ["q_id", "vec_id", "cos_sim"]
    assert out.count() == 0
    # empty probe set -> empty
    assert ivf_topk_batch(emb, [], n_cells=4, k=3).count() == 0
    # k larger than any cell population -> bounded, not padded
    rows = ivf_topk_batch(
        emb, [0], n_cells=4, n_probe=4, k=10**6
    ).collect()
    assert 0 < len(rows) < 10**6


@pytest.mark.slow  # ~30s of degenerate-input sweeps (driver-run budget)
def test_dedup_guard_operators_on_empty_and_degenerate_inputs(spark):
    """The r10/r11 mega-bucket-guard surface on empty / degenerate
    inputs: no crashes, sensible empties, schemas intact. Degenerate
    here means the inputs a real ingest hits on day one — an empty
    corpus, a corpus entirely below the shingle width, a single
    document, an all-identical cluster (star edges only, no pair
    blowup)."""
    from bigdata_elephant_spark.operators import dedup, similarity

    schema = "doc_id long, text string"
    empty = spark.createDataFrame([], schema)
    short = spark.createDataFrame(
        [(1, "too short"), (2, "also short")], schema
    )  # < DEFAULT_SHINGLE_N (=3) tokens: below the MinHash domain
    one = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")], schema
    )

    for docs in (empty, short):
        sigs = dedup.minhash_signatures(docs)
        assert sigs.count() == 0
        assert dedup.lsh_candidate_edges(sigs).count() == 0
        reps = dedup.signature_reps(sigs)
        assert reps.count() == 0
        assert "n_members" in reps.columns
        # empty delta vs empty corpus, both API shapes
        assert dedup.incremental_dedup_edges(sigs, sigs).count() == 0
        assert dedup.incremental_dedup_edges(
            sigs, reps, corpus_is_reps=True, materialize=False
        ).count() == 0
    cmap = dedup.exact_dedup_map(empty)
    assert cmap.count() == 0
    assert cmap.columns == ["doc_id", "canonical_doc_id"]

    # one doc: no pairs, no edges, rep maps to itself
    sigs1 = dedup.minhash_signatures(one)
    assert dedup.lsh_candidate_edges(sigs1).count() == 0
    reps1 = dedup.signature_reps(sigs1)
    assert [
        (r.doc_id, r.n_members) for r in reps1.collect()
    ] == [(1, 1)]
    # a real delta against an EMPTY corpus admits everything quietly
    empty_reps = dedup.signature_reps(dedup.minhash_signatures(empty))
    assert dedup.incremental_dedup_edges(
        sigs1, empty_reps, corpus_is_reps=True, materialize=False
    ).count() == 0

    # embedding twins
    eschema = "vec_id long, embedding array<float>"
    e_empty = spark.createDataFrame([], eschema)
    assert similarity.semantic_dedup_edges(
        e_empty, 0.9, n_cells=4
    ).count() == 0
    planes = similarity.hyperplanes(3, 4)
    assert similarity.near_dup_edges(
        e_empty, 0.9, planes=planes
    ).count() == 0
    e_one = spark.createDataFrame([(7, [1.0, 0.0, 0.0, 0.0])], eschema)
    assert similarity.semantic_dedup_edges(
        e_one, 0.9, n_cells=4
    ).count() == 0
    # all-identical: exactly n-1 star edges from the min id
    e_same = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(6)], eschema
    )
    star = similarity.semantic_dedup_edges(
        e_same, 0.9, n_cells=2
    ).collect()
    assert sorted((r.id_a, r.id_b) for r in star) == [
        (0, b) for b in range(1, 6)
    ]


def test_ansi_division_audit_degenerate_inputs(spark, tmp_path):
    """r12 ANSI-division audit (VERDICT r11 item 5): the three
    divisions whose divisor is NOT structurally nonzero, each probed
    with the degenerate-but-legal input that used to raise.

    1. pagerank on an EMPTY edge set (a dedup graph with zero
       duplicate pairs): 1/N was a driver-side ZeroDivisionError.
    2. weighted_sample_keys with w <= 0 (a zero-priced order):
       ln(u)/0 raised ANSI DIVIDE_BY_ZERO; the key is now NULL and
       the weighted_sample_orders consumer filters w > 0.
    3. label_centroid_similarity with a label whose members average
       to the zero vector (v and -v): the centroid cosine raised;
       zero-norm centroids now drop (the similarity filter
       contract), oracle carrying the same predicate.
    """
    from pyspark.sql import functions as F

    from bigdata_elephant_spark.operators.graph import pagerank
    from bigdata_elephant_spark.operators.sampling import (
        weighted_sample_keys,
    )
    from bigdata_elephant_spark.plans.pipeline_queries import (
        q_label_centroid_similarity,
    )

    # 1. empty graph -> typed empty result, not ZeroDivisionError
    empty_edges = spark.createDataFrame([], "src long, dst long")
    got = pagerank(empty_edges, iterations=2)
    assert got.columns == ["node", "rank"]
    assert got.count() == 0

    # 2. zero / negative weights -> NULL key, positive rows keyed
    df = spark.createDataFrame(
        [(1, 2.0), (2, 0.0), (3, -1.0)], "id long, w double"
    )
    rows = {
        r["id"]: r["k"]
        for r in df.select(
            "id", weighted_sample_keys("id", "w").alias("k")
        ).collect()
    }
    assert rows[1] is not None and rows[1] < 0  # ln(u)/w, u in (0,1]
    assert rows[2] is None and rows[3] is None

    # 3. label 7's centroid is the zero vector -> pairs with it drop;
    # the surviving 8-9 pair still scores
    import pandas as pd

    d = str(tmp_path)
    pd.DataFrame(
        {
            "vec_id": [0, 1, 2, 3],
            "embedding": [
                [1.0, 2.0], [-1.0, -2.0], [3.0, 1.0], [0.0, 2.0],
            ],
            "label": [7, 7, 8, 9],
        }
    ).to_parquet(f"{d}/embeddings.parquet")
    out = q_label_centroid_similarity(spark, d).collect()
    assert [(r.la, r.lb) for r in out] == [(8, 9)]
    assert all(r.cos_sim is not None for r in out)


def test_embedding_validity_classes(spark):
    """Direct class check for the finite-floats ingest gate (r12
    verdict item 4): one row per declared validity class, including
    the edges — empty vector, NULL element, -0.0-only vector."""
    from bigdata_elephant_spark.operators.similarity import (
        embedding_validity,
        quarantine_embeddings,
    )

    nan, inf = float("nan"), float("inf")
    rows = [
        (0, [1.0, 2.0, 3.0, 4.0]),        # ok
        (1, None),                         # null
        (2, [1.0, 2.0]),                   # wrong_dim
        (3, [nan, 1.0, 1.0, 1.0]),         # nonfinite (NaN)
        (4, [1.0, inf, 1.0, 1.0]),         # nonfinite (+Inf)
        (5, [1.0, -inf, 1.0, 1.0]),        # nonfinite (-Inf)
        (6, [1.0, None, 1.0, 1.0]),        # nonfinite (NULL element)
        (7, [0.0, 0.0, 0.0, 0.0]),         # zero
        (8, [0.0, -0.0, 0.0, 0.0]),        # zero (-0.0 == 0.0)
        (9, []),                           # wrong_dim (empty, dim=4)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    got = {
        r.vec_id: r.validity
        for r in embedding_validity(emb, expected_dim=4).collect()
    }
    assert got == {
        0: "ok", 1: "null", 2: "wrong_dim", 3: "nonfinite",
        4: "nonfinite", 5: "nonfinite", 6: "nonfinite", 7: "zero",
        8: "zero", 9: "wrong_dim",
    }
    # without expected_dim the dim checks disappear; the empty vector
    # degrades to zero (its norm is 0), short vectors classify on
    # their contents
    got_nodim = {
        r.vec_id: r.validity
        for r in embedding_validity(emb).collect()
    }
    assert got_nodim[2] == "ok" and got_nodim[9] == "zero"
    clean, quar = quarantine_embeddings(emb, expected_dim=4)
    assert [r.vec_id for r in clean.collect()] == [0]
    assert "validity" not in clean.columns
    assert quar.count() == 9


def test_document_validity_classes(spark):
    """Direct class check for the document ingest gate — the text-side
    twin of the embedding gate: one row per declared class, including
    NULL n_chars (a metadata break, not 'ok')."""
    from bigdata_elephant_spark.operators.curation import (
        document_validity,
        quarantine_documents,
    )

    rows = [
        (0, "good text", "en", "s0", 9),          # ok
        (1, None, "en", "s0", 4),                  # null_text
        (2, "   ", "en", "s0", 3),                 # blank
        (3, "", "en", "s0", 0),                    # blank (empty)
        (7, "\t\n \t", "en", "s0", 4),             # blank (tab/newline)
        (4, "bad � decode", "en", "s0", 12),  # mojibake
        (5, "short", "en", "s0", 99),              # length_mismatch
        (6, "no meta", "en", "s0", None),          # length_mismatch
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    got = {
        r.doc_id: r.validity for r in document_validity(docs).collect()
    }
    assert got == {
        0: "ok", 1: "null_text", 2: "blank", 3: "blank",
        4: "mojibake", 5: "length_mismatch", 6: "length_mismatch",
        7: "blank",
    }
    clean, quar = quarantine_documents(docs)
    assert [r.doc_id for r in clean.collect()] == [0]
    assert "validity" not in clean.columns
    assert quar.count() == 7
    from bigdata_elephant_spark.operators.curation import (
        DOC_VALIDITY_CLASSES,
    )
    assert set(got.values()) == set(DOC_VALIDITY_CLASSES)


# the blank class is an EXPLICIT character class (engine-portable; see
# document_validity) — this reference predicate must stay identical
_BLANK_CHARS = set(" \t\n\r\f\x0b")


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                min_codepoint=0, max_codepoint=0x24FF
            ),
            max_size=20,
        ),
        min_size=1,
        max_size=8,
    )
)
@example(texts=["\x0b\x0b"])   # vertical tab: the \s-class divergence
@example(texts=[" "])     # NBSP: NOT blank by the declared class
@example(texts=["", " \t\n", "�", "a�b", "plain"])
@SETTINGS
def test_document_validity_matches_reference_on_unicode(spark, texts):
    """document_validity over arbitrary BMP unicode equals a
    pure-python reference of the declared contract (n_chars planted
    consistent, so only null/blank/mojibake/ok can fire): the regex
    class and the length semantics hold beyond the oracle's planted
    ASCII classes."""
    from bigdata_elephant_spark.operators.curation import (
        document_validity,
    )

    rows = [
        (i, t, "xx", "s0", len(t)) for i, t in enumerate(texts)
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    got = {
        r.doc_id: r.validity
        for r in document_validity(docs).collect()
    }

    def ref(t):
        if all(c in _BLANK_CHARS for c in t):  # '' is blank too
            return "blank"
        if "�" in t:
            return "mojibake"
        return "ok"

    assert got == {i: ref(t) for i, t in enumerate(texts)}
