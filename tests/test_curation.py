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


# ---------------------------------- DSIR importance resampling


def _h32_py(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _dsir_expected(corpus, target_ids, m):
    """Fully-unrolled Python replica of the DSIR score pipeline."""
    from bigdata_elephant_spark.functions.text import tokenize_str

    doc_b: dict[int, dict[int, int]] = {}
    for doc_id, text in corpus:
        toks = tokenize_str(text)
        grams = toks + [
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        ]
        if not grams:
            continue
        h = doc_b.setdefault(doc_id, {})
        for g in grams:
            b = _h32_py(g) % m
            h[b] = h.get(b, 0) + 1
    qc: dict[int, int] = {}
    pc: dict[int, int] = {}
    for doc_id, h in doc_b.items():
        for b, c in h.items():
            qc[b] = qc.get(b, 0) + c
            if doc_id in target_ids:
                pc[b] = pc.get(b, 0) + c
    qt, pt = sum(qc.values()), sum(pc.values())
    lam = {
        b: round(
            math.log(pc.get(b, 0) + 1)
            - math.log(pt + m)
            - math.log(qc[b] + 1)
            + math.log(qt + m),
            6,
        )
        for b in qc
    }
    return {
        doc_id: (
            sum(h.values()),
            round(sum(c * lam[b] for b, c in h.items()), 6),
        )
        for doc_id, h in doc_b.items()
    }


_DSIR_CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox naps near the lazy dog"),
    (3, "stock ticker closes up on earnings call report"),
    (4, "ticker tape earnings report stock stock stock"),
    (5, "1234 !!!! aaaa"),  # every token filtered: no feature mass
]


def test_dsir_scores_match_bruteforce(spark):
    m = 8  # small bucket count forces collisions through the math
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in _DSIR_CORPUS]
    )
    tgt = spark.createDataFrame([Row(doc_id=1)])
    got = {
        r["doc_id"]: (r["n_grams"], r["logw"])
        for r in curation.dsir_scores(docs, tgt, m=m).collect()
    }
    assert got == _dsir_expected(_DSIR_CORPUS, {1}, m)


def test_dsir_select_prefers_target_like_docs(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in _DSIR_CORPUS]
    )
    tgt = spark.createDataFrame([Row(doc_id=1)])
    top = curation.dsir_select(docs, tgt, n=2).collect()
    # doc 2 shares almost all its grams with the target doc 1; the
    # finance docs 3/4 share none — the target pair must lead
    assert {r["doc_id"] for r in top} == {1, 2}
    # filtered-out doc 5 is absent entirely
    all_ids = {
        r["doc_id"]
        for r in curation.dsir_scores(docs, tgt).collect()
    }
    assert 5 not in all_ids and all_ids == {1, 2, 3, 4}


def test_dsir_gumbel_is_reproducible_and_exact(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in _DSIR_CORPUS]
    )
    tgt = spark.createDataFrame([Row(doc_id=1)])
    a = curation.dsir_gumbel_sample(docs, tgt, n=3).collect()
    b = curation.dsir_gumbel_sample(docs, tgt, n=3).collect()
    assert a == b  # derandomized: reruns are byte-identical
    for r in a:
        u = (_h32_py(f"{r['doc_id']}:dsir") + 1) / (2**32 + 1)
        assert r["gkey"] == round(
            r["logw"] - math.log(-math.log(u)), 6
        )


def test_dsir_incremental_scores_unseen_buckets(spark):
    """A delta doc hashing into buckets with ZERO base-corpus mass
    must still be scored — the frozen full-domain λ gives unseen
    buckets the smoothed ln((qt+m)/(pt+m)), it does not drop them
    (the LEFT+coalesce sketch-probe rule)."""
    m = 8
    base_corpus = [(1, "cat dog cat dog"), (2, "cat dog")]
    base = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in base_corpus]
    )
    tgt = spark.createDataFrame([Row(doc_id=1)])
    lam_df = curation.dsir_bucket_logratios(
        curation.dsir_doc_buckets(base, m), tgt, m, full_domain=True
    )
    lam = {r["b"]: float(r["lam"]) for r in lam_df.collect()}
    assert set(lam) == set(range(m))  # full domain materialized

    # replicate λ by hand from base counts
    qc: dict[int, int] = {}
    pc: dict[int, int] = {}
    from bigdata_elephant_spark.functions.text import tokenize_str

    for doc_id, text in base_corpus:
        toks = tokenize_str(text)
        for g in toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]:
            b = _h32_py(g) % m
            qc[b] = qc.get(b, 0) + 1
            if doc_id == 1:
                pc[b] = pc.get(b, 0) + 1
    qt, pt = sum(qc.values()), sum(pc.values())
    for b in range(m):
        assert lam[b] == round(
            math.log(pc.get(b, 0) + 1)
            - math.log(pt + m)
            - math.log(qc.get(b, 0) + 1)
            + math.log(qt + m),
            6,
        )

    # delta doc with grams disjoint from the base vocabulary
    delta = spark.createDataFrame(
        [Row(doc_id=99, text="zebra quokka axolotl")]
    )
    got = curation.dsir_score_against(delta, lam_df, m).collect()
    assert len(got) == 1 and got[0]["doc_id"] == 99
    toks = tokenize_str("zebra quokka axolotl")
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    exp = round(
        sum(
            round(lam[_h32_py(g) % m], 6) for g in grams
        ),
        6,
    )
    assert got[0]["n_grams"] == len(grams)
    assert got[0]["logw"] == exp


def test_curate_pipeline_ignores_subshingle_exact_dups(spark):
    """MinHash-domain equivalence of the exact pre-collapse (r10
    review finding): documents with fewer than shingle_n tokens have
    no signature, so the all-pairs formulation (and the oracle) can
    never group them — the pipeline's exact-dup star edges must not
    group them either, even when their texts are identical. Long
    identical docs DO collapse (one canonical survives)."""
    short = "hello world"  # 2 tokens: below the 3-token shingle floor
    long_txt = (
        "the quick brown fox jumps over the lazy dog near the "
        "river bank while reading long form prose about engines"
    )
    # one source per doc: the final temperature mixture is then
    # uniform and frac_out=1.0 selects every surviving doc, so the
    # only drops observable here come from dedup survivorship
    rows = [
        (1, short, "s1", len(short)),
        (2, short, "s2", len(short)),
        (3, long_txt, "s3", len(long_txt)),
        (4, long_txt, "s4", len(long_txt)),
        (5, "completely different text about spark shuffles and "
            "partition pruning in columnar scans today", "s5", 95),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    )
    # precondition: every doc passes the quality keep filter, so the
    # only drops can come from dedup survivorship
    kept = {
        r.doc_id
        for r in curation.quality_logit_scores(docs)
        .filter("keep")
        .collect()
    }
    assert kept == {1, 2, 3, 4, 5}

    selected = {
        r.doc_id
        for r in curation.curate_pipeline(docs, frac_out=1.0).collect()
    }
    assert {1, 2} <= selected  # sub-shingle dups both kept
    # the long identical pair collapses to its canonical (doc 3 wins
    # the longest-then-lowest-id election)
    assert 3 in selected and 4 not in selected
    assert 5 in selected


def test_curate_pipeline_behind_quarantine_drops_broken_rows(spark):
    """r14 production wiring (r13 verdict item 2): the registry's
    curate_corpus / llm_pipeline_e2e chains now start at
    quarantine_documents, so out-of-contract rows (null text, blank,
    mojibake, n_chars drift) can never reach the tokenizer, the
    dedup grouper, or the mixture — and on a clean corpus the gate
    is a provable no-op (the driver parity gate re-proves that at
    sf0.01). This pins the composition the queries run."""
    good = [
        (1, "the quick brown fox jumps over the lazy dog near the "
            "river bank while reading long form prose about engines",
         "s1"),
        (2, "completely different text about spark shuffles and "
            "partition pruning in columnar scans today", "s2"),
    ]
    broken = [
        (10, None, "s1"),                      # null_text
        (11, " \t\n", "s2"),                   # blank
        (12, "mangled � decode", "s1"),   # mojibake
    ]
    rows = [(i, t, s, len(t)) for i, t, s in good] + [
        (i, t, s, 0 if t is None else len(t)) for i, t, s in broken
    ]
    # one length_mismatch row: payload fine, metadata drifted
    rows.append((13, "fine text but wrong n_chars counter", "s2", 7))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    )
    clean, quarantined = curation.quarantine_documents(docs)
    assert {r.doc_id for r in clean.collect()} == {1, 2}
    assert {r.doc_id for r in quarantined.collect()} == {10, 11, 12, 13}
    # the gated chain (what q_llm_pipeline_e2e composes) equals the
    # chain over the in-contract rows alone and never surfaces a
    # quarantined id
    gated = {
        r.doc_id
        for r in curation.curate_pipeline(clean, frac_out=1.0).collect()
    }
    direct = {
        r.doc_id
        for r in curation.curate_pipeline(
            docs.filter("doc_id < 10"), frac_out=1.0
        ).collect()
    }
    assert gated == direct
    assert gated & {10, 11, 12, 13} == set()
