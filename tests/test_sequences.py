"""Unit/property tests for event-sequence operators
(operators/sequences.py) and the round-3 curation/similarity
additions (temperature mixture, quality scores, dedup survivors,
batch kNN)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bigdata_elephant_spark.operators import curation, sequences
from bigdata_elephant_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_batch,
)
from bigdata_elephant_spark.sources.corpus import read_table


def _events(spark, sf_dir):
    return read_table(spark, sf_dir, "events")


def test_transition_probabilities_row_normalized(spark, sf_dir):
    out = sequences.event_transitions(_events(spark, sf_dir))
    rowsums = (
        out.groupBy("from_type")
        .agg(F.sum("p").alias("s"), F.sum("n").alias("n"))
        .collect()
    )
    assert rowsums
    for r in rowsums:
        # per-row probabilities are rounded to 6 decimals, so the
        # row sum is 1 within #targets * 5e-7
        assert abs(r["s"] - 1.0) < 1e-4
        assert r["n"] > 0


def test_transitions_match_bruteforce(spark, sf_dir):
    ev = _events(spark, sf_dir).select(
        "user_id", "ts", "event_id", "event_type"
    )
    rows = sorted(
        ev.collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    expect: dict[tuple[str, str], int] = {}
    for a, b in zip(rows, rows[1:]):
        if a.user_id == b.user_id:
            k = (a.event_type, b.event_type)
            expect[k] = expect.get(k, 0) + 1
    got = {
        (r.from_type, r.to_type): r.n
        for r in sequences.event_transitions(ev).collect()
    }
    assert got == expect


def test_concurrency_matches_bruteforce(spark):
    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        # (start offset seconds, duration seconds)
        (0, 3600),      # spans 10:00-11:00
        (60, 120),      # 10:01-10:03
        (90, 10),       # overlap -> 3 concurrent at 10:01:30
        (7200, 0),      # zero-length at 12:00 (never active)
        (7300, 100),    # 12:01:40-12:03:20
    ]
    ev = spark.createDataFrame(
        [
            (i, base + dt.timedelta(seconds=s), 1, "x", float(d), "")
            for i, (s, d) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    got = {
        r.hour: r.max_concurrent
        for r in sequences.concurrency_timeline(ev).collect()
    }
    # brute force: sweep all edges in (t, delta) order
    edges = []
    for i, (s, d) in enumerate(rows):
        t0 = base + dt.timedelta(seconds=s)
        edges.append((t0, 1))
        edges.append((t0 + dt.timedelta(seconds=d), -1))
    edges.sort(key=lambda e: (e[0], e[1]))
    level, expect = 0, {}
    for t, d in edges:
        h = t.replace(minute=0, second=0)
        if h not in expect:
            expect[h] = level  # hour's entering (carry-in) level
        level += d
        expect[h] = max(expect[h], level)
    assert got == expect
    assert got[base] == 3  # the 10:00 hour peaks at 3 concurrent
    # the 11:00 hour holds only the end edge of the 10:00-11:00
    # session: its peak is the carried-in level 1, not the
    # post-drop 0 — the carry-in fix this asserts
    assert got[base.replace(hour=11)] == 1


def test_temperature_mixture_uniform_at_alpha_one(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    out = curation.temperature_mixture(docs, alpha=1.0, frac_out=0.25)
    rates = {
        r.source: r.rate
        for r in out.select("source", "rate").distinct().collect()
    }
    # alpha=1 keeps the natural mix: every source samples at the
    # global budget fraction
    assert rates
    for v in rates.values():
        assert abs(v - 0.25) < 1e-6


def test_temperature_mixture_flattens_sources(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    sizes = {
        r.source: r.n
        for r in docs.groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    if len(sizes) < 2:
        return
    big = max(sizes, key=sizes.get)
    small = min(sizes, key=sizes.get)
    out = curation.temperature_mixture(docs, alpha=0.3, frac_out=0.2)
    rates = {
        r.source: r.rate
        for r in out.select("source", "rate").distinct().collect()
    }
    # alpha<1 up-weights small sources: their keep-rate must be at
    # least the big source's
    if big in rates and small in rates and sizes[big] > sizes[small]:
        assert rates[small] >= rates[big]


def test_quality_scores_bounded_and_keep_consistent(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    out = curation.quality_logit_scores(docs)
    bad = out.filter(
        (F.col("quality") < 0)
        | (F.col("quality") > 1)
        | (
            F.col("keep")
            != (F.col("quality") >= curation.QUALITY_THRESHOLD)
        )
    ).count()
    assert bad == 0
    assert out.count() == docs.count()


def test_dedup_survivors_one_canonical_per_group(spark):
    groups = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "doc_id long, group_id long",
    )
    docs = spark.createDataFrame(
        [(1, 50), (2, 80), (3, 80), (10, 5), (11, 5)],
        "doc_id long, n_chars long",
    )
    out = curation.dedup_survivors(groups, docs).collect()
    canon = {r.group_id: r.doc_id for r in out if r.is_canonical}
    # longest wins; ties break to the lowest doc_id
    assert canon == {1: 2, 10: 10}
    per_group = {}
    for r in out:
        per_group.setdefault(r.group_id, 0)
        per_group[r.group_id] += int(r.is_canonical)
    assert all(v == 1 for v in per_group.values())


def test_batch_knn_matches_single_query(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    qids = [0, 7]
    batch = cosine_topk_batch(emb, qids, k=5)
    for qid in qids:
        single = {
            (r.vec_id, r.cos_sim)
            for r in cosine_topk(emb, qid, k=5).collect()
        }
        got = {
            (r.vec_id, r.cos_sim)
            for r in batch.filter(F.col("q_id") == qid).collect()
        }
        assert got == single


def test_rrf_fuse_handcrafted(spark):
    from bigdata_elephant_spark.operators.search import rrf_fuse

    a = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(3, 1), (4, 2)], "doc_id long, rank int"
    )
    out = {
        r.doc_id: r.rrf for r in rrf_fuse([a, b], k=10).collect()
    }
    assert abs(out[3] - round(1 / 63 + 1 / 61, 6)) < 1e-9
    assert abs(out[1] - round(1 / 61, 6)) < 1e-9
    assert abs(out[4] - round(1 / 62, 6)) < 1e-9
    # doc in both lists outranks single-list docs at similar ranks
    ranked = sorted(out, key=lambda d: -out[d])
    assert ranked[0] == 3


def test_llm_pipeline_subset_of_quality_keep(spark, sf_dir):
    from bigdata_elephant_spark.plans.pipeline_queries import (
        q_llm_pipeline_e2e,
        q_quality_logit_filter,
    )

    sel = {
        r.doc_id for r in q_llm_pipeline_e2e(spark, sf_dir).collect()
    }
    keep = {
        r.doc_id
        for r in q_quality_logit_filter(spark, sf_dir)
        .filter("keep")
        .collect()
    }
    assert sel <= keep


def test_hashed_vectors_bounded_and_deterministic(spark, sf_dir):
    from bigdata_elephant_spark.operators.textstats import (
        hashed_doc_vectors,
    )

    docs = read_table(spark, sf_dir, "documents")
    v1 = hashed_doc_vectors(docs, dims=64)
    rows = v1.collect()
    assert rows
    assert all(0 <= r.dim < 64 for r in rows)
    assert all(r.val != 0 for r in rows)
    # stable under repartitioning (content-hash, not partition RNG)
    v2 = hashed_doc_vectors(docs.repartition(13), dims=64)
    assert sorted(map(tuple, rows)) == sorted(
        map(tuple, v2.collect())
    )


def test_bigram_surprisal_handcheck(spark):
    import math

    from bigdata_elephant_spark.operators.textstats import (
        bigram_surprisal_scores,
    )

    docs = spark.createDataFrame(
        [(1, "cat dog cat dog"), (2, "cat dog")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_bigrams, r.avg_bigram_surprisal)
        for r in bigram_surprisal_scores(docs).collect()
    }
    # corpus bigrams: d1 -> (cat dog), (dog cat), (cat dog);
    # d2 -> (cat dog). c2: "cat dog"=3, "dog cat"=1.
    # starts: cat=3, dog=1. V=2.
    s_cd = round(math.log(3 + 2) - math.log(3 + 1), 6)
    s_dc = round(math.log(1 + 2) - math.log(1 + 1), 6)
    assert out[1][0] == 3
    assert abs(out[1][1] - round((2 * s_cd + s_dc) / 3, 6)) < 1e-6
    assert out[2][0] == 1
    assert abs(out[2][1] - round(s_cd, 6)) < 1e-6


def test_value_trend_recovers_linear_series(spark):
    import datetime as dt

    from bigdata_elephant_spark.plans.pipeline_queries import (
        q_value_trend_by_type,
    )
    from bigdata_elephant_spark.sources import corpus as corpus_mod

    base = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for day in range(10):
        for _ in range(3):  # 3 events/day, same value => mean exact
            rows.append(
                (
                    eid,
                    base + dt.timedelta(days=day, hours=eid % 5),
                    1,
                    "buy",
                    5.0 + 2.0 * day,
                    "",
                )
            )
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    # route the query's table read to our in-memory frame
    import bigdata_elephant_spark.plans.pipeline_queries as pq

    orig = pq._events
    pq._events = lambda s, d: ev
    try:
        out = q_value_trend_by_type(spark, "ignored").collect()
    finally:
        pq._events = orig
    (r,) = out
    assert r.event_type == "buy"
    assert r.n_days == 10
    assert abs(r.slope - 2.0) < 1e-6
    assert abs(r.intercept - 5.0) < 1e-6


def test_ewma_matches_recursive_definition(spark):
    import datetime as dt

    from bigdata_elephant_spark.plans import pipeline_queries as pq

    vals = [3.0, 1.0, 4.0, 1.5, 9.25]
    base = dt.datetime(2024, 5, 1)
    ev = spark.createDataFrame(
        [
            (i, base + dt.timedelta(minutes=i), 7, "x", v, "")
            for i, v in enumerate(vals)
        ],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    orig = pq._events
    pq._events = lambda s, d: ev
    try:
        (r,) = pq.q_ewma_user_value(spark, "ignored").collect()
    finally:
        pq._events = orig
    s = vals[0]
    for v in vals[1:]:
        s = 0.5 * v + 0.5 * s
    assert r.n_events == len(vals)
    assert abs(r.ewma - round(s, 6)) < 1e-9


def test_mad_outliers_handcheck(spark):
    from bigdata_elephant_spark.operators.robust import mad_outliers

    vals = [10.0] * 9 + [10.5] * 9 + [11.0] * 9 + [99.0]
    df = spark.createDataFrame(
        [(i, "t", v) for i, v in enumerate(vals)],
        "event_id long, event_type string, value double",
    )
    out = mad_outliers(
        df, "event_type", "value", "event_id", n_mads=3.0
    ).collect()
    # median 10.5, deviations {0, 0.5} + one 88.5; MAD = 0.5;
    # only the 99.0 row exceeds 3 * 0.5
    assert [r.v for r in out] == [99.0]
    assert out[0].med == 10.5 and out[0].mad == 0.5


def test_neyman_alloc_totals_and_determinism(spark, sf_dir):
    from bigdata_elephant_spark.operators.sampling import (
        neyman_allocation_sample,
    )

    orders = read_table(spark, sf_dir, "orders")
    sel = neyman_allocation_sample(
        orders, "o_orderpriority", "o_totalprice", "o_orderkey", 100
    )
    rows = sel.collect()
    assert rows
    per = {}
    for r in rows:
        per.setdefault(r.o_orderpriority, [0, r.alloc])
        per[r.o_orderpriority][0] += 1
    for got, alloc in per.values():
        assert got == min(
            alloc,
            got,
        )  # never exceeds the allocation
    # rounding drift stays within one row per stratum
    assert abs(sum(a for _, a in per.values()) - 100) <= len(per)
    rows2 = neyman_allocation_sample(
        orders.repartition(7),
        "o_orderpriority",
        "o_totalprice",
        "o_orderkey",
        100,
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_kn_perplexity_matches_hand_model(spark):
    import math

    from bigdata_elephant_spark.operators.textstats import (
        kn_perplexity_scores,
    )

    docs = spark.createDataFrame(
        [(1, "cat dog cat dog"), (2, "cat dog"), (3, "dog bird")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_bigrams, r.kn_logppl)
        for r in kn_perplexity_scores(docs).collect()
    }
    # corpus bigram types: "cat dog"=3, "dog cat"=1, "dog bird"=1.
    # lefts: cat -> c1=3, nf=1; dog -> c1=2, nf=2.
    # rights: dog nb=1, cat nb=1, bird nb=1. B=3 types. d=0.75.
    d, B = 0.75, 3
    def pkn(c2, c1, nf, nb):
        return ((c2 - d) / c1) + (((d * nf) / c1) * (nb / B))
    s_cd = round(-math.log(pkn(3, 3, 1, 1)), 6)
    s_dc = round(-math.log(pkn(1, 2, 2, 1)), 6)
    s_db = round(-math.log(pkn(1, 2, 2, 1)), 6)
    assert out[1] == (3, round((2 * s_cd + s_dc) / 3, 6))
    assert out[2] == (1, s_cd)
    assert out[3] == (1, s_db)


def test_kn_continuation_beats_raw_frequency(spark):
    """The KN property: a word seen in MANY distinct contexts gets
    more continuation mass than an equally frequent word welded to
    one context — so a novel-context bigram ending in the versatile
    word scores lower surprisal than one ending in the welded word."""
    import math

    from bigdata_elephant_spark.operators.textstats import (
        kn_perplexity_scores,
    )

    # "san francisco" x4 welds francisco to one left context;
    # "red" appears after 4 different words. Probes "goes francisco"
    # vs "goes red": both probe bigrams have c2=1 and share w1.
    docs = spark.createDataFrame(
        [
            (1, "san francisco san francisco san francisco san francisco"),
            (2, "car red sky red fox red hat red"),
            (3, "goes francisco"),
            (4, "goes red"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.kn_logppl
        for r in kn_perplexity_scores(docs).collect()
    }
    assert out[4] < out[3]  # versatile "red" is the better continuation
