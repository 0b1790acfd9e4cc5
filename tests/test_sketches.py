"""Approximate aggregates: the 100 TB substitutes for holistic
exact operators. Sketches are engine-internal (HLL++ / KLL), so no
cross-engine oracle — instead these tests bound the approximation
error against the exact answer on real data, which is the property a
user actually relies on."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_elephant_spark.sources.corpus import read_table

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_rsd(spark):
    o = read_table(spark, SF, "orders")
    exact, approx = o.agg(
        F.count_distinct("o_custkey").alias("e"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("a"),
    ).first()
    assert abs(approx - exact) / exact < 0.06  # 3x the configured rsd


def test_percentile_approx_close_to_exact(spark):
    e = read_table(spark, SF, "events")
    row = e.agg(
        F.expr("percentile(value, 0.9)").alias("exact"),
        F.percentile_approx("value", 0.9, 10000).alias("approx"),
    ).first()
    spread = e.agg(
        (F.max("value") - F.min("value")).alias("r")
    ).first()["r"]
    assert abs(row["approx"] - row["exact"]) / spread < 0.01


def test_sketches_merge_across_groups(spark):
    """Partial sketches must merge: the per-group HLLs combined equal
    (approximately) the global distinct — the property that makes the
    operator a two-phase aggregation instead of a holistic one."""
    e = read_table(spark, SF, "events")
    exact = e.agg(F.count_distinct("user_id")).first()[0]
    merged = (
        e.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("a"))
        .agg(F.max("a"))  # all users appear under every type? no —
        .first()[0]
    )
    # max per-group is a lower bound; the real merge check is global
    approx_global = e.agg(
        F.approx_count_distinct("user_id", rsd=0.02)
    ).first()[0]
    assert merged <= exact * 1.06
    assert abs(approx_global - exact) / exact < 0.06


# ----------------------------------------------------------------
# Deterministic (oracle-replayable) sketches: operators/sketches.py


def test_hll_registers_merge_exactly(spark):
    """Merging per-group register tables by elementwise max must
    equal the registers built from the whole table in one pass —
    EXACT state equality, the associativity that lets partial
    sketches combine across 1000 executors."""
    from bigdata_elephant_spark.operators.sketches import hll_registers
    from pyspark.sql import functions as F

    e = read_table(spark, SF, "events")
    per_group = hll_registers(e, "user_id", "event_type")
    merged = {
        (r["bucket"]): r["r"]
        for r in per_group.groupBy("bucket")
        .agg(F.max("r").alias("r"))
        .collect()
    }
    whole = e.withColumn("g", F.lit("all"))
    direct = {
        r["bucket"]: r["r"]
        for r in hll_registers(whole, "user_id", "g").collect()
    }
    assert merged == direct


def test_hll_estimate_within_bound(spark):
    """m=64 registers -> relative error ~1.04/sqrt(64) = 13%; assert
    3x that as a hard ceiling on real data."""
    from bigdata_elephant_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )
    from pyspark.sql import functions as F

    e = read_table(spark, "/root/testdata/sf0.01", "events")
    regs = hll_registers(e, "user_id", "event_type")
    est = {
        r["event_type"]: r["est_distinct"]
        for r in hll_estimate(regs, "event_type").collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for g, n in exact.items():
        assert abs(est[g] - n) / n < 0.39, (g, est[g], n)


def test_kmv_exact_below_k_and_bounded_above(spark):
    """Below k distinct values KMV is exact; above, the estimate
    stays within a loose 50% band (k=32 -> sigma ~ 18%)."""
    from bigdata_elephant_spark.operators.sketches import (
        kmv_estimate,
        kmv_state,
    )
    from pyspark.sql import functions as F

    small = read_table(spark, "/root/testdata/sf0.001", "events")  # 15 users < k
    st = kmv_state(small, "user_id", "event_type", 32)
    for r in kmv_estimate(st, 32).collect():
        assert r["est_distinct"] == 15.0
    big = read_table(spark, "/root/testdata/sf0.01", "events")
    st = kmv_state(big, "user_id", "event_type", 32)
    exact = {
        r["event_type"]: r["n"]
        for r in big.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for r in kmv_estimate(st, 32).collect():
        n = exact[r["event_type"]]
        assert abs(r["est_distinct"] - n) / n < 0.5


def test_weighted_sample_favors_heavy_rows(spark):
    """Inclusion probability must rise with weight: the sampled
    orders' mean o_totalprice sits far above the population mean,
    and the draw is deterministic across invocations."""
    from bigdata_elephant_spark.operators.sampling import (
        weighted_sample_keys,
    )
    from pyspark.sql import functions as F

    o = read_table(spark, "/root/testdata/sf0.01", "orders")
    key = weighted_sample_keys("o_orderkey", "o_totalprice")
    pick = (
        o.withColumn("k", key)
        .orderBy(F.desc("k"), "o_orderkey")
        .limit(200)
    )
    got1 = sorted(r["o_orderkey"] for r in pick.collect())
    got2 = sorted(r["o_orderkey"] for r in pick.collect())
    assert got1 == got2
    # Inclusion prob ~ w, so E[sampled w] -> E[w^2]/E[w]; for the
    # near-uniform price distribution that is ~1.33x the mean.
    mean_s = pick.agg(F.avg("o_totalprice")).first()[0]
    mean_p = o.agg(F.avg("o_totalprice")).first()[0]
    assert mean_s > 1.25 * mean_p, (mean_s, mean_p)


def test_cms_never_undercounts_and_merges(spark, sf_dir):
    """CMS point estimates are >= exact counts for every key (not
    just heavy ones), and per-group sketches summed cell-wise equal
    the global sketch (the mergeable-state property that makes it a
    two-phase aggregate at scale)."""
    from pyspark.sql import functions as F

    from bigdata_elephant_spark.operators.sketches import (
        cms_counts,
        cms_point_estimate,
    )
    from bigdata_elephant_spark.sources.corpus import read_table

    e = read_table(spark, sf_dir, "events")
    sketch = cms_counts(e, "user_id")
    exact = e.groupBy("user_id").agg(F.count("*").alias("n_exact"))
    est = cms_point_estimate(sketch, exact, "user_id")
    joined = est.join(exact, "user_id")
    assert joined.filter(F.col("est") < F.col("n_exact")).count() == 0

    per_group = cms_counts(e, "user_id", group="event_type")
    summed = per_group.groupBy("d", "col").agg(
        F.sum("cnt").alias("cnt")
    )
    a = {(r["d"], r["col"]): r["cnt"] for r in summed.collect()}
    b = {(r["d"], r["col"]): r["cnt"] for r in sketch.collect()}
    assert a == b


def test_bottomk_quantiles_rank_error_bounded(spark, sf_dir):
    """Each estimate's true rank is within the DKW-style bound of
    its target quantile (k=1024 -> sup error ~0.08 whp; assert 0.1),
    and the sample is partition-stable (same estimates after a
    repartition)."""
    from pyspark.sql import functions as F

    from bigdata_elephant_spark.operators.sketches import (
        bottomk_quantiles,
    )
    from bigdata_elephant_spark.sources.corpus import read_table

    orders = read_table(spark, sf_dir, "orders")
    qs = (0.1, 0.5, 0.9)
    est = {
        r["q"]: r["est"]
        for r in bottomk_quantiles(
            orders, "o_orderkey", "o_totalprice", qs
        ).collect()
    }
    n = orders.count()
    for q, v in est.items():
        true_rank = (
            orders.filter(F.col("o_totalprice") <= v).count() / n
        )
        assert abs(true_rank - q) < 0.1, (q, v, true_rank)

    est2 = {
        r["q"]: r["est"]
        for r in bottomk_quantiles(
            orders.repartition(13), "o_orderkey", "o_totalprice", qs
        ).collect()
    }
    assert est == est2


def test_bottomk_quantiles_small_input_is_exact(spark):
    """When the table fits inside k, estimates are exact order
    statistics at ceil(q*n)."""
    from pyspark.sql import Row

    from bigdata_elephant_spark.operators.sketches import (
        bottomk_quantiles,
    )

    df = spark.createDataFrame(
        [Row(k=i, x=float(i)) for i in range(1, 101)]
    )
    est = {
        r["q"]: r["est"]
        for r in bottomk_quantiles(df, "k", "x", (0.25, 0.5, 1.0)).collect()
    }
    assert est == {0.25: 25.0, 0.5: 50.0, 1.0: 100.0}


def test_bloom_no_false_negatives_and_bounded_fp(spark, sf_dir):
    """Every build-side key probes true (no false negatives — the
    bloom invariant), and the false-positive rate on non-members
    stays under a generous multiple of the analytic bound."""
    import math

    from pyspark.sql import functions as F

    from bigdata_elephant_spark.operators.sketches import (
        BLOOM_J,
        BLOOM_M,
        bloom_bits,
        bloom_probe,
    )
    from bigdata_elephant_spark.sources.corpus import read_table

    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    members = orders.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("k")
    )
    bits = bloom_bits(members, "k")
    probed = bloom_probe(customer, "c_custkey", bits)
    member_keys = {r["k"] for r in members.distinct().collect()}
    rows = probed.collect()
    missed = [r for r in rows if r["k"] in member_keys and not r["bloom_hit"]]
    assert missed == []  # no false negatives, ever
    non = [r for r in rows if r["k"] not in member_keys]
    if non:
        n = len(member_keys)
        expected_fp = (1 - math.exp(-n * BLOOM_J / BLOOM_M)) ** BLOOM_J
        fp = sum(r["bloom_hit"] for r in non) / len(non)
        assert fp <= max(3 * expected_fp, 0.02), (fp, expected_fp)


def test_bottomk_sample_is_mergeable(spark, sf_dir):
    """bottomk(A | B) == retake-k(bottomk(A) | bottomk(B)) — the
    property that lets shards keep independent samples."""
    from pyspark.sql import functions as F

    from bigdata_elephant_spark.operators.sketches import (
        bottomk_sample,
    )
    from bigdata_elephant_spark.sources.corpus import read_table

    orders = read_table(spark, sf_dir, "orders")
    k = 64
    half_a = orders.filter(F.col("o_orderkey") % 2 == 0)
    half_b = orders.filter(F.col("o_orderkey") % 2 == 1)
    merged = (
        bottomk_sample(half_a, "o_orderkey", "o_totalprice", k)
        .unionByName(
            bottomk_sample(half_b, "o_orderkey", "o_totalprice", k)
        )
        .orderBy("h", "x")
        .limit(k)
    )
    whole = bottomk_sample(orders, "o_orderkey", "o_totalprice", k)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_kmv_setops_estimates_track_exact(spark, sf_dir):
    from bigdata_elephant_spark.operators.sketches import (
        kmv_pairwise_setops,
    )
    from bigdata_elephant_spark.sources.corpus import read_table

    e = read_table(spark, sf_dir, "events")
    rows = kmv_pairwise_setops(
        e, "user_id", "event_type", 32
    ).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.jacc <= 1.0
        assert r.exact_inter <= r.exact_union
        # KMV with k=32 has ~1/sqrt(30) relative error; allow 3x
        assert abs(r.union_est - r.exact_union) <= max(
            0.6 * r.exact_union, 5
        )


def test_cms_join_estimate_never_undercounts(spark, sf_dir):
    from bigdata_elephant_spark.plans.sketch_queries import (
        cms_join_cardinality,
    )

    (r,) = cms_join_cardinality(spark, sf_dir).collect()
    assert r.est_join_rows >= r.exact_join_rows > 0
    assert r.over_ratio >= 1.0


def test_rolling_hll_tracks_exact(spark, sf_dir):
    from bigdata_elephant_spark.plans.sketch_queries import (
        rolling_hll_users,
    )

    rows = rolling_hll_users(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # HLL with m=64 registers: ~13% typical error; allow 3x
        assert abs(r.est_distinct - r.n_exact) <= max(
            0.4 * r.n_exact, 4
        )


def test_cms_absent_key_estimates_zero(spark):
    """A probed key absent from the sketched data must report est=0
    (empty cells count as 0 toward the min), not vanish from the
    output or inflate over surviving non-empty cells."""
    from pyspark.sql import functions as F

    from bigdata_elephant_spark.operators.sketches import (
        cms_counts,
        cms_point_estimate,
    )

    data = spark.createDataFrame(
        [(f"user{i % 3}",) for i in range(30)], "user_id string"
    )
    sketch = cms_counts(data, "user_id")
    probes = spark.createDataFrame(
        [("user0",), ("never-seen-key",)], "user_id string"
    )
    out = {
        r["user_id"]: r["est"]
        for r in cms_point_estimate(sketch, probes, "user_id").collect()
    }
    assert out["user0"] >= 10          # never undercounts
    assert out["never-seen-key"] == 0  # absent key -> 0, present
