"""Salted aggregation equals the direct aggregation (any salt layout)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_elephant_spark.operators import skew
from bigdata_elephant_spark.sources.corpus import read_table


def test_salted_sum_count_equals_direct(spark, sf_dir):
    events = read_table(spark, sf_dir, "events")
    direct = {
        r["event_type"]: (r["n"], round(r["s"], 6))
        for r in events.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    got = {
        r["event_type"]: (r["n"], round(r["s"], 6))
        for r in skew.salted_aggregate(
            events,
            ["event_type"],
            [F.count("*").alias("pn"), F.sum("value").alias("ps")],
            [F.sum("pn").alias("n"), F.sum("ps").alias("s")],
        ).collect()
    }
    assert got == direct


def test_salted_count_distinct_equals_direct(spark, sf_dir):
    events = read_table(spark, sf_dir, "events")
    direct = {
        r["event_type"]: r["n_distinct"]
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n_distinct"))
        .collect()
    }
    got = {
        r["event_type"]: r["n_distinct"]
        for r in skew.salted_count_distinct(
            events, ["event_type"], "user_id"
        ).collect()
    }
    assert got == direct


def test_salted_avg_via_sum_count(spark, sf_dir):
    events = read_table(spark, sf_dir, "events")
    direct = {
        r["event_type"]: round(r["a"], 6)
        for r in events.groupBy("event_type")
        .agg(F.avg("value").alias("a"))
        .collect()
    }
    got = {
        r["event_type"]: round(r["s"] / r["n"], 6)
        for r in skew.salted_aggregate(
            events,
            ["event_type"],
            [F.count("value").alias("pn"), F.sum("value").alias("ps")],
            [F.sum("pn").alias("n"), F.sum("ps").alias("s")],
        ).collect()
    }
    assert got == direct


def test_salted_join_equals_plain_join(spark, sf_dir):
    """salted_join must be row-for-row identical to the plain join
    (the salt is an internal partitioning trick), including rows
    whose key has no match (dropped for inner joins)."""
    events = read_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("c_custkey"), "event_id", "event_type"
    )
    customer = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    plain = events.join(customer, "c_custkey").groupBy(
        "c_mktsegment", "event_type"
    ).count()
    salted = skew.salted_join(events, customer, "c_custkey", n_salts=8)
    got = salted.groupBy("c_mktsegment", "event_type").count()
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in plain.collect()
    }
    # row-level identity, not just aggregate identity
    assert salted.count() == events.join(customer, "c_custkey").count()
    a = {tuple(r) for r in salted.select(
        "c_custkey", "event_id", "c_mktsegment").collect()}
    b = {tuple(r) for r in events.join(customer, "c_custkey").select(
        "c_custkey", "event_id", "c_mktsegment").collect()}
    assert a == b


def test_salted_join_rejects_small_side_preserving_joins(spark, sf_dir):
    """right/full outer would emit one null-extended row per replica
    of an unmatched small-side row — salted_join must refuse, not
    silently return wrong multiplicities."""
    import pytest

    events = read_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("c_custkey"), "event_id"
    )
    customer = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    for how in ("right", "full", "outer", "right_outer", "full_outer"):
        with pytest.raises(ValueError, match="preserving"):
            skew.salted_join(events, customer, "c_custkey", how=how)
    # left outer IS big-side preserving: unmatched big rows appear once
    left = skew.salted_join(events, customer, "c_custkey", how="left")
    assert left.count() == events.count()


def test_salted_join_left_semi_anti(spark, sf_dir):
    """semi/anti joins are big-side preserving and must match the
    unsalted equivalents exactly."""
    events = read_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("c_custkey"), "event_id"
    )
    customer = read_table(spark, sf_dir, "customer").select("c_custkey")
    for how in ("left_semi", "left_anti"):
        got = skew.salted_join(events, customer, "c_custkey", how=how)
        want = events.join(customer, "c_custkey", how)
        assert got.count() == want.count()


def test_salt_col_spreads_identical_duplicate_rows(spark):
    """A hot key of FULLY IDENTICAL rows defeats the content-hash
    salt (all copies hash alike); a caller-supplied salt_col (an
    upstream row id) restores the full n_salts-way spread, with join
    results unchanged."""
    n_salts, n_dupes = 8, 400
    # 400 identical payload rows for key 1 + a few distinct others,
    # with a pre-assigned row id a real pipeline would carry
    rows = [(1, "same-payload", i) for i in range(n_dupes)] + [
        (k, f"p{k}", n_dupes + k) for k in range(2, 6)
    ]
    big = spark.createDataFrame(rows, "k long, payload string, row_id long")
    small = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(1, 6)], "k long, dim string"
    )

    def salt_spread(df, salt_src_cols):
        return (
            df.withColumn(
                "__s",
                F.pmod(F.xxhash64(*salt_src_cols), F.lit(n_salts)),
            )
            .filter(F.col("k") == 1)
            .select("__s")
            .distinct()
            .count()
        )

    # content hash: payload columns identical except row_id; drop it
    # to model a log table with true duplicates
    assert salt_spread(big.drop("row_id"), ["k", "payload"]) == 1
    assert salt_spread(big, ["row_id"]) == n_salts

    got = skew.salted_join(
        big, small, "k", n_salts=n_salts, salt_col="row_id"
    )
    want = big.join(small, "k")
    assert got.count() == want.count() == n_dupes + 4
    agg = skew.salted_aggregate(
        big,
        ["k"],
        [F.count("*").alias("c")],
        [F.sum("c").alias("n")],
        n_salts=n_salts,
        salt_col="row_id",
    )
    assert {r.k: r.n for r in agg.collect()}[1] == n_dupes
