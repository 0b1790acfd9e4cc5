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
