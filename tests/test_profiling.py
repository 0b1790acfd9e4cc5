"""Profiling: one-scan stats, approximate mode within tolerance."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_elephant_spark.operators.profiling import profile
from bigdata_elephant_spark.sources.corpus import read_table


def test_profile_exact_values(spark, sf_dir):
    e = read_table(spark, sf_dir, "events")
    got = {r["column"]: r for r in profile(e, ["user_id", "event_type"]).collect()}
    assert got["user_id"]["n_nulls"] == 0
    assert got["user_id"]["n_distinct"] == e.select("user_id").distinct().count()
    assert int(got["user_id"]["min_str"]) == e.agg(F.min("user_id")).collect()[0][0]
    assert got["event_type"]["n_distinct"] == e.select("event_type").distinct().count()


def test_profile_approx_within_tolerance(spark, sf_dir):
    e = read_table(spark, sf_dir, "events")
    exact = {r["column"]: r["n_distinct"]
             for r in profile(e, ["user_id"]).collect()}
    approx = {r["column"]: r["n_distinct"]
              for r in profile(e, ["user_id"], approximate=True).collect()}
    assert abs(approx["user_id"] - exact["user_id"]) <= 0.05 * exact["user_id"] + 2


def test_profile_is_single_job(spark, sf_dir):
    e = read_table(spark, sf_dir, "events")
    plan = (
        profile(e, ["user_id", "event_type", "value"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one scan of the input, not one per column
    assert plan.count("FileScan parquet") == 1, plan
