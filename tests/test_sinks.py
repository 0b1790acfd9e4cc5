"""Write-side tests: format round-trips, partition pruning, and the
no-shuffle bucketed join."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bigdata_elephant_spark.sources.corpus import read_table
from bigdata_elephant_spark.sources import sinks


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip_formats(spark, sf_dir, tmp_path, fmt):
    src = read_table(spark, sf_dir, "nation")
    path = str(tmp_path / f"nation_{fmt}")
    if fmt == "csv":
        src.write.format(fmt).mode("overwrite").option(
            "header", "true"
        ).save(path)
    else:
        sinks.write_table(src, path, fmt=fmt)
    back = sinks.read_back(spark, path, fmt=fmt, schema=src.schema)
    cols = ["n_nationkey", "n_name", "n_regionkey"]
    assert _rows(back, cols) == _rows(src, cols)


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    src = read_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_part")
    sinks.write_partitioned(src, path, ["o_orderpriority"])
    back = sinks.read_back(spark, path)
    one = back.filter(F.col("o_orderpriority") == "1-URGENT")
    # partition filter reaches the scan: non-matching files not listed
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_orderpriority" in plan
    expect = src.filter(F.col("o_orderpriority") == "1-URGENT")
    assert one.count() == expect.count()


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """Identically-bucketed tables join with no shuffle exchange.

    Auto-broadcast is disabled for the assertion: at test scale the
    small side would broadcast (also shuffle-free, but then bucketing
    is unused); at 100 TB both sides are too big to broadcast and the
    bucketed sort-merge join below is exactly the plan that runs.
    """
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
        "file:"
    )
    for t in ("t_orders_b", "t_customer_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    sinks.write_bucketed(
        orders, "t_orders_b", ["o_custkey"], n_buckets=4,
        sort_cols=["o_custkey"],
    )
    sinks.write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "t_customer_b", ["o_custkey"], n_buckets=4,
        sort_cols=["o_custkey"],
    )
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table("t_orders_b")
        b = spark.table("t_customer_b")
        joined = a.join(b, "o_custkey").where(F.col("o_totalprice") > 0)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Bucketed: true" in plan, plan
        # and the result is still correct
        expect = orders.join(
            customer.withColumnRenamed("c_custkey", "o_custkey"),
            "o_custkey",
        ).where(F.col("o_totalprice") > 0)
        assert joined.count() == expect.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)


def test_compact_preserves_rows_and_reduces_files(spark, sf_dir, tmp_path):
    import os

    src = str(tmp_path / "many")
    dst = str(tmp_path / "few")
    orders = read_table(spark, sf_dir, "orders")
    orders.repartition(16).write.parquet(src)
    n_src = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_src == 16
    sinks.compact(spark, src, dst, target_files=2)
    n_dst = len([f for f in os.listdir(dst) if f.endswith(".parquet")])
    assert n_dst <= 2
    assert spark.read.parquet(dst).count() == orders.count()


def test_zstd_compression_roundtrip_and_smaller(spark, sf_dir, tmp_path):
    import os

    src = read_table(spark, sf_dir, "documents")
    p_snappy = str(tmp_path / "snappy")
    p_zstd = str(tmp_path / "zstd")
    sinks.write_table(src.coalesce(1), p_snappy, compression="snappy")
    sinks.write_table(src.coalesce(1), p_zstd, compression="zstd")

    def total(p):
        return sum(
            os.path.getsize(os.path.join(p, f))
            for f in os.listdir(p) if f.endswith(".parquet")
        )

    assert spark.read.parquet(p_zstd).count() == src.count()
    assert total(p_zstd) < total(p_snappy)  # text compresses better


def test_max_records_per_file_caps_file_size(spark, sf_dir, tmp_path):
    import os

    src = read_table(spark, sf_dir, "orders")
    p = str(tmp_path / "capped")
    n = src.count()
    cap = max(1, n // 4)
    sinks.write_table(src.coalesce(1), p, max_records_per_file=cap)
    files = [f for f in os.listdir(p) if f.endswith(".parquet")]
    assert len(files) >= 4
    assert spark.read.parquet(p).count() == n
