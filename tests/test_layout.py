"""Z-order layout + zone maps: operators/layout.py.

The property under test is the one a 100 TB scan relies on: after
Z-order clustering, a range predicate on EITHER interleaved column
can skip most files via the zone map, whereas a single-column sort
gives the other column useless (full-range) zones.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from bigdata_elephant_spark.operators.layout import (
    pruned_fraction,
    scale_to_bits,
    zone_map,
    zvalue,
    zvalue_sql_duckdb,
)
from bigdata_elephant_spark.sources.corpus import read_table

SF = "/root/testdata/sf0.01"


def _interleave_py(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i + 1)
        z |= ((y >> i) & 1) << (2 * i)
    return z


def test_zvalue_matches_python_reference(spark):
    rows = [(1, 0), (0, 1), (3, 5), (65535, 0), (0, 65535), (12345, 54321)]
    df = spark.createDataFrame(rows, "x long, y long").withColumn(
        "z", zvalue(F.col("x"), F.col("y"))
    )
    for r in df.collect():
        assert r["z"] == _interleave_py(r["x"], r["y"]), r


def test_zvalue_sql_matches_spark(spark, duck):
    """The DuckDB text and the Spark expression are the same math."""
    rows = [(i * 977 % 65536, i * 613 % 65536) for i in range(50)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn("z", zvalue(F.col("x"), F.col("y"))).collect()
    }
    for (x, y), z in got.items():
        [(dz,)] = duck.sql(
            f"SELECT {zvalue_sql_duckdb(f'{x}::BIGINT', f'{y}::BIGINT')}"
        ).fetchall()
        assert dz == z, (x, y)


def _zones_for(df, order_cols, n_files=64):
    w = Window.orderBy(*order_cols)
    tiled = df.withColumn("file_id", F.ntile(n_files).over(w))
    return zone_map(tiled, "file_id", ["x", "y"]).collect()


def test_zorder_prunes_both_dimensions(spark):
    o = read_table(spark, SF, "orders")
    base = o.select(
        "o_orderkey",
        F.col("o_custkey").alias("ck"),
        F.floor(F.col("o_totalprice") / F.lit(10.0))
        .cast("long")
        .alias("pb"),
    )
    mm = base.agg(
        F.min("ck").alias("ck_min"), F.max("ck").alias("ck_max"),
        F.min("pb").alias("pb_min"), F.max("pb").alias("pb_max"),
    )
    df = base.crossJoin(F.broadcast(mm)).select(
        "o_orderkey",
        scale_to_bits(F.col("ck"), F.col("ck_min"), F.col("ck_max"))
        .alias("x"),
        scale_to_bits(F.col("pb"), F.col("pb_min"), F.col("pb_max"))
        .alias("y"),
    ).withColumn("z", zvalue(F.col("x"), F.col("y")))
    z_zones = _zones_for(df, ["z", "o_orderkey"])
    y_zones = _zones_for(df, ["y", "o_orderkey"])

    # Narrow predicate on x (10% of the scaled custkey range): the
    # y-sorted layout cannot skip anything; Z-order skips most files.
    x_lo, x_hi = 0, 6552
    prune_z = pruned_fraction(z_zones, "min_x", "max_x", x_lo, x_hi)
    prune_y = pruned_fraction(y_zones, "min_x", "max_x", x_lo, x_hi)
    assert prune_y < 0.05, prune_y
    assert prune_z > 0.5, prune_z

    # And Z-order still prunes on y (price) — both dims stay usable.
    y_lo, y_hi = 0, 6552
    prune_z_y = pruned_fraction(z_zones, "min_y", "max_y", y_lo, y_hi)
    assert prune_z_y > 0.5, prune_z_y


def test_compaction_plan_and_rewrite(spark, tmp_path):
    """compaction_plan packs units in order by running size;
    compact_to_target really rewrites the data into one file per
    bin, preserving every row."""
    import glob

    from pyspark.sql import functions as F

    from bigdata_elephant_spark.operators import layout
    from bigdata_elephant_spark.sources.corpus import read_table

    o = read_table(spark, "/root/testdata/sf0.001", "orders")
    manifest = o.groupBy(F.col("o_custkey").alias("unit")).agg(
        F.count("*").alias("bytes")
    )
    target = 40
    plan = layout.compaction_plan(manifest, target)
    rows = {r["unit"]: r for r in plan.collect()}
    # replay the packing driver-side and compare bin ids exactly
    cum = 0
    for unit in sorted(rows):
        assert rows[unit]["bin"] == cum // target, unit
        cum += rows[unit]["bytes"]
    n_bins = max(r["bin"] for r in rows.values()) + 1

    out = str(tmp_path / "compacted")
    layout.compact_to_target(
        o.withColumn("unit", F.col("o_custkey")), plan, out
    )
    files = glob.glob(f"{out}/bin=*/*.parquet")
    assert len(files) == n_bins  # one file per planned bin
    back = spark.read.parquet(out)
    assert back.count() == o.count()
    assert (
        back.select("o_orderkey").exceptAll(o.select("o_orderkey")).count()
        == 0
    )
