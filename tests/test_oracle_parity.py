"""Local mirror of the driver's correctness gate: every registry query
runs on Spark AND its DuckDB oracle over the same parquet; results
must match (names, counts, canonicalized values).

Runs at sf0.001 by default (fast); set ELEPHANT_TEST_SF_DIR to
/root/testdata/sf0.01 to reproduce the driver's exact gate.
"""

from __future__ import annotations

import pytest

from bigdata_elephant_spark.registry import all_specs, resolve_oracle
from tests.parity import assert_parity

SPECS = all_specs()


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_query_parity(spark, duck, sf_dir, spec):
    df = spec.fn(spark, sf_dir)
    assert df is not None
    sql = resolve_oracle(spec)
    if sql is None:
        assert df.count() >= 0  # rows-only check (driver's weak gate)
        return
    rel = duck.sql(sql)
    assert_parity(df, rel, spec.name)


def test_parity_gate_actually_rejects(spark, duck, sf_dir):
    """Meta-test of the gate itself: a deliberately wrong Spark
    result (dropped row, perturbed value, renamed column) must FAIL
    assert_parity — proving the harness can't green-light a broken
    query."""
    from pyspark.sql import functions as F

    from bigdata_elephant_spark.registry import all_specs, resolve_oracle

    spec = next(s for s in all_specs() if s.name == "vocab_build")
    good = spec.fn(spark, sf_dir)
    rel = duck.sql(resolve_oracle(spec))
    # sanity: unmodified passes
    assert_parity(good, rel, "meta-good")
    with pytest.raises(AssertionError):  # dropped rows
        assert_parity(good.limit(5), rel, "meta-rows")
    with pytest.raises(AssertionError):  # perturbed value
        assert_parity(
            good.withColumn("df", F.col("df") + 1), rel, "meta-val"
        )
    with pytest.raises(AssertionError):  # renamed column
        assert_parity(
            good.withColumnRenamed("df", "df2"), rel, "meta-col"
        )
