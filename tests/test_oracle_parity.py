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
