"""Exact (decimal, oracle-gate) vs production (double) aggregation.

The two modes are the same logical query; the production mode trades
last-ulp partitioning determinism for throughput (SCALE.md measures
the decimal surcharge at ~2.6x on the agg bundle). These tests pin
the contract: values agree to tolerance, the production plan carries
no decimal arithmetic, and the mode switch is scoped + restored.
"""

from __future__ import annotations

import pytest

from bigdata_elephant_spark.functions import numeric
from bigdata_elephant_spark.plans.relational import (
    q1_pricing_fast,
    q1_pricing_summary,
)


def test_approx_sums_scopes_and_restores():
    assert numeric.exact_enabled()
    with numeric.approx_sums():
        assert not numeric.exact_enabled()
        with numeric.approx_sums():
            assert not numeric.exact_enabled()
        assert not numeric.exact_enabled()
    assert numeric.exact_enabled()
    # restored even when the body raises
    with pytest.raises(RuntimeError):
        with numeric.approx_sums():
            raise RuntimeError("boom")
    assert numeric.exact_enabled()


def test_fast_mode_matches_exact_to_tolerance(spark, sf_dir):
    exact = {
        (r["l_returnflag"], r["l_linestatus"]): r.asDict()
        for r in q1_pricing_summary(spark, sf_dir).collect()
    }
    fast = {
        (r["l_returnflag"], r["l_linestatus"]): r.asDict()
        for r in q1_pricing_fast(spark, sf_dir).collect()
    }
    assert exact.keys() == fast.keys()
    for key, e in exact.items():
        f = fast[key]
        assert e["count_order"] == f["count_order"]
        for col in ("sum_qty", "sum_base_price", "sum_disc_price",
                    "sum_charge", "avg_qty", "avg_price", "avg_disc"):
            denom = max(abs(e[col]), 1.0)
            assert abs(e[col] - f[col]) / denom < 1e-6, (key, col)


def test_fast_mode_plan_has_no_decimal_agg(spark, sf_dir):
    """The production plan must aggregate doubles end-to-end; a
    stray DecimalType in the aggregate means the switch regressed
    and the throughput win is silently gone."""
    fast_plan = q1_pricing_fast(spark, sf_dir)._jdf.queryExecution(
    ).optimizedPlan().toString()
    exact_plan = q1_pricing_summary(spark, sf_dir)._jdf.queryExecution(
    ).optimizedPlan().toString()
    assert "decimal" not in fast_plan.lower()
    assert "decimal" in exact_plan.lower()
