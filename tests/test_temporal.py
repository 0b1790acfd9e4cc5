"""As-of join edge cases against hand-computed expectations."""

from __future__ import annotations

from datetime import datetime

from bigdata_elephant_spark.operators import temporal


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_backward_inclusive_and_nulls(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-05")),   # after both rights -> r2
            (2, 10, _ts("2024-01-02")),   # equal ts -> inclusive match r1
            (3, 10, _ts("2024-01-01")),   # before all rights -> null
            (4, 20, _ts("2024-01-05")),   # key with no right rows -> null
        ],
        "event_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-02"), "r1"),
            (10, _ts("2024-01-04"), "r2"),
        ],
        "rk long, rts timestamp, payload string",
    )
    out = {
        r["event_id"]: r["payload"]
        for r in temporal.asof_join(
            left, right, "k", "rk", "ts", "rts"
        ).collect()
    }
    assert out == {1: "r2", 2: "r1", 3: None, 4: None}


def test_asof_preserves_left_rowcount(spark):
    left = spark.createDataFrame(
        [(i, i % 3, _ts("2024-01-02")) for i in range(30)],
        "event_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(0, _ts("2024-01-01"), "x")],
        "rk long, rts timestamp, payload string",
    )
    got = temporal.asof_join(left, right, "k", "rk", "ts", "rts")
    assert got.count() == 30


def test_dedupe_right_keeps_max_tiebreak(spark):
    right = spark.createDataFrame(
        [(10, _ts("2024-01-02"), 1), (10, _ts("2024-01-02"), 7)],
        "rk long, rts timestamp, ok long",
    )
    got = temporal.dedupe_right(right, "rk", "rts", "ok").collect()
    assert [(r["rk"], r["ok"]) for r in got] == [(10, 7)]


def test_asof_single_shuffle_plan(spark):
    """The whole as-of is one hash-partition exchange + one sort —
    no range-join explosion, no per-row subquery."""
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-05"))],
        "event_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts("2024-01-02"), "r1")],
        "rk long, rts timestamp, payload string",
    )
    plan = (
        temporal.asof_join(left, right, "k", "rk", "ts", "rts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
