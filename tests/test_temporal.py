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


def test_gap_fill_forward_fills_missing_hours(spark):
    events = spark.createDataFrame(
        [
            (1, 7, _ts("2024-01-01 00:10:00"), 2.0),
            (2, 7, _ts("2024-01-01 00:50:00"), 4.0),
            # hour 01 empty -> filled with 3.0
            (3, 7, _ts("2024-01-01 02:30:00"), 10.0),
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    got = {
        r["hour"].isoformat(): (r["avg_value"], r["filled"])
        for r in temporal.gap_fill_hourly(events).collect()
    }
    assert got == {
        "2024-01-01T00:00:00": (3.0, False),
        "2024-01-01T01:00:00": (3.0, True),
        "2024-01-01T02:00:00": (10.0, False),
    }


def test_range_join_matches_bruteforce(spark):
    import itertools, random

    rng = random.Random(5)
    rows = [
        (i, rng.randrange(3), _ts("2024-01-01 00:00:00"), 0.0)
        for i in range(40)
    ]
    # scatter timestamps over 3 hours at odd offsets incl. exact
    # window-boundary cases
    rows = [
        (i, u, ts.replace(minute=(i * 7) % 60, hour=(i * 13) % 3), v)
        for (i, u, ts, v) in rows
    ]
    events = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {
        r["event_id"]: r["n_following"]
        for r in temporal.range_join_counts(events).collect()
    }
    w_us = 30 * 60 * 1_000_000
    ts_us = {i: int(t.timestamp() * 1e6) for (i, _, t, _) in rows}
    user = {i: u for (i, u, _, _) in rows}
    expect = {
        i: sum(
            1
            for j in ts_us
            if user[j] == user[i]
            and ts_us[j] > ts_us[i]
            and ts_us[j] <= ts_us[i] + w_us
        )
        for i in ts_us
    }
    assert got == expect
