"""Behavioral tests for MERGE/CDC semantics."""

from __future__ import annotations

from bigdata_elephant_spark.operators.merge import latest_state, merge_upsert


def test_merge_upsert_actions(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, v double",
    )
    updates = spark.createDataFrame(
        [(2, "b2", 99.0), (4, "d", 40.0)],
        "k long, name string, v double",
    )
    out = {r["k"]: r for r in merge_upsert(target, updates, ["k"]).collect()}
    assert len(out) == 4
    assert out[1]["__action"] == "kept" and out[1]["v"] == 10.0
    assert out[2]["__action"] == "updated" and out[2]["name"] == "b2"
    assert out[3]["__action"] == "kept"
    assert out[4]["__action"] == "inserted" and out[4]["v"] == 40.0


def test_latest_state_tombstones(spark):
    changes = spark.createDataFrame(
        [
            (1, 1, "U", 1.0),
            (1, 2, "U", 2.0),   # latest for key 1
            (2, 1, "U", 5.0),
            (2, 3, "D", 0.0),   # key 2 deleted last -> gone
            (3, 9, "D", 0.0),
            (3, 10, "U", 7.0),  # delete then re-insert -> alive
        ],
        "k long, ver long, op string, v double",
    )
    out = {
        r["k"]: r
        for r in latest_state(
            changes, ["k"], ["ver"], op_col="op", delete_op="D"
        ).collect()
    }
    assert set(out) == {1, 3}
    assert out[1]["v"] == 2.0
    assert out[3]["v"] == 7.0
