"""MERGE INTO / CDC semantics over plain columnar tables.

Spark-on-parquet has no transactional MERGE (that's Delta/Iceberg
territory), but the *relational semantics* are a join shape worth
owning:

- :func:`merge_upsert` — WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED
  THEN INSERT as one full-outer join keyed on the merge key. At scale
  the write side pairs this with dynamic partition overwrite
  (sinks.write_partitioned): only partitions containing touched keys
  rewrite.
- :func:`latest_state` — CDC compaction: reduce a change stream to
  each key's most recent row (the "current state" table). One
  windowed rank per key — the same single-shuffle shape however long
  the history — with delete-ops dropped after ranking so a delete
  tombstone wins over older upserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """SQL MERGE semantics: update rows whose key matches, insert the
    rest. Both inputs must share a schema. Returns the merged table
    plus an ``__action`` audit column (updated/inserted/kept).

    One full-outer join on the key; every non-key column prefers the
    update side. The updates table is usually a tiny delta — Catalyst
    broadcasts it when below the threshold, else it's a co-located
    shuffle join on the merge key.
    """
    assert target.columns == updates.columns, "schemas must match"
    val_cols = [c for c in target.columns if c not in key_cols]
    u = updates.select(
        *[F.col(c).alias(f"_u_{c}") for c in updates.columns]
    )
    cond = [target[k] == u[f"_u_{k}"] for k in key_cols]
    joined = target.join(u, cond, "full_outer")
    matched = target[key_cols[0]].isNotNull() & u[
        f"_u_{key_cols[0]}"
    ].isNotNull()
    from_update = u[f"_u_{key_cols[0]}"].isNotNull()
    return joined.select(
        *[
            F.coalesce(u[f"_u_{k}"], target[k]).alias(k)
            for k in key_cols
        ],
        *[
            F.when(from_update, u[f"_u_{c}"]).otherwise(target[c]).alias(c)
            for c in val_cols
        ],
        F.when(matched, F.lit("updated"))
        .when(from_update, F.lit("inserted"))
        .otherwise(F.lit("kept"))
        .alias("__action"),
    )


def latest_state(
    changes: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    op_col: str | None = None,
    delete_op: str = "D",
) -> DataFrame:
    """Compact a CDC/change stream to current state: the max-order
    row per key; if ``op_col`` is given, keys whose latest op is the
    delete op disappear entirely (tombstone semantics).

    Ties on ``order_cols`` (two updates for one key at the same
    timestamp — routine in real CDC feeds) are broken by an md5 of
    the full rendered row, so the survivor is a deterministic
    function of row CONTENT, never of shuffle order — reruns and
    repartitionings always compact to the same state."""
    from bigdata_elephant_spark.operators.reconcile import (
        row_signature,
    )

    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in order_cols],
        F.md5(row_signature(changes, sorted(changes.columns))).asc(),
    )
    ranked = changes.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    )
    if op_col is not None:
        ranked = ranked.filter(F.col(op_col) != delete_op)
    return ranked.drop("__rn")


def scd2_history(
    changes: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
) -> DataFrame:
    """Slowly-changing-dimension type 2: turn a change stream into
    validity intervals.

    Each change row becomes a version with ``valid_from`` = its own
    order key and ``valid_to`` = the next change's (null for the
    current version, flagged ``is_current``). One windowed ``lead``
    per key — the same single-shuffle shape as :func:`latest_state`
    however deep the history, no self-join (the naive interval build
    is a per-key inequality self-join that quadratically explodes on
    hot keys). A point-in-time lookup over the output is then a
    plain range predicate ``valid_from <= t AND (t < valid_to OR
    valid_to IS NULL)`` — at scale the table partitions by
    ``is_current`` so current-state queries never touch history.
    """
    assert len(order_cols) >= 1
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    lead0 = F.lead(F.col(order_cols[0])).over(w)
    return changes.select(
        *changes.columns,
        F.col(order_cols[0]).alias("valid_from"),
        lead0.alias("valid_to"),
        lead0.isNull().alias("is_current"),
    )
