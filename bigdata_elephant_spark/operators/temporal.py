"""Temporal joins Spark has no native operator for.

:func:`asof_join` — for every left row, attach the most recent right
row with the same key and ``right_ts <= left_ts`` (backward,
inclusive). The classic implementations don't scale:

- per-left-row subquery: O(L) correlated scans;
- inequality join + argmax: the range join explodes to L*R_key pairs
  before the argmax prunes them.

This one is the single-shuffle streaming-merge form: tag both sides,
union, hash-partition by key, sort each partition by
``(key, ts, side)`` with right rows first at equal ts, then a
running ``last(value, ignorenulls)`` window carries each right row
forward to every following left row. Cost = one shuffle of L+R rows
+ a partition-local sort — the same shape as a sort-merge join, with
per-key memory O(1) in the window. Skewed keys fall under AQE's
skew-join splitting like any other shuffle.

The right side must be unique per ``(key, ts)`` (pre-dedupe it —
otherwise "the" match is ill-defined); an assertion-friendly
deduper is provided.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_KEY = "__asof_key"
_TS = "__asof_ts"


def dedupe_right(
    right: DataFrame, on: str, ts: str, tiebreak: str
) -> DataFrame:
    """Keep one row per ``(on, ts)`` — the max-``tiebreak`` one."""
    w = Window.partitionBy(on, ts).orderBy(F.col(tiebreak).desc())
    return (
        right.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
) -> DataFrame:
    """Backward-inclusive as-of join (left join semantics).

    Returns every ``left`` column plus every non-key ``right`` column
    (null when the key has no right row at or before ``left_ts``).
    """
    right_vals = [
        c for c in right.columns if c not in (right_on, right_ts)
    ]
    overlap = set(right_vals) & set(left.columns)
    assert not overlap, f"rename right columns first: {overlap}"

    l_tagged = left.select(
        F.col(left_on).alias(_KEY),
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        *[F.col(c) for c in left.columns],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c)
          for c in right_vals],
    )
    r_tagged = right.select(
        F.col(right_on).alias(_KEY),
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns],
        *[F.col(c) for c in right_vals],
    )
    u = l_tagged.unionByName(r_tagged)

    # right (side=0) sorts before left (side=1) at equal ts => the
    # carry-forward includes a right row with right_ts == left_ts.
    w = (
        Window.partitionBy(_KEY)
        .orderBy(F.col(_TS).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *[F.col(c) for c in left.columns],
        F.col(_SIDE),
        *[
            F.last(c, ignorenulls=True).over(w).alias(c)
            for c in right_vals
        ],
    )
    return filled.filter(F.col(_SIDE) == 1).drop(_SIDE)
