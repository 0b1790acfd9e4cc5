"""Event-sequence operators: Markov transition mining and interval
sweep-line concurrency.

Extends the reference surface (zigzak1996/BigData-elephant stops at a
TF index over static documents, `Indexer.java:151-165`; it has no
event/sequence processing at all) with the two classic ordered-event
workloads product analytics needs over the `events` table.

Scale notes
-----------
* ``event_transitions`` shuffles once on ``user_id`` (the window
  partition key); the transition matrix it aggregates to is
  ``|event_types|^2`` rows — metadata-sized at any corpus scale.
* ``concurrency_timeline`` avoids the textbook single-partition
  global running sum: the prefix sum is computed in two phases
  (per-bucket net deltas -> exclusive cumulative offsets over the
  tiny bucket table -> within-bucket running sums in parallel), so
  the only single-partition sort is over time buckets (hours), never
  over events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def event_transitions(events: DataFrame) -> DataFrame:
    """Per-user consecutive event-type pairs -> the corpus Markov
    transition matrix ``(from_type, to_type, n, p)``.

    ``p`` is the row-normalized transition probability
    ``n / sum(n over from_type)`` rounded to 6 decimals (one integer
    division per output row — order-independent, engine-portable).
    Event order within a user is ``(ts, event_id)`` — ``event_id`` is
    unique, so the sequence (and therefore every count) is fully
    deterministic.

    Plan shape: one shuffle on ``user_id`` for the ``lead`` window,
    one partial+final count aggregation, then a window over the
    transition matrix itself (tiny: ``|types|^2`` rows).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    counts = seq.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n")
    )
    w_row = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.round(
            F.col("n") / F.sum("n").over(w_row), 6
        ).alias("p"),
    )


def concurrency_timeline(events: DataFrame) -> DataFrame:
    """Max concurrent sessions per hour via a distributed sweep line
    -> ``(hour, max_concurrent)``.

    Each event is treated as a session active over the half-open
    interval ``[ts, ts + max(int(value), 0) seconds)``: +1 at the
    start edge, -1 at the end edge, and the concurrency at any edge
    is the running sum of deltas in ``(t, delta)`` order (ends sort
    before starts at the same instant, so a back-to-back handoff
    never double-counts). Rows with equal ``(t, delta)`` are
    interchangeable — any serialization yields the same per-hour
    maximum — so the result is deterministic without a unique
    tie-break column. The per-hour max considers the hour's
    *entering* level as well as every post-edge level (an hour whose
    first edge is an end — e.g. a 10:30-11:30 session — still reports
    the carried-in concurrency, not the post-drop level), so the
    output truly is "max concurrent at any instant of the hour" for
    every hour that has at least one edge.

    The running sum is two-phase so no event-sized data ever passes
    through a single-partition sort:

    1. per-hour net delta (one partial+final agg),
    2. exclusive cumulative offset over the HOUR table (the only
       global window — bucket-count rows, metadata-sized even for
       years of data),
    3. within-hour running sums partitioned by hour (parallel), each
       shifted by its hour's offset.

    Hours with no start/end edge do not appear in the output (a
    session spanning a silent hour keeps the level constant there).
    """
    dur = F.greatest(F.col("value").cast("int"), F.lit(0))
    # Both edges of a session come out of ONE events scan via an
    # inline 2-element explode — the previous starts/ends unionAll
    # read the table twice (r15; guide §2.4/§6: the union's second
    # scan was the only repeated corpus pass in this query).
    deltas = events.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("ts").alias("t"), F.lit(1).alias("d")
                ),
                F.struct(
                    F.timestamp_add("SECOND", dur, F.col("ts")).alias(
                        "t"
                    ),
                    F.lit(-1).alias("d"),
                ),
            )
        ).alias("e")
    ).select(
        F.col("e.t").alias("t"),
        F.col("e.d").alias("d"),
        F.date_trunc("hour", F.col("e.t")).alias("hour"),
    )
    nets = deltas.groupBy("hour").agg(F.sum("d").alias("net"))
    w_hours = (
        Window.orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = nets.select(
        "hour",
        (F.sum("net").over(w_hours) - F.col("net")).alias("offset"),
    )
    w_in = (
        Window.partitionBy("hour")
        .orderBy("t", "d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = deltas.withColumn("run", F.sum("d").over(w_in))
    # Post-edge level = offset + run; pre-edge level = offset + run
    # - d. Within an hour each pre-edge level equals the previous
    # row's post-edge level EXCEPT at the first edge, where it is the
    # hour's entering (carry-in) level — so max(greatest(post, pre))
    # is exactly max(entering level, all post-edge levels).
    lvl = F.col("offset") + F.col("run")
    return (
        # offsets is the HOUR table — bucket-count rows, bounded by
        # the data's time span (metadata-sized even for years), so
        # the hint is safe by construction (session.py broadcast
        # gate rationale)
        running.join(F.broadcast(offsets), "hour")
        .groupBy("hour")
        .agg(
            F.max(F.greatest(lvl, lvl - F.col("d"))).alias(
                "max_concurrent"
            )
        )
    )
