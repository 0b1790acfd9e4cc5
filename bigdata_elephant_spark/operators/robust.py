"""Robust statistics over groups: exact medians without row sorts,
MAD (median absolute deviation) outlier flagging.

Extends the engine's order-statistics family (see
``plans/pipeline_queries.py::q_exact_median_mode``) with the robust
z-score sweep used to catch corrupted numeric columns before
training: mean/std outlier rules break down exactly when the data is
dirty (the outliers inflate the std); median/MAD does not.

Scale design: every median here is computed from the per-group
DISTINCT-VALUE frequency table (values pre-rounded to 6 decimals, so
the grid is bounded), with a running count over values — the window
sorts values, never rows. The corpus-sized stages are plain
partial+final aggregations and one broadcast join back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_exact_median(
    df: DataFrame, group: str, value: str
) -> DataFrame:
    """Exact per-group median of ``value`` (mean of the two middle
    order statistics for even counts) → ``(group, median)``.

    ``value`` must already be on a bounded grid (pre-round floats to
    6 decimals); the rank window runs over the (group, value)
    frequency table, so no row-level sort exists in the plan.
    """
    vals = df.groupBy(group, value).agg(F.count("*").alias("cnt"))
    w = (
        Window.partitionBy(group)
        .orderBy(value)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = vals.withColumn("cum", F.sum("cnt").over(w))
    totals = vals.groupBy(group).agg(F.sum("cnt").alias("n"))
    return (
        cum.join(F.broadcast(totals), group)
        .groupBy(group)
        .agg(
            F.round(
                (
                    F.min(
                        F.when(
                            F.col("cum")
                            >= F.floor((F.col("n") + 1) / 2),
                            F.col(value),
                        )
                    )
                    + F.min(
                        F.when(
                            F.col("cum")
                            >= F.ceil((F.col("n") + 1) / 2),
                            F.col(value),
                        )
                    )
                )
                / 2,
                6,
            ).alias("median")
        )
    )


def mad_outliers(
    df: DataFrame,
    group: str,
    value: str,
    id_col: str,
    n_mads: float = 3.0,
) -> DataFrame:
    """Median/MAD outlier flags →
    ``(id, group, v, dev, med, mad)`` for rows with
    ``|v − median| > n_mads · MAD`` within their group.

    Two applications of :func:`grouped_exact_median` (one on the
    values, one on the absolute deviations), each a bounded-grid
    frequency-table median; the data passes three times total, all
    expression-only. Groups where MAD = 0 (over half the values
    identical) flag every row off the median — the textbook caveat,
    kept because silently suppressing it hides real corruption.
    """
    vals = df.select(
        F.col(id_col),
        F.col(group),
        F.round(F.col(value), 6).alias("v"),
    )
    med = grouped_exact_median(vals, group, "v").withColumnRenamed(
        "median", "med"
    )
    devs = vals.join(F.broadcast(med), group).withColumn(
        "dev", F.round(F.abs(F.col("v") - F.col("med")), 6)
    )
    mad = grouped_exact_median(
        devs, group, "dev"
    ).withColumnRenamed("median", "mad")
    return (
        devs.join(F.broadcast(mad), group)
        .filter(F.col("dev") > F.lit(n_mads) * F.col("mad"))
        .select(id_col, group, "v", "dev", "med", "mad")
    )
