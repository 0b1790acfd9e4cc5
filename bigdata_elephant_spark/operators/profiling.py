"""Data-quality profiling: the hygiene pass a training-data pipeline
runs before anything else touches a new 100 TB drop.

:func:`profile` computes per-column null counts, exact distinct
counts, and min/max in ONE scan: all statistics for all columns are
aggregate expressions in a single ``agg`` (Catalyst fuses them into
one pass with map-side partials), then the wide one-row result is
unpivoted driver-side into long format. Never one-job-per-column —
at 100 TB each extra pass is the whole bill again.

Exact ``count_distinct`` on many columns multiplies shuffle volume
(one expand branch per distinct agg); at scale flip
``approximate=True`` (HyperLogLog++, one pass, fixed memory,
~2% error).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(
    df: DataFrame,
    cols: list[str] | None = None,
    approximate: bool = False,
) -> DataFrame:
    """Long-format profile: ``(column, n_nulls, n_distinct, min_str,
    max_str)``, one row per profiled column (min/max rendered as
    strings so mixed types fit one schema)."""
    cols = cols or df.columns
    aggs = []
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}")
        )
        nd = (
            F.approx_count_distinct(c)
            if approximate
            else F.count_distinct(c)
        )
        aggs.append(nd.cast("long").alias(f"__nd_{c}"))
        aggs.append(F.min(c).cast("string").alias(f"__mn_{c}"))
        aggs.append(F.max(c).cast("string").alias(f"__mx_{c}"))
    wide = df.agg(*aggs)

    # unpivot the single wide row via stack() — stays one Spark job
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column, n_nulls, n_distinct, min_str, max_str)"
    )
