"""Write-side data layout: Z-order clustering + zone-map statistics.

At 100 TB the cheapest query is the one that never reads the file:
parquet row-group pruning works off per-file min/max statistics
("zone maps"), and those are only tight if the writer CLUSTERED the
data on the filter columns first. Sorting on one column makes its
zone maps perfect and every other column's useless; interleaving the
bits of two (or more) columns into a Z-value and range-partitioning
on that gives every interleaved column zone maps a constant factor
of optimal — multi-dimensional data skipping from a one-dimensional
sort (the technique behind Delta/Iceberg ``OPTIMIZE ZORDER BY``).

Everything here is exact int64 bit math, generated once and emitted
to both engines, so the oracle replays the layout bit-for-bit.

At scale the physical write is ``df.repartitionByRange(n_files,
zvalue).sortWithinPartitions(zvalue).write...`` — one range shuffle,
then each task writes one tight file. The registry query models the
file boundaries with ``ntile`` over a global Z-sort instead (a
single-partition window) because the oracle needs deterministic,
engine-replayable file assignment; the zone-map table it emits is
the same either way.

Reference parity note: the reference (Hadoop TextOutputFormat,
`Indexer.java:158-166`) has no statistics or layout control at all;
this module is north-star scale surface.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def zvalue(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative int64
    columns: x's bit i lands at 2i+1, y's at 2i. Pure bitwise
    expressions — whole-stage-codegen'd, no UDF."""
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
        terms.append(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return functools.reduce(lambda a, b: a + b, terms)


def zvalue_sql_duckdb(x: str, y: str, bits: int = 16) -> str:
    """DuckDB expression computing the same interleave (``>> & <<``
    operators). Each bit is cast to BIGINT before the shift —
    DuckDB's INTEGER ``1 << 31`` overflows where Spark's long path
    doesn't."""
    terms = []
    for i in range(bits):
        terms.append(
            f"(((({x} >> {i}) & 1)::BIGINT) << {2 * i + 1})"
        )
        terms.append(f"(((({y} >> {i}) & 1)::BIGINT) << {2 * i})")
    return "(" + " + ".join(terms) + ")"


def scale_to_bits(
    c: Column, cmin: Column, cmax: Column, bits: int = 16
) -> Column:
    """Min-max scale an integer column onto ``[0, 2^bits)`` so both
    Z-order dimensions contribute equally-weighted bits — without
    this, the wider-domain column dominates the high interleaved
    bits and the narrow one gets no clustering. Exact-replay float
    path: (int - int) * const / (int - int), then ``floor`` — all
    order-independent IEEE ops. Production systems use approximate
    quantile ranks instead (uniform occupancy under skew); min-max
    keeps the oracle exact and the zone-map semantics identical."""
    top = F.lit((1 << bits) - 1)
    span = (cmax - cmin).cast("double")
    return F.floor(
        (c - cmin).cast("double") * top / F.greatest(span, F.lit(1.0))
    ).cast("long")


def scale_to_bits_sql(
    c: str, cmin: str, cmax: str, bits: int = 16
) -> str:
    """DuckDB text replaying :func:`scale_to_bits`."""
    top = (1 << bits) - 1
    return (
        f"CAST(floor(CAST({c} - {cmin} AS DOUBLE) * {top} / "
        f"greatest(CAST({cmax} - {cmin} AS DOUBLE), 1.0)) AS BIGINT)"
    )


def zone_map(
    df: DataFrame,
    file_col: str,
    stat_cols: list[str],
) -> DataFrame:
    """Per-file min/max/count over ``stat_cols`` — the data-skipping
    index a scan planner consults before touching bytes."""
    aggs = [F.count("*").alias("n_rows")]
    for c in stat_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return df.groupBy(file_col).agg(*aggs)


def pruned_fraction(
    zones, min_col: str, max_col: str, lo: int, hi: int
) -> float:
    """Fraction of files a range predicate ``[lo, hi]`` can SKIP
    given a collected zone-map (list of Rows) — the metric that makes
    two layouts comparable."""
    n = len(zones)
    overlap = sum(
        1 for z in zones if not (z[max_col] < lo or z[min_col] > hi)
    )
    return (n - overlap) / n if n else 0.0


# ------------------------------------------------- file compaction

def compaction_plan(
    manifest: DataFrame,
    target_bytes: int,
    unit_col: str = "unit",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Assign write units (files/partitions) to output bins by
    cumulative size: unit i lands in bin ``floor(cum_bytes_before_i /
    target_bytes)`` in ``unit_col`` order — the same fixed-width
    splitting ``spark.sql.files.maxPartitionBytes`` applies to scan
    splits, here used as the *compaction* plan that rewrites a
    small-files directory into ~``ceil(total/target)`` outputs.

    The manifest is metadata (one row per file/partition — at 100 TB
    maybe 10^6 rows), so the single-partition ordering window is
    cheap by construction; the data movement it plans is executed by
    :func:`compact_to_target` with a shuffle keyed on the bin id.
    """
    w = (
        Window.orderBy(unit_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # integer division ("div"), not floor(double /): exact for any
    # byte total (see range_join_counts for the same hazard)
    return manifest.select(
        unit_col,
        bytes_col,
        (F.sum(bytes_col).over(w) - F.col(bytes_col))
        .cast("long")
        .alias("_cum_before"),
    ).select(
        unit_col,
        bytes_col,
        F.expr(f"_cum_before div {int(target_bytes)}").alias("bin"),
    )


def compact_to_target(
    df: DataFrame,
    plan: DataFrame,
    path: str,
    unit_col: str = "unit",
) -> None:
    """Execute a :func:`compaction_plan`: tag each row with its
    unit's bin (broadcast join on the metadata-sized plan), then
    write one file per bin — ``repartition(bin)`` + dynamic
    partition overwrite, so re-running a failed compaction rewrites
    the same bins idempotently."""
    binned = df.join(F.broadcast(plan.select(unit_col, "bin")), unit_col)
    n_bins = plan.agg(F.max("bin")).first()[0] + 1
    (
        binned.repartition(int(n_bins), "bin")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bin")
        .parquet(path)
    )
