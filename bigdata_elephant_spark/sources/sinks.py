"""Sinks: the write-side patterns that make the read-side fast.

The reference's only sink is a tab-delimited ``TextOutputFormat``
directory per job (``Vocabulary.java:144``, ``Indexer.java:163``,
``Query.java:272,289``). Here the lake is columnar and laid out for
pruning:

- :func:`write_table` — plain columnar write in any supported format
  (parquet default; orc/json/csv for interchange).
- :func:`write_partitioned` — hive-style ``partitionBy`` layout.
  Filters on the partition columns become *directory* pruning: a
  100 TB table partitioned by day serves a one-day query by listing
  one directory.
- :func:`write_bucketed` — ``bucketBy(n, keys)`` + ``sortWithinBuckets``.
  Two tables bucketed the same way join with ZERO shuffle (the plan
  test proves no Exchange appears): at 100 TB the shuffle *is* the
  join cost, so pre-bucketing fact tables on their join key is the
  single highest-leverage layout decision.

All writers take mode="overwrite" semantics from the caller; nothing
here ever writes outside the given path/table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    compression: str | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Columnar (or interchange-format) write of ``df`` to ``path``.

    ``compression``: parquet default is snappy (fast, ~2x); zstd
    trades ~30% more CPU for ~30% smaller files — at 100 TB the
    storage + network savings usually win, so production tables use
    zstd and hot intermediate datasets keep snappy.
    ``max_records_per_file`` caps file size writer-side (the
    complement of :func:`compact`: prevent too-big instead of heal
    too-small).
    """
    w = df.write.format(fmt).mode(mode)
    if compression:
        w = w.option("compression", compression)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.save(path)


def read_back(
    spark: SparkSession, path: str, fmt: str = "parquet", schema=None
):
    """Read a written table back; explicit schema for text formats
    (csv/json carry no types — never infer, same rule as the corpus
    reader)."""
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
    return reader.load(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Hive-layout write; queries filtering on ``partition_cols``
    prune at directory-listing time (no footer reads, no data IO)."""
    df.write.format(fmt).mode(mode).partitionBy(*partition_cols).save(path)


def compact(
    spark: SparkSession,
    src: str,
    dst: str,
    target_files: int,
    fmt: str = "parquet",
) -> None:
    """Small-file compaction: rewrite ``src`` as ``target_files``
    files at ``dst``.

    Streaming sinks and fine-grained partitioning both breed small
    files; at 100 TB the file-listing and footer overhead of millions
    of 1 MB files dominates scan startup. `coalesce` (not
    `repartition`) avoids a shuffle — it only merges read splits.
    Run per partition directory in production, sized so files land
    near the 128 MB–1 GB sweet spot.
    """
    df = spark.read.format(fmt).load(src)
    df.coalesce(target_files).write.format(fmt).mode("overwrite").save(dst)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: co-locates rows by hash(bucket_cols).

    Joins/aggregations keyed on ``bucket_cols`` between tables with
    identical bucketing read pre-shuffled data — Catalyst drops the
    Exchange on both sides. ``sort_cols`` additionally pre-sorts
    within buckets (sort-merge join without the sort).
    """
    w = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
