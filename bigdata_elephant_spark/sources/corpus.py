"""Sources: JSON-lines corpus reader + parquet table readers.

The reference ingests a WikiExtractor JSON-lines corpus with an
implicit, inconsistently-typed schema (``id`` parsed as string at
``Vocabulary.java:37``, as int at ``Indexer.java:92``, kept as string
at ``ParseDocument.java:39``). Here the schema is explicit and ``id``
is a long, cast on ingest — never inferred (inference would scan the
data twice and can flip types between shards at 100 TB).

Glob pruning: the reference hardcodes the shard glob ``"/AA*"``
(``Vocabulary.java:25,143``). ``read_corpus`` exposes that as an
optional ``glob`` argument — path globs prune at file-listing time,
before any bytes are read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

# WikiExtractor record: {"id": ..., "url": ..., "title": ..., "text": ...}
# id declared string then cast: tolerates shards writing it quoted.
CORPUS_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("url", StringType()),
        StructField("title", StringType()),
        StructField("text", StringType()),
    ]
)

TPCH_TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def read_corpus(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Read a JSON-lines corpus with the explicit schema.

    Returns ``(doc_id long, url, title, text)``. ``glob`` (e.g.
    ``"AA*"``) restricts which shard files are listed — file-level
    input pruning, the Spark equivalent of the reference's
    hardcoded ``/AA*``.

    ``mode``: ``PERMISSIVE`` (default) nulls the fields of malformed
    lines instead of failing the 10-hour job at record 10^11 — rows
    with a null ``doc_id`` are dropped (the reference would have
    thrown mid-job, ``Vocabulary.java:37``); ``FAILFAST`` surfaces
    the first malformed record for debugging an ingest.
    """
    src = f"{path.rstrip('/')}/{glob}" if glob else path
    df = spark.read.schema(CORPUS_SCHEMA).option("mode", mode).json(src)
    # try_cast: under ANSI semantics a plain cast would abort the job
    # on the first unparsable id; PERMISSIVE tolerates and drops it.
    id_cast = (
        F.expr("try_cast(id AS BIGINT)")
        if mode == "PERMISSIVE"
        else F.col("id").cast(LongType())
    )
    out = df.select(
        id_cast.alias("doc_id"), "url", "title", "text"
    )
    if mode == "PERMISSIVE":
        out = out.filter(F.col("doc_id").isNotNull())
    return out


def read_corpus_csv(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    header: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """CSV corpus ingest with a quarantine lane.

    Returns ``(good, quarantined)``: well-formed rows land in the
    same ``(doc_id long, url, title, text)`` frame every downstream
    operator takes (source-agnostic pipelines — swap the reader, keep
    the plan); malformed lines (wrong column count, unparsable id)
    are CAPTURED, not dropped and not fatal — at 10^11 records a bad
    shard must neither kill the 10-hour job (FAILFAST) nor vanish
    silently (plain PERMISSIVE). Both outputs are lazy projections of
    ONE scan; writing the quarantine frame to a side table gives the
    ingest an auditable dead-letter queue.

    ``multiLine`` stays off: multiline CSV records make files
    unsplittable (one reader per file, no intra-file parallelism) —
    corpus text with newlines belongs in JSON-lines or parquet, and
    embedded ``\\n`` inside *quoted* fields is rejected into the
    quarantine rather than silently merging records.

    Implementation note: this parses via ``text`` + ``from_csv``
    (per-row, full schema) rather than ``spark.read.csv`` with a
    corrupt-record column. The csv reader re-parses only the columns
    each downstream plan references, so whether a short row counts
    as corrupt DEPENDS ON THE QUERY's column pruning — a row can be
    dropped from the good lane and never reach the quarantine (the
    Spark docs' referenced-columns caveat; reproduced in
    tests/test_sources.py). ``from_csv`` runs inside the projection
    with the full schema, so both lanes see one consistent parse of
    one scan.
    """
    fields = "id string, url string, title string, text string"
    lines = spark.read.text(path)
    # Header lines are NOT pre-filtered: a blanket `value != header`
    # filter would silently drop a data row that happens to equal the
    # header string — violating the captured-never-dropped contract —
    # and per-file first-line detection needs a window over every line
    # (a full extra shuffle at ingest scale). Instead header-identical
    # lines flow through the parse and land in the quarantine lane
    # with their own reason: they can never be good rows anyway, since
    # their id column is the literal string "id" (unparsable BIGINT).
    header_line = sep.join(("id", "url", "title", "text"))
    parsed = lines.select(
        "value",
        F.from_csv(
            "value",
            fields + ", _corrupt string",
            {
                "sep": sep,
                "mode": "PERMISSIVE",
                "columnNameOfCorruptRecord": "_corrupt",
            },
        ).alias("r"),
    ).select(
        "value",
        "r.*",
        F.expr("try_cast(r.id AS BIGINT)").alias("doc_id"),
    )
    is_header = (
        (F.col("value") == F.lit(header_line))
        if header
        else F.lit(False)
    )
    ok = (
        F.col("_corrupt").isNull()
        & F.col("doc_id").isNotNull()
        & ~is_header
    )
    good = parsed.filter(ok).select("doc_id", "url", "title", "text")
    quarantined = parsed.filter(~ok).select(
        F.col("value").alias("raw"),
        F.when(is_header, F.lit("header_line"))
        .when(F.col("_corrupt").isNotNull(), F.lit("malformed_line"))
        .otherwise(F.lit("bad_id"))
        .alias("reason"),
    )
    return good, quarantined


def read_parquet_evolved(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Read a parquet directory whose files span schema generations.

    ``mergeSchema`` unions the per-file schemas (an old file missing
    a later-added column yields nulls for it) instead of trusting one
    random footer — the default reads a single file's schema, so a
    scan can silently drop columns that only newer files carry.
    Schema merging reads FOOTERS, not data: cost is one metadata pass
    over the file listing, and predicate pushdown / column pruning
    still apply per file (a pruned column simply reads as null from
    generations that lack it). Widening type changes (int -> long)
    merge; incompatible ones fail loudly at plan time — the behavior
    an evolving 100 TB ingest wants."""
    src = f"{path.rstrip('/')}/{glob}" if glob else path
    return spark.read.option("mergeSchema", True).parquet(src)


def ensure_engine_confs(spark: SparkSession) -> None:
    """Set the dynamic SQL confs every query depends on, on whatever
    session we were handed. The driver harness builds its OWN
    SparkSession — without ``nanosAsLong`` the events table's
    TIMESTAMP(NANOS) column aborts the scan outright, and a non-UTC
    session timezone shifts every rendered timestamp away from the
    (UTC-naive) DuckDB oracle. Both are runtime-settable; setting
    them here, at the one choke point every query reads through,
    makes the engine session-agnostic."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Testdata timestamps are parquet TIMESTAMP(MICROS) with
    # isAdjustedToUTC=false, which Spark 4 surfaces as TIMESTAMP_NTZ
    # by default. NTZ breaks withWatermark (streaming requires
    # TimestampType) and diverges from the engine contract everywhere
    # else, so read them as TimestampType; with the session pinned to
    # UTC the wall-clock values are identical to DuckDB's naive
    # timestamps.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata parquet table (columnar scan + pushdown).

    Nanosecond-timestamp columns (parquet TIMESTAMP(NANOS), which
    Spark surfaces as long under ``nanosAsLong``) are converted to
    microsecond timestamps with integer division — same truncation
    DuckDB applies — so both engines see identical values.
    """
    ensure_engine_confs(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return df


def read_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Read several tables; defaults to the full star schema."""
    return {n: read_table(spark, sf_dir, n) for n in (names or TPCH_TABLES)}
