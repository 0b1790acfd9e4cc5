"""Structured Streaming over the ``events`` table.

The reference is batch-only (SURVEY §2: "Streaming: none"), so this
whole module is north-star surface: the same event aggregations a
batch user writes, expressed as incremental streaming plans.

Design rules:

- Every aggregation is written once against a DataFrame and works on
  BOTH the batch and the streaming reader (parity tests assert the
  outputs are identical) — watermarking is the only stream-specific
  line.
- Watermarks bound state: ``withWatermark("ts", delay)`` lets Spark
  drop window state older than the delay, which is what makes a
  windowed aggregation runnable forever at 100 TB/day ingest.
- Sinks are exactly-once-friendly: tests use the ``memory`` sink;
  production would use ``foreachBatch`` + idempotent parquet/Delta
  writes.

File-based micro-batch source over the testdata parquet stands in
for Kafka: the plan shape (source -> watermark -> stateful agg ->
sink) is identical.
"""

from __future__ import annotations

import atexit
import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_elephant_spark.sources.corpus import read_table

_STAGE_DIRS: list[str] = []


def _new_stage_dir() -> str:
    d = tempfile.mkdtemp(prefix="elephant_events_stream_")
    _STAGE_DIRS.append(d)
    return d


@atexit.register
def _cleanup_stage_dirs() -> None:
    while _STAGE_DIRS:
        shutil.rmtree(_STAGE_DIRS.pop(), ignore_errors=True)


def read_events_stream(
    spark: SparkSession, sf_dir: str, n_chunks: int = 1
) -> DataFrame:
    """Micro-batch file stream with the explicit events schema.

    The file-stream source wants a *directory* it can watch; testdata
    ships one parquet file, so stage it into a temp dir (a stand-in
    for the landing directory a real ingest pipeline appends to;
    cleaned up atexit).

    ``n_chunks > 1`` splits the data into time-sliced chunk files
    with strictly increasing mtimes, so the source (oldest-first)
    replays them as ``n_chunks`` forward-in-time micro-batches —
    the shape real ingest has, where each trigger advances the
    watermark without stranding earlier data behind it. Chunks are
    equal *time* slices cut with distributed filters (no driver-side
    collect, no global sort — each chunk is one filtered scan).
    """
    batch = read_table(spark, sf_dir, "events")
    src_file = f"{sf_dir.rstrip('/')}/events.parquet"
    raw_schema = spark.read.parquet(src_file).schema
    stage_dir = _new_stage_dir()
    if n_chunks <= 1:
        shutil.copy(src_file, stage_dir)
    else:
        raw = spark.read.parquet(src_file)
        lo, hi = raw.agg(
            F.min("ts").alias("lo"), F.max("ts").alias("hi")
        ).first()
        # ts is either a timestamp or raw epoch-nanos bigint; integer
        # division keeps nanos exact (they exceed double's 53 bits).
        step = (
            (hi - lo) // n_chunks if isinstance(lo, int)
            else (hi - lo) / n_chunks
        )
        for i in range(n_chunks):
            t0 = lo + step * i
            chunk = raw.where(F.col("ts") >= F.lit(t0))
            if i < n_chunks - 1:
                chunk = chunk.where(F.col("ts") < F.lit(lo + step * (i + 1)))
            tmp = f"{stage_dir}/_chunk-{i:03d}"
            chunk.coalesce(1).write.mode("overwrite").parquet(tmp)
            (part,) = glob.glob(f"{tmp}/part-*.parquet")
            path = f"{stage_dir}/chunk-{i:03d}.parquet"
            shutil.move(part, path)
            shutil.rmtree(tmp)
            os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = open_events_stream(spark, stage_dir, raw_schema)
    assert stream.schema == batch.schema
    return stream


def open_events_stream(
    spark: SparkSession, stage_dir: str, raw_schema
) -> DataFrame:
    """File micro-batch stream over an existing landing directory —
    the restart path: a new query with the same checkpoint resumes
    from the last committed file, processing only newly landed ones."""
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    # same nanos->micros conversion as the batch reader
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return stream


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Per-(window, event_type) count/sum with late-data watermark."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count("*").alias("n"),
            # exact decimal sum: order-independent across micro-batch
            # boundaries and engines (see functions/numeric.py)
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 4)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "win_start"
            ),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_value_avg(
    events: DataFrame,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "4 hours",
) -> DataFrame:
    """Sliding-window average value per event_type."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window, slide), "event_type")
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(12,2)")).cast("double")
                / F.count("value"),
                6,
            ).alias("avg_value")
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "win_start"
            ),
            "event_type",
            "avg_value",
        )
    )


def user_sessions(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Data-driven session windows per user (built-in session_window).

    One stateful aggregation only — a streaming query can't chain two
    (the per-user rollup happens on the materialized output; see
    :func:`session_counts`).
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return src.groupBy(F.session_window("ts", gap), "user_id").agg(
        F.count("*").alias("n_events")
    )


def session_counts(sessions: DataFrame) -> DataFrame:
    """Per-user rollup of :func:`user_sessions` output (batch side)."""
    return sessions.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
    )


def enrich_with_users(
    events: DataFrame, customer: DataFrame
) -> DataFrame:
    """Stream-static enrichment join: each (possibly streaming) event
    picks up its customer's segment/nation via a broadcast hash join
    against the static dimension — the standard shape for decorating
    a 100 TB/day stream with reference data (the static side is
    re-read per micro-batch, so slowly-changing dimensions stay
    fresh without restarting the query)."""
    from bigdata_elephant_spark.session import maybe_broadcast

    # customer grows with scale factor: size-gate the hint (a forced
    # broadcast fails past 8 GB instead of degrading). Past the cap
    # the stream-static join hashes the dimension per micro-batch.
    dim = maybe_broadcast(
        customer.select(
            F.col("c_custkey").alias("user_id"),
            "c_mktsegment",
            "c_nationkey",
        ),
        size_of=customer,
    )
    return events.join(dim, "user_id", "left").select(
        "event_id", "user_id", "event_type", "c_mktsegment", "c_nationkey"
    )


def click_purchase_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    lookback: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: attribute each purchase to the
    same user's clicks in the preceding ``lookback`` window.

    Both sides carry event-time watermarks and the join condition
    bounds click_ts to [purchase_ts - lookback, purchase_ts], so the
    state store provably evicts: a buffered click can only match
    purchases arriving within lookback + watermark of it. Without
    the range bound Spark must buffer both streams forever — the
    condition is the scale contract, not an optimization. Inner
    stream-stream joins emit in append mode only.

    Works identically on batch frames (no watermark applied), which
    is what the DuckDB oracle replays."""
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    if c.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if p.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    return c.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {lookback}")
        ),
        "inner",
    ).select(
        "click_id",
        "purchase_id",
        "user_id",
        # second-granularity gap; timestamps cast to epoch seconds
        (F.col("purchase_ts").cast("long") - F.col("click_ts").cast("long"))
        .alias("gap_s"),
    )


ANOMALY_OUT_SCHEMA = (
    "user_id long, n_events long, n_flagged long"
)
ANOMALY_STATE_SCHEMA = "cnt long, vsum double, flagged long"


def user_running_anomalies(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``.

    Per user, flag every event whose ``value`` exceeds the running
    mean of that user's *prior* events (ordered by ``ts, event_id``)
    and emit ``(user_id, n_events, n_flagged)``. The running
    ``(count, sum, flagged)`` state persists across micro-batches in
    the state store — the shape built-in windowed aggregation cannot
    express (the predicate depends on fold-ordered history).

    Arrow ships each user's batch rows to Python as pandas frames;
    state is O(1) per user regardless of history length, so the
    operator runs forever at any ingest rate.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        cnt, vsum, flagged = state.get if state.exists else (0, 0.0, 0)
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values(["ts", "event_id"])
        for v in rows["value"]:
            if cnt > 0 and v > vsum / cnt:
                flagged += 1
            cnt += 1
            vsum += float(v)
        state.update((cnt, vsum, flagged))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [cnt],
                "n_flagged": [flagged],
            }
        )

    return events.select("user_id", "ts", "event_id", "value").groupBy(
        "user_id"
    ).applyInPandasWithState(
        fn,
        ANOMALY_OUT_SCHEMA,
        ANOMALY_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


EVENTS_JSON_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Production source: the same events stream from Kafka.

    Returns the identical schema as :func:`read_events_stream`, so
    every downstream operator is source-agnostic — swap the reader,
    keep the pipeline. ``maxOffsetsPerTrigger`` is the backpressure
    knob (rows per micro-batch across all partitions); exactly-once
    end-to-end = this source's offset tracking in the checkpoint +
    an idempotent sink (:func:`run_stream_to_parquet`).

    Requires the spark-sql-kafka package on the classpath — absent in
    this container, so this is covered by a gated test; the plan
    construction below is the complete production wiring.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger:
        reader = reader.option(
            "maxOffsetsPerTrigger", str(max_offsets_per_trigger)
        )
    raw = reader.load()
    return raw.select(
        F.from_json(
            F.col("value").cast("string"), EVENTS_JSON_SCHEMA
        ).alias("e")
    ).select("e.*")


def kafka_available(spark: SparkSession) -> bool:
    """True when the Kafka source package is on the classpath."""
    try:
        spark.readStream.format("kafka").option(
            "kafka.bootstrap.servers", "x:9092"
        ).option("subscribe", "t").load()
        return True
    except Exception as ex:
        missing = (
            "DATA_SOURCE_NOT_FOUND" in str(ex)
            or "Failed to find data source" in str(ex)
        )
        return not missing


def tws_available() -> bool:
    """transformWithStateInPandas (Spark 4 successor of
    applyInPandasWithState) needs the protobuf runtime for its state
    server protocol; absent in this container."""
    try:
        import google.protobuf.descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def user_event_counts_tws(events: DataFrame) -> DataFrame:
    """Per-user running event count via ``transformWithStateInPandas``
    — the modern typed-state API (ValueState/MapState/ListState +
    timers, state schema evolution). Functionally equivalent to a
    grouped count; kept as the migration template for
    :func:`user_running_anomalies` once the environment has
    protobuf. Raises ImportError where unavailable (see
    :func:`tws_available`)."""
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
    )

    class Counts(StatefulProcessor):
        def init(self, handle) -> None:
            self.n = handle.getValueState(
                "n", StructType([StructField("n", LongType())])
            )

        def handleInputRows(self, key, rows, timerValues):
            total = sum(len(pdf) for pdf in rows)
            cur = self.n.get()
            base = cur[0] if cur else 0
            self.n.update((base + total,))
            yield pd.DataFrame({"user_id": [key[0]], "n": [base + total]})

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=Counts(),
        outputStructType="user_id long, n long",
        outputMode="Update",
        timeMode="None",
    )


def run_stream_to_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    transform=None,
) -> None:
    """Exactly-once-friendly production sink: ``foreachBatch`` writes
    each micro-batch to a ``batch_id=N`` partition with overwrite —
    replays after failure rewrite the same partition instead of
    duplicating rows (idempotence from deterministic batch ids +
    partition overwrite), and the checkpoint dir makes restarts
    resume from the last committed batch.

    ``transform`` (optional, ``DataFrame -> DataFrame``) runs the
    full BATCH planner on each micro-batch before the write — the
    standard escape for pipelines Structured Streaming can't plan
    inside one streaming query (e.g. two chained aggregations). A
    deterministic transform keeps the replay idempotence: the same
    batch re-derives the same rows into the same partition."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if transform is not None:
            batch_df = transform(batch_df)
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(path)
        )

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_stream_to_memory(
    stream_df: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drive a streaming plan to completion against the finite file
    source; returns the materialized result table."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.table(name)


def write_events_kafka(
    stream_df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
):
    """Production sink mirror of :func:`read_events_kafka`: each row
    serializes to a JSON ``value`` (keyed by ``user_id`` so one
    user's events stay in one Kafka partition, preserving per-key
    order for downstream consumers) and streams to the topic with
    exactly-once-per-checkpoint semantics on the Spark side (the
    Kafka producer is at-least-once; idempotent consumers or
    transactional topics close the gap). Requires the
    spark-sql-kafka package — absent in this container, so covered
    by the same gated test as the reader."""
    payload = stream_df.select(
        F.col("user_id").cast("string").alias("key"),
        F.to_json(F.struct(*stream_df.columns)).alias("value"),
    )
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def read_embeddings_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Micro-batch file stream over the embeddings table — the
    landing shape of an embedding-ingest pipeline (each encoder run
    drops a parquet batch; admission keeps up incrementally). Same
    staging mechanics as :func:`read_documents_stream`."""
    src_file = f"{sf_dir.rstrip('/')}/embeddings.parquet"
    schema = spark.read.parquet(src_file).schema
    stage_dir = _new_stage_dir()
    shutil.copy(src_file, stage_dir)
    return spark.readStream.schema(schema).parquet(stage_dir)


def read_documents_stream(
    spark: SparkSession, sf_dir: str, n_chunks: int = 1
) -> DataFrame:
    """Micro-batch file stream over the documents table — the
    landing-directory shape of a streaming corpus ingest (each new
    crawl dump appears as a file; the curation query keeps up
    incrementally instead of re-running batch over everything).
    Same staging mechanics as :func:`read_events_stream`.

    ``n_chunks > 1`` splits the corpus into ``doc_id``-range chunk
    files with strictly increasing mtimes + ``maxFilesPerTrigger 1``,
    so the query really runs ``n_chunks`` micro-batches — without
    it, a single staged file means ONE batch and any claimed
    batch-boundary invariance is never actually exercised (r10
    review finding)."""
    src_file = f"{sf_dir.rstrip('/')}/documents.parquet"
    raw = spark.read.parquet(src_file)
    schema = raw.schema
    stage_dir = _new_stage_dir()
    if n_chunks <= 1:
        shutil.copy(src_file, stage_dir)
        return spark.readStream.schema(schema).parquet(stage_dir)
    lo, hi = raw.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    ).first()
    if lo is None:  # empty table: nothing to chunk (r10 ADVICE —
        # the arithmetic below would TypeError on None)
        shutil.copy(src_file, stage_dir)
        return spark.readStream.schema(schema).parquet(stage_dir)
    step = max((hi - lo) // n_chunks, 1)
    for i in range(n_chunks):
        chunk = raw.where(F.col("doc_id") >= F.lit(lo + step * i))
        if i < n_chunks - 1:
            chunk = chunk.where(
                F.col("doc_id") < F.lit(lo + step * (i + 1))
            )
        tmp = f"{stage_dir}/_chunk-{i:03d}"
        chunk.coalesce(1).write.mode("overwrite").parquet(tmp)
        (part,) = glob.glob(f"{tmp}/part-*.parquet")
        path = f"{stage_dir}/chunk-{i:03d}.parquet"
        shutil.move(part, path)
        shutil.rmtree(tmp)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
