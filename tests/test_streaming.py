"""Streaming: batch/stream parity and watermark state handling."""

from __future__ import annotations

import uuid

import pytest

from bigdata_elephant_spark.sources.corpus import read_table
from bigdata_elephant_spark.streaming import events as ev


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_stream_equals_batch(spark, sf_dir):
    batch = ev.tumbling_counts(read_table(spark, sf_dir, "events"))
    stream = ev.tumbling_counts(ev.read_events_stream(spark, sf_dir))
    got = ev.run_stream_to_memory(
        stream, f"t_{uuid.uuid4().hex[:8]}"
    )
    cols = ["win_start", "event_type", "n", "sum_value"]
    assert _rows(got, cols) == _rows(batch, cols)


def test_sliding_stream_equals_batch(spark, sf_dir):
    batch = ev.sliding_value_avg(read_table(spark, sf_dir, "events"))
    stream = ev.sliding_value_avg(ev.read_events_stream(spark, sf_dir))
    got = ev.run_stream_to_memory(stream, f"s_{uuid.uuid4().hex[:8]}")
    cols = ["win_start", "event_type", "avg_value"]
    assert _rows(got, cols) == _rows(batch, cols)


def test_session_stream_equals_batch(spark, sf_dir):
    batch = ev.session_counts(
        ev.user_sessions(read_table(spark, sf_dir, "events"))
    )
    stream = ev.user_sessions(ev.read_events_stream(spark, sf_dir))
    got = ev.session_counts(
        ev.run_stream_to_memory(stream, f"u_{uuid.uuid4().hex[:8]}")
    )
    cols = ["user_id", "n_sessions", "n_events"]
    assert _rows(got, cols) == _rows(batch, cols)


def test_watermark_present_in_plan(spark, sf_dir):
    stream = ev.tumbling_counts(
        ev.read_events_stream(spark, sf_dir), watermark="2 hours"
    )
    assert stream.isStreaming
    plan = stream._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan


def test_stateful_anomalies_semantics(spark, sf_dir):
    """First event per user is never flagged; counts cover all events."""
    import pyspark.sql.functions as F

    stream = ev.user_running_anomalies(ev.read_events_stream(spark, sf_dir))
    got = ev.run_stream_to_memory(
        stream, f"a_{uuid.uuid4().hex[:8]}", output_mode="update"
    )
    events = read_table(spark, sf_dir, "events")
    per_user = {
        r["user_id"]: r["n"]
        for r in events.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    rows = got.collect()
    assert {r["user_id"] for r in rows} == set(per_user)
    for r in rows:
        assert r["n_events"] == per_user[r["user_id"]]
        assert 0 <= r["n_flagged"] <= r["n_events"] - 1


def test_foreachbatch_parquet_sink_idempotent(spark, sf_dir, tmp_path):
    """The foreachBatch sink lands every input row exactly once, and
    a replay of the same batch does not duplicate rows."""
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = ev.read_events_stream(spark, sf_dir).select(
        "event_id", "user_id"
    )
    ev.run_stream_to_parquet(stream, out, ckpt)
    events = read_table(spark, sf_dir, "events")
    written = spark.read.parquet(out)
    assert written.count() == events.count()
    assert written.select("event_id").distinct().count() == events.count()
    # simulate a replayed batch: rewriting batch 0 must not duplicate
    b0 = written.filter("batch_id = 0").drop("batch_id")
    import pyspark.sql.functions as F
    (
        b0.withColumn("batch_id", F.lit(0))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(out)
    )
    assert spark.read.parquet(out).count() == events.count()


def test_novelty_stream_replay_exactly_once(spark, sf_dir, tmp_path):
    """emb_stream_novelty's exactly-once claim, exercised as an
    actual REPLAY of the admission transform (not just the generic
    sink idempotence): re-running the novelty transform on a
    committed batch's input and overwriting its partition must leave
    the verdict table identical — no duplicated ids, no flipped
    verdicts. This is the same treatment emb_stream_gram's additive
    artifact got (r9), applied to the verdict-producing twin."""
    import pyspark.sql.functions as F

    from bigdata_elephant_spark.operators.similarity import (
        embedding_novelty_admission,
    )
    from bigdata_elephant_spark.plans.stream_queries import (
        NOVELTY_DELTA_ROWS,
        NOVELTY_THR,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    cut = (
        emb.agg(F.max("vec_id").alias("m")).first()["m"]
        - NOVELTY_DELTA_ROWS
    )
    base = emb.filter(F.col("vec_id") <= F.lit(cut))

    def admit(batch):
        return embedding_novelty_admission(
            base, batch, threshold=NOVELTY_THR
        )

    out = str(tmp_path / "nov_out")
    ckpt = str(tmp_path / "nov_ckpt")
    stream = ev.read_embeddings_stream(spark, sf_dir).filter(
        F.col("vec_id") > F.lit(cut)
    )
    ev.run_stream_to_parquet(stream, out, ckpt, transform=admit)

    def verdicts():
        return sorted(
            (r["vec_id"], r["nn_sim"], r["admit"])
            for r in spark.read.parquet(out)
            .select("vec_id", "nn_sim", "admit")
            .collect()
        )

    before = verdicts()
    assert len(before) == NOVELTY_DELTA_ROWS
    assert len({v[0] for v in before}) == NOVELTY_DELTA_ROWS

    # replay: re-derive batch 0's verdicts FROM ITS INPUT (the
    # transform re-runs, as a restarted foreachBatch would) and
    # overwrite the batch_id=0 partition
    b0_ids = (
        spark.read.parquet(out)
        .filter("batch_id = 0")
        .select("vec_id")
    )
    b0_input = emb.join(b0_ids, "vec_id", "left_semi")
    (
        admit(b0_input)
        .withColumn("batch_id", F.lit(0))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(out)
    )
    assert verdicts() == before


def test_multi_batch_stream_equals_batch(spark, sf_dir):
    """3 time-ordered micro-batches through a watermarked tumbling
    aggregation: state carries across triggers and no in-order data
    is stranded behind the watermark; final result equals batch."""
    batch = ev.tumbling_counts(read_table(spark, sf_dir, "events"))
    stream = ev.tumbling_counts(
        ev.read_events_stream(spark, sf_dir, n_chunks=3)
    )
    got = ev.run_stream_to_memory(stream, f"mb_{uuid.uuid4().hex[:8]}")
    cols = ["win_start", "event_type", "n", "sum_value"]
    assert _rows(got, cols) == _rows(batch, cols)


def test_multi_batch_runs_multiple_triggers(spark, sf_dir):
    """The chunked source really does produce one trigger per file."""
    stream = ev.read_events_stream(spark, sf_dir, n_chunks=3)
    agg = ev.tumbling_counts(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(f"trig_{uuid.uuid4().hex[:8]}")
        .start()
    )
    try:
        q.processAllAvailable()
        n_batches = len(q.recentProgress)
    finally:
        q.stop()
    assert n_batches >= 3


@pytest.mark.skipif(
    not ev.tws_available(),
    reason="transformWithStateInPandas needs google.protobuf "
    "(not in this container)",
)
def test_tws_counts_equal_batch(spark, sf_dir):
    stream = ev.user_event_counts_tws(ev.read_events_stream(spark, sf_dir))
    got = ev.run_stream_to_memory(
        stream, f"tws_{uuid.uuid4().hex[:8]}", output_mode="update"
    )
    batch = read_table(spark, sf_dir, "events").groupBy("user_id").count()
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_checkpoint_restart_processes_only_new_files(spark, sf_dir, tmp_path):
    """Kill-and-restart with the same checkpoint: the resumed query
    picks up after the last committed batch — every input row lands
    exactly once across both query lifetimes."""
    import os

    stage = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(stage)

    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    raw_schema = raw.schema
    pdf = raw.orderBy("ts", "event_id").toPandas()
    third = (len(pdf) + 2) // 3
    for i in range(2):  # land chunks 0 and 1
        p = f"{stage}/chunk-{i:03d}.parquet"
        pdf.iloc[i * third : (i + 1) * third].to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = ev.open_events_stream(spark, stage, raw_schema)
    ev.run_stream_to_parquet(
        stream.select("event_id", "user_id"), out, ckpt
    )
    n_first = spark.read.parquet(out).count()
    assert n_first == 2 * third

    # land chunk 2, then RESTART (fresh query object, same checkpoint)
    p = f"{stage}/chunk-002.parquet"
    pdf.iloc[2 * third :].to_parquet(p, index=False)
    os.utime(p, (1_700_000_002, 1_700_000_002))
    stream2 = ev.open_events_stream(spark, stage, raw_schema)
    ev.run_stream_to_parquet(
        stream2.select("event_id", "user_id"), out, ckpt
    )
    written = spark.read.parquet(out)
    assert written.count() == len(pdf)
    assert written.select("event_id").distinct().count() == len(pdf)
    # the resumed query appended batch 2 only (batches 0,1 untouched)
    assert written.select("batch_id").distinct().count() == 3


def test_kafka_reader_wiring(spark, sf_dir):
    """With the Kafka package absent, the reader must fail with
    data-source-not-found (proving the wiring reaches Spark's source
    resolution); where the package exists, the plan builds and its
    schema matches the file-based stream exactly."""
    if ev.kafka_available(spark):
        kdf = ev.read_events_kafka(spark, "broker:9092", "events")
        fdf = ev.read_events_stream(spark, sf_dir)
        assert kdf.schema == fdf.schema
    else:
        with pytest.raises(Exception) as ei:
            ev.read_events_kafka(spark, "broker:9092", "events")
        assert "kafka" in str(ei.value).lower()


def test_interval_join_stream_equals_batch_across_batches(spark, sf_dir):
    """Stream-stream interval join with each side split into 3 time-
    sliced micro-batches: a click buffered in the state store must
    still match a purchase arriving in a LATER trigger (and vice
    versa, purchases wait for late clicks up to the watermark).
    Result must equal the batch self-join."""
    from pyspark.sql import functions as F

    events = read_table(spark, sf_dir, "events")
    batch = ev.click_purchase_attribution(
        events.filter(F.col("event_type") == "click"),
        events.filter(F.col("event_type") == "purchase"),
    )
    stream = ev.click_purchase_attribution(
        ev.read_events_stream(spark, sf_dir, n_chunks=3).filter(
            F.col("event_type") == "click"
        ),
        ev.read_events_stream(spark, sf_dir, n_chunks=3).filter(
            F.col("event_type") == "purchase"
        ),
    )
    got = ev.run_stream_to_memory(
        stream, f"ivj_{uuid.uuid4().hex[:8]}", output_mode="append"
    )
    cols = ["click_id", "purchase_id", "user_id", "gap_s"]
    assert _rows(got, cols) == _rows(batch, cols)
    assert len(_rows(got, cols)) > 0


def test_watermark_drops_late_data_behaviorally(spark, sf_dir, tmp_path):
    """Not just 'the watermark is in the plan': stage the stream so
    old rows arrive AFTER the watermark has advanced past their
    windows, and assert append-mode output equals the on-time-only
    aggregation (finalized windows), with the late rows really gone.

    Trigger 1 delivers the newest slice of the data (watermark jumps
    to max_ts - delay), trigger 2 a sentinel on-time row, trigger 3
    day-one rows — every one of those is now behind the watermark, so
    state for their windows is never created and they influence
    nothing. This is the state-bound contract that lets a windowed
    aggregation run forever at 100 TB/day: arbitrarily old replays
    cannot resurrect state.

    The sentinel middle batch matters: the late-event filter uses the
    watermark as of the PREVIOUS COMMITTED batch, one batch behind
    the eviction boundary (verified empirically on this Spark build —
    late rows arriving in the very next trigger after the watermark
    jump are still merged, and their already-expired windows emit
    immediately). Real pipelines see the same thing: the watermark
    protects state only after it has committed."""
    import datetime
    import glob as globmod
    import shutil

    from pyspark.sql import functions as F

    raw = read_table(spark, sf_dir, "events")
    lo, hi = raw.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).first()
    delay = datetime.timedelta(hours=2)
    wm = hi - delay  # final watermark
    late_cut = lo + datetime.timedelta(days=1)
    assert late_cut + delay < wm, "testdata spans too little time"

    on_time = raw.filter(F.col("ts") >= F.lit(late_cut))
    late = raw.filter(F.col("ts") < F.lit(late_cut))
    assert late.count() > 0
    # sentinel = the max-ts row(s); chunk 0 = the rest of on-time
    bulk = on_time.filter(F.col("ts") < F.lit(hi))
    sentinel = on_time.filter(F.col("ts") == F.lit(hi))

    stage = str(tmp_path / "landing")
    import os

    os.makedirs(stage)
    for i, part_df in enumerate((bulk, sentinel, late)):
        tmp = f"{stage}/_chunk-{i}"
        part_df.coalesce(1).write.parquet(tmp)
        (part,) = globmod.glob(f"{tmp}/part-*.parquet")
        path = f"{stage}/chunk-{i:03d}.parquet"
        shutil.move(part, path)
        shutil.rmtree(tmp)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    schema = spark.read.parquet(f"{stage}/chunk-000.parquet").schema
    stream = ev.open_events_stream(spark, stage, schema)
    agg = ev.tumbling_counts(stream, window="1 hour", watermark="2 hours")
    got = ev.run_stream_to_memory(
        agg, f"late_{uuid.uuid4().hex[:8]}", output_mode="append"
    )

    finalized = (
        ev.tumbling_counts(on_time)
        .filter(
            F.to_timestamp("win_start") + F.expr("INTERVAL 1 HOUR")
            <= F.lit(wm)
        )
    )
    cols = ["win_start", "event_type", "n", "sum_value"]
    assert _rows(got, cols) == _rows(finalized, cols)
    # and the late rows would have changed the result had they counted
    with_late = ev.tumbling_counts(raw).filter(
        F.to_timestamp("win_start") + F.expr("INTERVAL 1 HOUR")
        <= F.lit(wm)
    )
    assert _rows(with_late, cols) != _rows(finalized, cols)


def test_kafka_writer_wiring(spark, sf_dir, tmp_path):
    """Mirror of the reader test: without the Kafka package the sink
    must fail at source resolution (proving the wiring is real);
    with it, the query starts."""
    stream = ev.read_events_stream(spark, sf_dir)
    ckpt = str(tmp_path / "ckpt")
    if ev.kafka_available(spark):
        q = ev.write_events_kafka(stream, "broker:9092", "events", ckpt)
        q.stop()
    else:
        with pytest.raises(Exception) as ei:
            ev.write_events_kafka(stream, "broker:9092", "events", ckpt)
        msg = str(ei.value)
        assert (
            "DATA_SOURCE_NOT_FOUND" in msg
            or "Failed to find data source" in msg
        )


def test_trigger_available_now_drains_and_terminates(spark, sf_dir):
    """trigger(availableNow=True): the modern batch-drain trigger —
    processes everything currently in the source (respecting
    maxFilesPerTrigger rate limits across multiple batches) and then
    STOPS on its own, which is what scheduled catch-up jobs use
    instead of a forever-running query. Result equals batch."""
    batch = ev.tumbling_counts(read_table(spark, sf_dir, "events"))
    stream = ev.tumbling_counts(
        ev.read_events_stream(spark, sf_dir, n_chunks=3)
    )
    name = f"an_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "availableNow query did not stop"
    got = spark.table(name)
    cols = ["win_start", "event_type", "n", "sum_value"]
    assert _rows(got, cols) == _rows(batch, cols)


def test_docs_stream_curate_matches_batch(spark, sf_dir):
    """The streaming curation aggregate equals the same pipeline run
    as a plain batch plan (finite input, drained to completion)."""
    from pyspark.sql import functions as F

    from bigdata_elephant_spark.operators.curation import (
        quality_logit_scores,
    )
    from bigdata_elephant_spark.plans.stream_queries import (
        q_stream_curate_docs,
    )
    from bigdata_elephant_spark.sources.corpus import read_table

    got = {
        (r.source, r.keep): r.n
        for r in q_stream_curate_docs(spark, sf_dir).collect()
    }
    docs = read_table(spark, sf_dir, "documents")
    batch = (
        quality_logit_scores(
            docs.withColumn("_md5", F.md5("text")).dropDuplicates(
                ["source", "_md5"]
            ),
            extra_cols=("source",),
        )
        .groupBy("source", "keep")
        .agg(F.count("*").alias("n"))
    )
    want = {(r.source, r.keep): r.n for r in batch.collect()}
    assert got == want


def test_stream_dsir_equals_batch_incremental(spark, sf_dir):
    """The stream/batch unification claim, pinned directly: scoring
    micro-batches against the frozen λ yields row-for-row the batch
    dsir_incremental result (per-doc scores are independent of
    micro-batch boundaries)."""
    from bigdata_elephant_spark.plans.curation_queries import (
        q_dsir_incremental,
    )
    from bigdata_elephant_spark.plans.stream_queries import (
        q_stream_dsir_admission,
    )

    streamed = q_stream_dsir_admission(spark, sf_dir).collect()
    batch = q_dsir_incremental(spark, sf_dir).collect()
    assert streamed == batch and len(batch) > 0


def test_stream_novelty_equals_batch(spark, sf_dir):
    """Streaming ingest-novelty admission == the batch query
    row-for-row (a vector's admission depends only on itself and the
    frozen base, so micro-batch boundaries cannot change it), and
    both admit branches are exercised."""
    from bigdata_elephant_spark.plans.stream_queries import (
        q_embedding_novelty,
        q_stream_embedding_novelty,
    )

    streamed = q_stream_embedding_novelty(spark, sf_dir).collect()
    batch = q_embedding_novelty(spark, sf_dir).collect()
    assert streamed == batch and len(batch) > 0
    admits = {r["admit"] for r in batch}
    assert admits == {True, False}


def test_docs_stream_empty_table_chunked(spark, tmp_path):
    """An EMPTY documents table through the n_chunks>1 staging path
    (r10 ADVICE: min/max doc_id are None on an empty table and the
    chunk arithmetic would TypeError) — falls back to the single-file
    copy and yields an empty stream instead of crashing."""
    import uuid as _uuid

    src = read_table(spark, "/root/testdata/sf0.001", "documents")
    empty_dir = str(tmp_path / "empty_sf")
    src.limit(0).coalesce(1).write.parquet(
        f"{empty_dir}/_stage"
    )
    import glob as _glob
    import shutil as _shutil

    (part,) = _glob.glob(f"{empty_dir}/_stage/part-*.parquet")
    _shutil.move(part, f"{empty_dir}/documents.parquet")
    _shutil.rmtree(f"{empty_dir}/_stage")

    stream = ev.read_documents_stream(spark, empty_dir, n_chunks=3)
    got = ev.run_stream_to_memory(
        stream.select("doc_id"), f"empty_{_uuid.uuid4().hex[:8]}",
        output_mode="append",
    )
    assert got.count() == 0


def test_dedup_stream_replay_exactly_once(spark, sf_dir, tmp_path):
    """docs_stream_dedup_admit's exactly-once claim, exercised as an
    actual REPLAY of the admission transform (the r10 treatment the
    novelty twin got, applied to the text twin — r10 verdict item 5):
    re-derive one committed micro-batch's edges FROM ITS INPUT (the
    chunk boundaries are deterministic doc_id ranges, so the true
    batch input is reconstructible) and dynamic-overwrite its
    batch_id partition; the edge table must come back identical —
    no duplicated edges, no flipped est_sims."""
    import pyspark.sql.functions as F

    from bigdata_elephant_spark.operators import dedup
    from bigdata_elephant_spark.plans.llm_queries import (
        INCR_NEW_SOURCES,
        LSH_EST_SIM_MIN,
    )

    docs = read_table(spark, sf_dir, "documents")
    is_new = F.col("source").isin(*INCR_NEW_SOURCES)
    corpus_reps = dedup.signature_reps(
        dedup.minhash_signatures(docs.filter(~is_new))
    ).localCheckpoint()

    def admit(batch):
        return dedup.incremental_dedup_edges(
            dedup.minhash_signatures(batch),
            corpus_reps,
            corpus_is_reps=True,
            materialize=False,
        ).filter(F.col("est_sim") >= LSH_EST_SIM_MIN)

    out = str(tmp_path / "dedup_out")
    ckpt = str(tmp_path / "dedup_ckpt")
    n_chunks = 3
    stream = ev.read_documents_stream(
        spark, sf_dir, n_chunks=n_chunks
    ).filter(is_new)
    ev.run_stream_to_parquet(stream, out, ckpt, transform=admit)

    schema = (
        "new_id long, corpus_rep_id long, n_members long, "
        "est_sim double, batch_id int"
    )

    def edges():
        return sorted(
            (r["new_id"], r["corpus_rep_id"], r["n_members"],
             r["est_sim"], r["batch_id"])
            for r in spark.read.schema(schema).parquet(out).collect()
        )

    before = edges()
    assert len(before) > 0  # the fixture plants real collisions
    # replay the batch with the most edges; its TRUE input is the
    # doc_id-range chunk read_documents_stream staged (files fire
    # one per trigger in mtime = chunk order)
    bid = max(
        set(e[4] for e in before),
        key=lambda b: sum(1 for e in before if e[4] == b),
    )
    lo, hi = docs.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    ).first()
    step = max((hi - lo) // n_chunks, 1)
    b_input = docs.filter(is_new).where(
        F.col("doc_id") >= F.lit(lo + step * bid)
    )
    if bid < n_chunks - 1:
        b_input = b_input.where(
            F.col("doc_id") < F.lit(lo + step * (bid + 1))
        )
    (
        admit(b_input)
        .withColumn("batch_id", F.lit(bid))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(out)
    )
    assert edges() == before
