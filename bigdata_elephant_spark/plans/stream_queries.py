"""Registry entries that exercise Structured Streaming end-to-end.

Each query drives a real streaming job (file micro-batch source ->
watermark -> stateful windowed aggregation -> memory sink) to
completion and returns the materialized result. Because the input is
finite, the streaming result equals the batch aggregation — so these
streaming queries still get full DuckDB oracles.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_elephant_spark.registry import QuerySpec
from bigdata_elephant_spark.streaming import events as ev


def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = ev.read_events_stream(spark, sf_dir)
    agg = ev.tumbling_counts(stream, window="1 hour")
    return ev.run_stream_to_memory(
        agg, f"stream_tumbling_{uuid.uuid4().hex[:8]}"
    )


# 1-hour tumbling windows are epoch-aligned == date_trunc('hour').
STREAM_TUMBLING_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
       event_type,
       count(*)             AS n,
       CAST(round(sum(CAST(value AS DECIMAL(12,2))), 4) AS DOUBLE)
           AS sum_value
FROM events
GROUP BY 1, 2
"""


def q_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = ev.read_events_stream(spark, sf_dir)
    sessions = ev.user_sessions(stream, gap="30 minutes")
    mat = ev.run_stream_to_memory(
        sessions, f"stream_sessions_{uuid.uuid4().hex[:8]}"
    )
    return ev.session_counts(mat)


# session_window semantics: a new session starts when the gap is
# >= 30 min (an event at exactly start+gap falls outside the window).
STREAM_SESSIONS_SQL = """
SELECT user_id,
       CAST(sum(ns) AS BIGINT) AS n_sessions,
       count(*)                AS n_events
FROM (
    SELECT user_id,
           CASE WHEN prev_us IS NULL
                  OR (us - prev_us) >= 30 * 60 * 1000000 THEN 1 ELSE 0
           END AS ns
    FROM (
        SELECT user_id, epoch_us(ts) AS us,
               lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        FROM events
    )
)
GROUP BY user_id
"""


def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = ev.read_events_stream(spark, sf_dir)
    agg = ev.sliding_value_avg(stream, window="2 hours", slide="1 hour")
    return ev.run_stream_to_memory(
        agg, f"stream_sliding_{uuid.uuid4().hex[:8]}"
    )


# every event lands in two 2h-wide hourly-sliding windows:
# [trunc(ts)-1h, +2h) and [trunc(ts), +2h)
STREAM_SLIDING_SQL = """
WITH assigned AS (
    SELECT strftime(date_trunc('hour', ts) - INTERVAL 1 HOUR,
                    '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type, value
    FROM events
    UNION ALL
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type, value
    FROM events
)
SELECT win_start, event_type,
       round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
             / count(value), 6) AS avg_value
FROM assigned
GROUP BY 1, 2
"""


def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_elephant_spark.sources.corpus import read_table

    stream = ev.read_events_stream(spark, sf_dir)
    joined = ev.enrich_with_users(
        stream, read_table(spark, sf_dir, "customer")
    )
    return ev.run_stream_to_memory(
        joined, f"stream_enrich_{uuid.uuid4().hex[:8]}",
        output_mode="append",
    )


STREAM_ENRICH_SQL = """
SELECT e.event_id, e.user_id, e.event_type,
       c.c_mktsegment, c.c_nationkey
FROM events e LEFT JOIN customer c ON c.c_custkey = e.user_id
"""


def q_stream_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dropDuplicates: the state-store-backed dedup every
    ingest pipeline needs (exactly-once per key). Projected to the
    key columns so the result is order-independent — first-arrival
    wins on the dropped columns, which is nondeterministic."""
    stream = ev.read_events_stream(spark, sf_dir)
    dedup = stream.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    return ev.run_stream_to_memory(
        dedup, f"stream_distinct_{uuid.uuid4().hex[:8]}",
        output_mode="append",
    )


STREAM_DISTINCT_SQL = """
SELECT DISTINCT user_id, event_type FROM events
"""


def q_stream_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = ev.read_events_stream(spark, sf_dir)
    agg = ev.user_running_anomalies(stream)
    return ev.run_stream_to_memory(
        agg, f"stream_anomalies_{uuid.uuid4().hex[:8]}",
        output_mode="update",
    )


# The pandas state fold accumulates sum/count in (ts, event_id) order;
# DuckDB's cumulative-frame AVG maintains the same running sum, so the
# float comparisons agree.
STREAM_ANOMALIES_SQL = """
SELECT user_id,
       count(*) AS n_events,
       CAST(sum(CASE WHEN prior_avg IS NOT NULL AND value > prior_avg
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
FROM (
    SELECT user_id, value,
           avg(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS prior_avg
    FROM events
)
GROUP BY user_id
"""


def q_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (click → purchase attribution).
    Two independent streaming scans of the landing dir, inner-joined
    on user + a bounded time range; finite input ⇒ equals the batch
    self-join the oracle runs."""
    clicks = ev.read_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "click"
    )
    purchases = ev.read_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    joined = ev.click_purchase_attribution(clicks, purchases)
    return ev.run_stream_to_memory(
        joined, f"stream_interval_{uuid.uuid4().hex[:8]}",
        output_mode="append",
    )


STREAM_INTERVAL_JOIN_SQL = """
SELECT c.event_id AS click_id,
       p.event_id AS purchase_id,
       c.user_id,
       CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS gap_s
FROM events c
JOIN events p
  ON c.user_id = p.user_id
 AND c.ts <= p.ts
 AND c.ts >= p.ts - INTERVAL 30 MINUTE
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
"""


SPECS = [
    QuerySpec("events_stream_tumbling", q_stream_tumbling,
              STREAM_TUMBLING_SQL, ("streaming",), bench=True),
    QuerySpec("events_stream_sessions", q_stream_sessions,
              # session_window is a stateful aggregation (state-store
              # backed, data-driven window close) — tagged so the
              # family slot doesn't need a separate window entry
              STREAM_SESSIONS_SQL, ("streaming", "stateful")),
    QuerySpec("events_stream_sliding", q_stream_sliding,
              STREAM_SLIDING_SQL, ("streaming",)),
    QuerySpec("events_stream_anomalies", q_stream_anomalies,
              STREAM_ANOMALIES_SQL, ("streaming", "stateful")),
    QuerySpec("events_stream_enrich", q_stream_enrich,
              STREAM_ENRICH_SQL, ("streaming", "join")),
    QuerySpec("events_stream_distinct", q_stream_distinct,
              # streaming dropDuplicates keeps per-key state in the
              # state store — stateful by construction
              STREAM_DISTINCT_SQL, ("streaming", "dedup", "stateful")),
    QuerySpec("events_stream_interval_join", q_stream_interval_join,
              STREAM_INTERVAL_JOIN_SQL, ("streaming", "join")),
]


def q_stream_curate_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming corpus curation: documents arrive as a file
    micro-batch stream, get exact-deduplicated on (source, text-md5)
    with streaming dropDuplicates state, scored by the expression-
    only quality classifier (operators/curation.py — the same plan
    runs batch or streaming because it is pure projection), and
    aggregated into per-(source, keep) counts. Finite input drains
    to completion, so the result equals the batch oracle."""
    import uuid

    from bigdata_elephant_spark.operators.curation import (
        quality_logit_scores,
    )

    stream = ev.read_documents_stream(spark, sf_dir)
    deduped = stream.withColumn(
        "_md5", F.md5("text")
    ).dropDuplicates(["source", "_md5"])
    scored = quality_logit_scores(deduped, extra_cols=("source",))
    agg = scored.groupBy("source", "keep").agg(
        F.count("*").alias("n")
    )
    return ev.run_stream_to_memory(
        agg, f"stream_curate_{uuid.uuid4().hex[:8]}"
    ).orderBy("source", "keep")


def _stream_curate_sql() -> str:
    from bigdata_elephant_spark.plans.pipeline_queries import (
        _QUALITY_CTES,
    )
    from bigdata_elephant_spark.plans.llm_queries import DOC_TOKS_CTE

    return f"""
WITH {DOC_TOKS_CTE}, {_QUALITY_CTES},
rep AS (
    SELECT source, min(doc_id) AS doc_id
    FROM documents GROUP BY source, md5(text)
)
SELECT r.source, (s.quality >= 0.5) AS keep,
       CAST(count(*) AS BIGINT) AS n
FROM rep r JOIN scored s USING (doc_id)
GROUP BY 1, 2
ORDER BY source, keep
"""


SPECS.append(
    QuerySpec(
        "docs_stream_curate",
        q_stream_curate_docs,
        _stream_curate_sql(),
        ("streaming", "stateful", "curation", "text"),
    )
)


def q_stream_dsir_admission(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming DSIR admission: the importance model (full-domain λ,
    operators/curation.py) is fit ONCE, batch, on the indexed
    corpus; documents then land as a file micro-batch stream and
    each batch is scored by ``foreachBatch`` running the batch
    operator against the frozen broadcast table.

    ``foreachBatch`` is load-bearing, not a convenience: the score
    pipeline chains two aggregations (gram histogram, then per-doc
    weight sum), which Structured Streaming cannot plan inside one
    streaming query — per micro-batch, the full batch planner runs.
    Because a document's score depends only on its own grams and the
    frozen λ, the union of per-batch outputs is invariant to
    micro-batch boundaries: the result equals the batch
    ``dsir_incremental`` query row-for-row (the shared oracle), with
    the idempotent batch_id-partitioned sink making replays
    exactly-once."""
    import uuid

    from bigdata_elephant_spark.operators import curation
    from bigdata_elephant_spark.plans.curation_queries import (
        DSIR_M,
        DSIR_TARGET_LANG,
    )
    from bigdata_elephant_spark.plans.llm_queries import (
        INCR_NEW_SOURCES,
    )
    from bigdata_elephant_spark.sources.corpus import read_table

    docs = read_table(spark, sf_dir, "documents")
    is_new = F.col("source").isin(*INCR_NEW_SOURCES)
    base = docs.filter(~is_new)
    lam = curation.dsir_bucket_logratios(
        curation.dsir_doc_buckets(base, DSIR_M),
        base.filter(F.col("lang") == DSIR_TARGET_LANG).select(
            "doc_id"
        ),
        DSIR_M,
        full_domain=True,
    )

    run_id = uuid.uuid4().hex[:8]
    # atexit-cleaned stage dirs (the streaming module's registry) —
    # parquet results and checkpoints don't accumulate across runs
    out_dir = f"{ev._new_stage_dir()}/dsir_{run_id}"
    ckpt = f"{out_dir}_ckpt"
    stream = ev.read_documents_stream(spark, sf_dir).filter(is_new)
    ev.run_stream_to_parquet(
        stream,
        out_dir,
        ckpt,
        transform=lambda batch: curation.dsir_score_against(
            batch, lam, DSIR_M
        ),
    )
    return (
        spark.read.parquet(out_dir)
        .select("doc_id", "n_grams", "logw")
        .orderBy("doc_id")
    )


def _stream_dsir_sql() -> str:
    from bigdata_elephant_spark.plans.curation_queries import (
        _dsir_incremental_sql,
    )

    return _dsir_incremental_sql()


SPECS.append(
    QuerySpec(
        "docs_stream_dsir",
        q_stream_dsir_admission,
        _stream_dsir_sql,
        ("streaming", "curation", "llm"),
    )
)

NOVELTY_THR = 0.4
# Ingest is a FIXED-size batch against a corpus that grows with SF:
# the delta is the 100 highest vec_ids (one admission batch), the
# base is everything before them — 400/100 at sf0.01, 1900/100 at
# sf0.1. The old absolute split (base pinned at 400, delta = the
# rest) modeled the opposite — a delta that grew to 80% of the table
# at sf0.1 — and hid the r8 forced-broadcast defect.
NOVELTY_DELTA_ROWS = 100


def q_embedding_novelty(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Batch ingest-novelty admission (similarity.py
    embedding_novelty_admission): the incoming batch (the 100
    highest vec_ids) against the SF-growing indexed base — max exact
    cosine + admit-below-threshold, the semantic-dedup gate run
    before ingesting an embedding batch. The split point is a 1-row
    scalar aggregate broadcast-crossJoined onto the scan (no driver
    collect; the only hinted builds are 1-row)."""
    from bigdata_elephant_spark.operators.similarity import (
        embedding_novelty_admission,
    )
    from bigdata_elephant_spark.sources.corpus import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    cut = emb.agg(
        (F.max("vec_id") - F.lit(NOVELTY_DELTA_ROWS)).alias("_cut")
    )
    base = (
        emb.crossJoin(F.broadcast(cut))
        .filter(F.col("vec_id") <= F.col("_cut"))
        .drop("_cut")
    )
    delta = (
        emb.crossJoin(F.broadcast(cut))
        .filter(F.col("vec_id") > F.col("_cut"))
        .drop("_cut")
    )
    return embedding_novelty_admission(
        base, delta, threshold=NOVELTY_THR
    ).orderBy("vec_id")


def q_stream_embedding_novelty(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming twin of ``embedding_novelty``: embedding batches
    land as a file micro-batch stream; ``foreachBatch`` runs the
    batch admission operator against the FROZEN base per
    micro-batch (the same foreachBatch rationale as
    ``docs_stream_dsir`` — the scan+max pipeline re-plans per
    batch; a vector's admission depends only on itself and the
    frozen base, so the union of per-batch outputs is invariant to
    micro-batch boundaries and equals the batch query row-for-row —
    the shared oracle; the idempotent batch_id sink makes replays
    exactly-once)."""
    import uuid

    from bigdata_elephant_spark.operators.similarity import (
        embedding_novelty_admission,
    )
    from bigdata_elephant_spark.sources.corpus import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    # Stream filters need a literal predicate: resolve the split
    # point once at stream setup (a 1-row metadata-scale collect).
    cut = (
        emb.agg(F.max("vec_id").alias("_m")).first()["_m"]
        - NOVELTY_DELTA_ROWS
    )
    base = emb.filter(F.col("vec_id") <= F.lit(cut))

    run_id = uuid.uuid4().hex[:8]
    out_dir = f"{ev._new_stage_dir()}/novelty_{run_id}"
    ckpt = f"{out_dir}_ckpt"
    stream = ev.read_embeddings_stream(spark, sf_dir).filter(
        F.col("vec_id") > F.lit(cut)
    )
    ev.run_stream_to_parquet(
        stream,
        out_dir,
        ckpt,
        transform=lambda batch: embedding_novelty_admission(
            base, batch, threshold=NOVELTY_THR
        ),
    )
    return (
        spark.read.parquet(out_dir)
        .select("vec_id", "nn_sim", "admit")
        .orderBy("vec_id")
    )


def _novelty_sql() -> str:
    from bigdata_elephant_spark.plans.llm_queries import _dot_sql

    cos = (
        f"round({_dot_sql('d.embedding', 'b.embedding')}"
        f" / (sqrt({_dot_sql('d.embedding', 'd.embedding')})"
        f" * sqrt({_dot_sql('b.embedding', 'b.embedding')})), 6)"
    )
    return f"""
WITH cut AS (
    SELECT max(vec_id) - {NOVELTY_DELTA_ROWS} AS c FROM embeddings
),
base AS (
    SELECT vec_id, embedding FROM embeddings, cut
    WHERE vec_id <= c
      AND {_dot_sql('embeddings.embedding', 'embeddings.embedding')} > 0
),
delta AS (
    SELECT vec_id, embedding FROM embeddings, cut
    WHERE vec_id > c
      AND {_dot_sql('embeddings.embedding', 'embeddings.embedding')} > 0
),
sims AS (
    SELECT d.vec_id, max({cos}) AS nn_sim
    FROM delta d, base b
    GROUP BY 1
)
SELECT d.vec_id, s.nn_sim,
       coalesce(s.nn_sim < {NOVELTY_THR}, true) AS admit
FROM delta d LEFT JOIN sims s ON d.vec_id = s.vec_id
ORDER BY d.vec_id
"""


NOVELTY_SWEEP_MAX = 9


def q_novelty_threshold_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Admission-gate tuning frontier (similarity.py
    novelty_threshold_sweep): admit rate at every threshold
    0.1..0.9 in one pass over the same bounded-delta ingest fixture
    as ``embedding_novelty`` — the corpus-sized scan+max runs once,
    the sweep fans out only the (id, nn_sim) slice."""
    from bigdata_elephant_spark.operators.similarity import (
        novelty_threshold_sweep,
    )
    from bigdata_elephant_spark.sources.corpus import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    cut = emb.agg(
        (F.max("vec_id") - F.lit(NOVELTY_DELTA_ROWS)).alias("_cut")
    )
    base = (
        emb.crossJoin(F.broadcast(cut))
        .filter(F.col("vec_id") <= F.col("_cut"))
        .drop("_cut")
    )
    delta = (
        emb.crossJoin(F.broadcast(cut))
        .filter(F.col("vec_id") > F.col("_cut"))
        .drop("_cut")
    )
    return novelty_threshold_sweep(
        base, delta, max_thr_x10=NOVELTY_SWEEP_MAX
    )


def _novelty_sweep_sql() -> str:
    from bigdata_elephant_spark.plans.llm_queries import _dot_sql

    cos = (
        f"round({_dot_sql('d.embedding', 'b.embedding')}"
        f" / (sqrt({_dot_sql('d.embedding', 'd.embedding')})"
        f" * sqrt({_dot_sql('b.embedding', 'b.embedding')})), 6)"
    )
    return f"""
WITH cut AS (
    SELECT max(vec_id) - {NOVELTY_DELTA_ROWS} AS c FROM embeddings
),
base AS (
    SELECT vec_id, embedding FROM embeddings, cut
    WHERE vec_id <= c
      AND {_dot_sql('embeddings.embedding', 'embeddings.embedding')} > 0
),
delta AS (
    SELECT vec_id, embedding FROM embeddings, cut
    WHERE vec_id > c
      AND {_dot_sql('embeddings.embedding', 'embeddings.embedding')} > 0
),
sims AS (
    SELECT d.vec_id, max({cos}) AS nn_sim
    FROM delta d, base b
    GROUP BY 1
),
verd AS (
    SELECT d.vec_id, s.nn_sim
    FROM delta d LEFT JOIN sims s ON d.vec_id = s.vec_id
),
levels AS (
    SELECT unnest(range(1, {NOVELTY_SWEEP_MAX} + 1)) AS t
),
agg AS (
    SELECT t,
           CAST(sum(CASE WHEN nn_sim IS NULL OR nn_sim < t / 10.0
                         THEN 1 ELSE 0 END) AS BIGINT) AS a,
           count(*) AS n
    FROM verd, levels
    GROUP BY 1
)
SELECT CAST(t AS INT) AS thr_x10, a AS n_admit, n AS n_total,
       CASE WHEN n > 0 THEN round(a / n, 6) END AS admit_rate
FROM agg
ORDER BY thr_x10
"""


SPECS.append(
    QuerySpec(
        "embedding_novelty",
        q_embedding_novelty,
        _novelty_sql,
        ("llm", "similarity", "merge"),
    )
)
SPECS.append(
    QuerySpec(
        "novelty_threshold_sweep",
        q_novelty_threshold_sweep,
        _novelty_sweep_sql,
        ("llm", "similarity", "report"),
    )
)


_NOVELTY_IVF_CACHE: dict[tuple, str] = {}


def _novelty_index_path(spark: SparkSession, sf_dir: str) -> str:
    """Per-process IVF index over the novelty fixture's BASE slice
    (vec_id <= max - NOVELTY_DELTA_ROWS), built once per corpus
    stamp — the maintained artifact an ingest gate admits against
    (the base is indexed ahead of time; only the delta arrives)."""
    import atexit
    import shutil
    import tempfile

    from bigdata_elephant_spark.operators import similarity
    from bigdata_elephant_spark.plans.llm_queries import (
        IVF_CELLS,
        _ann_cache_key,
    )
    from bigdata_elephant_spark.sources.corpus import read_table

    key = _ann_cache_key(sf_dir)
    path = _NOVELTY_IVF_CACHE.get(key)
    if path is None:
        emb = read_table(spark, sf_dir, "embeddings")
        cut = (
            emb.agg(F.max("vec_id").alias("_m")).first()["_m"]
            - NOVELTY_DELTA_ROWS
        )
        base = emb.filter(F.col("vec_id") <= F.lit(cut))
        path = tempfile.mkdtemp(prefix="elephant_novelty_ivf_")
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        similarity.build_ivf_index(base, path, n_cells=IVF_CELLS)
        _NOVELTY_IVF_CACHE[key] = path
    return path


def q_embedding_novelty_indexed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The novelty gate at production scale (similarity.py
    embedding_novelty_indexed): the same bounded 100-vector ingest
    batch as ``embedding_novelty``, admitted against the MAINTAINED
    cell-partitioned IVF index of the base instead of an exact base
    scan — the batch probes its n_probe nearest cells per vector and
    the candidate read is static partition pruning, so admission
    cost is delta-sized + pruned-cells-sized at any corpus scale.
    The ``dsir_select``/``dsir_select_indexed`` pairing for the
    novelty family; the oracle replays the probe exactly (the index
    family's shared contract)."""
    from bigdata_elephant_spark.operators.similarity import (
        embedding_novelty_indexed,
    )
    from bigdata_elephant_spark.plans.llm_queries import IVF_PROBE
    from bigdata_elephant_spark.sources.corpus import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    path = _novelty_index_path(spark, sf_dir)
    cut = emb.agg(
        (F.max("vec_id") - F.lit(NOVELTY_DELTA_ROWS)).alias("_cut")
    )
    delta = (
        emb.crossJoin(F.broadcast(cut))
        .filter(F.col("vec_id") > F.col("_cut"))
        .drop("_cut")
    )
    return embedding_novelty_indexed(
        spark, path, delta, threshold=NOVELTY_THR, n_probe=IVF_PROBE
    ).orderBy("vec_id")


def _novelty_indexed_sql() -> str:
    from bigdata_elephant_spark.plans.llm_queries import (
        IVF_CELLS,
        IVF_PROBE,
        _dot_sql,
        _l2_sql,
    )

    cos = (
        f"round({_dot_sql('b.embedding', 'd.embedding')}"
        f" / (sqrt({_dot_sql('b.embedding', 'b.embedding')})"
        f" * sqrt({_dot_sql('d.embedding', 'd.embedding')})), 6)"
    )
    return f"""
WITH cut AS (
    SELECT max(vec_id) - {NOVELTY_DELTA_ROWS} AS c FROM embeddings
),
base AS (
    SELECT vec_id, embedding FROM embeddings, cut WHERE vec_id <= c
),
delta AS (
    SELECT vec_id, embedding FROM embeddings, cut
    WHERE vec_id > c
      AND {_dot_sql('embeddings.embedding', 'embeddings.embedding')} > 0
),
cents AS (
    SELECT vec_id AS cell_id, embedding AS cvec FROM base
    ORDER BY vec_id LIMIT {IVF_CELLS}
),
probe AS (
    SELECT q_id, cell_id FROM (
        SELECT d.vec_id AS q_id, c.cell_id,
               row_number() OVER (
                   PARTITION BY d.vec_id
                   ORDER BY round({_l2_sql('c.cvec', 'd.embedding')}, 6),
                            c.cell_id) AS rn
        FROM delta d, cents c
    ) WHERE rn <= {IVF_PROBE}
),
assigned AS (
    SELECT vec_id, cell_id FROM (
        SELECT b.vec_id, c.cell_id,
               row_number() OVER (
                   PARTITION BY b.vec_id
                   ORDER BY round({_l2_sql('b.embedding', 'c.cvec')}, 6),
                            c.cell_id) AS rn
        FROM base b, cents c
    ) WHERE rn = 1
),
sims AS (
    SELECT p.q_id AS vec_id, max({cos}) AS nn_sim
    FROM probe p
    JOIN assigned a USING (cell_id)
    JOIN base b ON b.vec_id = a.vec_id
    JOIN delta d ON d.vec_id = p.q_id
    WHERE {_dot_sql('b.embedding', 'b.embedding')} > 0
    GROUP BY 1
)
SELECT d.vec_id, s.nn_sim,
       coalesce(s.nn_sim < {NOVELTY_THR}, true) AS admit
FROM delta d LEFT JOIN sims s ON d.vec_id = s.vec_id
ORDER BY d.vec_id
"""


SPECS.append(
    QuerySpec(
        "embedding_novelty_indexed",
        q_embedding_novelty_indexed,
        _novelty_indexed_sql,
        ("llm", "similarity", "index", "merge"),
        # bench-tagged r11 with the reingest-semantics fix so the
        # round that changed the query also pins its timing
        bench=True,
    )
)


def q_stream_dedup_admission(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming text-dedup admission — the ingest twin of
    ``incremental_dedup_edges`` (completing the streaming-admission
    set: DSIR has ``docs_stream_dsir``, embeddings have
    ``emb_stream_novelty``, this is the text near-dup gate): the
    corpus signature table is computed ONCE, batch, and frozen
    (localCheckpoint — a maintained signature artifact at
    production, appended per batch, old text never re-read);
    documents then land as a file micro-batch stream and
    ``foreachBatch`` mines each batch's star-collapsed edges against
    the frozen reps. A document's edges depend only on itself and
    the frozen corpus, so the union of per-batch outputs is
    invariant to micro-batch boundaries and equals the batch query
    row-for-row — the SHARED ``incremental_dedup_edges`` oracle; the
    batch_id-partitioned idempotent sink makes replays exactly-once
    (same mechanics the replay test pins for the novelty twin)."""
    import uuid

    from bigdata_elephant_spark.operators import dedup
    from bigdata_elephant_spark.plans.llm_queries import (
        INCR_NEW_SOURCES,
        LSH_EST_SIM_MIN,
    )
    from bigdata_elephant_spark.sources.corpus import read_table

    docs = read_table(spark, sf_dir, "documents")
    is_new = F.col("source").isin(*INCR_NEW_SOURCES)
    # collapse the frozen corpus to signature representatives ONCE
    # at stream setup (the maintained-artifact shape);
    # localCheckpoint materializes it so no micro-batch re-pays the
    # corpus-signature window shuffle or stacks a new cache entry
    # (r10 review finding)
    corpus_reps = dedup.signature_reps(
        dedup.minhash_signatures(docs.filter(~is_new))
    ).localCheckpoint()

    run_id = uuid.uuid4().hex[:8]
    out_dir = f"{ev._new_stage_dir()}/dedup_admit_{run_id}"
    ckpt = f"{out_dir}_ckpt"
    # 3 chunked micro-batches: with a single staged file the stream
    # fires once and "invariant to batch boundaries" would never
    # actually be exercised
    stream = ev.read_documents_stream(
        spark, sf_dir, n_chunks=3
    ).filter(is_new)
    ev.run_stream_to_parquet(
        stream,
        out_dir,
        ckpt,
        transform=lambda batch: dedup.incremental_dedup_edges(
            dedup.minhash_signatures(batch),
            corpus_reps,
            corpus_is_reps=True,
            materialize=False,
        ).filter(F.col("est_sim") >= LSH_EST_SIM_MIN),
    )
    # Explicit schema on the read-back: a run whose every micro-batch
    # emits zero edges (legitimately possible — no new doc collides
    # past the threshold) leaves no schema-bearing parquet file, and
    # a schemaless read would die with UNABLE_TO_INFER_SCHEMA instead
    # of returning the correct empty result (the _index_rows rule).
    out_schema = (
        "new_id long, corpus_rep_id long, n_members long, "
        "est_sim double"
    )
    return (
        spark.read.schema(out_schema).parquet(out_dir)
        .select("new_id", "corpus_rep_id", "n_members", "est_sim")
        .orderBy("new_id", "corpus_rep_id")
    )


def _stream_dedup_admit_sql() -> str:
    from bigdata_elephant_spark.plans.llm_queries import (
        INCREMENTAL_DEDUP_EDGES_SQL,
    )

    return (
        INCREMENTAL_DEDUP_EDGES_SQL.rstrip()
        + "\nORDER BY new_id, corpus_rep_id\n"
    )


SPECS.append(
    QuerySpec(
        "docs_stream_dedup_admit",
        q_stream_dedup_admission,
        _stream_dedup_admit_sql,
        ("streaming", "dedup", "incremental", "llm"),
    )
)


def q_stream_gram_update(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming twin of ``gram_incremental``: embedding batches
    land as a file micro-batch stream; each batch's EXACT decimal
    Gram partials append to a batch_id-partitioned artifact
    (idempotent partition overwrite => exactly-once on replay), and
    the artifact merges to the full-table Gram bit-for-bit — the
    shared full-table oracle IS the associativity claim. This is
    continuous maintenance of the PCA family's input: old vectors
    are never re-scanned, and the dim²-row merge + power iteration
    re-run downstream at any time."""
    import uuid

    from bigdata_elephant_spark.plans.curation_queries import (
        _gram_merge,
        _gram_partials,
    )

    run_id = uuid.uuid4().hex[:8]
    out_dir = f"{ev._new_stage_dir()}/gram_{run_id}"
    ckpt = f"{out_dir}_ckpt"
    stream = ev.read_embeddings_stream(spark, sf_dir).select(
        "embedding"
    )
    ev.run_stream_to_parquet(
        stream, out_dir, ckpt, transform=_gram_partials
    )
    return _gram_merge(
        spark.read.parquet(out_dir).select("i", "j", "pd")
    )


def _gram_sql() -> str:
    from bigdata_elephant_spark.plans.curation_queries import (
        EMBEDDING_GRAM_SQL,
    )

    return EMBEDDING_GRAM_SQL


SPECS.append(
    QuerySpec(
        "emb_stream_gram",
        q_stream_gram_update,
        _gram_sql,
        ("streaming", "similarity", "agg", "incremental"),
    )
)
SPECS.append(
    QuerySpec(
        "emb_stream_novelty",
        q_stream_embedding_novelty,
        _novelty_sql,
        ("streaming", "llm", "similarity", "merge"),
    )
)
