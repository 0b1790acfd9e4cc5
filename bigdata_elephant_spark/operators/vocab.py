"""Vocabulary builder — reference Job 1 (``Vocabulary.java``).

scan -> filterText -> tokenize -> per-word distinct-doc count -> dense
word ids. One lazy DataFrame chain replaces the whole MapReduce job:

- The reference's Combiner (map-side partial distinct,
  ``Vocabulary.java:58-79``) is Catalyst's built-in two-phase
  ``count_distinct`` — partial aggregation happens before the shuffle
  automatically.
- The reference's ``static int wordId++`` (``Vocabulary.java:90,103``)
  is only correct with exactly one reducer (SURVEY §4 flaw F1). Here
  word ids are ``row_number() over (order by word) - 1`` —
  deterministic, dense, parallel-safe.

Scale note: the global ``row_number`` window funnels the *vocabulary*
(not the corpus) through one partition. Natural-language vocabularies
are <= tens of millions of rows — a few hundred MB — so this is fine
even at 100 TB corpus scale; the corpus-sized work (tokenize +
aggregate) is fully parallel. For id spaces where it isn't,
:func:`assign_dense_ids_distributed` computes identical ids with
parallel per-partition windows + global offsets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bigdata_elephant_spark.functions.text import tokenize


def assign_dense_ids(
    df: DataFrame, order_col: str, id_col: str = "word_id"
) -> DataFrame:
    """Dense 0-based ids, deterministic by ``order by order_col``."""
    w = Window.orderBy(order_col)
    return df.withColumn(id_col, (F.row_number().over(w) - 1).cast("long"))


def assign_dense_ids_distributed(
    df: DataFrame,
    order_col: str,
    id_col: str = "word_id",
    n_parts: int = 32,
) -> DataFrame:
    """Scale-safe dense ids: the two-phase partition-offset scheme.

    The plain window funnels every row through one partition — fine
    for natural-language vocabularies, a wall for billion-row id
    spaces. Here: range-partition by ``order_col``, rank *within*
    each partition (independent windows, fully parallel), then add
    the partition's global offset (a tiny driver-side cumulative sum
    broadcast back). Output ids equal the global dense rank exactly,
    regardless of where the sampled range boundaries fall, because
    range partitions are themselves ordered.
    """
    parted = df.repartitionByRange(n_parts, F.col(order_col))
    # Materialize BEFORE reading partition ids: the offsets collected
    # below and the final ranking must see the SAME boundaries, and
    # range partitioning samples — recomputation could re-draw them.
    with_pid = parted.withColumn(
        "__pid", F.spark_partition_id()
    ).localCheckpoint()
    counts = {
        r["__pid"]: r["cnt"]
        for r in with_pid.groupBy("__pid").agg(
            F.count("*").alias("cnt")
        ).collect()
    }
    if not counts:
        # empty input: create_map() with zero entries has no valid
        # key type to index by — the plain window on an empty frame
        # yields the same (empty) result with the right schema
        return assign_dense_ids(df, order_col, id_col)
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_col = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    w = Window.partitionBy("__pid").orderBy(order_col)
    return (
        with_pid.withColumn(
            id_col,
            (
                offset_col[F.col("__pid")]
                + F.row_number().over(w)
                - 1
            ).cast("long"),
        )
        .drop("__pid")
    )


# Corpus size above which the single-partition id window is replaced
# by the two-phase partition-offset assigner. A byte threshold on the
# *input* is the proxy (readable from plan statistics at zero cost —
# an exact vocabulary row count would need a second corpus-sized
# aggregation pass before the real one, doubling the dominant scan):
# by Heaps' law a cleaned natural-language corpus crosses ~10 M
# distinct tokens in the tens-of-GB range, so 64 GiB is conservative
# in the direction that matters (switching early costs a few extra
# vocab-sized jobs; switching late funnels a giant window).
VOCAB_DISTRIBUTED_IDS_BYTES = 64 << 30


def _plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's sizeInBytes estimate for ``df`` (see
    :func:`bigdata_elephant_spark.session.plan_size_bytes` — shared
    with the broadcast-hint gate). 0 when unavailable — THIS caller
    treats unknown as small and keeps the always-correct window
    path; scale deployments force ``id_mode``."""
    from bigdata_elephant_spark.session import plan_size_bytes

    return plan_size_bytes(df)


def build_vocabulary(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    id_mode: str = "auto",
) -> DataFrame:
    """corpus -> ``(word, word_id, df)``.

    ``df`` = number of distinct documents containing the word
    (``Vocabulary.java:103`` — the column the reference's Query later
    misreads as "idf"; see search.py).

    COVERING-VOCABULARY INVARIANT (load-bearing, r14 ADVICE): this
    function applies NO min_df / stopword / frequency filtering —
    every token the tokenizer emits gets a vocab row. Fast paths in
    search.py (``doc_lengths_from_corpus``, ``more_like_this``'s
    corpus-side ``n_docs``) are correct ONLY under this invariant
    (every token survives the vocab inner-join, so Σtf per doc ≡
    token count and "docs with postings" ≡ "docs with tokens"). If a
    vocab filter is ever added here, those callers must go back to
    the postings-lineage aggregates or BM25 dl/n_docs/avgdl silently
    diverge from the postings truth.

    ``id_mode``: ``"window"`` = global ``row_number`` (one-partition
    funnel, vocabulary-sized — right up to tens of millions of
    words); ``"distributed"`` = :func:`assign_dense_ids_distributed`
    (identical ids, parallel windows + offsets);  ``"auto"`` picks
    ``distributed`` when the corpus plan-statistics size exceeds
    :data:`VOCAB_DISTRIBUTED_IDS_BYTES` — a driver-side metadata
    read, so the small-corpus plan is byte-identical to ``"window"``
    (asserted in tests/test_plans.py).
    """
    tokens = tokenize(corpus, text_col=text_col, id_col=id_col)
    counts = tokens.groupBy("word").agg(
        F.countDistinct(id_col).cast("long").alias("df")
    )
    if id_mode == "auto":
        big = _plan_size_bytes(corpus) > VOCAB_DISTRIBUTED_IDS_BYTES
        id_mode = "distributed" if big else "window"
    if id_mode == "distributed":
        ids = assign_dense_ids_distributed(counts, "word")
    elif id_mode == "window":
        ids = assign_dense_ids(counts, "word")
    else:
        raise ValueError(f"unknown id_mode: {id_mode!r}")
    return ids.select("word", "word_id", "df")


def update_vocabulary(
    old_vocab: DataFrame,
    corpus_delta: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incrementally absorb a NEW batch of documents into an existing
    vocabulary — the build-once engine's missing day-2 operation.

    Existing words KEEP THEIR ids (the property every persisted
    postings/index artifact depends on — a full rebuild would
    re-rank alphabetically and silently remap every id); their df
    grows by the delta's distinct-doc counts. Unseen words append
    with ids after the current max, alphabetically dense within the
    batch — the same segment-append discipline Lucene uses. Requires
    append-only deltas (documents not previously ingested); updating
    an existing doc needs delete-tombstones first, exactly like the
    CDC operators.

    Cost is delta-sized, not corpus-sized: one tokenize+agg over the
    delta, one broadcast-shaped join against the vocabulary, and the
    max-id lookup is a metadata aggregate of the (small) vocabulary.
    """
    tokens = tokenize(corpus_delta, text_col=text_col, id_col=id_col)
    delta_df = tokens.groupBy("word").agg(
        F.countDistinct(id_col).cast("long").alias("_ddf")
    )
    updated = (
        old_vocab.join(delta_df, "word", "left")
        .select(
            "word",
            "word_id",
            (F.col("df") + F.coalesce(F.col("_ddf"), F.lit(0)))
            .cast("long")
            .alias("df"),
        )
    )
    max_id = old_vocab.agg(F.max("word_id")).first()[0]
    base = -1 if max_id is None else max_id
    new_words = delta_df.join(old_vocab.select("word"), "word", "left_anti")
    appended = assign_dense_ids(new_words, "word").select(
        "word",
        (F.col("word_id") + base + 1).cast("long").alias("word_id"),
        F.col("_ddf").alias("df"),
    )
    return updated.unionByName(appended)
