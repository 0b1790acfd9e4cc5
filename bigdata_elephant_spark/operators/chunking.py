"""Training-data assembly operators: chunking, sequence packing,
deterministic corpus shuffling, PII redaction.

These are the steps between "curated corpus" and "tensors": split
long documents into model-window-sized pieces, pack short pieces into
dense training sequences, shuffle reproducibly, and scrub obvious
PII. All are expression-only (whole-stage codegen, no Python) and
keyed so every stage parallelizes per shard — no global ordering
anywhere:

- Chunking is a per-row explode: output rows = ceil(len/stride) per
  doc, no shuffle at all.
- Packing and shuffling operate *within hash shards* (window
  partitioned by shard): the 100 TB corpus packs as N independent
  shards, which is exactly how training shards are laid out on disk.
  A global row_number would be an Exchange SinglePartition — the
  anti-pattern this module exists to avoid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 500,
    overlap: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed-width character chunks with overlap (stride =
    chunk_size - overlap), 1-based substring semantics so the DuckDB
    oracle is the same arithmetic. Output: (doc_id, chunk_id, chunk,
    chunk_len)."""
    stride = chunk_size - overlap
    assert stride > 0, "overlap must be smaller than chunk_size"
    n = F.length(F.col(text_col))
    starts = F.sequence(
        F.lit(1),
        F.greatest(n - overlap, F.lit(1)),
        F.lit(stride),
    )
    return (
        docs.select(
            id_col,
            text_col,
            F.posexplode(starts).alias("chunk_id", "_start"),
        )
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.substring(F.col(text_col), F.col("_start"), chunk_size)
            .alias("chunk"),
        )
        .withColumn("chunk_len", F.length("chunk").cast("long"))
    )


def whitespace_token_count(text: Column) -> Column:
    """Cheap token proxy: whitespace-separated word count."""
    trimmed = F.trim(text)
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    ).cast("long")


def pack_sequences(
    docs: DataFrame,
    capacity: int = 2048,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Contiguous sequence packing: documents are dealt to
    ``n_shards`` hash shards, ordered within the shard, and cut into
    bins of ~``capacity`` tokens by the running token count (bin =
    floor(exclusive-cumsum / capacity) — the concat-then-split layout
    training loaders use). Each shard packs independently: one
    shuffle on the shard key, a partition-local sort, bounded window
    state. Output: (doc_id, shard, bin_in_shard, n_tok)."""
    toks = whitespace_token_count(F.col(text_col))
    sharded = docs.select(
        id_col,
        (F.col(id_col) % n_shards).cast("long").alias("shard"),
        toks.alias("n_tok"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_incl = F.sum("n_tok").over(w)
    return (
        sharded.select(
            id_col,
            "shard",
            "n_tok",
            (cum_incl - F.col("n_tok")).alias("_cum_before"),
        )
        # integer div (not float floor): exact for any capacity
        .select(
            id_col,
            "shard",
            F.expr(f"_cum_before div {capacity}").alias("bin_in_shard"),
            "n_tok",
        )
    )


def shuffle_assignments(
    docs: DataFrame,
    n_shards: int = 64,
    seed: str = "epoch0",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic corpus shuffle: every doc gets a pseudo-random
    but reproducible (shard, position) from md5(seed || doc_id) —
    same layout on any engine, any partitioning, any rerun; a new
    ``seed`` reshuffles for the next epoch. Positions are assigned
    within shards (partitioned window), so shards write in parallel.
    Output: (doc_id, shard, pos_in_shard)."""
    key = F.md5(F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string")))
    shard = (
        F.conv(F.substring(key, 1, 4), 16, 10).cast("long") % n_shards
    ).alias("shard")
    w = Window.partitionBy("shard").orderBy(key, id_col)
    return (
        docs.select(id_col, shard, key.alias("_key"))
        .select(
            id_col,
            "shard",
            F.row_number().over(w).cast("long").alias("pos_in_shard"),
        )
    )


EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
LONG_NUMBER_RE = r"[0-9]{6,}"


def redact_pii(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Scrub obvious PII lexemes (emails, long digit runs) and report
    what was removed — the audit columns are how a curation run
    proves the scrub happened. Pure regexp expressions; at 100 TB
    this is a map-only stage fused into whatever scan precedes it.
    Output: (doc_id, n_emails, n_long_numbers, clean_hash)."""
    t = F.col(text_col)
    cleaned = F.regexp_replace(
        F.regexp_replace(t, EMAIL_RE, "<EMAIL>"),
        LONG_NUMBER_RE,
        "<NUM>",
    )
    return docs.select(
        id_col,
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(LONG_NUMBER_RE))
        .cast("long")
        .alias("n_long_numbers"),
        F.md5(cleaned).alias("clean_hash"),
    )
