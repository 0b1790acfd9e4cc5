"""Registry entries for training-data assembly (operators/chunking.py):
document chunking, sequence packing, deterministic epoch shuffling,
PII redaction. Oracles recompute the identical arithmetic (same
1-based substring windows, same md5-derived shard/position keys, same
regexes), so every step of the corpus->tensors path is hash-verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_elephant_spark.operators import chunking
from bigdata_elephant_spark.registry import QuerySpec
from bigdata_elephant_spark.sources.corpus import read_table

CHUNK_SIZE = 500
OVERLAP = 100
STRIDE = CHUNK_SIZE - OVERLAP
PACK_CAPACITY = 2048
N_SHARDS = 64
SHUFFLE_SEED = "epoch0"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "documents")


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = chunking.chunk_documents(
        _docs(spark, sf_dir), chunk_size=CHUNK_SIZE, overlap=OVERLAP
    )
    return out.select(
        "doc_id",
        "chunk_id",
        F.md5("chunk").alias("chunk_hash"),
        "chunk_len",
    )


# chunk starts are 1, 1+stride, ... up to greatest(len-overlap, 1):
# k = (greatest(len-overlap,1) - 1) // stride + 1 chunks per doc.
DOC_CHUNKS_SQL = f"""
WITH base AS (
    SELECT doc_id, text,
           (greatest(length(text) - {OVERLAP}, 1) - 1) // {STRIDE} + 1 AS k
    FROM documents
)
SELECT doc_id,
       CAST(j AS BIGINT) AS chunk_id,
       md5(substring(text, 1 + j * {STRIDE}, {CHUNK_SIZE})) AS chunk_hash,
       CAST(length(substring(text, 1 + j * {STRIDE}, {CHUNK_SIZE}))
            AS BIGINT) AS chunk_len
FROM base, unnest(range(0, k)) AS t(j)
"""


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunking.pack_sequences(
        _docs(spark, sf_dir), capacity=PACK_CAPACITY, n_shards=N_SHARDS
    )


PACK_SEQUENCES_SQL = f"""
WITH toks AS (
    SELECT doc_id,
           doc_id % {N_SHARDS} AS shard,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(string_split_regex(trim(text), '\\s+'))
           END AS n_tok
    FROM documents
),
c AS (
    SELECT doc_id, shard, n_tok,
           sum(n_tok) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) - n_tok AS cum_before
    FROM toks
)
SELECT doc_id, shard,
       CAST(cum_before // {PACK_CAPACITY} AS BIGINT) AS bin_in_shard,
       CAST(n_tok AS BIGINT) AS n_tok
FROM c
"""


def q_shuffle_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunking.shuffle_assignments(
        _docs(spark, sf_dir), n_shards=N_SHARDS, seed=SHUFFLE_SEED
    )


# hex nibble -> int without engine-specific conv(): strpos over the
# hex alphabet, identical in both engines.
def _hex4_sql(key: str) -> str:
    nib = "strpos('0123456789abcdef', substring({k}, {i}, 1)) - 1"
    terms = [
        f"({nib.format(k=key, i=i)}) * {16 ** (4 - i)}"
        for i in range(1, 5)
    ]
    return "(" + " + ".join(terms) + ")"


SHUFFLE_ASSIGNMENTS_SQL = f"""
WITH keyed AS (
    SELECT doc_id,
           md5('{SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)) AS key
    FROM documents
)
SELECT doc_id,
       CAST({_hex4_sql('key')} % {N_SHARDS} AS BIGINT) AS shard,
       CAST(row_number() OVER (
           PARTITION BY {_hex4_sql('key')} % {N_SHARDS}
           ORDER BY key, doc_id
       ) AS BIGINT) AS pos_in_shard
FROM keyed
"""


def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunking.redact_pii(_docs(spark, sf_dir))


REDACT_PII_SQL = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{chunking.EMAIL_RE}'))
            AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{chunking.LONG_NUMBER_RE}'))
            AS BIGINT) AS n_long_numbers,
       md5(regexp_replace(
               regexp_replace(text, '{chunking.EMAIL_RE}', '<EMAIL>', 'g'),
               '{chunking.LONG_NUMBER_RE}', '<NUM>', 'g')) AS clean_hash
FROM documents
"""


SPECS = [
    QuerySpec("doc_chunks", q_doc_chunks, DOC_CHUNKS_SQL,
              ("llm", "chunking")),
    QuerySpec("pack_sequences", q_pack_sequences, PACK_SEQUENCES_SQL,
              ("llm", "chunking", "window")),
    QuerySpec("shuffle_assignments", q_shuffle_assignments,
              SHUFFLE_ASSIGNMENTS_SQL, ("llm", "sampling")),
    QuerySpec("redact_pii", q_redact_pii, REDACT_PII_SQL,
              ("llm", "text")),
]
