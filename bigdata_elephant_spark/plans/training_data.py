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


# --------------------------------------------- end-to-end assembly

ASSEMBLE_CAPACITY = 512
ASSEMBLE_SHARDS = 8
# chunk_id < 1000 for any doc here (k = (len-overlap-1)//stride + 1),
# so ckey = doc_id*1000 + chunk_id is collision-free and orderable.
CKEY_MULT = 1000


def q_assemble_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus→tensors path as ONE lazy plan: quality filter
    + exact-dedup survivorship + reproducible hash sample (curate),
    overlapping chunking of the survivors, then per-shard sequence
    packing of the chunks. Every stage is the same operator the
    standalone registry query runs — this entry proves they compose.

    Shuffles: one by text-hash (dedup window), one by doc_id (the
    survivor join), one by shard (packing window) — each keyed on a
    different column because each stage groups by a different thing;
    no stage adds a shuffle beyond its own key. At 100 TB the
    survivor join is the big one and it is an equi-join on the
    already-partitioned doc_id."""
    from bigdata_elephant_spark.operators import chunking
    from bigdata_elephant_spark.plans.llm_queries import (
        CURATE_MIN_TOKENS,
        CURATE_MAX_TOKENS,
        CURATE_SAMPLE,
    )
    from bigdata_elephant_spark.functions.text import tokens_array
    from bigdata_elephant_spark.operators.sampling import hash_sample
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    base = docs.select(
        "doc_id",
        F.size(tokens_array("text")).cast("long").alias("n_tokens"),
        F.md5(norm).alias("__h"),
    )
    w = Window.partitionBy("__h").orderBy("doc_id")
    curated = (
        base.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(
            F.col("n_tokens").between(CURATE_MIN_TOKENS, CURATE_MAX_TOKENS)
        )
        .select("doc_id")
    )
    survivors = docs.join(hash_sample(curated, "doc_id", CURATE_SAMPLE),
                          "doc_id")
    chunks = chunking.chunk_documents(
        survivors, chunk_size=CHUNK_SIZE, overlap=OVERLAP
    )
    keyed = chunks.select(
        (F.col("doc_id") * CKEY_MULT + F.col("chunk_id")).alias("ckey"),
        "chunk",
    )
    packed = chunking.pack_sequences(
        keyed,
        capacity=ASSEMBLE_CAPACITY,
        n_shards=ASSEMBLE_SHARDS,
        id_col="ckey",
        text_col="chunk",
    )
    return packed.select(
        F.expr(f"ckey div {CKEY_MULT}").alias("doc_id"),
        (F.col("ckey") % CKEY_MULT).alias("chunk_id"),
        "shard",
        "bin_in_shard",
        "n_tok",
    )


def _assemble_sql() -> str:
    from bigdata_elephant_spark.plans.llm_queries import (
        DOC_TOKS_CTE,
        CURATE_MIN_TOKENS,
        CURATE_MAX_TOKENS,
        CURATE_SAMPLE,
    )
    from bigdata_elephant_spark.functions.hashing import h32_sql_duckdb

    h = h32_sql_duckdb("CAST(s.doc_id AS VARCHAR)")
    return f"""
WITH {DOC_TOKS_CTE},
stats AS (
    SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM doc_toks
),
canon AS (
    SELECT min(doc_id) AS doc_id
    FROM documents
    GROUP BY md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
),
surv AS (
    SELECT s.doc_id
    FROM stats s JOIN canon c USING (doc_id)
    WHERE s.n_tokens BETWEEN {CURATE_MIN_TOKENS} AND {CURATE_MAX_TOKENS}
      AND ({h} % 10000) < {int(CURATE_SAMPLE * 10000)}
),
chunks AS (
    SELECT d.doc_id, CAST(j AS BIGINT) AS chunk_id,
           substring(d.text, 1 + j * {STRIDE}, {CHUNK_SIZE}) AS chunk
    FROM documents d
    JOIN surv USING (doc_id),
         unnest(range(0, (greatest(length(d.text) - {OVERLAP}, 1) - 1)
                         // {STRIDE} + 1)) AS t(j)
),
keyed AS (
    SELECT doc_id, chunk_id,
           doc_id * {CKEY_MULT} + chunk_id AS ckey,
           (doc_id * {CKEY_MULT} + chunk_id) % {ASSEMBLE_SHARDS} AS shard,
           CASE WHEN trim(chunk) = '' THEN 0
                ELSE len(string_split_regex(trim(chunk), '\\s+'))
           END AS n_tok
    FROM chunks
),
c AS (
    SELECT doc_id, chunk_id, shard, n_tok,
           sum(n_tok) OVER (
               PARTITION BY shard ORDER BY ckey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) - n_tok AS cum_before
    FROM keyed
)
SELECT doc_id, chunk_id, CAST(shard AS BIGINT) AS shard,
       CAST(cum_before // {ASSEMBLE_CAPACITY} AS BIGINT) AS bin_in_shard,
       CAST(n_tok AS BIGINT) AS n_tok
FROM c
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


MIXTURE_WEIGHTS = {"de": 0.2, "en": 0.2, "es": 0.2, "fr": 0.2,
                   "zh": 0.2}
MIXTURE_N = 600


def q_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target-mixture rebalancing (operators/sampling.py
    mixture_rebalance): documents re-weighted to an equal-share
    language mixture of 600 rows — English down-samples (md5-ordered
    prefix), the scarcer languages up-sample by epoch repetition.
    Per-language totals hit 120 exactly; the oracle replays the
    rank/div/mod arithmetic."""
    from bigdata_elephant_spark.operators.sampling import (
        mixture_rebalance,
    )

    docs = read_table(spark, sf_dir, "documents")
    return mixture_rebalance(
        docs, "lang", MIXTURE_WEIGHTS, MIXTURE_N, "doc_id"
    )


_MIX_VALUES = ", ".join(
    f"('{s}', {int(round(MIXTURE_N * w))})"
    for s, w in sorted(MIXTURE_WEIGHTS.items())
)

MIXTURE_SQL = f"""
WITH targets(lang, target_n) AS (VALUES {_MIX_VALUES}),
counts AS (
    SELECT lang, count(*) AS n FROM documents GROUP BY 1
),
plan AS (
    SELECT t.lang, t.target_n // c.n AS base, t.target_n % c.n AS extra
    FROM targets t JOIN counts c USING (lang)
),
ranked AS (
    SELECT doc_id, lang,
           row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ) AS rnk
    FROM documents
),
expanded AS (
    SELECT r.doc_id, r.lang,
           p.base + CASE WHEN r.rnk <= p.extra THEN 1 ELSE 0 END
               AS copies
    FROM ranked r JOIN plan p USING (lang)
)
SELECT doc_id, lang, CAST(unnest(range(1, copies + 1)) AS BIGINT) AS epoch
FROM expanded WHERE copies > 0
"""


# --------------------------------------------- BPE tokenizer training

N_MERGES = 8
SUBWORD_TOP_N = 30
ENCODE_TOP_N = 100


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge-rule table (operators/bpe.py): one corpus
    scan to the (word, freq) vocabulary, then 8 deterministic
    argmax-merge rounds. The oracle unrolls the identical rounds."""
    from bigdata_elephant_spark.operators.bpe import bpe_train

    merges, _ = bpe_train(_docs(spark, sf_dir), n_merges=N_MERGES)
    return merges.orderBy("merge_rank")


def q_bpe_subword_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_elephant_spark.operators.bpe import (
        bpe_subword_vocab,
        bpe_train,
    )

    _, wf = bpe_train(_docs(spark, sf_dir), n_merges=N_MERGES)
    return bpe_subword_vocab(wf, top_n=SUBWORD_TOP_N)


def q_bpe_encode_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encodings of the 100 most frequent words under the learned
    rules — the trained vocabulary IS the encoding table for every
    in-vocab word, so this reads it straight off ``final_wf``
    (content-verified via an md5 over the positional subword join;
    the driver canonicalizer can't hash raw array columns)."""
    from bigdata_elephant_spark.operators.bpe import bpe_train

    _, wf = bpe_train(_docs(spark, sf_dir), n_merges=N_MERGES)
    return (
        wf.select(
            "word",
            F.size("syms").alias("n_subwords"),
            F.md5(F.array_join("syms", " ")).alias("subwords_fp"),
            "freq",
        )
        .orderBy(F.desc("freq"), "word")
        .limit(ENCODE_TOP_N)
    )


def q_bpe_fertility_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tokenizer fertility audit: subwords-per-word and
    chars-per-subword for each corpus source under the learned
    rules — the standard tokenizer-fit report (a source whose
    fertility is far above the corpus mean is being shredded into
    characters: its domain is under-represented in the merges).
    The trained vocabulary already IS the word→encoding table, so
    this is one token-stream pass joined against the vocab-sized
    ``final_wf`` (UNHINTED — vocab grows with the corpus; AQE sizes
    the join) and a per-source aggregate. Exact integer sums; one
    rounded division per output column."""
    from pyspark.sql import functions as F

    from bigdata_elephant_spark.operators.bpe import bpe_train
    from bigdata_elephant_spark.operators.dedup import tokens_array

    docs = _docs(spark, sf_dir)
    _, wf = bpe_train(docs, n_merges=N_MERGES)
    enc = wf.select(
        "word", F.size("syms").alias("ns")
    )
    words = docs.select(
        "source", F.explode(tokens_array("text")).alias("word")
    )
    return (
        words.join(enc, "word")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("ns").cast("long").alias("n_subwords"),
            F.round(
                F.sum("ns").cast("double") / F.count("*"), 6
            ).alias("fertility"),
            F.round(
                F.sum(F.length("word")).cast("double")
                / F.sum("ns"),
                6,
            ).alias("chars_per_subword"),
        )
        .orderBy("source")
    )


def _bpe_fertility_sql() -> str:
    return f"""{_bpe_ctes(N_MERGES)},
words AS (
    SELECT d.source, t.w AS word
    FROM (SELECT doc_id, unnest(toks) AS w FROM doc_toks) t
    JOIN documents d USING (doc_id)
),
enc AS (SELECT word, len(syms) AS ns FROM w{N_MERGES})
SELECT source,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(ns) AS BIGINT) AS n_subwords,
       round(CAST(sum(ns) AS DOUBLE) / count(*), 6) AS fertility,
       round(CAST(sum(length(word)) AS DOUBLE) / sum(ns), 6)
           AS chars_per_subword
FROM words JOIN enc USING (word)
GROUP BY source
ORDER BY source
"""


def _bpe_ctes(n_merges: int) -> str:
    """The unrolled training chain: w0 (char-split vocab) then for
    each round k: pair counts p{k}, argmax m{k}, rewritten vocab
    w{k}. The rewrite is a left string-fold (list_reduce) matching
    the Spark array fold's non-overlap rule exactly.

    Precondition: the corpus must support all ``n_merges`` rounds
    (an exhausted round would make ``m{k}`` empty and the cross join
    annihilate ``w{k}``, where the Spark loop instead stops early —
    tests/test_bpe.py::test_train_exhausts_gracefully pins the
    operator's behavior). Any natural-language corpus supports 8
    merges; the tiniest gate SF (sf0.001) trains 8 with room to
    spare."""
    from bigdata_elephant_spark.plans.llm_queries import DOC_TOKS_CTE

    parts = [
        DOC_TOKS_CTE,
        """w0 AS (
    SELECT word,
           list_transform(range(1, length(word) + 1),
                          i -> word[i:i]) AS syms,
           CAST(count(*) AS BIGINT) AS freq
    FROM (SELECT unnest(toks) AS word FROM doc_toks)
    GROUP BY word
)""",
    ]
    for k in range(1, n_merges + 1):
        parts.append(f"""p{k} AS (
    SELECT pr.l AS lhs, pr.r AS rhs,
           CAST(sum(freq) AS BIGINT) AS pair_count
    FROM (
        SELECT unnest(list_transform(
                   range(1, len(syms)),
                   i -> {{'l': syms[i], 'r': syms[i + 1]}})) AS pr,
               freq
        FROM w{k - 1} WHERE len(syms) >= 2
    )
    GROUP BY pr.l, pr.r
)""")
        parts.append(f"""m{k} AS (
    SELECT lhs, rhs, lhs || rhs AS merged, pair_count
    FROM p{k} ORDER BY pair_count DESC, lhs, rhs LIMIT 1
)""")
        parts.append(f"""w{k} AS (
    SELECT word,
           CASE WHEN len(syms) < 2 THEN syms
                ELSE string_split(list_reduce(syms, (acc, x) -> CASE
                         WHEN regexp_extract(acc, '[^ ]+$') = m{k}.lhs
                              AND x = m{k}.rhs
                         THEN regexp_replace(acc, '[^ ]+$', m{k}.merged)
                         ELSE acc || ' ' || x END), ' ')
           END AS syms, freq
    FROM w{k - 1}, m{k}
)""")
    return "WITH " + ",\n".join(parts)


def _bpe_merges_sql() -> str:
    rows = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS INTEGER) AS merge_rank, lhs, rhs, "
        f"merged, pair_count FROM m{k}"
        for k in range(1, N_MERGES + 1)
    )
    return (
        f"{_bpe_ctes(N_MERGES)}\nSELECT * FROM ({rows}) "
        "ORDER BY merge_rank"
    )


def _bpe_subword_vocab_sql() -> str:
    return f"""{_bpe_ctes(N_MERGES)}
SELECT subword, CAST(sum(freq) AS BIGINT) AS freq
FROM (SELECT unnest(syms) AS subword, freq FROM w{N_MERGES})
GROUP BY subword
ORDER BY freq DESC, subword
LIMIT {SUBWORD_TOP_N}
"""


def _bpe_encode_sql() -> str:
    return f"""{_bpe_ctes(N_MERGES)}
SELECT word, CAST(len(syms) AS INTEGER) AS n_subwords,
       md5(array_to_string(syms, ' ')) AS subwords_fp, freq
FROM w{N_MERGES}
ORDER BY freq DESC, word
LIMIT {ENCODE_TOP_N}
"""


SPECS = [
    QuerySpec("doc_chunks", q_doc_chunks, DOC_CHUNKS_SQL,
              ("llm", "chunking")),
    QuerySpec("mixture_rebalance", q_mixture_rebalance, MIXTURE_SQL,
              ("llm", "sampling", "pipeline")),
    QuerySpec("pack_sequences", q_pack_sequences, PACK_SEQUENCES_SQL,
              ("llm", "chunking", "window")),
    QuerySpec("shuffle_assignments", q_shuffle_assignments,
              SHUFFLE_ASSIGNMENTS_SQL, ("llm", "sampling")),
    QuerySpec("redact_pii", q_redact_pii, REDACT_PII_SQL,
              ("llm", "text")),
    QuerySpec("assemble_training_corpus", q_assemble_training_corpus,
              _assemble_sql(), ("llm", "pipeline", "chunking"),
              bench=True),
    QuerySpec("bpe_merges", q_bpe_merges, _bpe_merges_sql,
              ("llm", "text", "tokenizer"), bench=True),
    QuerySpec("bpe_subword_vocab", q_bpe_subword_vocab,
              _bpe_subword_vocab_sql, ("llm", "text", "tokenizer")),
    QuerySpec("bpe_fertility_by_source", q_bpe_fertility_by_source,
              _bpe_fertility_sql, ("llm", "text", "tokenizer")),
    QuerySpec("bpe_encode_sample", q_bpe_encode_sample,
              _bpe_encode_sql, ("llm", "text", "tokenizer")),
]
