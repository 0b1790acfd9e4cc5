"""Registry entries for the search-engine pipeline (SURVEY §2 O1-O15).

The ``documents`` testdata table plays the Wikipedia-corpus role:
``doc_id`` + ``text`` (its ``lang``/``source`` stand in for the
reference's url/title metadata).

The DuckDB oracles re-derive the identical token stream with RE2-safe
SQL: the reference's single Java regex uses a backreference + lookahead
(unsupported in RE2), so the oracle decomposes it into
punctuation->space, whitespace split, then token-level filters
(all-digits; any char repeated >=4x via a LIKE disjunction).
``tests/test_text.py`` proves the decomposition equals the faithful
regex on the real corpus.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_elephant_spark.operators.index import build_index
from bigdata_elephant_spark.operators.search import search
from bigdata_elephant_spark.operators.vocab import build_vocabulary
from bigdata_elephant_spark.functions.text import tokenize_str
from bigdata_elephant_spark.registry import QuerySpec
from bigdata_elephant_spark.session import persist_tracked
from bigdata_elephant_spark.sources.corpus import read_table

# Exercises every filterText branch: case-folding, punctuation,
# all-digit drop, >=4-repeat drop, and a repeated term (q_tf = 2).
DEFAULT_QUERY = "The Hash-Join!! 1234 stream query, Query aaaa"
DEFAULT_K = 10

# ---------------------------------------------------------------- SQL

_REPEAT4_LIKE = " OR ".join(
    f"word LIKE '%{c * 4}%'" for c in "abcdefghijklmnopqrstuvwxyz0123456789"
)

# doc_id, word token stream (duplicates kept — needed for tf).
TOKS_CTE = f"""
raw AS (
    SELECT doc_id,
           unnest(string_split_regex(
               regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
               '\\s+')) AS word
    FROM documents
),
toks AS (
    SELECT doc_id, word FROM raw
    WHERE word <> ''
      AND NOT regexp_full_match(word, '[0-9]+')
      AND NOT ({_REPEAT4_LIKE})
)
"""

VOCAB_CTE = """
vocab AS (
    SELECT word,
           CAST(row_number() OVER (ORDER BY word) - 1 AS BIGINT) AS word_id,
           df
    FROM (
        SELECT word, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        FROM toks GROUP BY word
    )
)
"""

POSTINGS_CTE = """
postings AS (
    SELECT t.doc_id, v.word_id, CAST(count(*) AS BIGINT) AS tf
    FROM toks t JOIN vocab v USING (word)
    GROUP BY t.doc_id, v.word_id
)
"""


def _qterms_values(query: str) -> str:
    counts = Counter(tokenize_str(query))
    rows = ", ".join(
        f"('{w}', {float(c)})" for w, c in sorted(counts.items())
    )
    return f"qterms(word, q_tf) AS (SELECT * FROM (VALUES {rows}))"


def _search_oracle(query: str, k: int, scoring: str) -> str:
    if scoring == "reference":
        partial = "(p.tf / v.df) * (q.q_tf / v.df)"
        extra = ""
    else:  # smooth tf-idf
        partial = "(p.tf * i.idf) * (q.q_tf * i.idf)"
        extra = (
            ", ndocs AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents)"
        )
    idf_join = (
        ", idf AS (SELECT word_id, ln((n + 1.0) / (df + 1.0)) + 1.0 AS idf"
        "   FROM vocab, ndocs)"
        if scoring != "reference"
        else ""
    )
    join_idf = " JOIN idf i USING (word_id)" if scoring != "reference" else ""
    return f"""
WITH {TOKS_CTE}, {VOCAB_CTE}, {POSTINGS_CTE},
{_qterms_values(query)}{extra}{idf_join}
SELECT doc_id, score FROM (
    SELECT p.doc_id,
           round(sum({partial}), 6) AS score
    FROM postings p
    JOIN vocab v USING (word_id)
    JOIN qterms q USING (word){join_idf}
    GROUP BY p.doc_id
)
ORDER BY score DESC, doc_id
LIMIT {k}
"""


def _bm25_oracle(query: str, k: int, k1: float, b: float) -> str:
    return f"""
WITH {TOKS_CTE}, {VOCAB_CTE}, {POSTINGS_CTE},
{_qterms_values(query)},
dl AS (
    SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM postings GROUP BY 1
),
stats AS (
    SELECT CAST(sum(dl) AS DOUBLE) / count(dl) AS avgdl FROM dl
),
ndocs AS (
    SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM postings
),
idf AS (
    SELECT word_id, ln((n - df + 0.5) / (df + 0.5) + 1.0) AS idf
    FROM vocab, ndocs
)
SELECT doc_id, score FROM (
    SELECT p.doc_id,
           round(sum(i.idf
                     * ((p.tf * ({k1} + 1.0))
                        / (p.tf + {k1} * (1.0 - {b}
                                          + {b} * (d.dl / s.avgdl))))
                     * q.q_tf), 6) AS score
    FROM postings p
    JOIN vocab v USING (word_id)
    JOIN qterms q USING (word)
    JOIN idf i USING (word_id)
    JOIN dl d ON d.doc_id = p.doc_id
    CROSS JOIN stats s
    GROUP BY p.doc_id
)
ORDER BY score DESC, doc_id
LIMIT {k}
"""


VOCAB_SQL = f"""
WITH {TOKS_CTE}, {VOCAB_CTE}
SELECT word, word_id, df FROM vocab
"""

POSTINGS_SQL = f"""
WITH {TOKS_CTE}, {VOCAB_CTE}, {POSTINGS_CTE}
SELECT doc_id, word_id, tf FROM postings
"""

DOC_META_SQL = "SELECT doc_id, lang, source FROM documents"

# -------------------------------------------------------------- Spark


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "documents")


def q_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_vocabulary(_corpus(spark, sf_dir))


def q_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    return build_index(corpus, build_vocabulary(corpus))


def q_doc_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _corpus(spark, sf_dir).select("doc_id", "lang", "source")


def _search_q(scoring: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        corpus = _corpus(spark, sf_dir)
        # The vocab feeds two plan branches (index probe + query-term
        # lookup); persisting it (vocab-sized, tiny vs corpus) stops
        # the corpus tokenize+aggregate from running once per branch.
        vocab = persist_tracked(build_vocabulary(corpus))
        postings = build_index(corpus, vocab)
        n_docs = corpus.count() if scoring == "smooth" else None
        return search(
            spark,
            DEFAULT_QUERY,
            vocab,
            postings,
            k=DEFAULT_K,
            scoring=scoring,
            n_docs=n_docs,
        ).select("doc_id", "score")

    return run


def _search_reference_indexed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reference-semantics search over MATERIALIZED vocab/postings
    parquet — the cli.py build-once/query-many production flow
    (Vocabulary.java:133-146 writes the vocab artifact that
    Query.java:247-294 reads back) as a benched registry row, so the
    bench records what a query costs once the index exists. Results
    are identical to ``search_reference`` (same relation, different
    storage), so it shares the oracle."""
    from bigdata_elephant_spark.plans.pipeline_queries import (
        _index_artifacts,
    )

    vocab, postings = _index_artifacts(spark, sf_dir)
    return search(
        spark,
        DEFAULT_QUERY,
        vocab,
        postings,
        k=DEFAULT_K,
        scoring="reference",
    ).select("doc_id", "score")


BM25_K1 = 1.2
BM25_B = 0.75


def _search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_elephant_spark.operators.search import bm25_search

    corpus = _corpus(spark, sf_dir)
    vocab = persist_tracked(build_vocabulary(corpus))
    # NOT persisted: measured 3.0s (persisted) vs ~2.3s at sf0.1 —
    # the consumers recompute column-pruned lineage cheaper than the
    # full-postings cache materializes (same finding as hybrid/batch)
    postings = build_index(corpus, vocab)
    return bm25_search(
        spark, DEFAULT_QUERY, vocab, postings, k=DEFAULT_K,
        k1=BM25_K1, b=BM25_B,
    ).select("doc_id", "score")


# The reference's hardcoded default query and K (Query.java:27,29) —
# registered verbatim so its out-of-the-box behavior has an oracle.
REFERENCE_DEFAULT_QUERY = "the good person"


def _search_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    vocab = persist_tracked(build_vocabulary(corpus))
    postings = build_index(corpus, vocab)
    return search(
        spark, REFERENCE_DEFAULT_QUERY, vocab, postings, k=DEFAULT_K,
        scoring="reference",
    ).select("doc_id", "score")


PHRASE_QUERY = "hash join"
PHRASE_K = 10


def q_search_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase search over a positional index
    (operators/index.py build_positional_index + phrase_search):
    docs containing the adjacent token sequence 'hash join', ranked
    by occurrence count — the proximity capability the reference's
    tf-only postings cannot answer. The oracle intersects the same
    1-offset positions over the identical filtered token stream."""
    from bigdata_elephant_spark.operators.index import (
        build_positional_index,
        phrase_search,
    )

    corpus = read_table(spark, sf_dir, "documents")
    vocab = build_vocabulary(corpus)
    positional = build_positional_index(corpus, vocab)
    return phrase_search(PHRASE_QUERY, vocab, positional, k=PHRASE_K)


def _phrase_oracle(terms: list[str], k: int) -> str:
    # Positions come from generate_subscripts over the FILTERED token
    # list (list ops are order-preserving), never row_number() OVER ()
    # on unnested rows, whose order DuckDB does not guarantee.
    repeat4_w = _REPEAT4_LIKE.replace("word LIKE", "w LIKE")
    joins = []
    for i, t in enumerate(terms[1:], start=1):
        joins.append(
            f"JOIN pos m{i} ON m{i}.doc_id = m0.doc_id "
            f"AND m{i}.p = m0.p + {i} AND m{i}.word = '{t}'"
        )
    return f"""
WITH doc_toks AS (
    SELECT doc_id,
           list_filter(
               string_split_regex(
                   regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
                   '\\s+'),
               w -> w <> ''
                    AND NOT regexp_full_match(w, '[0-9]+')
                    AND NOT ({repeat4_w})) AS toks
    FROM documents
),
pos AS (
    SELECT doc_id, unnest(toks) AS word,
           generate_subscripts(toks, 1) - 1 AS p
    FROM doc_toks
)
SELECT m0.doc_id, count(*) AS n_occurrences
FROM pos m0 {' '.join(joins)}
WHERE m0.word = '{terms[0]}'
GROUP BY 1
ORDER BY n_occurrences DESC, m0.doc_id
LIMIT {k}
"""


VOCAB_SPLIT_DOC = 400


def q_vocab_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental vocabulary maintenance (operators/vocab.py
    update_vocabulary): build from docs < 400, absorb docs >= 400 as
    an append-only delta. Existing words keep their ids (the
    invariant persisted postings depend on; a rebuild would remap
    them), df grows by the delta counts, unseen words append after
    the max id. The oracle replays the two-tier id assignment."""
    from bigdata_elephant_spark.operators.vocab import update_vocabulary

    corpus = read_table(spark, sf_dir, "documents")
    base = corpus.filter(F.col("doc_id") < VOCAB_SPLIT_DOC)
    delta = corpus.filter(F.col("doc_id") >= VOCAB_SPLIT_DOC)
    return update_vocabulary(build_vocabulary(base), delta)


def q_index_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental postings maintenance (operators/index.py
    update_index) — the day-2 operation completing
    ``vocab_incremental_update``: index ONLY the delta batch (docs >=
    400) against the incrementally-updated vocabulary and union with
    the base segment's postings, whose rows are untouched bytes.
    Delta-cost, not corpus-cost: at 100 TB the base postings are a
    persisted artifact nobody rescans; here the whole chain stays one
    lazy plan and the oracle replays both the two-tier id assignment
    and the two-segment postings union."""
    from bigdata_elephant_spark.operators.index import (
        build_index,
        update_index,
    )
    from bigdata_elephant_spark.operators.vocab import update_vocabulary

    corpus = read_table(spark, sf_dir, "documents")
    base = corpus.filter(F.col("doc_id") < VOCAB_SPLIT_DOC)
    delta = corpus.filter(F.col("doc_id") >= VOCAB_SPLIT_DOC)
    v_base = build_vocabulary(base)
    v_inc = update_vocabulary(v_base, delta)
    p_base = build_index(base, v_base)
    return update_index(delta, v_inc, p_base)


REINGEST_MOD = 7
REINGEST_SUFFIX = " query"


def q_search_reingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document UPSERT under the oracle gate (operators/index.py
    ``reingest_docs`` — Lucene ``updateDocument``): the full corpus
    is indexed, then every ``doc_id % 7 == 0`` document arrives
    AGAIN with edited text (one extra query term appended), is
    delete-then-appended against the FROZEN vocabulary, and the
    reference search runs over the upserted segment. The oracle
    recomputes the vocabulary from the ORIGINAL corpus (frozen ids
    and df, exactly what the engine holds) but the postings from the
    EDITED text. Every failure mode moves the scores: a no-op upsert
    misses the edits, a failed delete stacks old+new postings
    (doubled tf), a failed re-add drops the docs, and a vocabulary
    accidentally rebuilt over the edits shifts df."""
    from bigdata_elephant_spark.operators.index import reingest_docs

    corpus = _corpus(spark, sf_dir)
    vocab = persist_tracked(build_vocabulary(corpus))
    postings = build_index(corpus, vocab)
    delta = corpus.filter(
        F.col("doc_id") % REINGEST_MOD == 0
    ).withColumn("text", F.concat(F.col("text"), F.lit(REINGEST_SUFFIX)))
    upserted = reingest_docs(delta, vocab, postings)
    return search(
        spark, DEFAULT_QUERY, vocab, upserted, k=DEFAULT_K,
        scoring="reference",
    ).select("doc_id", "score")


_MOD_TOKS_CTE = f"""mod_raw AS (
    SELECT doc_id,
           unnest(string_split_regex(
               regexp_replace(lower(
                   CASE WHEN doc_id % {REINGEST_MOD} = 0
                        THEN text || '{REINGEST_SUFFIX}'
                        ELSE text END),
                   '[^a-z0-9]+', ' ', 'g'),
               '\\s+')) AS word
    FROM documents
),
mod_toks AS (
    SELECT doc_id, word FROM mod_raw
    WHERE word <> ''
      AND NOT regexp_full_match(word, '[0-9]+')
      AND NOT ({_REPEAT4_LIKE})
)"""

# vocab (ids AND df) frozen on the original corpus; postings over the
# edited text — the exact relation reingest_docs leaves behind.
SEARCH_REINGEST_SQL = f"""
WITH {TOKS_CTE}, {VOCAB_CTE}, {_MOD_TOKS_CTE},
postings AS (
    SELECT t.doc_id, v.word_id, CAST(count(*) AS BIGINT) AS tf
    FROM mod_toks t JOIN vocab v USING (word)
    GROUP BY t.doc_id, v.word_id
),
{_qterms_values(DEFAULT_QUERY)}
SELECT doc_id, score FROM (
    SELECT p.doc_id,
           round(sum((p.tf / v.df) * (q.q_tf / v.df)), 6) AS score
    FROM postings p
    JOIN vocab v USING (word_id)
    JOIN qterms q USING (word)
    GROUP BY p.doc_id
)
ORDER BY score DESC, doc_id
LIMIT {DEFAULT_K}
"""


def _toks_cte_for(name: str, pred: str) -> str:
    return f"""{name} AS (
    SELECT doc_id, word FROM (
        SELECT doc_id,
               unnest(string_split_regex(
                   regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
                   '\\s+')) AS word
        FROM documents WHERE {pred}
    )
    WHERE word <> ''
      AND NOT regexp_full_match(word, '[0-9]+')
      AND NOT ({_REPEAT4_LIKE})
)"""


# The two-tier id-assignment chain (base ids alphabetical-dense,
# existing words frozen, new words appended after max id) exists
# ONCE and is shared by BOTH incremental oracles — hand-syncing two
# literal copies of the contract is exactly the divergence class the
# sparse-id seed fixes kept chasing.
_TWO_TIER_VOCAB_CTES = """base_vocab AS (
    SELECT word,
           CAST(row_number() OVER (ORDER BY word) - 1 AS BIGINT)
               AS word_id,
           df
    FROM (
        SELECT word, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        FROM base_toks GROUP BY 1
    )
),
delta_df AS (
    SELECT word, CAST(count(DISTINCT doc_id) AS BIGINT) AS ddf
    FROM delta_toks GROUP BY 1
),
updated AS (
    SELECT b.word, b.word_id, b.df + coalesce(d.ddf, 0) AS df
    FROM base_vocab b LEFT JOIN delta_df d USING (word)
),
new_words AS (
    SELECT d.word,
           (SELECT max(word_id) FROM base_vocab)
               + CAST(row_number() OVER (ORDER BY d.word) AS BIGINT)
               AS word_id,
           d.ddf AS df
    FROM delta_df d
    WHERE d.word NOT IN (SELECT word FROM base_vocab)
)"""


VOCAB_INCREMENTAL_SQL = f"""
WITH {_toks_cte_for("base_toks", f"doc_id < {VOCAB_SPLIT_DOC}")},
{_toks_cte_for("delta_toks", f"doc_id >= {VOCAB_SPLIT_DOC}")},
{_TWO_TIER_VOCAB_CTES}
SELECT word, word_id, df FROM updated
UNION ALL
SELECT word, word_id, df FROM new_words
"""


# Base postings probe only the BASE vocabulary (what existed at base
# build time); delta postings probe the updated vocabulary (base ids
# frozen, new words after max) — both id tiers come verbatim from
# _TWO_TIER_VOCAB_CTES above.
INDEX_INCREMENTAL_SQL = f"""
WITH {_toks_cte_for("base_toks", f"doc_id < {VOCAB_SPLIT_DOC}")},
{_toks_cte_for("delta_toks", f"doc_id >= {VOCAB_SPLIT_DOC}")},
{_TWO_TIER_VOCAB_CTES},
full_vocab AS (
    SELECT word, word_id FROM updated
    UNION ALL
    SELECT word, word_id FROM new_words
),
base_post AS (
    SELECT t.doc_id, v.word_id, CAST(count(*) AS BIGINT) AS tf
    FROM base_toks t JOIN base_vocab v USING (word)
    GROUP BY 1, 2
),
delta_post AS (
    SELECT t.doc_id, v.word_id, CAST(count(*) AS BIGINT) AS tf
    FROM delta_toks t JOIN full_vocab v USING (word)
    GROUP BY 1, 2
)
SELECT doc_id, word_id, tf FROM base_post
UNION ALL
SELECT doc_id, word_id, tf FROM delta_post
"""


SPECS = [
    QuerySpec("vocab_build", q_vocab, VOCAB_SQL, ("search", "agg"), bench=True),
    QuerySpec("vocab_incremental_update", q_vocab_incremental,
              VOCAB_INCREMENTAL_SQL, ("search", "agg", "merge")),
    QuerySpec("index_incremental_update", q_index_incremental,
              INDEX_INCREMENTAL_SQL, ("search", "agg", "merge")),
    QuerySpec("search_reingest", q_search_reingest,
              SEARCH_REINGEST_SQL, ("search", "agg", "merge")),
    QuerySpec(
        "search_phrase",
        q_search_phrase,
        _phrase_oracle(tokenize_str(PHRASE_QUERY), PHRASE_K),
        ("search", "topk", "join"),
    ),
    QuerySpec(
        "search_default_query",
        _search_default,
        _search_oracle(REFERENCE_DEFAULT_QUERY, DEFAULT_K, "reference"),
        ("search", "topk"),
    ),
    QuerySpec(
        "postings_build", q_postings, POSTINGS_SQL, ("search", "join"),
        bench=True,
    ),
    QuerySpec("doc_meta", q_doc_meta, DOC_META_SQL, ("search", "project")),
    QuerySpec(
        "search_reference",
        _search_q("reference"),
        _search_oracle(DEFAULT_QUERY, DEFAULT_K, "reference"),
        ("search", "topk"),
        bench=True,
    ),
    QuerySpec(
        "search_reference_indexed",
        _search_reference_indexed,
        _search_oracle(DEFAULT_QUERY, DEFAULT_K, "reference"),
        ("search", "topk", "index"),
        bench=True,
    ),
    QuerySpec(
        "search_smooth",
        _search_q("smooth"),
        _search_oracle(DEFAULT_QUERY, DEFAULT_K, "smooth"),
        ("search", "topk"),
    ),
    QuerySpec(
        "search_bm25",
        _search_bm25,
        _bm25_oracle(DEFAULT_QUERY, DEFAULT_K, BM25_K1, BM25_B),
        ("search", "topk"),
    ),
]


# ------------------------------------------------- more-like-this

MLT_DOC_ID = 42
MLT_K = 10


def q_search_more_like_this(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Document-to-document tf-idf cosine over the inverted index
    (operators/search.py more_like_this)."""
    from bigdata_elephant_spark.operators.search import (
        more_like_this,
    )

    corpus = _corpus(spark, sf_dir)
    vocab = persist_tracked(build_vocabulary(corpus))
    # NOT persisted: 3.4s (persisted) vs ~2.0s at sf0.1 — even with
    # three postings consumers (norms, query row, dot products) the
    # column-pruned recompute beats materializing the full cache
    postings = build_index(corpus, vocab)
    return more_like_this(
        MLT_DOC_ID, vocab, postings, k=MLT_K, corpus=corpus
    )


MORE_LIKE_THIS_SQL = f"""
WITH {TOKS_CTE}, {VOCAB_CTE}, {POSTINGS_CTE},
ndocs AS (
    SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM postings
),
idf AS (
    SELECT word_id, round(ln(n) - ln(df), 6) AS idf
    FROM vocab, ndocs
),
wp AS (
    SELECT p.doc_id, p.word_id, p.tf,
           CAST(round(i.idf * i.idf, 6) AS DECIMAL(18,6)) AS i2
    FROM postings p JOIN idf i USING (word_id)
),
norms AS (
    SELECT doc_id,
           sum(i2 * CAST(tf * tf AS BIGINT)) AS n2
    FROM wp GROUP BY 1
),
qp AS (
    SELECT word_id, tf AS tf_q FROM wp
    WHERE doc_id = {MLT_DOC_ID}
),
num AS (
    SELECT w.doc_id,
           sum(w.i2 * CAST(w.tf * q.tf_q AS BIGINT)) AS num
    FROM wp w JOIN qp q USING (word_id)
    WHERE w.doc_id <> {MLT_DOC_ID}
    GROUP BY 1
),
qn AS (
    SELECT n2 AS qn2 FROM norms WHERE doc_id = {MLT_DOC_ID}
)
SELECT m.doc_id,
       round(CAST(m.num AS DOUBLE)
             / (sqrt(CAST(o.n2 AS DOUBLE))
                * sqrt(CAST(q.qn2 AS DOUBLE))), 6) AS cos_sim
FROM num m JOIN norms o USING (doc_id) CROSS JOIN qn q
ORDER BY cos_sim DESC, doc_id
LIMIT {MLT_K}
"""

SPECS.append(
    QuerySpec(
        "search_more_like_this",
        q_search_more_like_this,
        MORE_LIKE_THIS_SQL,
        ("search", "similarity", "topk"),
        bench=True,
    )
)


# ---------------------------------------------------- batch search

# A probe SET of query strings scored in one plan — the reference
# re-runs its whole two-job chain once per query string
# (Query.java:247-294); bm25_search_batch scans the index once for
# all of them. Mix of multi-term, reference-default and single-term
# probes so per-query top-k windows have different candidate sizes.
BATCH_QUERIES = {
    1: DEFAULT_QUERY,
    2: REFERENCE_DEFAULT_QUERY,
    3: "hash join stream",
    4: "person data",
}
BATCH_K = 5


def q_search_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_elephant_spark.operators.search import (
        bm25_search_batch,
    )

    corpus = _corpus(spark, sf_dir)
    vocab = persist_tracked(build_vocabulary(corpus))
    # NOT persisted: as with the hybrid query, caching the full
    # postings costs more than letting the two consumers (dl stats,
    # scoring join) recompute the column-pruned lineage — measured
    # 3.3s (persisted) vs ~2.7s at sf0.1.
    postings = build_index(corpus, vocab)
    # dl straight from the corpus (no postings re-pass): the vocab
    # is built from this same corpus, so sum(tf) per doc == token
    # count — see doc_lengths_from_corpus.
    from bigdata_elephant_spark.operators.search import (
        doc_lengths_from_corpus,
    )

    return bm25_search_batch(
        spark, BATCH_QUERIES, vocab, postings, k=BATCH_K,
        k1=BM25_K1, b=BM25_B,
        dl=doc_lengths_from_corpus(corpus),
    )


def _batch_qterms_values(queries: dict[int, str]) -> str:
    # the SAME expansion the Spark batch scorer broadcasts
    # (operators/search.py query_term_rows) rendered as VALUES
    from bigdata_elephant_spark.operators.search import (
        query_term_rows,
    )

    rows = [
        f"({qid}, '{w}', {tf})"
        for qid, w, tf in query_term_rows(queries)
    ]
    return (
        "qterms(query_id, word, q_tf) AS (SELECT * FROM (VALUES "
        + ", ".join(rows)
        + "))"
    )


def _batch_oracle(
    queries: dict[int, str], k: int, k1: float, b: float
) -> str:
    return f"""
WITH {TOKS_CTE}, {VOCAB_CTE}, {POSTINGS_CTE},
{_batch_qterms_values(queries)},
dl AS (
    SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM postings GROUP BY 1
),
stats AS (
    SELECT CAST(sum(dl) AS DOUBLE) / count(dl) AS avgdl FROM dl
),
ndocs AS (
    SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM postings
),
idf AS (
    SELECT word_id, ln((n - df + 0.5) / (df + 0.5) + 1.0) AS idf
    FROM vocab, ndocs
),
scored AS (
    SELECT CAST(q.query_id AS BIGINT) AS query_id, p.doc_id,
           round(sum(i.idf
                     * ((p.tf * ({k1} + 1.0))
                        / (p.tf + {k1} * (1.0 - {b}
                                          + {b} * (d.dl / s.avgdl))))
                     * q.q_tf), 6) AS score
    FROM postings p
    JOIN vocab v USING (word_id)
    JOIN qterms q USING (word)
    JOIN idf i USING (word_id)
    JOIN dl d ON d.doc_id = p.doc_id
    CROSS JOIN stats s
    GROUP BY 1, 2
)
SELECT query_id, doc_id, score, rank FROM (
    SELECT query_id, doc_id, score,
           CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY score DESC, doc_id) AS INTEGER) AS rank
    FROM scored
)
WHERE rank <= {k}
ORDER BY query_id, rank
"""


SPECS.append(
    QuerySpec(
        "search_batch",
        q_search_batch,
        _batch_oracle(BATCH_QUERIES, BATCH_K, BM25_K1, BM25_B),
        ("search", "topk", "batch"),
        bench=True,
    )
)


def q_search_batch_indexed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The batch scorer over MATERIALIZED vocab/postings artifacts
    (pipeline_queries._index_artifacts) — the production shape where
    batching actually amortizes: the index exists, so the whole
    probe set costs one pruned index pass instead of one rebuild +
    pass per query. Identical results to ``search_batch`` (the
    artifact is the same relation), hence the shared oracle."""
    from bigdata_elephant_spark.operators.search import (
        bm25_search_batch,
    )
    from bigdata_elephant_spark.plans.pipeline_queries import (
        _index_artifacts,
    )

    vocab, postings = _index_artifacts(spark, sf_dir)
    return bm25_search_batch(
        spark, BATCH_QUERIES, vocab, postings, k=BATCH_K,
        k1=BM25_K1, b=BM25_B,
    )


SPECS.append(
    QuerySpec(
        "search_batch_indexed",
        q_search_batch_indexed,
        _batch_oracle(BATCH_QUERIES, BATCH_K, BM25_K1, BM25_B),
        ("search", "topk", "batch", "index"),
        bench=True,
    )
)
