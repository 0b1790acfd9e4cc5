"""SQL-first access to the engine.

A reference user drove everything through hardcoded job mains; a
Spark user expects to type SQL. ``register_views`` publishes the lake
tables and the engine's derived relations (vocabulary, postings, doc
metadata) as temp views, so the whole engine surface is queryable via
``spark.sql`` — and because views are lazy logical plans, Catalyst
optimizes *through* them (a filter on a view reaches the parquet
scan; unused view columns are pruned).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from bigdata_elephant_spark.operators.index import build_index, parse_documents
from bigdata_elephant_spark.operators.vocab import build_vocabulary
from bigdata_elephant_spark.sources.corpus import TPCH_TABLES, read_table


def register_views(
    spark: SparkSession, sf_dir: str, derived: bool = True
) -> list[str]:
    """Register every lake table (and, with ``derived``, the search
    engine's vocabulary/postings/doc_meta relations) as temp views.
    Returns the registered view names."""
    names = []
    for t in TPCH_TABLES:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)
        names.append(t)
    if derived:
        corpus = read_table(spark, sf_dir, "documents")
        vocab = build_vocabulary(corpus)
        vocab.createOrReplaceTempView("vocabulary")
        build_index(corpus, vocab).createOrReplaceTempView("postings")
        parse_documents(corpus, cols=("doc_id", "lang", "source"))\
            .createOrReplaceTempView("doc_meta")
        names += ["vocabulary", "postings", "doc_meta"]
    return names
