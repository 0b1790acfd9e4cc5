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
    spark: SparkSession,
    sf_dir: str,
    derived: bool = True,
    llm: bool = False,
    dup_groups: bool = False,
) -> list[str]:
    """Register every lake table (and, with ``derived``, the search
    engine's vocabulary/postings/doc_meta relations; with ``llm``,
    the curation surface — quality scores, hashed document vectors,
    text statistics) as temp views. These views are lazy logical
    plans, so Catalyst optimizes through them and nothing is computed
    until queried.

    ``dup_groups=True`` additionally registers the transitive
    duplicate-group table. Unlike every other view, connected
    components is iterative (label propagation with a driver-side
    convergence scalar per round), so it is COMPUTED AT REGISTRATION
    TIME and the view is a materialized snapshot: it does not track
    later changes to the lake files. It is off by default for that
    reason — call :func:`bigdata_elephant_spark.operators.dedup.
    duplicate_groups` directly when you want a fresh computation.
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
    if llm:
        from bigdata_elephant_spark.operators import textstats
        from bigdata_elephant_spark.operators.curation import (
            quality_logit_scores,
        )

        corpus = read_table(spark, sf_dir, "documents")
        quality_logit_scores(corpus).createOrReplaceTempView(
            "quality_scores"
        )
        textstats.hashed_doc_vectors(corpus).createOrReplaceTempView(
            "doc_vectors"
        )
        textstats.text_stats(corpus).createOrReplaceTempView(
            "doc_stats"
        )
        names += ["quality_scores", "doc_vectors", "doc_stats"]
    if dup_groups:
        # Eager by necessity: iterative connected components runs now
        # and the view is a snapshot (see docstring).
        from pyspark.sql import functions as F

        from bigdata_elephant_spark.operators import dedup

        corpus = read_table(spark, sf_dir, "documents")
        sigs = dedup.minhash_signatures(corpus)
        edges = dedup.lsh_candidate_edges(sigs).filter(
            F.col("est_sim") >= 0.5
        )
        dedup.duplicate_groups(edges).createOrReplaceTempView(
            "dup_groups"
        )
        names.append("dup_groups")
    return names
