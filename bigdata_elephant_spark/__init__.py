"""bigdata_elephant_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
``zigzak1996/BigData-elephant`` (a Hadoop MapReduce TF-IDF full-text
search engine; see SURVEY.md) as an idiomatic PySpark engine:

- ``sources``    — schema'd readers (JSON-lines corpus, parquet tables).
- ``functions``  — column-level expression builders (text normalize,
  tokenize, parity-safe hashing, vector math). All JVM-side built-ins;
  no Python row UDFs in hot paths.
- ``operators``  — DataFrame -> DataFrame operators: the search-engine
  pipeline (vocabulary, inverted index, scored search) plus the
  LLM-data-pipeline surface (dedup, similarity search, text analysis).
- ``plans``      — relational query plans (TPC-H-ish) over the star
  schema, declared via DataFrame/SQL and optimized by Catalyst.
- ``streaming``  — Structured Streaming versions of the event
  aggregations (tumbling/sliding/session windows, watermarks).

Everything is expressed against the DataFrame API so Catalyst handles
predicate pushdown, column pruning, partial aggregation, and join
strategy selection; operators that need Python use Arrow-vectorized
pandas UDFs only.
"""

__version__ = "0.1.0"
