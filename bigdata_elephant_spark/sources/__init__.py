"""Schema'd sources and sinks."""

from bigdata_elephant_spark.sources.corpus import (  # noqa: F401
    CORPUS_SCHEMA,
    read_corpus,
    read_table,
    read_tables,
)
