"""Central query registry.

Every implemented operator/query is declared as a :class:`QuerySpec`:
a name, a Spark callable ``(spark, sf_dir) -> DataFrame``, and (when
SQL-expressible) the equivalent DuckDB oracle SQL over the same
parquet tables. ``__spark_entry__.py`` exposes this registry to the
driver's correctness gate; ``bench.py`` runs the ``bench=True``
subset.

Cross-engine float rule: every floating-point output column is
rounded (usually 6 decimals) *inside the query on both sides*, and
every ORDER BY ... LIMIT uses the rounded value plus a unique
tie-break column, so result sets are deterministic and hash-stable.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    tags: tuple[str, ...] = field(default=())
    bench: bool = False


def all_specs() -> list[QuerySpec]:
    """Assemble the full registry (import-light so pytest stays fast)."""
    from bigdata_elephant_spark.plans import (
        llm_queries,
        relational,
        search_queries,
        stream_queries,
    )

    specs: list[QuerySpec] = []
    for mod in (search_queries, relational, llm_queries, stream_queries):
        specs.extend(mod.SPECS)
    names = [s.name for s in specs]
    assert len(names) == len(set(names)), "duplicate query names"
    return specs


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {s.name: s.fn for s in all_specs()}


def oracle_sql() -> dict[str, str]:
    return {s.name: s.oracle for s in all_specs() if s.oracle is not None}
