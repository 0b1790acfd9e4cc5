"""Skew mitigation for hot keys.

AQE's skew-join splitting handles most skew at runtime
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py). What AQE
does NOT fix is a skewed *aggregation* whose partial state is itself
huge per key — e.g. ``collect_set``/``count_distinct`` over a key
where one value holds 10% of a 100 TB table: every row of the hot key
lands on one reducer.

:func:`salted_aggregate` is the classic two-phase fix for algebraic
aggregates: scatter each key over ``n_salts`` sub-keys (random salt —
correctness doesn't depend on which rows land where), partially
aggregate per ``(key, salt)``, then combine the ``n_salts`` partial
rows per key. The hot key's work spreads over ``n_salts`` reducers;
the second aggregation touches only ``n_keys * n_salts`` rows.

Works for any aggregate with a partial/combine decomposition
(sum/count/min/max/avg-as-sum+count/approx sketches). Not for
holistic aggregates (exact median) — those need a different plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    n_salts: int = 16,
    salt_col: str | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partial_aggs`` run per ``(keys, salt)``; ``final_aggs`` combine
    the partials per ``keys`` and must reference the partial output
    columns by their aliases (e.g. partial ``sum(x) as s`` + final
    ``sum(s) as total``).

    The salt is a deterministic content hash, not ``rand()``: a
    nondeterministic salt recomputed differently on task retry can
    lose/duplicate rows mid-shuffle (the SPARK-23207 class of bug).
    Identical duplicate rows share a content-hash salt; pass
    ``salt_col`` naming a distinguishing column (upstream row id) to
    spread a hot key of identical payloads — see
    :func:`salted_join`.
    """
    salt_src = (
        [F.col(salt_col)] if salt_col is not None
        else [F.col(c) for c in df.columns]
    )
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*salt_src), F.lit(n_salts))
    )
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
    salt_col: str | None = None,
) -> DataFrame:
    """Skew-safe equi-join: salt-and-replicate.

    For a big-big shuffle join where one side's hot key floods a
    single reducer and the other side is too large to broadcast but
    small enough to replicate ``n_salts``-fold: the skewed side gets
    a random salt in [0, n_salts), the other side is replicated once
    per salt value (an ``explode`` of a literal range — no extra
    shuffle of the big side), and the join key becomes
    ``(key, salt)``. The hot key's rows now spread over ``n_salts``
    reducers. Row-level semantics are identical to ``big.join(small,
    key)`` — the salt is an internal partitioning trick, dropped on
    output.

    This is the manual fallback for the cases AQE skew splitting
    can't handle (e.g. a skewed *outer* side that AQE won't split, or
    pre-AQE engines); prefer AQE where it applies.

    Only ``inner``/``left``/``left_semi``/``left_anti`` (big side
    preserved) are supported: the small side is replicated
    ``n_salts``-fold, so a right/full outer join would emit one
    null-extended row *per replica* of an unmatched small-side row —
    not the semantics of ``big.join(small, key, how)``. Flip the
    argument order (salt the other side) for a right-preserving join.

    The salt is derived deterministically from the big side's row
    content (``xxhash64`` over all columns) rather than ``rand()``:
    a nondeterministic expression evaluated before a shuffle can be
    recomputed differently on task retry, silently losing or
    duplicating join rows. Content hashing spreads a hot key just as
    well whenever its rows differ in any other column — but FULLY
    IDENTICAL duplicate rows all hash to one salt, so a hot key made
    of identical rows (common in raw logs) defeats the spread. For
    that case pass ``salt_col``: the name of an existing column that
    distinguishes the duplicates (an upstream row id, a file+offset,
    a ``monotonically_increasing_id`` captured BEFORE the shuffle) —
    the salt becomes ``xxhash64(salt_col) % n_salts``, spreading even
    identical payloads while staying retry-deterministic.
    """
    allowed = {"inner", "left", "leftouter", "left_outer",
               "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports big-side-preserving joins only "
            f"({sorted(allowed)}); got how={how!r}. For a "
            f"right-preserving join, swap the arguments."
        )
    salt_src = (
        [F.col(salt_col)] if salt_col is not None
        else [F.col(c) for c in big.columns]
    )
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*salt_src), F.lit(n_salts))
    )
    replicated = small.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    return salted_big.join(replicated, [key, "__salt"], how).drop("__salt")


def salted_count_distinct(
    df: DataFrame,
    keys: Sequence[str],
    distinct_col: str,
    n_salts: int = 16,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Skew-safe count-distinct: salt by the *distinct value* (so
    equal values share a salt and the per-salt dedup is exact), dedup
    per (key, salt), then sum partial distinct counts."""
    salted = df.withColumn(
        "__salt",
        F.pmod(F.hash(F.col(distinct_col)), F.lit(n_salts)),
    )
    partial = (
        salted.groupBy(*keys, "__salt")
        .agg(F.count_distinct(distinct_col).alias("__pd"))
    )
    return partial.groupBy(*keys).agg(F.sum("__pd").alias(out_col))
