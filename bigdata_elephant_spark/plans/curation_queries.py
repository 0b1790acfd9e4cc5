"""Registry entries for corpus-curation operators
(operators/curation.py): perplexity-band sampling, cross-source
contamination audit, per-source token-budget selection, and
embedding outlier detection.

Each oracle recomputes the identical arithmetic in DuckDB (same
tokenizer CTE, same md5 sample buckets, same rounded-decimal sums),
so results are hash-verified end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigdata_elephant_spark.functions.hashing import h32_sql_duckdb
from bigdata_elephant_spark.operators import curation
from bigdata_elephant_spark.plans.llm_queries import (
    DOC_SHINGLES_CTE,
    DOC_TOKS_CTE,
)
from bigdata_elephant_spark.registry import QuerySpec
from bigdata_elephant_spark.sources.corpus import read_table

TOKEN_BUDGET = 800
OUTLIER_SIGMA = 2.0
SHINGLE_N = 3


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "embeddings")


# ------------------------------------------------ surprisal banding


def q_surprisal_band_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return curation.surprisal_band_sample(_docs(spark, sf_dir)).orderBy(
        "doc_id"
    )


_DOC_BUCKET = (
    f"({h32_sql_duckdb('CAST(doc_id AS VARCHAR)')} % 10000)"
)

_BAND_KEEP = " OR ".join(
    f"(band = {b} AND {_DOC_BUCKET} < {int(f * 10000)})"
    for b, f in curation.BAND_FRACTIONS.items()
)

SURPRISAL_BAND_SQL = f"""
WITH {DOC_TOKS_CTE},
words AS (SELECT doc_id, unnest(toks) AS w FROM doc_toks),
freqs AS (SELECT w, count(*) AS c FROM words GROUP BY 1),
tot AS (SELECT sum(c) AS t FROM freqs),
s AS (
    SELECT w, CAST(round(ln(t) - ln(c), 6) AS DECIMAL(18,6)) AS s_w
    FROM freqs, tot
),
scored AS (
    SELECT doc_id,
           round(CAST(sum(s_w) AS DOUBLE) / count(*), 6)
               AS avg_surprisal
    FROM words JOIN s USING (w) GROUP BY 1
),
vals AS (
    SELECT avg_surprisal, count(*) AS cnt FROM scored GROUP BY 1
),
cum AS (
    SELECT avg_surprisal,
           sum(cnt) OVER (ORDER BY avg_surprisal
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum,
           (SELECT sum(cnt) FROM vals) AS n
    FROM vals
),
bounds AS (
    SELECT
      min(CASE WHEN cum >= ceil(0.25 * n) THEN avg_surprisal END)
          AS b25,
      min(CASE WHEN cum >= ceil(0.5  * n) THEN avg_surprisal END)
          AS b50,
      min(CASE WHEN cum >= ceil(0.75 * n) THEN avg_surprisal END)
          AS b75
    FROM cum
),
banded AS (
    SELECT doc_id, avg_surprisal,
           CASE WHEN avg_surprisal <= b25 THEN 0
                WHEN avg_surprisal <= b50 THEN 1
                WHEN avg_surprisal <= b75 THEN 2
                ELSE 3 END AS band
    FROM scored, bounds
)
SELECT doc_id, band, avg_surprisal
FROM banded WHERE {_BAND_KEEP}
ORDER BY doc_id
"""


# --------------------------------------- cross-source contamination


def q_source_overlap_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return curation.source_overlap_matrix(
        _docs(spark, sf_dir), shingle_n=SHINGLE_N
    ).orderBy("src_a", "src_b")


SOURCE_OVERLAP_SQL = f"""
WITH {DOC_TOKS_CTE}, {DOC_SHINGLES_CTE},
src_sh AS (
    SELECT DISTINCT d.source, s.shingle
    FROM doc_shingles s JOIN documents d USING (doc_id)
),
per_src AS (
    SELECT source, count(*) AS n_sh FROM src_sh GROUP BY 1
),
common AS (
    SELECT a.source AS src_a, b.source AS src_b,
           count(*) AS n_common
    FROM src_sh a JOIN src_sh b USING (shingle)
    WHERE a.source < b.source
    GROUP BY 1, 2
)
SELECT c.src_a, c.src_b, pa.n_sh AS n_a, pb.n_sh AS n_b,
       c.n_common,
       round(c.n_common / (pa.n_sh + pb.n_sh - c.n_common), 6)
           AS jaccard
FROM common c
JOIN per_src pa ON pa.source = c.src_a
JOIN per_src pb ON pb.source = c.src_b
ORDER BY src_a, src_b
"""


# --------------------------------------------- token-budget select


def q_token_budget_selection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return curation.token_budget_selection(
        _docs(spark, sf_dir), budget_per_source=TOKEN_BUDGET
    ).orderBy("source", "doc_id")


TOKEN_BUDGET_SQL = f"""
WITH {DOC_TOKS_CTE},
toks AS (
    SELECT d.source, t.doc_id,
           CAST(len(t.toks) AS BIGINT) AS n_tokens
    FROM doc_toks t JOIN documents d USING (doc_id)
),
sel AS (
    SELECT source, doc_id, n_tokens,
           CAST(sum(n_tokens) OVER (
               PARTITION BY source
               ORDER BY n_tokens DESC, doc_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_tokens
    FROM toks
)
SELECT source, doc_id, n_tokens, cum_tokens
FROM sel WHERE cum_tokens <= {TOKEN_BUDGET}
ORDER BY source, doc_id
"""


# --------------------------------------------- embedding outliers


def q_embedding_outliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return curation.embedding_outliers(
        _emb(spark, sf_dir), n_sigma=OUTLIER_SIGMA
    ).orderBy("vec_id")


EMBEDDING_OUTLIERS_SQL = f"""
WITH elems AS (
    SELECT vec_id, label, t.dim,
           CAST(round(CAST(embedding[t.dim] AS DOUBLE), 7)
                AS DECIMAL(20,7)) AS vd
    FROM embeddings,
         unnest(range(1, len(embedding) + 1)) AS t(dim)
),
cent AS (
    SELECT label, dim,
           round(CAST(sum(vd) AS DOUBLE) / count(*), 6) AS c
    FROM elems GROUP BY 1, 2
),
dists AS (
    -- resid * resid / dist * dist / mean * mean below, never
    -- pow(x, 2) (cross-engine 1-ulp trap; mirrors curation.py)
    SELECT e.vec_id, e.label,
           round(sqrt(CAST(sum(
               CAST(round((CAST(e.vd AS DOUBLE) - c.c)
                          * (CAST(e.vd AS DOUBLE) - c.c), 12)
                    AS DECIMAL(24,12))
           ) AS DOUBLE)), 6) AS dist
    FROM elems e JOIN cent c ON e.label = c.label AND e.dim = c.dim
    GROUP BY 1, 2
),
dd AS (
    SELECT vec_id, label, dist,
           CAST(dist AS DECIMAL(18,6)) AS d1,
           CAST(round(dist * dist, 12) AS DECIMAL(24,12)) AS d2
    FROM dists
),
stats AS (
    SELECT label, count(*) AS n, sum(d1) AS s1, sum(d2) AS s2
    FROM dd GROUP BY 1
),
thr AS (
    SELECT label,
           round(CAST(s1 AS DOUBLE) / n
                 + {OUTLIER_SIGMA} * sqrt(greatest(
                       CAST(s2 AS DOUBLE) / n
                       - (CAST(s1 AS DOUBLE) / n)
                         * (CAST(s1 AS DOUBLE) / n), 0.0)),
                 6) AS threshold
    FROM stats
)
SELECT d.vec_id, d.label, d.dist, t.threshold
FROM dd d JOIN thr t USING (label)
WHERE d.dist > t.threshold
ORDER BY d.vec_id
"""


# ------------------------------------------------ gram matrix


def q_embedding_gram_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Upper-triangle Gram matrix ``X^T X`` of the embedding table —
    the one-pass building block for PCA / whitening / covariance at
    corpus scale. No self-join: each row expands its own index pairs
    with two lateral explodes (``i``, then ``j >= i``), products are
    rounded to 12 decimals and summed as exact decimals per ``(i,
    j)`` (order-independent — the repo's decimal-sum discipline), so
    the only shuffle is the final dim²/2-row aggregation with
    map-side partials. At 100 TB this is exactly one scan of the
    vectors; the result (64x64 here) is metadata-sized for any
    corpus.

    Two-phase sum (r4→r5): per-term work stays in 1e12-scaled LONGS
    (cheap 64-bit adds in whole-stage codegen) grouped by
    ``(i, j, spark_partition_id)`` — a map-side-only combine, since
    the partition id is constant within each input split — and only
    the per-partition partials (#partitions × dim²/2 rows) are
    summed as exact decimals. Exactness is identical to a straight
    decimal sum: each scaled long IS the 12-decimal product times
    1e12, the decimal merge is exact, and the final
    round(cast-to-double, 6) matches the single-phase form
    bit-for-bit for |element| up to ~47 (scaled terms < 2^51, where
    the double scaling round-trip is digit-exact). Both failure
    modes are ruled out LOUDLY, not assumed: each partial carries
    its row count and raw min/max term, and the merge asserts
    ``|term| < 2^51`` (digit-exactness AND no clamped cast — raw
    min/max expose even a wrap to Long.MinValue) and
    ``cnt * |term| < 2^62`` (no partial-sum wrap) — at 100 TB with
    128 MB splits that head-room is ~2000×. Measured at
    sf0.1: 3.9 s (single-phase decimal, single-split scan) → ~1.5 s
    (long partials + core-fanned expansion)."""
    emb = _emb(spark, sf_dir).select("embedding")
    return _gram_merge(_gram_partials(emb))


def _gram_partials(
    emb: DataFrame, size_of: DataFrame | None = None
) -> DataFrame:
    """Per-(i, j, input-partition) exact decimal partial sums of the
    Gram terms → ``(i, j, pd decimal)``. Additive: partials from
    disjoint row sets merge to EXACTLY the full-table Gram (decimal
    addition is associative; the single rounding happens in
    :func:`_gram_merge`), which is what makes the materialized-Gram
    update path a delta-only scan (see ``gram_incremental``).

    ``size_of``: frame whose Catalyst stats stand in for ``emb``'s
    true bytes in the fan-out probe below — pass the underlying
    SCAN when ``emb`` is derived (gram_incremental's
    crossJoin-filtered slices inflate sizeInBytes ~11×, measured;
    the plan_size_bytes docstring's own rule)."""
    from pyspark.sql import functions as F

    # The explode amplifies each row 2080× — if the table arrives
    # in fewer splits than cores (tiny file at test SF), fan the
    # rows out first so the expansion runs on every core. At 100 TB
    # the scan has ≫cores splits and this branch never shuffles.
    # Split-count estimate = Catalyst's byte stats (memoized,
    # driver-side — no .rdd conversion, the r9 verdict nit) over
    # the 128 MB default split size; bytes is also what the file
    # scan actually bin-packs on, so 40 tiny part-files estimate as
    # ~1 split (repartition — an inputFiles() count would wrongly
    # skip) and one 4 GB splittable file as ~32 (skip — a file
    # count would wrongly shuffle the corpus). Unknown stats (0)
    # fan out: the only stat-less frames here are local test
    # relations, which are tiny; a real 100 TB scan always has file
    # stats.
    from bigdata_elephant_spark.session import plan_size_bytes

    split_bytes = 128 << 20  # spark.sql.files.maxPartitionBytes default
    par = emb.sparkSession.sparkContext.defaultParallelism
    sized = emb if size_of is None else size_of
    if plan_size_bytes(sized) // split_bytes < par:
        emb = emb.repartition(par)
    rounded = emb.select(
        F.transform(
            "embedding", lambda x: F.round(x.cast("double"), 7)
        ).alias("a")
    )
    # Guard: sequence(0, -1) on an empty array would yield the
    # DESCENDING [0, -1] and spurious null-product rows the DuckDB
    # oracle (range-based, empty on len 0) never produces.
    with_i = rounded.where(F.size("a") > 0).select(
        "a",
        F.explode(
            F.sequence(F.lit(0), F.size("a") - 1)
        ).alias("i"),
    )
    terms = with_i.select(
        "i",
        F.explode(
            F.sequence(F.col("i"), F.size("a") - 1)
        ).alias("j"),
        F.col("a"),
    ).select(
        F.col("i").cast("int").alias("i"),
        F.col("j").cast("int").alias("j"),
        # round(prod, 12) FIRST (the exact expression the oracle
        # mirrors), then scale — the 12-decimal double is within
        # ~1 ulp of k*1e-12, so *1e12 + round(…,0) recovers the
        # integer k exactly.
        F.round(
            F.round(
                F.get("a", F.col("i")) * F.get("a", F.col("j")),
                12,
            )
            * F.lit(1e12),
            0,
        )
        .cast("long")
        .alias("t"),
    )
    partials = terms.groupBy(
        "i", "j", F.spark_partition_id().alias("pid")
    ).agg(
        F.sum("t").alias("ps"),
        F.count("*").alias("cnt"),
        F.max("t").alias("mxp"),
        F.min("t").alias("mnp"),
    )
    # decimal(20,0)/decimal literal → exact rational k*1e-12. The
    # assert proves BOTH failure modes loudly, from aggregates that
    # cannot themselves wrap: (a) |term| < 2^51 bounds every scaled
    # long to the range where the double round-trip
    # round(round(prod,12)*1e12) recovers the decimal digits
    # exactly AND where a clamped double→long cast is impossible —
    # raw min/max are checked separately, so even a clamp to
    # Long.MinValue (whose abs() stays negative) trips the bound;
    # (b) cnt * |term|max < 2^62 bounds the partial sum. mxp/mnp
    # are NULL when every term in the partial was NULL (a null
    # embedding element) — no summable terms, nothing to overflow —
    # so they coalesce to 0 and the null ps flows through the merge
    # exactly as the single-phase decimal sum did.
    _mag = F.greatest(
        F.coalesce(F.col("mxp"), F.lit(0)),
        -F.coalesce(F.col("mnp"), F.lit(0)),
    ).cast("double")
    safe_ps = F.when(
        F.assert_true(
            (_mag < F.lit(float(2**51)))
            & (F.col("cnt").cast("double") * _mag < F.lit(float(2**62))),
            "gram partial long-sum bound violated (term magnitude "
            "or partial-sum headroom exceeded)",
        ).isNull(),
        F.col("ps").cast("decimal(20,0)")
        / F.lit(10**12).cast("decimal(13,0)"),
    )
    return partials.select("i", "j", safe_ps.alias("pd"))


def _gram_merge(pd_df: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    return (
        pd_df.groupBy("i", "j")
        .agg(
            F.round(F.sum("pd").cast("double"), 6).alias("gram")
        )
        .orderBy("i", "j")
    )


GRAM_DELTA_ROWS = 100


def q_gram_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental Gram maintenance: ``X^T X`` is ADDITIVE over row
    sets, so appending an ingest batch to a materialized Gram
    artifact costs one scan of the BATCH — ``G(all) = merge(
    partials(base) ∪ partials(delta))``, exactly (the partials are
    exact decimals; the one rounding happens at merge). This query
    computes the Gram through that split (the novelty fixture's
    bounded 100-vector delta) and shares the plain full-table
    oracle — the driver's hash equality IS the associativity claim.
    The same split shape updates the eigvec/PCA queries downstream:
    re-run the dim²-row iteration on the merged table, no corpus
    re-scan."""
    emb = _emb(spark, sf_dir)
    from pyspark.sql import functions as F

    cut = emb.agg(
        (F.max("vec_id") - F.lit(GRAM_DELTA_ROWS)).alias("_cut")
    )
    base = (
        emb.crossJoin(F.broadcast(cut))
        .filter(F.col("vec_id") <= F.col("_cut"))
        .select("embedding")
    )
    delta = (
        emb.crossJoin(F.broadcast(cut))
        .filter(F.col("vec_id") > F.col("_cut"))
        .select("embedding")
    )
    emb_scan = emb.select("embedding")
    return _gram_merge(
        _gram_partials(base, size_of=emb_scan).unionByName(
            _gram_partials(delta, size_of=emb_scan)
        )
    )


_GRAM_TERMS_CTES = """el AS (
    SELECT list_transform(embedding,
                          x -> round(CAST(x AS DOUBLE), 7)) AS a
    FROM embeddings
),
ij AS (
    SELECT a, i.i AS i
    FROM el, unnest(range(1, len(a) + 1)) AS i(i)
),
terms AS (
    -- 1-based list index -> 0-based output; j >= i upper triangle;
    -- a[i] * a[j] rounded 12 then decimal-summed (mirrors Spark)
    SELECT i - 1 AS i, j.j - 1 AS j,
           CAST(round(a[i] * a[j.j], 12) AS DECIMAL(30,12)) AS t
    FROM ij, unnest(range(i, len(a) + 1)) AS j(j)
)"""

EMBEDDING_GRAM_SQL = f"""
WITH {_GRAM_TERMS_CTES}
SELECT CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j,
       round(CAST(sum(t) AS DOUBLE), 6) AS gram
FROM terms GROUP BY 1, 2 ORDER BY 1, 2
"""


# --------------------- power iteration over the Gram table (r9)

POWER_ITERS = 8


def q_embedding_top_eigvec(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top principal direction of X^T X by fixed-iteration power
    method (operators/similarity.py power_iteration_top_eigvec):
    the PCA step after the one-pass Gram query — one corpus scan,
    then dim²-row iterations whose count is free at 100 TB. Exact
    decimal matvecs + per-iterate rounding make the oracle's
    unrolled CTE chain reproduce every iterate bit-for-bit."""
    from bigdata_elephant_spark.operators.similarity import (
        power_iteration_top_eigvec,
    )
    from bigdata_elephant_spark.plans.llm_queries import EMBED_DIM

    gram = q_embedding_gram_matrix(spark, sf_dir)
    return power_iteration_top_eigvec(
        gram, dim=EMBED_DIM, iters=POWER_ITERS
    )


def _power_chain_ctes(src: str, pfx: str) -> str:
    """Unrolled power-method CTE chain ``{pfx}v0..{pfx}v{ITERS}``
    over the full-matrix CTE ``src``. Every CTE is MATERIALIZED:
    each ``w{t}`` is referenced twice (norm + update), and DuckDB
    inlines CTEs by default — unmaterialized, the Gram scan
    re-evaluates 2^ITERS times (measured: minutes vs 0.2 s)."""
    import math

    from bigdata_elephant_spark.plans.llm_queries import EMBED_DIM

    x0 = round(1.0 / math.sqrt(EMBED_DIM), 6)
    parts = [
        f""",
{pfx}v0 AS MATERIALIZED (
    SELECT CAST(k AS INTEGER) AS j,
           CAST({x0} AS DECIMAL(12,6)) AS x
    FROM (SELECT unnest(range(0, {EMBED_DIM})) AS k)
)"""
    ]
    for t in range(1, POWER_ITERS + 1):
        parts.append(
            f""",
{pfx}w{t} AS MATERIALIZED (
    SELECT s.i,
           CAST(round(sum(s.g * v.x), 6) AS DECIMAL(18,6)) AS w
    FROM {src} s JOIN {pfx}v{t - 1} v ON v.j = s.j
    GROUP BY 1
),
{pfx}n{t} AS MATERIALIZED (
    SELECT sqrt(CAST(sum(w * w) AS DOUBLE)) AS n FROM {pfx}w{t}
),
{pfx}v{t} AS MATERIALIZED (
    SELECT i AS j,
           CAST(CASE WHEN n > 0
                     THEN round(CAST(w AS DOUBLE) / n, 6)
                     ELSE 0.0 END AS DECIMAL(12,6)) AS x
    FROM {pfx}w{t}, {pfx}n{t}
)"""
        )
    return "".join(parts)


def _rayleigh_ctes(src: str, vname: str, pfx: str) -> str:
    return f""",
{pfx}wf AS MATERIALIZED (
    SELECT s.i,
           CAST(round(sum(s.g * v.x), 6) AS DECIMAL(18,6)) AS w
    FROM {src} s JOIN {vname} v ON v.j = s.j
    GROUP BY 1
),
{pfx}lam AS MATERIALIZED (
    SELECT round(sqrt(CAST(sum(w * w) AS DOUBLE)), 6) AS eigval
    FROM {pfx}wf
)"""


_SYM_GRAM_CTES = f"""{_GRAM_TERMS_CTES},
gram0 AS MATERIALIZED (
    SELECT CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j,
           CAST(round(CAST(sum(t) AS DOUBLE), 6)
                AS DECIMAL(18,6)) AS g
    FROM terms GROUP BY 1, 2
),
sym AS MATERIALIZED (
    SELECT i, j, g FROM gram0
    UNION ALL
    SELECT j AS i, i AS j, g FROM gram0 WHERE i <> j
)"""


def _top_eigvec_sql() -> str:
    return (
        f"WITH {_SYM_GRAM_CTES}"
        + _power_chain_ctes("sym", "a")
        + _rayleigh_ctes("sym", f"av{POWER_ITERS}", "a")
        + f"""
SELECT v.j AS i, CAST(v.x AS DOUBLE) AS v, alam.eigval
FROM av{POWER_ITERS} v, alam
ORDER BY i
"""
    )


def q_embedding_pca2(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """2-D PCA map of the embedding table (operators/similarity.py
    pca2_projection): v1 by power iteration over the Gram table, v2
    on the Hotelling-deflated matrix, every embedding dotted against
    the broadcast components — iteration is dim²-row metadata, the
    projection is the one corpus-sized pass."""
    from bigdata_elephant_spark.operators.similarity import (
        pca2_projection,
    )
    from bigdata_elephant_spark.plans.llm_queries import EMBED_DIM

    gram = q_embedding_gram_matrix(spark, sf_dir)
    return pca2_projection(
        gram, _emb(spark, sf_dir), dim=EMBED_DIM, iters=POWER_ITERS
    )


def q_pca_variance_explained(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """How much of the embedding table's total variance the top
    principal direction carries: ``(eigval, trace, var_explained)``
    — eigval/trace(G), the one-number check a curation pipeline
    reads before trusting a 1-D/2-D projection (a near-isotropic
    corpus projects badly; a collapsed one is a red flag for the
    encoder). Trace is the exact decimal sum of the Gram diagonal;
    like the eigvec query, the dim²-row iteration runs driver-side
    on the once-collected Gram (the kmeans-seed pattern) with the
    identical rounding discipline — one corpus scan total, zero
    metadata-sized Spark jobs."""
    from decimal import Decimal

    from bigdata_elephant_spark.operators.similarity import (
        _collect_sym,
        _eigval_py,
        _power_iterate_py,
        _round6_double,
    )
    from bigdata_elephant_spark.plans.llm_queries import EMBED_DIM

    gram = q_embedding_gram_matrix(spark, sf_dir)
    G = _collect_sym(gram, EMBED_DIM)
    x = _power_iterate_py(G, EMBED_DIM, POWER_ITERS)
    eig = _eigval_py(G, x)
    tr_scaled = sum(G[i][i] for i in range(EMBED_DIM))
    trace = _round6_double(float(Decimal(tr_scaled).scaleb(-6)))
    var = _round6_double(eig / trace) if trace > 0 else None
    return spark.createDataFrame(
        [(eig, trace, var)],
        "eigval double, trace double, var_explained double",
    )


def _pca_var_sql() -> str:
    t = POWER_ITERS
    return (
        f"WITH {_SYM_GRAM_CTES}"
        + _power_chain_ctes("sym", "a")
        + _rayleigh_ctes("sym", f"av{t}", "a")
        + """,
tr AS (
    SELECT round(CAST(sum(g) AS DOUBLE), 6) AS trace
    FROM gram0 WHERE i = j
)
SELECT alam.eigval, tr.trace,
       CASE WHEN tr.trace > 0
            THEN round(alam.eigval / tr.trace, 6)
       END AS var_explained
FROM alam, tr
"""
    )


def _pca2_sql() -> str:
    t = POWER_ITERS
    return (
        f"WITH {_SYM_GRAM_CTES}"
        + _power_chain_ctes("sym", "a")
        + _rayleigh_ctes("sym", f"av{t}", "a")
        + f""",
sym2 AS MATERIALIZED (
    SELECT s.i, s.j,
           CAST(round(CAST(s.g AS DOUBLE)
                      - round(l.eigval * CAST(vi.x AS DOUBLE)
                              * CAST(vj.x AS DOUBLE), 6), 6)
                AS DECIMAL(18,6)) AS g
    FROM sym s
    JOIN av{t} vi ON vi.j = s.i
    JOIN av{t} vj ON vj.j = s.j, alam l
)"""
        + _power_chain_ctes("sym2", "b")
        + f""",
elems AS MATERIALIZED (
    SELECT vec_id, t.dim - 1 AS d,
           CAST(round(CAST(embedding[t.dim] AS DOUBLE), 7)
                AS DECIMAL(20,7)) AS xd
    FROM embeddings,
         unnest(range(1, len(embedding) + 1)) AS t(dim)
    WHERE len(embedding) > 0
)
SELECT e.vec_id,
       round(CAST(sum(e.xd * c1.x) AS DOUBLE), 6) AS pc1,
       round(CAST(sum(e.xd * c2.x) AS DOUBLE), 6) AS pc2
FROM elems e
JOIN av{t} c1 ON c1.j = e.d
JOIN bv{t} c2 ON c2.j = e.d
GROUP BY 1
ORDER BY vec_id
"""
    )


# ------------------------------ DSIR importance resampling

DSIR_M = curation.DSIR_BUCKETS
DSIR_SELECT_N = 100
DSIR_SAMPLE_N = 50
DSIR_TARGET_LANG = "en"


def _dsir_target(docs: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    return docs.filter(F.col("lang") == DSIR_TARGET_LANG).select(
        "doc_id"
    )


def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al. 2023) deterministic top-n selection: the
    documents whose hashed-ngram profile best matches the English
    subset. Extends the reference surface (the reference pipeline
    stops at the TF index, ``Indexer.java:151-165``)."""
    docs = _docs(spark, sf_dir)
    return curation.dsir_select(
        docs, _dsir_target(docs), n=DSIR_SELECT_N, m=DSIR_M
    )


def q_dsir_gumbel_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DSIR importance *resampling* (Gumbel-top-k, derandomized with
    the repo's md5 uniforms) — reproducible sampling ∝ exp(logw)."""
    docs = _docs(spark, sf_dir)
    return curation.dsir_gumbel_sample(
        docs, _dsir_target(docs), n=DSIR_SAMPLE_N, m=DSIR_M
    )


_DSIR_SCORES_CTES = f"""{DOC_TOKS_CTE},
doc_grams AS (
    SELECT doc_id, g FROM (
        SELECT doc_id, unnest(toks) AS g FROM doc_toks
        UNION ALL
        SELECT doc_id,
               unnest(list_transform(
                   range(1, greatest(len(toks) - 1, 0) + 1),
                   i -> toks[i] || ' ' || toks[i + 1])) AS g
        FROM doc_toks
    )
),
doc_b AS (
    SELECT doc_id, ({h32_sql_duckdb('g')} % {DSIR_M}) AS b,
           count(*) AS c
    FROM doc_grams GROUP BY 1, 2
),
dist AS (
    SELECT b,
           CAST(sum(c) AS BIGINT) AS qc,
           CAST(coalesce(
               sum(CASE WHEN d.lang = '{DSIR_TARGET_LANG}'
                   THEN c END), 0) AS BIGINT) AS pc
    FROM doc_b JOIN documents d USING (doc_id)
    GROUP BY 1
),
tot AS (
    SELECT CAST(sum(qc) AS BIGINT) AS qt,
           CAST(sum(pc) AS BIGINT) AS pt
    FROM dist
),
lam AS (
    -- four ln calls in the exact left-associated order of the Spark
    -- expression (dsir_bucket_logratios); rounded+decimal so the
    -- per-doc sum is exact on both engines
    SELECT b,
           CAST(round(ln(pc + 1) - ln(pt + {DSIR_M})
                      - ln(qc + 1) + ln(qt + {DSIR_M}),
                      6) AS DECIMAL(18,6)) AS lam
    FROM dist, tot
),
scores AS (
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_grams,
           round(CAST(sum(c * lam) AS DOUBLE), 6) AS logw
    FROM doc_b JOIN lam USING (b)
    GROUP BY 1
)"""

def q_dsir_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Admission scoring for an incoming batch against a FROZEN λ
    fit on the indexed corpus (full bucket domain, so unseen buckets
    carry the smoothed ``ln((qt+m)/(pt+m))`` mass instead of being
    dropped). Same delta convention as the incremental dedup/vocab
    queries: two sources play the daily batch, the rest the corpus;
    the corpus text is never re-read per batch beyond the one-time
    fit."""
    from pyspark.sql import functions as F

    from bigdata_elephant_spark.plans.llm_queries import (
        INCR_NEW_SOURCES,
    )

    docs = _docs(spark, sf_dir)
    is_new = F.col("source").isin(*INCR_NEW_SOURCES)
    base = docs.filter(~is_new)
    lam = curation.dsir_bucket_logratios(
        curation.dsir_doc_buckets(base, DSIR_M),
        _dsir_target(base),
        DSIR_M,
        full_domain=True,
    )
    return curation.dsir_score_against(
        docs.filter(is_new), lam, DSIR_M
    ).orderBy("doc_id")


def _dsir_artifact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized ``(doc_id, b, c)`` hashed-ngram histogram parquet
    for ``sf_dir`` — the DSIR member of the repo's ``*_indexed``
    artifact family (pipeline_queries._index_artifacts pattern:
    built once per corpus into a code-stamped temp dir, mtime-touched
    on warm resolves, week-sweep-cleaned on cold builds). At 100 TB
    the histogram build is the one expensive raw-text token pass;
    every later selection / λ refit / admission scoring reads only
    this compacted table (≤ m rows per doc), so no DSIR pass ever
    re-tokenizes the corpus. The code stamp covers every module that
    shapes the histogram bytes: the feature map (curation), the
    tokenizer/shingler (dedup, text) and the bucket hash (hashing)."""
    import os

    from bigdata_elephant_spark.functions import hashing as _hash_mod
    from bigdata_elephant_spark.functions import text as _text_mod
    from bigdata_elephant_spark.operators import curation as _cur_mod
    from bigdata_elephant_spark.operators import dedup as _dedup_mod
    from bigdata_elephant_spark.plans.pipeline_queries import (
        _ARTIFACT_CACHE_EVENTS,
        _artifact_base,
        _touch_or_sweep,
    )

    base = _artifact_base(
        sf_dir,
        modules=(_cur_mod, _dedup_mod, _text_mod, _hash_mod),
        kind="dsir",
    )
    path = os.path.join(base, "doc_buckets")
    cold = not os.path.exists(os.path.join(path, "_SUCCESS"))
    _touch_or_sweep(base, cold)
    if cold:
        curation.dsir_doc_buckets(
            _docs(spark, sf_dir), DSIR_M
        ).write.mode("overwrite").parquet(path)
    _ARTIFACT_CACHE_EVENTS.append(
        {"sf_dir": sf_dir, "cold": cold, "kind": "dsir"}
    )
    return spark.read.parquet(path)


def q_dsir_select_indexed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``dsir_select`` over the MATERIALIZED histogram artifact —
    the production 100 TB shape: λ fit + per-doc weighting + top-n
    all read the compacted ``(doc_id, b, c)`` parquet; raw text is
    tokenized exactly once (at artifact build). The target
    membership comes from the corpus's METADATA columns only
    (``doc_id``/``lang`` — column-pruned scan, no text read). Shares
    ``dsir_select``'s oracle: scoring is a pure function of the
    histogram, so inline and indexed twins are value-identical."""
    docs = _docs(spark, sf_dir)
    return curation.dsir_select_from_buckets(
        _dsir_artifact(spark, sf_dir),
        _dsir_target(docs),
        n=DSIR_SELECT_N,
        m=DSIR_M,
    )


def _dsir_incremental_sql() -> str:
    from bigdata_elephant_spark.plans.llm_queries import (
        INCR_NEW_SOURCES,
    )

    new_in = ", ".join(f"'{s}'" for s in INCR_NEW_SOURCES)
    return f"""
WITH {DOC_TOKS_CTE},
doc_grams AS (
    SELECT doc_id, g FROM (
        SELECT doc_id, unnest(toks) AS g FROM doc_toks
        UNION ALL
        SELECT doc_id,
               unnest(list_transform(
                   range(1, greatest(len(toks) - 1, 0) + 1),
                   i -> toks[i] || ' ' || toks[i + 1])) AS g
        FROM doc_toks
    )
),
doc_b AS (
    SELECT doc_id, ({h32_sql_duckdb('g')} % {DSIR_M}) AS b,
           count(*) AS c
    FROM doc_grams GROUP BY 1, 2
),
base_b AS (
    SELECT db.* FROM doc_b db JOIN documents d USING (doc_id)
    WHERE d.source NOT IN ({new_in})
),
obs AS (
    SELECT b,
           CAST(sum(c) AS BIGINT) AS qc,
           CAST(coalesce(
               sum(CASE WHEN d.lang = '{DSIR_TARGET_LANG}'
                   THEN c END), 0) AS BIGINT) AS pc
    FROM base_b JOIN documents d USING (doc_id)
    GROUP BY 1
),
dist AS (
    SELECT i.b,
           coalesce(o.qc, 0) AS qc,
           coalesce(o.pc, 0) AS pc
    FROM (SELECT unnest(range(0, {DSIR_M})) AS b) i
    LEFT JOIN obs o USING (b)
),
tot AS (
    SELECT CAST(sum(qc) AS BIGINT) AS qt,
           CAST(sum(pc) AS BIGINT) AS pt
    FROM dist
),
lam AS (
    SELECT b,
           CAST(round(ln(pc + 1) - ln(pt + {DSIR_M})
                      - ln(qc + 1) + ln(qt + {DSIR_M}),
                      6) AS DECIMAL(18,6)) AS lam
    FROM dist, tot
)
SELECT db.doc_id,
       CAST(sum(db.c) AS BIGINT) AS n_grams,
       round(CAST(sum(db.c * l.lam) AS DOUBLE), 6) AS logw
FROM doc_b db
JOIN documents d USING (doc_id)
JOIN lam l USING (b)
WHERE d.source IN ({new_in})
GROUP BY 1
ORDER BY doc_id
"""


DSIR_SELECT_SQL = f"""
WITH {_DSIR_SCORES_CTES}
SELECT doc_id, n_grams, logw
FROM scores
ORDER BY logw DESC, doc_id
LIMIT {DSIR_SELECT_N}
"""

_DSIR_U = (
    "("
    + h32_sql_duckdb("(CAST(doc_id AS VARCHAR) || ':dsir')")
    + " + 1) / 4294967297.0"
)

DSIR_GUMBEL_SQL = f"""
WITH {_DSIR_SCORES_CTES}
SELECT doc_id, logw,
       round(logw - ln(-ln({_DSIR_U})), 6) AS gkey
FROM scores
ORDER BY gkey DESC, doc_id
LIMIT {DSIR_SAMPLE_N}
"""


def q_documents_quarantine(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Ingest-gate audit for the document contract
    (operators/curation.py document_validity) — the text-side twin of
    embeddings_quarantine: downstream text operators assume non-null,
    non-blank, well-decoded text whose n_chars metadata matches the
    payload. The test corpus is clean by construction, so the query
    plants every broken class deterministically (doc_id residues,
    first match wins) and reports per-class quarantine counts; the
    driver gate proves both engines classify identically. Pure column
    expressions — the zero-shuffle dead-letter split the pipeline
    runs at ingest."""
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir)
    did = F.col("doc_id")
    txt_inj = (
        F.when(did % 97 == 0, F.lit(None).cast("string"))
        .when(did % 101 == 1, F.lit("   "))
        .when(did % 103 == 2, F.concat(F.col("text"), F.lit("�")))
        .otherwise(F.col("text"))
    )
    nch_inj = (
        F.when(did % 89 == 3, F.col("n_chars") + 7)
        .otherwise(F.col("n_chars"))
    )
    injected = docs.select(
        "doc_id",
        txt_inj.alias("text"),
        "lang",
        "source",
        nch_inj.alias("n_chars"),
    )
    classified = curation.document_validity(injected)
    return (
        classified.groupBy("validity")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("validity")
    )


DOCUMENTS_QUARANTINE_SQL = r"""
WITH injected AS (
    SELECT doc_id,
        CASE
            WHEN doc_id % 97 = 0 THEN NULL
            WHEN doc_id % 101 = 1 THEN '   '
            WHEN doc_id % 103 = 2 THEN text || chr(65533)
            ELSE text
        END AS text,
        CASE
            WHEN doc_id % 89 = 3 THEN n_chars + 7
            ELSE n_chars
        END AS n_chars
    FROM documents
),
classified AS (
    SELECT doc_id,
        CASE
            WHEN text IS NULL THEN 'null_text'
            WHEN regexp_matches(text, '^[ \t\n\r\f\x0B]*$')
                THEN 'blank'
            WHEN contains(text, chr(65533)) THEN 'mojibake'
            WHEN n_chars IS DISTINCT FROM length(text)
                THEN 'length_mismatch'
            ELSE 'ok'
        END AS validity
    FROM injected
)
SELECT validity, count(*) AS n_docs,
       min(doc_id) AS min_id, max(doc_id) AS max_id
FROM classified
GROUP BY validity
ORDER BY validity
"""


SPECS = [
    QuerySpec(
        "surprisal_band_sample",
        q_surprisal_band_sample,
        SURPRISAL_BAND_SQL,
        tags=("curation", "text"),
    ),
    QuerySpec(
        "documents_quarantine",
        q_documents_quarantine,
        DOCUMENTS_QUARANTINE_SQL,
        tags=("curation", "text", "llm"),
    ),
    QuerySpec(
        "source_overlap_matrix",
        q_source_overlap_matrix,
        SOURCE_OVERLAP_SQL,
        tags=("curation", "dedup"),
        bench=True,
    ),
    QuerySpec(
        "token_budget_selection",
        q_token_budget_selection,
        TOKEN_BUDGET_SQL,
        tags=("curation",),
    ),
    QuerySpec(
        "embedding_outliers",
        q_embedding_outliers,
        EMBEDDING_OUTLIERS_SQL,
        tags=("curation", "similarity"),
        bench=True,
    ),
    QuerySpec(
        "embedding_gram_matrix",
        q_embedding_gram_matrix,
        EMBEDDING_GRAM_SQL,
        tags=("similarity", "agg"),
        bench=True,
    ),
    QuerySpec(
        "embedding_top_eigvec",
        q_embedding_top_eigvec,
        _top_eigvec_sql,
        tags=("similarity", "iterative", "agg"),
    ),
    QuerySpec(
        "embedding_pca2",
        q_embedding_pca2,
        _pca2_sql,
        tags=("similarity", "iterative"),
    ),
    QuerySpec(
        "gram_incremental",
        q_gram_incremental,
        EMBEDDING_GRAM_SQL,
        tags=("similarity", "agg", "merge", "incremental"),
    ),
    QuerySpec(
        "pca_variance_explained",
        q_pca_variance_explained,
        _pca_var_sql,
        tags=("similarity", "report"),
    ),
    QuerySpec(
        "dsir_select",
        q_dsir_select,
        DSIR_SELECT_SQL,
        tags=("curation", "llm"),
        bench=True,
    ),
    QuerySpec(
        "dsir_gumbel_sample",
        q_dsir_gumbel_sample,
        DSIR_GUMBEL_SQL,
        tags=("curation", "llm"),
    ),
    QuerySpec(
        "dsir_incremental",
        q_dsir_incremental,
        _dsir_incremental_sql,
        tags=("curation", "llm"),
    ),
    QuerySpec(
        "dsir_select_indexed",
        q_dsir_select_indexed,
        DSIR_SELECT_SQL,
        tags=("curation", "llm", "indexed"),
        bench=True,
    ),
]
