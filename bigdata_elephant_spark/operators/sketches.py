"""Mergeable distinct-count sketches — the 100 TB substitute for
exact ``count_distinct``.

Exact distinct shuffles every distinct value; a sketch shuffles a
CONSTANT-size register state per group, merges associatively (so
map-side partial aggregation applies), and answers within a known
error. Spark ships HLL++ (``approx_count_distinct``) — use that in
production. These implementations exist because the registry's
correctness gate replays every query in DuckDB: the sketch state is
built from the engine-portable :func:`~bigdata_elephant_spark.
functions.hashing.h32` hash (md5 prefix), so Spark and the oracle
compute **bit-identical** registers and estimates, which an
engine-internal HLL can never do. Same algorithms, deterministic
replay.

Two sketches:

- **KMV (k minimum values)**: keep the k smallest distinct 32-bit
  hashes; if fewer than k exist the sketch is exact, else
  ``est = (k-1) * 2^32 / h_(k)``. Merge = union + re-take k smallest.
- **HLL (m=64 registers)**: bucket = low 6 hash bits, register =
  max over the bucket of ``1 + leading-zeros`` of the remaining 26
  bits (computed exactly via ``length(bin(x))`` — integer string
  length, no floating log). Merge = elementwise register max.

Float determinism: the harmonic mean is computed as an INTEGER sum
of ``2^(27 - register)`` (order-independent, exact in int64),
followed by one literal-constant division — no float reduction whose
summation order could differ between engines. The small-range
correction needs ``ln``, which differs between JVM and DuckDB libm
at ~5e-9 relative — so ``64 * ln(64/zeros)`` is pre-computed in
Python for every possible ``zeros`` value and emitted as a CASE over
decimal literals that both engines parse to the same double.

Reference parity note: the reference engine has no sketches (its
distinct counting is the exact Vocabulary job, `Vocabulary.java:
58-109`); this module is part of the north-star scale surface.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bigdata_elephant_spark.functions.hashing import h32, h32_sql_duckdb

TWO32 = 4_294_967_296  # hash domain size
HLL_M = 64             # registers (b = 6 bucket bits, 26 rank bits)
HLL_MAX_RANK = 27      # rem == 0 -> all 26 bits zero -> rank 27
_POW2_27 = 134_217_728
# alpha_64 * m^2 * 2^27 as one exact-decimal literal: the whole
# numerator of the raw estimate is a single constant, so the only
# float op that depends on data is one division.
HLL_ALPHA_64 = 0.709
_HLL_NUM = repr(HLL_ALPHA_64 * HLL_M * HLL_M * _POW2_27)


def kmv_state(
    df: DataFrame, key: Column | str, group: str, k: int
) -> DataFrame:
    """Per-``group`` KMV state: ``(group, hk, n_in)`` where ``hk`` is
    the largest of the <= k smallest distinct hashes and ``n_in`` how
    many were kept.

    One shuffle (distinct on (group, h)) + one group-keyed window.
    At 100 TB, pre-filter ``h < k * c * 2^32 / n_lower_bound`` before
    the distinct to keep per-group state near k rows instead of
    shuffling every distinct hash; the estimate is unchanged whenever
    the true k-th minimum survives the filter.
    """
    c = F.col(key) if isinstance(key, str) else key
    hashes = df.select(
        F.col(group), h32(c.cast("string")).alias("h")
    ).distinct()
    w = Window.partitionBy(group).orderBy("h")
    return (
        hashes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy(group)
        .agg(F.max("h").alias("hk"), F.count("*").alias("n_in"))
    )


def kmv_estimate(state: DataFrame, k: int) -> DataFrame:
    """``(group, est_distinct)`` from a KMV state — exact when the
    group held fewer than k distinct hashes."""
    numk = repr(float((k - 1) * TWO32))
    return state.select(
        state.columns[0],
        F.when(F.col("n_in") < k, F.col("n_in").cast("double"))
        .otherwise(F.round(F.lit(float(numk)) / F.col("hk"), 6))
        .alias("est_distinct"),
    )


def kmv_sql_duckdb(key_expr: str, group: str, table: str, k: int) -> str:
    """DuckDB CTE text replaying :func:`kmv_state`+:func:`kmv_estimate`."""
    h = h32_sql_duckdb(f"CAST({key_expr} AS VARCHAR)")
    numk = repr(float((k - 1) * TWO32))
    return f"""
kmv_h AS (
    SELECT DISTINCT {group}, {h} AS h FROM {table}
),
kmv_top AS (
    SELECT {group}, h,
           row_number() OVER (PARTITION BY {group} ORDER BY h) AS rn
    FROM kmv_h
),
kmv_state AS (
    SELECT {group}, max(h) AS hk, count(*) AS n_in
    FROM kmv_top WHERE rn <= {k} GROUP BY {group}
),
kmv_est AS (
    SELECT {group},
           CASE WHEN n_in < {k} THEN CAST(n_in AS DOUBLE)
                ELSE round({numk} / hk, 6) END AS est_distinct
    FROM kmv_state
)"""


def hll_rank() -> Column:
    """Register rank of hash column ``h``: 1 + leading zeros of the
    26 bits above the bucket bits — exact integer math via the
    length of the minimal binary string (both engines agree on
    ``bin``)."""
    rem = F.expr(f"shiftright(h, 6)")  # 26-bit remainder
    return (
        F.when(rem == 0, F.lit(HLL_MAX_RANK))
        .otherwise(F.lit(HLL_MAX_RANK) - F.length(F.expr("bin(shiftright(h, 6))")))
        .alias("r")
    )


def hll_registers(
    df: DataFrame, key: Column | str, group: str
) -> DataFrame:
    """``(group, bucket, r)`` register table — one map-side-combined
    shuffle keyed on (group, bucket); at most m rows per group
    survive, whatever the input size."""
    c = F.col(key) if isinstance(key, str) else key
    return (
        df.select(F.col(group), h32(c.cast("string")).alias("h"))
        .withColumn("bucket", F.expr(f"h & {HLL_M - 1}"))
        .withColumn("r", hll_rank())
        .groupBy(group, "bucket")
        .agg(F.max("r").alias("r"))
    )


def _correction_case_sql() -> str:
    """``64 * ln(64/zeros)`` for every possible zeros in [1, 64],
    pre-evaluated to literals so no engine ever runs ``ln``."""
    arms = " ".join(
        f"WHEN {z} THEN {HLL_M * math.log(HLL_M / z)!r}"
        for z in range(1, HLL_M + 1)
    )
    return f"CASE zeros {arms} END"


def hll_estimate(registers: DataFrame, group: str) -> DataFrame:
    """``(group, est_distinct, zeros)`` from a register table.

    Harmonic-mean denominator as an exact int64 sum (absent buckets
    contribute 2^27 apiece); raw estimate = one constant/int
    division; linear-counting correction below 2.5*m via the literal
    table. Every float op is order-independent, so the oracle replay
    is bit-identical.
    """
    agg = registers.groupBy(group).agg(
        F.sum(
            F.expr(f"cast(pow(2, {HLL_MAX_RANK} - r) as bigint)")
        ).alias("isum_present"),
        F.count("*").alias("n_present"),
    )
    return (
        agg.withColumn("zeros", F.lit(HLL_M) - F.col("n_present"))
        .withColumn(
            "isum",
            F.col("isum_present") + F.col("zeros") * F.lit(_POW2_27),
        )
        .withColumn("raw", F.lit(float(_HLL_NUM)) / F.col("isum"))
        .select(
            group,
            F.round(
                F.when(
                    (F.col("raw") <= 2.5 * HLL_M) & (F.col("zeros") > 0),
                    F.expr(_correction_case_sql()),
                ).otherwise(F.col("raw")),
                6,
            ).alias("est_distinct"),
            F.col("zeros").cast("long").alias("zeros"),
        )
    )


def hll_sql_duckdb(key_expr: str, group: str, table: str) -> str:
    """DuckDB CTE text replaying registers+estimate, including an
    ``hll_regs`` CTE that downstream SQL can re-aggregate to prove
    mergeability (elementwise max)."""
    h = h32_sql_duckdb(f"CAST({key_expr} AS VARCHAR)")
    return f"""
hll_h AS (
    SELECT {group}, {h} AS h FROM {table}
),
hll_regs AS (
    SELECT {group}, h & {HLL_M - 1} AS bucket,
           max(CASE WHEN h >> 6 = 0 THEN {HLL_MAX_RANK}
                    ELSE {HLL_MAX_RANK} - length(bin(h >> 6)) END) AS r
    FROM hll_h GROUP BY 1, 2
)"""


def hll_estimate_sql_duckdb(regs_cte: str, group: str) -> str:
    """Estimate SQL over a ``(group, bucket, r)`` CTE."""
    case = _correction_case_sql()
    return f"""
SELECT {group},
       round(CASE WHEN raw <= {2.5 * HLL_M!r} AND zeros > 0
                  THEN {case}
                  ELSE raw END, 6) AS est_distinct,
       CAST(zeros AS BIGINT) AS zeros
FROM (
    SELECT {group}, zeros,
           {_HLL_NUM} / (isum_present + zeros * {_POW2_27}) AS raw
    FROM (
        SELECT {group},
               sum(CAST(pow(2, {HLL_MAX_RANK} - r) AS BIGINT)) AS isum_present,
               {HLL_M} - count(*) AS zeros
        FROM {regs_cte} GROUP BY {group}
    )
)"""


# ------------------------------------------------ count-min sketch

CMS_DEPTH = 4    # independent hash rows
CMS_WIDTH = 256  # counters per row


def cms_counts(
    df: DataFrame, key: Column | str, group: str | None = None
) -> DataFrame:
    """Count-min sketch state: ``(d, col, cnt)`` (plus ``group`` when
    given) — depth x width counters, each key hashed once per depth
    row with a depth-salted :func:`h32`.

    The frequency analogue of the HLL/KMV distinct sketches: exact
    per-key counting shuffles every key; the sketch shuffles into a
    CONSTANT ``CMS_DEPTH * CMS_WIDTH`` cells per group, counts merge
    by cell-wise addition (map-side combine applies, per-source
    sketches sum to the global sketch), and point estimates
    overcount only (min over depth rows bounds collision noise at
    ~e*n/width with probability 1 - e^-depth).
    """
    c = F.col(key) if isinstance(key, str) else key
    depths = F.explode(
        F.array(*[F.lit(d) for d in range(CMS_DEPTH)])
    ).alias("d")
    cols = ([F.col(group)] if group else []) + [
        c.cast("string").alias("_k")
    ]
    exploded = df.select(*cols, depths)
    cell = F.pmod(
        h32(F.concat(F.col("d").cast("string"), F.lit(":"), F.col("_k"))),
        F.lit(CMS_WIDTH),
    ).alias("col")
    keys = ([group] if group else []) + ["d", "col"]
    return exploded.select(*([group] if group else []), "d", cell).groupBy(
        *keys
    ).agg(F.count("*").alias("cnt"))


def cms_point_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str
) -> DataFrame:
    """``(key, est)`` for each row of ``keys``: min over the depth
    rows of the key's counter. ``keys`` is metadata-sized (the keys
    you are asking about), so the ``CMS_DEPTH``-fold expansion and
    the join against the constant-size sketch are both broadcast
    territory."""
    probes = keys.select(F.col(key_col)).distinct().select(
        key_col,
        F.explode(F.array(*[F.lit(d) for d in range(CMS_DEPTH)])).alias(
            "d"
        ),
    ).select(
        key_col,
        "d",
        F.pmod(
            h32(
                F.concat(
                    F.col("d").cast("string"),
                    F.lit(":"),
                    F.col(key_col).cast("string"),
                )
            ),
            F.lit(CMS_WIDTH),
        ).alias("col"),
    )
    # LEFT join + coalesce(0): a probed key hashing to an EMPTY cell
    # must contribute 0 to the min (the CMS answer for an absent key
    # is 0), not be dropped from the join — an inner join would both
    # lose all-empty keys from the output and inflate the min for
    # keys with some empty cells (cf. bloom_probe below).
    return (
        probes.join(F.broadcast(sketch), ["d", "col"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce("cnt", F.lit(0))).alias("est")
        )
    )


def cms_sql_duckdb(key_expr: str, table: str) -> str:
    """DuckDB CTE text computing the same ``(d, col, cnt)`` sketch."""
    from bigdata_elephant_spark.functions.hashing import h32_sql_duckdb

    h = h32_sql_duckdb(
        f"(CAST(dd.d AS VARCHAR) || ':' || CAST({key_expr} AS VARCHAR))"
    )
    return f"""
    SELECT dd.d, {h} % {CMS_WIDTH} AS col, count(*) AS cnt
    FROM {table}, (SELECT unnest(range(0, {CMS_DEPTH})) AS d) dd
    GROUP BY 1, 2
"""


# ----------------------------------------------------------------
# Bottom-k sample quantiles
# ----------------------------------------------------------------

QSK_K = 1024  # sample size: DKW sup-error ~ sqrt(ln(2/d)/2k) ~ 0.08


def bottomk_sample(
    df: DataFrame,
    key: Column | str,
    value: Column | str,
    k: int = QSK_K,
) -> DataFrame:
    """The sketch state: the k rows ``(h, x)`` with the smallest
    ``h32(key)``. Mergeable — ``bottomk(A ∪ B)`` equals re-taking the
    k smallest of ``bottomk(A) ∪ bottomk(B)`` (tested) — so shards/
    days can keep their own samples and combine on read."""
    kc = F.col(key) if isinstance(key, str) else key
    vc = F.col(value) if isinstance(value, str) else value
    return (
        df.select(h32(kc.cast("string")).alias("h"), vc.alias("x"))
        .orderBy("h", "x")
        .limit(k)
    )


def bottomk_quantiles(
    df: DataFrame,
    key: Column | str,
    value: Column | str,
    quantiles: tuple[float, ...],
    k: int = QSK_K,
) -> DataFrame:
    """Quantile estimates from a bottom-k hash sample →
    ``(q, est)`` per requested quantile.

    The sketch is the k rows with the smallest ``h32(key)``: a
    deterministic uniform sample without replacement (hash order is
    independent of the value), mergeable exactly like KMV (union,
    re-take k smallest), and engine-replayable — the oracle draws
    the *same* k rows. The quantile-q estimate is the order
    statistic at ``ceil(q·|sample|)`` of the sampled values; by DKW,
    rank error ≤ ~``sqrt(ln(2/δ)/2k)`` with prob 1−δ (k=1024 →
    ~0.08 at δ=1e-6; tests assert an empirical bound).

    Scale shape: the bottom-k is ``TakeOrderedAndProject`` —
    per-partition heaps of k rows, no global sort, no full shuffle;
    everything after runs on k rows. Production: Spark's
    ``approx_percentile`` (GK sketch) answers the same question
    engine-internally; this portable variant exists for the
    cross-engine gate and for merge-across-days pipelines that
    persist the sample.
    """
    sample = bottomk_sample(df, key, value, k)
    cnt = sample.agg(F.count("*").alias("n"))
    w = Window.orderBy("x", "h")  # k rows: single partition is fine
    ranked = (
        sample.withColumn("rn", F.row_number().over(w))
        .crossJoin(F.broadcast(cnt))
    )
    spark = df.sparkSession
    qdf = spark.createDataFrame([(q,) for q in quantiles], "q double")
    return (
        ranked.join(
            F.broadcast(qdf),
            F.col("rn") >= F.ceil(F.col("q") * F.col("n")),
        )
        .groupBy("q")
        .agg(F.min("x").alias("est"))
    )


def bottomk_quantiles_sql_duckdb(
    key_expr: str,
    value_expr: str,
    table: str,
    quantiles: tuple[float, ...],
    k: int = QSK_K,
) -> str:
    """DuckDB replay of :func:`bottomk_quantiles` (full query)."""
    h = h32_sql_duckdb(f"CAST({key_expr} AS VARCHAR)")
    vals = ", ".join(f"({q!r})" for q in quantiles)
    return f"""
WITH samp AS (
    SELECT {h} AS h, {value_expr} AS x
    FROM {table}
    ORDER BY h, x LIMIT {k}
),
cnt AS (SELECT count(*) AS n FROM samp),
ranked AS (
    SELECT x, row_number() OVER (ORDER BY x, h) AS rn FROM samp
),
qs AS (SELECT * FROM (VALUES {vals}) t(q))
SELECT q, min(x) AS est
FROM ranked CROSS JOIN cnt
JOIN qs ON rn >= ceil(q * n)
GROUP BY q ORDER BY q
"""


# ----------------------------------------------------------------
# Bloom filter membership
# ----------------------------------------------------------------

BLOOM_M = 65_536  # bits
BLOOM_J = 4       # hash functions

# FP rate = (1 - exp(-nJ/M))^J: ~2.4% at n=8k members. Production
# note: Spark injects its own runtime bloom pruning into selective
# joins (spark.sql.optimizer.runtime.bloomFilter.enabled) — this
# explicit variant exists for cross-engine replay and for shipping
# the filter OUT of the engine (e.g. to an ingest service).


def _bloom_pos(key: Column, j: int, m: int) -> Column:
    """Position of hash function ``j`` for ``key`` — independent
    hashes via the salted md5 ``h32(j || '|' || key)``."""
    return F.pmod(
        h32(F.concat(F.lit(f"{j}|"), key.cast("string"))), F.lit(m)
    )


def bloom_bits(
    df: DataFrame,
    key: Column | str,
    m: int = BLOOM_M,
    j: int = BLOOM_J,
) -> DataFrame:
    """Build side: the set of set bit positions ``(p)`` — at most
    ``m`` rows however large the build input (broadcastable by
    construction). Merge across shards/days = UNION DISTINCT."""
    kc = F.col(key) if isinstance(key, str) else key
    keys = df.select(kc.alias("k")).distinct()
    pos = keys.select(
        F.explode(
            F.array(*[_bloom_pos(F.col("k"), i, m) for i in range(j)])
        ).alias("p")
    )
    return pos.distinct()


def bloom_probe(
    probe: DataFrame,
    key: Column | str,
    bits: DataFrame,
    m: int = BLOOM_M,
    j: int = BLOOM_J,
) -> DataFrame:
    """Probe side: ``(k, bloom_hit)`` — hit iff all ``j`` positions
    are set. The bits table broadcasts; the probe never shuffles."""
    kc = F.col(key) if isinstance(key, str) else key
    ppos = probe.select(kc.alias("k")).distinct().select(
        "k",
        F.explode(
            F.array(*[_bloom_pos(F.col("k"), i, m) for i in range(j)])
        ).alias("p"),
    )
    hits = (
        ppos.join(F.broadcast(bits), "p")
        .groupBy("k")
        .agg(F.count("*").alias("nhit"))
    )
    return (
        ppos.select("k")
        .distinct()
        .join(hits, "k", "left")
        .select(
            "k",
            (F.coalesce(F.col("nhit"), F.lit(0)) == j).alias(
                "bloom_hit"
            ),
        )
    )


def bloom_pos_sql_duckdb(key_expr: str, m: int = BLOOM_M) -> str:
    """DuckDB position expression for salted hash ``jt.j``."""
    return (
        h32_sql_duckdb(
            f"CAST(jt.j AS VARCHAR) || '|' || CAST({key_expr} AS VARCHAR)"
        )
        + f" % {m}"
    )


def kmv_pairwise_setops(
    df: DataFrame, key: str, group: str, k: int
) -> DataFrame:
    """Theta-sketch-style SET OPERATIONS between per-group KMV
    sketches → one row per group pair ``(ta, tb)`` with the sketch
    union / Jaccard / intersection estimates next to the exact
    answers.

    The property being demonstrated: distinct-set algebra
    (union/intersection sizes between segments) from CONSTANT-SIZE
    states, without re-scanning raw data per pair. ``M`` = the k
    smallest of the merged sketches is itself a KMV sketch of
    ``A ∪ B``; the fraction of ``M`` present in both input sketches
    estimates Jaccard (Beyer et al., "On synopses for distinct-value
    estimation"), and ``|A∩B| ≈ J · |A∪B|``.

    Scale shape: one distinct over ``(group, h)`` + one group-keyed
    rank window build the sketches (same as :func:`kmv_state`);
    everything pairwise operates on ``#groups × k`` rows —
    metadata-sized however large the raw table is. Estimates are
    integer ratios and one rounded division, so the DuckDB oracle
    replays them bit-for-bit.
    """
    hashes = df.select(
        F.col(group), h32(F.col(key).cast("string")).alias("h")
    ).distinct()
    w = Window.partitionBy(group).orderBy("h")
    kept = (
        hashes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(group, "h")
    )
    types = kept.select(group).distinct()
    pairs = (
        types.select(F.col(group).alias("ta"))
        .crossJoin(types.select(F.col(group).alias("tb")))
        .filter(F.col("ta") < F.col("tb"))
    )
    mu = (
        pairs.join(
            kept,
            (F.col(group) == F.col("ta"))
            | (F.col(group) == F.col("tb")),
        )
        .select("ta", "tb", "h")
        .distinct()
    )
    w_pair = Window.partitionBy("ta", "tb").orderBy("h")
    m = mu.withColumn("rn", F.row_number().over(w_pair)).filter(
        F.col("rn") <= k
    )
    mk = m.groupBy("ta", "tb").agg(
        F.max("h").alias("hk"), F.count("*").alias("n_in")
    )
    ka = kept.select(
        F.col(group).alias("ta"), F.col("h").alias("h")
    )
    kb = kept.select(
        F.col(group).alias("tb"), F.col("h").alias("h")
    )
    inter = (
        m.join(ka, ["ta", "h"])
        .join(kb, ["tb", "h"])
        .groupBy("ta", "tb")
        .agg(F.count("*").alias("c"))
    )
    du = df.select(group, key).distinct()
    dc = du.groupBy(group).agg(F.count("*").alias("n"))
    xin = (
        du.alias("a")
        .join(du.alias("b"), key)
        .filter(F.col(f"a.{group}") < F.col(f"b.{group}"))
        .groupBy(
            F.col(f"a.{group}").alias("ta"),
            F.col(f"b.{group}").alias("tb"),
        )
        .agg(F.count("*").alias("x"))
    )
    numk = float((k - 1) * TWO32)
    est = (
        mk.join(inter, ["ta", "tb"], "left")
        .na.fill({"c": 0})
        .join(
            dc.select(F.col(group).alias("ta"), F.col("n").alias("na")),
            "ta",
        )
        .join(
            dc.select(F.col(group).alias("tb"), F.col("n").alias("nb")),
            "tb",
        )
        .join(xin, ["ta", "tb"], "left")
        .na.fill({"x": 0})
    )
    union_est = F.when(
        F.col("n_in") < k, F.col("n_in").cast("double")
    ).otherwise(F.round(F.lit(numk) / F.col("hk"), 6))
    jacc = F.round(F.col("c") / F.col("n_in"), 6)
    return est.select(
        "ta",
        "tb",
        F.col("n_in").cast("long").alias("n_in"),
        F.col("c").cast("long").alias("c"),
        union_est.alias("union_est"),
        jacc.alias("jacc"),
        F.round(jacc * union_est, 6).alias("inter_est"),
        (F.col("na") + F.col("nb") - F.col("x"))
        .cast("long")
        .alias("exact_union"),
        F.col("x").cast("long").alias("exact_inter"),
    )
