"""Sketch + data-layout queries: constant-state approximation and
write-side clustering, oracle-replayed bit-for-bit.

These are the operators that only START to matter at 100 TB:
- distinct-count sketches replace the exact-distinct shuffle with a
  mergeable constant-size state (`operators/sketches.py`);
- Z-order + zone maps replace "read everything" with "skip most
  files" (`operators/layout.py`);
- hash-keyed weighted reservoir sampling draws a size-k
  importance sample in one pass with no global sort
  (`operators/sampling.py::weighted_sample_keys`).

Every query emits only integers and floats produced by
order-independent op chains, so the DuckDB oracle matches exactly
(see the float-determinism notes in the operator modules — no
engine-side ``ln``/``log`` ever reaches an output column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_elephant_spark.operators.layout import (
    scale_to_bits,
    scale_to_bits_sql,
    zone_map,
    zvalue,
    zvalue_sql_duckdb,
)
from bigdata_elephant_spark.functions.hashing import h32, h32_sql_duckdb
from bigdata_elephant_spark.operators.sampling import weighted_sample_keys
from bigdata_elephant_spark.operators.sketches import (
    BLOOM_J,
    BLOOM_M,
    CMS_DEPTH,
    CMS_WIDTH,
    HLL_M,
    bloom_bits,
    bloom_pos_sql_duckdb,
    bloom_probe,
    bottomk_quantiles,
    bottomk_quantiles_sql_duckdb,
    cms_counts,
    cms_point_estimate,
    cms_sql_duckdb,
    hll_estimate,
    hll_estimate_sql_duckdb,
    hll_registers,
    hll_sql_duckdb,
    kmv_estimate,
    kmv_sql_duckdb,
    kmv_state,
)
from bigdata_elephant_spark.registry import QuerySpec
from bigdata_elephant_spark.sources.corpus import read_table

KMV_K = 32
SAMPLE_K = 100
ZTILES = 64


def _with_rel_err(joined: DataFrame) -> DataFrame:
    return joined.withColumn(
        "rel_err",
        F.round(
            F.abs(F.col("est_distinct") - F.col("n_exact"))
            / F.col("n_exact"),
            6,
        ),
    )


# -------------------------------------------------------------- KMV

def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type + merged-global ('ALL') KMV distinct-user
    estimates next to the exact counts. The 'ALL' row is computed by
    MERGING the per-group kept minima (union -> k smallest), not by
    re-scanning — the property that makes the sketch a two-phase
    aggregate at scale."""
    e = read_table(spark, sf_dir, "events")
    per_group = kmv_state(e, "user_id", "event_type", KMV_K)
    # Merge path: the k smallest of the union of per-group minima.
    hashes = e.select(
        "event_type", h32(F.col("user_id").cast("string")).alias("h")
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    kept = (
        hashes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
    )
    merged = (
        kept.select("h").distinct()
        .orderBy("h")
        .limit(KMV_K)
        .agg(F.max("h").alias("hk"), F.count("*").alias("n_in"))
        .withColumn("event_type", F.lit("ALL"))
        .select("event_type", "hk", "n_in")
    )
    states = per_group.unionByName(merged)
    ests = kmv_estimate(states, KMV_K)
    exact = (
        e.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n_exact"))
        .unionByName(
            e.agg(F.count_distinct("user_id").alias("n_exact"))
            .withColumn("event_type", F.lit("ALL"))
            .select("event_type", "n_exact")
        )
    )
    return _with_rel_err(ests.join(exact, "event_type")).orderBy(
        "event_type"
    )


KMV_DISTINCT_SQL = f"""
WITH {kmv_sql_duckdb("user_id", "event_type", "events", KMV_K).lstrip()},
kmv_merged AS (
    SELECT 'ALL' AS event_type, max(h) AS hk, count(*) AS n_in
    FROM (
        SELECT DISTINCT h FROM kmv_top WHERE rn <= {KMV_K}
        ORDER BY h LIMIT {KMV_K}
    )
),
states AS (
    SELECT * FROM kmv_state UNION ALL SELECT * FROM kmv_merged
),
ests AS (
    SELECT event_type,
           CASE WHEN n_in < {KMV_K} THEN CAST(n_in AS DOUBLE)
                ELSE round({(KMV_K - 1) * 4_294_967_296.0!r} / hk, 6)
           END AS est_distinct
    FROM states
),
exact AS (
    SELECT event_type, count(DISTINCT user_id) AS n_exact
    FROM events GROUP BY 1
    UNION ALL
    SELECT 'ALL', count(DISTINCT user_id) FROM events
)
SELECT event_type, est_distinct, CAST(n_exact AS BIGINT) AS n_exact,
       round(abs(est_distinct - n_exact) / n_exact, 6) AS rel_err
FROM ests JOIN exact USING (event_type)
ORDER BY event_type
"""


# -------------------------------------------------------------- HLL

def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type + merged-global HLL estimates. The 'ALL' row
    re-aggregates the per-group REGISTER tables (elementwise max) —
    sketch states merge, raw data is scanned once."""
    e = read_table(spark, sf_dir, "events")
    # r14 persisted regs (two consumers: per-type estimates + 'ALL'
    # merge) to make the sketch side one events scan; the r14 driver
    # record put it at 1.18x its pin and the r15 keep-or-revert A/B
    # read 1.139s (persisted) vs 0.879s (recomputed) warm min at
    # sf0.1 — the cache fill costs more than the saved scan at any
    # size where the register table's build is aggregation-bound, so
    # the persist is REVERTED per the r14 commitment. At 100 TB the
    # second scan is real but cheap relative to the cache-fill barrier
    # this inserted before both consumers.
    regs = hll_registers(e, "user_id", "event_type")
    merged = (
        regs.groupBy("bucket")
        .agg(F.max("r").alias("r"))
        .withColumn("event_type", F.lit("ALL"))
        .select("event_type", "bucket", "r")
    )
    ests = hll_estimate(regs.unionByName(merged), "event_type")
    exact = (
        e.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n_exact"))
        .unionByName(
            e.agg(F.count_distinct("user_id").alias("n_exact"))
            .withColumn("event_type", F.lit("ALL"))
            .select("event_type", "n_exact")
        )
    )
    return _with_rel_err(ests.join(exact, "event_type")).orderBy(
        "event_type"
    )


HLL_DISTINCT_SQL = f"""
WITH {hll_sql_duckdb("user_id", "event_type", "events").lstrip()},
hll_all AS (
    SELECT 'ALL' AS event_type, bucket, max(r) AS r
    FROM hll_regs GROUP BY 2
),
regs AS (
    SELECT * FROM hll_regs UNION ALL SELECT * FROM hll_all
),
ests AS ({hll_estimate_sql_duckdb("regs", "event_type")}
),
exact AS (
    SELECT event_type, count(DISTINCT user_id) AS n_exact
    FROM events GROUP BY 1
    UNION ALL
    SELECT 'ALL', count(DISTINCT user_id) FROM events
)
SELECT event_type, est_distinct, zeros,
       CAST(n_exact AS BIGINT) AS n_exact,
       round(abs(est_distinct - n_exact) / n_exact, 6) AS rel_err
FROM ests JOIN exact USING (event_type)
ORDER BY event_type
"""


CMS_TOP = 10


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch point estimates for the exact top-10 hottest
    user_ids: one constant-size (depth x width) counter table built
    in a single scan, probed for the heavy keys. ``est >= n_exact``
    always (CMS never undercounts); the oracle rebuilds the identical
    sketch from the depth-salted md5 hash, so estimates — collisions
    included — match bit-for-bit."""
    e = read_table(spark, sf_dir, "events")
    sketch = cms_counts(e, "user_id")
    top = (
        e.groupBy("user_id")
        .agg(F.count("*").alias("n_exact"))
        .orderBy(F.desc("n_exact"), F.asc("user_id"))
        .limit(CMS_TOP)
    )
    return (
        cms_point_estimate(sketch, top, "user_id")
        .join(top, "user_id")
        .select(
            "user_id",
            "n_exact",
            "est",
            (F.col("est") - F.col("n_exact")).alias("overcount"),
        )
        .orderBy("user_id")
    )


CMS_HEAVY_SQL = f"""
WITH sketch AS ({cms_sql_duckdb("e.user_id", "events e")}),
top AS (
    SELECT user_id, count(*) AS n_exact
    FROM events GROUP BY 1
    ORDER BY n_exact DESC, user_id
    LIMIT {CMS_TOP}
),
probes AS (
    SELECT t.user_id, t.n_exact, dd.d,
           {h32_sql_duckdb(
               "(CAST(dd.d AS VARCHAR) || ':' "
               "|| CAST(t.user_id AS VARCHAR))"
           )} % {CMS_WIDTH} AS col
    FROM top t, (SELECT unnest(range(0, {CMS_DEPTH})) AS d) dd
)
SELECT p.user_id, p.n_exact,
       min(coalesce(s.cnt, 0))              AS est,
       min(coalesce(s.cnt, 0)) - p.n_exact  AS overcount
FROM probes p LEFT JOIN sketch s ON s.d = p.d AND s.col = p.col
GROUP BY 1, 2
ORDER BY user_id
"""


# ---------------------------------------------------------- Z-order

def zorder_orders_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map table of orders laid out in Z-order over
    (o_custkey, price bucket): 64 model files, each with
    min/max of BOTH dimensions — the stats a 100 TB scan consults to
    skip files on either predicate. Both dims are min-max scaled to
    the same 16-bit grid first (the tiny min/max row is a broadcast)
    so neither dominates the interleave. Production write:
    ``repartitionByRange(n, z).sortWithinPartitions(z)``; ntile here
    gives the oracle a deterministic file assignment."""
    o = read_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        F.col("o_custkey").alias("ck"),
        F.floor(F.col("o_totalprice") / F.lit(10.0))
        .cast("long")
        .alias("pb"),
    )
    mm = base.agg(
        F.min("ck").alias("ck_min"), F.max("ck").alias("ck_max"),
        F.min("pb").alias("pb_min"), F.max("pb").alias("pb_max"),
    )
    zed = base.crossJoin(F.broadcast(mm)).select(
        "o_orderkey",
        scale_to_bits(
            F.col("ck"), F.col("ck_min"), F.col("ck_max")
        ).alias("x"),
        scale_to_bits(
            F.col("pb"), F.col("pb_min"), F.col("pb_max")
        ).alias("y"),
    ).withColumn("z", zvalue(F.col("x"), F.col("y")))
    w = Window.orderBy("z", "o_orderkey")
    tiled = zed.withColumn("file_id", F.ntile(ZTILES).over(w))
    return zone_map(tiled, "file_id", ["x", "y"]).orderBy("file_id")


ZORDER_SQL = f"""
WITH base AS (
    SELECT o_orderkey, o_custkey AS ck,
           CAST(floor(o_totalprice / 10.0) AS BIGINT) AS pb
    FROM orders
),
mm AS (
    SELECT min(ck) AS ck_min, max(ck) AS ck_max,
           min(pb) AS pb_min, max(pb) AS pb_max
    FROM base
),
zed AS (
    SELECT o_orderkey,
           {scale_to_bits_sql("ck", "ck_min", "ck_max")} AS x,
           {scale_to_bits_sql("pb", "pb_min", "pb_max")} AS y
    FROM base, mm
),
ztiled AS (
    SELECT x, y,
           ntile({ZTILES}) OVER (
               ORDER BY {zvalue_sql_duckdb("x", "y")}, o_orderkey
           ) AS file_id
    FROM zed
)
SELECT file_id, CAST(count(*) AS BIGINT) AS n_rows,
       min(x) AS min_x, max(x) AS max_x,
       min(y) AS min_y, max(y) AS max_y
FROM ztiled GROUP BY 1 ORDER BY 1
"""


# ------------------------------------------------- weighted sample

def weighted_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted reservoir sample: SAMPLE_K orders
    drawn with probability proportional to o_totalprice. One pass,
    top-k by the A-ES key = TakeOrderedAndProject (per-partition
    heaps), no global sort; reproducible across engines and cluster
    layouts because the randomness is a content hash."""
    o = read_table(spark, sf_dir, "orders")
    key = weighted_sample_keys("o_orderkey", "o_totalprice")
    return (
        # w > 0: zero-weight rows have inclusion probability 0 and a
        # NULL A-ES key (ANSI guard in weighted_sample_keys); they
        # must not reach the ORDER BY — Spark and DuckDB disagree on
        # NULL placement under desc (r12 ANSI-division audit)
        o.filter(F.col("o_totalprice") > 0)
        .withColumn("k", key)
        .orderBy(F.desc("k"), "o_orderkey")
        .limit(SAMPLE_K)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


WEIGHTED_SAMPLE_SQL = f"""
WITH keyed AS (
    SELECT o_orderkey, o_custkey, o_totalprice,
           ln((('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
               + 1) / 4294967296.0) / o_totalprice AS k
    FROM orders
    WHERE o_totalprice > 0
),
top AS (
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM keyed ORDER BY k DESC, o_orderkey LIMIT {SAMPLE_K}
)
SELECT * FROM top ORDER BY o_orderkey
"""


# ---------------------------------------------- compaction planner

COMPACT_TARGET_ROWS = 512


def compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan — the OPTIMIZE half of lakehouse
    table maintenance. The input models a file listing (one "file"
    per o_custkey ingest, with its row count); the planner packs
    files in id order into output groups of ~COMPACT_TARGET_ROWS
    rows via a running-sum bin assignment, and emits one row per
    planned output file.

    Scale shape: the plan runs over file METADATA (count ~ files,
    not rows — a million-file table is a million-row plan job; the
    window is a single metadata-sized sort, and the rewrite itself
    is then one distributed job partitioned by group_id). Keeping
    id-adjacent files together preserves any existing clustering."""
    from bigdata_elephant_spark.operators import layout

    o = read_table(spark, sf_dir, "orders")
    files = o.groupBy(F.col("o_custkey").alias("file_id")).agg(
        F.count("*").alias("n_rows")
    )
    packed = layout.compaction_plan(
        files, COMPACT_TARGET_ROWS, unit_col="file_id", bytes_col="n_rows"
    ).withColumnRenamed("bin", "group_id")
    return (
        packed.groupBy("group_id")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("n_rows").alias("total_rows"),
            F.min("file_id").alias("first_file"),
            F.max("file_id").alias("last_file"),
        )
        .orderBy("group_id")
    )


COMPACTION_SQL = f"""
WITH files AS (
    SELECT o_custkey AS file_id, count(*) AS n_rows
    FROM orders GROUP BY 1
),
packed AS (
    SELECT file_id, n_rows,
           CAST(
               (sum(n_rows) OVER (ORDER BY file_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - n_rows) // {COMPACT_TARGET_ROWS}
           AS BIGINT) AS group_id
    FROM files
)
SELECT group_id, CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(n_rows) AS BIGINT) AS total_rows,
       min(file_id) AS first_file, max(file_id) AS last_file
FROM packed GROUP BY 1 ORDER BY 1
"""


# ------------------------------------------------ quantile sketch

QSK_QUANTILES = (0.05, 0.25, 0.5, 0.75, 0.95, 0.99)


def quantile_sketch_totalprice(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Order-value quantiles from a 1024-row bottom-k hash sample:
    per-partition heaps (TakeOrderedAndProject), no global sort, and
    a sample the oracle re-draws bit-identically."""
    orders = read_table(spark, sf_dir, "orders")
    return bottomk_quantiles(
        orders, "o_orderkey", "o_totalprice", QSK_QUANTILES
    ).orderBy("q")


QUANTILE_SKETCH_SQL = bottomk_quantiles_sql_duckdb(
    "o_orderkey", "o_totalprice", "orders", QSK_QUANTILES
)


# ---------------------------------------------------- bloom filter

BLOOM_BUILD_PRICE = 460_000.0


def bloom_customer_probe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bloom-membership audit: build a 64 Kbit / 4-hash filter over
    customers holding a >460k order, probe EVERY customer, and
    cross-tab bloom verdicts against the exact semi-join →
    ``(actual, bloom_hit, n_customers)``.

    The (actual=true, bloom_hit=false) row can never appear — blooms
    have no false negatives (asserted in tests/test_sketches.py);
    the (false, true) row SIZES the false-positive rate on real
    data. The bits table is ≤ M rows by construction and broadcasts;
    at 100 TB both the build distinct and the probe stay one
    map-side pass + broadcast join."""
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    members = orders.filter(
        F.col("o_totalprice") > BLOOM_BUILD_PRICE
    ).select(F.col("o_custkey").alias("k"))
    bits = bloom_bits(members, "k")
    probed = bloom_probe(customer, "c_custkey", bits)
    actual = members.distinct().withColumn("actual", F.lit(True))
    return (
        probed.join(actual, "k", "left")
        .select(
            F.coalesce("actual", F.lit(False)).alias("actual"),
            "bloom_hit",
        )
        .groupBy("actual", "bloom_hit")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("actual", "bloom_hit")
    )


_BLOOM_JT = "(VALUES (0), (1), (2), (3)) jt(j)"
_BPOS_K = bloom_pos_sql_duckdb("k")

BLOOM_PROBE_SQL = f"""
WITH members AS (
    SELECT DISTINCT o_custkey AS k FROM orders
    WHERE o_totalprice > {BLOOM_BUILD_PRICE}
),
bits AS (
    SELECT DISTINCT {_BPOS_K} AS p
    FROM members CROSS JOIN {_BLOOM_JT}
),
ppos AS (
    SELECT c.k, {_BPOS_K} AS p
    FROM (SELECT DISTINCT c_custkey AS k FROM customer) c
    CROSS JOIN {_BLOOM_JT}
),
hits AS (
    SELECT ppos.k, count(*) AS nhit
    FROM ppos JOIN bits USING (p) GROUP BY 1
),
verdicts AS (
    SELECT c.k,
           coalesce(h.nhit, 0) = {BLOOM_J} AS bloom_hit,
           m.k IS NOT NULL AS actual
    FROM (SELECT DISTINCT c_custkey AS k FROM customer) c
    LEFT JOIN hits h ON h.k = c.k
    LEFT JOIN members m ON m.k = c.k
)
SELECT actual, bloom_hit, count(*) AS n_customers
FROM verdicts GROUP BY 1, 2 ORDER BY 1, 2
"""



SPECS = [
    QuerySpec("compaction_plan", compaction_plan, COMPACTION_SQL,
              ("relational", "layout", "merge")),
    QuerySpec("hll_distinct_users", hll_distinct_users,
              HLL_DISTINCT_SQL, ("llm", "sketch", "agg"), bench=True),
    QuerySpec("kmv_distinct_users", kmv_distinct_users,
              KMV_DISTINCT_SQL, ("llm", "sketch", "agg")),
    QuerySpec("cms_heavy_hitters", cms_heavy_hitters,
              CMS_HEAVY_SQL, ("llm", "sketch", "skew")),
    QuerySpec("zorder_orders_layout", zorder_orders_layout,
              ZORDER_SQL, ("relational", "layout", "pushdown"),
              bench=True),
    QuerySpec("weighted_sample_orders", weighted_sample_orders,
              WEIGHTED_SAMPLE_SQL, ("llm", "sampling", "layout")),
    QuerySpec("quantile_sketch_totalprice", quantile_sketch_totalprice,
              QUANTILE_SKETCH_SQL, ("relational", "sketch", "agg"),
              bench=True),
    QuerySpec("bloom_customer_probe", bloom_customer_probe,
              BLOOM_PROBE_SQL, ("relational", "sketch", "join")),
]


# ------------------------------------------------ KMV set algebra


def kmv_user_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise union/Jaccard/intersection estimates between the
    per-event-type distinct-user KMV sketches, next to exact answers
    (operators/sketches.py kmv_pairwise_setops)."""
    from bigdata_elephant_spark.operators.sketches import (
        kmv_pairwise_setops,
    )

    e = read_table(spark, sf_dir, "events")
    return kmv_pairwise_setops(
        e, "user_id", "event_type", KMV_K
    ).orderBy("ta", "tb")


_KMV_H = h32_sql_duckdb("CAST(user_id AS VARCHAR)")
_NUMK_PAIR = repr(float((KMV_K - 1) * 2**32))

KMV_SETOPS_SQL = f"""
WITH h AS (
    SELECT DISTINCT event_type, {_KMV_H} AS h FROM events
),
kept AS (
    SELECT event_type, h FROM (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY h) AS rn
        FROM h
    ) WHERE rn <= {KMV_K}
),
types AS (SELECT DISTINCT event_type FROM kept),
pairs AS (
    SELECT a.event_type AS ta, b.event_type AS tb
    FROM types a, types b WHERE a.event_type < b.event_type
),
mu AS (
    SELECT DISTINCT p.ta, p.tb, k.h
    FROM pairs p JOIN kept k
      ON k.event_type = p.ta OR k.event_type = p.tb
),
m AS (
    SELECT ta, tb, h,
           row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rn
    FROM mu
),
mk AS (
    SELECT ta, tb, max(h) AS hk, count(*) AS n_in
    FROM m WHERE rn <= {KMV_K} GROUP BY 1, 2
),
inter AS (
    SELECT m.ta, m.tb, count(*) AS c
    FROM m
    JOIN kept a ON a.event_type = m.ta AND a.h = m.h
    JOIN kept b ON b.event_type = m.tb AND b.h = m.h
    WHERE m.rn <= {KMV_K}
    GROUP BY 1, 2
),
du AS (SELECT DISTINCT event_type, user_id FROM events),
dc AS (SELECT event_type, count(*) AS n FROM du GROUP BY 1),
xin AS (
    SELECT a.event_type AS ta, b.event_type AS tb, count(*) AS x
    FROM du a JOIN du b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
)
SELECT mk.ta, mk.tb,
       CAST(mk.n_in AS BIGINT) AS n_in,
       CAST(coalesce(i.c, 0) AS BIGINT) AS c,
       CASE WHEN mk.n_in < {KMV_K} THEN CAST(mk.n_in AS DOUBLE)
            ELSE round({_NUMK_PAIR} / mk.hk, 6) END AS union_est,
       round(coalesce(i.c, 0) / mk.n_in, 6) AS jacc,
       round(round(coalesce(i.c, 0) / mk.n_in, 6)
             * (CASE WHEN mk.n_in < {KMV_K}
                     THEN CAST(mk.n_in AS DOUBLE)
                     ELSE round({_NUMK_PAIR} / mk.hk, 6) END),
             6) AS inter_est,
       CAST(da.n + db.n - coalesce(x.x, 0) AS BIGINT)
           AS exact_union,
       CAST(coalesce(x.x, 0) AS BIGINT) AS exact_inter
FROM mk
LEFT JOIN inter i ON i.ta = mk.ta AND i.tb = mk.tb
JOIN dc da ON da.event_type = mk.ta
JOIN dc db ON db.event_type = mk.tb
LEFT JOIN xin x ON x.ta = mk.ta AND x.tb = mk.tb
ORDER BY mk.ta, mk.tb
"""

SPECS.append(
    QuerySpec(
        "kmv_user_setops",
        kmv_user_setops,
        KMV_SETOPS_SQL,
        ("llm", "sketch", "agg", "join"),
    )
)


# --------------------------------------------- rolling HLL merge

ROLL_HOURS = 3  # trailing window width (current + 2 preceding)


def rolling_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 3-hour distinct-user estimates from MERGED per-hour
    HLL register states — the windowed-rollup pattern where the
    expensive distinct is sketched ONCE per hour and every window
    is an O(m) register max-merge, not a re-scan (precomputed-state
    rollups are how dashboards stay cheap at 100 TB). Each register
    row fans out to the <= 3 windows it feeds via an offset explode
    + equi-join on existing hours (no range join), then the standard
    estimator runs per window; the exact trailing distinct rides
    along for error visibility."""
    from bigdata_elephant_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    eh = read_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "user_id"
    )
    regs = hll_registers(eh, "user_id", "hour")
    offs = F.explode(
        F.array(*[F.lit(o) for o in range(ROLL_HOURS)])
    ).alias("o")
    hours = eh.select("hour").distinct()
    fan = regs.select("hour", "bucket", "r", offs).select(
        F.timestamp_add("HOUR", F.col("o"), F.col("hour")).alias(
            "hour"
        ),
        "bucket",
        "r",
    )
    merged = (
        fan.join(hours, "hour", "left_semi")
        .groupBy("hour", "bucket")
        .agg(F.max("r").alias("r"))
    )
    est = hll_estimate(merged, "hour")
    exu = (
        eh.distinct()
        .select("hour", "user_id", offs)
        .select(
            F.timestamp_add(
                "HOUR", F.col("o"), F.col("hour")
            ).alias("hour"),
            "user_id",
        )
        .join(hours, "hour", "left_semi")
        .distinct()
        .groupBy("hour")
        .agg(F.count("*").alias("n_exact"))
    )
    return est.join(exu, "hour").orderBy("hour")


def _rolling_hll_sql() -> str:
    from bigdata_elephant_spark.operators.sketches import (
        hll_estimate_sql_duckdb,
        hll_sql_duckdb,
    )

    est_sql = hll_estimate_sql_duckdb("tgt", "hour")
    return f"""
WITH eh AS (
    SELECT date_trunc('hour', ts) AS hour, user_id FROM events
),
{hll_sql_duckdb('user_id', 'hour', 'eh')},
hours AS (SELECT DISTINCT hour FROM eh),
fan AS (
    SELECT r.hour + to_hours(o.o) AS hour, r.bucket, r.r
    FROM hll_regs r,
         (SELECT unnest(range(0, {ROLL_HOURS})) AS o) o
),
tgt AS (
    SELECT hour, bucket, max(r) AS r
    FROM fan WHERE hour IN (SELECT hour FROM hours)
    GROUP BY 1, 2
),
est AS ({est_sql}),
exu AS (
    SELECT DISTINCT e.hour + to_hours(o.o) AS hour, e.user_id
    FROM (SELECT DISTINCT hour, user_id FROM eh) e,
         (SELECT unnest(range(0, {ROLL_HOURS})) AS o) o
),
exact AS (
    SELECT hour, count(*) AS n_exact
    FROM exu WHERE hour IN (SELECT hour FROM hours)
    GROUP BY 1
)
SELECT est.hour, est.est_distinct, est.zeros,
       CAST(x.n_exact AS BIGINT) AS n_exact
FROM est JOIN exact x USING (hour)
ORDER BY hour
"""


# ------------------------------------------ CMS join cardinality


def cms_join_cardinality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Join-size estimation from two count-min sketches: the inner
    product of the depth-d counter rows upper-bounds
    ``|R ⋈ S| = Σ_k f_R(k)·f_S(k)`` (AMS/CMS estimator), and the min
    over depths is the estimate — what a cost-based optimizer or
    admission controller consults BEFORE running a 100 TB join,
    from two constant-size states. Integer arithmetic end to end;
    the exact join size rides along (estimate never undercounts)."""
    from bigdata_elephant_spark.operators.sketches import cms_counts

    ev = read_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("k")
    )
    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k")
    )
    s1 = cms_counts(ev, "k")
    s2 = cms_counts(orders, "k").withColumnRenamed("cnt", "cnt2")
    ip = (
        s1.join(s2, ["d", "col"])
        .groupBy("d")
        .agg(F.sum(F.col("cnt") * F.col("cnt2")).alias("ip"))
    )
    est = ip.agg(
        F.min("ip").cast("long").alias("est_join_rows")
    )
    e1 = ev.groupBy("k").agg(F.count("*").alias("c1"))
    e2 = orders.groupBy("k").agg(F.count("*").alias("c2"))
    exact = (
        e1.join(e2, "k")
        .agg(
            F.coalesce(
                F.sum(F.col("c1") * F.col("c2")), F.lit(0)
            )
            .cast("long")
            .alias("exact_join_rows")
        )
    )
    return est.crossJoin(exact).select(
        "est_join_rows",
        "exact_join_rows",
        F.round(
            F.col("est_join_rows") / F.col("exact_join_rows"), 6
        ).alias("over_ratio"),
    )


def _cms_join_sql() -> str:
    from bigdata_elephant_spark.operators.sketches import (
        cms_sql_duckdb,
    )

    return f"""
WITH c1 AS ({cms_sql_duckdb('user_id', 'events')}),
c2 AS ({cms_sql_duckdb('o_custkey', 'orders')}),
ip AS (
    SELECT c1.d, sum(c1.cnt * c2.cnt) AS ip
    FROM c1 JOIN c2 ON c1.d = c2.d AND c1.col = c2.col
    GROUP BY 1
),
est AS (SELECT CAST(min(ip) AS BIGINT) AS est_join_rows FROM ip),
e1 AS (SELECT user_id AS k, count(*) AS c1 FROM events GROUP BY 1),
e2 AS (SELECT o_custkey AS k, count(*) AS c2 FROM orders GROUP BY 1),
ex AS (
    SELECT CAST(coalesce(sum(e1.c1 * e2.c2), 0) AS BIGINT)
        AS exact_join_rows
    FROM e1 JOIN e2 USING (k)
)
SELECT est.est_join_rows, ex.exact_join_rows,
       round(est.est_join_rows / ex.exact_join_rows, 6)
           AS over_ratio
FROM est, ex
"""


SPECS.append(
    QuerySpec(
        "rolling_hll_users",
        rolling_hll_users,
        _rolling_hll_sql(),
        ("llm", "sketch", "window", "agg"),
    )
)
SPECS.append(
    QuerySpec(
        "cms_join_cardinality",
        cms_join_cardinality,
        _cms_join_sql(),
        ("llm", "sketch", "join"),
    )
)
