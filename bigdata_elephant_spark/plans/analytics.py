"""Product-analytics operators over the events stream.

These are the shapes a warehouse user reaches for daily — funnel,
retention, rolling features, pivot/unpivot, stratified sampling —
declared as Catalyst plans with DuckDB oracles, and designed for the
100 TB layout:

- Funnel and retention aggregate *per user first* (shuffle keyed on
  user_id, map-side partial), so downstream stages see user-sized,
  not event-sized, data.
- Rolling features use a RANGE window frame over epoch-micros — one
  shuffle + partition-local sort, state bounded by the time width.
- The stratified sample is deterministic (md5 order): reproducible
  across runs/engines, no global shuffle beyond the per-stratum sort,
  and at scale each stratum samples independently in parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_elephant_spark.registry import QuerySpec
from bigdata_elephant_spark.sources.corpus import read_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "events")


# ------------------------------------------------------------ funnel

def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential conversion funnel view -> click -> purchase: a user
    counts for a stage only if the stage event happens strictly after
    their entry into the previous stage. Each stage is a user-keyed
    aggregate then a user-keyed join — all three shuffles share the
    user_id key, so at scale they co-locate."""
    e = _events(spark, sf_dir)
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(
            F.broadcast(
                c.agg(F.count("*").alias("n_click_after_view"))
            )
        )
        .crossJoin(
            F.broadcast(
                p.agg(F.count("*").alias("n_purchase_after_click"))
            )
        )
    )


EVENT_FUNNEL_SQL = """
WITH v AS (
    SELECT user_id, min(ts) AS t1 FROM events
    WHERE event_type = 'view' GROUP BY 1
),
c AS (
    SELECT e.user_id, min(e.ts) AS t2
    FROM events e JOIN v USING (user_id)
    WHERE e.event_type = 'click' AND e.ts > v.t1
    GROUP BY 1
),
p AS (
    SELECT e.user_id, min(e.ts) AS t3
    FROM events e JOIN c USING (user_id)
    WHERE e.event_type = 'purchase' AND e.ts > c.t2
    GROUP BY 1
)
SELECT (SELECT count(*) FROM v) AS n_view,
       (SELECT count(*) FROM c) AS n_click_after_view,
       (SELECT count(*) FROM p) AS n_purchase_after_click
"""


# --------------------------------------------------------- retention

def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention triangle: users grouped by first-seen day
    (cohort), counted per day-offset of later activity. Two stages:
    per-user first day (user-keyed agg), then distinct user-days
    joined back — cohort table is user-sized and reused, not a
    rescan of events."""
    e = _events(spark, sf_dir)
    days = e.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    first = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        days.join(first, "user_id")
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort"),
            F.datediff("day", "cohort_day").cast("int").alias("day_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


RETENTION_SQL = """
WITH days AS (
    SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
),
first AS (
    SELECT user_id, min(day) AS cohort_day FROM days GROUP BY 1
)
SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort,
       CAST(date_diff('day', cohort_day, day) AS INTEGER) AS day_offset,
       count(*) AS n_users
FROM days JOIN first USING (user_id)
GROUP BY 1, 2
"""


# --------------------------------------------- rolling time features

ROLL_US = 3600 * 1_000_000  # 1 hour in epoch-micros


def rolling_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event: that user's event count and mean value over the
    trailing hour (inclusive) — the RANGE-frame window (frame bounds
    in *value* space, epoch-micros, not row counts). One shuffle on
    user_id + a partition-local sort; frame state is bounded by the
    hour width however long the history. The mean divides an exact
    decimal sum by the frame count, so both engines round the same
    double."""
    e = _events(spark, sf_dir)
    us = F.unix_micros("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-ROLL_US, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_1h"),
        F.round(
            F.sum(F.col("value").cast("decimal(12,2)")).over(w)
            .cast("double")
            / F.count("value").over(w),
            6,
        ).alias("avg_value_1h"),
    )


ROLLING_FEATURES_SQL = f"""
SELECT event_id, user_id,
       count(*) OVER w AS n_1h,
       round(CAST(sum(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE)
             / count(value) OVER w, 6) AS avg_value_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN {ROLL_US} PRECEDING AND CURRENT ROW)
"""


# ------------------------------------------------- pivot and unpivot

EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


def pivot_api_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The native relational PIVOT (``groupBy().pivot()`` with an
    explicit value list — never the two-pass value-discovery form,
    which scans twice and breaks at scale): daily event counts, one
    column per type."""
    e = _events(spark, sf_dir)
    pivoted = (
        e.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
            .alias("day")
        )
        .pivot("event_type", list(EVENT_TYPES))
        .count()
    )
    return pivoted.select(
        "day",
        *[
            F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}")
            for t in EVENT_TYPES
        ],
    )


PIVOT_API_SQL = f"""
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       {", ".join(
           "CAST(coalesce(sum(CASE WHEN event_type = "
           f"'{t}' THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_{t}"
           for t in EVENT_TYPES
       )}
FROM events
GROUP BY 1
"""


UNPIVOT_MEASURES = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def unpivot_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The relational UNPIVOT (``DataFrame.unpivot``): lineitem's four
    numeric measures melted to (measure, value) long format, then
    aggregated per measure — the wide-to-long reshape feature stores
    need. Melt multiplies rows by the measure count but narrows to
    two columns; the aggregate is exact decimal."""
    l = read_table(spark, sf_dir, "lineitem")
    long = l.unpivot(
        ids=[],
        values=list(UNPIVOT_MEASURES),
        variableColumnName="measure",
        valueColumnName="val",
    )
    return long.groupBy("measure").agg(
        F.round(F.sum(F.col("val").cast("decimal(12,2)")), 2)
        .cast("double")
        .alias("total"),
        F.count("*").alias("n"),
    )


UNPIVOT_SQL = f"""
SELECT measure,
       CAST(round(sum(CAST(val AS DECIMAL(12,2))), 2) AS DOUBLE) AS total,
       count(*) AS n
FROM (
    {" UNION ALL ".join(
        f"SELECT '{m}' AS measure, {m} AS val FROM lineitem"
        for m in UNPIVOT_MEASURES
    )}
)
GROUP BY 1
"""


# ------------------------------------------------ stratified sample

STRATUM_N = 50


def stratified_sample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: exactly ``STRATUM_N`` events
    per event_type, chosen by md5 order of the event id — a
    reproducible pseudo-random draw (same rows on any engine, any
    partitioning, any run). Per-stratum work is an independent
    window; no global shuffle."""
    e = _events(spark, sf_dir)
    key = F.md5(F.col("event_id").cast("string"))
    w = Window.partitionBy("event_type").orderBy(key, "event_id")
    return (
        e.select(
            "event_id",
            "event_type",
            F.row_number().over(w).cast("long").alias("draw_rank"),
        )
        .filter(F.col("draw_rank") <= STRATUM_N)
    )


STRATIFIED_SAMPLE_SQL = f"""
SELECT event_id, event_type, draw_rank FROM (
    SELECT event_id, event_type,
           CAST(row_number() OVER (
               PARTITION BY event_type
               ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
           ) AS BIGINT) AS draw_rank
    FROM events
)
WHERE draw_rank <= {STRATUM_N}
"""


# ------------------------------------------------ skew-safe rollup

SKEW_SALTS = 16


def skew_safe_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (operators/skew.py technique)
    under the oracle gate: per event_type, exact distinct users and
    exact decimal value sum, computed via (key, salt) partials so a
    hot key spreads over SKEW_SALTS reducers. Salting by
    hash(user_id) keeps count-distinct exact (equal users share a
    salt); the decimal sum is salt-order-independent by construction.
    The oracle is the *unsalted* aggregation — equality proves the
    technique lossless."""
    e = _events(spark, sf_dir)
    salted = e.withColumn(
        "__salt", F.pmod(F.hash("user_id"), F.lit(SKEW_SALTS))
    )
    partial = salted.groupBy("event_type", "__salt").agg(
        F.count_distinct("user_id").alias("_pd"),
        F.sum(F.col("value").cast("decimal(12,2)")).alias("_ps"),
        F.count("*").alias("_pn"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("_pd").alias("n_users"),
        F.round(F.sum("_ps"), 4).cast("double").alias("sum_value"),
        F.sum("_pn").alias("n_events"),
    )


SKEW_SAFE_SQL = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(round(sum(CAST(value AS DECIMAL(12,2))), 4) AS DOUBLE)
           AS sum_value,
       count(*) AS n_events
FROM events
GROUP BY 1
"""


def skew_salted_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salt-and-replicate skew join (operators/skew.py salted_join)
    under the oracle gate, on a GENUINELY skewed fixture: the events
    table's user ids are uniform, so 30% of rows are deterministically
    remapped to one hot customer (user_id % 10 < 3 -> custkey 1) —
    the one-key-floods-one-reducer shape AQE's size-based skew split
    sees at 100 TB. The fact side then joins customer with the
    customer side replicated 8x on an explicit salt and rolls up per
    (mktsegment, event_type). The oracle is the plain unsalted join +
    group over the same remapping — equality proves the salt is a
    pure partitioning trick with identical row-level semantics even
    when one key holds ~30% of the fact table."""
    from bigdata_elephant_spark.operators.skew import salted_join

    hot_key = F.when(
        F.pmod(F.col("user_id"), F.lit(10)) < 3, F.lit(1).cast("long")
    ).otherwise(F.col("user_id"))
    e = _events(spark, sf_dir).select(
        hot_key.alias("c_custkey"), "event_type",
        F.col("value").cast("decimal(12,2)").alias("v"),
    )
    c = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = salted_join(e, c, "c_custkey", n_salts=8)
    return joined.groupBy("c_mktsegment", "event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("v"), 4).cast("double").alias("sum_value"),
    )


SKEW_SALTED_JOIN_SQL = """
SELECT c.c_mktsegment, e.event_type,
       count(*) AS n_events,
       CAST(round(sum(CAST(e.value AS DECIMAL(12,2))), 4) AS DOUBLE)
           AS sum_value
FROM (
    SELECT CASE WHEN user_id % 10 < 3 THEN 1 ELSE user_id END
               AS user_id,
           event_type, value
    FROM events
) e JOIN customer c ON c.c_custkey = e.user_id
GROUP BY 1, 2
"""


COPURCHASE_TOP = 20


def copurchase_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the top-20 part pairs most often
    ordered together. Baskets dedup to distinct (order, part) FIRST
    — the self-join fan-out is then Σ basket², bounded by basket
    size, not line count (a 100-line order with 3 distinct parts
    contributes 3 pairs, not 4950); at 100 TB the next lever is
    capping pathological baskets, same as the hot-shingle cap in
    ngram_jaccard_pairs. One shuffle keys the join on the order, one
    aggregates pair support."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a = li.select(
        "l_orderkey", F.col("l_partkey").alias("part_a")
    )
    b = li.select(
        "l_orderkey", F.col("l_partkey").alias("part_b")
    )
    return (
        a.join(b, "l_orderkey")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("support"))
        .orderBy(F.desc("support"), "part_a", "part_b")
        .limit(COPURCHASE_TOP)
    )


COPURCHASE_SQL = f"""
WITH baskets AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       count(*) AS support
FROM baskets a JOIN baskets b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY support DESC, part_a, part_b
LIMIT {COPURCHASE_TOP}
"""


# --------------------------------------------------- fuzzy matching

FUZZY_MAX_DIST = 2


def fuzzy_customer_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching: customer-name pairs within levenshtein
    distance 2, candidate-blocked on (nation, name length) so the
    quadratic comparison runs only inside blocks — the standard
    record-linkage shape (blocking keys cut n² to Σ block²; at 100 TB
    add more discriminating keys, e.g. name prefix)."""
    c = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey",
        F.length("c_name").alias("_len"),
    )
    a = c.select(*[F.col(x).alias(f"{x}_a") for x in c.columns])
    b = c.select(*[F.col(x).alias(f"{x}_b") for x in c.columns])
    return (
        a.join(
            b,
            (F.col("c_nationkey_a") == F.col("c_nationkey_b"))
            & (F.col("_len_a") == F.col("_len_b"))
            & (F.col("c_custkey_a") < F.col("c_custkey_b")),
        )
        .withColumn(
            "dist", F.levenshtein(F.col("c_name_a"), F.col("c_name_b"))
        )
        .filter(F.col("dist") <= FUZZY_MAX_DIST)
        .select(
            F.col("c_custkey_a").alias("key_a"),
            F.col("c_custkey_b").alias("key_b"),
            F.col("dist").cast("long").alias("dist"),
        )
    )


FUZZY_PAIRS_SQL = f"""
SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
FROM customer a JOIN customer b
  ON a.c_nationkey = b.c_nationkey
 AND length(a.c_name) = length(b.c_name)
 AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= {FUZZY_MAX_DIST}
"""


def entity_resolution_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """End-to-end entity resolution: blocked fuzzy matching
    (fuzzy_customer_pairs) -> transitive closure over the match graph
    (operators/dedup.py duplicate_groups, min-label propagation) ->
    canonical id = the lowest custkey of each resolved entity. One
    row per customer that belongs to a multi-record entity. The
    composition every master-data pipeline runs: pairs are blocked
    (never all-pairs), closure cost is rounds <= component diameter,
    and the canonical choice is deterministic. Oracle replays the
    closure with a recursive CTE."""
    from bigdata_elephant_spark.operators.dedup import duplicate_groups

    pairs = fuzzy_customer_pairs(spark, sf_dir).select("key_a", "key_b")
    return (
        duplicate_groups(pairs, a_col="key_a", b_col="key_b")
        .select(
            F.col("doc_id").alias("c_custkey"),
            F.col("group_id").alias("canonical_key"),
        )
        .orderBy("c_custkey")
    )


ENTITY_RESOLUTION_SQL = f"""
WITH RECURSIVE good AS (
    SELECT a.c_custkey AS key_a, b.c_custkey AS key_b
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey
     AND length(a.c_name) = length(b.c_name)
     AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= {FUZZY_MAX_DIST}
),
e AS (
    SELECT key_a AS a, key_b AS b FROM good
    UNION ALL
    SELECT key_b AS a, key_a AS b FROM good
),
reach AS (
    SELECT a AS node, a AS label FROM e
    UNION
    SELECT e.b AS node, r.label FROM reach r JOIN e ON e.a = r.node
)
SELECT node AS c_custkey, min(label) AS canonical_key
FROM reach GROUP BY node
ORDER BY c_custkey
"""


def props_key_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured surface: parse the JSON props column to a map
    and explode its keys — the schema-on-read shape for ragged event
    payloads (map type, not fixed columns)."""
    e = _events(spark, sf_dir)
    m = F.from_json("props", "map<string,string>")
    return (
        e.select(F.explode(F.map_keys(m)).alias("key"))
        .groupBy("key")
        .agg(F.count("*").alias("n"))
    )


PROPS_KEY_COUNTS_SQL = """
SELECT key, count(*) AS n
FROM (SELECT unnest(json_keys(props)) AS key FROM events)
GROUP BY 1
"""


# -------------------------------------------- merge / CDC semantics

def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (operators/merge.py): a derived delta —
    every 10th order re-priced, plus brand-new keys — upserted into
    orders. The oracle recomputes the same full-outer preference
    join."""
    from bigdata_elephant_spark.operators.merge import merge_upsert

    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    updates = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 1000 == 1).select(
                (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
                "o_custkey",
                "o_totalprice",
            )
        )
    )
    merged = merge_upsert(o, updates, ["o_orderkey"])
    return merged.select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.col("__action").alias("action"),
    )


MERGE_UPSERT_SQL = """
WITH t AS (
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
),
u AS (
    SELECT o_orderkey, o_custkey, o_totalprice + 1000.0 AS o_totalprice
    FROM t WHERE o_orderkey % 10 = 0
    UNION ALL
    SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey, o_totalprice
    FROM t WHERE o_orderkey % 1000 = 1
)
SELECT coalesce(u.o_orderkey, t.o_orderkey) AS o_orderkey,
       CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_custkey
            ELSE t.o_custkey END AS o_custkey,
       round(CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_totalprice
                  ELSE t.o_totalprice END, 2) AS o_totalprice,
       CASE WHEN t.o_orderkey IS NOT NULL AND u.o_orderkey IS NOT NULL
            THEN 'updated'
            WHEN u.o_orderkey IS NOT NULL THEN 'inserted'
            ELSE 'kept' END AS action
FROM t FULL OUTER JOIN u ON t.o_orderkey = u.o_orderkey
"""


def cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC compaction (operators/merge.py latest_state): events as a
    change stream per user, reduced to each user's most recent event;
    users whose latest event_type is 'error' are treated as deleted
    (tombstone semantics)."""
    from bigdata_elephant_spark.operators.merge import latest_state

    e = read_table(spark, sf_dir, "events")
    cur = latest_state(
        e,
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        op_col="event_type",
        delete_op="error",
    )
    return cur.select(
        "user_id",
        "event_id",
        "event_type",
        F.round("value", 4).alias("value"),
    )


CDC_LATEST_SQL = """
SELECT user_id, event_id, event_type, round(value, 4) AS value
FROM (
    SELECT user_id, event_id, event_type, value,
           row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
           ) AS rn
    FROM events
)
WHERE rn = 1 AND event_type <> 'error'
"""


def scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension build (operators/merge.py scd2_history):
    each user's event stream becomes versioned validity intervals —
    valid_from = the change's own timestamp, valid_to = the next
    change's (null + is_current on the open version). One windowed
    lead per key, no interval self-join. Timestamps render as UTC
    strings so the row is engine-hashable."""
    from bigdata_elephant_spark.operators.merge import scd2_history

    e = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    hist = scd2_history(
        e, key_cols=["user_id"], order_cols=["ts", "event_id"]
    )
    fmt = "yyyy-MM-dd HH:mm:ss"
    return hist.select(
        "user_id",
        "event_id",
        "event_type",
        F.date_format("valid_from", fmt).alias("valid_from"),
        F.date_format("valid_to", fmt).alias("valid_to"),
        "is_current",
    )


SCD2_USER_SQL = """
SELECT user_id, event_id, event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(lead(ts) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
       ), '%Y-%m-%d %H:%M:%S') AS valid_to,
       (lead(ts) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
       ) IS NULL) AS is_current
FROM events
"""


def table_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level table reconciliation (operators/reconcile.py): diff
    orders against a deterministically perturbed copy (keys % 997
    dropped, % 331 repriced +1.00, % 463 re-keyed high = inserted)
    and emit (key, status) for every difference. The bucket-
    fingerprint pass routes only differing buckets into the wide
    full-outer join; the oracle is the PLAIN full diff — equality
    proves the pruning lossless."""
    from bigdata_elephant_spark.operators.reconcile import table_diff

    o = read_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    kept = o.filter(k % 997 != 0).withColumn(
        "o_totalprice",
        F.when(k % 331 == 0, F.col("o_totalprice") + 1.0).otherwise(
            F.col("o_totalprice")
        ),
    )
    extra = o.filter(k % 463 == 0).withColumn(
        "o_orderkey", k + 10_000_000
    )
    b = kept.unionByName(extra)
    return table_diff(o, b, ["o_orderkey"]).orderBy("o_orderkey")


TABLE_DIFF_SQL = """
WITH b AS (
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CASE WHEN o_orderkey % 331 = 0 THEN o_totalprice + 1.0
                ELSE o_totalprice END AS o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 997 <> 0
    UNION ALL
    SELECT o_orderkey + 10000000, o_custkey, o_orderstatus,
           o_totalprice, o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 463 = 0
)
SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
       CASE WHEN b.o_orderkey IS NULL THEN 'missing_b'
            WHEN a.o_orderkey IS NULL THEN 'missing_a'
            WHEN (a.o_custkey      IS DISTINCT FROM b.o_custkey)
              OR (a.o_orderstatus  IS DISTINCT FROM b.o_orderstatus)
              OR (a.o_totalprice   IS DISTINCT FROM b.o_totalprice)
              OR (a.o_orderdate    IS DISTINCT FROM b.o_orderdate)
              OR (a.o_orderpriority IS DISTINCT FROM b.o_orderpriority)
            THEN 'changed' END AS status
FROM orders a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
WHERE CASE WHEN b.o_orderkey IS NULL THEN 'missing_b'
           WHEN a.o_orderkey IS NULL THEN 'missing_a'
           WHEN (a.o_custkey      IS DISTINCT FROM b.o_custkey)
             OR (a.o_orderstatus  IS DISTINCT FROM b.o_orderstatus)
             OR (a.o_totalprice   IS DISTINCT FROM b.o_totalprice)
             OR (a.o_orderdate    IS DISTINCT FROM b.o_orderdate)
             OR (a.o_orderpriority IS DISTINCT FROM b.o_orderpriority)
           THEN 'changed' END IS NOT NULL
ORDER BY o_orderkey
"""


def trimmed_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type value statistics with the outlier tails cut at
    exact percentile ranks (keep 1% ≤ pr ≤ 99%): the trimmed mean a
    feature pipeline wants when sensor glitches poison plain AVG.

    percent_rank is (rank-1)/(n-1) on identical orderings — exact
    rationals, so the trim boundary cannot flip rows cross-engine
    (unlike approx_percentile, whose sketch is engine-specific). One
    sort-window per type partition + one aggregate; at 100 TB the
    window shuffles on event_type — low-cardinality, so a salted
    two-level variant (operators/skew.py) would pre-aggregate if
    types are few and hot."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("value")
    ranked = ev.select(
        "event_type", "value", F.percent_rank().over(w).alias("pr")
    )
    return (
        ranked.filter((F.col("pr") >= 0.01) & (F.col("pr") <= 0.99))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_kept"),
            F.round(
                F.sum(F.col("value").cast("decimal(12,2)"))
                .cast("double") / F.count("*"),
                6,
            ).alias("trimmed_avg"),
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
        )
        .orderBy("event_type")
    )


TRIMMED_VALUE_STATS_SQL = """
WITH ranked AS (
    SELECT event_type, value,
           percent_rank() OVER (PARTITION BY event_type
                                ORDER BY value) AS pr
    FROM events
)
SELECT event_type, count(*) AS n_kept,
       round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
             / count(*), 6) AS trimmed_avg,
       round(min(value), 2) AS lo,
       round(max(value), 2) AS hi
FROM ranked
WHERE pr >= 0.01 AND pr <= 0.99
GROUP BY 1 ORDER BY 1
"""


def heavy_hitter_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew diagnosis: the top-20 hottest grouping keys with
    their share of all rows and their skew multiplier (key count ÷
    mean key count). This is the query you run *before* picking a
    partitioning / salting strategy — a skew_x near 1 means uniform
    keys, a large skew_x says the key needs salting (see
    operators/skew.py for the mitigation).

    One partially-aggregated groupBy + a broadcast of the 1-row
    total; top-k is TakeOrderedAndProject. Ratios divide exact
    integer counts, identical cross-engine."""
    ev = _events(spark, sf_dir)
    counts = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    tot = counts.agg(
        F.sum("cnt").alias("_tot"), F.count("*").alias("_nkeys")
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "cnt",
            F.round(F.col("cnt") / F.col("_tot"), 6).alias("share"),
            F.round(
                F.col("cnt") * F.col("_nkeys") / F.col("_tot"), 6
            ).alias("skew_x"),
        )
        .orderBy(F.desc("cnt"), "user_id")
        .limit(20)
    )


HEAVY_HITTER_SQL = """
WITH counts AS (
    SELECT user_id, count(*) AS cnt FROM events GROUP BY 1
),
tot AS (
    SELECT sum(cnt) AS t, count(*) AS nkeys FROM counts
)
SELECT user_id, CAST(cnt AS BIGINT) AS cnt,
       round(cnt / t, 6) AS share,
       round(cnt * nkeys / t, 6) AS skew_x
FROM counts, tot
ORDER BY cnt DESC, user_id
LIMIT 20
"""


# ----------------------------- incremental aggregate maintenance

INCR_CUTOFF = "2024-01-21 00:00:00"


def incremental_daily_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Materialized-view maintenance without a rescan: a daily
    revenue aggregate kept as mergeable state (count + exact-decimal
    sum), updated by aggregating ONLY the new batch and full-outer
    merging the two state tables on the group key.

    At 100 TB this is the difference between an O(batch) nightly job
    and an O(history) one: the base state is day-partitioned, the
    delta touches only the days present in the batch, and the merge
    is a partition-pruned join. COUNT/SUM merge by addition (AVG =
    merged sum / merged count); MIN/MAX merge by min/max; distinct
    needs a sketch (see `operators/sketches.py`) — the standard
    algebraic/holistic split.

    The oracle recomputes the aggregate from ALL events in one pass —
    the parity check IS the proof that incremental merge ==
    recompute (decimal sums are associative; float sums would not
    replay exactly).
    """
    e = _events(spark, sf_dir)
    from bigdata_elephant_spark.functions.numeric import money

    def state(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
            .alias("day")
        ).agg(
            F.count("*").alias("n"),
            F.sum(money("value")).alias("s"),
        )

    cutoff = F.lit(INCR_CUTOFF).cast("timestamp")
    base = state(e.filter(F.col("ts") < cutoff))
    delta = state(e.filter(F.col("ts") >= cutoff))
    zero = F.lit(0).cast("decimal(22,2)")
    merged = (
        base.alias("b")
        .join(delta.alias("d"), "day", "full_outer")
        .select(
            "day",
            (
                F.coalesce(F.col("b.n"), F.lit(0))
                + F.coalesce(F.col("d.n"), F.lit(0))
            ).alias("n"),
            (
                F.coalesce(F.col("b.s"), zero)
                + F.coalesce(F.col("d.s"), zero)
            ).alias("s"),
        )
    )
    return merged.select(
        "day",
        "n",
        F.round(F.col("s"), 2).cast("double").alias("sum_value"),
        F.round(F.col("s").cast("double") / F.col("n"), 6).alias(
            "avg_value"
        ),
    ).orderBy("day")


INCREMENTAL_DAILY_SQL = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       count(*) AS n,
       CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE)
           AS sum_value,
       round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
             / count(*), 6) AS avg_value
FROM events
GROUP BY 1
ORDER BY 1
"""


SPECS = [
    QuerySpec("incremental_daily_revenue", incremental_daily_revenue,
              INCREMENTAL_DAILY_SQL, ("events", "merge", "agg")),
    QuerySpec("event_funnel", event_funnel, EVENT_FUNNEL_SQL,
              ("events", "analytics", "join"), bench=True),
    QuerySpec("retention_cohorts", retention_cohorts, RETENTION_SQL,
              ("events", "analytics", "agg")),
    QuerySpec("rolling_user_features", rolling_user_features,
              ROLLING_FEATURES_SQL, ("events", "analytics", "window")),
    QuerySpec("pivot_api_events", pivot_api_events, PIVOT_API_SQL,
              ("events", "pivot")),
    QuerySpec("unpivot_lineitem", unpivot_lineitem, UNPIVOT_SQL,
              ("relational", "pivot")),
    QuerySpec("stratified_sample_events", stratified_sample_events,
              STRATIFIED_SAMPLE_SQL, ("events", "sampling")),
    QuerySpec("merge_upsert_orders", merge_upsert_orders,
              MERGE_UPSERT_SQL, ("relational", "merge", "join")),
    QuerySpec("scd2_user_history", scd2_user_history, SCD2_USER_SQL,
              ("events", "window", "merge")),
    QuerySpec("table_diff_orders", table_diff_orders, TABLE_DIFF_SQL,
              ("relational", "merge", "join"), bench=True),
    QuerySpec("copurchase_part_pairs", copurchase_part_pairs,
              COPURCHASE_SQL, ("relational", "join", "topk")),
    QuerySpec("entity_resolution_customers", entity_resolution_customers,
              ENTITY_RESOLUTION_SQL, ("relational", "dedup", "iterative")),
    QuerySpec("cdc_latest_state", cdc_latest_state, CDC_LATEST_SQL,
              ("events", "merge", "window")),
    QuerySpec("fuzzy_customer_pairs", fuzzy_customer_pairs,
              FUZZY_PAIRS_SQL, ("relational", "fuzzy", "join")),
    QuerySpec("props_key_counts", props_key_counts,
              PROPS_KEY_COUNTS_SQL, ("events", "json")),
    QuerySpec("skew_safe_user_stats", skew_safe_user_stats,
              SKEW_SAFE_SQL, ("events", "skew", "agg")),
    QuerySpec("heavy_hitter_keys", heavy_hitter_keys,
              HEAVY_HITTER_SQL, ("events", "skew", "agg")),
    QuerySpec("skew_salted_join_events", skew_salted_join_events,
              SKEW_SALTED_JOIN_SQL, ("events", "skew", "join")),
    QuerySpec("trimmed_value_stats", trimmed_value_stats,
              TRIMMED_VALUE_STATS_SQL, ("events", "agg", "window")),
]
