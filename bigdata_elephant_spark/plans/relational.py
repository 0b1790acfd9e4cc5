"""Relational surface over the TPC-H-ish star schema.

The reference's only relational shapes are broadcast joins, partial+
final aggregation, global sort and top-K (SURVEY §2). This module
declares those — and the standard surface a user of an analytics
engine expects (windows, rollup/cube, set ops, semi/anti joins,
subqueries, JSON extraction, sessionization) — as Catalyst-optimized
DataFrame/SQL plans with DuckDB oracles.

Scale notes (100 TB stance):
- Fixed-cardinality dimensions (region = 5 rows, nation = 25) are
  explicitly ``broadcast()`` — bounded by construction, no shuffle
  of the fact table for lookups. SF-GROWING dimensions (customer,
  supplier, part — linear in scale factor, far past Spark's 8 GB
  broadcast fail point at warehouse scale) use the size-gated
  ``maybe_broadcast`` instead: the hint applies while Catalyst's
  size estimate says the build is small (so these plans are
  byte-identical at test SFs), and past the cap the join is left to
  AQE's runtime sizing — a forced hint would FAIL there, not
  degrade. ``orders``-``lineitem`` joins shuffle on the join key and
  rely on AQE for skew; at warehouse scale both sides would be
  bucketed by orderkey to co-locate.
- Filters are plain column predicates on the scan columns, so they
  reach the parquet reader as PushedFilters; aggregates use built-in
  functions only (whole-stage codegen, map-side partial agg).
- Every float output is rounded in-plan; every top-K orders by the
  rounded value with a unique tie-break, so plans stay deterministic
  cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_elephant_spark.functions.numeric import (
    approx_sums,
    davg,
    dsum,
    dsum_expr,
    money,
    rate,
)
from bigdata_elephant_spark.registry import QuerySpec
from bigdata_elephant_spark.session import maybe_broadcast
from bigdata_elephant_spark.sources.corpus import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# ------------------------------------------------------------------ Q1

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    # Exact-decimal aggregation (functions/numeric.py): the measures
    # are 2-decimal doubles, so the decimal sums are order-independent
    # and bit-identical to the DuckDB oracle at any partitioning.
    disc_price = money("l_extendedprice") * (1 - rate("l_discount"))
    charge = disc_price * (1 + rate("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("2000-12-01")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", 2).alias("sum_qty"),
            dsum("l_extendedprice", 2).alias("sum_base_price"),
            dsum_expr(disc_price, 2).alias("sum_disc_price"),
            dsum_expr(charge, 2).alias("sum_charge"),
            davg("l_quantity", 6).alias("avg_qty"),
            davg("l_extendedprice", 6).alias("avg_price"),
            davg("l_discount", 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q1_pricing_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-mode twin of :func:`q1_pricing_summary`: identical
    plan shape with plain double sums (``functions/numeric.py``
    ``approx_sums()``) instead of DECIMAL. This is the mode a
    throughput-bound job runs; the exact twin is the oracle-checked
    one. No DuckDB oracle here on purpose — double-sum order
    nondeterminism across engines is exactly what the exact mode
    eliminates (r01's q7 failed a last-ulp rounding flip); semantic
    agreement with the exact twin is asserted to 1e-6 relative
    tolerance in tests/test_numeric_modes.py, and the bench runs both
    so the decimal surcharge stays measured."""
    with approx_sums():
        return q1_pricing_summary(spark, sf_dir)


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE)      AS sum_qty,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
            AS DOUBLE)                                                       AS sum_disc_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))
                      * (1 + CAST(l_tax AS DECIMAL(4,2)))), 2)
            AS DOUBLE)                                                       AS sum_charge,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
             / count(l_quantity), 6)                                         AS avg_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             / count(l_extendedprice), 6)                                    AS avg_price,
       round(CAST(sum(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE)
             / count(l_discount), 6)                                         AS avg_disc,
       count(*)                                                              AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ------------------------------------------------------------------ Q3

def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1998-01-01"))
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            dsum_expr(
                money("l_extendedprice") * (1 - rate("l_discount")), 2
            ).alias("revenue")
        )
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


Q3_SQL = """
SELECT o_orderkey,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
            AS DOUBLE)                                   AS revenue,
       strftime(o_orderdate, '%Y-%m-%d')                 AS orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


# ------------------------------------------------------------------ Q5
# Declared via the Spark SQL API (temp views) — same engine, SQL front.

Q5_SPARK_SQL = """
SELECT n_name,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
            AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    for name in ("customer", "orders", "lineitem", "supplier", "nation",
                 "region"):
        _t(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(Q5_SPARK_SQL)


Q5_SQL = Q5_SPARK_SQL  # ANSI subset: valid in DuckDB verbatim


# ------------------------------------------------- top customers (topK)

def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.groupBy("o_custkey")
        .agg(dsum("o_totalprice", 2).alias("total_spent"),
             F.count("*").alias("n_orders"))
        .join(maybe_broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "total_spent", "n_orders")
        .orderBy(F.desc("total_spent"), "c_custkey")
        .limit(10)
    )


TOP_CUSTOMERS_SQL = """
SELECT c_custkey, c_name,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
           AS total_spent,
       count(*)                    AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY total_spent DESC, c_custkey
LIMIT 10
"""


# ------------------------------------------------------- window funcs

def window_order_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


WINDOW_ORDER_RANK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rk
FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
    FROM orders
)
WHERE rk <= 3
"""


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum(money("o_totalprice")).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
            2,
        ).cast("double").alias("cum_spent"),
        F.round(
            F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0)), 2
        ).alias("prev_price"),
    )


WINDOW_RUNNING_SUM_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
            AS DOUBLE) AS cum_spent,
       round(coalesce(lag(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           0.0), 2) AS prev_price
FROM orders
"""


# ---------------------------------------------------- rollup and cube

def rollup_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", 2).alias("sum_qty"),
            F.count("*").alias("n"),
        )
    )


ROLLUP_RETURNS_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE)
           AS sum_qty,
       count(*)                  AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def cube_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            dsum("o_totalprice", 2).alias("total"),
        )
    )


CUBE_PRIORITY_STATUS_SQL = """
SELECT o_orderpriority, o_orderstatus,
       count(*)                    AS n,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
           AS total
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


# ------------------------------------------------------------ set ops

def setop_nations_without_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    ).distinct()
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    ).distinct()
    return c.subtract(s)  # EXCEPT (distinct)


SETOP_NATIONS_WITHOUT_SUPPLIERS_SQL = """
SELECT DISTINCT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT DISTINCT s_nationkey AS nationkey FROM supplier
"""


def setop_common_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)  # INTERSECT (distinct)


SETOP_COMMON_NATIONS_SQL = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""


# ------------------------------------------------- semi / anti joins

def anti_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


ANTI_CUSTOMERS_NO_ORDERS_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def semi_customers_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey", "c_nationkey")


SEMI_CUSTOMERS_OPEN_ORDERS_SQL = """
SELECT c_custkey, c_nationkey FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
"""


# ------------------------------------------------- scalar subquery

# The avg threshold is computed as an exact decimal sum / count so
# both engines compare against the identical double (engine AVG
# accumulates in engine-specific order; a boundary customer could
# flip membership).
SCALAR_SUBQUERY_SPARK_SQL = """
SELECT c_custkey, round(c_acctbal, 2) AS acctbal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
           / count(c_acctbal)
    FROM customer
)
"""


def scalar_subquery_rich_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(SCALAR_SUBQUERY_SPARK_SQL)


SCALAR_SUBQUERY_SQL = SCALAR_SUBQUERY_SPARK_SQL


# ------------------------------------------------- scalar functions

def scalar_funcs_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_type", 1, 3).alias("type3"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("uplift"),
        (F.col("p_size") % 5).cast("long").alias("size_mod5"),
        F.round(F.sqrt(F.abs(F.col("p_retailprice"))), 6).alias("sqrt_price"),
    )


SCALAR_FUNCS_PART_SQL = """
SELECT p_partkey,
       upper(p_name)                        AS name_upper,
       substr(p_type, 1, 3)                 AS type3,
       CAST(length(p_name) AS BIGINT)       AS name_len,
       concat_ws('/', p_brand, p_type)      AS brand_type,
       round(p_retailprice * 1.1, 2)        AS uplift,
       CAST(p_size % 5 AS BIGINT)           AS size_mod5,
       round(sqrt(abs(p_retailprice)), 6)   AS sqrt_price
FROM part
"""


def date_parts_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.month("o_orderdate").cast("long").alias("mo"),
            F.quarter("o_orderdate").cast("long").alias("qtr"),
        )
        .groupBy("yr", "mo", "qtr")
        .agg(F.count("*").alias("n"))
    )


DATE_PARTS_ORDERS_SQL = """
SELECT CAST(extract(year FROM o_orderdate) AS BIGINT)    AS yr,
       CAST(extract(month FROM o_orderdate) AS BIGINT)   AS mo,
       CAST(extract(quarter FROM o_orderdate) AS BIGINT) AS qtr,
       count(*) AS n
FROM orders
GROUP BY 1, 2, 3
"""


# ------------------------------------------------------- events: JSON

def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.round(F.sum("k").cast("double") / F.count("k"), 6)
            .alias("avg_k"),
            F.max("k").alias("max_k"),
            F.count("*").alias("n"),
        )
    )


EVENTS_JSON_EXTRACT_SQL = """
SELECT event_type,
       round(CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                  AS DOUBLE)
             / count(CAST(json_extract_string(props, '$.k') AS BIGINT)),
             6) AS avg_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT))           AS max_k,
       count(*)                                                         AS n
FROM events
GROUP BY event_type
"""


# ------------------------------------------- events: time-bucket agg

def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(
                F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss"
            ).alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            dsum("value", 4).alias("sum_value"),
            davg("value", 6).alias("avg_value"),
        )
    )


EVENTS_HOURLY_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type,
       count(*)              AS n,
       CAST(round(sum(CAST(value AS DECIMAL(12,2))), 4) AS DOUBLE)
           AS sum_value,
       round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
             / count(value), 6) AS avg_value
FROM events
GROUP BY 1, 2
"""


# -------------------------------------------------- sessionization

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min in microseconds


def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    prev = F.lag(us).over(w)
    new_session = F.when(
        prev.isNull() | ((us - prev) > SESSION_GAP_US), 1
    ).otherwise(0)
    return (
        e.select("user_id", new_session.alias("ns"))
        .groupBy("user_id")
        .agg(F.sum("ns").alias("n_sessions"))
    )


SESSIONIZATION_SQL = f"""
SELECT user_id, CAST(sum(ns) AS BIGINT) AS n_sessions
FROM (
    SELECT user_id,
           CASE WHEN prev_us IS NULL
                  OR (us - prev_us) > {SESSION_GAP_US} THEN 1 ELSE 0
           END AS ns
    FROM (
        SELECT user_id, epoch_us(ts) AS us,
               lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        FROM events
    )
)
GROUP BY user_id
"""


# ------------------------------------------------------- pivot-style

EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


def pivot_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    aggs = [
        F.sum(
            F.when(F.col("event_type") == t, 1).otherwise(0)
        ).alias(f"n_{t}")
        for t in EVENT_TYPES
    ]
    return (
        e.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
        )
        .agg(*aggs, dsum("value", 4).alias("total_value"))
    )


# CAST(... AS BIGINT): DuckDB sum(INTEGER) returns HUGEINT, which
# pandas renders float64 — the driver hashes 5.0 != 5 vs Spark int64.
PIVOT_EVENTS_DAILY_SQL = f"""
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       {", ".join(
           "CAST(sum(CASE WHEN event_type = "
           f"'{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}"
           for t in EVENT_TYPES
       )},
       CAST(round(sum(CAST(value AS DECIMAL(12,2))), 4) AS DOUBLE)
           AS total_value
FROM events
GROUP BY 1
"""


# ------------------------------------------- window over aggregate

def priority_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    # Per-group and grand-total sums both stay exact decimal; the
    # share division happens on identical doubles in both engines.
    per = o.groupBy("o_orderpriority").agg(
        F.sum(money("o_totalprice")).alias("_rev")
    )
    total = Window.partitionBy()
    return per.select(
        "o_orderpriority",
        F.round("_rev", 2).cast("double").alias("revenue"),
        F.round(
            F.col("_rev").cast("double")
            / F.sum("_rev").over(total).cast("double"),
            6,
        ).alias("share"),
    )


PRIORITY_REVENUE_SHARE_SQL = """
SELECT o_orderpriority,
       CAST(round(rev, 2) AS DOUBLE)       AS revenue,
       round(CAST(rev AS DOUBLE)
             / CAST(sum(rev) OVER () AS DOUBLE), 6) AS share
FROM (
    SELECT o_orderpriority,
           sum(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
    FROM orders GROUP BY o_orderpriority
)
"""


# ----------------------------------------------- dim-chain broadcast

def suppliers_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            dsum("s_acctbal", 2).alias("total_bal"),
        )
    )


SUPPLIERS_PER_REGION_SQL = """
SELECT r_name, count(*) AS n_suppliers,
       CAST(round(sum(CAST(s_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE)
           AS total_bal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""



# ------------------------------------------------------------- as-of

def asof_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event joined to its user's most recent order at or before
    the event time (backward-inclusive as-of join — an operator Spark
    lacks natively; see operators/temporal.py for the single-shuffle
    union+window construction)."""
    from bigdata_elephant_spark.operators import temporal

    ev = _t(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"
    )
    r = temporal.dedupe_right(
        orders, "o_custkey", "o_orderdate", "o_orderkey"
    )
    out = temporal.asof_join(
        ev, r, "user_id", "o_custkey", "ts", "o_orderdate"
    )
    return out.select(
        "event_id",
        "user_id",
        "o_orderkey",
        F.round("o_totalprice", 4).alias("o_totalprice"),
    )


# DuckDB has a native ASOF JOIN — the ideal independent oracle for
# our hand-built operator (same dedupe so ties are well-defined).
ASOF_EVENTS_ORDERS_SQL = """
WITH r AS (
    SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
        SELECT *, row_number() OVER (
            PARTITION BY o_custkey, o_orderdate
            ORDER BY o_orderkey DESC) AS rn
        FROM orders
    ) WHERE rn = 1
)
SELECT e.event_id, e.user_id, r.o_orderkey,
       round(r.o_totalprice, 4) AS o_totalprice
FROM events e ASOF LEFT JOIN r
  ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
"""


ASOF_FWD_TOL_S = 6 * 3600


def asof_error_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance: each error event joined to the
    same user's next purchase at-or-after it, nulled when the gap
    exceeds 6 hours (pandas merge_asof semantics). Same single-
    shuffle union+window operator as the backward flagship, with the
    window walked in reverse; the tolerance is one filter on the
    carried right timestamp — no extra join. Oracle: DuckDB's native
    forward ASOF (`<=`) plus an explicit CASE mask."""
    from bigdata_elephant_spark.operators import temporal

    ev = _t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_event"),
        # second copy rides as a carried value column so the caller
        # can compute the gap after the operator drops its internals
        F.col("ts").alias("p_ts_out"),
    )
    r = temporal.dedupe_right(purchases, "p_user", "p_ts", "p_event")
    out = temporal.asof_join(
        errors, r, "user_id", "p_user", "ts", "p_ts",
        direction="forward", tolerance_s=ASOF_FWD_TOL_S,
    )
    return out.select(
        "event_id",
        "user_id",
        "p_event",
        (F.col("p_ts_out").cast("long") - F.col("ts").cast("long"))
        .alias("gap_s"),
    )


ASOF_ERROR_NEXT_PURCHASE_SQL = f"""
WITH l AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
),
r2 AS (
    SELECT p_user, p_ts, p_event FROM (
        SELECT user_id AS p_user, ts AS p_ts, event_id AS p_event,
               row_number() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase'
    ) WHERE rn = 1
),
j AS (
    SELECT l.event_id, l.user_id, l.ts, r2.p_event, r2.p_ts
    FROM l ASOF LEFT JOIN r2
      ON l.user_id = r2.p_user AND l.ts <= r2.p_ts
)
SELECT event_id, user_id,
       CASE WHEN p_ts IS NOT NULL
             AND date_diff('second', ts, p_ts) <= {ASOF_FWD_TOL_S}
            THEN p_event END AS p_event,
       CASE WHEN p_ts IS NOT NULL
             AND date_diff('second', ts, p_ts) <= {ASOF_FWD_TOL_S}
            THEN CAST(date_diff('second', ts, p_ts) AS BIGINT)
       END AS gap_s
FROM j
"""


# ------------------------------------------------- percentiles / sets

def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (interpolating, = SQL percentile_cont) per
    event type. Exact medians are holistic (need the sorted group in
    one place) — fine per *group*; the approximate sketch
    (percentile_approx) is the 100 TB default when groups are huge."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


VALUE_PERCENTILES_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6)  AS p50,
       round(quantile_cont(value, 0.9), 6)  AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events
GROUP BY event_type
"""


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (finer control than rollup/cube: only
    the combinations that get read, no wasted shuffle volume)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(GROUPING_SETS_SQL)


GROUPING_SETS_SQL = """
SELECT o_orderstatus,
       o_orderpriority,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
           AS revenue,
       count(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                        (o_orderstatus, o_orderpriority))
"""


def full_outer_nation_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: every nation and every supplier count, nations
    with no suppliers and (hypothetical) orphan suppliers both kept."""
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    per_nation = s.groupBy("s_nationkey").agg(F.count("*").alias("n_sup"))
    return (
        n.join(
            per_nation,
            n["n_nationkey"] == per_nation["s_nationkey"],
            "full_outer",
        )
        .select(
            "n_nationkey",
            "n_name",
            F.coalesce(F.col("n_sup"), F.lit(0)).alias("n_sup"),
        )
    )


FULL_OUTER_SQL = """
SELECT n_nationkey, n_name, coalesce(n_sup, 0) AS n_sup
FROM nation n
FULL OUTER JOIN (
    SELECT s_nationkey, count(*) AS n_sup FROM supplier GROUP BY 1
) s ON n.n_nationkey = s.s_nationkey
"""


def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-scan data-quality profile (operators/profiling.py) of
    the orders table's non-float columns (floats are excluded from
    the oracle-checked profile because engines format them
    differently when rendered to string)."""
    from bigdata_elephant_spark.operators.profiling import profile

    return profile(
        _t(spark, sf_dir, "orders"),
        ["o_orderkey", "o_orderstatus", "o_orderpriority", "o_orderdate"],
    )


def _profile_col_sql(c: str) -> str:
    return f"""
    SELECT '{c}' AS "column",
           CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nulls,
           CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(min({c}) AS VARCHAR) AS min_str,
           CAST(max({c}) AS VARCHAR) AS max_str
    FROM orders"""


PROFILE_ORDERS_SQL = "\nUNION ALL\n".join(
    _profile_col_sql(c)
    for c in ("o_orderkey", "o_orderstatus", "o_orderpriority",
              "o_orderdate")
)


def window_frames_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/ntile/percent_rank in one pass — all share one window
    spec, so Catalyst plans a single sort+Window (one shuffle)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.lag("o_orderkey").over(w).alias("prev_ok"),
        F.lead("o_orderkey").over(w).alias("next_ok"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


WINDOW_FRAMES_SQL = """
SELECT o_orderkey, o_custkey,
       lag(o_orderkey)  OVER w AS prev_ok,
       lead(o_orderkey) OVER w AS next_ok,
       CAST(ntile(4) OVER w AS INTEGER) AS quartile,
       round(percent_rank() OVER w, 6)  AS pct_rank
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
"""


def array_agg_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-valued aggregation: per event type, the sorted distinct
    user list (sort_array makes collect_set deterministic). Emitted
    as a comma-joined string: the driver's pandas canonicalizer
    cannot hash list cells (r01 recorded ``TypeError: unhashable
    type: 'list'``), and a string carries the same information."""
    e = _t(spark, sf_dir, "events")
    users = F.sort_array(F.collect_set("user_id"))
    return e.groupBy("event_type").agg(
        F.array_join(
            F.transform(users, lambda x: x.cast("string")), ","
        ).alias("users"),
        F.count_distinct("user_id").alias("n_users"),
    )


ARRAY_AGG_USERS_SQL = """
SELECT event_type,
       array_to_string(list_sort(list(DISTINCT user_id)), ',') AS users,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY event_type
"""


def gap_fill_hourly_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly rollup with forward fill (hypertable-style
    continuous aggregate; operators/temporal.py)."""
    from bigdata_elephant_spark.operators import temporal

    return temporal.gap_fill_hourly(_t(spark, sf_dir, "events"))


GAP_FILL_SQL = """
WITH hourly AS (
    SELECT user_id, date_trunc('hour', ts) AS hour,
           round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
                 / count(value), 6) AS avg_raw
    FROM events GROUP BY 1, 2
),
spans AS (
    SELECT user_id, min(hour) AS h0, max(hour) AS h1 FROM hourly GROUP BY 1
),
grid AS (
    SELECT user_id,
           unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
    FROM spans
),
joined AS (
    SELECT g.user_id, g.hour, h.avg_raw
    FROM grid g LEFT JOIN hourly h USING (user_id, hour)
)
SELECT user_id, hour,
       last_value(avg_raw IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY hour
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS avg_value,
       avg_raw IS NULL AS filled
FROM joined
"""


def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self range join via interval bucketing (operators/temporal.py):
    per event, count of same-user events within the next 30 minutes."""
    from bigdata_elephant_spark.operators import temporal

    return temporal.range_join_counts(_t(spark, sf_dir, "events"))


RANGE_JOIN_SQL = """
WITH base AS (
    SELECT user_id AS k, event_id AS eid, epoch_us(ts) AS t FROM events
)
SELECT b.k AS user_id, b.eid AS event_id,
       CAST(coalesce(m.n, 0) AS BIGINT) AS n_following
FROM base b
LEFT JOIN (
    SELECT a.k, a.eid, count(*) AS n
    FROM base a JOIN base c
      ON a.k = c.k AND c.t > a.t AND c.t <= a.t + 30 * 60 * 1000000
    GROUP BY 1, 2
) m ON m.k = b.k AND m.eid = b.eid
"""


# --------------------------------------------- more TPC-H analogues

def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 analogue: shipped revenue between (supplier nation,
    customer nation) pairs per year. Fact tables join on their keys
    (shuffle, AQE-skew-safe); nation is broadcast twice under
    different aliases."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"),
                  F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"),
                  F.col("n_name").alias("cust_nation"))
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(maybe_broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(maybe_broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n1), s["s_nationkey"] == F.col("s_nk"))
        .join(F.broadcast(n2), c["c_nationkey"] == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(dsum_expr(
            money("l_extendedprice") * (1 - rate("l_discount")), 2
        ).alias("revenue"))
    )


# r01 red row: float summation order differed between engines and
# round(..., 2) exposed the last ulp on ~5e5 sums. Decimal sums are
# order-independent, so this is now exact at any partitioning.
Q7_SQL = """
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders    ON l_orderkey = o_orderkey
JOIN customer  ON o_custkey = c_custkey
JOIN supplier  ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 analogue: top-20 customers by revenue lost to
    returned items."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        l.filter(F.col("l_returnflag") == "R")
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(maybe_broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum_expr(
            money("l_extendedprice") * (1 - rate("l_discount")), 2
        ).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 analogue: orders whose total quantity exceeds a
    threshold, with their customers — aggregate-then-join (the agg
    runs on lineitem alone; only qualifying orders join outward)."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(dsum("l_quantity", 2).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(maybe_broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate",
                "total_qty")
    )


Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate, total_qty
FROM (
    SELECT l_orderkey,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE)
               AS total_qty
    FROM lineitem GROUP BY 1
    HAVING CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE)
           > 150
) big
JOIN orders   ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 analogue: distribution of customers by order count —
    left join keeps zero-order customers, then a two-level
    aggregation (count per customer, then customers per count)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
)
GROUP BY c_count
"""


def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event values via width_bucket — the
    single-pass distribution profile (each row maps to a bucket in
    the projection; one partial-aggregated groupBy)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.select(
            F.width_bucket("value", F.lit(0.0), F.lit(100.0), F.lit(20))
            .cast("long")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


# DuckDB has no width_bucket; the oracle spells out its arithmetic
# (0 below range, n_buckets+1 at/above max, else floor(v/width)+1).
VALUE_HISTOGRAM_SQL = """
SELECT CASE WHEN value < 0.0 THEN 0
            WHEN value >= 100.0 THEN 21
            ELSE CAST(floor(value / 5.0) AS BIGINT) + 1
       END AS bucket,
       count(*) AS n
FROM events
GROUP BY 1
"""


def time_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-hierarchy rollup: revenue at year -> quarter -> month
    grain plus grand totals in one aggregation pass (each rollup
    level is a partial re-aggregation of the previous, not a
    rescan)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").alias("y"),
            F.quarter("o_orderdate").alias("q"),
            F.month("o_orderdate").alias("m"),
            "o_totalprice",
        )
        .rollup("y", "q", "m")
        .agg(
            dsum("o_totalprice", 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


TIME_ROLLUP_SQL = """
SELECT CAST(year(o_orderdate) AS INTEGER)    AS y,
       CAST(quarter(o_orderdate) AS INTEGER) AS q,
       CAST(month(o_orderdate) AS INTEGER)   AS m,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
           AS revenue,
       count(*) AS n_orders
FROM orders
GROUP BY ROLLUP (1, 2, 3)
"""


def activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x hour-of-day event activity matrix — the
    operational dashboard query (two cheap date parts, one agg)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.select(
            F.dayofweek("ts").alias("dow"),
            F.hour("ts").alias("hod"),
            "value",
        )
        .groupBy("dow", "hod")
        .agg(
            F.count("*").alias("n"),
            davg("value", 6).alias("avg_value"),
        )
    )


# Spark dayofweek: 1=Sunday..7=Saturday; DuckDB dayofweek: 0=Sunday..6
ACTIVITY_HEATMAP_SQL = """
SELECT CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
       CAST(hour(ts) AS INTEGER)          AS hod,
       count(*) AS n,
       round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
             / count(value), 6) AS avg_value
FROM events
GROUP BY 1, 2
"""


def setop_except_all_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset EXCEPT ALL: order-priority rows of open orders minus
    those of fulfilled orders, keeping duplicates (bag semantics —
    the count of each surviving row = count(left) - count(right))."""
    o = _t(spark, sf_dir, "orders")
    left = o.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    right = o.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    return left.exceptAll(right).groupBy("o_orderpriority").agg(
        F.count("*").alias("n")
    )


SETOP_EXCEPT_ALL_SQL = """
SELECT o_orderpriority, count(*) AS n FROM (
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
)
GROUP BY 1
"""


def conditional_aggs_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-clause conditional aggregation: one pass computes
    per-flag metrics without pivot or self-join."""
    l = _t(spark, sf_dir, "lineitem")
    returned = F.col("l_returnflag") == "R"
    big = F.col("l_quantity") > 30
    price_r = F.when(returned, money("l_extendedprice"))
    return l.groupBy("l_linestatus").agg(
        F.count_if(returned).alias("n_returned"),
        F.count_if(big).alias("n_big"),
        F.round(
            F.sum(price_r).cast("double") / F.count(price_r), 6
        ).alias("avg_price_returned"),
        F.round(
            F.coalesce(
                F.sum(F.when(big, money("l_quantity"))),
                F.lit(0).cast("decimal(12,2)"),
            ),
            2,
        ).cast("double").alias("qty_big"),
    )


CONDITIONAL_AGGS_SQL = """
SELECT l_linestatus,
       count(*) FILTER (WHERE l_returnflag = 'R') AS n_returned,
       count(*) FILTER (WHERE l_quantity > 30)    AS n_big,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)))
                  FILTER (WHERE l_returnflag = 'R') AS DOUBLE)
             / count(*) FILTER (WHERE l_returnflag = 'R'), 6)
           AS avg_price_returned,
       CAST(round(coalesce(sum(CAST(l_quantity AS DECIMAL(12,2)))
                           FILTER (WHERE l_quantity > 30),
                           0), 2) AS DOUBLE)
           AS qty_big
FROM lineitem
GROUP BY 1
"""


def string_agg_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: nations per region as one sorted
    comma-joined string (deterministic because the collected set is
    sorted before joining)."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name")
        .agg(
            F.concat_ws(
                ",", F.sort_array(F.collect_list("n_name"))
            ).alias("nations"),
            F.count("*").alias("n_nations"),
        )
    )


STRING_AGG_SQL = """
SELECT r_name,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       count(*) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY 1
"""

# ------------------------------------- TPC-H analogues, second wave
# (adapted to the testdata schema: no partsupp/shipmode/phone
# columns, so Q2/Q12/Q21/Q22 shapes are not reproducible; each query
# below keeps its original's *plan shape*, which is what matters.)

_DISC_PRICE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) "
    "* (1 - CAST(l_discount AS DECIMAL(4,2)))"
)


def _disc_price() -> "Column":
    return money("l_extendedprice") * (1 - rate("l_discount"))


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 analogue: pure filter + single aggregate — the
    predicate-pushdown showcase (all three filters reach the parquet
    scan; no join, no groupBy shuffle, one partial+final agg)."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(money("l_extendedprice") * rate("l_discount")), 2
            ).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


Q6_SQL = """
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE)
           AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 analogue: NATION_3's share of ASIA-customer revenue
    per year — conditional aggregation over a fact-fact join with
    broadcast dimension chains on both the customer and supplier
    sides."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    cust_nat = (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey")
    )
    supp_nat = s.join(
        F.broadcast(
            n.select(
                F.col("n_nationkey").alias("sn_key"),
                F.col("n_name").alias("supp_nation"),
            )
        ),
        s["s_nationkey"] == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    vol = _disc_price()
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(maybe_broadcast(cust_nat, size_of=c), o["o_custkey"] == cust_nat["c_custkey"])
        .join(maybe_broadcast(supp_nat, size_of=s), l["l_suppkey"] == supp_nat["s_suppkey"])
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
                    F.lit(0).cast("decimal(12,2)")
                )
            ).alias("_nat"),
            F.sum(vol).alias("_all"),
        )
        .select(
            "o_year",
            F.round(
                F.col("_nat").cast("double") / F.col("_all").cast("double"),
                6,
            ).alias("mkt_share"),
        )
    )


Q8_SQL = f"""
SELECT o_year,
       round(CAST(nat AS DOUBLE) / CAST(total AS DOUBLE), 6) AS mkt_share
FROM (
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           sum(CASE WHEN sn.n_name = 'NATION_3'
                    THEN {_DISC_PRICE_SQL}
                    ELSE CAST(0 AS DECIMAL(12,2)) END) AS nat,
           sum({_DISC_PRICE_SQL}) AS total
    FROM lineitem
    JOIN orders    ON l_orderkey = o_orderkey
    JOIN customer  ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region    ON cn.n_regionkey = r_regionkey
    JOIN supplier  ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE r_name = 'ASIA'
    GROUP BY 1
)
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 analogue: profit by supplier nation and year. The
    schema has no partsupp.ps_supplycost, so cost is modeled as
    0.5 * p_retailprice * l_quantity — same join/agg shape (fact scan
    filtered through a part-name predicate, two broadcast dims)."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("a"))
    amount = _disc_price() - (
        money("p_retailprice") * money("l_quantity") * rate(F.lit(0.5))
    )
    return (
        l.join(maybe_broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(maybe_broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 2).cast("double").alias("sum_profit"))
    )


Q9_SQL = f"""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(round(sum({_DISC_PRICE_SQL}
                      - CAST(p_retailprice AS DECIMAL(12,2))
                        * CAST(l_quantity AS DECIMAL(12,2))
                        * CAST(0.5 AS DECIMAL(4,2))), 2) AS DOUBLE)
           AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%a%'
GROUP BY 1, 2
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 analogue: PROMO parts' share of monthly revenue —
    conditional aggregation after a broadcast part join."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    vol = _disc_price()
    return (
        l.join(maybe_broadcast(p), l["l_partkey"] == p["p_partkey"])
        .groupBy(
            F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM")
            .alias("month")
        )
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", vol).otherwise(
                    F.lit(0).cast("decimal(12,2)")
                )
            ).alias("_promo"),
            F.sum(vol).alias("_all"),
        )
        .select(
            "month",
            F.round(
                F.lit(100.0)
                * F.col("_promo").cast("double")
                / F.col("_all").cast("double"),
                6,
            ).alias("promo_pct"),
        )
    )


Q14_SQL = f"""
SELECT month,
       round(100.0 * CAST(promo AS DOUBLE) / CAST(total AS DOUBLE), 6)
           AS promo_pct
FROM (
    SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
           sum(CASE WHEN p_type = 'PROMO' THEN {_DISC_PRICE_SQL}
                    ELSE CAST(0 AS DECIMAL(12,2)) END) AS promo,
           sum({_DISC_PRICE_SQL}) AS total
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1
)
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 analogue: supplier(s) with the maximum quarterly
    revenue. The per-supplier aggregate is supplier-sized (tiny vs
    the fact table), so the global max is a window over the aggregate
    output, not over raw data — the exact-decimal revenue makes the
    max comparison exact."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-04-01")))
    )
    s = _t(spark, sf_dir, "supplier")
    rev = l.groupBy("l_suppkey").agg(F.sum(_disc_price()).alias("_rev"))
    w = Window.partitionBy()
    top = rev.withColumn("_max", F.max("_rev").over(w)).filter(
        F.col("_rev") == F.col("_max")
    )
    return (
        top.join(maybe_broadcast(s), top["l_suppkey"] == s["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            F.round("_rev", 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


Q15_SQL = f"""
WITH revenue AS (
    SELECT l_suppkey, sum({_DISC_PRICE_SQL}) AS rev
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    GROUP BY 1
)
SELECT s_suppkey, s_name,
       CAST(round(rev, 2) AS DOUBLE) AS total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE rev = (SELECT max(rev) FROM revenue)
ORDER BY s_suppkey
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 analogue: weekly-ish revenue that would be lost by
    dropping small orders — per-part average quantity threshold via a
    window over the part key (the correlated-subquery shape, executed
    as one pass instead of a per-row rescan). The threshold uses the
    exact-decimal sum/count so both engines compare the identical
    double."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    w = Window.partitionBy("l_partkey")
    joined = l.join(maybe_broadcast(p), l["l_partkey"] == p["p_partkey"])
    avg_qty = (
        F.sum(money("l_quantity")).over(w).cast("double")
        / F.count("l_quantity").over(w)
    )
    return (
        joined.withColumn("_avg", avg_qty)
        .filter(F.col("l_quantity") < 0.2 * F.col("_avg"))
        .agg(
            F.round(
                F.sum(money("l_extendedprice")).cast("double") / 7.0, 2
            ).alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )


Q17_SQL = """
WITH j AS (
    SELECT l_partkey, l_quantity, l_extendedprice
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#11'
),
t AS (
    SELECT l_partkey,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
           / count(l_quantity) AS avg_q
    FROM j GROUP BY 1
)
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             / 7.0, 2) AS avg_yearly,
       count(*) AS n_items
FROM j JOIN t USING (l_partkey)
WHERE l_quantity < 0.2 * avg_q
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 analogue: revenue under three OR-ed brand/size/
    quantity predicate bundles — the disjunctive-pushdown shape (the
    whole OR tree is still a scan-level predicate after the broadcast
    part join)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = l.join(maybe_broadcast(p), l["l_partkey"] == p["p_partkey"])
    b1 = (
        (F.col("p_brand") == "Brand#11")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(1, 11))
    )
    b2 = (
        (F.col("p_brand") == "Brand#21")
        & (F.col("p_size").between(1, 25))
        & (F.col("l_quantity").between(10, 20))
    )
    b3 = (
        (F.col("p_brand") == "Brand#31")
        & (F.col("p_size").between(1, 35))
        & (F.col("l_quantity").between(20, 30))
    )
    return j.filter(b1 | b2 | b3).agg(
        F.round(F.sum(_disc_price()), 2).cast("double").alias("revenue"),
        F.count("*").alias("n_items"),
    )


Q19_SQL = f"""
SELECT CAST(round(sum({_DISC_PRICE_SQL}), 2) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#31' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""


def window_value_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value window functions (first/last/nth/cume_dist) sharing one
    window spec — a single sort+Window pass; last_value needs the
    full-partition frame or it degenerates to the current row."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    wfull = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first_value("o_orderkey").over(w).alias("first_ok"),
        F.last_value("o_orderkey").over(wfull).alias("last_ok"),
        F.nth_value("o_orderkey", 2).over(wfull).alias("second_ok"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


WINDOW_VALUE_FUNCS_SQL = """
SELECT o_custkey, o_orderkey,
       first_value(o_orderkey) OVER w AS first_ok,
       last_value(o_orderkey) OVER wf AS last_ok,
       nth_value(o_orderkey, 2) OVER wf AS second_ok,
       round(cume_dist() OVER w, 6) AS cd
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey),
       wf AS (PARTITION BY o_custkey ORDER BY o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


AGING_REF_DATE = "2001-01-01"


def order_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic surface: day diffs against a reference date,
    end-of-month-clamped add_months due dates, age bucketing — one
    scan, one aggregation."""
    o = _t(spark, sf_dir, "orders")
    age = F.datediff(F.to_date(F.lit(AGING_REF_DATE)), F.to_date("o_orderdate"))
    bucket = (
        F.when(age < 365, "lt_1y")
        .when(age < 730, "1y_2y")
        .when(age < 1460, "2y_4y")
        .otherwise("ge_4y")
    )
    return (
        o.select(
            bucket.alias("age_bucket"),
            age.cast("long").alias("age_days"),
            F.add_months(F.to_date("o_orderdate"), 3).alias("due"),
        )
        .groupBy("age_bucket")
        .agg(
            F.count("*").alias("n"),
            F.max("age_days").alias("max_age"),
            F.date_format(F.max("due"), "yyyy-MM-dd").alias("max_due"),
        )
    )


ORDER_AGING_SQL = f"""
SELECT age_bucket, count(*) AS n,
       CAST(max(age_days) AS BIGINT) AS max_age,
       strftime(max(due), '%Y-%m-%d') AS max_due
FROM (
    SELECT CASE WHEN age < 365 THEN 'lt_1y'
                WHEN age < 730 THEN '1y_2y'
                WHEN age < 1460 THEN '2y_4y'
                ELSE 'ge_4y' END AS age_bucket,
           age AS age_days,
           CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS due
    FROM (
        SELECT o_orderdate,
               date_diff('day', CAST(o_orderdate AS DATE),
                         DATE '{AGING_REF_DATE}') AS age
        FROM orders
    )
)
GROUP BY 1
"""


# ----------------------------------------------------------------
# Second batch of TPC-H plan-shape analogues. The testdata schema has
# no partsupp / l_shipmode / l_commitdate / l_receiptdate / c_phone,
# so Q2/Q4/Q11/Q12/Q16/Q20/Q21/Q22 cannot be reproduced literally;
# each query below re-creates the original's *plan shape* — the part
# that matters for a query engine — on the columns that exist:
#   Q2  decorrelated per-group MIN subquery + join-back on the min
#   Q4  EXISTS semi-join with a cross-table predicate, priority count
#   Q11 group aggregate HAVING > fraction-of-global scalar subquery
#   Q12 fact-fact join + CASE-sum pivot over a derived dimension
#   Q16 distinct-count aggregate behind a NOT-IN anti-join
#   Q20 nested aggregate → threshold filter → semi-join chain
#   Q21 EXISTS + NOT-EXISTS self-joins, decorrelated to one pass
#   Q22 scalar AVG subquery + anti-join + group aggregate
# (`lineitem` stands in for partsupp as the part↔supplier bridge.)


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 analogue: for each PROMO part, the EUROPE supplier
    offering it at the minimum observed unit price. The correlated
    MIN subquery is decorrelated into one per-(part,supplier)
    aggregate, a per-part min, and an equality join-back — the
    standard rewrite; ties (shared min) surface on both engines.
    Unit price is a per-row double division rounded to 6 decimals
    *before* MIN, so both engines take the min of identical doubles
    and the join-back equality is exact."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "PROMO") & F.col("p_size").between(10, 30)
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    elig = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    unit = F.round(F.col("l_extendedprice") / F.col("l_quantity"), 6)
    costs = (
        l.join(maybe_broadcast(p.select("p_partkey")),
               l.l_partkey == F.col("p_partkey"))
        .join(maybe_broadcast(elig, size_of=s), l.l_suppkey == elig.s_suppkey)
        .groupBy("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(unit).alias("cost"))
    )
    # Per-part min via a window, not a groupBy + self-join: the self-
    # join form re-executes the whole costs subtree (two lineitem
    # scans — visible as a duplicated plan branch); the window reuses
    # the aggregate output with one extra partkey shuffle of the
    # already part×supplier-sized data.
    w_part = Window.partitionBy("p_partkey")
    return (
        costs.withColumn("min_cost", F.min("cost").over(w_part))
        .filter(F.col("cost") == F.col("min_cost"))
        .select(
            "p_partkey", "s_name", "n_name",
            F.round("s_acctbal", 2).alias("acctbal"),
            F.col("cost"),
        )
        .orderBy(F.desc("acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q2_SQL = """
WITH elig AS (
    SELECT s_suppkey, s_name, s_acctbal, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
),
costs AS (
    SELECT l_partkey AS p_partkey, s_suppkey, s_name, s_acctbal, n_name,
           min(round(l_extendedprice / l_quantity, 6)) AS cost
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN elig ON l_suppkey = s_suppkey
    WHERE p_type = 'PROMO' AND p_size BETWEEN 10 AND 30
    GROUP BY 1, 2, 3, 4, 5
),
mins AS (
    SELECT p_partkey, min(cost) AS min_cost FROM costs GROUP BY 1
)
SELECT c.p_partkey, c.s_name, c.n_name,
       round(c.s_acctbal, 2) AS acctbal, c.cost
FROM costs c JOIN mins m
  ON c.p_partkey = m.p_partkey AND c.cost = m.min_cost
ORDER BY acctbal DESC, c.n_name, c.s_name, c.p_partkey
LIMIT 100
"""


def q4_priority_timeliness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analogue: orders placed in 1997Q3 that had at least
    one line shipped more than 60 days after the order date, counted
    per priority. The EXISTS becomes a left-semi join whose condition
    references both sides (key equality + the lateness inequality) —
    Catalyst keeps the equi-part as the join key and evaluates the
    inequality as a join residual, so the fact table still shuffles
    only on orderkey."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-07-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-10-01")))
    )
    l = _t(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_late"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS n_late
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-07-01'
  AND o_orderdate <  TIMESTAMP '1997-10-01'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY 1 ORDER BY 1
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 analogue: parts whose NATION_3-supplied revenue
    exceeds 1/1000 of that nation's total — a grouped aggregate
    filtered against a global scalar aggregate. The threshold
    comparison is done as ``value * 1000 > total`` in exact decimal
    (both sides are decimal sums of identical inputs), so no float
    boundary can flip membership; the fraction never becomes an
    inexact multiplier."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    j = l.join(
        maybe_broadcast(
            s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .select("s_suppkey"),
            size_of=s,
        ),
        l.l_suppkey == F.col("s_suppkey"),
    )
    vals = j.groupBy("l_partkey").agg(
        F.sum(_disc_price()).alias("_val")
    )
    total = vals.agg(F.sum("_val").alias("_total"))
    return (
        vals.crossJoin(F.broadcast(total))
        .filter(F.col("_val") * 1000 > F.col("_total"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.round(F.col("_val"), 2).cast("double").alias("value"),
        )
        .orderBy(F.desc("value"), "partkey")
    )


Q11_SQL = f"""
WITH vals AS (
    SELECT l_partkey AS partkey, sum({_DISC_PRICE_SQL}) AS val
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
    GROUP BY 1
)
SELECT partkey, CAST(round(val, 2) AS DOUBLE) AS value
FROM vals
WHERE val * 1000 > (SELECT sum(val) FROM vals)
ORDER BY value DESC, partkey
"""


def q12_ship_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 analogue: 1998 shipments bucketed by order-to-ship
    delay (the derived dimension standing in for l_shipmode), with
    high- vs low-priority CASE-sum counts — the conditional-pivot
    aggregate over a fact-fact join."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1998-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1999-01-01")))
    )
    o = _t(spark, sf_dir, "orders")
    delay = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    bucket = (
        F.when(delay < 30, "fast")
        .when(delay < 60, "normal")
        .otherwise("slow")
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(bucket.alias("delay_bucket"), hi.alias("_hi"))
        .groupBy("delay_bucket")
        .agg(
            F.sum(F.when(F.col("_hi"), 1).otherwise(0)).alias("high_cnt"),
            F.sum(F.when(F.col("_hi"), 0).otherwise(1)).alias("low_cnt"),
        )
        .orderBy("delay_bucket")
    )


Q12_SQL = """
SELECT CASE WHEN delay < 30 THEN 'fast'
            WHEN delay < 60 THEN 'normal'
            ELSE 'slow' END AS delay_bucket,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_cnt,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_cnt
FROM (
    SELECT date_diff('day', CAST(o_orderdate AS DATE),
                     CAST(l_shipdate AS DATE)) AS delay,
           o_orderpriority
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_shipdate <  TIMESTAMP '1999-01-01'
)
GROUP BY 1 ORDER BY 1
"""


def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 analogue: how many distinct suppliers ship each
    (brand, type, size) combination, excluding suppliers with a
    negative balance via NOT IN — an anti-join feeding a
    distinct-count aggregate. The anti-join runs first so excluded
    suppliers never reach the shuffle."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") != "PROMO") & F.col("p_size").between(1, 30)
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        l.join(maybe_broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(maybe_broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_type <> 'PROMO' AND p_size BETWEEN 1 AND 30
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q20_excess_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 analogue: suppliers who concentrated more than 20%
    of their all-time small-part volume into 1998 — a nested
    aggregate (per-supplier conditional + total sums over a filtered
    part join) whose threshold survivors semi-join back to the
    supplier dimension. The 20% comparison is ``q98 * 5 > qall`` in
    exact decimal."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    in98 = (
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1998-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1999-01-01")))
    )
    zero = F.lit(0).cast("decimal(12,2)")
    agg = (
        l.join(maybe_broadcast(p.select("p_partkey")),
               l.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.when(in98, money("l_quantity")).otherwise(zero))
            .alias("q98"),
            F.sum(money("l_quantity")).alias("qall"),
        )
        .filter(F.col("q98") * 5 > F.col("qall"))
        .select("l_suppkey")
    )
    return (
        s.join(agg, s.s_suppkey == agg.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


Q20_SQL = """
WITH agg AS (
    SELECT l_suppkey,
           sum(CASE WHEN l_shipdate >= TIMESTAMP '1998-01-01'
                     AND l_shipdate < TIMESTAMP '1999-01-01'
                    THEN CAST(l_quantity AS DECIMAL(12,2))
                    ELSE CAST(0 AS DECIMAL(12,2)) END) AS q98,
           sum(CAST(l_quantity AS DECIMAL(12,2))) AS qall
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE 'small%'
    GROUP BY 1
)
SELECT s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE EXISTS (SELECT 1 FROM agg
              WHERE agg.l_suppkey = s_suppkey AND q98 * 5 > qall)
ORDER BY s_name
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 analogue: suppliers who were the *sole* late shipper
    (ship > order date + 60 days) on a finished multi-supplier order.
    The original's EXISTS + NOT-EXISTS self-joins are decorrelated
    into one per-order aggregate (distinct suppliers, distinct late
    suppliers) joined back to the late lines — one fact-table pass
    instead of three correlated rescans. The DuckDB oracle runs the
    textbook correlated form, so the rewrite's equivalence is checked
    every round."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = _t(spark, sf_dir, "lineitem")
    j = l.join(o, l.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_suppkey",
        (F.col("l_shipdate")
         > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("late"),
    )
    stats = j.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("late"), F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    s = _t(spark, sf_dir, "supplier")
    culprits = (
        j.filter("late")
        .join(stats, ["l_orderkey"])
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    return (
        culprits.join(maybe_broadcast(s), culprits.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


Q21_SQL = """
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey
        AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
      WHERE l3.l_orderkey = l1.l_orderkey
        AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY 1
ORDER BY numwait DESC, s_name
LIMIT 100
"""


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 analogue: above-average-balance customers in a
    nation subset with no order since 2000 — scalar AVG subquery
    (exact decimal sum / count, so both engines compare the identical
    double) + anti-join + group aggregate. c_nationkey stands in for
    the phone country code."""
    keys = [1, 3, 5, 7, 9, 11]
    c = _t(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(keys))
    recent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("2000-01-01"))
    )
    thresh = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(money("c_acctbal")).cast("double") / F.count("*"))
            .alias("_avg_bal")
        )
    )
    return (
        c.join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .groupBy(F.col("c_nationkey").cast("long").alias("nationkey"))
        .agg(
            F.count("*").alias("n_custs"),
            dsum("c_acctbal").alias("total_bal"),
        )
        .orderBy("nationkey")
    )


Q22_SQL = """
SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
       count(*) AS n_custs,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE)
           AS total_bal
FROM customer c
WHERE c_nationkey IN (1, 3, 5, 7, 9, 11)
  AND c_acctbal > (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
             / count(*)
      FROM customer
      WHERE c_acctbal > 0 AND c_nationkey IN (1, 3, 5, 7, 9, 11)
  )
  AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '2000-01-01'
  )
GROUP BY 1 ORDER BY 1
"""


SPECS = [
    QuerySpec("setop_except_all_orders", setop_except_all_orders,
              SETOP_EXCEPT_ALL_SQL, ("relational", "setop")),
    QuerySpec("conditional_aggs_lineitem", conditional_aggs_lineitem,
              CONDITIONAL_AGGS_SQL, ("relational", "agg")),
    QuerySpec("string_agg_nations", string_agg_nations,
              STRING_AGG_SQL, ("relational", "agg")),
    QuerySpec("time_rollup_revenue", time_rollup_revenue, TIME_ROLLUP_SQL,
              ("relational", "agg", "date")),
    QuerySpec("activity_heatmap", activity_heatmap, ACTIVITY_HEATMAP_SQL,
              ("events", "agg", "date")),
    QuerySpec("q13_order_count_distribution", q13_order_count_distribution,
              Q13_SQL, ("relational", "agg", "join")),
    QuerySpec("value_histogram", value_histogram, VALUE_HISTOGRAM_SQL,
              ("relational", "agg")),
    QuerySpec("q7_volume_shipping", q7_volume_shipping, Q7_SQL,
              ("relational", "join"), bench=True),
    QuerySpec("q10_returned_items", q10_returned_items, Q10_SQL,
              ("relational", "join", "topk")),
    QuerySpec("q18_large_orders", q18_large_orders, Q18_SQL,
              ("relational", "agg", "join")),
    QuerySpec("gap_fill_hourly_values", gap_fill_hourly_values,
              GAP_FILL_SQL, ("relational", "temporal")),
    QuerySpec("events_range_join", events_range_join,
              RANGE_JOIN_SQL, ("relational", "temporal"), bench=True),
    QuerySpec("window_frames_orders", window_frames_orders,
              WINDOW_FRAMES_SQL, ("relational", "window")),
    QuerySpec("array_agg_users", array_agg_users,
              ARRAY_AGG_USERS_SQL, ("relational", "agg", "array")),
    QuerySpec("profile_orders", profile_orders, PROFILE_ORDERS_SQL,
              ("relational", "profiling")),
    QuerySpec("full_outer_nation_suppliers", full_outer_nation_suppliers,
              FULL_OUTER_SQL, ("relational", "join")),
    QuerySpec("value_percentiles", value_percentiles,
              VALUE_PERCENTILES_SQL, ("relational", "agg")),
    QuerySpec("grouping_sets_revenue", grouping_sets_revenue,
              GROUPING_SETS_SQL, ("relational", "agg")),
    QuerySpec("asof_events_orders", asof_events_orders,
              ASOF_EVENTS_ORDERS_SQL, ("relational", "temporal"),
              bench=True),
    QuerySpec("asof_error_next_purchase", asof_error_next_purchase,
              ASOF_ERROR_NEXT_PURCHASE_SQL, ("relational", "temporal")),
    QuerySpec("q1_pricing_summary", q1_pricing_summary, Q1_SQL,
              ("relational", "agg"), bench=True),
    QuerySpec("q1_pricing_fast", q1_pricing_fast, None,
              ("relational", "agg", "production"), bench=True),
    QuerySpec("q3_shipping_priority", q3_shipping_priority, Q3_SQL,
              ("relational", "join", "topk"), bench=True),
    QuerySpec("q5_region_revenue", q5_region_revenue, Q5_SQL,
              ("relational", "join"), bench=True),
    QuerySpec("top_customers", top_customers, TOP_CUSTOMERS_SQL,
              ("relational", "topk"), bench=True),
    QuerySpec("window_order_rank", window_order_rank, WINDOW_ORDER_RANK_SQL,
              ("relational", "window")),
    QuerySpec("window_running_sum", window_running_sum,
              WINDOW_RUNNING_SUM_SQL, ("relational", "window")),
    QuerySpec("rollup_returns", rollup_returns, ROLLUP_RETURNS_SQL,
              ("relational", "agg")),
    QuerySpec("cube_priority_status", cube_priority_status,
              CUBE_PRIORITY_STATUS_SQL, ("relational", "agg")),
    QuerySpec("setop_nations_without_suppliers",
              setop_nations_without_suppliers,
              SETOP_NATIONS_WITHOUT_SUPPLIERS_SQL, ("relational", "setop")),
    QuerySpec("setop_common_nations", setop_common_nations,
              SETOP_COMMON_NATIONS_SQL, ("relational", "setop")),
    QuerySpec("anti_customers_no_orders", anti_customers_no_orders,
              ANTI_CUSTOMERS_NO_ORDERS_SQL, ("relational", "join")),
    QuerySpec("semi_customers_open_orders", semi_customers_open_orders,
              SEMI_CUSTOMERS_OPEN_ORDERS_SQL, ("relational", "join")),
    QuerySpec("scalar_subquery_rich_customers",
              scalar_subquery_rich_customers, SCALAR_SUBQUERY_SQL,
              ("relational", "subquery")),
    QuerySpec("scalar_funcs_part", scalar_funcs_part, SCALAR_FUNCS_PART_SQL,
              ("relational", "scalar")),
    QuerySpec("date_parts_orders", date_parts_orders, DATE_PARTS_ORDERS_SQL,
              ("relational", "scalar")),
    QuerySpec("events_json_extract", events_json_extract,
              EVENTS_JSON_EXTRACT_SQL, ("events", "json")),
    QuerySpec("events_hourly", events_hourly, EVENTS_HOURLY_SQL,
              ("events", "agg"), bench=True),
    QuerySpec("sessionization", sessionization, SESSIONIZATION_SQL,
              ("events", "window"), bench=True),
    QuerySpec("pivot_events_daily", pivot_events_daily,
              PIVOT_EVENTS_DAILY_SQL, ("events", "pivot")),
    QuerySpec("priority_revenue_share", priority_revenue_share,
              PRIORITY_REVENUE_SHARE_SQL, ("relational", "window")),
    QuerySpec("suppliers_per_region", suppliers_per_region,
              SUPPLIERS_PER_REGION_SQL, ("relational", "join")),
    QuerySpec("q6_forecast_revenue", q6_forecast_revenue, Q6_SQL,
              ("relational", "agg", "pushdown"), bench=True),
    QuerySpec("q8_market_share", q8_market_share, Q8_SQL,
              ("relational", "join", "agg")),
    QuerySpec("q9_product_profit", q9_product_profit, Q9_SQL,
              ("relational", "join", "agg")),
    QuerySpec("q14_promo_revenue", q14_promo_revenue, Q14_SQL,
              ("relational", "join", "agg")),
    QuerySpec("q15_top_supplier", q15_top_supplier, Q15_SQL,
              ("relational", "agg", "subquery")),
    QuerySpec("q17_small_quantity_revenue", q17_small_quantity_revenue,
              Q17_SQL, ("relational", "subquery", "window")),
    QuerySpec("q19_disjunctive_revenue", q19_disjunctive_revenue, Q19_SQL,
              ("relational", "join", "pushdown")),
    QuerySpec("window_value_funcs", window_value_funcs,
              WINDOW_VALUE_FUNCS_SQL, ("relational", "window")),
    QuerySpec("order_aging", order_aging, ORDER_AGING_SQL,
              ("relational", "scalar", "date")),
    QuerySpec("q2_min_cost_supplier", q2_min_cost_supplier, Q2_SQL,
              ("relational", "subquery", "join")),
    QuerySpec("q4_priority_timeliness", q4_priority_timeliness, Q4_SQL,
              ("relational", "join", "agg")),
    QuerySpec("q11_important_parts", q11_important_parts, Q11_SQL,
              ("relational", "subquery", "agg")),
    QuerySpec("q12_ship_delay_priority", q12_ship_delay_priority, Q12_SQL,
              ("relational", "join", "agg")),
    QuerySpec("q16_supplier_variety", q16_supplier_variety, Q16_SQL,
              ("relational", "join", "agg")),
    QuerySpec("q20_excess_shipments", q20_excess_shipments, Q20_SQL,
              ("relational", "subquery", "join")),
    QuerySpec("q21_waiting_suppliers", q21_waiting_suppliers, Q21_SQL,
              ("relational", "subquery", "join"), bench=True),
    QuerySpec("q22_dormant_customers", q22_dormant_customers, Q22_SQL,
              ("relational", "subquery", "agg")),
]
