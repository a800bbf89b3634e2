"""Batch-relational operator inventory (SURVEY.md §2.3, O1-O26).

The reference passes user SQL verbatim to Flink's Blink planner
(flink-streaming-core/src/main/java/com/flink/streaming/core/execute/ExecuteSql.java:53-56);
the query shapes below are the ones its demo corpus exercises
(docs/sql_demo/demo_1.md … demo_6.md, demo_batch.md, README.md
hello-world) re-expressed on the driver's TPC-H-ish corpus, plus the
Catalyst-free extensions (sort/limit, set ops, OVER windows, rollup)
Spark gives for free.

Every function takes ``(spark, sf_dir)`` and returns a DataFrame whose
logical plan is fully declarative: filters and projections reach the
parquet scan (PushedFilters/ReadSchema), aggregations get map-side
partial aggregation, dimension joins broadcast. No Python executes
per-row in any of these — everything stays inside whole-stage codegen.

``ORACLES[name]`` is the equivalent DuckDB SQL (the driver's
correctness gate); aggregate determinism strategy in `_portable.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_platform_web_spark.operators._portable import (
    DEC,
    davg,
    dsum,
    oracle_davg,
    oracle_dsum,
)
from flink_streaming_platform_web_spark.tables import load, register_views

# --------------------------------------------------------------------------
# O6/O7/O18 — grouped aggregation with arithmetic inside aggregates
# (demo_1.md `SELECT day_time, SUM(amnount) GROUP BY day_time`, widened to
# the TPC-H Q1 shape — the canonical streaming-agg-on-upsert-sink query).
# --------------------------------------------------------------------------


def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = (
        F.col("l_extendedprice").cast(DEC)
        * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
    ).cast("decimal(24,4)")
    charge = (disc_price * (F.lit(1).cast(DEC) + F.col("l_tax").cast(DEC))).cast(
        "decimal(30,6)"
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-06-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


ORACLE_Q01 = f"""
SELECT l_returnflag, l_linestatus,
       {oracle_dsum('l_quantity', 'sum_qty')},
       {oracle_dsum('l_extendedprice', 'sum_base_price')},
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                AS DECIMAL(24,4))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                AS DECIMAL(24,4))
                * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))
                AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
       {oracle_davg('l_quantity', 'avg_qty')},
       {oracle_davg('l_extendedprice', 'avg_price')},
       {oracle_davg('l_discount', 'avg_disc')},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2024-06-01'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# O3/O5 — projection + filter; both must reach the parquet scan
# (README.md:103-120 hello-world `SELECT f0, f1, f2` shape).
# --------------------------------------------------------------------------


def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 45) & (F.col("l_returnflag") == "R")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate").withColumn(
        "l_shipdate", F.date_format("l_shipdate", "yyyy-MM-dd")
    )


ORACLE_Q02 = """
SELECT l_orderkey, l_linenumber, l_quantity,
       strftime(l_shipdate, '%Y-%m-%d') AS l_shipdate
FROM lineitem
WHERE l_quantity > 45 AND l_returnflag = 'R'
"""


# --------------------------------------------------------------------------
# O4/O18 — computed columns (demo_1.md `proctime AS PROCTIME()`,
# demo_datagen.md `cost AS price * quantity`).
# --------------------------------------------------------------------------


def q03_computed_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice").cast(DEC) * F.col("l_quantity").cast(DEC))
        .cast("double")
        .alias("gross"),
        (F.col("l_quantity") * (F.lit(1.0) - F.col("l_discount"))).alias(
            "net_qty"
        ),
        F.when(F.col("l_tax") > 0.05, F.lit("high"))
        .otherwise(F.lit("low"))
        .alias("tax_band"),
    )


ORACLE_Q03 = """
SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_extendedprice AS DECIMAL(18,2))
            * CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE) AS gross,
       l_quantity * (1.0 - l_discount) AS net_qty,
       CASE WHEN l_tax > 0.05 THEN 'high' ELSE 'low' END AS tax_band
FROM lineitem
"""


# --------------------------------------------------------------------------
# O6/O7/O17 — the demo_1.md flagship: daily GMV with an upsert key
# (`SELECT day_time, SUM(amnount) AS total_gmv … GROUP BY day_time`).
# --------------------------------------------------------------------------


def q04_daily_gmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.withColumn("day_time", F.date_format("o_orderdate", "yyyyMMdd"))
        .groupBy("day_time")
        .agg(dsum("o_totalprice", "total_gmv"), F.count("*").alias("order_cnt"))
    )


ORACLE_Q04 = f"""
SELECT strftime(o_orderdate, '%Y%m%d') AS day_time,
       {oracle_dsum('o_totalprice', 'total_gmv')},
       COUNT(*) AS order_cnt
FROM orders
GROUP BY 1
"""


# --------------------------------------------------------------------------
# O12/O15 — two-source LEFT JOIN + derived-table aggregation
# (demo_2.md: orders LEFT JOIN coupons, then SUM(amnount - coupon_amnount)
# over the joined subquery, grouped by day).
# --------------------------------------------------------------------------


def q05_gmv_join_coupon(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    coupon = li.groupBy("l_orderkey").agg(
        F.sum(
            (F.col("l_extendedprice").cast(DEC) * F.col("l_discount").cast(DEC)).cast(
                "decimal(24,4)"
            )
        ).alias("coupon_amount_dec")
    )
    joined = orders.join(
        coupon, orders.o_orderkey == coupon.l_orderkey, "left_outer"
    ).select(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day_time"),
        (
            F.col("o_totalprice").cast(DEC).cast("decimal(24,4)")
            - F.coalesce(F.col("coupon_amount_dec"), F.lit(0).cast("decimal(24,4)"))
        ).alias("net_dec"),
    )
    return joined.groupBy("day_time").agg(
        F.sum("net_dec").cast("double").alias("net_gmv")
    )


ORACLE_Q05 = """
WITH coupon AS (
  SELECT l_orderkey,
         SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(24,4)))
           AS coupon_amount_dec
  FROM lineitem GROUP BY l_orderkey
)
SELECT strftime(o_orderdate, '%Y-%m-%d') AS day_time,
       CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(24,4))
                - COALESCE(coupon_amount_dec, CAST(0 AS DECIMAL(24,4))))
            AS DOUBLE) AS net_gmv
FROM orders LEFT JOIN coupon ON o_orderkey = l_orderkey
GROUP BY 1
"""


# --------------------------------------------------------------------------
# O13 — lookup/temporal join (demo_3.md `LEFT JOIN dim FOR SYSTEM_TIME AS
# OF a.proctime`): probe a small dimension per event. Spark-first: the dim
# is broadcast, so the probe never shuffles the fact side — the same plan
# a 1000-executor cluster wants.
# --------------------------------------------------------------------------


def q06_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    return (
        events.join(
            F.broadcast(cust), events.user_id == cust.c_custkey, "left_outer"
        )
        .groupBy("c_mktsegment", "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value", "sum_value"))
    )


ORACLE_Q06 = f"""
SELECT c_mktsegment, event_type, COUNT(*) AS n_events,
       {oracle_dsum('value', 'sum_value')}
FROM events LEFT JOIN customer ON user_id = c_custkey
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# O14 (batch shape) / O5 / O17 — demo_6.md wide-row enrichment:
# orders ⋈ customer ⋈ nation ⋈ region with a status filter and
# DATE_FORMAT, the `enriched_orders` materialization. Dim joins broadcast.
# --------------------------------------------------------------------------


def q07_enriched_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        orders.filter(F.col("o_orderstatus") == "F")
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_totalprice",
            "c_name",
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
        )
    )


ORACLE_Q07 = """
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       o_totalprice, c_name, n_name AS nation, r_name AS region
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE o_orderstatus = 'F'
"""


# --------------------------------------------------------------------------
# O15/O16 — CTE + derived table + top-k (demo_2.md subquery shape;
# top-k is the Catalyst-free extension). Deterministic total order.
# --------------------------------------------------------------------------


def q08_cte_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, only=("orders", "customer"))
    return spark.sql(
        """
        WITH cust_spend AS (
          SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                 AS DOUBLE) AS spend, COUNT(*) AS n_orders
          FROM orders GROUP BY o_custkey
        )
        SELECT c.c_custkey, c.c_name, s.spend, s.n_orders
        FROM cust_spend s JOIN customer c ON s.o_custkey = c.c_custkey
        ORDER BY s.spend DESC, c.c_custkey ASC
        LIMIT 10
        """
    )


ORACLE_Q08 = """
WITH cust_spend AS (
  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS spend, COUNT(*) AS n_orders
  FROM orders GROUP BY o_custkey
)
SELECT c.c_custkey, c.c_name, s.spend, s.n_orders
FROM cust_spend s JOIN customer c ON s.o_custkey = c.c_custkey
ORDER BY s.spend DESC, c.c_custkey ASC
LIMIT 10
"""


# --------------------------------------------------------------------------
# O17 — scalar datetime functions (demo_6.md DATE_FORMAT, demo_4.md
# TO_TIMESTAMP/FROM_UNIXTIME computed columns).
# --------------------------------------------------------------------------


def q09_scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.hour("o_orderdate").alias("hr"),
    )


ORACLE_Q09 = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS yr,
       CAST(month(o_orderdate) AS INT) AS mo,
       CAST(day(o_orderdate) AS INT) AS dom,
       strftime(o_orderdate, '%Y-%m') AS ym,
       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s,
       CAST(hour(o_orderdate) AS INT) AS hr
FROM orders
"""


# --------------------------------------------------------------------------
# String scalar functions (platform users' UDF-adjacent surface; O17/O23
# territory — the built-in equivalents of what the reference loads UDF
# jars for, docs/manual-sql.md §1.e).
# --------------------------------------------------------------------------


def q10_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("uname"),
        F.lower("p_brand").alias("lbrand"),
        F.substring("p_type", 1, 5).alias("type5"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.col("p_name").like("%gold%").cast("int").alias("has_gold"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("no_vowels"),
        F.trim(F.col("p_name")).alias("trimmed"),
    )


ORACLE_Q10 = """
SELECT p_partkey,
       upper(p_name) AS uname,
       lower(p_brand) AS lbrand,
       substr(p_type, 1, 5) AS type5,
       concat_ws('|', p_brand, p_type) AS brand_type,
       CAST(length(p_name) AS INT) AS name_len,
       CAST(p_name LIKE '%gold%' AS INT) AS has_gold,
       regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels,
       trim(p_name) AS trimmed
FROM part
"""


# --------------------------------------------------------------------------
# O18 — CASE WHEN buckets + HAVING (demo arithmetic/comparison surface).
# --------------------------------------------------------------------------


def q11_case_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 1000, "small")
        .when(F.col("o_totalprice") < 5000, "medium")
        .otherwise("large")
    )
    return (
        orders.groupBy(bucket.alias("price_bucket"), "o_orderpriority")
        .agg(F.count("*").alias("n"), dsum("o_totalprice", "total"))
        .filter(F.col("n") > 5)
    )


ORACLE_Q11 = f"""
SELECT CASE WHEN o_totalprice < 1000 THEN 'small'
            WHEN o_totalprice < 5000 THEN 'medium'
            ELSE 'large' END AS price_bucket,
       o_orderpriority,
       COUNT(*) AS n,
       {oracle_dsum('o_totalprice', 'total')}
FROM orders
GROUP BY 1, 2
HAVING COUNT(*) > 5
"""


# --------------------------------------------------------------------------
# Set operations (UNION / INTERSECT / EXCEPT — SURVEY §2.3 extensions).
# --------------------------------------------------------------------------


def q12_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    both = cust.intersect(supp).withColumn("src", F.lit("both"))
    # subtract == EXCEPT DISTINCT (set semantics; exceptAll would be
    # bag semantics and leave duplicated keys behind)
    cust_only = cust.distinct().subtract(supp.distinct()).withColumn(
        "src", F.lit("cust_only")
    )
    return both.unionAll(cust_only)


ORACLE_Q12 = """
SELECT nationkey, 'both' AS src FROM (
  SELECT c_nationkey AS nationkey FROM customer
  INTERSECT
  SELECT s_nationkey FROM supplier
)
UNION ALL
SELECT nationkey, 'cust_only' AS src FROM (
  SELECT DISTINCT c_nationkey AS nationkey FROM customer
  EXCEPT
  SELECT DISTINCT s_nationkey FROM supplier
)
"""


# --------------------------------------------------------------------------
# OVER window functions (rank / lag / running sum — extensions).
# --------------------------------------------------------------------------


def q13_window_over(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, only=("orders",))
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               RANK() OVER w AS rk,
               LAG(o_orderkey) OVER w AS prev_order,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate ASC,
                  o_orderkey ASC ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 AS running_spend
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate ASC, o_orderkey ASC)
        """
    )


ORACLE_Q13 = """
SELECT o_custkey, o_orderkey,
       RANK() OVER w AS rk,
       LAG(o_orderkey) OVER w AS prev_order,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
         (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
          ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
"""


# --------------------------------------------------------------------------
# ROLLUP (multi-level aggregation — extension; NULL grouping semantics
# must match the oracle's).
# --------------------------------------------------------------------------


def q14_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        F.count("*").alias("n_cust"), dsum("c_acctbal", "total_bal")
    )


ORACLE_Q14 = f"""
SELECT r_name, n_name, COUNT(*) AS n_cust,
       {oracle_dsum('c_acctbal', 'total_bal')}
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
"""


# --------------------------------------------------------------------------
# Semi/anti joins (EXISTS / NOT EXISTS — extensions; Catalyst plans
# LeftSemi/LeftAnti without materializing the probe side).
# --------------------------------------------------------------------------


def q15_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").select("o_custkey")
    with_orders = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .withColumn("status", F.lit("active"))
    )
    without = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .withColumn("status", F.lit("dormant"))
    )
    return with_orders.unionAll(without)


ORACLE_Q15 = """
SELECT c_custkey, c_name, 'active' AS status FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
UNION ALL
SELECT c_custkey, c_name, 'dormant' AS status FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# --------------------------------------------------------------------------
# O21 — VALUES inline table (demo_batch.md `insert into test values(4,'n2')`)
# joined against a real table.
# --------------------------------------------------------------------------


def q16_values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, only=("region",))
    return spark.sql(
        """
        SELECT v.rk AS regionkey, v.tag, r.r_name
        FROM VALUES (0, 'alpha'), (1, 'beta'), (2, 'gamma') AS v(rk, tag)
        JOIN region r ON r.r_regionkey = v.rk
        """
    )


ORACLE_Q16 = """
SELECT v.rk AS regionkey, v.tag, r.r_name
FROM (VALUES (0, 'alpha'), (1, 'beta'), (2, 'gamma')) AS v(rk, tag)
JOIN region r ON r.r_regionkey = v.rk
"""


# --------------------------------------------------------------------------
# DISTINCT + multi-distinct aggregation.
# --------------------------------------------------------------------------


def q17_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.countDistinct("o_orderstatus").alias("n_status"),
        F.count("*").alias("n_orders"),
    )


ORACLE_Q17 = """
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_cust,
       COUNT(DISTINCT o_orderstatus) AS n_status,
       COUNT(*) AS n_orders
FROM orders
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Conditional aggregation / manual pivot (demo-style wide metrics row).
# --------------------------------------------------------------------------


def q18_conditional_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")

    def status_total(status: str, alias: str):
        return F.sum(
            F.when(
                F.col("o_orderstatus") == status,
                F.col("o_totalprice").cast(DEC),
            ).otherwise(F.lit(0).cast(DEC))
        ).cast("double").alias(alias)

    return orders.groupBy("o_orderpriority").agg(
        status_total("F", "total_f"),
        status_total("O", "total_o"),
        status_total("P", "total_p"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("cnt_f"),
    )


ORACLE_Q18 = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F'
            THEN CAST(o_totalprice AS DECIMAL(18,2))
            ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS total_f,
       CAST(SUM(CASE WHEN o_orderstatus = 'O'
            THEN CAST(o_totalprice AS DECIMAL(18,2))
            ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS total_o,
       CAST(SUM(CASE WHEN o_orderstatus = 'P'
            THEN CAST(o_totalprice AS DECIMAL(18,2))
            ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS total_p,
       COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS cnt_f
FROM orders
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Min/max/extremes (exact, order-independent on doubles — no decimal
# carrier needed).
# --------------------------------------------------------------------------


def q19_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.min(F.date_format("l_shipdate", "yyyy-MM-dd")).alias("first_ship"),
        F.max(F.date_format("l_shipdate", "yyyy-MM-dd")).alias("last_ship"),
    )


ORACLE_Q19 = """
SELECT l_returnflag,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price,
       MIN(strftime(l_shipdate, '%Y-%m-%d')) AS first_ship,
       MAX(strftime(l_shipdate, '%Y-%m-%d')) AS last_ship
FROM lineitem
GROUP BY 1
"""


# --------------------------------------------------------------------------
# JSON extraction from the events props column (kafka-JSON decode analog:
# every reference kafka DDL declares 'format'='json' — demo_1.md).
# --------------------------------------------------------------------------


def q20_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    # from_json parses once per row; three get_json_object calls would
    # parse the document three times
    k = F.from_json("props", "k INT")["k"]
    return (
        events.withColumn("k", k)
        .groupBy("event_type", (F.col("k") % 10).alias("k_mod"))
        .agg(F.count("*").alias("n"), F.min("k").alias("min_k"), F.max("k").alias("max_k"))
    )


ORACLE_Q20 = """
SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
       COUNT(*) AS n,
       MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
FROM events
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# 6-way join (TPC-H Q5 shape — the deepest join tree in the corpus
# spirit; region/nation broadcast, the rest shuffle on their keys).
# --------------------------------------------------------------------------


def q21_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    revenue = (
        F.col("l_extendedprice").cast(DEC)
        * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
    ).cast("decimal(24,4)")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


ORACLE_Q21 = """
SELECT n_name,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                AS DECIMAL(24,4))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name
"""


QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q02_filter_project": q02_filter_project,
    "q03_computed_columns": q03_computed_columns,
    "q04_daily_gmv": q04_daily_gmv,
    "q05_gmv_join_coupon": q05_gmv_join_coupon,
    "q06_lookup_join": q06_lookup_join,
    "q07_enriched_orders": q07_enriched_orders,
    "q08_cte_topk": q08_cte_topk,
    "q09_scalar_datetime": q09_scalar_datetime,
    "q10_string_functions": q10_string_functions,
    "q11_case_having": q11_case_having,
    "q12_set_ops": q12_set_ops,
    "q13_window_over": q13_window_over,
    "q14_rollup": q14_rollup,
    "q15_semi_anti": q15_semi_anti,
    "q16_values_inline": q16_values_inline,
    "q17_distinct_agg": q17_distinct_agg,
    "q18_conditional_pivot": q18_conditional_pivot,
    "q19_minmax": q19_minmax,
    "q20_json_extract": q20_json_extract,
    "q21_local_supplier_volume": q21_local_supplier_volume,
}

ORACLES = {
    "q01_pricing_summary": ORACLE_Q01,
    "q02_filter_project": ORACLE_Q02,
    "q03_computed_columns": ORACLE_Q03,
    "q04_daily_gmv": ORACLE_Q04,
    "q05_gmv_join_coupon": ORACLE_Q05,
    "q06_lookup_join": ORACLE_Q06,
    "q07_enriched_orders": ORACLE_Q07,
    "q08_cte_topk": ORACLE_Q08,
    "q09_scalar_datetime": ORACLE_Q09,
    "q10_string_functions": ORACLE_Q10,
    "q11_case_having": ORACLE_Q11,
    "q12_set_ops": ORACLE_Q12,
    "q13_window_over": ORACLE_Q13,
    "q14_rollup": ORACLE_Q14,
    "q15_semi_anti": ORACLE_Q15,
    "q16_values_inline": ORACLE_Q16,
    "q17_distinct_agg": ORACLE_Q17,
    "q18_conditional_pivot": ORACLE_Q18,
    "q19_minmax": ORACLE_Q19,
    "q20_json_extract": ORACLE_Q20,
    "q21_local_supplier_volume": ORACLE_Q21,
}
