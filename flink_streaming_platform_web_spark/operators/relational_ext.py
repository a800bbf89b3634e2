"""Extended relational operators (SURVEY §2.3 'extensions' note +
common OLAP patterns): as-of join, interval join, grouping sets/cube,
exact percentiles, explode/UDTF surface, top-k per group, and a
distributed vector-centroid aggregation.

These exceed the reference's surface (Flink 1.13 SQL as exercised by
its demo corpus) — Catalyst provides them natively, and they round out
what a user migrating real workloads expects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_streaming_platform_web_spark.operators._portable import (
    dsum,
    oracle_dsum,
)
from flink_streaming_platform_web_spark.tables import load

# --------------------------------------------------------------------------
# q26 — AS-OF join: each purchase matched to the user's most recent
# click at-or-before it. Spark lacks a native ASOF; the scalable
# formulation is the sort-based carry-forward: union both sides, one
# window pass per user ordered by time, `last(click, ignoreNulls)`
# carries the latest click forward. O(n log n), one shuffle on user_id
# — the plan you want at 100 TB (no per-user pair blowup, no
# driver-side merge_asof).
# --------------------------------------------------------------------------


def q26_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("ets"),
        F.col("event_id").alias("eid"),
        F.lit(0).alias("kind"),
        F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("ets"),
        F.col("event_id").alias("eid"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("bigint").alias("click_id"),
        F.lit(None).cast("double").alias("click_value"),
    )
    # clicks sort before purchases at equal ts (kind 0 < 1) → the match
    # is at-or-before, ties within clicks resolved by event_id
    w = (
        Window.partitionBy("user_id")
        .orderBy("ets", "kind", "eid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = clicks.unionByName(purchases).select(
        "*",
        F.last("click_id", ignorenulls=True).over(w).alias("asof_click_id"),
        F.last("click_value", ignorenulls=True)
        .over(w)
        .alias("asof_click_value"),
    )
    return merged.filter(F.col("kind") == 1).select(
        F.col("eid").alias("purchase_id"),
        "user_id",
        "asof_click_id",
        "asof_click_value",
    )


ORACLE_Q26 = """
WITH tagged AS (
  SELECT user_id, ts AS ets, event_id AS eid,
         CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind,
         CASE WHEN event_type = 'click' THEN event_id END AS click_id,
         CASE WHEN event_type = 'click' THEN value END AS click_value
  FROM events WHERE event_type IN ('click', 'purchase')
),
carried AS (
  SELECT *,
         LAST_VALUE(click_id IGNORE NULLS) OVER w AS asof_click_id,
         LAST_VALUE(click_value IGNORE NULLS) OVER w AS asof_click_value
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ets, kind, eid
               ROWS UNBOUNDED PRECEDING)
)
SELECT eid AS purchase_id, user_id, asof_click_id, asof_click_value
FROM carried WHERE kind = 1
"""


# --------------------------------------------------------------------------
# q27 — GROUPING SETS + CUBE with GROUPING() disambiguation.
# --------------------------------------------------------------------------


def q27_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               GROUPING(o_orderstatus) AS g_status,
               GROUPING(o_orderpriority) AS g_prio,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority), ())
        """
    )


ORACLE_Q27 = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                        (o_orderstatus), (o_orderpriority), ())
"""


# --------------------------------------------------------------------------
# q28 — interval (time-band) join: pairs of events by the same user
# within 10 minutes, across two event types. Equi-join on user_id
# carries the band predicate; at scale the band would additionally
# bucketize ts so Catalyst can prune (documented in the module
# docstring of operators/windows.py).
# --------------------------------------------------------------------------


def q28_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    joined = views.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr("INTERVAL 10 MINUTES")
        ),
    )
    return joined.groupBy("user_id").agg(
        F.count("*").alias("n_attributed"),
        F.min("view_id").alias("first_view"),
    )


ORACLE_Q28 = """
SELECT v.user_id, COUNT(*) AS n_attributed, MIN(v.event_id) AS first_view
FROM (SELECT * FROM events WHERE event_type = 'view') v
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON v.user_id = p.user_id
 AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL '10 minutes'
GROUP BY v.user_id
"""


# --------------------------------------------------------------------------
# q29 — exact interpolated percentiles. l_quantity is integer-valued,
# so the interpolation arithmetic (dyadic fractions) is exact in both
# engines.
# --------------------------------------------------------------------------


def q29_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("p25"),
        F.expr("percentile(l_quantity, 0.5)").alias("p50"),
        F.expr("percentile(l_quantity, 0.75)").alias("p75"),
        F.count("*").alias("n"),
    )


ORACLE_Q29 = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS p25,
       quantile_cont(l_quantity, 0.5) AS p50,
       quantile_cont(l_quantity, 0.75) AS p75,
       COUNT(*) AS n
FROM lineitem
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q30 — explode / lateral (the UDTF surface, SURVEY O24): token
# frequencies over documents via split + explode.
# --------------------------------------------------------------------------


def q30_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", r"\s+")).alias("tok"))
        .where(F.length("tok") > 0)
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
    )


ORACLE_Q30 = r"""
SELECT tok, COUNT(*) AS freq FROM (
  SELECT unnest(regexp_split_to_array(text, '\s+')) AS tok FROM documents
) WHERE length(tok) > 0
GROUP BY tok
"""


# --------------------------------------------------------------------------
# q31 — top-k per group (rank ≤ 3 customers by balance per segment).
# --------------------------------------------------------------------------


def q31_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        cust.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("c_mktsegment", "rk", "c_custkey", "c_acctbal")
    )


ORACLE_Q31 = """
SELECT c_mktsegment, rk, c_custkey, c_acctbal FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey ASC) AS rk
  FROM customer
) WHERE rk <= 3
"""


# --------------------------------------------------------------------------
# q32 — per-label embedding centroids, long format (label, dim, mean):
# the distributed "average the vectors" building block of IVF/k-means.
# posexplode → decimal-exact per-dimension sums → one shuffle on
# (label, dim). At 100 TB this is the canonical centroid job; no
# driver-side vector state.
# --------------------------------------------------------------------------


def q32_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    elems = emb.select(
        "label", F.posexplode("embedding").alias("d0", "x")
    ).select("label", (F.col("d0") + 1).alias("d"), "x")
    # float → double first: Spark's float→decimal cast goes through the
    # float's SHORTEST string repr (~8 sig digits), silently losing a
    # ulp at scale 9; double widening is exact in both engines
    return elems.groupBy("label", "d").agg(
        (
            F.sum(F.col("x").cast("double").cast("decimal(18,9)"))
            .cast("double")
            / F.count("*").cast("double")
        ).alias("mean_x"),
        F.count("*").alias("n"),
    )


ORACLE_Q32 = """
SELECT label, d,
       CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS mean_x,
       COUNT(*) AS n
FROM (
  SELECT label, d::INT AS d, embedding[d] AS x
  FROM embeddings,
       LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS d)
)
GROUP BY label, d
"""


# --------------------------------------------------------------------------
# q35 — the DataFrame pivot() API (wide metrics matrix: priority ×
# status totals). Catalyst compiles pivot into the same conditional
# aggregation the oracle spells out, so the hash gate also pins that
# equivalence.
# --------------------------------------------------------------------------


def q35_pivot_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
        )
        .withColumnsRenamed({"F": "total_f", "O": "total_o", "P": "total_p"})
    )


ORACLE_Q35 = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F'
            THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE)
         AS total_f,
       CAST(SUM(CASE WHEN o_orderstatus = 'O'
            THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE)
         AS total_o,
       CAST(SUM(CASE WHEN o_orderstatus = 'P'
            THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE)
         AS total_p
FROM orders
GROUP BY o_orderpriority
"""


QUERIES = {
    "q26_asof_join": q26_asof_join,
    "q27_grouping_sets": q27_grouping_sets,
    "q28_interval_join": q28_interval_join,
    "q29_percentiles": q29_percentiles,
    "q30_explode_tokens": q30_explode_tokens,
    "q31_topk_per_group": q31_topk_per_group,
    "q32_embedding_centroids": q32_embedding_centroids,
    "q35_pivot_api": q35_pivot_api,
}

ORACLES = {
    "q26_asof_join": ORACLE_Q26,
    "q27_grouping_sets": ORACLE_Q27,
    "q28_interval_join": ORACLE_Q28,
    "q29_percentiles": ORACLE_Q29,
    "q30_explode_tokens": ORACLE_Q30,
    "q31_topk_per_group": ORACLE_Q31,
    "q32_embedding_centroids": ORACLE_Q32,
    "q35_pivot_api": ORACLE_Q35,
}
