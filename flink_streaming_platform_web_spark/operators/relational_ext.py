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
    fp_mean,
    oracle_fp_mean,
    oracle_dsum,
    oracle_portable_hash,
    oracle_ts_str,
    portable_hash,
    ts_str,
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
    # Fixed-point accumulate via the shared fp_mean carrier (rationale
    # documented once in operators/_portable.py): raw-double→DECIMAL
    # casts disagree between engines by one decimal ulp near grid
    # midpoints (observed at sf0.1: 320k elements → one flipped sum).
    return elems.groupBy("label", "d").agg(
        fp_mean("x").alias("mean_x"),
        F.count("*").alias("n"),
    )


ORACLE_Q32 = f"""
SELECT label, d,
       {oracle_fp_mean('x')} AS mean_x,
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


# --------------------------------------------------------------------------
# q38 — approximate distinct count done PORTABLY: a 64-register
# HyperLogLog (Flajolet et al. 2007) built from the md5-derived
# portable hash, so Spark and DuckDB compute the IDENTICAL sketch and
# the approximate estimate itself hash-matches the oracle. (Native
# approx_count_distinct sketches differ per engine and can only be
# range-checked; this shows the approximate path can be exactly
# gated.) Scale: one (group, register) aggregation with map-side
# combine — the canonical distributed-HLL plan; registers per group
# are bounded at 64 rows.
# --------------------------------------------------------------------------

HLL_M = 64  # registers (p = 6 bits); alpha_64 = 0.709 (HLL paper)
_HLL_W = 54  # value width: 60-bit portable hash minus 6 register bits


def q38_approx_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    hashed = events.select(
        "event_type",
        "user_id",
        portable_hash(F.col("user_id").cast("string")).alias("h"),
    )
    regs = hashed.select(
        "event_type",
        "user_id",
        F.expr("h & 63").alias("reg"),
        F.expr("h >> 6").alias("w"),
    ).withColumn(
        "rho",
        F.when(F.col("w") == 0, F.lit(_HLL_W + 1)).otherwise(
            F.lit(_HLL_W + 1) - F.length(F.conv(F.col("w"), 10, 2))
        ),
    )
    per_reg = regs.groupBy("event_type", "reg").agg(
        F.max("rho").alias("m_j"),
        # exact distinct rides along for the accuracy column
        F.countDistinct("user_id").alias("nd_part"),
    )
    wmax = Window.partitionBy("event_type")
    est = (
        per_reg.withColumn("m_max", F.max("m_j").over(wmax))
        .groupBy("event_type", "m_max")
        .agg(
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), m_max - m_j)")).alias(
                "t_present"
            ),
            F.count("*").alias("n_regs"),
            F.sum("nd_part").alias("n_exact"),
        )
        .withColumn("v_zero", F.lit(HLL_M) - F.col("n_regs"))
        .withColumn(
            "t_total",
            F.col("t_present")
            + F.col("v_zero") * F.expr("shiftleft(CAST(1 AS BIGINT), m_max)"),
        )
        .withColumn(
            "e_raw",
            F.lit(0.709 * HLL_M * HLL_M)
            * F.pow(F.lit(2.0), F.col("m_max"))
            / F.col("t_total").cast("double"),
        )
        .withColumn(
            "n_approx",
            F.round(
                F.when(
                    (F.col("e_raw") <= 2.5 * HLL_M) & (F.col("v_zero") > 0),
                    F.lit(float(HLL_M))
                    * F.log(F.lit(float(HLL_M)) / F.col("v_zero")),
                ).otherwise(F.col("e_raw")),
                4,
            ),
        )
    )
    return est.select("event_type", "n_exact", "n_approx")


ORACLE_Q38 = f"""
WITH hashed AS (
  SELECT event_type, user_id,
         {oracle_portable_hash('user_id::VARCHAR')} AS h
  FROM events
),
regs AS (
  SELECT event_type, user_id, h & 63 AS reg, h >> 6 AS w,
         CASE WHEN h >> 6 = 0 THEN {_HLL_W + 1}
              ELSE {_HLL_W + 1} - length(format('{{:b}}', h >> 6))
         END AS rho
  FROM hashed
),
per_reg AS (
  SELECT event_type, reg, MAX(rho) AS m_j,
         COUNT(DISTINCT user_id) AS nd_part
  FROM regs GROUP BY 1, 2
),
winmax AS (
  SELECT *, MAX(m_j) OVER (PARTITION BY event_type) AS m_max FROM per_reg
),
grouped AS (
  SELECT event_type, m_max,
         SUM(1::BIGINT << (m_max - m_j)) AS t_present,
         COUNT(*) AS n_regs, CAST(SUM(nd_part) AS BIGINT) AS n_exact
  FROM winmax GROUP BY 1, 2
),
est AS (
  SELECT event_type, n_exact,
         {HLL_M} - n_regs AS v_zero,
         t_present + ({HLL_M} - n_regs) * (1::BIGINT << m_max) AS t_total,
         m_max
  FROM grouped
)
SELECT event_type, n_exact,
       round(
         CASE WHEN (0.709 * {HLL_M * HLL_M}) * pow(2.0, m_max)
                   / CAST(t_total AS DOUBLE) <= {2.5 * HLL_M}
               AND v_zero > 0
              THEN {float(HLL_M)} * ln({float(HLL_M)} / v_zero)
              ELSE (0.709 * {HLL_M * HLL_M}) * pow(2.0, m_max)
                   / CAST(t_total AS DOUBLE)
         END, 4) AS n_approx
FROM est
"""


# --------------------------------------------------------------------------
# q39 — Flink SQL's canonical "Deduplication" pattern (Flink 1.13 docs
# §Queries/Deduplication, the shape the reference's users write for
# latest-state materialization):
#   SELECT ... FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY key
#     ORDER BY time_attr DESC) AS rn FROM t) WHERE rn = 1
# Spark runs the identical plan batch-side (window + filter); the
# streaming analog is the runner's upsert path (O6/O19). One shuffle
# keyed by user_id; the window never materializes more than each key's
# run — at 100 TB this is the standard last-row-wins compaction.
# Tie-break on event_id DESC pins determinism when two events share a
# timestamp.
# --------------------------------------------------------------------------


def q39_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            ts_str(F.col("ts")).alias("ts"),
            "event_type",
            F.col("value").cast("double").alias("value"),
        )
    )


ORACLE_Q39 = f"""
SELECT user_id, event_id, {oracle_ts_str('ts')} AS ts, event_type,
       CAST(value AS DOUBLE) AS value
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# q41 — correlated scalar subquery (the TPC-H Q17 shape): line items
# below 20% of their part's average quantity. Catalyst DECORRELATES
# this into an aggregate-then-join plan (RewriteCorrelatedScalarQuery)
# — the per-part average becomes one grouped aggregation joined back,
# so the "subquery per outer row" never executes; at 100 TB that
# decorrelation is the difference between O(n) and O(n²). The scalar
# math is written identically on both engines (exact integer SUM/COUNT
# then one double multiply) so the strict `<` boundary can't drift.
# --------------------------------------------------------------------------


def q41_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("q41_lineitem")
    load(spark, sf_dir, "part").createOrReplaceTempView("q41_part")
    return spark.sql(
        """
        SELECT p.p_brand,
               COUNT(*) AS n_small,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                    AS DOUBLE) / 7.0 AS avg_yearly
        FROM q41_lineitem l JOIN q41_part p
          ON p.p_partkey = l.l_partkey
        WHERE l.l_quantity <
              (SELECT 0.2 * (CAST(SUM(l2.l_quantity) AS DOUBLE)
                             / COUNT(*))
               FROM q41_lineitem l2
               WHERE l2.l_partkey = p.p_partkey)
        GROUP BY p.p_brand
        """
    )


ORACLE_Q41 = """
SELECT p.p_brand,
       COUNT(*) AS n_small,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
            AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_quantity <
      (SELECT 0.2 * (CAST(SUM(l2.l_quantity) AS DOUBLE) / COUNT(*))
       FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
GROUP BY p.p_brand
"""


# --------------------------------------------------------------------------
# q42 — EXISTS-correlated semi-join (the TPC-H Q4 shape): order-priority
# counts for orders having at least one returned lineitem (the
# fixture's slim lineitem has no receipt/commit dates — the returnflag
# predicate keeps the Q4 shape). Catalyst plans the EXISTS as a LEFT
# SEMI join (no row
# duplication from multiple matches — the property a plain join+distinct
# gets wrong at scale), shuffling each side once on the join key.
# --------------------------------------------------------------------------


def q42_exists_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("q42_lineitem")
    load(spark, sf_dir, "orders").createOrReplaceTempView("q42_orders")
    return spark.sql(
        """
        SELECT o.o_orderpriority, COUNT(*) AS n_orders
        FROM q42_orders o
        WHERE EXISTS (
          SELECT 1 FROM q42_lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_returnflag = 'R')
        GROUP BY o.o_orderpriority
        """
    )


ORACLE_Q42 = """
SELECT o.o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_returnflag = 'R')
GROUP BY o.o_orderpriority
"""


QUERIES = {
    "q38_approx_distinct_hll": q38_approx_distinct_hll,
    "q39_dedup_latest": q39_dedup_latest,
    "q41_correlated_subquery": q41_correlated_subquery,
    "q42_exists_semijoin": q42_exists_semijoin,
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
    "q38_approx_distinct_hll": ORACLE_Q38,
    "q39_dedup_latest": ORACLE_Q39,
    "q41_correlated_subquery": ORACLE_Q41,
    "q42_exists_semijoin": ORACLE_Q42,
    "q26_asof_join": ORACLE_Q26,
    "q27_grouping_sets": ORACLE_Q27,
    "q28_interval_join": ORACLE_Q28,
    "q29_percentiles": ORACLE_Q29,
    "q30_explode_tokens": ORACLE_Q30,
    "q31_topk_per_group": ORACLE_Q31,
    "q32_embedding_centroids": ORACLE_Q32,
    "q35_pivot_api": ORACLE_Q35,
}
