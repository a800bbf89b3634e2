"""Event-time windowed operators (SURVEY §2.3 O8-O11, O14/O25).

The reference exercises TUMBLE (docs/sql_demo/demo_4.md: `GROUP BY
TUMBLE(ts, INTERVAL '60' SECOND), username` with `TUMBLE_START/END`) and
HOP (demo_5.md: `HOP(ts, INTERVAL '30' SECOND, INTERVAL '1' MINUTE)`)
over watermarked kafka streams. Spark's `F.window` / `F.session_window`
implement identical grouping semantics in batch AND streaming from one
expression — the batch forms below are byte-identical to what
`streaming/jobs.py` runs under `readStream` + `withWatermark`.

Window-boundary timestamps are emitted as formatted strings so the
oracle comparison is representation-stable (see _portable.py).

Scale notes: window grouping is a single hash shuffle on
(window, key) — same as any groupBy; session windows additionally
sort within user partitions, which AQE splits if a user key is hot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_platform_web_spark.operators._portable import (
    dsum,
    oracle_dsum,
)
from flink_streaming_platform_web_spark.tables import load

_FMT = "yyyy-MM-dd HH:mm:ss"
_OFMT = "%Y-%m-%d %H:%M:%S"


# --------------------------------------------------------------------------
# O8/O10 — tumbling window (demo_4.md), 1-hour buckets over events.ts.
# Spark `window()` aligns buckets to the EPOCH origin; DuckDB's
# time_bucket defaults to a 2000-01-03 (Monday) origin — identical
# only for widths dividing 24 h. Every oracle therefore passes the
# epoch origin EXPLICITLY so a width change (e.g. '1 week') can't
# silently misalign the two engines.
# --------------------------------------------------------------------------


def q22_tumble_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w = F.window("ts", "1 hour")
    return (
        events.groupBy(w, "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.date_format("window.start", _FMT).alias("window_start"),
            F.date_format("window.end", _FMT).alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


ORACLE_Q22 = f"""
SELECT strftime(time_bucket(INTERVAL '1 hour', ts, TIMESTAMP '1970-01-01'), '{_OFMT}') AS window_start,
       strftime(time_bucket(INTERVAL '1 hour', ts, TIMESTAMP '1970-01-01') + INTERVAL '1 hour',
                '{_OFMT}') AS window_end,
       event_type, COUNT(*) AS n_events,
       {oracle_dsum('value', 'sum_value')}
FROM events
GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# O9 — hopping (sliding) window: size 1 hour, slide 30 minutes
# (demo_5.md HOP shape). Every event belongs to exactly size/slide = 2
# windows; the oracle replays that assignment with an explicit
# 2-offset cross join.
# --------------------------------------------------------------------------


def q23_hop_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w = F.window("ts", "1 hour", "30 minutes")
    return (
        events.groupBy(w, "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.date_format("window.start", _FMT).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


ORACLE_Q23 = f"""
WITH assigned AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts, TIMESTAMP '1970-01-01')
           - o.off * INTERVAL '30 minutes' AS wstart,
         event_type, value
  FROM events CROSS JOIN (VALUES (0), (1)) AS o(off)
)
SELECT strftime(wstart, '{_OFMT}') AS window_start,
       event_type, COUNT(*) AS n_events,
       {oracle_dsum('value', 'sum_value')}
FROM assigned
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Session window, 30-minute gap, per user (extension — the reference's
# surface has no session windows; Spark's session_window works in batch
# and streaming alike). Oracle: classic gaps-and-islands.
# Spark's session end = last event ts + gap.
# --------------------------------------------------------------------------


def q24_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"), dsum("value", "sum_value"))
        .select(
            "user_id",
            F.date_format("session_window.start", _FMT).alias("session_start"),
            F.date_format("session_window.end", _FMT).alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


ORACLE_Q24 = f"""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL '30 minutes'
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
sessions AS (
  SELECT user_id, ts, value,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM flagged
)
SELECT user_id,
       strftime(MIN(ts), '{_OFMT}') AS session_start,
       strftime(MAX(ts) + INTERVAL '30 minutes', '{_OFMT}') AS session_end,
       COUNT(*) AS n_events,
       {oracle_dsum('value', 'sum_value')}
FROM sessions
GROUP BY user_id, sess_id
"""


# --------------------------------------------------------------------------
# O14/O25 — changelog "last row wins" materialization: the batch
# equivalent of the reference's CDC dedup
# (`table.exec.source.cdc-events-duplicate` + PK upsert, demo_6.md).
# Latest state per (user_id, event_type) key ordered by event time.
# --------------------------------------------------------------------------


def q25_cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from flink_streaming_platform_web_spark.operators._portable import (
        ts_str,
    )

    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("value").alias("latest_value"),
            # shared portable formatter (q39 uses the same pair) — a
            # hand-written format string here could drift from it
            ts_str(F.col("ts")).alias("latest_ts"),
        )
    )


def _oracle_q25() -> str:
    from flink_streaming_platform_web_spark.operators._portable import (
        oracle_ts_str,
    )

    return f"""
SELECT user_id, event_type, latest_value, latest_ts FROM (
  SELECT user_id, event_type, value AS latest_value,
         {oracle_ts_str('ts')} AS latest_ts,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


ORACLE_Q25 = _oracle_q25()


# --------------------------------------------------------------------------
# q36 — CUMULATE window (Flink 1.13 windowing TVF surface: expanding
# windows from a shared start, step 15 min up to size 1 hour). Spark
# has no native cumulate; the declarative expansion assigns each event
# to every not-yet-closed expansion of its hour — an explode over
# size/step rows, then a plain hash agg. Same shape at any scale: the
# fan-out factor is the constant size/step, not data-dependent.
# --------------------------------------------------------------------------

_CUM_STEPS = 4  # 1 hour / 15 minutes


def q36_cumulate_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    hs = F.date_trunc("hour", F.col("ts"))
    expanded = (
        events.withColumn("hs", hs)
        .withColumn(
            "k", F.explode(F.sequence(F.lit(1), F.lit(_CUM_STEPS)))
        )
        .withColumn(
            "wend", F.expr("timestampadd(MINUTE, 15 * k, hs)")
        )
        .filter(F.col("wend") > F.col("ts"))
    )
    return (
        expanded.groupBy("hs", "wend", "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.date_format("hs", _FMT).alias("window_start"),
            F.date_format("wend", _FMT).alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


ORACLE_Q36 = f"""
WITH expanded AS (
  SELECT date_trunc('hour', ts) AS hs,
         date_trunc('hour', ts) + INTERVAL 1 MINUTE * (15 * k) AS wend,
         event_type, value, ts
  FROM events
  CROSS JOIN (SELECT unnest(generate_series(1, {_CUM_STEPS})) AS k)
)
SELECT strftime(hs, '{_OFMT}') AS window_start,
       strftime(wend, '{_OFMT}') AS window_end,
       event_type, COUNT(*) AS n_events,
       {oracle_dsum('value', 'sum_value')}
FROM expanded
WHERE wend > ts
GROUP BY 1, 2, 3
"""


def q43_cumulate_tvf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CUMULATE windowing TVF **syntax form** (Flink 1.13
    FLIP-145) driver-gated end-to-end: the statement below goes
    through functions.flink_compat.translate_expr — the same seam the
    script runner uses — and must produce q36's cumulate semantics
    (each event in every expanding 15-min slice of its hour). Gating
    the TVF TEXT (not just the hand-built q36 plan) pins the
    translation layer itself against the oracle."""
    from flink_streaming_platform_web_spark.functions.flink_compat import (
        translate_expr,
    )

    load(spark, sf_dir, "events").createOrReplaceTempView("ev_q43")
    return spark.sql(
        translate_expr(
            "SELECT date_format(window_start, 'yyyy-MM-dd HH:mm:ss')"
            "         AS window_start,"
            "       date_format(window_end, 'yyyy-MM-dd HH:mm:ss')"
            "         AS window_end,"
            "       event_type, COUNT(*) AS n_events,"
            "       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)"
            "         AS sum_value"
            " FROM TABLE(CUMULATE(TABLE ev_q43, DESCRIPTOR(ts),"
            "                     INTERVAL '15' MINUTE,"
            "                     INTERVAL '1' HOUR))"
            " GROUP BY window_start, window_end, event_type"
        )
    )


# the oracle mirrors q36's expansion exactly — the TVF form and the
# hand-built cumulate must agree on the same text
ORACLE_Q43 = ORACLE_Q36


def q44_window_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink's documented Window Top-N pattern (docs: queries/window-topn
    — ROW_NUMBER over each window partition, filtered to rn <= N, on
    top of a windowed aggregation): the top-3 event types per 1-hour
    tumble by event count. Scale shape: the windowed agg is the only
    corpus-sized stage (map-side combined, one exchange); the rank
    window runs over |windows|×|types| aggregated rows — tiny."""
    from pyspark.sql.window import Window

    events = load(spark, sf_dir, "events")
    agg = (
        events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.date_format("window.start", _FMT).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    w = Window.partitionBy("window_start").orderBy(
        F.desc("n_events"), F.asc("event_type")
    )
    return (
        agg.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select("window_start", "rn", "event_type", "n_events", "sum_value")
    )


ORACLE_Q44 = f"""
WITH agg AS (
  SELECT strftime(time_bucket(INTERVAL '1 hour', ts,
                              TIMESTAMP '1970-01-01'), '{_OFMT}')
           AS window_start,
         event_type, COUNT(*) AS n_events,
         {oracle_dsum('value', 'sum_value')}
  FROM events
  GROUP BY 1, 2
)
SELECT window_start, rn, event_type, n_events, sum_value FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
              PARTITION BY window_start
              ORDER BY n_events DESC, event_type ASC) AS BIGINT) AS rn
  FROM agg
) WHERE rn <= 3
"""


QUERIES = {
    "q22_tumble_window": q22_tumble_window,
    "q36_cumulate_window": q36_cumulate_window,
    "q43_cumulate_tvf": q43_cumulate_tvf,
    "q44_window_topn": q44_window_topn,
    "q23_hop_window": q23_hop_window,
    "q24_session_window": q24_session_window,
    "q25_cdc_latest_state": q25_cdc_latest_state,
}

ORACLES = {
    "q22_tumble_window": ORACLE_Q22,
    "q36_cumulate_window": ORACLE_Q36,
    "q43_cumulate_tvf": ORACLE_Q43,
    "q44_window_topn": ORACLE_Q44,
    "q23_hop_window": ORACLE_Q23,
    "q24_session_window": ORACLE_Q24,
    "q25_cdc_latest_state": ORACLE_Q25,
}


def q46_window_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink's Window Join (docs: queries/window-join): two windowed
    streams joined on identical windows plus a key — here clicks and
    purchases per (1-hour window, user), a FULL OUTER join so
    click-only and purchase-only windows both survive (the docs'
    headline variant). Window-aligned joins are the scale-safe
    stream-stream shape: both sides pre-aggregate per (window, key)
    before the join, so the join input is reduced data keyed
    identically — one exchange per side, no pair-space."""
    events = load(spark, sf_dir, "events")
    w = F.window("ts", "1 hour")

    def side(event_type: str, alias: str) -> DataFrame:
        return (
            events.filter(F.col("event_type") == event_type)
            .groupBy(w, "user_id")
            .agg(F.count("*").alias(alias))
            .select(
                F.date_format("window.start", _FMT).alias(
                    "window_start"
                ),
                "user_id",
                alias,
            )
        )

    clicks = side("click", "n_clicks")
    buys = side("purchase", "n_purchases")
    return (
        clicks.join(buys, ["window_start", "user_id"], "full_outer")
        .select(
            "window_start",
            "user_id",
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        )
    )


ORACLE_Q46 = f"""
WITH clicks AS (
  SELECT strftime(time_bucket(INTERVAL '1 hour', ts,
                  TIMESTAMP '1970-01-01'), '{_OFMT}') AS window_start,
         user_id, COUNT(*) AS n_clicks
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
),
buys AS (
  SELECT strftime(time_bucket(INTERVAL '1 hour', ts,
                  TIMESTAMP '1970-01-01'), '{_OFMT}') AS window_start,
         user_id, COUNT(*) AS n_purchases
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
)
SELECT COALESCE(c.window_start, b.window_start) AS window_start,
       COALESCE(c.user_id, b.user_id) AS user_id,
       COALESCE(c.n_clicks, 0) AS n_clicks,
       COALESCE(b.n_purchases, 0) AS n_purchases
FROM clicks c FULL OUTER JOIN buys b
  ON c.window_start = b.window_start AND c.user_id = b.user_id
"""

QUERIES["q46_window_join"] = q46_window_join
ORACLES["q46_window_join"] = ORACLE_Q46
