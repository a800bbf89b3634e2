"""Function-surface inventory entries: Flink-expression translation
(O17) and user-defined functions (O23/O24), each with a DuckDB oracle.

q33 feeds a LITERAL Flink expression (demo_4.md's commented computed
column ``TO_TIMESTAMP(FROM_UNIXTIME(ts_seconds))``) through
``functions.flink_compat.translate_expr`` — the same path the script
runner uses for computed columns — and gates the result.

q34 runs the reference's canonical UDF example (jsonHasKey,
docs/manual-sql.md §1.e) as an Arrow-vectorized pandas UDF; the oracle
replays the JSON logic with DuckDB's json functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_platform_web_spark.functions.flink_compat import (
    translate_expr,
)
from flink_streaming_platform_web_spark.functions.udfs import props_k_bucket
from flink_streaming_platform_web_spark.tables import load


def q33_flink_datetime_compat(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    # demo_4.md computed-column shape, passed through the translator
    flink_expr = "TO_TIMESTAMP(FROM_UNIXTIME(ts_seconds))"
    return (
        events.withColumn("ts_seconds", F.unix_timestamp("ts"))
        .withColumn("ts2", F.expr(translate_expr(flink_expr)))
        .select(
            "event_id",
            "ts_seconds",
            F.date_format("ts2", "yyyy-MM-dd HH:mm:ss").alias("ts2_str"),
        )
    )


ORACLE_Q33 = """
SELECT event_id,
       CAST(floor(epoch(ts)) AS BIGINT) AS ts_seconds,
       strftime(to_timestamp(CAST(floor(epoch(ts)) AS BIGINT)),
                '%Y-%m-%d %H:%M:%S') AS ts2_str
FROM events
"""


def q34_udf_json_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return (
        events.withColumn("k_bucket", props_k_bucket(F.col("props")))
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n"), F.countDistinct("user_id").alias("n_users"))
    )


ORACLE_Q34 = """
SELECT COALESCE(CAST(trunc(TRY_CAST(json_extract_string(props, '$.k')
                               AS DOUBLE)) AS INT) % 10, -1)
         AS k_bucket,
       COUNT(*) AS n,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1
"""


def q37_flink_builtin_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink built-in scalars Spark lacks natively — SPLIT_INDEX,
    TRUNCATE, SHA256, TO_BASE64 — running as Catalyst-inlined SQL UDFs
    (functions/flink_builtins.py, registered at session build), i.e.
    exactly the SQL a reference user's script would contain."""
    load(spark, sf_dir, "documents").createOrReplaceTempView(
        "q37_documents"
    )
    return spark.sql(
        """
        SELECT doc_id,
               split_index(source, '-', 0)        AS src_head,
               truncate(n_chars / 7.0, 2)         AS words_est,
               sha256(lang)                       AS lang_digest,
               to_base64(substring(text, 1, 8))   AS head_b64
        FROM q37_documents
        """
    )


ORACLE_Q37 = """
SELECT doc_id,
       split_part(source, '-', 1)                            AS src_head,
       trunc((n_chars / 7.0) * power(10, 2)) / power(10, 2)  AS words_est,
       sha256(lang)                                          AS lang_digest,
       base64(encode(substring(text, 1, 8)))                 AS head_b64
FROM documents
"""


def q58_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink's LISTAGG string aggregate (docs: functions/system
    functions) — Spark 4 ships ``listagg`` natively with the same
    two-arg signature; the one-arg Flink form defaults the separator
    to ',' via the translate_expr rewrite (flink_compat.py). The
    deterministic entry pins the ordered form against DuckDB's
    string_agg: per source, the comma-joined sorted list of that
    source's distinct languages. (Distinctness comes from a
    pre-aggregated subquery: Spark 4.1's ``listagg(DISTINCT x, sep)
    WITHIN GROUP`` next to another distinct aggregate hits a
    ClassCastException in ListAgg.withNewChildrenInternal — the
    subquery form is also the plan that scales, one exchange for
    both aggregates.)"""
    load(spark, sf_dir, "documents").createOrReplaceTempView(
        "q58_documents"
    )
    return spark.sql(
        """
        SELECT source,
               listagg(lang, ',')
                 WITHIN GROUP (ORDER BY lang) AS langs,
               COUNT(*) AS n_langs
        FROM (SELECT DISTINCT source, lang FROM q58_documents)
        GROUP BY source
        """
    )


ORACLE_Q58 = """
SELECT source,
       string_agg(lang, ',' ORDER BY lang) AS langs,
       CAST(COUNT(*) AS BIGINT) AS n_langs
FROM (SELECT DISTINCT source, lang FROM documents)
GROUP BY source
"""


def q59_timestamp_ltz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink 1.13's TO_TIMESTAMP_LTZ (FLINK-21869, the release's
    datetime headliner — reference pins Flink 1.13 in pom.xml:41):
    epoch seconds (precision 0) and epoch milliseconds (precision 3)
    convert to the local-zone timestamp type. Spark's NATIVE
    to_timestamp_ltz parses strings, so the numeric Flink form goes
    through translate_expr — the same path a reference user's script
    takes — which rewrites it onto timestamp_seconds/timestamp_millis
    (exact: Spark's TIMESTAMP is the LTZ type). Session timezone is
    pinned UTC (session.py), so the formatted round trips are
    deterministic; the oracle rebuilds both from the same epoch
    values with make_timestamp (exact integer µs)."""
    load(spark, sf_dir, "events").createOrReplaceTempView("q59_events")
    flink_sql = """
        SELECT event_id,
               ms,
               date_format(TO_TIMESTAMP_LTZ(ms, 3),
                           'yyyy-MM-dd HH:mm:ss.SSS') AS ltz_ms_str,
               date_format(TO_TIMESTAMP_LTZ(ms DIV 1000, 0),
                           'yyyy-MM-dd HH:mm:ss') AS ltz_s_str
        FROM (SELECT event_id,
                     unix_millis(CAST(ts AS TIMESTAMP)) AS ms
              FROM q59_events)
        """
    # ts loads as TIMESTAMP_NTZ; the cast to (LTZ) TIMESTAMP is
    # value-identical under the pinned-UTC session timezone
    return spark.sql(translate_expr(flink_sql))


ORACLE_Q59 = """
SELECT event_id,
       epoch_ms(ts) AS ms,
       strftime(make_timestamp(epoch_ms(ts) * 1000),
                '%Y-%m-%d %H:%M:%S.%g') AS ltz_ms_str,
       strftime(make_timestamp((epoch_ms(ts) // 1000) * 1000000),
                '%Y-%m-%d %H:%M:%S') AS ltz_s_str
FROM events
"""


QUERIES = {
    "q33_flink_datetime_compat": q33_flink_datetime_compat,
    "q34_udf_json_bucket": q34_udf_json_bucket,
    "q37_flink_builtin_suite": q37_flink_builtin_suite,
    "q58_listagg": q58_listagg,
    "q59_timestamp_ltz": q59_timestamp_ltz,
}

ORACLES = {
    "q33_flink_datetime_compat": ORACLE_Q33,
    "q34_udf_json_bucket": ORACLE_Q34,
    "q37_flink_builtin_suite": ORACLE_Q37,
    "q58_listagg": ORACLE_Q58,
    "q59_timestamp_ltz": ORACLE_Q59,
}
