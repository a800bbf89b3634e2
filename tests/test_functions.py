"""Function-surface tests: expression translation, UDF registration
(CREATE FUNCTION path), pandas UDFs, listener wiring."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from flink_streaming_platform_web_spark.functions.flink_compat import (
    register_function,
    translate_expr,
)
from flink_streaming_platform_web_spark.functions.udfs import json_has_key


def test_translate_proctime():
    assert translate_expr("PROCTIME()") == "current_timestamp()"
    assert (
        translate_expr("ts AS proctime() + INTERVAL '1' SECOND")
        == "ts AS current_timestamp() + INTERVAL '1' SECOND"
    )
    assert translate_expr("LOCALTIMESTAMP") == "localtimestamp()"


def test_register_python_function(spark):
    name = register_function(
        spark,
        "CREATE FUNCTION json_has_key AS "
        "'flink_streaming_platform_web_spark.functions.udfs:json_has_key' "
        "LANGUAGE PYTHON",
    )
    assert name == "json_has_key"
    row = spark.sql(
        """SELECT json_has_key('{"k": 1}', 'k') AS a,
                  json_has_key('{"k": 1}', 'z') AS b,
                  json_has_key('not json', 'k') AS c"""
    ).collect()[0]
    assert (row["a"], row["b"], row["c"]) == ("true", "false", "false")


def test_json_has_key_pure():
    assert json_has_key('{"a": 1}', "a")
    assert not json_has_key("{}", "a")
    assert not json_has_key(None, "a")


def test_listener_fires_on_external_death(spark, sf_dir, tmp_path):
    from flink_streaming_platform_web_spark.platform import listener
    from flink_streaming_platform_web_spark.platform.manager import JobManager
    from flink_streaming_platform_web_spark.platform.store import JobStore
    from flink_streaming_platform_web_spark.tables import load

    src = f"{tmp_path}/lst_src"
    load(spark, sf_dir, "events").select("event_type").write.parquet(src)
    store = JobStore()
    mgr = JobManager(spark, store)
    lst = listener.attach(spark, mgr)
    try:
        jid = store.add_job(
            "lst1",
            f"""
            CREATE TABLE lsrc (event_type STRING) WITH
              ('connector'='filesystem','path'='{src}','format'='parquet');
            CREATE TABLE lsink (event_type STRING) WITH
              ('connector'='blackhole');
            INSERT INTO lsink SELECT event_type FROM lsrc;
            """,
        )
        result = mgr.start(jid)
        q = result.streaming_queries[0]
        q.processAllAvailable()
        q.stop()  # external death, NOT via mgr.stop
        deadline = time.time() + 30
        while time.time() < deadline and mgr.status(jid) == "RUN":
            time.sleep(0.5)
        assert mgr.status(jid) == "STOP"
        assert store.alarms(jid)
    finally:
        spark.streams.removeListener(lst)


def test_flink_builtin_sql_udfs(spark):
    """Divergent Flink built-ins registered as Catalyst SQL UDFs at
    session build (functions/flink_builtins.py)."""
    row = spark.sql(
        "SELECT split_index('a,b,c', ',', 0) AS s0,"
        "       split_index('a,b,c', ',', 9) AS s_oob,"
        "       split_index('a.b.c', '.', 1) AS s_dot,"
        "       truncate(42.349, 2) AS t_pos,"
        "       truncate(-42.349, 2) AS t_neg,"
        "       to_base64('hi') AS b64,"
        "       CAST(from_base64(to_base64('hi')) AS STRING) AS rt,"
        "       sha256('') AS sha,"
        "       convert_tz('2024-01-01 00:00:00','UTC','Asia/Shanghai')"
        "         AS ctz"
    ).collect()[0]
    assert row["s0"] == "a" and row["s_oob"] is None
    assert row["s_dot"] == "b"  # literal separator, not regex
    assert row["t_pos"] == 42.34 and row["t_neg"] == -42.34
    assert row["b64"] == "aGk=" and row["rt"] == "hi"
    assert row["sha"].startswith("e3b0c44298fc1c149afbf4c8996fb924")
    assert row["ctz"] == "2024-01-01 08:00:00"
    bounds = spark.sql(
        "SELECT min(r) AS lo, max(r) AS hi FROM "
        "(SELECT rand_integer(5) AS r FROM range(200))"
    ).collect()[0]
    assert 0 <= bounds["lo"] and bounds["hi"] <= 4


def test_group_window_syntax_translation():
    """demo_4/demo_5 verbatim: TUMBLE/HOP/SESSION (+_START/_END)
    rewrite to Spark window()/session_window(); NOTE Flink's HOP args
    are (col, slide, size) while Spark's are (col, size, slide)."""
    from flink_streaming_platform_web_spark.functions.flink_compat import (
        translate_expr,
    )

    assert (
        translate_expr("TUMBLE(ts, INTERVAL '60' SECOND)")
        == "window(ts, '60 seconds')"
    )
    assert (
        translate_expr("TUMBLE_START(ts, INTERVAL '60' SECOND)")
        == "window(ts, '60 seconds').start"
    )
    assert (
        translate_expr(
            "HOP_END (ts, INTERVAL '30' SECOND, INTERVAL '1' MINUTE)"
        )
        == "window(ts, '1 minutes', '30 seconds').end"
    )
    assert (
        translate_expr("SESSION(ts, INTERVAL '5' MINUTE)")
        == "session_window(ts, '5 minutes')"
    )


def test_translation_leaves_string_literals_alone():
    """A literal containing PROCTIME()/NOW() text must pass through
    byte-identical — only code segments are rewritten ('' escapes
    included)."""
    from flink_streaming_platform_web_spark.functions.flink_compat import (
        translate_expr,
    )

    sql = (
        "SELECT PROCTIME() AS p, 'PROCTIME() isn''t code: NOW()' AS s"
    )
    out = translate_expr(sql)
    assert out == (
        "SELECT current_timestamp() AS p,"
        " 'PROCTIME() isn''t code: NOW()' AS s"
    )
