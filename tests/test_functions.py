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
