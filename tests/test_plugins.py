"""Custom-connector plugin surface — the reference's ext-jar
mechanism (`-C <url>` classpath append, CommandUtil.java:42-47;
per-job ext_jar_path, flink_web.sql:60) re-expressed for Spark:
Python connectors register in sources/registry and any DDL naming
them dispatches through the runner; JVM jars ride --jars on
spark-submit (tested in test_platform's submit builder tests).
"""

from __future__ import annotations

import pytest

from flink_streaming_platform_web_spark.sources import registry
from flink_streaming_platform_web_spark.streaming.runner import JobRunner

CAPTURED: dict = {}


def _make_plugin(name: str) -> registry.ConnectorPlugin:
    def source_batch(spark, table):
        n = int(table.options.get("rows", "3"))
        return spark.range(n).selectExpr("id AS k", "id * 10 AS v")

    def sink_batch(df, table, overwrite):
        CAPTURED[table.name] = [tuple(r) for r in df.collect()]

    def sink_stream(df, table):
        def apply(batch, epoch_id):
            CAPTURED.setdefault(table.name, []).extend(
                tuple(r) for r in batch.collect()
            )

        return df.writeStream.outputMode("append").foreachBatch(apply)

    return registry.ConnectorPlugin(
        name=name,
        source_batch=source_batch,
        sink_batch=sink_batch,
        sink_stream=sink_stream,
    )


def register_test_plugin():
    """Entry point exercised by load_plugin_module('…:register_test_plugin')."""
    registry.register_connector(_make_plugin("loaded-conn"))


@pytest.fixture
def plugin():
    registry.register_connector(_make_plugin("my-conn"))
    yield
    registry.unregister_connector("my-conn")
    CAPTURED.clear()


def test_plugin_source_and_sink_batch(spark, plugin):
    JobRunner(spark, mode="batch").execute_script(
        """
        CREATE TABLE src (k BIGINT, v BIGINT) WITH
          ('connector'='my-conn', 'rows'='4');
        CREATE TABLE out (k BIGINT, v BIGINT) WITH
          ('connector'='my-conn');
        INSERT INTO out SELECT k, v FROM src WHERE k >= 2;
        """
    )
    assert sorted(CAPTURED["out"]) == [(2, 20), (3, 30)]


def test_plugin_stream_sink(spark, plugin, sf_dir, tmp_path):
    from flink_streaming_platform_web_spark.tables import load

    src = f"{tmp_path}/plug_src"
    load(spark, sf_dir, "events").limit(20).select(
        "event_id", "value"
    ).write.parquet(src)
    runner = JobRunner(spark, mode="streaming")
    result = runner.execute_script(
        f"""
        CREATE TABLE s (event_id BIGINT, value DOUBLE) WITH
          ('connector'='filesystem', 'path'='{src}', 'format'='parquet');
        CREATE TABLE out2 (event_id BIGINT, value DOUBLE) WITH
          ('connector'='my-conn');
        INSERT INTO out2 SELECT event_id, value FROM s;
        """
    )
    for q in result.streaming_queries:
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(60)
    assert len(CAPTURED["out2"]) == 20


def test_set_graft_plugins_loads_module(spark):
    try:
        JobRunner(spark, mode="batch").execute_script(
            """
            SET 'graft.plugins' = 'tests.test_plugins:register_test_plugin';
            CREATE TABLE src (k BIGINT, v BIGINT) WITH
              ('connector'='loaded-conn');
            CREATE TABLE m (k BIGINT, v BIGINT) WITH ('connector'='memory');
            INSERT INTO m SELECT k, v FROM src;
            """
        )
        assert spark.table("m").count() == 3
    finally:
        registry.unregister_connector("loaded-conn")


def test_unknown_connector_still_raises(spark):
    with pytest.raises(ValueError, match="not a source"):
        JobRunner(spark, mode="batch").execute_script(
            """
            CREATE TABLE src (k BIGINT) WITH ('connector'='no-such');
            CREATE TABLE m (k BIGINT) WITH ('connector'='memory');
            INSERT INTO m SELECT k FROM src;
            """
        )


def test_submit_builder_ext_jars():
    from flink_streaming_platform_web_spark.platform.submit import (
        build_submit_command,
    )

    cmd = build_submit_command(
        "job.sql",
        ext_jars=["http://repo/conn.jar", "/opt/x.jar"],
        py_files=["plug.py"],
    )
    i = cmd.index("--jars")
    assert cmd[i + 1] == "http://repo/conn.jar,/opt/x.jar"
    # the engine package zip now always ships first on --py-files
    # (cluster drivers need it); user plugins append after it. The
    # zip is staged in a unique per-call tempdir (ADVICE r03), so
    # assert on the basename + position, not a fixed path.
    pyf = cmd[cmd.index("--py-files") + 1]
    assert pyf.endswith(",plug.py")
    first = pyf.split(",")[0]
    assert first.endswith("flink_streaming_platform_web_spark.zip")
    import os

    assert os.path.exists(first)
