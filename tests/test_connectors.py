"""Connector registry tests: option mapping (pure), filesystem
round-trips, upsert-SQL generation, decorations."""

from __future__ import annotations

import pytest

from flink_streaming_platform_web_spark.sources.ddl import parse_create_table
from flink_streaming_platform_web_spark.sources.registry import (
    apply_schema_decorations,
    filesystem_batch,
    filesystem_stream,
    jdbc_reader_options,
    kafka_reader_options,
)


def test_kafka_option_mapping():
    t = parse_create_table(
        """CREATE TABLE k (a INT) WITH ('connector'='kafka',
           'topic'='t1', 'properties.bootstrap.servers'='b:9092',
           'properties.group.id'='g1',
           'scan.startup.mode'='earliest-offset')"""
    )
    opts = kafka_reader_options(t)
    assert opts["subscribe"] == "t1"
    assert opts["kafka.bootstrap.servers"] == "b:9092"
    assert opts["startingOffsets"] == "earliest"
    assert opts["kafka.group.id"] == "g1"


def test_jdbc_option_mapping():
    t = parse_create_table(
        """CREATE TABLE j (a INT) WITH ('connector'='jdbc',
           'url'='jdbc:mysql://h:3306/db', 'table-name'='tt',
           'username'='u', 'password'='p')"""
    )
    opts = jdbc_reader_options(t)
    assert opts == {
        "url": "jdbc:mysql://h:3306/db",
        "dbtable": "tt",
        "user": "u",
        "password": "p",
    }


def test_filesystem_avro_roundtrip(spark, tmp_path):
    """Flink's avro format LIVE: the 'avro' short name is only
    registered by the external spark-avro artifact's service file,
    but the pyspark assembly carries the implementation classes —
    resolve_fs_format routes through the provider's full class name,
    so an avro filesystem SINK then SOURCE work end to end through
    the runner with no extra jar (a truly class-less deployment gets
    the loud ConnectorUnavailable instead)."""
    from flink_streaming_platform_web_spark.sources.registry import (
        resolve_fs_format,
    )
    from flink_streaming_platform_web_spark.streaming.runner import (
        JobRunner,
    )

    assert resolve_fs_format(spark, "avro").endswith("AvroFileFormat")
    assert resolve_fs_format(spark, "parquet") == "parquet"
    src = tmp_path / "av_src"
    src.mkdir()
    (src / "t.json").write_text(
        '{"a": 1, "s": "x"}\n{"a": 2, "s": "y"}\n'
    )
    runner = JobRunner(spark, mode="batch")
    runner.execute_script(
        f"""
        CREATE TABLE av_in (a BIGINT, s STRING)
          WITH ('connector'='filesystem','path'='{src}',
                'format'='json');
        CREATE TABLE av_out (a BIGINT, s STRING)
          WITH ('connector'='filesystem','path'='{tmp_path}/av_out',
                'format'='avro');
        INSERT INTO av_out SELECT a, upper(s) AS s FROM av_in;
        """
    )
    t = parse_create_table(
        f"""CREATE TABLE av_rd (a BIGINT, s STRING) WITH
            ('connector'='filesystem', 'path'='{tmp_path}/av_out',
             'format'='avro')"""
    )
    got = sorted(
        (r["a"], r["s"]) for r in filesystem_batch(spark, t).collect()
    )
    assert got == [(1, "X"), (2, "Y")]
    # streaming read of the same avro files
    sdf = filesystem_stream(spark, t)
    assert sdf.isStreaming
    q = (
        sdf.writeStream.format("memory")
        .queryName("av_mem")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got_s = sorted(
        (r["a"], r["s"]) for r in spark.table("av_mem").collect()
    )
    assert got_s == [(1, "X"), (2, "Y")]


def test_filesystem_roundtrip_batch(spark, tmp_path):
    path = f"{tmp_path}/fs"
    spark.range(10).selectExpr("id AS a").write.parquet(path)
    t = parse_create_table(
        f"""CREATE TABLE fs (a BIGINT, doubled AS a * 2) WITH
            ('connector'='filesystem', 'path'='{path}',
             'format'='parquet')"""
    )
    df = filesystem_batch(spark, t)
    rows = {r["a"]: r["doubled"] for r in df.collect()}
    assert rows[7] == 14


def test_filesystem_stream_with_watermark(spark, tmp_path):
    path = f"{tmp_path}/fs_stream"
    spark.sql(
        "SELECT timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id)"
        " AS ts, id AS v FROM range(5)"
    ).write.parquet(path)
    t = parse_create_table(
        f"""CREATE TABLE s (ts TIMESTAMP, v BIGINT,
             WATERMARK FOR ts AS ts - INTERVAL '5' SECOND)
            WITH ('connector'='filesystem', 'path'='{path}',
                  'format'='parquet')"""
    )
    df = filesystem_stream(spark, t)
    assert df.isStreaming
    # watermark node present in the logical plan
    assert "EventTimeWatermark" in df._jdf.queryExecution().logical().toString()


def test_csv_filesystem(spark, tmp_path):
    path = f"{tmp_path}/csv"
    with open(f"{path}.d", "w") as f:  # noqa: F841 - create parent via spark below
        pass
    spark.createDataFrame([(1, "x"), (2, "y")], "a INT, b STRING").write.csv(
        path, header=False
    )
    t = parse_create_table(
        f"""CREATE TABLE c (a INT, b STRING) WITH
            ('connector'='filesystem', 'path'='{path}', 'format'='csv')"""
    )
    assert {r["b"] for r in filesystem_batch(spark, t).collect()} == {"x", "y"}


def test_computed_column_translation(spark):
    t = parse_create_table(
        "CREATE TABLE t (a INT, p AS PROCTIME()) WITH ('connector'='print')"
    )
    df = apply_schema_decorations(
        spark.createDataFrame([(1,)], "a INT"), t
    )
    assert dict(df.dtypes)["p"] == "timestamp"


def test_lenient_json_decode(spark):
    """The reference sets 'json.ignore-parse-errors'='true' in every
    kafka DDL (demo_1.md): malformed payloads must decode to nulls,
    not fail the stream. PERMISSIVE from_json is the contract."""
    from pyspark.sql import functions as F

    raw = spark.createDataFrame(
        [('{"id": 7, "day_time": "20201009", "amnount": 20}',),
         ("not json at all",),
         ('{"id": "wrong-type"}',)],
        "value STRING",
    )
    decoded = raw.select(
        F.from_json("value", "id BIGINT, day_time STRING, amnount BIGINT")
        .alias("v")
    ).select("v.*")
    rows = decoded.collect()
    assert (rows[0]["id"], rows[0]["amnount"]) == (7, 20)
    assert rows[1]["id"] is None  # malformed → null row, stream alive
    assert rows[2]["id"] is None  # type mismatch → null field


def test_kafka_timestamp_startup_maps_to_starting_timestamp():
    """scan.startup.mode='timestamp' must map to Spark's
    startingTimestamp (mapping it to 'latest' silently skipped every
    record between the requested time and job start); the millis
    option is required."""
    t = parse_create_table(
        """CREATE TABLE k (id BIGINT) WITH (
          'connector'='kafka', 'topic'='t',
          'properties.bootstrap.servers'='b:9092',
          'scan.startup.mode'='timestamp',
          'scan.startup.timestamp-millis'='1700000000000',
          'format'='json')"""
    )
    opts = kafka_reader_options(t)
    assert opts["startingTimestamp"] == "1700000000000"
    assert "startingOffsets" not in opts

    t2 = parse_create_table(
        """CREATE TABLE k2 (id BIGINT) WITH (
          'connector'='kafka', 'topic'='t',
          'properties.bootstrap.servers'='b:9092',
          'scan.startup.mode'='timestamp', 'format'='json')"""
    )
    with pytest.raises(ValueError, match="timestamp-millis"):
        kafka_reader_options(t2)


def test_filesystem_stream_csv_header(spark, tmp_path):
    """A streaming CSV source with csv.include-header must not ingest
    the header row as data (the batch reader already skipped it)."""
    src = tmp_path / "csvstream"
    src.mkdir()
    (src / "p0.csv").write_text("k,v\n1,10\n2,20\n")
    t = parse_create_table(
        f"""CREATE TABLE c (k BIGINT, v BIGINT) WITH (
          'connector'='filesystem', 'path'='{src}', 'format'='csv',
          'csv.include-header'='true')"""
    )
    df = filesystem_stream(spark, t)
    q = (
        df.writeStream.format("memory")
        .queryName("csv_hdr_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = {
            (r["k"], r["v"])
            for r in spark.table("csv_hdr_out").collect()
        }
    finally:
        q.stop()
        q.awaitTermination(30)
    assert rows == {(1, 10), (2, 20)}, rows


def test_filesystem_orc_roundtrip(spark, tmp_path):
    """Flink's filesystem connector lists orc among its formats; the
    declared 'format' passes straight to Spark's native orc
    reader/writer — whole script through the runner."""
    from flink_streaming_platform_web_spark.streaming.runner import (
        JobRunner,
    )

    src = tmp_path / "orc_src"
    spark.range(10).selectExpr(
        "id AS k", "CAST(id * 2 AS DOUBLE) AS v"
    ).write.orc(str(src))
    runner = JobRunner(spark, mode="batch")
    runner.execute_script(
        f"""
        CREATE TABLE orc_in (k BIGINT, v DOUBLE)
        WITH ('connector'='filesystem','path'='{src}','format'='orc');
        CREATE TABLE orc_out (k BIGINT, v DOUBLE)
        WITH ('connector'='filesystem','path'='{tmp_path}/orc_out',
              'format'='orc');
        INSERT INTO orc_out SELECT k, v FROM orc_in WHERE k >= 5;
        """
    )
    got = sorted(
        (r["k"], r["v"])
        for r in spark.read.orc(f"{tmp_path}/orc_out").collect()
    )
    assert got == [(k, float(k * 2)) for k in range(5, 10)]


def test_kafka_raw_format_value_passthrough(spark, tmp_path):
    """Flink's raw format (docs: formats/raw): the kafka record value
    lands as-is in the single declared column — exercised live over
    the file-transport broker."""
    from flink_streaming_platform_web_spark.sources.kafka_file import (
        FileBroker,
    )
    from flink_streaming_platform_web_spark.streaming.runner import (
        JobRunner,
    )

    broker = FileBroker(tmp_path / "broker")
    broker.create_topic("raw_t", partitions=1)
    for payload in ("plain text line", '{"not":"parsed"}'):
        broker.produce("raw_t", payload)
    runner = JobRunner(spark, mode="streaming")
    result = runner.execute_script(
        f"""
        CREATE TABLE raw_src (line STRING)
        WITH ('connector'='kafka', 'topic'='raw_t',
              'properties.bootstrap.servers'='file://{broker.path}',
              'scan.startup.mode'='earliest-offset', 'format'='raw');
        CREATE TABLE raw_out (line STRING) WITH ('connector'='memory');
        INSERT INTO raw_out SELECT line FROM raw_src;
        """
    )
    for q in result.streaming_queries:
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(60)
    got = sorted(r["line"] for r in spark.table("raw_out").collect())
    assert got == ["plain text line", '{"not":"parsed"}']
