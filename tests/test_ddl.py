"""DDL interpreter tests — the demo corpus's CREATE TABLE surface
(demo_1.md, demo_4.md, demo_6.md, demo_datagen.md shapes)."""

from __future__ import annotations

import pytest

from flink_streaming_platform_web_spark.sources.ddl import (
    DDLParseError,
    parse_create_table,
)


def test_demo1_source_table():
    t = parse_create_table(
        """CREATE TABLE source_table (
             id BIGINT,
             day_time VARCHAR,
             amnount BIGINT,
             proctime AS PROCTIME()
           ) WITH (
             'connector' = 'kafka',
             'topic' = 'flink_test_1',
             'properties.bootstrap.servers' = 'k1:9092',
             'format' = 'json',
             'json.fail-on-missing-field' = 'false'
           )"""
    )
    assert t.name == "source_table"
    assert t.connector == "kafka"
    assert [c.name for c in t.columns] == [
        "id", "day_time", "amnount", "proctime",
    ]
    assert t.columns[0].spark_type == "BIGINT"
    assert t.columns[1].spark_type == "STRING"
    assert t.columns[3].computed_expr == "PROCTIME()"
    assert t.schema_ddl() == "id BIGINT, day_time STRING, amnount BIGINT"
    assert t.options["json.fail-on-missing-field"] == "false"


def test_demo1_upsert_sink():
    t = parse_create_table(
        """CREATE TABLE sink_table (
             day_time string,
             total_gmv bigint,
             PRIMARY KEY (day_time) NOT ENFORCED
           ) WITH ('connector' = 'jdbc', 'url' = 'jdbc:mysql://h/db',
                   'table-name' = 'sync_test_1')"""
    )
    assert t.primary_key == ["day_time"]
    assert t.options["table-name"] == "sync_test_1"


def test_demo4_watermark():
    t = parse_create_table(
        """CREATE TABLE user_clicks (
             username VARCHAR,
             click_url VARCHAR,
             ts TIMESTAMP(3),
             WATERMARK FOR ts AS ts - INTERVAL '20' SECOND
           ) WITH ('connector' = 'kafka')"""
    )
    assert t.watermark is not None
    assert t.watermark.column == "ts"
    assert t.watermark.delay == "20 seconds"
    assert t.columns[2].spark_type == "TIMESTAMP"


def test_demo6_types():
    t = parse_create_table(
        """CREATE TABLE orders (
             order_id INT,
             order_date TIMESTAMP(0),
             customer_name STRING,
             price DECIMAL(10, 5),
             product_id INT,
             order_status BOOLEAN,
             PRIMARY KEY (order_id) NOT ENFORCED
           ) WITH ('connector' = 'mysql-cdc')"""
    )
    types = {c.name: c.spark_type for c in t.columns}
    assert types["price"] == "DECIMAL(10,5)"
    assert types["order_status"] == "BOOLEAN"
    assert t.connector == "mysql-cdc"


def test_complex_types_extension():
    t = parse_create_table(
        "CREATE TABLE t (a ARRAY<INT>, m MAP<STRING, DOUBLE>, "
        "r ROW<x INT, y STRING>) WITH ('connector'='print')"
    )
    types = {c.name: c.spark_type for c in t.columns}
    assert types["a"] == "ARRAY<INT>"
    assert types["m"] == "MAP<STRING, DOUBLE>"
    assert types["r"] == "STRUCT<x: INT, y: STRING>"


def test_not_null_and_comment():
    t = parse_create_table(
        "CREATE TABLE t (a INT NOT NULL, b STRING COMMENT 'desc') "
        "WITH ('connector'='print')"
    )
    assert not t.columns[0].nullable
    assert t.columns[1].spark_type == "STRING"


def test_if_not_exists():
    t = parse_create_table(
        "CREATE TABLE IF NOT EXISTS t (a INT) WITH ('connector'='print')"
    )
    assert t.if_not_exists


def test_bad_ddl_raises():
    with pytest.raises(DDLParseError):
        parse_create_table("CREATE TABLE broken")


def test_not_null_comment_order_and_escaped_options():
    """Flink grammar: `type [NOT NULL] [COMMENT '...']` — both present
    must parse; WITH values keep ''-escaped quotes intact."""
    t = parse_create_table(
        """CREATE TABLE t (
             a INT NOT NULL COMMENT 'the id',
             b STRING COMMENT 'it''s quoted'
           ) WITH ('connector' = 'memory',
                   'password' = 'ab''cd')"""
    )
    assert [c.spark_type for c in t.columns] == ["INT", "STRING"]
    assert t.columns[0].nullable is False
    assert t.options["password"] == "ab'cd"


def test_comparison_operators_in_computed_columns():
    """A bare '>' in a computed-column expression must not be counted
    as a type bracket (it used to swallow the following columns)."""
    t = parse_create_table(
        """CREATE TABLE t (
             a INT,
             flag AS CASE WHEN a > 10 THEN 1 ELSE 0 END,
             b ARRAY<MAP<STRING, INT>>,
             c INT
           ) WITH ('connector' = 'memory')"""
    )
    names = [c.name for c in t.columns]
    assert names == ["a", "flag", "b", "c"]
    assert t.columns[2].spark_type == "ARRAY<MAP<STRING, INT>>"


def test_partitioned_by_trailer():
    t = parse_create_table(
        """CREATE TABLE t (a INT, dt STRING)
           PARTITIONED BY (dt)
           WITH ('connector' = 'filesystem', 'path' = '/x')"""
    )
    assert t.partitioned_by == ["dt"]


def test_type_named_column_in_comparison():
    """A column actually NAMED after a type constructor (`map`) used
    in a computed-column comparison must not open a generic bracket —
    the old splitter merged every following column def (ADVICE r02)."""
    t = parse_create_table(
        """CREATE TABLE t (
             map INT,
             flag AS CASE WHEN map < 3 THEN 1 ELSE 0 END,
             b MAP<STRING, INT>,
             c INT
           ) WITH ('connector' = 'memory')"""
    )
    names = [c.name for c in t.columns]
    assert names == ["map", "flag", "b", "c"]
    assert t.columns[2].spark_type == "MAP<STRING, INT>"


def test_type_named_column_two_comparisons():
    """`row < a AND x > b` must not read as a generic bracket even
    though a balanced '>' exists later — the keyword filter proves it
    is expression text."""
    t = parse_create_table(
        """CREATE TABLE t (
             row INT,
             x INT,
             flag AS CASE WHEN row < 3 AND x > 1 THEN 1 ELSE 0 END,
             c INT
           ) WITH ('connector' = 'memory')"""
    )
    assert [c.name for c in t.columns] == ["row", "x", "flag", "c"]


def test_looks_like_connector_ddl():
    from flink_streaming_platform_web_spark.sources.ddl import (
        looks_like_connector_ddl,
    )

    assert looks_like_connector_ddl(
        "CREATE TABLE t (a INT) WITH ('connector' = 'kafka')"
    )
    assert not looks_like_connector_ddl(
        "CREATE TABLE t (a INT) USING parquet"
    )


def test_column_level_primary_key_registers():
    """`user_id VARCHAR(20) PRIMARY KEY NOT ENFORCED` must register
    the PK (previously the type prefix-match silently swallowed it,
    demoting the sink to append mode)."""
    from flink_streaming_platform_web_spark.sources.ddl import (
        parse_create_table,
    )

    t = parse_create_table(
        """CREATE TABLE u (
          user_id VARCHAR(20) PRIMARY KEY NOT ENFORCED,
          v BIGINT
        ) WITH ('connector'='memory')"""
    )
    assert t.primary_key == ["user_id"]
    assert t.columns[0].spark_type == "STRING"


def test_named_pk_constraint_parses():
    from flink_streaming_platform_web_spark.sources.ddl import (
        parse_create_table,
    )

    t = parse_create_table(
        """CREATE TABLE o (
          id BIGINT, v DOUBLE,
          CONSTRAINT pk_id PRIMARY KEY (id) NOT ENFORCED
        ) WITH ('connector'='memory')"""
    )
    assert t.primary_key == ["id"]


def test_metadata_column_rejected_loudly():
    import pytest

    from flink_streaming_platform_web_spark.sources.ddl import (
        DDLParseError,
        parse_create_table,
    )

    with pytest.raises(DDLParseError, match="METADATA"):
        parse_create_table(
            """CREATE TABLE k (
              id BIGINT,
              ts TIMESTAMP(3) METADATA FROM 'timestamp'
            ) WITH ('connector'='kafka')"""
        )


def test_type_trailing_garbage_rejected():
    import pytest

    from flink_streaming_platform_web_spark.sources.ddl import (
        DDLParseError,
        _map_type,
    )

    assert _map_type("TIMESTAMP(3)") == "TIMESTAMP"
    assert _map_type("VARCHAR(20)") == "STRING"
    assert _map_type("DECIMAL(18,2)") == "DECIMAL(18,2)"
    for bad in (
        "VARCHAR(20) SOMETHING",
        "TIMESTAMP(3) BOGUS",
        "DECIMAL(18,2) X",
    ):
        with pytest.raises(DDLParseError):
            _map_type(bad)
