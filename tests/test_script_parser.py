"""Parser/classifier unit tests — fixture F8 (FIXTURES.md): the
reference's own test corpus shapes
(TestSqlCommand.java:18-23, TestSqlValidation.java:19-40)."""

from __future__ import annotations

import pytest

from flink_streaming_platform_web_spark.sql.script import (
    SqlCommand,
    SqlParseError,
    classify,
    parse_script,
    parse_set,
    split_statements,
)

DEMO_SCRIPT = """
-- demo_1.md shape
CREATE TABLE source_table (
  id BIGINT,
  day_time VARCHAR,
  amnount BIGINT,
  proctime AS PROCTIME()
) WITH (
  'connector' = 'kafka',
  'topic' = 'flink_test_1',
  'format' = 'json'
);

CREATE TABLE sink_table (
  day_time string,
  total_gmv bigint,
  PRIMARY KEY (day_time) NOT ENFORCED
) WITH ('connector' = 'jdbc');

INSERT INTO sink_table
SELECT day_time, SUM(amnount) AS total_gmv
FROM source_table
GROUP BY day_time;
"""


def test_split_statements_demo():
    stmts = split_statements(DEMO_SCRIPT)
    assert len(stmts) == 3
    assert stmts[0].lower().startswith("create table source_table")
    assert stmts[2].lower().startswith("insert into")


def test_split_ignores_comment_lines_and_trailing_comments():
    stmts = split_statements(
        "-- a comment\nSELECT 1; -- trailing\n-- another\nSELECT 2;"
    )
    assert stmts == ["SELECT 1", "SELECT 2"]


def test_split_is_quote_aware():
    # the reference splits inside quoted ';' — we must not
    stmts = split_statements("SELECT 'a;b' AS x; SELECT ' -- not comment ';")
    assert len(stmts) == 2
    assert "a;b" in stmts[0]
    assert "-- not comment" in stmts[1]


def test_split_multiline_statement():
    stmts = split_statements("SELECT\n  a,\n  b\nFROM t;")
    assert len(stmts) == 1


@pytest.mark.parametrize(
    "stmt,cmd",
    [
        ("INSERT INTO t SELECT * FROM s", SqlCommand.INSERT_INTO),
        ("insert overwrite t select 1", SqlCommand.INSERT_OVERWRITE),
        ("CREATE TABLE t (a INT) WITH ('connector'='print')", SqlCommand.CREATE_TABLE),
        ("create temporary table t (a INT)", SqlCommand.CREATE_TABLE),
        ("CREATE FUNCTION jsonHasKey AS 'com.xx.udf.JsonHasKeyUDF'", SqlCommand.CREATE_FUNCTION),
        ("CREATE VIEW v AS SELECT 1", SqlCommand.CREATE_VIEW),
        ("CREATE CATALOG hive WITH ('type'='hive')", SqlCommand.CREATE_CATALOG),
        ("USE CATALOG hive", SqlCommand.USE_CATALOG),
        ("USE mydb", SqlCommand.USE),
        ("DROP TABLE t", SqlCommand.DROP_TABLE),
        ("ALTER TABLE t RENAME TO t2", SqlCommand.ALTER_TABLE),
        ("SHOW TABLES", SqlCommand.SHOW_TABLES),
        ("SHOW CATALOGS", SqlCommand.SHOW_CATALOGS),
        ("SET table.exec.mini-batch.enabled=true", SqlCommand.SET),
        ("BEGIN STATEMENT SET", SqlCommand.BEGIN_STATEMENT_SET),
        ("END", SqlCommand.END_STATEMENT_SET),
        ("SELECT * FROM t", SqlCommand.SELECT),
        ("WITH c AS (SELECT 1) SELECT * FROM c", SqlCommand.SELECT),
    ],
)
def test_classify(stmt, cmd):
    assert classify(stmt).command == cmd


def test_classify_unknown_raises():
    with pytest.raises(SqlParseError):
        classify("GRANT ALL TO someone")


def test_parse_script_demo():
    calls = parse_script(DEMO_SCRIPT)
    assert [c.command for c in calls] == [
        SqlCommand.CREATE_TABLE,
        SqlCommand.CREATE_TABLE,
        SqlCommand.INSERT_INTO,
    ]


@pytest.mark.parametrize(
    "stmt,expected",
    [
        ("SET a.b.c=5", ("a.b.c", "5")),
        ("SET table.exec.mini-batch.allow-latency = '60 s'",
         ("table.exec.mini-batch.allow-latency", "60 s")),
        ("set k = 'v v'", ("k", "v v")),
    ],
)
def test_parse_set(stmt, expected):
    assert parse_set(stmt) == expected


def test_variable_substitution():
    from flink_streaming_platform_web_spark.sql.script import (
        substitute_variables,
    )

    out = substitute_variables(
        "CREATE TABLE t (a INT) WITH ('path'='${data_dir}/t');"
        "INSERT INTO ${target} SELECT a FROM t;",
        {"data_dir": "/data", "target": "sink1"},
    )
    assert "'/data/t'" in out and "INTO sink1 " in out


def test_variable_substitution_env(monkeypatch):
    from flink_streaming_platform_web_spark.sql.script import (
        substitute_variables,
    )

    monkeypatch.setenv("GRAFT_TEST_VAR", "42")
    assert substitute_variables("SELECT ${GRAFT_TEST_VAR}") == "SELECT 42"


def test_variable_unresolved_raises():
    import pytest as _pytest

    from flink_streaming_platform_web_spark.sql.script import (
        substitute_variables,
    )

    with _pytest.raises(SqlParseError, match="unresolved"):
        substitute_variables("SELECT ${nope_not_set_anywhere}")


def test_use_database_named_catalog_prefix_routes_to_use():
    """A database named catalog_db must classify as USE, not
    USE_CATALOG (the reference's own regexes misroute this —
    SqlCommand.java:41-48; we fix it)."""
    from flink_streaming_platform_web_spark.sql.script import classify

    assert classify("USE catalog_db").command.name == "USE"
    assert classify("USE CATALOG hive").command.name == "USE_CATALOG"
