"""Validation tests — SqlValidation.preCheckSql behavior
(TestSqlValidation.java:19-40 fixture + the two business rules)."""

from __future__ import annotations

from flink_streaming_platform_web_spark.sql.validation import (
    MSG_BARE_SELECT,
    MSG_NO_INSERT,
    validate_script,
)

# F8: the reference's own 4-statement validation fixture
FOUR_STATEMENT_SCRIPT = """
CREATE TABLE source_table (f0 INT, f1 INT, f2 STRING) WITH
  ('connector' = 'datagen', 'rows-per-second'='5');
CREATE TABLE print_table (c BIGINT) WITH ('connector' = 'print');
CREATE VIEW v AS select count(f0) AS c from source_table;
INSERT INTO print_table SELECT c FROM v;
"""


def test_valid_script_passes(spark):
    r = validate_script(FOUR_STATEMENT_SCRIPT, spark)
    assert r.ok, r.errors


def test_no_insert_rejected(spark):
    r = validate_script(
        "CREATE TABLE t (a INT) WITH ('connector'='print');", spark
    )
    assert not r.ok
    assert any(MSG_NO_INSERT in e for e in r.errors)


def test_bare_select_rejected_in_streaming(spark):
    r = validate_script(
        "SELECT * FROM t; INSERT INTO x SELECT * FROM t;", spark
    )
    assert not r.ok
    assert any(MSG_BARE_SELECT in e for e in r.errors)


def test_bare_select_allowed_in_batch(spark):
    r = validate_script("SELECT 1;", spark, job_type="batch")
    assert r.ok, r.errors


def test_syntax_error_caught(spark):
    r = validate_script(
        "INSERT INTO t SELECT a, FROM (invalid (;", spark
    )
    assert not r.ok


def test_validate_without_session():
    # classification-only validation still enforces business rules
    r = validate_script("SELECT 1;")
    assert not r.ok


def test_catalog_ddl_passthrough_accepted(spark):
    """A Spark catalog CREATE TABLE (USING parquet — not connector
    DDL) must validate the same way the runner executes it: via
    Spark's parser, not a DDLParseError (ADVICE r02: validation and
    execution diverged)."""
    r = validate_script(
        """CREATE TABLE cat_t (a INT) USING parquet;
           INSERT INTO cat_t SELECT 1;""",
        spark,
    )
    assert r.ok, r.errors


def test_connector_ddl_typo_precise_error(spark):
    """Connector-shaped DDL with a broken column type surfaces OUR
    DDL error, not a Spark ParseException passthrough."""
    r = validate_script(
        """CREATE TABLE k (a FOOTYPE) WITH ('connector' = 'kafka');
           INSERT INTO x SELECT * FROM k;""",
        spark,
    )
    assert not r.ok
    assert any("unsupported type" in e for e in r.errors), r.errors
