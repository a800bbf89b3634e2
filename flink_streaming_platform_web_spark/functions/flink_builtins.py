"""Flink built-in scalar functions that Spark lacks under the same
name, registered as Spark 4 SQL UDFs (``CREATE TEMPORARY FUNCTION …
RETURN <expr>``) — pure Catalyst expressions, JVM-evaluated inside
whole-stage codegen, NOT Python UDFs.

The reference's users write Flink 1.13 SQL (SURVEY §2.1: statements
pass to Flink verbatim, ExecuteSql.java:53-56), so its whole built-in
library is implicitly available to them. Most names coincide with
Spark's (DATE_FORMAT, FROM_UNIXTIME, REGEXP_REPLACE, CHAR_LENGTH …);
this module covers the divergent remainder so reference scripts run
unmodified. ``install`` is idempotent (CREATE OR REPLACE) and called
from the session factory.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# name → (signature, body). Bodies are plain Spark SQL expressions —
# Catalyst folds/optimizes them like any inline expression.
_SQL_UDFS: dict[str, tuple[str, str]] = {
    # Flink SPLIT_INDEX(str, sep, i): 0-based, literal separator, NULL
    # out of range. Spark's split() takes a regex → \Q..\E quoting;
    # try_element_at gives the NULL-on-out-of-range contract under ANSI.
    # negative i guard: Flink returns NULL for ANY negative index;
    # bare i+1 would make -1 throw INVALID_INDEX_OF_ZERO and i<=-2
    # silently return Spark's from-the-end element
    "split_index": (
        "(s STRING, sep STRING, i INT) RETURNS STRING",
        r"CASE WHEN i < 0 THEN CAST(NULL AS STRING) ELSE "
        r"try_element_at(split(s, concat('\\Q', sep, '\\E')), i + 1) END",
    ),
    # Flink TRUNCATE(numeric, d): truncate toward zero to d decimals.
    # floor/ceil on the scaled product keeps it all-double (the same
    # IEEE sequence DuckDB's trunc() runs — oracle-stable).
    "truncate": (
        "(x DOUBLE, d INT) RETURNS DOUBLE",
        "CAST(CASE WHEN x >= 0 THEN floor(x * power(10, d)) "
        "ELSE ceil(x * power(10, d)) END AS DOUBLE) / power(10, d)",
    ),
    # Flink RAND_INTEGER(n): uniform int in [0, n)
    "rand_integer": (
        "(n INT) RETURNS INT",
        "CAST(floor(rand() * n) AS INT)",
    ),
    # Flink TO_BASE64 / FROM_BASE64 ↔ Spark base64 / unbase64
    "to_base64": ("(s STRING) RETURNS STRING", "base64(s)"),
    "from_base64": ("(s STRING) RETURNS BINARY", "unbase64(s)"),
    # Flink SHA-family names ↔ Spark sha2(expr, bits)
    "sha224": ("(s STRING) RETURNS STRING", "sha2(s, 224)"),
    "sha256": ("(s STRING) RETURNS STRING", "sha2(s, 256)"),
    "sha384": ("(s STRING) RETURNS STRING", "sha2(s, 384)"),
    "sha512": ("(s STRING) RETURNS STRING", "sha2(s, 512)"),
    # NOTE: Flink 1.13's TO_TIMESTAMP_LTZ(numeric, precision) is NOT
    # here — Spark ships a NATIVE to_timestamp_ltz (string parsing)
    # that a SQL UDF cannot shadow; the numeric form rewrites in
    # flink_compat.translate_expr (timestamp_seconds/timestamp_millis).
    # Flink CONVERT_TZ(ts_string, from_tz, to_tz) → string
    "convert_tz": (
        "(s STRING, tz_from STRING, tz_to STRING) RETURNS STRING",
        "date_format(convert_timezone(tz_from, tz_to, "
        "CAST(s AS TIMESTAMP_NTZ)), 'yyyy-MM-dd HH:mm:ss')",
    ),
}


def install(spark: SparkSession) -> None:
    """Register the Flink-compat scalar functions on this session."""
    for name, (sig, body) in _SQL_UDFS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} "
            f"RETURN {body}"
        )
