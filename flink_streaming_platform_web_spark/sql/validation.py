"""SQL pre-flight validation — ``SqlValidation.preCheckSql`` analog
(flink-streaming-validation/src/main/java/com/flink/streaming/sql/validation/SqlValidation.java:43-115).

Reference behavior: split the script, parse each statement with
Flink's Calcite parser (:98-99), and enforce two business rules —
the script must contain an INSERT (ValidationConstants.java:11,
check :107-109) and bare SELECT is rejected (:13, check :111-113).
Single-statement syntax only; cross-statement references are not
validated (docs/manual-sql.md §1.f), and neither are they here.

Spark rebuild: classification uses our regex taxonomy; per-statement
syntax uses Spark's own parser (via the JVM ``sqlParser.parsePlan``)
for plain SQL statements, and our DDL interpreter for connector
``CREATE TABLE``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from flink_streaming_platform_web_spark.sources.ddl import (
    DDLParseError,
    looks_like_connector_ddl,
    parse_create_table,
)
from flink_streaming_platform_web_spark.sql.script import (
    SqlCommand,
    SqlParseError,
    parse_script,
    parse_set,
)

MSG_NO_INSERT = "script must contain at least one INSERT statement"
MSG_BARE_SELECT = "bare SELECT is not supported in job scripts"


@dataclass
class ValidationResult:
    ok: bool
    errors: list[str] = field(default_factory=list)


def validate_script(
    script: str,
    spark: SparkSession | None = None,
    job_type: str = "streaming",
    variables: dict[str, str] | None = None,
) -> ValidationResult:
    """`variables` mirrors JobRunner.execute_script's ${var}
    substitution (the Nacos analog) — a script validated for a
    parameterized run must be checked with the same text the runner
    will execute."""
    errors: list[str] = []
    if variables:
        from flink_streaming_platform_web_spark.sql.script import (
            substitute_variables,
        )

        script = substitute_variables(script, variables)
    try:
        calls = parse_script(script)
    except SqlParseError as e:
        return ValidationResult(False, [str(e)])

    has_insert = False
    for call in calls:
        cmd, stmt = call.command, call.statement
        try:
            if cmd == SqlCommand.CREATE_TABLE:
                # same passthrough rule as JobRunner.execute_script:
                # a non-connector CREATE TABLE that our DDL parser
                # rejects is a Spark catalog statement — validate it
                # with Spark's parser instead of rejecting a script
                # the runner would happily execute (ADVICE r02)
                try:
                    t = parse_create_table(stmt)
                except DDLParseError:
                    if looks_like_connector_ddl(stmt):
                        raise
                    _spark_parse(spark, stmt)
                else:
                    if not t.connector:
                        _spark_parse(spark, stmt)
            elif cmd == SqlCommand.SET:
                parse_set(stmt)
            elif cmd in (SqlCommand.INSERT_INTO, SqlCommand.INSERT_OVERWRITE):
                has_insert = True
                _spark_parse(spark, stmt)
            elif cmd == SqlCommand.SELECT:
                if job_type == "streaming":
                    errors.append(f"{MSG_BARE_SELECT}: {stmt[:60]!r}")
                else:
                    _spark_parse(spark, stmt)
            elif cmd == SqlCommand.CREATE_VIEW:
                _spark_parse(spark, stmt)
        except (DDLParseError, SqlParseError) as e:
            errors.append(str(e))
        except Exception as e:  # Spark ParseException
            errors.append(f"syntax error in {stmt[:40]!r}: {e}")

    if job_type == "streaming" and not has_insert:
        errors.append(MSG_NO_INSERT)
    return ValidationResult(not errors, errors)


def _spark_parse(spark: SparkSession | None, stmt: str) -> None:
    """Syntax-check via Spark's parser when a session is available
    (the CalciteParser.parse analog, SqlValidation.java:98-99). The
    same Flink→Spark expression translation the runner applies happens
    first, so Flink-dialect constructs (FOR SYSTEM_TIME AS OF …)
    validate exactly as they execute."""
    if spark is None:
        return
    import re as _re

    m = _re.search(
        r"\bFROM\s+[\w.`]+\s+MATCH_RECOGNIZE\s*\(",
        stmt,
        _re.IGNORECASE,
    )
    if m:
        # Spark's parser doesn't know MATCH_RECOGNIZE; validate the
        # clause with the CEP parser instead (it raises on anything
        # outside the supported subset — the runner's exact
        # contract). Structural trigger only: the bare word in a
        # string literal stays on the Spark-parse path.
        from flink_streaming_platform_web_spark.operators.cep import (
            parse_match_recognize,
        )
        from flink_streaming_platform_web_spark.sql.script import (
            find_balanced,
        )

        j = stmt.index("(", m.end() - 1)
        parse_match_recognize(stmt[j + 1:find_balanced(stmt, j)])
        return
    from flink_streaming_platform_web_spark.functions.flink_compat import (
        translate_expr,
    )

    spark._jsparkSession.sessionState().sqlParser().parsePlan(
        translate_expr(stmt)
    )
