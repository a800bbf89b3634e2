"""Flink-SQL expression → Spark-SQL expression translation.

The reference passes user expressions verbatim to Flink
(ExecuteSql.java:53-56); its demo corpus uses a small scalar surface
(SURVEY §2.3 O17): PROCTIME(), LOCALTIMESTAMP, DATE_FORMAT,
TO_TIMESTAMP, FROM_UNIXTIME, plus arithmetic. Spark SQL implements the
same names with (mostly) the same semantics; the translation table
below covers the divergent ones, applied textually to computed-column
and query expressions before `F.expr` / `spark.sql`.

UDF registration (O23/O24): ``register_function`` maps the
``CREATE FUNCTION name AS 'impl'`` statement — Python callables
register directly (`spark.udf.register`); JVM classnames go through
`registerJavaFunction` when the jar is on the classpath
(reference's ext-jar mechanism, CommandUtil.java:42-47).
"""

from __future__ import annotations

import importlib
import re
from collections.abc import Callable

from pyspark.sql import SparkSession

# Flink name → Spark replacement (textual, case-insensitive, only
# where semantics or names diverge; identical built-ins pass through)
_FN_REWRITES: list[tuple[re.Pattern[str], str]] = [
    # processing-time marker: Spark has no PROCTIME; ingest-time stamp
    # \s* between name and parens: demo_2.md writes `PROCTIME ()`
    (re.compile(r"\bPROCTIME\s*\(\s*\)", re.IGNORECASE), "current_timestamp()"),
    (re.compile(r"\bLOCALTIMESTAMP\b(?!\()", re.IGNORECASE), "localtimestamp()"),
    (re.compile(r"\bNOW\s*\(\s*\)", re.IGNORECASE), "current_timestamp()"),
    # Flink CURRENT_TIMESTAMP is ltz; Spark's matches under UTC session tz
]


# demo_3.md lookup join: `JOIN dim FOR SYSTEM_TIME AS OF a.proctime AS b`.
# Spark's streaming model joins each micro-batch against the dim
# snapshot, which IS the processing-time temporal join contract
# (staleness ≤ trigger interval — SURVEY §7.3); syntactically the
# clause just drops.
_TEMPORAL_JOIN_RE = re.compile(
    r"\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+[\w.]+(?=\s+AS\s+|\s+ON\s+)",
    re.IGNORECASE,
)


# Flink group-window syntax (demo_4.md TUMBLE, demo_5.md HOP, the
# README grammar table) → Spark's window()/session_window(). Interval
# literals convert as INTERVAL '60' SECOND → '60 seconds'. Spark
# accepts the identical window expression in SELECT and GROUP BY and
# merges them, so TUMBLE_START/HOP_END become .start/.end projections
# of the same window — the reference scripts run VERBATIM.
_IVL = r"INTERVAL\s+'(\d+)'\s+(\w+)"
_TUMBLE_RE = re.compile(
    rf"\bTUMBLE(?P<part>_START|_END)?\s*\(\s*(?P<col>[\w.`]+)\s*,"
    rf"\s*{_IVL}\s*\)",
    re.IGNORECASE,
)
_HOP_RE = re.compile(
    rf"\bHOP(?P<part>_START|_END)?\s*\(\s*(?P<col>[\w.`]+)\s*,"
    rf"\s*{_IVL}\s*,\s*{_IVL}\s*\)",
    re.IGNORECASE,
)
_SESSION_RE = re.compile(
    rf"\bSESSION(?P<part>_START|_END)?\s*\(\s*(?P<col>[\w.`]+)\s*,"
    rf"\s*{_IVL}\s*\)",
    re.IGNORECASE,
)


def _ivl_str(n: str, unit: str) -> str:
    u = unit.lower()
    if not u.endswith("s"):
        u += "s"
    return f"{n} {u}"


def _window_part(part: str | None) -> str:
    if not part:
        return ""
    return ".start" if part.upper() == "_START" else ".end"


def _sub_tumble(m: re.Match) -> str:
    ivl = _ivl_str(m.group(3), m.group(4))
    return f"window({m.group('col')}, '{ivl}'){_window_part(m.group('part'))}"


def _sub_hop(m: re.Match) -> str:
    # Flink arg order is (col, slide, size); Spark's is (col, size, slide)
    slide = _ivl_str(m.group(3), m.group(4))
    size = _ivl_str(m.group(5), m.group(6))
    return (
        f"window({m.group('col')}, '{size}', '{slide}')"
        f"{_window_part(m.group('part'))}"
    )


def _sub_session(m: re.Match) -> str:
    gap = _ivl_str(m.group(3), m.group(4))
    return (
        f"session_window({m.group('col')}, '{gap}')"
        f"{_window_part(m.group('part'))}"
    )


# split into [code, 'literal', code, 'literal', ...] so the textual
# rewrites never touch the inside of a string literal (a filter on
# "col = 'TUMBLE(ts, ...)'" must pass through byte-identical);
# handles '' escapes within literals
_LITERAL_SPLIT_RE = re.compile(r"('(?:[^']|'')*')")


def translate_expr(expr: str) -> str:
    """Rewrite a Flink SQL expression into Spark SQL. String literals
    pass through untouched — only code segments are rewritten.

    Caveat: the window rewrites consume INTERVAL literals as part of
    their own patterns, so those specific quoted intervals (e.g. the
    '60' in TUMBLE(ts, INTERVAL '60' SECOND)) are intentionally
    rewritten — the literal-split exempts free-standing strings, and
    the window patterns re-match across the split via a pre-pass."""
    # window syntax spans literal boundaries (INTERVAL '60' SECOND),
    # so run those rewrites FIRST on the raw text, then protect the
    # remaining literals from the simple function renames
    out = _TEMPORAL_JOIN_RE.sub("", expr)
    out = _TUMBLE_RE.sub(_sub_tumble, out)
    out = _HOP_RE.sub(_sub_hop, out)
    out = _SESSION_RE.sub(_sub_session, out)
    parts = _LITERAL_SPLIT_RE.split(out)
    for i in range(0, len(parts), 2):  # even indexes = code segments
        for pat, repl in _FN_REWRITES:
            parts[i] = pat.sub(repl, parts[i])
    return "".join(parts)


_CREATE_FN_RE = re.compile(
    r"create\s+(?:temporary\s+)?(?:system\s+)?function\s+"
    r"(?:if\s+not\s+exists\s+)?(?P<name>[\w.`]+)\s+as\s+'(?P<impl>[^']+)'"
    r"(?:\s+language\s+(?P<lang>\w+))?",
    re.IGNORECASE,
)


def register_function(spark: SparkSession, statement: str) -> str:
    """Execute a ``CREATE FUNCTION`` statement.

    - ``language python`` (our extension) or a dotted path resolvable
      as ``module:callable`` / ``module.callable`` → Python UDF via
      ``spark.udf.register``.
    - otherwise treated as a JVM classname (the reference's UDF jar
      path, docs/manual-sql.md §1.e) → ``registerJavaFunction``.
    Returns the registered function name.
    """
    m = _CREATE_FN_RE.match(statement.strip())
    if not m:
        raise ValueError(f"cannot parse CREATE FUNCTION: {statement[:80]!r}")
    name = m.group("name").strip("`").split(".")[-1]
    impl = m.group("impl")
    lang = (m.group("lang") or "").lower()
    fn = _resolve_python(impl) if (lang == "python" or ":" in impl) else None
    if fn is not None:
        spark.udf.register(name, fn)
    else:
        spark.udf.registerJavaFunction(name, impl)
    return name


def _resolve_python(impl: str) -> Callable | None:
    """Resolve 'pkg.mod:fn' (or dotted fallback) to a callable."""
    mod_name, _, attr = impl.partition(":")
    if not attr:
        mod_name, _, attr = impl.rpartition(".")
    try:
        return getattr(importlib.import_module(mod_name), attr)
    except (ImportError, AttributeError):
        return None
