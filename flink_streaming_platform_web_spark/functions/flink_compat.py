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
    # Flink's one-arg LISTAGG(x) joins with ',' (docs:
    # functions/systemfunctions); Spark's listagg(x) concatenates
    # bare — inject Flink's default separator. Two-arg forms pass
    # through untouched (the signatures match). Conservative match:
    # a simple (optionally DISTINCT) column argument only.
    (
        re.compile(
            r"\bLISTAGG\s*\(\s*((?:DISTINCT\s+)?[\w.`]+)\s*\)",
            re.IGNORECASE,
        ),
        r"listagg(\1, ',')",
    ),
    # Flink 1.13's TO_TIMESTAMP_LTZ(numeric, precision) — FLINK-21869,
    # the release's datetime headliner. Spark's NATIVE to_timestamp_ltz
    # parses strings, so the numeric form must rewrite (a SQL UDF
    # cannot shadow a builtin): precision 0 → timestamp_seconds,
    # 3 → timestamp_millis (the only precisions Flink accepts).
    # Spark's TIMESTAMP is the LTZ type, so the conversion is exact.
    (
        re.compile(
            r"\bTO_TIMESTAMP_LTZ\s*\(\s*([^,()]+(?:\([^()]*\))?[^,()]*)"
            r"\s*,\s*0\s*\)",
            re.IGNORECASE,
        ),
        r"timestamp_seconds(\1)",
    ),
    (
        re.compile(
            r"\bTO_TIMESTAMP_LTZ\s*\(\s*([^,()]+(?:\([^()]*\))?[^,()]*)"
            r"\s*,\s*3\s*\)",
            re.IGNORECASE,
        ),
        r"timestamp_millis(\1)",
    ),
]


# demo_3.md lookup join: `JOIN dim FOR SYSTEM_TIME AS OF a.proctime AS b`.
# Spark's streaming model joins each micro-batch against the dim
# snapshot, which IS the processing-time temporal join contract
# (staleness ≤ trigger interval — SURVEY §7.3); syntactically the
# clause just drops.
_TEMPORAL_JOIN_RE = re.compile(
    # alias forms after the clause: `AS b ON`, bare `b ON`, or the ON
    # directly — all valid Flink (demo_3 uses `AS b`; the event-time
    # examples write the bare alias)
    r"\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+[\w.]+"
    r"(?=\s+AS\s+|\s+ON\s+|\s+`?\w+`?\s+ON\s+)",
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


# ------------------------------------------------------------------
# Flink 1.13+ windowing TVFs (FLIP-145): TABLE(TUMBLE(TABLE src,
# DESCRIPTOR(ts), size)), HOP(..., slide, size), CUMULATE(..., step,
# size). Rewritten into a derived subquery that appends the exact
# columns the Flink TVF appends — window_start, window_end,
# window_time (= window_end - 1 ms) — so every downstream reference
# (SELECT list, GROUP BY window_start/window_end, HAVING, joins on
# window bounds) works untouched as plain column references. Named
# arguments (DATA =>, TIMECOL =>, SIZE =>, SLIDE =>, STEP =>) are
# accepted; the optional OFFSET argument is not supported.
#
# CUMULATE has no Spark builtin: the rewrite assigns each row to every
# expanding slice of its max-size window whose end is after the row's
# event time (explode over size/step slice indexes + filter) — the
# same declarative expansion operators/windows.q36 benchmarks.
#
# Streaming caveat (documented, batch is exact): grouping by the
# derived window_start/window_end columns is an ordinary keyed
# aggregation to Spark — state for a window is not watermark-evicted
# the way GROUP BY window(...) structs are. The group-window syntax
# above remains the streaming-native path; the reference's own script
# corpus (demo_4/demo_5) uses that form.
# ------------------------------------------------------------------
_TVF_IVL1 = (
    r"(?:(?P<i1k>\w+)\s*=>\s*)?INTERVAL\s+'(?P<i1n>\d+)'\s+(?P<i1u>\w+)"
)
_TVF_IVL2 = (
    r"(?:(?P<i2k>\w+)\s*=>\s*)?INTERVAL\s+'(?P<i2n>\d+)'\s+(?P<i2u>\w+)"
)
_WINDOW_TVF_RE = re.compile(
    rf"\bTABLE\s*\(\s*(?P<kind>TUMBLE|HOP|CUMULATE)\s*\(\s*"
    rf"(?:DATA\s*=>\s*)?TABLE\s+(?P<src>[\w.`]+)\s*,\s*"
    rf"(?:TIMECOL\s*=>\s*)?DESCRIPTOR\s*\(\s*(?P<col>[\w.`]+)\s*\)\s*,\s*"
    rf"{_TVF_IVL1}(?:\s*,\s*{_TVF_IVL2})?\s*\)\s*\)",
    re.IGNORECASE,
)

_IVL_SECONDS = {
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
}


def _ivl_seconds(n: str, unit: str) -> int:
    u = unit.lower().rstrip("s")
    if u not in _IVL_SECONDS:
        raise ValueError(f"unsupported window TVF interval unit: {unit}")
    return int(n) * _IVL_SECONDS[u]


# positional interval-argument order per TVF kind (Flink FLIP-145);
# named arguments may appear in ANY order, so they resolve by name
_TVF_ARG_ORDER = {
    "TUMBLE": ("size",),
    "HOP": ("slide", "size"),
    "CUMULATE": ("step", "size"),
}


def _tvf_intervals(m: re.Match, kind: str) -> dict[str, tuple[str, str]]:
    """Resolve the TVF's interval arguments to {role: (n, unit)} —
    positionally when unnamed, by keyword when named (mixing the two
    is rejected; Flink's named form names every argument)."""
    order = _TVF_ARG_ORDER[kind]
    args = []
    for i in ("1", "2"):
        if m.group(f"i{i}n"):
            args.append(
                (
                    (m.group(f"i{i}k") or "").lower() or None,
                    (m.group(f"i{i}n"), m.group(f"i{i}u")),
                )
            )
    if len(args) != len(order):
        raise ValueError(
            f"{kind} TVF takes {len(order)} interval argument(s)"
            f" ({', '.join(order)}); got {len(args)}"
        )
    names = [k for k, _ in args]
    if all(k is None for k in names):
        return dict(zip(order, (v for _, v in args)))
    if any(k is None for k in names):
        raise ValueError(
            f"{kind} TVF: name all interval arguments or none"
        )
    if sorted(names) != sorted(order):
        raise ValueError(
            f"{kind} TVF: expected named arguments {set(order)},"
            f" got {set(names)}"
        )
    return {k: v for k, v in args}


def _sub_window_tvf(m: re.Match) -> str:
    kind = m.group("kind").upper()
    src, col = m.group("src"), m.group("col")
    ivls = _tvf_intervals(m, kind)
    if kind == "TUMBLE":
        win = f"window({col}, '{_ivl_str(*ivls['size'])}')"
    elif kind == "HOP":
        # Flink TVF positional order is (slide, size); Spark's
        # window() is (size, slide)
        win = (
            f"window({col}, '{_ivl_str(*ivls['size'])}',"
            f" '{_ivl_str(*ivls['slide'])}')"
        )
    else:  # CUMULATE
        step_s = _ivl_seconds(*ivls["step"])
        size_s = _ivl_seconds(*ivls["size"])
        if step_s <= 0 or size_s % step_s != 0:
            raise ValueError(
                "CUMULATE size must be a positive multiple of step"
            )
        steps = size_s // step_s
        wend = f"timestampadd(SECOND, __k * {step_s}, __ws)"
        return (
            f"(SELECT * EXCEPT(__ws, __k), __ws AS window_start, "
            f"{wend} AS window_end, "
            f"{wend} - INTERVAL '0.001' SECOND AS window_time "
            f"FROM (SELECT *, window({col}, '{size_s} seconds').start "
            f"AS __ws, explode(sequence(1, {steps})) AS __k FROM {src}) "
            f"WHERE {wend} > {col})"
        )
    return (
        f"(SELECT * EXCEPT(__w), __w.start AS window_start, "
        f"__w.end AS window_end, "
        f"__w.end - INTERVAL '0.001' SECOND AS window_time "
        f"FROM (SELECT *, {win} AS __w FROM {src}))"
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
    # windowing TVFs first: their inner TUMBLE/HOP/CUMULATE text must
    # not be half-eaten by the group-window rewrites below
    out = _WINDOW_TVF_RE.sub(_sub_window_tvf, out)
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
    if lang == "python":
        # explicit language: resolution failures surface as the real
        # Python import error, never a baffling JVM classname error
        fn = _resolve_python(impl, must=True)
    elif ":" in impl:
        fn = _resolve_python(impl)
    else:
        fn = None
    if fn is not None:
        spark.udf.register(name, fn, _python_return_type(fn))
    else:
        spark.udf.registerJavaFunction(name, impl)
    return name


def _python_return_type(fn: Callable):
    """Return type for a registered Python UDF from the callable's
    annotation — spark.udf.register's default is StringType for
    EVERYTHING, which makes an int-returning bucket function sort
    lexicographically ('10' < '9') and bool results compare as
    strings. Unannotated callables keep the string default (documented
    Spark behavior)."""
    import typing

    from pyspark.sql import types as T

    hints = typing.get_type_hints(fn) if callable(fn) else {}
    return {
        int: T.LongType(),
        float: T.DoubleType(),
        bool: T.BooleanType(),
        str: T.StringType(),
    }.get(hints.get("return"), T.StringType())


def _resolve_python(impl: str, must: bool = False) -> Callable | None:
    """Resolve 'pkg.mod:fn' (or dotted fallback) to a callable."""
    mod_name, _, attr = impl.partition(":")
    if not attr:
        mod_name, _, attr = impl.rpartition(".")
    try:
        return getattr(importlib.import_module(mod_name), attr)
    except (ImportError, AttributeError):
        if must:
            raise
        return None
