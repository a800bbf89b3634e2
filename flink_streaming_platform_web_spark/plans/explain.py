"""Physical-plan inspection utilities.

The scale contract (README "Scale posture") is enforceable only if
plan properties are observable: these helpers expose the
`.explain("formatted")` fields as data so tests and tuning scripts can
assert on them instead of eyeballing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    jvm = df._sc._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _split_depth0(text: str) -> list[str]:
    """Split on commas OUTSIDE (), [] and <> — a filter like
    `In(event_type, [click,view])` or a struct<a:int,b:int> column
    must stay one item (bare split mangled both, making plan-gate
    assertions mis-count)."""
    parts, buf, depth = [], [], 0
    for ch in text:
        if ch in "([<":
            depth += 1
        elif ch in ")]>":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
            continue
        buf.append(ch)
    tail = "".join(buf).strip()
    if tail:
        parts.append(tail)
    return parts


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters of every scan in the plan (flattened)."""
    out: list[str] = []
    for chunk in formatted_plan(df).split("PushedFilters:")[1:]:
        line = chunk.split("\n")[0].strip()
        if line.startswith("[") and line.endswith("]"):
            inner = line[1:-1].strip()
            if inner:
                out.extend(_split_depth0(inner))
    return out


def read_schema(df: DataFrame) -> list[str]:
    """Columns actually read by the scans (column-pruning check)."""
    cols: list[str] = []
    for chunk in formatted_plan(df).split("ReadSchema:")[1:]:
        line = chunk.split("\n")[0].strip()
        inner = line.split("<", 1)[-1].rsplit(">", 1)[0]
        cols.extend(
            f.split(":")[0] for f in _split_depth0(inner) if f
        )
    return cols


def shuffle_count(df: DataFrame) -> int:
    return executed_plan(df).count("Exchange hashpartitioning")


def has_python_eval(df: DataFrame) -> bool:
    plan = executed_plan(df)
    return "BatchEvalPython" in plan or "ArrowEvalPython" in plan
