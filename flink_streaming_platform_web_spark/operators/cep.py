"""MATCH_RECOGNIZE — Flink SQL's CEP surface (docs:
queries/match_recognize), as a Spark-first operator.

Spark has no MATCH_RECOGNIZE; the semantics are per-partition
sequential pattern matching, which maps exactly onto
``groupBy(partition).applyInPandas`` with an Arrow-batched greedy
matcher per key. The supported subset is the clause shape every
example in the Flink docs uses:

    PARTITION BY k1[, k2 ...]
    ORDER BY c1[, c2 ...]          -- ascending only
    MEASURES  <expr> AS name, ...  -- FIRST/LAST(V.col), COUNT(V.*),
                                   -- COUNT(*), SUM/MIN/MAX/AVG(V.col)
    ONE ROW PER MATCH
    AFTER MATCH SKIP PAST LAST ROW | SKIP TO NEXT ROW
    PATTERN (A B+ C* D?)           -- concatenation, greedy + * ?
    DEFINE  V AS <boolean over V.col / PREV(V.col[, n]) /
                  FIRST(X.col) / LAST(X.col) / literals,
                  AND OR NOT and comparisons/arithmetic>

Matching is the standard greedy-with-backtracking NFA walk (matches
searched from each row in ORDER BY order; quantifiers greedy; an
undefined variable is always-true — all per the SQL/RPR standard
Flink implements). ``AFTER MATCH SKIP PAST LAST ROW`` resumes after
the consumed rows; ``SKIP TO NEXT ROW`` resumes at start+1.

Scale shape: one shuffle on the PARTITION BY key; each key's rows
sort and match inside its executor (Flink's CepOperator keys state
identically). The matcher is per-key sequential BY DEFINITION of the
semantics — parallelism comes from the key space, the same contract
as Flink. Skewed giant keys are the hazard; the mitigation (as in
Flink) is a time-bounded WITHIN or pre-splitting, not a different
plan.

DEFINE/MEASURES expressions are translated to Python and evaluated
per candidate row against the match context — no Spark expression
round-trip inside the match loop (a per-row spark.sql would be a
driver loop; this stays in the executor's pandas batch).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

__all__ = ["MatchSpec", "parse_match_recognize", "match_recognize"]


@dataclass
class MatchSpec:
    partition_by: list[str]
    order_by: list[str]
    measures: list[tuple[str, str]]  # (python expr, output name)
    pattern: list[tuple[str, str]]  # (var, quant: '1' '+' '*' '?')
    define: dict[str, str]  # var -> python expr
    skip_past_last: bool = True
    output_schema: str = ""  # filled by match_recognize from a sample
    raw_measures: list[tuple[str, str]] = field(default_factory=list)
    # PATTERN (...) WITHIN INTERVAL 'n' unit — max seconds between a
    # match's first and last row (Flink's state-bounding time window);
    # None = unbounded
    within_seconds: float | None = None


_FUN = r"(FIRST|LAST|COUNT|SUM|MIN|MAX|AVG|PREV)"


def _xlate(expr: str) -> str:
    """SQL expression subset → python source evaluated against the
    matcher's context helpers (__prev/__first/__last/__agg/__cur)."""
    s = expr
    # PREV(V.col) / PREV(V.col, n) — relative to the CURRENT row
    s = re.sub(
        r"PREV\s*\(\s*(\w+)\.(\w+)\s*(?:,\s*(\d+))?\s*\)",
        lambda m: f"__prev('{m.group(2)}', {m.group(3) or 1})",
        s,
        flags=re.IGNORECASE,
    )
    # FIRST/LAST(V.col) over the rows var V matched so far
    s = re.sub(
        r"(FIRST|LAST)\s*\(\s*(\w+)\.(\w+)\s*\)",
        lambda m: (
            f"__{m.group(1).lower()}('{m.group(2)}', '{m.group(3)}')"
        ),
        s,
        flags=re.IGNORECASE,
    )
    # COUNT(V.*) / COUNT(*) / SUM|MIN|MAX|AVG(V.col)
    s = re.sub(
        r"COUNT\s*\(\s*(\w+)\.\*\s*\)",
        lambda m: f"__agg('count', '{m.group(1)}', None)",
        s,
        flags=re.IGNORECASE,
    )
    s = re.sub(
        r"COUNT\s*\(\s*\*\s*\)",
        "__agg('count', None, None)",
        s,
        flags=re.IGNORECASE,
    )
    s = re.sub(
        r"(SUM|MIN|MAX|AVG)\s*\(\s*(\w+)\.(\w+)\s*\)",
        lambda m: (
            f"__agg('{m.group(1).lower()}', '{m.group(2)}',"
            f" '{m.group(3)}')"
        ),
        s,
        flags=re.IGNORECASE,
    )
    # bare V.col — the current row inside DEFINE, the LAST row of V
    # in MEASURES (handled by caller passing the right __cur).
    # Identifiers only: \w.\w would also rewrite float literals
    # (1.5 → __cur('1','5'))
    s = re.sub(
        r"\b([A-Za-z_]\w*)\.([A-Za-z_]\w*)\b", r"__cur('\1', '\2')", s
    )
    # SQL operators → python
    s = re.sub(r"<>", "!=", s)
    s = re.sub(r"(?<![<>!=])=(?!=)", "==", s)
    s = re.sub(r"\bAND\b", "and", s, flags=re.IGNORECASE)
    s = re.sub(r"\bOR\b", "or", s, flags=re.IGNORECASE)
    s = re.sub(r"\bNOT\b", "not", s, flags=re.IGNORECASE)
    s = re.sub(r"\bNULL\b", "None", s, flags=re.IGNORECASE)
    return s


def parse_match_recognize(clause: str) -> MatchSpec:
    """Parse the MATCH_RECOGNIZE(...) clause body (the text between
    the outer parens). Raises ValueError on anything outside the
    supported subset — loud, never a silent wrong answer."""

    def grab(name: str, stop: str) -> str:
        m = re.search(
            rf"{name}\s+(.*?)\s*(?={stop})",
            clause,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(f"MATCH_RECOGNIZE: missing {name}")
        return m.group(1).strip()

    part = [
        c.strip().strip("`")
        for c in grab("PARTITION\\s+BY", "ORDER\\s+BY").split(",")
    ]
    order_txt = grab("ORDER\\s+BY", "MEASURES")
    order = []
    for c in order_txt.split(","):
        c = c.strip().strip("`")
        if re.search(r"\sDESC$", c, re.IGNORECASE):
            raise ValueError(
                "MATCH_RECOGNIZE: only ascending ORDER BY supported"
            )
        order.append(re.sub(r"\s+ASC$", "", c, flags=re.IGNORECASE))
    if re.search(r"ALL\s+ROWS\s+PER\s+MATCH", clause, re.IGNORECASE):
        raise ValueError(
            "MATCH_RECOGNIZE: only ONE ROW PER MATCH supported"
        )
    measures_txt = grab(
        "MEASURES", r"(?:ONE\s+ROW\s+PER\s+MATCH|AFTER\s+MATCH|PATTERN)"
    )
    measures, raw = [], []
    for item in re.split(r",(?![^()]*\))", measures_txt):
        m = re.match(
            r"(.+?)\s+AS\s+`?(\w+)`?\s*$", item.strip(),
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(f"MATCH_RECOGNIZE: bad measure {item!r}")
        measures.append((_xlate(m.group(1)), m.group(2)))
        raw.append((m.group(1).strip(), m.group(2)))
    skip_past = not re.search(
        r"AFTER\s+MATCH\s+SKIP\s+TO\s+NEXT\s+ROW", clause, re.IGNORECASE
    )
    pat_txt = re.search(
        r"PATTERN\s*\(\s*(.*?)\s*\)", clause, re.IGNORECASE | re.DOTALL
    )
    if not pat_txt:
        raise ValueError("MATCH_RECOGNIZE: missing PATTERN")
    within = None
    wm = re.search(
        r"WITHIN\s+INTERVAL\s+'(\d+)'\s+(\w+)", clause, re.IGNORECASE
    )
    if wm:
        unit = {
            "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
        }.get(wm.group(2).lower())
        if unit is None:
            raise ValueError(
                f"MATCH_RECOGNIZE: unsupported WITHIN unit"
                f" {wm.group(2)!r}"
            )
        within = int(wm.group(1)) * unit
    pattern = []
    for tok in pat_txt.group(1).split():
        m = re.fullmatch(r"(\w+)([+*?]?)", tok)
        if not m:
            raise ValueError(
                f"MATCH_RECOGNIZE: unsupported pattern token {tok!r}"
            )
        pattern.append((m.group(1), m.group(2) or "1"))
    define_txt = re.search(
        r"DEFINE\s+(.*)$", clause, re.IGNORECASE | re.DOTALL
    )
    define = {}
    if define_txt:
        for item in re.split(r",(?![^()]*\))", define_txt.group(1)):
            m = re.match(
                r"\s*(\w+)\s+AS\s+(.+?)\s*$", item,
                re.IGNORECASE | re.DOTALL,
            )
            if not m:
                raise ValueError(
                    f"MATCH_RECOGNIZE: bad DEFINE {item!r}"
                )
            define[m.group(1)] = _xlate(m.group(2))
    return MatchSpec(
        partition_by=part,
        order_by=order,
        measures=measures,
        pattern=pattern,
        define=define,
        skip_past_last=skip_past,
        raw_measures=raw,
        within_seconds=within,
    )


def _match_ctx(
    rows: list[dict],
    start_idx: int,
    assigned: list[str],
    cur_idx: int | None = None,
    cur_var: str | None = None,
) -> dict:
    """Evaluation context shared by DEFINE (cur_idx/cur_var set: the
    candidate row under test) and MEASURES (cur unset: bare V.col
    means LAST(V.col), PREV is relative to the match's last row)."""

    def _var_rows(var):
        return [
            rows[start_idx + i]
            for i, v in enumerate(assigned)
            if var is None or v == var
        ]

    def __first(var, col):
        r = _var_rows(var)
        return r[0][col] if r else None

    def __last(var, col):
        r = _var_rows(var)
        return r[-1][col] if r else None

    def __agg(fn, var, col):
        r = _var_rows(var)
        if fn == "count":
            return len(r)
        vals = [x[col] for x in r if x[col] is not None]
        if not vals:
            return None
        if fn == "sum":
            return sum(vals)
        if fn == "min":
            return min(vals)
        if fn == "max":
            return max(vals)
        return sum(vals) / len(vals)

    anchor = (
        cur_idx if cur_idx is not None else start_idx + len(assigned) - 1
    )

    def __prev(col, k=1):
        j = anchor - k
        return rows[j][col] if j >= 0 else None

    def __cur(var, col):
        if cur_var is not None and var == cur_var:
            return rows[cur_idx][col]
        return __last(var, col)

    return {
        "__cur": __cur,
        "__prev": __prev,
        "__first": __first,
        "__last": __last,
        "__agg": __agg,
    }


def _run_matcher(
    rows: list[dict], spec: MatchSpec
) -> tuple[list[tuple[int, int, dict, bool]], int | None]:
    """Sequential greedy-with-backtracking scan over one partition's
    ordered rows. Returns (matches, earliest_viable):

    - matches: (start, end, output_row, ran_out) per match, in scan
      order (end exclusive). ran_out means the attempt touched the
      buffer end during the search — the match COULD still grow or
      change if more rows arrive (e.g. a greedy A+ hit the end, then
      backtracked into a shorter complete match); batch callers
      ignore it (EOF is final), the streaming wrapper must treat such
      a match as pending, not closed;
    - earliest_viable: the smallest NON-consumed start index whose
      attempt ran out of rows mid-pattern without matching — None if
      every failure was definitive.
    """
    n = len(rows)
    matches: list[tuple[int, int, dict, bool]] = []
    earliest_viable: int | None = None
    start = 0
    pattern = spec.pattern
    # pre-compile every expression once per partition — eval of a
    # compiled code object is ~3× faster than re-parsing source text
    # per candidate row, and the matcher is the hot loop here
    define_code = {
        v: compile(e, "<define>", "eval") for v, e in spec.define.items()
    }
    measure_code = [
        (compile(e, "<measure>", "eval"), name)
        for e, name in spec.measures
    ]

    def try_match(start_idx: int):
        """(longest greedy assignment or None, ran_out_of_rows)."""
        best: list[str] | None = None
        ran_out = False

        def ok(var, assigned, idx):
            if spec.within_seconds is not None:
                # WITHIN bound: a row outside the time window from the
                # match's first row can never extend the match
                # (Flink's state-bounding semantics)
                a = rows[start_idx][spec.order_by[0]]
                b = rows[idx][spec.order_by[0]]
                try:
                    elapsed = (b - a).total_seconds()
                except AttributeError:
                    elapsed = float(b - a)
                if elapsed > spec.within_seconds:
                    return False
            code = define_code.get(var)
            if code is None:
                return True  # undefined variable is always-true
            try:
                return bool(
                    eval(  # noqa: S307 — translated subset, no names
                        code, {"__builtins__": {}},
                        _match_ctx(rows, start_idx, assigned, idx, var),
                    )
                )
            except TypeError:  # NULL in a comparison → no match
                return False

        def walk(pi: int, idx: int, assigned: list[str]):
            nonlocal best, ran_out
            if pi == len(pattern):
                if best is None or len(assigned) > len(best):
                    best = list(assigned)
                return
            var, quant = pattern[pi]
            if quant in ("1", "?"):
                if idx >= n:
                    ran_out = True  # more rows could complete this
                elif ok(var, assigned, idx):
                    walk(pi + 1, idx + 1, assigned + [var])
                if quant == "?":
                    walk(pi + 1, idx, assigned)
                return
            # + / * : greedy — consume as many as possible, then
            # backtrack toward the minimum
            taken = []
            while idx + len(taken) < n and ok(
                var, assigned + taken, idx + len(taken)
            ):
                taken.append(var)
            if idx + len(taken) >= n:
                ran_out = True  # the greedy run hit the buffer end
            lo = 1 if quant == "+" else 0
            for k in range(len(taken), lo - 1, -1):
                walk(pi + 1, idx + k, assigned + taken[:k])
                if best is not None:
                    return  # greedy: first (longest-prefix) wins

        walk(0, start_idx, [])
        return best, ran_out

    while start < n:
        assigned, ran_out = try_match(start)
        if assigned:
            end = start + len(assigned)
            c = _match_ctx(rows, start, assigned)
            row_out = {k: rows[start][k] for k in spec.partition_by}
            for code, name in measure_code:
                row_out[name] = eval(  # noqa: S307
                    code, {"__builtins__": {}}, c
                )
            matches.append((start, end, row_out, ran_out))
            start = end if spec.skip_past_last else start + 1
        else:
            if ran_out and earliest_viable is None:
                earliest_viable = start
            start += 1
    return matches, earliest_viable

def _match_partition(rows: list[dict], spec: MatchSpec) -> list[dict]:
    """Batch semantics: EOF closes everything — emit every match."""
    return [out for _, _, out, _ in _run_matcher(rows, spec)[0]]

def match_recognize(
    df: DataFrame, spec: MatchSpec, output_schema: str
) -> DataFrame:
    """Apply the spec per partition: one shuffle on PARTITION BY, the
    match loop runs Arrow-batched inside each executor."""

    def run(pdf):
        import pandas as pd

        pdf = pdf.sort_values(spec.order_by, kind="mergesort")
        rows = pdf.to_dict("records")
        return pd.DataFrame(
            _match_partition(rows, spec)
            or {
                # empty: typed empty frame matching the schema
                name: pd.Series(dtype="object")
                for name in [
                    *spec.partition_by,
                    *[n for _, n in spec.measures],
                ]
            }
        )

    # explicit REPARTITION_BY_NUM on the keys: AQE's byte-based
    # coalescing sees tiny shuffle partitions and would collapse the
    # matcher onto 1-2 tasks, serializing the (python-side, per-row)
    # match loop; a user-numbered repartition is exempt from
    # coalescing and the groupBy reuses its clustering, so no second
    # exchange appears
    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.repartition(par, *spec.partition_by)
        .groupBy(*spec.partition_by)
        .applyInPandas(run, output_schema)
    )


def match_recognize_sql(df: DataFrame, clause: str, output_schema: str):
    """Parse + apply in one step (the runner's SQL route)."""
    return match_recognize(df, parse_match_recognize(clause), output_schema)


def infer_output_schema(spec: MatchSpec, df: DataFrame) -> str:
    """Output DDL for ONE ROW PER MATCH: partition columns keep their
    source types; measures infer from the raw expression — COUNT →
    BIGINT, AVG → DOUBLE, FIRST/LAST/MIN/MAX/SUM(V.col) → the
    column's type (SUM over integers widens to BIGINT)."""
    src = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    parts = [f"{c} {src[c]}" for c in spec.partition_by]
    for raw, name in spec.raw_measures:
        bare = re.fullmatch(r"(\w+)\.(\w+)", raw.strip())
        if bare:  # bare V.col (= LAST(V.col)) keeps the column type
            parts.append(f"{name} {src[bare.group(2)]}")
            continue
        m = re.match(
            rf"{_FUN}\s*\(\s*(?:(\w+)\.)?(\w+|\*)", raw, re.IGNORECASE
        )
        if not m:
            raise ValueError(
                f"MATCH_RECOGNIZE: cannot infer type of {raw!r}"
            )
        fn = m.group(1).upper()
        col = m.group(3)
        if fn == "COUNT":
            t = "bigint"
        elif fn == "AVG":
            t = "double"
        else:
            t = src[col]
            if fn == "SUM" and t in ("int", "smallint", "tinyint"):
                t = "bigint"
        parts.append(f"{name} {t}")
    return ", ".join(parts)


# --------------------------------------------------------------------------
# q45 — MATCH_RECOGNIZE rising-streak detection, oracle-gated.
# --------------------------------------------------------------------------

Q45_CLAUSE = """
  PARTITION BY user_id
  ORDER BY ts, event_id
  MEASURES
    FIRST(STRT.event_id) AS start_id,
    LAST(UP.event_id) AS end_id,
    COUNT(UP.*) AS n_up,
    LAST(UP.value) AS peak
  ONE ROW PER MATCH
  AFTER MATCH SKIP PAST LAST ROW
  PATTERN (STRT UP+)
  DEFINE UP AS UP.value > PREV(UP.value)
"""


def q45_match_recognize(spark, sf_dir: str) -> DataFrame:
    """Flink SQL MATCH_RECOGNIZE (docs: queries/match_recognize) —
    rising value streaks per user: the standard Ticker example's
    shape with the greedy `STRT UP+` pattern. Greedy + SKIP PAST LAST
    ROW makes matches exactly the maximal strictly-increasing runs,
    which the DuckDB oracle replays as gaps-and-islands — an
    independent formulation of the same semantics, so the hash gate
    checks the matcher, not a transliteration of it."""
    from flink_streaming_platform_web_spark.tables import load

    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    spec = parse_match_recognize(Q45_CLAUSE)
    return match_recognize(ev, spec, infer_output_schema(spec, ev))


ORACLE_Q45 = """
WITH ordered AS (
  SELECT user_id, event_id, value,
         ROW_NUMBER() OVER w AS rn,
         CASE WHEN value > LAG(value) OVER w THEN 0 ELSE 1 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
isl AS (
  SELECT *, SUM(brk) OVER (
      PARTITION BY user_id ORDER BY rn) AS island
  FROM ordered
)
SELECT user_id, start_id, end_id, n_up, peak FROM (
  SELECT user_id,
         FIRST(event_id ORDER BY rn) AS start_id,
         LAST(event_id ORDER BY rn) AS end_id,
         CAST(COUNT(*) - 1 AS BIGINT) AS n_up,
         LAST(value ORDER BY rn) AS peak
  FROM isl GROUP BY user_id, island
) WHERE n_up >= 1
"""

QUERIES = {"q45_match_recognize": q45_match_recognize}
ORACLES = {"q45_match_recognize": ORACLE_Q45}


def stream_match_recognize(
    df: DataFrame, spec: MatchSpec, output_schema: str
) -> DataFrame:
    """STREAMING MATCH_RECOGNIZE over an event-time-ordered ingest —
    per-key NFA state via ``applyInPandasWithState`` (Flink's
    CepOperator shape: keyed state, matches spanning micro-batches).

    Emission frontier: a match is emitted only once it is CLOSED —
    i.e. it ends before the first *viable pending* position (a
    non-consumed start whose attempt ran out of rows: it could still
    become, or grow into, a match when more rows arrive). State per
    key retains exactly the buffer suffix from that frontier — for
    run-shaped patterns that is the active tail, not the history.

    Ingest-order contract (checked, loud): rows must arrive
    per-key-ordered on the first ORDER BY column across micro-batches
    — the analog of Flink CEP's watermark-sorted input. A production
    port buffers by watermark instead of asserting; the assertion
    keeps this honest at harness scale. SKIP TO NEXT ROW would emit
    overlapping matches whose later occurrences can still change, so
    only SKIP PAST LAST ROW is supported here."""
    import pickle
    from collections.abc import Iterator

    import pandas as pd

    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    if not spec.skip_past_last:
        raise ValueError(
            "stream_match_recognize supports AFTER MATCH SKIP PAST"
            " LAST ROW only"
        )
    ord0 = spec.order_by[0]
    out_names = [*spec.partition_by, *[n for _, n in spec.measures]]

    def update(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        tail: list[dict] = (
            pickle.loads(state.get[0]) if state.exists else []
        )
        new = pd.concat(list(batches))
        new = new.sort_values(spec.order_by, kind="mergesort")
        rows = new.to_dict("records")
        if tail and rows and rows[0][ord0] < tail[-1][ord0]:
            raise RuntimeError(
                "stream_match_recognize: out-of-order ingest —"
                f" batch starts at {rows[0][ord0]} before buffered"
                f" {tail[-1][ord0]}; stage the stream event-time-"
                "ordered (or add watermark buffering upstream)"
            )
        buf = tail + rows
        matches, viable = _run_matcher(buf, spec)
        frontier = len(buf)
        if viable is not None:
            frontier = min(frontier, viable)
        # a match is pending (can still grow/change) when it ends at
        # the buffer end OR its search touched the end at all — a
        # greedy quantifier that hit the end and then backtracked
        # into a shorter complete match would extend with more rows,
        # so emitting it now would diverge from batch semantics
        pending = [
            s
            for s, e, _, ran_out in matches
            if e == len(buf) or ran_out
        ]
        if pending:
            frontier = min(frontier, pending[0])
        emit = [out for s, e, out, _ in matches if e <= frontier]
        keep = buf[frontier:]
        state.update((pickle.dumps(keep),))
        if emit:
            yield pd.DataFrame(emit, columns=out_names)

    return df.groupBy(*spec.partition_by).applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType="tail binary",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
