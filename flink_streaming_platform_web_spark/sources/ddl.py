"""Flink-style CREATE TABLE DDL parser.

Covers the reference demo corpus's DDL surface
(docs/sql_demo/demo_1.md … demo_6.md, demo_datagen.md):

- typed physical columns (BIGINT/VARCHAR/DECIMAL(p,s)/TIMESTAMP(n)/…)
- computed (virtual) columns  ``name AS expr``  (``proctime AS
  PROCTIME()``, ``ts AS localtimestamp`` — demo_1.md, demo_datagen.md)
- ``WATERMARK FOR ts AS ts - INTERVAL 'n' SECOND``  (demo_4.md)
- ``PRIMARY KEY (…) NOT ENFORCED``  (upsert sinks, demo_1.md)
- ``WITH ('k' = 'v', …)`` connector options

The output is a plain ``TableDef`` the connector registry consumes.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class ColumnDef:
    name: str
    spark_type: str | None = None  # None for computed columns
    computed_expr: str | None = None  # Flink expression text
    nullable: bool = True


@dataclass
class WatermarkDef:
    column: str
    expr: str  # e.g. "ts - INTERVAL '20' SECOND"
    delay: str | None = None  # Spark delay string, e.g. "20 seconds"


@dataclass
class TableDef:
    name: str
    columns: list[ColumnDef] = field(default_factory=list)
    primary_key: list[str] = field(default_factory=list)
    watermark: WatermarkDef | None = None
    options: dict[str, str] = field(default_factory=dict)
    if_not_exists: bool = False
    # Flink `PARTITIONED BY (...)` trailer (filesystem/hive layout);
    # the filesystem writer maps it to partitionBy
    partitioned_by: list[str] = field(default_factory=list)

    @property
    def connector(self) -> str:
        return self.options.get("connector", "")

    def schema_ddl(self) -> str:
        """Spark DDL string for the physical (non-computed) columns."""
        return ", ".join(
            f"{c.name} {c.spark_type}"
            for c in self.columns
            if c.spark_type is not None and c.computed_expr is None
        )


class DDLParseError(ValueError):
    pass


# Flink type → Spark DDL type (SURVEY §1.2 table)
_TYPE_MAP = {
    "BIGINT": "BIGINT",
    "INT": "INT",
    "INTEGER": "INT",
    "TINYINT": "TINYINT",
    "SMALLINT": "SMALLINT",
    "FLOAT": "FLOAT",
    "DOUBLE": "DOUBLE",
    "BOOLEAN": "BOOLEAN",
    "STRING": "STRING",
    "VARCHAR": "STRING",
    "CHAR": "STRING",
    "DATE": "DATE",
    "BYTES": "BINARY",
    "VARBINARY": "BINARY",
}

_HEAD_RE = re.compile(
    r"create\s+(?:temporary\s+)?table\s+(?P<ine>if\s+not\s+exists\s+)?"
    r"(?P<name>[\w.`\"]+)\s*\(",
    re.IGNORECASE | re.DOTALL,
)

_WITH_RE = re.compile(r"\s*(?:comment\s+'[^']*'\s*)?with\s*\(", re.IGNORECASE)


def _matching_paren(text: str, open_idx: int) -> int:
    """Index of the ')' closing text[open_idx] == '(' (quote-aware)."""
    depth, in_quote = 0, False
    for i in range(open_idx, len(text)):
        ch = text[i]
        if ch == "'":
            in_quote = not in_quote
        elif not in_quote:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    return i
    raise DDLParseError(f"unbalanced parentheses in: {text[:80]!r}")

_WATERMARK_RE = re.compile(
    r"watermark\s+for\s+(?P<col>\w+)\s+as\s+(?P<expr>.+)",
    re.IGNORECASE | re.DOTALL,
)

_PK_RE = re.compile(
    # optional named-constraint form: CONSTRAINT pk_name PRIMARY KEY
    # (...) NOT ENFORCED — valid Flink DDL that previously fell into
    # the column branch and raised a misleading "unsupported type"
    r"(?:constraint\s+`?\w+`?\s+)?"
    r"primary\s+key\s*\((?P<cols>[^)]*)\)\s*(not\s+enforced)?",
    re.IGNORECASE,
)

_INTERVAL_RE = re.compile(
    r"-\s*interval\s+'(?P<n>[\d.]+)'\s+(?P<unit>second|minute|hour|day)s?",
    re.IGNORECASE,
)


# type constructors whose '<' opens a generic-argument bracket; a bare
# '<' or '>' anywhere else (comparison operators inside computed-column
# expressions — `flag AS CASE WHEN a > 10 ...`) must NOT be counted as
# nesting, or the splitter silently merges the following column defs
_GENERIC_TYPES = {"array", "map", "row", "multiset"}

# SQL keywords that can never appear inside a generic type-argument
# list — seeing one between '<' and its candidate '>' proves the '<'
# was a comparison (`flag AS CASE WHEN map < 3 THEN ... x > 1 END`)
_NON_TYPE_KEYWORDS = {"and", "or", "then", "else", "when", "case", "end"}


def _angle_opens_type(text: str, i: int) -> bool:
    """True iff the '<' at ``text[i]`` starts a generic type-argument
    list. A column named after a type constructor (`map`, `row`, …)
    used in a computed-column comparison would otherwise open an
    unclosed angle depth and silently merge all following column defs
    (ADVICE r02). Three tests: the bracket must CLOSE with a balanced
    '>', everything between must be type-expression text (identifiers,
    digits, whitespace, commas, parens, nested angles — a string
    literal or operator fails), and no expression keyword (AND/THEN/…)
    may appear inside."""
    depth = 0
    for j in range(i, len(text)):
        ch = text[j]
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
            if depth == 0:
                body = text[i + 1 : j]
                return not any(
                    w.lower() in _NON_TYPE_KEYWORDS
                    for w in re.findall(r"[A-Za-z_]\w*", body)
                )
        elif not (ch.isalnum() or ch in "_ \t\r\n,()"):
            return False
    return False


def _split_top_level(text: str, sep: str = ",") -> list[str]:
    """Split on `sep` outside parens/quotes/generic-type brackets."""
    parts, buf = [], []
    depth = 0  # parens
    angle = 0  # generic-type brackets only
    in_quote = False
    for i, ch in enumerate(text):
        if ch == "'":
            in_quote = not in_quote
        elif not in_quote:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "<":
                word = re.search(r"(\w+)\s*$", text[:i])
                if angle > 0 or (
                    word
                    and word.group(1).lower() in _GENERIC_TYPES
                    and _angle_opens_type(text, i)
                ):
                    angle += 1
            elif ch == ">" and angle > 0:
                angle -= 1
            elif ch == sep and depth == 0 and angle == 0:
                parts.append("".join(buf).strip())
                buf = []
                continue
        buf.append(ch)
    tail = "".join(buf).strip()
    if tail:
        parts.append(tail)
    return parts


def _map_type(flink_type: str) -> str:
    t = flink_type.strip()
    upper = t.upper()
    # the parametrized scalar branches FULLMATCH: a prefix match would
    # silently swallow trailing attributes (`VARCHAR(20) PRIMARY KEY`
    # once lost its PK this way) instead of erroring
    if upper.startswith("DECIMAL") or upper.startswith("NUMERIC"):
        m = re.fullmatch(
            r"(?:DECIMAL|NUMERIC)\s*(\(\s*\d+\s*(?:,\s*\d+)?\s*\))?", upper
        )
        if not m:
            raise DDLParseError(f"unsupported type: {flink_type!r}")
        return f"DECIMAL{m.group(1) or '(10,0)'}".replace(" ", "")
    if upper.startswith("TIMESTAMP"):
        # TIMESTAMP(3) / TIMESTAMP_LTZ → Spark TIMESTAMP (µs ⊇ ms)
        if not re.fullmatch(
            r"TIMESTAMP(?:_LTZ)?\s*(\(\s*\d+\s*\))?"
            r"(\s+WITH(?:OUT)?\s+(?:LOCAL\s+)?TIME\s+ZONE)?",
            upper,
        ):
            raise DDLParseError(f"unsupported type: {flink_type!r}")
        return "TIMESTAMP"
    if upper.startswith(("VARCHAR", "CHAR")):
        if not re.fullmatch(r"(?:VARCHAR|CHAR)\s*(\(\s*\d+\s*\))?", upper):
            raise DDLParseError(f"unsupported type: {flink_type!r}")
        return "STRING"
    if upper.startswith("ARRAY"):
        inner = t[t.index("<") + 1 : t.rindex(">")]
        return f"ARRAY<{_map_type(inner)}>"
    if upper.startswith("MAP"):
        inner = t[t.index("<") + 1 : t.rindex(">")]
        k, v = _split_top_level(inner)
        return f"MAP<{_map_type(k)}, {_map_type(v)}>"
    if upper.startswith("ROW"):
        inner = t[t.index("<") + 1 : t.rindex(">")]
        fields = []
        for f in _split_top_level(inner):
            fname, ftype = f.split(None, 1)
            fields.append(f"{fname}: {_map_type(ftype)}")
        return f"STRUCT<{', '.join(fields)}>"
    if upper in _TYPE_MAP:
        return _TYPE_MAP[upper]
    raise DDLParseError(f"unsupported type: {flink_type!r}")


def _flink_interval_to_spark(expr: str) -> str | None:
    """``ts - INTERVAL '20' SECOND`` → ``20 seconds`` (watermark delay)."""
    m = _INTERVAL_RE.search(expr)
    if not m:
        return None
    unit = m.group("unit").lower()
    return f"{m.group('n')} {unit}s"


def looks_like_connector_ddl(statement: str) -> bool:
    """True if a CREATE TABLE is Flink-connector-shaped — it carries a
    ``WITH ('connector' = …)`` clause. The runner uses this to decide
    whether a DDLParseError is a real user error (connector DDL with a
    typo → surface OUR precise message) or a Spark catalog statement
    (``USING parquet``, TBLPROPERTIES, …) that should pass through to
    spark.sql verbatim (ADVICE r02: a passthrough of broken connector
    DDL produced a confusing Spark ParseException instead)."""
    return re.search(r"'connector'\s*=", statement) is not None


def parse_create_table(statement: str) -> TableDef:
    stmt = statement.strip().rstrip(";").strip()
    m = _HEAD_RE.match(stmt)
    if not m:
        raise DDLParseError(f"cannot parse CREATE TABLE: {statement[:80]!r}")
    body_open = m.end() - 1
    body_close = _matching_paren(stmt, body_open)
    body = stmt[body_open + 1 : body_close]
    opts_text = None
    partitioned_by: list[str] = []
    rest = stmt[body_close + 1 :]
    # optional Flink trailer: [COMMENT '...'] [PARTITIONED BY (...)]
    # [WITH (...)]
    pm = re.match(
        r"\s*partitioned\s+by\s*\(([^)]*)\)", rest, re.IGNORECASE
    )
    if pm:
        partitioned_by = [
            c.strip().strip("`\"") for c in pm.group(1).split(",")
        ]
        rest = rest[pm.end() :]
    wm_ = _WITH_RE.match(rest)
    if wm_:
        opts_open = wm_.end() - 1
        opts_close = _matching_paren(rest, opts_open)
        opts_text = rest[opts_open + 1 : opts_close]
    elif rest.strip():
        raise DDLParseError(f"unexpected trailer: {rest.strip()[:60]!r}")
    table = TableDef(
        name=m.group("name").strip("`\""),
        if_not_exists=bool(m.group("ine")),
        partitioned_by=partitioned_by,
    )
    for item in _split_top_level(body):
        if not item:
            continue
        wm = _WATERMARK_RE.match(item)
        if wm:
            expr = wm.group("expr").strip()
            table.watermark = WatermarkDef(
                column=wm.group("col"),
                expr=expr,
                delay=_flink_interval_to_spark(expr),
            )
            continue
        pk = _PK_RE.match(item)
        if pk:
            table.primary_key = [
                c.strip().strip("`\"") for c in pk.group("cols").split(",")
            ]
            continue
        # computed column:  name AS expr   (but not "name TYPE" where
        # the second token is a type keyword)
        cm = re.match(r"(`?\w+`?)\s+as\s+(.+)", item, re.IGNORECASE | re.DOTALL)
        if cm:
            table.columns.append(
                ColumnDef(
                    name=cm.group(1).strip("`"),
                    computed_expr=cm.group(2).strip(),
                )
            )
            continue
        parts = item.split(None, 1)
        if len(parts) != 2:
            raise DDLParseError(f"cannot parse column def: {item!r}")
        name, rest = parts
        # METADATA columns (kafka record metadata) have no backing
        # surface here — reject loudly rather than parse the type
        # prefix and leave a silently-NULL physical column
        if re.search(r"\bmetadata\b", rest, re.IGNORECASE):
            raise DDLParseError(
                f"column {name!r}: METADATA columns are not supported"
                " — declare the column physical or remove it"
            )
        # Flink grammar order: type [PRIMARY KEY [NOT ENFORCED]]
        # [NOT NULL] [COMMENT '...'] — strip the comment FIRST, then
        # the column-level PK (registering it), then nullability (the
        # reverse order rejected `INT NOT NULL COMMENT 'x'`)
        rest_clean = re.sub(
            r"\s+comment\s+'(?:[^']|'')*'\s*$", "", rest, flags=re.IGNORECASE
        )
        pk_m = re.search(
            r"\s+primary\s+key(\s+not\s+enforced)?\s*$",
            rest_clean,
            re.IGNORECASE,
        )
        if pk_m:
            rest_clean = rest_clean[: pk_m.start()]
            table.primary_key = [name.strip("`\"")]
        rest_clean = re.sub(
            r"\s+(not\s+null|null)\s*$", "", rest_clean, flags=re.IGNORECASE
        )
        table.columns.append(
            ColumnDef(
                name=name.strip("`\""),
                spark_type=_map_type(rest_clean),
                nullable="not null" not in rest.lower(),
            )
        )
    if opts_text:
        for kv in _split_top_level(opts_text):
            # values may contain ''-escaped quotes (passwords, JAAS
            # strings) — the old [^']* match silently truncated them
            km = re.fullmatch(
                r"'((?:[^']|'')*)'\s*=\s*'((?:[^']|'')*)'", kv.strip()
            )
            if not km:
                raise DDLParseError(f"cannot parse WITH option: {kv!r}")
            table.options[km.group(1).replace("''", "'")] = km.group(
                2
            ).replace("''", "'")
    return table
