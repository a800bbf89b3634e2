"""SQL script splitting + statement classification.

Rebuilds the reference's parsing layer:

- splitter: ``SqlFileParser.fileToSql``
  (flink-streaming-commom/src/main/java/com/flink/streaming/common/sql/SqlFileParser.java:25-55)
  — strip ``--`` comment lines (:37-39), accumulate until trailing
  ``;`` (:42), error on leftovers (:47). Ours is quote-aware: the
  reference splits inside quoted ``';'`` literals; we don't.
- classifier: the 22-regex enum ``SqlCommand``
  (flink-streaming-commom/src/main/java/com/flink/streaming/common/enums/SqlCommand.java:17-118),
  case-insensitive DOTALL (SystemConstant.java:23). Same first-match
  routing, same command taxonomy.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from enum import Enum


class SqlCommand(Enum):
    """Statement taxonomy — mirrors SqlCommand.java ordering (first
    match wins, so INSERT before CREATE before SELECT etc.)."""

    INSERT_INTO = r"(insert\s+into.*)"
    INSERT_OVERWRITE = r"(insert\s+overwrite.*)"
    CREATE_TABLE = r"(create\s+(temporary\s+)?table.*)"
    CREATE_FUNCTION = r"(create\s+(temporary\s+)?(system\s+)?function.*)"
    CREATE_VIEW = r"(create\s+(temporary\s+)?view.*)"
    CREATE_DATABASE = r"(create\s+database.*)"
    CREATE_CATALOG = r"(create\s+catalog.*)"
    USE_CATALOG = r"(use\s+catalog.*)"
    USE = r"(use\s+(?!catalog).*)"
    DROP_TABLE = r"(drop\s+table.*)"
    DROP_DATABASE = r"(drop\s+database.*)"
    DROP_VIEW = r"(drop\s+view.*)"
    DROP_FUNCTION = r"(drop\s+function.*)"
    ALTER_TABLE = r"(alter\s+table.*)"
    ALTER_DATABASE = r"(alter\s+database.*)"
    ALTER_FUNCTION = r"(alter\s+function.*)"
    SHOW_CATALOGS = r"(show\s+catalogs)"
    SHOW_DATABASES = r"(show\s+databases)"
    SHOW_TABLES = r"(show\s+tables)"
    SHOW_FUNCTIONS = r"(show\s+functions)"
    SHOW_MODULES = r"(show\s+modules)"
    SET = r"set(\s+(\S+)\s*=\s*(.*))?"
    BEGIN_STATEMENT_SET = r"(begin\s+statement\s+set)"
    END_STATEMENT_SET = r"(end)"
    SELECT = r"((with.*)?select.*)"

    def __init__(self, pattern: str) -> None:
        self.regex = re.compile(
            pattern, re.IGNORECASE | re.DOTALL
        )


@dataclass(frozen=True)
class SqlCommandCall:
    """cmd + raw statement — the reference's only IR
    (SqlCommandCall.java:14-20)."""

    command: SqlCommand
    statement: str


class SqlParseError(ValueError):
    pass


def split_statements(script: str) -> list[str]:
    """Split a SQL script into ``;``-terminated statements.

    Comment handling matches SqlFileParser.java:37-39 (whole-line and
    trailing ``--`` comments dropped); unlike the reference we track
    quote state, so ``';'`` inside string literals doesn't split, and
    ``--`` inside a literal isn't a comment.
    """
    statements: list[str] = []
    buf: list[str] = []
    for raw_line in script.splitlines():
        line, in_quote, i = [], False, 0
        while i < len(raw_line):
            ch = raw_line[i]
            if ch == "'":
                # '' inside a literal is an escaped quote
                if in_quote and raw_line[i + 1 : i + 2] == "'":
                    line.append("''")
                    i += 2
                    continue
                in_quote = not in_quote
                line.append(ch)
            elif not in_quote and raw_line.startswith("--", i):
                break  # rest of line is a comment
            else:
                line.append(ch)
            i += 1
        text = "".join(line)
        if not text.strip():
            continue
        # split on unquoted semicolons (possibly several per line)
        part, in_quote = [], False
        for ch in text:
            if ch == "'":
                in_quote = not in_quote
            if ch == ";" and not in_quote:
                buf.append("".join(part))
                stmt = "\n".join(s for s in buf if s.strip()).strip()
                if stmt:
                    statements.append(stmt)
                buf, part = [], []
            else:
                part.append(ch)
        if "".join(part).strip():
            buf.append("".join(part))
    leftover = "\n".join(buf).strip()
    if leftover:
        # reference errors on non-';'-terminated trailers
        # (SqlFileParser.java:47); we accept a final unterminated
        # statement for ergonomics
        statements.append(leftover)
    return statements


def classify(statement: str) -> SqlCommandCall:
    """First-matching-regex classification (SqlCommand.java routing)."""
    stripped = statement.strip()
    for cmd in SqlCommand:
        if cmd.regex.fullmatch(stripped):
            return SqlCommandCall(cmd, stripped)
    raise SqlParseError(f"unsupported statement: {stripped[:80]!r}")


def parse_script(script: str) -> list[SqlCommandCall]:
    """Split + classify — ``SqlFileParser.fileToSql`` equivalent."""
    return [classify(s) for s in split_statements(script)]


_VAR_RE = re.compile(r"\$\{(\w+)\}")


def substitute_variables(
    script: str,
    mapping: dict[str, str] | None = None,
    use_env: bool = True,
) -> str:
    """``${var}`` placeholder substitution — the reference resolves
    these from Nacos config before submission
    (JobBaseServiceAOImpl.java:430-461). Resolution order: explicit
    mapping, then process environment (our config source); unresolved
    placeholders raise, matching the reference's fail-fast behavior.
    """
    import os

    def repl(m: re.Match[str]) -> str:
        name = m.group(1)
        if mapping and name in mapping:
            return mapping[name]
        if use_env and name in os.environ:
            return os.environ[name]
        raise SqlParseError(f"unresolved script variable: ${{{name}}}")

    return _VAR_RE.sub(repl, script)


SET_RE = re.compile(r"set\s+(\S+?)\s*=\s*(.+)", re.IGNORECASE | re.DOTALL)


def parse_set(statement: str) -> tuple[str, str]:
    """Extract (key, value) from a SET statement
    (Configurations.java:25-33 analog). Values may be quoted."""
    m = SET_RE.fullmatch(statement.strip())
    if not m:
        raise SqlParseError(f"malformed SET: {statement!r}")
    key, val = m.group(1).strip(), m.group(2).strip().rstrip(";").strip()
    if val.startswith("'") and val.endswith("'"):
        val = val[1:-1]
    return key, val
