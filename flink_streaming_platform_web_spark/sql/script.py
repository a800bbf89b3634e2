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
    # `\s` after catalog: a DATABASE named catalog_db must route to
    # USE, not to a catalog switch (the reference's own regexes have
    # this bug — SqlCommand.java:41-48; we fix rather than mirror it)
    USE_CATALOG = r"(use\s+catalog\s+.*)"
    USE = r"(use\s+(?!catalog\s).*)"
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
    quote state — in ONE pass over the whole script, so it carries
    across line boundaries (ADVICE r01: the per-line reset mis-split
    literals spanning lines). Inside a literal, ``;`` never splits,
    ``--`` is not a comment, and newlines are content.
    """
    statements: list[str] = []
    buf: list[str] = []
    in_quote = False
    i, n = 0, len(script)
    while i < n:
        ch = script[i]
        if ch == "'":
            # '' inside a literal is an escaped quote
            if in_quote and script[i + 1 : i + 2] == "'":
                buf.append("''")
                i += 2
                continue
            in_quote = not in_quote
            buf.append(ch)
        elif not in_quote and script.startswith("--", i):
            while i < n and script[i] != "\n":  # comment to end of line
                i += 1
            continue  # the newline is handled on the next iteration
        elif not in_quote and ch == ";":
            stmt = "".join(buf).strip()
            if stmt:
                statements.append(stmt)
            buf = []
        else:
            buf.append(ch)
        i += 1
    leftover = "".join(buf).strip()
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


def parse_set(statement: str) -> tuple[str, str] | None:
    """Extract (key, value) from a SET statement
    (Configurations.java:25-33 analog). Values may be quoted. A bare
    ``SET`` (legal in Flink's sql-client, where it lists properties)
    returns None — callers treat it as a no-op instead of aborting
    the script mid-run."""
    stripped = statement.strip().rstrip(";").strip()
    if stripped.lower() == "set":
        return None
    m = SET_RE.fullmatch(statement.strip())
    if not m:
        raise SqlParseError(f"malformed SET: {statement!r}")
    key, val = m.group(1).strip(), m.group(2).strip().rstrip(";").strip()
    # Flink sql-client writes SET 'key' = 'value'; both forms accepted
    if key.startswith("'") and key.endswith("'"):
        key = key[1:-1]
    if val.startswith("'") and val.endswith("'"):
        val = val[1:-1]
    return key, val


def find_balanced(text: str, open_idx: int) -> int:
    """Index of the ')' matching the '(' at ``open_idx`` (depth-
    counting over the raw text). Raises SqlParseError when
    unbalanced. One shared walker instead of a hand-rolled loop per
    caller (code-review r5)."""
    if open_idx < 0 or text[open_idx] != "(":
        raise SqlParseError("expected '(' to balance")
    depth = 0
    for k in range(open_idx, len(text)):
        if text[k] == "(":
            depth += 1
        elif text[k] == ")":
            depth -= 1
            if depth == 0:
                return k
    raise SqlParseError("unbalanced parentheses")
