"""Property-based tests for the SQL script splitter (hypothesis).

The reference's splitter breaks on quoted semicolons and comment-
lookalikes inside literals (SqlFileParser.java:37-42); ours must not.
These properties pin that behavior for arbitrary generated content.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from flink_streaming_platform_web_spark.sql.script import split_statements

# statement bodies: no semicolons/quotes/newlines/comment-starts of
# their own, non-empty after strip
_body = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd", "Zs"),
        whitelist_characters="_.,()=<>",
    ),
    min_size=1,
    max_size=40,
).filter(lambda s: s.strip() and "--" not in s)

# literal payloads that try to break the splitter
_literal = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd", "Zs"),
        whitelist_characters=";-",
    ),
    max_size=20,
).filter(lambda s: "'" not in s)


@given(st.lists(_body, min_size=1, max_size=8))
@settings(max_examples=200, deadline=None)
def test_split_roundtrips_statement_count(bodies):
    script = ";\n".join(f"SELECT {b.strip()}" for b in bodies) + ";"
    stmts = split_statements(script)
    assert len(stmts) == len(bodies)
    for stmt, body in zip(stmts, bodies):
        assert stmt.startswith("SELECT")
        assert body.strip() in stmt


@given(_literal, _literal)
@settings(max_examples=200, deadline=None)
def test_quoted_semicolons_and_comments_never_split(a, b):
    script = f"SELECT '{a}' AS x; SELECT '{b}' AS y;"
    stmts = split_statements(script)
    assert len(stmts) == 2
    assert f"'{a}'" in stmts[0]
    assert f"'{b}'" in stmts[1]


@given(st.lists(_body, min_size=1, max_size=5), st.data())
@settings(max_examples=100, deadline=None)
def test_comment_lines_are_invisible(bodies, data):
    lines = []
    for b in bodies:
        lines.append(f"-- comment {data.draw(st.integers(0, 99))}")
        lines.append(f"SELECT {b.strip()};")
    stmts = split_statements("\n".join(lines))
    assert len(stmts) == len(bodies)
    assert all("--" not in s for s in stmts)


@given(_body)
@settings(max_examples=100, deadline=None)
def test_multiline_statement_reassembles(body):
    script = f"SELECT\n  {body.strip()}\nFROM t;"
    stmts = split_statements(script)
    assert len(stmts) == 1
    assert stmts[0].endswith("FROM t")
