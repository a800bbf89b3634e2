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


# ---- select-list splitter + TVF translation properties -------------------

_ident = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True)
_item = st.one_of(
    _ident,
    st.builds(lambda a, b: f"coalesce({a}, {b})", _ident, _ident),
    st.builds(lambda a: f"SUM({a}) AS s_{a}", _ident),
    st.builds(lambda s: f"'{s}'", st.from_regex(r"[a-z ,()]{0,12}", fullmatch=True)),
    st.builds(lambda a, b: f"CASE WHEN {a} > 0 THEN {b} ELSE 0 END", _ident, _ident),
)


@given(st.lists(_item, min_size=1, max_size=6))
@settings(max_examples=200, deadline=None)
def test_split_select_list_roundtrip(items):
    """Splitting SELECT <items> FROM t recovers exactly the items —
    commas inside parens/CASE/literals never split, literal 'FROM'
    never terminates the list."""
    from flink_streaming_platform_web_spark.streaming.runner import (
        _split_select_list,
    )

    sql = "SELECT " + ", ".join(items) + " FROM t GROUP BY 1"
    got = _split_select_list(sql)
    assert got == [i.strip() for i in items]


@given(
    st.sampled_from(["SECOND", "MINUTE", "HOUR"]),
    st.integers(min_value=1, max_value=90),
    _ident,
    _ident,
)
@settings(max_examples=100, deadline=None)
def test_tumble_tvf_translation_always_valid_shape(unit, n, src, col):
    """Any TUMBLE TVF translates to a derived subquery with the three
    Flink-appended columns and no remaining TABLE( text."""
    from flink_streaming_platform_web_spark.functions.flink_compat import (
        translate_expr,
    )

    sql = (
        f"SELECT window_start FROM TABLE(TUMBLE(TABLE {src}, "
        f"DESCRIPTOR({col}), INTERVAL '{n}' {unit}))"
    )
    out = translate_expr(sql)
    assert "TABLE(" not in out
    for c in ("window_start", "window_end", "window_time"):
        assert c in out
    assert f"window({col}, '{n} {unit.lower()}s')" in out
