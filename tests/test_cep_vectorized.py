"""Row-local DEFINE vectorization (operators/cep.py `_define_bitmaps`)
must be invisible: same accept/reject decisions as the scalar
evaluator on every row, and identical end-to-end MATCH_RECOGNIZE
output with the bitmaps force-disabled."""

import random

import pandas as pd
import pytest

from flink_streaming_platform_web_spark.operators import cep
from flink_streaming_platform_web_spark.operators.cep import (
    _define_bitmaps,
    _match_ctx,
    _vector_define,
    _xlate,
    parse_match_recognize,
)


def test_vectorizable_shapes():
    for sql, var in [
        ("UP.v > PREV(UP.v)", "UP"),
        ("DOWN.v < PREV(DOWN.v) AND DOWN.v > 10", "DOWN"),
        ("A.v >= 100 OR A.w < 0", "A"),
        ("B.v > PREV(B.v, 2)", "B"),
        ("C.v = 5", "C"),
        ("D.v <> 5 AND NOT D.v > 50", "D"),
        ("E.v + PREV(E.v) > 100", "E"),
        # PREV is a PHYSICAL offset (SQL/RPR): another var's column
        # under PREV is still row-local
        ("L.v > PREV(M.v)", "L"),
    ]:
        assert _vector_define(_xlate(sql), var) is not None, sql


def test_context_dependent_shapes_reject():
    for sql, var in [
        ("G.v > FIRST(G.v)", "G"),
        ("H.v > LAST(A.v)", "H"),
        ("COUNT(I.*) < 3", "I"),
        ("J.v > AVG(J.v)", "J"),
        ("CLASSIFIER() = 'X'", "K"),
        ("N.v > A.v", "N"),  # bare other-var ref = LAST(A.v)
    ]:
        assert _vector_define(_xlate(sql), var) is None, sql


def _scalar(rows, src, var, idx):
    code = compile(src, "<define>", "eval")
    try:
        return bool(
            eval(code, {"__builtins__": {}},
                 _match_ctx(rows, 0, [], idx, var))
        )
    except TypeError:
        return False


def test_bitmap_equals_scalar_randomized():
    """Point-for-point differential incl. NaN/NaT/head-shift edges."""
    rng = random.Random(7)
    cases = [
        ("UP.v > PREV(UP.v)", "UP"),
        ("DOWN.v < PREV(DOWN.v) AND DOWN.v > 10", "DOWN"),
        ("A.v >= 100 OR A.w < 0", "A"),
        ("B.v > PREV(B.v, 2)", "B"),
        ("D.v <> 5 AND NOT D.v > 50", "D"),
        ("F.v > PREV(F.v) AND F.ts > PREV(F.ts)", "F"),
    ]
    checked = 0
    for sql, var in cases:
        src = _xlate(sql)
        spec = parse_match_recognize(
            f"PARTITION BY k ORDER BY ts MEASURES LAST({var}.v) AS lv"
            f" ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW"
            f" PATTERN ({var}+) DEFINE {var} AS {sql}"
        )
        for _ in range(40):
            n = rng.randint(1, 30)
            rows = [
                {
                    "v": float("nan") if rng.random() < 0.15
                    else rng.uniform(-50, 150),
                    "w": rng.uniform(-10, 10),
                    "ts": pd.Timestamp("2024-01-01")
                    + pd.Timedelta(seconds=i),
                }
                for i in range(n)
            ]
            bms = _define_bitmaps(rows, spec, pd.DataFrame(rows))
            assert var in bms, f"did not vectorize: {sql}"
            for idx in range(n):
                assert bool(bms[var][idx]) == _scalar(
                    rows, src, var, idx
                ), f"{sql} idx={idx}"
                checked += 1
    assert checked > 1000


def test_object_dtype_falls_back():
    spec = parse_match_recognize(
        "PARTITION BY k ORDER BY ts MEASURES LAST(A.s) AS ls"
        " ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW"
        " PATTERN (A+) DEFINE A AS A.s > PREV(A.s)"
    )
    rows = [{"s": c, "ts": i} for i, c in enumerate("abcab")]
    assert _define_bitmaps(rows, spec, pd.DataFrame(rows)) == {}


def test_streaming_small_buffer_skips_build():
    spec = parse_match_recognize(
        "PARTITION BY k ORDER BY ts MEASURES LAST(A.v) AS lv"
        " ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW"
        " PATTERN (A+) DEFINE A AS A.v > 0"
    )
    rows = [{"v": 1.0, "ts": i} for i in range(10)]
    assert _define_bitmaps(rows, spec) == {}  # < 64, no frame given
    big = [{"v": 1.0, "ts": i} for i in range(64)]
    assert "A" in _define_bitmaps(big, spec)


def test_full_matcher_identical_with_bitmaps_disabled(monkeypatch):
    """The whole matcher (greedy walk, backtracking, skip modes) over
    a mixed row-local + context-dependent DEFINE set: the vectorized
    run and a run with `_define_bitmaps` force-disabled must produce
    the identical match set. Run in-process so the disable actually
    reaches the matcher (worker re-imports would undo a monkeypatch);
    the Spark route is exercised by the q45-q53 oracle gates, which
    now run through the bitmap path."""
    rng = random.Random(11)
    clause = (
        "PARTITION BY k ORDER BY ts"
        " MEASURES FIRST(DOWN.ts) AS start_ts, LAST(UP.ts) AS end_ts,"
        " COUNT(DOWN.*) AS n_down"
        " ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW"
        " PATTERN (DOWN{2,} UP+ FLAT?)"
        " DEFINE DOWN AS DOWN.v < PREV(DOWN.v),"
        " UP AS UP.v > PREV(UP.v),"
        " FLAT AS FLAT.v > FIRST(DOWN.v)"  # context-dependent mix
    )
    spec = parse_match_recognize(clause)
    for trial in range(8):
        n = rng.randint(80, 400)
        rows = [
            {
                "k": 1,
                "ts": i,
                "v": float("nan") if rng.random() < 0.05
                else round(rng.uniform(0, 100), 2),
            }
            for i in range(n)
        ]
        frame = pd.DataFrame(rows)
        assert "DOWN" in _define_bitmaps(rows, spec, frame)
        fast = cep._match_partition(rows, spec, frame)
        with pytest.MonkeyPatch.context() as mp:
            mp.setattr(cep, "_define_bitmaps", lambda *a, **kw: {})
            slow = cep._match_partition(rows, spec, frame)
        assert fast == slow, f"trial {trial}"
    # and the pattern fires on at least some trials
    assert any(
        cep._match_partition(
            [
                {"k": 1, "ts": i, "v": v}
                for i, v in enumerate([5, 4, 3, 8, 9, 2, 1, 7])
            ],
            spec,
        )
    )
