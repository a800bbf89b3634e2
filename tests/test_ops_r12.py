"""Round-12 operators: dd16 ExactSubstr removal accounting, pp08
temperature-smoothed sampling, st25 streaming decontamination gate.
The driver's oracle gate proves sf0.01 parity; these tests pin the
pieces parity can't isolate — dd16's interval-union arithmetic on
constructed corpora and pp08's fixed-point weight math."""

from __future__ import annotations

import pandas as pd

from flink_streaming_platform_web_spark.operators.dedup import (
    DD14_W,
    dd16_exact_substr_removal,
)


def _docs_df(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(1, len(texts) + 1),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": ["s0"] * len(texts),
                "n_chars": [len(t) for t in texts],
            }
        )
    )


def _run_dd16(spark, tmp_path, texts):
    """Stage a tiny documents corpus and run dd16 against it."""
    from flink_streaming_platform_web_spark.operators import _cache

    d = tmp_path / "corpus"
    d.mkdir()
    _docs_df(spark, texts).write.parquet(str(d / "documents.parquet"))
    _cache.clear()
    try:
        rows = {
            r["doc_id"]: (
                r["n_tokens"],
                r["n_dup_windows"],
                r["n_removed_tokens"],
            )
            for r in dd16_exact_substr_removal(
                spark, str(d)
            ).collect()
        }
    finally:
        _cache.clear()
    return rows


def _toks(n, salt=""):
    return " ".join(f"t{salt}{i}" for i in range(n))


def test_dd16_interval_union_exact(spark, tmp_path):
    """Coverage arithmetic pinned on constructed overlap shapes: the
    span-union size must be sum(min(W, next-start)) + W per run —
    NEVER the naive count*W (overlapping windows) and never less than
    W per isolated window."""
    W = DD14_W
    shared = _toks(W)  # one W-gram planted in docs 3 AND 4
    # doc1/doc2: identical 12-token texts -> every window duplicated,
    # union covers ALL tokens; doc3/doc4: the shared W-gram embedded
    # once between DIFFERENT unique padding -> exactly one dup window
    # each, W tokens removed; doc5: fully unique, absent from output
    twelve = _toks(12, "a")
    doc3 = _toks(5, "b") + " " + shared + " " + _toks(5, "c")
    doc4 = _toks(3, "d") + " " + shared + " " + _toks(2, "e")
    doc5 = _toks(30, "z")
    rows = _run_dd16(
        spark, tmp_path, [twelve, twelve, doc3, doc4, doc5]
    )
    # 12 tokens, 3 windows all duplicated, union = 12 (not 3*W=30)
    assert rows[1] == (12, 3, 12)
    assert rows[2] == (12, 3, 12)
    assert rows[3] == (W + 10, 1, W)
    assert rows[4] == (W + 5, 1, W)
    assert 5 not in rows
    # removal can never exceed the doc's length
    assert all(rm <= n for n, _, rm in rows.values())


def test_dd16_adjacent_runs_merge(spark, tmp_path):
    """Two dup windows at distance d < W overlap (union = W + d);
    at distance d >= W they are disjoint (union = 2W)."""
    W = DD14_W
    a, b = _toks(W, "x"), _toks(W, "y")
    # close: both W-grams dup'd, starts W+2 apart in the carrier ->
    # disjoint (2W); overlapping case via a doc where the SAME
    # W+3-token span is duplicated -> 4 windows, union W+3
    span = _toks(W + 3, "s")
    carrier1 = span + " " + _toks(4, "p")
    carrier2 = _toks(4, "q") + " " + span
    rows = _run_dd16(spark, tmp_path, [carrier1, carrier2, a + " " + b])
    # span has (W+3)-W+1 = 4 windows, all duplicated; union = W+3
    assert rows[1] == (W + 3 + 4, 4, W + 3)
    assert rows[2] == (W + 3 + 4, 4, W + 3)
    assert 3 not in rows  # a+b text is unique -> no dup windows


def test_pp08_fixed_point_targets(spark):
    """target = budget * floor(sqrt(n)*1e6) // sum: integer math all
    the way down; selection count is deterministic and <= n."""
    from flink_streaming_platform_web_spark.operators.pipeline import (
        pp08_temperature_sample,
    )

    out = pp08_temperature_sample(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert rows
    import math

    n_total = sum(r["n_docs"] for r in rows)
    s = {r["source"]: math.floor(math.sqrt(r["n_docs"]) * 1e6)
         for r in rows}
    s_sum = sum(s.values())
    for r in rows:
        expect = n_total // 2 * s[r["source"]] // s_sum
        assert r["target_docs"] == expect
        assert 0 <= r["n_selected"] <= r["n_docs"]
        assert r["thr_ppm"] == expect * 1_000_000 // r["n_docs"]
    # determinism: a second run yields identical selections
    again = {
        (r["source"], r["n_selected"])
        for r in pp08_temperature_sample(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert again == {(r["source"], r["n_selected"]) for r in rows}


def test_st25_converges_to_batch_gate(spark):
    """The streaming gate's converged (source, contaminated) mix ==
    the batch rule over the same corpus (every train doc classified,
    zero-shingle docs clean)."""
    import duckdb

    from flink_streaming_platform_web_spark import inventory
    from flink_streaming_platform_web_spark.tables import TABLES

    sf = "/root/testdata/sf0.001"
    got = {
        tuple(r)
        for r in inventory.queries()[
            "st25_stream_contamination_gate"
        ](spark, sf).collect()
    }
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
        )
    want = {
        tuple(r)
        for r in con.execute(
            inventory.oracle_sql()["st25_stream_contamination_gate"]
        ).fetchall()
    }
    assert got == want
