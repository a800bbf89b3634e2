"""Semantic invariants for the round-2 training-data operators
(tx09/tx10, dd09, vec01/vec02, st07 are oracle-gated for exact values;
these tests pin the properties that must hold at ANY scale factor)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_streaming_platform_web_spark.operators.dedup import (
    dd09_chunk_dedup,
)
from flink_streaming_platform_web_spark.operators.text import (
    TX10_MIN_TOKENS,
    tx09_redact_denylist,
    tx10_quality_filter,
)
from flink_streaming_platform_web_spark.operators.vectors import (
    vec01_kmeans,
    vec02_quantize_int8,
)
from flink_streaming_platform_web_spark.tables import load


def test_tx09_redaction_accounting(spark, sf_dir):
    """len_delta must equal n_redacted × (len('[REDACTED]') - len(hit));
    all denylist words are 5-8 chars so delta is positive iff hits."""
    out = tx09_redact_denylist(spark, sf_dir)
    bad = out.filter(
        (F.col("n_redacted") == 0) & (F.col("len_delta") != 0)
    ).count()
    assert bad == 0
    assert out.filter(F.col("n_redacted") > 0).count() > 0


def test_tx10_short_docs_always_dropped(spark, sf_dir):
    out = tx10_quality_filter(spark, sf_dir)
    short = out.filter(F.col("n_tokens") < TX10_MIN_TOKENS)
    assert short.filter(F.col("keep")).count() == 0
    assert (
        short.filter(~F.col("reasons").contains("too_short")).count() == 0
    )
    # at least some docs survive the composite gate on this corpus
    assert out.filter(F.col("keep")).count() > 0


def test_dd09_keeps_each_chunk_exactly_once(spark, sf_dir):
    """Global invariant: the kept-chunk total equals the number of
    DISTINCT (chunk-content) values in the corpus, and no document
    gains chunks."""
    out = dd09_chunk_dedup(spark, sf_dir)
    assert out.filter(F.col("n_kept") > F.col("n_chunks")).count() == 0
    total_kept = out.agg(F.sum("n_kept")).collect()[0][0]
    docs = load(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id",
        F.filter(
            F.split("text", r"\s+"), lambda t: F.length(t) > 0
        ).alias("toks"),
    ).filter(F.size("toks") > 0)
    distinct_chunks = (
        toked.select(
            F.explode(
                F.expr(
                    "transform(sequence(0, CAST(ceil(size(toks) / 10.0)"
                    " AS INT) - 1),"
                    " i -> array_join(slice(toks, i * 10 + 1, 10), ' '))"
                )
            ).alias("chunk")
        )
        .distinct()
        .count()
    )
    assert total_kept == distinct_chunks


def test_vec01_clusters_partition_corpus(spark, sf_dir):
    out = vec01_kmeans(spark, sf_dir).collect()
    n_vecs = load(spark, sf_dir, "embeddings").count()
    assert sum(r["n_members"] for r in out) == n_vecs
    assert 1 <= len(out) <= 8


def test_vec02_error_bounded_by_half_step(spark, sf_dir):
    """Affine int8: nearest-code rounding ⇒ |x - recon| ≤ scale/2."""
    out = vec02_quantize_int8(spark, sf_dir)
    viol = out.filter(
        F.col("max_err")
        > (F.col("qmax") - F.col("qmin")) / 255.0 / 2.0 + 1e-9
    ).count()
    assert viol == 0
    assert out.count() == load(spark, sf_dir, "embeddings").count()


def test_mm03_frames_chunk_bytes_not_chars(spark):
    """The multi-byte contract the SQL oracle can't express (DuckDB
    has no blob substring/md5): frames chunk the UTF-8 BYTE payload —
    a codepoint may split across frames — verified against hashlib
    over raw bytes."""
    import hashlib

    from flink_streaming_platform_web_spark.operators.multimodal import (
        FRAME_STRIDE,
        sample_frames,
        with_binary_payload,
    )

    text = "café €uro " * 20  # multi-byte chars crossing stride bounds
    raw = text.encode()
    assert len(raw) > len(text)  # really multi-byte
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {
        r["frame_idx"]: (r["frame_bytes"], r["frame_digest"])
        for r in sample_frames(with_binary_payload(df)).collect()
    }
    want = {
        i // FRAME_STRIDE: (
            len(raw[i : i + FRAME_STRIDE]),
            hashlib.md5(raw[i : i + FRAME_STRIDE]).hexdigest(),
        )
        for i in range(0, len(raw), FRAME_STRIDE)
    }
    assert got == want


def test_short_and_empty_docs_survive_text_dedup_ops(spark):
    """Docs with <3 tokens (no shingles) and zero tokens (no quality
    denominator) must flow through the pipeline ops without faulting
    under ANSI — short corpora are normal at ingest."""
    from flink_streaming_platform_web_spark.operators.dedup import (
        _shingles,
    )

    df = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "  "), (4, "three word doc")],
        "doc_id long, text string",
    )
    sh = _shingles(df)
    assert {r["doc_id"] for r in sh.collect()} == {4}


def test_salted_join_spreads_duplicate_hot_rows(spark):
    """1000 IDENTICAL rows of one hot key must spread across salts —
    a content-derived salt would put them all in one task, defeating
    the whole point."""
    from pyspark.sql import functions as F

    from flink_streaming_platform_web_spark.operators.skew import (
        salted_join,
    )

    big = spark.createDataFrame(
        [(7, 1.0)] * 1000, "k long, v double"
    )
    small = spark.createDataFrame([(7, "x")], "k long, name string")
    joined = salted_join(big, small, "k", n_salts=8)
    assert joined.count() == 1000  # semantics unchanged
    salts = (
        big.select(
            F.floor(F.rand(42) * 8).cast("int").alias("s")
        )
        .distinct()
        .count()
    )
    assert salts >= 4  # duplicates really spread over multiple salts
    import pytest as _pytest

    with _pytest.raises(ValueError, match="inner/left"):
        salted_join(big, small, "k", how="full")
