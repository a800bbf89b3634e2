"""Semantic invariants for the round-3 training-data operators
(dc01 decontamination, pp02 shard packing). Exact values are
oracle-gated via tools/parity.py / the driver; these pin the
properties that must hold at ANY scale factor."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_streaming_platform_web_spark.operators.decontam import (
    dc01_contamination,
)
from flink_streaming_platform_web_spark.operators.dedup import (
    _shingles_cached,
)
from flink_streaming_platform_web_spark.operators.pipeline import (
    PACK_BUDGET,
    pp02_shard_packing,
)
from flink_streaming_platform_web_spark.tables import load


def test_dc01_no_eval_docs_and_bounded_overlap(spark, sf_dir):
    out = dc01_contamination(spark, sf_dir)
    # eval-slice docs never appear as train hits
    assert out.filter(F.col("doc_id") % 20 == 7).count() == 0
    # the collision count is a subset count: 0 < n_shared <= n_sh
    bad = out.filter(
        (F.col("n_shared") <= 0) | (F.col("n_shared") > F.col("n_sh"))
    ).count()
    assert bad == 0
    # flag is derived from the two integers, never contradicts them
    assert (
        out.filter(
            F.col("contaminated")
            != (F.col("n_shared") * 2 >= F.col("n_sh"))
        ).count()
        == 0
    )


def test_dc01_exact_duplicate_of_eval_doc_is_flagged(spark, sf_dir):
    """A train doc sharing its full shingle set with an eval doc (the
    planted near-dup case when the pair straddles the split) must be
    contaminated; verify via the shingle product directly."""
    sh = _shingles_cached(spark, sf_dir)
    eval_sh = sh.filter(F.col("doc_id") % 20 == 7).select("shingle").distinct()
    full = (
        sh.filter(F.col("doc_id") % 20 != 7)
        .join(eval_sh, "shingle")
        .groupBy("doc_id", "n_sh")
        .agg(F.count("*").alias("hits"))
        .filter(F.col("hits") == F.col("n_sh"))
    )
    full_ids = {r.doc_id for r in full.collect()}
    if full_ids:
        flagged = {
            r.doc_id
            for r in dc01_contamination(spark, sf_dir)
            .filter(F.col("contaminated"))
            .collect()
        }
        assert full_ids <= flagged


def test_pp02_partition_of_corpus_and_budget_shape(spark, sf_dir):
    out = pp02_shard_packing(spark, sf_dir).collect()
    docs = load(spark, sf_dir, "documents")
    # every document lands in exactly one shard
    assert sum(r.n_docs for r in out) == docs.count()
    per_source = {}
    for r in out:
        per_source.setdefault(r.source, []).append(r)
    for source, shards in per_source.items():
        shards.sort(key=lambda r: r.shard_id)
        # shard ids are dense from 0
        assert [r.shard_id for r in shards] == list(range(len(shards)))
        # doc ranges of consecutive shards never interleave (the
        # concat-and-chunk layout is order-preserving)
        for a, b in zip(shards, shards[1:]):
            assert a.last_doc < b.first_doc
        # every non-final shard starts within budget of its boundary:
        # the doc that OPENS shard k has tokens_before < (k+1)*budget,
        # so a shard's token sum is < budget + max_doc_tokens; with the
        # synthetic docs (< budget tokens each) that is < 2*budget
        for r in shards[:-1]:
            assert r.shard_tokens < 2 * PACK_BUDGET, (source, r)


def test_pp03_composition_accounting(spark, sf_dir):
    """pp03's shard totals must equal the independently-computed
    survivor count: eval split dropped, contaminated docs dropped,
    one doc per content digest."""
    from flink_streaming_platform_web_spark.operators.decontam import (
        dc01_contamination,
    )
    from flink_streaming_platform_web_spark.operators.pipeline import (
        PACK_BUDGET,
        pp03_prep_pipeline,
    )

    out = pp03_prep_pipeline(spark, sf_dir).collect()
    bad = dc01_contamination(spark, sf_dir).filter(
        F.col("contaminated")
    )
    docs = load(spark, sf_dir, "documents")
    expected = (
        docs.filter(F.col("doc_id") % 20 != 7)
        .join(bad.select("doc_id"), "doc_id", "left_anti")
        .select(F.md5("text"))
        .distinct()
        .count()
    )
    assert sum(r.n_docs for r in out) == expected > 0
    # non-final shards stay within a doc of the budget
    per_source = {}
    for r in out:
        per_source.setdefault(r.source, []).append(r)
    for shards in per_source.values():
        shards.sort(key=lambda r: r.shard_id)
        for r in shards[:-1]:
            assert r.shard_tokens < 2 * PACK_BUDGET


def test_vec04_gram_matches_numpy(spark, sf_dir):
    """The distributed fixed-point gram equals the single-machine
    numpy computation bit-for-bit (per-row floor(x_i*x_j*1e9) summed
    as int64), and covers exactly the upper triangle with the corpus
    count on every pair."""
    import numpy as np

    from flink_streaming_platform_web_spark.operators.vectors import (
        vec04_gram_matrix,
    )

    rows = vec04_gram_matrix(spark, sf_dir).collect()
    emb = load(spark, sf_dir, "embeddings").select("embedding").collect()
    X = np.array([r.embedding for r in emb], dtype=np.float64)
    n, d = X.shape
    assert len(rows) == d * (d + 1) // 2
    G = np.zeros((d, d), dtype=np.int64)
    for row in X:
        G += np.floor(np.outer(row, row) * 1e9).astype(np.int64)
    for r in rows:
        assert 1 <= r.d1 <= r.d2 <= d
        assert r.n == n
        assert r.gram == G[r.d1 - 1, r.d2 - 1] / 1e9, (r.d1, r.d2)
