"""ANN property tests: recall ordering of the probe ladder against
the exact brute-force baseline (correctness of each entry's VALUES is
covered by the DuckDB parity gate; these check the retrieval-quality
contract the knobs exist for)."""

from __future__ import annotations

from flink_streaming_platform_web_spark.operators.similarity import (
    IVF_TOP_K,
    ann01_brute_topk,
    ann04_ivf_search,
    ann05_ivf_multiprobe,
)


def _topk(df, k):
    out = {}
    for r in df.collect():
        if r["rk"] <= k:
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def _recall(approx: dict, exact: dict) -> float:
    hits = sum(
        len(approx.get(q, set()) & nbrs) for q, nbrs in exact.items()
    )
    total = sum(len(nbrs) for nbrs in exact.values())
    return hits / total


def test_multiprobe_recall_dominates_single_probe(spark, sf_dir):
    exact = _topk(ann01_brute_topk(spark, sf_dir), IVF_TOP_K)
    r1 = _recall(_topk(ann04_ivf_search(spark, sf_dir), IVF_TOP_K), exact)
    r2 = _recall(
        _topk(ann05_ivf_multiprobe(spark, sf_dir), IVF_TOP_K), exact
    )
    # probing 2 cells can only add candidates → recall is monotone
    assert r2 >= r1
    # sanity floor: random-ish sf0.001 embeddings quantize poorly
    # against per-label centroids, but the probe must find something
    assert r2 > 0.2
