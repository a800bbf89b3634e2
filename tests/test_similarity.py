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


def test_dd07_ivf_recall_vs_exact(spark, sf_dir):
    """Pin dd07's measured IVF recall: candidate discovery at
    nprobe=4 must recover >=95% of the pairs the exact quadratic
    kernel (ann02) finds at sf0.01. A centroid-seeding or probe-
    ranking change that silently degrades discovery fails here, not
    in production (r2 verdict watch item: the 98% figure was
    documented but unpinned)."""
    from flink_streaming_platform_web_spark.operators.dedup import (
        dd07_embed_neardup_docs,
    )
    from flink_streaming_platform_web_spark.operators.similarity import (
        ann02_embed_neardup_pairs,
    )

    exact = {
        (r["id_a"], r["id_b"])
        for r in ann02_embed_neardup_pairs(spark, sf_dir).collect()
    }
    ivf = {
        (r["id_a"], r["id_b"])
        for r in dd07_embed_neardup_docs(spark, sf_dir).collect()
    }
    assert exact, "exact kernel found no pairs — fixture drifted"
    recall = len(ivf & exact) / len(exact)
    assert recall >= 0.95, f"IVF recall degraded: {recall:.3f}"
    # IVF candidates are verified with the same cosine+threshold, so
    # anything it reports must be a true pair (no false positives)
    assert ivf <= exact


def test_dd11_scaled_kmeans_recall_vs_exact(spark, sf_dir):
    """dd11 (k-means-quantized IVF, cell count scaling with the
    corpus) at small SF floors at k=KM_K cells and must recover
    >=90% of the exact kernel's pairs; like dd07, anything it
    reports is verified with the same cosine+threshold, so it can
    emit no false positives. The recall/cost frontier at scale is
    recorded in SCALE.md (the isotropic synthetic corpus is the
    WORST case for a geometric quantizer at weak τ)."""
    from flink_streaming_platform_web_spark.operators.dedup import (
        dd11_embed_neardup_kmeans,
    )
    from flink_streaming_platform_web_spark.operators.similarity import (
        ann02_embed_neardup_pairs,
    )

    exact = {
        (r["id_a"], r["id_b"])
        for r in ann02_embed_neardup_pairs(spark, sf_dir).collect()
    }
    ivf = {
        (r["id_a"], r["id_b"])
        for r in dd11_embed_neardup_kmeans(spark, sf_dir).collect()
    }
    assert exact, "exact kernel found no pairs — fixture drifted"
    recall = len(ivf & exact) / len(exact)
    assert recall >= 0.90, f"scaled-IVF recall degraded: {recall:.3f}"
    assert ivf <= exact


def test_jvm_cosine_bitwise_equals_pandas_kernel(spark):
    """The round-9 pure-Catalyst _cosine must be bit-for-bit the
    pandas kernel (same per-dimension accumulation order, same
    division/sqrt composition) — randomized 64-dim pairs, compared as
    raw IEEE bit patterns."""
    import struct

    import numpy as np

    from pyspark.sql import functions as F

    from flink_streaming_platform_web_spark.operators import (
        similarity as S,
    )

    rng = np.random.default_rng(7)
    rows = [
        (
            i,
            rng.uniform(-1, 1, 64).tolist(),
            rng.uniform(-1, 1, 64).tolist(),
        )
        for i in range(300)
    ]
    df = spark.createDataFrame(
        rows, "id long, a array<double>, b array<double>"
    )
    jvm = {
        r["id"]: r["c"]
        for r in df.select(
            "id", S._cosine(F.col("a"), F.col("b")).alias("c")
        ).collect()
    }
    ker = {
        r["id"]: r["c"]
        for r in df.select(
            "id", S._cos_kernel(F.col("a"), F.col("b")).alias("c")
        ).collect()
    }
    bad = [
        i
        for i in jvm
        if struct.pack("<d", jvm[i]) != struct.pack("<d", ker[i])
    ]
    assert bad == [], bad[:5]


def test_band_sig_kernel_bitwise_equals_catalyst_folds(spark):
    """ann03's Arrow signature kernel (`_band_sigs_long`) must produce
    EXACTLY the signatures of the reference Catalyst formulation
    (`_band_sig_cols`) — the projection fold runs in the same IEEE
    dimension order, so even near-zero projections land on the same
    side of the bucket-bit threshold. Random vectors, all bands."""
    import numpy as np

    from flink_streaming_platform_web_spark.operators import (
        similarity as S,
    )

    rng = np.random.default_rng(11)
    rows = [
        (i, rng.uniform(-1, 1, S.DIM).tolist()) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    bits = 8
    ref = df.select("vec_id", *S._band_sig_cols(bits)).selectExpr(
        "vec_id",
        "stack("
        + str(S.LSH_BANDS)
        + ", "
        + ", ".join(f"{b}, sig{b}" for b in range(S.LSH_BANDS))
        + ") AS (band, sig)",
    )
    new = S._band_sigs_long(df, bits).select("vec_id", "band", "sig")
    assert new.exceptAll(ref).count() == 0
    assert ref.exceptAll(new).count() == 0
