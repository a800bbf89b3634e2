"""Embedding-vector operators beyond search: k-means training and
int8 quantization — the two vector-side stages a training-data
pipeline runs besides ANN (cluster-balance analysis / semantic dedup
prep, and storage compression for the vector store).

vec01 is the repo's iterative-algorithm showcase: Lloyd's k-means.
Round 10: TRAINING runs over one deterministic KM_SAMPLE-bounded
sample collected in a single TakeOrdered job, with init + every
Lloyd's round folded driver-side in numpy (the round-8/9 shapes paid
one scheduler-floor job per round — fused mapInPandas partials — and
that floor WAS the dd11 bench gap; see km_centroids). Iteration count
is fixed (ITERS=2) and init is deterministic (the K lowest vec_ids),
so a DuckDB oracle can replay the exact run as unrolled CTEs — the
convergence loop itself is the only thing the SQL oracle flattens.

At 100 TB: the corpus never moves — centroid training reads a
bounded sample (the canonical billion-scale design; MLlib samples for
init the same way), and the full corpus is only touched by the
scan-side broadcast-centroid ASSIGNMENT pass.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_platform_web_spark.operators._portable import (
    oracle_fp_mean,
)
from flink_streaming_platform_web_spark.operators.similarity import (
    _ORACLE_COS,
    _vecs,
    cell_assign,
)

KM_K = 8
KM_ITERS = 2


#: trainer sample cap: the KM_SAMPLE lowest vec_ids. Every
#: oracle-gated SF (≤ 0.1) has n ≤ KM_SAMPLE, so the sample IS the
#: corpus there and the unrolled DuckDB CTEs replay the exact run;
#: beyond it the trainer sees a deterministic bounded subset — the
#: canonical 100 TB posture (centroid TRAINING on a bounded sample,
#: scan-side ASSIGNMENT over the full corpus; MLlib's k-means samples
#: for init the same way).
KM_SAMPLE = 16384


def km_sample(spark: SparkSession, sf_dir: str):
    """The trainer sample as a vec_id-sorted float64 matrix, collected
    ONCE per (session, sf_dir) — every k shares it (vec01 trains at
    KM_K, dd11 at its scaled k, off the same TakeOrdered job)."""
    from flink_streaming_platform_web_spark.operators._cache import memo_obj

    def build():
        rows = (
            _vecs(spark, sf_dir)
            .orderBy("vec_id")
            .limit(KM_SAMPLE)
            .collect()
        )
        return np.array([r["v"] for r in rows], dtype=float)

    return memo_obj(spark, sf_dir, "km_sample", build)


def corpus_size(spark: SparkSession, sf_dir: str) -> int:
    """|vectors| without a count job whenever the trainer sample
    already covers the corpus (every oracle-gated SF); only a
    KM_SAMPLE-saturated sample pays the real count."""
    from flink_streaming_platform_web_spark.operators._cache import memo_obj

    V = km_sample(spark, sf_dir)
    if len(V) < KM_SAMPLE:
        return len(V)
    return memo_obj(
        spark, sf_dir, "n_vecs", _vecs(spark, sf_dir).count
    )


def km_centroids(spark: SparkSession, sf_dir: str, k: int = KM_K):
    """Train k centroids with KM_ITERS rounds of Lloyd's (deterministic
    lowest-vec_id init) and return (labels, C) in cell_assign's
    centroid format. Memoized per (session, sf_dir, k): dd11 trains
    its scaled quantizer through this exact path, so the IVF
    'centroid count grows with the corpus' knob is the SAME trainer
    vec01 gates through its oracle (k=KM_K there).

    Round 10 (VERDICT r9 item 3): the trainer collects ONE
    deterministic KM_SAMPLE-bounded sample (a TakeOrdered job — never
    corpus-bounded) and runs init + every Lloyd's round driver-side
    in numpy. The round-9 shape paid one init job plus one fused
    assignment job PER ROUND of scheduler floor, which was the whole
    dd11 gap at bench SF. Arithmetic is unchanged and bit-identical
    to the unrolled oracle: the same _block_cosine/round-6/lexsort
    assignment (ties to the lowest label), floor(x·1e9) int64 sums
    (associative — one numpy sum replaces the per-partition
    partials), and the same (SUM/1e9)/COUNT division sequence."""
    from flink_streaming_platform_web_spark.operators._cache import memo_obj

    def build():
        from flink_streaming_platform_web_spark.operators import (
            similarity,
        )

        V = km_sample(spark, sf_dir)
        # init: the k lowest vec_ids, cluster ids 0..k-1 in vec_id
        # order (rows arrive vec_id-sorted)
        labels = np.arange(min(k, len(V)))
        C = V[: len(labels)].copy()
        for _ in range(KM_ITERS - 1):
            cos = np.round(similarity._block_cosine(V, C), 6)
            # nearest centroid, ties to the lowest label — the same
            # (rounded-cos desc, label asc) order cell_assign uses
            nearest = np.lexsort(
                (np.broadcast_to(labels, cos.shape), -cos), axis=1
            )[:, 0]
            cells = labels[nearest]
            scaled = np.floor(V * 1e9).astype(np.int64)
            present = np.unique(cells)  # empty clusters drop
            C2 = np.empty((len(present), V.shape[1]))
            for i, c in enumerate(present):
                mask = cells == c
                s = scaled[mask].sum(axis=0)
                C2[i] = (s / 1e9) / float(mask.sum())
            labels, C = present, C2
        return labels, C

    return memo_obj(spark, sf_dir, f"km_centroids_{k}", build)


def vec01_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    labels, C = km_centroids(spark, sf_dir, KM_K)
    vecs = _vecs(spark, sf_dir)
    final = cell_assign(spark, vecs, sf_dir, 1, centroids=(labels, C))
    return final.groupBy(F.col("cell").alias("cluster_id")).agg(
        F.count("*").alias("n_members"),
        F.sum("vec_id").cast("bigint").alias("sum_vec_id"),
    )


def _oracle_km_prefix() -> str:
    """Shared CTE chain replaying km_centroids(k=KM_K) exactly: e →
    init → assign1 → means1 → cent1 (the trained centroid list).
    vec01's oracle appends the final assignment; dd11's appends the
    multi-probe near-dup pair tail."""
    cos_init = _ORACLE_COS.format(a="e.v", b="i.cv")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
init AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
         v AS cv
  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {KM_K})
),
assign1 AS (
  SELECT vec_id, v, cid AS cell FROM (
    SELECT e.vec_id, e.v, i.cid,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY round({cos_init}, 6) DESC, i.cid ASC) AS rn
    FROM e CROSS JOIN init i
  ) WHERE rn = 1
),
means1 AS (
  SELECT cell, d,
         {oracle_fp_mean('x')} AS m
  FROM (SELECT cell, d::INT - 1 AS d, v[d] AS x
        FROM assign1,
             LATERAL (SELECT unnest(generate_series(1, len(v))) AS d))
  GROUP BY cell, d
),
cent1 AS (
  SELECT cell AS cid, list(m ORDER BY d) AS cv FROM means1 GROUP BY cell
)"""


def _oracle_vec01() -> str:
    cos_c1 = _ORACLE_COS.format(a="e.v", b="c.cv")
    return f"""{_oracle_km_prefix()},
assign2 AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT e.vec_id, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY round({cos_c1}, 6) DESC, c.cid ASC) AS rn
    FROM e CROSS JOIN cent1 c
  ) WHERE rn = 1
)
SELECT cell AS cluster_id, COUNT(*) AS n_members,
       CAST(SUM(vec_id) AS BIGINT) AS sum_vec_id
FROM assign2 GROUP BY cell
"""


ORACLE_VEC01 = _oracle_vec01()


# --------------------------------------------------------------------------
# vec02 — asymmetric int8 quantization (min/max affine, the standard
# embedding-store compression): per vector, scale [min, max] onto
# [-128, 127], emit the code fingerprint and the max reconstruction
# error. Pure per-row array math — zero shuffles, scan-bound at any
# scale; both engines evaluate the identical IEEE expression tree
# (floor(x + 0.5) rounding — portable, unlike CAST which truncates in
# Spark and rounds in DuckDB).
# --------------------------------------------------------------------------


def vec02_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = _vecs(spark, sf_dir).select(
        "vec_id",
        "v",
        F.array_min("v").alias("amin"),
        ((F.array_max("v") - F.array_min("v")) / F.lit(255.0)).alias("s"),
    )
    codes = F.expr(
        "transform(v, x -> CAST(floor((x - amin) / s + 0.5) AS INT) - 128)"
    )
    recon_err = F.expr(
        "array_max(transform(v, x -> "
        "abs(x - (floor((x - amin) / s + 0.5) * s + amin))))"
    )
    return vecs.filter(F.col("s") > 0).select(
        "vec_id",
        F.round("amin", 6).alias("qmin"),
        F.round(F.col("amin") + F.col("s") * 255.0, 6).alias("qmax"),
        F.md5(
            F.array_join(F.transform(codes, lambda c: c.cast("string")), ",")
        ).alias("codes_md5"),
        F.round(recon_err, 9).alias("max_err"),
    )


ORACLE_VEC02 = """
WITH p AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         list_min(embedding::DOUBLE[]) AS amin,
         (list_max(embedding::DOUBLE[]) - list_min(embedding::DOUBLE[]))
           / 255.0 AS s
  FROM embeddings
)
SELECT vec_id,
       round(amin, 6) AS qmin,
       round(amin + s * 255.0, 6) AS qmax,
       md5(array_to_string(
         list_transform(v, x ->
           CAST(floor((x - amin) / s + 0.5) AS INT) - 128), ',')) AS codes_md5,
       round(list_max(list_transform(v, x ->
           abs(x - (floor((x - amin) / s + 0.5) * s + amin)))), 9) AS max_err
FROM p WHERE s > 0
"""


# --------------------------------------------------------------------------
# vec03 — per-dimension corpus feature statistics (n/mean/var/min/max):
# the normalization-prep pass every embedding pipeline runs before
# whitening, quantizer training, or drift monitoring. Shape: posexplode
# to (dim, x) rows and ONE map-side-combined agg keyed by dim — at
# 100 TB the only corpus-sized stage is the scan; the shuffle carries
# |dims| × |partitions| partial rows. Means and variances use the
# fixed-point integer carrier (floor(x·1e9), floor(x²·1e9) — exact
# BIGINT sums; see q32 / _portable.py rule 1) so both engines reduce
# bit-identically at any scale; the final mean/var arithmetic is
# per-group scalar IEEE math (rule 2). min/max over doubles are exact
# order-independent reductions and need no carrier.
# --------------------------------------------------------------------------


def vec03_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    elems = (
        _vecs(spark, sf_dir)
        .select(F.posexplode("v").alias("d0", "x"))
        .select((F.col("d0") + 1).alias("d"), F.col("x"))
    )
    sx = F.sum(F.floor(F.col("x") * F.lit(1e9)).cast("bigint"))
    sxx = F.sum(
        F.floor(F.col("x") * F.col("x") * F.lit(1e9)).cast("bigint")
    )
    n = F.count("*").cast("double")
    mean = (sx.cast("double") / F.lit(1e9)) / n
    var = (sxx.cast("double") / F.lit(1e9)) / n - mean * mean
    return elems.groupBy("d").agg(
        F.count("*").alias("n"),
        mean.alias("mean_x"),
        var.alias("var_x"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
    )


ORACLE_VEC03 = """
SELECT d, COUNT(*) AS n,
       (CAST(SUM(CAST(floor(x * 1e9) AS BIGINT)) AS DOUBLE) / 1e9)
         / CAST(COUNT(*) AS DOUBLE) AS mean_x,
       (CAST(SUM(CAST(floor(x * x * 1e9) AS BIGINT)) AS DOUBLE) / 1e9)
         / CAST(COUNT(*) AS DOUBLE)
         - ((CAST(SUM(CAST(floor(x * 1e9) AS BIGINT)) AS DOUBLE) / 1e9)
            / CAST(COUNT(*) AS DOUBLE))
           * ((CAST(SUM(CAST(floor(x * 1e9) AS BIGINT)) AS DOUBLE) / 1e9)
              / CAST(COUNT(*) AS DOUBLE)) AS var_x,
       MIN(x) AS min_x,
       MAX(x) AS max_x
FROM (
  SELECT d::INT AS d, CAST(v[d] AS DOUBLE) AS x
  FROM (SELECT embedding::DOUBLE[] AS v FROM embeddings),
       LATERAL (SELECT unnest(generate_series(1, len(v))) AS d)
)
GROUP BY d
"""


# --------------------------------------------------------------------------
# vec04 — gram matrix Xᵀ·X (upper triangle): the sufficient statistic
# for PCA / whitening / covariance over an embedding corpus. The
# distributed shape is the textbook one: each partition accumulates a
# LOCAL d×d partial in numpy (mapInPandas, Arrow-batched), and the
# only exchange carries |partitions| × d(d+1)/2 tiny rows — the corpus
# itself never shuffles, and nothing is ever corpus × d² (the
# posexplode² formulation would be). Products are per-row fixed-point
# (floor(xᵢ·xⱼ·1e9) as int64) so the global sum is order-independent
# and bit-identical across engines (_portable.py rationale).
# --------------------------------------------------------------------------


def vec04_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = _vecs(spark, sf_dir)

    def partial_gram(iterator):
        import numpy as np
        import pandas as pd

        G = None
        n = 0
        for pdf in iterator:
            if not len(pdf):
                continue
            X = np.array(pdf["v"].tolist(), dtype=np.float64)
            if G is None:
                d = X.shape[1]
                G = np.zeros((d, d), dtype=np.int64)
            # chunk the R×d×d product tensor to bound memory at
            # ~512·d² doubles (~16 MB at d=64) regardless of batch size
            for lo in range(0, X.shape[0], 512):
                B = X[lo : lo + 512]
                P = B[:, :, None] * B[:, None, :]
                G += np.floor(P * 1e9).astype(np.int64).sum(axis=0)
            n += X.shape[0]
        if G is not None:
            iu = np.triu_indices(G.shape[0])
            yield pd.DataFrame(
                {
                    "d1": (iu[0] + 1).astype("int32"),
                    "d2": (iu[1] + 1).astype("int32"),
                    "gram_scaled": G[iu],
                    "n_rows": np.int64(n),
                }
            )

    partials = vecs.mapInPandas(
        partial_gram,
        "d1 int, d2 int, gram_scaled bigint, n_rows bigint",
    )
    return partials.groupBy("d1", "d2").agg(
        (F.sum("gram_scaled").cast("double") / F.lit(1e9)).alias("gram"),
        F.sum("n_rows").alias("n"),
    )


ORACLE_VEC04 = """
WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
pairs AS (
  SELECT CAST(i.d AS INT) AS d1, CAST(j.d AS INT) AS d2,
         CAST(floor(CAST(v[i.d] AS DOUBLE) * CAST(v[j.d] AS DOUBLE)
                    * 1e9) AS BIGINT) AS p
  FROM e,
       LATERAL (SELECT unnest(generate_series(1, len(v))) AS d) i,
       LATERAL (SELECT unnest(generate_series(1, len(v))) AS d) j
  WHERE j.d >= i.d
)
SELECT d1, d2,
       CAST(SUM(p) AS DOUBLE) / 1e9 AS gram,
       COUNT(*) AS n
FROM pairs
GROUP BY d1, d2
"""


QUERIES = {
    "vec01_kmeans": vec01_kmeans,
    "vec02_quantize_int8": vec02_quantize_int8,
    "vec03_dim_stats": vec03_dim_stats,
    "vec04_gram_matrix": vec04_gram_matrix,
}

ORACLES = {
    "vec01_kmeans": ORACLE_VEC01,
    "vec02_quantize_int8": ORACLE_VEC02,
    "vec03_dim_stats": ORACLE_VEC03,
    "vec04_gram_matrix": ORACLE_VEC04,
}
