"""Similarity search over the `embeddings` table (array<float> column).

- **ann01**: brute-force cosine top-k for a query subset — the exactness
  baseline. The neighbor side streams through a broadcast of the (small)
  query set: no shuffle of the big side, so the plan scales to any
  corpus size as long as the query batch stays broadcastable.
- **ann02**: all-pairs near-dup (cosine ≥ τ). Quadratic by definition;
  acceptable for candidate verification, never for discovery at scale.
- **ann03**: the scale path — random-hyperplane LSH bucketing (signs of
  8 md5-seeded projections ⇒ 256 buckets), then brute force only within
  buckets. At 100 TB, the bucket join replaces the quadratic pair space
  with per-bucket blocks; more planes/multi-probe tighten recall.

All vector math runs on array<double> with sequential fold order over
dimensions, so cosines are IEEE-bit-stable against the DuckDB oracle
(verified by the parity harness). The kernel is an Arrow-batched Pandas
UDF that loops over the 64 dimensions with numpy elementwise ops —
vectorized across the pair batch, but per pair the accumulation order
is exactly d=0..63, i.e. the same scalar IEEE sequence as DuckDB's
list_dot_product loop (a numpy matmul would NOT be: BLAS reorders the
reduction). Cosines are rounded to 6 dp at the output boundary.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from flink_streaming_platform_web_spark.tables import load

TOP_K = 5
QUERY_MOD = 20  # vec_id % 20 == 0 → the query subset
NEARDUP_COS = 0.4
DIM = 64


def _vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus as (vec_id, array<double>), spread across all cores: the
    embeddings parquet is dense-but-small on disk (one row-group →
    one input partition), which would serialize every numpy block
    kernel downstream; the repartition is a one-time tiny shuffle that
    buys full parallelism for the scoring stages. Memoized persisted
    per (session, sf_dir): the k-means trainer, the IVF assignment and
    every ANN kernel scan this same relation — without the memo each
    of their jobs re-read, re-parsed and re-shuffled the corpus (at
    100 TB: N re-reads of the lake for one pipeline; locally: one
    scheduler-floor exchange per job, the round-8 dd11 cost)."""
    from flink_streaming_platform_web_spark.operators._cache import memo_df

    def build() -> DataFrame:
        emb = load(spark, sf_dir, "embeddings")
        return emb.repartition(
            spark.sparkContext.defaultParallelism
        ).select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias(
                "v"
            ),
        )

    return memo_df(spark, sf_dir, "vecs_spread", build)


@pandas_udf(DoubleType())
def _cos_kernel(a: pd.Series, b: pd.Series) -> pd.Series:
    """Bit-stable cosine: per-pair accumulation runs in dimension order
    (see module docstring), vectorized across the Arrow batch."""
    if len(a) == 0:
        return pd.Series([], dtype="float64")
    A = np.stack(a.to_numpy())
    B = np.stack(b.to_numpy())
    n = A.shape[0]
    dot = np.zeros(n)
    na = np.zeros(n)
    nb = np.zeros(n)
    for d in range(A.shape[1]):
        dot += A[:, d] * B[:, d]
        na += A[:, d] * A[:, d]
        nb += B[:, d] * B[:, d]
    return pd.Series(dot / (np.sqrt(na) * np.sqrt(nb)))


def _dot_fold(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product: aggregate starts at 0.0 and
    adds element products in array order — the exact IEEE sequence of
    _cos_kernel's dimension loop and the oracle's list_dot_product."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _cosine(a: Column, b: Column) -> Column:
    """Pure-Catalyst cosine (round 9 — replaces the pandas-UDF hop):
    whole-stage-codegen-eligible and bit-identical to ``_cos_kernel``
    (same per-dimension accumulation order, same division/sqrt
    composition — pinned by tests/test_similarity.py's randomized
    kernel differential). ANN joins that score pairs JVM-side no
    longer ship every candidate pair through Arrow into Python."""
    return _dot_fold(a, b) / (
        F.sqrt(_dot_fold(a, a)) * F.sqrt(_dot_fold(b, b))
    )


# DuckDB side: explicit same-shape arithmetic (list_dot_product order ==
# sequential loop; division/sqrt composition mirrored exactly).
_ORACLE_COS = (
    "list_dot_product({a}, {b})"
    " / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


def _broadcast_matrix(spark: SparkSession, df: DataFrame):
    """Broadcast (ids, matrix) of a vector DataFrame to the executors.

    This is the vector-side analog of a broadcast join: legitimate
    whenever one side fits in executor memory (queries in ann01; the
    full corpus in ann02's brute-force verification role). The
    discovery-at-scale path is ann03, which never broadcasts the
    corpus.
    """
    pdf = df.orderBy("vec_id").toPandas()
    if not len(pdf):
        # np.stack on zero rows raises an opaque numpy error; say what
        # actually went wrong (empty corpus slice / query selector
        # matched nothing) so the caller can fix the input
        raise ValueError(
            "cannot broadcast an EMPTY vector set — the input "
            "DataFrame produced no rows"
        )
    ids = pdf["vec_id"].to_numpy()
    mat = np.stack(pdf["v"].to_numpy())
    return spark.sparkContext.broadcast((ids, mat))


def _block_cosine(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """All-pairs cosine with per-pair sequential dimension order (the
    bit-stability contract — see module docstring)."""
    m, dim = A.shape
    n = B.shape[0]
    dot = np.zeros((m, n))
    na = np.zeros(m)
    nb = np.zeros(n)
    for d in range(dim):
        dot += A[:, d][:, None] * B[:, d][None, :]
        na += A[:, d] * A[:, d]
        nb += B[:, d] * B[:, d]
    return dot / (np.sqrt(na)[:, None] * np.sqrt(nb)[None, :])


def ann01_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = _vecs(spark, sf_dir)
    queries = vecs.filter(F.col("vec_id") % QUERY_MOD == 0)
    qb = _broadcast_matrix(spark, queries)

    def score(batches):
        q_ids, Q = qb.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            n_ids = pdf["vec_id"].to_numpy()
            N = np.stack(pdf["v"].to_numpy())
            cos = np.round(_block_cosine(Q, N), 6)
            # partition-local top-k: the global rank only needs each
            # partition's k best candidates per query, so the shuffle
            # carries queries×k×partitions rows, not queries×corpus
            cos_masked = np.where(
                q_ids[:, None] == n_ids[None, :], -np.inf, cos
            )
            k = min(TOP_K, cos_masked.shape[1])
            # ties on cos must keep the LOWEST neighbor_id → secondary
            # sort key; argsort on (-cos, id) lexicographically
            order = np.lexsort(
                (np.broadcast_to(n_ids, cos_masked.shape), -cos_masked),
                axis=1,
            )[:, :k]
            qi = np.repeat(np.arange(len(q_ids)), k)
            ni = order.ravel()
            keep = cos_masked[qi, ni] != -np.inf
            yield pd.DataFrame(
                {
                    "query_id": q_ids[qi[keep]],
                    "neighbor_id": n_ids[ni[keep]],
                    "cos_sim": cos[qi[keep], ni[keep]],
                }
            )

    pairs = vecs.mapInPandas(
        score, "query_id long, neighbor_id long, cos_sim double"
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "rk", "cos_sim")
    )


_cos_ab = _ORACLE_COS.format(a="q.v", b="n.v")

ORACLE_ANN01 = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
pairs AS (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         round({_cos_ab}, 6) AS cos_sim
  FROM e q JOIN e n ON n.vec_id != q.vec_id
  WHERE q.vec_id % {QUERY_MOD} = 0
)
SELECT query_id, neighbor_id, rk, cos_sim FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY cos_sim DESC, neighbor_id ASC) AS rk
  FROM pairs
) WHERE rk <= {TOP_K}
"""


def ann02_embed_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs near-dup: each partition scores its vectors against a
    broadcast of the corpus matrix; only pairs above threshold leave
    the executor. The quadratic pair space exists only inside the numpy
    block, never as shuffled rows."""
    vecs = _vecs(spark, sf_dir)
    cb = _broadcast_matrix(spark, vecs)

    def score(batches):
        b_ids, B = cb.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # tile both sides: an untiled batch×corpus block is
            # O(|batch|·|corpus|) doubles — 8 GB per worker at 100k
            # vectors (it crashed the sf5 scale run). Tiling bounds
            # the dense intermediate at A_TILE×B_TILE (~67 MB) with
            # bit-identical results: _block_cosine's per-pair
            # sequential dim order is untouched by partitioning the
            # pair space.
            A_TILE, B_TILE = 1024, 8192
            for a0 in range(0, len(pdf), A_TILE):
                sub = pdf.iloc[a0:a0 + A_TILE]
                a_ids = sub["vec_id"].to_numpy()
                A = np.stack(sub["v"].to_numpy())
                for b0 in range(0, len(b_ids), B_TILE):
                    bid = b_ids[b0:b0 + B_TILE]
                    cos = np.round(
                        _block_cosine(A, B[b0:b0 + B_TILE]), 6
                    )
                    ai, bi = np.nonzero(
                        (a_ids[:, None] < bid[None, :])
                        & (cos >= NEARDUP_COS)
                    )
                    if len(ai):
                        yield pd.DataFrame(
                            {
                                "id_a": a_ids[ai],
                                "id_b": bid[bi],
                                "cos_sim": cos[ai, bi],
                            }
                        )

    return vecs.mapInPandas(score, "id_a long, id_b long, cos_sim double")


ORACLE_ANN02 = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round({_ORACLE_COS.format(a='a.v', b='b.v')}, 6) AS cos_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round({_ORACLE_COS.format(a='a.v', b='b.v')}, 6) >= {NEARDUP_COS}
"""


# --------------------------------------------------------------------------
# ann03 — BANDED random-hyperplane LSH + within-bucket verification
# (round 10 late: bands × scaled bits — the single fixed-width table
# passed n²·0.5^8 chance pairs to the verifier, measured exponent
# 0.95 at sf5). LSH_BANDS independent signature tables give the
# recall OR (a true pair needs to collide in ANY band); bits PER band
# scale as ⌈log2(n / LSH_BUCKET_TARGET)⌉ so per-bucket population —
# and with it the verifier's chance-candidate load per row — stays
# bounded as the corpus grows (the r ~ log n rule every production
# LSH index applies). At every oracle-gated SF the bit count floors
# at LSH_BITS_FLOOR, which is what the static DuckDB oracle replays.
# Hyperplane weights are md5-derived (engine-portable, deterministic):
# w(plane, dim) = (int(md5('plane:dim')[:15hex]) % 2001 - 1000) / 1000,
# computed once on the driver (bands·bits × DIM doubles — tiny) and
# embedded as array literals on BOTH engines, so no weight table ever
# joins the corpus. Each plane's projection is an array-side SEQUENTIAL
# fold (zip_with → aggregate): deterministic IEEE order per row (the
# _portable.py "reduce exactly" rule — an unordered SUM could flip the
# sign of a near-zero projection and with it the bucket bit), and the
# whole signature assignment is a pure projection — ZERO shuffle
# before the per-band self-join. Pairs colliding in several bands
# carry bit-identical cosines (same fold), so DISTINCT collapses them
# exactly (the dd07/dd11 multi-probe rule).
# --------------------------------------------------------------------------

LSH_BANDS = 4
LSH_BITS_FLOOR = 8
LSH_BUCKET_TARGET = 8


def _lsh_bits(n: int) -> int:
    """Bits per band: per-bucket population n/2^bits ≤ TARGET."""
    import math

    return max(
        LSH_BITS_FLOOR,
        math.ceil(math.log2(max(n, 1) / LSH_BUCKET_TARGET)),
    )


def _hyperplanes(n_planes: int) -> list[list[float]]:
    import hashlib

    return [
        [
            (
                int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:15], 16)
                % 2001
                - 1000
            )
            / 1000.0
            for d in range(1, DIM + 1)
        ]
        for p in range(n_planes)
    ]


def _band_sig_cols(bits: int) -> "list[Column]":
    """One signature column per band: sig_b = Σ_i (proj_{b·bits+i} > 0)
    << i, each as one Catalyst projection. Kept as the REFERENCE
    formulation (the plan gate pins its zero-exchange shape and the
    randomized differential pins it against `_band_sigs_long`); the
    query path uses the mapInPandas kernel below — constructing
    bands×bits fold expressions costs ~3.5 s of py4j round-trips plus
    a same-order Catalyst analysis bill EVERY run (measured r11), all
    driver-side fixed cost that would dwarf small-SF execution."""
    planes = _hyperplanes(LSH_BANDS * bits)
    sigs = []
    for b in range(LSH_BANDS):
        sig = F.lit(0).cast("bigint")
        for i in range(bits):
            w = planes[b * bits + i]
            w_arr = F.array(*[F.lit(x) for x in w])
            proj = F.aggregate(
                F.zip_with(F.col("v"), w_arr, lambda x, wc: x * wc),
                F.lit(0.0),
                lambda acc, t: acc + t,
            )
            sig = sig + (
                F.when(proj > 0, F.lit(1 << i).cast("bigint"))
                .otherwise(F.lit(0).cast("bigint"))
            )
        sigs.append(sig.alias(f"sig{b}"))
    return sigs


def _band_sigs_long(vecs: DataFrame, bits: int) -> DataFrame:
    """(vec_id, v, band, sig) — one row per (vector, band) — computed
    in ONE Arrow-batched pass. Per plane the projection accumulates in
    dimension order d=0..DIM-1 (acc = acc + v[d]·w[d], vectorized
    across the batch, sequential over dims), the exact IEEE sequence
    of `_band_sig_cols`'s zip_with→aggregate left fold and the
    oracle's list_reduce — so bucket bits can never drift between the
    three formulations (randomized differential in
    tests/test_similarity.py). Still a pure projection: zero
    exchanges before the per-band self-join."""
    n_planes = LSH_BANDS * bits
    W = np.array(_hyperplanes(n_planes))  # (planes, DIM)
    pow2 = np.array(
        [1 << (p % bits) for p in range(n_planes)], dtype=np.int64
    )
    bands = np.arange(n_planes, dtype=np.int32) // bits

    def sigs(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf["v"].to_numpy())  # (n, DIM)
            acc = np.zeros((len(pdf), n_planes))
            for d in range(V.shape[1]):
                acc += V[:, d : d + 1] * W[None, :, d]
            bitmat = (acc > 0).astype(np.int64) * pow2[None, :]
            sig = np.zeros((len(pdf), LSH_BANDS), dtype=np.int64)
            for b in range(LSH_BANDS):
                sig[:, b] = bitmat[:, bands == b].sum(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(
                        pdf["vec_id"].to_numpy(), LSH_BANDS
                    ),
                    "v": pdf["v"].iloc[
                        np.repeat(np.arange(len(pdf)), LSH_BANDS)
                    ].to_numpy(),
                    "band": np.tile(
                        np.arange(LSH_BANDS, dtype=np.int32), len(pdf)
                    ),
                    "sig": sig.ravel(),
                }
            )

    return vecs.mapInPandas(
        sigs, "vec_id long, v array<double>, band int, sig long"
    )


def ann03_lsh_bucketed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_streaming_platform_web_spark.operators import (
        vectors as vectors_mod,
    )

    bits = _lsh_bits(vectors_mod.corpus_size(spark, sf_dir))
    vecs = _vecs(spark, sf_dir)
    long = _band_sigs_long(vecs, bits)
    a = long.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"),
        "band", "sig",
    )
    b = long.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"),
        "band", "sig",
    )
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(_cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= NEARDUP_COS)
        .distinct()
    )


def _oracle_band_sql(band: int, bits: int) -> str:
    """Mirror of one band's signature: literal weights + list_reduce
    left fold (list_reduce starts from element 1; Spark's aggregate
    starts from 0.0 + element 1 — identical IEEE sequence since
    0.0 + x == x)."""
    planes = _hyperplanes(LSH_BANDS * bits)
    terms = []
    for i in range(bits):
        w = planes[band * bits + i]
        wl = "[" + ", ".join(repr(x) for x in w) + "]::DOUBLE[]"
        proj = (
            f"list_reduce(list_transform(range(1, {DIM + 1}), "
            f"i -> v[i] * ({wl})[i]), (a, b) -> a + b)"
        )
        terms.append(f"CASE WHEN {proj} > 0 THEN {1 << i} ELSE 0 END")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def _oracle_ann03() -> str:
    bands_sql = " UNION ALL ".join(
        f"SELECT vec_id, v, {b} AS band,"
        f" {_oracle_band_sql(b, LSH_BITS_FLOOR)} AS sig FROM e"
        for b in range(LSH_BANDS)
    )
    cos = _ORACLE_COS.format(a="a.v", b="b.v")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
long AS ({bands_sql})
SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
       round({cos}, 6) AS cos_sim
FROM long a JOIN long b
  ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id
WHERE round({cos}, 6) >= {NEARDUP_COS}
"""


ORACLE_ANN03 = _oracle_ann03()


# --------------------------------------------------------------------------
# ann04 — IVF-style search: coarse-quantize the corpus into cells
# (here: per-label centroids standing in for k-means centroids — the
# quantizer training is orthogonal to the search path), assign every
# vector to its nearest centroid, then answer queries by brute-forcing
# ONLY the query's own cell (nprobe=1). This is the canonical
# billion-vector layout: the corpus partitions by cell, a query
# touches |corpus|/n_cells vectors, and recall tunes via nprobe.
# --------------------------------------------------------------------------

IVF_TOP_K = 3

#: per-cell population target for the IVF coarse quantizer (the same
#: budget the dedup family's blocked verifier uses): cell count grows
#: with the corpus so a probe always brute-forces a bounded slice
IVF_CELL_TARGET = 2048


def _ivf_centroids(spark: SparkSession, sf_dir: str):
    """Scaled k-means coarse quantizer for the IVF family (round 10
    late): k = max(KM_K, ⌈n / IVF_CELL_TARGET⌉), trained by the
    sampled one-job trainer vectors.km_centroids. The previous
    per-label means were a FIXED cell count, so every query's probe
    slice grew linearly with the corpus and the family's measured
    sf0.1→sf5 exponents hit 0.97 (ann04) / 1.22 (ann05); with k ∝ n
    the probe cost per query is constant. At every oracle-gated SF
    (n ≤ 2048·KM_K/…) the formula floors at KM_K, which is exactly
    the k the static DuckDB oracle replays."""
    from flink_streaming_platform_web_spark.operators import (
        vectors as vectors_mod,
    )

    n = vectors_mod.corpus_size(spark, sf_dir)
    k = max(vectors_mod.KM_K, -(-n // IVF_CELL_TARGET))
    return vectors_mod.km_centroids(spark, sf_dir, k)


def _corpus_assigned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nprobe=1 cell assignment of the full corpus, persisted per
    session — ann04 references it twice (cell self-join) and ann05
    probes it; without the memo each reference re-runs the mapInPandas
    assignment pass over the whole corpus."""
    from flink_streaming_platform_web_spark.operators._cache import memo_df

    return memo_df(
        spark,
        sf_dir,
        "ivf_assigned1",
        lambda: cell_assign(
            spark,
            _vecs(spark, sf_dir),
            sf_dir,
            1,
            centroids=_ivf_centroids(spark, sf_dir),
        ),
    )


def ann04_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigned = _corpus_assigned(spark, sf_dir)
    queries = assigned.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("cell"),
        F.col("v").alias("qv"),
    )
    probed = assigned.join(queries, "cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = probed.select(
        "query_id",
        "cell",
        F.col("vec_id").alias("neighbor_id"),
        F.round(_cosine(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= IVF_TOP_K)
        .select("query_id", "cell", "neighbor_id", "rk", "cos_sim")
    )


# The ann04 oracle is built below on top of the shared k-means
# ranked CTE (_oracle_km_ranked — ann05 reuses it), so a carrier
# change in the centroid fixed-point expression can never partially
# apply.


# --------------------------------------------------------------------------
# ann05 — IVF multi-probe (nprobe=2): each query brute-forces its TWO
# nearest cells instead of one (the recall knob of every IVF index —
# BACKLOG round-2 item). Corpus vectors stay assigned to exactly one
# cell, so probe candidate sets are disjoint and the probe join's
# output is bounded by nprobe × |cell|. Scoring inside probed cells is
# already exact cosine, so the shortlist IS the re-rank.
# --------------------------------------------------------------------------

N_PROBE = 2


def cell_assign(
    spark: SparkSession,
    vecs: DataFrame,
    sf_dir: str,
    n_cells: int,
    centroids: tuple | None = None,
) -> DataFrame:
    """Assign each vector to its `n_cells` nearest centroid cells
    (vec_id, cell, v — one row per probe). The centroid matrix is
    k×dim (tiny) and broadcast; the corpus never shuffles here —
    assignment is a mapInPandas projection."""
    labels, C = (
        centroids
        if centroids is not None
        else _ivf_centroids(spark, sf_dir)
    )
    cb = spark.sparkContext.broadcast((labels, C))

    def assign(batches):
        lab, cent = cb.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf["v"].to_numpy())
            cos = np.round(_block_cosine(V, cent), 6)
            order = np.lexsort(
                (np.broadcast_to(lab, cos.shape), -cos), axis=1
            )[:, :n_cells]
            m = order.shape[1]
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), m),
                    "cell": lab[order].ravel(),
                    "v": pdf["v"].iloc[
                        np.repeat(np.arange(len(pdf)), m)
                    ].to_numpy(),
                }
            )

    return vecs.mapInPandas(assign, "vec_id long, cell int, v array<double>")


def ann05_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = _vecs(spark, sf_dir)
    corpus = _corpus_assigned(spark, sf_dir)
    query_probes = (
        cell_assign(
            spark,
            vecs.filter(F.col("vec_id") % QUERY_MOD == 0),
            sf_dir,
            N_PROBE,
            centroids=_ivf_centroids(spark, sf_dir),
        )
        .select(
            F.col("vec_id").alias("query_id"),
            "cell",
            F.col("v").alias("qv"),
        )
    )
    probed = corpus.join(query_probes, "cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = probed.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(_cosine(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= IVF_TOP_K)
        .select("query_id", "neighbor_id", "rk", "cos_sim")
    )


# ann04/ann05 oracles replay the SAME scaled-k-means quantizer the
# Spark side trains (round 10 late — previously per-label means): the
# vectors._oracle_km_prefix CTE chain plus a per-vector cell ranking.
# Built lazily (module __getattr__ below) because vectors.py imports
# this module at its top level — a module-level build here would make
# the import order load-bearing.


def _oracle_km_ranked() -> str:
    from flink_streaming_platform_web_spark.operators.vectors import (
        _oracle_km_prefix,
    )

    cosq = _ORACLE_COS.format(a="e.v", b="c.cv")
    return f"""{_oracle_km_prefix()},
ranked AS (
  SELECT e.vec_id, e.v, c.cid AS cell,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY round({cosq}, 6) DESC, c.cid ASC) AS rn
  FROM e CROSS JOIN cent1 c
)"""


def _oracle_ann04() -> str:
    cos = _ORACLE_COS.format(a="q.v", b="a.v")
    return f"""{_oracle_km_ranked()},
assigned AS (SELECT vec_id, v, cell FROM ranked WHERE rn = 1),
probed AS (
  SELECT q.vec_id AS query_id, a.cell, a.vec_id AS neighbor_id,
         round({cos}, 6) AS cos_sim
  FROM assigned q JOIN assigned a
    ON q.cell = a.cell AND a.vec_id != q.vec_id
  WHERE q.vec_id % {QUERY_MOD} = 0
)
SELECT query_id, cell, neighbor_id, rk, cos_sim FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY cos_sim DESC, neighbor_id ASC) AS rk
  FROM probed
) WHERE rk <= {IVF_TOP_K}
"""


def _oracle_ann05() -> str:
    cos = _ORACLE_COS.format(a="q.qv", b="a.v")
    return f"""{_oracle_km_ranked()},
corpus AS (SELECT vec_id, v, cell FROM ranked WHERE rn = 1),
query_probes AS (
  SELECT vec_id AS query_id, v AS qv, cell
  FROM ranked WHERE rn <= {N_PROBE} AND vec_id % {QUERY_MOD} = 0
),
probed AS (
  SELECT q.query_id, a.vec_id AS neighbor_id,
         round({cos}, 6) AS cos_sim
  FROM query_probes q JOIN corpus a
    ON q.cell = a.cell AND a.vec_id != q.query_id
)
SELECT query_id, neighbor_id, rk, cos_sim FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY cos_sim DESC, neighbor_id ASC) AS rk
  FROM probed
) WHERE rk <= {IVF_TOP_K}
"""


QUERIES = {
    "ann01_brute_topk": ann01_brute_topk,
    "ann02_embed_neardup_pairs": ann02_embed_neardup_pairs,
    "ann03_lsh_bucketed_neardup": ann03_lsh_bucketed_neardup,
    "ann04_ivf_search": ann04_ivf_search,
    "ann05_ivf_multiprobe": ann05_ivf_multiprobe,
}

_STATIC_ORACLES = {
    "ann01_brute_topk": ORACLE_ANN01,
    "ann02_embed_neardup_pairs": ORACLE_ANN02,
    "ann03_lsh_bucketed_neardup": ORACLE_ANN03,
}


def __getattr__(name: str):
    # ORACLES is assembled on first access: ann04/ann05 replay the
    # k-means quantizer whose CTE text lives in vectors.py, and
    # vectors.py imports THIS module at its top level — building the
    # dict at import time would make the package's import order
    # load-bearing (PEP 562 lazy attribute instead).
    if name == "ORACLES":
        out = dict(_STATIC_ORACLES)
        out["ann04_ivf_search"] = _oracle_ann04()
        out["ann05_ivf_multiprobe"] = _oracle_ann05()
        return out
    raise AttributeError(name)
