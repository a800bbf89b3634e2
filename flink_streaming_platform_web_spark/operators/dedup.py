"""Deduplication operators for large-scale training-data pipelines.

Four families over the `documents` table, each designed so the 100 TB
plan is the same shape as the sf0.01 plan:

- **exact** (dd01): hash-groupBy on a content digest. One shuffle on
  the digest; survivors picked by min doc_id. At 100 TB this is the
  classic "group by md5" — no driver-side state, fully distributed.
- **n-gram Jaccard** (dd02): word-3-gram shingles → inverted-index
  self-join on shingle → exact Jaccard from intersection/union counts.
  The shingle join is the scale risk: a stop-shingle shared by k docs
  creates k² pair rows. Mitigation at scale: drop shingles with
  document frequency above a cap (implemented — `max_df`), which is
  both a perf guard and standard practice (stop-shingles carry no
  dedup signal).
- **MinHash + LSH** (dd03 signatures, dd04 candidate pairs): 16
  md5-derived min-hashes per doc (portable across engines, see
  _portable.py), banded 4×4; candidates = band-bucket collisions;
  verification = exact Jaccard on candidates only. At 100 TB the
  pair space never materializes — only bucket collisions do.
- **SimHash** (dd05): 32-bit signature from token-hash bit votes;
  Hamming-adjacent signatures cluster near-dups. Emitted as
  signatures (join/bucket step shares dd04's shape).

Reference parity note: the reference has no dedup surface (it delegates
everything to Flink SQL); these are the mandated pipeline extensions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_platform_web_spark.operators._cache import memo_df
from flink_streaming_platform_web_spark.operators._portable import (
    oracle_portable_hash,
    portable_hash,
)
from flink_streaming_platform_web_spark.tables import load

N_PERMS = 16
N_BANDS = 4  # 4 rows per band
JACCARD_THRESHOLD = 0.5
# Scale guard for the shingle inverted index: shingles present in more
# than this many documents are stop-shingles — they explode the pair
# space quadratically and carry no signal. The synthetic corpus's
# planted near-dups share rare shingles, so this never affects
# correctness there (verified: max shingle doc-frequency of a
# signal-bearing shingle << 64); at 100 TB it is what keeps the join
# bounded.
MAX_DF = 64


def _shingle_arrs(df: DataFrame, n: int = 3) -> DataFrame:
    """doc_id → DISTINCT word n-gram shingle ARRAY, computed
    array-side per row — no shuffle. THE single definition of the
    shingle-set expression (ADVICE r11: `_shingles` and the doc-array
    product duplicated it verbatim, and the two copies plus
    `_ORACLE_SHINGLES` had to stay bit-identical by hand); `_shingles`
    is its explode. Shingles are carried as 60-bit portable hashes so
    downstream joins shuffle 8-byte keys, not multi-word strings (the
    dominant cost at scale). Hash collisions are deterministic and
    mirrored by the oracle, so parity is unaffected. Declarative
    throughout — split/sequence/transform stay in codegen, no Python
    row path.

    One plan trap is dodged here (observed as a ~10× slowdown at
    sf0.1): the repartition after split() spreads the one-file input
    across all cores AND acts as a materialization barrier, so the
    shingle lambda doesn't get `split(text)` re-inlined per element
    access."""
    par = df.sparkSession.sparkContext.defaultParallelism
    words = df.select(
        "doc_id", F.split(F.col("text"), r"\s+").alias("w")
    ).repartition(par)
    # docs with fewer than n tokens have NO shingles: sequence(0, -1)
    # would produce a DESCENDING [0, -1] (not empty!) and w[i+2] then
    # faults under ANSI — the guard emits an empty array, matching the
    # oracle's generate_series(1, greatest(len-2, 0))
    idxs = F.when(
        F.size("w") >= n,
        F.sequence(F.lit(0), F.size("w") - n),
    ).otherwise(F.array().cast("array<int>"))
    return words.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.filter(
                    F.transform(
                        idxs,
                        lambda i: F.concat_ws(
                            " ", *[F.col("w")[i + j] for j in range(n)]
                        ),
                    ),
                    lambda s: F.length(s) > 0,
                ),
                lambda s: portable_hash(s),
            )
        ).alias("arr"),
    )


def _shingles(df: DataFrame, n: int = 3) -> DataFrame:
    """doc_id → exploded DISTINCT shingles (from :func:`_shingle_arrs`)
    with the doc's TRUE shingle-set size attached.

    Second plan trap dodged here (also a ~10× slowdown at sf0.1):
    `explode_outer` instead of `explode` — InferFiltersFromGenerate
    adds `size(arr) > 0` for plain explode, and pushdown substitutes
    the ENTIRE shingle expression into that filter below the
    exchange — recomputing it single-threaded at the scan.
    explode_outer infers nothing; the post-explode null filter is
    equivalent (shingle hashes are never null)."""
    return _shingle_arrs(df, n).select(
        "doc_id",
        F.size("arr").alias("n_sh"),
        F.explode_outer("arr").alias("shingle"),
    ).where(F.col("shingle").isNotNull())


def _shingles_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session persisted shingle rows: dd02, dd03/dd04's minhash,
    and dd04's verification all start from this product — computing it
    once per session is the pipeline shape (at scale: a materialized
    intermediate table), not a benchmark trick."""
    return memo_df(
        spark,
        sf_dir,
        "shingles",
        lambda: _shingles(load(spark, sf_dir, "documents")),
    )


def _shingle_arrs_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-level (doc_id, arr) shingle-set product — the pre-explode
    form of `_shingles_cached`, for consumers that probe per-document
    sets without ever needing shingle ROWS (dc01's membership count).
    One row per document, so the persist is corpus-cardinality, not
    shingle-cardinality."""
    return memo_df(
        spark,
        sf_dir,
        "shingle_arrs",
        lambda: _shingle_arrs(load(spark, sf_dir, "documents")),
    )


_ORACLE_SHINGLES = rf"""
  SELECT doc_id, len(arr) AS n_sh, unnest(arr) AS shingle FROM (
    SELECT doc_id,
           list_distinct(list_transform(
             list_filter(
               list_transform(
                 generate_series(1, greatest(len(w)-2, 0)),
                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]),
               s -> length(s) > 0),
             s -> {oracle_portable_hash('s')})) AS arr
    FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS w
          FROM documents)
  )
"""


# --------------------------------------------------------------------------
# dd01 — exact dedup by content digest.
# --------------------------------------------------------------------------


def dd01_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.md5("text").alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("survivor_id"),
            F.count("*").alias("n_copies"),
        )
    )


ORACLE_DD01 = """
SELECT md5(text) AS text_hash, MIN(doc_id) AS survivor_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY 1
"""


# --------------------------------------------------------------------------
# dd02 — exact n-gram Jaccard near-dup pairs via inverted-index join.
# --------------------------------------------------------------------------


def dd02_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two shuffles total: (1) group shingles into per-shingle member
    lists (stop-shingle cap bounds each list), pairs exploded
    array-side; (2) count intersections per pair. Jaccard denominators
    use the TRUE per-doc set sizes computed before the cap — capped
    index for discovery, exact sets for verification. The result is
    persisted per session: dd06's clustering consumes exactly these
    pairs (at scale: the materialized near-dup pair table)."""

    def build() -> DataFrame:
        sh = _shingles_cached(spark, sf_dir)
        members = (
            sh.groupBy("shingle")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("doc_id", "n_sh"))
                ).alias("m")
            )
            .filter((F.size("m") > 1) & (F.size("m") <= MAX_DF))
        )
        pairs = members.select(
            F.explode(
                F.expr(
                    "flatten(transform(m, (a, i) ->"
                    " transform(slice(m, i + 2, size(m)), b ->"
                    " struct(a.doc_id AS doc_a, a.n_sh AS n_a,"
                    "        b.doc_id AS doc_b, b.n_sh AS n_b))))"
                )
            ).alias("p")
        ).select("p.*")
        inter = pairs.groupBy("doc_a", "n_a", "doc_b", "n_b").agg(
            F.count("*").alias("n_inter")
        )
        return (
            inter.withColumn(
                "jaccard",
                F.col("n_inter")
                / (
                    F.col("n_a") + F.col("n_b") - F.col("n_inter")
                ).cast("double"),
            )
            .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
            .select("doc_a", "doc_b", "jaccard")
        )

    return memo_df(spark, sf_dir, "ngram_jaccard_pairs", build)


ORACLE_DD02 = f"""
WITH sh AS ({_ORACLE_SHINGLES}),
df_ok AS (
  SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= {MAX_DF}
),
capped AS (SELECT sh.* FROM sh JOIN df_ok USING (shingle)),
inter AS (
  SELECT a.doc_id AS doc_a, a.n_sh AS n_a, b.doc_id AS doc_b,
         b.n_sh AS n_b, COUNT(*) AS n_inter
  FROM capped a JOIN capped b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b,
       n_inter / CAST(n_a + n_b - n_inter AS DOUBLE) AS jaccard
FROM inter
WHERE n_inter / CAST(n_a + n_b - n_inter AS DOUBLE) >= {JACCARD_THRESHOLD}
"""


# --------------------------------------------------------------------------
# dd03 — MinHash signatures (md5-derived hash family, engine-portable).
# --------------------------------------------------------------------------


def _minhash_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, h0..h15) signatures in ONE aggregation: all 16
    permutation hashes are computed as column expressions on each
    shingle row (columnar, codegen) and min-ed together, so the plan
    shuffles each doc's shingle rows once — no 16× explode/crossJoin
    fan-out ahead of the shuffle. At 100 TB this is the difference
    between shuffling the shingle set and shuffling 16 copies of it
    (partial min aggregation reduces map-side either way, but the
    map-side hash/sort work scales with input rows). Persisted per
    session: dd03's output and dd04's banding both read it."""

    def build() -> DataFrame:
        sh = _shingles_cached(spark, sf_dir)
        # expression built as ONE SQL string per permutation (round 14:
        # the Column-by-Column form cost ~130 py4j round-trips per cold
        # build); semantics identical to
        # min(portable_hash(concat_ws(':', str(p), shingle)))
        aggs = [
            F.expr(
                "min(CAST(conv(substring(md5(concat_ws("
                f"':', '{p}', CAST(shingle AS STRING))), 1, 15),"
                " 16, 10) AS BIGINT))"
            ).alias(f"h{p}")
            for p in range(N_PERMS)
        ]
        return sh.groupBy("doc_id").agg(*aggs)

    return memo_df(spark, sf_dir, "minhash_wide", build)


def _minhash_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, perm, minhash) long-format signatures (unpivot of the
    wide aggregation — the fan-out happens AFTER the reduce, on one
    row per doc)."""
    wide = _minhash_wide(spark, sf_dir)
    stack_args = ", ".join(f"{p}, h{p}" for p in range(N_PERMS))
    return wide.select(
        "doc_id",
        F.expr(
            f"stack({N_PERMS}, {stack_args}) AS (perm, minhash)"
        ),
    ).select("doc_id", F.col("perm").cast("int"), "minhash")


_ORACLE_MINHASH_LONG = f"""
  SELECT doc_id, perm,
         MIN({oracle_portable_hash("perm::VARCHAR || ':' || shingle::VARCHAR")})
           AS minhash
  FROM ({_ORACLE_SHINGLES}) sh
  CROSS JOIN (SELECT unnest(range({N_PERMS}))::INT AS perm) p
  GROUP BY doc_id, perm
"""


def dd03_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _minhash_long(spark, sf_dir)


ORACLE_DD03 = f"SELECT doc_id, perm, minhash FROM ({_ORACLE_MINHASH_LONG})"


# --------------------------------------------------------------------------
# dd04 — LSH banding: band-bucket collisions → candidates → exact
# Jaccard verification on candidates only (the 100 TB path: the full
# pair space is never formed).
# --------------------------------------------------------------------------


def _lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band-bucket collision candidate pairs (doc_a < doc_b), shared by
    dd04 (exact-Jaccard verify) and dd10 (signature-estimate verify)."""
    wide = _minhash_wide(spark, sf_dir)
    rows_per_band = N_PERMS // N_BANDS
    # band buckets straight from the wide signature row — a projection
    # plus a 4-row explode per doc (post-reduce), not a second shuffle
    band_structs = [
        F.struct(
            F.lit(band).alias("band"),
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"h{band * rows_per_band + r}").cast(
                            "string"
                        )
                        for r in range(rows_per_band)
                    ],
                )
            ).alias("bucket"),
        )
        for band in range(N_BANDS)
    ]
    buckets = wide.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def dd04_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 14 (optimization): the verified pair product is
    session-persisted like dd02's — THREE inventory entries consume
    it wholesale (dd04 itself, dc02's eval split, pp04's loser drop;
    both of those docstrings already describe it as "the materialized
    near-dup pair table every prep job reads"), and each previously
    re-ran the candidate-verify join from the signature memos.
    Min-of-3 A/B at sf0.1: persisted 1.81 s vs plain 2.01 s for the
    build itself, and the two downstream consumers read ~256 cached
    rows instead of re-joining. (An earlier single-run reading blamed
    this persist for a 41 s pathology; that was host-side stall
    noise — the min-of-3 protocol is what these numbers require.)"""

    def build() -> DataFrame:
        candidates = _lsh_candidates(spark, sf_dir)
        # verify candidates with exact Jaccard over the FULL shingle
        # sets, restricted to the candidate set — the set sizes ride
        # along on the shingle rows (computed array-side, no extra
        # shuffle)
        sh = _shingles_cached(spark, sf_dir)
        sa = sh.select(
            F.col("doc_id").alias("doc_a"),
            F.col("n_sh").alias("n_a"),
            "shingle",
        )
        sb = sh.select(
            F.col("doc_id").alias("doc_b"),
            F.col("n_sh").alias("n_b"),
            "shingle",
        )
        inter = (
            candidates.join(sa, "doc_a")
            .join(sb, ["doc_b", "shingle"])
            .groupBy("doc_a", "n_a", "doc_b", "n_b")
            .agg(F.count("*").alias("n_inter"))
        )
        return (
            inter.withColumn(
                "jaccard",
                F.col("n_inter")
                / (
                    F.col("n_a") + F.col("n_b") - F.col("n_inter")
                ).cast("double"),
            )
            .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
            .select("doc_a", "doc_b", "jaccard")
        )

    return memo_df(spark, sf_dir, "minhash_lsh_pairs", build)


_ORACLE_LSH_CANDIDATES = f"""mh AS ({_ORACLE_MINHASH_LONG}),
buckets AS (
  SELECT doc_id, perm // {N_PERMS // N_BANDS} AS band,
         md5(string_agg(minhash::VARCHAR, ',' ORDER BY perm)) AS bucket
  FROM mh GROUP BY 1, 2
),
candidates AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buckets a JOIN buckets b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
)"""

ORACLE_DD04 = f"""
WITH {_ORACLE_LSH_CANDIDATES},
sh AS ({_ORACLE_SHINGLES}),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
  FROM candidates c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       n_inter / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_inter / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE)
      >= {JACCARD_THRESHOLD}
"""


# --------------------------------------------------------------------------
# dd05 — SimHash signatures (32-bit, token-frequency-weighted bit votes).
# --------------------------------------------------------------------------

SIMHASH_BITS = 32


def _simhash_sigs_build(
    spark: SparkSession, sf_dir: str, bits: int
) -> DataFrame:
    """SimHash signature pipeline parametrized by fingerprint width —
    ONE definition serving dd05 (32-bit) and dd12's 60-bit production
    knob, so a tokenization or vote-rule change can never apply to one
    width and not the other. All `bits` bit-tallies run in ONE
    aggregation (±1 votes as conditional sums) — no bits× crossJoin
    fan-out ahead of the shuffle; the final signature assembly is a
    pure projection on one row per doc."""
    docs = load(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    tokens = docs.repartition(par).select(
        "doc_id", F.explode(F.split("text", r"\s+")).alias("tok")
    ).where(F.length("tok") > 0)
    hashed = tokens.select(
        "doc_id", portable_hash(F.col("tok")).alias("h")
    )
    # round 14 (optimization): expressions built as SQL strings — the
    # previous Column-by-Column construction (bits× sum/when chains
    # plus a bits-deep addition tree) cost ~600 py4j round-trips of
    # pure driver latency per cold build (~0.8 s for 32 bits, ~1.5 s
    # for 60 — the ann03 r11 lesson). Identical expressions, one
    # parser call each / one for the signature assembly.
    tallies = hashed.groupBy("doc_id").agg(
        *[
            F.expr(
                f"sum(CASE WHEN ((h >> {b}) & 1) = 1"
                " THEN 1 ELSE -1 END)"
            ).alias(f"t{b}")
            for b in range(bits)
        ]
    )
    sig_sql = " + ".join(
        f"(CASE WHEN t{b} > 0 THEN CAST({1 << b} AS BIGINT)"
        " ELSE CAST(0 AS BIGINT) END)"
        for b in range(bits)
    )
    return tallies.select("doc_id", F.expr(sig_sql).alias("simhash"))


def _oracle_simhash_sigs(bits: int) -> str:
    """DuckDB twin of :func:`_simhash_sigs_build` (same width knob)."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS tok
  FROM documents
),
hashed AS (
  SELECT doc_id, {oracle_portable_hash('tok')} AS h
  FROM toks WHERE length(tok) > 0
),
votes AS (
  SELECT doc_id, bit,
         SUM(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS tally
  FROM hashed CROSS JOIN (SELECT unnest(range({bits}))::INT AS bit) b
  GROUP BY 1, 2
)
SELECT doc_id,
       CAST(SUM(CASE WHEN tally > 0 THEN (1::BIGINT << bit) ELSE 0 END)
            AS BIGINT) AS simhash
FROM votes GROUP BY 1
"""


def dd05_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    # persisted per session: dd08's banding re-reads the signatures
    return memo_df(
        spark,
        sf_dir,
        "simhash_sigs",
        lambda: _simhash_sigs_build(spark, sf_dir, SIMHASH_BITS),
    )


ORACLE_DD05 = _oracle_simhash_sigs(SIMHASH_BITS)


# --------------------------------------------------------------------------
# dd07 — embedding-cosine near-dup for DOCUMENTS via IVF-bucketed
# discovery: assign every vector to its N_PROBE nearest centroid cells
# (broadcast centroid matrix — |cells|×dim, tiny), then score all
# pairs WITHIN each cell in a numpy block (applyInPandas per cell) and
# keep pairs ≥ τ. The corpus shuffles exactly once (by cell, nprobe
# rows per vector); the quadratic pair space exists only inside each
# cell's executor-local block, never as shuffled rows, and never on
# the driver — this replaces round 1's full-corpus toPandas broadcast
# (the VERDICT's named scale-killer). At 100 TB, cell count grows with
# the corpus so per-cell block size stays constant; nprobe is the
# recall knob (multi-probe discovery is exact within probed cells, so
# the candidate set IS the verified result). Measured on the synthetic
# corpus (near-random embeddings, weak τ=0.4) against the exact
# quadratic verifier at sf0.01: nprobe 2→59%, 3→92%, 4→98%, 6→100%
# recall, cost linear in nprobe — dd07 runs at nprobe=4 (98% for 2×
# the probe rows; ann05's search keeps its own nprobe=2). Pairs
# sharing two probed cells are computed twice with bit-identical
# cosines (per-pair sequential dim order) — distinct() collapses
# them.
# --------------------------------------------------------------------------


DD07_NPROBE = 4  # 98% measured recall; see block comment above

# per-chunk vector budget for the blocked within-cell all-pairs: a
# chunk-pair block densifies at most (2·CHUNK)² cosines (~67 MB) —
# executor memory stays bounded no matter how large a cell grows.
# The sf5 scale run (100k vectors over the 10 label-cells) crashed
# the unblocked kernel at 40k vectors/cell (13 GB dense block); with
# chunking the same cells complete. At real scale BOTH knobs move:
# more IVF cells (centroid count grows with the corpus) AND this
# chunk guard for whatever skew remains.
DD07_CHUNK = 2048


def _max_cell_chunks(
    spark: SparkSession, sf_dir: str, assigned: DataFrame, key: str
) -> int:
    """Hash-chunk count sized by the LARGEST cell's population. An
    average-based count under-chunks skewed assignments — one dominant
    cell (routine for k-means on low-entropy data) would then be
    processed as a single dense block, re-creating the allocation the
    chunking exists to bound. The measurement is one tiny
    count-per-cell aggregation, memoized per session like the
    assignment itself."""

    def measure() -> int:
        row = (
            assigned.groupBy("cell")
            .count()
            .agg(F.max("count").alias("m"))
            .collect()[0]
        )
        return int(row["m"] or 0)

    from flink_streaming_platform_web_spark.operators._cache import memo_obj

    biggest = memo_obj(spark, sf_dir, key, measure)
    return max(1, -(-biggest // DD07_CHUNK))


def _blocked_cell_pairs(
    assigned: DataFrame, c: int, n_cells: "int | None" = None
) -> DataFrame:
    """Within-cell all-pairs ≥ τ over (vec_id, cell, v) rows, with the
    dense block bounded by hash-chunking — shared by dd07 (label-cell
    IVF) and dd11 (scaled k-means IVF).

    Blocked all-pairs: rows hash into c chunks per cell; each row
    joins every chunk-PAIR group (ci ≤ cj) containing its chunk, so
    group (ci, cj) holds both sides and a pair is computed in
    exactly one group — within-chunk pairs in (k, k), cross-chunk
    in (min, max). Fan-out is ×c rows (the price of bounding the
    dense block); compute totals are unchanged — the chunk layout
    partitions the pair space, so the output set is c-invariant.
    c == 1 degenerates to one group per cell.

    Round 10: when ``n_cells`` is known and small, c is ALSO raised
    to a parallelism floor (so n_cells·c(c+1)/2 group-blocks cover
    the cores) and the group exchange is pinned with a user-numbered
    repartition — AQE's byte-based coalescing saw the tiny shuffle
    and packed all blocks onto 1-2 tasks, serializing the python
    BLAS (the same lesson as the CEP chunked runner). At scale
    n_cells grows with the corpus (dd11's k-scaling), so the floor
    never fires there and c stays memory-bound."""
    import numpy as np
    import pandas as pd

    from flink_streaming_platform_web_spark.operators import similarity

    par = assigned.sparkSession.sparkContext.defaultParallelism
    if n_cells is not None and n_cells > 0:
        while c < 8 and n_cells * c * (c + 1) // 2 < par:
            c += 1
    chunked = assigned.withColumn(
        "chunk", F.pmod(F.xxhash64("vec_id"), F.lit(c)).cast("int")
    ).withColumn(
        "g",
        F.explode(
            F.expr(
                f"transform(sequence(0, {c - 1}), j ->"
                " struct(least(chunk, j) AS ci,"
                " greatest(chunk, j) AS cj))"
            )
        ),
    ).select("vec_id", "cell", "v", "chunk", "g.ci", "g.cj")

    def block(pdf: pd.DataFrame) -> pd.DataFrame:
        ci, cj = int(pdf["ci"].iat[0]), int(pdf["cj"].iat[0])
        if ci == cj:
            ids = pdf["vec_id"].to_numpy()
            V = np.stack(pdf["v"].to_numpy())
            cos = np.round(similarity._block_cosine(V, V), 6)
            ai, bi = np.nonzero(
                (ids[:, None] < ids[None, :])
                & (cos >= similarity.NEARDUP_COS)
            )
            return pd.DataFrame(
                {"id_a": ids[ai], "id_b": ids[bi], "cos_sim": cos[ai, bi]}
            )
        left = pdf[pdf["chunk"] == ci]
        right = pdf[pdf["chunk"] == cj]
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame(
                {"id_a": [], "id_b": [], "cos_sim": []}
            ).astype({"id_a": "int64", "id_b": "int64",
                      "cos_sim": "float64"})
        lids = left["vec_id"].to_numpy()
        rids = right["vec_id"].to_numpy()
        L = np.stack(left["v"].to_numpy())
        R = np.stack(right["v"].to_numpy())
        # _block_cosine is bitwise symmetric (per-dim scalar products
        # commute; accumulation order over dims is fixed), so emitting
        # min/max ids keeps multi-probe duplicates bit-identical for
        # the distinct() below
        cos = np.round(similarity._block_cosine(L, R), 6)
        ai, bi = np.nonzero(cos >= similarity.NEARDUP_COS)
        return pd.DataFrame(
            {
                "id_a": np.minimum(lids[ai], rids[bi]),
                "id_b": np.maximum(lids[ai], rids[bi]),
                "cos_sim": cos[ai, bi],
            }
        )

    return (
        chunked.repartition(par, "cell", "ci", "cj")
        .groupBy("cell", "ci", "cj")
        .applyInPandas(block, "id_a long, id_b long, cos_sim double")
        .distinct()
    )


def dd07_embed_neardup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs joined back to document metadata.

    Round 10 (late): discovery rides the SCALED k-means cells (the
    dd11 assignment — cell count grows with the corpus, per-cell
    population ≈ DD07_CHUNK) instead of the fixed per-label
    centroids. The label cells matched the comment's 100 TB posture
    ("centroid count grows with the corpus") only for dd11; dd07's
    own sf0.1→sf5 curve was superlinear (exp 1.07, in-cell work
    n²/|labels|). Same nprobe, same verify kernel, recall re-pinned
    by test_dd07_ivf_recall_vs_exact; the assignment/chunk memos are
    shared with dd11, so a pipeline running both pays the probe scan
    once."""
    pairs = _scaled_cell_pairs(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    da = docs.select(
        F.col("doc_id").alias("id_a"), F.col("lang").alias("lang_a")
    )
    db = docs.select(
        F.col("doc_id").alias("id_b"), F.col("lang").alias("lang_b")
    )
    return (
        pairs.join(da, "id_a")
        .join(db, "id_b")
        .select("id_a", "id_b", "cos_sim", "lang_a", "lang_b")
    )


def _oracle_dd07() -> str:
    """Same scaled-k-means replay as dd11's oracle (round 10 late:
    dd07 rides the dd11 cells), plus the document-metadata join."""
    from flink_streaming_platform_web_spark.operators.similarity import (
        NEARDUP_COS,
        _ORACLE_COS,
    )
    from flink_streaming_platform_web_spark.operators.vectors import (
        _oracle_km_prefix,
    )

    cosq = _ORACLE_COS.format(a="e.v", b="c.cv")
    cos = _ORACLE_COS.format(a="a.v", b="b.v")
    return f"""{_oracle_km_prefix()},
ranked AS (
  SELECT e.vec_id, e.v, c.cid AS cell,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY round({cosq}, 6) DESC, c.cid ASC) AS rn
  FROM e CROSS JOIN cent1 c
),
probes AS (SELECT vec_id, v, cell FROM ranked WHERE rn <= {DD07_NPROBE}),
pairs AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
         round({cos}, 6) AS cos_sim
  FROM probes a JOIN probes b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE round({cos}, 6) >= {NEARDUP_COS}
)
SELECT id_a, id_b, cos_sim, da.lang AS lang_a, db.lang AS lang_b
FROM pairs
JOIN documents da ON da.doc_id = id_a
JOIN documents db ON db.doc_id = id_b
"""


# --------------------------------------------------------------------------
# dd08 — SimHash near-dup PAIRS: byte-band pigeonhole. Split the
# 32-bit signature into 4 bytes; any pair within Hamming distance ≤ 3
# must agree on at least one byte (pigeonhole), so candidates come
# only from per-band byte-value collisions — dd04's LSH shape with
# Hamming verification (bit_count(xor)) instead of exact Jaccard.
# At 100 TB the band join is the only shuffle and each band's bucket
# fan-out is bounded by corpus/256 per byte value.
# --------------------------------------------------------------------------

SIMHASH_BANDS = 4
HAMMING_MAX = 3


def _banded_hamming_pairs(
    sigs: DataFrame, n_bands: int, band_w: int,
    bucket_cap: "int | None" = None,
) -> DataFrame:
    """Pigeonhole banding + exact Hamming verify over (doc_id,
    simhash) rows — ONE definition serving dd08 (32-bit sigs, 8-bit
    bands), dd12 (60-bit sigs, 15-bit bands) and mm08 (60-bit image
    aHash). Any pair within HAMMING_MAX differing bits must agree
    exactly on ≥1 band (pigeonhole: HAMMING_MAX < n_bands), so
    candidates are band-value collisions only; the verify is a
    per-candidate bit_count.

    ``bucket_cap`` (round 11, mm08): band-buckets holding more than
    this many members are DROPPED from candidate generation — the
    stop-shingle rule (dd02's MAX_DF) applied to LSH buckets. On
    hash distributions that cluster (mm08's low-contrast synthetic
    images), over-full buckets generate quadratic chance candidates;
    the cap bounds per-bucket work at the documented recall trade
    (a pair must now collide in some NON-crowded band). dd08/dd12
    keep the default None — their path is unchanged."""
    mask = (1 << band_w) - 1
    bands = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(
                            f"(simhash >> {band_w * b}) & {mask}"
                        ).alias("bandval"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.bandval")
    if bucket_cap is not None:
        ok_buckets = (
            bands.groupBy("band", "bandval")
            .count()
            .filter(F.col("count") <= bucket_cap)
            .select("band", "bandval")
        )
        bands = bands.join(ok_buckets, ["band", "bandval"])
    a = bands.alias("a")
    b = bands.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bandval") == F.col("b.bandval"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    return (
        candidates.withColumn(
            "hamming", F.expr("bit_count(sig_a ^ sig_b)")
        )
        .filter(F.col("hamming") <= HAMMING_MAX)
        .select("doc_a", "doc_b", "hamming")
    )


def _oracle_banded_pairs(
    sig_sql: str, n_bands: int, band_w: int,
    bucket_cap: "int | None" = None,
) -> str:
    """DuckDB twin of :func:`_banded_hamming_pairs`."""
    cap_filter = (
        f"""
bands AS (
  SELECT * FROM bands0
  QUALIFY COUNT(*) OVER (PARTITION BY band, bandval) <= {bucket_cap}
),"""
        if bucket_cap is not None
        else ""
    )
    bands_name = "bands0" if bucket_cap is not None else "bands"
    return f"""
WITH sigs AS ({sig_sql}),
{bands_name} AS (
  SELECT doc_id, simhash, band,
         (simhash >> ({band_w} * band)) & {(1 << band_w) - 1} AS bandval
  FROM sigs CROSS JOIN
       (SELECT unnest(range({n_bands}))::INT AS band) b
),{cap_filter}
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sig_a, b.simhash AS sig_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bandval = b.bandval
   AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, bit_count(xor(sig_a, sig_b)) AS hamming
FROM cand
WHERE bit_count(xor(sig_a, sig_b)) <= {HAMMING_MAX}
"""


def dd08_simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _banded_hamming_pairs(
        dd05_simhash_signatures(spark, sf_dir), SIMHASH_BANDS, 8
    )


ORACLE_DD08 = _oracle_banded_pairs(ORACLE_DD05, SIMHASH_BANDS, 8)


# --------------------------------------------------------------------------
# dd13 — exact Jaccard pairs via PREFIX FILTERING (Bayardo et al.,
# WWW'07 "Scaling Up All Pairs Similarity Search" / PPJoin): order
# shingles by global document frequency (rarest first), index only
# each doc's first |d| - ceil(θ·|d|) + 1 shingles. Any pair with
# J ≥ θ must share an overlap of ≥ θ·|d| elements, so skipping the
# prefix would leave too few shingles to reach it — RECALL IS
# GUARANTEED, unlike dd02's MAX_DF stop-shingle cap, which drops
# saturated shingles outright and measures 0 recall at sf ≥ 1 on the
# 31-word-vocabulary corpus (SCALE.md). Candidates verify with the
# exact per-doc shingle sets (array_intersect — no re-shingling).
# Scale shape: inverted-list length for a shingle is the number of
# docs carrying it IN-PREFIX (≈ |corpus|·prefix/|shingle-space|), so
# the candidate space shrinks by the prefix fraction squared versus a
# full inverted index; on open-vocabulary corpora rare shingles make
# the lists near-constant. This is the exact-recall point on the
# frontier whose approximate points are dd04 (MinHash-LSH) and dd12.
# --------------------------------------------------------------------------


def _doc_shingle_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id → (n_sh, distinct shingle-hash array) — the exact
    verification side. Round 14 (optimization): a pure projection of
    the session-cached DOC-ARRAY product. The previous build re-grouped
    the EXPLODED shingle rows (groupBy doc_id + collect_list — a full
    corpus-sized exchange plus its own persist) to reassemble arrays
    that `_shingle_arrs_cached` already holds per document; the
    array_sort it applied was also dead weight — the only consumer
    feeds `array_intersect(...)` into `size(...)`, which is
    order-insensitive. Zero-shingle docs now appear with an empty arr
    (the exploded form dropped them); dd13's candidates inner-join
    this side, and a candidate doc always has ≥1 prefix shingle, so
    the joined result is unchanged."""
    arrs = _shingle_arrs_cached(spark, sf_dir)
    return arrs.select(
        "doc_id", F.size("arr").alias("n_sh"), "arr"
    )


def dd13_jaccard_prefix_filter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window

    sh = _shingles_cached(spark, sf_dir)
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "shingle")
    ranked = (
        sh.join(dfreq, "shingle")
        .select("doc_id", "n_sh", "shingle", "df")
        .withColumn("rn", F.row_number().over(w))
    )
    prefix = ranked.filter(
        F.col("rn")
        <= F.col("n_sh")
        - F.ceil(F.lit(JACCARD_THRESHOLD) * F.col("n_sh"))
        + 1
    ).select("doc_id", "shingle")
    a = prefix.alias("a")
    b = prefix.alias("b")
    # NO distinct here: pairs sharing several prefix shingles appear
    # multiply, but measured dup factor is ~5% (430k → 409k at
    # sf0.1) — deduping the candidate stream costs a full
    # candidate-sized exchange to save 5% of the verify volume.
    # Verification is deterministic per pair, so duplicates collapse
    # in the FINAL distinct over the (tiny) surviving pair set —
    # replacing a 409k-row shuffle with a ~256-row one at sf0.1, and
    # at 100 TB removing the only candidate-cardinality exchange
    # between discovery and verify.
    cand = a.join(
        b,
        (F.col("a.shingle") == F.col("b.shingle"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
    )
    sets = _doc_shingle_arrays(spark, sf_dir)
    sa = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("n_sh").alias("n_a"),
        F.col("arr").alias("arr_a"),
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("n_sh").alias("n_b"),
        F.col("arr").alias("arr_b"),
    )
    verified = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "n_inter", F.size(F.array_intersect("arr_a", "arr_b"))
        )
        .withColumn(
            "jaccard",
            F.col("n_inter")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast(
                "double"
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
    return verified.select("doc_a", "doc_b", "jaccard").distinct()


ORACLE_DD13 = f"""
WITH sh AS ({_ORACLE_SHINGLES}),
dfreq AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY 1),
ranked AS (
  SELECT s.doc_id, s.n_sh, s.shingle,
         ROW_NUMBER() OVER (
           PARTITION BY s.doc_id
           ORDER BY d.df ASC, s.shingle ASC) AS rn
  FROM sh s JOIN dfreq d USING (shingle)
),
pref AS (
  SELECT doc_id, shingle FROM ranked
  WHERE rn <= n_sh - CEIL({JACCARD_THRESHOLD} * n_sh) + 1
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM pref a JOIN pref b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
),
sets AS (
  SELECT doc_id, any_value(n_sh) AS n_sh,
         list_sort(list(shingle)) AS arr
  FROM sh GROUP BY doc_id
),
inter AS (
  SELECT doc_a, doc_b, sa.n_sh AS n_a, sb.n_sh AS n_b,
         len(list_intersect(sa.arr, sb.arr)) AS ni
  FROM cand
  JOIN sets sa ON sa.doc_id = doc_a
  JOIN sets sb ON sb.doc_id = doc_b
)
SELECT doc_a, doc_b,
       ni / CAST(n_a + n_b - ni AS DOUBLE) AS jaccard
FROM inter
WHERE ni / CAST(n_a + n_b - ni AS DOUBLE) >= {JACCARD_THRESHOLD}
"""


# --------------------------------------------------------------------------
# dd12 — wide-fingerprint SimHash near-dup pairs: the saturation knob
# from SCALE.md made real. 32-bit SimHash saturates on low-entropy
# corpora (measured: the 31-word-vocabulary corpus drives dd08's
# verified pair count ~quadratic — 313M pairs at sf5, chance
# collisions, not near-dups). The production fix is a wider
# fingerprint; portable_hash already carries 60 bits (15 md5 hex
# chars — dd05 uses only the low 32), so the wide variant costs one
# wider tally agg and nothing else. Bands: 4 × 15 bits — the
# pigeonhole guarantee (Hamming ≤ 3 ⇒ ≥ 1 band equal) is identical
# to dd08's byte bands. Same plan shape: one tally shuffle, band
# self-join on (band, value), bit_count verify.
# --------------------------------------------------------------------------

SIMHASH60_BITS = 60  # full portable_hash width (15 hex chars)
SIMHASH60_BANDS = 4  # 15-bit bands: Hamming<=3 ⇒ >=1 band equal


def _simhash64_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return memo_df(
        spark,
        sf_dir,
        "simhash64_sigs",
        lambda: _simhash_sigs_build(spark, sf_dir, SIMHASH60_BITS),
    )


def dd12_simhash64_neardup_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _banded_hamming_pairs(
        _simhash64_sigs(spark, sf_dir),
        SIMHASH60_BANDS,
        SIMHASH60_BITS // SIMHASH60_BANDS,
    )


_ORACLE_SIMHASH60_SIGS = _oracle_simhash_sigs(SIMHASH60_BITS)

ORACLE_DD12 = _oracle_banded_pairs(
    _ORACLE_SIMHASH60_SIGS,
    SIMHASH60_BANDS,
    SIMHASH60_BITS // SIMHASH60_BANDS,
)


# --------------------------------------------------------------------------
# dd09 — chunk-level exact dedup (the paragraph/line-dedup algorithm of
# C4/RefinedWeb applied at fixed 10-token granularity, since the
# synthetic corpus has no newline structure): explode each document
# into consecutive token chunks, keep only the globally-FIRST
# occurrence of each distinct chunk (order: doc_id, then position),
# and reassemble the surviving text per document.
#
# Scale shape: one shuffle keyed by chunk content for the
# first-occurrence window (at 100 TB the key could be xxhash64(chunk)
# with the string kept only for in-partition verification), one
# map-side-combinable per-doc reassembly agg. The quadratic "compare
# all paragraphs" never exists — global dedup IS the group-by.
# --------------------------------------------------------------------------

DD09_CHUNK_TOKENS = 10


def dd09_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    n = DD09_CHUNK_TOKENS
    docs = load(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id",
        F.filter(
            F.split("text", r"\s+"), lambda t: F.length(t) > 0
        ).alias("toks"),
    ).filter(F.size("toks") > 0)
    chunks = toked.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, CAST(ceil(size(toks) / {n}.0) AS INT)"
                f" - 1), i -> array_join(slice(toks, i * {n} + 1, {n}), ' '))"
            )
        ).alias("chunk_idx", "chunk"),
    )
    w = Window.partitionBy("chunk").orderBy("doc_id", "chunk_idx")
    kept = (
        chunks.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_kept"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("chunk_idx", "chunk"))
                        ),
                        lambda s: s["chunk"],
                    ),
                    " ",
                )
            ).alias("dedup_md5"),
        )
    )
    totals = chunks.groupBy("doc_id").agg(F.count("*").alias("n_chunks"))
    return totals.join(kept, "doc_id", "left").select(
        "doc_id",
        "n_chunks",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("dedup_md5", F.md5(F.lit(""))).alias("dedup_md5"),
    )


ORACLE_DD09 = rf"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'),
                     x -> length(x) > 0) AS toks
  FROM documents
), c AS (
  SELECT doc_id, i AS chunk_idx,
         array_to_string(
           toks[(i * {DD09_CHUNK_TOKENS} + 1)
                :(i * {DD09_CHUNK_TOKENS} + {DD09_CHUNK_TOKENS})],
           ' ') AS chunk
  FROM t, LATERAL (
    SELECT unnest(range(0, CAST(ceil(len(toks) / {DD09_CHUNK_TOKENS}.0)
                              AS INT))) AS i)
  WHERE len(toks) > 0
), k AS (
  SELECT doc_id, chunk_idx, chunk,
         ROW_NUMBER() OVER (PARTITION BY chunk
                            ORDER BY doc_id, chunk_idx) AS rn
  FROM c
), agg_kept AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         md5(string_agg(chunk, ' ' ORDER BY chunk_idx)) AS dedup_md5
  FROM k WHERE rn = 1 GROUP BY doc_id
), agg_all AS (
  SELECT doc_id, COUNT(*) AS n_chunks FROM c GROUP BY doc_id
)
SELECT a.doc_id, a.n_chunks,
       COALESCE(n_kept, 0) AS n_kept,
       COALESCE(dedup_md5, md5('')) AS dedup_md5
FROM agg_all a LEFT JOIN agg_kept USING (doc_id)
"""


# --------------------------------------------------------------------------
# dd10 — MinHash Jaccard ESTIMATE on LSH candidates: the cheap verify
# tier. Where dd04 verifies band-bucket candidates with exact Jaccard
# over the full shingle sets (a corpus-sized join), dd10 verifies them
# from the signatures alone — agree_n/16 is an unbiased Jaccard
# estimator, and the verify cost is |candidates|×2 signature-row joins
# (signature table is |docs|×16 ints, ~1/50th the shingle table). At
# 100 TB this is the standard two-tier design: estimate-verify prunes
# the candidate list before the exact-verify tier touches shingles.
# est_jaccard = agree_n / 16.0 divides by a power of two — exact in
# IEEE, so the double is engine-portable without rounding.
# --------------------------------------------------------------------------


def dd10_minhash_est_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    candidates = _lsh_candidates(spark, sf_dir)
    wide = _minhash_wide(spark, sf_dir)
    wa = wide.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"h{p}").alias(f"a{p}") for p in range(N_PERMS)],
    )
    wb = wide.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"h{p}").alias(f"b{p}") for p in range(N_PERMS)],
    )
    agree = sum(
        F.when(F.col(f"a{p}") == F.col(f"b{p}"), 1).otherwise(0)
        for p in range(N_PERMS)
    )
    return (
        candidates.join(wa, "doc_a")
        .join(wb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            agree.cast("bigint").alias("agree_n"),
            (agree.cast("double") / F.lit(float(N_PERMS))).alias(
                "est_jaccard"
            ),
        )
    )


ORACLE_DD10 = f"""
WITH {_ORACLE_LSH_CANDIDATES},
agree AS (
  SELECT c.doc_a, c.doc_b,
         SUM(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END) AS agree_n
  FROM candidates c
  JOIN mh sa ON sa.doc_id = c.doc_a
  JOIN mh sb ON sb.doc_id = c.doc_b AND sb.perm = sa.perm
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, CAST(agree_n AS BIGINT) AS agree_n,
       CAST(agree_n AS DOUBLE) / {float(N_PERMS)} AS est_jaccard
FROM agree
"""


# --------------------------------------------------------------------------
# dd11 — embedding near-dup with a SCALED k-means quantizer: the
# "IVF cell count grows with the corpus" knob as real code. Centroids
# come from the SAME Lloyd's trainer vec01 oracle-gates
# (vectors.km_centroids), with k = max(KM_K, ceil(N·nprobe/CHUNK)) so
# per-cell population stays ≈ DD07_CHUNK regardless of corpus size —
# total discovery compute is O(N·nprobe·CHUNK), i.e. LINEAR in N,
# where dd07's fixed 10 label-cells are O(N²/10) (measured in
# SCALE.md's curves). The trade is recall: fewer probes over more,
# smaller cells see less of the space; measured against the exact
# ann02 kernel in tests and the scale runs. At sf ≤ 0.1 the scaling
# formula floors at k = KM_K, which is exactly what the DuckDB
# oracle replays (the unrolled-CTE trainer at KM_K) — the driver's
# gate runs at sf0.01 where the floor always holds.
# --------------------------------------------------------------------------

DD11_NPROBE = 4


def _scaled_cell_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verified near-dup pairs over the SCALED k-means cells —
    shared by dd11 (pairs as-is) and dd07 (pairs joined to document
    metadata). Cell count grows with the corpus so per-cell
    population stays ≈ DD07_CHUNK; the assignment and skew memos are
    keyed once, so both consumers pay the probe scan a single time
    per session."""
    from flink_streaming_platform_web_spark.operators import (
        similarity,
        vectors as vectors_mod,
    )
    from flink_streaming_platform_web_spark.operators._cache import memo_df
    from flink_streaming_platform_web_spark.operators.vectors import (
        KM_K,
        km_centroids,
    )

    vecs = similarity._vecs(spark, sf_dir)
    # corpus size rides the trainer sample — no count job until the
    # sample saturates (round 10)
    n_vecs = vectors_mod.corpus_size(spark, sf_dir)
    k = max(KM_K, -(-n_vecs * DD11_NPROBE // DD07_CHUNK))
    labels, C = km_centroids(spark, sf_dir, k)
    # persisted: the skew measurement below materializes the probe
    # assignment once and the pairs pass reuses it — without the memo
    # each pass re-ran the mapInPandas scoring over the whole corpus
    assigned = memo_df(
        spark,
        sf_dir,
        "dd11_assigned",
        lambda: similarity.cell_assign(
            spark, vecs, sf_dir, DD11_NPROBE, centroids=(labels, C)
        ),
    )
    c = _max_cell_chunks(spark, sf_dir, assigned, "dd11_max_cell")
    return _blocked_cell_pairs(assigned, c, n_cells=len(labels))


def dd11_embed_neardup_kmeans(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _scaled_cell_pairs(spark, sf_dir)


def _oracle_dd11() -> str:
    from flink_streaming_platform_web_spark.operators.similarity import (
        NEARDUP_COS,
        _ORACLE_COS,
    )
    from flink_streaming_platform_web_spark.operators.vectors import (
        _oracle_km_prefix,
    )

    cosq = _ORACLE_COS.format(a="e.v", b="c.cv")
    cos = _ORACLE_COS.format(a="a.v", b="b.v")
    return f"""{_oracle_km_prefix()},
ranked AS (
  SELECT e.vec_id, e.v, c.cid AS cell,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY round({cosq}, 6) DESC, c.cid ASC) AS rn
  FROM e CROSS JOIN cent1 c
),
probes AS (SELECT vec_id, v, cell FROM ranked WHERE rn <= {DD11_NPROBE}),
pairs AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
         round({cos}, 6) AS cos_sim
  FROM probes a JOIN probes b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE round({cos}, 6) >= {NEARDUP_COS}
)
SELECT id_a, id_b, cos_sim FROM pairs
"""


QUERIES = {
    "dd01_dedup_exact": dd01_dedup_exact,
    "dd11_embed_neardup_kmeans": dd11_embed_neardup_kmeans,
    "dd12_simhash64_neardup_pairs": dd12_simhash64_neardup_pairs,
    "dd13_jaccard_prefix_filter": dd13_jaccard_prefix_filter,
    "dd10_minhash_est_jaccard": dd10_minhash_est_jaccard,
    "dd09_chunk_dedup": dd09_chunk_dedup,
    "dd08_simhash_neardup_pairs": dd08_simhash_neardup_pairs,
    "dd07_embed_neardup_docs": dd07_embed_neardup_docs,
    "dd02_ngram_jaccard_pairs": dd02_ngram_jaccard_pairs,
    "dd03_minhash_signatures": dd03_minhash_signatures,
    "dd04_minhash_lsh_pairs": dd04_minhash_lsh_pairs,
    "dd05_simhash_signatures": dd05_simhash_signatures,
}

ORACLES = {
    "dd01_dedup_exact": ORACLE_DD01,
    "dd11_embed_neardup_kmeans": _oracle_dd11(),
    "dd12_simhash64_neardup_pairs": ORACLE_DD12,
    "dd13_jaccard_prefix_filter": ORACLE_DD13,
    "dd10_minhash_est_jaccard": ORACLE_DD10,
    "dd09_chunk_dedup": ORACLE_DD09,
    "dd08_simhash_neardup_pairs": ORACLE_DD08,
    "dd07_embed_neardup_docs": _oracle_dd07(),
    "dd02_ngram_jaccard_pairs": ORACLE_DD02,
    "dd03_minhash_signatures": ORACLE_DD03,
    "dd04_minhash_lsh_pairs": ORACLE_DD04,
    "dd05_simhash_signatures": ORACLE_DD05,
}


# --------------------------------------------------------------------------
# dd14 — exact-substring duplication profile (sliding token windows).
# --------------------------------------------------------------------------

DD14_W = 10  # window width in tokens (ExactSubstr-style granularity)


def _dd14_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, w) token arrays, spread across cores — the
    shared scan head of the ExactSubstr family (dd14's profile and
    dd16's removal accounting)."""
    par = spark.sparkContext.defaultParallelism
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "source", F.split(F.col("text"), r"\s+").alias("w")
    ).repartition(par)


def _dd14_win_idxs(w) -> Column:
    """Window-start index array for a token array (empty when the doc
    is shorter than one window — sequence(0, -1) would descend)."""
    return F.when(
        F.size(w) >= DD14_W,
        F.sequence(F.lit(0), F.size(w) - DD14_W),
    ).otherwise(F.array().cast("array<int>"))


def _dd14_win_hash(w, i) -> Column:
    """60-bit portable hash of the 10-token window starting at i."""
    return portable_hash(
        F.concat_ws(" ", *[w[i + j] for j in range(DD14_W)])
    )


def _dd14_agg1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (win, source, occ, nd) occurrence table — the
    session-memoized shared product of the ExactSubstr family (at
    100 TB: a materialized intermediate), built with ONE corpus-sized
    wide shuffle (windows travel as 60-bit portable hashes, 8-byte
    keys, never strings). Two CHAINED aggregates instead of count +
    countDistinct in one: the distinct aggregate planned an Expand
    (2 rows per occurrence feeding the aggregate — the r11 verdict's
    "fold the distinct-expand into the first exchange's partial
    aggregate", round 12). Both groupBys AND every downstream
    win-keyed roll-up ride HashPartitioning(win) (subset rule), so
    the exchange count stays at ONE; nd = the number of
    (win, source, doc_id) groups = COUNT(DISTINCT doc_id) exactly."""
    par = spark.sparkContext.defaultParallelism
    words = _dd14_words(spark, sf_dir)
    w = F.col("w")
    wins = words.select(
        "doc_id",
        "source",
        F.explode_outer(
            F.transform(
                _dd14_win_idxs(w), lambda i: _dd14_win_hash(w, i)
            )
        ).alias("win"),
    ).where(F.col("win").isNotNull())
    return memo_df(
        spark,
        sf_dir,
        "dd14_agg1",
        lambda: wins.repartition(par, "win")
        .groupBy("win", "source", "doc_id")
        .agg(F.count("*").alias("c"))
        .groupBy("win", "source")
        .agg(
            F.sum("c").alias("occ"),
            F.count("*").alias("nd"),
        ),
    )


def dd14_exact_substr_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-substring duplication profile: slide a
    10-token window over every document (every OCCURRENCE counts, not
    distinct — this measures how much of the corpus text is verbatim
    repetition, the measure behind suffix-array ExactSubstr dedup in
    "Deduplicating Training Data Makes Language Models Better", Lee et
    al. 2022, arXiv:2107.06499); a window is *duplicated* when it
    occurs in more than one distinct document.

    Plan: the corpus is scanned ONCE — the (window, source)
    occurrence table (:func:`_dd14_agg1`) is the session-memoized
    shared product. Both downstream branches read the persisted agg1:
    the per-window roll-up (per-(win,source) distinct-doc counts SUM
    to the global per-window doc count because a document has exactly
    one source — no join back to the corpus), and the
    |sources|-sized finals. There is no pair-space and no driver
    state."""
    agg1 = _dd14_agg1(spark, sf_dir)
    # per_win rides agg1's persisted win-partitioning (no exchange);
    # the four per-source measures then come out of ONE conditional
    # aggregation over the re-exploded rows — the r10 plan computed
    # dup and totals as separate branches over agg1 and joined them
    # (two extra stages + a join for numbers one groupBy can carry)
    per_win = agg1.groupBy("win").agg(
        F.sum("nd").alias("ndocs"),
        F.collect_list(F.struct("source", "occ")).alias("by_src"),
    )
    is_dup = F.col("ndocs") > 1
    return (
        per_win.select("ndocs", F.explode("by_src").alias("e"))
        .groupBy(F.col("e.source").alias("source"))
        .agg(
            F.sum("e.occ").alias("n_windows"),
            F.count("*").alias("n_distinct_windows"),
            F.sum(F.when(is_dup, F.col("e.occ")).otherwise(0)).alias(
                "n_dup_occ"
            ),
            F.sum(is_dup.cast("long")).alias("n_dup_windows"),
        )
    )


def _oracle_dd14() -> str:
    cat = " || ' ' || ".join(f"w[i+{j}]" for j in range(DD14_W))
    return f"""
WITH t AS (SELECT doc_id, source,
                  regexp_split_to_array(text, '\\s+') AS w
           FROM documents),
wins AS (
  SELECT doc_id, source,
         unnest(list_transform(
           generate_series(1, greatest(len(w) - {DD14_W - 1}, 0)),
           i -> {oracle_portable_hash(f"({cat})")})) AS win
  FROM t),
agg1 AS (
  SELECT win, source, COUNT(*) AS occ,
         COUNT(DISTINCT doc_id) AS nd
  FROM wins GROUP BY 1, 2),
per_win AS (SELECT win, SUM(nd) AS ndocs FROM agg1 GROUP BY 1),
dup AS (
  SELECT a.source, CAST(SUM(a.occ) AS BIGINT) AS n_dup_occ,
         COUNT(*) AS n_dup_windows
  FROM agg1 a JOIN per_win p USING (win)
  WHERE p.ndocs > 1 GROUP BY 1),
tot AS (
  SELECT source, CAST(SUM(occ) AS BIGINT) AS n_windows,
         COUNT(*) AS n_distinct_windows
  FROM agg1 GROUP BY 1)
SELECT t.source, t.n_windows, t.n_distinct_windows,
       COALESCE(d.n_dup_occ, 0) AS n_dup_occ,
       COALESCE(d.n_dup_windows, 0) AS n_dup_windows
FROM tot t LEFT JOIN dup d USING (source)
"""


QUERIES["dd14_exact_substr_dup"] = dd14_exact_substr_dup
ORACLES["dd14_exact_substr_dup"] = _oracle_dd14()


# --------------------------------------------------------------------------
# dd16 — exact-substring REMOVAL accounting (the acting half of the
# Lee et al. 2022 ExactSubstr pass: dd14 measures duplication, dd16
# reports what removal would delete per document).
# --------------------------------------------------------------------------


def dd16_exact_substr_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document removal report for ExactSubstr dedup: a token is
    removable when it is covered by at least one duplicated 10-token
    window (a window occurring in >1 distinct document — dd14's
    definition). Emits docs with >=1 duplicated window: total tokens,
    duplicated-window count, and the EXACT size of the union of their
    [start, start+10) spans.

    Plan (100 TB shape): the duplicated-window set comes from the
    session-memoized :func:`_dd14_agg1` product (one roll-up on its
    existing win partitioning — no new corpus exchange); the corpus
    re-explodes to (doc, start, win) occurrence rows ONCE and joins
    the dup set on the 8-byte win key (shuffle join — the dup set is
    corpus-scaled, so no broadcast). The span-union size needs NO
    position explode: with per-doc window starts sorted, the union of
    fixed-width intervals is sum(min(W, next_start - start)) with W
    for each run's last window — one LAG/LEAD window pass over the
    HIT rows only (gaps-and-islands arithmetic, the q47-family
    shape), never 10x position rows."""
    from pyspark.sql.window import Window

    W = DD14_W
    words = _dd14_words(spark, sf_dir)
    w = F.col("w")
    wins = (
        words.select(
            "doc_id",
            F.size("w").alias("n_tokens"),
            F.explode_outer(
                F.transform(
                    _dd14_win_idxs(w),
                    lambda i: F.struct(
                        i.alias("start"),
                        _dd14_win_hash(w, i).alias("win"),
                    ),
                )
            ).alias("e"),
        )
        .where(F.col("e").isNotNull())
        .select(
            "doc_id",
            "n_tokens",
            F.col("e.start").alias("start"),
            F.col("e.win").alias("win"),
        )
    )
    agg1 = _dd14_agg1(spark, sf_dir)
    dup = (
        agg1.groupBy("win")
        .agg(F.sum("nd").alias("ndocs"))
        .where(F.col("ndocs") > 1)
        .select("win")
    )
    hits = wins.join(dup, "win")
    nxt = F.lead("start").over(
        Window.partitionBy("doc_id").orderBy("start")
    )
    contrib = F.when(
        nxt.isNotNull(), F.least(F.lit(W), nxt - F.col("start"))
    ).otherwise(F.lit(W))
    return (
        hits.select(
            "doc_id", "n_tokens", contrib.alias("contrib")
        )
        .groupBy("doc_id")
        .agg(
            F.max("n_tokens").cast("bigint").alias("n_tokens"),
            F.count("*").alias("n_dup_windows"),
            F.sum("contrib").cast("bigint").alias("n_removed_tokens"),
        )
    )


def _oracle_dd16() -> str:
    cat = " || ' ' || ".join(f"w[i+{j}]" for j in range(DD14_W))
    return f"""
WITH t AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS w
           FROM documents),
wins AS (
  SELECT doc_id, len(w) AS n_tokens, i AS start,
         {oracle_portable_hash(f"({cat})")} AS win
  FROM t, UNNEST(generate_series(1, greatest(len(w) - {DD14_W - 1}, 0)))
       AS u(i)),
dup AS (
  SELECT win FROM (
    SELECT win, COUNT(DISTINCT doc_id) AS ndocs FROM wins GROUP BY 1
  ) WHERE ndocs > 1),
hits AS (SELECT doc_id, n_tokens, start FROM wins JOIN dup USING (win)),
merged AS (
  SELECT doc_id, n_tokens,
         COALESCE(LEAST({DD14_W}, LEAD(start) OVER w2 - start),
                  {DD14_W}) AS contrib
  FROM hits WINDOW w2 AS (PARTITION BY doc_id ORDER BY start))
SELECT doc_id, CAST(MAX(n_tokens) AS BIGINT) AS n_tokens,
       COUNT(*) AS n_dup_windows,
       CAST(SUM(contrib) AS BIGINT) AS n_removed_tokens
FROM merged GROUP BY doc_id
"""


QUERIES["dd16_exact_substr_removal"] = dd16_exact_substr_removal
ORACLES["dd16_exact_substr_removal"] = _oracle_dd16()
