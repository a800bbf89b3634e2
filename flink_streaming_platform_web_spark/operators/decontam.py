"""Benchmark decontamination: flag training documents that overlap an
evaluation set by word-n-gram collision — the check every LLM corpus
runs before training (GPT-3 App. C / Llama-2 A.6 style: a train doc is
contaminated when a large fraction of its n-grams also appear in any
eval document).

Scale shape (the one that matters at 100 TB):

- the EVAL side is tiny by construction (benchmarks are a few MB even
  when the corpus is 100 TB), so its distinct-shingle union fits in a
  broadcast — the corpus never shuffles for the membership probe;
- the TRAIN side reuses the per-session shingle product
  (dedup._shingles_cached — at scale, a materialized intermediate
  table shared with the MinHash/Jaccard dedup family), already carried
  as 8-byte portable hashes;
- the probe is `train ⋈ broadcast(eval_shingles)` — a broadcast hash
  join evaluated at scan speed, emitting only COLLIDING shingle rows
  (rare against a real eval set);
- the per-doc collision count is a map-side-combinable aggregation
  over those collision rows only.

The eval split here is a deterministic 5% slice of `documents`
(doc_id % 20 = 7) standing in for an externally-supplied benchmark
table; swapping in a real eval table changes one line.

Reference parity note: the reference platform (flink-streaming-
platform-web) has no decontamination surface; this is part of the
mandated training-data-pipeline extension, built on the same shingle
infrastructure as dd02-dd04.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_platform_web_spark.operators._cache import memo_df
from flink_streaming_platform_web_spark.operators.dedup import (
    _ORACLE_SHINGLES,
    _shingles_cached,
)

# A train doc is contaminated when at least half its distinct shingles
# appear in the eval union. 50% is deliberately high for the synthetic
# 31-word vocabulary (random 3-grams collide often); real deployments
# with 8/13-grams use "any collision" — the knob is this one constant.
_NUM, _DEN = 1, 2


def dc01_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-train-doc eval-overlap report: distinct-shingle count,
    collision count against the eval union, and the contaminated flag
    at overlap >= 1/2 (integer arithmetic — no float in the gate)."""

    def build() -> DataFrame:
        sh = _shingles_cached(spark, sf_dir)
        is_eval = F.col("doc_id") % 20 == 7
        eval_sh = sh.filter(is_eval).select("shingle").distinct()
        train = sh.filter(~is_eval)
        hits = (
            train.join(F.broadcast(eval_sh), "shingle")
            .groupBy("doc_id", "n_sh")
            .agg(F.count("*").alias("n_shared"))
        )
        return hits.select(
            "doc_id",
            F.col("n_sh").cast("bigint").alias("n_sh"),
            F.col("n_shared").cast("bigint").alias("n_shared"),
            (F.col("n_shared") * _DEN >= F.col("n_sh") * _NUM).alias(
                "contaminated"
            ),
        )

    return memo_df(spark, sf_dir, "dc01_contamination", build)


ORACLE_DC01 = f"""
WITH sh AS ({_ORACLE_SHINGLES}),
eval_sh AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id % 20 = 7
),
train AS (
  SELECT * FROM sh WHERE doc_id % 20 <> 7
),
hits AS (
  SELECT t.doc_id, t.n_sh, COUNT(*) AS n_shared
  FROM train t JOIN eval_sh USING (shingle)
  GROUP BY t.doc_id, t.n_sh
)
SELECT doc_id,
       CAST(n_sh AS BIGINT) AS n_sh,
       CAST(n_shared AS BIGINT) AS n_shared,
       (n_shared * {_DEN} >= n_sh * {_NUM}) AS contaminated
FROM hits
"""

def dc02_fuzzy_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUZZY decontamination: a train doc is contaminated when it is a
    verified NEAR-DUPLICATE (exact Jaccard ≥ the dedup threshold,
    discovered via MinHash-LSH banding) of any eval doc — the
    paraphrase/near-copy leakage the exact n-gram check (dc01) misses.

    Scale shape: REUSES dd04's discovery product wholesale (the same
    session-shared MinHash signatures, band buckets, and
    candidate-verify join the dedup pass already ran) and merely
    splits the verified pair table by the eval predicate — zero new
    corpus-sized stages; the cross-split roll-up is pair-table-sized.
    This is exactly how production pipelines piggyback fuzzy
    decontamination on the dedup pass's LSH index."""

    def build() -> DataFrame:
        from flink_streaming_platform_web_spark.operators.dedup import (
            dd04_minhash_lsh_pairs,
        )

        pairs = dd04_minhash_lsh_pairs(spark, sf_dir)
        a_eval = F.col("doc_a") % 20 == 7
        b_eval = F.col("doc_b") % 20 == 7
        cross = pairs.filter(a_eval != b_eval).select(
            F.when(a_eval, F.col("doc_b"))
            .otherwise(F.col("doc_a"))
            .alias("doc_id"),
            "jaccard",
        )
        return cross.groupBy("doc_id").agg(
            F.count("*").alias("n_eval_matches"),
            F.max("jaccard").alias("max_jaccard"),
        )

    return memo_df(spark, sf_dir, "dc02_fuzzy_contamination", build)


def _oracle_dc02() -> str:
    from flink_streaming_platform_web_spark.operators.dedup import (
        ORACLE_DD04,
    )

    return f"""
WITH pairs AS ({ORACLE_DD04}),
crossed AS (
  SELECT CASE WHEN doc_a % 20 = 7 THEN doc_b ELSE doc_a END AS doc_id,
         jaccard
  FROM pairs
  WHERE (doc_a % 20 = 7) <> (doc_b % 20 = 7)
)
SELECT doc_id, COUNT(*) AS n_eval_matches, MAX(jaccard) AS max_jaccard
FROM crossed GROUP BY doc_id
"""


ORACLE_DC02 = _oracle_dc02()

QUERIES = {
    "dc01_contamination": dc01_contamination,
    "dc02_fuzzy_contamination": dc02_fuzzy_contamination,
}
ORACLES = {
    "dc01_contamination": ORACLE_DC01,
    "dc02_fuzzy_contamination": ORACLE_DC02,
}
