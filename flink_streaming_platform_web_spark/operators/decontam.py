"""Benchmark decontamination: flag training documents that overlap an
evaluation set by word-n-gram collision — the check every LLM corpus
runs before training (GPT-3 App. C / Llama-2 A.6 style: a train doc is
contaminated when a large fraction of its n-grams also appear in any
eval document).

Scale shape (the one that matters at 100 TB):

- the EVAL side is tiny by construction (benchmarks are a few MB even
  when the corpus is 100 TB), so its distinct-shingle union fits in a
  broadcast — the corpus never shuffles for the membership probe;
- the TRAIN side reuses the per-session doc-level shingle-set product
  (dedup._shingle_arrs_cached — at scale, a materialized intermediate
  table built by the same scan as the dedup family's shingle rows),
  already carried as 8-byte portable hashes;
- the probe is a scan-speed Arrow-batched membership count against the
  broadcast eval union — the corpus never explodes to shingle rows and
  never shuffles for this query (round 11; was a broadcast join + two
  aggregation phases over exploded rows).

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
    _shingle_arrs_cached,
)

# A train doc is contaminated when at least half its distinct shingles
# appear in the eval union. 50% is deliberately high for the synthetic
# 31-word vocabulary (random 3-grams collide often); real deployments
# with 8/13-grams use "any collision" — the knob is this one constant.
_NUM, _DEN = 1, 2


def dc01_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-train-doc eval-overlap report: distinct-shingle count,
    collision count against the eval union, and the contaminated flag
    at overlap >= 1/2 (integer arithmetic — no float in the gate).

    Round 11 (VERDICT r10 item 4): the probe runs at the DOC-ARRAY
    level — the eval union (tiny by contract: benchmarks are a few MB
    at any corpus size) is collected once as a sorted int64 vector and
    broadcast into an Arrow-batched kernel that counts per-doc
    membership with one searchsorted over the batch's flattened
    shingle arrays. The train corpus is never exploded to shingle
    ROWS and never shuffles at all for this query (the r10 shape paid
    an explode + broadcast-join + two-phase groupBy — four stages of
    scheduler floor for a membership count). Counts are exact set
    intersections, identical to the join formulation."""

    def build() -> DataFrame:
        import numpy as np
        import pandas as pd

        arrs = _shingle_arrs_cached(spark, sf_dir)
        is_eval = F.col("doc_id") % 20 == 7
        # reduce DISTRIBUTIVELY first, collect only the deduped union
        # (ADVICE r11): collecting whole eval arrays made driver bytes
        # scale with the eval slice INCLUDING cross-doc duplicate
        # shingles; explode+distinct dedups executor-side so the
        # driver holds exactly the union the probe broadcasts anyway.
        # The extra exchange belongs to this build-side job only — the
        # returned probe plan stays zero-join / zero-hash-exchange
        # (plan-gated in test_plans.py)
        # explode_outer + null filter: plain explode's inferred
        # size(arr) > 0 filter can re-inline the shingle expression
        # below the exchange when the upstream is not yet cached
        # (dedup._shingles' documented trap; st25 re-hit it round 12)
        ev_pdf = (
            arrs.filter(is_eval)
            .select(F.explode_outer("arr").alias("s"))
            .where(F.col("s").isNotNull())
            .distinct()
            .toPandas()
        )
        ev = np.sort(ev_pdf["s"].to_numpy(np.int64))
        bc = spark.sparkContext.broadcast(ev)

        def probe(batches):
            evs = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                arrs_l = pdf["arr"].to_list()
                lens = np.array([len(a) for a in arrs_l], dtype=np.int64)
                flat = (
                    np.concatenate(arrs_l).astype(np.int64)
                    if lens.sum()
                    else np.array([], dtype=np.int64)
                )
                idx = np.searchsorted(evs, flat)
                idx_c = np.minimum(idx, max(len(evs) - 1, 0))
                hit = (
                    (idx < len(evs)) & (evs[idx_c] == flat)
                    if len(evs)
                    else np.zeros(len(flat), dtype=bool)
                )
                seg = np.repeat(np.arange(len(pdf)), lens)
                n_shared = np.bincount(
                    seg[hit], minlength=len(pdf)
                ).astype(np.int64)
                out = pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"].to_numpy(np.int64),
                        "n_sh": lens,
                        "n_shared": n_shared,
                        "contaminated": n_shared * _DEN >= lens * _NUM,
                    }
                )
                # the join formulation emits only docs with >=1 hit
                yield out[out["n_shared"] > 0]

        return arrs.filter(~is_eval).mapInPandas(
            probe,
            "doc_id long, n_sh bigint, n_shared bigint,"
            " contaminated boolean",
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
