"""Composed training-data pipeline: the end-to-end preprocessing job a
corpus actually runs, wired from the individually-gated stages —

    quality filter (tx10)  →  exact dedup (dd01's shape)  →
    stratified sample (tx08's shape)  →  mix accounting

pp01 exists to prove the stages COMPOSE: each is oracle-gated alone,
and the composition is oracle-gated as one query (the oracle nests the
tx10 oracle verbatim as a subquery, then mirrors dedup + sample +
roll-up CTE by CTE).

Scale shape (the point at 100 TB): every stage is a scan-bound filter
or a digest-keyed aggregation —
- the keep-list joins back as LEFT SEMI on doc_id (no row widening,
  no dedup of the probe side needed);
- exact dedup groups by md5(text) and keeps min(doc_id) — one shuffle
  keyed by digest, the canonical job;
- survivor selection is a second LEFT SEMI on doc_id;
- the sample is a pure per-row predicate on a salted portable hash
  (zero state, reproducible, pushes to the scan);
- the final per-(lang, source) roll-up is map-side combinable and
  stratum-sized.
Nothing in the pipeline materializes doc text anywhere but the digest
computation; the driver holds nothing.

Reference parity note: the reference platform has no data-pipeline
surface (it routes Flink SQL); this composition is the mandated
training-data extension exercised end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_platform_web_spark.operators.text import (
    ORACLE_TX10,
    stratified_keep,
    stratified_keep_where,
    tx10_quality_filter,
)
from flink_streaming_platform_web_spark.tables import load


def pp01_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    keep_ids = (
        tx10_quality_filter(spark, sf_dir)
        .filter(F.col("keep"))
        .select("doc_id")
    )
    kept = docs.join(keep_ids, "doc_id", "left_semi")
    survivors = kept.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    deduped = kept.join(survivors.select("doc_id"), "doc_id", "left_semi")
    _, keep = stratified_keep("pp01")
    final = deduped.filter(keep)
    return final.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


def _oracle_pp01() -> str:
    where = stratified_keep_where("pp01")
    return f"""
WITH flt AS (
  SELECT doc_id FROM ({ORACLE_TX10}) WHERE keep
),
kept AS (
  SELECT d.* FROM documents d JOIN flt USING (doc_id)
),
surv AS (
  SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY md5(text)
),
deduped AS (
  SELECT k.* FROM kept k JOIN surv USING (doc_id)
),
final AS (
  SELECT * FROM deduped WHERE {where}
)
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM final GROUP BY lang, source
"""


ORACLE_PP01 = _oracle_pp01()

QUERIES = {"pp01_training_mix": pp01_training_mix}
ORACLES = {"pp01_training_mix": ORACLE_PP01}
