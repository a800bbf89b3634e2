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


# Tokens-per-shard budget. Small against the synthetic docs (~30
# whitespace tokens each) so every SF produces several shards per
# source; production sets this to the trainer's sequence length × rows
# per shard.
PACK_BUDGET = 512


def pp02_shard_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard packing (concat-and-chunk): within each source,
    documents are laid out in doc_id order and cut into shards of
    ~PACK_BUDGET tokens — the standard sequence-packing layout step
    before tokenized corpus serialization. A doc belongs to the shard
    where its first token lands (shard = tokens-before-me DIV budget),
    so the assignment is a pure window cumsum: deterministic,
    order-stable, no greedy driver loop.

    Scale shape: ONE shuffle keyed by the pack partition (source), then
    the window cumsum runs sorted within each partition and the shard
    roll-up is map-side combinable. Skew knob at 100 TB: a dominant
    source serializes its own window — production packs per
    (source, hash-bucket) and offsets shard ids per bucket, same plan
    shape with B× the parallelism; the synthetic corpus' sources are
    balanced so the direct form is the honest benchmark."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.size(
            F.filter(F.split("text", r"\s+"), lambda t: F.length(t) > 0)
        ).alias("tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = toks.withColumn(
        "tokens_before", F.coalesce(F.sum("tokens").over(w), F.lit(0))
    ).withColumn(
        "shard_id", F.expr(f"tokens_before DIV {PACK_BUDGET}")
    )
    return packed.groupBy("source", "shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("tokens").cast("bigint").alias("shard_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


ORACLE_PP02 = f"""
WITH toks AS (
  SELECT doc_id, source,
         length(list_filter(regexp_split_to_array(text, '\\s+'),
                            t -> length(t) > 0)) AS tokens
  FROM documents
), packed AS (
  SELECT doc_id, source, tokens,
         COALESCE(SUM(tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS tokens_before
  FROM toks
)
SELECT source,
       CAST(tokens_before // {PACK_BUDGET} AS BIGINT) AS shard_id,
       COUNT(*) AS n_docs,
       CAST(SUM(tokens) AS BIGINT) AS shard_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM packed
GROUP BY source, shard_id
"""

QUERIES = {
    "pp01_training_mix": pp01_training_mix,
    "pp02_shard_packing": pp02_shard_packing,
}
ORACLES = {
    "pp01_training_mix": ORACLE_PP01,
    "pp02_shard_packing": ORACLE_PP02,
}
