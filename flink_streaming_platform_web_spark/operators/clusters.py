"""Duplicate-cluster assignment: connected components over the
near-dup pair graph (dd02's output) by iterative minimum-label
propagation.

This is the step real dedup pipelines run after pair generation —
pairs don't dedupe anything until they're folded into clusters with
one survivor per cluster. The Spark implementation is the classic
distributed label propagation: every node starts as its own label;
each round, every node takes the min of its own and its neighbors'
labels; fixpoint in O(component diameter) rounds. All data stays
distributed (joins + groupBy per round, one scalar `count()` action
for the convergence check); at 100 TB scale the same loop runs with
the large-star/small-star optimization — the shape is identical.

The oracle replays reachability with a recursive CTE (components here
are tiny near-dup groups, so transitive closure is cheap for DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_platform_web_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    MAX_DF,
    ORACLE_DD02,
    dd02_ngram_jaccard_pairs,
)
from flink_streaming_platform_web_spark.tables import load

MAX_ITERATIONS = 20


def connected_components(
    nodes: DataFrame, edges: DataFrame, node_col: str = "id"
) -> DataFrame:
    """(nodes[id], edges[src,dst]) → (id, component) with component =
    min node id reachable."""
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = nodes.select(
        F.col(node_col).alias("id"), F.col(node_col).alias("label")
    ).persist()
    for _ in range(MAX_ITERATIONS):
        neighbor_min = (
            sym.join(labels, sym.src == labels.id)
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.dst, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", "label")
                ).alias("label"),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    return labels.select("id", F.col("label").alias("component"))


def dd06_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id")
    pairs = dd02_ngram_jaccard_pairs(spark, sf_dir)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    cc = connected_components(docs, edges, "doc_id")
    return cc.select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("id") != F.col("component")).cast("int").alias("is_duplicate"),
    )


ORACLE_DD06 = f"""
WITH RECURSIVE pairs AS ({ORACLE_DD02}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT doc_id AS a, doc_id AS b FROM documents
  UNION
  SELECT src, dst FROM edges
  UNION
  SELECT r.a, e.dst
  FROM reach r JOIN edges e ON r.b = e.src
)
SELECT a AS doc_id, MIN(b) AS cluster_id,
       CAST(a != MIN(b) AS INT) AS is_duplicate
FROM reach GROUP BY a
"""


QUERIES = {"dd06_dup_clusters": dd06_dup_clusters}
ORACLES = {"dd06_dup_clusters": ORACLE_DD06}
