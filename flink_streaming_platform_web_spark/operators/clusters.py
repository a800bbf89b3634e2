"""Duplicate-cluster assignment: connected components over the
near-dup pair graph (dd02's output) by alternating large-star /
small-star contraction (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14 — the published MapReduce-native
algorithm; no reference-repo analog, the reference delegates all
relational work to Flink SQL which has no CC operator).

This is the step real dedup pipelines run after pair generation —
pairs don't dedupe anything until they're folded into clusters with
one survivor per cluster. Two properties make this the 100 TB shape:

- **The loop never touches the corpus.** Only edge-endpoint nodes
  (bounded by 2×|pairs|) enter the iteration; the full document set
  is joined back exactly once at the end (isolated docs are their own
  component by construction). At training-data scale the pair graph
  is orders of magnitude smaller than the corpus.
- **O(log d) rounds, not O(d).** Each large-star/small-star round
  halves component height, so long chains converge exponentially
  faster than min-label propagation; each round is one groupBy
  (map-side combinable) + explode, all distributed, one `count()`
  action for the convergence check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_platform_web_spark.operators.dedup import (
    ORACLE_DD02,
    dd02_ngram_jaccard_pairs,
)
from flink_streaming_platform_web_spark.operators.text import (
    ORACLE_TX02 as ORACLE_TX02_REF,
)
from flink_streaming_platform_web_spark.tables import load

MAX_ITERATIONS = 20


def _neighborhood_min_edges(
    directed: DataFrame, keep_self: bool
) -> DataFrame:
    """Shared star step: per node u the min m of N(u) ∪ {u}; emit
    (v, m) for each neighbor v (plus u itself when ``keep_self``),
    dropping self-loops."""
    grouped = (
        directed.groupBy("src")
        .agg(F.collect_set("dst").alias("nbrs"))
        .withColumn("m", F.least(F.col("src"), F.array_min("nbrs")))
    )
    members = (
        F.array_union("nbrs", F.array("src")) if keep_self else F.col("nbrs")
    )
    return grouped.select("m", F.explode(members).alias("v"), "src")


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u})."""
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # no explicit distinct: the next star step's collect_set dedups
    # per-node neighbor lists, so duplicate edges cost nothing extra
    return (
        _neighborhood_min_edges(sym, keep_self=False)
        .where(F.col("v") > F.col("src"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Direct each edge large→small, then connect every neighbor
    (and u itself) to the neighborhood min."""
    directed = edges.select(
        F.greatest("src", "dst").alias("src"),
        F.least("src", "dst").alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    return (
        _neighborhood_min_edges(directed, keep_self=True)
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


# Below this many edges the pair graph trivially fits on the driver:
# a local union-find replaces ~5 distributed jobs with one collect.
# (The same two-tier strategy GraphFrames/GraphX users hand-roll; the
# contraction loop stays the >threshold path.)
SMALL_EDGE_LIMIT = 1_000_000


def _union_find_labels(edge_rows: list) -> list[tuple[int, int]]:
    """Driver-local union-find with path compression; returns
    (node, min-reachable-node) for every edge endpoint."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for src, dst in edge_rows:
        ra, rb = find(src), find(dst)
        if ra != rb:
            # union by min so the root IS the component min
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return [(x, find(x)) for x in parent]


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    small_edge_limit: int = SMALL_EDGE_LIMIT,
) -> DataFrame:
    """(nodes[id], edges[src,dst]) → (id, component) with component =
    min node id reachable."""
    def _sig(df: DataFrame) -> tuple:
        # order-insensitive edge-set signature: one partial-aggregated
        # scan, no join/subtract shuffle (collision odds ~2^-64/round)
        row = df.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    # canonicalize to small-star orientation (larger → smaller) so an
    # input that is already a star forest converges on the first
    # signature comparison instead of burning a round on re-orientation
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
        )
        .distinct()
        .persist()
    )
    sig = _sig(e)
    if sig[0] <= small_edge_limit:
        pairs = _union_find_labels(
            [(r["src"], r["dst"]) for r in e.collect()]
        )
        e.unpersist()
        labels = nodes.sparkSession.createDataFrame(
            pairs, "id long, label long"
        )
    else:
        converged = False
        for _ in range(MAX_ITERATIONS):
            new_e = _small_star(_large_star(e)).persist()
            new_sig = _sig(new_e)
            e.unpersist()
            e, converged = new_e, new_sig == sig
            sig = new_sig
            if converged:
                break
        if not converged:
            # emitting non-fixpoint labels would silently split real
            # components — fail loudly instead (needs component height
            # > 2^MAX_ITERATIONS, far beyond any real dup graph)
            raise RuntimeError(
                "connected_components did not converge in"
                f" {MAX_ITERATIONS} star-contraction rounds"
            )
        # at fixpoint every edge points node → component-min root.
        # localCheckpoint materializes the labels and CUTS lineage so
        # the converged edge set can be unpersisted NOW instead of
        # staying pinned behind the lazily-consumed result (one
        # leaked MEMORY_AND_DISK edge RDD per call otherwise); the
        # checkpoint blocks themselves are context-cleaned when the
        # result goes unreachable
        labels = e.select(
            F.col("src").alias("id"), F.col("dst").alias("label")
        ).localCheckpoint(eager=True)
        e.unpersist()
    all_nodes = nodes.select(F.col(node_col).alias("id"))
    return (
        all_nodes.join(labels, "id", "left")
        .select(
            "id", F.coalesce("label", "id").alias("component")
        )
    )


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


def dd15_cluster_representatives(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quality-aware duplicate-cluster representative selection — the
    step RefinedWeb/FineWeb-style pipelines run after clustering:
    instead of keeping an arbitrary member per near-dup cluster, keep
    the HIGHEST-QUALITY one (Gopher-style quality score, tx02's
    formula) and mark the rest for removal. Composes dd06's connected
    components with the text quality signal: one corpus-sized join on
    doc_id, then a rank window per cluster — cluster sizes are
    dup-cluster-bounded, so the window shuffle is skew-safe by the
    same argument as dd06. Ties break on doc_id for determinism.

    No reference analog (the reference delegates relational work to
    Flink SQL); this is an LLM-training-data operator in its own
    right.
    """
    from pyspark.sql.window import Window

    from flink_streaming_platform_web_spark.operators.text import (
        _quality_scored,
    )

    clusters = dd06_dup_clusters(spark, sf_dir)
    scored = _quality_scored(load(spark, sf_dir, "documents")).select(
        "doc_id", "quality"
    )
    j = clusters.join(scored, "doc_id")
    w = Window.partitionBy("cluster_id")
    rank_w = w.orderBy(F.desc("quality"), F.asc("doc_id"))
    return j.select(
        "doc_id",
        "cluster_id",
        F.count("*").over(w).alias("cluster_size"),
        "quality",
        (F.row_number().over(rank_w) == 1).cast("int").alias("keep"),
    )


ORACLE_DD15 = f"""
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
),
clusters AS (
  SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a
),
scored AS (
  SELECT doc_id, quality FROM ({ORACLE_TX02_REF})
)
SELECT c.doc_id, c.cluster_id,
       CAST(COUNT(*) OVER (PARTITION BY c.cluster_id) AS BIGINT)
         AS cluster_size,
       s.quality,
       CAST(ROW_NUMBER() OVER (
           PARTITION BY c.cluster_id
           ORDER BY s.quality DESC, c.doc_id ASC) = 1 AS INT) AS keep
FROM clusters c JOIN scored s ON s.doc_id = c.doc_id
"""

QUERIES = {
    "dd06_dup_clusters": dd06_dup_clusters,
    "dd15_cluster_representatives": dd15_cluster_representatives,
}
ORACLES = {
    "dd06_dup_clusters": ORACLE_DD06,
    "dd15_cluster_representatives": ORACLE_DD15,
}
