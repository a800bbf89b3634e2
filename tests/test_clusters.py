"""Connected-components (dup-cluster) unit tests."""

from __future__ import annotations

from flink_streaming_platform_web_spark.operators.clusters import (
    connected_components,
)


def test_connected_components_basic(spark):
    nodes = spark.createDataFrame([(i,) for i in range(7)], "id BIGINT")
    # components: {0,1,2,3} (chain), {4,5}, {6} singleton
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (4, 5)], "src BIGINT, dst BIGINT"
    )
    got = {
        r["id"]: r["component"]
        for r in connected_components(nodes, edges).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4, 6: 6}


def test_connected_components_transitive_via_hub(spark):
    # star + bridge: min label must propagate across the bridge
    nodes = spark.createDataFrame([(i,) for i in (1, 5, 9, 12, 20)], "id BIGINT")
    edges = spark.createDataFrame(
        [(9, 5), (12, 9), (20, 12), (5, 1)], "src BIGINT, dst BIGINT"
    )
    got = {
        r["id"]: r["component"]
        for r in connected_components(nodes, edges).collect()
    }
    assert set(got.values()) == {1}


def test_connected_components_long_chain_and_isolates(spark):
    """64-node chain: O(log d) star contraction must converge inside
    MAX_ITERATIONS (plain min-propagation would need 63 rounds);
    isolated nodes never enter the loop and stay their own component."""
    nodes = spark.range(0, 70)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "src LONG, dst LONG"
    )
    # small_edge_limit=0 forces the distributed star-contraction path
    res = {
        r["id"]: r["component"]
        for r in connected_components(
            nodes, edges, small_edge_limit=0
        ).collect()
    }
    assert all(res[i] == 0 for i in range(64))
    assert all(res[i] == i for i in range(64, 70))
    # default path (driver union-find under the threshold) must agree
    res2 = {
        r["id"]: r["component"]
        for r in connected_components(nodes, edges).collect()
    }
    assert res2 == res


def test_dd13_prefix_filter_contains_capped_dd02(spark, sf_dir):
    """dd13's prefix filter guarantees recall at the threshold; dd02's
    MAX_DF stop-shingle cap can only MISS pairs (it measures 0 recall
    on saturated shingle spaces — SCALE.md). Containment must hold:
    every pair the capped index finds, the prefix filter finds, with
    the same exact Jaccard."""
    from flink_streaming_platform_web_spark.operators.dedup import (
        dd02_ngram_jaccard_pairs,
        dd13_jaccard_prefix_filter,
    )

    capped = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 9)
        for r in dd02_ngram_jaccard_pairs(spark, sf_dir).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 9)
        for r in dd13_jaccard_prefix_filter(spark, sf_dir).collect()
    }
    assert capped, "capped index found nothing — fixture drifted"
    for pair, j in capped.items():
        assert exact.get(pair) == j, f"dd13 missed/mismatched {pair}"


def test_max_cell_chunks_sized_by_largest_cell(spark):
    """The dense-block chunk count must come from the LARGEST cell's
    population — an average-based count under-chunks skewed
    assignments and re-densifies the block the chunking bounds."""
    from flink_streaming_platform_web_spark.operators import _cache
    from flink_streaming_platform_web_spark.operators.dedup import (
        DD07_CHUNK,
        _max_cell_chunks,
    )

    # 10 cells averaging ~DD07_CHUNK/2 rows, but one cell holds
    # 3*DD07_CHUNK: the average says c=1, the max says c=3
    n_small, big = 9, 3 * DD07_CHUNK
    rows = [(i, i % n_small) for i in range(n_small * (DD07_CHUNK // 4))]
    rows += [(10_000_000 + i, 99) for i in range(big)]
    assigned = spark.createDataFrame(rows, "vec_id long, cell int")
    _cache.clear()
    c = _max_cell_chunks(spark, "memory://skewtest", assigned, "skew")
    _cache.clear()
    assert c == 3, c


def test_dd15_one_representative_per_cluster(spark, sf_dir):
    from flink_streaming_platform_web_spark.operators.clusters import (
        dd15_cluster_representatives,
    )

    out = dd15_cluster_representatives(spark, sf_dir).cache()
    try:
        n_clusters = out.select("cluster_id").distinct().count()
        keeps = out.filter("keep = 1")
        # exactly one survivor per cluster
        assert keeps.count() == n_clusters
        # the survivor is the max-quality member (ties by doc_id)
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        best = out.withColumn(
            "mx",
            F.max("quality").over(Window.partitionBy("cluster_id")),
        )
        assert (
            best.filter("keep = 1").filter("quality < mx").count() == 0
        )
        # every doc appears exactly once
        assert out.count() == out.select("doc_id").distinct().count()
    finally:
        out.unpersist()
