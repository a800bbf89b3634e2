"""Physical-plan quality gates: the properties that decide whether a
query survives a 100× scale-up. These assert on `.explain` output so a
regression (lost pushdown, surprise shuffle, dropped broadcast) fails
CI instead of surfacing as a cluster bill.

- filters/projections reach the parquet scan (PushedFilters/ReadSchema)
- dimension joins broadcast (no shuffle of the fact side)
- aggregations are partial (map-side combine) before the exchange
- hot paths stay in WholeStageCodegen (no Python in the row loop)
"""

from __future__ import annotations

from flink_streaming_platform_web_spark.operators.relational import (
    q01_pricing_summary,
    q02_filter_project,
    q06_lookup_join,
    q07_enriched_orders,
    q21_local_supplier_volume,
)


from flink_streaming_platform_web_spark.plans import (
    executed_plan as _physical,
)
from flink_streaming_platform_web_spark.plans import (
    formatted_plan as _formatted,
)
from flink_streaming_platform_web_spark.plans import (
    pushed_filters,
    read_schema,
    shuffle_count,
)


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    filters = pushed_filters(q02_filter_project(spark, sf_dir))
    assert any("l_quantity" in f for f in filters)
    assert any("l_returnflag" in f for f in filters)


def test_column_pruning(spark, sf_dir):
    cols = read_schema(q02_filter_project(spark, sf_dir))
    # only the 4 needed columns are read, not all 11 lineitem columns
    assert "l_extendedprice" not in cols
    assert "l_tax" not in cols
    assert "l_orderkey" in cols


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    """Bucketing both join sides on the key co-locates them: the join
    runs with ZERO exchanges — the strategy that makes repeated big
    joins affordable at 100 TB (SURVEY §7 / pyspark guide bucketing)."""
    from flink_streaming_platform_web_spark.tables import load

    spark.sql(f"CREATE DATABASE IF NOT EXISTS bkt LOCATION '{tmp_path}/wh'")
    load(spark, sf_dir, "orders").write.bucketBy(4, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable("bkt.orders_bkt")
    load(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    ).write.bucketBy(4, "o_orderkey").sortBy("o_orderkey").mode(
        "overwrite"
    ).saveAsTable("bkt.lineitem_bkt")
    joined = spark.table("bkt.orders_bkt").join(
        spark.table("bkt.lineitem_bkt").hint("merge"), "o_orderkey"
    )
    assert shuffle_count(joined) == 0
    assert joined.count() > 0


def test_q01_partial_aggregation(spark, sf_dir):
    plan = _physical(q01_pricing_summary(spark, sf_dir))
    # partial agg before the exchange, final after: exactly one shuffle
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_sum" in plan or "partial_count" in plan


def test_lookup_join_broadcasts_dim(spark, sf_dir):
    plan = _physical(q06_lookup_join(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # the fact side (events) must not shuffle for the join itself:
    # only the aggregation exchange remains
    assert plan.count("Exchange hashpartitioning") <= 1


def test_enriched_orders_dims_broadcast(spark, sf_dir):
    plan = _physical(q07_enriched_orders(spark, sf_dir))
    # customer/nation/region joins all broadcast at these sizes
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_q21_whole_stage_codegen(spark, sf_dir):
    df = q21_local_supplier_volume(spark, sf_dir)
    df.collect()  # AQE only materializes codegen stages on execution
    plan = _physical(df)
    # '*(n)' prefixes mark WholeStageCodegen spans in the plan string
    assert "*(" in plan
    # no Python evaluation in the relational inventory's hot path
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    # the join STRATEGY is load-bearing (VERDICT r9 item 4): the
    # TPC-H-Q5 shape must broadcast its dimension sides on the
    # EXECUTED AQE plan — a silent revert to a 6-way sort-merge join
    # would have passed the codegen check above
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "SortMergeJoin" not in plan, plan


def test_q21_broadcast_gate_discriminates(spark, sf_dir):
    """The q21 broadcast assertion must actually bite: with
    autoBroadcastJoinThreshold forced off (and AQE's own broadcast
    conversion disabled) the same query plans sort-merge joins — if
    this stops discriminating, the gate above is vacuous."""
    conf = spark.conf
    old_t = conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    old_a = conf.get(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", None
    )
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        df = q21_local_supplier_volume(spark, sf_dir)
        df.collect()
        plan = _physical(df)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", old_t)
        if old_a is None:
            conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        else:
            conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", old_a
            )


def test_dd02_two_shuffles_no_python(spark, sf_dir):
    """The dedup pair pipeline's scale contract: exactly the two
    planned exchanges (member-list grouping + pair counting), plus the
    explicit input-spreading repartition; no Python in the plan."""
    from flink_streaming_platform_web_spark.operators.dedup import (
        dd02_ngram_jaccard_pairs,
    )
    from flink_streaming_platform_web_spark.plans import (
        executed_plan,
        has_python_eval,
        shuffle_count,
    )

    from flink_streaming_platform_web_spark.operators import _cache

    _cache.clear()  # cold-path shape: drop any memoized upstream
    df = dd02_ngram_jaccard_pairs(spark, sf_dir)
    assert shuffle_count(df) == 2
    assert executed_plan(df).count("Exchange RoundRobinPartitioning") == 1
    assert not has_python_eval(df)


def test_ann03_bucket_projection_no_exchange(spark, sf_dir):
    """ann03's signature assignment must be a pure projection: the
    only exchanges in the whole query are the per-band self-join's
    hash repartitions and the pair-dedup (plus the explicit
    corpus-spreading round-robin) — NOT the r01
    posexplode→join→groupBy pipeline that shuffled corpus×64 element
    rows before bucketing."""
    from flink_streaming_platform_web_spark.operators.similarity import (
        LSH_BITS_FLOOR,
        _band_sig_cols,
        _vecs,
        ann03_lsh_bucketed_neardup,
    )
    from flink_streaming_platform_web_spark.plans import (
        executed_plan,
        shuffle_count,
    )

    # signature computation alone: zero exchanges of any kind
    sigs = _vecs(spark, sf_dir).select(
        "vec_id", *_band_sig_cols(LSH_BITS_FLOOR)
    )
    plan = executed_plan(sigs)
    assert "Exchange hashpartitioning" not in plan
    # full query: the (band, sig) self-join + the multi-band pair
    # DISTINCT — nothing corpus×DIM-sized
    assert shuffle_count(ann03_lsh_bucketed_neardup(spark, sf_dir)) <= 3


def test_dd07_no_driver_side_corpus(spark, sf_dir):
    """dd07's discovery is cell-bucketed: one hash exchange (groupBy
    cell) + the doc-info joins; the corpus never materializes on the
    driver (r01 shipped it on ann02's full-corpus toPandas broadcast)."""
    import inspect

    from flink_streaming_platform_web_spark.operators import dedup
    from flink_streaming_platform_web_spark.plans import executed_plan

    src = inspect.getsource(dedup.dd07_embed_neardup_docs)
    assert "toPandas" not in src and "ann02" not in src
    plan = executed_plan(dedup.dd07_embed_neardup_docs(spark, sf_dir))
    # the per-cell block scorer is the one applyInPandas in the plan
    assert "FlatMapGroupsInPandas" in plan


def test_tx_ops_shuffle_free(spark, sf_dir):
    """Per-document text analysis must be a single scan pass — zero
    exchanges of any kind."""
    from flink_streaming_platform_web_spark.operators.text import (
        tx02_quality_score,
        tx04_fingerprint,
    )
    from flink_streaming_platform_web_spark.plans import executed_plan

    for fn in (tx02_quality_score, tx04_fingerprint):
        assert "Exchange" not in executed_plan(fn(spark, sf_dir))


def test_tx08_sample_is_pure_scan_filter(spark, sf_dir):
    """Stratified sampling is a per-row predicate: no exchange, no
    Python — the scan is the only corpus-sized stage at any SF."""
    from flink_streaming_platform_web_spark.operators.text import (
        tx08_stratified_sample,
    )
    from flink_streaming_platform_web_spark.plans import executed_plan

    plan = executed_plan(tx08_stratified_sample(spark, sf_dir))
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_tx06_vocab_single_corpus_shuffle(spark, sf_dir):
    """Vocab top-k: the (lang, token) count must partial-aggregate
    before its exchange; the window ranks post-agg data only."""
    from flink_streaming_platform_web_spark.operators.text import (
        tx06_topk_vocab,
    )
    from flink_streaming_platform_web_spark.plans import executed_plan

    plan = executed_plan(tx06_topk_vocab(spark, sf_dir))
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_tx09_scrub_is_pure_scan_rewrite(spark, sf_dir):
    """Denylist redaction is a zero-shuffle scan-rewrite with no
    Python in the row loop — at 100 TB it is IO-bound, full stop."""
    from flink_streaming_platform_web_spark.operators.text import (
        tx09_redact_denylist,
    )
    from flink_streaming_platform_web_spark.plans import executed_plan

    plan = executed_plan(tx09_redact_denylist(spark, sf_dir))
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_tx07_bigram_repetition_zero_shuffle(spark, sf_dir):
    """tx07 is a per-document statistic: the r2 verdict flagged its old
    explode→groupBy×2 shape as two corpus-wide shuffles for no
    cross-row need. The rewrite computes the bigram histogram
    array-side (sorted-array run-length fold) — the plan must stay a
    pure scan rewrite forever: no Exchange, no Python."""
    from flink_streaming_platform_web_spark.operators.text import (
        tx07_bigram_repetition,
    )
    from flink_streaming_platform_web_spark.plans import executed_plan

    plan = executed_plan(tx07_bigram_repetition(spark, sf_dir))
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_tx15_top_trigram_chars_zero_shuffle(spark, sf_dir):
    """tx15 is a per-document statistic like tx07: the trigram
    histogram and its argmax are computed array-side (sorted-array
    run-length fold carrying the arg), so the plan must stay a pure
    scan rewrite — no Exchange, no Python."""
    from flink_streaming_platform_web_spark.operators.text import (
        tx15_top_trigram_chars,
    )
    from flink_streaming_platform_web_spark.plans import executed_plan

    plan = executed_plan(tx15_top_trigram_chars(spark, sf_dir))
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_tx10_quality_filter_zero_shuffle(spark, sf_dir):
    """tx10 used to left-join tx07's per-doc agg back onto documents —
    a self-shuffle of the same scan. With tx07 per-row, the repetition
    rule is inline and the whole Gopher gate is scan-bound."""
    from flink_streaming_platform_web_spark.operators.text import (
        tx10_quality_filter,
    )
    from flink_streaming_platform_web_spark.plans import executed_plan

    plan = executed_plan(tx10_quality_filter(spark, sf_dir))
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_dd09_chunk_dedup_shuffle_budget(spark, sf_dir):
    """Chunk dedup: first-occurrence window (1 exchange on chunk),
    per-doc reassembly + totals (exchanges on doc_id), and the final
    doc-level join — but NEVER a quadratic pair stage and no Python."""
    from flink_streaming_platform_web_spark.operators.dedup import (
        dd09_chunk_dedup,
    )
    from flink_streaming_platform_web_spark.plans import (
        executed_plan,
        shuffle_count,
    )

    df = dd09_chunk_dedup(spark, sf_dir)
    plan = executed_plan(df)
    assert "Python" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert shuffle_count(df) <= 5


def test_vec02_quantize_zero_shuffle(spark, sf_dir):
    """int8 quantization is per-row array math: the only exchange
    allowed is _vecs' deliberate parallelism repartition."""
    from flink_streaming_platform_web_spark.operators.vectors import (
        vec02_quantize_int8,
    )
    from flink_streaming_platform_web_spark.plans import shuffle_count

    assert shuffle_count(vec02_quantize_int8(spark, sf_dir)) <= 1


def test_vec01_kmeans_assignment_never_shuffles_corpus(spark, sf_dir):
    """k-means final assignment: broadcast centroids + mapInPandas —
    the corpus-side plan must contain no join and only the group-by
    exchange for the tiny per-cluster rollup (plus _vecs' repartition)."""
    from flink_streaming_platform_web_spark.operators.vectors import (
        vec01_kmeans,
    )
    from flink_streaming_platform_web_spark.plans import (
        executed_plan,
        shuffle_count,
    )

    df = vec01_kmeans(spark, sf_dir)
    plan = executed_plan(df)
    assert "Join" not in plan  # assignment is not a join against centroids
    assert shuffle_count(df) <= 2


def test_dc01_probe_zero_shuffle(spark, sf_dir):
    """Decontamination probe (round 11 shape): the train corpus is
    probed at scan speed against the broadcast eval union inside one
    Arrow kernel — NO join of any kind and NO hash exchange anywhere
    in the probe plan (the r10 shape exploded the corpus and paid a
    broadcast join plus a two-phase roll-up)."""
    from flink_streaming_platform_web_spark.operators.decontam import (
        dc01_contamination,
    )

    plan = _physical(dc01_contamination(spark, sf_dir))
    assert "Join" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_pp02_packing_single_shuffle(spark, sf_dir):
    """Shard packing: ONE exchange keyed by the pack partition
    (source). The window cumsum and the shard roll-up both run on that
    partitioning — the roll-up's ClusteredDistribution(source,
    shard_id) is satisfied by hashpartitioning(source), so no second
    exchange appears."""
    from flink_streaming_platform_web_spark.operators.pipeline import (
        pp02_shard_packing,
    )

    plan = _physical(pp02_shard_packing(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_pp01_pipeline_no_joins_narrow_dedup_shuffle(spark, sf_dir):
    """pp01: quality gate inline on the scan (no keep-list join),
    dedup as a digest window — exactly two hash exchanges and zero
    joins; the dedup exchange must carry the md5 digest, not text."""
    from flink_streaming_platform_web_spark.operators.pipeline import (
        pp01_training_mix,
    )

    plan = _physical(pp01_training_mix(spark, sf_dir))
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 2
    # the window exchange partitions on the digest column
    assert "hashpartitioning(h#" in plan


def test_pp03_prep_pipeline_broadcast_only_joins(spark, sf_dir):
    """pp03: contamination drop is a broadcast anti join (verdict set
    is eval-benchmark-sized), dedup/pack are window exchanges — no
    sort-merge join anywhere. Round 11: dc01's probe is a zero-shuffle
    Arrow kernel now, so the anti join is the ONLY join left and the
    exchange budget drops to 3 (dedup window + pack window; roll-up
    reuses the source partitioning)."""
    from flink_streaming_platform_web_spark.operators.pipeline import (
        pp03_prep_pipeline,
    )

    plan = _physical(pp03_prep_pipeline(spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 1  # the contamination anti
    assert plan.count("Exchange hashpartitioning") <= 3


def test_vec04_gram_single_tiny_exchange(spark, sf_dir):
    """vec04: per-partition numpy partials — the only hash exchange
    carries |partitions| × d(d+1)/2 rows; the corpus never joins and
    never shuffles past the _vecs spread."""
    from flink_streaming_platform_web_spark.operators.vectors import (
        vec04_gram_matrix,
    )

    plan = _physical(vec04_gram_matrix(spark, sf_dir))
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_tx12_vocab_join_is_size_gated(spark, sf_dir):
    """VERDICT r03 item 3: the df (vocabulary) side of tx12's join
    must not be PINNED to a broadcast — at 100 TB the token vocabulary
    is billions of rows and a forced broadcast dies. The strategy is
    AQE's runtime size decision: a small vocab still broadcasts (no
    perf regression at test scale), and over the threshold the plan
    falls back to a shuffle join of two already-reduced sides."""
    from flink_streaming_platform_web_spark.operators.text import (
        tx12_doc_top_terms,
    )

    # small-vocab branch: AQE converts to broadcast at runtime
    df = tx12_doc_top_terms(spark, sf_dir)
    df.count()
    assert "BroadcastHashJoin" in _physical(df)

    # big-vocab branch: with the broadcast threshold off (what a
    # billions-row vocabulary effectively does), the join must
    # degrade to a shuffle join, not fail or re-pin a broadcast
    for key in (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ):
        spark.conf.set(key, "-1")
    try:
        df2 = tx12_doc_top_terms(spark, sf_dir)
        df2.count()
        plan = _physical(df2)
        assert "BroadcastHashJoin" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_dd14_window_dedup_bounded_exchanges(spark, sf_dir):
    """dd14: one corpus-sized exchange (the (win, source) combine) and
    reduced-data roll-ups after it — no corpus-sized join back, no
    Python in the row loop; windows shuffle as 8-byte hashed keys."""
    from flink_streaming_platform_web_spark.operators.dedup import (
        dd14_exact_substr_dup,
    )

    df = dd14_exact_substr_dup(spark, sf_dir)
    df.count()  # materialize the memoized agg1 product
    plan = _physical(df)
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
    # round 11: the four per-source measures come out of ONE
    # conditional aggregation over the re-exploded per-window rows —
    # a single InMemoryTableScan of the persisted (win, source)
    # product, no second branch and no join back. per_win rides the
    # persisted win-partitioning, so the only hash exchange below the
    # final roll-up is the tiny per-source one. (FileScan lines in
    # the output belong to the cached relation's printed build
    # subtree.)
    assert plan.count("InMemoryTableScan") == 1
    assert "Join" not in plan.split("InMemoryRelation")[0]


def test_pp04_no_pinned_broadcast_on_losers(spark, sf_dir):
    """pp04's near-dup loser drop must NOT pin a broadcast — losers
    scale with the corpus dup fraction (the tx12 lesson); AQE decides
    from runtime size. Dedup stays a digest-window exchange."""
    from flink_streaming_platform_web_spark.operators import _cache
    from flink_streaming_platform_web_spark.operators.pipeline import (
        pp04_neardup_prep,
    )

    df = pp04_neardup_prep(spark, sf_dir)
    df.count()
    plan = _physical(df)
    assert "hashpartitioning(h#" in plan  # digest window exchange
    # with the broadcast threshold off the anti join must degrade,
    # not re-pin a broadcast
    for key in (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ):
        spark.conf.set(key, "-1")
    _cache.clear()
    try:
        df2 = pp04_neardup_prep(spark, sf_dir)
        df2.count()
        plan2 = _physical(df2)
        assert "BroadcastHashJoin" not in plan2
    finally:
        for key in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        ):
            spark.conf.unset(key)
        _cache.clear()


def test_q46_window_join_joins_reduced_sides(spark, sf_dir):
    """Window join: both sides pre-aggregate per (window, key) BEFORE
    the join, so the join inputs are reduced data — partial_count
    (map-side combine) on each side, and no join of raw scans."""
    from flink_streaming_platform_web_spark.operators.windows import (
        q46_window_join,
    )

    plan = _physical(q46_window_join(spark, sf_dir))
    assert plan.count("partial_count") >= 2  # both sides combine
    assert "PythonUDF" not in plan


def test_dd15_rank_window_no_cartesian(spark, sf_dir):
    """Cluster-representative selection: one corpus join on doc_id +
    a per-cluster rank window — never a cartesian product, and the
    quality scoring stays columnar (no Python in the row loop)."""
    from flink_streaming_platform_web_spark.operators.clusters import (
        dd15_cluster_representatives,
    )

    plan = _physical(dd15_cluster_representatives(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "PythonUDF" not in plan
    # the rank is a window operator over cluster_id, not a self-join
    assert "Window" in plan


def test_pp06_rollup_is_lang_sized(spark, sf_dir):
    """The representative accounting rolls up per language with
    map-side combine (partial aggregation before the exchange)."""
    from flink_streaming_platform_web_spark.operators.pipeline import (
        pp06_representative_prep,
    )

    plan = _physical(pp06_representative_prep(spark, sf_dir))
    assert "partial_count" in plan or "partial_sum" in plan
    assert "CartesianProduct" not in plan


def test_cep_round8_entries_single_key_shuffle(spark, sf_dir):
    """q55 (width-6 PERMUTE — 720 orderings, beyond the expansion
    tier's cap) routes through the round-11 band-disjoint permute
    tier: ZERO Python anywhere, a Tungsten sort, and exactly the one
    PARTITION BY exchange the semantics require — the 720 orderings
    collapse to a per-row band classification + 5 LEADs.
    (q50/q51 moved to the round-10 expansion tier — covered by
    test_cep_jvm_tier_entries_pure_jvm_single_exchange.)"""
    from flink_streaming_platform_web_spark.operators.cep import (
        q55_match_permute_wide,
    )

    plan = _physical(q55_match_permute_wide(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan  # no per-row Python
    assert "MapInPandas" not in plan  # pure JVM since tier P
    assert "FlatMapGroupsInPandas" not in plan
    assert "Sort" in plan  # Tungsten sort, not pandas sort_values
    # exactly the keyed window shuffle the semantics require
    assert plan.count("Exchange") == 1, plan


def test_cep_jvm_tier_entries_pure_jvm_single_exchange(spark, sf_dir):
    """q45/q47/q52/q54/q57 route through the round-10 JVM tiers: ZERO
    Python in the plan (no MapInPandas / FlatMapGroupsInPandas /
    BatchEvalPython) and exactly ONE exchange — the PARTITION BY
    shuffle the semantics require (tier C's group-by reuses the
    window's hash partitioning; a second exchange here is a
    regression)."""
    from flink_streaming_platform_web_spark.operators.cep import (
        q45_match_recognize,
        q47_match_alternation,
        q49_match_bounded_quant,
        q50_match_permute,
        q51_match_nested_group,
        q52_match_within,
        q53_match_alternated_sequences,
        q54_match_desc_tie_order,
        q57_match_rowtime,
    )

    for q in (q45_match_recognize, q47_match_alternation,
              q49_match_bounded_quant, q50_match_permute,
              q51_match_nested_group, q53_match_alternated_sequences,
              q52_match_within, q54_match_desc_tie_order,
              q57_match_rowtime):
        plan = _physical(q(spark, sf_dir))
        assert "MapInPandas" not in plan, q.__name__
        assert "FlatMapGroupsInPandas" not in plan, q.__name__
        assert "BatchEvalPython" not in plan, q.__name__
        assert plan.count("Exchange") == 1, (q.__name__, plan)


def test_tx13_novelty_combiner_aggs_and_tiny_broadcast(spark, sf_dir):
    """Bigram novelty: corpus counts and the per-doc fold are
    hash aggregates with map-side partials (no sort-based fallback),
    the 1-row stats side enters as a broadcast — never a cartesian
    against the corpus — and nothing drops to Python."""
    from flink_streaming_platform_web_spark.operators.text import (
        tx13_bigram_novelty,
    )

    plan = _physical(tx13_bigram_novelty(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "PythonUDF" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row stats side
    assert "HashAggregate" in plan


def test_mm_round8_pipelines_one_spread_exchange(spark, sf_dir):
    """mm04/mm05/mm06/mm07 are scan→mapInPandas chains with exactly
    ONE round-robin exchange ahead of the Python kernel: the corpus
    arrives as a handful of parquet splits, and the decode stage must
    not inherit them (4 of 32 cores busy — round 12). The spread is
    key-free by design; any keyed (hash) exchange or a second
    exchange would mean an accidental shuffle crept into what is
    otherwise scan-bound at 100 TB."""
    from flink_streaming_platform_web_spark.operators.multimodal import (
        mm04_resize_pipeline,
        mm05_feature_extract,
        mm06_audio_frame_energy,
        mm07_scene_keyframes,
    )

    for q in (mm04_resize_pipeline, mm05_feature_extract,
              mm06_audio_frame_energy, mm07_scene_keyframes):
        plan = _physical(q(spark, sf_dir))
        assert plan.count("Exchange") == 1, plan
        assert "RoundRobinPartitioning" in plan, plan
        assert "hashpartitioning" not in plan, plan
        assert "CartesianProduct" not in plan


def test_q21_tpch_q5_shape_aqe_broadcasts(spark, sf_dir):
    """q21 (the TPC-H Q5 shape) is the most expensive pure-relational
    entry: pin the AQE runtime plan so a future change can't silently
    revert the dimension joins to a 6-way sort-merge cascade. nation/
    region are explicit broadcasts; customer and supplier must convert
    to broadcast at runtime (AQE localShuffleReader), leaving at most
    the orders⋈lineitem fact join on a shuffle."""
    from flink_streaming_platform_web_spark.operators.relational import (
        q21_local_supplier_volume,
    )
    from flink_streaming_platform_web_spark.plans import executed_plan

    df = q21_local_supplier_volume(spark, sf_dir)
    df.collect()  # AQE finalizes the plan only at execution
    plan = executed_plan(df)
    assert "isFinalPlan=true" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert plan.count("SortMergeJoin") <= 1, plan


def test_tx16_bounded_vocab_broadcast_only(spark, sf_dir):
    """tx16: the top-K vocabulary is bounded by construction, so the
    probe must be a broadcast join — never a sort-merge of the corpus
    against its own vocabulary; the only hash exchanges are the two
    map-side-combined aggs (token count, per-doc roll-up)."""
    from flink_streaming_platform_web_spark.operators.text import (
        tx16_vocab_coverage,
    )

    plan = _physical(tx16_vocab_coverage(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "TakeOrderedAndProject" in plan  # bounded top-K, no sort-all


def test_q62_all_rows_tier_shape(spark, sf_dir):
    """q62 (ALL ROWS × SKIP TO NEXT ROW) routes through the round-11
    tier A-all: zero Python, one keyed exchange, and the k output
    rows per match come from a single inline() generate — no window
    re-scan and no NFA."""
    from flink_streaming_platform_web_spark.operators.cep import (
        q62_match_all_rows_overlap,
    )

    plan = _physical(q62_match_all_rows_overlap(spark, sf_dir))
    assert "MapInPandas" not in plan
    assert "FlatMapGroupsInPandas" not in plan
    assert "BatchEvalPython" not in plan
    assert "Generate inline" in plan
    assert plan.count("Exchange") == 1, plan


def test_q52_window_navigations_deduped(spark, sf_dir):
    """Round 12: the tier memo materializes each distinct (column,
    offset) navigation ONCE — Catalyst does not CSE window
    expressions, and the r11 plan computed lead(value) and lead(ts)
    twice each. Pin one lead per navigated column, one post-filter
    Sort (head-detection islands reuse the (part, rn) order the
    second window already has), and zero Python."""
    from flink_streaming_platform_web_spark.operators.cep import (
        QUERIES as CEP_QUERIES,
    )

    plan = _physical(CEP_QUERIES["q52_match_within"](spark, sf_dir))
    for col in ("value#", "ts#", "event_id#"):
        assert plan.count(f"lead({col}") == 1, (col, plan)
    # q63 (width-5 band-disjoint PERMUTE + WITHIN) must route through
    # tier P — zero Python despite 120 orderings, with the time bound
    # folded into the window predicate
    p63 = _physical(
        CEP_QUERIES["q63_match_permute_within"](spark, sf_dir)
    )
    for tok in ("BatchEvalPython", "ArrowEvalPython", "mapInPandas",
                "FlatMapGroupsInPandas"):
        assert tok not in p63, tok
    assert p63.count("Exchange") == 1, p63
    # exchange once (PARTITION BY), sort twice: the big pre-window
    # sort + ONE candidate re-sort; the old grp/pos islands walk paid
    # a third
    assert plan.count("Exchange") == 1, plan
    assert plan.count("+- Sort") == 2, plan
    for tok in ("BatchEvalPython", "ArrowEvalPython", "mapInPandas",
                "FlatMapGroupsInPandas"):
        assert tok not in plan, tok


def test_within_tier_native_timestamp_compare(spark, sf_dir):
    """Round 13: the tiers' WITHIN conjunct compares timestamps
    natively (l > f + INTERVAL — one constant-folded interval add per
    row) instead of the unix_micros(CAST(...)) pair that cost ~0.24 s
    per 5M-row pass. Pin the expensive forms out of the plan for both
    WITHIN tier routes (islands: q52; tier-P PERMUTE: q63)."""
    from flink_streaming_platform_web_spark.operators.cep import (
        QUERIES as CEP_QUERIES,
    )

    for name in ("q52_match_within", "q63_match_permute_within",
                 "q64_match_within_next",
                 "q65_match_within_alternation"):
        plan = _physical(CEP_QUERIES[name](spark, sf_dir))
        assert "unix_micros" not in plan, (name, plan)


def test_q65_within_alternation_tier_a_prime(spark, sf_dir):
    """Round 14 (VERDICT r13 item 8): WITHIN over an
    alternation-of-sequences must ride tier A′ — the per-expansion
    CASE folds a DIFFERENT (first, last) timestamp bound for each
    branch length (LEAD(ts,2) for the 3-row branch, LEAD(ts,1) for
    the 2-row one) in ONE keyed exchange with zero Python. An NFA
    fallback here would show FlatMapGroupsInPandas."""
    from flink_streaming_platform_web_spark.operators.cep import (
        QUERIES as CEP_QUERIES,
    )

    plan = _physical(
        CEP_QUERIES["q65_match_within_alternation"](spark, sf_dir)
    )
    for tok in ("BatchEvalPython", "ArrowEvalPython", "mapInPandas",
                "FlatMapGroupsInPandas"):
        assert tok not in plan, tok
    assert plan.count("Exchange") == 1, plan
    # both branch lengths' time bounds are present: the shared memo
    # materializes lead(ts, 1) and lead(ts, 2) exactly once each
    assert plan.count("lead(ts#") == 2, plan
