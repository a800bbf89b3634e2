"""Semantic invariants + plan shapes for the second batch of round-2
operators (q39/q40, tx11/tx12, vec03, dd10). Exact values are
oracle-gated via tools/parity.py; these pin scale-invariant properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_streaming_platform_web_spark.operators.dedup import (
    N_PERMS,
    dd04_minhash_lsh_pairs,
    dd10_minhash_est_jaccard,
)
from flink_streaming_platform_web_spark.operators.relational_ext import (
    q39_dedup_latest,
)
from flink_streaming_platform_web_spark.operators.skew import (
    q40_salted_join_agg,
    salted_join,
)
from flink_streaming_platform_web_spark.operators.text import (
    tx11_idf_table,
    tx12_doc_top_terms,
)
from flink_streaming_platform_web_spark.operators.vectors import (
    vec03_dim_stats,
)
from flink_streaming_platform_web_spark.plans import executed_plan
from flink_streaming_platform_web_spark.tables import load


def test_q39_one_row_per_key_single_shuffle(spark, sf_dir):
    out = q39_dedup_latest(spark, sf_dir)
    dup = out.groupBy("user_id").count().filter(F.col("count") > 1)
    assert dup.count() == 0
    assert out.count() == (
        load(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    # the window's hash partitioning is the only exchange
    assert executed_plan(out).count("Exchange hashpartitioning") == 1


def test_q40_salting_is_semantically_invisible(spark, sf_dir):
    """The whole contract: salted agg == plain-join agg, bit for bit."""
    salted = {tuple(r) for r in q40_salted_join_agg(spark, sf_dir).collect()}
    ev = load(spark, sf_dir, "events").select(
        F.col("user_id").alias("c_custkey"), "value"
    )
    dim = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    from flink_streaming_platform_web_spark.operators._portable import dsum

    plain = {
        tuple(r)
        for r in ev.join(dim, "c_custkey")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_events"), dsum("value", "total_value"))
        .collect()
    }
    assert salted == plain


def test_salted_join_preserves_left_rows(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        F.col("user_id").alias("c_custkey"), "event_id"
    )
    dim = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    plain_n = ev.join(dim, "c_custkey", "left").count()
    salted_n = salted_join(ev, dim, "c_custkey", how="left").count()
    assert plain_n == salted_n


def test_tx11_df_bounded_and_cf_totals(spark, sf_dir):
    out = tx11_idf_table(spark, sf_dir)
    n_docs = load(spark, sf_dir, "documents").count()
    assert out.filter(F.col("df") > F.col("n_docs")).count() == 0
    assert out.filter(F.col("df") < 1).count() == 0
    assert out.select(F.max("n_docs")).collect()[0][0] == n_docs
    total_cf = out.agg(F.sum("cf")).collect()[0][0]
    total_tokens = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", r"\s+")).alias("t"))
        .filter(F.col("t") != "")
        .count()
    )
    assert total_cf == total_tokens


def test_tx12_topk_is_dense_and_bounded(spark, sf_dir):
    out = tx12_doc_top_terms(spark, sf_dir)
    per_doc = out.groupBy("doc_id").agg(
        F.count("*").alias("k"),
        F.array_sort(F.collect_list("rnk")).alias("rnks"),
    )
    assert per_doc.filter(F.col("k") > 3).count() == 0
    # ranks are dense 1..k (row_number, no gaps)
    bad = per_doc.filter(
        F.col("rnks")
        != F.transform(
            F.sequence(F.lit(1), F.col("k")), lambda i: i.cast("bigint")
        )
    )
    assert bad.count() == 0


def test_vec03_stats_are_consistent(spark, sf_dir):
    out = vec03_dim_stats(spark, sf_dir)
    n_vecs = load(spark, sf_dir, "embeddings").count()
    assert out.count() == 64
    assert out.filter(F.col("n") != n_vecs).count() == 0
    assert out.filter(F.col("var_x") < -5e-9).count() == 0  # floor-carrier bias bound
    assert out.filter(
        (F.col("min_x") > F.col("mean_x")) | (F.col("mean_x") > F.col("max_x"))
    ).count() == 0
    # single map-side-combined agg: one corpus exchange (plus the tiny
    # repartition _vecs does to spread the one-file input)
    plan = executed_plan(out)
    assert plan.count("Exchange hashpartitioning") == 1


def test_pp01_mix_is_a_subset_accounting(spark, sf_dir):
    """The composed pipeline can only shrink the corpus: per-(lang,
    source) doc counts are bounded by the raw counts, every stratum's
    rate-0 languages are absent, and totals reconcile with running the
    stages by hand."""
    from flink_streaming_platform_web_spark.operators.pipeline import (
        pp01_training_mix,
    )
    from flink_streaming_platform_web_spark.operators.text import (
        TX08_RATES,
    )

    out = pp01_training_mix(spark, sf_dir)
    raw = (
        load(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count("*").alias("raw_n"))
    )
    joined = out.join(raw, ["lang", "source"], "left")
    assert joined.filter(F.col("n_docs") > F.col("raw_n")).count() == 0
    zero_rate = [l for l, p in TX08_RATES.items() if p == 0]
    if zero_rate:
        assert out.filter(F.col("lang").isin(zero_rate)).count() == 0
    assert out.count() > 0


def test_dd10_estimates_cover_dd04_survivors(spark, sf_dir):
    """dd10 scores ALL band-bucket candidates; dd04's verified pairs
    are a subset of those candidates, and the estimate is a valid
    probability."""
    est = dd10_minhash_est_jaccard(spark, sf_dir)
    assert (
        est.filter(
            (F.col("est_jaccard") < 0.0)
            | (F.col("est_jaccard") > 1.0)
            | (F.col("agree_n") < 0)
            | (F.col("agree_n") > N_PERMS)
        ).count()
        == 0
    )
    cand = {(r["doc_a"], r["doc_b"]) for r in est.collect()}
    verified = {
        (r["doc_a"], r["doc_b"])
        for r in dd04_minhash_lsh_pairs(spark, sf_dir).collect()
    }
    assert verified <= cand


def test_q41_subquery_is_decorrelated(spark, sf_dir):
    """The correlated scalar subquery must compile to an aggregate-
    then-join plan, not a per-row subquery: one grouped aggregation
    over lineitem for the per-part averages, joined back — no
    nested-loop/cartesian artifacts in the physical plan."""
    from flink_streaming_platform_web_spark.operators.relational_ext import (
        q41_correlated_subquery,
    )

    plan = executed_plan(q41_correlated_subquery(spark, sf_dir))
    assert "Subquery" not in plan  # rewritten away, not re-executed
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
