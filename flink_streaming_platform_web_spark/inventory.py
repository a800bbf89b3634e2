"""Master inventory: every implemented query/operator with its DuckDB
oracle. This is what `__spark_entry__.py` exposes to the driver's
correctness gate and what `bench.py` times."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_streaming_platform_web_spark.operators import (
    cep,
    clusters,
    decontam,
    dedup,
    functions_demo,
    multimodal,
    pipeline,
    relational,
    relational_ext,
    similarity,
    skew,
    text,
    vectors,
    windows,
)
from flink_streaming_platform_web_spark.streaming import stream_queries

_MODULES = (
    relational,
    cep,
    relational_ext,
    functions_demo,
    windows,
    dedup,
    decontam,
    clusters,
    similarity,
    text,
    multimodal,
    stream_queries,
    vectors,
    skew,
    pipeline,
)

# The driver's correctness gate walks queries() in dict insertion order
# and checks the first 50 entries per round. Rotate per round so the
# union of rounds gives every entry a green row dated after its last
# operator rewrite. Round-9 rotation (rule: any entry whose code OR
# transitive helpers changed this round MUST re-enter, then the oldest
# stale rows fill the rest):
# (a) CHANGED this round — cep.py was rewritten onto the chunked
#     mapInPandas runner (bitmap head-patch, columnar collector,
#     _ColRows): every batch CEP entry q45/q47-q57 re-enters, plus the
#     streaming CEP routes st14/st19/st20/st21 (shared matcher fold)
#     and st16/st17/st18 (ooo.drain_pending now resolves the operator
#     id from state-metadata). similarity._vecs is now memoized
#     persisted and vectors._km_assign_means folds partials on the
#     driver, so every _vecs consumer re-enters: vec01-vec04,
#     ann01-ann05, dd07, dd11, q32. (31 slots)
# (b) OLDEST stale rows (r5-dated, VERDICT r8 item 2): st01-st07,
#     st15, q46, dd05/dd06/dd08/dd09/dd10/dd14, pp04/pp05, q05/q06.
#     (17 slots)
# (c) NEW round-9 entries — never driver-checked, outrank everything
#     green: mm07 scene keyframes, q59 TO_TIMESTAMP_LTZ. (2 slots)
# Still r5-dated after this round — front them in r10: q07, q08, q10,
# q16-q20, q37-q42, tx08, tx09, tx11, tx12 + dd05, dd10 (19 entries,
# all heavily pytest-pinned and covered by local full-sweep parity;
# dd05/dd10 ceded their slots to the two new entries — their
# signature/estimate math is pinned by tests and dd08 gates the same
# simhash signatures this round).
# Exactly 50.
_CHECK_FIRST = (
    # (a) changed: batch CEP family (chunked mapInPandas runner)
    "q45_match_recognize",
    "q47_match_alternation",
    "q48_match_all_rows",
    "q49_match_bounded_quant",
    "q50_match_permute",
    "q51_match_nested_group",
    "q52_match_within",
    "q53_match_alternated_sequences",
    "q54_match_desc_tie_order",
    "q55_match_permute_wide",
    "q56_match_running_final",
    "q57_match_rowtime",
    # (a) changed: streaming CEP + drain operator-id resolution
    "st14_stream_match_recognize",
    "st19_stream_match_permute",
    "st20_stream_match_within",
    "st21_stream_match_desc",
    "st16_stream_over_agg",
    "st17_stream_temporal_join",
    "st18_stream_over_rows",
    # (a) changed: _vecs memo + driver-folded k-means partials
    "vec01_kmeans",
    "vec02_quantize_int8",
    "vec03_dim_stats",
    "vec04_gram_matrix",
    "ann01_brute_topk",
    "ann02_embed_neardup_pairs",
    "ann03_lsh_bucketed_neardup",
    "ann04_ivf_search",
    "ann05_ivf_multiprobe",
    "dd07_embed_neardup_docs",
    "dd11_embed_neardup_kmeans",
    "q32_embedding_centroids",
    # (b) oldest stale (r5-dated)
    "st01_stream_tumble_window",
    "st02_stream_upsert_agg",
    "st03_stream_session_window",
    "st04_stream_session_custom",
    "st05_stream_hop_window",
    "st06_stream_dedup",
    "st07_stream_interval_join",
    "st15_stream_window_join",
    "q46_window_join",
    "dd06_dup_clusters",
    "dd08_simhash_neardup_pairs",
    "dd09_chunk_dedup",
    "dd14_exact_substr_dup",
    "pp04_neardup_prep",
    "pp05_mixture_weights",
    "q05_gmv_join_coupon",
    "q06_lookup_join",
    # (c) new round-9 entries
    "mm07_scene_keyframes",
    "q59_timestamp_ltz",
)


def _check_first_is_exact() -> None:
    missing = [k for k in _CHECK_FIRST if k not in queries()]
    if missing:
        raise ValueError(f"_CHECK_FIRST names not in inventory: {missing}")


def _reorder(out: dict) -> dict:
    head = {k: out[k] for k in _CHECK_FIRST if k in out}
    head.update((k, v) for k, v in out.items() if k not in head)
    return head


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    return _reorder(out)


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        overlap = out.keys() & mod.ORACLES.keys()
        if overlap:
            # same guard as queries(): a colliding oracle name would
            # silently hash-compare a query against the WRONG SQL
            raise ValueError(f"duplicate oracle names: {overlap}")
        out.update(mod.ORACLES)
    return out
