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
# operator rewrite. Round-11 rotation (rule: any entry whose code OR
# transitive helpers changed this round MUST re-enter, then the
# oldest stale rows fill the rest). This round RETIRES THE ROTATION
# DEBT COMPLETELY (VERDICT r10 item 1): after r11 no entry's latest
# driver row predates r8, and q62 gets its first driver row ever.
# (a) CHANGED this round (11 slots):
#     - ann03: banded-LSH signatures moved to the Arrow kernel
#       (_band_sigs_long; bitwise differential vs the Catalyst folds);
#     - dc01: zero-shuffle doc-array membership probe + the new
#       _shingle_arrs_cached product; pp03 composes dc01;
#     - dd14: single win-hashed exchange + one conditional roll-up;
#     - q55: routes through the new band-disjoint PERMUTE tier P;
#     - st14, st19, st20, st21, st22, st23: the streaming fold gained
#       the decided-attempt memo + PREV lookback retention (every
#       streaming CEP entry rides _stream_fold).
# (b) NEVER driver-checked AND changed late this round (tier A-all
#     takes it zero-Python): q62 (1 slot).
# (c) ALL remaining r7-dated rows (25 slots; dc01/pp03 already in
#     (a)): mm01, mm03, pp06, q01, q02, q03, q04, q11, q12, q14,
#     q15, q24, q26, q27, q28, q29, q30, q31, q36, st09, st10,
#     dc02, dd01, dd03, dd15.
# (d) NEW round-11 entries — never driver-checked, outrank green
#     re-checks: tx16 vocabulary-coverage quality score, st24
#     streaming quality-gated mix accounting, and mm08 perceptual-
#     hash image near-dup (3 slots).
# (e) OLDEST r8-dated rows fill the rest (10 slots): pp01, pp02,
#     pp07, mm02, mm04, mm05, mm06, q09, q13, q22.
#     Still r8-dated after this round -- front them in r12: q23,
#     q25, q33, q34, q35, q43, q44, q58, st08, tx01-tx07, tx10,
#     tx13, tx14, tx15 (20 entries, all pytest-pinned and covered by
#     the full local parity sweeps recorded in PROGRESS.jsonl).
# Exactly 50.
_CHECK_FIRST = (
    # (a) changed: ann03 kernel, dc01/pp03 probe, dd14, q55 tier P,
    # streaming CEP fold (memo + lookback)
    "ann03_lsh_bucketed_neardup",
    "dc01_contamination",
    "pp03_prep_pipeline",
    "dd14_exact_substr_dup",
    "q55_match_permute_wide",
    "st14_stream_match_recognize",
    "st19_stream_match_permute",
    "st20_stream_match_within",
    "st21_stream_match_desc",
    "st22_stream_match_skip_to_var",
    "st23_stream_match_global",
    # (b) never driver-checked
    "q62_match_all_rows_overlap",
    # (c) all remaining r7-dated rows
    "mm01_binary_meta",
    "mm03_frame_sample",
    "pp06_representative_prep",
    "q01_pricing_summary",
    "q02_filter_project",
    "q03_computed_columns",
    "q04_daily_gmv",
    "q11_case_having",
    "q12_set_ops",
    "q14_rollup",
    "q15_semi_anti",
    "q24_session_window",
    "q26_asof_join",
    "q27_grouping_sets",
    "q28_interval_join",
    "q29_percentiles",
    "q30_explode_tokens",
    "q31_topk_per_group",
    "q36_cumulate_window",
    "st09_stream_window_tvf",
    "st10_stream_ttl_incremental_agg",
    "dc02_fuzzy_contamination",
    "dd01_dedup_exact",
    "dd03_minhash_signatures",
    "dd15_cluster_representatives",
    # (d) new round-11 entries
    "tx16_vocab_coverage",
    "st24_stream_quality_mix",
    "mm08_phash_neardup",
    # (e) oldest r8-dated rows
    "pp01_training_mix",
    "pp02_shard_packing",
    "pp07_multimodal_prep",
    "mm02_decode_pipeline",
    "mm04_resize_pipeline",
    "mm05_feature_extract",
    "mm06_audio_frame_energy",
    "q09_scalar_datetime",
    "q13_window_over",
    "q22_tumble_window",
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
