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
# operator rewrite. Round-13 rotation (rule: any entry whose code OR
# transitive helpers changed this round MUST re-enter, then the
# oldest stale rows fill the rest). tests/test_inventory.py now
# machine-checks the two ledger invariants that drifted in r12
# (VERDICT r12 item 6): stale coverage and the steady-state claim.
# (a) ALL 26 remaining r9-dated rows go FIRST (the r12 verdict's
#     explicit ask, item 3): ann01/ann02, dd06/dd08/dd09, pp04/pp05,
#     q05/q06, q32, q46, q59, st01-st07, st15-st18, vec02-vec04.
#     Eight of these (st03/st04, st16/st17/st18 + st01/st02/st05)
#     double as CHANGED re-entries: the watermark-buffered front end
#     is key-grouped this round and sessionize gained the null-key
#     guard.
# (b) CHANGED this round (beyond the r9 overlaps):
#     - st14, st19-st23: streaming MATCH_RECOGNIZE rides the
#       key-grouped watermark_buffered state (ooo.py KEY_GROUPS);
#     - st11-st13: retained_topn's pandas sub-grouping keeps null
#       partition keys (dropna=False + NaN normalization);
#     - pp08: the budget*s_i product moved to a DECIMAL(38,0)/
#       HUGEINT intermediate on both engines;
#     - q52/q55: tier-SQL shaves from the sf5 decomposition work
#       (VERDICT r12 item 2);
#     - st08-st10, st24, st25: _stateful_partitions now matches
#       staged sources by exact path (transitive helper of every
#       runner-routed st* entry).
# (c) NEW round-13 entry — never driver-checked, outranks green
#     re-checks: q64 (WITHIN under SKIP TO NEXT ROW — the tier-A
#     time bound's first oracle gate).
# Exactly 50: 26 (a) + 18 changed (b) + 1 new (c) + 5 oldest-r10
# fills.
# Entries NOT re-entering despite the _stateful_partitions helper
# change are r10+-dated AND green in this round's full local parity
# sweeps (PROGRESS.jsonl r13).
_CHECK_FIRST = (
    # (a) the 26 r9-dated rows — retire the tail of the cycle
    "ann01_brute_topk",
    "ann02_embed_neardup_pairs",
    "dd06_dup_clusters",
    "dd08_simhash_neardup_pairs",
    "dd09_chunk_dedup",
    "pp04_neardup_prep",
    "pp05_mixture_weights",
    "q05_gmv_join_coupon",
    "q06_lookup_join",
    "q32_embedding_centroids",
    "q46_window_join",
    "q59_timestamp_ltz",
    "st01_stream_tumble_window",
    "st02_stream_upsert_agg",
    "st03_stream_session_window",
    "st04_stream_session_custom",
    "st05_stream_hop_window",
    "st06_stream_dedup",
    "st07_stream_interval_join",
    "st15_stream_window_join",
    "st16_stream_over_agg",
    "st17_stream_temporal_join",
    "st18_stream_over_rows",
    "vec02_quantize_int8",
    "vec03_dim_stats",
    "vec04_gram_matrix",
    # (b) key-grouped watermark buffer: streaming CEP
    "st14_stream_match_recognize",
    "st19_stream_match_permute",
    "st20_stream_match_within",
    "st21_stream_match_desc",
    "st22_stream_match_skip_to_var",
    "st23_stream_match_global",
    # (b) retained_topn null-key sub-grouping
    "st11_stream_window_topn",
    "st12_stream_dedup_sql",
    "st13_stream_topn_continuous",
    # (b) pp08 decimal intermediate
    "pp08_temperature_sample",
    # (b) q52/q55 tier work (r12 perf-weak decomposition) + q63
    # (the WITHIN conjunct's native-compare rewrite changes its plan)
    "q52_match_within",
    "q55_match_permute_wide",
    "q63_match_permute_within",
    # (c) new round-13 entry
    "q64_match_within_next",
    # (b) _stateful_partitions exact-path riders (runner-routed st*)
    "st08_stream_cdc_latest",
    "st09_stream_window_tvf",
    "st10_stream_ttl_incremental_agg",
    "st24_stream_quality_mix",
    "st25_stream_contamination_gate",
    # oldest r10 rows fill the rest
    "ann04_ivf_search",
    "ann05_ivf_multiprobe",
    "dd02_ngram_jaccard_pairs",
    "dd04_minhash_lsh_pairs",
    "dd05_simhash_signatures",
)

#: the steady-state ledger claim, machine-checked by
#: tests/test_inventory.py::test_ledger_claim_matches_computed_histogram:
#: no inventory entry's latest driver row predates this round. r12's
#: prose claim drifted (said r10; the data said r9) — keep this in
#: sync with the CORRECTNESS_r*.json union, not with intentions.
_LEDGER_MIN_ROUND = 9


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
