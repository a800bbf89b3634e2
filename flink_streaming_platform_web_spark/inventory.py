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
# operator rewrite. Round-14 rotation (rule: any entry whose code OR
# transitive helpers changed this round MUST re-enter, then the
# oldest stale rows fill the rest; machine-checked by
# tests/test_inventory.py against the ledger as of round
# _LEDGER_ROTATION_ROUND - 1, so a mid-round driver deposit can
# never flip the gates red — ADVICE r13 item 1).
# (a) ALL 25 r10-dated rows go FIRST (VERDICT r13 item 1's explicit
#     ask): dd07, dd10-dd13, q07/q08/q10, q16-q21, q37-q42,
#     tx08/tx09/tx11/tx12, vec01.
# (b) CHANGED this round:
#     - st16/st18 (+ st04, st10-st13 via the shared stateful.py
#       machinery): prep() NaN-normalization for nullable integer
#       agg columns (ADVICE r13 item 2);
#     - st14, st19-st23: ooo.py stale-frontier sentinel fix (ADVICE
#       r13 item 3), cep.py arrays-path numeric boxing (ADVICE r13
#       item 4), and the tier-SQL-over-buffered-frames work
#       (VERDICT r13 item 4);
#     - q63/q64: sf5 marginal decomposition + any resulting shave
#       (VERDICT r13 item 2).
# (c) NEW round-14 entry — never driver-checked, outranks green
#     re-checks: q65 (WITHIN through tier A' bounded alternation,
#     VERDICT r13 item 8).
# Exactly 50: 25 (a) + 15 changed (b) + 1 new (c) + 9 oldest-r11
# fills (ann03, dc02, dd01, dd03, dd15, mm01, pp01, pp02, pp06).
_CHECK_FIRST = (
    # (a) the 25 r10-dated rows — retire the tail of the cycle
    "dd07_embed_neardup_docs",
    "dd10_minhash_est_jaccard",
    "dd11_embed_neardup_kmeans",
    "dd12_simhash64_neardup_pairs",
    "dd13_jaccard_prefix_filter",
    "q07_enriched_orders",
    "q08_cte_topk",
    "q10_string_functions",
    "q16_values_inline",
    "q17_distinct_agg",
    "q18_conditional_pivot",
    "q19_minmax",
    "q20_json_extract",
    "q21_local_supplier_volume",
    "q37_flink_builtin_suite",
    "q38_approx_distinct_hll",
    "q39_dedup_latest",
    "q40_salted_join_agg",
    "q41_correlated_subquery",
    "q42_exists_semijoin",
    "tx08_stratified_sample",
    "tx09_redact_denylist",
    "tx11_idf_table",
    "tx12_doc_top_terms",
    "vec01_kmeans",
    # (b) stateful.py prep() NaN normalization riders
    "st04_stream_session_custom",
    "st10_stream_ttl_incremental_agg",
    "st11_stream_window_topn",
    "st12_stream_dedup_sql",
    "st13_stream_topn_continuous",
    "st16_stream_over_agg",
    "st18_stream_over_rows",
    # (b) ooo.py sentinel + cep.py boxing + tier-SQL-over-buffer
    "st14_stream_match_recognize",
    "st19_stream_match_permute",
    "st20_stream_match_within",
    "st21_stream_match_desc",
    "st22_stream_match_skip_to_var",
    "st23_stream_match_global",
    # (b) q63/q64 decomposition + shave work
    "q63_match_permute_within",
    "q64_match_within_next",
    # (c) new round-14 entry
    "q65_match_within_alternation",
    # oldest r11 rows fill the rest
    "ann03_lsh_bucketed_neardup",
    "dc02_fuzzy_contamination",
    "dd01_dedup_exact",
    "dd03_minhash_signatures",
    "dd15_cluster_representatives",
    "mm01_binary_meta",
    "pp01_training_mix",
    "pp02_shard_packing",
    "pp06_representative_prep",
)

#: the round this _CHECK_FIRST rotation was computed for. The ledger
#: gates in tests/test_inventory.py evaluate the rotation against the
#: CORRECTNESS_r*.json union as of round _LEDGER_ROTATION_ROUND - 1
#: (the artifacts the builder could actually see at rotation time) so
#: the driver depositing the in-progress round's artifact mid-round
#: can never flip the suite red (ADVICE r13 item 1).
_LEDGER_ROTATION_ROUND = 14

#: the steady-state ledger claim, machine-checked by
#: tests/test_inventory.py::test_ledger_claim_matches_computed_histogram:
#: no inventory entry's latest driver row predates this round (the
#: assert is >=, so a driver deposit that IMPROVES the ledger keeps
#: the suite green — VERDICT r13 What's-wrong 1). r12's prose claim
#: drifted (said r10; the data said r9) — keep this in sync with the
#: CORRECTNESS_r*.json union, not with intentions.
_LEDGER_MIN_ROUND = 10


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
