"""CDC-apply throughput micro-bench (VERDICT r02 item 7).

Generates a synthetic debezium-style changelog (inserts, updates,
deletes over a bounded key space) and times the three CDC paths in
streaming/cdc.py:

- ``materialize_latest``: bounded changelog → final state (window
  last-row-wins per key) — the distributed scale path.
- ``cdc_incremental_agg``: retraction-aware continuous aggregation —
  signed-delta shuffle per batch, folded into the keyed store.
- ``_scaffold_apply_changelog``: ordered per-row apply into the
  mock KeyedStore — the test-channel analog of a server-side MERGE
  (jdbc sinks use jdbc_upsert_foreach_batch instead; this path's
  collect() is bounded by the micro-batch size by design).

    python tools/cdc_bench.py [n_events] [n_keys] [n_batches]

Prints one JSON line: rows/sec per path.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from pyspark.sql import functions as F

from flink_streaming_platform_web_spark.session import get_spark
from flink_streaming_platform_web_spark.streaming.cdc import (
    cdc_incremental_agg,
    _scaffold_apply_changelog,
    materialize_latest,
)
from flink_streaming_platform_web_spark.streaming.upsert import KeyedStore


def _changelog(spark, n: int, n_keys: int):
    """(op, before, after, ts_ms, seq) rows: 60% insert/read, 30%
    update, 10% delete, uniform keys, monotone ts/seq."""
    rng = np.random.default_rng(7)
    keys = rng.integers(0, n_keys, n)
    ops = rng.choice(np.array(["c", "u", "d"]), n, p=[0.6, 0.3, 0.1])
    vals = rng.uniform(1, 1000, n).round(2)
    grp = (keys % 50).astype("int64")
    rows = [
        (
            str(ops[i]),
            {"id": int(keys[i]), "grp": int(grp[i]), "amount": float(vals[i])}
            if ops[i] in ("u", "d")
            else None,
            {"id": int(keys[i]), "grp": int(grp[i]), "amount": float(vals[i])}
            if ops[i] != "d"
            else None,
            1_700_000_000_000 + i // 100,
            i,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "__op STRING,"
        " __before STRUCT<id BIGINT, grp BIGINT, amount DOUBLE>,"
        " __after STRUCT<id BIGINT, grp BIGINT, amount DOUBLE>,"
        " __ts_ms BIGINT, __seq BIGINT",
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    spark = get_spark("cdc-bench")
    spark.sparkContext.setLogLevel("ERROR")
    log = _changelog(spark, n, n_keys).persist()
    log.count()  # materialize input off the clock

    # path 1: bounded materialization (the distributed path)
    t0 = time.perf_counter()
    final_rows = materialize_latest(log, ["id"]).count()
    mat_s = time.perf_counter() - t0

    # path 2: retraction-aware incremental agg over micro-batches
    # (executor-side StateTable fold — round 8 moved this off the
    # driver-held KeyedStore)
    import tempfile as _tempfile

    from flink_streaming_platform_web_spark.streaming.cdc import (
        agg_state_table,
    )

    agg_state = agg_state_table(
        spark,
        _tempfile.mkdtemp(prefix="graft_cdcagg_"),
        log,
        ["grp"],
        ["amount"],
    )
    apply_agg = cdc_incremental_agg(log, ["grp"], ["amount"], agg_state)
    # ORDERED micro-batches (contiguous __seq slices — binlog/kafka
    # arrival order): batch-sequential apply then agrees with the
    # global (ts, seq) materialization, so the state-table path's
    # final row count is checkable against materialize_latest below
    step = (n + n_batches - 1) // n_batches
    batches = [
        log.filter(
            (F.col("__seq") >= i * step)
            & (F.col("__seq") < (i + 1) * step)
        )
        for i in range(n_batches)
    ]
    t0 = time.perf_counter()
    for i, b in enumerate(batches):
        apply_agg(b, i)
    agg_s = time.perf_counter() - t0
    agg_groups = agg_state.view().count()
    agg_state.destroy()

    # path 4 (round 6): executor-side StateTable merge — the runner's
    # production materialize path (keyed changelog MERGE per batch,
    # bucket-pruned state rewrite; scales with cores, unlike path 3)
    import tempfile

    from flink_streaming_platform_web_spark.streaming.cdc import (
        foreach_batch_merge_changelog,
    )
    from flink_streaming_platform_web_spark.streaming.state_table import (
        StateTable,
    )

    st = StateTable(
        spark,
        tempfile.mkdtemp(prefix="graft_cdcbench_"),
        ["id"],
        spark.createDataFrame(
            [], "id BIGINT, grp BIGINT, amount DOUBLE"
        ).schema,
    )
    apply_merge = foreach_batch_merge_changelog(st, ["id"])
    t0 = time.perf_counter()
    for i, b in enumerate(batches):
        apply_merge(b, i)
    merge_s = time.perf_counter() - t0
    merge_final = st.view().count()
    st.destroy()

    # path 3: ordered per-row KeyedStore apply (mock-store channel) —
    # measured on a slice: it is driver-side by design and priced
    # accordingly
    store2 = KeyedStore(key_cols=["id"])
    apply_rows = _scaffold_apply_changelog(store2)
    slice_n = min(n, 50_000)
    small = log.limit(slice_n)
    t0 = time.perf_counter()
    apply_rows(small, 0)
    rowapply_s = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "metric": "cdc_apply_throughput",
                "n_events": n,
                "n_keys": n_keys,
                "materialize_latest_rows_per_sec": round(n / mat_s, 1),
                "materialize_final_rows": final_rows,
                "incremental_agg_rows_per_sec": round(n / agg_s, 1),
                "incremental_agg_batches": n_batches,
                "incremental_agg_groups": agg_groups,
                "state_table_merge_rows_per_sec": round(n / merge_s, 1),
                "state_table_final_rows": merge_final,
                "keyed_store_apply_rows_per_sec": round(
                    slice_n / rowapply_s, 1
                ),
                "unit": "rows/sec",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
