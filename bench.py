"""Benchmark harness: times every inventory query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q01_...": sec, ...}, "sf": 0.1,
     "floor_sec": <median do-nothing-job cost>,
     "floor_total_sec": <floor_sec * n_queries>}

Timing is end-to-end per query: plan construction + execution to a
driver-side count-style action (collect of the final, already-reduced
result). Session startup/JVM warmup are excluded (one throwaway query
warms codegen and the parquet footer cache).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from flink_streaming_platform_web_spark import inventory
from flink_streaming_platform_web_spark.session import get_spark


def _cache_clear() -> None:
    """Drop memoized upstream DataFrames built against the warmup SF
    so the timed runs build their own (correct lineage + honest cost
    attribution at the bench SF)."""
    from flink_streaming_platform_web_spark.operators import _cache

    _cache.clear()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:  # 'sf' mid-path (e.g. /mnt/sfdata/run1)
        sf = -1.0
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM codegen + parquet footers, then every query SHAPE
    # once at the smallest SF — whole-stage codegen compiles per plan
    # shape, and without this the first query to touch a path (decimal
    # agg, pandas UDF, window) is billed several seconds of one-time
    # JIT that the timing contract explicitly excludes
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    warm_dir = os.environ.get(
        "SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001"
    )
    batch_queries = {
        name: fn
        for name, fn in sorted(inventory.queries().items())
        if not name.startswith("st")
        # streaming-semantics entries (multi-micro-batch state
        # machinery) are correctness checks, not throughput —
        # excluded from the batch-engine timing contract
    }
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name, fn in batch_queries.items():
            try:
                fn(spark, warm_dir).count()
            except Exception:
                pass  # warmup is best-effort; timing runs will surface it
        _cache_clear()

    # ONE timed run per query. The first run is the honest end-to-end
    # cost: a second run of the same query mostly re-counts its own
    # memoized persisted result, so min-over-runs reported warm-cache
    # numbers. Cross-QUERY upstream sharing (shingles → dd02/dd03/...)
    # stays, as documented: that is the pipeline's compute-once shape,
    # not a timing artifact. SPARK_GRAFT_BENCH_RUNS>1 opts into
    # min-over-repeats for noise studies — explicitly warm, stated.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "1"))

    # measured per-query scheduling floor (VERDICT r03/r04): the cost
    # of one do-nothing Spark job on this session — driver planning +
    # scheduler + one task round-trip. Sub-second queries are floor-
    # dominated, so ratios against an in-process engine need this
    # stated, not hand-waved. Median of 11 trivial jobs, measured
    # AFTER warmup so it prices the steady state the timed runs see.
    floor_samples = []
    for _ in range(11):
        t0 = time.perf_counter()
        spark.range(1).count()
        floor_samples.append(time.perf_counter() - t0)
    floor = round(sorted(floor_samples)[len(floor_samples) // 2], 4)

    timings: dict[str, float] = {}
    for name, fn in batch_queries.items():
        best, n = float("inf"), 0
        for _ in range(max(runs, 1)):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        print(f"# {name}: {timings[name]:.2f}s rows={n}", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "inventory_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                # median cost of a do-nothing job on this session:
                # subtract from any per-query time before comparing
                # against an in-process engine (floor_total_sec =
                # floor_sec * n_queries is the aggregate overhead)
                "floor_sec": floor,
                "floor_total_sec": round(floor * len(timings), 4),
            }
        )
    )
    # The driver archives only the tail of stdout; the full line above
    # puts "value" first, so truncation can lose the headline (it did in
    # BENCH_r02). Repeat the totals in a short trailing line so the
    # artifact is self-sufficient from its last 200 bytes.
    print(
        json.dumps(
            {
                "metric": "inventory_total_runtime_summary",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "sf": sf,
                "floor_sec": floor,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
