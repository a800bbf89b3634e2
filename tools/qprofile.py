"""Per-query cost decomposition for the optimization rounds.

Usage: python tools/qprofile.py [--sf-dir DIR] [--runs N] name [name...]

For each named inventory query, reports (guide §1):
- build_s: DataFrame construction time (py4j + analysis-trigger cost)
- first_s: first end-to-end count() (the bench's timed contract)
- noop_s:  a noop-sink write of the SAME fresh plan (computes every
  column; guide §1.4) on a separate construction, after the memoized
  upstreams are warm
- jobs/stages/tasks executed during first_s (from the status tracker)

Each query family's memoized upstreams are cleared first so the first
run pays the honest cold cost, like the bench does after its warmup.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from flink_streaming_platform_web_spark import inventory
from flink_streaming_platform_web_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--warm-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("--noop", action="store_true",
                    help="also time a noop-sink run on a fresh plan")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark("qprofile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    qs = inventory.queries()
    unknown = [n for n in args.names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    from flink_streaming_platform_web_spark.operators import _cache

    # warm codegen/footers like bench.py does
    spark.read.parquet(f"{args.sf_dir}/lineitem.parquet").count()
    if not args.no_warm:
        for n in args.names:
            try:
                qs[n](spark, args.warm_dir).count()
            except Exception as e:
                print(f"# warm {n} failed: {e}", file=sys.stderr)
    _cache.clear()

    for n in args.names:
        jobs0 = set(tracker.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        df = qs[n](spark, args.sf_dir)
        t_build = time.perf_counter() - t0
        t1 = time.perf_counter()
        rows = df.count()
        t_first = time.perf_counter() - t1
        jobs1 = set(tracker.getJobIdsForGroup(None) or [])
        new_jobs = sorted(jobs1 - jobs0)
        n_stages = 0
        n_tasks = 0
        for j in new_jobs:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for st in ji.stageIds:
                si = tracker.getStageInfo(st)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        line = (
            f"{n}: build={t_build:.2f}s first={t_first:.2f}s "
            f"rows={rows} jobs={len(new_jobs)} stages={n_stages} "
            f"tasks={n_tasks}"
        )
        if args.noop:
            t2 = time.perf_counter()
            df2 = qs[n](spark, args.sf_dir)
            df2.write.format("noop").mode("overwrite").save()
            line += f" noop_warmupstream={time.perf_counter() - t2:.2f}s"
        print(line)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
