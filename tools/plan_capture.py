"""Capture .explain('formatted') output for inventory queries.

Usage: python tools/plan_capture.py <out_dir> <suffix> [names...]

Writes <out_dir>/<name>_<suffix>.txt for each named query (all batch
queries when no names are given), built against $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1). Plans are captured WITHOUT executing
the query (AdaptiveSparkPlan isFinalPlan=false), which is what the
optimization round's before/after evidence needs: Exchange count,
join strategy, PushedFilters/ReadSchema, codegen spans, Python nodes.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from flink_streaming_platform_web_spark import inventory
from flink_streaming_platform_web_spark.session import get_spark


def main() -> int:
    out_dir = Path(sys.argv[1])
    suffix = sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    qs = inventory.queries()
    if not names:
        names = sorted(n for n in qs if not n.startswith("st"))
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        n_ex = plan.count("Exchange")
        n_py = sum(
            plan.count(t)
            for t in ("BatchEvalPython", "ArrowEvalPython",
                      "MapInPandas", "FlatMapGroupsInPandas",
                      "MapInArrow")
        )
        print(f"{name}: exchanges={n_ex} python_nodes={n_py}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
