"""Same-session CEP family (q45–q62 batch MATCH_RECOGNIZE) vs the
DuckDB oracle at one SF dir — the measurement behind
SCALE_CURVES' `cep_family_vs_oracle` section (round 11 introduced the
record; round 12 makes the script a tool instead of an ad-hoc
snippet).

    python tools/cep_family_bench.py [sf_dir] [--runs N]

Prints one JSON line:
    {"metric": "cep_family_vs_oracle", "sf_dir": ..., "spark_total_s":
     ..., "duckdb_total_s": ..., "ratio": ..., "per_query": {name:
     {"spark_s": ..., "duck_s": ..., "ratio": ...}}}

Both legs run in THIS process back-to-back per query (min over
--runs, default 2), so box drift cannot decouple the pair.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from flink_streaming_platform_web_spark import inventory
from flink_streaming_platform_web_spark.session import get_spark
from flink_streaming_platform_web_spark.tables import TABLES


def main() -> None:
    sys.stderr.reconfigure(line_buffering=True)
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default=".scaledata/sf5")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark("cep-family-bench")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" '{args.sf_dir}/{t}.parquet'"
        )
    qs = inventory.queries()
    oracles = inventory.oracle_sql()
    family = sorted(
        n
        for n in qs
        if n.startswith("q") and "_match_" in n and n in oracles
    )
    per: dict[str, dict] = {}
    for name in family:
        s = d = float("inf")
        for _ in range(max(args.runs, 1)):
            t0 = time.perf_counter()
            qs[name](spark, args.sf_dir).count()
            s = min(s, time.perf_counter() - t0)
            t0 = time.perf_counter()
            con.execute(oracles[name]).fetchall()
            d = min(d, time.perf_counter() - t0)
        per[name] = {
            "spark_s": round(s, 3),
            "duck_s": round(d, 3),
            "ratio": round(s / d, 2) if d > 0 else None,
        }
        print(f"# {name}: spark {s:.2f}s duck {d:.2f}s "
              f"ratio {s / d:.2f}", file=sys.stderr)
    st = sum(v["spark_s"] for v in per.values())
    dt = sum(v["duck_s"] for v in per.values())
    print(
        json.dumps(
            {
                "metric": "cep_family_vs_oracle",
                "sf_dir": args.sf_dir,
                "spark_total_s": round(st, 2),
                "duckdb_total_s": round(dt, 2),
                "ratio": round(st / dt, 2),
                "per_query": per,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
