"""Time the DuckDB oracle for every batch inventory entry at a given
SF dir — the denominator of the driver's 2x bench gate.

    python tools/oracle_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from flink_streaming_platform_web_spark import inventory
from flink_streaming_platform_web_spark.tables import TABLES


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    oracles = inventory.oracle_sql()
    batch = {
        n: sql
        for n, sql in sorted(oracles.items())
        if not n.startswith("st")
    }
    timings: dict[str, float] = {}
    for name, sql in batch.items():
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        print(f"# {name}: {timings[name]:.2f}s", file=sys.stderr)
    print(
        json.dumps(
            {"total": round(sum(timings.values()), 4), "queries": timings}
        )
    )


if __name__ == "__main__":
    main()
