"""Fixed-vs-marginal decomposition of a query's Spark-vs-DuckDB
ratio — the dd14/q52 template (SCALE_CURVES_r12/r13): a raw sf5
ratio > 2x is only a real scale problem if the MARGINAL per-SF cost
exceeds the oracle's; a sub-second sf-independent fixed floor (plan
construction, JVM call overhead) on a ~1 s oracle inflates the raw
ratio without saying anything about 100 TB behavior.

    python tools/marginal_decomp.py q63_match_permute_within ... \
        [--lo .scaledata/sf0.1] [--hi .scaledata/sf5] [--runs 3]

Method: both engines run in THIS session, back-to-back per query per
SF (min over --runs alternating pairs, so box drift cannot decouple
a pair):

    fixed_s          = min spark time at the LO dir
    spark_marginal   = (min sf_hi - min sf_lo) / (hi_sf - lo_sf)
    duck_marginal    = same on the oracle leg
    marginal_ratio   = spark_marginal / duck_marginal

Prints one JSON line with per-query rows plus the 1-minute load
average sampled before and after (the honesty field the r13 verdict
asked for — quiet-box runs are the ones that adjudicate).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from flink_streaming_platform_web_spark import inventory
from flink_streaming_platform_web_spark.session import get_spark
from flink_streaming_platform_web_spark.tables import TABLES


def _sf_of(path: str) -> float:
    m = re.search(r"sf([0-9.]+)$", path.rstrip("/"))
    if not m:
        raise SystemExit(f"cannot parse SF from {path!r}")
    return float(m.group(1))


def _pair(qs, oracles, name, spark, con_views, sf_dir, runs):
    """min spark / min duck over `runs` alternating same-session
    pairs at one SF dir."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    s = d = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        qs[name](spark, str(sf_dir)).count()
        s = min(s, time.perf_counter() - t0)
        t0 = time.perf_counter()
        con.execute(oracles[name]).fetchall()
        d = min(d, time.perf_counter() - t0)
    con.close()
    return s, d


def main() -> None:
    sys.stderr.reconfigure(line_buffering=True)
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--lo", default=".scaledata/sf0.1")
    ap.add_argument("--hi", default=".scaledata/sf5")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    qs = inventory.queries()
    oracles = inventory.oracle_sql()
    unknown = [n for n in args.names if n not in qs or n not in oracles]
    if unknown:
        raise SystemExit(f"unknown/unoracled entries: {unknown}")

    lo_sf, hi_sf = _sf_of(args.lo), _sf_of(args.hi)
    span = hi_sf - lo_sf
    spark = get_spark("marginal-decomp")
    spark.sparkContext.setLogLevel("ERROR")
    load0 = os.getloadavg()[0]
    out: dict[str, dict] = {}
    for name in args.names:
        s_lo, d_lo = _pair(qs, oracles, name, spark, None, args.lo,
                           args.runs)
        s_hi, d_hi = _pair(qs, oracles, name, spark, None, args.hi,
                           args.runs)
        sm = (s_hi - s_lo) / span
        dm = (d_hi - d_lo) / span
        out[name] = {
            "fixed_s": round(s_lo, 3),
            "spark_lo_s": round(s_lo, 3),
            "spark_hi_s": round(s_hi, 3),
            "duck_lo_s": round(d_lo, 3),
            "duck_hi_s": round(d_hi, 3),
            "spark_marginal": round(sm, 3),
            "duck_marginal": round(dm, 3),
            "marginal_ratio": round(sm / dm, 2) if dm > 0 else None,
            "sf_hi_raw_ratio": round(s_hi / d_hi, 2) if d_hi else None,
        }
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "marginal_decomposition",
                "lo": args.lo,
                "hi": args.hi,
                "runs": args.runs,
                "loadavg_1m": [round(load0, 2),
                               round(os.getloadavg()[0], 2)],
                "queries": out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
