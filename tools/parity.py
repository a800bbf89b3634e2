"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same parquet tables, then compares row count, column
names, and an order-insensitive value hash. Usage:

    python tools/parity.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from flink_streaming_platform_web_spark import inventory
from flink_streaming_platform_web_spark.session import get_spark
from flink_streaming_platform_web_spark.tables import TABLES


def _type_kind(t) -> str:
    """Collapse an Arrow type to the kind class the driver's
    canonicalizer distinguishes. DuckDB HUGEINT arrives as
    decimal128(38,0) — a different kind from int64, which is exactly
    the drift that caused the r01 dd05/ann03/q38 hash mismatches, so
    'decimal' and 'int' must NOT collapse together here."""
    import pyarrow as pa

    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list"
    return str(t)


_SPARK_KIND = {
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "bigint": "int",
    "float": "float",
    "double": "float",
    "boolean": "bool",
    "string": "string",
    "binary": "binary",
    "date": "date",
}


def _spark_kind(dt: str) -> str:
    if dt.startswith("decimal"):
        return "decimal"
    if dt.startswith("timestamp"):
        return "timestamp"
    if dt.startswith("array"):
        return "list"
    return _SPARK_KIND.get(dt, dt)


def _canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        # repr() round-trips doubles exactly; both engines' doubles must
        # be bit-identical by construction (see _portable.py)
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def frame_fingerprint(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("parity-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = inventory.queries()
    oracles = inventory.oracle_sql()
    if only:
        unknown = set(only) - qs.keys()
        if unknown:
            # a typo must not silently check NOTHING and print the
            # gate's green verdict
            print(f"unknown query names: {sorted(unknown)}")
            sys.exit(2)
    failures = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"SKIP  {name}: no oracle (rows-only) rows={len(s_rows)}")
            continue
        try:
            cur = con.execute(oracles[name])
            arrow = cur.fetch_arrow_table()
            d_cols = arrow.column_names
            d_kinds = {
                c: _type_kind(arrow.schema.field(c).type) for c in d_cols
            }
            d_rows = [
                tuple(row[c] for c in d_cols) for row in arrow.to_pylist()
            ]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        dt = time.time() - t0
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"schema {sorted(s_cols)} vs {sorted(d_cols)}")
        else:
            s_kinds = {c: _spark_kind(t) for c, t in sdf.dtypes}
            drift = {
                c: (s_kinds[c], d_kinds[c])
                for c in s_cols
                if s_kinds[c] != d_kinds[c]
            }
            if drift:
                problems.append(f"type drift {drift}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rows {len(s_rows)} vs {len(d_rows)}")
        if not problems:
            hs = frame_fingerprint(s_cols, s_rows)
            hd = frame_fingerprint(d_cols, d_rows)
            if hs != hd:
                problems.append("value-hash mismatch")
                # show a diff sample
                order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                set_s = {
                    tuple(_canon(r[i]) for i in order_s) for r in s_rows
                }
                set_d = {
                    tuple(_canon(r[i]) for i in order_d) for r in d_rows
                }
                for x in list(set_s - set_d)[:3]:
                    print(f"        spark-only: {x}")
                for x in list(set_d - set_s)[:3]:
                    print(f"        duck-only:  {x}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"OK    {name}  rows={len(s_rows)}  ({dt:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
