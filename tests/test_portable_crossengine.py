"""Cross-engine pinning of the _portable.py determinism contract:
every oracle in the repo rests on portable_hash / dsum / ts_str
producing BIT-IDENTICAL values in Spark and DuckDB. This test feeds
both engines the same adversarial value set (unicode, quotes,
newlines, long runs, numeric edge magnitudes) through Arrow — no SQL
literals, so nothing is escaped away — and compares value-for-value."""

from __future__ import annotations

import datetime
import random

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from flink_streaming_platform_web_spark.operators._portable import (
    DEC,
    oracle_portable_hash,
    oracle_ts_str,
    portable_hash,
    ts_str,
)

ADVERSARIAL = [
    "",
    " ",
    "a",
    "the quick brown fox",
    "line\nbreak",
    "tab\tsep",
    "quote'single",
    'quote"double',
    "semi;colon -- comment",
    "unicode: 学习数据 flink über naïve",
    "emoji \U0001f600 mix",
    "x" * 10_000,
    "1e308",
    "\\backslash\\",
]


def _sample_strings(n: int = 200) -> list[str]:
    rng = random.Random(42)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 '\";,|\n\t学习üé"
    out = list(ADVERSARIAL)
    for _ in range(n):
        k = rng.randint(0, 64)
        out.append("".join(rng.choice(alphabet) for _ in range(k)))
    return out


def test_portable_hash_matches_duckdb(spark):
    vals = _sample_strings()
    pdf = pd.DataFrame({"s": vals})
    got_spark = [
        r["h"]
        for r in spark.createDataFrame(pdf)
        .select(portable_hash(F.col("s")).alias("h"))
        .collect()
    ]
    con = duckdb.connect()
    con.register("t", pdf)
    got_duck = [
        r[0]
        for r in con.execute(
            f"SELECT {oracle_portable_hash('s')} FROM t"
        ).fetchall()
    ]
    assert got_spark == got_duck
    # 60-bit non-negative contract
    assert all(0 <= h < (1 << 60) for h in got_spark)


def test_ts_str_matches_duckdb(spark):
    rng = random.Random(7)
    base = datetime.datetime(2020, 1, 1)
    stamps = [
        base
        + datetime.timedelta(
            seconds=rng.randint(0, 10 * 365 * 86400),
            microseconds=rng.randint(0, 999_999),
        )
        for _ in range(200)
    ] + [datetime.datetime(1970, 1, 1), datetime.datetime(2262, 1, 1)]
    pdf = pd.DataFrame({"ts": stamps})
    got_spark = [
        r["t"]
        for r in spark.createDataFrame(pdf)
        .select(ts_str(F.col("ts")).alias("t"))
        .collect()
    ]
    con = duckdb.connect()
    con.register("t", pdf)
    got_duck = [
        r[0]
        for r in con.execute(
            f"SELECT {oracle_ts_str('ts')} FROM t"
        ).fetchall()
    ]
    assert got_spark == got_duck


def test_decimal_sum_matches_duckdb_any_order(spark):
    """The dsum carrier's real contract: for measure columns whose
    values are representable at the carrier scale (money-like, ≤2
    decimals — every column dsum touches in this repo), the exact
    decimal reduction is partition-order independent AND cross-engine
    identical. Finer-grained doubles sit at scale-3 midpoints where
    the engines' double→decimal rounding paths disagree (verified
    below) — that input class must use the fixed-point integer carrier
    instead (_portable.py rule 1, q32/vec03)."""
    rng = random.Random(13)
    vals = [round(rng.uniform(-1e6, 1e6), 2) for _ in range(5000)]
    pdf = pd.DataFrame({"x": vals})
    sdf = spark.createDataFrame(pdf).repartition(7)
    got_spark = (
        sdf.select(F.sum(F.col("x").cast(DEC)).cast("double").alias("s"))
        .collect()[0]["s"]
    )
    con = duckdb.connect()
    con.register("t", pdf)
    got_duck = con.execute(
        "SELECT CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) FROM t"
    ).fetchone()[0]
    assert got_spark == got_duck


def test_decimal_carrier_domain_boundary():
    """Document WHY dsum is restricted to carrier-scale inputs: the
    double nearest 728797.025 lies just BELOW the scale-3 midpoint, so
    DuckDB (rounding the true binary value) yields .02 while Java's
    BigDecimal.valueOf (HALF_UP on the shortest decimal repr ".025")
    yields .03. This counterexample is the reason high-scale mean
    reductions (q32, vec01, vec03) use floor(x*1e9) fixed-point,
    never a raw double→DECIMAL cast."""
    from decimal import ROUND_HALF_UP, Decimal

    con = duckdb.connect()
    duck = con.execute(
        "SELECT CAST(CAST(728797.025::DOUBLE AS DECIMAL(18,2)) AS VARCHAR)"
    ).fetchone()[0]
    java_analog = str(
        Decimal(repr(728797.025)).quantize(
            Decimal("0.01"), ROUND_HALF_UP
        )
    )
    assert duck == "728797.02" and java_analog == "728797.03"
