"""Cross-engine determinism helpers.

The driver's correctness gate hash-compares Spark results against a
DuckDB oracle (order-insensitive value hash). Floating-point SUM/AVG
over doubles is reduction-order-dependent, so a naive `SUM(double)`
differs in the last bits between engines (and between runs at different
parallelism). Two rules make every aggregate bit-stable:

1. **Reduce exactly.** Cast doubles to DECIMAL before SUM. Decimal
   addition is exact and order-independent; double→decimal(_, s>=1)
   rounding can never hit a tie (a scale-(s+1) midpoint ending in 5 has
   a factor 5^(s+1) in its denominator, so it is never exactly
   representable as a binary double), hence both engines round to the
   same nearest decimal — PROVIDED the engines' conversion paths agree
   on which neighbor is nearest. In practice they disagree by one
   decimal ulp for doubles within ~1 double-ulp of a grid midpoint;
   at scale 2 (DEC below) that is a ~1e-12/value event (safe), but at
   scale 9 it is ~4e-7/value and WAS observed at 320k values (q32,
   sf0.1). High-scale reductions over raw doubles must therefore use
   integer fixed-point instead: SUM(CAST(floor(x * 1e9) AS BIGINT)) —
   floor and double-multiply are bit-identical IEEE ops in both
   engines, and the sum is exact integer arithmetic.
2. **Scalar math after.** Once reductions are exact, any per-row or
   per-group scalar double math (division for AVG, sqrt, formulas) is
   IEEE-deterministic and identical across engines.

Portable hashing: Spark's `hash()` is Murmur3 and DuckDB's `hash()` is
different, so all hash-based operators (dedup, minhash, simhash, LSH)
derive integers from `md5` hex, which both engines implement
identically: Spark `conv(substr(md5(x),1,15),16,10)` == DuckDB
`CAST('0x' || substr(md5(x),1,15) AS BIGINT)` (60 bits, positive).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"  # exact-sum carrier for monetary/measure doubles


def dsum(col: str | Column, alias: str) -> Column:
    """Order-independent SUM of a double column, emitted as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: str | Column, alias: str) -> Column:
    """Order-independent AVG: exact decimal sum / exact count."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(DEC)).cast("double") / F.count(c).cast("double")
    ).alias(alias)


def oracle_dsum(expr: str, alias: str) -> str:
    """DuckDB side of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE) AS {alias}"


def fp_mean(col: str | Column) -> Column:
    """Engine-portable exact MEAN of unit-scale doubles (embedding
    coordinates): fixed-point accumulate floor(x·1e9) as BIGINT, then
    one double division. A raw-double→DECIMAL(18,9) cast is NOT
    portable — a double lands within one ulp of a 0.5e-9 grid midpoint
    with probability ~4e-7/value and the engines' decimal-conversion
    paths then disagree by one decimal ulp (observed at sf0.1). floor
    and multiply are IEEE ops both engines run bit-identically, and
    |x|·1e9 ≪ 2⁵³ stays exact. Single definition shared by q32, the
    IVF centroid build (ann04/ann05/dd07), and k-means (vec01/dd11) so
    a carrier change can never partially apply."""
    c = F.col(col) if isinstance(col, str) else col
    scaled = F.floor(c.cast("double") * F.lit(1e9)).cast("bigint")
    return (F.sum(scaled).cast("double") / F.lit(1e9)) / F.count(
        "*"
    ).cast("double")


def oracle_fp_mean(expr: str) -> str:
    """DuckDB side of :func:`fp_mean` (same IEEE operation sequence)."""
    return (
        f"(CAST(SUM(CAST(floor(CAST({expr} AS DOUBLE) * 1e9) AS BIGINT))"
        f" AS DOUBLE) / 1e9) / CAST(COUNT(*) AS DOUBLE)"
    )


def oracle_davg(expr: str, alias: str) -> str:
    """DuckDB side of :func:`davg`."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE)"
        f" / CAST(COUNT({expr}) AS DOUBLE) AS {alias}"
    )


def portable_hash(col: Column) -> Column:
    """Deterministic 60-bit non-negative hash of a string column,
    reproducible in DuckDB (see module docstring)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def oracle_portable_hash(expr: str) -> str:
    """DuckDB side of :func:`portable_hash`."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def ts_str(col: Column) -> Column:
    """Render a timestamp as a microsecond string — timestamps cross
    engine boundaries as text to dodge tz/precision representation
    drift in the compare harness."""
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss.SSSSSS")


ORACLE_TS_FMT = "%Y-%m-%d %H:%M:%S.%f"


def oracle_ts_str(expr: str) -> str:
    return f"strftime({expr}, '{ORACLE_TS_FMT}')"
