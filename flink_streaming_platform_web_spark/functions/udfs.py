"""Example user-defined functions — the O23/O24 surface
(reference: UDF jars loaded via ``CREATE FUNCTION name AS 'class'``,
docs/manual-sql.md §1.e; the canonical example is a JSON-key checker,
``jsonHasKey``).

``json_has_key`` is the Python twin of that example, registered either
directly or through the runner's ``CREATE FUNCTION json_has_key AS
'flink_streaming_platform_web_spark.functions.udfs:json_has_key'
LANGUAGE PYTHON`` statement. ``props_k_bucket`` is the vectorized
(pandas) flavor — the recommended shape for hot paths.
"""

from __future__ import annotations

import json

import pandas as pd

from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType


def json_has_key(payload: str, key: str) -> bool:
    """Row UDF (jsonHasKey parity). Prefer the pandas variant in
    hot paths — row UDFs pay per-row serde."""
    try:
        return key in json.loads(payload)
    except (json.JSONDecodeError, TypeError):
        return False


@pandas_udf(IntegerType())
def props_k_bucket(props: pd.Series) -> pd.Series:
    """Arrow-vectorized: bucket of the numeric `k` field (k % 10),
    -1 when absent/malformed."""

    def bucket(s: str) -> int:
        try:
            v = json.loads(s).get("k")
            if v is None:
                return -1
            # SQL-compatible semantics across engines: truncate toward
            # zero (explicit trunc — DuckDB's double→int CAST rounds)
            # and keep the DIVIDEND's sign like SQL %, not Python's
            # floor-mod (-3 % 10: SQL -3, Python 7) — ORACLE_Q34
            # mirrors with trunc + %
            import math

            t = math.trunc(float(v))
            m = abs(t) % 10
            return m if t >= 0 else -m
        except (json.JSONDecodeError, TypeError, ValueError):
            return -1

    return props.map(bucket).astype("int32")
