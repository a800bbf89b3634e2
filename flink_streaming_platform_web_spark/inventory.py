"""Master inventory: every implemented query/operator with its DuckDB
oracle. This is what `__spark_entry__.py` exposes to the driver's
correctness gate and what `bench.py` times."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_streaming_platform_web_spark.operators import (
    clusters,
    dedup,
    functions_demo,
    multimodal,
    relational,
    relational_ext,
    similarity,
    text,
    windows,
)
from flink_streaming_platform_web_spark.streaming import stream_queries

_MODULES = (
    relational,
    relational_ext,
    functions_demo,
    windows,
    dedup,
    clusters,
    similarity,
    text,
    multimodal,
    stream_queries,
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
