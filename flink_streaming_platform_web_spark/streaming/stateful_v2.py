"""Custom stateful operators on the Spark 4 ``transformWithState``
seam (``transformWithStateInPandas``, the successor of
``applyInPandasWithState`` — BACKLOG round-2 item).

Same operator contract as streaming/stateful.py, different substrate:
typed state variables (ValueState/ListState/MapState) with optional
per-state TTL, timers, and initial-state bootstrap. This is where the
reference's "custom Flink process function in a jar" workload lands
going forward; applyInPandasWithState remains for the 3.x-compatible
path.

State is per-key in the state store (RocksDB-capable), sharded by the
groupBy — the 100 TB posture is unchanged from stateful.py.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

OUTPUT_SCHEMA = "key string, n bigint, total double"
STATE_SCHEMA = "n bigint, total double"


def tws_available() -> "tuple[bool, str]":
    """Capability on-ramp (same pattern as the kafka-jar probe in
    sources/registry.py): transformWithStateInPandas talks to the
    JVM state server over a protobuf protocol, so the live run needs
    ``google.protobuf`` in the Python environment. Returns
    ``(ok, reason)``; the reason names the missing capability and the
    one-line enable recipe. The operator code itself imports and
    plan-builds without it — only query START needs the protocol."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        return False, (
            "google.protobuf absent: transformWithStateInPandas's"
            " state-server protocol cannot start in this environment."
            " Enable with: pip install protobuf — then the live TWS"
            " tests run unchanged."
        )
    return True, ""


class RunningCountProcessor(StatefulProcessor):
    """Per-key running (count, sum) — the canonical stateful shape,
    now with typed ValueState and optional state TTL (the
    dedup-with-TTL / rate-tracker building block)."""

    def __init__(self, value_col: str, ttl_ms: int | None = None) -> None:
        self._value_col = value_col
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._agg = handle.getValueState("agg", STATE_SCHEMA, self._ttl_ms)

    def handleInputRows(
        self,
        key: Any,
        rows: Iterator[pd.DataFrame],
        timerValues: TimerValues,
    ) -> Iterator[pd.DataFrame]:
        prior = self._agg.get()
        n, total = prior if prior is not None else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf[self._value_col].sum())
        self._agg.update((n, total))
        yield pd.DataFrame({"key": [key[0]], "n": [n], "total": [total]})

    def close(self) -> None:
        pass


def running_counts_v2(
    df: DataFrame,
    key_col: str = "k",
    value_col: str = "v",
    ttl_ms: int | None = None,
) -> DataFrame:
    """transformWithState twin of stateful.running_counts: per-key
    running (count, sum) emitted on every update; with ``ttl_ms`` set,
    a key idle past the TTL restarts from zero (state expiry — the
    TTL-dedup primitive)."""
    # state TTL is only legal under a time mode — NoTime +
    # getValueState(ttl) raises CANNOT_ASSIGN_TTL_IN_NO_TIME_MODE at
    # query start, which made the ttl_ms feature unreachable
    time_mode = "ProcessingTime" if ttl_ms is not None else "None"
    return df.groupBy(key_col).transformWithStateInPandas(
        RunningCountProcessor(value_col, ttl_ms),
        OUTPUT_SCHEMA,
        "Update",
        time_mode,
    )
