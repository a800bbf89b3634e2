"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's users get custom stateful logic by writing Flink UDFs
/ process functions in jars; the Spark-native seam is
``applyInPandasWithState`` (SURVEY §0: "custom stateful operators").
``running_counts`` is the canonical shape: per-key state that
accumulates across micro-batches and emits on every update, with an
inactivity timeout that finalizes idle keys — the building block for
sessionization, rate tracking, and dedup-with-TTL.

State lives in the state store (checkpointable, RocksDB-capable), not
in Python: each micro-batch hands the operator only the touched keys'
state — the 100 TB posture is per-key state sharded across executors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key string, n bigint, total double, finalized boolean"
STATE_SCHEMA = "n bigint, total double"


def running_counts(
    df: DataFrame,
    key_col: str = "k",
    value_col: str = "v",
    inactivity_ms: int | None = None,
) -> DataFrame:
    """Per-key running (count, sum) emitted on every update; when an
    inactivity timeout is set, an idle key emits one final row with
    ``finalized=true`` and its state is dropped."""

    def update(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {"key": [key[0]], "n": [n], "total": [total],
                 "finalized": [True]}
            )
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        if inactivity_ms is not None:
            state.setTimeoutDuration(inactivity_ms)
        yield pd.DataFrame(
            {"key": [key[0]], "n": [n], "total": [total],
             "finalized": [False]}
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if inactivity_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return df.groupBy(key_col).applyInPandasWithState(
        update, OUTPUT_SCHEMA, STATE_SCHEMA, "update", timeout
    )
