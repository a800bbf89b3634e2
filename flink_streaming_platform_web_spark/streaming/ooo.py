"""Watermark-buffered out-of-order ingest for custom stateful
streaming operators.

Flink's event-time operators (CepOperator, TemporalRowTimeJoinOperator,
the OverAggregate row-time operators — all reachable from the
reference's SQL surface via Flink 1.13, reference `pom.xml:41`) accept
out-of-order streams by BUFFERING each element in keyed state until the
watermark passes its timestamp, then processing elements in event-time
order; elements older than the watermark at arrival are late and are
dropped. Until round 6 this repo's custom stateful operators
(streaming CEP / OVER / temporal join) instead ASSERTED per-key
time-ordered arrival (BACKLOG "ordered-ingest contract"); this module
is the watermark front end that replaces the assertion.

``watermark_buffered`` wraps any operator expressed as a FOLD —
``fold(inner_state_bytes | None, released_rows) -> (inner_state_bytes,
out_pdf | None)`` where ``released_rows`` is a pandas DataFrame sorted
by the operator's ORDER BY — in an ``applyInPandasWithState`` stage:

- per-key state holds ``(pending_rows, release_frontier, inner)``;
- each invocation appends the batch's rows to pending, drops LATE rows
  (event time ≤ the frontier already released — Flink's late-element
  drop; Spark's stateful operator pre-filters rows older than the
  watermark the same way), then releases every pending row whose event
  time ≤ the current global watermark (``GroupState.
  getCurrentWatermarkMs`` — the same watermark Spark computed from the
  sources' ``withWatermark``), sorted, into the fold;
- keys with rows still pending arm an ``EventTimeTimeout`` timer just
  below the earliest pending timestamp, so the key is re-invoked when
  the watermark passes it even if no further data arrives for the key
  — Flink's per-element event-time timer registration, and the reason
  every key flushes on the terminal no-data micro-batch.

Bounded-input flush: Flink emits a ``MAX_WATERMARK`` at the end of a
bounded source so buffered elements drain. Spark's file source has no
end-of-input signal, so a bounded run stages one far-future "watermark
advancer" row as its last file (the st15 sentinel pattern): the
advancer drives the global watermark past every real row — releasing
them all, everywhere, via the timers — while itself staying pending
forever (its own timestamp is never passed), so it can never reach the
fold or the output.

Scale shape: identical to the wrapped operator's — one shuffle on the
key columns, state sharded per key across executors in the state
store (checkpointable), per-key pending bounded by the rows inside one
watermark delay (exactly Flink's buffer bound).
"""

from __future__ import annotations

import pickle

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

Fold = Callable[
    ["bytes | None", pd.DataFrame], "tuple[bytes, pd.DataFrame | None]"
]


def to_epoch_us(col: pd.Series):
    """Event-time column → int64 epoch-µs ndarray, regardless of the
    Arrow batch's datetime64 unit (ns locally, µs from parquet)."""
    return (
        pd.to_datetime(col)
        .values.astype("datetime64[us]")
        .astype("int64")
    )


def watermark_buffered(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    sort_cols: list[str],
    fold: Fold,
    out_schema: StructType | str,
) -> DataFrame:
    """Buffer ``df``'s rows per key until the watermark passes them,
    then feed them — event-time sorted — into ``fold``. ``df`` (or
    every source unioned into it) must carry ``withWatermark`` on the
    column feeding ``ts_col``; without one the watermark never
    advances and nothing is ever released."""

    def update(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            pending, frontier_us, inner = pickle.loads(state.get[0])
        else:
            pending, frontier_us, inner = None, None, None
        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000
        if not state.hasTimedOut:
            new = pd.concat(list(batches))
            if len(new):
                if frontier_us is not None:
                    # late: at or before the frontier already folded —
                    # dropped, Flink's late-element contract (Spark's
                    # stateful operators pre-filter rows older than
                    # the watermark identically)
                    new = new[to_epoch_us(new[ts_col]) > frontier_us]
                pending = (
                    new
                    if pending is None
                    else pd.concat([pending, new], ignore_index=True)
                )
        out = None
        if pending is not None and len(pending):
            mask = to_epoch_us(pending[ts_col]) <= wm_us
            if mask.any():
                released = pending[mask].sort_values(
                    sort_cols, kind="mergesort"
                )
                pending = pending[~mask].reset_index(drop=True)
                inner, out = fold(inner, released)
                frontier_us = (
                    wm_us
                    if frontier_us is None
                    else max(frontier_us, wm_us)
                )
        state.update((pickle.dumps((pending, frontier_us, inner)),))
        if pending is not None and len(pending):
            # wake when the watermark passes the earliest pending row
            # (fires at wm > t, so arm one ms below); must stay above
            # the current watermark per the GroupState contract
            min_ms = int(to_epoch_us(pending[ts_col]).min() // 1000)
            state.setTimeoutTimestamp(max(wm_ms + 1, min_ms - 1))
        if out is not None and len(out):
            yield out

    return df.groupBy(*key_cols).applyInPandasWithState(
        update,
        out_schema,
        "s binary",
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def ordered_assert_apply(
    df: DataFrame,
    key_cols: list[str],
    sort_cols: list[str],
    fold: Fold,
    out_schema: StructType | str,
) -> DataFrame:
    """The unbuffered front end — for sources WITHOUT a watermark,
    where buffering would deadlock (nothing ever releases). Each
    batch's rows are sorted and folded directly; the fold's own
    monotonicity check raises loudly on out-of-order arrival across
    micro-batches (the pre-round-7 ordered-ingest contract, now the
    documented fallback)."""

    def update(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        new = pd.concat(list(batches)).sort_values(
            sort_cols, kind="mergesort"
        )
        inner = state.get[0] if state.exists else None
        inner, out = fold(inner, new)
        state.update((inner,))
        if out is not None and len(out):
            yield out

    return df.groupBy(*key_cols).applyInPandasWithState(
        update,
        out_schema,
        "s binary",
        "append",
        GroupStateTimeout.NoTimeout,
    )
