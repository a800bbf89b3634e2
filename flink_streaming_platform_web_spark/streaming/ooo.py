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
bounded source so buffered elements drain (and ``flink stop --drain``
does the same at shutdown). Spark's file source has no end-of-input
signal, so the analog here is **stop-with-drain**: ``drain_pending``
reads the query's last committed state through Spark's ``statestore``
batch reader after ``StreamingQuery.stop()``, runs the remaining fold
over each key's pending rows exactly as a MAX_WATERMARK release
would (sorted, after the frontier), and returns the tail output rows
for the runner to append to the sink (runner.DrainingQuery wires
this onto ``stop()``). Like Flink's ``--drain``, a drained query must
not be restarted from the same checkpoint (the drained rows would
replay).

Scale shape: identical to the wrapped operator's — one shuffle on the
key columns, state sharded per key across executors in the state
store (checkpointable), per-key pending bounded by the rows inside one
watermark delay (exactly Flink's buffer bound).
"""

from __future__ import annotations

import pickle

from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

Fold = Callable[
    ["bytes | None", pd.DataFrame], "tuple[bytes, pd.DataFrame | None]"
]


@dataclass
class DrainSpec:
    """Everything ``drain_pending`` needs to flush one
    ``watermark_buffered`` operator's keyed state after stop: the
    fold and the release ordering, plus the output schema. Captured
    at plan-build time (``watermark_buffered(..., drain_out=[...])``)
    and carried by the runner next to the started query.
    ``in_cols`` is the buffered input's column list, so a FINAL-aware
    fold (one accepting ``fold(inner, rows, final)``) can be invoked
    with an empty, correctly-columned frame even for keys whose
    pending buffer is empty — a streaming-CEP key may hold everything
    in its inner state (the match buffer tail) and still owe output
    at end-of-input."""

    key_cols: list[str]
    ts_col: str
    sort_cols: list[str]
    fold: Fold
    out_schema: "StructType | str"
    in_cols: "list[str] | None" = None
    #: per-sort-column ascending flags; None = all ascending. The
    #: first (event-time) column is always ascending — secondary
    #: False entries give DESC tie ordering within a timestamp.
    sort_asc: "list[bool] | None" = None


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
    drain_out: "list[DrainSpec] | None" = None,
    sort_asc: "list[bool] | None" = None,
) -> DataFrame:
    """Buffer ``df``'s rows per key until the watermark passes them,
    then feed them — event-time sorted — into ``fold``. ``df`` (or
    every source unioned into it) must carry ``withWatermark`` on the
    column feeding ``ts_col``; without one the watermark never
    advances and nothing is ever released (until stop-with-drain).
    ``drain_out``, when given, receives the operator's ``DrainSpec``
    so the runner can flush pending state at stop."""
    if drain_out is not None:
        drain_out.append(
            DrainSpec(
                key_cols, ts_col, sort_cols, fold, out_schema,
                in_cols=list(df.columns), sort_asc=sort_asc,
            )
        )

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
                # late: at or before the current watermark OR the
                # frontier already folded — dropped, Flink's
                # late-element contract (ts <= watermark). Spark's
                # stateful-operator pre-filter uses the PREVIOUS
                # batch's watermark, so the explicit wm_us cut here
                # closes the one-batch gap (ADVICE r7); wm_ms == 0
                # means no watermark established yet — no cut.
                cut = frontier_us
                if wm_ms > 0:
                    cut = wm_us if cut is None else max(cut, wm_us)
                if cut is not None:
                    new = new[to_epoch_us(new[ts_col]) > cut]
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
                    sort_cols,
                    ascending=(
                        sort_asc if sort_asc is not None else True
                    ),
                    kind="mergesort",
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
            # (fires at wm > t, so arm one ms below); CEIL the µs→ms
            # truncation (ADVICE r7: floor could fire at a watermark
            # that hasn't covered the sub-ms remainder, re-arm at
            # wm+1 and strand the row if the watermark never advances
            # again); must stay above the current watermark per the
            # GroupState contract
            min_us = int(to_epoch_us(pending[ts_col]).min())
            min_ms = -(-min_us // 1000)
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


def _buffered_operator_id(
    spark: SparkSession, checkpoint_loc: str
) -> "int | None":
    """Resolve the ``watermark_buffered`` operator's id from the
    checkpoint's state metadata instead of assuming 0: the runner
    replays the user's outer SELECT around the buffered view, and if
    that adds another stateful operator (GROUP BY, dedup, …) the
    buffered ``applyInPandasWithState`` may not be the first operator
    in the plan — reading operator 0's state would then unpickle
    garbage or fail on the groupState column. Returns None when the
    metadata reader has nothing (no committed batch); raises when the
    plan holds more than one applyInPandasWithState operator (ambiguous
    — drain cannot guess which one carries the buffer)."""
    try:
        ops = (
            spark.read.format("state-metadata")
            .load(checkpoint_loc)
            .select("operatorId", "operatorName")
            .distinct()
            .collect()
        )
    except Exception:
        return None  # no committed batch → no state metadata
    cands = [
        int(r.operatorId)
        for r in ops
        if r.operatorName == "applyInPandasWithState"
    ]
    if len(cands) == 1:
        return cands[0]
    if not cands:
        return None
    raise ValueError(
        "stop-with-drain: checkpoint holds"
        f" {len(cands)} applyInPandasWithState operators"
        f" (ids {sorted(cands)}) — cannot resolve which one is the"
        " watermark buffer; stop without drain"
        " (SET graft.stop.drain = false) and restart instead"
    )


def drain_pending(
    spark: SparkSession,
    checkpoint_loc: str,
    spec: DrainSpec,
    operator_id: "int | None" = None,
) -> "DataFrame | None":
    """Flink's MAX_WATERMARK / ``stop --drain`` analog for a stopped
    ``watermark_buffered`` query: read the operator's last committed
    keyed state through Spark's ``statestore`` batch source, release
    every key's pending rows (sorted by the operator's ORDER BY —
    exactly what a final infinite watermark would release) into the
    fold, and return the resulting tail rows as a batch DataFrame
    (``None`` when the query committed no state). The fold runs
    executor-side via ``mapInPandas`` — one state blob per input row,
    no driver collect — so drain scales with the key count like the
    operator itself."""
    import inspect

    from pyspark.sql import functions as F

    if operator_id is None:
        operator_id = _buffered_operator_id(spark, checkpoint_loc)
        if operator_id is None:
            return None  # no committed batch → nothing pending
    try:
        st = (
            spark.read.format("statestore")
            .option("operatorId", operator_id)
            .load(checkpoint_loc)
        )
    except Exception:
        return None  # no committed batch → no state → nothing pending
    # schema guard: the buffered operator's state is the single binary
    # field "s" — anything else means the resolved operator is NOT the
    # watermark buffer, and unpickling it would yield garbage
    gs = st.schema["value"].dataType["groupState"].dataType
    if [f.name for f in gs.fields] != ["s"] or (
        gs["s"].dataType.typeName() != "binary"
    ):
        raise ValueError(
            f"stop-with-drain: operator {operator_id} state schema is"
            f" {gs.simpleString()}, not the watermark buffer's"
            " (s binary) — refusing to unpickle foreign state"
        )
    # resolve the schema's field names once, driver-side (out_schema
    # may be a DDL string)
    struct = (
        spec.out_schema
        if isinstance(spec.out_schema, StructType)
        else spark.createDataFrame([], spec.out_schema).schema
    )
    names = [f.name for f in struct.fields]
    fold, sort_cols, in_cols = spec.fold, spec.sort_cols, spec.in_cols
    sort_asc = spec.sort_asc if spec.sort_asc is not None else True
    # a 3-parameter fold is END-OF-INPUT aware: drain calls it with
    # final=True so folds holding emittable rows in their INNER state
    # (streaming CEP's match-buffer tail) flush them like batch EOF
    # would; 2-parameter folds (OVER, temporal join) emit only from
    # released rows, so empty-pending keys are skipped outright
    final_aware = len(inspect.signature(fold).parameters) >= 3

    def release(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        outs = []
        for pdf in batches:
            for blob in pdf["s"]:
                if blob is None:
                    continue
                pending, _frontier, inner = pickle.loads(bytes(blob))
                has_pending = pending is not None and len(pending)
                if not has_pending and not final_aware:
                    continue
                released = (
                    pending.sort_values(
                        sort_cols, ascending=sort_asc,
                        kind="mergesort",
                    )
                    if has_pending
                    else pd.DataFrame(columns=in_cols or [])
                )
                if final_aware:
                    _, out = fold(inner, released, True)
                else:
                    _, out = fold(inner, released)
                if out is not None and len(out):
                    outs.append(out.reindex(columns=names))
        if outs:
            yield pd.concat(outs, ignore_index=True)

    return st.select(
        F.col("value.groupState.s").alias("s")
    ).mapInPandas(release, struct)


def ordered_assert_apply(
    df: DataFrame,
    key_cols: list[str],
    sort_cols: list[str],
    fold: Fold,
    out_schema: StructType | str,
    sort_asc: "list[bool] | None" = None,
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
            sort_cols,
            ascending=sort_asc if sort_asc is not None else True,
            kind="mergesort",
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
