"""Keyed upsert sink — the retraction/changelog gap closer.

Flink streams retractions to PRIMARY-KEY sinks natively; Spark has no
retract streams, so every updating result routes through
``foreachBatch`` + keyed MERGE (SURVEY §7.3 calls this the single
biggest semantic gap — isolated here).

Per micro-batch, an updating aggregate emits only the keys it touched,
so the MERGE workload is bounded by update rate, not table size. The
in-process store below serves tests and console-style sinks; at scale
the same ``foreach_batch_upsert`` callback body becomes a Delta
``MERGE INTO`` or a JDBC batched upsert (see
sources/registry.build_merge_sql) — the streaming-side contract is
identical.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession


class KeyedStore:
    """Thread-safe keyed row store: the convergence target for
    update-mode aggregates and CDC materializations."""

    def __init__(self, key_cols: list[str]) -> None:
        self.key_cols = key_cols
        self.rows: dict[tuple, dict] = {}
        self.schema = None
        self._lock = threading.Lock()

    def _key(self, row: dict) -> tuple:
        return tuple(row[k] for k in self.key_cols)

    def upsert(self, row: dict) -> None:
        with self._lock:
            self.rows[self._key(row)] = row

    def delete(self, row: dict) -> None:
        with self._lock:
            self.rows.pop(self._key(row), None)

    def merge_batch(self, batch: DataFrame) -> None:
        # collect(): ONE job for the whole micro-batch.
        # toLocalIterator ran one sequential job PER PARTITION of the
        # foreachBatch frame — with the state stores now sized to all
        # cores (round 12) that multiplied scheduling by 32 and
        # serialized the sink; the driver-side volume is identical
        self.schema = batch.schema
        for row in batch.collect():
            self.upsert(row.asDict())

    def replace_batch(self, batch: DataFrame) -> None:
        """Full-result replacement: the MERGE shape for recomputed
        joins/aggregates where a key absent from the new result must
        DISAPPEAR from the sink (delete propagation — demo_6's CDC
        join drops the enriched row when the order is deleted). At
        scale this becomes MERGE ... WHEN NOT MATCHED BY SOURCE THEN
        DELETE; in-process it is an atomic swap."""
        self.schema = batch.schema
        rows = {
            self._key(r.asDict()): r.asDict()
            for r in batch.collect()
        }
        with self._lock:
            self.rows = rows

    def to_df(self, spark: SparkSession) -> DataFrame:
        with self._lock:
            rows = list(self.rows.values())
        if self.schema is None:
            raise ValueError("store is empty — no schema observed yet")
        return spark.createDataFrame(rows, self.schema)


class GroupReplaceStore(KeyedStore):
    """Keyed store whose upsert unit is a GROUP of rows: each batch
    replaces every group key it touches with that key's full new row
    set. The convergence target for operators that re-emit a key's
    complete current result per update (e.g. the sessionize operator,
    whose session list for a user can shrink as sessions merge —
    row-level upsert would leave stale session rows behind)."""

    def __init__(self, group_cols: list[str], row_cols: list[str]) -> None:
        super().__init__(group_cols + row_cols)
        self.group_cols = group_cols

    def merge_batch(self, batch: DataFrame) -> None:
        self.schema = batch.schema
        rows = [r.asDict() for r in batch.collect()]
        touched = {tuple(r[c] for c in self.group_cols) for r in rows}
        with self._lock:
            self.rows = {
                k: v
                for k, v in self.rows.items()
                if tuple(
                    v[c] for c in self.group_cols
                ) not in touched
            }
            for row in rows:
                self.rows[self._key(row)] = row


class CombiningStore(KeyedStore):
    """Keyed store whose merge COMBINES per-batch aggregate deltas
    into the held row instead of replacing it — the sink half of the
    incremental-aggregation contract (Flink's per-key agg state,
    StreamExecGroupAggregate): each micro-batch contributes only its
    own partial (SUM/COUNT deltas, MIN/MAX candidates) and the store
    folds them. Valid for append-only inputs and algebraic aggregates;
    retraction would need the full changelog path (streaming/cdc.py).
    At scale the identical fold runs server-side: SUM → `UPDATE SET x
    = x + EXCLUDED.x`, MIN/MAX → `LEAST/GREATEST(x, EXCLUDED.x)` in
    the jdbc MERGE (sources/registry.build_merge_sql's shape)."""

    #: combiner ops: new = op(old, delta); COUNT combines as "sum"
    OPS = ("sum", "min", "max")

    def __init__(
        self, key_cols: list[str], combiners: dict[str, str]
    ) -> None:
        super().__init__(key_cols)
        bad = {op for op in combiners.values()} - set(self.OPS)
        if bad:
            raise ValueError(f"unknown combiner ops: {bad}")
        self.combiners = combiners
        #: fold ledger — one (delta_row_count) entry per applied batch,
        #: appended by merge_batch; diagnosing a lost/replayed
        #: micro-batch needs to see what actually folded
        self.applied: list[int] = []

    @staticmethod
    def _combine(op: str, old, new):
        if old is None:
            return new
        if new is None:
            return old
        if op == "sum":
            return old + new
        if op == "min":
            return new if new < old else old
        return new if new > old else old

    def merge_batch(self, batch: DataFrame) -> None:
        self.schema = batch.schema
        # drain the batch FULLY before touching state: combining is
        # not idempotent, so a mid-iteration failure must leave the
        # store untouched or the foreachBatch retry double-counts the
        # rows that had already folded
        deltas = [row.asDict() for row in batch.collect()]
        self.applied.append(len(deltas))
        with self._lock:
            for delta in deltas:
                k = self._key(delta)
                held = self.rows.get(k)
                if held is None:
                    self.rows[k] = delta
                else:
                    merged = dict(held)
                    for col, op in self.combiners.items():
                        merged[col] = self._combine(
                            op, held.get(col), delta.get(col)
                        )
                    self.rows[k] = merged


def foreach_batch_upsert(store: KeyedStore):
    """foreachBatch callback: MERGE the micro-batch into the store.
    Epoch id makes redelivery idempotent by construction here (upsert
    of the same keys is a no-op on replay) — the Spark-side half of
    the reference's EXACTLY_ONCE checkpoint mode
    (FsCheckPoint.java:41-48); see SURVEY §7.3 on sink idempotency.
    """

    def apply(batch: DataFrame, epoch_id: int) -> None:
        store.merge_batch(batch)

    return apply
