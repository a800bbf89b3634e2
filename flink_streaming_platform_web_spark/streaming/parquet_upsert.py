"""Durable keyed-upsert sink on plain parquet — MERGE emulation.

The reference's PRIMARY-KEY sinks upsert into MySQL/ES; the in-process
``KeyedStore`` mirrors that for tests. This sink is the durable
filesystem variant without a lakehouse format: per micro-batch,

    new_state = current_state ANTI-JOIN batch (on keys)  ∪  batch

written to a fresh version directory and published by atomically
replacing a pointer file (write-temp + os.replace). Readers always see
a complete version; a crash mid-write leaves the previous pointer
intact. The pointer records the last applied epoch id, so foreachBatch
redelivery after recovery is a no-op — effective exactly-once on top
of Spark's at-least-once replay (SURVEY §7.3).

Scale note: the anti-join rewrites the full state per batch, which is
the honest cost of MERGE without a table format's file-level pruning;
at 100 TB you bucket the state dir by key (bucketBy) so the anti-join
co-locates, or swap this class for Delta/Iceberg MERGE — the runner
contract (foreachBatch callable) is identical.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


class ParquetUpsertSink:
    def __init__(self, path: str, key_cols: list[str]) -> None:
        self.path = path
        self.key_cols = key_cols
        os.makedirs(path, exist_ok=True)

    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_CURRENT")

    def _load_pointer(self) -> dict:
        try:
            with open(self._pointer) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return {"version": 0, "last_epoch": -1}

    def _publish(self, version: int, epoch_id: int) -> None:
        tmp = self._pointer + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": version, "last_epoch": epoch_id}, f)
        os.replace(tmp, self._pointer)

    def read_state(self, spark: SparkSession) -> DataFrame | None:
        ptr = self._load_pointer()
        if ptr["version"] == 0:
            return None
        return spark.read.parquet(
            os.path.join(self.path, f"v{ptr['version']}")
        )

    def publish_state(self, state: DataFrame) -> None:
        """Replace-publish: the given DataFrame IS the new full state
        (the CDC re-join's contract — keys absent from it are thereby
        deleted). Same versioned-dir + atomic-pointer protocol as the
        merge path; the version doubles as the epoch (the CDC path
        replays from scratch on restart, so epoch replay-skip has no
        meaning here)."""
        ptr = self._load_pointer()
        version = ptr["version"] + 1
        state.write.mode("overwrite").parquet(
            os.path.join(self.path, f"v{version}")
        )
        self._publish(version, version)

    def foreach_batch(self):
        def apply(batch: DataFrame, epoch_id: int) -> None:
            spark = batch.sparkSession
            ptr = self._load_pointer()
            if epoch_id <= ptr["last_epoch"]:
                return  # replayed batch already applied
            current = self.read_state(spark)
            if current is None:
                new_state = batch
            else:
                new_state = current.join(
                    batch.select(*self.key_cols).distinct(),
                    self.key_cols,
                    "left_anti",
                ).unionByName(batch)
            version = ptr["version"] + 1
            new_state.write.mode("overwrite").parquet(
                os.path.join(self.path, f"v{version}")
            )
            self._publish(version, epoch_id)

        return apply
