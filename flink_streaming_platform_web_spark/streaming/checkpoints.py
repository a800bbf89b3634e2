"""Checkpoint configuration mapping.

Rebuilds ``CheckPointParams.buildCheckPointParam`` /
``FsCheckPoint.setCheckpoint``
(flink-streaming-core/src/main/java/com/flink/streaming/core/checkpoint/,
defaults at CheckPointParam.java:20-52) onto Spark Structured
Streaming's model:

| Flink knob (reference default) | Spark mapping |
|---|---|
| checkpointInterval (60 s)      | trigger(processingTime=…) — Spark checkpoints every micro-batch |
| checkpointingMode EXACTLY_ONCE | exactly-once state + idempotent/upsert sinks (SURVEY §7.3) |
| checkpointDir                  | checkpointLocation per query |
| stateBackendType ROCKSDB       | RocksDB state store provider |
| externalized retention         | checkpoints always survive the query (registry = savepoint list) |
| tolerableCheckpointFailureNumber | n/a — Spark fails the batch and retries from the last checkpoint |
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class CheckPointParam:
    """Mirrors CheckPointParam.java fields + defaults (:20-52)."""

    checkpoint_dir: str | None = None
    checkpoint_interval_ms: int = 60_000
    checkpointing_mode: str = "EXACTLY_ONCE"
    checkpoint_timeout_ms: int = 600_000
    tolerable_failures: int = 1
    state_backend: str = "FILE"  # MEMORY | FILE | ROCKSDB


def spark_confs(p: CheckPointParam) -> dict[str, str]:
    """Session-level confs implied by the checkpoint param."""
    confs: dict[str, str] = {}
    if p.state_backend.upper() == "ROCKSDB":
        confs["spark.sql.streaming.stateStore.providerClass"] = (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        )
        # incremental-checkpoint analog (Flink rocksdb incremental)
        confs[
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
        ] = "true"
    return confs


def trigger_kwargs(p: CheckPointParam) -> dict[str, str]:
    """writeStream.trigger(**kwargs) — checkpoint cadence maps to the
    micro-batch trigger interval. Milliseconds pass through directly:
    integer-dividing to seconds silently turned sub-second intervals
    into '0 seconds' (= as-fast-as-possible)."""
    return {"processingTime": f"{p.checkpoint_interval_ms} milliseconds"}
