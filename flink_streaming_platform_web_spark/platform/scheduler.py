"""Periodic monitoring scheduler — SchedulerTask rebuilt
(flink-streaming-web/src/main/java/com/flink/streaming/web/scheduler/SchedulerTask.java:47-128):

- heartbeat every 1 min (:47-56) → ip_status row (leader election
  input — only the lexicographically-smallest live instance sweeps)
- job-status reconciliation every 5 min (:66-78) → manager.reconcile()
  marks dead jobs, alarms via the per-job channels, auto-restarts
- auto-savepoint hourly (:110-128) → registers every running job's
  checkpoint location in savepoint_backup (Spark's checkpoint dir IS
  the savepoint artifact, SURVEY §1.3)

Implementation is a single daemon thread with ``threading.Event.wait``
pacing (no cron dependency): each tick fires whichever tasks are due.
Intervals are constructor args so tests run sub-second cadences. The
push-path (StreamingQueryListener) stays the fast detector; this loop
is the poll-style safety net the reference relies on exclusively.
"""

from __future__ import annotations

import threading
import time

from flink_streaming_platform_web_spark.platform.manager import JobManager

HEARTBEAT_SEC = 60.0  # SchedulerTask.java:48  (cron 1 min)
RECONCILE_SEC = 300.0  # SchedulerTask.java:67  (cron 5 min)
SAVEPOINT_SEC = 3600.0  # SchedulerTask.java:111 (cron hourly)


class MonitorScheduler:
    def __init__(
        self,
        manager: JobManager,
        instance_ip: str = "127.0.0.1",
        heartbeat_sec: float = HEARTBEAT_SEC,
        reconcile_sec: float = RECONCILE_SEC,
        savepoint_sec: float = SAVEPOINT_SEC,
        rpc_adapter=None,
    ) -> None:
        self.manager = manager
        self.instance_ip = instance_ip
        # cluster-mode status adapter (platform/rpc.py); when set the
        # reconcile tick also sweeps YARN/cluster-submitted jobs
        self.rpc_adapter = rpc_adapter
        self.heartbeat_sec = heartbeat_sec
        self.reconcile_sec = reconcile_sec
        self.savepoint_sec = savepoint_sec
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._last = {"heartbeat": 0.0, "reconcile": 0.0, "savepoint": 0.0}
        # observability counters (tests + /api introspection)
        self.ticks = {"heartbeat": 0, "reconcile": 0, "savepoint": 0}

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> "MonitorScheduler":
        if self._thread is not None:
            return self
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(10)
            self._thread = None

    # -- loop --------------------------------------------------------------

    def _loop(self) -> None:
        while not self._stop.is_set():
            self.run_due_tasks()
            # wake often enough for the smallest interval without
            # spinning; tests use sub-second cadences
            self._stop.wait(min(self.heartbeat_sec, self.reconcile_sec) / 4)

    def run_due_tasks(self, now: float | None = None) -> list[str]:
        """Fire every task whose interval elapsed; returns what ran.
        Public so tests (and cron-style external drivers) can tick
        deterministically without the thread."""
        now = time.time() if now is None else now
        ran: list[str] = []
        if now - self._last["heartbeat"] >= self.heartbeat_sec:
            self._last["heartbeat"] = now
            self._safe(self._heartbeat, "heartbeat", ran)
        leader = self.manager.store.is_leader(self.instance_ip)
        if leader and now - self._last["reconcile"] >= self.reconcile_sec:
            self._last["reconcile"] = now
            self._safe(self._reconcile_all, "reconcile", ran)
        if leader and now - self._last["savepoint"] >= self.savepoint_sec:
            self._last["savepoint"] = now
            self._safe(self._auto_savepoint, "savepoint", ran)
        return ran

    def _safe(self, fn, name: str, ran: list[str]) -> None:
        try:
            fn()
            ran.append(name)
            self.ticks[name] += 1
        except Exception as e:  # a failed tick never kills the loop
            self.manager.store.log_alarm(0, "SCHEDULER_ERROR", f"{name}: {e}")

    def _heartbeat(self) -> None:
        self.manager.store.heartbeat(self.instance_ip)

    def _reconcile_all(self) -> None:
        self.manager.reconcile()
        if self.rpc_adapter is not None:
            self.manager.reconcile_remote(self.rpc_adapter)

    def _auto_savepoint(self) -> None:
        """Hourly checkpoint-registry snapshot for every tracked job
        (reference savepoints every RUN job, SchedulerTask.java:110-128)."""
        for job_id in list(self.manager.running):
            self.manager.savepoint(job_id)
