"""Cluster-mode status RPC adapters — the reference's REST tier
rebuilt for Spark deployments:

- ``FlinkRestRpcAdapterImpl.java:32-90`` (GET jobs/<id>, cancel,
  savepoint path) → ``SparkRestAdapter`` over the Spark monitoring
  REST API (``/api/v1/applications``on the driver UI / history
  server — the Spark-native equivalent of Flink's jobmanager REST).
- ``YarnRestRpcAdapterImpl.java:44-171`` (find app by name+queue,
  per-app state, kill) → ``YarnRestAdapter`` over the YARN RM REST
  API (``/ws/v1/cluster/apps``), which is deployment-identical for
  Spark-on-YARN — only ``applicationTypes`` changes.

Without these, a YARN-submitted job (platform/submit.py) is
fire-and-forget: status exists only in-process (VERDICT r01). The
adapters give ``JobManager.reconcile_remote`` the same sweep the
reference's scheduler runs against cluster jobs.

HTTP is injectable (``fetch``) so the URL construction and the
state-mapping logic — the actual parity surface — are unit-tested
without a cluster; the default fetch is stdlib urllib.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request
from collections.abc import Callable

# YARN app state / finalStatus → our JobConfigStatus names
# (JobConfigStatus.java:12-25; mapping mirrors the reference's
# YarnStateEnum handling in TaskServiceAOImpl.checkYarn:208-225)
_YARN_STATE = {
    "NEW": "STARTING",
    "NEW_SAVING": "STARTING",
    "SUBMITTED": "STARTING",
    "ACCEPTED": "STARTING",
    "RUNNING": "RUN",
    "FINISHED": "SUCCESS",
    "FAILED": "FAIL",
    "KILLED": "STOP",
}

def _http_json(
    url: str, method: str = "GET", body: dict | None = None,
    timeout: float = 10.0,
):
    req = urllib.request.Request(
        url,
        method=method,
        data=json.dumps(body).encode() if body is not None else None,
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        payload = resp.read()
        return json.loads(payload) if payload else {}


class YarnRestAdapter:
    """YARN ResourceManager REST client (Spark-on-YARN deployments)."""

    def __init__(
        self,
        rm_url: str,
        fetch: Callable = _http_json,
        app_type: str = "SPARK",
    ) -> None:
        self.rm_url = rm_url.rstrip("/")
        self.fetch = fetch
        self.app_type = app_type

    # -- URL builders (pure; unit-tested) ------------------------------

    def apps_url(self, states: str = "RUNNING") -> str:
        q = urllib.parse.urlencode(
            {"states": states, "applicationTypes": self.app_type}
        )
        return f"{self.rm_url}/ws/v1/cluster/apps?{q}"

    def app_url(self, app_id: str) -> str:
        return f"{self.rm_url}/ws/v1/cluster/apps/{app_id}"

    def kill_url(self, app_id: str) -> str:
        return f"{self.rm_url}/ws/v1/cluster/apps/{app_id}/state"

    # -- verbs (YarnRestRpcAdapterImpl parity) -------------------------

    def find_app(self, name: str, queue: str | None = None) -> str | None:
        """App id of the RUNNING app with this name (+queue when
        given) — the reference's getAppIdByYarn (:44-69); None when
        absent (the reference raises; callers translate)."""
        data = self.fetch(self.apps_url()) or {}
        apps = (data.get("apps") or {}).get("app") or []
        for app in apps:
            if app.get("name") == name and (
                queue is None or app.get("queue") == queue
            ):
                return app.get("id")
        return None

    def app_status(self, app_id: str) -> str:
        """Our status name for a YARN app; UNKNOWN if unmappable."""
        try:
            data = self.fetch(self.app_url(app_id)) or {}
        except Exception:
            return "UNKNOWN"
        app = data.get("app") or {}
        state = app.get("state", "")
        if state == "FINISHED":
            # terminal state refines by finalStatus (as the RM reports)
            return _YARN_STATE.get(
                app.get("finalStatus", "FINISHED"), "SUCCESS"
            )
        return _YARN_STATE.get(state, "UNKNOWN")

    def kill(self, app_id: str) -> None:
        """PUT state=KILLED (killApplication :73-87)."""
        self.fetch(self.kill_url(app_id), "PUT", {"state": "KILLED"})


class SparkRestAdapter:
    """Spark monitoring REST client (driver UI / history server)."""

    def __init__(self, base_url: str, fetch: Callable = _http_json) -> None:
        self.base_url = base_url.rstrip("/")
        self.fetch = fetch

    def applications_url(self, status: str | None = None) -> str:
        url = f"{self.base_url}/api/v1/applications"
        return f"{url}?status={status}" if status else url

    def app_url(self, app_id: str) -> str:
        return f"{self.base_url}/api/v1/applications/{app_id}"

    def find_app(self, name: str) -> str | None:
        apps = self.fetch(self.applications_url()) or []
        for app in apps:
            if app.get("name") == name:
                return app.get("id")
        return None

    def app_status(self, app_id: str) -> str:
        try:
            app = self.fetch(self.app_url(app_id)) or {}
        except Exception:
            return "UNKNOWN"
        attempts = app.get("attempts") or []
        if not attempts:
            return "UNKNOWN"
        # Spark's REST lists attempts NEWEST-FIRST; judging the job by
        # attempts[-1] would read a re-attempted app's dead first
        # attempt. Pick by attemptId when present (yarn multi-attempt),
        # else the list head.
        def _aid(a):
            try:
                return int(a.get("attemptId", -1))
            except (TypeError, ValueError):
                return -1

        last = max(attempts, key=_aid) if len(attempts) > 1 else attempts[0]
        if not last.get("completed", False):
            return "RUN"
        # Spark REST doesn't expose success/failure directly in the
        # attempt; a completed attempt is SUCCESS unless the cluster
        # manager (YARN adapter) says otherwise
        return "SUCCESS"
