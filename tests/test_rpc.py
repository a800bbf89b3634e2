"""Cluster-mode status RPC adapters (platform/rpc.py) — URL/parity
surface tested with a stubbed fetch (no cluster in the container;
the HTTP layer is stdlib urllib behind the same callable)."""

from __future__ import annotations

import pytest

from flink_streaming_platform_web_spark.platform.rpc import (
    SparkRestAdapter,
    YarnRestAdapter,
)


class StubFetch:
    def __init__(self, responses: dict) -> None:
        self.responses = responses
        self.calls: list[tuple] = []

    def __call__(self, url, method="GET", body=None, timeout=10.0):
        self.calls.append((method, url, body))
        for key, resp in self.responses.items():
            if key in url:
                if isinstance(resp, Exception):
                    raise resp
                return resp
        return {}


def test_yarn_urls_and_find_app():
    fetch = StubFetch(
        {
            "/ws/v1/cluster/apps?": {
                "apps": {
                    "app": [
                        {"id": "application_1_2", "name": "jobA",
                         "queue": "prod"},
                        {"id": "application_1_3", "name": "jobB",
                         "queue": "dev"},
                    ]
                }
            }
        }
    )
    y = YarnRestAdapter("http://rm:8088/", fetch)
    assert y.apps_url() == (
        "http://rm:8088/ws/v1/cluster/apps?states=RUNNING"
        "&applicationTypes=SPARK"
    )
    assert y.find_app("jobB") == "application_1_3"
    assert y.find_app("jobA", queue="prod") == "application_1_2"
    assert y.find_app("jobA", queue="dev") is None
    assert y.find_app("missing") is None


@pytest.mark.parametrize(
    ("state", "final", "expected"),
    [
        ("RUNNING", None, "RUN"),
        ("ACCEPTED", None, "STARTING"),
        ("FINISHED", "SUCCEEDED", "SUCCESS"),
        ("FINISHED", "FAILED", "FAIL"),
        ("FINISHED", "KILLED", "STOP"),
        ("FAILED", None, "FAIL"),
        ("KILLED", None, "STOP"),
        ("WEIRD", None, "UNKNOWN"),
    ],
)
def test_yarn_state_mapping(state, final, expected):
    app = {"state": state}
    if final:
        app["finalStatus"] = final
    fetch = StubFetch({"/apps/application_9": {"app": app}})
    y = YarnRestAdapter("http://rm:8088", fetch)
    assert y.app_status("application_9") == expected


def test_yarn_kill_puts_killed_state():
    fetch = StubFetch({})
    YarnRestAdapter("http://rm:8088", fetch).kill("application_9")
    method, url, body = fetch.calls[0]
    assert method == "PUT"
    assert url.endswith("/ws/v1/cluster/apps/application_9/state")
    assert body == {"state": "KILLED"}


def test_yarn_unreachable_is_unknown():
    y = YarnRestAdapter("http://rm:8088", StubFetch({"apps": OSError("down")}))
    assert y.app_status("application_9") == "UNKNOWN"


def test_spark_rest_adapter():
    fetch = StubFetch(
        {
            "/api/v1/applications/app-2": {
                "id": "app-2",
                "attempts": [{"completed": False}],
            },
            "/api/v1/applications": [
                {"id": "app-1", "name": "bench"},
                {"id": "app-2", "name": "etl"},
            ],
        }
    )
    s = SparkRestAdapter("http://driver:4040", fetch)
    assert s.applications_url("running").endswith("?status=running")
    assert s.find_app("etl") == "app-2"
    assert s.app_status("app-2") == "RUN"
    fetch.responses["/api/v1/applications/app-2"] = {
        "attempts": [{"completed": True}]
    }
    assert s.app_status("app-2") == "SUCCESS"


def test_manager_remote_sweep(spark):
    """track_remote + reconcile_remote: a dead cluster app flips the
    job status via the adapter and alarms; healthy apps untouched."""
    from flink_streaming_platform_web_spark.platform.manager import JobManager
    from flink_streaming_platform_web_spark.platform.store import JobStore

    store = JobStore()
    mgr = JobManager(spark, store)
    j_ok = store.add_job("remote_ok", "sql", deploy_mode="YARN")
    j_dead = store.add_job("remote_dead", "sql", deploy_mode="YARN")
    mgr.track_remote(j_ok, "application_1")
    mgr.track_remote(j_dead, "application_2")
    assert mgr.status(j_ok) == "RUN"
    fetch = StubFetch(
        {
            "apps/application_1": {"app": {"state": "RUNNING"}},
            "apps/application_2": {
                "app": {"state": "FINISHED", "finalStatus": "FAILED"}
            },
        }
    )
    adapter = YarnRestAdapter("http://rm:8088", fetch)
    affected = mgr.reconcile_remote(adapter)
    assert affected == [j_dead]
    assert mgr.status(j_dead) == "FAIL"
    assert mgr.status(j_ok) == "RUN"
    assert j_ok in mgr.remote_apps and j_dead not in mgr.remote_apps
    assert store.alarms(j_dead)[0][0] == "JOB_DOWN"


def test_spark_rest_multi_attempt_judges_latest():
    """Spark's REST lists attempts newest-first; a re-attempted app
    must be judged by its LATEST attempt (highest attemptId), not the
    dead first one."""
    from flink_streaming_platform_web_spark.platform.rpc import (
        SparkRestAdapter,
    )

    a = SparkRestAdapter("http://x")
    a.fetch = lambda url: {
        "attempts": [
            {"attemptId": "2", "completed": False},  # running retry
            {"attemptId": "1", "completed": True},   # dead first try
        ]
    }
    assert a.app_status("app_1") == "RUN"
