"""Round-5 platform tests: the elasticsearch-7 streaming sink driven
end-to-end against a stdlib HTTP stub (VERDICT r04 item 3 — the
``es_writer`` foreachBatch path, not just the CDC delta branch), plus
regressions for the ADVICE r04 manager/submit/cache fixes."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from flink_streaming_platform_web_spark.streaming.runner import JobRunner


class _BulkStub:
    """Minimal _bulk endpoint: captures NDJSON bodies + headers and
    answers with a canned per-item response (``errors`` settable)."""

    def __init__(self, errors: bool = False):
        captured: list[tuple[str, str]] = []  # (content-type, body)
        stub = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                captured.append(
                    (
                        self.headers.get("Content-Type", ""),
                        self.rfile.read(n).decode(),
                    )
                )
                if stub.errors:
                    body = json.dumps(
                        {
                            "errors": True,
                            "items": [
                                {
                                    "index": {
                                        "_id": "1",
                                        "status": 400,
                                        "error": {
                                            "type": "mapper_parsing_exception"
                                        },
                                    }
                                }
                            ],
                        }
                    ).encode()
                else:
                    body = b'{"errors": false, "items": []}'
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self.errors = errors
        self.captured = captured
        self.srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        threading.Thread(
            target=self.srv.serve_forever, daemon=True
        ).start()

    @property
    def url(self) -> str:
        return f"http://127.0.0.1:{self.srv.server_address[1]}"

    def shutdown(self):
        self.srv.shutdown()


def _orders_feed(tmp_path):
    feed = tmp_path / "es_orders"
    feed.mkdir()
    rows = [
        {"order_id": 1001, "customer_name": "alice", "price": 50.5},
        {"order_id": 1002, "customer_name": "bob", "price": 29.71},
        {"order_id": 1001, "customer_name": "alice", "price": 60.0},
    ]
    (feed / "orders.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows)
    )
    return feed


def test_es_writer_foreachbatch_posts_bulk_upserts(spark, tmp_path):
    """demo_6's enriched_orders sink shape (elasticsearch-7 + PK)
    through the streaming es_writer path: every micro-batch must
    arrive at /_bulk as action/document NDJSON pairs with the PK as
    the document id (upsert contract) and the x-ndjson content type
    (/root/reference/docs/sql_demo/demo_6.md:134-152)."""
    stub = _BulkStub()
    feed = _orders_feed(tmp_path)
    runner = JobRunner(spark, mode="streaming")
    try:
        result = runner.execute_script(
            f"""
            CREATE TABLE orders_src (order_id BIGINT,
              customer_name STRING, price DOUBLE)
            WITH ('connector'='filesystem', 'path'='{feed}',
                  'format'='json');
            CREATE TABLE enriched_orders (order_id BIGINT,
              customer_name STRING, price DOUBLE,
              PRIMARY KEY (order_id) NOT ENFORCED)
            WITH ('connector'='elasticsearch-7',
                  'hosts'='{stub.url}', 'index'='enriched_orders');
            INSERT INTO enriched_orders
            SELECT order_id, customer_name, price FROM orders_src;
            """
        )
        for q in result.streaming_queries:
            q.processAllAvailable()
            q.stop()
            q.awaitTermination(60)
    finally:
        stub.shutdown()
    assert stub.captured, "no bulk POST arrived"
    assert all(
        ct == "application/x-ndjson" for ct, _ in stub.captured
    )
    lines = [
        json.loads(ln)
        for _, body in stub.captured
        for ln in body.strip().splitlines()
    ]
    actions = [ln for ln in lines if "index" in ln and "_index" in ln["index"]]
    docs = [ln for ln in lines if "order_id" in ln]
    # action/doc pairs alternate: equal counts, PK as doc id
    assert len(actions) == len(docs) == 3
    assert {a["index"]["_id"] for a in actions} == {"1001", "1002"}
    assert all(a["index"]["_index"] == "enriched_orders" for a in actions)
    assert {
        (d["order_id"], d["customer_name"], d["price"]) for d in docs
    } == {
        (1001, "alice", 50.5),
        (1002, "bob", 29.71),
        (1001, "alice", 60.0),
    }


def test_es_writer_surfaces_item_failures(spark, tmp_path):
    """ES returns HTTP 200 with per-item failures — the sink must
    fail the streaming query, never drop documents silently."""
    stub = _BulkStub(errors=True)
    feed = _orders_feed(tmp_path)
    runner = JobRunner(spark, mode="streaming")
    try:
        result = runner.execute_script(
            f"""
            CREATE TABLE orders_src2 (order_id BIGINT,
              customer_name STRING, price DOUBLE)
            WITH ('connector'='filesystem', 'path'='{feed}',
                  'format'='json');
            CREATE TABLE es_fail (order_id BIGINT,
              customer_name STRING, price DOUBLE,
              PRIMARY KEY (order_id) NOT ENFORCED)
            WITH ('connector'='elasticsearch-7',
                  'hosts'='{stub.url}', 'index'='es_fail');
            INSERT INTO es_fail
            SELECT order_id, customer_name, price FROM orders_src2;
            """
        )
        q = result.streaming_queries[0]
        with pytest.raises(Exception, match="item failures"):
            q.processAllAvailable()
            if q.exception() is not None:
                raise q.exception()
    finally:
        for q in result.streaming_queries:
            try:
                q.stop()
            except Exception:
                pass
        stub.shutdown()


def test_kill_orphan_child_with_recorded_pid(spark):
    """ADVICE r04 medium: stop() of a STARTING job whose run log holds
    a 'pid:' entry from another process must SIGTERM that pid — the
    local-only `import os` inside _start_process left _kill_orphan_child
    raising NameError, aborting the stop before the STOP write."""
    import subprocess
    import time

    from flink_streaming_platform_web_spark.platform.manager import (
        JobManager,
    )
    from flink_streaming_platform_web_spark.platform.store import JobStore

    child = subprocess.Popen(["sleep", "300"])
    store = JobStore()
    mgr = JobManager(spark, store)
    jid = store.add_job("orphan1", "SELECT 1")
    # simulate a sibling REST server that recorded its child's pid
    # and died mid-start
    store.set_status(jid, "STARTING")
    store.log_run(jid, "STARTING", [f"pid:{child.pid}"])
    try:
        mgr.stop(jid)
        assert store.get_job(jid).status_name == "STOP"
        deadline = time.time() + 10
        while time.time() < deadline and child.poll() is None:
            time.sleep(0.1)
        assert child.poll() is not None, "orphan child was not killed"
    finally:
        if child.poll() is None:
            child.kill()
        child.wait()


def test_submit_staging_dirs_are_tracked_and_cleaned():
    """ADVICE r04: every build_submit_command stages a package zip in
    a fresh tempdir; cleanup_staging must remove them (age-guarded so
    a concurrent in-flight submission's dir survives)."""
    import os

    from flink_streaming_platform_web_spark.platform.submit import (
        build_submit_command,
        cleanup_staging,
    )

    cmd = build_submit_command("job.sql")
    zip_path = cmd[cmd.index("--py-files") + 1].split(",")[0]
    assert os.path.exists(zip_path)
    # too-new dirs survive an age-guarded sweep...
    assert cleanup_staging(min_age_seconds=3600) == 0
    assert os.path.exists(zip_path)
    # ...and are removed by the unconditional one
    assert cleanup_staging() >= 1
    assert not os.path.exists(zip_path)


def test_memo_cache_bounds_cycled_sessions(spark):
    """ADVICE r04: a driver that cycles spark.newSession() within one
    long-lived context must not accumulate persisted DataFrames — the
    LRU cap bounds distinct same-app sessions in the memo."""
    from flink_streaming_platform_web_spark.operators import _cache

    _cache.clear()
    try:
        for i in range(8):
            clone = spark.newSession()
            _cache.memo_df(
                clone,
                "/sf",
                f"probe_{i}",
                lambda: clone.range(2).toDF("id"),
            )
        sids = {k[0] for k in _cache._DF_CACHE}
        assert len(sids) <= _cache._MAX_SESSIONS
    finally:
        _cache.clear()


def test_web_console_and_log_user_routes(spark, tmp_path):
    """The admin console (webui.py — the reference Vue front's
    task/alarm/log/user management as one static page) is served at
    `/`, and the routes it relies on work: runLog / alarmLog rows,
    addUser + token gating (401 once a user exists, token unlocks)."""
    import urllib.request

    from flink_streaming_platform_web_spark.platform.manager import (
        JobManager,
    )
    from flink_streaming_platform_web_spark.platform.rest import serve
    from flink_streaming_platform_web_spark.platform.store import JobStore

    store = JobStore()
    mgr = JobManager(spark, store)
    jid = store.add_job("ui1", "SELECT 1")
    store.log_run(jid, "RUN", ["q-1"])
    store.log_alarm(jid, "DINGDING", "job down")
    server, _ = serve(mgr)
    base = f"http://127.0.0.1:{server.server_address[1]}"

    def get(path, token=None, expect=200):
        req = urllib.request.Request(
            base + path, headers={"token": token} if token else {}
        )
        try:
            with urllib.request.urlopen(req) as r:
                return r.status, r.read()
        except urllib.error.HTTPError as e:
            return e.code, e.read()

    def post(path, body, token=None):
        req = urllib.request.Request(
            base + path,
            data=json.dumps(body).encode(),
            headers={"token": token} if token else {},
        )
        try:
            with urllib.request.urlopen(req) as r:
                return json.loads(r.read())
        except urllib.error.HTTPError as e:
            return json.loads(e.read())

    try:
        status, html = get("/")
        assert status == 200 and b"<!DOCTYPE html>" in html
        # the console shell carries the management panels the
        # reference front ships as Vue views
        for frag in (b"listTask", b"runLog", b"alarmLog",
                     b"setAlarmConfig", b"checkfSql", b"login"):
            assert frag in html, frag
        status, body = get(f"/api/runLog?id={jid}")
        runs = json.loads(body)["data"]
        assert runs and runs[0]["status"] == "RUN"
        status, body = get(f"/api/alarmLog?id={jid}")
        alarms = json.loads(body)["data"]
        assert alarms == [
            {"alarm_type": "DINGDING", "message": "job down"}
        ]
        # user-manage: after the first user, the API locks
        assert post("/api/addUser", {"username": "a", "password": "pw"})[
            "code"
        ] == 200
        assert get(f"/api/runLog?id={jid}")[0] == 401
        # but the console shell itself still serves (login screen)
        assert get("/")[0] == 200
        tok = post(
            "/api/login", {"username": "a", "password": "pw"}
        )["data"]["token"]
        assert get(f"/api/runLog?id={jid}", token=tok)[0] == 200
    finally:
        server.shutdown()
