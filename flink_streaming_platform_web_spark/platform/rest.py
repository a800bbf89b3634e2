"""REST facade over the job platform — `JobConfigApiController` +
`SqlValidationController` verb parity
(flink-streaming-web/src/main/java/com/flink/streaming/web/controller/api/JobConfigApiController.java:89-415,
SqlValidationController.java:25-43), on the standard library's
threading HTTP server (no web-framework dependency in this
container; the CLI remains the scripting surface).

Routes (JSON in/out, reference verb names kept):

    POST /api/addConfig        {name, sql, job_type?, checkpoint_dir?}
    POST /api/editConfig       {id, sql}
    POST /api/start            {id, savepoint_id?}
    POST /api/stop             {id}
    POST /api/open             {id}
    POST /api/close            {id}
    POST /api/delete           {id}
    POST /api/copyConfig       {id, name?}
    POST /api/deployFlinkTask  {name, sql, job_type?} (add + start)
    POST /api/savepoint        {id}
    POST /api/checkfSql        {sql, job_type?}
    POST /api/setAlarmConfig   {id, types: ["DINGDING", ...]}
    POST /api/login            {username, password} → {token}
    POST /api/logout           {}
    POST /api/addUser          {username, password}
    GET  /                     the admin console (webui.py — the
                               reference Vue front's task/alarm/log/
                               user management as one static page)
    GET  /api/runLog?id=N      job_run_log rows (log-manage)
    GET  /api/alarmLog?id=N    alart_log rows (alarm-manage)
    GET  /api/status?id=N
    GET  /api/metrics?id=N   (per-query lastProgress — job-detail metrics)
    GET  /api/savepoints?id=N (savepoint ids for /api/start restore)
    GET  /api/listTask
    GET  /api/jobConfigHistoryPage?id=N
    GET  /api/jobConfigHistoryDetail?id=N&version=V

Responses mirror the reference's RestResult envelope:
``{"code": 200, "message": "success", "data": …}``; errors use
code 500 with the exception text (SystemConstants parity is not
byte-level — the envelope shape is).

Auth (user table parity, flink_web.sql:171-187): once any user exists
in the store, every route except /api/login requires a valid
``token`` header obtained from login; with no users registered the
facade stays open (embedded/test mode).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from flink_streaming_platform_web_spark.platform.manager import JobManager
from flink_streaming_platform_web_spark.sql.validation import validate_script


def _envelope(data=None, code: int = 200, message: str = "success") -> bytes:
    return json.dumps(
        {"code": code, "message": message, "data": data}
    ).encode()


class _Handler(BaseHTTPRequestHandler):
    manager: JobManager  # set by serve()

    def log_message(self, *args) -> None:  # quiet server
        pass

    def _reply(self, body: bytes, status: int = 200) -> None:
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _body(self) -> dict:
        n = int(self.headers.get("Content-Length", 0))
        return json.loads(self.rfile.read(n) or b"{}")

    def _authorized(self, path: str) -> bool:
        store = self.manager.store
        if path == "/api/login" or not store.has_users():
            return True
        return store.check_token(self.headers.get("token")) is not None

    def do_GET(self) -> None:  # noqa: N802 (stdlib API)
        mgr = self.manager
        url = urlparse(self.path)
        q = {k: v[0] for k, v in parse_qs(url.query).items()}
        if url.path in ("/", "/index.html", "/ui"):
            # the admin console (webui.py) — static shell, no auth:
            # every API call it makes carries the token header and is
            # authorized per-route like any other client
            from flink_streaming_platform_web_spark.platform.webui import (
                CONSOLE_HTML,
            )

            body = CONSOLE_HTML.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        if not self._authorized(url.path):
            self._reply(_envelope(None, 401, "login required"), 401)
            return
        try:
            if url.path == "/api/status":
                data = {"status": mgr.status(int(q["id"]))}
            elif url.path == "/api/metrics":
                data = mgr.metrics(int(q["id"]))
            elif url.path == "/api/savepoints":
                data = [
                    {"savepoint_id": sid, "checkpoint_dir": path_}
                    for sid, path_ in mgr.store.savepoints_with_ids(
                        int(q["id"])
                    )
                ]
            elif url.path == "/api/jobConfigHistoryDetail":
                data = {
                    "version": int(q["version"]),
                    "sql": mgr.store.history_detail(
                        int(q["id"]), int(q["version"])
                    ),
                }
            elif url.path == "/api/listTask":
                data = [
                    {
                        "id": j.id,
                        "job_name": j.job_name,
                        "job_type": j.job_type,
                        "status": j.status_name,
                    }
                    for j in mgr.store.list_jobs()
                ]
            elif url.path == "/api/jobConfigHistoryPage":
                data = [
                    {"version": v, "sql": s}
                    for v, s in mgr.store.history(int(q["id"]))
                ]
            elif url.path == "/api/runLog":
                # log-manage parity (LogController / job_run_log)
                data = [
                    {
                        "run_id": rid,
                        "status": status,
                        "query_ids": qids,
                        "message": message,
                    }
                    for rid, status, qids, message in mgr.store.runs(
                        int(q["id"])
                    )
                ]
            elif url.path == "/api/alarmLog":
                # alarm-manage parity (alart_log)
                data = [
                    {"alarm_type": t, "message": m}
                    for t, m in mgr.store.alarms(int(q["id"]))
                ]
            else:
                self._reply(_envelope(None, 404, "not found"), 404)
                return
            self._reply(_envelope(data))
        except Exception as e:  # envelope-style error (reference parity)
            self._reply(_envelope(None, 500, str(e)), 500)

    def do_POST(self) -> None:  # noqa: N802 (stdlib API)
        mgr = self.manager
        path = urlparse(self.path).path
        if not self._authorized(path):
            self._reply(_envelope(None, 401, "login required"), 401)
            return
        try:
            b = self._body()
            if path == "/api/login":
                data = {
                    "token": mgr.store.login(b["username"], b["password"])
                }
            elif path == "/api/logout":
                mgr.store.logout(self.headers.get("token") or "")
                data = None
            elif path == "/api/open":
                mgr.open_job(int(b["id"]))
                data = None
            elif path == "/api/close":
                mgr.close_job(int(b["id"]))
                data = None
            elif path == "/api/delete":
                mgr.delete_job(int(b["id"]))
                data = None
            elif path == "/api/copyConfig":
                data = {"id": mgr.copy_job(int(b["id"]), b.get("name"))}
            elif path == "/api/deployFlinkTask":
                jid = mgr.store.add_job(
                    b["name"],
                    b["sql"],
                    job_type=b.get("job_type", "streaming"),
                    checkpoint_dir=b.get("checkpoint_dir"),
                )
                result = mgr.start(jid)
                data = {"id": jid, "queries": result.query_ids}
            elif path == "/api/setAlarmConfig":
                mgr.store.set_alarm_types(int(b["id"]), b.get("types", []))
                data = None
            elif path == "/api/addConfig":
                jid = mgr.store.add_job(
                    b["name"],
                    b["sql"],
                    job_type=b.get("job_type", "streaming"),
                    checkpoint_dir=b.get("checkpoint_dir"),
                )
                data = {"id": jid}
            elif path == "/api/editConfig":
                mgr.store.update_script(int(b["id"]), b["sql"])
                data = None
            elif path == "/api/start":
                sp = b.get("savepoint_id")
                result = mgr.start(
                    int(b["id"]),
                    int(sp) if sp is not None else None,
                )
                data = {"queries": result.query_ids}
            elif path == "/api/stop":
                mgr.stop(int(b["id"]))
                data = None
            elif path == "/api/savepoint":
                data = {"checkpoint_dir": mgr.savepoint(int(b["id"]))}
            elif path == "/api/addUser":
                # user-manage parity (UserController.add): open only
                # until the first user exists, then token-gated like
                # every other verb
                data = {
                    "id": mgr.store.add_user(
                        b["username"], b["password"]
                    )
                }
            elif path == "/api/checkfSql":
                v = validate_script(
                    b["sql"], mgr.spark, b.get("job_type", "streaming")
                )
                data = {"ok": v.ok, "errors": v.errors}
            else:
                self._reply(_envelope(None, 404, "not found"), 404)
                return
            self._reply(_envelope(data))
        except PermissionError as e:
            self._reply(_envelope(None, 401, str(e)), 401)
        except Exception as e:
            self._reply(_envelope(None, 500, str(e)), 500)


def serve(
    manager: JobManager, host: str = "127.0.0.1", port: int = 0
) -> tuple[ThreadingHTTPServer, threading.Thread]:
    """Start the facade on a daemon thread; returns (server, thread).
    ``port=0`` binds an ephemeral port (``server.server_address``)."""
    handler = type("BoundHandler", (_Handler,), {"manager": manager})
    server = ThreadingHTTPServer((host, port), handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server, thread
