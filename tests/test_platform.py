"""Platform-tier tests: job store semantics, lifecycle transitions,
monitoring/alarm flow, submit-command whitelist, CLI verbs."""

from __future__ import annotations

import json

import pytest

from flink_streaming_platform_web_spark.platform.manager import (
    AlarmConfig,
    JobManager,
)
from flink_streaming_platform_web_spark.platform.store import JobStore
from flink_streaming_platform_web_spark.platform.submit import (
    SubmitConfigError,
    build_submit_command,
    check_run_config,
)

BATCH_SCRIPT = """
CREATE TABLE g (a INT) WITH ('connector'='datagen',
  'number-of-rows'='10', 'fields.a.kind'='sequence',
  'fields.a.start'='1', 'fields.a.end'='10');
CREATE TABLE m_plat (a INT) WITH ('connector'='memory');
INSERT INTO m_plat SELECT a FROM g;
"""


def test_store_roundtrip_and_history():
    store = JobStore()
    jid = store.add_job("j1", "INSERT INTO x SELECT 1;")
    assert store.get_job(jid).status_name == "STOP"
    store.update_script(jid, "INSERT INTO x SELECT 2;")
    assert [v for v, _ in store.history(jid)] == [0, 1]
    assert store.get_job(jid).version == 1


def test_optimistic_lock():
    store = JobStore()
    jid = store.add_job("j2", "x")
    v = store.get_job(jid).version
    assert store.set_status(jid, "STARTING", v)
    # stale version must be rejected (reference: duplicate-start guard)
    assert not store.set_status(jid, "STARTING", v)


def test_manager_batch_lifecycle(spark):
    store = JobStore()
    mgr = JobManager(spark, store)
    jid = store.add_job("batch1", BATCH_SCRIPT, job_type="batch")
    result = mgr.start(jid)
    assert result.batch_results["m_plat"] == 10
    assert mgr.status(jid) == "SUCCESS"
    runs = store.runs(jid)
    assert runs[-1][1] == "SUCCESS"


def test_manager_rejects_invalid_script(spark):
    store = JobStore()
    mgr = JobManager(spark, store)
    jid = store.add_job("bad", "CREATE TABLE t (a INT) WITH ('connector'='print');")
    with pytest.raises(ValueError, match="validation failed"):
        mgr.start(jid)


def test_manager_streaming_stop_records_savepoint(spark, sf_dir, tmp_path):
    from flink_streaming_platform_web_spark.tables import load

    src = f"{tmp_path}/plat_src"
    load(spark, sf_dir, "events").select("event_type", "value").write.parquet(src)
    store = JobStore()
    mgr = JobManager(spark, store)
    jid = store.add_job(
        "s1",
        f"""
        CREATE TABLE src (event_type STRING, value DOUBLE) WITH
          ('connector'='filesystem','path'='{src}','format'='parquet');
        CREATE TABLE snk (event_type STRING, n BIGINT,
          PRIMARY KEY (event_type) NOT ENFORCED) WITH ('connector'='jdbc');
        INSERT INTO snk SELECT event_type, COUNT(*) AS n FROM src
        GROUP BY event_type;
        """,
        checkpoint_dir=f"{tmp_path}/ckpt",
    )
    result = mgr.start(jid)
    assert mgr.status(jid) == "RUN"
    for q in result.streaming_queries:
        q.processAllAvailable()
    mgr.stop(jid)
    assert mgr.status(jid) == "STOP"
    assert store.savepoints(jid) == [f"{tmp_path}/ckpt"]


def test_reconcile_marks_stopped_and_alarms(spark, sf_dir, tmp_path):
    from flink_streaming_platform_web_spark.tables import load

    src = f"{tmp_path}/rec_src"
    load(spark, sf_dir, "events").select("event_type").write.parquet(src)
    store = JobStore()
    mgr = JobManager(spark, store)
    jid = store.add_job(
        "rec1",
        f"""
        CREATE TABLE src2 (event_type STRING) WITH
          ('connector'='filesystem','path'='{src}','format'='parquet');
        CREATE TABLE p (event_type STRING) WITH ('connector'='blackhole');
        INSERT INTO p SELECT event_type FROM src2;
        """,
    )
    mgr.alarm_configs[jid] = AlarmConfig()  # no channels, log only
    result = mgr.start(jid)
    for q in result.streaming_queries:
        q.processAllAvailable()
        q.stop()  # simulate external death
    affected = mgr.reconcile()
    assert affected == [jid]
    assert mgr.status(jid) == "STOP"
    assert store.alarms(jid)[0][0] == "JOB_DOWN"


def test_submit_whitelist():
    check_run_config(["--num-executors", "10", "--queue", "prod"])
    with pytest.raises(SubmitConfigError):
        check_run_config(["--files", "x"])
    cmd = build_submit_command("/tmp/j.sql", restore_checkpoint="/ckpt/1")
    assert "--checkpoint-dir" in cmd and "/ckpt/1" in cmd
    # spark-submit has no -m flag: the primary resource is the
    # packaged launcher FILE, placed before its own args
    assert "-m" not in cmd
    launcher = next(c for c in cmd if c.endswith("launcher.py"))
    assert cmd.index(launcher) < cmd.index("run")


def test_cli_add_list_validate(tmp_path, spark):
    from flink_streaming_platform_web_spark.platform import cli

    sql_file = tmp_path / "job.sql"
    sql_file.write_text(BATCH_SCRIPT)
    storep = str(tmp_path / "jobs.sqlite")
    assert cli.main(["--store", storep, "add", "--name", "c1",
                     "--sql-file", str(sql_file), "--job-type", "batch"]) == 0
    assert cli.main(["--store", storep, "list"]) == 0
    assert cli.main(["--store", storep, "validate",
                     "--sql-file", str(sql_file), "--job-type", "batch"]) == 0


def test_cli_run_batch(tmp_path, capsys, spark):
    from flink_streaming_platform_web_spark.platform import cli

    sql_file = tmp_path / "job2.sql"
    sql_file.write_text(BATCH_SCRIPT)
    assert cli.main(["--store", str(tmp_path / "s.sqlite"), "run",
                     "--sql-file", str(sql_file),
                     "--job-type", "batch"]) == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out)["batch_results"]["m_plat"] == 10


def test_app_job_lifecycle(spark, tmp_path):
    """JAR-mode analog (JobTypeEnum.JAR(1)): a user application runs
    as a supervised subprocess with the same status machine."""
    import time

    app = tmp_path / "user_app.py"
    flag = tmp_path / "alive"
    app.write_text(
        "import sys, time, pathlib\n"
        f"pathlib.Path({str(flag)!r}).write_text('up')\n"
        "time.sleep(120)\n"
    )
    store = JobStore()
    mgr = JobManager(spark, store)
    jid = store.add_job("app1", str(app), job_type="app")
    mgr.start(jid)
    assert mgr.status(jid) == "RUN"
    for _ in range(50):
        if flag.exists():
            break
        time.sleep(0.2)
    assert flag.exists()
    assert mgr.reconcile() == []  # healthy: pid alive
    mgr.stop(jid)
    assert mgr.status(jid) == "STOP"
    assert jid not in mgr.running


def test_app_job_death_reconcile_and_alarm(spark, tmp_path):
    """A crashing app is swept by reconcile: FAIL status + alarm row
    (TaskServiceAOImpl.checkJobStatus parity for the jar job type)."""
    import time

    app = tmp_path / "crasher.py"
    app.write_text("import sys; sys.exit(3)\n")
    store = JobStore()
    mgr = JobManager(spark, store)
    jid = store.add_job("app2", str(app), job_type="app")
    mgr.start(jid)
    rj = mgr.running[jid]
    rj.proc.wait(30)
    time.sleep(0.1)
    assert mgr.reconcile() == [jid]
    assert mgr.status(jid) == "FAIL"
    alarm_rows = store.alarms(jid) if hasattr(store, "alarms") else None
    if alarm_rows is not None:
        assert alarm_rows


def test_rest_facade_verbs(spark, tmp_path):
    """JobConfigApiController verb parity over HTTP (stdlib server):
    addConfig → checkfSql → start (batch) → status → listTask →
    history → savepoint → stop, RestResult envelope shape."""
    import json
    import urllib.request

    from flink_streaming_platform_web_spark.platform.rest import serve

    store = JobStore()
    mgr = JobManager(spark, store)
    server, _ = serve(mgr)
    base = f"http://127.0.0.1:{server.server_address[1]}"

    def post(path, payload):
        req = urllib.request.Request(
            base + path,
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req) as r:
            return json.load(r)

    def get(path):
        with urllib.request.urlopen(base + path) as r:
            return json.load(r)

    try:
        bad = post("/api/checkfSql", {"sql": "SELEKT nope"})
        assert bad["data"]["ok"] is False
        ok = post("/api/checkfSql", {"sql": BATCH_SCRIPT, "job_type": "batch"})
        assert ok["data"]["ok"] is True, ok

        added = post(
            "/api/addConfig",
            {"name": "rest1", "sql": BATCH_SCRIPT, "job_type": "batch"},
        )
        assert added["code"] == 200
        jid = added["data"]["id"]

        started = post("/api/start", {"id": jid})
        assert started["code"] == 200
        assert get(f"/api/status?id={jid}")["data"]["status"] == "SUCCESS"

        tasks = get("/api/listTask")["data"]
        assert any(t["id"] == jid for t in tasks)

        post("/api/editConfig", {"id": jid, "sql": BATCH_SCRIPT})
        hist = get(f"/api/jobConfigHistoryPage?id={jid}")["data"]
        assert len(hist) == 2

        stopped = post("/api/stop", {"id": jid})
        assert stopped["code"] == 200
        # a finished batch job is not in a stoppable state: stop() is
        # a no-op and SUCCESS survives (reference stops only
        # RUNNING/RESTARTING — JobStandaloneServerAOImpl.java:108)
        assert get(f"/api/status?id={jid}")["data"]["status"] == "SUCCESS"

        # error envelope: unknown job id → code 500, message carries it
        import urllib.error

        try:
            get("/api/status?id=9999")
            raise AssertionError("expected HTTP 500")
        except urllib.error.HTTPError as e:
            body = json.load(e)
            assert body["code"] == 500
    finally:
        server.shutdown()
