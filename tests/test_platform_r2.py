"""Round-2 platform surface: monitoring scheduler daemon, new REST
verbs + login auth, per-job alarm-channel routing, ES-7 sink, kafka
key serialization / bounded batch reads, and the cross-line-literal
splitter fix."""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request

import pytest

from flink_streaming_platform_web_spark.platform.manager import (
    AlarmConfig,
    JobManager,
)
from flink_streaming_platform_web_spark.platform.scheduler import (
    MonitorScheduler,
)
from flink_streaming_platform_web_spark.platform.store import JobStore
from flink_streaming_platform_web_spark.sources import registry
from flink_streaming_platform_web_spark.sources.ddl import parse_create_table

BATCH_SCRIPT = """
CREATE TABLE g2 (a INT) WITH ('connector'='datagen',
  'number-of-rows'='5', 'fields.a.kind'='sequence',
  'fields.a.start'='1', 'fields.a.end'='5');
CREATE TABLE m_r2 (a INT) WITH ('connector'='memory');
INSERT INTO m_r2 SELECT a FROM g2;
"""


def _stream_script(src: str, sink: str = "blackhole") -> str:
    return f"""
    CREATE TABLE src_r2 (event_type STRING) WITH
      ('connector'='filesystem','path'='{src}','format'='parquet');
    CREATE TABLE out_r2 (event_type STRING) WITH ('connector'='{sink}');
    INSERT INTO out_r2 SELECT event_type FROM src_r2;
    """


@pytest.fixture()
def stream_src(spark, sf_dir, tmp_path):
    from flink_streaming_platform_web_spark.tables import load

    src = f"{tmp_path}/r2_src"
    load(spark, sf_dir, "events").select("event_type").limit(100).write.parquet(src)
    return src


# -- scheduler daemon ------------------------------------------------------


def test_scheduler_detects_death_and_autorestarts(spark, stream_src):
    """Kill a running job's query; the scheduler's own reconcile tick
    (no API call) must mark it, alarm, and auto-restart it
    (SchedulerTask.java:66-78 + alermAndAutoJob parity)."""
    store = JobStore()
    mgr = JobManager(spark, store)
    jid = store.add_job("sched1", _stream_script(stream_src))
    mgr.alarm_configs[jid] = AlarmConfig(auto_restart=True)
    sched = MonitorScheduler(
        mgr, heartbeat_sec=0.05, reconcile_sec=0.05, savepoint_sec=9999
    ).start()
    try:
        result = mgr.start(jid)
        for q in result.streaming_queries:
            q.processAllAvailable()
            q.stop()  # simulate external death
        deadline = time.time() + 30
        while time.time() < deadline:
            if mgr.running.get(jid) and mgr.running[jid].restarts == 1:
                break
            time.sleep(0.1)
        assert mgr.running[jid].restarts == 1, "auto-restart did not fire"
        assert store.alarms(jid)[0][0] == "JOB_DOWN"
        assert sched.ticks["heartbeat"] >= 1
        assert store.is_leader("127.0.0.1")
    finally:
        sched.stop()
        mgr.stop(jid)


def test_scheduler_autosavepoint_and_restart_failure_survives(
    spark, stream_src, tmp_path
):
    store = JobStore()
    mgr = JobManager(spark, store)
    jid = store.add_job(
        "sched2",
        _stream_script(stream_src),
        checkpoint_dir=f"{tmp_path}/ck_sched2",
    )
    sched = MonitorScheduler(
        mgr, heartbeat_sec=0.05, reconcile_sec=0.05, savepoint_sec=0.05
    )
    result = mgr.start(jid)
    for q in result.streaming_queries:
        q.processAllAvailable()
    # deterministic tick (no thread): heartbeat + reconcile + savepoint
    ran = sched.run_due_tasks()
    assert set(ran) == {"heartbeat", "reconcile", "savepoint"}
    assert store.savepoints(jid) == [f"{tmp_path}/ck_sched2"]
    # now kill the query AND close the job so auto-restart raises:
    # the sweep must survive and log AUTO_RESTART_FAIL (ADVICE r01)
    mgr.alarm_configs[jid] = AlarmConfig(auto_restart=True)
    for q in result.streaming_queries:
        q.stop()
    store.set_open(jid, False)
    time.sleep(0.06)
    ran = sched.run_due_tasks()
    assert "reconcile" in ran
    kinds = [k for k, _ in store.alarms(jid)]
    assert "AUTO_RESTART_FAIL" in kinds


def test_stop_never_erases_fail_state(spark):
    store = JobStore()
    mgr = JobManager(spark, store)
    jid = store.add_job("failkeep", BATCH_SCRIPT, job_type="batch")
    store.set_status(jid, "FAIL")
    mgr.stop(jid)  # not running, not stoppable → FAIL must survive
    assert mgr.status(jid) == "FAIL"


# -- per-job alarm channels ------------------------------------------------


def test_per_job_alarm_channel_routing(spark, stream_src):
    """job_alarm_config rows select the channels; AUTO_START_JOB alone
    must drive a restart with no in-memory AlarmConfig present
    (AlarmTypeEnum.java:13-15 routing)."""
    store = JobStore()
    mgr = JobManager(spark, store)
    jid = store.add_job("alarmcfg", _stream_script(stream_src))
    store.set_alarm_types(jid, ["AUTO_START_JOB"])
    assert store.alarm_types(jid) == ["AUTO_START_JOB"]
    result = mgr.start(jid)
    for q in result.streaming_queries:
        q.processAllAvailable()
        q.stop()
    affected = mgr.reconcile()
    assert affected == [jid]
    assert jid in mgr.running and mgr.running[jid].restarts == 1
    mgr.stop(jid)
    with pytest.raises(ValueError, match="unknown alarm types"):
        store.set_alarm_types(jid, ["PAGER"])


# -- store verbs + users ---------------------------------------------------


def test_store_open_close_delete_copy():
    store = JobStore()
    jid = store.add_job("v1", "INSERT INTO x SELECT 1;")
    store.set_open(jid, False)
    assert not store.get_job(jid).is_open
    store.set_open(jid, True)
    cid = store.copy_job(jid)
    assert store.get_job(cid).job_name == "v1-copy"
    assert store.get_job(cid).sql_script == store.get_job(jid).sql_script
    store.update_script(jid, "INSERT INTO x SELECT 2;")
    assert store.history_detail(jid, 1) == "INSERT INTO x SELECT 2;"
    store.delete_job(jid)
    with pytest.raises(KeyError):
        store.get_job(jid)
    assert store.history(jid) == []


def test_user_login_tokens():
    store = JobStore()
    assert not store.has_users()
    store.add_user("admin", "s3cret")
    assert store.has_users()
    with pytest.raises(PermissionError):
        store.login("admin", "wrong")
    token = store.login("admin", "s3cret")
    assert store.check_token(token) == "admin"
    store.logout(token)
    assert store.check_token(token) is None


def test_store_thread_safety():
    import threading

    store = JobStore()
    errors: list[Exception] = []

    def work(i: int) -> None:
        try:
            for j in range(20):
                jid = store.add_job(f"t{i}_{j}", "sql")
                store.update_script(jid, "sql2")
                store.set_status(jid, "RUN")
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    jobs = store.list_jobs()
    assert len(jobs) == 160
    assert all(j.version == 1 for j in jobs)


# -- REST: new verbs + auth ------------------------------------------------


def _post(base: str, path: str, body: dict, token: str | None = None):
    req = urllib.request.Request(
        f"{base}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}
        | ({"token": token} if token else {}),
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(base: str, path: str, token: str | None = None):
    req = urllib.request.Request(
        f"{base}{path}", headers={"token": token} if token else {}
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_rest_new_verbs_and_auth(spark):
    from flink_streaming_platform_web_spark.platform.rest import serve

    store = JobStore()
    mgr = JobManager(spark, store)
    server, _ = serve(mgr)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        # open mode (no users): verbs work unauthenticated
        st, r = _post(base, "/api/addConfig", {"name": "r2", "sql": BATCH_SCRIPT, "job_type": "batch"})
        jid = r["data"]["id"]
        st, r = _post(base, "/api/copyConfig", {"id": jid, "name": "r2c"})
        assert st == 200 and r["data"]["id"] != jid
        cid = r["data"]["id"]
        st, r = _post(base, "/api/close", {"id": cid})
        assert st == 200
        st, r = _post(base, "/api/start", {"id": cid})
        assert st == 500 and "closed" in r["message"]
        st, r = _post(base, "/api/open", {"id": cid})
        assert st == 200
        st, r = _post(base, "/api/delete", {"id": cid})
        assert st == 200
        st, r = _get(base, f"/api/status?id={cid}")
        assert st == 500  # gone
        st, r = _post(base, "/api/editConfig", {"id": jid, "sql": BATCH_SCRIPT})
        st, r = _get(base, f"/api/jobConfigHistoryDetail?id={jid}&version=1")
        assert st == 200 and "INSERT" in r["data"]["sql"]
        st, r = _post(base, "/api/setAlarmConfig", {"id": jid, "types": ["DINGDING"]})
        assert st == 200 and store.alarm_types(jid) == ["DINGDING"]
        st, r = _post(base, "/api/deployFlinkTask", {"name": "r2d", "sql": BATCH_SCRIPT, "job_type": "batch"})
        assert st == 200 and mgr.status(r["data"]["id"]) == "SUCCESS"

        # with a user registered, everything requires a token
        store.add_user("ops", "pw")
        st, _ = _get(base, "/api/listTask")
        assert st == 401
        st, r = _post(base, "/api/login", {"username": "ops", "password": "nope"})
        assert st == 401
        st, r = _post(base, "/api/login", {"username": "ops", "password": "pw"})
        token = r["data"]["token"]
        st, r = _get(base, "/api/listTask", token)
        assert st == 200 and any(j["job_name"] == "r2" for j in r["data"])
        st, _ = _post(base, "/api/logout", {}, token)
        st, _ = _get(base, "/api/listTask", token)
        assert st == 401
    finally:
        server.shutdown()


# -- ES-7 sink -------------------------------------------------------------

ES_DDL = """
CREATE TABLE enriched_orders (
  order_id INT, order_date TIMESTAMP(0), customer_name STRING,
  price DECIMAL(10,5), product_id INT, order_status BOOLEAN,
  PRIMARY KEY (order_id) NOT ENFORCED
) WITH ('connector' = 'elasticsearch-7',
        'hosts' = 'http://localhost:9200',
        'index' = 'enriched_orders')
"""


def test_es_sink_registers_and_builds_bulk():
    """demo_6.md enriched_orders DDL: option mapping + bulk NDJSON
    payload (doc id = PK → upsert), pure-tested like kafka's."""
    t = parse_create_table(ES_DDL)
    assert t.connector == "elasticsearch-7"
    opts = registry.es_sink_options(t)
    assert opts == {
        "hosts": "http://localhost:9200",
        "index": "enriched_orders",
    }
    rows = [
        {"order_id": 3, "customer_name": "c1", "order_status": True},
        {"order_id": 4, "customer_name": "c2", "order_status": False},
    ]
    payload = registry.es_bulk_payload(rows, opts["index"], t.primary_key)
    lines = payload.strip().split("\n")
    assert len(lines) == 4
    action = json.loads(lines[0])
    assert action == {"index": {"_index": "enriched_orders", "_id": "3"}}
    assert json.loads(lines[1])["customer_name"] == "c1"
    assert json.loads(lines[2])["index"]["_id"] == "4"
    assert registry.es_bulk_payload([], "i", ["k"]) == ""


def test_es_sink_without_hosts_fails_loudly(spark, stream_src):
    """A declared external sink must never silently divert to an
    in-process store (ADVICE r01)."""
    from flink_streaming_platform_web_spark.streaming.runner import JobRunner

    runner = JobRunner(spark, mode="streaming")
    script = f"""
    CREATE TABLE src_es (event_type STRING) WITH
      ('connector'='filesystem','path'='{stream_src}','format'='parquet');
    CREATE TABLE es_out (event_type STRING,
      PRIMARY KEY (event_type) NOT ENFORCED)
      WITH ('connector'='elasticsearch-7');
    INSERT INTO es_out SELECT event_type FROM src_es;
    """
    with pytest.raises(registry.ConnectorUnavailable, match="hosts"):
        runner.execute_script(script)


# -- kafka: upsert key serialization + bounded batch -----------------------


def test_upsert_kafka_payload_has_pk_key(spark):
    t = parse_create_table(
        """
        CREATE TABLE k_up (day_time STRING, gmv DECIMAL(10,2),
          PRIMARY KEY (day_time) NOT ENFORCED)
        WITH ('connector'='upsert-kafka', 'topic'='t',
              'properties.bootstrap.servers'='b:9092')
        """
    )
    df = spark.createDataFrame(
        [("2020-10-09", 100.0)], "day_time string, gmv double"
    )
    payload = registry.kafka_payload(df, t)
    assert payload.columns == ["key", "value"]
    row = payload.collect()[0]
    assert json.loads(row["key"]) == {"day_time": "2020-10-09"}
    assert json.loads(row["value"])["gmv"] == 100.0
    # append kafka (no PK): value only
    t2 = parse_create_table(
        "CREATE TABLE k_ap (a INT) WITH ('connector'='kafka','topic'='t')"
    )
    assert registry.kafka_payload(
        spark.createDataFrame([(1,)], "a int"), t2
    ).columns == ["value"]


def test_kafka_batch_mode_is_bounded_not_silent_stream(spark):
    """A kafka table in a batch job must be a bounded read (or a loud
    ConnectorUnavailable without the kafka package) — never a
    streaming DF recorded as 'batch' (ADVICE r01)."""
    from flink_streaming_platform_web_spark.streaming.runner import JobRunner

    runner = JobRunner(spark, mode="batch")
    script = """
    CREATE TABLE k_src (a INT) WITH ('connector'='kafka', 'topic'='t',
      'properties.bootstrap.servers'='b:9092');
    CREATE TABLE m_out (a INT) WITH ('connector'='memory');
    INSERT INTO m_out SELECT a FROM k_src;
    """
    with pytest.raises(registry.ConnectorUnavailable):
        runner.execute_script(script)
    assert runner._materialized.get("k_src") != "batch"


# -- splitter: literals spanning lines -------------------------------------


def test_split_statements_multiline_literal():
    from flink_streaming_platform_web_spark.sql.script import (
        split_statements,
    )

    script = (
        "INSERT INTO t SELECT 'line1\nline2;\n-- not a comment\n' AS s"
        " FROM x;\nSELECT 1"
    )
    stmts = split_statements(script)
    assert len(stmts) == 2
    assert "line2;" in stmts[0]
    assert "-- not a comment" in stmts[0]
    assert stmts[1] == "SELECT 1"


def test_metrics_endpoint_reports_query_progress(spark, stream_src):
    """GET /api/metrics mirrors the reference's job-detail metrics
    (Flink REST overview): per running query, id/name/activity and
    Spark's own lastProgress JSON."""
    from flink_streaming_platform_web_spark.platform.rest import serve

    store = JobStore()
    mgr = JobManager(spark, store)
    jid = store.add_job("metrics1", _stream_script(stream_src))
    srv, _ = serve(mgr)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        result = mgr.start(jid)
        for q in result.streaming_queries:
            q.processAllAvailable()
        st, body = _get(base, f"/api/metrics?id={jid}")
        assert st == 200 and body["code"] == 200
        (m,) = body["data"]
        assert m["is_active"] is True
        assert m["last_progress"]["numInputRows"] >= 0
        mgr.stop(jid)
        assert _get(base, f"/api/metrics?id={jid}")[1]["data"] == []
    finally:
        srv.shutdown()


def test_es_bulk_delete_payload_shape():
    from flink_streaming_platform_web_spark.sources.registry import (
        es_bulk_delete_payload,
    )

    p = es_bulk_delete_payload(
        [{"order_id": 10001}, {"order_id": 10004}], "enriched", ["order_id"]
    )
    lines = [json.loads(l) for l in p.strip().splitlines()]
    assert lines == [
        {"delete": {"_index": "enriched", "_id": "10001"}},
        {"delete": {"_index": "enriched", "_id": "10004"}},
    ]
    assert es_bulk_delete_payload([], "enriched", ["order_id"]) == ""


def test_cdc_script_into_es_sink_posts_bulk_deltas(spark, tmp_path):
    """demo_6's actual sink shape: mysql-cdc script → elasticsearch-7
    sink. A mock _bulk endpoint captures the traffic; updates must
    arrive as index actions and removed keys as delete actions (never
    silently diverted in-process)."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from flink_streaming_platform_web_spark.streaming.runner import (
        JobRunner,
    )

    captured: list[str] = []

    class Bulk(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            captured.append(self.rfile.read(n).decode())
            body = b'{"errors": false}'
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Bulk)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    feed = tmp_path / "cdc_es"
    feed.mkdir()

    def env(op, before, after, ts):
        return json.dumps(
            {"op": op, "before": before, "after": after, "ts_ms": ts}
        )

    import os

    # two files → two micro-batches, so key 2 lands in the sink in
    # batch 1 and its delete must arrive as a bulk delete in batch 2
    (feed / "a_first.jsonl").write_text(
        "\n".join(
            [
                env("c", None, {"id": 1, "name": "a"}, 1),
                env("c", None, {"id": 2, "name": "b"}, 2),
            ]
        )
    )
    (feed / "b_second.jsonl").write_text(
        "\n".join(
            [
                env("u", {"id": 1, "name": "a"}, {"id": 1, "name": "a2"}, 3),
                env("d", {"id": 2, "name": "b"}, None, 4),
            ]
        )
    )
    os.utime(
        feed / "b_second.jsonl", (time.time() + 2, time.time() + 2)
    )
    runner = JobRunner(spark, mode="streaming")
    try:
        result = runner.execute_script(
            f"""
            CREATE TABLE es_cdc (id BIGINT, name STRING,
              PRIMARY KEY (id) NOT ENFORCED)
            WITH ('connector'='mysql-cdc',
                  'graft.changelog-path'='{feed}',
                  'source.max-files-per-trigger'='1');
            CREATE TABLE es_out (id BIGINT, name STRING,
              PRIMARY KEY (id) NOT ENFORCED)
            WITH ('connector'='elasticsearch-7',
                  'hosts'='http://127.0.0.1:{srv.server_address[1]}',
                  'index'='es_out');
            INSERT INTO es_out SELECT id, name FROM es_cdc;
            """
        )
        for q in result.streaming_queries:
            q.processAllAvailable()
            q.stop()
            q.awaitTermination(60)
    finally:
        srv.shutdown()
    actions = [
        json.loads(line)
        for payload in captured
        for line in payload.strip().splitlines()
    ]
    assert {"index": {"_index": "es_out", "_id": "1"}} in actions
    assert {"name": "a2", "id": 1} in actions
    assert {"delete": {"_index": "es_out", "_id": "2"}} in actions
    # the in-process mirror converges too (it backs the delta compute)
    got = {
        r["id"]: r["name"]
        for r in runner.upsert_stores["es_out"].to_df(spark).collect()
    }
    assert got == {1: "a2"}


def test_kafka_debezium_json_sink_roundtrips(spark):
    """demo_6 §2.2.1 kafka_gmv shape: a PK sink with
    'format'='debezium-json' must emit changelog envelopes that this
    repo's own debezium reader decodes back to the original rows."""
    from flink_streaming_platform_web_spark.sources.ddl import (
        parse_create_table,
    )
    from flink_streaming_platform_web_spark.sources.registry import (
        kafka_payload,
    )
    from flink_streaming_platform_web_spark.streaming.cdc import (
        decode_debezium,
    )

    t = parse_create_table(
        """CREATE TABLE kafka_gmv (
             day_str STRING, gmv DOUBLE,
             PRIMARY KEY (day_str) NOT ENFORCED
           ) WITH ('connector' = 'kafka', 'topic' = 'flink_test_6',
                   'format' = 'debezium-json')"""
    )
    rows = spark.createDataFrame(
        [("2020-07-30", 50.5), ("2020-07-31", 29.71)],
        "day_str STRING, gmv DOUBLE",
    )
    payload = kafka_payload(rows, t)
    assert payload.columns == ["key", "value"]
    env = json.loads(payload.collect()[0]["value"])
    assert set(env) == {"before", "after", "op", "ts_ms"}
    assert env["op"] == "u" and env["before"] is None
    # round-trip through the repo's own debezium decode
    decoded = decode_debezium(
        payload.select("value"), "day_str STRING, gmv DOUBLE"
    )
    got = {
        (r["__after"]["day_str"], r["__after"]["gmv"], r["__op"])
        for r in decoded.collect()
    }
    assert got == {
        ("2020-07-30", 50.5, "u"),
        ("2020-07-31", 29.71, "u"),
    }
    # keys carry the PK for log compaction
    assert json.loads(payload.collect()[0]["key"]) == {
        "day_str": "2020-07-30"
    }


def test_stop_of_dead_query_still_marks_stop(spark, stream_src):
    """A query that already died re-raises its failure from
    awaitTermination; stop() must swallow it, untrack the job, and
    persist STOP — not leave the store claiming RUN forever."""
    store = JobStore()
    mgr = JobManager(spark, store)
    jid = store.add_job("deadstop", _stream_script(stream_src))
    result = mgr.start(jid)
    for q in result.streaming_queries:
        q.processAllAvailable()
        q.stop()  # dies before the operator's stop arrives
    mgr.stop(jid)
    assert store.get_job(jid).status_name == "STOP"
    assert jid not in mgr.running


def test_savepoint_restore_resolves_by_row_id(spark, stream_src, tmp_path):
    """savepoint_id is the savepoint_backup ROW id (enumerable via
    /api/savepoints), not a list index; unknown ids fail into FAIL,
    never a stuck STARTING."""
    ck_a, ck_b = str(tmp_path / "ck_a"), str(tmp_path / "ck_b")
    store = JobStore()
    mgr = JobManager(spark, store)
    jid = store.add_job(
        "sprestore", _stream_script(stream_src), checkpoint_dir=ck_a
    )
    store.add_savepoint(jid, ck_a)
    store.add_savepoint(jid, ck_b)
    (sid_a, _), (sid_b, path_b) = store.savepoints_with_ids(jid)
    assert path_b == ck_b and sid_b != 0
    with pytest.raises(ValueError, match="no savepoint id"):
        mgr.start(jid, sid_b + 999)
    assert store.get_job(jid).status_name == "FAIL"  # not STARTING
    result = mgr.start(jid, sid_b)
    assert mgr.running[jid].runner.checkpoint.checkpoint_dir == ck_b
    for q in result.streaming_queries:
        q.processAllAvailable()
    mgr.stop(jid)


def test_reconcile_stops_surviving_siblings(spark, stream_src, tmp_path):
    """A partially-dead multi-query job: reconcile must stop the
    surviving queries before untracking, or they keep writing
    untracked (and an auto-restart would duplicate them)."""
    store = JobStore()
    mgr = JobManager(spark, store)
    script = f"""
    CREATE TABLE src_r2m (event_type STRING) WITH
      ('connector'='filesystem','path'='{stream_src}','format'='parquet');
    CREATE TABLE out_a (event_type STRING) WITH ('connector'='blackhole');
    CREATE TABLE out_b (event_type STRING) WITH ('connector'='blackhole');
    INSERT INTO out_a SELECT event_type FROM src_r2m;
    INSERT INTO out_b SELECT event_type FROM src_r2m;
    """
    jid = store.add_job("twosinks", script)
    result = mgr.start(jid)
    assert len(result.streaming_queries) == 2
    for q in result.streaming_queries:
        q.processAllAvailable()
    result.streaming_queries[0].stop()  # one dies, one survives
    mgr.reconcile()
    assert jid not in mgr.running
    assert all(not q.isActive for q in result.streaming_queries)


def test_bare_set_is_a_noop(spark):
    """Flink sql-client accepts a bare `SET;` (property listing); the
    runner must treat it as a no-op instead of aborting the script."""
    from flink_streaming_platform_web_spark.streaming.runner import (
        JobRunner,
    )

    runner = JobRunner(spark, mode="batch")
    result = runner.execute_script(
        """
        SET;
        CREATE TABLE g_set (a INT) WITH ('connector'='datagen',
          'number-of-rows'='3', 'fields.a.kind'='sequence',
          'fields.a.start'='1', 'fields.a.end'='3');
        CREATE TABLE m_set (a INT) WITH ('connector'='memory');
        INSERT INTO m_set SELECT a FROM g_set;
        """
    )
    assert result.batch_results["m_set"] == 3


def test_validation_accepts_parameterized_scripts(spark):
    """validate_script(variables=...) checks the SAME text the runner
    executes — a ${var} script validates when its variables are
    supplied and fails clearly when they are not."""
    from flink_streaming_platform_web_spark.sql.validation import (
        validate_script,
    )

    script = """
    CREATE TABLE src_v (a INT) WITH ('connector'='datagen',
      'number-of-rows'='${rows}');
    CREATE TABLE out_v (a INT) WITH ('connector'='memory');
    INSERT INTO out_v SELECT a FROM src_v WHERE a > ${min_a};
    """
    r = validate_script(
        script, spark, "batch", variables={"rows": "5", "min_a": "1"}
    )
    assert r.ok, r.errors


def test_stop_kills_tracked_remote_app(spark):
    """stop() of a cluster-tracked job must actually KILL the remote
    application (flipping only the store row left the cluster burning
    resources forever); with no adapter configured it refuses loudly
    and keeps tracking."""
    killed = []

    class FakeAdapter:
        def kill(self, app_id):
            killed.append(app_id)

    store = JobStore()
    jid = store.add_job("remote1", "INSERT INTO x SELECT 1;")
    mgr = JobManager(spark, store)
    mgr.track_remote(jid, "app_42")
    with pytest.raises(RuntimeError, match="no rpc_adapter"):
        mgr.stop(jid)
    assert mgr.remote_apps.get(jid) == "app_42"  # still tracked
    mgr.rpc_adapter = FakeAdapter()
    mgr.stop(jid)
    assert killed == ["app_42"]
    assert mgr.status(jid) == "STOP"
    assert jid not in mgr.remote_apps


def test_delete_refuses_tracked_remote_job(spark):
    store = JobStore()
    jid = store.add_job("remote2", "INSERT INTO x SELECT 1;")
    mgr = JobManager(spark, store)
    mgr.track_remote(jid, "app_43")
    with pytest.raises(RuntimeError, match="cluster application"):
        mgr.delete_job(jid)


def test_login_rotates_tokens_per_user():
    """Re-login invalidates the user's previous bearer token (bounds
    the token store and cuts off a leaked token at next login)."""
    store = JobStore()
    store.add_user("u1", "pw")
    t1 = store.login("u1", "pw")
    assert store.check_token(t1) == "u1"
    t2 = store.login("u1", "pw")
    assert store.check_token(t2) == "u1"
    assert store.check_token(t1) is None  # rotated out


def test_cluster_submit_ships_package_and_sql(tmp_path):
    """Cluster deploy-mode runs the driver on a cluster node: the
    engine package must ship via --py-files and the SQL file via
    --files (referenced by localized basename)."""
    from flink_streaming_platform_web_spark.platform.submit import (
        build_submit_command,
    )

    sql = tmp_path / "job.sql"
    sql.write_text("INSERT INTO t SELECT 1;")
    cmd = build_submit_command(str(sql), master="yarn")
    joined = " ".join(cmd)
    assert "--files" in cmd and str(sql) in cmd
    i = cmd.index("--py-files")
    assert "flink_streaming_platform_web_spark" in cmd[i + 1]
    assert cmd[i + 1].endswith(".zip") or ".zip," in cmd[i + 1]
    # the launcher references the LOCALIZED basename, not the
    # submit-host absolute path
    assert cmd[cmd.index("--sql-file") + 1] == "job.sql"
    assert "--deploy-mode cluster" in joined
