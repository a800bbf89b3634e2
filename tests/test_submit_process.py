"""End-to-end LOCAL_PROCESS deploy: a real ``spark-submit`` child.

The reference's LOCAL mode still execs a real CLI child
(CommandUtil.java:29-68 builds ``flink run …``;
CommandRpcClinetAdapterImpl.java:48-70 execs it and scrapes the
``job-submitted-success:`` stdout marker, :150-161). These tests prove
the same flow against an actual ``spark-submit`` subprocess: manager →
submit argv → child JVM → structured JSON handshake on stdout → RUN in
the store → child exit reconciled to SUCCESS (batch) / STOP (drained
stream). VERDICT r02 item 4.

Each child boots its own JVM (~30 s) — kept to two tests."""

from __future__ import annotations

import shutil

import pytest

from flink_streaming_platform_web_spark.platform.manager import JobManager
from flink_streaming_platform_web_spark.platform.store import JobStore
from flink_streaming_platform_web_spark.platform.submit import (
    build_local_submit_command,
)
from flink_streaming_platform_web_spark.tables import load

pytestmark = pytest.mark.skipif(
    shutil.which("spark-submit") is None,
    reason="spark-submit binary not on PATH",
)


def _batch_script(src: str, out: str) -> str:
    return f"""
    CREATE TABLE src_orders (
      o_orderkey BIGINT, o_totalprice DOUBLE, o_orderstatus STRING
    ) WITH ('connector'='filesystem', 'path'='{src}',
            'format'='parquet');
    CREATE TABLE snk (
      o_orderstatus STRING, total DOUBLE
    ) WITH ('connector'='filesystem', 'path'='{out}',
            'format'='parquet');
    INSERT INTO snk
    SELECT o_orderstatus,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total
    FROM src_orders GROUP BY o_orderstatus;
    """


def test_build_local_submit_command_shape(tmp_path):
    cmd = build_local_submit_command(
        "/x/job.sql", "batch", checkpoint_dir="/ck"
    )
    assert cmd[0] == "spark-submit"
    assert cmd[1:3] == ["--master", "local[2]"]
    assert "run" in cmd and "--sql-file" in cmd and "--await" in cmd
    assert cmd[cmd.index("--checkpoint-dir") + 1] == "/ck"


def test_local_process_batch_submit_run_success(spark, sf_dir, tmp_path):
    """start → real spark-submit child → handshake → RUN; child exit
    → reconcile → SUCCESS; sink parquet written by the CHILD matches
    the same aggregation computed in-process."""
    src = f"{tmp_path}/src"
    out = f"{tmp_path}/out"
    load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    ).write.parquet(src)

    store = JobStore()
    jid = store.add_job(
        "proc-batch", _batch_script(src, out),
        job_type="batch", deploy_mode="LOCAL_PROCESS",
    )
    mgr = JobManager(spark, store, work_dir=str(tmp_path / "work"))
    result = mgr.start(jid)
    # handshake arrived → RUN in the store while the child still runs
    assert mgr.status(jid) == "RUN"
    assert result.query_ids == []  # batch job: no streaming queries

    rj = mgr.running[jid]
    assert rj.proc is not None
    rc = rj.proc.wait(timeout=300)
    assert rc == 0
    affected = mgr.reconcile()
    assert jid in affected
    assert mgr.status(jid) == "SUCCESS"
    # clean batch completion: no "job died" alarm row
    assert not [
        a for a in store.alarms(jid) if "no longer running" in str(a)
    ]

    got = {
        r["o_orderstatus"]: round(r["total"], 2)
        for r in spark.read.parquet(out).collect()
    }
    expected = {
        r["o_orderstatus"]: round(r["total"], 2)
        for r in spark.sql(
            "SELECT o_orderstatus, CAST(SUM(CAST(o_totalprice AS"
            " DECIMAL(18,2))) AS DOUBLE) AS total FROM"
            f" parquet.`{src}` GROUP BY o_orderstatus"
        ).collect()
    }
    assert got == expected
    # writeSqlToFile parity: the sql landed under <work>/sql/
    assert (tmp_path / "work" / "sql" / f"job_sql_{jid}.sql").exists()


def test_local_process_streaming_drain_to_success(spark, sf_dir, tmp_path):
    """A streaming job in the child: handshake reports the streaming
    query ids; --await drains, child exits 0 → reconcile → SUCCESS
    with NO alarm and no restart: the drain is the child's DESIGNED
    completion — treating it as "job down" (the old STOP+alarm) paged
    operators falsely and auto-restart-looped the job."""
    src = f"{tmp_path}/src"
    sink = f"{tmp_path}/sink"
    ckpt = f"{tmp_path}/ckpt"
    load(spark, sf_dir, "orders").limit(200).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    ).write.parquet(src)

    script = f"""
    CREATE TABLE src_orders (
      o_orderkey BIGINT, o_totalprice DOUBLE, o_orderstatus STRING
    ) WITH ('connector'='filesystem', 'path'='{src}',
            'format'='parquet');
    CREATE TABLE snk (
      o_orderkey BIGINT, o_totalprice DOUBLE
    ) WITH ('connector'='filesystem', 'path'='{sink}',
            'format'='parquet');
    INSERT INTO snk SELECT o_orderkey, o_totalprice FROM src_orders
    WHERE o_totalprice > 0;
    """
    store = JobStore()
    jid = store.add_job(
        "proc-stream", script,
        job_type="streaming", deploy_mode="LOCAL_PROCESS",
        checkpoint_dir=ckpt,
    )
    mgr = JobManager(spark, store, work_dir=str(tmp_path / "work"))
    result = mgr.start(jid)
    assert mgr.status(jid) == "RUN"
    # the child's handshake carried its streaming query ids
    assert len(result.query_ids) == 1

    rj = mgr.running[jid]
    assert rj.proc.wait(timeout=300) == 0
    mgr.reconcile()
    assert mgr.status(jid) == "SUCCESS"
    assert not store.alarms(jid)
    n = spark.read.parquet(sink).count()
    assert n == spark.read.parquet(src).filter("o_totalprice > 0").count()


def test_local_process_no_await_long_running_child(spark, sf_dir, tmp_path):
    """BACKLOG / VERDICT r04 item 8: drain=False launches a
    production-shaped LOCAL_PROCESS child that OUTLIVES the start call
    (blocks on awaitAnyTermination after the handshake). stop() must
    terminate it and mark STOP; a child that dies on its own must be
    mapped by reconcile() to FAIL with an alarm."""
    import os
    import signal
    import time

    src = f"{tmp_path}/src"
    ckpt = f"{tmp_path}/ckpt"
    load(spark, sf_dir, "orders").limit(100).select(
        "o_orderkey", "o_totalprice"
    ).write.parquet(src)
    script = f"""
    CREATE TABLE src_orders (o_orderkey BIGINT, o_totalprice DOUBLE)
    WITH ('connector'='filesystem', 'path'='{src}',
          'format'='parquet');
    CREATE TABLE snk (o_orderkey BIGINT, o_totalprice DOUBLE)
    WITH ('connector'='blackhole');
    INSERT INTO snk SELECT o_orderkey, o_totalprice FROM src_orders;
    """
    store = JobStore()
    jid = store.add_job(
        "proc-noawait", script,
        job_type="streaming", deploy_mode="LOCAL_PROCESS",
        checkpoint_dir=ckpt,
    )
    mgr = JobManager(
        spark, store, work_dir=str(tmp_path / "work"),
        drain_children=False,
    )
    # phase A: the child stays up after the handshake; stop() ends it
    result = mgr.start(jid)
    assert mgr.status(jid) == "RUN"
    assert len(result.query_ids) == 1
    proc = mgr.running[jid].proc
    time.sleep(3)  # a drain-mode child would have exited by now
    assert proc.poll() is None, "no-await child exited prematurely"
    mgr.stop(jid)
    assert proc.poll() is not None, "stop() did not end the child"
    assert mgr.status(jid) == "STOP"

    # phase B: an externally-killed child reconciles to FAIL + alarm
    mgr.start(jid)
    proc = mgr.running[jid].proc
    os.kill(proc.pid, signal.SIGKILL)
    proc.wait(30)
    affected = mgr.reconcile()
    assert jid in affected
    assert mgr.status(jid) == "FAIL"
    assert [a for a in store.alarms(jid) if "no longer running" in str(a)]


def test_local_process_stop_drains_buffered_tail(spark, sf_dir, tmp_path):
    """Platform stop = Flink `stop` (drain), not `cancel`, END TO END
    through a real child: a watermark-buffered streaming OVER query
    runs in a no-await LOCAL_PROCESS child; the manager's stop()
    SIGTERMs it, the child's handler stops each query through its
    DrainingQuery wrapper, and the filesystem sink ends up with the
    FULL batch answer — including the tail rows the watermark never
    passed, which a plain kill would have stranded in state."""
    import json as _json
    import time

    src = f"{tmp_path}/src"
    snk = f"{tmp_path}/snk"
    ckpt = f"{tmp_path}/ckpt"
    import os

    os.makedirs(src)
    rows = [
        {"k": 1, "ts": f"2024-01-01 00:{m:02d}:00", "v": float(m)}
        for m in range(12)  # 11 min span, 2 min delay → 3-4 pending
    ]
    with open(f"{src}/a.json", "w") as fh:
        for r in rows:
            fh.write(_json.dumps(r) + "\n")
    script = f"""
    CREATE TABLE ev (k BIGINT, ts TIMESTAMP, v DOUBLE,
      ts_s AS date_format(ts, 'yyyy-MM-dd HH:mm:ss'),
      WATERMARK FOR ts AS ts - INTERVAL '2' MINUTE
    ) WITH ('connector'='filesystem','path'='{src}','format'='json');
    CREATE TABLE snk (k BIGINT, ts_s STRING, n BIGINT)
      WITH ('connector'='filesystem','path'='{snk}','format'='json');
    INSERT INTO snk
    SELECT k, ts_s, COUNT(*) OVER w AS n
    FROM ev
    WINDOW w AS (PARTITION BY k ORDER BY ts
                 RANGE BETWEEN INTERVAL '5' MINUTE PRECEDING
                 AND CURRENT ROW);
    """
    store = JobStore()
    jid = store.add_job(
        "proc-drain-tail", script,
        job_type="streaming", deploy_mode="LOCAL_PROCESS",
        checkpoint_dir=ckpt,
    )
    mgr = JobManager(
        spark, store, work_dir=str(tmp_path / "work"),
        drain_children=False,
    )
    mgr.start(jid)
    assert mgr.status(jid) == "RUN"
    schema = "k long, ts_s string, n long"
    # wait until the child released the pre-watermark rows (the
    # committed sink read sees only log-listed files until the drain);
    # generous deadline: a loaded box can take ~90 s just to get the
    # child's JVM+session up
    deadline = time.time() + 240
    released = 0
    while time.time() < deadline:
        try:
            released = spark.read.schema(schema).json(snk).count()
        except Exception:
            released = 0
        if released >= 8:
            break
        time.sleep(2)
    assert released >= 8, f"child never released rows ({released})"
    assert released < 12, "nothing left pending - fixture degenerated"
    mgr.stop(jid)
    assert mgr.status(jid) == "STOP"
    got = {
        (r["k"], r["ts_s"]): r["n"]
        for r in spark.read.schema(schema).json(snk).collect()
    }
    assert len(got) == 12, f"drain lost tail rows: {sorted(got)}"
    # spot-check the window values survived intact
    assert got[(1, "2024-01-01 00:11:00")] == 6
    assert got[(1, "2024-01-01 00:00:00")] == 1
