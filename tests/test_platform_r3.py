"""Round-4 platform tests: lifecycle races and live-ish connector
harnesses (VERDICT r03 / ADVICE r03 items)."""

from __future__ import annotations

import pytest

from flink_streaming_platform_web_spark.platform.manager import JobManager
from flink_streaming_platform_web_spark.platform.store import JobStore


def _stream_script(src: str, sink: str = "blackhole") -> str:
    return f"""
    CREATE TABLE src_r3 (event_type STRING) WITH
      ('connector'='filesystem','path'='{src}','format'='parquet');
    CREATE TABLE out_r3 (event_type STRING) WITH ('connector'='{sink}');
    INSERT INTO out_r3 SELECT event_type FROM src_r3;
    """


@pytest.fixture()
def stream_src(spark, sf_dir, tmp_path):
    from flink_streaming_platform_web_spark.tables import load

    src = f"{tmp_path}/r3_src"
    load(spark, sf_dir, "events").select("event_type").limit(
        100
    ).write.parquet(src)
    return src


def test_stop_during_start_window_wins(spark, stream_src, monkeypatch):
    """ADVICE r03 medium: a stop() acknowledged while the submission is
    still in flight (status STARTING, job not yet in `running`) must
    WIN — the terminal transition is a status-CAS, so the late RUN
    write fails and the just-started queries are torn down instead of
    running forever under an overwritten RUN row."""
    from flink_streaming_platform_web_spark.platform import (
        manager as mgr_mod,
    )

    store = JobStore()
    mgr = JobManager(spark, store)
    jid = store.add_job("race1", _stream_script(stream_src))

    real = mgr_mod.JobRunner.execute_script

    def hooked(self, script):
        result = real(self, script)
        # the stop lands inside the submission window: status is
        # STARTING and the job is not registered in `running` yet
        mgr.stop(jid)
        assert store.get_job(jid).status_name == "STOP"
        return result

    monkeypatch.setattr(mgr_mod.JobRunner, "execute_script", hooked)
    result = mgr.start(jid)
    assert store.get_job(jid).status_name == "STOP", (
        "acknowledged stop was overwritten by the start's terminal"
        " transition"
    )
    for q in result.streaming_queries:
        assert not q.isActive, "stopped job left a live query behind"
    assert jid not in mgr.running
