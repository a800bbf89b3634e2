"""Streaming semantics that the batch-equivalence entries can't show:
watermark late-data dropping (O10) and checkpoint restore (the
savepoint analog, SURVEY §7.3)."""

from __future__ import annotations

import pytest

from flink_streaming_platform_web_spark.streaming.checkpoints import (
    CheckPointParam,
)
from flink_streaming_platform_web_spark.streaming.runner import JobRunner


def _write_batch(spark, path, rows):
    from datetime import datetime

    rows = [(datetime.fromisoformat(ts), k) for ts, k in rows]
    spark.createDataFrame(rows, "ts TIMESTAMP, k STRING").coalesce(
        1
    ).write.mode("append").parquet(path)


def test_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode windowed agg with a 10-minute watermark: an event
    arriving after the watermark passed its window end is dropped —
    the same bounded-lateness drop Flink applies (demo_4.md)."""
    from pyspark.sql import functions as F

    src = f"{tmp_path}/late_src"
    # batch 1: events up to 12:00 → watermark advances to 11:50
    _write_batch(spark, src, [
        ("2024-01-01 10:00:30", "a"),
        ("2024-01-01 10:00:40", "a"),
        ("2024-01-01 12:00:00", "b"),
    ])
    sdf = (
        spark.readStream.schema("ts TIMESTAMP, k STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 minute"), "k")
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("ws"), "k", "n")
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("late_out")
        .outputMode("append")
        .option("checkpointLocation", f"{tmp_path}/late_ckpt")
        .start()
    )
    q.processAllAvailable()
    # batch 2: a LATE event for the already-closed 10:00 window
    _write_batch(spark, src, [("2024-01-01 10:00:50", "a"),
                              ("2024-01-01 12:30:00", "b")])
    q.processAllAvailable()
    q.stop()
    got = {
        (str(r["ws"]), r["k"]): r["n"]
        for r in spark.table("late_out").collect()
    }
    # the 10:00 window emitted with 2 rows; the late third row was
    # dropped, not re-emitted
    assert got[("2024-01-01 10:00:00", "a")] == 2


def test_checkpoint_restore_resumes(spark, tmp_path):
    """Stop a streaming job, append new input, restart with the SAME
    checkpoint dir + script: only new files are processed and the
    upsert store converges to the full aggregate — the reference's
    savepoint-redeploy flow (CommandUtil.java:34-36)."""
    src = f"{tmp_path}/resume_src"
    ckpt = f"{tmp_path}/resume_ckpt"
    script = f"""
        CREATE TABLE rsrc (ts TIMESTAMP, k STRING) WITH
          ('connector'='filesystem','path'='{src}','format'='parquet');
        CREATE TABLE rsink (k STRING, n BIGINT,
          PRIMARY KEY (k) NOT ENFORCED) WITH ('connector'='jdbc');
        INSERT INTO rsink SELECT k, COUNT(*) AS n FROM rsrc GROUP BY k;
    """
    _write_batch(spark, src, [("2024-01-01 00:00:00", "x"),
                              ("2024-01-01 00:00:01", "y")])
    r1 = JobRunner(
        spark, "streaming", CheckPointParam(checkpoint_dir=ckpt)
    )
    res1 = r1.execute_script(script)
    for q in res1.streaming_queries:
        q.processAllAvailable()
        q.stop()
    assert {
        r["k"]: r["n"] for r in r1.upsert_stores["rsink"].to_df(spark).collect()
    } == {"x": 1, "y": 1}

    _write_batch(spark, src, [("2024-01-01 00:00:02", "x")])
    r2 = JobRunner(
        spark, "streaming", CheckPointParam(checkpoint_dir=ckpt)
    )
    res2 = r2.execute_script(script)
    for q in res2.streaming_queries:
        q.processAllAvailable()
        q.stop()
    # restored state: x counted ACROSS the restart (2), not just the
    # new file — proving state survived in the checkpoint
    store = r2.upsert_stores["rsink"]
    got = {r["k"]: r["n"] for r in store.to_df(spark).collect()}
    assert got["x"] == 2


def test_parquet_upsert_sink_converges_and_replays(spark, tmp_path):
    """Durable PK filesystem sink: multi-batch streaming agg upserts
    into versioned parquet; final state == batch agg; replaying an
    epoch is a no-op (pointer records last applied epoch)."""
    src = f"{tmp_path}/pu_src"
    state = f"{tmp_path}/pu_state"
    _write_batch(spark, src, [("2024-01-01 00:00:00", "x"),
                              ("2024-01-01 00:00:01", "y")])
    _write_batch(spark, src, [("2024-01-01 00:00:02", "x")])
    runner = JobRunner(spark, mode="streaming")
    result = runner.execute_script(
        f"""
        CREATE TABLE pus (ts TIMESTAMP, k STRING) WITH
          ('connector'='filesystem','path'='{src}','format'='parquet',
           'source.max-files-per-trigger'='1');
        CREATE TABLE pud (k STRING, n BIGINT,
          PRIMARY KEY (k) NOT ENFORCED) WITH
          ('connector'='filesystem','path'='{state}');
        INSERT INTO pud SELECT k, COUNT(*) AS n FROM pus GROUP BY k;
        """
    )
    for q in result.streaming_queries:
        q.processAllAvailable()
        q.stop()
    psink = runner.parquet_upserts["pud"]
    got = {r["k"]: r["n"] for r in psink.read_state(spark).collect()}
    assert got == {"x": 2, "y": 1}
    # replay the last epoch manually -> no state change, no new version
    import json as _json

    ptr_before = _json.load(open(f"{state}/_CURRENT"))
    batch = spark.createDataFrame([("x", 99)], "k STRING, n BIGINT")
    psink.foreach_batch()(batch, ptr_before["last_epoch"])  # stale epoch
    ptr_after = _json.load(open(f"{state}/_CURRENT"))
    assert ptr_after == ptr_before
    got2 = {r["k"]: r["n"] for r in psink.read_state(spark).collect()}
    assert got2 == got


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Streaming exactly-once-per-id ingestion: duplicate event ids
    arriving across micro-batches are dropped while inside the
    watermark TTL — the `table.exec.source.cdc-events-duplicate`
    analog (demo_6.md §2.2.1) with bounded state."""
    src = f"{tmp_path}/dd_src"

    def w(rows):
        from datetime import datetime

        spark.createDataFrame(
            [(i, datetime.fromisoformat(t)) for i, t in rows],
            "event_id LONG, ts TIMESTAMP",
        ).coalesce(1).write.mode("append").parquet(src)

    w([(1, "2024-01-01 00:00:00"), (2, "2024-01-01 00:00:05")])
    sdf = (
        spark.readStream.schema("event_id LONG, ts TIMESTAMP")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", f"{tmp_path}/dd_ckpt")
        .start()
    )
    q.processAllAvailable()
    # redelivery of id=1 (same id, later ts) + a fresh id=3
    w([(1, "2024-01-01 00:10:00"), (3, "2024-01-01 00:00:30")])
    q.processAllAvailable()
    q.stop()
    ids = sorted(r["event_id"] for r in spark.table("dedup_out").collect())
    assert ids == [1, 2, 3]  # the duplicate id=1 appears exactly once


def _write_kv(spark, path, rows):
    from datetime import datetime

    rows = [(datetime.fromisoformat(ts), k, float(v)) for ts, k, v in rows]
    spark.createDataFrame(
        rows, "ts TIMESTAMP, k STRING, v DOUBLE"
    ).coalesce(1).write.mode("append").parquet(path)


def _kv_script(src: str, sink_path: str, select: str,
               sink_cols: str = "k STRING, n BIGINT") -> str:
    # durable filesystem PK upsert sink: unlike the url-less jdbc
    # mock store (process-local, deliberately UNcheckpointed so
    # replay-from-scratch converges — runner.py in_process_state),
    # this sink gets a real checkpointLocation, which is what these
    # restore-semantics tests are about
    return f"""
        CREATE TABLE esrc (ts TIMESTAMP, k STRING, v DOUBLE) WITH
          ('connector'='filesystem','path'='{src}','format'='parquet');
        CREATE TABLE esink ({sink_cols},
          PRIMARY KEY (k) NOT ENFORCED) WITH
          ('connector'='filesystem','path'='{sink_path}',
           'format'='parquet');
        INSERT INTO esink {select};
    """


def _run_drained(spark, ckpt, script):
    r = JobRunner(spark, "streaming", CheckPointParam(checkpoint_dir=ckpt))
    res = r.execute_script(script)
    for q in res.streaming_queries:
        q.processAllAvailable()
        q.stop()
    return r, res


def test_savepoint_restore_survives_benign_edit(spark, tmp_path):
    """SURVEY §7.3: restore = same checkpoint dir + a compatible
    script. A stateless edit upstream of the stateful operator (a
    changed filter constant) keeps the state schema intact: the
    restart resumes from the checkpoint — old input is NOT replayed —
    carries the old counts in restored state, and applies the NEW
    predicate to new input only. Same contract as the reference's
    savepoint redeploy (docs/manual-sql.md restore flow)."""
    src = f"{tmp_path}/edit_src"
    sink = f"{tmp_path}/edit_sink"
    ckpt = f"{tmp_path}/edit_ckpt"
    q1 = "SELECT k, COUNT(*) AS n FROM esrc WHERE k <> 'drop1' GROUP BY k"
    q2 = "SELECT k, COUNT(*) AS n FROM esrc WHERE k <> 'drop2' GROUP BY k"

    _write_kv(spark, src, [("2024-01-01 00:00:00", "x", 1.0),
                           ("2024-01-01 00:00:01", "drop2", 1.0)])
    r1, _ = _run_drained(spark, ckpt, _kv_script(src, sink, q1))
    got1 = {
        r["k"]: r["n"]
        for r in r1.parquet_upserts["esink"].read_state(spark).collect()
    }
    # drop2 passed the ORIGINAL filter
    assert got1 == {"x": 1, "drop2": 1}

    # edited script, same checkpoint: only the new file is processed,
    # under the NEW filter
    _write_kv(spark, src, [("2024-01-01 00:00:02", "x", 1.0),
                           ("2024-01-01 00:00:03", "drop2", 1.0)])
    r2, _ = _run_drained(spark, ckpt, _kv_script(src, sink, q2))
    got2 = {
        r["k"]: r["n"]
        for r in r2.parquet_upserts["esink"].read_state(spark).collect()
    }
    # x: restored state 1 + one new row = 2. drop2: stays 1 — the
    # PROOF the old input wasn't replayed: a from-scratch rerun under
    # filter q2 would yield drop2 absent or x=2/drop2 gone from the
    # upserted sink; restored state + new-file-only processing keeps
    # the pre-edit drop2 count while the new drop2 row is excluded
    # by the edited predicate.
    assert got2 == {"x": 2, "drop2": 1}


def test_savepoint_restore_rejects_state_schema_break(spark, tmp_path):
    """SURVEY §7.3 caveat, pinned: an edit that changes the stateful
    operator's schema (adding an aggregate buffer column) cannot
    restore from the old checkpoint — the engine must REFUSE loudly
    (state-schema incompatibility), not silently corrupt state. The
    reference documents the same practical limit for savepoint
    restores across incompatible job graphs."""
    src = f"{tmp_path}/break_src"
    sink = f"{tmp_path}/break_sink"
    ckpt = f"{tmp_path}/break_ckpt"
    q1 = "SELECT k, COUNT(*) AS n FROM esrc GROUP BY k"

    _write_kv(spark, src, [("2024-01-01 00:00:00", "x", 1.0)])
    _run_drained(spark, ckpt, _kv_script(src, sink, q1))

    # breaking edit: extra agg buffer (SUM) changes the state row
    q2 = "SELECT k, COUNT(*) AS n, SUM(v) AS s FROM esrc GROUP BY k"
    _write_kv(spark, src, [("2024-01-01 00:00:01", "x", 2.0)])
    r2 = JobRunner(spark, "streaming", CheckPointParam(checkpoint_dir=ckpt))
    res2 = r2.execute_script(
        _kv_script(src, sink, q2, sink_cols="k STRING, n BIGINT, s DOUBLE")
    )
    with pytest.raises(Exception) as ei:
        for q in res2.streaming_queries:
            q.processAllAvailable()
            q.stop()
    msg = str(ei.value)
    assert "schema" in msg.lower() or "compatib" in msg.lower(), msg
    for q in res2.streaming_queries:
        try:
            q.stop()
        except Exception:
            pass


def test_parse_window_topn_shapes():
    """The streaming Window Top-N router must accept exactly Flink's
    documented nesting and reject everything else (which then fails
    loudly on the normal path instead of silently mis-planning)."""
    from flink_streaming_platform_web_spark.streaming.runner import (
        _parse_window_topn,
    )

    good = """
    SELECT window_start, event_type, total, rn FROM (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY window_start ORDER BY total DESC) AS rn
      FROM (
        SELECT window_start, event_type, SUM(value) AS total
        FROM TABLE(TUMBLE(TABLE ev, DESCRIPTOR(ts), INTERVAL '1' HOUR))
        GROUP BY window_start, event_type
      )
    ) WHERE rn <= 3
    """
    spec = _parse_window_topn(good)
    assert spec is not None
    assert spec.part_cols == ["window_start"]
    assert spec.group_cols == ["window_start", "event_type"]
    assert spec.ord_col == "total" and spec.ord_desc
    assert spec.rn_alias == "rn" and spec.topn == 3
    assert "SUM(value)" in spec.inner_sql
    assert "ROW_NUMBER" not in spec.inner_sql.upper()

    # per-key (non-window) continuous top-n: the queries/topn pattern
    spec2 = _parse_window_topn(
        """SELECT * FROM (
             SELECT *, ROW_NUMBER() OVER (
                      PARTITION BY user_id ORDER BY ts DESC) AS rn
             FROM (SELECT user_id, ts FROM ev GROUP BY user_id, ts)
           ) WHERE rn <= 1"""
    )
    assert spec2 is not None and spec2.inner_is_agg
    assert spec2.part_cols == ["user_id"] and spec2.topn == 1

    # deduplication (queries/deduplication): plain inner + rn = 1
    spec3 = _parse_window_topn(
        """SELECT user_id, ts_s, v FROM (
             SELECT *, ROW_NUMBER() OVER (
                      PARTITION BY user_id ORDER BY ts_s ASC)
                      AS rownum
             FROM (SELECT user_id, ts_s, v FROM ev)
           ) WHERE rownum = 1"""
    )
    assert spec3 is not None and not spec3.inner_is_agg
    assert spec3.group_cols == ["user_id"]
    assert spec3.topn == 1 and not spec3.ord_desc
    assert spec3.rn_alias == "rownum"
    # no rank filter → not top-n
    assert _parse_window_topn(
        """SELECT *, ROW_NUMBER() OVER (
                 PARTITION BY window_start ORDER BY total) AS rn
           FROM (SELECT window_start, SUM(v) total FROM ev
                 GROUP BY window_start)"""
    ) is None
    # rank over a named table (no inner subquery) → reject
    assert _parse_window_topn(
        """SELECT * FROM (
             SELECT *, ROW_NUMBER() OVER (
                      PARTITION BY window_start ORDER BY total) AS rn
             FROM agged
           ) WHERE rn <= 3"""
    ) is None


def test_parse_window_topn_rejects_dropped_projections():
    """Code-review r5: shapes whose middle/outer selects compute
    expressions (which the state re-plan would silently drop) and
    qualified column names (which would KeyError mid-stream) must be
    REJECTED to the loud path."""
    from flink_streaming_platform_web_spark.streaming.runner import (
        _parse_window_topn,
    )

    base = """
    SELECT {outer} FROM (
      SELECT {mid}ROW_NUMBER() OVER (
               PARTITION BY {part} ORDER BY {ord}) AS rn
      FROM (
        SELECT window_start, event_type, SUM(v) AS total
        FROM TABLE(TUMBLE(TABLE ev, DESCRIPTOR(ts), INTERVAL '1' HOUR))
        GROUP BY window_start, event_type
      )
    ) WHERE rn <= 3
    """

    def q(outer="window_start, event_type, total, rn", mid="*, ",
          part="window_start", ord="total DESC"):
        return base.format(outer=outer, mid=mid, part=part, ord=ord)

    assert _parse_window_topn(q()) is not None
    # middle select computes an expression → dropped silently → reject
    assert _parse_window_topn(q(mid="window_start, total / 100 AS total, ")) is None
    # outer select computes an expression → reject
    assert _parse_window_topn(q(outer="window_start, total * 2, rn")) is None
    # qualified partition/order columns → reject
    assert _parse_window_topn(q(part="t.window_start")) is None
    assert _parse_window_topn(q(ord="t.total DESC")) is None


def test_match_recognize_word_in_literal_not_routed(spark, tmp_path):
    """The literal string 'MATCH_RECOGNIZE' inside a WHERE clause must
    take the normal Spark path, not the CEP route (code-review r5)."""
    from flink_streaming_platform_web_spark.sql.validation import (
        validate_script,
    )
    from flink_streaming_platform_web_spark.streaming.runner import (
        JobRunner,
    )

    script = f"""
    CREATE TABLE lit_src (note STRING)
    WITH ('connector'='filesystem','path'='{tmp_path}/lit',
          'format'='json');
    CREATE TABLE lit_out (note STRING) WITH ('connector'='memory');
    INSERT INTO lit_out SELECT note FROM lit_src
    WHERE note <> 'MATCH_RECOGNIZE';
    """
    assert validate_script(script, spark, "batch").ok
    import json as _json

    (tmp_path / "lit").mkdir()
    (tmp_path / "lit" / "a.json").write_text(
        "\n".join(
            _json.dumps({"note": n})
            for n in ["keep", "MATCH_RECOGNIZE", "also"]
        )
    )
    JobRunner(spark, mode="batch").execute_script(script)
    got = sorted(r["note"] for r in spark.table("lit_out").collect())
    assert got == ["also", "keep"]


def test_stateful_partitions_exact_path_match(spark):
    """_stateful_partitions sizes state stores from the EXACT paths in
    the script's 'path' = '...' clauses — a stale same-session staging
    whose path is a substring of another must not leak its row count
    in (ADVICE r12)."""
    from flink_streaming_platform_web_spark.streaming import (
        stream_queries as sq,
    )

    saved = dict(sq._STAGED_ROWS)
    try:
        sq._STAGED_ROWS.clear()
        sq._STAGED_ROWS["/tmp/sg_a"] = 1_000_000  # prefix of _a_big
        sq._STAGED_ROWS["/tmp/sg_a_big"] = 10
        script = (
            "CREATE TABLE t (x BIGINT) WITH ("
            "'connector'='filesystem','path'='/tmp/sg_a_big',"
            "'format'='parquet')"
        )
        # only the exact referenced path counts: small input -> "4"
        assert sq._stateful_partitions(spark, script) == "4"
        # a bare path argument still matches exactly
        assert sq._stateful_partitions(spark, "/tmp/sg_a") == str(
            spark.sparkContext.defaultParallelism
        )
        # and an unknown path defaults small
        assert sq._stateful_partitions(spark, "/tmp/other") == "4"
    finally:
        sq._STAGED_ROWS.clear()
        sq._STAGED_ROWS.update(saved)
