"""Function-surface tests: expression translation, UDF registration
(CREATE FUNCTION path), pandas UDFs, listener wiring."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from flink_streaming_platform_web_spark.functions.flink_compat import (
    register_function,
    translate_expr,
)
from flink_streaming_platform_web_spark.functions.udfs import json_has_key


def test_translate_proctime():
    assert translate_expr("PROCTIME()") == "current_timestamp()"
    assert (
        translate_expr("ts AS proctime() + INTERVAL '1' SECOND")
        == "ts AS current_timestamp() + INTERVAL '1' SECOND"
    )
    assert translate_expr("LOCALTIMESTAMP") == "localtimestamp()"


def test_translate_listagg_default_separator():
    """Flink's one-arg LISTAGG(x) joins with ',' (docs:
    functions/systemfunctions); Spark's listagg(x) concatenates
    bare — the rewrite injects Flink's default. Explicit-separator
    forms pass through (the signatures match)."""
    assert translate_expr("LISTAGG(n_name)") == "listagg(n_name, ',')"
    assert (
        translate_expr("LISTAGG(DISTINCT lang)")
        == "listagg(DISTINCT lang, ',')"
    )
    assert translate_expr("LISTAGG(v, ';')") == "LISTAGG(v, ';')"


def test_listagg_runner_script(spark, tmp_path):
    """One-arg Flink LISTAGG end-to-end through the runner: the
    translated default separator must be ','. Input order inside the
    string is engine-chosen (no WITHIN GROUP in Flink), so the gate
    compares the SET of split parts."""
    import json as _json

    from flink_streaming_platform_web_spark.streaming.runner import (
        JobRunner,
    )

    src = tmp_path / "la_src"
    src.mkdir()
    (src / "t.json").write_text(
        "\n".join(
            _json.dumps({"g": g, "v": v})
            for g, v in [(1, "a"), (1, "b"), (1, "c"), (2, "z")]
        )
    )
    runner = JobRunner(spark, mode="batch")
    runner.execute_script(
        f"""
        CREATE TABLE la_src (g BIGINT, v STRING)
          WITH ('connector'='filesystem','path'='{src}',
                'format'='json');
        CREATE TABLE la_snk (g BIGINT, s STRING)
          WITH ('connector'='memory');
        INSERT INTO la_snk
        SELECT g, LISTAGG(v) AS s FROM la_src GROUP BY g;
        """
    )
    got = {
        r["g"]: sorted(r["s"].split(","))
        for r in spark.table("la_snk").collect()
    }
    assert got == {1: ["a", "b", "c"], 2: ["z"]}


def test_register_python_function(spark):
    name = register_function(
        spark,
        "CREATE FUNCTION json_has_key AS "
        "'flink_streaming_platform_web_spark.functions.udfs:json_has_key' "
        "LANGUAGE PYTHON",
    )
    assert name == "json_has_key"
    row = spark.sql(
        """SELECT json_has_key('{"k": 1}', 'k') AS a,
                  json_has_key('{"k": 1}', 'z') AS b,
                  json_has_key('not json', 'k') AS c"""
    ).collect()[0]
    # a bool-annotated Python UDF returns real BOOLEANs — the old
    # no-returnType registration stringified every result ('true')
    assert (row["a"], row["b"], row["c"]) == (True, False, False)


def test_json_has_key_pure():
    assert json_has_key('{"a": 1}', "a")
    assert not json_has_key("{}", "a")
    assert not json_has_key(None, "a")


def test_listener_fires_on_external_death(spark, sf_dir, tmp_path):
    from flink_streaming_platform_web_spark.platform import listener
    from flink_streaming_platform_web_spark.platform.manager import JobManager
    from flink_streaming_platform_web_spark.platform.store import JobStore
    from flink_streaming_platform_web_spark.tables import load

    src = f"{tmp_path}/lst_src"
    load(spark, sf_dir, "events").select("event_type").write.parquet(src)
    store = JobStore()
    mgr = JobManager(spark, store)
    lst = listener.attach(spark, mgr)
    try:
        jid = store.add_job(
            "lst1",
            f"""
            CREATE TABLE lsrc (event_type STRING) WITH
              ('connector'='filesystem','path'='{src}','format'='parquet');
            CREATE TABLE lsink (event_type STRING) WITH
              ('connector'='blackhole');
            INSERT INTO lsink SELECT event_type FROM lsrc;
            """,
        )
        result = mgr.start(jid)
        q = result.streaming_queries[0]
        q.processAllAvailable()
        q.stop()  # external death, NOT via mgr.stop
        deadline = time.time() + 30
        while time.time() < deadline and mgr.status(jid) == "RUN":
            time.sleep(0.5)
        assert mgr.status(jid) == "STOP"
        assert store.alarms(jid)
    finally:
        spark.streams.removeListener(lst)


def test_flink_builtin_sql_udfs(spark):
    """Divergent Flink built-ins registered as Catalyst SQL UDFs at
    session build (functions/flink_builtins.py)."""
    row = spark.sql(
        "SELECT split_index('a,b,c', ',', 0) AS s0,"
        "       split_index('a,b,c', ',', 9) AS s_oob,"
        "       split_index('a.b.c', '.', 1) AS s_dot,"
        "       truncate(42.349, 2) AS t_pos,"
        "       truncate(-42.349, 2) AS t_neg,"
        "       to_base64('hi') AS b64,"
        "       CAST(from_base64(to_base64('hi')) AS STRING) AS rt,"
        "       sha256('') AS sha,"
        "       convert_tz('2024-01-01 00:00:00','UTC','Asia/Shanghai')"
        "         AS ctz"
    ).collect()[0]
    assert row["s0"] == "a" and row["s_oob"] is None
    assert row["s_dot"] == "b"  # literal separator, not regex
    assert row["t_pos"] == 42.34 and row["t_neg"] == -42.34
    assert row["b64"] == "aGk=" and row["rt"] == "hi"
    assert row["sha"].startswith("e3b0c44298fc1c149afbf4c8996fb924")
    assert row["ctz"] == "2024-01-01 08:00:00"
    bounds = spark.sql(
        "SELECT min(r) AS lo, max(r) AS hi FROM "
        "(SELECT rand_integer(5) AS r FROM range(200))"
    ).collect()[0]
    assert 0 <= bounds["lo"] and bounds["hi"] <= 4


def test_group_window_syntax_translation():
    """demo_4/demo_5 verbatim: TUMBLE/HOP/SESSION (+_START/_END)
    rewrite to Spark window()/session_window(); NOTE Flink's HOP args
    are (col, slide, size) while Spark's are (col, size, slide)."""
    from flink_streaming_platform_web_spark.functions.flink_compat import (
        translate_expr,
    )

    assert (
        translate_expr("TUMBLE(ts, INTERVAL '60' SECOND)")
        == "window(ts, '60 seconds')"
    )
    assert (
        translate_expr("TUMBLE_START(ts, INTERVAL '60' SECOND)")
        == "window(ts, '60 seconds').start"
    )
    assert (
        translate_expr(
            "HOP_END (ts, INTERVAL '30' SECOND, INTERVAL '1' MINUTE)"
        )
        == "window(ts, '1 minutes', '30 seconds').end"
    )
    assert (
        translate_expr("SESSION(ts, INTERVAL '5' MINUTE)")
        == "session_window(ts, '5 minutes')"
    )


def test_translation_leaves_string_literals_alone():
    """A literal containing PROCTIME()/NOW() text must pass through
    byte-identical — only code segments are rewritten ('' escapes
    included)."""
    from flink_streaming_platform_web_spark.functions.flink_compat import (
        translate_expr,
    )

    sql = (
        "SELECT PROCTIME() AS p, 'PROCTIME() isn''t code: NOW()' AS s"
    )
    out = translate_expr(sql)
    assert out == (
        "SELECT current_timestamp() AS p,"
        " 'PROCTIME() isn''t code: NOW()' AS s"
    )


def test_window_tvf_translation_text():
    """FLIP-145 windowing TVFs rewrite to derived subqueries that
    append window_start/window_end/window_time (= end - 1 ms), exactly
    the columns the Flink TVF appends. Positional and named-argument
    forms both translate; HOP's (slide, size) order flips to Spark's
    (size, slide)."""
    from flink_streaming_platform_web_spark.functions.flink_compat import (
        translate_expr,
    )

    t = translate_expr(
        "SELECT window_start FROM TABLE(TUMBLE(TABLE src, "
        "DESCRIPTOR(ts), INTERVAL '1' MINUTE))"
    )
    assert "window(ts, '1 minutes') AS __w" in t
    assert "__w.start AS window_start" in t
    assert "AS window_time" in t
    assert "TABLE(" not in t

    h = translate_expr(
        "SELECT 1 FROM TABLE(HOP(TABLE src, DESCRIPTOR(ts), "
        "INTERVAL '30' SECOND, INTERVAL '1' MINUTE))"
    )
    assert "window(ts, '1 minutes', '30 seconds')" in h

    n = translate_expr(
        "SELECT 1 FROM TABLE(TUMBLE(DATA => TABLE src, "
        "TIMECOL => DESCRIPTOR(ts), SIZE => INTERVAL '10' MINUTE))"
    )
    assert "window(ts, '10 minutes')" in n

    c = translate_expr(
        "SELECT 1 FROM TABLE(CUMULATE(TABLE src, DESCRIPTOR(ts), "
        "INTERVAL '15' MINUTE, INTERVAL '1' HOUR))"
    )
    assert "explode(sequence(1, 4))" in c
    assert "timestampadd(SECOND, __k * 900, __ws)" in c


def test_window_tvf_execution_matches_group_window(spark, sf_dir):
    """TVF and group-window forms of the same tumble aggregation must
    produce identical results on the events table; the cumulate TVF
    must match q36's declarative expansion semantics (each row in
    every expanding slice whose end is after its event time)."""
    from flink_streaming_platform_web_spark.functions.flink_compat import (
        translate_expr,
    )
    from flink_streaming_platform_web_spark.tables import load

    load(spark, sf_dir, "events").createOrReplaceTempView("ev_tvf")

    tvf = spark.sql(
        translate_expr(
            "SELECT window_start, window_end, COUNT(*) AS n "
            "FROM TABLE(TUMBLE(TABLE ev_tvf, DESCRIPTOR(ts), "
            "INTERVAL '1' HOUR)) GROUP BY window_start, window_end"
        )
    )
    gw = spark.sql(
        translate_expr(
            "SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS window_start,"
            " TUMBLE_END(ts, INTERVAL '1' HOUR) AS window_end,"
            " COUNT(*) AS n FROM ev_tvf"
            " GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)"
        )
    )
    assert sorted(map(tuple, tvf.collect())) == sorted(
        map(tuple, gw.collect())
    )

    cum = spark.sql(
        translate_expr(
            "SELECT window_start, window_end, COUNT(*) AS n "
            "FROM TABLE(CUMULATE(TABLE ev_tvf, DESCRIPTOR(ts), "
            "INTERVAL '30' MINUTE, INTERVAL '1' HOUR)) "
            "GROUP BY window_start, window_end"
        )
    ).collect()
    # every hour bucket appears as two expanding slices; the full-hour
    # slice count equals the tumble count for that hour
    full = {
        (r.window_start, r.n) for r in cum
        if (r.window_end - r.window_start).total_seconds() == 3600
    }
    tumble = {(r.window_start, r.n) for r in tvf.collect()}
    assert full == tumble
    # half-hour slices count a subset of the hour's events
    half = {
        r.window_start: r.n for r in cum
        if (r.window_end - r.window_start).total_seconds() == 1800
    }
    for ws, n in half.items():
        assert n <= dict(tumble)[ws]

    # window_time is window_end - 1 ms
    wt = spark.sql(
        translate_expr(
            "SELECT window_end, window_time "
            "FROM TABLE(TUMBLE(TABLE ev_tvf, DESCRIPTOR(ts), "
            "INTERVAL '1' HOUR)) LIMIT 1"
        )
    ).collect()[0]
    assert (wt.window_end - wt.window_time).total_seconds() == 0.001


def test_window_tvf_named_args_resolve_by_name():
    """Named TVF arguments may appear in any order (legal Flink) —
    they must resolve by NAME, never positionally; unknown names and
    name/positional mixing are rejected."""
    import pytest as _pytest

    from flink_streaming_platform_web_spark.functions.flink_compat import (
        translate_expr,
    )

    # SIZE before SLIDE (reverse of the positional order)
    h = translate_expr(
        "SELECT 1 FROM TABLE(HOP(TABLE src, DESCRIPTOR(ts), "
        "SIZE => INTERVAL '10' MINUTE, SLIDE => INTERVAL '5' MINUTE))"
    )
    assert "window(ts, '10 minutes', '5 minutes')" in h
    c = translate_expr(
        "SELECT 1 FROM TABLE(CUMULATE(TABLE src, DESCRIPTOR(ts), "
        "SIZE => INTERVAL '1' HOUR, STEP => INTERVAL '15' MINUTE))"
    )
    assert "sequence(1, 4)" in c and "__k * 900" in c
    with _pytest.raises(ValueError, match="expected named arguments"):
        translate_expr(
            "SELECT 1 FROM TABLE(HOP(TABLE s, DESCRIPTOR(ts), "
            "FOO => INTERVAL '1' MINUTE, SIZE => INTERVAL '2' MINUTE))"
        )
    with _pytest.raises(ValueError, match="name all"):
        translate_expr(
            "SELECT 1 FROM TABLE(HOP(TABLE s, DESCRIPTOR(ts), "
            "INTERVAL '1' MINUTE, SIZE => INTERVAL '2' MINUTE))"
        )


def test_split_index_negative_returns_null(spark):
    """Flink SPLIT_INDEX returns NULL for ANY negative index; bare
    i+1 made -1 throw INVALID_INDEX_OF_ZERO and -2 silently return
    Spark's from-the-end element."""
    from flink_streaming_platform_web_spark.functions.flink_builtins import (
        install,
    )

    install(spark)
    row = spark.sql(
        "SELECT split_index('a,b,c', ',', 1) AS ok,"
        "       split_index('a,b,c', ',', -1) AS neg1,"
        "       split_index('a,b,c', ',', -2) AS neg2,"
        "       split_index('a,b,c', ',', 9) AS oob"
    ).collect()[0]
    assert row["ok"] == "b"
    assert row["neg1"] is None and row["neg2"] is None
    assert row["oob"] is None


def test_translate_to_timestamp_ltz():
    """Flink 1.13's TO_TIMESTAMP_LTZ(numeric, precision) rewrites onto
    timestamp_seconds/timestamp_millis (Spark's NATIVE to_timestamp_ltz
    parses strings, so the numeric form cannot pass through). Other
    precisions and the string form pass untouched."""
    assert (
        translate_expr("TO_TIMESTAMP_LTZ(ms, 3)") == "timestamp_millis(ms)"
    )
    assert (
        translate_expr("TO_TIMESTAMP_LTZ(s, 0)") == "timestamp_seconds(s)"
    )
    assert (
        translate_expr("TO_TIMESTAMP_LTZ(ms DIV 1000, 0)")
        == "timestamp_seconds(ms DIV 1000)"
    )
    # Spark's native string-parsing form is untouched
    assert (
        translate_expr("to_timestamp_ltz('2021-01-01')")
        == "to_timestamp_ltz('2021-01-01')"
    )


def test_timestampdiff_timestampadd_passthrough(spark):
    """Flink's TIMESTAMPDIFF/TIMESTAMPADD (docs: functions/system
    functions, temporal section) share Spark's native names AND
    argument order, so reference scripts pass through the translator
    untouched — pin both the no-rewrite and the semantics."""
    expr = "TIMESTAMPDIFF(MINUTE, t1, t2)"
    assert translate_expr(expr) == expr
    row = spark.sql(
        "SELECT timestampdiff(MINUTE, TIMESTAMP '2024-01-01 00:00:00',"
        " TIMESTAMP '2024-01-01 02:30:00') AS d,"
        " date_format(timestampadd(HOUR, 3,"
        " TIMESTAMP '2024-01-01 00:00:00'),"
        " 'yyyy-MM-dd HH:mm:ss') AS t"
    ).collect()[0]
    assert row["d"] == 150
    assert row["t"] == "2024-01-01 03:00:00"
