"""CDC convergence tests — demo_6.md's verification sequences
(§2.1.3/§2.2.2: insert/update/delete ops must propagate so the final
materialized state matches the post-ops source state). Fixture F5."""

from __future__ import annotations

import json

from flink_streaming_platform_web_spark.streaming.cdc import (
    decode_debezium,
    _scaffold_apply_changelog,
    materialize_latest,
)
from flink_streaming_platform_web_spark.streaming.upsert import KeyedStore
from pyspark.sql import functions as F

ROW_DDL = "id INT, name STRING, description STRING"


def _env(op, before, after, ts):
    return json.dumps(
        {"op": op, "before": before, "after": after, "ts_ms": ts}
    )


# demo_6 §2.1.3-style sequence on the products table:
# snapshot 3 rows → update one → insert one → delete one
OPS = [
    _env("r", None, {"id": 101, "name": "scooter", "description": "3.5 wheel"}, 1),
    _env("r", None, {"id": 102, "name": "car battery", "description": "12V"}, 2),
    _env("r", None, {"id": 103, "name": "hammer", "description": "16oz"}, 3),
    _env("u", {"id": 101, "name": "scooter", "description": "3.5 wheel"},
         {"id": 101, "name": "scooter", "description": "3.5in wheel"}, 4),
    _env("c", None, {"id": 104, "name": "jacket", "description": "water resistant"}, 5),
    _env("d", {"id": 103, "name": "hammer", "description": "16oz"}, None, 6),
]

FINAL = {
    101: ("scooter", "3.5in wheel"),
    102: ("car battery", "12V"),
    104: ("jacket", "water resistant"),
}


def _decoded(spark):
    raw = spark.createDataFrame([(v,) for v in OPS], "value STRING")
    return decode_debezium(raw, ROW_DDL)


def test_decode_debezium_envelope(spark):
    rows = _decoded(spark).collect()
    assert [r["__op"] for r in rows] == ["r", "r", "r", "u", "c", "d"]
    assert rows[3]["__after"]["description"] == "3.5in wheel"
    assert rows[5]["__before"]["id"] == 103


def test_changelog_apply_converges(spark):
    store = KeyedStore(["id"])
    _scaffold_apply_changelog(store)(_decoded(spark), 0)
    got = {
        k[0]: (v["name"], v["description"]) for k, v in store.rows.items()
    }
    assert got == FINAL


def test_changelog_apply_is_replay_idempotent(spark):
    """EXACTLY_ONCE analog: re-delivering the same batch must not
    change the converged state (SURVEY §7.3 sink idempotency)."""
    store = KeyedStore(["id"])
    apply = _scaffold_apply_changelog(store)
    batch = _decoded(spark)
    apply(batch, 0)
    apply(batch, 0)  # replay
    got = {
        k[0]: (v["name"], v["description"]) for k, v in store.rows.items()
    }
    assert got == FINAL


def test_materialize_latest_batch_equivalent(spark):
    latest = materialize_latest(_decoded(spark), ["id"])
    got = {
        r["id"]: (r["name"], r["description"]) for r in latest.collect()
    }
    assert got == FINAL


def test_cdc_incremental_agg_retracts(spark, tmp_path):
    """Retraction-aware SUM/COUNT per key over a changelog: updates
    move contributions between groups, deletes remove them; the
    continuous aggregate must equal the batch aggregate over the
    FINAL table state — including a group emptied by a delete. State
    lives in an executor-side StateTable (keyed MERGE per batch), not
    a driver dict (round-8 migration)."""
    import json as _json

    from flink_streaming_platform_web_spark.streaming.cdc import (
        agg_state_table,
        cdc_incremental_agg,
    )

    ddl = "id INT, grp STRING, amount DOUBLE"

    def env(op, before, after, ts):
        return _json.dumps(
            {"op": op, "before": before, "after": after, "ts_ms": ts}
        )

    ops = [
        env("c", None, {"id": 1, "grp": "a", "amount": 10.0}, 1),
        env("c", None, {"id": 2, "grp": "a", "amount": 5.0}, 2),
        env("c", None, {"id": 3, "grp": "b", "amount": 7.0}, 3),
        # move id=2 from group a to group b with a new amount
        env("u", {"id": 2, "grp": "a", "amount": 5.0},
            {"id": 2, "grp": "b", "amount": 6.0}, 4),
        # delete the only remaining row of... id=3
        env("d", {"id": 3, "grp": "b", "amount": 7.0}, None, 5),
        # and empty group 'c' after creating it
        env("c", None, {"id": 4, "grp": "c", "amount": 1.0}, 6),
        env("d", {"id": 4, "grp": "c", "amount": 1.0}, None, 7),
    ]
    raw = spark.createDataFrame([(v,) for v in ops], "value STRING")
    changelog = decode_debezium(raw, ddl)
    state = agg_state_table(
        spark, str(tmp_path / "agg_state"), changelog,
        ["grp"], ["amount"], num_buckets=4,
    )
    apply_agg = cdc_incremental_agg(changelog, ["grp"], ["amount"], state)
    # two micro-batches: the update/deletes fold against PRIOR state
    apply_agg(changelog.filter(F.col("__ts_ms") <= 3), 0)
    apply_agg(changelog.filter(F.col("__ts_ms") > 3), 1)
    got = {
        r["grp"]: (r["n"], r["sum_amount"])
        for r in state.view().collect()
    }
    # final table state: id1(a,10), id2(b,6) -> a:(1,10.0) b:(1,6.0),
    # group c emptied and retracted entirely
    assert got == {"a": (1, 10.0), "b": (1, 6.0)}


def test_decode_canal_envelopes(spark):
    """Canal-JSON (Flink docs formats/canal): multi-row data arrays
    explode to one changelog row each; UPDATE reconstructs the
    before-image by overlaying `old` (changed columns only) onto the
    new row; DELETE rows ride in `data`."""
    import json

    from flink_streaming_platform_web_spark.streaming.cdc import (
        decode_canal,
    )

    envs = [
        {"data": [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}],
         "old": None, "type": "INSERT", "ts": 1},
        {"data": [{"id": 1, "v": "a2"}],
         "old": [{"id": None, "v": "a"}], "type": "UPDATE", "ts": 2},
        {"data": [{"id": 2, "v": "b"}], "old": None,
         "type": "DELETE", "ts": 3},
    ]
    raw = spark.createDataFrame(
        [(json.dumps(e),) for e in envs], "value STRING"
    )
    rows = decode_canal(raw, "id BIGINT, v STRING").orderBy(
        "__seq"
    ).collect()
    assert [r["__op"] for r in rows] == ["c", "c", "u", "d"]
    assert rows[0]["__after"].asDict() == {"id": 1, "v": "a"}
    assert rows[1]["__after"].asDict() == {"id": 2, "v": "b"}
    # UPDATE: before = old overlaid on data (id unchanged → from data)
    assert rows[2]["__before"].asDict() == {"id": 1, "v": "a"}
    assert rows[2]["__after"].asDict() == {"id": 1, "v": "a2"}
    assert rows[3]["__before"].asDict() == {"id": 2, "v": "b"}
    assert rows[3]["__after"] is None


def test_kafka_canal_stream_latest_state(spark, tmp_path):
    """canal-json over the file-transport broker end-to-end through
    the runner: the keyed changelog apply converges to the post-image
    state, exactly like the debezium path."""
    import json

    from flink_streaming_platform_web_spark.sources.kafka_file import (
        FileBroker,
    )
    from flink_streaming_platform_web_spark.streaming.runner import (
        JobRunner,
    )

    broker = FileBroker(tmp_path / "broker")
    broker.create_topic("canal_t", partitions=1)

    def env(type_, data, old=None):
        return json.dumps(
            {"data": data, "old": old, "type": type_, "ts": 0}
        )

    broker.produce(
        "canal_t",
        env("INSERT", [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}]),
    )
    broker.produce(
        "canal_t",
        env("UPDATE", [{"id": 1, "v": "a2"}], [{"v": "a"}]),
    )
    broker.produce("canal_t", env("DELETE", [{"id": 2, "v": "b"}]))
    runner = JobRunner(spark, mode="streaming")
    result = runner.execute_script(
        f"""
        CREATE TABLE src_canal (id BIGINT, v STRING,
          PRIMARY KEY (id) NOT ENFORCED)
        WITH ('connector'='kafka', 'topic'='canal_t',
              'properties.bootstrap.servers'='file://{broker.path}',
              'scan.startup.mode'='earliest-offset',
              'format'='canal-json');
        CREATE TABLE snap_c (id BIGINT, v STRING,
          PRIMARY KEY (id) NOT ENFORCED) WITH ('connector'='jdbc');
        INSERT INTO snap_c SELECT id, v FROM src_canal;
        """
    )
    for q in result.streaming_queries:
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(60)
    got = {
        r["id"]: r["v"]
        for r in runner.upsert_stores["snap_c"].to_df(spark).collect()
    }
    assert got == {1: "a2"}


def test_kafka_maxwell_stream_latest_state(spark, tmp_path):
    """maxwell-json (Flink docs formats/maxwell) over the
    file-transport broker: single-row envelopes, seconds-resolution
    ts, old-overlay update before-images — converges like the
    debezium and canal paths."""
    import json

    from flink_streaming_platform_web_spark.sources.kafka_file import (
        FileBroker,
    )
    from flink_streaming_platform_web_spark.streaming.cdc import (
        decode_maxwell,
    )
    from flink_streaming_platform_web_spark.streaming.runner import (
        JobRunner,
    )

    # decode unit: update before-image overlay + ts seconds→ms
    raw = spark.createDataFrame(
        [
            (json.dumps({"data": {"id": 1, "v": "a2"},
                         "old": {"v": "a"}, "type": "update",
                         "ts": 7}),),
        ],
        "value STRING",
    )
    r = decode_maxwell(raw, "id BIGINT, v STRING").collect()[0]
    assert r["__op"] == "u" and r["__ts_ms"] == 7000
    assert r["__before"].asDict() == {"id": 1, "v": "a"}
    assert r["__after"].asDict() == {"id": 1, "v": "a2"}

    broker = FileBroker(tmp_path / "broker")
    broker.create_topic("mx_t", partitions=1)

    def env(type_, data, old=None):
        return json.dumps(
            {"data": data, "old": old, "type": type_, "ts": 0}
        )

    broker.produce("mx_t", env("insert", {"id": 1, "v": "a"}))
    broker.produce("mx_t", env("insert", {"id": 2, "v": "b"}))
    broker.produce(
        "mx_t", env("update", {"id": 1, "v": "a2"}, {"v": "a"})
    )
    broker.produce("mx_t", env("delete", {"id": 2, "v": "b"}))
    runner = JobRunner(spark, mode="streaming")
    result = runner.execute_script(
        f"""
        CREATE TABLE src_mx (id BIGINT, v STRING,
          PRIMARY KEY (id) NOT ENFORCED)
        WITH ('connector'='kafka', 'topic'='mx_t',
              'properties.bootstrap.servers'='file://{broker.path}',
              'scan.startup.mode'='earliest-offset',
              'format'='maxwell-json');
        CREATE TABLE snap_mx (id BIGINT, v STRING,
          PRIMARY KEY (id) NOT ENFORCED) WITH ('connector'='jdbc');
        INSERT INTO snap_mx SELECT id, v FROM src_mx;
        """
    )
    for q in result.streaming_queries:
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(60)
    got = {
        r["id"]: r["v"]
        for r in runner.upsert_stores["snap_mx"].to_df(spark).collect()
    }
    assert got == {1: "a2"}


def test_runner_route_never_uses_the_driver_loop_scaffold():
    """VERDICT r8 item 4: `_scaffold_apply_changelog` loops collect()
    rows on the driver and exists ONLY as the differential twin of the
    StateTable merge. No package-internal code may call it — the
    runner's CDC route must resolve to foreach_batch_merge_changelog."""
    import pathlib

    import flink_streaming_platform_web_spark as pkg

    root = pathlib.Path(pkg.__file__).parent
    hits = []
    for py in root.rglob("*.py"):
        text = py.read_text()
        for i, line in enumerate(text.splitlines(), 1):
            if (
                "_scaffold_apply_changelog(" in line
                and "def _scaffold_apply_changelog" not in line
            ):
                hits.append(f"{py.relative_to(root)}:{i}")
    assert hits == [], f"production caller(s) of the scaffold: {hits}"
    # and the runner route references the StateTable merge
    runner_src = (root / "streaming" / "runner.py").read_text()
    assert "foreach_batch_merge_changelog" in runner_src
