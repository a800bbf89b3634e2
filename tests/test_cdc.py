"""CDC convergence tests — demo_6.md's verification sequences
(§2.1.3/§2.2.2: insert/update/delete ops must propagate so the final
materialized state matches the post-ops source state). Fixture F5."""

from __future__ import annotations

import json

from flink_streaming_platform_web_spark.streaming.cdc import (
    decode_debezium,
    foreach_batch_apply_changelog,
    materialize_latest,
)
from flink_streaming_platform_web_spark.streaming.upsert import KeyedStore

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
    foreach_batch_apply_changelog(store)(_decoded(spark), 0)
    got = {
        k[0]: (v["name"], v["description"]) for k, v in store.rows.items()
    }
    assert got == FINAL


def test_changelog_apply_is_replay_idempotent(spark):
    """EXACTLY_ONCE analog: re-delivering the same batch must not
    change the converged state (SURVEY §7.3 sink idempotency)."""
    store = KeyedStore(["id"])
    apply = foreach_batch_apply_changelog(store)
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
