"""The examples/ corpus — the reference's demo scripts adapted to the
connectors available in this container — must validate and run
end-to-end through the platform runner."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from flink_streaming_platform_web_spark.sql.validation import validate_script
from flink_streaming_platform_web_spark.streaming.runner import JobRunner

EXAMPLES = Path(__file__).resolve().parent.parent / "examples"


def _drain(result):
    for q in result.streaming_queries:
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(60)


@pytest.mark.parametrize(
    "script", sorted(p.name for p in EXAMPLES.glob("*.sql"))
)
def test_example_validates(spark, script, tmp_path):
    text = (EXAMPLES / script).read_text().replace(
        "${data_dir}", str(tmp_path)
    )
    r = validate_script(text, spark)
    assert r.ok, r.errors


def test_hello_world_runs(spark):
    runner = JobRunner(spark, mode="batch")
    r = runner.execute_script((EXAMPLES / "hello_world.sql").read_text())
    assert r.batch_results["print_table"] == 25


def test_demo1_runs(spark, tmp_path):
    """demo_1.md's kafka DDL runs VERBATIM: the reference's exact
    message shape produced into the file-transport broker, consumed
    through the real readStream path."""
    from flink_streaming_platform_web_spark.sources.kafka_file import (
        FileBroker,
    )

    broker = FileBroker(tmp_path / "broker")
    broker.create_topic("flink_test", partitions=2)
    for msg in (
        {"day_time": "20201009", "id": 7, "amnount": 20},
        {"day_time": "20201009", "id": 8, "amnount": 30},
        {"day_time": "20201010", "id": 9, "amnount": 5},
    ):
        broker.produce("flink_test", json.dumps(msg))
    runner = JobRunner(spark, mode="streaming")
    result = runner.execute_script(
        (EXAMPLES / "demo_1_daily_gmv.sql").read_text(),
        variables={"kafka_servers": f"file://{broker.path}"},
    )
    _drain(result)
    got = {
        r["day_time"]: r["total_gmv"]
        for r in runner.upsert_stores["sync_test_1"].to_df(spark).collect()
    }
    assert got == {"20201009": 50, "20201010": 5}


def test_demo4_runs(spark, tmp_path):
    rows = [
        {"username": "zhp", "click_url": "https://a", "ts": "2021-01-05 11:12:12"},
        {"username": "zhp", "click_url": "https://b", "ts": "2021-01-05 11:12:40"},
        {"username": "ljw", "click_url": "https://c", "ts": "2021-01-05 11:13:05"},
    ]
    src = tmp_path / "user_clicks"
    src.mkdir()
    (src / "part-0.json").write_text(
        "\n".join(json.dumps(r) for r in rows)
    )
    runner = JobRunner(spark, mode="streaming")
    result = runner.execute_script(
        (EXAMPLES / "demo_4_tumble_window.sql").read_text(),
        variables={"data_dir": str(tmp_path)},
    )
    _drain(result)
    got = {
        (r["window_start"], r["username"]): r["clicks"]
        for r in spark.table("clicks_per_minute").collect()
    }
    assert got == {
        ("2021-01-05 11:12:00", "zhp"): 2,
        ("2021-01-05 11:13:00", "ljw"): 1,
    }


def test_demo3_runs(spark, tmp_path):
    spark.createDataFrame(
        [(1, 100), (3, 100), (8, 100)], "id BIGINT, coupon_amnount BIGINT"
    ).createOrReplaceTempView("test_dim_view")
    src = tmp_path / "stream_a"
    src.mkdir()
    (src / "part-0.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [{"id": 1, "amount": 10}, {"id": 2, "amount": 20}]
        )
    )
    runner = JobRunner(spark, mode="streaming")
    result = runner.execute_script(
        (EXAMPLES / "demo_3_lookup_join.sql").read_text(),
        variables={"data_dir": str(tmp_path)},
    )
    _drain(result)
    got = {
        r["id"]: (r["amount"], r["coupon_amnount"])
        for r in spark.table("joined_out").collect()
    }
    assert got == {1: (10, 100), 2: (20, None)}


def test_pipeline_training_mix_runs(spark, tmp_path):
    """The training-data pipeline as a submitted SQL job: batch run
    over the real documents parquet, sink parquet cross-checked
    against the equivalent direct DataFrame computation."""
    from pyspark.sql import functions as F

    from flink_streaming_platform_web_spark.tables import load

    sf_dir = "/root/testdata/sf0.001"
    runner = JobRunner(spark, mode="batch")
    runner.execute_script(
        (EXAMPLES / "pipeline_training_mix.sql").read_text(),
        variables={"data_dir": sf_dir, "out_dir": str(tmp_path)},
    )
    got = {
        (r["lang"], r["source"]): (r["n_docs"], r["total_chars"])
        for r in spark.read.parquet(
            str(tmp_path / "training_mix")
        ).collect()
    }
    docs = load(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    from flink_streaming_platform_web_spark.operators._portable import (
        portable_hash,
    )

    kept = docs.filter(F.size(F.split("text", " ")) >= 10)
    deduped = (
        kept.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(F.md5("text")).orderBy("doc_id")
            ),
        )
        .filter(F.col("rn") == 1)
    )
    rate = (
        F.when(F.col("lang") == "en", 200)
        .when(F.col("lang").isin("zh", "fr"), 500)
        .when(F.col("lang").isin("de", "es"), 800)
        .otherwise(0)
    )
    sampled = deduped.filter(
        portable_hash(F.concat(F.lit("mix|"), F.col("doc_id").cast("string")))
        % 1000
        < rate
    )
    want = {
        (r["lang"], r["source"]): (r["n_docs"], r["total_chars"])
        for r in sampled.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .collect()
    }
    assert got == want and len(got) > 0


def test_demo2_runs(spark, tmp_path):
    """demo_2.md faithful script: double-stream LEFT JOIN → grouped
    GMV → PK upsert sink, driven with the reference's own sample
    messages (topic flink_test_1/2 payloads)."""
    orders = tmp_path / "orders_stream"
    coupons = tmp_path / "coupon_stream"
    orders.mkdir()
    coupons.mkdir()
    (orders / "p0.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"day_time": "20201011", "id": 8, "amnount": 211},
                {"day_time": "20201011", "id": 9, "amnount": 100},
                {"day_time": "20201012", "id": 10, "amnount": 50},
            ]
        )
    )
    (coupons / "p0.json").write_text(
        json.dumps({"id": 8, "coupon_amnount": 100})
    )
    runner = JobRunner(spark, mode="streaming")
    result = runner.execute_script(
        (EXAMPLES / "demo_2_double_stream_gmv.sql").read_text(),
        variables={"data_dir": str(tmp_path)},
    )
    _drain(result)
    got = {
        r["day_time"]: r["total_gmv"]
        for r in runner.upsert_stores["sync_test_2"].to_df(spark).collect()
    }
    assert got == {"20201011": 211, "20201012": 50}


def test_demo6_cdc_script_runs(spark, tmp_path):
    """demo_6.md §2.1 as a SUBMITTED SCRIPT: three mysql-cdc tables
    (debezium changelog files standing in for the binlog), the exact
    reference INSERT, driven with the §2.1.3 verification sequence —
    insert order+shipment, update shipment, update order, delete
    order. The sink must equal the join of the FINAL table states:
    update propagated, deleted order's enriched row gone."""
    from tests.test_cdc_multiway import (
        ORDER_OPS,
        PRODUCT_OPS,
        SHIPMENT_OPS,
    )

    for name, ops in [
        ("cdc_products", PRODUCT_OPS),
        ("cdc_orders", ORDER_OPS),
        ("cdc_shipments", SHIPMENT_OPS),
    ]:
        d = tmp_path / name
        d.mkdir()
        (d / "feed.jsonl").write_text("\n".join(ops))
    runner = JobRunner(spark, mode="streaming")
    result = runner.execute_script(
        (EXAMPLES / "demo_6_cdc_enriched_orders.sql").read_text(),
        variables={"data_dir": str(tmp_path)},
    )
    _drain(result)
    got = {
        r["order_id"]: (
            r["order_status"],
            r["product_name"],
            r["shipment_id"],
            r["is_arrived"],
        )
        for r in runner.upsert_stores["enriched_orders"]
        .to_df(spark)
        .collect()
    }
    # order 10001 was deleted → its enriched row must be GONE;
    # order 10004 ends status=true, product 101 (scooter),
    # shipment 1004 arrived=true
    assert got == {10004: (True, "scooter", 1004, True)}


def test_demo5_runs(spark, tmp_path):
    """demo_5.md verbatim HOP syntax: each click lands in two sliding
    windows; counts must match the reference's sample expectations."""
    src = tmp_path / "user_clicks"
    src.mkdir()
    (src / "p0.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"username": "zhp", "click_url": "u1",
                 "ts": "2020-01-05 11:13:25"},
                {"username": "zhp", "click_url": "u2",
                 "ts": "2020-01-05 11:13:26"},
            ]
        )
    )
    runner = JobRunner(spark, mode="streaming")
    result = runner.execute_script(
        (EXAMPLES / "demo_5_hop_window.sql").read_text(),
        variables={"data_dir": str(tmp_path)},
    )
    _drain(result)
    got = {
        (r["window_start"], r["window_end"]): r["clicks"]
        for r in spark.table("sync_test_hop_output").collect()
    }
    # both clicks fall in [11:13:00, 11:14:00) and [11:13:30, 11:14:30)?
    # no — 11:13:25/26 land in the two windows covering them:
    # [11:12:30, 11:13:30) and [11:13:00, 11:14:00)
    assert got == {
        ("2020-01-05 11:12:30", "2020-01-05 11:13:30"): 2,
        ("2020-01-05 11:13:00", "2020-01-05 11:14:00"): 2,
    }


def test_demo7_window_tvfs_runs(spark, tmp_path):
    """FLIP-145 windowing-TVF script: TUMBLE and CUMULATE TABLE forms
    through the runner; hand-checked expectations for a 3-bid stream."""
    src = tmp_path / "bids"
    src.mkdir()
    (src / "p0.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"bidder": "a", "price": 10.0,
                 "ts": "2020-04-15 08:05:00"},
                {"bidder": "b", "price": 20.0,
                 "ts": "2020-04-15 08:07:00"},
                {"bidder": "c", "price": 30.0,
                 "ts": "2020-04-15 08:13:00"},
            ]
        )
    )
    runner = JobRunner(spark, mode="streaming")
    result = runner.execute_script(
        (EXAMPLES / "demo_7_window_tvfs.sql").read_text(),
        variables={"data_dir": str(tmp_path)},
    )
    _drain(result)
    tumble = {
        (str(r["window_start"]), r["n_bids"], r["total"])
        for r in spark.table("bids_per_window").collect()
    }
    assert tumble == {
        ("2020-04-15 08:00:00", 2, 30.0),
        ("2020-04-15 08:10:00", 1, 30.0),
    }
    # cumulate: bid@08:05 appears in slices ending 08:06..08:10 (3
    # slices: 06,08,10), bid@08:07 in 08:08,08:10 — per-slice counts:
    cum = {
        (str(r["window_start"]), str(r["window_end"])): r["n_bids"]
        for r in spark.table("bids_cumulative").collect()
    }
    assert cum[("2020-04-15 08:00:00", "2020-04-15 08:06:00")] == 1
    assert cum[("2020-04-15 08:00:00", "2020-04-15 08:08:00")] == 2
    assert cum[("2020-04-15 08:00:00", "2020-04-15 08:10:00")] == 2
    assert cum[("2020-04-15 08:10:00", "2020-04-15 08:14:00")] == 1


def test_demo8_datagen_runs(spark):
    """demo_datagen.md §2.1: bounded sequence field ends the job;
    random fields respect their bounds; computed ts accepted."""
    runner = JobRunner(spark, mode="batch")
    runner.execute_script(
        (EXAMPLES / "demo_8_datagen.sql").read_text()
    )
    rows = spark.table("datagen_out").collect()
    assert sorted(r["f_sequence"] for r in rows) == list(range(1, 51))
    assert all(1 <= r["f_random"] <= 100 for r in rows)
    assert all(len(r["f_random_str"]) == 10 for r in rows)


def test_demo9_stream_rank_runs(spark, tmp_path):
    """The streaming rank script: Window Top-N state and keep-first
    dedup maintained across micro-batches, hand-checked."""
    src = tmp_path / "rank_clicks"
    src.mkdir()

    def click(user, url, hhmmss):
        return json.dumps(
            {"username": user, "click_url": url,
             "ts": f"2020-04-15 {hhmmss}"}
        )

    (src / "a.json").write_text(
        "\n".join(
            [
                click("alice", "/u1", "08:00:01"),
                click("alice", "/u1", "08:00:05"),
                click("bob", "/u1", "08:00:10"),
                click("alice", "/u2", "08:00:20"),
            ]
        )
    )
    (src / "b.json").write_text(
        "\n".join(
            [
                click("bob", "/u2", "08:00:30"),
                click("bob", "/u3", "08:00:40"),
                click("carol", "/u3", "08:01:10"),
                click("carol", "/u3", "08:01:20"),
                click("alice", "/u2", "08:01:30"),
            ]
        )
    )
    import os
    import time

    os.utime(src / "b.json", (time.time() + 2, time.time() + 2))
    runner = JobRunner(spark, mode="streaming")
    result = runner.execute_script(
        (EXAMPLES / "demo_9_stream_rank.sql").read_text(),
        variables={"data_dir": str(tmp_path)},
    )
    _drain(result)
    top = {
        (r["window_start"], r["rn"]): (r["click_url"], r["clicks"])
        for r in runner.upsert_stores["top_urls"].to_df(spark).collect()
    }
    # minute 08:00 — /u1×3, /u2×2, /u3×1 → top2 = /u1, /u2
    assert top[("2020-04-15 08:00:00", 1)] == ("/u1", 3)
    assert top[("2020-04-15 08:00:00", 2)] == ("/u2", 2)
    # minute 08:01 — /u3×2, /u2×1
    assert top[("2020-04-15 08:01:00", 1)] == ("/u3", 2)
    assert top[("2020-04-15 08:01:00", 2)] == ("/u2", 1)
    first = {
        r["username"]: r["click_url"]
        for r in runner.upsert_stores["first_click"]
        .to_df(spark)
        .collect()
    }
    assert first == {"alice": "/u1", "bob": "/u1", "carol": "/u3"}


def test_demo10_match_recognize_runs(spark, tmp_path):
    """The Flink docs Ticker V-pattern as a script through the
    runner — batch MATCH_RECOGNIZE end-to-end."""
    src = tmp_path / "ticker"
    src.mkdir()
    prices = [12, 17, 19, 21, 25, 12, 15, 19, 20, 24, 25, 19]
    (src / "t.json").write_text(
        "\n".join(
            json.dumps(
                {"symbol": "ACME", "tstamp": i + 1, "price": float(p)}
            )
            for i, p in enumerate(prices)
        )
    )
    runner = JobRunner(spark, mode="batch")
    runner.execute_script(
        (EXAMPLES / "demo_10_match_recognize.sql").read_text(),
        variables={"data_dir": str(tmp_path)},
    )
    got = [
        (r["symbol"], r["start_tstamp"], r["bottom_tstamp"],
         r["end_tstamp"])
        for r in spark.table("dips").collect()
    ]
    assert got == [("ACME", 5, 6, 11)]


def test_demo11_flink113_joins_over_runs(spark, tmp_path):
    """Round-6 surface as one script: event-time temporal join
    (versioned rates) + streaming OVER aggregation, both through the
    runner's streaming routes."""
    orders = tmp_path / "orders"
    rates = tmp_path / "rates"
    orders.mkdir()
    rates.mkdir()
    (rates / "r.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"currency": "EUR", "rts": "2024-01-01 00:00:00",
                 "rate": 1.1},
                {"currency": "EUR", "rts": "2024-01-01 00:20:00",
                 "rate": 1.2},
            ]
        )
    )
    (orders / "o.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"order_id": 1, "currency": "EUR",
                 "ts": "2024-01-01 00:05:00", "amount": 10.0},
                {"order_id": 2, "currency": "EUR",
                 "ts": "2024-01-01 00:12:00", "amount": 30.0},
                {"order_id": 3, "currency": "EUR",
                 "ts": "2024-01-01 00:25:00", "amount": 20.0},
            ]
        )
    )
    runner = JobRunner(spark, mode="streaming")
    result = runner.execute_script(
        (EXAMPLES / "demo_11_flink113_joins_over.sql").read_text(),
        variables={"data_dir": str(tmp_path)},
    )
    for q in result.streaming_queries:
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(120)
    enriched = {
        r["order_id"]: r["rate"]
        for r in spark.table("enriched_orders").collect()
    }
    # orders 1-2 see the 00:00 rate; order 3 the 00:20 version
    assert enriched == {1: 1.1, 2: 1.1, 3: 1.2}
    stats = {
        r["order_id"]: (r["n_10m"], r["max_10m"])
        for r in spark.table("order_stats").collect()
    }
    # trailing 10-minute frames: order 2's window spans order 1;
    # order 3's window holds only itself
    assert stats == {1: (1, 10.0), 2: (2, 30.0), 3: (1, 20.0)}


def test_demo12_permute_patterns_runs(spark, tmp_path):
    """Round-8 pattern grammar as a script through the runner:
    PERMUTE(HI, LO) binds in either order (the second match is the
    LO HI permutation) and the nested (UP DOWN)+ group consumes
    whole pairs greedily."""
    src = tmp_path / "ticks"
    src.mkdir()
    prices = [25.0, 5.0, 15.0, 8.0, 22.0, 12.0]
    (src / "t.json").write_text(
        "\n".join(
            json.dumps({"symbol": "ACME", "seq": i + 1, "price": p})
            for i, p in enumerate(prices)
        )
    )
    runner = JobRunner(spark, mode="batch")
    runner.execute_script(
        (EXAMPLES / "demo_12_permute_patterns.sql").read_text(),
        variables={"data_dir": str(tmp_path)},
    )
    swings = sorted(
        (r["hi_seq"], r["lo_seq"])
        for r in spark.table("swings").collect()
    )
    # (1,2) is the HI LO branch; (5,4) is the LO HI permutation
    assert swings == [(1, 2), (5, 4)]
    osc = [
        (r["start_seq"], r["n_swings"])
        for r in spark.table("oscillations").collect()
    ]
    # 5→15→8→22→12: two whole up-down pairs from seq 2
    assert osc == [(2, 2)]
    dips = sorted(
        (r["lo_seq"], r["hi_seq"])
        for r in spark.table("dips").collect()
    )
    # grp ties scan seq-DESCENDING: grp0 orders (2, 1) so the
    # 5.0-tick at seq 2 is FOLLOWED by the 25.0-tick at seq 1 —
    # an adjacency that doesn't exist under ASC (which would pair
    # (4, 5) instead)
    assert dips == [(2, 1)]


def test_demo13_timestamp_ltz_runs(spark, tmp_path):
    """Flink 1.13's TO_TIMESTAMP_LTZ + TIMESTAMPDIFF through the full
    script route (translator rewrite of the numeric LTZ form, temporal
    scalar pass-through) — session tz pinned UTC, so the formatted
    values are exact."""
    src = tmp_path / "clicks"
    src.mkdir()
    base = 1704067200000  # 2024-01-01 00:00:00 UTC in epoch ms
    (src / "c.json").write_text(
        "\n".join(
            json.dumps({"id": i, "epoch_ms": base + i * 90_000 + 250})
            for i in range(3)
        )
    )
    runner = JobRunner(spark, mode="batch")
    runner.execute_script(
        (EXAMPLES / "demo_13_timestamp_ltz.sql").read_text(),
        variables={"data_dir": str(tmp_path)},
    )
    got = {
        r["id"]: (r["at_ms"], r["at_s"], r["mins_in"])
        for r in spark.table("click_times").collect()
    }
    assert got == {
        0: ("2024-01-01 00:00:00.250", "2024-01-01 00:00:00", 0),
        1: ("2024-01-01 00:01:30.250", "2024-01-01 00:01:30", 1),
        2: ("2024-01-01 00:03:00.250", "2024-01-01 00:03:00", 3),
    }, got


def test_demo14_skip_strategies_runs(spark, tmp_path):
    """All four AFTER MATCH strategies over the same rising-pair
    pattern in one script — the consumption differences hand-computed
    on one rising run (t=1..6) with a falling tail: PAST LAST ROW is
    disjoint, TO NEXT ROW is every start, TO LAST TOP chains matches
    sharing the TOP row, TO FIRST UP (offset 1) re-arms on the next
    row like TO NEXT for this shape."""
    src = tmp_path / "ticker"
    src.mkdir()
    prices = [1, 2, 3, 4, 5, 6, 3, 2]
    (src / "t.json").write_text(
        "\n".join(
            json.dumps(
                {"symbol": "ACME", "tstamp": i + 1, "price": float(p)}
            )
            for i, p in enumerate(prices)
        )
    )
    runner = JobRunner(spark, mode="batch")
    runner.execute_script(
        (EXAMPLES / "demo_14_skip_strategies.sql").read_text(),
        variables={"data_dir": str(tmp_path)},
    )

    def got(table):
        return sorted(
            (r["start_t"], r["top_t"])
            for r in spark.table(table).collect()
        )

    assert got("past_last") == [(1, 3), (4, 6)]
    assert got("to_next") == [(1, 3), (2, 4), (3, 5), (4, 6)]
    assert got("to_last_top") == [(1, 3), (3, 5)]
    assert got("to_first_up") == [(1, 3), (2, 4), (3, 5), (4, 6)]
