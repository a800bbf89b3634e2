"""applyInPandasWithState custom-operator tests: per-key running
aggregates accumulate across micro-batches through the state store."""

from __future__ import annotations

from flink_streaming_platform_web_spark.streaming.stateful import (
    running_counts,
)


def _write(spark, path, rows):
    spark.createDataFrame(rows, "k STRING, v DOUBLE").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_running_counts_across_batches(spark, tmp_path):
    src = f"{tmp_path}/state_src"
    _write(spark, src, [("a", 1.0), ("a", 2.0), ("b", 5.0)])
    sdf = (
        spark.readStream.schema("k STRING, v DOUBLE")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = running_counts(sdf)
    q = (
        out.writeStream.format("memory")
        .queryName("state_out")
        .outputMode("update")
        .option("checkpointLocation", f"{tmp_path}/state_ckpt")
        .start()
    )
    q.processAllAvailable()
    # second micro-batch: state must carry over
    _write(spark, src, [("a", 4.0)])
    q.processAllAvailable()
    q.stop()
    rows = spark.table("state_out").collect()
    # update-mode memory sink appends one row per touched key per
    # batch; the highest count per key is the converged state
    best = {}
    for r in rows:
        if r["key"] not in best or r["n"] > best[r["key"]][0]:
            best[r["key"]] = (r["n"], r["total"])
    assert best["a"] == (3, 7.0)
    assert best["b"] == (1, 5.0)
