"""Streaming throughput micro-bench: rate source → watermarked tumble
window agg → noop sink. Prints one JSON line with rows/sec processed.

    python tools/stream_bench.py [seconds] [rows_per_second]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from flink_streaming_platform_web_spark.session import get_spark


def main() -> None:
    duration = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
    rps = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    spark = get_spark("stream-bench")
    spark.sparkContext.setLogLevel("ERROR")
    agg = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rps))
        .load()
        .withWatermark("timestamp", "10 seconds")
        .groupBy(F.window("timestamp", "5 seconds"), F.col("value") % 100)
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
    )
    q = (
        agg.writeStream.format("noop")
        .outputMode("update")
        .trigger(processingTime="1 second")
        .start()
    )
    # drain progress DURING the run, deduped by batchId:
    # q.recentProgress is capped (spark.sql.streaming.
    # numRecentProgressUpdates = 100), so a single read at the end
    # undercounts any run longer than ~100 triggers
    rows = 0
    seen: set[int] = set()
    deadline = time.time() + duration
    while time.time() < deadline:
        for p in q.recentProgress:
            if p["batchId"] not in seen:
                seen.add(p["batchId"])
                rows += p["numInputRows"]
        time.sleep(1.0)
    for p in q.recentProgress:
        if p["batchId"] not in seen:
            seen.add(p["batchId"])
            rows += p["numInputRows"]
    q.stop()
    spark.stop()
    print(
        json.dumps(
            {
                "metric": "rate_window_agg_throughput",
                "rows_processed": rows,
                "wall_s": duration,
                "rows_per_sec": round(rows / duration, 1),
                "unit": "rows/sec",
            }
        )
    )


if __name__ == "__main__":
    main()
