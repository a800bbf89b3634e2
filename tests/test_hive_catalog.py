"""Hive catalog end-to-end (reference: docs/catalog.md demo3 +
docs/sql_demo/demo_batch.md): CREATE CATALOG … ('type'='hive') →
USE CATALOG → hive-table DDL → VALUES insert → INSERT SELECT, driven
through the script runner against an embedded Derby metastore.

Runs in a subprocess because ``spark.sql.catalogImplementation`` is
session-static (the shared test fixture is in-memory-catalog).
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_SCRIPT = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    from flink_streaming_platform_web_spark.session import get_spark
    from flink_streaming_platform_web_spark.streaming.runner import JobRunner

    spark = get_spark("hive_e2e", master="local[2]",
                      shuffle_partitions=2, hive=True)
    spark.sparkContext.setLogLevel("ERROR")
    assert spark.conf.get("spark.sql.catalogImplementation") == "hive"

    runner = JobRunner(spark, mode="batch")
    runner.execute_script('''
        CREATE CATALOG testmyhive WITH ('type' = 'hive');
        USE CATALOG testmyhive;
        CREATE DATABASE IF NOT EXISTS test;
        CREATE TABLE IF NOT EXISTS test.batch_sink (id INT, name STRING);
        INSERT INTO test.batch_sink VALUES (4, 'n2');
        INSERT INTO test.batch_sink SELECT 5, 'n3';
    ''')
    rows = sorted(
        (r["id"], r["name"])
        for r in spark.sql("SELECT * FROM test.batch_sink").collect()
    )
    assert rows == [(4, "n2"), (5, "n3")], rows
    # metastore persistence: a NEW runner sees the catalog table
    r2 = JobRunner(spark, mode="batch")
    out = r2.execute_script(
        "SELECT count(*) AS n FROM test.batch_sink;"
    )
    assert out.select_results[0].collect()[0]["n"] == 2
    spark.sql("DROP TABLE test.batch_sink")
    print("HIVE_E2E_OK")
    """
)


def test_hive_catalog_end_to_end(tmp_path):
    env = dict(os.environ)
    env["SPARK_GRAFT_HIVE_DIR"] = str(tmp_path / "hive")
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=str(REPO))],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=str(tmp_path),
    )
    assert "HIVE_E2E_OK" in proc.stdout, proc.stderr[-3000:]
