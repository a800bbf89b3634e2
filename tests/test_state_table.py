"""StateTable: the executor-side keyed state behind the rank router
and the CDC materialization (round-6 driver-state eviction — VERDICT
r5 findings 1-2)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from flink_streaming_platform_web_spark.streaming.state_table import (
    StateTable,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("amount", DoubleType()),
    ]
)


def _table(spark, tmp_path, **kw) -> StateTable:
    return StateTable(
        spark, str(tmp_path / "state"), ["id"], SCHEMA, **kw
    )


def _rows(st):
    return {
        r["id"]: (r["name"], r["amount"])
        for r in st.view().collect()
    }


def test_empty_view_has_schema(spark, tmp_path):
    st = _table(spark, tmp_path)
    df = st.view()
    assert df.schema == SCHEMA
    assert df.count() == 0


def test_merge_upsert_and_delete(spark, tmp_path):
    st = _table(spark, tmp_path)
    st.merge(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], SCHEMA
        )
    )
    assert _rows(st) == {1: ("a", 10.0), 2: ("b", 20.0), 3: ("c", 30.0)}
    # second batch: update 1, delete 2, insert 4
    st.merge(
        spark.createDataFrame([(1, "a2", 11.0), (4, "d", 40.0)], SCHEMA),
        delete_keys=spark.createDataFrame([(2,)], "id bigint"),
    )
    assert _rows(st) == {
        1: ("a2", 11.0),
        3: ("c", 30.0),
        4: ("d", 40.0),
    }


def test_delete_all_keys_empties_bucket_dirs(spark, tmp_path):
    st = _table(spark, tmp_path, num_buckets=2)
    st.merge(
        spark.createDataFrame([(i, "x", 1.0) for i in range(8)], SCHEMA)
    )
    st.merge(
        spark.createDataFrame([], SCHEMA),
        delete_keys=spark.createDataFrame(
            [(i,) for i in range(8)], "id bigint"
        ),
    )
    assert st.view().count() == 0
    # the now-empty buckets dropped out of the manifest, and their
    # superseded dirs were GC'd — no stale parquet anywhere (the
    # dynamic-partition-overwrite pitfall the swap exists to avoid)
    assert st._manifest() == {}
    leftovers = [
        f
        for _, _, files in os.walk(st.path)
        for f in files
        if f.endswith(".parquet")
    ]
    assert leftovers == []


def test_merge_rewrites_only_touched_buckets(spark, tmp_path):
    st = _table(spark, tmp_path, num_buckets=16)
    st.merge(
        spark.createDataFrame(
            [(i, "x", float(i)) for i in range(64)], SCHEMA
        )
    )
    before = st._manifest()
    # touch exactly one key → exactly the buckets of that key get a
    # new manifest entry; every other bucket keeps its committed dir
    # (and therefore its files) untouched
    st.merge(spark.createDataFrame([(7, "y", 7.5)], SCHEMA))
    after = st._manifest()
    assert set(after) == set(before)
    changed = {b for b in after if before[b] != after[b]}
    assert len(changed) == 1  # one key → one bucket rewritten
    assert _rows(st)[7] == ("y", 7.5)
    assert len(_rows(st)) == 64


def test_crash_before_manifest_commit_keeps_old_state(
    spark, tmp_path, monkeypatch
):
    """Crash-consistency (round-7 verdict item 7): a multi-bucket
    merge that dies at ANY point before the manifest commit must
    leave readers on the complete OLD state — never a torn mix — and
    a retried merge must converge without full replay."""
    st = _table(spark, tmp_path, num_buckets=4)
    st.merge(
        spark.createDataFrame(
            [(i, "v1", float(i)) for i in range(12)], SCHEMA
        )
    )
    before = _rows(st)
    update = spark.createDataFrame(
        [(i, "v2", float(i) * 2) for i in range(12)], SCHEMA
    )

    real_replace = os.replace

    def crash_on_commit(src, dst):
        if dst.endswith("_manifest.json"):
            raise RuntimeError("simulated crash mid-merge")
        return real_replace(src, dst)

    monkeypatch.setattr(os, "replace", crash_on_commit)
    with pytest.raises(RuntimeError, match="simulated crash"):
        st.merge(update)
    monkeypatch.setattr(os, "replace", real_replace)
    # the staged generation exists on disk but is UNREFERENCED: every
    # read still serves the complete pre-merge state
    assert _rows(st) == before
    # retry converges — the new generation supersedes the leaked one
    st.merge(update)
    assert _rows(st) == {i: ("v2", float(i) * 2) for i in range(12)}


def test_crash_during_gc_is_harmless(spark, tmp_path, monkeypatch):
    """A crash AFTER the manifest commit (during superseded-dir GC)
    leaks unreferenced files only: readers already see the complete
    new state, and the next merge proceeds normally."""
    import shutil as _shutil

    st = _table(spark, tmp_path, num_buckets=4)
    st.merge(
        spark.createDataFrame(
            [(i, "v1", float(i)) for i in range(8)], SCHEMA
        )
    )

    real_rmtree = _shutil.rmtree
    monkeypatch.setattr(
        "flink_streaming_platform_web_spark.streaming.state_table"
        ".shutil.rmtree",
        lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("crash in GC")
        ),
    )
    try:
        st.merge(
            spark.createDataFrame(
                [(i, "v2", float(i) * 2) for i in range(8)], SCHEMA
            )
        )
    except RuntimeError:
        pass  # GC interrupted — commit already happened
    monkeypatch.setattr(
        "flink_streaming_platform_web_spark.streaming.state_table"
        ".shutil.rmtree",
        real_rmtree,
    )
    assert _rows(st) == {i: ("v2", float(i) * 2) for i in range(8)}
    st.merge(spark.createDataFrame([(0, "v3", 0.5)], SCHEMA))
    assert _rows(st)[0] == ("v3", 0.5)
    assert len(_rows(st)) == 8


def test_type_coercion_on_merge(spark, tmp_path):
    st = _table(spark, tmp_path)
    # a DECIMAL-summed batch (wider than the declared double) must not
    # write files the pinned-schema read would reject
    wide = spark.createDataFrame(
        [(1, "a", "10.50")], "id bigint, name string, amount string"
    ).withColumn("amount", F.col("amount").cast("decimal(18,2)"))
    st.merge(wide)
    assert _rows(st) == {1: ("a", 10.5)}


def test_delete_where_sweep(spark, tmp_path):
    st = _table(spark, tmp_path, num_buckets=4)
    st.merge(
        spark.createDataFrame(
            [(i, "old" if i < 5 else "new", float(i)) for i in range(10)],
            SCHEMA,
        )
    )
    st.delete_where(F.col("name") == "old")
    assert sorted(_rows(st)) == [5, 6, 7, 8, 9]
    # no-op sweep leaves everything alone
    st.delete_where(F.col("name") == "absent")
    assert len(_rows(st)) == 5


def test_key_must_be_in_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="key columns"):
        StateTable(spark, str(tmp_path / "s"), ["nope"], SCHEMA)
