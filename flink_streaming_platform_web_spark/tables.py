"""Catalog of the driver-provided parquet tables (TESTDATA.md).

The reference declares every dataset via ``CREATE TABLE … WITH
('connector'=…)`` DDL (SqlCommand.java:27-29); our batch-parity tests
use the driver's deterministic parquet corpus instead. ``register_views``
exposes them as temp views so the SQL surface (spark.sql) works exactly
like the reference's pass-through ``tEnv.executeSql``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_BUILTINS_INSTALLED: set[int] = set()

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables: always broadcastable at ANY scale factor —
# region has 5 rows and nation 25 at every SF (TPC-H-style fixed dims).
BROADCAST_TABLES = frozenset({"region", "nation"})


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table; column pruning + predicate pushdown reach the
    parquet scan because we never materialize or cache eagerly.

    The driver's `events` parquet stores `ts` as INT64
    TIMESTAMP(NANOS), which Spark's reader rejects. We read nanos as
    long (runtime-settable legacy conf) and floor-truncate to
    microseconds — exactly what DuckDB's TIMESTAMP_NS→µs conversion
    does, so both engines see identical instants.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # the driver may call queries() on its own session — pin the confs
    # correctness depends on (UTC timestamps for oracle comparison,
    # Arrow for the pandas kernels) and the perf posture (AQE +
    # right-sized shuffle parallelism); all are runtime-settable
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    if int(spark.conf.get("spark.sql.shuffle.partitions", "200")) > 64:
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(spark.sparkContext.defaultParallelism),
        )
    # the driver (and any vanilla session) must see the Flink-compat
    # builtins — q37 etc. call split_index/truncate/sha256 in plain SQL.
    # Key by (id, applicationId): a bare id() can be RECYCLED by a new
    # session after the old one is GC'd, silently skipping the install
    # (same hazard operators/_cache._session_key documents)
    try:
        skey = (id(spark), spark.sparkContext.applicationId)
    except Exception:
        skey = (id(spark), None)
    if skey not in _BUILTINS_INSTALLED:
        from flink_streaming_platform_web_spark.functions import flink_builtins

        flink_builtins.install(spark)
        _BUILTINS_INSTALLED.add(skey)
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        from pyspark.sql import functions as F

        if dict(df.dtypes).get("ts") == "bigint":
            # FLOOR division (ts - pmod keeps it all-integer): bare
            # `div` truncates toward zero, which would round pre-epoch
            # nanos the wrong way vs DuckDB's floor conversion
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestamp_micros((ts - pmod(ts, 1000)) div 1000)"
                ),
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(
    spark: SparkSession, sf_dir: str, only: tuple[str, ...] | None = None
) -> None:
    """Register tables as temp views for spark.sql access. Pass `only`
    to skip reading footers of tables a query never touches."""
    for name in only or TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
