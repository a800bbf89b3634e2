"""Skew-handling utilities: salted join for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; salting is the explicit tool for the pathological case AQE
can't fix — a single key so hot that one task would own it (the
classic power-law entity key at 100 TB).

``salted_join``: the big (skewed) side gets a random-but-deterministic
salt in [0, n); the small side replicates n× with every salt value;
the join key becomes (key, salt), spreading each hot key over n tasks.
Semantics are identical to the plain join (verified in
tests/test_skew.py); the cost is n× the small side, which is why the
small side must be the dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_platform_web_spark.operators._portable import (
    dsum,
    oracle_dsum,
)
from flink_streaming_platform_web_spark.tables import load


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `big ⋈ small` on `key`, spreading each of big's keys
    across `n_salts` partitions. The salt is a seeded rand() — a
    content hash would assign DUPLICATE rows of a hot key the same
    salt, collapsing the spread exactly in the pathological case this
    function exists for (a bot key emitting identical events). The
    salt never reaches the output, so its per-execution assignment
    cannot affect results; rand(seed) is deterministic given the
    upstream partitioning.

    Only inner/left joins are supported: a right/full outer join would
    emit each unmatched small-side row once PER SALT (the small side
    is replicated before the join)."""
    if how.replace("_", "").lower() not in ("inner", "left", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins, not {how!r} —"
            " the replicated small side would duplicate unmatched"
            " outer rows"
        )
    salt = F.floor(F.rand(42) * n_salts).cast("int").alias("__salt")
    big_s = big.select("*", salt)
    salts = small.sparkSession.range(n_salts).select(
        F.col("id").cast("int").alias("__salt")
    )
    small_s = small.crossJoin(F.broadcast(salts))
    joined = big_s.join(small_s, [key, "__salt"], how)
    return joined.drop("__salt")


# --------------------------------------------------------------------------
# q40 — the salted join through the correctness gate: events (the big,
# potentially hot-keyed fact) ⋈ customer (the dim, replicated n_salts×)
# on user_id = c_custkey, rolled up per market segment. The oracle is
# the PLAIN join + aggregation — identical results is the entire
# contract of salting (it rearranges the shuffle, never the data). At
# 100 TB: each hot user_id spreads over n_salts tasks instead of
# pinning one; the dim-side 8× replication is the bounded price.
# --------------------------------------------------------------------------


def q40_salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events").select(
        F.col("user_id").alias("c_custkey"), "value"
    )
    dim = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = salted_join(events, dim, "c_custkey", n_salts=8, how="inner")
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        dsum("value", "total_value"),
    )


ORACLE_Q40 = f"""
SELECT c_mktsegment, COUNT(*) AS n_events,
       {oracle_dsum('value', 'total_value')}
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c_mktsegment
"""


QUERIES = {"q40_salted_join_agg": q40_salted_join_agg}
ORACLES = {"q40_salted_join_agg": ORACLE_Q40}
