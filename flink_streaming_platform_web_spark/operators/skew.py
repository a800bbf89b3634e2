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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `big ⋈ small` on `key`, spreading each of big's keys
    across `n_salts` partitions. Deterministic salting (hash of the
    full row via monotonically-increasing id would break determinism;
    crc32 of the key + a per-row component from existing columns keeps
    replays stable)."""
    salt = (F.crc32(F.concat_ws("\x1f", *big.columns)) % n_salts).alias(
        "__salt"
    )
    big_s = big.select("*", salt)
    salts = small.sparkSession.range(n_salts).select(
        F.col("id").cast("int").alias("__salt")
    )
    small_s = small.crossJoin(F.broadcast(salts))
    joined = big_s.join(small_s, [key, "__salt"], how)
    return joined.drop("__salt")
