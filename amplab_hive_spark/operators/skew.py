"""Skew-handling utilities.

Reference parity (SURVEY.md §2.1/§4.3): the reference handles skew
two ways — compile-time key splitting (SkewJoinOptimizer.java:95)
and runtime oversized-key spill + follow-up map-join
(SkewJoinHandler.java:74, GenSparkSkewJoinProcessor). On Spark, AQE
skew-join (`spark.sql.adaptive.skewJoin.enabled`, on in session.py)
replaces both for sort-merge joins by splitting oversized partitions
at runtime.

``salted_join`` is the explicit fallback for the case AQE cannot
fix: a shuffled join whose SINGLE KEY VALUE exceeds one executor
(AQE splits partitions, not keys, for aggregations-after-join or
non-SMJ plans). Salting replicates the small side R times and
scatters the big side's hot keys across R sub-keys — the classic
100 TB recipe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salt-scattered keys: big side gets a random
    (but deterministic per row, via key+monotonic id hash) salt in
    [0, salt); the small side is exploded ×salt. The join key
    becomes (key, salt) — a hot key now spreads over `salt`
    reducers. Cost: small side replicated `salt`× (keep it the
    genuinely-small side)."""
    b = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(big_key), F.monotonically_increasing_id()), F.lit(salt))
    )
    s = small.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    joined = b.join(
        s,
        (b[big_key] == s[small_key]) & (b["__salt"] == s["__salt"]),
        how,
    )
    return joined.drop("__salt")
