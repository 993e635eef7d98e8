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


# Join types where replicating the small side xsalt cannot change the
# result: every big-side row still meets each matching small-side row
# exactly once. right/full outer are EXCLUDED — an unmatched
# small-side row exists once per salt replica and would emit `salt`
# identical null-extended rows instead of one.
_SALT_SAFE_JOINS = frozenset({"inner", "left", "left_outer", "leftouter"})


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salt-scattered keys: big side gets a
    deterministic salt in [0, salt) hashed from the FULL row content;
    the small side is exploded ×salt. The join key becomes
    (key, salt) — a hot key now spreads over `salt` reducers. Cost:
    small side replicated `salt`× (keep it the genuinely-small side).

    The salt hashes every big-side column, never
    monotonically_increasing_id: a task retry recomputes monotonic
    ids with different values, which re-salts recomputed rows into
    different shuffle partitions mid-job — the SPARK-23207 class of
    silent duplication/loss. Byte-identical duplicate rows share a
    salt under content hashing (they land on one reducer), which is
    deterministic and correct — skew relief only needs rows that
    differ anywhere to scatter."""
    if how not in _SALT_SAFE_JOINS:
        raise ValueError(
            f"salted_join supports {sorted(_SALT_SAFE_JOINS)} joins, got {how!r}: "
            "with a replicated small side, right/full outer would emit one "
            "null-extended row PER SALT REPLICA for each unmatched small-side row"
        )
    b = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    )
    s = small.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    joined = b.join(
        s,
        (b[big_key] == s[small_key]) & (b["__salt"] == s["__salt"]),
        how,
    )
    return joined.drop("__salt")
