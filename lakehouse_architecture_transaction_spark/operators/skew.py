"""Skew-mitigated join: explicit key salting for hot keys.

AQE's skew-join splitting (on in session.py) handles most skew by
splitting oversized partitions AFTER the shuffle files exist. Salting
attacks the pathological case AQE can't fix: ONE key so hot that even
a single map task's output for it is unmanageable, or a build side
that must be replicated anyway. The left (big/skewed) side gets a
random salt in [0, salt); the right side is replicated ``salt`` times
with every salt value; the join key becomes (key, salt) — the hot
key's rows spread over ``salt`` reducers.

Use ONLY when the right side is small enough to replicate ``salt``
times (dimension-ish); for fact-fact skew prefer AQE. Results are
identical to the plain equi-join (verified by test) — salting changes
physical distribution, nothing logical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join with the left side salted and the right side
    replicated across all salt values. Output columns = left ++ right
    (minus the duplicated right key).

    Only left-preserving joins are allowed: with ``right``/``full``,
    an unmatched right row would surface once PER SALT VALUE (the
    right side is physically replicated ``salt`` times), multiplying
    output rows.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports only left-preserving joins {sorted(allowed)}, got how={how!r}: "
            "the replicated right side would emit unmatched right rows once per salt value"
        )
    salted_left = left.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    replicated_right = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    cond = (F.col(f"l.{left_key}") == F.col(f"r.{right_key}")) & (
        F.col("l.__salt") == F.col("r.__salt")
    )
    out = salted_left.alias("l").join(replicated_right.alias("r"), cond, how)
    keep_right = [c for c in right.columns if c != right_key]
    return out.select(*[F.col(f"l.{c}") for c in left.columns], *[F.col(f"r.{c}") for c in keep_right])
