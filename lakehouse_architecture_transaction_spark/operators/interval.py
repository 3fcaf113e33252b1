"""Scalable batch interval (range) join.

Spark has a native time-interval join only for STREAM-stream joins;
the batch translation of ``r.ts BETWEEN l.ts + lower AND l.ts + upper``
with no equi-key degenerates to BroadcastNestedLoop/cartesian, and
even with an equi-key it materializes every (left, right-history) pair
before filtering. The scale pattern is TIME BUCKETING: hash both sides
into fixed windows of width w = upper − lower, so each left row's
interval spans at most TWO buckets; explode the left side into those
(≤2) candidate buckets and equi-join on (keys…, bucket), then apply
the exact range predicate. The shuffle is keyed by (keys, bucket) —
bounded and AQE-balanceable — and the pair space is limited to rows
within one window width of each other, not per-key history.

Timestamps are TIMESTAMP_NTZ; arithmetic uses ``timestampdiff`` from a
fixed ntz epoch (microsecond-exact, timezone-independent — no
``unix_timestamp``, which routes through the session timezone).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EPOCH_US = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts})"


def bucketed_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_seconds: float,
    upper_seconds: float,
    on: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Inner join of every (left, right) pair with
    ``right_ts ∈ [left_ts + lower_seconds, left_ts + upper_seconds]``
    (bounds inclusive) and all ``on`` key pairs equal.

    Output columns: left's then right's (caller disambiguates names
    upstream). ``lower_seconds`` may be negative (look-back joins).
    """
    if upper_seconds <= lower_seconds:
        raise ValueError("upper_seconds must exceed lower_seconds")
    w_us = int(round((upper_seconds - lower_seconds) * 1_000_000))
    lo_us = int(round(lower_seconds * 1_000_000))
    hi_us = int(round(upper_seconds * 1_000_000))
    on = on or []

    r_us = F.expr(_EPOCH_US.format(ts=right_ts))
    right_b = right.withColumn("__ib", F.floor(r_us / w_us).cast("long"))
    l_us = F.expr(_EPOCH_US.format(ts=left_ts))
    # the window [ts+lo, ts+hi] has length w, so it covers ≤2 buckets
    b0 = F.floor((l_us + F.lit(lo_us)) / w_us).cast("long")
    b1 = F.floor((l_us + F.lit(hi_us)) / w_us).cast("long")
    left_b = left.withColumn("__ib", F.explode(F.array_distinct(F.array(b0, b1))))

    cond = F.col(f"l.__ib") == F.col(f"r.__ib")
    for lk, rk in on:
        cond = cond & (F.col(f"l.{lk}") == F.col(f"r.{rk}"))
    range_pred = F.expr(
        f"timestampdiff(MICROSECOND, l.{left_ts}, r.{right_ts}) BETWEEN {lo_us} AND {hi_us}"
    )
    out_cols = [F.col(f"l.{c}") for c in left.columns] + [F.col(f"r.{c}") for c in right.columns]
    return (
        left_b.alias("l")
        .join(right_b.alias("r"), cond, "inner")
        .filter(range_pred)
        .select(*out_cols)
    )
