"""Incremental aggregate maintenance (materialized-view merge).

A nightly/streaming lakehouse keeps aggregate tables fresh by merging
PARTIAL aggregates from new data into the stored rollup instead of
recomputing from all history — the batch twin of streaming's
partial-aggregation state, and what makes a 100 TB daily rollup cost
one day's scan, not the archive's.

Correctness requirement: the merged measures must be decomposable
(SUM/COUNT/MIN/MAX — merge = re-aggregate of partials; exact-decimal
sums keep the merge bit-identical to a from-scratch recompute).
COUNT(DISTINCT) is NOT decomposable — maintain it with sketches
(approx_count_distinct state) or accept recompute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_partial_aggs(
    base: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    count_cols: list[str],
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
) -> DataFrame:
    """Merge two partial-aggregate tables with identical schemas into
    the aggregate of their union: sums add, counts add, mins/maxes
    fold. One shuffle on the group keys, sized by the AGGREGATE
    cardinality — never the raw data."""
    both = base.unionByName(delta)
    aggs = (
        [F.sum(c).alias(c) for c in sum_cols]
        + [F.sum(c).alias(c) for c in count_cols]
        + [F.min(c).alias(c) for c in (min_cols or [])]
        + [F.max(c).alias(c) for c in (max_cols or [])]
    )
    return both.groupBy(*keys).agg(*aggs)
