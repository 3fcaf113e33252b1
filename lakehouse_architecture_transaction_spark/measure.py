"""Measurement helpers shared by the bench and every probe/audit tool.

One definition of "force this query" so the harnesses can never drift
apart on action semantics again — the r11 count()-era bug was exactly
that: an action Catalyst could partially prune (aggregate expressions
under grouped aggregates, one-row-plan unions, map-only projections),
silently under-measuring different queries in different tools.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def force_full_result(df: DataFrame) -> None:
    """Execute the FULL plan of ``df`` and discard the rows
    executor-side: a noop-sink write computes every output column
    (nothing is prunable against a write) with no driver transfer to
    distort big-output shapes. This is THE measurement action — do
    not replace with count()/collect() in any harness."""
    df.write.format("noop").mode("overwrite").save()
