"""Registry of named queries with their DuckDB oracle SQL.

Each operator the engine claims is registered here as a
``QuerySpec``: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus
(when SQL-expressible) an ANSI-SQL oracle string DuckDB can run on the
same parquet tables. The driver's correctness gate and the local
pytest oracle harness both consume this registry, so the engine and
its oracle can never drift apart silently.

Determinism discipline (what makes cross-engine value-hashing work):
- aggregate sums over money/quantity go through DECIMAL casts — exact
  in both engines, so results match bit-for-bit regardless of
  partitioning or accumulation order;
- ratios/averages are ONE double division of exact quantities
  (decimal-sum cast to double / count) — IEEE ops on identical inputs
  are identical in both engines;
- every probabilistic op hashes via md5 (functions/hashing.py);
- every top-k orders with a unique tiebreaker column.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco
