"""Schema-enforced JSON-lines ingestion with corrupt-record routing.

Same contract as sources/csv.py (the reference's ingest is CSV-only —
scripts/glue/script.py:237-251 — but a lakehouse landing zone takes
JSON events just as often): declared schema, PERMISSIVE parse,
structurally-unparseable lines routed to a corrupt split, type
mismatches cast to null for the validation rule engine.

Scale: single pass, no schema inference (inference scans twice and is
sampling-nondeterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT = "_corrupt_record"


def read_json_enforced(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
) -> tuple[DataFrame, DataFrame]:
    """Read JSON-lines with a declared schema → (parsed, corrupt).

    Fields are first read as strings (so a number-vs-string mismatch
    is not itself corruption), then try_cast to the declared types —
    bad values become null, matching the CSV path and the reference's
    cast-to-null semantics."""
    string_fields = [T.StructField(f.name, T.StringType(), True) for f in schema.fields]
    read_schema = T.StructType(string_fields + [T.StructField(CORRUPT, T.StringType(), True)])
    raw = (
        spark.read.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT)
        .json(path)
        .cache()  # one scan feeds both splits
    )
    parsed = raw.filter(F.col(CORRUPT).isNull()).select(
        *[F.col(f.name).try_cast(f.dataType).alias(f.name) for f in schema.fields]
    )
    corrupt = raw.filter(F.col(CORRUPT).isNotNull()).select(CORRUPT)
    return parsed, corrupt
