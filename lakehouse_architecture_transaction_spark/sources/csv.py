"""Schema-enforced CSV ingestion with corrupt-record routing.

Parity with the reference's ingestion step (reference
scripts/glue/script.py:237-251: header CSV read, then cast-to-schema)
plus the validation-zone split the reference does downstream. Spark's
PERMISSIVE mode captures unparseable lines in ``_corrupt_record``;
rows that parse but fail the declared types surface as nulls after
the cast and are routed by the validation rule engine.

Scale: one pass, no inferSchema (schema inference reads the data
twice and is nondeterministic under sampling — never in production).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT = "_corrupt_record"


def read_csv_enforced(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Read CSV with a declared schema → (parsed, corrupt).

    ``parsed`` has exactly ``schema``'s columns/types — values that
    fail the declared type cast become null (the reference's
    cast-all-fields semantics; nulls are routed downstream by the
    validation rule engine). ``corrupt`` holds raw lines Spark could
    not parse structurally at all (bad quoting / token count).
    """
    string_fields = [T.StructField(f.name, T.StringType(), True) for f in schema.fields]
    read_schema = T.StructType(string_fields + [T.StructField(CORRUPT, T.StringType(), True)])
    raw = (
        spark.read.schema(read_schema)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT)
        .csv(path)
        .cache()  # one scan feeds both splits
    )
    # try_cast: ANSI-mode (Spark 4 default) plain cast throws on
    # malformed values; the contract here is bad-value → null.
    parsed = raw.filter(F.col(CORRUPT).isNull()).select(
        *[F.col(f.name).try_cast(f.dataType).alias(f.name) for f in schema.fields]
    )
    corrupt = raw.filter(F.col(CORRUPT).isNotNull()).select(CORRUPT)
    return parsed, corrupt
