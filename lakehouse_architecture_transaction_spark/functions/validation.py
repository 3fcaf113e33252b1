"""Declarative data-validation rule engine.

Parity with the reference's ``validate_data`` (reference
scripts/glue/script.py:93-161, tests/functions.py:13-73): each dataset
gets a list of rules; the first failing rule's message lands in a
``validation_errors`` column; rows split into a valid set (column
dropped) and a rejected set (column kept, plus ``rejection_time`` /
``source`` metadata as in scripts/glue/script.py:182-183).

Scale-critical difference from the reference: referential-integrity
checks there collect() the reference keys to the driver and use
``isin`` (tests/functions.py:29-30) — that dies on a 100 TB fact
table. Here RI is a broadcast (or shuffle) LEFT JOIN against the
distinct key set: fully distributed, no driver materialization, and
Catalyst picks broadcast vs shuffle-hash by size/AQE.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """A validation rule: rows where ``predicate`` is true FAIL with ``error``."""

    error: str
    predicate: Column


def not_null(col: str, error: str | None = None) -> Rule:
    return Rule(error or f"Null {col}", F.col(col).isNull())


def positive(col: str, error: str | None = None) -> Rule:
    """Fails non-positive values; nulls pass (reference treats null
    total_amount as valid — scripts/glue/script.py:139)."""
    return Rule(error or f"Non-positive {col}", F.col(col).isNotNull() & (F.col(col) <= 0))


@dataclass(frozen=True)
class FkCheck:
    """Referential-integrity check: ``fk_col`` must exist in
    ``ref[ref_col]``. Null FKs are handled by a not_null rule if the
    FK is mandatory; here null FK rows pass (SQL FK semantics)."""

    fk_col: str
    ref: DataFrame
    ref_col: str
    error: str = ""
    broadcast: bool = True

    def message(self) -> str:
        return self.error or f"Invalid {self.fk_col} reference"


@dataclass
class ValidationResult:
    valid: DataFrame
    rejected: DataFrame
    error_col: str = "validation_errors"

    def rejected_with_meta(self, source: str) -> DataFrame:
        """Rejected rows enriched like the reference's rejected zone
        (scripts/glue/script.py:182-183)."""
        return self.rejected.withColumn("rejection_time", F.current_timestamp()).withColumn(
            "source", F.lit(source)
        )


_ERR = "validation_errors"


def validate(
    df: DataFrame,
    rules: list[Rule] = (),
    fk_checks: list[FkCheck] = (),
    error_col: str = _ERR,
) -> ValidationResult:
    """Apply rules in order (first failure wins, matching the
    reference's chained ``when`` — scripts/glue/script.py:102-109),
    then FK checks, then split valid/rejected.

    One narrow projection + at most one join per FK check; the whole
    thing stays inside whole-stage codegen except the joins.
    """
    out = df
    join_flags: list[tuple[str, str]] = []
    for i, fk in enumerate(fk_checks):
        flag = f"__fk_ok_{i}"
        keys = fk.ref.select(F.col(fk.ref_col).alias(fk.fk_col)).distinct().withColumn(flag, F.lit(True))
        keys = F.broadcast(keys) if fk.broadcast else keys
        out = out.join(keys, on=fk.fk_col, how="left")
        join_flags.append((flag, fk.message()))

    err: Column = F.lit(None).cast("string")
    # Build the first-failure-wins chain in declaration order.
    conds: list[tuple[Column, str]] = [(r.predicate, r.error) for r in rules]
    conds += [
        (F.col(flag).isNull() & F.col(fk.fk_col).isNotNull(), msg)
        for (flag, msg), fk in zip(join_flags, fk_checks)
    ]
    for pred, msg in reversed(conds):
        err = F.when(pred, F.lit(msg)).otherwise(err)

    flagged = out.withColumn(error_col, err).drop(*[f for f, _ in join_flags])
    valid = flagged.filter(F.col(error_col).isNull()).drop(error_col)
    rejected = flagged.filter(F.col(error_col).isNotNull())
    return ValidationResult(valid=valid, rejected=rejected, error_col=error_col)


def enforce_schema(df: DataFrame, schema) -> DataFrame:
    """Cast every field to the declared type (bad values → null), the
    reference's schema-enforcement step (scripts/glue/script.py:169-171).
    Single select → one projection, not N withColumns.

    ``try_cast`` (not ``cast``): Spark 4 defaults to ANSI mode, where a
    plain cast THROWS on malformed input — the reference's Spark-3 Glue
    semantics are cast-to-null, with the nulls routed downstream by the
    validation rules.
    """
    return df.select(*[F.col(f.name).try_cast(f.dataType).alias(f.name) for f in schema.fields])
