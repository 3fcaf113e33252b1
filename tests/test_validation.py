"""Validation rule engine tests — mirrors the reference's test shape
(reference tests/test_glue_etl.py: valid/invalid splits, RI checks)."""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F
from pyspark.sql import types as T

from lakehouse_architecture_transaction_spark.functions.validation import (
    FkCheck,
    enforce_schema,
    not_null,
    positive,
    validate,
)

ORDERS_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.IntegerType()),
        T.StructField("user_id", T.IntegerType()),
        T.StructField("order_timestamp", T.TimestampType()),
        T.StructField("total_amount", T.DoubleType()),
    ]
)


def _orders_df(spark):
    ts = datetime(2025, 4, 16, 12, 0, 0)
    return spark.createDataFrame(
        [
            (100, 1, ts, 10.0),
            (101, 1, ts, -5.0),  # non-positive amount
            (None, 2, ts, 7.0),  # null pk
            (102, 2, None, 7.0),  # null timestamp
            (103, 3, ts, None),  # null amount is VALID (reference semantics)
        ],
        schema=ORDERS_SCHEMA,
    )


def test_validate_split_counts(spark):
    res = validate(
        _orders_df(spark),
        rules=[
            not_null("order_id", "Null order_id primary key"),
            not_null("order_timestamp", "Invalid timestamp"),
            positive("total_amount", "Non-positive total amount"),
        ],
    )
    assert res.valid.count() == 2
    rejected = {r["validation_errors"] for r in res.rejected.collect()}
    assert rejected == {"Null order_id primary key", "Invalid timestamp", "Non-positive total amount"}


def test_first_failing_rule_wins(spark):
    # A row failing multiple rules reports the FIRST rule's message,
    # matching the reference's chained when() (scripts/glue/script.py:102-109).
    res = validate(
        _orders_df(spark).filter(F.col("user_id") == 2),
        rules=[not_null("order_id"), not_null("order_timestamp")],
    )
    errs = sorted(r["validation_errors"] for r in res.rejected.collect())
    assert errs == ["Null order_id", "Null order_timestamp"]


def test_fk_check_broadcast_anti_join(spark):
    items = spark.createDataFrame([(1, 101), (2, 102), (3, 999)], "id int, product_id int")
    products = spark.createDataFrame([(101,), (102,)], "product_id int")
    res = validate(items, fk_checks=[FkCheck("product_id", products, "product_id")])
    assert res.valid.count() == 2
    bad = res.rejected.collect()
    assert len(bad) == 1 and bad[0]["id"] == 3
    assert bad[0]["validation_errors"] == "Invalid product_id reference"


def test_null_fk_passes_fk_check(spark):
    items = spark.createDataFrame([(1, None)], "id int, product_id int")
    products = spark.createDataFrame([(101,)], "product_id int")
    res = validate(items, fk_checks=[FkCheck("product_id", products, "product_id")])
    assert res.valid.count() == 1


def test_rejected_with_meta(spark):
    res = validate(_orders_df(spark), rules=[not_null("order_id")])
    meta = res.rejected_with_meta("orders")
    assert {"rejection_time", "source"} <= set(meta.columns)
    assert meta.filter(F.col("source") == "orders").count() == res.rejected.count()


def test_enforce_schema_bad_values_to_null(spark):
    raw = spark.createDataFrame([("1", "abc"), ("2", "3.5")], "a string, b string")
    target = T.StructType([T.StructField("a", T.IntegerType()), T.StructField("b", T.DoubleType())])
    out = enforce_schema(raw, target)
    assert [f.dataType for f in out.schema.fields] == [T.IntegerType(), T.DoubleType()]
    rows = {r["a"]: r["b"] for r in out.collect()}
    assert rows[1] is None and rows[2] == 3.5
