"""Lakehouse ETL parity queries (reference scripts/glue/script.py).

The reference pipeline is: schema cast → validate (split
valid/rejected) → dedup by PK → Delta merge/upsert. Each stage is
registered here as a deterministic query over the testdata. The
testdata is clean, so validation/dedup stages first DIRTY it with
deterministic key-derived perturbations (both engines compute the same
dirty input) — the operator then has real work to do and the oracle
checks the interesting path, not just a pass-through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_architecture_transaction_spark.catalog import load_table
from lakehouse_architecture_transaction_spark.functions.validation import FkCheck, not_null, positive, validate
from lakehouse_architecture_transaction_spark.operators.dedup import dedup_exact
from lakehouse_architecture_transaction_spark.operators.merge import merge_upsert
from lakehouse_architecture_transaction_spark.plans.registry import register

# Deterministic dirtying of orders: key-derived nulls / sign flips
# (mirrors the dirty-CSV conditions the reference validates against).
_DIRTY_ORDERS_SQL = """
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 47 = 0 THEN NULL ELSE o_custkey END AS o_custkey,
           o_orderstatus,
           CASE WHEN o_orderkey % 41 = 0 THEN -o_totalprice ELSE o_totalprice END AS o_totalprice,
           CASE WHEN o_orderkey % 43 = 0 THEN NULL ELSE o_orderdate END AS o_orderdate,
           o_orderpriority
    FROM orders
"""

_ORDER_RULES_SQL = """
    CASE WHEN o_orderkey IS NULL THEN 'Null o_orderkey'
         WHEN o_custkey IS NULL THEN 'Null o_custkey'
         WHEN o_orderdate IS NULL THEN 'Invalid timestamp'
         WHEN o_totalprice IS NOT NULL AND o_totalprice <= 0 THEN 'Non-positive o_totalprice'
         ELSE NULL END
"""


def _dirty_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 47 == 0, F.lit(None)).otherwise(F.col("o_custkey")).alias("o_custkey"),
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 41 == 0, -F.col("o_totalprice")).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
        F.when(F.col("o_orderkey") % 43 == 0, F.lit(None)).otherwise(F.col("o_orderdate")).alias("o_orderdate"),
        "o_orderpriority",
    )


def _order_rules():
    return [
        not_null("o_orderkey", "Null o_orderkey"),
        not_null("o_custkey", "Null o_custkey"),
        not_null("o_orderdate", "Invalid timestamp"),
        positive("o_totalprice", "Non-positive o_totalprice"),
    ]


@register(
    "validate_orders_valid",
    oracle=f"""
    WITH dirty AS ({_DIRTY_ORDERS_SQL})
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
    FROM (SELECT *, {_ORDER_RULES_SQL} AS validation_errors FROM dirty)
    WHERE validation_errors IS NULL
    ORDER BY o_orderkey ASC
    """,
)
def validate_orders_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Valid split of the validation rule engine (reference
    scripts/glue/script.py:134-141 orders rules)."""
    return validate(_dirty_orders(spark, sf_dir), rules=_order_rules()).valid.orderBy("o_orderkey")


@register(
    "validate_orders_rejected",
    oracle=f"""
    WITH dirty AS ({_DIRTY_ORDERS_SQL})
    SELECT * FROM (SELECT *, {_ORDER_RULES_SQL} AS validation_errors FROM dirty)
    WHERE validation_errors IS NOT NULL
    ORDER BY o_orderkey ASC
    """,
)
def validate_orders_rejected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rejected split with first-failing-rule message (reference
    scripts/glue/script.py:152-153)."""
    return validate(_dirty_orders(spark, sf_dir), rules=_order_rules()).rejected.orderBy("o_orderkey")


@register(
    "ri_violations_events",
    oracle="""
    SELECT event_id, user_id, 'Invalid user_id reference' AS validation_errors
    FROM events
    WHERE user_id NOT IN (SELECT c_custkey FROM customer WHERE c_custkey % 3 != 0)
    ORDER BY event_id ASC
    """,
)
def ri_violations_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity violations of events.user_id against a
    (deterministically restricted) customer dimension. The reference
    collects FK keys to the driver and uses isin
    (tests/functions.py:29-36); here it's a broadcast anti-join that
    scales to fact-sized reference sets.
    """
    events = load_table(spark, sf_dir, "events")
    customers = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 3 != 0)
    res = validate(
        events,
        fk_checks=[FkCheck(fk_col="user_id", ref=customers, ref_col="c_custkey", error="Invalid user_id reference")],
    )
    return res.rejected.select("event_id", "user_id", "validation_errors").orderBy("event_id")


@register(
    "dedup_pk_lineitem",
    oracle="""
    WITH inp AS (
        SELECT * FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity - 1 AS l_quantity,
               l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM lineitem WHERE l_orderkey % 11 = 0
    )
    SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
           l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY l_orderkey, l_linenumber
            ORDER BY l_partkey ASC NULLS LAST, l_suppkey ASC NULLS LAST, l_quantity ASC NULLS LAST,
                     l_extendedprice ASC NULLS LAST, l_discount ASC NULLS LAST, l_tax ASC NULLS LAST,
                     l_returnflag ASC NULLS LAST, l_linestatus ASC NULLS LAST, l_shipdate ASC NULLS LAST
        ) AS rn FROM inp
    ) WHERE rn = 1
    ORDER BY l_orderkey ASC, l_linenumber ASC
    """,
)
def dedup_pk_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic PK dedup (reference scripts/glue/script.py:196
    dropDuplicates, made reproducible). Input: lineitem with injected
    near-duplicate rows (same PK, l_quantity-1) for l_orderkey % 11 = 0.
    (l_orderkey, l_linenumber) is not unique in the raw data either, so
    the oracle restates the identical survivor-order window.
    """
    li = load_table(spark, sf_dir, "lineitem")
    dupes = li.filter(F.col("l_orderkey") % 11 == 0).withColumn("l_quantity", F.col("l_quantity") - 1)
    return dedup_exact(li.unionByName(dupes), keys=["l_orderkey", "l_linenumber"]).orderBy(
        "l_orderkey", "l_linenumber"
    )


_MERGE_SOURCE_SQL = """
    SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus, o_totalprice + 10.0 AS o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 10 = 0
    UNION ALL
    SELECT o_orderkey + 100000000, o_custkey, 'N' AS o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 10 = 1
"""


@register(
    "merge_upsert_orders",
    oracle=f"""
    WITH src AS ({_MERGE_SOURCE_SQL})
    SELECT * FROM src
    UNION ALL
    SELECT t.* FROM orders t WHERE t.o_orderkey NOT IN (SELECT o_orderkey FROM src)
    ORDER BY o_orderkey ASC
    """,
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta MERGE parity (reference scripts/glue/script.py:204-227:
    whenMatchedUpdateAll + whenNotMatchedInsertAll), emulated as a
    join-based upsert. Source batch: updates for o_orderkey % 10 = 0
    (price +10, status 'U') and inserts of new keys (+1e8, status 'N').
    """
    orders = load_table(spark, sf_dir, "orders")
    updates = (
        orders.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn("o_totalprice", F.col("o_totalprice") + 10.0)
    )
    inserts = (
        orders.filter(F.col("o_orderkey") % 10 == 1)
        .withColumn("o_orderkey", F.col("o_orderkey") + 100000000)
        .withColumn("o_orderstatus", F.lit("N"))
    )
    source = updates.unionByName(inserts.select(*updates.columns))
    return merge_upsert(orders, source, keys=["o_orderkey"]).orderBy("o_orderkey")
