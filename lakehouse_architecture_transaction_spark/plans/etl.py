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
from lakehouse_architecture_transaction_spark.functions.validation import (
    FkCheck,
    enforce_schema,
    not_null,
    positive,
    validate,
)
from lakehouse_architecture_transaction_spark.operators.dedup import dedup_exact
from lakehouse_architecture_transaction_spark.operators.merge import merge_upsert
from lakehouse_architecture_transaction_spark.operators.scd2 import scd2_build
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


_CDC_SOURCE_SQL = """
    SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus, o_totalprice + 10.0 AS o_totalprice,
           o_orderdate, o_orderpriority, 'U' AS op
    FROM orders WHERE o_orderkey % 10 = 0
    UNION ALL
    SELECT o_orderkey + 100000000, o_custkey, 'N' AS o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority, 'I' AS op
    FROM orders WHERE o_orderkey % 10 = 1
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority, 'D' AS op
    FROM orders WHERE o_orderkey % 10 = 5
"""


@register(
    "merge_delete_orders",
    oracle=f"""
    WITH src AS ({_CDC_SOURCE_SQL})
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
    FROM src WHERE op != 'D'
    UNION ALL
    SELECT t.* FROM orders t WHERE t.o_orderkey NOT IN (SELECT o_orderkey FROM src)
    ORDER BY o_orderkey ASC
    """,
)
def merge_delete_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta MERGE with a delete clause (whenMatchedDelete beside
    update-all/insert-all — the APPLY CHANGES / CDC-apply shape the
    reference's merge step needs once upstream emits deletions;
    operators/merge.py apply_changes). Change batch: updates for
    o_orderkey % 10 = 0, inserts of new keys (% 10 = 1, +1e8), and
    deletions for % 10 = 5."""
    from lakehouse_architecture_transaction_spark.operators.merge import apply_changes

    orders = load_table(spark, sf_dir, "orders")
    updates = (
        orders.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn("o_totalprice", F.col("o_totalprice") + 10.0)
        .withColumn("op", F.lit("U"))
    )
    inserts = (
        orders.filter(F.col("o_orderkey") % 10 == 1)
        .withColumn("o_orderkey", F.col("o_orderkey") + 100000000)
        .withColumn("o_orderstatus", F.lit("N"))
        .withColumn("op", F.lit("I"))
    )
    deletes = orders.filter(F.col("o_orderkey") % 10 == 5).withColumn("op", F.lit("D"))
    source = updates.unionByName(inserts.select(*updates.columns)).unionByName(
        deletes.select(*updates.columns)
    )
    return apply_changes(orders, source, keys=["o_orderkey"], op_col="op").orderBy("o_orderkey")


# --------------------------------------------------------------------------
# The reference's CORE flow: order_items validated against BOTH dimension
# datasets (products AND orders) with per-dataset rules, then deduplicated
# (reference scripts/glue/script.py:100-132 rule config, 235-260 pipeline
# order products→orders→order_items). lineitem plays order_items, part plays
# products. Dims are deterministically restricted so the RI checks have real
# violations to find.

_LI_COLS = (
    "l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, "
    "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate"
)

_DIRTY_LI_SQL = """
    SELECT l_orderkey,
           CASE WHEN l_orderkey % 37 = 0 THEN NULL ELSE l_partkey END AS l_partkey,
           l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
           l_returnflag, l_linestatus,
           CASE WHEN l_orderkey % 53 = 0 THEN NULL ELSE l_shipdate END AS l_shipdate
    FROM lineitem
"""

_LI_RULES_SQL = """
    CASE WHEN l_orderkey IS NULL THEN 'Null l_orderkey'
         WHEN l_linenumber IS NULL THEN 'Null l_linenumber'
         WHEN l_partkey IS NULL THEN 'Null l_partkey'
         WHEN l_shipdate IS NULL THEN 'Invalid timestamp'
         WHEN l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey % 5 != 0)
              THEN 'Invalid order reference'
         WHEN l_partkey NOT IN (SELECT p_partkey FROM part WHERE p_partkey % 11 != 0)
              THEN 'Invalid product reference'
         ELSE NULL END
"""


def _order_items_validated(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem")
    dirty = li.select(
        "l_orderkey",
        F.when(F.col("l_orderkey") % 37 == 0, F.lit(None)).otherwise(F.col("l_partkey")).alias("l_partkey"),
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        F.when(F.col("l_orderkey") % 53 == 0, F.lit(None)).otherwise(F.col("l_shipdate")).alias("l_shipdate"),
    )
    odim = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 5 != 0)
    pdim = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 11 != 0)
    return validate(
        dirty,
        rules=[
            not_null("l_orderkey", "Null l_orderkey"),
            not_null("l_linenumber", "Null l_linenumber"),
            not_null("l_partkey", "Null l_partkey"),
            not_null("l_shipdate", "Invalid timestamp"),
        ],
        fk_checks=[
            FkCheck(fk_col="l_orderkey", ref=odim, ref_col="o_orderkey", error="Invalid order reference"),
            FkCheck(fk_col="l_partkey", ref=pdim, ref_col="p_partkey", error="Invalid product reference"),
        ],
    )


@register(
    "process_order_items_valid",
    oracle=f"""
    WITH dirty AS ({_DIRTY_LI_SQL}),
    flagged AS (SELECT *, {_LI_RULES_SQL} AS validation_errors FROM dirty)
    SELECT {_LI_COLS} FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY l_orderkey, l_linenumber
            ORDER BY l_partkey ASC NULLS LAST, l_suppkey ASC NULLS LAST, l_quantity ASC NULLS LAST,
                     l_extendedprice ASC NULLS LAST, l_discount ASC NULLS LAST, l_tax ASC NULLS LAST,
                     l_returnflag ASC NULLS LAST, l_linestatus ASC NULLS LAST, l_shipdate ASC NULLS LAST
        ) AS rn FROM flagged WHERE validation_errors IS NULL
    ) WHERE rn = 1
    ORDER BY l_orderkey ASC, l_linenumber ASC
    """,
)
def process_order_items_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end order_items processing, valid branch: per-dataset
    rules + dual-FK referential integrity (orders AND products) + PK
    dedup — the reference's full process_dataset flow
    (scripts/glue/script.py:100-132,235-260) in one declarative plan.
    """
    valid = _order_items_validated(spark, sf_dir).valid
    return dedup_exact(valid, keys=["l_orderkey", "l_linenumber"]).orderBy("l_orderkey", "l_linenumber")


@register(
    "process_order_items_rejected",
    oracle=f"""
    WITH dirty AS ({_DIRTY_LI_SQL}),
    flagged AS (SELECT *, {_LI_RULES_SQL} AS validation_errors FROM dirty)
    SELECT l_orderkey, l_linenumber, l_partkey, validation_errors
    FROM flagged WHERE validation_errors IS NOT NULL
    ORDER BY l_orderkey ASC, l_linenumber ASC, l_partkey ASC NULLS FIRST, validation_errors ASC
    """,
)
def process_order_items_rejected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rejected branch of the order_items flow: first failing rule per
    row across rules AND both FK checks (reference rejected-zone
    routing, scripts/glue/script.py:175-190 minus the wall-clock
    rejection_time metadata, which pipelines.py adds)."""
    rejected = _order_items_validated(spark, sf_dir).rejected
    return rejected.select("l_orderkey", "l_linenumber", "l_partkey", "validation_errors").orderBy(
        F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
        F.col("l_partkey").asc_nulls_first(),
        F.col("validation_errors").asc(),
    )


@register(
    "validate_part_rejected",
    oracle="""
    WITH dirty AS (
        SELECT p_partkey,
               CASE WHEN p_partkey % 23 = 0 THEN NULL ELSE p_name END AS p_name,
               p_brand,
               CASE WHEN p_partkey % 29 = 0 THEN -p_retailprice ELSE p_retailprice END AS p_retailprice
        FROM part
    )
    SELECT *, CASE WHEN p_partkey IS NULL THEN 'Null p_partkey'
                   WHEN p_name IS NULL THEN 'Null p_name'
                   WHEN p_retailprice IS NOT NULL AND p_retailprice <= 0 THEN 'Non-positive p_retailprice'
                   ELSE NULL END AS validation_errors
    FROM dirty
    WHERE p_name IS NULL OR (p_retailprice IS NOT NULL AND p_retailprice <= 0)
    ORDER BY p_partkey ASC
    """,
)
def validate_part_rejected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """products rule set (reference scripts/glue/script.py:143-149:
    null product_id / product_name) on the part dimension, plus the
    non-positive-price rule shared with orders."""
    part = load_table(spark, sf_dir, "part")
    dirty = part.select(
        "p_partkey",
        F.when(F.col("p_partkey") % 23 == 0, F.lit(None)).otherwise(F.col("p_name")).alias("p_name"),
        "p_brand",
        F.when(F.col("p_partkey") % 29 == 0, -F.col("p_retailprice")).otherwise(F.col("p_retailprice")).alias(
            "p_retailprice"
        ),
    )
    res = validate(
        dirty,
        rules=[
            not_null("p_partkey", "Null p_partkey"),
            not_null("p_name", "Null p_name"),
            positive("p_retailprice", "Non-positive p_retailprice"),
        ],
    )
    return res.rejected.orderBy("p_partkey")


@register(
    "schema_cast_orders",
    oracle="""
    WITH strings AS (
        SELECT CAST(o_orderkey AS VARCHAR) AS o_orderkey,
               CAST(o_custkey AS VARCHAR) AS o_custkey,
               o_orderstatus,
               CASE WHEN o_orderkey % 13 = 0 THEN 'oops' ELSE CAST(o_totalprice AS VARCHAR) END AS o_totalprice,
               CASE WHEN o_orderkey % 17 = 0 THEN 'not-a-date' ELSE CAST(o_orderdate AS VARCHAR) END AS o_orderdate
        FROM orders
    )
    SELECT TRY_CAST(o_orderkey AS BIGINT) AS o_orderkey,
           TRY_CAST(o_custkey AS BIGINT) AS o_custkey,
           o_orderstatus,
           TRY_CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           TRY_CAST(o_orderdate AS TIMESTAMP) AS o_orderdate
    FROM strings
    ORDER BY TRY_CAST(o_orderkey AS BIGINT) ASC
    """,
)
def schema_cast_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema enforcement as an oracle-checked query (E6): orders
    round-tripped through strings with deterministically-injected junk
    ('oops' prices, 'not-a-date' dates), then enforce_schema casts
    every field back — junk lands as NULL (reference cast-to-null,
    scripts/glue/script.py:169-171), never as a runtime error."""
    from pyspark.sql import types as T

    orders = load_table(spark, sf_dir, "orders")
    strings = orders.select(
        F.col("o_orderkey").cast("string").alias("o_orderkey"),
        F.col("o_custkey").cast("string").alias("o_custkey"),
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 13 == 0, F.lit("oops"))
        .otherwise(F.col("o_totalprice").cast("string"))
        .alias("o_totalprice"),
        F.when(F.col("o_orderkey") % 17 == 0, F.lit("not-a-date"))
        .otherwise(F.col("o_orderdate").cast("string"))
        .alias("o_orderdate"),
    )
    target = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampNTZType()),
        ]
    )
    return enforce_schema(strings, target).orderBy("o_orderkey")


@register(
    "scd2_customer_history",
    oracle="""
    WITH chg AS (
        SELECT c_custkey, c_acctbal, c_mktsegment, TIMESTAMP '1995-01-01 00:00:00' AS eff_ts FROM customer
        UNION ALL
        SELECT c_custkey, c_acctbal, c_mktsegment, TIMESTAMP '1995-06-01 00:00:00' FROM customer
        WHERE c_custkey % 21 = 0
        UNION ALL
        SELECT c_custkey, c_acctbal + 100.0, c_mktsegment, TIMESTAMP '1996-06-01 00:00:00' FROM customer
        WHERE c_custkey % 7 = 0
        UNION ALL
        SELECT c_custkey, c_acctbal + 100.0, 'MOVED', TIMESTAMP '1997-01-01 00:00:00' FROM customer
        WHERE c_custkey % 14 = 0
    ),
    versions AS (
        SELECT c_custkey, c_acctbal, c_mktsegment, eff_ts FROM (
            SELECT *, LAG(c_acctbal) OVER w AS pa, LAG(c_mktsegment) OVER w AS pm
            FROM chg WINDOW w AS (PARTITION BY c_custkey ORDER BY eff_ts ASC)
        ) WHERE (pa IS DISTINCT FROM c_acctbal) OR (pm IS DISTINCT FROM c_mktsegment)
    )
    SELECT c_custkey, c_acctbal, c_mktsegment, eff_ts AS valid_from,
           LEAD(eff_ts) OVER w2 AS valid_to,
           LEAD(eff_ts) OVER w2 IS NULL AS is_current
    FROM versions WINDOW w2 AS (PARTITION BY c_custkey ORDER BY eff_ts ASC)
    ORDER BY c_custkey ASC, valid_from ASC
    """,
)
def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension history (operators/scd2.py) over a deterministic
    customer change log: a no-op re-statement (collapses), a balance
    update, and a segment move. Extends the reference's latest-only
    MERGE (scripts/glue/script.py:204-216) with queryable history."""
    cust = load_table(spark, sf_dir, "customer")

    def _v(filter_expr, acct, seg, ts):
        df = cust.filter(filter_expr) if filter_expr is not None else cust
        return df.select(
            "c_custkey",
            acct.alias("c_acctbal"),
            seg.alias("c_mktsegment"),
            F.expr(f"TIMESTAMP_NTZ '{ts}'").alias("eff_ts"),
        )

    changes = (
        _v(None, F.col("c_acctbal"), F.col("c_mktsegment"), "1995-01-01 00:00:00")
        .unionByName(
            _v(F.col("c_custkey") % 21 == 0, F.col("c_acctbal"), F.col("c_mktsegment"), "1995-06-01 00:00:00")
        )
        .unionByName(
            _v(F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + 100.0, F.col("c_mktsegment"), "1996-06-01 00:00:00")
        )
        .unionByName(
            _v(F.col("c_custkey") % 14 == 0, F.col("c_acctbal") + 100.0, F.lit("MOVED"), "1997-01-01 00:00:00")
        )
    )
    hist = scd2_build(changes, key="c_custkey", eff_ts="eff_ts", attrs=["c_acctbal", "c_mktsegment"])
    return hist.orderBy("c_custkey", "valid_from")
