"""Downstream analytics query library (Athena-parity surface).

The reference exposes processed Delta tables to Amazon Athena for SQL
analytics (reference README.md "Amazon Athena" row). This module is
that query surface, written DataFrame-first so Catalyst handles
pushdown/pruning/join selection; each query carries its DuckDB oracle.

Scale notes: dimension joins broadcast (region/nation/supplier);
fact-fact joins shuffle on the join key with AQE skew handling; all
top-k queries order with a unique tiebreaker so LIMIT is
deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_architecture_transaction_spark.catalog import load_table
from lakehouse_architecture_transaction_spark.functions.moments import m2_numerator, sum_sq_dec
from lakehouse_architecture_transaction_spark.operators.asof import asof_join
from lakehouse_architecture_transaction_spark.plans.registry import register

# Shared exact-decimal fragments (see registry docstring for why).
# Aggregation is DECIMAL (exact, order-independent across partitions /
# engines); the OUTPUT boundary is DOUBLE — pandas/Arrow bridges in
# downstream tools float decimals anyway, and an identical decimal
# narrows to an identical double in both engines, so results stay
# bit-comparable without leaking engine-specific decimal rendering.
_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"
_SUM_REV = f"CAST(CAST(SUM({_REV}) AS DECIMAL(18,4)) AS DOUBLE)"


def _rev_sum_col():
    return F.expr(f"SUM({_REV})").cast("decimal(18,4)").cast("double")


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_base_price,
           {_SUM_REV} AS sum_disc_price,
           CAST(CAST(SUM(CAST({_REV} AS DECIMAL(18,4)) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DECIMAL(18,6)) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag ASC, l_linestatus ASC
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the flagship scan+agg. One pass over lineitem,
    map-side partial aggregation, 2-key groupBy."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.expr("l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'")
    )
    dec_qty = F.expr("CAST(l_quantity AS DECIMAL(18,2))")
    dec_price = F.expr("CAST(l_extendedprice AS DECIMAL(18,2))")
    dec_disc = F.expr("CAST(l_discount AS DECIMAL(18,2))")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec_qty).cast("decimal(18,2)").cast("double").alias("sum_qty"),
            F.sum(dec_price).cast("decimal(18,2)").cast("double").alias("sum_base_price"),
            _rev_sum_col().alias("sum_disc_price"),
            F.expr(f"SUM(CAST({_REV} AS DECIMAL(18,4)) * (1 + CAST(l_tax AS DECIMAL(18,2))))")
            .cast("decimal(18,6)")
            .cast("double")
            .alias("sum_charge"),
            (F.sum(dec_qty).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(dec_price).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(dec_disc).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy(F.col("l_returnflag").asc(), F.col("l_linestatus").asc())
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey, {_SUM_REV} AS revenue, o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact join → top-k.
    customer is filtered before the join so the build side stays small."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.expr("o_orderdate < TIMESTAMP '1998-01-01 00:00:00'")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.expr("l_shipdate > TIMESTAMP '1998-01-01 00:00:00'")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_rev_sum_col().alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, {_SUM_REV} AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name ASC
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join. All dims broadcast; only the
    orders↔lineitem fact join shuffles."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.expr(
            "o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'"
        )
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), (orders.o_custkey == cust.c_custkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_rev_sum_col().alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


@register(
    "q6_revenue_delta",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure selective scan — every predicate pushes to
    the parquet reader; no shuffle at all (single global agg)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.expr(
            "l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'"
            " AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24"
        )
    )
    return li.agg(
        F.expr("SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)))")
        .cast("decimal(18,4)")
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_items"),
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, {_SUM_REV} AS revenue, c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue ranking."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.expr(
            "o_orderdate >= TIMESTAMP '1996-10-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'"
        )
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_rev_sum_col().alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "top_parts_by_revenue",
    oracle=f"""
    SELECT p_partkey, p_name, p_brand, {_SUM_REV} AS revenue,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_qty
    FROM lineitem JOIN part ON p_partkey = l_partkey
    GROUP BY p_partkey, p_name, p_brand
    ORDER BY revenue DESC, p_partkey ASC
    LIMIT 20
    """,
)
def top_parts_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product revenue ranking (reference data model's products
    dimension → part). Aggregate BEFORE the dim join so the shuffle
    carries one row per part, not one per lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    per_part = li.groupBy("l_partkey").agg(
        _rev_sum_col().alias("revenue"),
        F.expr("SUM(CAST(l_quantity AS DECIMAL(18,2)))").cast("decimal(18,2)").cast("double").alias("total_qty"),
    )
    return (
        per_part.join(F.broadcast(part), per_part.l_partkey == part.p_partkey)
        .select("p_partkey", "p_name", "p_brand", "revenue", "total_qty")
        .orderBy(F.col("revenue").desc(), F.col("p_partkey").asc())
        .limit(20)
    )


@register(
    "mktsegment_summary",
    oracle="""
    SELECT c_mktsegment,
           COUNT(DISTINCT c_custkey) AS n_customers,
           COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_spend,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_order_value
    FROM customer JOIN orders ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment ASC
    """,
)
def mktsegment_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-segment rollup over the customer×orders join."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    dec_price = F.expr("CAST(o_totalprice AS DECIMAL(18,2))")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
            F.sum(dec_price).cast("decimal(18,2)").cast("double").alias("total_spend"),
            (F.sum(dec_price).cast("double") / F.count("*")).alias("avg_order_value"),
        )
        .orderBy(F.col("c_mktsegment").asc())
    )


@register(
    "rollup_revenue",
    oracle="""
    SELECT r_name, n_name,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_spend,
           COUNT(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST
    """,
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP (region → nation → grand total) over order
    revenue — the lakehouse 'reporting cube' surface."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.expr("SUM(CAST(o_totalprice AS DECIMAL(18,2)))").cast("decimal(18,2)").cast("double").alias("total_spend"),
            F.count("*").alias("n_orders"),
        )
        .orderBy(F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first())
    )


@register(
    "top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders
    ) WHERE rn <= 3
    ORDER BY o_custkey ASC, rn ASC
    """,
)
def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k-per-group via window row_number — the canonical
    distributed pattern (one shuffle on the partition key)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy(F.col("o_custkey").asc(), F.col("rn").asc())
    )


@register(
    "customer_running_spend",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(18,2)) AS DOUBLE) AS running_spend
    FROM orders
    ORDER BY o_custkey ASC, o_orderkey ASC
    """,
)
def customer_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer (exact decimal accumulation)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.expr("CAST(o_totalprice AS DECIMAL(18,2))"))
        .over(w)
        .cast("decimal(18,2)")
        .cast("double")
        .alias("running_spend"),
    ).orderBy(F.col("o_custkey").asc(), F.col("o_orderkey").asc())


@register(
    "events_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_start, event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY hour_start ASC, event_type ASC
    """,
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation over the event stream table — the
    batch twin of the streaming pipeline (streaming/pipeline.py runs
    the same plan incrementally with a watermark)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.expr("SUM(CAST(value AS DECIMAL(18,2)))").cast("decimal(18,2)").cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("hour_start"), "event_type", "n_events", "n_users", "total_value")
        .orderBy(F.col("hour_start").asc(), F.col("event_type").asc())
    )


@register(
    "sessionize_events",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
                         > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events
    ), sess AS (
        SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM ordered
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS session_value
    FROM sess GROUP BY user_id, session_id
    ORDER BY user_id ASC, session_id ASC
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag + cumulative
    sum of session-break flags — one shuffle on user_id, no UDF."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    # Microsecond precision to match the oracle's interval comparison
    # exactly (cast-to-seconds would truncate sub-second gaps).
    # unix_micros needs TIMESTAMP; the ntz→ltz cast is a no-op on the
    # stored micros under the UTC session timezone.
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    flagged = events.withColumn(
        "new_s",
        F.when(micros - F.lag(micros).over(w) > 1800 * 1_000_000, 1).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_id", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    )
    return (
        sess.groupBy("user_id", F.col("session_id").cast("bigint").alias("session_id"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.expr("SUM(CAST(value AS DECIMAL(18,2)))").cast("decimal(18,2)").cast("double").alias("session_value"),
        )
        .orderBy(F.col("user_id").asc(), F.col("session_id").asc())
    )


@register(
    "events_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(SUM(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type ASC
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured property extraction from the JSON props column
    (get_json_object JVM-side) + aggregation."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        events.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(k).cast("bigint").alias("sum_k"),
            (F.sum(k).cast("double") / F.count("*")).alias("avg_k"),
        )
        .orderBy(F.col("event_type").asc())
    )


@register(
    "events_asof_orders",
    oracle="""
    WITH od AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn
            FROM orders
        ) WHERE rn = 1
    )
    SELECT e.event_id, e.user_id, e.ts, od.o_orderkey, od.o_totalprice
    FROM events e
    ASOF LEFT JOIN od ON e.user_id = od.o_custkey AND e.ts >= od.o_orderdate
    ORDER BY e.event_id ASC
    """,
)
def events_asof_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment: each event carries the user's most
    recent order as of the event time (operators/asof.py — one
    key-shuffle union+window, no per-pair join). Orders are
    deduplicated to one per (customer, date) with a max-orderkey
    tiebreak so the as-of match is total."""
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(F.col("o_orderkey").desc())
    od = (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    )
    return asof_join(
        events,
        od,
        left_on="user_id",
        right_on="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        payload=["o_orderkey", "o_totalprice"],
    ).orderBy("event_id")


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority ASC
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS correlated subquery as a LEFT SEMI join —
    the probe side streams, the build side carries only the join key,
    and no row is ever duplicated by multiple matches."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.expr(
            "o_orderdate >= TIMESTAMP '1996-07-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'"
        )
    )
    flagged_items = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        orders.join(flagged_items, orders.o_orderkey == flagged_items.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy(F.col("o_orderpriority").asc())
    )


@register(
    "cube_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_spend
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY gid ASC, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
    """,
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with grouping_id: all four marginal combinations in one
    pass (Spark expands grouping sets before the single aggregation —
    no repeated scans). grouping_id disambiguates rollup rows from
    genuinely-null keys; its bit order matches DuckDB's GROUPING()."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count("*").alias("n_orders"),
            F.expr("SUM(CAST(o_totalprice AS DECIMAL(18,2)))")
            .cast("decimal(18,2)")
            .cast("double")
            .alias("total_spend"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n_orders", "total_spend")
        .orderBy(
            F.col("gid").asc(),
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@register(
    "customer_moving_avg",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
               / COUNT(*) OVER w AS moving_avg_3
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    ORDER BY o_custkey ASC, o_orderkey ASC
    """,
)
def customer_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-frame window (last-3-orders moving average): exact
    decimal sum over the frame, ONE double division — same
    cross-engine determinism discipline as the running sum."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(-2, Window.currentRow)
    )
    dec = F.expr("CAST(o_totalprice AS DECIMAL(18,2))")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        (F.sum(dec).over(w).cast("double") / F.count("*").over(w)).alias("moving_avg_3"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "q7_nation_volume",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           {_SUM_REV} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE sn.n_name != cn.n_name
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1, 2, 3
    ORDER BY supp_nation ASC, cust_nation ASC, ship_year ASC
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade volume by ship year (full
    pair matrix — the two-nation TPC-H restriction is vacuous on the
    small fixtures). Nation lookups broadcast onto supplier/customer
    before the fact join; the date filter pushes to the lineitem
    scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.expr("l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'")
    )
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("ship_year"))
        .agg(_rev_sum_col().alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT 100.0 * (
             CAST(CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {_REV} ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) AS DOUBLE)
             / CAST(CAST(SUM({_REV}) AS DECIMAL(18,4)) AS DOUBLE)
           ) AS promo_revenue_pct,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio (promo share of
    revenue). Both sums decimal-exact; ONE double division and one
    multiply, in the same order in both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.expr(
            "l_shipdate >= TIMESTAMP '1996-09-01 00:00:00' AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'"
        )
    )
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    promo = F.expr(
        f"SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {_REV} ELSE CAST(0 AS DECIMAL(18,4)) END)"
    ).cast("decimal(18,4)").cast("double")
    total = F.expr(f"SUM({_REV})").cast("decimal(18,4)").cast("double")
    return joined.agg(
        (F.lit(100.0) * (promo / total)).alias("promo_revenue_pct"),
        F.count("*").alias("n_items"),
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT {_SUM_REV} AS revenue, COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
       OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
       OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of multi-column conjuncts across
    both join sides. Catalyst extracts the common single-side conjuncts
    (brand/size set on part, quantity envelope on lineitem) below the
    join, so each scan still prunes before rows meet."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#12") & F.col("l_quantity").between(1, 11) & F.col("p_size").between(1, 5)
    ) | (
        (F.col("p_brand") == "Brand#23") & F.col("l_quantity").between(10, 20) & F.col("p_size").between(1, 10)
    ) | (
        (F.col("p_brand") == "Brand#34") & F.col("l_quantity").between(20, 30) & F.col("p_size").between(1, 15)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(_rev_sum_col().alias("revenue"), F.count("*").alias("n_items"))
    )


@register(
    "customers_without_recent_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
    ORDER BY c_custkey ASC
    """,
)
def customers_without_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a LEFT ANTI join (TPC-H Q22 shape): the canonical
    distributed negative-membership test — no driver-side key
    collection, no row duplication. Scoped to recent orders so the
    result is non-trivial on this fixture (every customer has SOME
    order)."""
    cust = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.expr("o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'")
    )
    return (
        cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "orders_above_customer_avg",
    oracle="""
    WITH avgs AS (
        SELECT o_custkey AS k,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
        FROM orders GROUP BY o_custkey
    )
    SELECT o_orderkey, o_custkey, o_totalprice, avg_price
    FROM orders JOIN avgs ON o_custkey = k
    WHERE o_totalprice > 1.5 * avg_price
    ORDER BY o_orderkey ASC
    """,
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-aggregate shape (TPC-H Q17 family): aggregate once
    per group, join back, filter — the aggregate side is tiny (one row
    per customer), so at scale it broadcasts or shuffles on the same
    key as the probe with no extra pass over the fact table."""
    orders = load_table(spark, sf_dir, "orders")
    avgs = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        (F.sum(F.expr("CAST(o_totalprice AS DECIMAL(18,2))")).cast("double") / F.count("*")).alias(
            "avg_price"
        )
    )
    return (
        orders.join(avgs, orders.o_custkey == avgs.k)
        .filter(F.col("o_totalprice") > 1.5 * F.col("avg_price"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "avg_price")
        .orderBy("o_orderkey")
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey, {_SUM_REV} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s_suppkey ASC
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: aggregate → scalar-max subquery → equality
    filter (ALL argmax rows, not LIMIT 1 — ties survive). The revenue
    table is computed once and reused for both the max and the probe;
    the max is a broadcast scalar, not a driver round-trip."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.expr(
            "l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'"
        )
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(_rev_sum_col().alias("total_revenue"))
    max_rev = rev.agg(F.max("total_revenue").alias("m"))
    return (
        rev.join(F.broadcast(max_rev), rev.total_revenue == max_rev.m)
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "profile_orders",
    oracle="""
    SELECT 'o_orderkey' AS column_name, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(o_orderkey) AS n_null,
           COUNT(DISTINCT o_orderkey) AS n_distinct,
           CAST(MIN(o_orderkey) AS DOUBLE) AS min_num, CAST(MAX(o_orderkey) AS DOUBLE) AS max_num
    FROM orders
    UNION ALL
    SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey), COUNT(DISTINCT o_custkey),
           CAST(MIN(o_custkey) AS DOUBLE), CAST(MAX(o_custkey) AS DOUBLE)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice), COUNT(DISTINCT o_totalprice),
           MIN(o_totalprice), MAX(o_totalprice)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus), COUNT(DISTINCT o_orderstatus),
           NULL, NULL
    FROM orders
    ORDER BY column_name ASC
    """,
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile (null rate / cardinality / numeric range
    per column) — the observability half of the reference's validation
    theme, computed in ONE pass over the table (a single aggregate
    with all metrics, unpivoted afterwards; no per-column scans)."""
    orders = load_table(spark, sf_dir, "orders")
    numeric = ["o_orderkey", "o_custkey", "o_totalprice"]
    string_cols = ["o_orderstatus"]
    aggs = [F.count("*").alias("n_rows")]
    for c in numeric + string_cols:
        aggs += [
            (F.count("*") - F.count(c)).alias(f"null_{c}"),
            F.countDistinct(c).alias(f"dist_{c}"),
        ]
    for c in numeric:
        aggs += [F.min(c).cast("double").alias(f"min_{c}"), F.max(c).cast("double").alias(f"max_{c}")]
    one = orders.agg(*aggs)
    rows = []
    for c in numeric:
        rows.append(
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("n_rows"),
                F.col(f"null_{c}").alias("n_null"),
                F.col(f"dist_{c}").alias("n_distinct"),
                F.col(f"min_{c}").alias("min_num"),
                F.col(f"max_{c}").alias("max_num"),
            )
        )
    for c in string_cols:
        rows.append(
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("n_rows"),
                F.col(f"null_{c}").alias("n_null"),
                F.col(f"dist_{c}").alias("n_distinct"),
                F.lit(None).cast("double").alias("min_num"),
                F.lit(None).cast("double").alias("max_num"),
            )
        )
    return (
        one.select(F.explode(F.array(*rows)).alias("p"))
        .select("p.*")
        .orderBy("column_name")
    )


@register(
    "customer_spend_deciles",
    oracle="""
    WITH spend AS (
        SELECT o_custkey,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT *, NTILE(10) OVER (ORDER BY total ASC, o_custkey ASC) AS decile FROM spend
    )
    SELECT CAST(decile AS BIGINT) AS decile, COUNT(*) AS n_customers,
           CAST(CAST(SUM(CAST(total AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS decile_spend,
           MIN(total) AS min_spend, MAX(total) AS max_spend
    FROM ranked GROUP BY decile
    ORDER BY decile ASC
    """,
)
def customer_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile segmentation of customer lifetime spend. NTILE needs the
    exact global rank; instead of a ``Window.orderBy`` (which funnels
    every customer through ONE task), the rank comes from the bucketed
    prefix-sum pattern (operators/ranking.py ntile_exact): range
    buckets from approxQuantile, parallel within-bucket numbering,
    broadcast offsets, NTILE's closed form on the exact rank — same
    result as the SQL NTILE the oracle states, at any scale."""
    from lakehouse_architecture_transaction_spark.operators.ranking import ntile_exact

    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.expr("SUM(CAST(o_totalprice AS DECIMAL(18,2)))").cast("decimal(18,2)").cast("double").alias("total")
    )
    ranked = ntile_exact(spend, value_col="total", tiebreakers=["o_custkey"], n=10, tile_col="decile")
    return (
        ranked.groupBy(F.col("decile").cast("bigint").alias("decile"))
        .agg(
            F.count("*").alias("n_customers"),
            F.expr("SUM(CAST(total AS DECIMAL(18,2)))").cast("decimal(18,2)").cast("double").alias("decile_spend"),
            F.min("total").alias("min_spend"),
            F.max("total").alias("max_spend"),
        )
        .orderBy("decile")
    )


@register(
    "order_value_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bin,
           COUNT(*) AS n_orders,
           MIN(o_totalprice) AS min_value,
           MAX(o_totalprice) AS max_value
    FROM orders
    GROUP BY 1
    ORDER BY bin ASC
    """,
)
def order_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram (bin = floor(value/25k)): one
    map-side-combinable aggregation, the scalable histogram shape
    (vs NTILE, which needs a global sort)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.floor(F.col("o_totalprice") / 25000).cast("bigint").alias("bin"))
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").alias("min_value"),
            F.max("o_totalprice").alias("max_value"),
        )
        .orderBy("bin")
    )


@register(
    "events_value_percentiles",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           quantile_cont(value, 0.5)  AS p50,
           quantile_cont(value, 0.9)  AS p90,
           quantile_cont(value, 0.99) AS p99
    FROM events
    GROUP BY event_type
    ORDER BY event_type ASC
    """,
)
def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT quantiles per event type. Both engines use the same
    linear-interpolation definition (rank = p·(n-1)), so doubles match
    bit-for-bit. Exact percentile sorts within each group — fine at
    per-group cardinalities; the sketch path below is the 100 TB
    variant."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.9)").alias("p90"),
            F.expr("percentile(value, 0.99)").alias("p99"),
        )
        .orderBy(F.col("event_type").asc())
    )


@register(
    "incremental_events_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_start, event_type,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY hour_start ASC, event_type ASC
    """,
)
def incremental_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance (operators/incremental.py): the
    hourly rollup computed as base partials (first half of the data)
    MERGED with delta partials (second half) — the oracle recomputes
    from scratch, proving merge-of-partials == full recompute
    bit-for-bit (decomposable measures, exact decimal sums)."""
    from lakehouse_architecture_transaction_spark.operators.incremental import merge_partial_aggs

    events = load_table(spark, sf_dir, "events")
    cutoff = "TIMESTAMP_NTZ '2024-01-15 00:00:00'"

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour_start"), "event_type").agg(
            F.count("*").alias("n_events"),
            F.expr("SUM(CAST(value AS DECIMAL(18,2)))").cast("decimal(18,2)").alias("total_value"),
        )

    base = partial(events.filter(F.expr(f"ts < {cutoff}")))
    delta = partial(events.filter(F.expr(f"ts >= {cutoff}")))
    merged = merge_partial_aggs(
        base, delta, keys=["hour_start", "event_type"], sum_cols=["total_value"], count_cols=["n_events"]
    )
    return merged.select(
        "hour_start",
        "event_type",
        "n_events",
        F.col("total_value").cast("decimal(18,2)").cast("double").alias("total_value"),
    ).orderBy("hour_start", "event_type")


@register(
    "events_funnel",
    oracle="""
    WITH s AS (SELECT user_id, MIN(ts) AS st FROM events WHERE event_type = 'signup' GROUP BY user_id),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS ct
        FROM events e JOIN s ON e.user_id = s.user_id
        WHERE e.event_type = 'click' AND e.ts >= s.st
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS pt
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= c.ct
        GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM s) AS n_signup,
           (SELECT COUNT(*) FROM c) AS n_click_after_signup,
           (SELECT COUNT(*) FROM p) AS n_purchase_after_click
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (signup → click → purchase): each stage keeps
    users whose stage event occurs AT/AFTER their previous stage's
    first event. Two semi-join+agg rounds — per-stage state is one
    row per user, never the event history."""
    events = load_table(spark, sf_dir, "events")

    def stage(prev: DataFrame, prev_ts: str, etype: str, out_ts: str) -> DataFrame:
        e = events.filter(F.col("event_type") == etype)
        return (
            e.join(prev, on="user_id")
            .filter(F.col("ts") >= F.col(prev_ts))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_ts))
        )

    s = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("st"))
    )
    c = stage(s, "st", "click", "ct")
    p = stage(c, "ct", "purchase", "pt")
    return (
        s.agg(F.count("*").alias("n_signup"))
        .crossJoin(c.agg(F.count("*").alias("n_click_after_signup")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase_after_click")))
    )


@register(
    "events_retention_cohorts",
    oracle="""
    WITH first_seen AS (
        -- cast: DuckDB's date_trunc yields DATE, Spark's a timestamp
        SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS active_week
                 FROM events)
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.active_week) / 7 AS BIGINT) AS week_offset,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM activity a JOIN first_seen f ON a.user_id = f.user_id
    GROUP BY 1, 2
    ORDER BY cohort_week ASC, week_offset ASC
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-seen
    week, counted in each later active week. Week offsets computed
    calendar-wise (datediff of week starts / 7) — timezone- and
    DST-independent on ntz timestamps."""
    events = load_table(spark, sf_dir, "events")
    first_seen = events.groupBy("user_id").agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    activity = events.select("user_id", F.date_trunc("week", F.col("ts")).alias("active_week")).distinct()
    return (
        activity.join(first_seen, on="user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("active_week"), F.col("cohort_week")) / 7).cast("bigint").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "events_daily_gapfill",
    oracle="""
    WITH bounds AS (SELECT CAST(date_trunc('day', MIN(ts)) AS DATE) AS d0,
                           CAST(date_trunc('day', MAX(ts)) AS DATE) AS d1 FROM events),
    spine AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM bounds),
    daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS n,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_value
        FROM events GROUP BY 1
    )
    SELECT CAST(s.day AS TIMESTAMP) AS day,
           COALESCE(d.n, 0) AS n_events, COALESCE(d.total_value, 0.0) AS total_value
    FROM spine s LEFT JOIN daily d ON s.day = d.day
    ORDER BY day ASC
    """,
)
def events_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily series: a generated date spine (min..max day)
    left-joined to the daily aggregate, zero-filling silent days —
    the standard fix for time series where absence of data IS data.
    The spine is sequence() on the driver-free aggregate bounds (two
    scalar subqueries), exploded JVM-side; no driver loop."""
    events = load_table(spark, sf_dir, "events")
    bounds = events.agg(
        F.to_date(F.date_trunc("day", F.min("ts"))).alias("d0"),
        F.to_date(F.date_trunc("day", F.max("ts"))).alias("d1"),
    )
    spine = bounds.select(F.explode(F.sequence("d0", "d1")).alias("day"))
    daily = events.groupBy(F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")).agg(
        F.count("*").alias("n"),
        F.expr("SUM(CAST(value AS DECIMAL(18,2)))").cast("decimal(18,2)").cast("double").alias("tv"),
    )
    return (
        spine.join(daily, on="day", how="left")
        .select(
            # DATE at the output boundary splits engines at the pandas
            # bridge (object vs datetime64) — emit timestamps, like
            # every other temporal output.
            F.col("day").cast("timestamp_ntz").alias("day"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
            F.coalesce(F.col("tv"), F.lit(0.0)).alias("total_value"),
        )
        .orderBy("day")
    )


@register(
    "orders_priority_pivot",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent,
           COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS high,
           COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS medium,
           COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS not_specified,
           COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS low
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus ASC
    """,
)
def orders_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (priority columns per status row) with an EXPLICIT value
    list: Spark's pivot without one runs an extra distinct-collect job
    to discover columns — never in production plans. Compiles to one
    pass with conditional counts."""
    orders = load_table(spark, sf_dir, "orders")
    pivoted = (
        orders.groupBy("o_orderstatus")
        .pivot(
            "o_orderpriority",
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
        )
        .count()
    )
    renames = {
        "1-URGENT": "urgent",
        "2-HIGH": "high",
        "3-MEDIUM": "medium",
        "4-NOT SPECIFIED": "not_specified",
        "5-LOW": "low",
    }
    out = pivoted
    for old, new in renames.items():
        out = out.withColumnRenamed(old, new)
    return out.select(
        "o_orderstatus",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in renames.values()],
    ).orderBy("o_orderstatus")


@register("events_approx_sketches")  # no oracle: sketch results are
# engine-specific by design → driver records the rows-only check.
def events_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch path for 100 TB: HyperLogLog++ distinct counts and
    GK approximate quantiles — fixed-size mergeable state, one
    map-side-combined pass, no per-group sort. Numbers are
    approximate so no cross-engine oracle exists; accuracy is pinned
    by tests/test_operators.py against exact values at test scale."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.expr("approx_percentile(value, array(0.5, 0.99), 10000)").alias("approx_p"),
        )
        .select(
            "event_type",
            "approx_users",
            F.col("approx_p")[0].alias("approx_p50"),
            F.col("approx_p")[1].alias("approx_p99"),
        )
        .orderBy(F.col("event_type").asc())
    )


@register(
    "events_daily_anomalies",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    stats AS (
        -- HUGEINT squares mirror the engine's DECIMAL(38,0): daily
        -- counts past ~3e9 square out of 64 bits (the r12 CV class)
        SELECT event_type, SUM(n) AS sx,
               SUM(CAST(n AS HUGEINT) * CAST(n AS HUGEINT)) AS sxx,
               COUNT(*) AS nd
        FROM daily GROUP BY event_type
    )
    SELECT d.event_type, d.day, d.n AS n_events,
           CAST(s.sx AS DOUBLE) / s.nd AS mean_events
    FROM daily d JOIN stats s USING (event_type)
    WHERE s.nd > 1
      AND CAST(s.nd - 1 AS DOUBLE) * CAST(s.nd * d.n - s.sx AS DOUBLE) * CAST(s.nd * d.n - s.sx AS DOUBLE)
          > 4.0 * CAST(s.nd AS DOUBLE)
                * CAST(s.nd * s.sxx - CAST(s.sx AS HUGEINT) * CAST(s.sx AS HUGEINT) AS DOUBLE)
    ORDER BY d.event_type ASC, d.day ASC
    """,
)
def events_daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume anomaly detection: flag (event_type, day) cells whose
    daily count sits more than 2 sample standard deviations from that
    type's mean — the monitoring query every event pipeline runs.

    The |z| > 2 test is evaluated as the cross-multiplied inequality
    (nd-1)·(nd·x - sx)² > 4·nd·(nd·sxx - sx²) (2σ, so the synthetic
    uniform fixture still yields non-empty output at every sf): sums and counts stay
    exact BIGINTs from one narrow two-level aggregation (days × types
    cardinality, map-side combined), and the comparison is a fixed
    chain of correctly-rounded double ops on identical integers in
    both engines — no sqrt, no per-group second pass, no window. The
    stats side is tiny (one row per event_type) and broadcast."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").alias("n"))
    # DECIMAL squares via the shared moment helpers, not int64: a
    # type whose daily count passes ~3e9 squares out of 64 bits, and
    # sx² follows (the r12 skew-probe CV overflow class); nd·x − sx
    # stays comfortably inside int64 (days-per-type × daily count).
    # m2_numerator also guards the non-ANSI silent-NULL overflow path
    # (ADVICE r12) — see functions/moments.py.
    stats = daily.groupBy("event_type").agg(
        F.sum("n").alias("sx"),
        sum_sq_dec(F.col("n")).alias("sxx"),
        F.count("*").alias("nd"),
    )
    d, s = F.col, F.col
    lhs = (
        (s("nd") - 1).cast("double")
        * (s("nd") * d("n") - s("sx")).cast("double")
        * (s("nd") * d("n") - s("sx")).cast("double")
    )
    rhs = (
        F.lit(4.0)
        * s("nd").cast("double")
        * m2_numerator(s("nd"), s("sx"), s("sxx")).cast("double")
    )
    return (
        daily.join(F.broadcast(stats), on="event_type")
        .filter((s("nd") > 1) & (lhs > rhs))
        .select(
            "event_type",
            F.col("day").cast("timestamp_ntz").alias("day"),
            F.col("n").alias("n_events"),
            (s("sx").cast("double") / s("nd")).alias("mean_events"),
        )
        .orderBy("event_type", "day")
    )
