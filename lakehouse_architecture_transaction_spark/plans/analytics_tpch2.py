"""TPC-H completion set: the remaining query SHAPES (Q2, Q8, Q9, Q11,
Q12, Q13, Q16, Q17, Q18, Q20, Q21, Q22) adapted to the test lake's
columns (no partsupp table; lineitem carries no commit/receipt dates or
shipmodes — each query keeps the reference query's JOIN/SUBQUERY/AGG
structure and swaps the missing column for an available stand-in).

Same determinism discipline as plans/analytics.py: exact DECIMAL
aggregation internally, ONE double cast/division at the output
boundary, deterministic tiebreakers on every top-k. Dimension joins
broadcast; scalar subqueries become broadcast cross-joins of 1-row
aggregates (Catalyst plans them as BroadcastNestedLoopJoin over a
single row — the right 100 TB plan for "compare to a global scalar").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_architecture_transaction_spark.catalog import load_table
from lakehouse_architecture_transaction_spark.plans.analytics import _REV, _SUM_REV, _rev_sum_col
from lakehouse_architecture_transaction_spark.plans.registry import register

_DEC_QTY = "CAST(l_quantity AS DECIMAL(18,2))"
_DEC_PRICE = "CAST(l_extendedprice AS DECIMAL(18,2))"


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH unit AS (
        SELECT l_partkey, l_suppkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS avg_unit_price
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        GROUP BY l_partkey, l_suppkey
    ),
    ranked AS (
        SELECT p_partkey, p_name, p_brand, s_name, avg_unit_price,
               ROW_NUMBER() OVER (PARTITION BY p_partkey
                                  ORDER BY avg_unit_price ASC, l_suppkey ASC) AS rn
        FROM unit
        JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
        JOIN supplier ON l_suppkey = s_suppkey
    )
    SELECT p_partkey, p_name, p_brand, s_name, avg_unit_price
    FROM ranked WHERE rn = 1
    ORDER BY p_partkey ASC
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier per part): the reference's
    correlated-min subquery over partsupp, re-keyed to observed unit
    prices from lineitem (no partsupp in the lake). Region-filtered
    suppliers, per-(part, supplier) aggregate, argmin per part via
    window — the aggregate runs BELOW the part dim join."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    unit = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            (
                F.expr(f"SUM({_DEC_PRICE})").cast("double")
                / F.expr(f"SUM({_DEC_QTY})").cast("double")
            ).alias("avg_unit_price")
        )
    )
    w = Window.partitionBy("p_partkey").orderBy(F.col("avg_unit_price").asc(), F.col("l_suppkey").asc())
    return (
        unit.join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_partkey", "p_name", "p_brand", "s_name", "avg_unit_price")
        .orderBy("p_partkey")
    )


@register(
    "q8_market_share",
    oracle=f"""
    WITH flat AS (
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               {_REV} AS rev, ns.n_name AS supp_nation
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation nc ON c_nationkey = nc.n_nationkey
        JOIN region ON nc.n_regionkey = r_regionkey AND r_name = 'ASIA'
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ns ON s_nationkey = ns.n_nationkey
        JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN rev
                              ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) AS DOUBLE)
             / CAST(CAST(SUM(rev) AS DECIMAL(18,4)) AS DOUBLE) AS mkt_share
    FROM flat
    GROUP BY o_year
    ORDER BY o_year ASC
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): 8-way star join, share
    = conditional decimal sum / total decimal sum in one double
    division per year. All dims broadcast; one fact-fact shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.expr(
            "o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'"
        )
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    nc = nation.alias("nc")
    ns = nation.alias("ns")
    flat = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nc), cust.c_nationkey == F.col("nc.n_nationkey"))
        .join(F.broadcast(region), F.col("nc.n_regionkey") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(ns), supp.s_nationkey == F.col("ns.n_nationkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            F.expr(_REV).alias("rev"),
            F.col("ns.n_name").alias("supp_nation"),
        )
    )
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_2", F.col("rev")).otherwise(
            F.expr("CAST(0 AS DECIMAL(18,4))")
        )
    )
    return (
        flat.groupBy("o_year")
        .agg(
            (
                num.cast("decimal(18,4)").cast("double")
                / F.sum("rev").cast("decimal(18,4)").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(CAST(SUM({_REV} - CAST(p_retailprice AS DECIMAL(18,2))
                             * CAST(0.60 AS DECIMAL(18,2))
                             * {_DEC_QTY}) AS DECIMAL(18,6)) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, o_year
    ORDER BY nation ASC, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-line profit by nation and year).
    partsupp's supplycost is absent, so cost stands in as 60% of
    p_retailprice — the profit expression keeps Q9's
    revenue-minus-cost decimal arithmetic exactly."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    profit = F.expr(
        f"{_REV} - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(0.60 AS DECIMAL(18,2)) * {_DEC_QTY}"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(profit).cast("decimal(18,6)").cast("double").alias("sum_profit"))
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


@register(
    "q11_important_parts",
    oracle=f"""
    WITH scoped AS (
        SELECT l_partkey, {_REV} AS rev
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
    ),
    per_part AS (
        SELECT l_partkey, CAST(CAST(SUM(rev) AS DECIMAL(18,4)) AS DOUBLE) AS value
        FROM scoped GROUP BY l_partkey
    ),
    total AS (SELECT CAST(CAST(SUM(rev) AS DECIMAL(18,4)) AS DOUBLE) AS tv,
                     COUNT(DISTINCT l_partkey) AS np
              FROM scoped)
    SELECT l_partkey, value
    FROM per_part, total
    WHERE value > 1.5 * tv / np
    ORDER BY value DESC, l_partkey ASC
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part value vs a global
    threshold scalar. The scalar is a 1-row aggregate broadcast into a
    cross join — no driver collect. Q11's fixed fraction must shrink
    with SF (the TPC spec divides it by SF); a MEAN-relative threshold
    (>1.5× the average part value) is the scale-free equivalent and
    keeps the result meaningful at any corpus size."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    scoped = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("l_partkey", F.expr(_REV).alias("rev"))
    )
    per_part = scoped.groupBy("l_partkey").agg(
        F.sum("rev").cast("decimal(18,4)").cast("double").alias("value")
    )
    # total recomputed from the DECIMAL base (not the per-part doubles):
    # decimal sums are order-independent, double re-sums are not
    total = scoped.agg(
        F.sum("rev").cast("decimal(18,4)").cast("double").alias("tv"),
        F.countDistinct("l_partkey").alias("np"),
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.lit(1.5) * F.col("tv") / F.col("np"))
        .select("l_partkey", "value")
        .orderBy(F.col("value").desc(), F.col("l_partkey").asc())
    )


@register(
    "q12_late_lineitems",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END) AS BIGINT) AS late_count,
           CAST(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 0 ELSE 1 END) AS BIGINT) AS ontime_count
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority ASC
    """,
)
def q12_late_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode/receipt buckets → late-shipment
    buckets; the lake has no shipmode or receiptdate): one fact-fact
    join, conditional counts per priority class."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    late = F.expr("l_shipdate > o_orderdate + INTERVAL 60 DAY")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(late, 1).otherwise(0)).alias("late_count"),
            F.sum(F.when(late, 0).otherwise(1)).alias("ontime_count"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q13_order_count_distribution",
    oracle="""
    WITH per_cust AS (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): LEFT join
    keeps zero-order customers, two-level aggregation (per-customer
    count, then histogram of counts — second shuffle is on the tiny
    count domain)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q16_supplier_part_variety",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#13' AND p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
    """,
)
def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (supplier variety per part class): NOT-filter +
    IN-list on the part dim, COUNT DISTINCT over the fact join (two-
    stage distinct aggregation — partial per partition, exact merge)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13") & F.col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            F.col("p_brand").asc(),
            F.col("p_type").asc(),
            F.col("p_size").asc(),
        )
    )


@register(
    "q17_small_qty_revenue",
    oracle=f"""
    WITH avg_qty AS (
        SELECT l_partkey AS ap,
               CAST(SUM({_DEC_QTY}) AS DOUBLE) / COUNT(*) AS aq
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(CAST(SUM({_DEC_PRICE}) AS DECIMAL(18,2)) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#13'
    JOIN avg_qty ON l_partkey = ap
    WHERE CAST(l_quantity AS DOUBLE) < 0.5 * aq
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): the correlated
    per-part AVG subquery becomes an aggregate-then-join — the
    per-part average is computed once, shuffled at part-key
    cardinality, and joined back; no per-row subquery execution."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap")).agg(
        (F.expr(f"SUM({_DEC_QTY})").cast("double") / F.count("*")).alias("aq")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("ap"))
        .filter(F.col("l_quantity").cast("double") < 0.5 * F.col("aq"))
        .agg(
            (F.expr(f"SUM({_DEC_PRICE})").cast("decimal(18,2)").cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "q18_large_volume_customers",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey AS bk, CAST(SUM({_DEC_QTY}) AS DECIMAL(18,2)) AS sq
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM({_DEC_QTY}) > 250
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(sq AS DOUBLE) AS sum_qty
    FROM big
    JOIN orders ON bk = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
    LIMIT 100
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): the IN-subquery over
    a grouped HAVING becomes aggregate-then-join; the order/customer
    joins run on the small filtered aggregate, not the raw fact."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy(F.col("l_orderkey").alias("bk"))
        .agg(F.expr(f"SUM({_DEC_QTY})").cast("decimal(18,2)").alias("sq"))
        .filter(F.col("sq") > 250)
    )
    return (
        big.join(orders, F.col("bk") == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("sq").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .limit(100)
    )


@register(
    "q20_heavy_shippers",
    oracle=f"""
    WITH shipped AS (
        SELECT l_suppkey, CAST(SUM({_DEC_QTY}) AS DOUBLE) AS total_qty
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
        GROUP BY l_suppkey
    )
    SELECT s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal, total_qty
    FROM shipped
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_qty > 100
    ORDER BY s_name ASC
    """,
)
def q20_heavy_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (suppliers with significant stock of a part
    family): nested subquery chain (parts LIKE → per-supplier shipped
    quantity → threshold → supplier semi-join) as aggregate-then-join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = load_table(spark, sf_dir, "supplier")
    shipped = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.expr(f"SUM({_DEC_QTY})").cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > 100)
    )
    return (
        shipped.join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_name", F.col("s_acctbal").cast("double").alias("s_acctbal"), "total_qty")
        .orderBy("s_name")
    )


@register(
    "q21_sole_late_supplier",
    oracle="""
    WITH per_os AS (
        SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS max_ship
        FROM lineitem GROUP BY l_orderkey, l_suppkey
    ),
    flagged AS (
        SELECT p.l_orderkey, p.l_suppkey,
               CASE WHEN p.max_ship > o_orderdate + INTERVAL 90 DAY THEN 1 ELSE 0 END AS late
        FROM per_os p JOIN orders ON p.l_orderkey = o_orderkey
    ),
    per_order AS (
        SELECT l_orderkey, COUNT(*) AS n_supp, SUM(late) AS n_late,
               MAX(CASE WHEN late = 1 THEN l_suppkey END) AS late_supp
        FROM flagged GROUP BY l_orderkey
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM per_order
    JOIN supplier ON late_supp = s_suppkey
    WHERE n_supp >= 2 AND n_late = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name ASC
    """,
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the
    EXISTS/NOT-EXISTS pair over other suppliers' lineitems becomes
    per-(order, supplier) aggregates + per-order flags — "multi-
    supplier order where exactly this one supplier shipped late"
    (late = >90 days after order date; no receipt/commit dates in
    the lake). ONE fact shuffle total (r15, guide §2.4): the
    (l_orderkey, l_suppkey) aggregate used to plan its own
    Exchange(ok, sk) — which compresses nothing map-side, the key is
    ~unique per lineitem — followed by a second Exchange(ok) feeding
    the per-order flags. Repartitioning the pruned fact ONCE by
    l_orderkey satisfies the (ok, sk) clustering, the orders join,
    AND the per-order aggregate from the same exchange (partitioning
    on a subset of the grouping keys is a valid clustered
    distribution), so the two cascaded exchanges collapse to one. No
    correlated subqueries."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    per_os = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .repartition(F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("max_ship"))
    )
    flagged = per_os.join(orders, per_os.l_orderkey == orders.o_orderkey).select(
        per_os.l_orderkey,
        "l_suppkey",
        F.when(F.expr("max_ship > o_orderdate + INTERVAL 90 DAY"), 1).otherwise(0).alias("late"),
    )
    per_order = flagged.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum("late").alias("n_late"),
        F.max(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias("late_supp"),
    )
    return (
        per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(supp), F.col("late_supp") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
    )


@register(
    "orders_grouping_sets",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS BIGINT) AS gid,
           COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), (o_orderpriority, o_orderstatus), ())
    ORDER BY gid ASC, o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST
    """,
)
def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form rollup/cube
    specialize): four simultaneous aggregation granularities in ONE
    pass — Spark expands the sets map-side and shuffles once, not once
    per set. grouping_id disambiguates NULL-as-group from NULL data."""
    orders = load_table(spark, sf_dir, "orders")
    gid = (F.grouping("o_orderpriority") * 2 + F.grouping("o_orderstatus")).cast("bigint")
    return (
        orders.groupingSets(
            [["o_orderpriority"], ["o_orderstatus"], ["o_orderpriority", "o_orderstatus"], []],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            gid.alias("gid"),
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("total"),
        )
        .select("o_orderpriority", "o_orderstatus", "gid", "n_orders", "total")
        .orderBy(
            F.col("gid").asc(),
            F.col("o_orderpriority").asc_nulls_first(),
            F.col("o_orderstatus").asc_nulls_first(),
        )
    )


@register(
    "customer_range_frame_spend",
    oracle="""
    WITH o AS (
        SELECT o_orderkey, o_custkey, o_orderdate,
               CAST(date_diff('day', TIMESTAMP '1970-01-01 00:00:00', o_orderdate) AS BIGINT) AS d,
               CAST(o_totalprice AS DECIMAL(18,2)) AS p
        FROM orders
    )
    SELECT o_orderkey, o_custkey,
           CAST(CAST(SUM(p) OVER (
               PARTITION BY o_custkey ORDER BY d
               RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
           ) AS DECIMAL(18,2)) AS DOUBLE) AS spend_30d
    FROM o
    ORDER BY o_orderkey ASC
    """,
)
def customer_range_frame_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame (value-based, not row-based): per order, the
    same customer's total spend over the trailing 30 DAYS inclusive.
    Row frames break on ties and gaps; a RANGE frame over the
    day-epoch is deterministic regardless of intra-day order — and is
    the frame variant row-windows can't emulate. One shuffle on the
    customer key; decimal sum, double boundary."""
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("timestamp_ntz")).cast("long").alias("d"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
    )
    w = Window.partitionBy("o_custkey").orderBy("d").rangeBetween(-30, 0)
    return (
        o.withColumn("spend_30d", F.sum("p").over(w).cast("decimal(18,2)").cast("double"))
        .select("o_orderkey", "o_custkey", "spend_30d")
        .orderBy("o_orderkey")
    )


@register(
    "q22_idle_rich_customers",
    oracle="""
    WITH thresh AS (
        SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE)
                 / COUNT(*) AS avg_bal
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey,
           COUNT(*) AS numcust,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS totacctbal
    FROM customer, thresh
    WHERE CAST(c_acctbal AS DOUBLE) > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    ORDER BY c_nationkey ASC
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): scalar AVG subquery
    (broadcast 1-row cross join) + anti-join against a filtered orders
    set, grouped by nation (the lake's country-code stand-in; Q22's
    "no orders at all" is empty on this lake, so the anti-join keys on
    urgent orders — same NOT EXISTS plan shape)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    thresh = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("decimal(18,2)").cast("double")
            / F.count("*")
        ).alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal").cast("double") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )
