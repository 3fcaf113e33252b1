"""Queued round-12 registrations: profiling + trade analytics.

- orders_order_size_histogram — distribution of lineitems per order
  (zero-item orders included): the batch-size profile that drives
  join/skew expectations downstream.
- supplier_part_degree_profile — bipartite degree histograms of the
  distinct (supplier, part) relationship from lineitem: catalog
  profiling of the supply graph's fan-out on both sides.
- customer_order_value_cv — top-100 most erratic spenders by exact
  coefficient of variation of order value (spend-consistency
  segmentation — the orthogonal axis to RFM).
- nation_trade_balance — per-nation exports/imports/balance, the
  marginals of nation_flow_matrix, money in exact 1e-4-dollar BIGINT
  units until one final division.

All four oracle-previewed cell-exact at sf0.001/0.01/0.1
(tests/test_oracle_parity.py) and degenerate-input pinned
(tests/test_empty_inputs.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_architecture_transaction_spark.catalog import load_table
from lakehouse_architecture_transaction_spark.functions.moments import m2_numerator, sum_sq_dec

# ------------------------------------------------------------------
# 1. orders_order_size_histogram
# ------------------------------------------------------------------

ORDERS_SIZE_HISTOGRAM_ORACLE = """
WITH per_order AS (
    SELECT o.o_orderkey, CAST(COUNT(l.l_orderkey) AS BIGINT) AS n_items
    FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY 1
),
hist AS (
    SELECT n_items, CAST(COUNT(*) AS BIGINT) AS n_orders FROM per_order GROUP BY 1
),
tot AS (SELECT CAST(SUM(n_orders) AS BIGINT) AS n_total FROM hist)
SELECT n_items, n_orders,
       CAST(n_orders AS DOUBLE) / CAST(n_total AS DOUBLE) AS share
FROM hist, tot
ORDER BY n_items ASC
"""


def orders_order_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-size distribution: how many orders carry k lineitems
    (k = 0 included via the left join — phantom orders are a data-
    quality signal in their own right), with the share of all orders.
    The profile that sets expectations for every orderkey-keyed join's
    group sizes downstream.

    Scale shape: lineitem pre-aggregates to per-order counts FIRST
    (map-side partial combine collapses the ~4-6 lines per order
    before the shuffle — the r12 broadcast audit caught the original
    join-then-count shape moving full lineitem rows), then an
    order-cardinality left join restores the zero-item orders, a
    histogram aggregate at order-size cardinality, and the total as a
    re-aggregation of the localCheckpoint-ed histogram frame."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    counts = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.count("*").cast("bigint").alias("__n")
    )
    per_order = orders.join(counts, "o_orderkey", "left").select(
        "o_orderkey", F.coalesce(F.col("__n"), F.lit(0)).cast("bigint").alias("n_items")
    )
    hist = (
        per_order.groupBy("n_items")
        .agg(F.count("*").cast("bigint").alias("n_orders"))
        .localCheckpoint(eager=True)
    )
    tot = hist.agg(F.sum("n_orders").cast("bigint").alias("n_total"))
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            "n_items",
            "n_orders",
            (F.col("n_orders").cast("double") / F.col("n_total").cast("double")).alias(
                "share"
            ),
        )
        .orderBy("n_items")
    )


# ------------------------------------------------------------------
# 2. supplier_part_degree_profile
# ------------------------------------------------------------------

SUPPLIER_PART_DEGREE_ORACLE = """
WITH sp AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
sdeg AS (SELECT l_suppkey, COUNT(*) AS degree FROM sp GROUP BY 1),
pdeg AS (SELECT l_partkey, COUNT(*) AS degree FROM sp GROUP BY 1),
u AS (
    SELECT 'supplier' AS side, degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM sdeg GROUP BY 2
    UNION ALL
    SELECT 'part' AS side, degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM pdeg GROUP BY 2
)
SELECT side, CAST(degree AS BIGINT) AS degree, n_nodes
FROM u
ORDER BY side ASC, degree ASC
"""


def supplier_part_degree_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite degree profile of the supply relationship: from the
    distinct (supplier, part) pairs observed in lineitem, the
    histogram of how many parts each supplier ships and how many
    suppliers each part has — the fan-out chart that decides whether
    the supply graph's joins broadcast, bucket, or salt (a heavy tail
    on either side is the pre-skew warning). Companion to
    part_supplier_hhi's concentration index.

    Scale shape: ONE distinct aggregate over the fact (map-side
    partial distinct), localCheckpoint-ed because both side-degree
    branches consume it; each side is then two aggregates at
    node/degree cardinality."""
    sp = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_suppkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=True)
    )

    def side_hist(key: str, label: str) -> DataFrame:
        deg = sp.groupBy(key).agg(F.count("*").cast("bigint").alias("degree"))
        return deg.groupBy("degree").agg(
            F.count("*").cast("bigint").alias("n_nodes")
        ).select(F.lit(label).alias("side"), "degree", "n_nodes")

    return (
        side_hist("l_suppkey", "supplier")
        .unionByName(side_hist("l_partkey", "part"))
        .orderBy("side", "degree")
    )


# ------------------------------------------------------------------
# 3. customer_order_value_cv — spend-consistency outliers
# ------------------------------------------------------------------

_CV_MIN_ORDERS = 5
_CV_TOP = 100

CUSTOMER_ORDER_CV_ORACLE = f"""
WITH cents AS (
    SELECT o_custkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
    FROM orders
),
m AS (
    -- HUGEINT moments mirror the engine's DECIMAL(38,0) discipline:
    -- a hot customer overflows Sum(x*x) in 64 bits (r12 skew probe)
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
           SUM(CAST(x AS HUGEINT)) AS sx,
           SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
    FROM cents GROUP BY 1
),
scored AS (
    SELECT o_custkey, n_orders,
           CAST(sx AS DOUBLE) / CAST(n_orders AS DOUBLE) / 100.0 AS mean_order_value,
           sqrt(CAST(CAST(n_orders AS HUGEINT) * sxx - sx * sx AS DOUBLE)
                / CAST(CAST(n_orders AS HUGEINT) * (n_orders - 1) AS DOUBLE))
               / (CAST(sx AS DOUBLE) / CAST(n_orders AS DOUBLE)) AS cv
    FROM m WHERE n_orders >= {_CV_MIN_ORDERS} AND sx > 0
),
r AS (
    SELECT *, ROW_NUMBER() OVER (ORDER BY cv DESC, o_custkey ASC) AS rn FROM scored
)
SELECT o_custkey, n_orders, mean_order_value, cv
FROM r WHERE rn <= {_CV_TOP}
ORDER BY cv DESC, o_custkey ASC
"""


def customer_order_value_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{top} most ERRATIC spenders: per-customer coefficient of
    variation (sample std dev / mean) of order value, customers with
    ≥ {mn} orders — the spend-consistency axis RFM doesn't capture
    (same total spend can be steady subscriptions or one spike; CV
    separates them for forecasting and fraud review). Moments are
    exact DECIMAL(38,0) cent sums — NOT int64: the r12 skew probe
    measured a 30%-hot customer overflowing Σx² (x ≤ ~5.5e7 cents,
    x² ≈ 3e15, 45k hot orders ≈ 1.4e20 > 2^63; ANSI raises). In
    38-digit decimals the worst term n·Σx² stays exact to ~1e7
    orders per customer at full corpus price ranges (~1e30 ≪ 1e38);
    mean, sd and cv are one fixed chain of IEEE ops per customer.
    mean_order_value is reported in dollars (one extra division by
    100 — still deterministic).

    Scale shape: ONE map-side-combinable moment aggregate at customer
    cardinality, then the top-k rank (TakeOrdered at k={top}, no
    global sort materialization)."""
    orders = load_table(spark, sf_dir, "orders")
    cents = orders.select(
        "o_custkey",
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias("x"),
    )
    xd = F.col("x").cast("decimal(19,0)")
    m = cents.groupBy("o_custkey").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum(xd).alias("__sx"),
        sum_sq_dec(F.col("x")).alias("__sxx"),
    )
    n = F.col("n_orders")
    nd = n.cast("decimal(38,0)")
    mean_cents = F.col("__sx").cast("double") / n.cast("double")
    # m2_numerator = exact nd·Σx² − (Σx)² with the non-ANSI
    # silent-overflow guard (ADVICE r12) — functions/moments.py
    sd = F.sqrt(
        m2_numerator(n, F.col("__sx"), F.col("__sxx")).cast("double")
        / (nd * (nd - F.lit(1))).cast("double")
    )
    scored = (
        m.filter((n >= _CV_MIN_ORDERS) & (F.col("__sx") > 0))
        .select(
            "o_custkey",
            "n_orders",
            (mean_cents / F.lit(100.0)).alias("mean_order_value"),
            (sd / mean_cents).alias("cv"),
        )
    )
    return scored.orderBy(F.col("cv").desc(), F.col("o_custkey").asc()).limit(_CV_TOP)


# ------------------------------------------------------------------
# 4. nation_trade_balance — flow-matrix marginals
# ------------------------------------------------------------------

_REV_E4 = (
    "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(18,4)) * 10000 AS BIGINT)"
)

NATION_TRADE_BALANCE_ORACLE = f"""
WITH flow AS (
    SELECT s.s_nationkey AS supp_nk, c.c_nationkey AS cust_nk,
           {_REV_E4} AS rev_e4
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY 1, 2
),
exp AS (SELECT supp_nk AS nk, CAST(SUM(rev_e4) AS BIGINT) AS exp_e4 FROM flow GROUP BY 1),
imp AS (SELECT cust_nk AS nk, CAST(SUM(rev_e4) AS BIGINT) AS imp_e4 FROM flow GROUP BY 1)
SELECT n.n_name AS n_name,
       CAST(COALESCE(e.exp_e4, 0) AS DOUBLE) / 10000.0 AS exports,
       CAST(COALESCE(i.imp_e4, 0) AS DOUBLE) / 10000.0 AS imports,
       CAST(COALESCE(e.exp_e4, 0) - COALESCE(i.imp_e4, 0) AS DOUBLE) / 10000.0 AS balance
FROM nation n
LEFT JOIN exp e ON n.n_nationkey = e.nk
LEFT JOIN imp i ON n.n_nationkey = i.nk
ORDER BY n_name ASC
"""


def nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation trade balance — the marginals of the 25×25
    nation_flow_matrix: revenue exported (as supplier nation) minus
    revenue imported (as customer nation), every nation listed (zero
    flows included). Money stays in exact 1e-4-dollar BIGINT units
    from the per-cell decimal sum through both marginal sums and the
    subtraction; ONE final division per output column.

    Scale shape: the same fact-fact join as the flow matrix collapsed
    to a 625-cell aggregate, localCheckpoint-ed because BOTH marginal
    sums consume it; the nation dim joins broadcast at 25 rows."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    flow = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("s_nationkey").alias("supp_nk"), F.col("c_nationkey").alias("cust_nk")
        )
        .agg(F.expr(_REV_E4).alias("rev_e4"))
        .localCheckpoint(eager=True)
    )
    exp = flow.groupBy(F.col("supp_nk").alias("nk")).agg(
        F.sum("rev_e4").cast("bigint").alias("exp_e4")
    )
    imp = flow.groupBy(F.col("cust_nk").alias("nk")).agg(
        F.sum("rev_e4").cast("bigint").alias("imp_e4")
    )
    return (
        nation.join(exp, nation["n_nationkey"] == exp["nk"], "left")
        .join(imp, nation["n_nationkey"] == imp["nk"], "left")
        .select(
            "n_name",
            (F.coalesce(F.col("exp_e4"), F.lit(0)).cast("double") / F.lit(10000.0)).alias(
                "exports"
            ),
            (F.coalesce(F.col("imp_e4"), F.lit(0)).cast("double") / F.lit(10000.0)).alias(
                "imports"
            ),
            (
                (F.coalesce(F.col("exp_e4"), F.lit(0)) - F.coalesce(F.col("imp_e4"), F.lit(0)))
                .cast("double")
                / F.lit(10000.0)
            ).alias("balance"),
        )
        .orderBy("n_name")
    )


# ------------------------------------------------------------------
# Registration (round 12 drain — all four preview-verified at
# sf0.001/0.01/0.1 in tests/test_oracle_parity.py before this point)
# ------------------------------------------------------------------

from lakehouse_architecture_transaction_spark.plans.registry import register  # noqa: E402

register("orders_order_size_histogram", oracle=ORDERS_SIZE_HISTOGRAM_ORACLE)(
    orders_order_size_histogram
)
register("supplier_part_degree_profile", oracle=SUPPLIER_PART_DEGREE_ORACLE)(
    supplier_part_degree_profile
)
register("customer_order_value_cv", oracle=CUSTOMER_ORDER_CV_ORACLE)(customer_order_value_cv)
register("nation_trade_balance", oracle=NATION_TRADE_BALANCE_ORACLE)(nation_trade_balance)
