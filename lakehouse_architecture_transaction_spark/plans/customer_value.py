"""Customer-value analytics: inter-purchase cadence, acquisition
cohorts, supplier Pareto concentration, and RFM segmentation.

The lifetime-value tier of the Athena-parity surface (the reference's
analytics stop at the validated tables; these are the queries its
e-commerce users would run next). Registry determinism discipline
throughout: exact DECIMAL money sums with a DOUBLE output boundary,
ONE double division per ratio, integer day/month arithmetic instead of
fractional date math, unique tiebreakers on every ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_architecture_transaction_spark.catalog import load_table
from lakehouse_architecture_transaction_spark.operators.ranking import exact_global_cumsum
from lakehouse_architecture_transaction_spark.plans.analytics import _REV
from lakehouse_architecture_transaction_spark.plans.registry import register


@register(
    "customer_interpurchase_gaps",
    oracle="""
    WITH seq AS (
        SELECT o_custkey,
               date_diff('day',
                   CAST(LAG(o_orderdate) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate ASC, o_orderkey ASC) AS DATE),
                   CAST(o_orderdate AS DATE)) AS gap
        FROM orders
    ),
    per AS (
        SELECT o_custkey, COUNT(gap) AS n_gaps, SUM(gap) AS sum_gap, MAX(gap) AS max_gap
        FROM seq WHERE gap IS NOT NULL GROUP BY o_custkey
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_repeat_customers,
           CAST(SUM(n_gaps) AS BIGINT) AS n_gaps,
           CAST(SUM(sum_gap) AS DOUBLE) / CAST(SUM(n_gaps) AS BIGINT) AS avg_gap_days,
           CAST(MAX(max_gap) AS BIGINT) AS max_gap_days
    FROM per JOIN customer ON c_custkey = per.o_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment ASC
    """,
)
def customer_interpurchase_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase cadence per market segment: day gaps between a
    customer's consecutive orders, aggregated per c_mktsegment.

    Scale shape: ONE shuffle on o_custkey feeds the lag() window (the
    unavoidable per-customer ordering pass), gaps collapse to a
    per-customer aggregate on the SAME key (no second exchange), then
    the customer join runs custkey-co-partitioned and the final agg is
    5 segments wide. Gaps are integer datediff days — no fractional
    date math — and the segment average is one double division of
    exact integer sums.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    gaps = (
        orders.select(
            "o_custkey",
            F.datediff(F.to_date("o_orderdate"), F.to_date(F.lag("o_orderdate").over(w))).alias("gap"),
        )
        .filter(F.col("gap").isNotNull())
    )
    per = gaps.groupBy("o_custkey").agg(
        F.count("gap").alias("n_gaps"),
        F.sum("gap").alias("sum_gap"),
        F.max("gap").alias("max_gap"),
    )
    return (
        per.join(customer, per.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_repeat_customers"),
            F.sum("n_gaps").cast("bigint").alias("n_gaps"),
            (F.sum("sum_gap").cast("double") / F.sum("n_gaps").cast("bigint")).alias("avg_gap_days"),
            F.max("max_gap").cast("bigint").alias("max_gap_days"),
        )
        .orderBy(F.col("c_mktsegment").asc())
    )


@register(
    "customer_cohort_ltv",
    oracle="""
    WITH f AS (
        SELECT o_custkey, MIN(o_orderdate) AS first_dt FROM orders GROUP BY o_custkey
    )
    SELECT CAST(make_date(CAST(year(f.first_dt) AS INT), CAST(month(f.first_dt) AS INT), 1) AS TIMESTAMP) AS cohort_month,
           CAST((year(o.o_orderdate) - year(f.first_dt)) * 12
                + (month(o.o_orderdate) - month(f.first_dt)) AS BIGINT) AS month_offset,
           COUNT(DISTINCT o.o_custkey) AS n_active,
           COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS DOUBLE) AS revenue
    FROM orders o JOIN f ON o.o_custkey = f.o_custkey
    GROUP BY 1, 2
    ORDER BY cohort_month ASC, month_offset ASC
    """,
)
def customer_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acquisition-cohort LTV matrix: customers bucketed by the month
    of their FIRST order; revenue and active-customer counts by whole
    months since acquisition — the cumulative-LTV curve input.

    Scale shape: groupBy(o_custkey) for first-order dates, then a
    fact-to-aggregate join co-partitioned on the SAME key (the first
    shuffle's partitioning is reused), finishing in an aggregate of
    |cohorts| × |offsets| rows. Month offsets are exact integer
    (year, month) arithmetic — months_between() floats would drift
    cross-engine.
    """
    orders = load_table(spark, sf_dir, "orders")
    first = orders.groupBy("o_custkey").agg(F.min("o_orderdate").alias("first_dt"))
    return (
        orders.join(first, "o_custkey")
        .groupBy(
            # date → TIMESTAMP_NTZ is midnight wall-clock, no session
            # timezone involved (the lake's date-output convention).
            F.expr("CAST(make_date(year(first_dt), month(first_dt), 1) AS TIMESTAMP_NTZ)").alias(
                "cohort_month"
            ),
            F.expr(
                "CAST((year(o_orderdate) - year(first_dt)) * 12"
                " + (month(o_orderdate) - month(first_dt)) AS BIGINT)"
            ).alias("month_offset"),
        )
        .agg(
            F.countDistinct("o_custkey").alias("n_active"),
            F.count("*").alias("n_orders"),
            # DECIMAL(28,2) cell sums (not 18,2): a cohort cell at the
            # 100 TB point can exceed DECIMAL(18,2)'s 1e16 bound, and
            # Spark would null the overflow. Consistent with the RFM
            # monetary sum.
            F.sum(F.expr("CAST(o_totalprice AS DECIMAL(18,2))"))
            .cast("decimal(28,2)")
            .cast("double")
            .alias("revenue"),
        )
        .orderBy(F.col("cohort_month").asc(), F.col("month_offset").asc())
    )


@register(
    "supplier_revenue_pareto",
    oracle=f"""
    WITH s AS (
        SELECT l_suppkey AS suppkey, CAST(SUM({_REV}) AS DECIMAL(18,4)) AS rev
        FROM lineitem GROUP BY l_suppkey
    ),
    tot AS (SELECT SUM(rev) AS t FROM s),
    c AS (
        SELECT suppkey, rev,
               ROW_NUMBER() OVER (ORDER BY rev DESC, suppkey ASC) AS rnk,
               SUM(rev) OVER (ORDER BY rev DESC, suppkey ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM s
    )
    SELECT suppkey,
           CAST(rnk AS BIGINT) AS rank,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(cum AS DOUBLE) AS cum_revenue,
           CAST(cum AS DOUBLE) / CAST(t AS DOUBLE) AS cum_share,
           (CAST(cum AS DOUBLE) / CAST(t AS DOUBLE)) <= 0.8 AS in_top80
    FROM c, tot
    ORDER BY rank ASC
    """,
)
def supplier_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier revenue concentration (Pareto / 80-20): per-supplier
    discounted revenue, exact descending rank, exact running share of
    total, and the top-80% flag.

    Scale shape: the fact scan collapses to supplier cardinality with
    map-side combine; the descending running sum is NOT a bare global
    window — operators/ranking.exact_global_cumsum range-buckets on
    revenue and offsets per-bucket (count, DECIMAL sum) prefixes, so
    ranks and cumulative sums are exact with no single-partition sort
    (supplier is 10k rows per TPC-H SF unit — 1e9 at the 100 TB
    point). The share is one double division against a broadcast
    1-row total.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = (
        li.groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.expr(f"SUM({_REV})").cast("decimal(18,4)").alias("rev"))
        # Rank on the WIDENED INTEGER key (rev·10⁴ is exact in BIGINT
        # up to 9.2e14 currency units): a double key would collide
        # distinct decimals beyond 2^53 and tiebreak by suppkey where
        # the oracle orders by true decimal value. Bucket boundaries
        # still come from the double projection internally — they only
        # affect load balance, never order.
        .withColumn("revi", F.expr("CAST(rev * 10000 AS BIGINT)"))
        # supplier-cardinality aggregate consumed 5× (total + the
        # ranking's four passes) — materialize once
        .localCheckpoint(eager=True)
    )
    tot = s.agg(F.sum("rev").alias("t"))
    ranked = exact_global_cumsum(
        s, value_col="revi", sum_col="rev", tiebreakers=["suppkey"],
        rank_col="rank", cum_col="cum", descending=True, materialize=False,
    )
    share = F.col("cum").cast("double") / F.col("t").cast("double")
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            "suppkey",
            "rank",
            F.col("rev").cast("double").alias("revenue"),
            F.col("cum").cast("double").alias("cum_revenue"),
            share.alias("cum_share"),
            (share <= F.lit(0.8)).alias("in_top80"),
        )
        .orderBy(F.col("rank").asc())
    )


@register(
    "customer_rfm_segments",
    oracle="""
    WITH per AS (
        SELECT o_custkey,
               CAST(date_diff('day', CAST(MAX(o_orderdate) AS DATE), DATE '1998-12-31') AS DOUBLE) AS rec,
               CAST(COUNT(*) AS DOUBLE) AS freq,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS mon
        FROM orders GROUP BY o_custkey
    ),
    th AS (
        SELECT quantile_cont(rec, 1.0/3) AS r1, quantile_cont(rec, 2.0/3) AS r2,
               quantile_cont(freq, 1.0/3) AS f1, quantile_cont(freq, 2.0/3) AS f2,
               quantile_cont(CAST(mon AS DOUBLE), 1.0/3) AS m1,
               quantile_cont(CAST(mon AS DOUBLE), 2.0/3) AS m2
        FROM per
    ),
    scored AS (
        SELECT CAST(CASE WHEN rec <= r1 THEN 3 WHEN rec <= r2 THEN 2 ELSE 1 END AS INT) AS r_score,
               CAST(CASE WHEN freq >= f2 THEN 3 WHEN freq >= f1 THEN 2 ELSE 1 END AS INT) AS f_score,
               CAST(CASE WHEN CAST(mon AS DOUBLE) >= m2 THEN 3
                         WHEN CAST(mon AS DOUBLE) >= m1 THEN 2 ELSE 1 END AS INT) AS m_score,
               mon
        FROM per, th
    )
    SELECT r_score, f_score, m_score,
           COUNT(*) AS n_customers,
           CAST(CAST(SUM(mon) AS DECIMAL(28,2)) AS DOUBLE) AS total_monetary
    FROM scored
    GROUP BY r_score, f_score, m_score
    ORDER BY r_score ASC, f_score ASC, m_score ASC
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency (days from last order to the fixed
    1998-12-31 anchor), frequency (order count), monetary (exact
    decimal spend) per customer, each cut into terciles at exact
    interpolated 1/3-2/3 quantiles; output is the 27-cell segment
    grid with counts and exact total spend.

    Scale shape: one groupBy(o_custkey) pass builds the RFM triple;
    the tercile thresholds are a 1-row aggregate broadcast back (the
    same exact-interpolation percentile both engines share — see
    events_value_percentiles); scoring is a map-side CASE chain and
    the final aggregate is ≤27 rows. Monetary stays DECIMAL through
    both aggregations — only comparisons and the output boundary are
    double.
    """
    orders = load_table(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey").agg(
        F.expr("CAST(datediff(DATE '1998-12-31', CAST(MAX(o_orderdate) AS DATE)) AS DOUBLE)").alias("rec"),
        F.count("*").cast("double").alias("freq"),
        F.sum(F.expr("CAST(o_totalprice AS DECIMAL(18,2))")).cast("decimal(28,2)").alias("mon"),
    )
    th = per.agg(
        F.expr("percentile(rec, 1.0/3)").alias("r1"),
        F.expr("percentile(rec, 2.0/3)").alias("r2"),
        F.expr("percentile(freq, 1.0/3)").alias("f1"),
        F.expr("percentile(freq, 2.0/3)").alias("f2"),
        F.expr("percentile(CAST(mon AS DOUBLE), 1.0/3)").alias("m1"),
        F.expr("percentile(CAST(mon AS DOUBLE), 2.0/3)").alias("m2"),
    )
    scored = per.crossJoin(F.broadcast(th)).select(
        F.expr("CAST(CASE WHEN rec <= r1 THEN 3 WHEN rec <= r2 THEN 2 ELSE 1 END AS INT)").alias("r_score"),
        F.expr("CAST(CASE WHEN freq >= f2 THEN 3 WHEN freq >= f1 THEN 2 ELSE 1 END AS INT)").alias("f_score"),
        F.expr(
            "CAST(CASE WHEN CAST(mon AS DOUBLE) >= m2 THEN 3"
            " WHEN CAST(mon AS DOUBLE) >= m1 THEN 2 ELSE 1 END AS INT)"
        ).alias("m_score"),
        "mon",
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("mon").cast("decimal(28,2)").cast("double").alias("total_monetary"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )
