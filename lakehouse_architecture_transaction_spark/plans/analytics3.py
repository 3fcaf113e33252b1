"""Analytics library, round 4: window-function coverage (FIRST/LAST
VALUE, PERCENT_RANK/CUME_DIST, DENSE_RANK, LAG deltas, gaps-and-islands)
plus calendar/profile shapes (weekday, monthly share, peak hour,
top-brand-per-type, per-segment medians).

Registry determinism discipline as everywhere: exact DECIMAL money
sums with a DOUBLE output boundary, one double division per ratio,
integer date arithmetic, unique tiebreakers on every ordering, and
dates surfaced as midnight TIMESTAMP_NTZ (the lake's date-output
convention — pandas/DuckDB then agree on dtype).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_architecture_transaction_spark.catalog import load_table
from lakehouse_architecture_transaction_spark.plans.analytics import _REV
from lakehouse_architecture_transaction_spark.plans.registry import register


@register(
    "customer_order_span",
    oracle="""
    SELECT o_custkey,
           CAST(CAST(first_dt AS DATE) AS TIMESTAMP) AS first_dt,
           CAST(CAST(last_dt AS DATE) AS TIMESTAMP) AS last_dt,
           CAST(first_price AS DOUBLE) AS first_price,
           CAST(last_price AS DOUBLE) AS last_price,
           n_orders
    FROM (
        SELECT o_custkey,
               FIRST_VALUE(o_orderdate) OVER w AS first_dt,
               LAST_VALUE(o_orderdate) OVER w AS last_dt,
               FIRST_VALUE(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS first_price,
               LAST_VALUE(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS last_price,
               COUNT(*) OVER (PARTITION BY o_custkey) AS n_orders,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate ASC, o_orderkey ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ) WHERE rn = 1
    ORDER BY o_custkey ASC
    """,
)
def customer_order_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE/LAST_VALUE over an unbounded frame: each customer's
    first and last order date and price in ONE window pass (no
    min/max + join-back). Partitioned by custkey — fully parallel at
    any scale; (date, orderkey) ordering makes the frame total."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    price = F.expr("CAST(o_totalprice AS DECIMAL(18,2))")
    return (
        orders.select(
            "o_custkey",
            F.first(F.col("o_orderdate")).over(wf).alias("__fd"),
            F.last(F.col("o_orderdate")).over(wf).alias("__ld"),
            F.first(price).over(wf).alias("__fp"),
            F.last(price).over(wf).alias("__lp"),
            F.count("*").over(Window.partitionBy("o_custkey")).alias("n_orders"),
            F.row_number().over(w).alias("__rn"),
        )
        .filter(F.col("__rn") == 1)
        .select(
            "o_custkey",
            F.expr("CAST(CAST(__fd AS DATE) AS TIMESTAMP_NTZ)").alias("first_dt"),
            F.expr("CAST(CAST(__ld AS DATE) AS TIMESTAMP_NTZ)").alias("last_dt"),
            F.col("__fp").cast("double").alias("first_price"),
            F.col("__lp").cast("double").alias("last_price"),
            "n_orders",
        )
        .orderBy("o_custkey")
    )


@register(
    "orders_pctrank_in_segment",
    oracle="""
    SELECT o.o_orderkey,
           c.c_mktsegment,
           CAST(year(o.o_orderdate) AS INTEGER) AS yr,
           CAST(o.o_totalprice AS DOUBLE) AS price,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume_dist
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WINDOW w AS (PARTITION BY c.c_mktsegment, year(o.o_orderdate)
                 ORDER BY CAST(o.o_totalprice AS DECIMAL(18,2)) ASC)
    ORDER BY o_orderkey ASC
    """,
)
def orders_pctrank_in_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENT_RANK + CUME_DIST of each order's value within its
    (market segment × year), via operators/ranking.py
    grouped_percent_rank: rows collapse to (group, value) counts,
    values bucket on GLOBAL quantile boundaries, and ranks assemble
    from per-(group, bucket) prefixes + broadcast offsets — the
    tie-sharing SQL semantics exactly, with NO per-group global sort
    (a bare segment×year window funnels 1/35 of the fact table
    through one task at 100 TB)."""
    from lakehouse_architecture_transaction_spark.operators.ranking import grouped_percent_rank

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    d = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey",
        "c_mktsegment",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.expr("CAST(o_totalprice AS DECIMAL(18,2))").alias("__vdec"),
    )
    ranked = grouped_percent_rank(
        d, group_cols=["c_mktsegment", "yr"], value_col="__vdec"
    )
    return ranked.select(
        "o_orderkey",
        "c_mktsegment",
        "yr",
        F.col("__vdec").cast("double").alias("price"),
        "pct_rank",
        "cume_dist",
    ).orderBy("o_orderkey")


@register(
    "lineitem_returnflag_discount_ranks",
    oracle=f"""
    WITH a AS (
        SELECT l_returnflag, l_discount,
               COUNT(*) AS n_items,
               CAST(SUM({_REV}) AS DECIMAL(18,4)) AS rev
        FROM lineitem GROUP BY 1, 2
    )
    SELECT l_returnflag, CAST(l_discount AS DOUBLE) AS discount, n_items,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(DENSE_RANK() OVER (PARTITION BY l_returnflag ORDER BY rev DESC) AS BIGINT) AS rev_rank
    FROM a
    ORDER BY l_returnflag ASC, rev_rank ASC, discount ASC
    """,
)
def lineitem_returnflag_discount_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DENSE_RANK of discount levels by revenue within each return flag.
    The window runs over the AGGREGATE (3 flags × 11 discount levels —
    constant cardinality however large the fact table), never the
    fact; dense_rank is tie-stable so no tiebreaker is needed in the
    rank itself (the output ordering carries one)."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.groupBy("l_returnflag", "l_discount").agg(
        F.count("*").alias("n_items"),
        F.expr(f"SUM({_REV})").cast("decimal(18,4)").alias("rev"),
    )
    w = Window.partitionBy("l_returnflag").orderBy(F.col("rev").desc())
    return a.select(
        "l_returnflag",
        F.col("l_discount").cast("double").alias("discount"),
        "n_items",
        F.col("rev").cast("double").alias("revenue"),
        F.dense_rank().over(w).cast("bigint").alias("rev_rank"),
    ).orderBy(F.col("l_returnflag").asc(), F.col("rev_rank").asc(), F.col("discount").asc())


@register(
    "events_interarrival_by_type",
    oracle="""
    WITH seq AS (
        SELECT event_type,
               date_diff('microseconds',
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC),
                   ts) AS gap_us
        FROM events
    )
    SELECT event_type,
           COUNT(gap_us) AS n_gaps,
           CAST(SUM(gap_us) AS DOUBLE) / COUNT(gap_us) / 1e6 AS mean_gap_s,
           MIN(gap_us) AS min_gap_us,
           MAX(gap_us) AS max_gap_us
    FROM seq WHERE gap_us IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type ASC
    """,
)
def events_interarrival_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival gaps (LAG over the user timeline) in
    exact integer MICROSECONDS — second-granularity date_diff counts
    boundary crossings differently across engines, micros are the
    storage resolution and exact in both — re-aggregated by the
    arriving event's type. One user-key window pass, then a small
    groupBy; mean is one division of exact BIGINT sums."""
    events = load_table(spark, sf_dir, "events")
    gaps = events.select(
        "event_type",
        F.expr(
            "timestampdiff(MICROSECOND, lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC), ts)"
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("gap_us").alias("n_gaps"),
            (F.sum("gap_us").cast("double") / F.count("gap_us") / F.lit(1e6)).alias("mean_gap_s"),
            F.min("gap_us").alias("min_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
        )
        .orderBy("event_type")
    )


@register(
    "orders_gap_islands",
    oracle="""
    WITH m AS (
        SELECT DISTINCT o_custkey,
               year(o_orderdate) * 12 + month(o_orderdate) AS mnum
        FROM orders
    ),
    isl AS (
        SELECT o_custkey,
               mnum - ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY mnum ASC) AS island_key
        FROM m
    ),
    lens AS (
        SELECT o_custkey, island_key, COUNT(*) AS island_len
        FROM isl GROUP BY 1, 2
    )
    SELECT CAST(island_len AS BIGINT) AS island_len,
           COUNT(*) AS n_islands,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM lens GROUP BY island_len
    ORDER BY island_len ASC
    """,
)
def orders_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands over each customer's active MONTHS: runs of
    consecutive ordering months (island_key = month_number − row_number,
    the classic trick), profiled as a run-length histogram. Everything
    is integer arithmetic on custkey-partitioned windows — parallel at
    any scale, and the final histogram is at run-length cardinality."""
    orders = load_table(spark, sf_dir, "orders")
    m = orders.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("mnum"),
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy(F.col("mnum").asc())
    isl = m.select("o_custkey", (F.col("mnum") - F.row_number().over(w)).alias("island_key"))
    lens = isl.groupBy("o_custkey", "island_key").agg(F.count("*").alias("island_len"))
    return (
        lens.groupBy(F.col("island_len").cast("bigint").alias("island_len"))
        .agg(F.count("*").alias("n_islands"), F.countDistinct("o_custkey").alias("n_customers"))
        .orderBy("island_len")
    )


@register(
    "orders_weekday_profile",
    oracle="""
    WITH a AS (
        SELECT isodow(CAST(o_orderdate AS DATE)) AS dow,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
        FROM orders GROUP BY 1
    ),
    t AS (SELECT SUM(rev) AS tot FROM a)
    SELECT CAST(dow AS INTEGER) AS dow, n_orders,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(rev AS DOUBLE) / n_orders AS avg_order_value,
           CAST(rev AS DOUBLE) / CAST(t.tot AS DOUBLE) AS revenue_share
    FROM a, t
    ORDER BY dow ASC
    """,
)
def orders_weekday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order volume/revenue by ISO weekday (1=Mon..7=Sun): map-side
    combinable 7-group aggregate; shares divide by a broadcast scalar
    total (no window over the aggregate needed). Spark's weekday()
    (0=Mon) + 1 equals DuckDB's isodow."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.groupBy((F.expr("weekday(o_orderdate)") + 1).cast("int").alias("dow")).agg(
        F.count("*").alias("n_orders"),
        F.expr("SUM(CAST(o_totalprice AS DECIMAL(18,2)))").cast("decimal(18,2)").alias("rev"),
    )
    tot = a.agg(F.sum("rev").alias("tot"))
    return (
        a.crossJoin(F.broadcast(tot))
        .select(
            "dow",
            "n_orders",
            F.col("rev").cast("double").alias("revenue"),
            (F.col("rev").cast("double") / F.col("n_orders")).alias("avg_order_value"),
            (F.col("rev").cast("double") / F.col("tot").cast("double")).alias("revenue_share"),
        )
        .orderBy("dow")
    )


@register(
    "events_peak_hour_per_day",
    oracle="""
    WITH h AS (
        SELECT CAST(ts AS DATE) AS day, hour(ts) AS hr, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT CAST(day AS TIMESTAMP) AS day,
           CAST(hr AS INTEGER) AS peak_hour, n AS n_events
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY day ORDER BY n DESC, hr ASC) AS rn
        FROM h
    ) WHERE rn = 1
    ORDER BY day ASC
    """,
)
def events_peak_hour_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Busiest hour of each day: aggregate to (day, hour) first (the
    shuffle collapses to 24 rows per day with map-side combine), then
    a row_number over each day's ≤24 rows — argmax with a
    deterministic (count desc, hour asc) tiebreak, never a window over
    raw events."""
    events = load_table(spark, sf_dir, "events")
    h = events.groupBy(
        F.expr("CAST(ts AS DATE)").alias("day"), F.hour("ts").alias("hr")
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("day").orderBy(F.col("n").desc(), F.col("hr").asc())
    return (
        h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.expr("CAST(day AS TIMESTAMP_NTZ)").alias("day"),
            F.col("hr").cast("int").alias("peak_hour"),
            F.col("n").alias("n_events"),
        )
        .orderBy("day")
    )


@register(
    "orders_monthly_share",
    oracle="""
    WITH a AS (
        SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mon,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
        FROM orders GROUP BY 1, 2
    ),
    y AS (SELECT yr, SUM(rev) AS yrev FROM a GROUP BY yr)
    SELECT CAST(a.yr AS INTEGER) AS yr, CAST(a.mon AS INTEGER) AS mon, a.n_orders,
           CAST(a.rev AS DOUBLE) AS revenue,
           CAST(a.rev AS DOUBLE) / CAST(y.yrev AS DOUBLE) AS share_of_year
    FROM a JOIN y ON a.yr = y.yr
    ORDER BY yr ASC, mon ASC
    """,
)
def orders_monthly_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue as a share of its year: fact collapses to
    (year, month) with exact decimal sums; year totals re-aggregate
    the 12-row groups and broadcast back — no window over the fact,
    one double division per share."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.groupBy(
        F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mon")
    ).agg(
        F.count("*").alias("n_orders"),
        F.expr("SUM(CAST(o_totalprice AS DECIMAL(18,2)))").cast("decimal(18,2)").alias("rev"),
    )
    y = a.groupBy("yr").agg(F.sum("rev").alias("yrev"))
    return (
        a.join(F.broadcast(y), on="yr")
        .select(
            F.col("yr").cast("int").alias("yr"),
            F.col("mon").cast("int").alias("mon"),
            "n_orders",
            F.col("rev").cast("double").alias("revenue"),
            (F.col("rev").cast("double") / F.col("yrev").cast("double")).alias("share_of_year"),
        )
        .orderBy("yr", "mon")
    )


@register(
    "part_top_brand_per_type",
    oracle=f"""
    WITH a AS (
        SELECT p.p_type, p.p_brand,
               COUNT(*) AS n_items,
               CAST(SUM({_REV}) AS DECIMAL(18,4)) AS rev
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2
    )
    SELECT p_type, p_brand AS top_brand, n_items,
           CAST(rev AS DOUBLE) AS revenue
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY p_type ORDER BY rev DESC, p_brand ASC) AS rn
        FROM a
    ) WHERE rn = 1
    ORDER BY p_type ASC
    """,
)
def part_top_brand_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top revenue brand per part type: partkey-keyed fact-dim join,
    aggregate to (type, brand) — ~150×25 rows — then argmax per type
    over the tiny aggregate with a (revenue desc, brand asc)
    tiebreak."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type", "p_brand")
    a = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_type", "p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.expr(f"SUM({_REV})").cast("decimal(18,4)").alias("rev"),
        )
    )
    w = Window.partitionBy("p_type").orderBy(F.col("rev").desc(), F.col("p_brand").asc())
    return (
        a.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_type",
            F.col("p_brand").alias("top_brand"),
            "n_items",
            F.col("rev").cast("double").alias("revenue"),
        )
        .orderBy("p_type")
    )


@register(
    "customer_segment_median_order",
    oracle="""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           quantile_cont(o.o_totalprice, 0.5) AS median_value,
           quantile_cont(o.o_totalprice, 0.9) AS p90_value,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS mean_value
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    ORDER BY c_mktsegment ASC
    """,
)
def customer_segment_median_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median/p90 order value per market segment (both engines
    interpolate at rank p·(n−1), so doubles match bit-for-bit — the
    events_value_percentiles precedent), mean as one division of the
    exact decimal sum. custkey-keyed join, 5-group aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.expr("percentile(o_totalprice, 0.5)").alias("median_value"),
            F.expr("percentile(o_totalprice, 0.9)").alias("p90_value"),
            (
                F.expr("SUM(CAST(o_totalprice AS DECIMAL(18,2)))").cast("double") / F.count("*")
            ).alias("mean_value"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "events_session_stats",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
                         > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events
    ), sess AS (
        SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM ordered
    ), per AS (
        SELECT user_id, session_id, COUNT(*) AS n_events,
               date_diff('microseconds', MIN(ts), MAX(ts)) AS dur_us
        FROM sess GROUP BY 1, 2
    )
    SELECT COUNT(*) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_single_event,
           CAST(SUM(n_events) AS DOUBLE) / COUNT(*) AS mean_events,
           CAST(SUM(dur_us) AS DOUBLE) / COUNT(*) / 1e6 AS mean_duration_s,
           CAST(MAX(dur_us) AS DOUBLE) / 1e6 AS max_duration_s,
           quantile_cont(n_events, 0.5) AS p50_events
    FROM per
    """,
)
def events_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-level distribution over the batch sessionization (the
    summary a product team reads off A12's session table): session
    count, single-event share, mean events/duration, exact median
    events. Composes sessionize_events — the sessions aggregate once
    more to ONE row; durations are exact integer micros."""
    from lakehouse_architecture_transaction_spark.plans.analytics import sessionize_events

    sess = sessionize_events(spark, sf_dir)
    per = sess.select(
        "n_events",
        F.expr("timestampdiff(MICROSECOND, session_start, session_end)").alias("dur_us"),
    )
    single = F.when(F.col("n_events") == 1, 1).otherwise(0)
    return per.agg(
        F.count("*").alias("n_sessions"),
        F.sum(single).cast("bigint").alias("n_single_event"),
        (F.sum("n_events").cast("double") / F.count("*")).alias("mean_events"),
        (F.sum("dur_us").cast("double") / F.count("*") / F.lit(1e6)).alias("mean_duration_s"),
        (F.max("dur_us").cast("double") / F.lit(1e6)).alias("max_duration_s"),
        F.expr("percentile(n_events, 0.5)").alias("p50_events"),
    )


@register(
    "events_weekly_active_users",
    oracle="""
    WITH w AS (
        SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week_start,
               COUNT(DISTINCT user_id) AS wau,
               COUNT(*) AS n_events
        FROM events GROUP BY 1
    )
    SELECT week_start, wau, n_events,
           wau - LAG(wau) OVER (ORDER BY week_start ASC) AS wau_delta
    FROM w
    ORDER BY week_start ASC
    """,
)
def events_weekly_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly active users with week-over-week delta: the fact
    collapses to (week, distinct users) — COUNT DISTINCT shuffles on
    (week, user) with partial dedup map-side — and the LAG runs over
    the |weeks|-row aggregate only (bounded at ~52 rows/year — the
    unpartitioned window touches a constant-size frame, the same class
    as a scalar aggregate, never the fact). date_trunc('week') is
    Monday-based in both engines."""
    events = load_table(spark, sf_dir, "events")
    w = events.groupBy(F.date_trunc("week", F.col("ts")).alias("week_start")).agg(
        F.countDistinct("user_id").alias("wau"),
        F.count("*").alias("n_events"),
    )
    lw = Window.orderBy(F.col("week_start").asc())
    return (
        w.withColumn("wau_delta", F.col("wau") - F.lag("wau").over(lw))
        .orderBy("week_start")
    )


@register(
    "events_session_window",
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
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS session_value
    FROM sess GROUP BY user_id, session_id
    ORDER BY user_id ASC, session_start ASC
    """,
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessionization via Spark's NATIVE session_window aggregate
    (the same operator Structured Streaming uses for streaming
    sessions): one groupBy(user, session_window(ts, gap)) — no window
    functions, no lag/cumsum — with merge-on-overlap semantics
    identical to A12's lag+cumsum formulation, which the oracle
    replays. session_window.end is last_event + gap by definition, so
    session_end surfaces as MAX(ts) (same aggregate, no correction
    arithmetic). The shuffle is one exchange on user_id with session
    merge in the aggregate — strictly fewer passes than the window
    variant; at 100 TB both shuffle once on the same key."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id", F.session_window(F.col("ts"), "30 minutes").alias("w"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.expr("SUM(CAST(value AS DECIMAL(18,2)))")
            .cast("decimal(18,2)")
            .cast("double")
            .alias("session_value"),
        )
        .select("user_id", "session_start", "session_end", "n_events", "session_value")
        .orderBy(F.col("user_id").asc(), F.col("session_start").asc())
    )


@register(
    "events_hourly_seasonality",
    oracle="""
    WITH a AS (
        SELECT isodow(CAST(ts AS DATE)) AS dow, hour(ts) AS hr, COUNT(*) AS n_events
        FROM events GROUP BY 1, 2
    ),
    t AS (SELECT SUM(n_events) AS total FROM a)
    SELECT CAST(dow AS INTEGER) AS dow, CAST(hr AS INTEGER) AS hr, n_events,
           CAST(n_events AS DOUBLE) / t.total AS share
    FROM a, t
    ORDER BY dow ASC, hr ASC
    """,
)
def events_hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day × ISO-weekday activity heatmap (the traffic
    seasonality profile behind capacity planning and anomaly
    baselines): one map-side-combinable aggregate at 7×24 cardinality,
    shares against a broadcast scalar."""
    events = load_table(spark, sf_dir, "events")
    a = events.groupBy(
        (F.expr("weekday(ts)") + 1).cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hr"),
    ).agg(F.count("*").alias("n_events"))
    t = a.agg(F.sum("n_events").alias("total"))
    return (
        a.crossJoin(F.broadcast(t))
        .select("dow", "hr", "n_events", (F.col("n_events").cast("double") / F.col("total")).alias("share"))
        .orderBy("dow", "hr")
    )


@register(
    "orders_ship_delay_stats",
    oracle="""
    WITH d AS (
        SELECT o.o_orderpriority,
               date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) AS delay_d
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(delay_d) AS DOUBLE) / COUNT(*) AS mean_delay_d,
           quantile_cont(delay_d, 0.5) AS p50_delay_d,
           quantile_cont(delay_d, 0.9) AS p90_delay_d,
           MAX(delay_d) AS max_delay_d
    FROM d GROUP BY 1
    ORDER BY o_orderpriority ASC
    """,
)
def orders_ship_delay_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency distribution per priority class (the SLA
    table): orderkey-keyed fact-fact join, integer day arithmetic,
    exact mean (BIGINT sum / count) and exact interpolated quantiles
    per 5-row priority group."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority", "o_orderdate")
    d = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "o_orderpriority",
        F.datediff(F.expr("CAST(l_shipdate AS DATE)"), F.expr("CAST(o_orderdate AS DATE)")).alias("delay_d"),
    )
    return (
        d.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            (F.sum("delay_d").cast("double") / F.count("*")).alias("mean_delay_d"),
            F.expr("percentile(delay_d, 0.5)").alias("p50_delay_d"),
            F.expr("percentile(delay_d, 0.9)").alias("p90_delay_d"),
            F.max("delay_d").cast("bigint").alias("max_delay_d"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "events_dau_mau_stickiness",
    oracle="""
    WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    spine AS (SELECT DISTINCT day FROM ud),
    dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM ud GROUP BY day),
    mau AS (
        SELECT s.day, COUNT(DISTINCT u.user_id) AS mau
        FROM spine s JOIN ud u ON u.day BETWEEN s.day - 29 AND s.day
        GROUP BY s.day
    )
    SELECT CAST(d.day AS TIMESTAMP) AS day, d.dau, m.mau,
           CAST(d.dau AS DOUBLE) / m.mau AS stickiness
    FROM dau d JOIN mau m USING (day)
    ORDER BY day ASC
    """,
)
def events_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per active day — the product-health ratio of
    daily to trailing-30-day distinct users. Same scale plan as
    events_rolling_distinct_users: dedupe to (user, day) — the one big
    shuffle — then a BOUNDED 30× explode of each user-day into the
    days it serves; no per-day self-joins, no sliding COUNT(DISTINCT)
    window. The ratio is ONE double division of exact counts.

    The spine join carries an EXPLICIT broadcast hint (r10 broadcast
    audit): AQE sizes the contrib side by its pre-Generate shuffle
    stats — the ×30 explode fan-out is invisible at the query-stage
    boundary — so left to itself it broadcast the exploded USER-DAY
    frame (120k rows / 68 MiB for a 30-row spine at sf0.01, i.e.
    already OVER the 64 MiB broadcast ceiling it thought it was
    under; the under-estimate grows with the corpus until the
    pre-explode stage itself exceeds the threshold). The spine is day
    cardinality at any corpus size — it is the side that must build."""
    events = load_table(spark, sf_dir, "events")
    ud = events.select(F.to_date("ts").alias("day"), "user_id").distinct()
    spine = ud.select("day").distinct()
    dau = ud.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    contrib = ud.select(
        F.explode(F.expr("sequence(day, date_add(day, 29))")).alias("day"), "user_id"
    )
    mau = (
        contrib.join(F.broadcast(spine), on="day", how="inner")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("mau"))
    )
    return (
        dau.join(mau, on="day")
        .select(
            F.col("day").cast("timestamp_ntz").alias("day"),
            "dau",
            "mau",
            (F.col("dau").cast("double") / F.col("mau")).alias("stickiness"),
        )
        .orderBy("day")
    )
