"""Behavioral / sequence analytics: event-type transitions, top
session paths, and market-basket co-occurrence.

The sequence-mining tier of the extension surface (the reference's
events flow stops at hourly rollups — reference scripts/glue/script.py
processes batch tables only). Each query follows the registry's
determinism discipline: exact integer counts, ONE double division per
ratio, unique-tiebreaker ordering on every top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_architecture_transaction_spark.catalog import load_table
from lakehouse_architecture_transaction_spark.plans.registry import register


@register(
    "events_user_transitions",
    oracle="""
    WITH seq AS (
        SELECT event_type AS prev_type,
               LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS next_type
        FROM events
    ),
    c AS (
        SELECT prev_type, next_type, COUNT(*) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY prev_type, next_type
    )
    SELECT prev_type, next_type, n,
           CAST(SUM(n) OVER (PARTITION BY prev_type) AS BIGINT) AS n_prev,
           CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY prev_type) AS BIGINT) AS p
    FROM c
    ORDER BY prev_type ASC, next_type ASC
    """,
)
def events_user_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: P(next_type | prev_type) from consecutive event pairs.

    Scale shape: ONE shuffle on user_id feeds the lead() window (the
    same key sessionization uses — at 100 TB this is the unavoidable
    per-user ordering pass), then the pair counts collapse to
    |types|² rows with map-side combine; the denominator folds in as
    a window over the SAME prev_type key, so no second corpus pass.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    seq = events.select(
        F.col("event_type").alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    counted = seq.groupBy("prev_type", "next_type").agg(F.count("*").alias("n"))
    wprev = Window.partitionBy("prev_type")
    return (
        counted.withColumn("n_prev", F.sum("n").over(wprev))
        .withColumn("p", F.col("n").cast("double") / F.col("n_prev"))
        .orderBy("prev_type", "next_type")
    )


_PATH_LEN = 5
_TOP_PATHS = 20


@register(
    "events_top_paths",
    oracle=f"""
    WITH s AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               list(event_type ORDER BY ts ASC, event_id ASC) AS seq
        FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    p AS (SELECT array_to_string(seq[1:{_PATH_LEN}], '>') AS path FROM s)
    SELECT path, COUNT(*) AS n_user_days FROM p
    GROUP BY path
    ORDER BY n_user_days DESC, path ASC
    LIMIT {_TOP_PATHS}
    """,
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 user-day paths: the first 5 event types of each
    user-day, ordered by time, joined with '>' — the path-analysis
    query behind every funnel-discovery UI.

    Scale shape (r13 bounded-state rewrite): the path needs only the
    FIRST 5 events of each (user, day), so the prefix comes from the
    house grouped-top-k pattern (row_number ≤ 5 over the (user, day)
    window, the same shape as top3_orders_per_customer). Catalyst
    pushes the rank limit below the shuffle — the plan carries
    `WindowGroupLimit` on BOTH sides of the exchange (PLANS.md), so
    each map partition forwards ≤ 5 rows per (user, day) and the
    sort/exchange volume is bounded by 5·groups·partitions, not raw
    event volume; the reduce side's per-group buffer is a
    disk-spillable UnsafeRowArray besides. ONLY the ≤ 5 surviving
    rows per group reach the collect — the collect group is
    hard-bounded by the constant 5, not by a user's event volume (the
    collect_list OOM class the previous single-level shape carried).
    Then the path frequency count is a map-side-combining groupBy at
    path cardinality, and the top-k executes as TakeOrdered
    (per-partition heaps, no global sort). Ties break on path text.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "day").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    first5 = (
        events.select("user_id", F.to_date("ts").alias("day"), "ts", "event_id", "event_type")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= _PATH_LEN)
    )
    grp = first5.groupBy("user_id", "day").agg(
        F.expr("array_sort(collect_list(struct(__rn, event_type)))").alias("seq")
    )
    path = F.array_join(F.expr("transform(seq, s -> s.event_type)"), ">").alias("path")
    return (
        grp.select(path)
        .groupBy("path")
        .agg(F.count("*").alias("n_user_days"))
        .orderBy(F.col("n_user_days").desc(), F.col("path").asc())
        .limit(_TOP_PATHS)
    )


_TOP_PAIRS = 20


@register(
    "orders_market_basket",
    oracle=f"""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_orders
    FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY a.l_partkey, b.l_partkey
    ORDER BY n_orders DESC, part_a ASC, part_b ASC
    LIMIT {_TOP_PAIRS}
    """,
)
def orders_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining: the top part pairs co-occurring in
    the same order (frequent-itemset support counting, k=2).

    Scale shape: the self-join keys BOTH sides on l_orderkey — one
    shuffle each, co-partitioned — and per-order fan-out is bounded
    by the square of the order's line count (TPC-H: ≤ 7 lines, ≤ 21
    pairs), so the join output is a small constant multiple of the
    input at any corpus size. Pair counts aggregate with map-side
    combine at pair cardinality; the top-k is TakeOrdered with
    (part_a, part_b) tiebreaks.
    """
    return (
        _copurchase_pairs(spark, sf_dir)
        .withColumnRenamed("w", "n_orders")
        .orderBy(F.col("n_orders").desc(), F.col("part_a").asc(), F.col("part_b").asc())
        .limit(_TOP_PAIRS)
    )


_ORDER_PARTS_MEMO: dict[tuple[str, str], DataFrame] = {}
_COPURCHASE_MEMO: dict[tuple[str, str], DataFrame] = {}


def _distinct_order_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized, MATERIALIZED distinct (order, part) frame — the input
    every co-purchase-graph query starts from (pair mining, degree
    tables). Keyed on (applicationId, sf_dir) like the dup-cluster
    memo: within a session the fact scan + distinct shuffle are paid
    once, no matter how many graph queries run — exactly what a
    production pipeline does by materializing the edge list once and
    fanning analyses out from it."""
    key = (spark.sparkContext.applicationId, sf_dir)
    got = _ORDER_PARTS_MEMO.get(key)
    if got is None:
        got = (
            load_table(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_partkey")
            .distinct()
            .localCheckpoint(eager=True)
        )
        _ORDER_PARTS_MEMO[key] = got
    return got


def _copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE definition of the co-purchase pair build shared by
    orders_market_basket, part_pagerank, and the r7 Jaccard/triangle
    queries: distinct (order, part), orderkey-co-partitioned
    self-join with part_a < part_b, support count ``w`` per unordered
    pair. Memoized AND materialized per (applicationId, sf_dir): four
    registered queries consume this frame (market basket, PageRank,
    Jaccard, triangles), and each consumes it from ≥2 plan branches —
    without the shared checkpoint Spark re-runs the whole mining stage
    per branch per query (replicated unshared subtrees)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    got = _COPURCHASE_MEMO.get(key)
    if got is None:
        li = _distinct_order_parts(spark, sf_dir)
        a = li.alias("a")
        b = li.alias("b")
        got = (
            a.join(
                b,
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") < F.col("b.l_partkey")),
            )
            .select(F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b"))
            .groupBy("part_a", "part_b")
            .agg(F.count("*").alias("w"))
            .localCheckpoint(eager=True)
        )
        _COPURCHASE_MEMO[key] = got
    return got


# one definition of the money discipline — imported like the other
# sibling plan modules, so a precision change lands everywhere at once
from lakehouse_architecture_transaction_spark.plans.analytics import _REV  # noqa: E402

_SUM_REV = f"CAST(CAST(SUM({_REV}) AS DECIMAL(18,4)) AS DOUBLE)"


@register(
    "nation_yoy_growth",
    oracle=f"""
    WITH y AS (
        SELECT n.n_name AS nation,
               CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS year,
               {_SUM_REV} AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY n.n_name, CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER)
    )
    SELECT nation, year, revenue,
           LAG(revenue) OVER (PARTITION BY nation ORDER BY year ASC) AS prev_revenue,
           (revenue - LAG(revenue) OVER (PARTITION BY nation ORDER BY year ASC))
               / LAG(revenue) OVER (PARTITION BY nation ORDER BY year ASC) AS yoy_growth
    FROM y
    ORDER BY nation ASC, year ASC
    """,
)
def nation_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year supplier-nation revenue growth: the
    lag-over-aggregate reporting shape. One fact shuffle
    (orders↔lineitem), broadcast dims, then the lag window runs on
    the AGGREGATE (|nations|·|years| rows) — never on the fact table;
    growth is IEEE ops on the exact decimal-sum revenue."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    y = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("year"),
        )
        .agg(F.expr(f"SUM({_REV})").cast("decimal(18,4)").cast("double").alias("revenue"))
    )
    w = Window.partitionBy("nation").orderBy(F.col("year").asc())
    prev = F.lag("revenue").over(w)
    return (
        y.withColumn("prev_revenue", prev)
        .withColumn("yoy_growth", (F.col("revenue") - prev) / prev)
        .orderBy("nation", "year")
    )


_BOT_FACTOR = 1.2


@register(
    "events_bot_users",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id, COUNT(*) AS n_events,
               COUNT(DISTINCT CAST(ts AS DATE)) AS n_days
        FROM events GROUP BY user_id
    ),
    tot AS (
        SELECT CAST(SUM(n_events) AS BIGINT) AS total_events,
               CAST(SUM(n_days) AS BIGINT) AS total_days
        FROM per_user
    )
    SELECT user_id, n_events, n_days,
           CAST(n_events AS DOUBLE) / n_days AS events_per_day
    FROM per_user, tot
    WHERE CAST(n_events AS DOUBLE) / n_days >
          {_BOT_FACTOR} * (CAST(total_events AS DOUBLE) / total_days)
    ORDER BY user_id ASC
    """,
)
def events_bot_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot-rate flagging: users whose events-per-active-day exceeds 1.2× the corpus average — the traffic-cleaning filter ahead of any
    behavioral modeling. One user-keyed aggregate; the global average
    is a broadcast 1-row scalar (exact integer sums, one division per
    side of the comparison — both engines evaluate the identical IEEE
    expression)."""
    events = load_table(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.countDistinct(F.to_date("ts")).alias("n_days"),
    )
    tot = per_user.groupBy().agg(
        F.sum("n_events").cast("bigint").alias("total_events"),
        F.sum("n_days").cast("bigint").alias("total_days"),
    )
    epd = F.col("n_events").cast("double") / F.col("n_days")
    avg = F.col("total_events").cast("double") / F.col("total_days")
    return (
        per_user.crossJoin(F.broadcast(tot))
        .filter(epd > F.lit(_BOT_FACTOR) * avg)
        .select("user_id", "n_events", "n_days", epd.alias("events_per_day"))
        .orderBy("user_id")
    )


_PR_DAMPING, _PR_ITERS = 0.85, 10


def _pagerank_oracle() -> str:
    tele = repr(1.0 - _PR_DAMPING)
    d = repr(_PR_DAMPING)
    parts = [
        "op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)",
        """pe AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS w
        FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2)""",
        """e AS (SELECT part_a AS src, part_b AS dst, CAST(w AS DOUBLE) AS w FROM pe
             UNION ALL SELECT part_b, part_a, CAST(w AS DOUBLE) FROM pe)""",
        "ow AS (SELECT src, SUM(w) AS outw FROM e GROUP BY src)",
        "ee AS (SELECT e.src, e.dst, e.w, ow.outw FROM e JOIN ow USING (src))",
        "nodes AS (SELECT DISTINCT src AS node FROM e)",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "pr0 AS (SELECT node, 1.0 / nn.n AS pr FROM nodes CROSS JOIN nn)",
    ]
    for i in range(1, _PR_ITERS + 1):
        parts.append(
            f"""c{i} AS (
        SELECT ee.dst, CAST(floor(p.pr * ee.w / ee.outw * 1e9 + 0.5) AS BIGINT) AS c
        FROM ee JOIN pr{i - 1} p ON ee.src = p.node)"""
        )
        parts.append(
            f"""pr{i} AS (
        SELECT nodes.node,
               {tele} / nn.n + {d} * (CAST(coalesce(s.s, 0) AS DOUBLE) / 1e9) AS pr
        FROM nodes CROSS JOIN nn
        LEFT JOIN (SELECT dst, CAST(SUM(c) AS BIGINT) AS s FROM c{i} GROUP BY dst) s
            ON nodes.node = s.dst)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
    SELECT node AS part, pr AS pagerank FROM pr{_PR_ITERS}
    ORDER BY part ASC
    """
    )


@register("part_pagerank", oracle=_pagerank_oracle())
def part_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part importance by weighted PageRank over the co-purchase graph
    (operators/graph.py pagerank): nodes are parts, symmetric edges
    weighted by co-order support (the orders_market_basket pair
    build), 10 fixed rounds at damping 0.85 — the "which items anchor
    the catalog" centrality that raw co-occurrence counts miss
    (a part co-bought with other CENTRAL parts outranks one with the
    same support from peripheral partners). Every round is two narrow
    shuffles; the oracle replays all 10 rounds with the same
    quantized-exact contribution sums."""
    from lakehouse_architecture_transaction_spark.operators.graph import pagerank

    pe = _copurchase_pairs(spark, sf_dir)
    edges = pe.select("part_a", "part_b", "w").unionByName(
        pe.select(
            F.col("part_b").alias("part_a"), F.col("part_a").alias("part_b"), F.col("w")
        )
    )
    pr = pagerank(
        edges, src_col="part_a", dst_col="part_b", weight_col="w",
        damping=_PR_DAMPING, iters=_PR_ITERS,
    )
    return pr.select(F.col("node").alias("part"), "pagerank").orderBy("part")
