"""Round-8 registered queries: implemented + oracle-previewed during
round 7 (tests/test_oracle_parity.py), registered in round 8 inside
the ≤10/round rotation budget — the same queue discipline that carried
the round-6 queue into round 7 (plans/pipeline_ops4.py).

Each entry is a plain ``(spark, sf_dir) -> DataFrame`` plus its DuckDB
oracle string; the registration block at the bottom of this module
wraps them in ``register`` (VERDICT r7 next-round item 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_architecture_transaction_spark.catalog import load_table
from lakehouse_architecture_transaction_spark.functions.moments import sum_sq_dec
from lakehouse_architecture_transaction_spark.operators import dedup as D

# ------------------------------------------------------------------
# 1. docs_ngram_containment — asymmetric near-dup (quote/excerpt)
# ------------------------------------------------------------------

_CONT_THRESHOLD = 0.5


def _containment_oracle() -> str:
    from lakehouse_architecture_transaction_spark.plans.pipeline_ops import (
        _DOC_SHINGLES,
        _MAX_DF,
    )

    return f"""
    WITH {_DOC_SHINGLES},
    shf AS (
        SELECT doc_id, shingle FROM (
            SELECT doc_id, shingle, COUNT(*) OVER (PARTITION BY shingle) AS df FROM sh
        ) WHERE df <= {_MAX_DF}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shf GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
        FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(i AS DOUBLE) / CAST(sa.sz AS DOUBLE) AS containment_a,
           CAST(i AS DOUBLE) / CAST(sb.sz AS DOUBLE) AS containment_b
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE greatest(CAST(i AS DOUBLE) / CAST(sa.sz AS DOUBLE),
                   CAST(i AS DOUBLE) / CAST(sb.sz AS DOUBLE)) >= {_CONT_THRESHOLD}
    ORDER BY id_a ASC, id_b ASC
    """


DOCS_CONTAINMENT_ORACLE = _containment_oracle()


def docs_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle CONTAINMENT pairs (operators/dedup.py
    ngram_containment_pairs): |A∩B|/|A| and |A∩B|/|B| per candidate
    pair — catches a short doc wholly quoted inside a long one, which
    Jaccard scores near zero because the union is dominated by the
    long side (Broder's containment). Same capped shingle-join plan
    (and stop-shingle cut) as docs_ngram_jaccard_pairs; the threshold
    applies to the larger direction.

    Scale shape: identical to the Jaccard miner — shingle-keyed join
    (only docs sharing a shingle meet), df-capped hot shingles, sizes
    at doc cardinality."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return D.ngram_containment_pairs(
        docs, text_col="text", id_col="doc_id", n=3, threshold=_CONT_THRESHOLD, max_df=100
    ).orderBy("id_a", "id_b")


# ------------------------------------------------------------------
# 2. events_cusum_drift — sequential drift detection on daily volume
# ------------------------------------------------------------------

_CUSUM_TOP = 5  # worst drift days per event type

EVENTS_CUSUM_ORACLE = f"""
WITH daily AS (
    SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
),
r AS (
    SELECT *, COUNT(*) OVER (PARTITION BY event_type) AS nd,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n ASC, day ASC) AS rn
    FROM daily
),
m AS (
    SELECT *, MAX(CASE WHEN rn = CAST(ceil(CAST(nd AS DOUBLE) / 2) AS BIGINT) THEN n END)
                  OVER (PARTITION BY event_type) AS med
    FROM r
),
c AS (
    SELECT event_type, day, n, med,
           CAST(SUM(n - med) OVER (PARTITION BY event_type ORDER BY day ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cusum
    FROM m
)
SELECT event_type, day, n AS n_events, med, cusum, CAST(drift_rank AS INTEGER) AS drift_rank
FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                  ORDER BY abs(cusum) DESC, day ASC) AS drift_rank
    FROM c
) WHERE drift_rank <= {_CUSUM_TOP}
ORDER BY event_type ASC, drift_rank ASC
"""


def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential drift detection on daily event volume: the running
    sum of deviations from the per-type MEDIAN (lower-median rank
    selection, same exact-BIGINT machinery as events_mad_anomalies)
    accumulates SUSTAINED level shifts — a 10%% volume drop that
    never trips a per-day anomaly test keeps growing the CUSUM. The
    page-test complement to the pointwise z-score (A48) and MAD (L79)
    detectors. Output: the top-{top} |CUSUM| days per type (rank, not
    a fixed threshold — a threshold K·median flags nothing once daily
    counts concentrate at larger corpora, and a 0-row result is a
    hollow correctness check); every boundary value is an exact
    BIGINT.

    Scale shape: daily aggregate (map-side combined), then three
    event_type-partitioned windows at days×types cardinality — the
    cumulative window never touches raw events.""".format(top=_CUSUM_TOP)
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").cast("bigint").alias("n"))
    wc = Window.partitionBy("event_type")
    wn = Window.partitionBy("event_type").orderBy(F.col("n").asc(), F.col("day").asc())
    med = (
        daily.withColumn("__nd", F.count("*").over(wc))
        .withColumn("__rn", F.row_number().over(wn))
        .withColumn(
            "med",
            F.max(F.when(F.col("__rn") == F.ceil(F.col("__nd") / 2), F.col("n"))).over(wc),
        )
    )
    wd = (
        Window.partitionBy("event_type")
        .orderBy(F.col("day").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = med.withColumn("cusum", F.sum(F.col("n") - F.col("med")).over(wd).cast("bigint"))
    wr = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum")).desc(), F.col("day").asc()
    )
    return (
        c.withColumn("drift_rank", F.row_number().over(wr))
        .filter(F.col("drift_rank") <= _CUSUM_TOP)
        .select(
            "event_type",
            F.col("day").cast("timestamp_ntz").alias("day"),
            F.col("n").alias("n_events"),
            "med",
            "cusum",
            F.col("drift_rank").cast("int").alias("drift_rank"),
        )
        .orderBy("event_type", "drift_rank")
    )


# ------------------------------------------------------------------
# 3. part_supplier_hhi — supply-concentration audit
# ------------------------------------------------------------------

_HHI_TOP = 50

PART_HHI_ORACLE = f"""
WITH q AS (
    SELECT l_partkey, l_suppkey,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS BIGINT) AS qty
    FROM lineitem GROUP BY 1, 2
),
p AS (
    SELECT l_partkey,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(SUM(qty) AS BIGINT) AS total_qty,
           SUM(CAST(qty AS HUGEINT) * CAST(qty AS HUGEINT)) AS sq
    FROM q GROUP BY 1
)
SELECT l_partkey, n_suppliers, total_qty,
       CAST(sq AS DOUBLE) / (CAST(total_qty AS DOUBLE) * CAST(total_qty AS DOUBLE)) AS hhi
FROM p WHERE n_suppliers >= 2
ORDER BY hhi DESC, l_partkey ASC
LIMIT {_HHI_TOP}
"""


def part_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-concentration audit: the Herfindahl–Hirschman index of
    supplier quantity shares per part (Σ share² — the antitrust/
    supply-chain concentration metric, and the same algebraic family
    as docs_char_diversity's Simpson index). Parts with ≥2 suppliers
    ranked by concentration: HHI → 1 means one supplier dominates a
    nominally multi-sourced part — the procurement-risk flag.
    Quantities are integral, so the DECIMAL→BIGINT boundary is exact;
    HHI is one fixed double chain over exact sums. Σqty² accumulates
    in DECIMAL(38,0), not int64 (r13 moment-discipline sweep): a
    30%-hot l_partkey at corpus scale pushes one (part, supplier)
    qty past ~3e9, whose square exits 64 bits — the exact
    customer_order_value_cv class the skew probe crashed in r12; the
    oracle mirrors with HUGEINT.

    Scale shape: two map-side-combined aggregates — (part, supplier)
    then part — and a TakeOrdered top-k. Nothing wider than the
    (part, supplier) frame ever shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    q = li.groupBy("l_partkey", "l_suppkey").agg(
        F.expr("SUM(CAST(l_quantity AS DECIMAL(18,2)))")
        .cast("decimal(18,2)")
        .cast("bigint")
        .alias("qty")
    )
    p = q.groupBy("l_partkey").agg(
        F.count("*").cast("bigint").alias("n_suppliers"),
        F.sum("qty").cast("bigint").alias("total_qty"),
        sum_sq_dec(F.col("qty")).alias("sq"),
    )
    tot = F.col("total_qty").cast("double")
    return (
        p.filter(F.col("n_suppliers") >= 2)
        .select(
            "l_partkey",
            "n_suppliers",
            "total_qty",
            (F.col("sq").cast("double") / (tot * tot)).alias("hhi"),
        )
        .orderBy(F.col("hhi").desc(), F.col("l_partkey").asc())
        .limit(_HHI_TOP)
    )


# ------------------------------------------------------------------
# 4. emb_ivf_cell_balance — IVF index balance audit
# ------------------------------------------------------------------


def _ivf_balance_oracle() -> str:
    from lakehouse_architecture_transaction_spark.plans.pipeline_ops import (
        _IVF_CELLS,
        _IVF_ITERS,
        _km_assign_sql,
        _km_update_sql,
    )

    parts = [
        f"""c0 AS (
        SELECT CAST(vec_id AS INTEGER) AS cluster,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
        FROM embeddings WHERE vec_id < {_IVF_CELLS})"""
    ]
    for i in range(_IVF_ITERS):
        parts.append(f"a{i + 1} AS {_km_assign_sql(f'c{i}')}")
        parts.append(f"c{i + 1} AS {_km_update_sql(f'a{i + 1}')}")
    parts.append(f"fin AS {_km_assign_sql(f'c{_IVF_ITERS}')}")
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
    cells AS (
        SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n FROM fin GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM cells)
    SELECT CAST(cluster AS INTEGER) AS cell, n AS n_vectors,
           CAST(n AS DOUBLE) / total AS share,
           CAST(n AS DOUBLE) * {_IVF_CELLS} / total AS imbalance
    FROM cells CROSS JOIN tot
    ORDER BY cell ASC"""
    )


EMB_IVF_BALANCE_ORACLE = _ivf_balance_oracle()


def emb_ivf_cell_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index balance audit: per-cell vector counts, corpus share,
    and the imbalance factor n·k/N (1.0 = perfectly balanced; ≫1 =
    a hot cell that makes every probe of it scan far more than N/k
    vectors — the FAISS imbalance_factor retrain trigger, the
    companion to emb_pq_reconstruction_error's code-quality audit).
    Consumes the SAME served index as the search paths (session memo
    or persisted store). Counts are exact BIGINTs; share/imbalance
    are fixed double chains.

    Scale shape: one cell-cardinality aggregate over the clustered
    corpus + a broadcast 1-row total."""
    from lakehouse_architecture_transaction_spark.plans.pipeline_ops import (
        _IVF_CELLS,
        _ivf_index,
    )

    _cent, corpus = _ivf_index(spark, sf_dir)
    cells = corpus.groupBy(F.col("__cell").alias("cell")).agg(
        F.count("*").cast("bigint").alias("n_vectors")
    )
    tot = cells.agg(F.sum("n_vectors").cast("bigint").alias("total"))
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            F.col("cell").cast("int").alias("cell"),
            "n_vectors",
            (F.col("n_vectors").cast("double") / F.col("total")).alias("share"),
            (F.col("n_vectors").cast("double") * _IVF_CELLS / F.col("total")).alias("imbalance"),
        )
        .orderBy("cell")
    )


# ------------------------------------------------------------------
# 5. orders_backlog_daily — interval stabbing via delta cumsum
# ------------------------------------------------------------------

ORDERS_BACKLOG_ORACLE = """
WITH span AS (
    SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS start_day,
           CAST(MAX(l.l_shipdate) + INTERVAL 1 DAY AS DATE) AS end_day
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
),
deltas AS (
    SELECT day, CAST(SUM(d) AS BIGINT) AS delta FROM (
        SELECT start_day AS day, 1 AS d FROM span
        UNION ALL
        SELECT end_day AS day, -1 AS d FROM span
    ) GROUP BY 1
)
SELECT CAST(day AS TIMESTAMP) AS day, delta,
       CAST(SUM(delta) OVER (ORDER BY day ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS backlog
FROM deltas
ORDER BY day ASC
"""


def orders_backlog_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily open-order backlog (orders placed but not yet fully
    shipped) — the interval-stabbing time series computed WITHOUT a
    day × order join: each order contributes +1 at its order date and
    −1 the day after its last shipment, deltas aggregate at day
    cardinality, and the running sum turns deltas into the backlog
    level. The classic sweep-line rewrite that makes "how many
    intervals cover each day" linear in orders instead of
    days × orders.

    The cumulative sum runs through exact_global_cumsum's bucketed
    prefixes (operators/ranking.py) keyed on the epoch-day number —
    no single-partition global window even though the day axis is
    calendar-bounded; deltas and backlog are exact BIGINTs.

    Scale shape: per-order span aggregate (orderkey-keyed), day
    aggregate (map-side combined), then the bucketed-prefix cumsum at
    day cardinality."""
    from lakehouse_architecture_transaction_spark.operators.ranking import exact_global_cumsum

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    span = (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", F.to_date("o_orderdate").alias("start_day"))
        .agg(F.date_add(F.to_date(F.max("l_shipdate")), 1).alias("end_day"))
    )
    deltas = (
        span.select(F.col("start_day").alias("day"), F.lit(1).alias("d"))
        .unionByName(span.select(F.col("end_day").alias("day"), F.lit(-1).alias("d")))
        .groupBy("day")
        .agg(F.sum("d").cast("bigint").alias("delta"))
        .withColumn("day_num", F.datediff(F.col("day"), F.lit("1970-01-01")).cast("long"))
    )
    cum = exact_global_cumsum(
        deltas, value_col="day_num", sum_col="delta", tiebreakers=["day_num"], cum_col="backlog"
    )
    return (
        cum.select(
            F.col("day").cast("timestamp_ntz").alias("day"),
            "delta",
            F.col("backlog").cast("bigint").alias("backlog"),
        )
        .orderBy("day")
    )


# ------------------------------------------------------------------
# 6. events_stream_hourly — the STREAMING pipeline, driver-checkable
# ------------------------------------------------------------------

_STREAM_SRC_MEMO: dict[tuple[str, str], str] = {}


def _stream_events_src(spark: SparkSession, sf_dir: str) -> str:
    """Stage (once per app+sf_dir) the events table as an 8-file
    parquet landing zone for the file-source streams."""
    import atexit
    import shutil
    import tempfile

    key = (spark.sparkContext.applicationId, sf_dir)
    src = _STREAM_SRC_MEMO.get(key)
    if src is None:
        src = tempfile.mkdtemp(prefix="lakehouse_architecture_transaction_stream_events_")
        atexit.register(shutil.rmtree, src, ignore_errors=True)
        load_table(spark, sf_dir, "events").repartition(8).write.mode("overwrite").parquet(src)
        _STREAM_SRC_MEMO[key] = src
    return src

EVENTS_STREAM_HOURLY_ORACLE = """
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY hour_start ASC, event_type ASC
"""


def events_stream_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL Structured Streaming pipeline (streaming/pipeline.py
    read_event_stream → hourly_stream_agg), executed as a bounded
    availableNow run and returned as a DataFrame — which makes the
    streaming path itself a driver-checkable, oracle-hashed query
    surface instead of a tests-only component. Complete output mode
    makes the bounded run batch-equivalent BY SEMANTICS: the memory
    sink holds every (window, type) group at stream end, and in
    complete mode the watermark neither evicts state nor drops late
    rows — so the staged files' arbitrary event-time order (8-way
    repartitioned landing zone, maxFilesPerTrigger=4 → multiple
    micro-batches with heavy cross-batch 'lateness') cannot change
    the result. The oracle states the plain batch aggregate.

    Scale shape: identical to the batch twin (map-side-combined
    (window, type) aggregate); state is (windows × types), bounded in
    production by the watermark (append mode) — complete mode here is
    the bounded-run harness, not the 100 TB deployment mode."""
    import uuid

    from lakehouse_architecture_transaction_spark.streaming.pipeline import (
        gate_state_partitions,
        hourly_stream_agg,
        read_event_stream,
    )

    src = _stream_events_src(spark, sf_dir)
    name = f"stream_hourly_{uuid.uuid4().hex[:8]}"
    with gate_state_partitions(spark):
        q = (
            hourly_stream_agg(read_event_stream(spark, src))
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    out = (
        spark.table(name)
        .select(
            F.col("hour_start").cast("timestamp_ntz").alias("hour_start"),
            "event_type",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.col("total_value").cast("decimal(18,2)").cast("double").alias("total_value"),
        )
        .orderBy("hour_start", "event_type")
        .localCheckpoint(eager=True)
    )
    spark.catalog.dropTempView(name)
    return out


# ------------------------------------------------------------------
# 7. events_stream_trending — sliding-window streaming top-k
# ------------------------------------------------------------------

_TREND_K = 3

EVENTS_STREAM_TRENDING_ORACLE = f"""
WITH w AS (
    SELECT time_bucket(INTERVAL '30 minutes', ts) AS t30, event_type FROM events
),
e AS (
    SELECT t30 AS window_start, event_type FROM w
    UNION ALL
    SELECT t30 - INTERVAL '30 minutes' AS window_start, event_type FROM w
),
c AS (
    SELECT window_start, event_type, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM e GROUP BY 1, 2
),
r AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start
                  ORDER BY n_events DESC, event_type ASC) AS rank
    FROM c
)
SELECT CAST(window_start AS TIMESTAMP) AS window_start,
       CAST(rank AS INTEGER) AS rank, event_type, n_events
FROM r WHERE rank <= {_TREND_K}
ORDER BY window_start ASC, rank ASC
"""


def events_stream_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trending-feed STREAMING pipeline (streaming/pipeline.py
    sliding_stream_counts → top_k_per_window): 1-hour windows sliding
    every 30 minutes over the bounded availableNow stream (complete
    mode — batch-equivalent, see events_stream_hourly), then the
    deterministic per-window top-k rank applied to the drained sink
    exactly as the foreachBatch serving layer would. The oracle
    derives the same sliding windows arithmetically (each event lands
    in exactly window/slide = 2 windows, starts aligned to the
    30-minute epoch grid — Spark's F.window origin).

    Scale shape: the stream aggregate is (windows × types) with
    map-side combine (each event expands to 2 window rows); the rank
    window runs at that aggregate cardinality."""
    import uuid

    from lakehouse_architecture_transaction_spark.streaming.pipeline import (
        gate_state_partitions,
        read_event_stream,
        sliding_stream_counts,
        top_k_per_window,
    )

    src = _stream_events_src(spark, sf_dir)
    name = f"stream_trending_{uuid.uuid4().hex[:8]}"
    with gate_state_partitions(spark):
        q = (
            sliding_stream_counts(read_event_stream(spark, src))
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    out = (
        top_k_per_window(spark.table(name), k=_TREND_K)
        .select(
            F.col("window_start").cast("timestamp_ntz").alias("window_start"),
            "rank",
            "event_type",
            F.col("n_events").cast("bigint").alias("n_events"),
        )
        .orderBy("window_start", "rank")
        .localCheckpoint(eager=True)
    )
    spark.catalog.dropTempView(name)
    return out


# ------------------------------------------------------------------
# 8. nation_flow_matrix — full bilateral trade matrix (Q7 generalized)
# ------------------------------------------------------------------

_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"
_SUM_REV = f"CAST(CAST(SUM({_REV}) AS DECIMAL(18,4)) AS DOUBLE)"

NATION_FLOW_ORACLE = f"""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems,
       {_SUM_REV} AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
JOIN nation nc ON c.c_nationkey = nc.n_nationkey
GROUP BY 1, 2
ORDER BY supp_nation ASC, cust_nation ASC
"""


def nation_flow_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL bilateral trade matrix — TPC-H Q7 generalized from one
    nation pair to all 25×25 (supp_nation, cust_nation) flows: revenue
    and lineitem count per ordered pair, the origin-destination table
    every logistics/market dashboard draws. Exact-decimal money
    discipline (same _REV/_SUM_REV constants as the Q7/YoY plans).

    Scale shape: fact-fact join on orderkey, then THREE broadcast
    dims (customer is the only non-broadcast side at real scale —
    its join shuffles on custkey at order cardinality); the final
    aggregate is 625 rows with map-side combine."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("sk"),
        )
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))),
            F.col("c_nationkey") == F.col("ck"),
        )
        .groupBy("supp_nation", "cust_nation")
        .agg(
            F.count("*").cast("bigint").alias("n_lineitems"),
            F.expr(f"SUM({_REV})").cast("decimal(18,4)").cast("double").alias("revenue"),
        )
        .orderBy("supp_nation", "cust_nation")
    )


# ------------------------------------------------------------------
# Round-8 registration (the ≤10/round rotation budget, VERDICT r7
# item 1): the eight queries above enter the driver-checked registry;
# the two remaining budget slots go to the r9 streaming companions
# events_stream_sessions / events_stream_dedup (plans/queued_r9.py),
# giving the STREAMING family its first driver-green rows.
# ------------------------------------------------------------------

from lakehouse_architecture_transaction_spark.plans.registry import register  # noqa: E402

register("docs_ngram_containment", oracle=DOCS_CONTAINMENT_ORACLE)(docs_ngram_containment)
register("events_cusum_drift", oracle=EVENTS_CUSUM_ORACLE)(events_cusum_drift)
register("part_supplier_hhi", oracle=PART_HHI_ORACLE)(part_supplier_hhi)
register("emb_ivf_cell_balance", oracle=EMB_IVF_BALANCE_ORACLE)(emb_ivf_cell_balance)
register("orders_backlog_daily", oracle=ORDERS_BACKLOG_ORACLE)(orders_backlog_daily)
register("nation_flow_matrix", oracle=NATION_FLOW_ORACLE)(nation_flow_matrix)
register("events_stream_hourly", oracle=EVENTS_STREAM_HOURLY_ORACLE)(events_stream_hourly)
register("events_stream_trending", oracle=EVENTS_STREAM_TRENDING_ORACLE)(events_stream_trending)
