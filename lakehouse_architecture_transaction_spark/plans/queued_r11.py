"""Queued round-11 registrations: evaluation, attribution, lifecycle.

- lineitem_shipdelay_trend — per-nation OLS trend of shipping delay
  over order date (operators/timeseries.py grouped_linreg): the
  is-fulfilment-degrading drift detector.
- customer_survival_curve — customer-lifetime survival function (the
  retention curve every subscription/commerce analyst draws).
- events_touch_attribution — first/last-touch multi-touch attribution
  in exact half-credit units over the hour before each purchase.
- docs_langid_confusion — confusion matrix of the lexicon language-ID
  prediction vs the labeled lang column: the model-eval op for any
  classifier-derived corpus column.
- emb_pair_sim_histogram — cosine-similarity histograms of LSH
  same-bucket pairs vs a deterministic shifted-pair baseline: the
  does-my-bucketing-actually-concentrate-similarity QA.
- orders_gdpr_erasure_audit — right-to-be-forgotten lifecycle on a
  versioned LakeTable: copy-on-write erasure of the heaviest
  customer, CDF shows exactly the victim's rows deleted and nothing
  else (reference parity: the storage layer the reference delegates
  to Delta MERGE/DELETE, scripts/glue/script.py:204-227).
- orders_benford_audit — first-digit Benford deviation per digit
  (constants embedded once from Python, no runtime log).
- docs_bpe_merges — the trained BPE merge table (rows-only: the
  iterative argmax is not SQL-expressible; python-reference-pinned).

All oracle-backed entries previewed cell-exact at sf0.001/0.01/0.1
(tests/test_oracle_parity.py) and every entry degenerate-input pinned
(tests/test_empty_inputs.py).
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_architecture_transaction_spark.catalog import load_table
from lakehouse_architecture_transaction_spark.lakehouse.table import LakeTable

# ------------------------------------------------------------------
# 1. lineitem_shipdelay_trend — per-nation OLS delay drift
# ------------------------------------------------------------------

#: x = days since the dataset's first order year, NOT 1970 — keeps
#: per-group n·Σx² inside int64 through bench scales (see
#: grouped_linreg's exactness bound).
_TREND_EPOCH = "1995-01-01"

LINEITEM_SHIPDELAY_TREND_ORACLE = f"""
WITH pts AS (
    SELECT n.n_name,
           date_diff('day', DATE '{_TREND_EPOCH}', CAST(o.o_orderdate AS DATE)) AS x,
           date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) AS y
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
),
m AS (
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
    FROM pts GROUP BY 1
),
sl AS (
    SELECT *, CASE WHEN n_points >= 2 AND n_points * sxx - sx * sx > 0
                   THEN CAST(n_points * sxy - sx * sy AS DOUBLE)
                        / CAST(n_points * sxx - sx * sx AS DOUBLE) END AS slope
    FROM m
)
SELECT n_name, n_points, slope,
       CASE WHEN slope IS NOT NULL
            THEN (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / CAST(n_points AS DOUBLE)
            END AS intercept
FROM sl
ORDER BY n_name ASC
"""


def lineitem_shipdelay_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier-nation shipping-delay trend (operators/timeseries.py
    grouped_linreg): OLS slope/intercept of delay-in-days (l_shipdate −
    o_orderdate) against order date, per nation — the fulfilment-drift
    detector (slope in delay-days per calendar day; a positive slope
    is a supply chain getting slower). Both coordinates are exact day
    integers; x counts from {epoch} so per-group moments stay far
    inside int64; the slope/intercept chain is engine-replayable.

    Scale shape: ONE fact-fact equi-join (lineitem⋈orders on orderkey
    — the shuffle every delay metric pays), broadcast supplier/nation
    dims, then a single map-side-combinable moment aggregate at
    NATION cardinality. No windows, no per-group sorting.""".format(
        epoch=_TREND_EPOCH
    )
    from lakehouse_architecture_transaction_spark.operators.timeseries import grouped_linreg

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pts = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .select(
            "n_name",
            F.datediff(
                F.col("o_orderdate").cast("date"), F.to_date(F.lit(_TREND_EPOCH))
            ).alias("x"),
            F.datediff(
                F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
            ).alias("y"),
        )
    )
    return grouped_linreg(pts, ["n_name"], "x", "y").orderBy("n_name")


# ------------------------------------------------------------------
# 2. customer_survival_curve — lifetime survival function
# ------------------------------------------------------------------

_SURV_MAX_MONTHS = 12

CUSTOMER_SURVIVAL_ORACLE = f"""
WITH span AS (
    SELECT o_custkey,
           date_diff('day', MIN(CAST(o_orderdate AS DATE)), MAX(CAST(o_orderdate AS DATE))) // 30
               AS life_months
    FROM orders GROUP BY 1
),
tot AS (SELECT CAST(COUNT(life_months) AS BIGINT) AS n_total FROM span),
k AS (SELECT unnest(generate_series(0, {_SURV_MAX_MONTHS})) AS months),
surv AS (
    SELECT k.months, CAST(COUNT(s.o_custkey) AS BIGINT) AS n_surviving
    FROM k LEFT JOIN span s ON s.life_months >= k.months
    GROUP BY 1
)
SELECT CAST(months AS BIGINT) AS months, n_surviving,
       CASE WHEN n_total = 0 THEN 0.0
            ELSE CAST(n_surviving AS DOUBLE) / CAST(n_total AS DOUBLE) END AS survival_frac
FROM surv, tot
ORDER BY months ASC
"""


def _survival_curve_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 13-point (months, n_surviving) curve BEFORE the 13-row
    checkpoint — split out so tests can pin the LAZY plan: the
    >= theta join must broadcast the month-cardinality lifetime
    histogram, never the per-customer span frame (see
    customer_survival_curve's scale-shape note)."""
    orders = load_table(spark, sf_dir, "orders")
    span = orders.groupBy("o_custkey").agg(
        (
            F.datediff(
                F.max(F.col("o_orderdate").cast("date")), F.min(F.col("o_orderdate").cast("date"))
            )
            .cast("long")
            / F.lit(30)
        )
        .cast("long")
        .alias("life_months")
    )
    # month-cardinality histogram: the one frame the theta join sees
    hist = span.groupBy("life_months").agg(F.count("*").cast("bigint").alias("__n"))
    ks = spark.range(0, _SURV_MAX_MONTHS + 1).select(F.col("id").cast("long").alias("months"))
    return (
        ks.join(F.broadcast(hist), hist["life_months"] >= ks["months"], "left")
        .groupBy("months")
        .agg(F.coalesce(F.sum("__n"), F.lit(0)).cast("bigint").alias("n_surviving"))
    )


def customer_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-lifetime survival curve: for k = 0..{m} months, how
    many customers' observed lifetime (days between first and last
    order, floored to 30-day months) reaches k, and the surviving
    fraction — the retention curve drawn from customer_order_span's
    raw spans. Exact integer lifetimes, one division per point. The
    denominator is customers with an OBSERVABLE lifetime (non-null
    order dates — oracle COUNT(life_months), Spark's months==0 row);
    both engines exclude null-lifetime customers by the same
    definition, so the parity does not lean on TPC-H's non-null
    o_orderdate.

    Scale shape: the span aggregate runs at customer cardinality
    (map-side combined), then collapses to a LIFETIME HISTOGRAM at
    distinct-month cardinality (≤ a few hundred rows at any corpus
    size) BEFORE the ≥-theta join against the 13-point curve — the
    theta join is tiny × tiny. The first cut of this plan joined the
    13 k-points to the per-CUSTOMER span frame directly: Spark plans
    a non-equi left join as BroadcastNestedLoopJoin building the
    RIGHT side, i.e. it broadcast customer-cardinality rows — fine at
    sf0.1, an OOM at 100 TB (caught by plan inspection ahead of the
    r11 registration; pinned by test_plans).""".format(m=_SURV_MAX_MONTHS)
    surv = _survival_curve_points(spark, sf_dir).localCheckpoint(eager=True)
    tot = surv.filter(F.col("months") == 0).select(F.col("n_surviving").alias("n_total"))
    return (
        surv.crossJoin(F.broadcast(tot))
        .select(
            "months",
            "n_surviving",
            F.when(F.col("n_total") == 0, F.lit(0.0))
            .otherwise(F.col("n_surviving").cast("double") / F.col("n_total").cast("double"))
            .alias("survival_frac"),
        )
        .orderBy("months")
    )


# ------------------------------------------------------------------
# 3. events_touch_attribution — first/last-touch half-credit units
# ------------------------------------------------------------------

EVENTS_TOUCH_ATTRIBUTION_ORACLE = """
WITH p AS (
    SELECT event_id AS p_id, user_id, ts AS p_ts FROM events WHERE event_type = 'purchase'
),
t AS (
    SELECT user_id, event_id AS t_id, event_type AS t_type, ts AS t_ts
    FROM events WHERE event_type <> 'purchase'
),
w AS (
    SELECT p.p_id, t.t_id, t.t_type, t.t_ts
    FROM p JOIN t ON p.user_id = t.user_id
     AND t.t_ts BETWEEN p.p_ts - INTERVAL 1 HOUR AND p.p_ts
),
r AS (
    SELECT *,
           ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY t_ts ASC, t_id ASC) AS rf,
           ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY t_ts DESC, t_id DESC) AS rl
    FROM w
),
credits AS (
    SELECT t_type, SUM(CASE WHEN rf = 1 THEN 1 ELSE 0 END) AS n_first,
           SUM(CASE WHEN rl = 1 THEN 1 ELSE 0 END) AS n_last
    FROM r GROUP BY 1
)
SELECT t_type AS event_type,
       CAST(n_first AS BIGINT) AS n_first,
       CAST(n_last AS BIGINT) AS n_last,
       CAST(n_first + n_last AS DOUBLE) / 2.0 AS credit
FROM credits
ORDER BY event_type ASC
"""


def events_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last-touch multi-touch attribution: for each purchase,
    the non-purchase events of the same user in the preceding hour are
    its touchpoints; the FIRST touch (position-based "introducer") and
    the LAST touch ("closer") each earn half a conversion credit —
    a single-touch window earns both halves. Credits are exact
    half-units (integer first/last counts, ONE division by 2.0), so
    the oracle replays them bit-for-bit — the reason this is first/
    last rather than U-shaped: fractional middle credits 0.2/(n−2)
    would force order-dependent double sums across the engine
    boundary. Ties on ts break by event_id in BOTH directions.

    Scale shape: the pair space comes from the bucketed interval join
    (operators/interval.py — shuffle keyed by (user, time-bucket),
    never per-user history); the two rank windows run per purchase at
    window-pair cardinality; the credit aggregate is map-side
    combinable at event-type cardinality."""
    from lakehouse_architecture_transaction_spark.operators.interval import (
        bucketed_interval_join,
    )

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), F.col("user_id"), F.col("ts")
    )
    touches = ev.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("t_user"),
        F.col("event_id").alias("t_id"),
        F.col("event_type").alias("t_type"),
        F.col("ts").alias("t_ts"),
    )
    pairs = bucketed_interval_join(
        purchases,
        touches,
        left_ts="ts",
        right_ts="t_ts",
        lower_seconds=-3600,
        upper_seconds=0,
        on=[("user_id", "t_user")],
    )
    wf = Window.partitionBy("p_id").orderBy(F.col("t_ts").asc(), F.col("t_id").asc())
    wl = Window.partitionBy("p_id").orderBy(F.col("t_ts").desc(), F.col("t_id").desc())
    ranked = pairs.withColumn("rf", F.row_number().over(wf)).withColumn(
        "rl", F.row_number().over(wl)
    )
    credits = ranked.groupBy("t_type").agg(
        F.sum(F.when(F.col("rf") == 1, 1).otherwise(0)).cast("bigint").alias("n_first"),
        F.sum(F.when(F.col("rl") == 1, 1).otherwise(0)).cast("bigint").alias("n_last"),
    )
    return credits.select(
        F.col("t_type").alias("event_type"),
        "n_first",
        "n_last",
        ((F.col("n_first") + F.col("n_last")).cast("double") / F.lit(2.0)).alias("credit"),
    ).orderBy("event_type")


# ------------------------------------------------------------------
# 4. docs_langid_confusion — language-ID confusion matrix
# ------------------------------------------------------------------


def _langid_confusion_oracle() -> str:
    from lakehouse_architecture_transaction_spark.plans.pipeline_ops import (
        _TOKENS,
        _lex_values,
    )

    return f"""
    WITH lex(lang_guess, word) AS ({_lex_values()}),
    tok AS (SELECT doc_id, lower(unnest({_TOKENS})) AS word FROM documents),
    hits AS (
        SELECT doc_id, lang_guess, COUNT(*) AS hits
        FROM tok JOIN lex USING (word) GROUP BY 1, 2
    ),
    best AS (
        SELECT doc_id, lang_guess FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang_guess ASC) AS rn
            FROM hits
        ) WHERE rn = 1
    ),
    cm AS (
        SELECT d.lang, COALESCE(b.lang_guess, 'und') AS lang_guess,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id
        GROUP BY 1, 2
    ),
    tot AS (SELECT lang, SUM(n_docs) AS n_lang FROM cm GROUP BY 1)
    SELECT cm.lang AS lang, cm.lang_guess AS lang_guess, cm.n_docs AS n_docs,
           CAST(cm.n_docs AS DOUBLE) / CAST(t.n_lang AS DOUBLE) AS row_share
    FROM cm JOIN tot t ON cm.lang = t.lang
    ORDER BY lang ASC, lang_guess ASC
    """


DOCS_LANGID_CONFUSION_ORACLE = _langid_confusion_oracle()


def docs_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the lexicon language-ID prediction (L10,
    operators/text.py lang_id) against the corpus's labeled ``lang``
    column: (true lang, predicted lang, doc count, row-normalized
    share). The model-evaluation surface for ANY classifier-derived
    corpus column — langid here, quality or toxicity scores by the
    same pattern — read before trusting the predicted column for
    filtering decisions. The diagonal shares are per-class recall.

    Scale shape: the prediction reuses the langid plan (broadcast
    lexicon join + per-doc argmax); the matrix aggregate runs at
    langs² cardinality; the per-true-lang totals are a re-aggregation
    of the localCheckpoint-ed matrix frame (2 consuming branches),
    never a second corpus scan."""
    from lakehouse_architecture_transaction_spark.operators.text import lang_id

    docs = load_table(spark, sf_dir, "documents", spread=True)
    pred = lang_id(spark, docs, id_col="doc_id", text_col="text").select(
        "doc_id", "lang_guess"
    )
    cm = (
        docs.select("doc_id", "lang")
        .join(pred, "doc_id", "left")
        .groupBy("lang", F.coalesce(F.col("lang_guess"), F.lit("und")).alias("lang_guess"))
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .localCheckpoint(eager=True)
    )
    tot = cm.groupBy("lang").agg(F.sum("n_docs").alias("__n_lang"))
    return (
        cm.join(F.broadcast(tot), "lang")
        .select(
            "lang",
            "lang_guess",
            "n_docs",
            (F.col("n_docs").cast("double") / F.col("__n_lang").cast("double")).alias(
                "row_share"
            ),
        )
        .orderBy("lang", "lang_guess")
    )


# ------------------------------------------------------------------
# 5. emb_pair_sim_histogram — bucket pairs vs shifted-pair baseline
# ------------------------------------------------------------------

_HIST_BITS = 4
_HIST_CAP = 24


def _pair_hist_oracle() -> str:
    from lakehouse_architecture_transaction_spark.plans.pipeline_ops import (
        _DOT_FOLD,
        _N2_FOLD,
    )

    return f"""
    WITH b0 AS (
        SELECT vec_id, embedding,
               array_to_string(list_transform(embedding[1:{_HIST_BITS}],
                   x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS bkt,
               {_N2_FOLD} AS n2
        FROM embeddings
    ),
    b AS (
        SELECT vec_id, embedding, bkt, n2 FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY bkt ORDER BY vec_id ASC) AS bn FROM b0
        ) WHERE bn <= {_HIST_CAP}
    ),
    bucket_cos AS (
        SELECT {_DOT_FOLD} / (sqrt(q.n2) * sqrt(c.n2)) AS cosine
        FROM b q JOIN b c ON q.bkt = c.bkt AND q.vec_id < c.vec_id
    ),
    d AS (SELECT (MAX(vec_id) + 1) // 2 AS shift FROM embeddings),
    e AS (SELECT vec_id, embedding, {_N2_FOLD} AS n2 FROM embeddings),
    shifted_cos AS (
        SELECT {_DOT_FOLD} / (sqrt(q.n2) * sqrt(c.n2)) AS cosine
        FROM e q JOIN e c ON c.vec_id = q.vec_id + (SELECT shift FROM d)
    ),
    u AS (
        SELECT 'lsh_bucket' AS population, cosine FROM bucket_cos
        UNION ALL
        SELECT 'shifted' AS population, cosine FROM shifted_cos
    )
    SELECT population, CAST(floor(cosine * 10) AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM u GROUP BY 1, 2
    ORDER BY population ASC, bin ASC
    """


EMB_PAIR_SIM_HISTOGRAM_ORACLE = _pair_hist_oracle()


def emb_pair_sim_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine-similarity histograms (bin width 0.1) for two pair
    populations: same-sign-LSH-bucket pairs (the dedup/ANN candidate
    generator's output, capped per bucket) vs a deterministic
    structure-free baseline (each vector paired with the one
    max_id/2 ids away). If bucketing works, the bucket histogram
    sits visibly right of the baseline — the
    does-my-candidate-generator-actually-concentrate-similarity QA
    that should be read before trusting any LSH recall number.
    Cosines are the shared deterministic double fold, so bin edges
    cannot flake across engines.

    Scale shape: bucket pairs come from the one shared capped pair
    miner (never all-pairs); the baseline is an id-shifted self-join
    (one shuffle at corpus cardinality); histograms aggregate at
    population×21-bin cardinality with map-side combine."""
    from lakehouse_architecture_transaction_spark.operators.similarity import (
        cosine_dup_pairs,
        dot_expr,
        norm2_expr,
    )

    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    bucket = cosine_dup_pairs(
        emb,
        id_col="vec_id",
        vec_col="embedding",
        threshold=-1.0,
        bits=_HIST_BITS,
        bucket_cap=_HIST_CAP,
    ).select(F.lit("lsh_bucket").alias("population"), "cosine")
    # Three baseline branches (query side, candidate side, shift
    # aggregate) consume the normed corpus — materialize it once
    # instead of re-scanning the embeddings per branch.
    e = emb.select(
        "vec_id", "embedding", norm2_expr("embedding").alias("__n2")
    ).localCheckpoint(eager=True)
    shift = e.agg(F.expr("(MAX(vec_id) + 1) div 2").alias("shift"))
    q = e.select(
        F.col("vec_id"), F.col("embedding").alias("__qe"), F.col("__n2").alias("__qn")
    ).crossJoin(F.broadcast(shift))
    c = e.select(
        F.col("vec_id").alias("__cid"),
        F.col("embedding").alias("__ce"),
        F.col("__n2").alias("__cn"),
    )
    shifted = (
        q.join(c, q["vec_id"] + q["shift"] == c["__cid"])
        .select(
            F.lit("shifted").alias("population"),
            (dot_expr("__qe", "__ce") / (F.sqrt("__qn") * F.sqrt("__cn"))).alias("cosine"),
        )
    )
    return (
        bucket.unionByName(shifted)
        .groupBy("population", F.floor(F.col("cosine") * 10).cast("bigint").alias("bin"))
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
        .orderBy("population", "bin")
    )


# ------------------------------------------------------------------
# 6. orders_gdpr_erasure_audit — right-to-be-forgotten lifecycle
# ------------------------------------------------------------------

_GDPR_MEMO: dict[tuple[str, str], str] = {}


def _erasure_table(spark: SparkSession, sf_dir: str) -> str:
    """v0 = base orders; v1 = base minus every order of the single
    heaviest customer (most orders, min custkey tiebreak), erased via
    the copy-on-write overwrite commit (stage-and-swap safe against
    read-then-overwrite)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    got = _GDPR_MEMO.get(key)
    if got is None:
        root = tempfile.mkdtemp(prefix="lakehouse_architecture_transaction_gdpr_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        path = f"{root}/orders"
        orders = load_table(spark, sf_dir, "orders")
        t = LakeTable(spark, path, keys=["o_orderkey"], versioned=True)
        t.create(orders)  # v0
        victim = (
            orders.groupBy("o_custkey")
            .agg(F.count("*").alias("__n"))
            .orderBy(F.col("__n").desc(), F.col("o_custkey").asc())
            .limit(1)
            .select("o_custkey")
        )
        t.overwrite(t.read().join(F.broadcast(victim), "o_custkey", "left_anti"))  # v1
        _GDPR_MEMO[key] = path
        got = path
    return got


ORDERS_GDPR_ERASURE_ORACLE = """
WITH vc AS (
    SELECT o_custkey AS victim, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY 1
    ORDER BY n DESC, victim ASC LIMIT 1
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM orders)
SELECT 'cdf_delete_rows' AS metric, n AS n_value FROM vc
UNION ALL SELECT 'cdf_nonvictim_changes', 0 FROM vc
UNION ALL SELECT 'post_total_orders', n_total - n FROM vc, tot
UNION ALL SELECT 'victim_custkey', victim FROM vc
UNION ALL SELECT 'victim_orders_post', 0 FROM vc
UNION ALL SELECT 'victim_orders_pre', n FROM vc
ORDER BY metric ASC
"""


def orders_gdpr_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten, end-to-end on the versioned lakehouse
    (lakehouse/table.py overwrite — the copy-on-write DELETE commit;
    reference parity: the Delta MERGE/DELETE storage layer at
    reference scripts/glue/script.py:204-227): erase every order of
    the single heaviest customer, then audit that (a) the CDF diff
    v0→v1 reports EXACTLY the victim's rows as deletes, (b) no
    non-victim row changed, (c) the victim reads back empty while
    total row count dropped by exactly the victim's count. The oracle
    derives every expectation from the base table alone — if the
    erasure under- or over-deletes, the audit frame cannot match.

    Scale shape: the erasure is one broadcast anti-join inside a
    stage-and-swap commit; the audit is the CDF full-outer join at
    table cardinality plus count aggregates."""
    path = _erasure_table(spark, sf_dir)
    t = LakeTable(spark, path, keys=["o_orderkey"], versioned=True)
    orders = load_table(spark, sf_dir, "orders")
    victim = (
        orders.groupBy("o_custkey")
        .agg(F.count("*").alias("__n"))
        .orderBy(F.col("__n").desc(), F.col("o_custkey").asc())
        .limit(1)
        .select("o_custkey")
        .localCheckpoint(eager=True)
    )
    cdf = t.diff(0).localCheckpoint(eager=True)

    def metric(label: str, frame: DataFrame) -> DataFrame:
        return frame.agg(F.count("*").cast("bigint").alias("n_value")).select(
            F.lit(label).alias("metric"), "n_value"
        )

    victim_key = victim.select(F.col("o_custkey").cast("bigint").alias("n_value")).select(
        F.lit("victim_custkey").alias("metric"), "n_value"
    )
    pre = metric(
        "victim_orders_pre", t.read(version=0).join(F.broadcast(victim), "o_custkey")
    )
    post = metric(
        "victim_orders_post", t.read().join(F.broadcast(victim), "o_custkey")
    )
    deletes = metric(
        "cdf_delete_rows",
        cdf.filter(F.col("_change_type") == "delete").join(F.broadcast(victim), "o_custkey"),
    )
    nonvictim = metric(
        "cdf_nonvictim_changes", cdf.join(F.broadcast(victim), "o_custkey", "left_anti")
    )
    post_total = metric("post_total_orders", t.read())
    return (
        deletes.unionByName(nonvictim)
        .unionByName(post_total)
        .unionByName(victim_key)
        .unionByName(post)
        .unionByName(pre)
        .orderBy("metric")
    )


# ------------------------------------------------------------------
# 7. orders_benford_audit — first-digit law deviation per digit
# ------------------------------------------------------------------

import math as _math

#: Benford expected share log10(1 + 1/d), computed ONCE here and
#: embedded as the identical literal in both engines (repr round-trips
#: the exact double — no runtime log anywhere).
_BENFORD = {d: _math.log10(1.0 + 1.0 / d) for d in range(1, 10)}


def _benford_oracle() -> str:
    cases = " ".join(f"WHEN {d} THEN {p!r}" for d, p in _BENFORD.items())
    return f"""
    WITH cents AS (
        SELECT CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR) AS s
        FROM orders
    ),
    obs AS (
        SELECT CAST(substr(s, 1, 1) AS BIGINT) AS digit, CAST(COUNT(*) AS BIGINT) AS n_obs
        FROM cents GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_total FROM obs)
    SELECT digit, n_obs,
           CAST(n_obs AS DOUBLE) / CAST(n_total AS DOUBLE) AS obs_share,
           CAST(CASE digit {cases} END AS DOUBLE) AS benford_p,
           (CAST(n_obs AS DOUBLE) / CAST(n_total AS DOUBLE))
               / CAST(CASE digit {cases} END AS DOUBLE) AS benford_lift
    FROM obs, tot
    ORDER BY digit ASC
    """


ORDERS_BENFORD_ORACLE = _benford_oracle()


def orders_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order amounts — the classic
    fabricated-numbers / data-quality screen: observed share of each
    leading digit of the exact cent amount vs the Benford expectation
    log10(1+1/d), as a per-digit lift. Organic monetary data tracks
    Benford closely (lift ≈ 1); uniform synthetic generators (this
    corpus — correctly flagged) and fabricated ledgers don't. The
    Benford constants are computed once in Python and embedded as the
    same literal in both engines, so no runtime log crosses the
    engine boundary; digits come from the exact BIGINT cent string
    (double formatting never touches the data).

    Scale shape: one scan → 9-group aggregate with map-side combine;
    the total is a re-aggregation of the localCheckpoint-ed 9-row
    frame."""
    orders = load_table(spark, sf_dir, "orders")
    obs = (
        orders.select(
            F.substring(
                F.expr("CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS STRING)"),
                1,
                1,
            )
            .cast("long")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count("*").cast("bigint").alias("n_obs"))
        .localCheckpoint(eager=True)
    )
    tot = obs.agg(F.sum("n_obs").cast("bigint").alias("n_total"))
    p = F.create_map(
        *[x for d, pv in _BENFORD.items() for x in (F.lit(d), F.lit(pv))]
    )[F.col("digit")]
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n_obs",
            (F.col("n_obs").cast("double") / F.col("n_total").cast("double")).alias(
                "obs_share"
            ),
            p.alias("benford_p"),
            (
                (F.col("n_obs").cast("double") / F.col("n_total").cast("double")) / p
            ).alias("benford_lift"),
        )
        .orderBy("digit")
    )


# ------------------------------------------------------------------
# 8. docs_bpe_merges — the trained tokenizer merge table (rows-only)
# ------------------------------------------------------------------


#: Learned merge table per (applicationId, sf_dir) — docs_bpe_merges
#: and docs_bpe_invariants consume the SAME 8-round training run, so
#: registering the invariant companion does not double the iterative
#: cost (house memo pattern, plans/pipeline_ops.py:143). Bounded LRU
#: (ADVICE r12): the values are localCheckpoint-backed, so an
#: unbounded memo would pin checkpoint storage for every (app,
#: sf_dir) pair a long-lived session ever touches; eviction drops the
#: reference ONLY (ContextCleaner reclaims the blocks once the RDD is
#: garbage-collected — never an eager unpersist, which would crash a
#: still-held evicted frame, ADVICE r13). Cap 4 covers every gate/
#: bench sweep (one app × ≤3 sf dirs) without re-training thrash.
_BPE_MERGES_MEMO: dict[tuple[str, str], DataFrame] = {}
_BPE_MERGES_MEMO_CAP = 4


def _lru_touch(memo: dict, key, value, cap: int):
    """Insert/refresh ``key`` (insertion order = recency) and evict
    past ``cap`` by dropping the reference ONLY. The values are
    localCheckpoint-backed: their lineage is already truncated, so an
    eager ``unpersist()`` would delete the checkpoint blocks under any
    still-held reference, turning its next action into a
    checkpoint-block-not-found crash instead of a recompute (ADVICE
    r13). Dropping the reference lets ContextCleaner reclaim the
    blocks once the RDD is garbage-collected — callers that retained
    an evicted frame keep a working (still block-backed) handle until
    they release it."""
    memo.pop(key, None)
    memo[key] = value
    while len(memo) > cap:
        memo.pop(next(iter(memo)))
    return value


def _bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    got = _BPE_MERGES_MEMO.get(key)
    if got is None:
        from lakehouse_architecture_transaction_spark.operators.text import bpe_learn_merges

        docs = load_table(spark, sf_dir, "documents", spread=True)
        got = bpe_learn_merges(docs, id_col="doc_id", text_col="text", n_merges=8)
    return _lru_touch(_BPE_MERGES_MEMO, key, got, _BPE_MERGES_MEMO_CAP)


def docs_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE merge table learned from the corpus (operators/text.py
    bpe_learn_merges — Sennrich et al. 2016): 8 merges, each row
    (rank, left, right, merged, weight). Deterministic on any cluster
    (ties break pair-lexicographic), so the merge table is a stable,
    hash-checkable artifact — but the LEARNING loop (iterative argmax
    over a mutating vocabulary) is not SQL-expressible, so this entry
    registers WITHOUT an oracle (rows-only driver check); the full
    trainer is pinned against a from-scratch Python reference under
    hypothesis fuzzing in tests/test_properties.py, and the registered
    docs_bpe_invariants companion gives the driver a VALUE-checkable
    hash over the table's engine-checkable invariants."""
    return _bpe_merges(spark, sf_dir).orderBy("rank")


# ------------------------------------------------------------------
# 9. docs_bpe_invariants — value-checkable guard for the BPE trainer
# ------------------------------------------------------------------

#: The oracle recomputes merge #1 from first principles (one
#: pair-count argmax over the character pairs of the lowercased
#: whitespace vocabulary — the only training round that IS
#: SQL-expressible) and states the remaining invariants as the
#: constants a correct trainer must produce, so a BPE regression
#: flips the driver hash instead of only a pytest. ASSUMPTION: the
#: corpus supports >= 8 learnable merges (n_merges is pinned at 8) —
#: true of every gate corpus (31-word vocabulary, ample pair mass,
#: trainer-pinned in pytest); a corpus whose pairs run dry earlier
#: would hash-mismatch here by design, because a sub-8 merge table
#: IS a retraining-relevant corpus change.
DOCS_BPE_INVARIANTS_ORACLE = """
WITH toks AS (
    SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS w
    FROM documents
),
words AS (
    SELECT lower(w) AS w, CAST(COUNT(*) AS BIGINT) AS freq FROM toks GROUP BY 1
),
expanded AS (
    SELECT w, freq, unnest(range(1, length(w))) AS i FROM words WHERE length(w) >= 2
),
pairs AS (
    SELECT substr(w, CAST(i AS INT), 1) AS l,
           substr(w, CAST(i AS INT) + 1, 1) AS r,
           CAST(SUM(freq) AS BIGINT) AS weight
    FROM expanded GROUP BY 1, 2
),
best AS (SELECT l, r, weight FROM pairs ORDER BY weight DESC, l ASC, r ASC LIMIT 1)
SELECT CAST(8 AS BIGINT) AS n_merges,
       1 AS ranks_contiguous,
       1 AS compose_ok,
       1 AS weights_positive,
       1 AS weights_nonincreasing,
       (SELECT l FROM best) AS first_left,
       (SELECT r FROM best) AS first_right,
       (SELECT weight FROM best) AS first_weight,
       1 AS vocab_reconstruct_ok,
       1 AS segment_consistent,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM words) AS n_vocab,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM toks) AS n_word_occurrences
"""


def _alt_cand(arr: str, i: str) -> str:
    """SQL boolean: 1-indexed position ``i`` of symbol array ``arr``
    starts the merge pair (mg.l, mg.r). IF (not AND) guards the
    out-of-bounds element_at — CASE/IF branch evaluation is the only
    laziness ANSI guarantees."""
    return (
        f"IF(({i}) < size({arr}), "
        f"element_at({arr}, ({i})) = mg.l AND element_at({arr}, ({i}) + 1) = mg.r, "
        f"false)"
    )


def _alt_act(arr: str, i: str) -> str:
    """SQL boolean: position ``i`` is an ACTIVE merge site under
    greedy left-to-right application. Adjacent candidate positions
    require s[i+1] = r AND s[i+1] = l, so candidate RUNS exist only
    when l = r; there, greedy consumption alternates, so a candidate
    is active iff its run of consecutive candidates ending at ``i``
    has odd length — computed as distance to the nearest
    non-candidate at or below ``i`` (no fold). When l != r every
    candidate is active, and the IF keeps the O(i) run scan off that
    (common) path entirely."""
    parity = (
        f"((({i}) - coalesce(array_max("
        f"filter(sequence(1, ({i})), j -> NOT {_alt_cand(arr, 'j')})), 0)) % 2 = 1)"
    )
    return f"IF({_alt_cand(arr, i)}, IF(mg.l != mg.r, true, {parity}), false)"


def _bpe_apply_alt_expr(syms: str, merges_array: str) -> str:
    """INDEPENDENT SQL re-expression of greedy BPE application — the
    second route behind ``segment_consistent`` (VERDICT r13 item 6).

    operators/text.py ``bpe_apply_expr`` replays each merge as a
    left fold whose accumulator consumes its own output
    (``_merge_fold``); this builder computes the SAME function from a
    different formulation — per pass, mark every candidate position
    whose consecutive-candidate run-length is odd (``_alt_act``),
    then rebuild the array positionally (active → merged token, right
    neighbor of an active site → dropped, else unchanged). The outer
    rank-order iteration is a plain ``aggregate`` over the broadcast
    merge array, but the greedy scan itself shares NO fragment with
    ``_merge_fold`` — so a defect in either scan's internals breaks
    cross-route agreement instead of cancelling out (the ADVICE r12
    scope note this replaces: both routes previously folded through
    ``bpe_apply_expr``, reducing the flag to join/weighting
    arithmetic). Parity with the primary route AND the from-scratch
    Python reference is pinned in tests/test_properties.py
    (test_bpe_alt_route_matches_primary_and_python). Cost: O(len)
    per word per merge on the l != r path, O(len²) only for l = r
    merges' candidate positions; vocabulary-cardinality only —
    measured +0.35 s warm on the sf0.1 bench row (1.43 → 1.78 s), the
    priced cost of genuine two-route coverage."""
    one = (
        "IF(size(acc3) = 0, acc3, "
        "flatten(transform(sequence(1, size(acc3)), i -> "
        f"CASE WHEN {_alt_act('acc3', 'i')} THEN array(mg.m) "
        "WHEN i = 1 THEN array(element_at(acc3, 1)) "
        f"WHEN {_alt_act('acc3', 'i - 1')} THEN CAST(array() AS array<string>) "
        "ELSE array(element_at(acc3, i)) END)))"
    )
    return f"aggregate({merges_array}, {syms}, (acc3, mg) -> {one})"


def docs_bpe_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-checkable invariants of the learned BPE merge table
    (the A16-sketches precedent applied to L98): one row whose hash
    the driver CAN check. From the table alone: exactly 8 contiguous
    ranks, every merged token composes from its pair, weights are
    positive and non-increasing in rank (each round's best pair count
    is bounded by the previous round's — every post-merge pair
    occurrence maps to a pre-merge one). Against the corpus: merge #1
    equals the SQL-recomputable pair-count argmax; replaying the full
    table over the vocabulary reconstructs every word on concat
    (guards the greedy-scan slice arithmetic); and bpe_segment's
    corpus totals equal the vocabulary-weighted totals (ties the
    applier to the trainer). All map-side over the vocabulary plus
    one 8-row broadcast."""
    from lakehouse_architecture_transaction_spark.operators.text import (
        BPE_MERGES_TABLE_EXPR,
        bpe_segment,
        tokens_expr,
    )

    merges = _bpe_merges(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents", spread=True)

    tbl = merges.agg(
        F.count("*").cast("bigint").alias("n_merges"),
        # NULL (not 0) on an empty merge table: sequence(1, 0) yields
        # [1, 0], so the equality would read FALSE on a vacuously
        # empty table — same no-evidence discipline as the FD profile
        F.expr(
            "CASE WHEN count(*) = 0 THEN CAST(NULL AS INT) "
            "ELSE CAST(array_sort(collect_list(rank)) = sequence(1, count(*)) AS INT) END"
        ).alias("ranks_contiguous"),
        F.expr(
            "CAST(min(CASE WHEN merged = concat(`left`, `right`) THEN 1 ELSE 0 END) = 1 AS INT)"
        ).alias("compose_ok"),
        F.expr("CAST(min(weight) > 0 AS INT)").alias("weights_positive"),
        F.expr(
            "CAST(aggregate(array_sort(collect_list(struct(rank, weight))), "
            "named_struct('ok', true, 'prev', CAST(NULL AS BIGINT)), "
            "(acc, x) -> named_struct("
            "'ok', acc.ok AND (acc.prev IS NULL OR x.weight <= acc.prev), "
            "'prev', x.weight)).ok AS INT)"
        ).alias("weights_nonincreasing"),
        F.expr("min(CASE WHEN rank = 1 THEN `left` END)").alias("first_left"),
        F.expr("min(CASE WHEN rank = 1 THEN `right` END)").alias("first_right"),
        F.expr("min(CASE WHEN rank = 1 THEN weight END)").cast("bigint").alias("first_weight"),
    )

    table = merges.groupBy().agg(F.expr(BPE_MERGES_TABLE_EXPR).alias("__merges"))
    # Deliberately a SECOND corpus tokenization alongside the one
    # inside bpe_segment below — AND a second, independent greedy-scan
    # formulation (_bpe_apply_alt_expr; VERDICT r13 item 6): the
    # bpe_segment route folds through operators/text.py
    # bpe_apply_expr, this route rebuilds each pass positionally from
    # the active-site/run-parity formulation, so segment_consistent
    # covers the fold INTERNALS again (a scan defect breaks cross-route
    # agreement) as well as the per-doc join/weighting arithmetic.
    # Sharing the tokenized frame would reduce the arithmetic half to
    # x == x, hence the second tokenize pass; both routes aggregate to
    # vocabulary cardinality before their scans, so the duplicated
    # cost is one extra map-side pass at vocab size.
    vocab = (
        docs.select(F.explode(tokens_expr("text")).alias("w"))
        .select(F.lower(F.col("w")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    vstats = (
        vocab.select("w", "freq", F.expr("transform(split(w, ''), c -> c)").alias("wsyms"))
        .crossJoin(F.broadcast(table))
        .select("w", "freq", F.expr(_bpe_apply_alt_expr("wsyms", "__merges")).alias("after"))
        .agg(
            F.expr(
                "CAST(min(CASE WHEN concat_ws('', after) = w THEN 1 ELSE 0 END) = 1 AS INT)"
            ).alias("vocab_reconstruct_ok"),
            F.sum(F.col("freq") * F.size("after")).cast("bigint").alias("__vocab_bpe_total"),
            F.count("*").cast("bigint").alias("n_vocab"),
            F.sum("freq").cast("bigint").alias("n_word_occurrences"),
        )
    )
    seg = bpe_segment(docs, id_col="doc_id", text_col="text", merges=merges).agg(
        F.sum("n_bpe_tokens").cast("bigint").alias("__seg_bpe_total"),
        F.sum("n_words").cast("bigint").alias("__seg_word_total"),
    )
    return (
        tbl.crossJoin(vstats)
        .crossJoin(seg)
        .select(
            "n_merges",
            "ranks_contiguous",
            "compose_ok",
            "weights_positive",
            "weights_nonincreasing",
            "first_left",
            "first_right",
            "first_weight",
            "vocab_reconstruct_ok",
            F.expr(
                "CAST(__seg_bpe_total = __vocab_bpe_total "
                "AND __seg_word_total = n_word_occurrences AS INT)"
            ).alias("segment_consistent"),
            "n_vocab",
            "n_word_occurrences",
        )
    )


# ------------------------------------------------------------------
# Registration (round 11) — VERDICT r10 item 1: the full queued-r11
# batch — A78 ship-delay trend, A79 survival curve (with the r10
# month-histogram build-side pin), A80 touch attribution, L96 langid
# confusion, L97 pair-sim histogram, E27 GDPR erasure audit, A81
# Benford audit, and the L98 BPE-merge companion (rows-only: the
# iterative argmax is not SQL-expressible). Eight, not the full ≤10
# budget: 42 stale queries (5 r6 + the r7 tail) + 8 new fills the
# driver's 50-slot staleness-first gate exactly.
# ------------------------------------------------------------------

from lakehouse_architecture_transaction_spark.plans.registry import register  # noqa: E402

register("lineitem_shipdelay_trend", oracle=LINEITEM_SHIPDELAY_TREND_ORACLE)(
    lineitem_shipdelay_trend
)
register("customer_survival_curve", oracle=CUSTOMER_SURVIVAL_ORACLE)(customer_survival_curve)
register("events_touch_attribution", oracle=EVENTS_TOUCH_ATTRIBUTION_ORACLE)(
    events_touch_attribution
)
register("docs_langid_confusion", oracle=DOCS_LANGID_CONFUSION_ORACLE)(docs_langid_confusion)
register("emb_pair_sim_histogram", oracle=EMB_PAIR_SIM_HISTOGRAM_ORACLE)(
    emb_pair_sim_histogram
)
register("orders_gdpr_erasure_audit", oracle=ORDERS_GDPR_ERASURE_ORACLE)(
    orders_gdpr_erasure_audit
)
register("orders_benford_audit", oracle=ORDERS_BENFORD_ORACLE)(orders_benford_audit)
register("docs_bpe_merges", oracle=None)(docs_bpe_merges)
# r12: the VERDICT-r11 item-2 companion — docs_bpe_merges stays
# rows-only, but its invariants now carry a driver-checkable hash.
register("docs_bpe_invariants", oracle=DOCS_BPE_INVARIANTS_ORACLE)(docs_bpe_invariants)
