"""Queued round-13 registrations: robust stats, overlap, promotion audit.

- part_price_dispersion_by_type — per-type robust dispersion profile
  (median / MAD / max absolute deviation) of part prices: the
  outlier-screen SUMMARY (reports the scale of deviation rather than
  filtering, so it cannot go hollow on well-behaved catalogs).
- events_usertype_overlap — distinct-user overlap + Jaccard for every
  event-type pair: the audience co-usage matrix (which behaviors
  share users) — the set-overlap complement to L57's within-window
  co-occurrence counts.
- lineitem_discount_profile — the full discount-band revenue audit:
  per discount level, volume, gross, given-away and net revenue with
  exact-decimal money discipline — Q6/Q14 generalized from one band
  to the whole promotion schedule.

All three oracle-previewed cell-exact at sf0.001/0.01/0.1
(tests/test_oracle_parity.py) and degenerate-input pinned
(tests/test_empty_inputs.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_architecture_transaction_spark.catalog import load_table
from lakehouse_architecture_transaction_spark.functions.moments import sum_sq_dec

# ------------------------------------------------------------------
# 1. part_price_dispersion_by_type
# ------------------------------------------------------------------

PART_PRICE_DISPERSION_ORACLE = """
WITH cents AS (
    SELECT p_type, CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
    FROM part WHERE p_retailprice IS NOT NULL
),
wc AS (
    SELECT p_type, x, CAST(COUNT(*) AS BIGINT) AS c FROM cents GROUP BY 1, 2
),
tot AS (SELECT p_type, CAST(SUM(c) AS BIGINT) AS nt FROM wc GROUP BY 1),
r AS (
    SELECT w.p_type, w.x, w.c, t.nt,
           SUM(w.c) OVER (PARTITION BY w.p_type ORDER BY w.x ASC) AS cum
    FROM wc w JOIN tot t ON w.p_type = t.p_type
),
med AS (
    SELECT p_type, MIN(CASE WHEN cum >= (nt + 1) // 2 THEN x END) AS med_cents
    FROM r GROUP BY 1
),
d AS (
    SELECT w.p_type, abs(w.x - m.med_cents) AS ad, w.c
    FROM wc w JOIN med m ON w.p_type = m.p_type
),
da AS (SELECT p_type, ad, CAST(SUM(c) AS BIGINT) AS c FROM d GROUP BY 1, 2),
rd AS (
    SELECT a.p_type, a.ad, t.nt,
           SUM(a.c) OVER (PARTITION BY a.p_type ORDER BY a.ad ASC) AS cum
    FROM da a JOIN tot t ON a.p_type = t.p_type
),
madt AS (
    SELECT p_type, MIN(CASE WHEN cum >= (nt + 1) // 2 THEN ad END) AS mad_cents,
           MAX(ad) AS max_ad
    FROM rd GROUP BY 1
)
SELECT m.p_type AS p_type, t.nt AS n_parts,
       CAST(m.med_cents AS DOUBLE) / 100.0 AS median_price,
       CAST(ma.mad_cents AS DOUBLE) / 100.0 AS mad_price,
       CAST(ma.max_ad AS DOUBLE) / 100.0 AS max_abs_dev,
       CASE WHEN ma.mad_cents = 0 THEN NULL
            ELSE CAST(ma.max_ad AS DOUBLE) / CAST(ma.mad_cents AS DOUBLE) END AS max_dev_over_mad
FROM med m JOIN madt ma ON m.p_type = ma.p_type
JOIN tot t ON m.p_type = t.p_type
ORDER BY p_type ASC
"""


def part_price_dispersion_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type robust price dispersion: lower-median and MAD of part
    retail price in exact BIGINT cents, plus the maximum absolute
    deviation and its ratio over the MAD — the robust outlier screen
    reported as a PROFILE (a clean catalog reads ratio ≈ small; a
    fat-fingered price reads ratio ≫ 3), so the row set cannot go
    hollow the way a thresholded filter does on well-behaved data.
    NULL ratio (not 0/0) when MAD is zero (over half the type at one
    price). Lower-median convention matches events_mad_anomalies;
    NULL prices are excluded (a missing price is a validation-class
    row, not a dispersion vote).

    Scale shape: money lives on a bounded CENT GRID, so both medians
    are WEIGHTED medians over (type, cent) counts — one map-side-
    combinable aggregate collapses part cardinality to grid
    cardinality (~1.2e5 cents per type regardless of corpus size),
    then per-type weighted-median folds over collect_list'd
    (value, count) arrays run entirely map-side at TYPE cardinality.
    Replaces the r12-preview bucketed-rank implementation: two
    grouped_exact_rank passes over full part cardinality (rank
    machinery ∝ rows) became one aggregate ∝ distinct grid values —
    measured 3.9 s → ~1 s warm at sf0.1, and the 100 TB cost is the
    (type, cent) aggregate's shuffle instead of two row-cardinality
    rank pipelines."""
    part = load_table(spark, sf_dir, "part")
    wc = (
        part.filter(F.col("p_retailprice").isNotNull())
        .select(
            "p_type",
            F.expr("CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias("x"),
        )
        .groupBy("p_type", "x")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    # Weighted lower median from a rank-ordered (value, count) array:
    # first value whose cumulative count reaches ceil(nt/2). The fold
    # is exact-integer and deterministic (array_sort on distinct
    # values); grid cardinality bounds the array, not corpus size.
    def _wmedian(pairs: str, nt: str) -> str:
        return (
            f"aggregate({pairs}, named_struct('cum', CAST(0 AS BIGINT), "
            f"'med', CAST(NULL AS BIGINT)), (acc, e) -> named_struct("
            f"'cum', acc.cum + e.c, "
            f"'med', IF(acc.med IS NULL AND acc.cum + e.c >= ({nt} + 1) div 2, "
            f"e.v, acc.med))).med"
        )

    byt = wc.groupBy("p_type").agg(
        F.expr("array_sort(collect_list(struct(x AS v, c)))").alias("__xs"),
        F.sum("c").cast("bigint").alias("n_parts"),
    )
    med = byt.select(
        "p_type",
        "n_parts",
        F.expr(_wmedian("__xs", "n_parts")).alias("med_cents"),
        "__xs",
    )
    # Deviations live on the same grid: |x − med| with the same
    # counts, re-sorted map-side — no join back to part rows.
    dev = med.select(
        "p_type",
        "n_parts",
        "med_cents",
        F.expr(
            "array_sort(transform(__xs, e -> struct(abs(e.v - med_cents) AS v, e.c)))"
        ).alias("__ds"),
    )
    return (
        dev.select(
            "p_type",
            "n_parts",
            "med_cents",
            F.expr(_wmedian("__ds", "n_parts")).alias("mad_cents"),
            F.expr("array_max(transform(__ds, e -> e.v))").alias("max_ad"),
        )
        .select(
            "p_type",
            "n_parts",
            (F.col("med_cents").cast("double") / F.lit(100.0)).alias("median_price"),
            (F.col("mad_cents").cast("double") / F.lit(100.0)).alias("mad_price"),
            (F.col("max_ad").cast("double") / F.lit(100.0)).alias("max_abs_dev"),
            F.when(
                F.col("mad_cents") == 0, F.lit(None).cast("double")
            ).otherwise(F.col("max_ad").cast("double") / F.col("mad_cents").cast("double"))
            .alias("max_dev_over_mad"),
        )
        .orderBy("p_type")
    )


# ------------------------------------------------------------------
# 2. events_usertype_overlap — audience co-usage matrix
# ------------------------------------------------------------------

EVENTS_USERTYPE_OVERLAP_ORACLE = """
WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
sizes AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users FROM tu GROUP BY 1),
pairs AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(COUNT(*) AS BIGINT) AS n_common
    FROM tu a JOIN tu b ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, sa.n_users AS n_users_a, sb.n_users AS n_users_b,
       p.n_common,
       CAST(p.n_common AS DOUBLE)
           / CAST(sa.n_users + sb.n_users - p.n_common AS DOUBLE) AS jaccard
FROM pairs p
JOIN sizes sa ON p.type_a = sa.event_type
JOIN sizes sb ON p.type_b = sb.event_type
ORDER BY type_a ASC, type_b ASC
"""


def events_usertype_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap between event types: for every type pair, the
    distinct-user counts of both types, the overlap, and the Jaccard
    of their user sets — which behaviors share an audience (the
    cross-sell / feature-adoption matrix). Set-level complement to
    events_type_cooccurrence's within-window counts: co-occurrence
    says "together in time", this says "same people at all".

    Scale shape: ONE distinct aggregate (map-side partial) at
    (type, user) cardinality, localCheckpoint-ed because the sizes
    and the pair self-join both consume it; the self-join keys on
    user_id at distinct-pair cardinality and the matrix is
    types²/2 rows."""
    tu = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    sizes = tu.groupBy("event_type").agg(F.count("*").cast("bigint").alias("n_users"))
    a = tu.select(F.col("event_type").alias("type_a"), "user_id")
    b = tu.select(F.col("event_type").alias("type_b"), "user_id")
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    return (
        pairs.join(
            F.broadcast(sizes.select(F.col("event_type").alias("type_a"), F.col("n_users").alias("n_users_a"))),
            "type_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("event_type").alias("type_b"), F.col("n_users").alias("n_users_b"))),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            "n_users_a",
            "n_users_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("n_users_a") + F.col("n_users_b") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


# ------------------------------------------------------------------
# 3. lineitem_discount_profile — the promotion schedule audit
# ------------------------------------------------------------------

LINEITEM_DISCOUNT_PROFILE_ORACLE = """
WITH b AS (
    SELECT CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS discount_pct,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS gross_cents,
           CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                     * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4)) * 10000 AS BIGINT)
               AS disc_e4
    FROM lineitem
),
g AS (
    SELECT discount_pct, CAST(COUNT(*) AS BIGINT) AS n_lineitems,
           CAST(SUM(gross_cents) AS BIGINT) AS gross_cents,
           CAST(SUM(disc_e4) AS BIGINT) AS disc_e4
    FROM b GROUP BY 1
),
tot AS (SELECT CAST(SUM(gross_cents) AS BIGINT) AS total_gross FROM g)
SELECT discount_pct, n_lineitems,
       CAST(gross_cents AS DOUBLE) / 100.0 AS gross_revenue,
       CAST(disc_e4 AS DOUBLE) / 10000.0 AS discount_given,
       CAST(gross_cents * 100 - disc_e4 AS DOUBLE) / 10000.0 AS net_revenue,
       CAST(gross_cents AS DOUBLE) / CAST(total_gross AS DOUBLE) AS gross_share
FROM g, tot
ORDER BY discount_pct ASC
"""


def lineitem_discount_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full promotion-schedule audit — TPC-H Q6/Q14 generalized
    from one band to every discount level: per discount percentage,
    lineitem volume, gross revenue, revenue given away to the
    discount, net revenue, and each band's share of gross. Money
    stays exact: gross in BIGINT cents, the discount product in
    BIGINT 1e-4-dollar units (price×discount needs 4 decimals), the
    net as an exact integer subtraction on the common 1e-4 grid —
    ONE division per output column.

    Scale shape: one scan, one ~11-group aggregate with map-side
    combine; the total re-aggregates the localCheckpoint-ed band
    frame."""
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(
        F.expr("CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "discount_pct"
        ),
        F.expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "gross_cents"
        ),
        F.expr(
            "CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2))"
            " * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4)) * 10000 AS BIGINT)"
        ).alias("disc_e4"),
    )
    g = (
        b.groupBy("discount_pct")
        .agg(
            F.count("*").cast("bigint").alias("n_lineitems"),
            F.sum("gross_cents").cast("bigint").alias("gross_cents"),
            F.sum("disc_e4").cast("bigint").alias("disc_e4"),
        )
        .localCheckpoint(eager=True)
    )
    tot = g.agg(F.sum("gross_cents").cast("bigint").alias("total_gross"))
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            "discount_pct",
            "n_lineitems",
            (F.col("gross_cents").cast("double") / F.lit(100.0)).alias("gross_revenue"),
            (F.col("disc_e4").cast("double") / F.lit(10000.0)).alias("discount_given"),
            (
                (F.col("gross_cents") * 100 - F.col("disc_e4")).cast("double")
                / F.lit(10000.0)
            ).alias("net_revenue"),
            (F.col("gross_cents").cast("double") / F.col("total_gross").cast("double")).alias(
                "gross_share"
            ),
        )
        .orderBy("discount_pct")
    )


# ------------------------------------------------------------------
# 4. events_growth_accounting — weekly new/retained/resurrected/churned
# ------------------------------------------------------------------

EVENTS_GROWTH_ACCOUNTING_ORACLE = """
WITH wa AS (
    SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
    FROM events
),
first_w AS (SELECT user_id, MIN(week) AS first_week FROM wa GROUP BY 1),
cur AS (
    SELECT w.week, w.user_id, f.first_week,
           CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END AS was_prev
    FROM wa w
    JOIN first_w f ON w.user_id = f.user_id
    LEFT JOIN wa p ON p.user_id = w.user_id
                  AND p.week = w.week - INTERVAL 7 DAYS
),
act AS (
    SELECT week,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           CAST(SUM(CASE WHEN first_week = week THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
           CAST(SUM(was_prev) AS BIGINT) AS n_retained,
           CAST(SUM(CASE WHEN first_week < week AND was_prev = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_resurrected
    FROM cur GROUP BY 1
),
ch AS (
    SELECT p.week + INTERVAL 7 DAYS AS week, CAST(COUNT(*) AS BIGINT) AS n_churned
    FROM wa p
    LEFT JOIN wa n ON n.user_id = p.user_id AND n.week = p.week + INTERVAL 7 DAYS
    WHERE n.user_id IS NULL
    GROUP BY 1
)
SELECT a.week AS week, n_active, n_new, n_retained, n_resurrected,
       CAST(COALESCE(c.n_churned, 0) AS BIGINT) AS n_churned
FROM act a LEFT JOIN ch c ON a.week = c.week
ORDER BY week ASC
"""


def events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting — the standard product-analytics
    decomposition of the active-user curve: per ISO week, active
    users split into NEW (first-ever week), RETAINED (also active the
    prior week) and RESURRECTED (returned after a gap), plus CHURNED
    (active the prior week, absent this one). The identity
    active = new + retained + resurrected holds exactly by
    construction, and active(w) − active(w−1) =
    new + resurrected − churned — the growth ledger DAU/MAU
    stickiness (A73) cannot decompose. Churn for weeks after the
    observation window is unknowable and not reported.

    Scale shape: ONE distinct (user, week) aggregate (map-side
    partial), localCheckpoint-ed — four branches (first-week
    aggregate, current/prev self-join, churn anti-join) consume it;
    everything downstream runs at user×week cardinality with
    user-keyed equi-joins on calendar-shifted weeks."""
    wa = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.date_trunc("week", F.col("ts")).alias("week"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    first_w = wa.groupBy("user_id").agg(F.min("week").alias("first_week"))
    prev = wa.select(
        F.col("user_id").alias("__pu"), (F.col("week") + F.expr("INTERVAL 7 DAYS")).alias("__pw")
    )
    cur = (
        wa.join(first_w, "user_id")
        .join(
            prev,
            (F.col("user_id") == F.col("__pu")) & (F.col("week") == F.col("__pw")),
            "left",
        )
        .select(
            "week",
            "first_week",
            F.when(F.col("__pu").isNotNull(), 1).otherwise(0).alias("was_prev"),
        )
    )
    act = cur.groupBy("week").agg(
        F.count("*").cast("bigint").alias("n_active"),
        F.sum(F.when(F.col("first_week") == F.col("week"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_new"),
        F.sum("was_prev").cast("bigint").alias("n_retained"),
        F.sum(
            F.when((F.col("first_week") < F.col("week")) & (F.col("was_prev") == 0), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_resurrected"),
    )
    nxt = wa.select(
        F.col("user_id").alias("__nu"), F.col("week").alias("__nw")
    )
    ch = (
        wa.join(
            nxt,
            (F.col("user_id") == F.col("__nu"))
            & (F.col("__nw") == F.col("week") + F.expr("INTERVAL 7 DAYS")),
            "left_anti",
        )
        .select((F.col("week") + F.expr("INTERVAL 7 DAYS")).alias("week"))
        .groupBy("week")
        .agg(F.count("*").cast("bigint").alias("n_churned"))
    )
    return (
        act.join(ch, "week", "left")
        .select(
            F.col("week").cast("timestamp_ntz").alias("week"),
            "n_active",
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce(F.col("n_churned"), F.lit(0)).cast("bigint").alias("n_churned"),
        )
        .orderBy("week")
    )


# ------------------------------------------------------------------
# 5. events_hourly_concentration — traffic-mix concentration by hour
# ------------------------------------------------------------------

EVENTS_HOURLY_CONCENTRATION_ORACLE = """
WITH c AS (
    SELECT CAST(hour(ts) AS BIGINT) AS hour_of_day, event_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
),
h AS (
    -- HUGEINT square-sum mirrors the engine's DECIMAL(38,0): a cell
    -- past ~3e9 events squares out of 64 bits (the CV-overflow class)
    SELECT hour_of_day,
           CAST(SUM(n) AS BIGINT) AS n_events,
           SUM(CAST(n AS HUGEINT) * CAST(n AS HUGEINT)) AS sum_sq,
           CAST(COUNT(*) AS BIGINT) AS n_types
    FROM c GROUP BY 1
),
top AS (
    SELECT hour_of_day, event_type AS top_type FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY hour_of_day
                                     ORDER BY n DESC, event_type ASC) AS rn
        FROM c
    ) WHERE rn = 1
)
SELECT h.hour_of_day AS hour_of_day, n_events, n_types, t.top_type,
       CAST(sum_sq AS DOUBLE) / (CAST(n_events AS DOUBLE) * CAST(n_events AS DOUBLE))
           AS simpson,
       (CAST(n_events AS DOUBLE) * CAST(n_events AS DOUBLE)) / CAST(sum_sq AS DOUBLE)
           AS effective_types
FROM h JOIN top t ON h.hour_of_day = t.hour_of_day
ORDER BY hour_of_day ASC
"""


def events_hourly_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic-mix concentration by hour of day: per hour, total
    events, the dominant event type (count desc, type asc ties), the
    Simpson concentration index Σp² of the type mix, and its inverse
    (the "effective number of types" — 1.0 means one behavior owns
    the hour, n_types means a perfectly even mix). The
    when-does-the-traffic-mix-narrow diagnostic behind alerting
    thresholds that vary by hour; Simpson (exact rational Σc²/T² in
    DECIMAL(38,0) squares and ONE division each way) rather than
    entropy — ln is a libm call the engine boundary forbids, and the
    docs_char_diversity precedent applies verbatim.

    Scale shape: one (hour, type) aggregate with map-side combine
    (24×types rows); everything downstream — hour rollup, argmax
    window — runs at that aggregate cardinality. The (hour, type)
    frame is localCheckpoint-ed: the rollup and the argmax window
    both consume it."""
    c = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.hour(F.col("ts")).cast("bigint").alias("hour_of_day"), F.col("event_type")
        )
        .agg(F.count("*").cast("bigint").alias("n"))
        .localCheckpoint(eager=True)
    )
    # DECIMAL square-sum via the shared moment helper, not int64: an
    # hour-type cell past ~3e9 events squares out of 64 bits (the r12
    # skew-probe CV overflow class); exact to ~1e19 events per cell
    # in 38 digits (functions/moments.py)
    h = c.groupBy("hour_of_day").agg(
        F.sum("n").cast("bigint").alias("n_events"),
        sum_sq_dec(F.col("n")).alias("sum_sq"),
        F.count("*").cast("bigint").alias("n_types"),
    )
    w = Window.partitionBy("hour_of_day").orderBy(F.col("n").desc(), F.col("event_type").asc())
    top = (
        c.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("hour_of_day", F.col("event_type").alias("top_type"))
    )
    ne = F.col("n_events").cast("double")
    return (
        h.join(top, "hour_of_day")
        .select(
            "hour_of_day",
            "n_events",
            "n_types",
            "top_type",
            (F.col("sum_sq").cast("double") / (ne * ne)).alias("simpson"),
            ((ne * ne) / F.col("sum_sq").cast("double")).alias("effective_types"),
        )
        .orderBy("hour_of_day")
    )


# ------------------------------------------------------------------
# Registration (round 12 drain — all five preview-verified at
# sf0.001/0.01/0.1 in tests/test_oracle_parity.py before this point)
# ------------------------------------------------------------------

from lakehouse_architecture_transaction_spark.plans.registry import register  # noqa: E402

register("part_price_dispersion_by_type", oracle=PART_PRICE_DISPERSION_ORACLE)(
    part_price_dispersion_by_type
)
register("events_usertype_overlap", oracle=EVENTS_USERTYPE_OVERLAP_ORACLE)(
    events_usertype_overlap
)
register("lineitem_discount_profile", oracle=LINEITEM_DISCOUNT_PROFILE_ORACLE)(
    lineitem_discount_profile
)
register("events_growth_accounting", oracle=EVENTS_GROWTH_ACCOUNTING_ORACLE)(
    events_growth_accounting
)
register("events_hourly_concentration", oracle=EVENTS_HOURLY_CONCENTRATION_ORACLE)(
    events_hourly_concentration
)
