"""Time-series diagnostics over daily aggregate frames.

Two kernels a revenue/traffic analytics user reaches for once a daily
series exists (the reference stops at plain daily aggregates —
scripts/glue/script.py writes partitioned facts and leaves analysis to
Athena; these are the standard next questions asked OF those facts):

- ``seasonal_decompose`` — classical additive decomposition
  (trend / seasonal / residual) with a centered moving average and
  per-phase seasonal means.
- ``lagged_autocorr`` — Pearson autocorrelation of the series at lags
  1..k, the seasonality/persistence detector.
- ``grouped_linreg`` — per-group OLS trend lines from exact integer
  moments (one aggregate, no windows), for drift detection across
  thousands of groups at once.

Both kernels follow the house exact-engine-boundary rule: every
aggregate is computed on exact BIGINT inputs (counts, or money floored
to coarse exact units by the caller), and each output double is ONE
fixed chain of correctly-rounded IEEE ops (divide, subtract, sqrt) on
those exact integers — so an independent SQL engine replays the values
bit-for-bit. No transcendental calls (no ln/exp — libm last-ulp
behavior is engine-specific); sqrt IS exact (correctly rounded by
IEEE 754 in every engine).

Scale shape: both kernels run at DAILY cardinality — the input is an
already-aggregated (day, value) frame (days, not events: thousands of
rows at any SF), so the unpartitioned ordered window / self-join here
is bounded by the calendar, not the data volume. The raw-fact
aggregation that produces the input is the caller's map-side-combined
groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: 1970-01-01 was a Thursday; (epoch_days + 3) % 7 == 0 on Mondays, so
#: phase 0..6 reads Monday..Sunday when period == 7.
_ISO_MONDAY_OFFSET = 3


def seasonal_decompose(
    daily: DataFrame,
    day_col: str,
    value_col: str,
    period: int = 7,
) -> DataFrame:
    """Additive decomposition value = trend + seasonal + residual.

    ``daily`` must hold one row per calendar day with an exact-integer
    ``value_col`` (a count, or money pre-floored to exact units).
    Classical method, exactness-adapted:

    - trend      = centered ``period``-day moving average, only where
      the RANGE window (on epoch days — calendar gaps do NOT slide
      neighbours in, unlike a ROWS frame) holds all ``period`` days;
      kept as the exact integer window sum ``trend_num`` divided once.
    - detrended  = value − trend = (period·value − trend_num) / period;
      the numerator is an exact BIGINT, so per-phase seasonal means are
      sums of exact integers divided once:
      seasonal = Σ detr_num / (period · n_phase).
    - residual   = detr_num/period − seasonal — one subtraction of two
      deterministic doubles.

    Phase is (epoch_days + 3) mod period — ISO weekday (0 = Monday)
    when period is 7. Seasonal means are left uncentered (their
    weighted mean is ~0 by construction of the detrending; subtracting
    it exactly would need order-dependent double sums, which the
    engine boundary forbids).

    Exactness bound: period · |value| · days must stay inside int64 —
    satisfied by any daily count/coarse-unit series (2^63 ≈ 9.2e18).
    """
    half = period // 2
    ed = F.datediff(F.col(day_col).cast("date"), F.to_date(F.lit("1970-01-01")))
    w = Window.orderBy("__ed").rangeBetween(-half, half)
    base = daily.select(
        F.col(day_col),
        F.col(value_col).cast("long").alias("__v"),
        ed.cast("long").alias("__ed"),
    )
    centered = (
        base.withColumn("__trend_num", F.sum("__v").over(w))
        .withColumn("__n_win", F.count("*").over(w))
        .filter(F.col("__n_win") == period)
        .withColumn("__detr_num", F.lit(period) * F.col("__v") - F.col("__trend_num"))
        .withColumn("phase", F.pmod(F.col("__ed") + _ISO_MONDAY_OFFSET, F.lit(period)))
    )
    # Consumed by two branches (per-phase means + the join-back): cut
    # the shared subtree so the windowed pass runs once.
    centered = centered.localCheckpoint(eager=True)
    seasonal = centered.groupBy("phase").agg(
        F.sum("__detr_num").alias("__s_num"), F.count("*").alias("__n_phase")
    )
    p = float(period)
    return (
        centered.join(F.broadcast(seasonal), "phase")
        .select(
            F.col(day_col),
            F.col("__v").alias(value_col),
            "phase",
            (F.col("__trend_num").cast("double") / F.lit(p)).alias("trend"),
            (
                F.col("__s_num").cast("double")
                / (F.lit(p) * F.col("__n_phase").cast("double"))
            ).alias("seasonal"),
            (
                F.col("__detr_num").cast("double") / F.lit(p)
                - F.col("__s_num").cast("double")
                / (F.lit(p) * F.col("__n_phase").cast("double"))
            ).alias("residual"),
        )
    )


def lagged_autocorr(
    daily: DataFrame,
    day_col: str,
    value_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """Pearson autocorrelation r(k) for k = 1..``max_lag``.

    Pairs are matched on CALENDAR distance (epoch_days + k), so gap
    days produce fewer pairs rather than silently pairing
    non-adjacent rows. Per lag, the five moments n, Σx, Σy, Σxy, Σx²,
    Σy² are exact BIGINT sums (caller keeps |value| small enough that
    value²·days < 2^63 — e.g. daily revenue floored to hundred-dollar
    units), and

        r = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − Σx²)·(n·Σy² − Σy²))

    is computed from those exact integers in one fixed double chain
    (two products, one sqrt, one division). Degenerate lags (either
    side constant, or < 3 pairs) return NULL rather than 0/0.

    Scale shape: the series is exploded ×max_lag (days·k rows) and
    equi-joined on the shifted day key — one shuffle at calendar
    cardinality; every aggregate is map-side combinable.
    """
    ed = F.datediff(F.col(day_col).cast("date"), F.to_date(F.lit("1970-01-01")))
    # Both the exploded left side and the join's right side consume this
    # frame — cut the shared subtree so the caller's raw-fact scan and
    # aggregate run once, not once per branch (the frame itself is tiny:
    # calendar cardinality).
    base = daily.select(
        ed.cast("long").alias("__ed"), F.col(value_col).cast("long").alias("__v")
    ).localCheckpoint(eager=True)
    lagged = base.withColumn(
        "lag", F.explode(F.sequence(F.lit(1), F.lit(max_lag)))
    ).select(
        F.col("lag"), (F.col("__ed") + F.col("lag")).alias("__ed2"), F.col("__v").alias("__x")
    )
    pairs = lagged.join(
        base.select(F.col("__ed").alias("__ed2"), F.col("__v").alias("__y")), "__ed2"
    )
    m = pairs.groupBy("lag").agg(
        F.count("*").alias("n_pairs"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
    )
    n = F.col("n_pairs")
    num = (n * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast("double")
    d1 = (n * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast("double")
    d2 = (n * F.col("__syy") - F.col("__sy") * F.col("__sy")).cast("double")
    r = F.when(
        (n >= 3) & (d1 > 0) & (d2 > 0), num / F.sqrt(d1 * d2)
    )
    return m.select("lag", "n_pairs", r.alias("autocorr"))


def grouped_linreg(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group ordinary-least-squares line y = slope·x + intercept.

    The grouped trend detector (is this supplier's lead time drifting
    up? is this source's quality decaying?): both coordinates must be
    exact integers (days, counts, coarse money units) so the five
    moments n, Σx, Σy, Σxy, Σx² are exact BIGINT sums, and

        slope     = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²)
        intercept = (Σy − slope·Σx) / n

    are fixed double chains on those integers — engine-replayable.
    Degenerate groups (x constant, or < 2 points) yield NULL slope and
    intercept rather than 0/0.

    Exactness bound: per-group n·Σx² and Σx·Σy must stay inside int64
    — keep x small (e.g. days since the dataset epoch, not 1970) for
    wide groups. Scale shape: ONE map-side-combinable aggregate at
    group cardinality; no windows, no self-joins.
    """
    m = df.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.count("*").alias("n_points"),
        F.sum(F.col(x_col).cast("long")).alias("__sx"),
        F.sum(F.col(y_col).cast("long")).alias("__sy"),
        F.sum(F.col(x_col).cast("long") * F.col(y_col).cast("long")).alias("__sxy"),
        F.sum(F.col(x_col).cast("long") * F.col(x_col).cast("long")).alias("__sxx"),
    )
    n = F.col("n_points")
    d = (n * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast("double")
    num = (n * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast("double")
    with_slope = m.withColumn("slope", F.when((n >= 2) & (d > 0), num / d))
    intercept = F.when(
        F.col("slope").isNotNull(),
        (F.col("__sy").cast("double") - F.col("slope") * F.col("__sx").cast("double"))
        / n.cast("double"),
    )
    return with_slope.select(
        *group_cols, "n_points", "slope", intercept.alias("intercept")
    )
