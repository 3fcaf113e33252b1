"""Queued round-10 registrations: training-data + diagnostics operators.

- docs_priority_sample — priority sampling (Duffield–Lund–Thorup):
  weighted sampling without replacement with an unbiased subset-sum
  estimator, transcendental-free so the ranking replays bit-exact in
  any SQL engine (operators/sampling.py priority_sample).
- docs_dup_spans — duplicate-substring coverage (the Lee et al. 2022
  window-granular dedup signal): per-doc interval-union coverage of
  50-char windows that occur elsewhere in the corpus
  (operators/dedup.py dup_span_coverage).
- docs_split_leakage — near-dup pairs classified by the train/val/test
  splits of their endpoints: the eval-contamination audit (composes
  the memoized LSH pair frame with hash_split).
- catalog_inclusion_profile — inclusion-dependency (FK) discovery:
  distinct counts + containment coefficients per candidate edge, with
  a negative control (the data-discovery crawler's join-key proposer).
- events_seasonal_decompose — classical additive trend/seasonal/
  residual on daily event volume (operators/timeseries.py).
- orders_revenue_autocorr — Pearson autocorrelation of daily revenue
  at lags 1..7, exact hundred-dollar-unit moments
  (operators/timeseries.py lagged_autocorr).
- docs_vocab_growth — Heaps-law vocabulary growth at 8 doc-id cuts
  (operators/text.py vocab_growth).
- docs_source_distinctive_terms — per-source top-10 tokens by exact
  lift (operators/text.py source_distinctive_terms).
- events_stream_sessions_stateful — the HOUSE applyInPandasWithState
  sessionizer (S2, streaming/pipeline.py sessionize_stateful) as a
  bounded availableNow run over a time-ordered staged zone with a
  per-user sentinel, value-checked against the same lag+cumsum SQL
  as the native-engine twin (added round 9; the last streaming
  component without a driver-checkable companion).

All nine are oracle-previewed cell-exact at sf0.001/0.01/0.1
(tests/test_oracle_parity.py) and degenerate-input pinned
(tests/test_empty_inputs.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_architecture_transaction_spark.catalog import load_table

# ------------------------------------------------------------------
# 1. docs_priority_sample — weighted sample + unbiased estimator
# ------------------------------------------------------------------

_PS_K = 50
_PS_SALT = "priority-v1"

DOCS_PRIORITY_SAMPLE_ORACLE = f"""
WITH scored AS (
    SELECT doc_id, source, n_chars,
           CAST(n_chars AS DOUBLE) /
             ((CAST(('0x' || substr(md5('{_PS_SALT}' || '-' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS DOUBLE) + 1.0)
              / 4294967296.0) AS priority
    FROM documents
),
r AS (
    SELECT *, ROW_NUMBER() OVER (ORDER BY priority DESC, doc_id ASC) AS rn FROM scored
),
tau AS (
    SELECT CASE WHEN COUNT(*) > {_PS_K} THEN MIN(priority) ELSE 0.0 END AS tau
    FROM r WHERE rn <= {_PS_K + 1}
)
SELECT doc_id, source, n_chars, priority,
       GREATEST(CAST(n_chars AS DOUBLE), tau) AS est_weight
FROM r, tau
WHERE rn <= {_PS_K}
ORDER BY priority DESC, doc_id ASC
"""


def docs_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sampling over the corpus, weighted by document length
    (operators/sampling.py priority_sample — Duffield–Lund–Thorup,
    JACM 2007): the k={k} highest-priority docs (q = w/u, u md5-derived
    in (0,1]) plus the unbiased subset-sum estimator est_weight =
    max(w, τ) against the (k+1)-th priority τ. The length-weighted
    sample is the char-budget-proportional corpus slice a training mix
    draws; Σ est_weight over ANY subset of the sample estimates that
    subset's true total chars unbiasedly. Chosen over
    Efraimidis–Spirakis u^(1/w) keys because the priority is ONE IEEE
    division of exact doubles — no pow/log — so the oracle replays the
    exact ranking and estimates bit-for-bit.

    Scale shape: TakeOrderedAndProject top-(k+1) (per-partition heaps,
    no global sort), τ broadcasts from a (k+1)-row frame.""".format(k=_PS_K)
    from lakehouse_architecture_transaction_spark.operators.sampling import priority_sample

    docs = load_table(spark, sf_dir, "documents", spread=True).select(
        "doc_id", "source", "n_chars"
    )
    return (
        priority_sample(docs, id_col="doc_id", weight_col="n_chars", k=_PS_K, salt=_PS_SALT)
        .select("doc_id", "source", "n_chars", "priority", "est_weight")
        .orderBy(F.col("priority").desc(), F.col("doc_id").asc())
    )


# ------------------------------------------------------------------
# 2. docs_dup_spans — duplicate-substring coverage per document
# ------------------------------------------------------------------

_SPAN_W = 50

DOCS_DUP_SPANS_ORACLE = f"""
WITH pos AS (
    SELECT doc_id, i, md5(substr(text, i, {_SPAN_W})) AS w
    FROM (
        SELECT doc_id, text,
               unnest(generate_series(1,
                   CASE WHEN length(text) >= {_SPAN_W}
                        THEN length(text) - {_SPAN_W - 1} ELSE 0 END)) AS i
        FROM documents
    )
),
dup AS (SELECT w FROM pos GROUP BY w HAVING COUNT(*) >= 2),
dpos AS (SELECT p.doc_id, p.i FROM pos p JOIN dup d USING (w)),
marked AS (
    SELECT doc_id, i,
           CASE WHEN i - LAG(i) OVER (PARTITION BY doc_id ORDER BY i ASC) > {_SPAN_W}
                THEN 1 ELSE 0 END AS new_s
    FROM dpos
),
isl AS (
    SELECT doc_id, i,
           SUM(new_s) OVER (PARTITION BY doc_id ORDER BY i ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
    FROM marked
),
spans AS (
    SELECT doc_id, g, MIN(i) AS lo, MAX(i) AS hi, COUNT(*) AS np
    FROM isl GROUP BY doc_id, g
),
cov AS (
    SELECT doc_id,
           CAST(SUM(np) AS BIGINT) AS n_dup_positions,
           CAST(SUM(hi + {_SPAN_W} - lo) AS BIGINT) AS dup_chars
    FROM spans GROUP BY doc_id
)
SELECT c.doc_id AS doc_id, n_dup_positions, dup_chars,
       CAST(dup_chars AS DOUBLE) / CAST(d.n_chars AS DOUBLE) AS dup_frac
FROM cov c JOIN documents d ON c.doc_id = d.doc_id
ORDER BY c.doc_id ASC
"""


def docs_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-granular duplicate-text audit (operators/dedup.py
    dup_span_coverage — the Lee et al. 2022 ExactSubstr signal at
    {w}-char windows): per document, the positions whose {w}-char
    window occurs anywhere else in the corpus, merged into maximal
    spans (interval union), with covered-character count and coverage
    fraction. This is the signal that separates "drop the whole doc"
    (high coverage) from "redact the copied span" (low coverage,
    long span) — doc-level near-dup scores cannot make that call.

    Scale shape (the r10 REGISTERED production shape, r9 verdict item
    4): position enumeration is row-local; ONE shuffle keyed on
    unhex(md5(window)) — a fixed 16-byte binary instead of the
    {w}-char substring, same equivalence classes (128-bit: ~1e-15
    expected collisions at 10^12 windows, so no confirm pass), and
    the DuckDB oracle replays the identical classes via
    md5(substr(...)); span merge is a per-doc lag+cumsum at
    duplicated-position cardinality.""".format(w=_SPAN_W)
    from lakehouse_architecture_transaction_spark.operators.dedup import dup_span_coverage

    docs = load_table(spark, sf_dir, "documents", spread=True)
    cov = dup_span_coverage(docs, text_col="text", id_col="doc_id", window=_SPAN_W)
    return (
        cov.join(docs.select("doc_id", "n_chars"), "doc_id")
        .select(
            "doc_id",
            "n_dup_positions",
            "dup_chars",
            (F.col("dup_chars").cast("double") / F.col("n_chars").cast("double")).alias(
                "dup_frac"
            ),
        )
        .orderBy("doc_id")
    )


# ------------------------------------------------------------------
# 3. docs_split_leakage — near-dup pairs straddling the train/val split
# ------------------------------------------------------------------

def _split_leakage_oracle() -> str:
    from lakehouse_architecture_transaction_spark.plans.pipeline_ops import (
        _BUCKET_CAP,
        _minhash_oracle,
    )

    pairs_sql = _minhash_oracle().format(cap=_BUCKET_CAP)
    return f"""
    WITH pairs AS ({pairs_sql}),
    spl AS (
        SELECT doc_id,
               CASE WHEN bucket < 9000 THEN 'train'
                    WHEN bucket < 9500 THEN 'val'
                    ELSE 'test' END AS split
        FROM (
            SELECT doc_id,
                   (('0x' || substr(md5('split-v1' || '-' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT) % 10000 AS bucket
            FROM documents
        )
    ),
    cl AS (
        SELECT p.id_a, p.id_b,
               least(a.split, b.split) AS split_a,
               greatest(a.split, b.split) AS split_b
        FROM pairs p
        JOIN spl a ON p.id_a = a.doc_id
        JOIN spl b ON p.id_b = b.doc_id
    ),
    np AS (SELECT split_a, split_b, CAST(COUNT(*) AS BIGINT) AS n_pairs FROM cl GROUP BY 1, 2),
    lg AS (
        SELECT split_a, split_b, id_a AS doc FROM cl
        UNION ALL
        SELECT split_a, split_b, id_b FROM cl
    ),
    nd AS (SELECT split_a, split_b, CAST(COUNT(DISTINCT doc) AS BIGINT) AS n_docs FROM lg GROUP BY 1, 2)
    SELECT np.split_a, np.split_b, np.n_pairs, nd.n_docs
    FROM np JOIN nd USING (split_a, split_b)
    ORDER BY split_a ASC, split_b ASC
    """


DOCS_SPLIT_LEAKAGE_ORACLE = _split_leakage_oracle()


def docs_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-contamination audit: MinHash-LSH near-dup candidate pairs
    classified by which train/val/test splits their endpoints landed
    in (hash_split, salt 'split-v1' — the SAME split every training
    query uses). A ('train','val') or ('train','test') row means the
    held-out set contains near-copies of training documents — the
    leakage that silently inflates eval scores; the n_docs column is
    how many distinct documents sit in each class. Composes the two
    session-memoized frames (candidate pairs, split assignment), so a
    session that already ran the dedup or split queries pays nothing
    new for the audit.

    Scale shape: the pair frame is the capped LSH miner's output
    (bucket-capped, never all-pairs); two id-keyed joins against the
    split frame; both aggregates run at pair/class cardinality. The
    classed frame is localCheckpoint-ed — two branches (pair counts,
    distinct-doc counts) must not re-run the join per branch."""
    from lakehouse_architecture_transaction_spark.operators.sampling import hash_split
    from lakehouse_architecture_transaction_spark.plans.pipeline_ops import _cand_pairs_frame

    docs = load_table(spark, sf_dir, "documents", spread=True)
    splits = hash_split(
        docs.select("doc_id"), id_col="doc_id", weights={"train": 0.9, "val": 0.05, "test": 0.05}
    ).select("doc_id", "split")
    pairs = _cand_pairs_frame(spark, sf_dir)
    sa = splits.select(F.col("doc_id").alias("id_a"), F.col("split").alias("__spa"))
    sb = splits.select(F.col("doc_id").alias("id_b"), F.col("split").alias("__spb"))
    classed = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.least("__spa", "__spb").alias("split_a"),
            F.greatest("__spa", "__spb").alias("split_b"),
        )
        .localCheckpoint(eager=True)
    )
    n_pairs = classed.groupBy("split_a", "split_b").agg(
        F.count("*").cast("bigint").alias("n_pairs")
    )
    long_ = classed.select("split_a", "split_b", F.col("id_a").alias("doc")).unionAll(
        classed.select("split_a", "split_b", F.col("id_b").alias("doc"))
    )
    n_docs = long_.groupBy("split_a", "split_b").agg(
        F.countDistinct("doc").cast("bigint").alias("n_docs")
    )
    return n_pairs.join(n_docs, ["split_a", "split_b"]).orderBy("split_a", "split_b")


# ------------------------------------------------------------------
# 4. catalog_inclusion_profile — inclusion-dependency (FK) discovery
# ------------------------------------------------------------------

#: (child_table, child_col, parent_table, parent_col): the candidate
#: FK edges a catalog crawler would propose. The last entry is a
#: deliberate negative control (overlapping integer ranges, no
#: semantic FK) so the profile demonstrates separation, not just 1.0s.
_INCLUSION_PAIRS: list[tuple[str, str, str, str]] = [
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("events", "user_id", "customer", "c_custkey"),
    ("part", "p_partkey", "orders", "o_orderkey"),
]


def _inclusion_oracle() -> str:
    parts = []
    for ct, cc, pt, pc in _INCLUSION_PAIRS:
        parts.append(f"""
        SELECT '{ct}' AS child_table, '{cc}' AS child_col,
               '{pt}' AS parent_table, '{pc}' AS parent_col,
               CAST((SELECT COUNT(DISTINCT {cc}) FROM {ct} WHERE {cc} IS NOT NULL) AS BIGINT) AS n_child_distinct,
               CAST((SELECT COUNT(DISTINCT {pc}) FROM {pt} WHERE {pc} IS NOT NULL) AS BIGINT) AS n_parent_distinct,
               CAST((SELECT COUNT(*) FROM
                     (SELECT DISTINCT {cc} AS v FROM {ct} WHERE {cc} IS NOT NULL) a
                     JOIN (SELECT DISTINCT {pc} AS v FROM {pt} WHERE {pc} IS NOT NULL) b USING (v)
                    ) AS BIGINT) AS n_common
        """)
    union = " UNION ALL ".join(parts)
    return f"""
    WITH u AS ({union})
    SELECT child_table, child_col, parent_table, parent_col,
           n_child_distinct, n_parent_distinct, n_common,
           CASE WHEN n_child_distinct = 0 THEN 0.0
                ELSE CAST(n_common AS DOUBLE) / CAST(n_child_distinct AS DOUBLE) END AS containment_child,
           CASE WHEN n_parent_distinct = 0 THEN 0.0
                ELSE CAST(n_common AS DOUBLE) / CAST(n_parent_distinct AS DOUBLE) END AS containment_parent
    FROM u
    ORDER BY child_table ASC, child_col ASC, parent_table ASC
    """


CATALOG_INCLUSION_ORACLE = _inclusion_oracle()


def catalog_inclusion_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inclusion-dependency discovery across the catalog (the
    join-graph profiler behind FK inference in data-discovery systems
    — Aurum-style): for each candidate (child_col → parent_col) edge,
    the distinct-value counts of both sides, the size of their
    intersection, and the containment coefficients
    |A∩B|/|A| and |A∩B|/|B|. containment_child == 1.0 recovers every
    true TPC-H FK; the deliberate negative-control edge
    (part.p_partkey → orders.o_orderkey) shows range overlap without
    semantic inclusion. The same profile run on an unknown lake is
    how a crawler proposes join keys.

    Scale shape (r15 rewrite, guide §2.3/§2.4; r16 scan fusion,
    guide §6): per edge the two sides carry a (child, parent)
    membership flag and collapse in ONE value-keyed aggregate —
    MAX(flag) per (edge, value) is the distinct set of each side and
    the intersection at once, with map-side partial aggregation
    (each mapper emits one row per distinct (edge, value) it saw).
    The r14 shape paid two distinct aggregates plus a full-outer
    sort-merge join of the distinct sets per edge; r15 collapsed
    that to one exchange per edge but still scanned every edge side
    separately (16 scans, 8 independent aggregate pipelines). r16
    stacks all edges into ONE (edge, v, flags) frame built from ONE
    scan per table (lineitem's three FK columns ride a single pass,
    orders/customer/part/supplier/nation each fold their child and
    parent roles into one scan) and collapses the whole profile in
    one (edge, v) exchange + one 8-row summary aggregate. At 100 TB
    this is the difference between 16 full table passes and 7.
    Counts are exact BIGINTs; the containments are single double
    divisions of exact ints. Edges with empty inputs keep their
    (0, 0, 0) row via the left join from the 8-row edge spine."""
    from collections import defaultdict

    # one scan per table: every (edge, column, role) on that table is
    # emitted by a single explode over per-edge structs
    by_table: dict[str, list[tuple[int, str, int, int]]] = defaultdict(list)
    for i, (ct, cc, pt, pc) in enumerate(_INCLUSION_PAIRS):
        by_table[ct].append((i, cc, 1, 0))
        by_table[pt].append((i, pc, 0, 1))
    frames = []
    for tbl, sides in by_table.items():
        rows = F.array(
            *[
                F.struct(
                    F.lit(e).alias("e"),
                    F.col(c).cast("long").alias("v"),
                    F.lit(is_c).alias("__c"),
                    F.lit(is_p).alias("__p"),
                )
                for e, c, is_c, is_p in sides
            ]
        )
        frames.append(
            load_table(spark, sf_dir, tbl)
            .select(F.explode(rows).alias("x"))
            .select("x.*")
            .filter(F.col("v").isNotNull())
        )
    from functools import reduce

    counts = (
        reduce(lambda a, b: a.unionAll(b), frames)
        .groupBy("e", "v")
        .agg(F.max("__c").alias("__c"), F.max("__p").alias("__p"))
        .groupBy("e")
        .agg(
            F.sum("__c").cast("bigint").alias("__nc"),
            F.sum("__p").cast("bigint").alias("__np"),
            F.sum(F.col("__c") * F.col("__p")).cast("bigint").alias("__ncommon"),
        )
    )
    spine = spark.createDataFrame(
        [(i, ct, cc, pt, pc) for i, (ct, cc, pt, pc) in enumerate(_INCLUSION_PAIRS)],
        "e int, child_table string, child_col string, parent_table string, parent_col string",
    )
    u = spine.join(F.broadcast(counts), "e", "left").select(
        "child_table",
        "child_col",
        "parent_table",
        "parent_col",
        F.coalesce(F.col("__nc"), F.lit(0)).cast("bigint").alias("n_child_distinct"),
        F.coalesce(F.col("__np"), F.lit(0)).cast("bigint").alias("n_parent_distinct"),
        F.coalesce(F.col("__ncommon"), F.lit(0)).cast("bigint").alias("n_common"),
    )
    return (
        u.select(
            "*",
            F.when(F.col("n_child_distinct") == 0, F.lit(0.0))
            .otherwise(
                F.col("n_common").cast("double") / F.col("n_child_distinct").cast("double")
            )
            .alias("containment_child"),
            F.when(F.col("n_parent_distinct") == 0, F.lit(0.0))
            .otherwise(
                F.col("n_common").cast("double") / F.col("n_parent_distinct").cast("double")
            )
            .alias("containment_parent"),
        )
        .orderBy("child_table", "child_col", "parent_table")
    )


# ------------------------------------------------------------------
# 5. events_seasonal_decompose — trend / weekday seasonal / residual
# ------------------------------------------------------------------

EVENTS_SEASONAL_DECOMPOSE_ORACLE = """
WITH daily AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1
),
e AS (
    SELECT day, n_events,
           date_diff('day', DATE '1970-01-01', CAST(day AS DATE)) AS ed
    FROM daily
),
w AS (
    SELECT *, SUM(n_events) OVER win AS trend_num, COUNT(*) OVER win AS n_win
    FROM e WINDOW win AS (ORDER BY ed RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
c AS (
    SELECT day, n_events, trend_num,
           7 * n_events - trend_num AS detr_num,
           (ed + 3) % 7 AS phase
    FROM w WHERE n_win = 7
),
s AS (SELECT phase, SUM(detr_num) AS s_num, COUNT(*) AS n_phase FROM c GROUP BY 1)
SELECT c.day AS day, c.n_events AS n_events, CAST(c.phase AS BIGINT) AS phase,
       CAST(trend_num AS DOUBLE) / 7.0 AS trend,
       CAST(s_num AS DOUBLE) / (7.0 * CAST(n_phase AS DOUBLE)) AS seasonal,
       CAST(detr_num AS DOUBLE) / 7.0
           - CAST(s_num AS DOUBLE) / (7.0 * CAST(n_phase AS DOUBLE)) AS residual
FROM c JOIN s USING (phase)
ORDER BY day ASC
"""


def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of the daily event volume
    (operators/timeseries.py seasonal_decompose): centered 7-day
    moving-average trend (RANGE window on epoch days — calendar gaps
    do not slide neighbours in), per-ISO-weekday seasonal means of the
    exact detrended numerators, residual as one double subtraction.
    phase 0..6 = Monday..Sunday. Only days with a full 7-day window
    appear (the decomposition is undefined at the edges). The
    is-Monday-traffic-really-higher / was-that-day-actually-anomalous
    triage every daily series eventually needs — MAD (events_mad_*)
    flags outliers, this explains them.

    Engine boundary: every aggregate (window sum, per-phase sum) is an
    exact BIGINT; trend/seasonal/residual are fixed chains of
    correctly-rounded IEEE ops on those integers — bit-replayable.

    Scale shape: the raw-event groupBy is map-side combined; the
    ordered window and everything after run at DAY cardinality
    (bounded by the calendar, not data volume)."""
    from lakehouse_architecture_transaction_spark.operators.timeseries import seasonal_decompose

    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.count("*").cast("long").alias("n_events")
    )
    dec = seasonal_decompose(daily, "day", "n_events", period=7)
    return dec.select(
        F.col("day").cast("timestamp_ntz").alias("day"),
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("phase").cast("bigint").alias("phase"),
        "trend",
        "seasonal",
        "residual",
    ).orderBy("day")


# ------------------------------------------------------------------
# 6. orders_revenue_autocorr — lag-1..7 revenue autocorrelation
# ------------------------------------------------------------------

ORDERS_REVENUE_AUTOCORR_ORACLE = """
WITH daily AS (
    SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
           SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
    FROM orders GROUP BY 1
),
h AS (
    SELECT date_diff('day', DATE '1970-01-01', CAST(day AS DATE)) AS ed,
           CAST(rev * 100 AS BIGINT) // 10000 AS v
    FROM daily
),
l AS (
    SELECT k.lag AS lag, h.ed + k.lag AS ed2, h.v AS x
    FROM h, (SELECT unnest(generate_series(1, 7)) AS lag) k
),
p AS (SELECT l.lag, l.x, h2.v AS y FROM l JOIN h h2 ON l.ed2 = h2.ed),
m AS (
    SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
           SUM(x*x) AS sxx, SUM(y*y) AS syy
    FROM p GROUP BY 1
)
SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
       CASE WHEN n_pairs >= 3
                 AND n_pairs * sxx - sx * sx > 0
                 AND n_pairs * syy - sy * sy > 0
            THEN CAST(n_pairs * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
                        * CAST(n_pairs * syy - sy * sy AS DOUBLE))
            END AS autocorr
FROM m
ORDER BY lag ASC
"""


def orders_revenue_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson autocorrelation of daily order revenue at lags 1..7
    (operators/timeseries.py lagged_autocorr) — the
    does-revenue-have-a-weekly-pulse / how-persistent-is-demand
    detector, and the quantitative cousin of orders_weekday_profile.
    Pairs match on CALENDAR distance (epoch-day + k), so missing days
    shrink n_pairs instead of silently pairing non-adjacent rows.

    Engine boundary: daily revenue crosses to the moment sums as
    exact hundred-dollar BIGINT units (DECIMAL cent sum → ×100 →
    BIGINT → floor-div 10⁴ — the gini cent discipline, coarsened so
    every moment Σx², Σxy stays far inside int64 at bench scales),
    and r is one fixed double chain (two products, sqrt, divide) on
    exact integers. Constant/short series yield NULL, not 0/0.

    Scale shape: groupBy day (map-side combined), then a ×7 explode
    and one equi-join + aggregate at CALENDAR cardinality."""
    from lakehouse_architecture_transaction_spark.operators.timeseries import lagged_autocorr

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("day")).agg(
        F.expr("SUM(CAST(o_totalprice AS DECIMAL(18,2)))").alias("__rev")
    )
    daily = daily.select(
        "day", F.expr("CAST(__rev * 100 AS BIGINT) div 10000").alias("rev_h")
    )
    return (
        lagged_autocorr(daily, "day", "rev_h", max_lag=7)
        .select(F.col("lag").cast("bigint").alias("lag"), "n_pairs", "autocorr")
        .orderBy("lag")
    )


# ------------------------------------------------------------------
# 7. docs_vocab_growth — Heaps-law vocabulary growth curve
# ------------------------------------------------------------------

_LOWER_TOKENS_SQL = (
    "list_transform(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != ''),"
    " t -> lower(t))"
)

DOCS_VOCAB_GROWTH_ORACLE = f"""
WITH mx AS (SELECT MAX(doc_id) AS max_id FROM documents),
cuts AS (
    SELECT i AS ckpt, (max_id * i) // 8 AS cut_doc_id
    FROM mx, (SELECT unnest(generate_series(1, 8)) AS i)
),
pd AS (SELECT doc_id, len({_LOWER_TOKENS_SQL}) AS n_tok FROM documents),
nd AS (
    SELECT c.ckpt, c.cut_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM pd JOIN cuts c ON pd.doc_id <= c.cut_doc_id
    GROUP BY 1, 2
),
fo AS (
    SELECT tok, MIN(doc_id) AS first_doc
    FROM (SELECT doc_id, unnest({_LOWER_TOKENS_SQL}) AS tok FROM documents)
    GROUP BY 1
),
vd AS (
    SELECT c.ckpt, CAST(COUNT(*) AS BIGINT) AS n_distinct_tokens
    FROM fo JOIN cuts c ON fo.first_doc <= c.cut_doc_id
    GROUP BY 1
)
SELECT CAST(nd.ckpt AS BIGINT) AS ckpt, nd.cut_doc_id AS cut_doc_id,
       n_docs, n_tokens,
       CAST(COALESCE(vd.n_distinct_tokens, 0) AS BIGINT) AS n_distinct_tokens,
       CASE WHEN n_tokens > 0
            THEN CAST(COALESCE(vd.n_distinct_tokens, 0) AS DOUBLE) / CAST(n_tokens AS DOUBLE)
            ELSE 0.0 END AS type_token_ratio
FROM nd LEFT JOIN vd ON nd.ckpt = vd.ckpt
ORDER BY ckpt ASC
"""


def docs_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary-growth curve (operators/text.py
    vocab_growth): total vs DISTINCT lowercased tokens in the corpus
    prefix doc_id ≤ tᵢ at 8 evenly spaced cuts, with the type-token
    ratio. Sub-linear distinct growth is the healthy Heaps shape;
    near-linear growth flags unbounded novel vocabulary (OCR noise,
    IDs) and a flat curve flags heavy repetition — the triage chart
    read before training a tokenizer on a new corpus.

    Scale shape: distinct counting never rescans per cut — a token is
    in V(t) iff its min doc_id ≤ t, so ONE vocab-cardinality
    aggregate (map-side combined) serves all 8 cuts; totals are
    row-local size(); the 8-row cut frame broadcasts (and is
    localCheckpoint-ed: three branches must not re-run the max scan)."""
    from lakehouse_architecture_transaction_spark.operators.text import vocab_growth

    docs = load_table(spark, sf_dir, "documents", spread=True)
    return vocab_growth(docs, id_col="doc_id", text_col="text", n_checkpoints=8).orderBy(
        "ckpt"
    )


# ------------------------------------------------------------------
# 8. docs_source_distinctive_terms — per-source lift keywords
# ------------------------------------------------------------------

DOCS_DISTINCTIVE_TERMS_ORACLE = f"""
WITH st AS (
    SELECT source, tok AS token, CAST(COUNT(*) AS BIGINT) AS n_in_source
    FROM (SELECT source, unnest({_LOWER_TOKENS_SQL}) AS tok FROM documents)
    GROUP BY 1, 2
),
tg AS (SELECT token, SUM(n_in_source) AS n_in_corpus FROM st GROUP BY 1),
stt AS (SELECT source, SUM(n_in_source) AS t_s FROM st GROUP BY 1),
tot AS (SELECT SUM(n_in_source) AS big_t FROM st),
lf AS (
    SELECT st.source, st.token, st.n_in_source, tg.n_in_corpus,
           CAST(st.n_in_source * tot.big_t AS DOUBLE)
               / CAST(stt.t_s * tg.n_in_corpus AS DOUBLE) AS lift
    FROM st
    JOIN tg USING (token)
    JOIN stt USING (source)
    CROSS JOIN tot
    WHERE tg.n_in_corpus >= 5
),
r AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY lift DESC, token ASC) AS rank
    FROM lf
)
SELECT source, CAST(rank AS BIGINT) AS rank, token,
       CAST(n_in_source AS BIGINT) AS n_in_source,
       CAST(n_in_corpus AS BIGINT) AS n_in_corpus, lift
FROM r WHERE rank <= 10
ORDER BY source ASC, rank ASC
"""


def docs_source_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinctive vocabulary (operators/text.py
    source_distinctive_terms): top-10 tokens per source by exact lift
    (c_s·T)/(t_s·c_corpus) — the over-representation ratio, one double
    division of exact BIGINT products (log-odds would rank identically
    but drags libm across the engine boundary). Global count < 5
    tokens are dropped so hapax noise can't own the lists. This is
    the corpus-mixture drift report: what each source contributes
    that the others don't — read next to docs_temperature_mixture
    when rebalancing a training mix.

    Scale shape: one explode into a (source, token) aggregate with
    map-side combine; the global/per-source/corpus totals are
    re-aggregations of that frame (localCheckpoint-ed — three
    consuming branches); the rank window runs per source at
    per-source vocabulary cardinality."""
    from lakehouse_architecture_transaction_spark.operators.text import (
        source_distinctive_terms,
    )

    docs = load_table(spark, sf_dir, "documents", spread=True)
    return source_distinctive_terms(
        docs, id_col="doc_id", text_col="text", group_col="source", k=10, min_corpus_count=5
    ).orderBy("source", "rank")


# ------------------------------------------------------------------
# 9. events_stream_sessions_stateful — the HOUSE applyInPandasWithState
#    sessionizer (S2) as a driver-checkable query
# ------------------------------------------------------------------
#
# The last streaming component without a registered companion: S8
# covered the NATIVE session_window engine; this covers the custom
# stateful operator itself. Determinism without relying on timer
# timing: the landing zone is staged as time-ordered event slices
# (ascending file names AND mtimes, one file per micro-batch) plus a
# FINAL sentinel file carrying one far-future event per user. The
# sentinel exceeds every possible gap, so the state function closes
# each user's open tail INLINE on the data path (streaming/pipeline.py
# _make_session_fn: `ts_us - end_us > gap` → emit) — no reliance on
# event-time timers firing before shutdown. Mid-replay timer firings
# are consistent by construction: a timer fires only when
# watermark > end + gap, and every future event's ts exceeds the
# watermark (time-ordered slices), so any timer-emitted session would
# have been split at the same boundary by the data path. The emitted
# set is therefore EXACTLY the batch gap-sessionization of the real
# events; the sentinel sessions stay open in state and never emit.

_SFS_MEMO: dict[tuple[str, str], str] = {}
_SFS_SLICES = 6


def _stateful_sessions_src(spark: SparkSession, sf_dir: str) -> str:
    """Stage (once per app+sf_dir) the events table as 6 time-ordered
    slices + 1 sentinel file (one event per user, 1 day past the max
    ts — beyond any gap), names and mtimes ascending so the file
    source replays them in event-time order."""
    import atexit
    import os
    import shutil
    import tempfile

    key = (spark.sparkContext.applicationId, sf_dir)
    src = _SFS_MEMO.get(key)
    if src is not None:
        return src
    src = tempfile.mkdtemp(prefix="lakehouse_architecture_transaction_sessfn_")
    atexit.register(shutil.rmtree, src, ignore_errors=True)
    ev = load_table(spark, sf_dir, "events")
    # 1-ROW aggregate collect at memo time (slice boundaries for the
    # replay harness) — not a data collect; the staged zone itself is
    # written distributed.
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    stage = tempfile.mkdtemp(prefix="lakehouse_architecture_transaction_sessfn_stage_")
    atexit.register(shutil.rmtree, stage, ignore_errors=True)

    def _ship(df, i: int) -> None:
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = [f for f in os.listdir(stage) if f.startswith("part-") and f.endswith(".parquet")]
        dst = os.path.join(src, f"slice_{i:02d}.parquet")
        shutil.copyfile(os.path.join(stage, part[0]), dst)
        os.utime(dst, (1_700_000_000 + i * 60,) * 2)

    if lo is None:
        _ship(ev, 0)  # empty corpus: one empty, schema-bearing file
        _SFS_MEMO[key] = src
        return src
    span = (hi - lo) / _SFS_SLICES

    def _ntz(dt):
        # ts is TIMESTAMP_NTZ: the boundary must be built WITHOUT any
        # timezone hop. F.lit(datetime) converts the naive value to an
        # instant via the PYTHON-side zone while a later cast/coercion
        # renders in the SESSION zone — under a non-UTC driver the
        # round-trip shifts by the offset and silently cut the last
        # <offset> hours of events out of the final slice (5 dropped
        # rows, 5 missing sessions under America/New_York; pinned by
        # the companion's non-UTC oracle test). A string parsed as
        # TIMESTAMP_NTZ is wall-clock on both ends.
        return F.lit(dt.isoformat(sep=" ")).cast("timestamp_ntz")

    for i in range(_SFS_SLICES):
        s, e = lo + i * span, lo + (i + 1) * span
        cond = (F.col("ts") >= _ntz(s)) & (
            (F.col("ts") <= _ntz(hi)) if i == _SFS_SLICES - 1 else (F.col("ts") < _ntz(e))
        )
        _ship(ev.filter(cond), i)
    sentinel = (
        ev.select("user_id")
        .distinct()
        .select(
            F.lit(-1).cast("bigint").alias("event_id"),
            (_ntz(hi) + F.expr("INTERVAL 1 DAY")).alias("ts"),
            F.col("user_id"),
            F.lit("__sentinel__").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
    )
    _ship(sentinel.select([f.name for f in ev.schema.fields]), _SFS_SLICES)
    _SFS_MEMO[key] = src
    return src


def events_stream_sessions_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 as a driver-checkable query: the house applyInPandasWithState
    gap sessionizer (streaming/pipeline.py sessionize_stateful,
    event-time timers, 30-min gap) run as a bounded availableNow
    stream over the time-ordered staged zone, reduced to the
    session-size distribution. A sentinel event per user 1 day past
    the corpus closes every real session on the data path (see module
    comment), so the emitted set equals first-principles batch
    sessionization and the oracle is the same lag+cumsum SQL the
    native-engine twin (events_stream_sessions) is checked against —
    the custom operator and the built-in engine are value-checked
    against the SAME ground truth. Sentinel-started sessions remain
    open in state and are excluded by construction (they never emit).

    Scale shape: state is one (start, end, n) row per LIVE user key
    (measured: tests/test_streaming.py state accounting); the shuffle
    keys on user_id once per micro-batch; Arrow batches the state
    function. Production bounds state by the watermark horizon — the
    sentinel is a replay-harness device, not a deployment pattern."""
    import uuid

    from lakehouse_architecture_transaction_spark.streaming.pipeline import (
        EVENT_SCHEMA,
        gate_state_partitions,
        sessionize_stateful,
    )

    src = _stateful_sessions_src(spark, sf_dir)
    # maxFilesPerTrigger=3 groups adjacent time-ordered slices into 3
    # micro-batches (two 3-slice spans + the sentinel file alone):
    # replay granularity is a harness knob (r10 verdict item 5: the
    # oracle is cell-exact at any batching), and the streaming
    # coverage is preserved — each data batch still crosses slice
    # boundaries mid-session, sessions spanning the s2|s3 boundary
    # still carry state ACROSS batches, and the sentinel still closes
    # every real session from its own later batch. r15 progress-metric
    # measurement: addBatch is ~2 s of fixed cost per batch (state
    # commit + Arrow round trip) even for the 1500-row sentinel batch,
    # so batch count is the whole cost model (was 4 data batches at
    # maxFilesPerTrigger=2).
    raw = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "3")
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    name = f"sessfn_{uuid.uuid4().hex[:8]}"
    # The final NO-DATA micro-batch exists to fire event-time timers
    # once the watermark passes end+gap with no new input. Here it is
    # provably emission-free: the sentinel (1 day past max ts, beyond
    # any gap) closes every REAL session on the data path in the last
    # data batch, and sentinel-started sessions have timer = sentinel
    # ts + gap, which the watermark (sentinel ts − 2 h) never passes —
    # so the empty batch commits state and emits zero rows (~0.9 s of
    # pure overhead, r15 progress metrics). Disable it for this
    # bounded replay, scoped and restored like gate_state_partitions.
    prev_ndmb = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try:
        # Width 16, not the family default 8 (r16, guide §5/§2.6): this
        # replay's per-batch cost is the Arrow state FUNCTION fanned
        # across the state partitions (Python-side work per 1500-key
        # batch), not store commits — wider means more state-fn tasks
        # in flight on 32 cores. Interleaved width probe 8/16/32 =
        # 5.08/4.51/5.18 s min (0.89x at 16; at 32 the doubled store
        # instances' commit overhead overtakes the extra parallelism).
        # Emitted rows are exact at any width, as above.
        with gate_state_partitions(spark, 16):
            q = (
                sessionize_stateful(raw, event_time_gap_s=1800, watermark="2 hours")
                .writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prev_ndmb)
    out = (
        spark.table(name)
        .groupBy(F.col("n_events").cast("int").alias("session_size"))
        .agg(
            F.count("*").cast("bigint").alias("n_sessions"),
            F.sum(F.unix_micros("session_end") - F.unix_micros("session_start"))
            .cast("bigint")
            .alias("total_duration_us"),
        )
        .select(
            "session_size",
            "n_sessions",
            (F.col("total_duration_us").cast("double") / F.lit(1000000.0)).alias(
                "total_duration_s"
            ),
        )
        .orderBy("session_size")
        .localCheckpoint(eager=True)
    )
    spark.catalog.dropTempView(name)
    return out


EVENTS_STREAM_SESSIONS_STATEFUL_ORACLE = """
WITH ordered AS (
    SELECT user_id, ts, event_id,
           CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
                     > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS new_s
    FROM events
), sess AS (
    SELECT user_id, ts,
           SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
    FROM ordered
), s AS (
    SELECT user_id, session_id,
           CAST(COUNT(*) AS INTEGER) AS session_size,
           epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us
    FROM sess GROUP BY user_id, session_id
)
SELECT session_size,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(CAST(SUM(dur_us) AS BIGINT) AS DOUBLE) / 1000000.0 AS total_duration_s
FROM s GROUP BY session_size
ORDER BY session_size ASC
"""


# ------------------------------------------------------------------
# Registrations.
#
# Round 9 (VERDICT r8 item 1's held tenth slot): L91 priority
# sampling became driver-checked.
#
# Round 10 (VERDICT r9 item 1): the remaining eight rows of the
# batch — L92 dup spans, L93 split leakage, E26 inclusion profile,
# A76 seasonal decompose, A77 revenue autocorr, L94 vocab growth,
# L95 distinctive terms, and the S2 stateful-sessionizer companion
# (the last streaming component without a driver row). Eight, not
# the full ≤10 budget: the driver gate hashes 50 queries per round
# staleness-first, and with 47 registered queries last-green at r6
# every extra new registration displaces an r6 re-check — 8 new +
# 42 of the r6 tail fills the gate exactly as VERDICT r9 item 2
# intends (the 5-query remainder clears in r11).
# ------------------------------------------------------------------

from lakehouse_architecture_transaction_spark.plans.registry import register  # noqa: E402

register("docs_priority_sample", oracle=DOCS_PRIORITY_SAMPLE_ORACLE)(docs_priority_sample)
register("docs_dup_spans", oracle=DOCS_DUP_SPANS_ORACLE)(docs_dup_spans)
register("docs_split_leakage", oracle=DOCS_SPLIT_LEAKAGE_ORACLE)(docs_split_leakage)
register("catalog_inclusion_profile", oracle=CATALOG_INCLUSION_ORACLE)(catalog_inclusion_profile)
register("events_seasonal_decompose", oracle=EVENTS_SEASONAL_DECOMPOSE_ORACLE)(
    events_seasonal_decompose
)
register("orders_revenue_autocorr", oracle=ORDERS_REVENUE_AUTOCORR_ORACLE)(
    orders_revenue_autocorr
)
register("docs_vocab_growth", oracle=DOCS_VOCAB_GROWTH_ORACLE)(docs_vocab_growth)
register("docs_source_distinctive_terms", oracle=DOCS_DISTINCTIVE_TERMS_ORACLE)(
    docs_source_distinctive_terms
)
register("events_stream_sessions_stateful", oracle=EVENTS_STREAM_SESSIONS_STATEFUL_ORACLE)(
    events_stream_sessions_stateful
)
