"""Queued round-10 registrations: two new training-data operators.

- docs_priority_sample — priority sampling (Duffield–Lund–Thorup):
  weighted sampling without replacement with an unbiased subset-sum
  estimator, transcendental-free so the ranking replays bit-exact in
  any SQL engine (operators/sampling.py priority_sample).
- docs_dup_spans — duplicate-substring coverage (the Lee et al. 2022
  window-granular dedup signal): per-doc interval-union coverage of
  50-char windows that occur elsewhere in the corpus
  (operators/dedup.py dup_span_coverage).
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
    SELECT doc_id, i, substr(text, i, {_SPAN_W}) AS w
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

    Scale shape: position enumeration is row-local; ONE shuffle keyed
    on the window content with map-side combine (at 100 TB the key
    would be xxhash64(window) — same plan, 6× less shuffle); span
    merge is a per-doc lag+cumsum at duplicated-position
    cardinality.""".format(w=_SPAN_W)
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
