"""Round-14 queue, registered in round 13 (queue drained): catalog FDs,
data selection, ANN QA, classifier calibration.

- catalog_fd_profile — functional-dependency discovery over curated
  determinant → dependent candidates: the within-table companion to
  E26's cross-table inclusion profile, and the profiler that
  DISCOVERS the raw zone's dirty composite PK (the E4 dedup
  rationale) instead of assuming it.
- catalog_column_stats — ANALYZE-style per-column row/null/exact-
  distinct statistics over a curated 17-column set: the CBO /
  data-discovery feed completing the catalog-profiling trio.
- docs_dsir_select — DSIR-style data selection (Xie et al. 2023,
  "Data Selection for Language Models via Importance Resampling"):
  hashed-unigram importance weights of a target slice vs the raw
  corpus, top-k docs by exact-integer importance score.
- emb_matryoshka_recall — truncated-prefix-dimension retrieval QA
  (Kusupati et al. 2022 Matryoshka representation learning): recall@k
  and top-1 preservation of half-dimension cosine search vs the
  full-dimension exact ranking.
- docs_quality_calibration — decile calibration of the algebraic
  logistic quality score against the Gopher rule verdict: the
  is-my-cheap-model-ranked-like-my-rules eval, per-decile pass rates
  over exact NTILE deciles.

All five oracle-previewed cell-exact at sf0.001/0.01/0.1
(tests/test_oracle_parity.py) and degenerate-input pinned
(tests/test_empty_inputs.py).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_architecture_transaction_spark.catalog import load_table
from lakehouse_architecture_transaction_spark.functions.hashing import h32_col
from lakehouse_architecture_transaction_spark.operators.dedup import tokens_expr
from lakehouse_architecture_transaction_spark.plans.pipeline_ops import (
    _DOT_FOLD,
    _N2_FOLD,
    _TOKENS,
)

# ------------------------------------------------------------------
# 1. catalog_fd_profile — functional-dependency discovery
# ------------------------------------------------------------------

#: (table, determinant columns, dependent column): the candidate FDs a
#: catalog profiler would score. Alternating positive controls (TPC-H
#: key FDs) and negative controls (attributes that genuinely vary per
#: determinant), plus the load-bearing discovery: the raw zone's
#: CLAIMED composite PK (l_orderkey, l_linenumber) → l_partkey FAILS
#: on the synthetic landing data — duplicated line numbers are exactly
#: why E4 dedup_pk_lineitem exists, and this profile is how a crawler
#: finds that out instead of trusting the schema doc.
_FD_PAIRS: list[tuple[str, tuple[str, ...], str]] = [
    ("orders", ("o_orderkey",), "o_custkey"),
    ("orders", ("o_custkey",), "o_orderpriority"),
    ("lineitem", ("l_orderkey", "l_linenumber"), "l_partkey"),
    ("lineitem", ("l_partkey",), "l_suppkey"),
    ("customer", ("c_custkey",), "c_nationkey"),
    ("customer", ("c_nationkey",), "c_mktsegment"),
    ("nation", ("n_nationkey",), "n_regionkey"),
    ("nation", ("n_regionkey",), "n_name"),
]


def _fd_oracle() -> str:
    parts = []
    for t, det, dep in _FD_PAIRS:
        d = ", ".join(det)
        nn = " AND ".join(f"{c} IS NOT NULL" for c in (*det, dep))
        parts.append(f"""
        SELECT '{t}' AS table_name, '{",".join(det)}' AS determinant,
               '{dep}' AS dependent,
               CAST(COUNT(*) AS BIGINT) AS n_det,
               CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_pairs,
               CAST(COALESCE(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
                   AS n_violating_det,
               CAST(COALESCE(MAX(c), 0) AS BIGINT) AS max_dep_per_det
        FROM (SELECT {d}, COUNT(*) AS c
              FROM (SELECT DISTINCT {d}, {dep} FROM {t} WHERE {nn})
              GROUP BY {d})
        """)
    union = " UNION ALL ".join(parts)
    return f"""
    WITH u AS ({union})
    SELECT table_name, determinant, dependent, n_det, n_pairs,
           n_violating_det, max_dep_per_det,
           CAST(CASE WHEN n_det = 0 THEN NULL
                     WHEN n_violating_det = 0 THEN 1 ELSE 0 END AS BIGINT) AS fd_holds,
           CASE WHEN n_pairs = 0 THEN NULL
                ELSE CAST(n_det AS DOUBLE) / CAST(n_pairs AS DOUBLE) END AS strength
    FROM u
    ORDER BY table_name ASC, determinant ASC, dependent ASC
    """


CATALOG_FD_ORACLE = _fd_oracle()


def catalog_fd_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery over curated candidate FDs —
    the within-table half of catalog profiling (E26
    catalog_inclusion_profile is the cross-table half): for each
    determinant → dependent candidate, the distinct determinant
    count, distinct (determinant, dependent) pair count, how many
    determinant values map to MORE than one dependent (violations),
    the worst fan-out, the 0/1 verdict (NULL when the relation is
    empty — zero observations is no evidence, not a pass), and
    strength = n_det/n_pairs
    (1.0 iff the FD holds exactly). Rows with a NULL determinant or
    dependent are excluded — NULL-key rows are RI validation's (E3)
    failure class, not a dependency vote. The profile recovers every
    true TPC-H key FD, rejects the attribute negatives, and — the
    point — FLAGS the raw zone's claimed composite PK
    (l_orderkey, l_linenumber) → l_partkey as violated, which is the
    dedup_pk_lineitem (E4) rationale discovered from data rather than
    assumed from the schema doc.

    Scale shape: per candidate ONE distinct aggregate over only the
    candidate's columns (pruned scan, map-side partial distinct) at
    distinct-pair cardinality, then a determinant-keyed count and a
    1-row summary — never a row-level join, never a window. The 8
    candidates are independent 1-row frames unioned at the end."""
    frames = []
    for t, det, dep in _FD_PAIRS:
        sel = load_table(spark, sf_dir, t).select(*det, dep)
        for c in (*det, dep):
            sel = sel.filter(F.col(c).isNotNull())
        g = sel.distinct().groupBy(*det).agg(F.count("*").alias("c"))
        summary = g.agg(
            F.count("*").cast("bigint").alias("n_det"),
            F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("n_pairs"),
            F.coalesce(F.sum(F.when(F.col("c") > 1, 1).otherwise(0)), F.lit(0))
            .cast("bigint")
            .alias("n_violating_det"),
            F.coalesce(F.max("c"), F.lit(0)).cast("bigint").alias("max_dep_per_det"),
        )
        frames.append(
            summary.select(
                F.lit(t).alias("table_name"),
                F.lit(",".join(det)).alias("determinant"),
                F.lit(dep).alias("dependent"),
                "n_det",
                "n_pairs",
                "n_violating_det",
                "max_dep_per_det",
            )
        )
    u = reduce(lambda a, b: a.unionAll(b), frames)
    return (
        u.select(
            "*",
            # n_det = 0 is vacuous truth (the FD was never observed on
            # any row): emit NULL, not 1, so a catalog crawler cannot
            # promote an FD with zero evidence — same NULL-not-0/0
            # discipline as strength below (ADVICE r11).
            F.when(F.col("n_det") == 0, F.lit(None))
            .when(F.col("n_violating_det") == 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("fd_holds"),
            F.when(F.col("n_pairs") == 0, F.lit(None).cast("double"))
            .otherwise(F.col("n_det").cast("double") / F.col("n_pairs").cast("double"))
            .alias("strength"),
        )
        .orderBy("table_name", "determinant", "dependent")
    )


# ------------------------------------------------------------------
# 1b. catalog_column_stats — ANALYZE-style per-column profile
# ------------------------------------------------------------------

#: table → columns profiled (static schema from TESTDATA.md — the
#: profiler is the ANALYZE pass that FEEDS a CBO, so it enumerates
#: columns explicitly rather than discovering them at plan time).
_STATS_COLS: list[tuple[str, tuple[str, ...]]] = [
    ("orders", ("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                "o_orderdate", "o_orderpriority")),
    ("customer", ("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")),
    ("events", ("event_id", "ts", "user_id", "event_type", "value", "props")),
]


def _column_stats_oracle() -> str:
    parts = []
    for t, cols in _STATS_COLS:
        for c in cols:
            parts.append(f"""
            SELECT '{t}' AS table_name, '{c}' AS column_name,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT({c}) AS BIGINT) AS n_nonnull,
                   CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
                   CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
            FROM {t}
            """)
    union = " UNION ALL ".join(parts)
    return f"""
    WITH u AS ({union})
    SELECT table_name, column_name, n_rows, n_nonnull, n_nulls, n_distinct,
           CASE WHEN n_rows = 0 THEN NULL
                ELSE CAST(n_nulls AS DOUBLE) / CAST(n_rows AS DOUBLE) END AS null_frac,
           CASE WHEN n_nonnull = 0 THEN NULL
                ELSE CAST(n_distinct AS DOUBLE) / CAST(n_nonnull AS DOUBLE) END
               AS distinct_ratio
    FROM u
    ORDER BY table_name ASC, column_name ASC
    """


CATALOG_COLUMN_STATS_ORACLE = _column_stats_oracle()


def catalog_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style per-column statistics — the third leg of the
    catalog-profiling trio (E26 cross-table inclusion, E29
    within-table FDs, and here the per-column stats a cost-based
    optimizer and every data-discovery UI feed on): per column the
    row count, non-null/null counts, EXACT distinct count, null
    fraction, and distinct ratio (1.0 reads "key-like", ~0 reads
    "category-like"; NULL not 0/0 on empty inputs). Counts are exact
    BIGINTs; the two ratios are single double divisions.

    Scale shape: one PRUNED single-column scan per profiled column
    (the inclusion-profile precedent), each an independent two-stage
    count_distinct aggregate — shuffle at the column's distinct
    cardinality with map-side partial distinct, 1-row summaries
    unioned at the end. At 100 TB you would batch columns of one
    table into a shared scan when I/O dominates; per-column pruning
    is the right default while distinct state dominates."""
    frames = []
    for t, cols in _STATS_COLS:
        tbl = load_table(spark, sf_dir, t)
        for c in cols:
            agg = tbl.select(c).agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.count(c).cast("bigint").alias("n_nonnull"),
                (F.count("*") - F.count(c)).cast("bigint").alias("n_nulls"),
                F.count_distinct(F.col(c)).cast("bigint").alias("n_distinct"),
            )
            frames.append(
                agg.select(
                    F.lit(t).alias("table_name"),
                    F.lit(c).alias("column_name"),
                    "n_rows",
                    "n_nonnull",
                    "n_nulls",
                    "n_distinct",
                )
            )
    u = reduce(lambda a, b: a.unionAll(b), frames)
    return (
        u.select(
            "*",
            F.when(F.col("n_rows") == 0, F.lit(None).cast("double"))
            .otherwise(F.col("n_nulls").cast("double") / F.col("n_rows").cast("double"))
            .alias("null_frac"),
            F.when(F.col("n_nonnull") == 0, F.lit(None).cast("double"))
            .otherwise(
                F.col("n_distinct").cast("double") / F.col("n_nonnull").cast("double")
            )
            .alias("distinct_ratio"),
        )
        .orderBy("table_name", "column_name")
    )


# ------------------------------------------------------------------
# 2. docs_dsir_select — importance-resampling data selection
# ------------------------------------------------------------------

_DSIR_BUCKETS = 64
_DSIR_K = 64
_DSIR_TARGET_LANG = "en"

DOCS_DSIR_ORACLE = f"""
WITH tok AS (
    SELECT doc_id, lang,
           (('0x' || substr(md5(lower(unnest({_TOKENS}))), 1, 8))::BIGINT) % {_DSIR_BUCKETS} AS bkt
    FROM documents
),
c AS (
    SELECT doc_id, lang, bkt, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM tok GROUP BY 1, 2, 3
),
r AS (SELECT bkt, CAST(SUM(cnt) AS BIGINT) AS rcnt FROM c GROUP BY 1),
tb AS (SELECT bkt, CAST(SUM(cnt) AS BIGINT) AS tcnt
       FROM c WHERE lang = '{_DSIR_TARGET_LANG}' GROUP BY 1),
tot AS (
    SELECT CAST((SELECT COALESCE(SUM(rcnt), 0) FROM r) AS BIGINT) AS raw_total,
           CAST((SELECT COALESCE(SUM(tcnt), 0) FROM tb) AS BIGINT) AS tgt_total
),
w AS (
    SELECT r.bkt AS bkt,
           CAST(COALESCE(tb.tcnt, 0) AS DECIMAL(38,0)) * CAST(tot.raw_total AS DECIMAL(38,0))
         - CAST(r.rcnt AS DECIMAL(38,0)) * CAST(tot.tgt_total AS DECIMAL(38,0)) AS w
    FROM r LEFT JOIN tb ON r.bkt = tb.bkt CROSS JOIN tot
),
s AS (
    SELECT c.doc_id AS doc_id,
           SUM(CAST(c.cnt AS DECIMAL(38,0)) * w.w) AS num,
           CAST(SUM(c.cnt) AS BIGINT) AS n_tokens
    FROM c JOIN w ON c.bkt = w.bkt GROUP BY 1
),
dn AS (
    SELECT CAST(CAST(tgt_total AS DECIMAL(38,0))
              * CAST(raw_total AS DECIMAL(38,0)) AS DOUBLE) AS denom
    FROM tot
),
scored AS (
    SELECT d.doc_id AS doc_id, d.lang AS lang, d.source AS source,
           CAST(COALESCE(s.n_tokens, 0) AS BIGINT) AS n_tokens,
           CASE WHEN s.num IS NULL OR dn.denom = 0.0 THEN 0.0
                ELSE CAST(s.num AS DOUBLE) / dn.denom
           END AS score
    FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id CROSS JOIN dn
),
rk AS (SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rn FROM scored)
SELECT doc_id, lang, source, n_tokens, score FROM rk WHERE rn <= {_DSIR_K}
ORDER BY score DESC, doc_id ASC
"""


def docs_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, hashed n-gram
    importance resampling): hash lowercased unigrams into
    {b} buckets, estimate the target distribution from the
    lang='{tl}' slice and the raw distribution from the whole corpus,
    score every document by its feature-count dot product with the
    per-bucket importance, and keep the top {k} (score desc, doc_id
    tiebreak). The importance is the first-order surrogate
    p_target(b) − p_raw(b) rather than the paper's log-ratio: ln is a
    libm call the engine boundary forbids (docs_char_diversity
    precedent), and the surrogate keeps every weight an EXACT integer
    on the common denominator T·R —
    w(b) = tcnt(b)·R − rcnt(b)·T in DECIMAL(38,0), doc score =
    Σ_b c_doc(b)·w(b) exact, ONE double division by T·R at the end.
    T·R must stay below 2^53 for the final division's operands to be
    dot-exact in both engines — at ~1e13 tokens a side you would
    rescale to per-million counts (same 2^53 gate discipline as the
    rank tie-split). Zero-token docs score 0.0 and rank by id among
    themselves. On the synthetic corpus the selected mix concentrates
    to ~60% '{tl}' vs a ~40% base rate — selection, not a lang filter:
    cross-language docs sharing target-heavy vocabulary score in.

    Scale shape: one (doc, bucket)-keyed count with map-side combine
    (state per doc ≤ {b} longs), the bucket marginals at {b}-row
    cardinality broadcast back, per-doc score one more map-side
    aggregate, and TakeOrderedAndProject for the top-k — no global
    sort, no row-level self-join."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    # lang rides the explode (needed for the target marginal); source
    # does NOT — it re-joins from the doc-level frame at the end, so
    # the widest shuffle of the query carries no dead string column
    tok = docs.select(
        "doc_id",
        "lang",
        F.explode(tokens_expr("text")).alias("__t"),
    ).select(
        "doc_id",
        "lang",
        (h32_col(F.lower(F.col("__t"))) % _DSIR_BUCKETS).alias("bkt"),
    )
    c = tok.groupBy("doc_id", "lang", "bkt").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    c = c.localCheckpoint(eager=True)  # marginals + score join both consume it
    r = c.groupBy("bkt").agg(F.sum("cnt").cast("bigint").alias("rcnt"))
    tb = (
        c.filter(F.col("lang") == _DSIR_TARGET_LANG)
        .groupBy("bkt")
        .agg(F.sum("cnt").cast("bigint").alias("tcnt"))
    )
    tot = (
        r.agg(F.coalesce(F.sum("rcnt"), F.lit(0)).cast("bigint").alias("raw_total"))
        .crossJoin(
            tb.agg(F.coalesce(F.sum("tcnt"), F.lit(0)).cast("bigint").alias("tgt_total"))
        )
    )
    w = (
        r.join(tb, "bkt", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bkt",
            F.expr(
                "CAST(COALESCE(tcnt, 0) AS DECIMAL(38,0)) * CAST(raw_total AS DECIMAL(38,0))"
                " - CAST(rcnt AS DECIMAL(38,0)) * CAST(tgt_total AS DECIMAL(38,0))"
            ).alias("w"),
        )
    )
    s = (
        c.join(F.broadcast(w), "bkt")
        .groupBy("doc_id")
        .agg(
            F.expr("SUM(CAST(cnt AS DECIMAL(38,0)) * w)").alias("num"),
            F.sum("cnt").cast("bigint").alias("n_tokens"),
        )
    )
    denom = tot.select(
        F.expr(
            "CAST(CAST(tgt_total AS DECIMAL(38,0)) * CAST(raw_total AS DECIMAL(38,0)) AS DOUBLE)"
        ).alias("__denom")
    )
    scored = (
        docs.select("doc_id", "lang", "source")
        .join(s, "doc_id", "left")
        .crossJoin(F.broadcast(denom))
        .select(
            "doc_id",
            "lang",
            "source",
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("bigint").alias("n_tokens"),
            # denom = 0 (no target-language tokens) forces every weight
            # to 0, so score 0.0 — guarded, not divided, under ANSI.
            F.when(F.col("num").isNull() | (F.col("__denom") == 0.0), F.lit(0.0))
            .otherwise(F.col("num").cast("double") / F.col("__denom"))
            .alias("score"),
        )
    )
    return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(_DSIR_K)


# guard None: python -OO strips docstrings, and an AttributeError here
# would kill every import of the plans package
if docs_dsir_select.__doc__:
    docs_dsir_select.__doc__ = docs_dsir_select.__doc__.format(
        b=_DSIR_BUCKETS, k=_DSIR_K, tl=_DSIR_TARGET_LANG
    )


# ------------------------------------------------------------------
# 3. emb_matryoshka_recall — truncated-dimension retrieval QA
# ------------------------------------------------------------------

_MT_DIM = 32  # prefix dimensions kept (full corpus vectors are 64-d)
_MT_QMAX = 8  # query set = vec_id < 8, matching the ANN family
_MT_K = 5

EMB_MATRYOSHKA_ORACLE = f"""
WITH c AS (SELECT vec_id, embedding, {_N2_FOLD} AS n2 FROM embeddings),
q AS (SELECT * FROM c WHERE vec_id < {_MT_QMAX}),
fs AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
              {_DOT_FOLD} / (sqrt(q.n2) * sqrt(c.n2)) AS cosine
       FROM c CROSS JOIN q WHERE c.vec_id != q.vec_id),
fk AS (SELECT query_id, neighbor_id, rn FROM (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, neighbor_id ASC) AS rn
         FROM fs) WHERE rn <= {_MT_K}),
tc AS (SELECT vec_id, embedding, {_N2_FOLD} AS n2
       FROM (SELECT vec_id, embedding[1:{_MT_DIM}] AS embedding FROM embeddings)),
tq AS (SELECT * FROM tc WHERE vec_id < {_MT_QMAX}),
ts AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
              {_DOT_FOLD} / (sqrt(q.n2) * sqrt(c.n2)) AS cosine
       FROM tc c CROSS JOIN tq q WHERE c.vec_id != q.vec_id),
tk AS (SELECT query_id, neighbor_id, rn FROM (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, neighbor_id ASC) AS rn
         FROM ts) WHERE rn <= {_MT_K}),
com AS (SELECT f.query_id AS query_id, CAST(COUNT(*) AS BIGINT) AS n_common
        FROM fk f JOIN tk t ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
        GROUP BY 1),
f1 AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_full,
              MAX(CASE WHEN rn = 1 THEN neighbor_id END) AS top1_full
       FROM fk GROUP BY 1),
t1 AS (SELECT query_id, MAX(CASE WHEN rn = 1 THEN neighbor_id END) AS top1_trunc
       FROM tk GROUP BY 1)
SELECT f1.query_id AS query_id, f1.n_full AS n_full,
       COALESCE(com.n_common, 0) AS n_common,
       CAST(COALESCE(com.n_common, 0) AS DOUBLE) / CAST(f1.n_full AS DOUBLE) AS recall,
       CAST(CASE WHEN f1.top1_full = t1.top1_trunc THEN 1 ELSE 0 END AS BIGINT)
           AS top1_preserved
FROM f1 JOIN t1 ON f1.query_id = t1.query_id
LEFT JOIN com ON com.query_id = f1.query_id
ORDER BY query_id ASC
"""


def emb_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated-prefix-dimension retrieval QA (Kusupati et al. 2022
    Matryoshka representation learning): run exact cosine top-{k}
    twice — once on the full {d}-d vectors, once on only the first
    {d2} dimensions — and report, per query, the overlap of the two
    neighbor sets (recall@{k}) and whether the top-1 neighbor
    survives truncation. An embedding trained matryoshka-style holds
    recall near 1.0 at half dimensions (half the index bytes, half
    the dot-product work at 100 TB); an embedding that isn't — like
    this synthetic corpus, which reads recall ≈ 0.2–0.6 — tells you
    the cheap-prefix serving plan is NOT safe. Set-intersection
    counts are exact integers; recall is ONE double division; both
    rankings reuse the deterministic left-fold cosine + neighbor-id
    tie-break the ANN family hash-checks.

    Scale shape: two corpus scans (full and sliced projection), each
    the documented brute-force yardstick shape — {q}-query set
    broadcast against the corpus, per-partition top-k; the join of
    two ({q}·{k})-row result frames is driver-trivial."""
    from lakehouse_architecture_transaction_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    qids = list(range(_MT_QMAX))
    full = S.cosine_topk(emb, id_col="vec_id", vec_col="embedding", query_ids=qids, k=_MT_K)
    sliced = emb.select(
        "vec_id", F.expr(f"slice(embedding, 1, {_MT_DIM})").alias("embedding")
    )
    trunc = S.cosine_topk(
        sliced, id_col="vec_id", vec_col="embedding", query_ids=qids, k=_MT_K
    )
    full = full.localCheckpoint(eager=True)  # intersection + top1 both consume
    trunc = trunc.localCheckpoint(eager=True)
    com = (
        full.select("query_id", "neighbor_id")
        .join(trunc.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    f1 = full.groupBy("query_id").agg(
        F.count("*").cast("bigint").alias("n_full"),
        F.max(F.when(F.col("rank") == 1, F.col("neighbor_id"))).alias("top1_full"),
    )
    t1 = trunc.groupBy("query_id").agg(
        F.max(F.when(F.col("rank") == 1, F.col("neighbor_id"))).alias("top1_trunc")
    )
    return (
        f1.join(t1, "query_id")
        .join(com, "query_id", "left")
        .select(
            "query_id",
            "n_full",
            F.coalesce(F.col("n_common"), F.lit(0)).cast("bigint").alias("n_common"),
            (
                F.coalesce(F.col("n_common"), F.lit(0)).cast("double")
                / F.col("n_full").cast("double")
            ).alias("recall"),
            F.when(F.col("top1_full") == F.col("top1_trunc"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("top1_preserved"),
        )
        .orderBy("query_id")
    )


if emb_matryoshka_recall.__doc__:  # None under python -OO
    emb_matryoshka_recall.__doc__ = emb_matryoshka_recall.__doc__.format(
        k=_MT_K, d=64, d2=_MT_DIM, q=_MT_QMAX
    )


# ------------------------------------------------------------------
# 4. docs_quality_calibration — model-score vs rule-verdict deciles
# ------------------------------------------------------------------


def _calibration_oracle() -> str:
    from lakehouse_architecture_transaction_spark.plans.pipeline_ops3 import (
        _gopher_oracle,
        _quality_logistic_oracle,
    )

    return f"""
    WITH q AS ({_quality_logistic_oracle()}),
    g AS ({_gopher_oracle()}),
    j AS (
        SELECT q.doc_id AS doc_id, q.quality_p AS quality_p, g.passes_gopher AS passes_gopher,
               NTILE(10) OVER (ORDER BY q.quality_p ASC, q.doc_id ASC) AS decile
        FROM q JOIN g ON q.doc_id = g.doc_id
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(passes_gopher) AS BIGINT) AS n_pass,
           CAST(SUM(passes_gopher) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS pass_rate,
           MIN(quality_p) AS min_p, MAX(quality_p) AS max_p
    FROM j GROUP BY 1 ORDER BY decile ASC
    """


DOCS_QUALITY_CALIBRATION_ORACLE = _calibration_oracle()


def docs_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration of the cheap model-based quality score (L71's
    algebraic-logistic) against the Gopher rule verdict (L76), the
    standard classifier-vs-rules eval before swapping a filter in a
    curation pipeline: exact NTILE(10) deciles of quality_p (doc_id
    tie-break), and per decile the doc count, Gopher pass count, pass
    rate, and the decile's score range. A well-calibrated score reads
    monotone pass_rate by decile; a flat curve says the model ranks
    nothing the rules care about. Counts exact, pass_rate ONE double
    division; quality_p replays bit-for-bit cross-engine by L71's
    transcendental-free construction.

    Scale shape: two map-only feature passes joined on doc_id, decile
    assignment via the bucketed prefix-sum NTILE
    (operators/ranking.py ntile_exact — no single-task global-sort
    window), final frame 10 rows."""
    from lakehouse_architecture_transaction_spark.operators import text as T
    from lakehouse_architecture_transaction_spark.operators.ranking import ntile_exact

    docs = load_table(spark, sf_dir, "documents", spread=True)
    qp = T.quality_logistic_score(docs, "doc_id", "text").select("doc_id", "quality_p")
    gf = T.gopher_quality_flags(docs, "doc_id", "text").select("doc_id", "passes_gopher")
    j = qp.join(gf, "doc_id")
    ranked = ntile_exact(
        j, value_col="quality_p", tiebreakers=["doc_id"], n=10, tile_col="decile"
    )
    return (
        ranked.groupBy(F.col("decile").cast("bigint").alias("decile"))
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("passes_gopher").cast("bigint").alias("n_pass"),
            (
                F.sum("passes_gopher").cast("double") / F.count("*").cast("double")
            ).alias("pass_rate"),
            F.min("quality_p").alias("min_p"),
            F.max("quality_p").alias("max_p"),
        )
        .orderBy("decile")
    )


# ------------------------------------------------------------------
# Registration (round 13 drain — all five preview-verified at
# sf0.001/0.01/0.1 in tests/test_oracle_parity.py before this point;
# this EMPTIES the registration queue)
# ------------------------------------------------------------------

from lakehouse_architecture_transaction_spark.plans.registry import register  # noqa: E402

register("catalog_fd_profile", oracle=CATALOG_FD_ORACLE)(catalog_fd_profile)
register("catalog_column_stats", oracle=CATALOG_COLUMN_STATS_ORACLE)(
    catalog_column_stats
)
register("docs_dsir_select", oracle=DOCS_DSIR_ORACLE)(docs_dsir_select)
register("emb_matryoshka_recall", oracle=EMB_MATRYOSHKA_ORACLE)(
    emb_matryoshka_recall
)
register("docs_quality_calibration", oracle=DOCS_QUALITY_CALIBRATION_ORACLE)(
    docs_quality_calibration
)
