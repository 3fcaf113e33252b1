"""Round-6 registered queries: the queued text/sampling operators
(hash_embed, quality_logistic_score, script_profile, paragraph_dups,
grouped_fold_assign), the sketch-accuracy companion that makes the
approximate-sketch path (A16) driver-checkable, and two new curation
operators (Gopher rule-based quality filtering, shingle novelty vs
the corpus prefix).

Reference parity: these extend the reference's single-table curation
surface (reference scripts/glue/script.py reads → validates → writes)
with the text-pipeline operators a 100 TB training-data curation run
needs; each query's oracle was verified cell-exact as a preview in
round 5 (tests/test_oracle_parity.py) before being promoted here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_architecture_transaction_spark.catalog import load_table
from lakehouse_architecture_transaction_spark.operators import dedup as D
from lakehouse_architecture_transaction_spark.operators import sampling as SA
from lakehouse_architecture_transaction_spark.operators import text as T
from lakehouse_architecture_transaction_spark.plans.pipeline_ops import (
    _DOC_SHINGLES,
    _STOPS_SQL,
    _TOKENS,
)
from lakehouse_architecture_transaction_spark.plans.registry import register

_HE_DIM = 16  # hash_embed width for the registered query


@register(
    "docs_hash_embed",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({_TOKENS}) AS t FROM documents
    ),
    b AS (
        SELECT doc_id,
               (('0x' || substr(md5(t), 1, 8))::BIGINT) % {_HE_DIM} AS bkt,
               CASE WHEN (('0x' || substr(md5(t || '#s'), 1, 8))::BIGINT) % 2 = 0
                    THEN 1 ELSE -1 END AS sgn
        FROM tok
    ),
    c AS (SELECT doc_id, bkt, CAST(SUM(sgn) AS BIGINT) AS cnt FROM b GROUP BY 1, 2),
    dense AS (
        SELECT d.doc_id, g.i, coalesce(c.cnt, 0) AS cnt
        FROM (SELECT DISTINCT doc_id FROM c) d
        CROSS JOIN (SELECT unnest(generate_series(0, {_HE_DIM - 1})) AS i) g
        LEFT JOIN c ON c.doc_id = d.doc_id AND c.bkt = g.i
    ),
    nrm AS (
        SELECT doc_id,
               sqrt(CAST(CAST(SUM(cnt * cnt) AS BIGINT) AS DOUBLE)) AS n2
        FROM dense GROUP BY doc_id
    )
    SELECT dense.doc_id, CAST(dense.i AS INTEGER) AS dim_idx,
           CAST(cnt AS DOUBLE) / (CASE WHEN n2 = 0.0 THEN 1.0 ELSE n2 END) AS v
    FROM dense JOIN nrm USING (doc_id)
    ORDER BY doc_id ASC, dim_idx ASC
    """,
)
def docs_hash_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashed document embeddings (operators/text.py
    hash_embed — Weinberger et al.'s hashing trick), emitted flat
    (doc_id, dim_idx, v) so every vector element is value-hashed by
    the gate. Bucket counts are exact BIGINT sums and the norm is one
    sqrt of an exact integer, so the md5-h32 oracle replays the
    vector bit-for-bit. One (id, bucket)-keyed shuffle with map-side
    combine + the per-doc pack — dim is constant, so state per doc is
    dim longs regardless of corpus size."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    emb = T.hash_embed(docs, "doc_id", "text", dim=_HE_DIM)
    return (
        emb.select("doc_id", F.posexplode("embedding").alias("dim_idx", "v"))
        .select("doc_id", F.col("dim_idx").cast("int").alias("dim_idx"), "v")
        .orderBy("doc_id", "dim_idx")
    )


def _quality_logistic_oracle() -> str:
    w = T.QUALITY_WEIGHTS
    return f"""
    WITH base AS (SELECT doc_id, text, {_TOKENS} AS tk FROM documents),
    m AS (
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS chars,
               CAST(len(tk) AS BIGINT) AS n_tokens,
               CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) / greatest(length(text), 1) AS punct_ratio,
               CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / greatest(length(text), 1) AS digit_ratio,
               CAST(len(list_filter(tk, x -> list_contains({_STOPS_SQL}, lower(x)))) AS DOUBLE) / greatest(len(tk), 1) AS stop_ratio
        FROM base
    ),
    s AS (
        SELECT doc_id,
               {w["bias"]} + CAST(chars AS DOUBLE) * {w["chars"]}
             + CAST(n_tokens AS DOUBLE) * {w["n_tokens"]}
             + punct_ratio * {w["punct_ratio"]}
             + digit_ratio * {w["digit_ratio"]}
             + stop_ratio * {w["stop_ratio"]} AS raw_score
        FROM m
    )
    SELECT doc_id, raw_score,
           0.5 + 0.5 * raw_score / (1.0 + abs(raw_score)) AS quality_p
    FROM s ORDER BY doc_id ASC
    """


@register("docs_quality_logistic", oracle=_quality_logistic_oracle())
def docs_quality_logistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering stand-in (operators/text.py
    quality_logistic_score): a fixed linear model over the
    quality_score features squashed with the ALGEBRAIC sigmoid
    0.5 + 0.5·s/(1+|s|) — only +,*,/,abs, all correctly rounded, so
    the score replays bit-for-bit cross-engine where exp() cannot.
    Row-local, zero shuffles."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return T.quality_logistic_score(docs, "doc_id", "text").orderBy("doc_id")


def _script_profile_oracle() -> str:
    ratio_sql = ", ".join(
        f"CAST(len(regexp_extract_all(text, '[{rng}]')) AS DOUBLE) / greatest(length(text), 1)"
        f" AS {name}_ratio"
        for name, rng in T.SCRIPT_RANGES.items()
    )
    total = " + ".join(f"{name}_ratio" for name in T.SCRIPT_RANGES)
    names = ", ".join(f"{n}_ratio" for n in T.SCRIPT_RANGES)
    return f"""
    WITH m AS (
        SELECT doc_id, CAST(length(text) AS BIGINT) AS chars, length(text) AS ln, {ratio_sql}
        FROM documents
    )
    SELECT doc_id, chars, {names},
           CASE WHEN ln = 0 THEN 0.0 ELSE 1.0 - ({total}) END AS other_ratio
    FROM m ORDER BY doc_id ASC
    """


@register("docs_script_profile", oracle=_script_profile_oracle())
def docs_script_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unicode-script profile (operators/text.py
    script_profile): latin/digit/cyrillic/cjk/arabic character ratios
    over explicit BMP ranges (portable to any RE2-class engine — no
    \\p properties) plus the `other_ratio` remainder. The curation
    signal that catches mixed-script spam and mojibake before a
    model-based language ID. Row-local, zero shuffles."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return T.script_profile(docs, "doc_id", "text").orderBy("doc_id")


@register(
    "docs_paragraph_dups",
    oracle=r"""
    WITH paras AS (
        SELECT doc_id, trim(unnest(regexp_split_to_array(text, '\n\s*\n'))) AS p
        FROM documents
    ),
    kept AS (SELECT doc_id, md5(p) AS paragraph_hash FROM paras WHERE length(p) >= 30)
    SELECT paragraph_hash,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           MIN(doc_id) AS canonical_doc
    FROM kept GROUP BY paragraph_hash HAVING COUNT(DISTINCT doc_id) >= 2
    ORDER BY paragraph_hash ASC
    """,
)
def docs_paragraph_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate paragraphs (operators/text.py
    paragraph_dups): split on blank lines, md5 each paragraph, keep
    hashes spanning ≥ 2 docs — the boilerplate detector between
    whole-doc and shingle dedup. Split/explode row-local; the only
    shuffle is the hash-keyed aggregate with map-side combine.

    The synthetic corpus is single-paragraph (no blank lines), so
    matches here are whole-doc exact dups: 8 rows at sf0.1, empty
    below — the sf0.1 full gate is where this query's hash check has
    teeth (the operator's own unit tests cover multi-paragraph docs)."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return T.paragraph_dups(docs, "doc_id", "text", min_chars=30).orderBy("paragraph_hash")


_FOLD_K = 5


@register(
    "docs_grouped_folds",
    oracle=f"""
    SELECT doc_id, source,
           CAST((('0x' || substr(md5('fold-v1:' ||
                 coalesce(CAST(source AS VARCHAR), chr(0) || 'null')), 1, 8))::BIGINT)
                % {_FOLD_K} AS INTEGER) AS fold
    FROM documents ORDER BY doc_id ASC
    """,
)
def docs_grouped_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-coherent k-fold assignment (operators/sampling.py
    grouped_fold_assign — GroupKFold semantics): every doc of a source
    lands in the same fold, so grouped data never straddles the
    train/eval boundary. fold = h32(salt||source) mod k — row-local,
    zero shuffles, stable under incremental ingest (adding docs never
    reassigns an existing source)."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return (
        SA.grouped_fold_assign(docs, "source", k=_FOLD_K)
        .select("doc_id", "source", "fold")
        .orderBy("doc_id")
    )


@register(
    "events_sketch_accuracy",
    oracle="""
    WITH v AS (
        SELECT event_type, value FROM events WHERE value IS NOT NULL
    ),
    c AS (SELECT event_type, COUNT(*) AS n FROM v GROUP BY 1),
    u AS (
        SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
        FROM events GROUP BY 1
    ),
    r AS (
        SELECT event_type, value,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn
        FROM v
    ),
    b AS (
        SELECT r.event_type,
               MIN(CASE WHEN rn = CAST(ceil(0.45 * CAST(n AS DOUBLE)) AS BIGINT)
                        THEN value END) AS p50_lo,
               MIN(CASE WHEN rn = CAST(ceil(0.55 * CAST(n AS DOUBLE)) AS BIGINT)
                        THEN value END) AS p50_hi
        FROM r JOIN c USING (event_type) GROUP BY 1
    )
    SELECT u.event_type, exact_users,
           CAST(exact_users AS DOUBLE) * 0.9 AS users_lo,
           CAST(exact_users AS DOUBLE) * 1.1 AS users_hi,
           CAST(1 AS BIGINT) AS users_within,
           p50_lo, p50_hi,
           CAST(1 AS BIGINT) AS p50_within
    FROM u JOIN b ON u.event_type = b.event_type
    ORDER BY u.event_type ASC
    """,
)
def events_sketch_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checkable companion to events_approx_sketches (A16): runs
    the HLL++ distinct sketch and the GK p50 sketch, then checks each
    estimate against EXACT, SQL-replayable tolerance bands — distinct
    users within ±10 % of the exact count (HLL rsd=0.02 → 3σ = 6 %),
    p50 between the exact rank-selected 45th and 55th percentile
    VALUES (element selection, so no interpolation-formula drift).
    The output carries the exact values, the bands, and 0/1
    within-band flags; the oracle computes the same exact side and
    asserts the flags are 1 — so a sketch-accuracy regression flips a
    flag and fails the value hash. The sketches stay fixed-size
    mergeable state (one map-side-combined pass); the band side is a
    per-type rank selection through the bucketed-prefix machinery
    (grouped_percent_rank with the exact #≤ column — round 8: the
    previous per-type row_number sorted raw event values in 6 tasks,
    the SURVEY §6 low-cardinality-window funnel; the value at sorted
    position r equals the min value whose #≤ ≥ r, tie-order
    invariant, so the rank selection never needs a per-type sort)."""
    from lakehouse_architecture_transaction_spark.operators.ranking import grouped_percent_rank

    events = load_table(spark, sf_dir, "events")
    vals = events.filter(F.col("value").isNotNull()).select("event_type", "value")
    counts = vals.groupBy("event_type").agg(F.count("*").alias("n"))
    ranked = grouped_percent_rank(
        vals, group_cols=["event_type"], value_col="value", le_col="__n_le"
    ).join(F.broadcast(counts), "event_type")
    lo_rank = F.ceil(F.lit(0.45) * F.col("n").cast("double")).cast("bigint")
    hi_rank = F.ceil(F.lit(0.55) * F.col("n").cast("double")).cast("bigint")
    bands = ranked.groupBy("event_type").agg(
        F.min(F.when(F.col("__n_le") >= lo_rank, F.col("value"))).alias("p50_lo"),
        F.min(F.when(F.col("__n_le") >= hi_rank, F.col("value"))).alias("p50_hi"),
    )
    # Two aggregates joined on the 10-row type key, NOT one mixed agg:
    # count_distinct alongside the object-typed sketch functions plans
    # an Expand (every fact row duplicated per aggregate group) with a
    # sort-agg fallback for the sketches — measured 4.96 s vs 0.45 s
    # split at sf0.1, and at 100 TB the Expand would double the fact
    # shuffle. Found by the r11 noop-action audit: the old count()
    # bench action pruned the aggregate expressions, so this cost was
    # invisible to every earlier capture.
    sketches = events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.expr("approx_percentile(value, 0.5, 10000)").alias("approx_p50"),
    )
    exact = events.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias("exact_users")
    )
    sk = sketches.join(exact, "event_type")
    return (
        sk.join(bands, "event_type")
        .select(
            "event_type",
            "exact_users",
            (F.col("exact_users").cast("double") * 0.9).alias("users_lo"),
            (F.col("exact_users").cast("double") * 1.1).alias("users_hi"),
            F.when(
                (F.col("approx_users").cast("double") >= F.col("exact_users").cast("double") * 0.9)
                & (F.col("approx_users").cast("double") <= F.col("exact_users").cast("double") * 1.1),
                F.lit(1),
            ).otherwise(F.lit(0)).cast("bigint").alias("users_within"),
            "p50_lo",
            "p50_hi",
            F.when(
                (F.col("approx_p50") >= F.col("p50_lo")) & (F.col("approx_p50") <= F.col("p50_hi")),
                F.lit(1),
            ).otherwise(F.lit(0)).cast("bigint").alias("p50_within"),
        )
        .orderBy("event_type")
    )


def _gopher_oracle() -> str:
    b = T.GOPHER_BOUNDS
    return f"""
    WITH base AS (
        SELECT doc_id, text, {_TOKENS} AS tk, string_split(text, chr(10)) AS ln
        FROM documents
    ),
    m AS (
        SELECT doc_id,
               CAST(len(tk) AS BIGINT) AS n_words,
               CAST(CASE WHEN len(tk) = 0 THEN 0 ELSE
                    list_reduce(list_transform(tk, t -> CAST(length(t) AS BIGINT)),
                                (a, x) -> a + x) END AS DOUBLE)
                   / greatest(len(tk), 1) AS mean_word_len,
               CAST(CAST(len(regexp_extract_all(text, '#'))
                    + len(regexp_extract_all(text, '\\.\\.\\.')) AS BIGINT) AS DOUBLE)
                   / greatest(len(tk), 1) AS symbol_ratio,
               CAST(CAST(len(list_filter(ln, l -> regexp_matches(l, '^\\s*[-*•]'))) AS BIGINT) AS DOUBLE)
                   / greatest(len(ln), 1) AS bullet_ratio,
               CAST(CAST(len(list_filter(tk, t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS DOUBLE)
                   / greatest(len(tk), 1) AS alpha_word_ratio,
               CAST(len(list_filter({_STOPS_SQL},
                    s -> list_contains(list_transform(tk, t -> lower(t)), s))) AS BIGINT) AS n_stop_hits
        FROM base
    )
    SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_ratio,
           alpha_word_ratio, n_stop_hits,
           CAST(CASE WHEN n_words >= {b["min_words"]} AND n_words <= {b["max_words"]}
                      AND mean_word_len >= {b["min_mean_word_len"]}
                      AND mean_word_len <= {b["max_mean_word_len"]}
                      AND symbol_ratio <= {b["max_symbol_ratio"]}
                      AND bullet_ratio <= {b["max_bullet_ratio"]}
                      AND alpha_word_ratio >= {b["min_alpha_word_ratio"]}
                      AND n_stop_hits >= {b["min_stop_hits"]}
                THEN 1 ELSE 0 END AS BIGINT) AS passes_gopher
    FROM m ORDER BY doc_id ASC
    """


@register("docs_gopher_quality", oracle=_gopher_oracle())
def docs_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-based quality filter (operators/text.py
    gopher_quality_flags — Rae et al. 2021 table-A1 subset): word
    count, mean word length, symbol-to-word, bullet-line fraction,
    alphabetic-word fraction, ≥2-distinct-stopword test, plus the
    combined 0/1 verdict — the classic pre-model curation gate,
    emitted with per-rule measurements so rejections are auditable.
    Exact-integer numerators, one double division per ratio —
    map-only over the corpus, zero shuffles."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return T.gopher_quality_flags(docs, "doc_id", "text").orderBy("doc_id")


@register(
    "docs_shingle_novelty",
    oracle=f"""
    WITH {_DOC_SHINGLES},
    f AS (SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY 1),
    p AS (
        SELECT s.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(SUM(CASE WHEN f.first_doc < s.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_seen
        FROM sh s JOIN f USING (shingle) GROUP BY 1
    )
    SELECT doc_id, n_shingles, n_seen,
           CAST(n_shingles - n_seen AS DOUBLE) / n_shingles AS novelty_ratio
    FROM p ORDER BY doc_id ASC
    """,
)
def docs_shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle novelty vs the id-ordered corpus prefix
    (operators/dedup.py shingle_novelty): fraction of each doc's
    distinct 3-gram shingles first seen in an earlier doc — the
    incremental-crawl signal that catches template farms and scraped
    mirrors where every page differs slightly. Linear cost (r15
    window form): the per-shingle min-id is a WINDOW over the
    shingle key on the exploded occurrence frame — statistic and
    novelty flag read the one shuffle the frame already pays; then
    one doc-keyed aggregate — no join, no pairwise stage. Skew note
    (ADVICE r15): a window partition cannot be AQE-skew-split, so a
    Zipf-head shingle funnels its occurrences into one task; the
    per-partition bound is the hottest shingle's occurrence count
    (same bound the old aggregate side carried — only the join-back's
    splittable side is given up). See operators/dedup.py
    shingle_novelty and the SCALE.md hot-shingle probe row."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return D.shingle_novelty(docs, "text", "doc_id", n=3).orderBy("doc_id")
