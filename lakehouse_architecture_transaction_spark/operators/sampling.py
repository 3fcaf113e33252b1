"""Deterministic sampling and dataset splitting.

Training pipelines need splits that are REPRODUCIBLE (same id → same
split, forever), STABLE under repartitioning and re-runs, and
LEAK-FREE (membership decided by identity, not position). Spark's
``randomSplit`` is none of these — it is partition-order dependent.
Hash-based assignment is: bucket = md5(salt || id) mod N, thresholds
carve the buckets into splits. The salt versions the split — bump it
to re-deal without touching code.

Everything is md5-derived, so the DuckDB oracle reproduces the exact
assignment (same discipline as functions/hashing.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BUCKETS = 10_000


def split_bucket_col(id_col: str, salt: str) -> Column:
    """Deterministic bucket in [0, BUCKETS) for an id."""
    h = F.conv(F.substring(F.md5(F.concat_ws("-", F.lit(salt), F.col(id_col).cast("string"))), 1, 8), 16, 10)
    return (h.cast("long") % BUCKETS).alias("__bucket")


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "split-v1",
) -> DataFrame:
    """Assign every row a split label by hashed id.

    ``weights`` maps split name → fraction (must sum to ~1; the last
    split absorbs rounding). Rows with equal ids always land in the
    same split — safe against duplicate-id leakage across splits.
    """
    names = list(weights)
    bounds: list[tuple[str, int]] = []
    acc = 0.0
    for name in names[:-1]:
        acc += weights[name]
        bounds.append((name, int(round(acc * BUCKETS))))
    bucket = split_bucket_col(id_col, salt)
    expr: Column = F.lit(names[-1])
    for name, bound in reversed(bounds):
        expr = F.when(F.col("__bucket") < bound, F.lit(name)).otherwise(expr)
    return df.withColumn("__bucket", bucket).withColumn("split", expr).drop("__bucket")


def hash_sample(df: DataFrame, id_col: str, fraction: float, salt: str = "sample-v1") -> DataFrame:
    """Deterministic ~``fraction`` sample by hashed id: stable across
    runs, partitionings, and cluster sizes (unlike df.sample)."""
    bound = int(round(fraction * BUCKETS))
    return df.withColumn("__bucket", split_bucket_col(id_col, salt)).filter(
        F.col("__bucket") < bound
    ).drop("__bucket")


def hash_sample_exact(
    df: DataFrame, id_col: str, n: int, salt: str = "sample-v1"
) -> DataFrame:
    """Deterministic EXACT-size uniform sample: rank every row by
    md5(salt || id) and keep the ``n`` smallest — the batch
    equivalent of reservoir sampling, but reproducible across runs
    and partitionings (a true reservoir depends on encounter order).

    Scale shape: orderBy(...).limit(n) executes as TakeOrdered —
    each partition keeps an n-sized heap and the driver merges
    |partitions| heaps of n — so no global sort shuffle ever
    materializes. Safe for n up to ~millions; beyond that, switch to
    the threshold form (hash_sample) with a calibrated fraction."""
    h = F.md5(F.concat_ws("-", F.lit(salt), F.col(id_col).cast("string")))
    return (
        df.withColumn("__h", h)
        .orderBy(F.col("__h").asc(), F.col(id_col).asc())
        .limit(n)
        .drop("__h")
    )


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "strat-v1",
) -> DataFrame:
    """Deterministic stratified sampling: within each stratum (e.g.
    language, source), keep a per-stratum hash fraction of rows.
    The training-mix knob — downsample the dominant language, keep
    all of the rare one — with the same reproducibility guarantees as
    hash_split (id-identity membership, repartition-stable).

    The stratum value is folded into the hash salt, so the same id
    draws independently in different strata. Pure column algebra: one
    md5, one threshold per stratum via a when-chain — no shuffle at
    all (the filter is map-side)."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "-", F.lit(salt), F.col(strata_col).cast("string"), F.col(id_col).cast("string")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    )
    bucket = h.cast("long") % BUCKETS
    bound: Column = F.lit(int(round(default_fraction * BUCKETS)))
    for stratum, frac in sorted(fractions.items()):
        bound = F.when(F.col(strata_col) == stratum, F.lit(int(round(frac * BUCKETS)))).otherwise(bound)
    return df.withColumn("__bucket", bucket).filter(F.col("__bucket") < bound).drop("__bucket")


def packed_sequences(
    df: DataFrame, id_col: str, weight_col: str, budget: int, block: int = 64
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are concatenated
    in ``id_col`` order and chunked into ``budget``-token training
    sequences; each doc is assigned the sequence containing its START
    offset. The standard LLM pretraining packing (concatenate, then
    split into fixed windows) — deterministic, no bin-packing search.

    Adds (start_offset, seq_idx). The global running offset is an
    EXCLUSIVE prefix sum computed without a global sort: ids bucket
    into contiguous ranges (``id div block``), an in-bucket window
    does the local cumsum in parallel, and per-bucket totals (one tiny
    aggregate) turn into bucket offsets via a broadcast triangular
    join — the same scale pattern as shuffle_and_shard. Requires a
    numeric id; at extreme scale feed ids through repartitionByRange
    first so blocks stay balanced under id skew.
    """
    b = df.withColumn("__pb", (F.col(id_col) / block).cast("long"))
    w = (
        Window.partitionBy("__pb")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = b.withColumn("__local", F.coalesce(F.sum(F.col(weight_col)).over(w), F.lit(0)).cast("long"))
    counts = b.groupBy("__pb").agg(F.sum(F.col(weight_col)).cast("long").alias("__cnt"))
    ca = counts.select(F.col("__pb").alias("__ba"), F.col("__cnt").alias("__ca"))
    cb = counts.select(F.col("__pb").alias("__bb"), F.col("__cnt").alias("__cb"))
    offsets = (
        ca.join(F.broadcast(cb), F.col("__bb") < F.col("__ba"), "left")
        .groupBy("__ba")
        .agg(F.coalesce(F.sum("__cb"), F.lit(0)).cast("long").alias("__off"))
        .select(F.col("__ba").alias("__pb"), "__off")
    )
    return (
        local.join(F.broadcast(offsets), on="__pb", how="inner")
        .withColumn("start_offset", (F.col("__off") + F.col("__local")).cast("long"))
        .withColumn("seq_idx", (F.col("start_offset") / budget).cast("long"))
        .drop("__pb", "__local", "__off")
    )


def shuffle_and_shard(
    df: DataFrame, id_col: str, batch_size: int, salt: str = "shuffle-v1"
) -> DataFrame:
    """Deterministic global shuffle + fixed-size sharding for training
    data: rows ordered by md5(salt || id) (a reproducible permutation
    decoupled from ingest order), then numbered and cut into
    ``batch_size`` shards. Same salt → same batches on any cluster;
    bump the salt for a new epoch's permutation.

    Adds (shuffle_pos, batch_idx). The global position is computed
    WITHOUT a global sort: rows are range-bucketed by the first two
    hex digits of the shuffle key (256 uniform buckets — a string
    prefix, so bucket order IS key order), numbered within buckets in
    parallel, then offset by the exclusive prefix sum of bucket
    counts. The prefix sum runs on the 256-row count table via a
    broadcast triangular join, so no stage anywhere collapses to a
    single partition — the plan survives a 100 TB input where a
    ``Window.orderBy`` total sort would not.
    """
    key = F.md5(F.concat_ws("-", F.lit(salt), F.col(id_col).cast("string")))
    base = df.withColumn("__skey", key).withColumn("__sbkt", F.substring(F.col("__skey"), 1, 2))
    w = Window.partitionBy("__sbkt").orderBy(F.col("__skey").asc(), F.col(id_col).asc())
    numbered = base.withColumn("__rn", F.row_number().over(w))
    counts = base.groupBy("__sbkt").agg(F.count("*").alias("__cnt"))
    ca = counts.select(F.col("__sbkt").alias("__ba"), F.col("__cnt").alias("__ca"))
    cb = counts.select(F.col("__sbkt").alias("__bb"), F.col("__cnt").alias("__cb"))
    offsets = (
        ca.join(F.broadcast(cb), F.col("__bb") < F.col("__ba"), "left")
        .groupBy("__ba")
        .agg(F.coalesce(F.sum("__cb"), F.lit(0)).cast("long").alias("__off"))
        .select(F.col("__ba").alias("__sbkt"), "__off")
    )
    return (
        numbered.join(F.broadcast(offsets), on="__sbkt", how="inner")
        .withColumn("shuffle_pos", (F.col("__off") + F.col("__rn") - 1).cast("long"))
        .withColumn("batch_idx", (F.col("shuffle_pos") / batch_size).cast("long"))
        .drop("__skey", "__sbkt", "__rn", "__off")
    )


def weighted_stratum_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    weights: dict[str, float],
    default: float = 1.0,
    salt: str = "mix-v1",
) -> DataFrame:
    """Per-stratum weighted downsampling — the training-mixture knob
    (keep 100% of wiki, 25% of crawl, ...). A row survives iff its
    hash bucket falls under its stratum's weight threshold, so the
    sample is deterministic, repartition-stable, and monotone in the
    weight (raising a weight only ADDS rows — reproducible ablations).

    Map-side only: the weight table is a literal CASE expression
    (broadcast-free), membership is one md5 per row, no shuffle.
    """
    thresh: Column = F.lit(int(round(default * BUCKETS)))
    for name, w in sorted(weights.items()):
        thresh = F.when(F.col(stratum_col) == name, F.lit(int(round(w * BUCKETS)))).otherwise(
            thresh
        )
    return (
        df.withColumn("__bucket", split_bucket_col(id_col, salt))
        .filter(F.col("__bucket") < thresh)
        .drop("__bucket")
    )


def grouped_fold_assign(
    df: DataFrame, group_col: str, k: int = 5, salt: str = "fold-v1"
) -> DataFrame:
    """Group-coherent k-fold assignment (scikit-learn's GroupKFold
    semantics, hash-based): every row of a group lands in the SAME
    fold — the leakage guard for grouped data (all of a document's
    chunks, all of a user's events, all of a source's docs train
    together or evaluate together, never both).

    fold = h32(salt || group) mod k: deterministic, engine-portable
    (md5), independent of row order and of which rows are present —
    adding data never reassigns an existing group's fold, so folds
    are stable across incremental ingests. Row-local, zero shuffles.

    A NULL group key hashes via a sentinel string (never produced by a
    real cast) so NULL-group rows land together in one deterministic
    fold instead of getting fold=NULL and silently escaping the split.
    """
    key = F.coalesce(F.col(group_col).cast("string"), F.lit("\x00null"))
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), key)), 1, 8),
        16,
        10,
    ).cast("long")
    return df.withColumn("fold", F.pmod(h, F.lit(k)).cast("int"))


def priority_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "priority-v1",
) -> DataFrame:
    """Priority sampling (Duffield–Lund–Thorup, JACM 54(6) 2007):
    weighted sampling WITHOUT replacement with an unbiased subset-sum
    estimator. Each row gets priority q = w / u with u =
    (h32(salt||id) + 1) / 2^32 ∈ (0, 1]; the k highest-priority rows
    are kept, and with τ = the (k+1)-th priority, ``est_weight`` =
    max(w, τ) estimates any subset-sum of the original weights
    unbiasedly (rows with w ≥ τ are certainties carrying their own
    weight; the rest represent the tail).

    Chosen over Efraimidis–Spirakis (u^(1/w) keys) DELIBERATELY: the
    priority is one IEEE division of exactly-representable doubles —
    no pow/log/exp — so an external SQL engine replays the exact
    ranking and estimates bit-for-bit (the same transcendental-free
    discipline as the algebraic-sigmoid quality score).

    Scale shape: TakeOrderedAndProject top-(k+1) (per-partition heaps,
    one (k+1)-row driver merge — no global sort); the (k+1)-row frame
    is checkpointed because two branches consume it (the kept rows and
    the τ scalar), and τ broadcasts.
    """
    h = F.conv(
        F.substring(F.md5(F.concat_ws("-", F.lit(salt), F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    u = (h.cast("double") + F.lit(1.0)) / F.lit(4294967296.0)
    scored = df.withColumn("priority", F.col(weight_col).cast("double") / u)
    topk1 = (
        scored.orderBy(F.col("priority").desc(), F.col(id_col).asc())
        .limit(k + 1)
        .localCheckpoint(eager=True)
    )
    tau = topk1.agg(
        F.when(F.count("*") > k, F.min("priority")).otherwise(F.lit(0.0)).alias("tau")
    )
    kept = topk1.orderBy(F.col("priority").desc(), F.col(id_col).asc()).limit(k)
    return kept.crossJoin(F.broadcast(tau)).withColumn(
        "est_weight", F.greatest(F.col(weight_col).cast("double"), F.col("tau"))
    )
