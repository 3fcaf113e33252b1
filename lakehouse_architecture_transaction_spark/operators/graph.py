"""Connected components — duplicate-pair mining's missing half.

Pair mining (MinHash/LSH, Jaccard, embedding cosine) emits EDGES; the
unit of deduplication is the CLUSTER (keep one doc per component).
This operator closes that gap with min-label propagation: every node
starts labeled with its own id, and each round takes the min of its
own and its neighbors' labels; at fixpoint each component carries its
minimum member id. The fixpoint is UNIQUE (independent of iteration
order), which is what lets a DuckDB recursive-CTE oracle match the
Spark loop bit-for-bit.

Scale notes: plain propagation converges in O(component diameter)
rounds — near-dup clusters are shallow (stars/cliques), so a handful.
Each round is one join + one aggregate on the edge list; the driver
only checks a scalar convergence count (no data collected). Loop
hygiene for iterative Spark: each round's frame references the
previous round's SEVERAL times (join sides, convergence probe), so the
logical plan grows geometrically with rounds — ``persist`` alone dedupes
EXECUTION but the analyzer still walks the full tree, and by round ~10
driver-side planning dwarfs the actual jobs (measured: 7 s → 112 s per
round by round 2 on the star variant). The fix is
``localCheckpoint(eager=True)`` every round: it materializes the frame
AND replaces its plan with the materialized scan, making per-round cost
flat. (On a multi-node cluster, swap for reliable ``checkpoint`` if you
need lineage-free fault recovery; the loop structure is identical.)
For long-chain graphs, ``connected_components_star`` implements the
large-star/small-star algorithm (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14): O(log² n) rounds instead of
O(diameter), same join primitives.
"""

from __future__ import annotations

import warnings

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    return edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b")).unionByName(
        edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
    )


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Return (id_col, component) where component = min id reachable.

    ``vertices``: one row per node id. ``edges``: undirected pairs
    (any orientation). Isolated vertices keep their own id.

    Warns (and returns the partial labels) if ``max_iter`` rounds pass
    without reaching the fixpoint — callers clustering long-chain
    graphs should use :func:`connected_components_star` instead.
    """
    sym = _symmetrize(edges, src_col, dst_col).persist(StorageLevel.MEMORY_AND_DISK)
    # Propagate over edge-incident nodes ONLY: isolated vertices can
    # never change label, so they skip the loop entirely and rejoin at
    # the end. For sparse duplicate graphs (the common case — a few %
    # of a corpus has a near-dup) every round now touches the
    # duplicate SUBGRAPH, not the whole corpus.
    labels = (
        sym.select("a")
        .distinct()
        .select(F.col("a"), F.col("a").alias("label"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels.withColumnRenamed("a", "b").withColumnRenamed("label", "nl"), on="b")
            .groupBy("a")
            .agg(F.min("nl").alias("nmin"))
        )
        # materialize + truncate lineage: labels' plan stays one scan
        # deep forever, so per-round cost is flat (see module docstring)
        new_labels = (
            labels.join(neighbor_min, on="a", how="left")
            .select("a", F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias("label"))
            .localCheckpoint(eager=True)
        )
        # one scalar per round over two checkpointed scans
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="a")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    sym.unpersist()
    if not converged:
        warnings.warn(
            f"connected_components: no fixpoint after {max_iter} rounds; "
            "labels may span multiple components (component diameter > max_iter). "
            "Use connected_components_star for long-chain graphs.",
            RuntimeWarning,
            stacklevel=2,
        )
    return (
        vertices.select(F.col(id_col).alias("a"))
        .join(labels, on="a", how="left")
        .select(
            F.col("a").alias(id_col),
            F.coalesce(F.col("label"), F.col("a")).alias("component"),
        )
    )


def _large_star(e: DataFrame) -> DataFrame:
    """For each node u (neighborhoods over the symmetrized edges),
    connect every strictly-larger neighbor to m = min(N(u) ∪ {u})."""
    s = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    mins = s.groupBy("a").agg(F.least(F.min("b"), F.first("a")).alias("m"))
    return (
        s.join(mins, on="a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient edges downward (u, v≤u), then per node u connect every
    neighbor and u itself to m = min(N(u) ∪ {u})."""
    down = e.select(
        F.greatest(F.col("a"), F.col("b")).alias("a"), F.least(F.col("a"), F.col("b")).alias("b")
    ).distinct()
    mins = down.groupBy("a").agg(F.least(F.min("b"), F.first("a")).alias("m"))
    joined = down.join(mins, on="a")
    nbrs = joined.select(F.col("b").alias("v"), F.col("m"))
    selfs = joined.select(F.col("a").alias("v"), F.col("m")).distinct()
    return (
        nbrs.unionByName(selfs)
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
        .distinct()
    )


def connected_components_star(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.):
    alternating rounds contract the graph toward a star per component
    in O(log² n) rounds — the scale path when components are long
    chains and plain propagation's O(diameter) rounds won't do.

    Same output contract as :func:`connected_components`: one row per
    vertex, ``component`` = min reachable id; the fixpoint is unique,
    so both algorithms (and the recursive-CTE oracle) agree exactly.
    """
    e = (
        _symmetrize(edges, src_col, dst_col)
        .filter(F.col("a") != F.col("b"))
        .select(F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_old = e.count()
    converged = False
    for _ in range(max_iter):
        # each round reads e ~6 times (two stars × union/join sides):
        # without the per-round checkpoint the plan tree grows ~6× per
        # round and analysis alone hits minutes by round 3
        new_e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        # set equality via count compare + one-direction diff probe:
        # both bounded by edge cardinality, no collect
        n_new = new_e.count()
        changed = 1
        if n_new == n_old:
            changed = new_e.exceptAll(e).limit(1).count()
        e, n_old = new_e, n_new
        if changed == 0:
            converged = True
            break
    if not converged:
        warnings.warn(
            f"connected_components_star: edge set still changing after {max_iter} rounds",
            RuntimeWarning,
            stacklevel=2,
        )
    # At the fixpoint e is a star per component: (member, root). Min
    # guards the (benign) case of a node carrying several root edges
    # mid-convergence; isolated vertices label themselves.
    roots = e.groupBy("a").agg(F.min("b").alias("component"))
    return (
        vertices.select(F.col(id_col).alias("a"))
        .join(roots, on="a", how="left")
        .select(
            F.col("a").alias(id_col),
            F.coalesce(F.col("component"), F.col("a")).alias("component"),
        )
    )


def pagerank(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    weight_col: str,
    damping: float = 0.85,
    iters: int = 10,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Deterministic weighted PageRank — the graph-centrality member
    of the operator family next to connected_components. ``edges``
    must be DIRECTED (pass both directions for an undirected graph);
    returns (node, pagerank) over every node appearing as a source OR
    destination.

    pr_{t+1}(v) = (1-d)/N + d · Σ_u pr_t(u) · w(u,v) / outw(u)
                + d · dang_t / N,
    ``iters`` fixed rounds from the uniform start; dang_t is the total
    rank held by DANGLING nodes (no out-edges), redistributed
    uniformly — the standard treatment, without which a directed graph
    leaks mass every round and sinks never accumulate score. On a
    symmetric graph the dangling set is empty and the term is an exact
    IEEE +0.0 no-op, so symmetric-graph oracles need not carry it.

    Determinism (the kmeans_lloyd discipline, so a SQL oracle can
    replay every round): each edge's contribution is one fixed chain
    of IEEE double ops HALF-UP-quantized to 1e9 — the per-node
    aggregation then sums exact BIGINTs (order-independent; stays
    within int64 to in-degrees of ~10^9) and returns to double with
    ONE correctly-rounded conversion and division per node. The
    iteration count is fixed, so the trajectory is a pure function of
    the graph.

    Scale shape — the canonical distributed PageRank plan: out-weights
    computed once and joined onto the (checkpointed) edge frame;
    each round is one src-keyed join (edges co-partitioned with the
    rank frame) and one dst-keyed aggregate with map-side combine —
    two narrow shuffles per round regardless of graph size. Lineage is
    cut every ``checkpoint_every`` rounds rather than every round: the
    rank chain is LINEAR (each round referenced once), so a few rounds
    of plan depth cost nothing to execute, while an eager checkpoint
    per round costs a full job each — every-3 measured ~2× faster
    end-to-end at gate scale with identical results (SURVEY §6).
    """
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(weight_col).cast("double").alias("w"),
    )
    # weights must be POSITIVE to mean anything here: a zero-weight
    # edge carries no rank (and would make pr*w/outw NaN when it is a
    # node's only edge), a negative one has no PageRank semantics and
    # can drive outw to 0 (division blow-up). Dropping them makes a
    # node whose edges were all non-positive correctly DANGLING.
    e = e.filter(F.col("w") > 0)
    outw = e.groupBy("src").agg(F.sum("w").alias("outw"))
    ee = e.join(outw, on="src").localCheckpoint(eager=True)
    nodes = (
        ee.select(F.col("src").alias("node"))
        .unionByName(ee.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("pagerank"))
    # dangling = nodes with no out-edges; their rank redistributes
    # uniformly each round (quantized-exact sum, like the edge path)
    dangling = nodes.join(
        outw.select(F.col("src").alias("node")), on="node", how="left_anti"
    ).localCheckpoint(eager=True)
    # with dangling nodes each round reads pr TWICE (edge path + the
    # broadcast dangling-mass scalar), so lineage must be cut every
    # round; the dangling-free (e.g. symmetric) case keeps the sparse
    # checkpoint cadence
    has_dangling = dangling.count() > 0
    if has_dangling:
        checkpoint_every = 1
    tele = repr(1.0 - damping)  # precomputed literal: both engines parse the same double
    d = repr(damping)
    pr = nodes.select("node", F.lit(1.0 / n).alias("pr"))
    for i in range(iters):
        contrib = ee.join(pr, ee.src == pr.node).select(
            F.col("dst"),
            F.expr("CAST(floor(pr * w / outw * 1e9 + 0.5) AS BIGINT)").alias("c"),
        )
        s = contrib.groupBy("dst").agg(F.sum("c").cast("bigint").alias("s"))
        nxt = nodes.join(s, nodes.node == s.dst, "left")
        if has_dangling:
            # dangling rank this round as a broadcast 1-row exact sum
            # (no driver collect — the zero-collect discipline holds)
            dqf = (
                dangling.join(pr, on="node")
                .agg(
                    F.expr(
                        "CAST(coalesce(SUM(CAST(floor(pr * 1e9 + 0.5) AS BIGINT)), 0) AS BIGINT)"
                    ).alias("__dq")
                )
            )
            pr = nxt.crossJoin(F.broadcast(dqf)).select(
                "node",
                F.expr(
                    f"{tele} / {n} + {d} * (CAST(coalesce(s, 0) AS DOUBLE) / 1e9)"
                    f" + {d} * (CAST(__dq AS DOUBLE) / 1e9) / {n}"
                ).alias("pr"),
            )
        else:
            pr = nxt.select(
                "node",
                F.expr(f"{tele} / {n} + {d} * (CAST(coalesce(s, 0) AS DOUBLE) / 1e9)").alias("pr"),
            )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            pr = pr.localCheckpoint(eager=True)
    return pr.select("node", F.col("pr").alias("pagerank"))
