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
only checks a scalar convergence count (no data collected). For
graphs with long chains at extreme scale, switch to the
large-star/small-star algorithm (Kiveris et al.) — same join
primitives, fewer rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    """
    sym = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b")).unionByName(
        edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
    )
    labels = vertices.select(F.col(id_col).alias("a"), F.col(id_col).alias("label"))
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels.withColumnRenamed("a", "b").withColumnRenamed("label", "nl"), on="b")
            .groupBy("a")
            .agg(F.min("nl").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, on="a", how="left")
            .select("a", F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias("label"))
        )
        # one scalar per round; both frames are tiny projections
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="a")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("a").alias(id_col), F.col("label").alias("component"))
