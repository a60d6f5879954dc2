"""Iterative graph operators: connected components for dedup clustering.

Near-dup detection emits PAIRS; deduplication needs CLUSTERS (keep one
document per connected component of the similarity graph). Min-label
propagation computes them: every node repeatedly adopts the smallest
label among itself and its neighbors until fixpoint — label = the
component's minimum node id, a deterministic canonical representative.

Scale shape: each iteration is one join + one aggregation, both
shuffling on node id (the partitioning is reused across iterations);
iterations needed = graph diameter, and near-dup graphs are shallow
(clusters are cliques-ish). The driver loop only checks a converged
COUNT per iteration — no data ever collects. Lineage is truncated with
localCheckpoint every few rounds so plans don't grow unboundedly.
GraphFrames/Pregel is the off-the-shelf alternative; this formulation
needs nothing beyond DataFrames. The DuckDB oracle replays the result
with a recursive transitive-closure CTE — feasible because component
labels (min reachable id) are iteration-order independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    checkpoint_every: int = 5,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component = min
    node id reachable. Undirected: both directions are added."""
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = fwd.union(fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    e = e.localCheckpoint()  # materialize once; reused every iteration
    labels = (
        e.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for it in range(max_iter):
        # smallest label among each node's neighbors this round
        neigh_min = (
            e.join(labels, e.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neigh_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias(
                    "label"
                ),
                (F.col("nmin") < F.col("label")).alias("changed"),
            )
        )
        if (it + 1) % checkpoint_every == 0 or it == max_iter - 1:
            new_labels = new_labels.localCheckpoint()
        n_changed = new_labels.filter(F.col("changed")).count()
        labels = new_labels.select("node", "label")
        if n_changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))


def dedup_survivors(pairs: DataFrame, all_ids: DataFrame, id_col: str) -> DataFrame:
    """Cluster-level dedup: one survivor (the component minimum) per
    near-dup cluster, plus every unpaired document."""
    comps = connected_components(pairs, src="keep_id", dst="dup_id")
    drop = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return all_ids.join(drop, id_col, "left_anti")
