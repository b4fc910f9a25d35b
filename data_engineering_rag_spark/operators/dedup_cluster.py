"""Duplicate-cluster resolution: connected components over a
candidate-pair edge list (the step after LSH/fuzzy matching — groups of
mutual near-duplicates collapse to one canonical id).

Iterative min-label propagation (the simple variant of the
small-star/large-star map-reduce algorithm): every node repeatedly
adopts the smallest component id among itself and its neighbors;
converges in O(component diameter) rounds. Spark can't express the
fixpoint declaratively, so this is a driver-side loop of joins —
each round localCheckpoints to truncate lineage (without that,
iteration N replays rounds 1..N-1), and convergence is an exact
changed-row count, so termination is data-driven, not guessed.

At 100 TB: per-round cost is one join + one groupBy on (node) — both
partitioned by node id; rounds ≈ diameter of the LARGEST near-dup
cluster, which for dedup workloads is small (dup clusters are dense).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(src, dst) undirected edges → (node, component) with component =
    min node id of the connected component. Isolated endpoints appear
    with component = themselves; nodes absent from ``edges`` are
    unknown to this function (join the full population afterwards)."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def cluster_sizes(components: DataFrame) -> DataFrame:
    return components.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
