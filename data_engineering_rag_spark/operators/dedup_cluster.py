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

from .scale import _UNSET
from .scale import durable_checkpoint as _durable


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    on_nonconverged: str = "raise",
    checkpoint_dir: str | None | object = _UNSET,
) -> DataFrame:
    """(src, dst) undirected edges → (node, component) with component =
    min node id of the connected component. Isolated endpoints appear
    with component = themselves; nodes absent from ``edges`` are
    unknown to this function (join the full population afterwards).

    If min-label propagation has not reached a fixpoint after
    ``max_iter`` rounds (component diameter > max_iter — long
    chain-shaped clusters), labels would be silently wrong;
    ``on_nonconverged`` picks the failure mode: ``"raise"`` (default)
    or ``"ignore"`` (callers who only need a refinement, not exact
    components). ``checkpoint_dir`` switches per-round lineage
    truncation from executor-local to reliable checkpoints (defaults
    to ``SPARK_GRAFT_CHECKPOINT_DIR`` when set)."""
    if on_nonconverged not in ("raise", "ignore"):
        raise ValueError(f"on_nonconverged must be 'raise' or 'ignore', got {on_nonconverged!r}")
    sym = _durable(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct(),
        checkpoint_dir,
    )
    labels = _durable(
        sym.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component")),
        checkpoint_dir,
    )
    changed = -1
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = _durable(
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))
                ).alias("component"),
            ),
            checkpoint_dir,
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
    if changed != 0 and on_nonconverged == "raise":
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); raise max_iter (component "
            "diameter exceeds it) or pass on_nonconverged='ignore'"
        )
    return labels


def cluster_sizes(components: DataFrame) -> DataFrame:
    return components.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
