"""Iterative graph algorithms as dataframe joins (EXT family —
companion to ``dedup_cluster.connected_components``): PageRank power
iteration.

Semantics (pinned so an unrolled SQL oracle can verify): PR_0 = 1/N
for every node; PR_{t+1}(v) = (1-d)/N + d·Σ_{(u,v)∈E} PR_t(u)/outdeg(u).
Dangling mass is NOT redistributed (documented variant — the sum is
not preserved when sinks exist; rank ORDER is what downstream sampling
uses, and redistribution only adds a per-iteration constant when the
dangling set is stable).

Float discipline: the per-node contribution sum is decimal-exact
(``cast(... as decimal(28,18))`` before summing) so results are
engine-portable despite double-sum order dependence — the same guard
the TF-IDF/Rocchio aggregations use.

Scale notes: each iteration is one equi-join of the rank vector with
the edge list on ``src`` plus one groupBy on ``dst`` — both shuffle on
node id, so pre-partitioning edges and ranks by node id makes every
iteration co-partitioned. Lineage grows linearly with iterations; for
deep runs pass ``checkpoint_every`` (uses the same durable-checkpoint
seam as connected components: ``operators/scale.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 2,
    damping: float = 0.85,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """Power-iteration PageRank. Returns ``(node_col, pr)`` with ``pr``
    the raw double (callers round for cross-engine output)."""
    from .scale import durable_checkpoint

    n_nodes = nodes.count()  # one job; the rank constant must be a literal
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    edeg = e.join(outdeg, "src")

    base = F.lit((1.0 - damping) / n_nodes)
    pr = nodes.select(F.col(node_col).alias("id"), (F.lit(1.0) / n_nodes).alias("pr"))
    for i in range(n_iter):
        contrib = (
            edeg.join(pr, edeg.src == pr.id)
            .select(edeg.dst.alias("id"), (F.col("pr") / F.col("outdeg")).alias("c"))
            .groupBy("id")
            .agg(F.sum(F.col("c").cast("decimal(28,18)")).cast("double").alias("s"))
        )
        pr = (
            nodes.select(F.col(node_col).alias("id"))
            .join(contrib, "id", "left")
            .select(
                "id",
                (base + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))).alias("pr"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            pr = durable_checkpoint(pr)
    return pr.select(F.col("id").alias(node_col), "pr")
