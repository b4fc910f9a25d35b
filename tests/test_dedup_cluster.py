"""Connected components vs a pure-Python union-find oracle."""

from __future__ import annotations

from data_engineering_rag_spark.operators.dedup_cluster import (
    cluster_sizes,
    connected_components,
)


def union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


CASES = [
    # chain, triangle, isolated pair, star
    [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21), (30, 31), (30, 32), (30, 33)],
    # single long path (worst diameter for label propagation)
    [(i, i + 1) for i in range(0, 15)],
    # duplicate + reversed edges
    [(5, 1), (1, 5), (5, 1), (2, 5)],
]


def test_components_match_union_find(spark):
    for edges in CASES:
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {r.node: r.component for r in connected_components(df).collect()}
        expected = union_find(edges)
        assert got == expected, edges


def test_cluster_sizes(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], ["src", "dst"])
    comp = connected_components(df)
    sizes = {r.component: r.cluster_size for r in cluster_sizes(comp).collect()}
    assert sizes == {1: 3, 10: 2}


def test_nonconvergence_raises(spark):
    import pytest

    # path graph of diameter 15 cannot converge in 2 rounds
    df = spark.createDataFrame([(i, i + 1) for i in range(0, 15)], ["src", "dst"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=2)
    # explicit opt-out returns the partial refinement instead
    partial = connected_components(df, max_iter=2, on_nonconverged="ignore")
    assert partial.count() == 16


def test_components_with_reliable_checkpoint(spark, tmp_path):
    edges = [(1, 2), (2, 3), (10, 11)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r.node: r.component
        for r in connected_components(df, checkpoint_dir=str(tmp_path / "cc")).collect()
    }
    assert got == union_find(edges)
