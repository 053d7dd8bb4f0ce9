"""connected_components / dedup_keep_one vs a union-find reference."""

import random

import pytest
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.operators import (
    connected_components,
    dedup_keep_one,
)


def _union_find(edges):
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
    # canonical: min id per component
    comp = {}
    for x in list(parent):
        root = find(x)
        comp.setdefault(root, []).append(x)
    out = {}
    for members in comp.values():
        m = min(members)
        for x in members:
            out[x] = m
    return out


def _pairs_df(spark, edges):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], ["id_a", "id_b"]
    )


@pytest.mark.full
@pytest.mark.parametrize("driver_threshold", [0, 500_000])
def test_matches_union_find_on_random_graph(spark, driver_threshold):
    """Both strategies -- distributed label propagation (threshold=0)
    and driver-side union-find (small edge set) -- match the reference
    and therefore each other."""
    rng = random.Random(7)
    edges = [
        (rng.randrange(200), rng.randrange(200)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    got = {
        r.node_id: r.component_id
        for r in connected_components(
            _pairs_df(spark, edges), driver_threshold=driver_threshold
        ).collect()
    }
    assert got == _union_find(edges)


@pytest.mark.full
def test_chain_graph_worst_diameter(spark):
    """A 30-node path exercises multi-round convergence: the min label
    travels one hop per round, so diameter-many rounds are needed --
    the worst case the max_iter guard exists for. driver_threshold=0
    forces the distributed path."""
    edges = [(i, i + 1) for i in range(29)]
    got = {
        r.node_id: r.component_id
        for r in connected_components(
            _pairs_df(spark, edges), max_iter=40, driver_threshold=0
        ).collect()
    }
    assert got == {i: 0 for i in range(30)}


def test_star_plus_bridge(spark):
    """Two star-capped cliques joined by one bridge edge collapse into
    one component -- the exact situation the hot-bucket star-cap
    relies on downstream CC to resolve."""
    star1 = [(0, i) for i in range(1, 10)]
    star2 = [(100, 100 + i) for i in range(1, 10)]
    bridge = [(5, 105)]
    edges = star1 + star2 + bridge
    comp = connected_components(_pairs_df(spark, edges))
    assert comp.select("component_id").distinct().count() == 1
    keep = dedup_keep_one(_pairs_df(spark, edges))
    row = keep.filter(F.col("node_id") == 109).first()
    assert row.component_id == 0 and row.cluster_size == 20


def test_non_convergence_raises(spark):
    edges = [(i, i + 1) for i in range(10)]
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(
            _pairs_df(spark, edges), max_iter=2, driver_threshold=0
        )
