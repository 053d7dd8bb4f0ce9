"""Integer-exact PageRank (operators/graph.py): structure, bounds,
and the determinism that justifies the integer design."""

import pytest
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.operators.graph import pagerank


def _star_plus_chain(spark):
    """Hub h receives links from 5 spokes; chain a->b->c feeds a."""
    edges = [("s1", "h"), ("s2", "h"), ("s3", "h"), ("s4", "h"),
             ("s5", "h"), ("a", "b"), ("b", "c"), ("c", "a"),
             ("h", "a")]
    return spark.createDataFrame(edges, "src string, dst string")


@pytest.mark.full
def test_pagerank_hub_dominates_and_mass_bounded(spark):
    e = _star_plus_chain(spark)
    pr = {r.node_id: r.pr_units for r in pagerank(e, n_iter=12).collect()}
    assert len(pr) == 9
    # the hub out-ranks every spoke
    assert all(pr["h"] > pr[f"s{i}"] for i in range(1, 6))
    # spokes are symmetric -> identical integer ranks
    assert len({pr[f"s{i}"] for i in range(1, 6)}) == 1
    # total mass stays within the documented round-down drift:
    # <= scale, and loses < (N + dangling) units per iteration
    total = sum(pr.values())
    assert total <= 10 ** 9
    assert total > 0.5 * 10 ** 9  # chain recycles most mass


@pytest.mark.full
def test_pagerank_partition_order_invariant(spark):
    """Integer arithmetic admits no float reassociation: any input
    partitioning yields the identical rank table."""
    e = _star_plus_chain(spark)
    a = sorted((r.node_id, r.pr_units)
               for r in pagerank(e.coalesce(1), n_iter=8).collect())
    b = sorted((r.node_id, r.pr_units)
               for r in pagerank(e.repartition(16), n_iter=8).collect())
    assert a == b


def test_pagerank_uniform_cycle_is_uniform(spark):
    """A pure cycle has a uniform stationary distribution; integer
    rounding must preserve the symmetry exactly."""
    n = 6
    e = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long"
    )
    pr = [r.pr_units for r in pagerank(e, n_iter=10).collect()]
    assert len(set(pr)) == 1


def test_pagerank_empty_raises(spark):
    e = spark.createDataFrame([], "src long, dst long")
    with pytest.raises(ValueError, match="empty edge list"):
        pagerank(e)


@pytest.mark.full
def test_pagerank_weighted_splits_rank_by_weight(spark):
    """src fans out to a (weight 3) and b (weight 1): a must receive
    ~3x b's contribution; with uniform weights they tie. Parallel
    (src, dst) rows must aggregate into one weighted edge."""
    e = spark.createDataFrame(
        [("s", "a", 2), ("s", "a", 1), ("s", "b", 1),
         ("a", "s", 1), ("b", "s", 1)],
        "src string, dst string, w int",
    )
    pr = {r.node_id: r.pr_units
          for r in pagerank(e, weight_col="w", n_iter=12).collect()}
    assert pr["a"] > pr["b"]
    # uniform weights restore the tie
    pr_u = {r.node_id: r.pr_units
            for r in pagerank(e.select("src", "dst"), n_iter=12).collect()}
    assert pr_u["a"] == pr_u["b"]


@pytest.mark.full
def test_pagerank_personalized_teleport_shares(spark):
    """Teleport mass lands only on nodes with a share; a node outside
    the personalization set with no in-links converges to rank 0."""
    n = 8
    e = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)] + [(99, 0)],
        "src long, dst long",
    )
    pers = spark.createDataFrame(
        [(0, 3), (1, 1)], "node_id long, share long"
    )
    pr = {r.node_id: r.pr_units
          for r in pagerank(e, personalization=pers, n_iter=20).collect()}
    # node 99 has no in-edges and no teleport share -> mass decays to 0
    assert pr[99] == 0
    # node 0 (share 3) out-ranks node 1 (share 1 but also fed by 0's
    # chain position): check teleport-only corner instead -- node 0
    # gets 3/4 of teleport, and every node is reachable so all > 0
    assert pr[0] > 0 and pr[1] > 0
    assert sum(pr.values()) <= 10 ** 9


def test_pagerank_personalized_invalid_shares(spark):
    e = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    pers = spark.createDataFrame([(0, 0)], "node_id long, share long")
    with pytest.raises(ValueError, match="sum > 0"):
        pagerank(e, personalization=pers)


@pytest.mark.full
def test_hits_hubs_and_authorities_separate(spark):
    """Bipartite citation: s* link to t* -> s* are pure hubs (high hub,
    zero authority), t* pure authorities; t1 with more in-links
    out-authorities t2. Partition-order invariant (integer L1
    normalization)."""
    from rag_vertex_ai_vector_search_spark.operators.graph import hits

    edges = [("s1", "t1"), ("s2", "t1"), ("s3", "t1"),
             ("s1", "t2"), ("s2", "t2")]
    e = spark.createDataFrame(edges, "src string, dst string")
    out = {r.node_id: r for r in hits(e, n_iter=8).collect()}
    for s in ("s1", "s2", "s3"):
        assert out[s].auth_units == 0, s       # nothing points at s*
    for t in ("t1", "t2"):
        assert out[t].hub_units == 0, t        # t* point at nothing
    assert out["t1"].auth_units > out["t2"].auth_units
    # s1/s2 (2 out-links each) out-hub s3 (1)
    assert out["s1"].hub_units == out["s2"].hub_units
    assert out["s1"].hub_units > out["s3"].hub_units

    a = sorted((r.node_id, r.hub_units, r.auth_units)
               for r in hits(e.coalesce(1), n_iter=8).collect())
    b = sorted((r.node_id, r.hub_units, r.auth_units)
               for r in hits(e.repartition(16), n_iter=8).collect())
    assert a == b


def test_hits_empty_raises(spark):
    from rag_vertex_ai_vector_search_spark.operators.graph import hits

    e = spark.createDataFrame([], "src long, dst long")
    with pytest.raises(ValueError, match="empty edge list"):
        hits(e)
