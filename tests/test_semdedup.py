"""SemDeDup (operators/semdedup.py): keep policy, duplicate-group
structure, gemm==fold agreement, planted semantic duplicates."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _planted(spark, seed=7):
    """3 tight semantic-dup groups + isolated singletons, far apart in
    cosine space: group g centered on a random unit direction, members
    = tiny perturbations (cosine ~ 0.999); singletons random."""
    rng = np.random.default_rng(seed)
    rows = []
    vid = 0
    truth = {}
    for g in range(3):
        center = rng.normal(size=32)
        center /= np.linalg.norm(center)
        for m in range(4):
            v = center + rng.normal(size=32) * 0.01
            rows.append((vid, [float(x) for x in v]))
            truth[vid] = g
            vid += 1
    for _ in range(10):
        v = rng.normal(size=32)
        rows.append((vid, [float(x) for x in v]))
        truth[vid] = None
        vid += 1
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        truth,
    )


def test_semdedup_finds_planted_groups_and_keeps_one(spark):
    from rag_vertex_ai_vector_search_spark.operators.semdedup import (
        semdedup,
    )

    df, truth = _planted(spark)
    out = {r.vec_id: r for r in
           semdedup(df, n_clusters=4, threshold=0.95).collect()}
    assert len(out) == 22  # every row annotated

    # each planted group collapses to one component with ONE keeper
    for g in range(3):
        members = [v for v, grp in truth.items() if grp == g]
        comps = {out[v].component_id for v in members}
        assert len(comps) == 1, f"group {g} split: {comps}"
        keepers = [v for v in members if out[v].keep]
        assert len(keepers) == 1
        # the paper's policy: the keeper has the LOWEST centroid_sim
        kept_sim = out[keepers[0]].centroid_sim
        assert all(
            kept_sim <= out[v].centroid_sim + 1e-12 for v in members
        )
        assert all(out[v].component_size == 4 for v in members)

    # singletons all survive
    singles = [v for v, grp in truth.items() if grp is None]
    assert all(out[v].keep for v in singles)
    assert all(out[v].component_size == 1 for v in singles)

    # total kept = 3 representatives + 10 singletons
    assert sum(1 for r in out.values() if r.keep) == 13


@pytest.mark.full
def test_semdedup_gemm_and_fold_agree(spark):
    """Both pair backends produce the same verdicts (scores differ in
    ulps; the >= threshold decisions and components must not)."""
    from rag_vertex_ai_vector_search_spark.operators.semdedup import (
        semdedup,
    )

    df, _ = _planted(spark, seed=11)
    a = {(r.vec_id, r.component_id, r.keep)
         for r in semdedup(df, n_clusters=4, threshold=0.95,
                           pair_method="gemm").collect()}
    b = {(r.vec_id, r.component_id, r.keep)
         for r in semdedup(df, n_clusters=4, threshold=0.95,
                           pair_method="fold").collect()}
    assert a == b


def test_semdedup_explicit_centroids_path(spark):
    """The oracle configuration (data-row centroids) runs the same
    machinery; with one cluster it degenerates to brute-force pairs
    (no boundary misses)."""
    from rag_vertex_ai_vector_search_spark.operators.semdedup import (
        semdedup,
    )

    df, truth = _planted(spark, seed=13)
    first = np.asarray(
        [r.embedding for r in df.orderBy("vec_id").limit(1).collect()],
        dtype=np.float64,
    )
    out = {r.vec_id: r for r in
           semdedup(df, threshold=0.95, centroids=first,
                    pair_method="fold").collect()}
    for g in range(3):
        members = [v for v, grp in truth.items() if grp == g]
        assert sum(1 for v in members if out[v].keep) == 1
