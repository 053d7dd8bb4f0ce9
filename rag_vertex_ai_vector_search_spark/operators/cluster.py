"""Connected components over near-duplicate pair edges.

Every dedup pair generator in operators/dedup.py emits (id_a, id_b)
evidence edges; turning pairs into "keep one per cluster" decisions
needs the transitive closure -- A~B and B~C must land A, B, C in ONE
cluster even though (A, C) was never emitted (star-capped hot buckets
rely on this). This operator labels every node with the minimum id
reachable from it.

Algorithm: iterative min-label propagation (the simplest member of the
Afrati/Sarma MapReduce connected-components family). Each round every
node takes the min of its own label and its neighbors' labels -- one
shuffle (edge join) + one aggregation per round; rounds needed = graph
diameter. Near-dup graphs are short-diameter by construction (cliques
from banding; stars from the hot-bucket cap), so this converges in a
handful of rounds; `max_iter` bounds the worst case and the loop stops
early on a converged round (checked with a cheap count action).
`localCheckpoint` truncates the plan lineage each round so the job
doesn't recompile an ever-growing DAG -- the standard iterative-
algorithm pattern on Spark (same shape MLlib uses).

At 100 TB: each round shuffles |E| + |V| rows of two bigints -- no
per-round growth, no driver-side state, skew bounded by the hottest
node degree (already star-capped upstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    *,
    max_iter: int = 25,
) -> DataFrame:
    """Label each node appearing in ``pairs`` with its component's min id.

    Returns (node_id, component_id), one row per DISTINCT node. Raises
    if not converged within ``max_iter`` rounds (diameter > max_iter --
    would indicate pathological chain-shaped duplicate clusters).
    """
    edges = (
        pairs.select(
            F.col(id_a).alias("src"), F.col(id_b).alias("dst")
        )
        .unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    labels = (
        edges.select(F.col("src").alias("node_id"))
        .distinct()
        .withColumn("component_id", F.col("node_id"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # neighbor labels: for edge (src, dst), dst hears src's label
        msgs = (
            edges.join(labels, edges.src == labels.node_id)
            .select(F.col("dst").alias("node_id"), F.col("component_id"))
        )
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("node_id")
            .agg(F.min("component_id").alias("component_id"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(
                labels.alias("o"),
                F.col("n.node_id") == F.col("o.node_id"),
            )
            .filter(F.col("n.component_id") != F.col("o.component_id"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def dedup_keep_one(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    *,
    max_iter: int = 25,
) -> DataFrame:
    """Cluster assignment + per-cluster size, the "keep component_id,
    drop the rest" decision table. (node_id, component_id, cluster_size);
    rows with node_id == component_id are the keepers."""
    comp = connected_components(pairs, id_a, id_b, max_iter=max_iter)
    sizes = comp.groupBy("component_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return comp.join(sizes, "component_id").select(
        "node_id", "component_id", "cluster_size"
    )
