"""Connected components over near-duplicate pair edges.

Every dedup pair generator in operators/dedup.py emits (id_a, id_b)
evidence edges; turning pairs into "keep one per cluster" decisions
needs the transitive closure -- A~B and B~C must land A, B, C in ONE
cluster even though (A, C) was never emitted (star-capped hot buckets
rely on this). This operator labels every node with the minimum id
reachable from it.

Algorithm: min-label propagation with POINTER JUMPING. Each round every
node takes the min of its own label and its neighbors' labels (one edge
join + one min aggregation), then labels are contracted one hop --
label(v) := label(label(v)) -- so the distance a minimum travels per
round roughly doubles and convergence needs O(log diameter) rounds, not
O(diameter) (the Shiloach-Vishkin contraction idea, same reason
large-star/small-star converges logarithmically). Near-dup graphs are
short-diameter anyway (cliques from banding; stars from the hot-bucket
cap), so 2-4 rounds in practice.

Convergence detection is JOIN-FREE: labels only ever decrease, so the
sum of all labels is strictly monotone decreasing until the fixpoint;
one tiny aggregate per round (summed in DECIMAL(38,0) -- at 1e10 nodes
a bigint sum of ids would overflow) replaces an old-vs-new join. At the
fixpoint every edge has equal labels on both ends and each component is
labeled by its minimum node id.

`localCheckpoint` truncates the plan lineage each round so round N's
job doesn't replay rounds 1..N-1 -- the standard iterative-algorithm
pattern on Spark (same shape MLlib uses).

At 100 TB: each round shuffles |E| + 2|V| rows of two bigints -- no
per-round growth, no driver-side graph state, skew bounded by the
hottest node degree (already star-capped upstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


DRIVER_CC_THRESHOLD = 500_000


def _union_find_local(edge_rows) -> list[tuple]:
    """Driver-side union-find with path compression + union by min id.
    ~16 B/edge; at the 5e5-edge threshold this is a few MB and
    microseconds per op -- far below one Spark job's overhead."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in edge_rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return [(n, find(n)) for n in parent]


def _symmetric_edges(pairs: DataFrame, id_a: str, id_b: str) -> DataFrame:
    return (
        pairs.select(
            F.col(id_a).alias("src"), F.col(id_b).alias("dst")
        )
        .unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )


def _small_edge_rows(edges: DataFrame, driver_threshold: int):
    """One bounded collect (<= threshold pairs of ids, ~8 MB max) when
    the edge set is under the strategy-switch threshold, else None."""
    if driver_threshold and edges.count() <= driver_threshold:
        return [(r[0], r[1]) for r in edges.collect()]
    return None


def _local_df(spark, rows, schema):
    """Single-partition local result: no point scattering a driver-side
    list over defaultParallelism partitions just to shuffle it back."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    *,
    max_iter: int = 25,
    driver_threshold: int = DRIVER_CC_THRESHOLD,
) -> DataFrame:
    """Label each node appearing in ``pairs`` with its component's min id.

    Returns (node_id, component_id), one row per DISTINCT node. Raises
    if not converged within ``max_iter`` rounds (diameter > max_iter --
    would indicate pathological chain-shaped duplicate clusters).

    Size-based strategy switch (the broadcast-join-threshold idea):
    near-dup edge sets are bounded by ACTUAL duplication, usually tiny
    next to the corpus, and each distributed label round costs 2-3
    Spark jobs of fixed overhead. Below ``driver_threshold`` distinct
    edges (<= ~8 MB of id pairs) the transitive closure runs as
    driver-side union-find in one collect; above it, distributed
    min-label propagation with pointer jumping takes over. Results are
    identical (tests/test_cluster.py asserts both paths agree).
    """
    edges = _symmetric_edges(pairs, id_a, id_b)
    small = _small_edge_rows(edges, driver_threshold)
    if small is not None:
        comp = _union_find_local(small)
        schema = T.StructType([
            T.StructField("node_id", edges.schema["src"].dataType),
            T.StructField("component_id", edges.schema["src"].dataType),
        ])
        return _local_df(pairs.sparkSession, comp, schema)
    return _cc_distributed(edges, max_iter)


def _cc_distributed(edges: DataFrame, max_iter: int) -> DataFrame:
    """Distributed min-label propagation with pointer jumping (module
    docstring); ``edges`` must be symmetric, distinct, materialized."""
    labels = (
        edges.select(F.col("src").alias("node_id"))
        .distinct()
        .withColumn("component_id", F.col("node_id"))
        .localCheckpoint(eager=True)
    )

    def _label_sum(lab: DataFrame):
        return lab.agg(
            F.sum(F.col("component_id").cast("decimal(38,0)"))
        ).collect()[0][0]

    prev_sum = _label_sum(labels)
    for _ in range(max_iter):
        # neighbor labels: for edge (src, dst), dst hears src's label;
        # least(own, min over neighbors) via a left join (a union +
        # groupBy would shuffle |V| extra rows and trips a Catalyst
        # constraint-rewrite bug when unioning a plan with its own
        # derivative)
        nbr = (
            edges.join(labels, edges.src == labels.node_id)
            .groupBy("dst")
            .agg(F.min("component_id").alias("_nbr_min"))
        )
        # materialize before the self-join below: both sides read it (a
        # lazy plan would execute the join+groupBy twice)
        hop = (
            labels.join(nbr, labels.node_id == nbr.dst, "left")
            .select(
                "node_id",
                F.least(
                    F.col("component_id"),
                    F.coalesce(F.col("_nbr_min"), F.col("component_id")),
                ).alias("component_id"),
            )
            .localCheckpoint(eager=True)
        )
        # pointer jump: component ids are themselves node ids, so
        # contracting one hop (label of label) doubles propagation reach
        new_labels = (
            hop.alias("a")
            .join(
                hop.alias("b"),
                F.col("a.component_id") == F.col("b.node_id"),
            )
            .select(
                F.col("a.node_id").alias("node_id"),
                F.col("b.component_id").alias("component_id"),
            )
            .localCheckpoint(eager=True)
        )
        labels = new_labels
        cur_sum = _label_sum(labels)
        if cur_sum == prev_sum:  # labels only decrease: equal sum == fixpoint
            return labels
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def dedup_keep_one(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    *,
    max_iter: int = 25,
    driver_threshold: int = DRIVER_CC_THRESHOLD,
) -> DataFrame:
    """Cluster assignment + per-cluster size, the "keep component_id,
    drop the rest" decision table. (node_id, component_id, cluster_size);
    rows with node_id == component_id are the keepers.

    On the small-edge-set path the sizes are counted driver-side too:
    the whole decision table comes back as one shuffle-free local
    DataFrame instead of a groupBy + join over a 500-row input."""
    edges = _symmetric_edges(pairs, id_a, id_b)
    small = _small_edge_rows(edges, driver_threshold)
    if small is not None:
        from collections import Counter

        comp = _union_find_local(small)
        sizes = Counter(c for _, c in comp)
        id_type = edges.schema["src"].dataType
        schema = T.StructType([
            T.StructField("node_id", id_type),
            T.StructField("component_id", id_type),
            T.StructField("cluster_size", T.LongType()),
        ])
        return _local_df(
            pairs.sparkSession,
            [(n, c, sizes[c]) for n, c in comp],
            schema,
        )
    comp = _cc_distributed(edges, max_iter)
    sizes = comp.groupBy("component_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return comp.join(sizes, "component_id").select(
        "node_id", "component_id", "cluster_size"
    )
