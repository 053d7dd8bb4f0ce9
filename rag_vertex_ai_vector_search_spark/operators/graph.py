"""Link-graph analytics: PageRank in exact integer arithmetic.

Why here: web-corpus pipelines weight documents by domain/page
authority (the original Common Crawl ranking signal; harmonic-
centrality and PageRank tables ship with every CC release), and a
quality-weighted sampler (DSIR, Gumbel selection) composes naturally
with a per-domain authority score.

Why integer: distributed float PageRank sums contributions in
partition order -- non-deterministic in the last ulp across runs and
engines. This implementation stores rank as INTEGER micro-units
(``scale`` = 1e9 per unit of probability) and defines each iteration
with integer division only:

    contrib(e)  = pr[src] div outdeg[src]
    pr'[v]      = teleport + (d_num * sum contrib(e into v)) div d_den
    teleport    = (scale - (d_num * scale) div d_den) div N

Long sums are exact and order-independent, so the WHOLE fixpoint is
bit-reproducible anywhere -- including DuckDB, where the same
iterations chain as CTE stages (the bpe_train pattern). The price is
deterministic round-down drift (total mass shrinks by < N units per
iteration; dangling mass is dropped, the common link-graph variant) --
an approximation the gate makes exact by CONSTRUCTION rather than by
float luck. n_iter is fixed (power iteration converges geometrically;
10-20 rounds is the standard web-graph budget).

Scale shape per iteration: one join edges->pr (shuffle on src), one
groupBy dst (shuffle on dst), one left join back to nodes -- all
equi-joins on ids; localCheckpoint truncates lineage every few rounds
like the CC and BPE loops. The only driver scalars are N (one count)
and, for the personalized variant, the one-row teleport-share sum.

Weighted edges and personalized teleport (round 7) stay inside the
same integer algebra:

    contrib(e)  = (pr[src] * w(e)) div wdeg[src]   (wdeg = sum of
                  outgoing weights; w(e) an integer multiplicity,
                  e.g. a link count)
    teleport[v] = (total_teleport * share[v]) div sum_shares
                  (per-node integer shares; uniform when no
                  personalization vector is given)

so weighted and topic-conditioned (personalized) authority both stay
bit-reproducible and mirror in the same chained-CTE oracle.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: Optional[str] = None,
    personalization: Optional[DataFrame] = None,
    n_iter: int = 10,
    damping_num: int = 17,
    damping_den: int = 20,
    scale: int = 10 ** 9,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Integer-exact PageRank over a directed edge list. Returns
    ``(node_id, pr_units, pr)`` -- rank in micro-units (long) and as a
    double (units / scale). Damping is the rational
    ``damping_num/damping_den`` (default 17/20 = 0.85).

    ``weight_col`` names an integer edge-multiplicity column (e.g. a
    link count): parallel edges are summed per (src, dst) and each
    source's rank splits proportionally to weight instead of uniformly.
    ``personalization`` is an optional ``(node_id, share)`` DataFrame of
    integer teleport shares -- the topic-conditioned (personalized)
    variant; nodes absent from it get zero teleport mass. Both stay in
    pure integer arithmetic, so the fixpoint remains bit-reproducible
    across engines and partitionings.
    """
    if weight_col is None:
        e = edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        ).distinct().withColumn("w", F.lit(1).cast("long"))
    else:
        e = (
            edges.select(
                F.col(src_col).alias("src"),
                F.col(dst_col).alias("dst"),
                F.col(weight_col).cast("long").alias("w"),
            )
            .groupBy("src", "dst")
            .agg(F.sum("w").cast("long").alias("w"))
        )
    nodes = (
        e.select(F.col("src").alias("node_id"))
        .union(e.select(F.col("dst").alias("node_id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank on an empty edge list")
    init_units = scale // n
    total_teleport = scale - (damping_num * scale) // damping_den

    if personalization is None:
        # Uniform teleport: one constant per node.
        tele = nodes.withColumn(
            "_tele", F.lit(total_teleport // n).cast("long")
        )
    else:
        shares = personalization.select(
            F.col("node_id"), F.col("share").cast("long").alias("share")
        )
        # Normalize over ON-GRAPH shares only: off-graph node_ids in the
        # personalization table would otherwise dilute sum_shares and
        # silently shrink the total teleport mass below (1-d)*scale
        # (standard personalized-PageRank renormalizes to the node set).
        shares = shares.join(
            nodes, "node_id", "left_semi"
        ).localCheckpoint(eager=True)
        sum_shares = shares.agg(F.sum("share")).collect()[0][0]
        if not sum_shares or sum_shares <= 0:
            raise ValueError("personalization shares must sum > 0")
        tele = (
            nodes.join(shares, "node_id", "left")
            .select(
                "node_id",
                F.expr(
                    f"({total_teleport} * coalesce(share, 0L))"
                    f" div {sum_shares}"
                ).cast("long").alias("_tele"),
            )
        )
    tele = tele.localCheckpoint(eager=True)

    outdeg = e.groupBy("src").agg(F.sum("w").cast("long").alias("_deg"))
    pr = nodes.withColumn("pr_units", F.lit(init_units).cast("long"))
    for i in range(1, n_iter + 1):
        contrib = (
            e.join(pr, e["src"] == pr["node_id"])
            .join(outdeg, "src")
            .select(
                F.col("dst"),
                F.expr("(pr_units * w) div _deg").alias("_c"),
            )
        )
        inc = contrib.groupBy("dst").agg(
            F.sum("_c").cast("long").alias("_inc")
        )
        pr = (
            tele.join(inc, tele["node_id"] == inc["dst"], "left")
            .select(
                "node_id",
                (
                    F.col("_tele")
                    + F.expr(
                        f"({damping_num} * coalesce(_inc, 0L)) "
                        f"div {damping_den}"
                    )
                ).cast("long").alias("pr_units"),
            )
        )
        if i % checkpoint_every == 0:
            pr = pr.localCheckpoint(eager=True)
    return pr.select(
        "node_id",
        "pr_units",
        (F.col("pr_units").cast("double") / F.lit(float(scale))).alias("pr"),
    )


def hits(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 10,
    scale: int = 10 ** 9,
) -> DataFrame:
    """Integer-exact HITS (Kleinberg 1999): hubs point at good
    authorities, authorities are pointed at by good hubs -- the
    complementary link signal to PageRank (a page can be a great HUB
    of links without having authority itself; web-corpus curation uses
    hub scores to find link directories and authority scores to find
    canonical sources). Returns ``(node_id, hub_units, auth_units,
    hub, authority)``.

    Determinism: the classical L2 normalization is a float sqrt --
    order-dependent poison. This implementation normalizes each round
    in L1 with integer division against the distributed one-row sum
    (cross-joined, never collected):

        a_raw[v] = sum_{(u,v)} h[u];  a[v] = (a_raw[v] * scale) div S_a
        h_raw[u] = sum_{(u,v)} a[v];  h[u] = (h_raw[u] * scale) div S_h

    Long sums are exact; rankings are identical to the L1-normalized
    float iteration up to round-down drift < 1 unit per node. Caller
    contract: E * scale must fit int64 (at web scale drop ``scale`` to
    1e6). Shape per iteration: two keyed shuffles + two one-row
    aggregates. Unlike pagerank, every half-step ends in an EAGER
    localCheckpoint: the normalization sum is a separate aggregation
    subtree over the same stage, and without truncation each of the
    2*n_iter sums would re-execute its entire prefix lineage
    (measured: minutes instead of seconds at 6 iterations).
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node_id"))
        .union(e.select(F.col("dst").alias("node_id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("hits on an empty edge list")
    h = nodes.withColumn("h_units", F.lit(scale // n).cast("long"))
    a = None
    for i in range(1, n_iter + 1):
        a_raw = (
            e.join(h, e["src"] == h["node_id"])
            .groupBy("dst")
            .agg(F.sum("h_units").cast("long").alias("_raw"))
        )
        a_raw = a_raw.localCheckpoint(eager=True)
        a_sum = a_raw.agg(F.sum("_raw").cast("long").alias("_s"))
        a = (
            nodes.join(a_raw, nodes["node_id"] == a_raw["dst"], "left")
            .crossJoin(a_sum)
            .select(
                "node_id",
                F.expr(
                    f"(coalesce(_raw, 0L) * {scale}L) div _s"
                ).cast("long").alias("a_units"),
            )
            .localCheckpoint(eager=True)
        )
        h_raw = (
            e.join(a, e["dst"] == a["node_id"])
            .groupBy("src")
            .agg(F.sum("a_units").cast("long").alias("_raw"))
        )
        h_raw = h_raw.localCheckpoint(eager=True)
        h_sum = h_raw.agg(F.sum("_raw").cast("long").alias("_s"))
        h = (
            nodes.join(h_raw, nodes["node_id"] == h_raw["src"], "left")
            .crossJoin(h_sum)
            .select(
                "node_id",
                F.expr(
                    f"(coalesce(_raw, 0L) * {scale}L) div _s"
                ).cast("long").alias("h_units"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        h.join(a, "node_id")
        .select(
            "node_id",
            F.col("h_units").alias("hub_units"),
            F.col("a_units").alias("auth_units"),
            (F.col("h_units").cast("double") / F.lit(float(scale))).alias(
                "hub"
            ),
            (F.col("a_units").cast("double") / F.lit(float(scale))).alias(
                "authority"
            ),
        )
    )
