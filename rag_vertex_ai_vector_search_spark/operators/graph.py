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
like the CC and BPE loops. The only driver scalar is N (one count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
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
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
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
    teleport = (scale - (damping_num * scale) // damping_den) // n

    outdeg = e.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("_deg")
    )
    pr = nodes.withColumn("pr_units", F.lit(init_units).cast("long"))
    for i in range(1, n_iter + 1):
        contrib = (
            e.join(pr, e["src"] == pr["node_id"])
            .join(outdeg, "src")
            .select(
                F.col("dst"),
                F.expr("pr_units div _deg").alias("_c"),
            )
        )
        inc = contrib.groupBy("dst").agg(
            F.sum("_c").cast("long").alias("_inc")
        )
        pr = (
            nodes.join(inc, nodes["node_id"] == inc["dst"], "left")
            .select(
                "node_id",
                (
                    F.lit(teleport)
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
