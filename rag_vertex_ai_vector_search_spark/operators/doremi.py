"""DoReMi-style domain reweighting (Xie et al., "DoReMi: Optimizing
Data Mixtures Speeds Up Language Model Pretraining", NeurIPS 2023).

DoReMi trains a small proxy model under Group DRO: each minibatch
step, per-domain EXCESS loss (proxy loss minus a pretrained reference
model's loss) drives an exponentiated-gradient update of the domain
weights, alpha_t ~ alpha_{t-1} * exp(eta * excess_t); the final mixture
is the step-average. The insight the engine keeps: domains where a
generic reference model is much worse than a domain-fit model have
HEADROOM and should be upweighted.

Deterministic offline analog (everything derives from the published
update rule re-expressed with the repo's proven integer-exact
machinery):

- **Reference model**: add-alpha unigram over the WHOLE corpus (the
  CCNet scorer, operators/lm_quality.py).
- **Per-domain models**: add-alpha unigram per domain, counts and
  denominators joined (never collected -- domains x vocab scales).
- **Minibatch rounds**: hash-bucketed slices
  ``round = sha60(salt:doc_id) % n_rounds`` -- deterministic,
  growth-stable, SQL-mirrorable (the dataset_split machinery).
- **Per-round per-domain excess**: an INTEGER micronat sum over the
  round's word positions of (s_ref - s_domain), each word surprisal
  individually floor-quantized (the lm_quality oracle trick) so the
  cross-row aggregation is association-free bigint arithmetic.
- **Exponentiated gradient in LOG space**: exp() never evaluates --
  the multiplicative update is additive on log-weights, so
  ``log_weight(d) = sum_t floor(eta * excess(d, t) / tokens(d, t))``
  (per-token normalization keeps volume from masquerading as
  headroom). Because the proxy is not retrained between rounds, the
  trajectory has no feedback and the sum needs no recursion -- one
  groupBy; the per-round floors still make the aggregation match
  DoReMi's step-granular update rather than one global ratio.
- **Selection**: the final per-domain log-weights feed the proven
  hash-Gumbel top-k (operators/importance.py::dsir_gumbel_select) --
  an exact softmax sample without replacement, reproducible and
  oracle-able.

Scale shape: one word explode, per-DISTINCT-(domain, word) scoring
joined back to positions once (the r5 vocabulary-sized-shuffle rule),
a (domain, round) aggregate of a few hundred rows, a broadcast join of
the weight table onto documents, and a TakeOrderedAndProject top-k.
No collect on the data path; the only driver scalars are the two
reference-model totals (N, V), the bounded DSIR precedent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalized_text, sha60_hash
from .lm_quality import SURPRISAL_SCALE

DEFAULT_ETA_NUM = 1
DEFAULT_ETA_DEN = 4


def doremi_domain_log_weights(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "source",
    n_rounds: int = 4,
    alpha: float = 0.5,
    eta_num: int = DEFAULT_ETA_NUM,
    eta_den: int = DEFAULT_ETA_DEN,
    salt: str = "doremi",
) -> DataFrame:
    """(domain, n_tokens, excess_micronats, log_weight_micronats):
    the Group-DRO weight table. ``excess_micronats`` is the raw summed
    headroom (reference-minus-domain surprisal over all rounds);
    ``log_weight_micronats`` is the exponentiated-gradient log-weight
    ``sum_t floor(eta * excess_t / tokens_t)`` in integer micronats.
    """
    words = df.select(
        F.col(id_col),
        F.col(domain_col).alias("_domain"),
        F.pmod(
            sha60_hash(
                F.concat(
                    F.lit(salt), F.lit(":"), F.col(id_col).cast("string")
                )
            ),
            F.lit(n_rounds),
        ).cast("int").alias("_round"),
        F.explode(
            F.split(normalized_text(F.col(text_col)), " ")
        ).alias("word"),
    )

    # ONE corpus-scale pass: the (domain, round, word) count table is
    # vocabulary x rounds sized, so every downstream aggregate (ref
    # counts, domain counts, per-round excess) derives from the cached
    # bounded table instead of re-exploding the corpus three times
    # (the r6 cache-the-bounded-intermediate rule; 12.6 s -> warm 3 s
    # at sf0.1 came almost entirely from this collapse).
    base = (
        words.groupBy("_domain", "_round", "word")
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint(eager=True)
    )
    return doremi_weights_from_base(
        base, alpha=alpha, eta_num=eta_num, eta_den=eta_den
    )


def doremi_weights_from_base(
    base: DataFrame,
    *,
    alpha: float = 0.5,
    eta_num: int = DEFAULT_ETA_NUM,
    eta_den: int = DEFAULT_ETA_DEN,
) -> DataFrame:
    """Weight table from the (``_domain``, ``_round``, ``word``,
    ``_c``) sufficient-statistic table. Separate seam on purpose: the
    batch operator builds the table from one corpus pass, the
    STREAMING maintenance (streaming/doremi_stream.py) folds it from
    epoch-partitioned micro-batch partials -- both route through this
    identical math, so maintained == batch holds structurally."""
    # reference model: whole-corpus counts; the two totals are the one
    # bounded driver collect (two scalars -- the DSIR precedent)
    ref_counts = base.groupBy("word").agg(F.sum("_c").alias("_nr"))
    tot = ref_counts.agg(
        F.sum("_nr").alias("_N"), F.count(F.lit(1)).alias("_V")
    ).collect()[0]
    ref_denom = float(int(tot._N)) + alpha * float(int(tot._V))

    # per-domain models: counts AND denominators stay distributed
    dom_counts = base.groupBy("_domain", "word").agg(
        F.sum("_c").alias("_n_dw")
    )
    dom_tot = dom_counts.groupBy("_domain").agg(
        F.sum("_n_dw").alias("_n_dom"), F.count(F.lit(1)).alias("_v_dom")
    )

    # per-DISTINCT-(domain, word) scoring, joined back to positions
    # once (vocabulary-sized shuffle, never position-level model math).
    # dom_tot derives from dom_counts, so the join needs explicit
    # aliases or Spark flags the shared-lineage columns ambiguous.
    scale = F.lit(float(SURPRISAL_SCALE))
    dc = dom_counts.alias("dc")
    dt = dom_tot.alias("dt")
    scored_vocab = (
        dc.join(ref_counts, "word")
        .join(dt, F.col("dc._domain") == F.col("dt._domain"))
        .select(
            F.col("dc._domain").alias("_domain"), "word",
            F.floor(
                -F.log(
                    (F.col("_nr").cast("double") + F.lit(alpha))
                    / F.lit(ref_denom)
                )
                * scale
            ).cast("long").alias("_s_ref"),
            F.floor(
                -F.log(
                    (F.col("_n_dw").cast("double") + F.lit(alpha))
                    / (
                        F.col("_n_dom").cast("double")
                        + F.lit(alpha) * F.col("_v_dom").cast("double")
                    )
                )
                * scale
            ).cast("long").alias("_s_dom"),
        )
    )

    per_round = (
        base.join(scored_vocab, ["_domain", "word"])
        .groupBy("_domain", "_round")
        .agg(
            F.sum("_c").alias("_tokens"),
            F.sum(
                F.col("_c") * (F.col("_s_ref") - F.col("_s_dom"))
            ).alias("_excess"),
        )
        .withColumn(
            "_term",
            F.floor(
                (F.col("_excess") * F.lit(eta_num)).cast("double")
                / (F.col("_tokens") * F.lit(eta_den)).cast("double")
            ).cast("long"),
        )
    )
    return per_round.groupBy(F.col("_domain").alias("domain")).agg(
        F.sum("_tokens").cast("long").alias("n_tokens"),
        F.sum("_excess").cast("long").alias("excess_micronats"),
        F.sum("_term").cast("long").alias("log_weight_micronats"),
    )


def doremi_select(
    df: DataFrame,
    n_keep: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "source",
    n_rounds: int = 4,
    alpha: float = 0.5,
    eta_num: int = DEFAULT_ETA_NUM,
    eta_den: int = DEFAULT_ETA_DEN,
    salt: str = "doremi",
) -> DataFrame:
    """Sample ``n_keep`` documents with probability proportional to
    exp(DoReMi log-weight of their domain) via the deterministic
    hash-Gumbel top-k: the reweighted-mixture draw the DoReMi paper
    feeds the large run with, reproducible and SQL-mirrorable. Returns
    the selected rows with the weight-table columns attached."""
    from .importance import dsir_gumbel_select

    weights = doremi_domain_log_weights(
        df,
        id_col=id_col, text_col=text_col, domain_col=domain_col,
        n_rounds=n_rounds, alpha=alpha,
        eta_num=eta_num, eta_den=eta_den, salt=salt,
    )
    scored = df.select(F.col(id_col), F.col(domain_col)).join(
        F.broadcast(weights),
        F.col(domain_col) == F.col("domain"),
    ).select(
        id_col, domain_col, "n_tokens", "excess_micronats",
        "log_weight_micronats",
    )
    return dsir_gumbel_select(scored, n_keep, id_col=id_col, salt=salt)
