"""BM25 keyword ranking over a document table.

Lexical retrieval next to the vector search surface (operators/knn.py):
the classic hybrid-RAG pairing -- BM25 recall + embedding rerank. The
implementation is shaped for the 100 TB pass:

- NO per-term shuffle: term frequencies come from
  ``size(filter(words, = term))`` per query term -- a narrow map over
  the scan, not an explode + groupBy (a query has a handful of terms;
  exploding every word of every document to score 4 terms would shuffle
  the entire corpus).
- ONE tiny aggregate computes the global stats (N, sum doclen, per-term
  document frequencies) and is collected as a single scalar row; the
  per-term idf and avgdl become LITERALS in the scoring expression, so
  the scoring pass is a pure narrow map and the only wide step is the
  final top-n (TakeOrderedAndProject). Collecting a one-row reduce is
  scale-free (same pattern as any normalization constant).
- Arithmetic uses a fixed operation order (documented inline), so the
  driver's DuckDB oracle reproduces scores bit-for-bit. idf is computed
  with Python's math.log ON THE DRIVER deliberately: Spark's F.log is
  StrictMath (fdlibm) and differs from the platform libm -- that DuckDB
  and CPython both call -- by 1 ulp on some inputs, so keeping ln out
  of the JVM is what makes the scores reproducible in plain SQL.

idf uses the non-negative Robertson/Sparck-Jones "+1" variant:
``ln(((N - df) + 0.5) / (df + 0.5) + 1.0)`` (Lucene's choice), so
common terms score small-positive instead of negative.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import normalized_text
from ..functions.vector import constant_partition_key


def bm25_topk(
    df: DataFrame,
    terms: Sequence[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 20,
) -> DataFrame:
    """Top-n documents by BM25 for a bag of query terms.

    Returns (doc_id, score, rank), rank 1-based ordered by score desc
    with doc_id as the deterministic tiebreak. Documents matching no
    term score 0.0 and are still rankable (they only appear if fewer
    than top_n documents match any term).
    """
    if not terms:
        raise ValueError("need at least one query term")
    words = F.split(normalized_text(text_col), " ")
    base = df.select(
        F.col(id_col).alias("doc_id"),
        words.alias("_w"),
    ).withColumn("_dl", F.size("_w"))

    def _eq(term: str):
        # N.B. a `lambda x, t=term:` would be read by F.filter as the
        # two-arg (element, index) form; close over the term instead.
        return lambda x: x == F.lit(term)

    tf_cols = [
        F.size(F.filter("_w", _eq(t))).alias(f"_tf{i}")
        for i, t in enumerate(terms)
    ]
    base = base.select("doc_id", "_dl", *tf_cols)

    stats = base.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_dl").alias("_sumdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    ).collect()[0]

    # Fixed evaluation order, mirrored verbatim in the SQL oracle:
    #   avgdl = double(sum_dl) / double(n)
    #   idf_t = ln(((N - df) + 0.5) / (df + 0.5) + 1.0)   [driver, libm]
    #   w_t   = idf_t * ((tf * (k1+1)) / (tf + k1*((1-b) + b*(dl/avgdl))))
    #   score = (..(w_0 + w_1) + w_2 ..)   (left fold)
    import math

    n = float(stats["_n"])
    avgdl = float(stats["_sumdl"]) / n
    dl = F.col("_dl").cast("double")

    def term_weight(i: int) -> Column:
        tf = F.col(f"_tf{i}").cast("double")
        dfreq = float(stats[f"_df{i}"])
        idf = math.log(((n - dfreq) + 0.5) / (dfreq + 0.5) + 1.0)
        denom = tf + F.lit(k1) * ((F.lit(1.0) - F.lit(b)) + F.lit(b) * (dl / F.lit(avgdl)))
        return F.lit(idf) * ((tf * F.lit(k1 + 1.0)) / denom)

    score = term_weight(0)
    for i in range(1, len(terms)):
        score = score + term_weight(i)

    ranked = base.select("doc_id", score.alias("score"))
    # Distributed top-n FIRST (orderBy+limit compiles to
    # TakeOrderedAndProject: per-partition partial top-n, tiny driver
    # merge) -- a global row_number() window here would instead funnel
    # every scored row through one partition. The rank window then runs
    # over only top_n rows.
    top = ranked.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(top_n)
    # Constant partition key over the <= top_n already-reduced rows: a
    # single partition is the point. Must be NON-foldable -- a plain
    # lit(0) gets constant-folded out of the window spec and the
    # "No Partition Defined" warning comes back.
    w = Window.partitionBy(constant_partition_key("doc_id")).orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("doc_id", "score", "rank")
    )


def phrase_occurrences(
    df: DataFrame,
    phrases: Sequence[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase matching over a document table:
    ``(phrase, doc_id, n_occurrences)`` -- one row per (phrase, doc)
    with at least one occurrence of the consecutive word sequence.

    The positional complement to ``bm25_topk``'s bag-of-words scoring
    (every real search surface offers quoted-phrase queries). Uses the
    anchor trick instead of a P-way self-join: an occurrence of the
    phrase's j-th term at token position p can only belong to a phrase
    instance starting at anchor = p - j, so matches group by
    (doc, phrase, anchor) and a full instance is exactly the anchors
    covering all P distinct term slots. Handles repeated terms inside
    a phrase (each token row fans out to every slot its word fills).

    Scale shape: the phrase-slot table is tiny and broadcast; the
    token explode is corpus-linear but filtered to phrase words by the
    join BEFORE the one (doc, anchor) shuffle -- documents without any
    phrase word never shuffle at all.
    """
    if not phrases:
        raise ValueError("phrase_occurrences needs at least one phrase")
    slots = []
    for phrase in phrases:
        terms = phrase.split()
        if not terms:
            raise ValueError(f"empty phrase {phrase!r}")
        for j, term in enumerate(terms):
            slots.append((phrase, j, term, len(terms)))
    spark = df.sparkSession
    slot_df = F.broadcast(
        spark.createDataFrame(
            slots, "phrase string, slot int, term string, plen int"
        )
    )
    tokens = df.select(
        F.col(id_col),
        F.posexplode(F.split(normalized_text(F.col(text_col)), " ")).alias(
            "_pos", "_tok"
        ),
    )
    hits = tokens.join(slot_df, tokens["_tok"] == slot_df["term"]).select(
        id_col, "phrase", "plen",
        (F.col("_pos") - F.col("slot")).alias("_anchor"),
        "slot",
    )
    anchors = (
        hits.filter(F.col("_anchor") >= 0)
        .groupBy(id_col, "phrase", "plen", "_anchor")
        .agg(F.countDistinct("slot").alias("_nslots"))
        .filter(F.col("_nslots") == F.col("plen"))
    )
    return (
        anchors.groupBy("phrase", id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
    )
