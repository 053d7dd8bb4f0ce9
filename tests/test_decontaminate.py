"""Benchmark decontamination: planted-overlap guarantees, df-cap
behavior, and the anti-join contract of ``decontaminate``."""

from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.operators.decontaminate import (
    contamination_pairs,
    decontaminate,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_overlap_is_flagged(spark):
    """A train doc embedding a full eval sentence shares every one of
    its n-grams; an unrelated doc shares none."""
    ev = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    train = _docs(spark, [
        (1, "intro words then the quick brown fox jumps over the lazy dog and more"),
        (2, "completely different content about spark query planning here"),
    ])
    pairs = contamination_pairs(train, ev, n=5, min_shared=1).collect()
    assert {(r.train_id, r.eval_id) for r in pairs} == {(1, 100)}
    # 9-word eval sentence -> 5 distinct 5-grams, all contained.
    assert pairs[0].shared_grams == 5

    kept = decontaminate(train, ev, n=5, min_shared=1)
    assert [r.doc_id for r in kept.collect()] == [2]


def test_min_shared_threshold(spark):
    """One shared 5-gram is below a min_shared=2 bar."""
    ev = _docs(spark, [(100, "alpha beta gamma delta epsilon")])
    train = _docs(spark, [(1, "alpha beta gamma delta epsilon")])
    assert contamination_pairs(train, ev, n=5, min_shared=1).count() == 1
    assert contamination_pairs(train, ev, n=5, min_shared=2).count() == 0


def test_short_docs_fall_back_to_whole_text(spark):
    """Docs shorter than n grams match only on the exact whole text
    (word_shingles' degenerate branch)."""
    ev = _docs(spark, [(100, "tiny doc")])
    train = _docs(spark, [(1, "tiny doc"), (2, "tiny dog")])
    pairs = contamination_pairs(train, ev, n=13).collect()
    assert {(r.train_id, r.eval_id) for r in pairs} == {(1, 100)}


def test_max_gram_df_drops_boilerplate(spark):
    """A gram present in MANY eval docs (license-header shape) is capped
    out; a unique overlap still flags."""
    boiler = "this content is licensed under creative commons attribution"
    ev = _docs(spark, [(100 + i, f"{boiler} item {i}") for i in range(10)]
               + [(200, "unique secret benchmark answer string here")])
    train = _docs(spark, [
        (1, f"some page with {boiler} footer text"),
        (2, "contains the unique secret benchmark answer string here verbatim"),
    ])
    uncapped = contamination_pairs(train, ev, n=5, min_shared=1)
    assert uncapped.filter(F.col("train_id") == 1).count() == 10
    capped = contamination_pairs(train, ev, n=5, min_shared=1, max_gram_df=4)
    assert capped.filter(F.col("train_id") == 1).count() == 0
    assert capped.filter(F.col("train_id") == 2).count() == 1


def test_xxhash64_variant_same_pairs(spark):
    """The cheap production hash yields the same pair set (hashes only
    key the join; equality of grams is what matters)."""
    ev = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    train = _docs(spark, [
        (1, "prefix the quick brown fox jumps over the lazy dog suffix"),
        (2, "nothing in common with anything at all truly"),
    ])
    a = sorted(tuple(r) for r in contamination_pairs(
        train, ev, n=5, base_hash="sha60").collect())
    b = sorted(tuple(r) for r in contamination_pairs(
        train, ev, n=5, base_hash="xxhash64").collect())
    assert a == b


def test_cross_source_overlap_matrix(spark):
    """Planted slice overlap: sources A and B share a passage (high
    Jaccard), C is disjoint (absent from the matrix); counts and the
    Jaccard arithmetic match a hand computation."""
    from rag_vertex_ai_vector_search_spark.operators.decontaminate import (
        cross_source_overlap,
    )

    shared = "alpha beta gamma delta epsilon zeta"       # 6 words
    rows = [
        (1, "A", shared + " one two"),
        (2, "A", "completely different words here now indeed"),
        (3, "B", shared + " three four"),
        (4, "C", "unrelated text with nothing in common at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {(r.group_a, r.group_b): r
           for r in cross_source_overlap(df, n=5).collect()}

    # only pairs with >0 shared grams appear; C overlaps nobody
    assert set(out) == {("A", "B")}
    r = out[("A", "B")]
    # shared 5-grams: windows fully inside the 6-word shared passage:
    # "alpha..epsilon" and "beta..zeta" -> 2
    assert r.shared_grams == 2
    # A: doc1 has 4 5-grams, doc2 has 2 -> 6 distinct; B: 4
    assert (r.grams_a, r.grams_b) == (6, 4)
    assert r.jaccard == 2 / (6 + 4 - 2)
