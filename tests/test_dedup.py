"""Dedup-suite correctness: LSH variants validated against exact
similarity on planted near-duplicates."""

import pytest
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.sources import load_table
from rag_vertex_ai_vector_search_spark.operators import (
    dedup_exact,
    duplicate_clusters,
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)


@pytest.fixture(scope="module")
def planted(spark):
    """Corpus with planted exact + near duplicates."""
    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest to find some food for winter"
    )
    rows = [
        (0, base, "en", 1),
        (1, base, "en", 1),                                   # exact dup of 0
        (2, base.replace("quick", "swift"), "en", 1),          # near dup of 0
        (3, base.replace("fox", "cat").replace("dog", "bird"), "en", 1),  # near dup
        (4, "completely different text about spark query engines and "
            "columnar execution with vectorized operators", "en", 1),
        (5, "Der schnelle braune Fuchs springt ueber den faulen Hund "
            "und laeuft weit weg in den tiefen Wald", "de", 1),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, n_chars int")


def test_exact_dedup_finds_planted(planted):
    clusters = duplicate_clusters(planted).collect()
    assert len(clusters) == 1
    assert clusters[0].keep_id == 0
    assert clusters[0].n_dups == 2


def test_exact_dedup_whitespace_case_invariant(spark):
    df = spark.createDataFrame(
        [(0, "Hello   World"), (1, "hello world"), (2, "HELLO\t\nWORLD")],
        "doc_id long, text string",
    )
    out = dedup_exact(df).collect()
    assert len(out) == 1 and out[0].n_dups == 3


def test_minhash_finds_near_dups(planted):
    pairs = minhash_candidate_pairs(
        planted, shingle_words=3, num_hashes=64, bands=16, jaccard_threshold=0.4
    ).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    # exact dup pair must be found with jaccard 1.0
    assert (0, 1) in found
    j01 = [r.jaccard for r in pairs if (r.id_a, r.id_b) == (0, 1)][0]
    assert j01 == 1.0
    # near dups share most shingles
    assert (0, 2) in found or (1, 2) in found
    # unrelated docs never pair
    assert not any(4 in p or 5 in p for p in found)


@pytest.mark.full
def test_minhash_recall_vs_exact_jaccard(spark, sf_smoke):
    """Every word-set-Jaccard>=0.8 pair (exact, blocked) must be found by
    the MinHash path at threshold 0.5 -- LSH recall on real fixture data."""
    docs = load_table(spark, sf_smoke, "documents")
    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(
            docs, block_cols=("lang",), length_col="n_chars",
            length_bucket=64, jaccard_threshold=0.8,
        ).collect()
    }
    if not exact:
        pytest.skip("no high-jaccard pairs in fixture")
    # max_bucket_df=None: unigram shingles are high-df, so nearly every
    # band bucket exceeds a production cap and the star-cap would rewire
    # non-hub pairs away -- recall is measured on the uncapped join (the
    # cap is a deliberate recall/cost dial for hot buckets, tested
    # separately in test_minhash_hot_bucket_star_cap).
    lsh = {
        (r.id_a, r.id_b)
        for r in minhash_candidate_pairs(
            docs, shingle_words=1, num_hashes=64, bands=16,
            jaccard_threshold=0.5, max_bucket_df=None,
        ).collect()
    }
    recall = len(exact & lsh) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall:.3f} on {len(exact)} exact pairs"


def test_simhash_finds_near_dups(planted):
    pairs = simhash_near_dup_pairs(planted, max_hamming=3, chunks=4).collect()
    found = {(r.id_a, r.id_b): r.hamming for r in pairs}
    assert found.get((0, 1)) == 0  # identical text -> identical signature
    # unrelated docs stay apart
    assert not any(4 in p or 5 in p for p in found)


@pytest.mark.full
def test_simhash_banding_is_lossless(planted):
    """Banding must find every pair with hamming <= chunks-1: compare the
    banded join against the quadratic scan."""
    from rag_vertex_ai_vector_search_spark.functions.hashing import (
        hamming_distance64,
        simhash_from_hashes_udf,
    )
    from rag_vertex_ai_vector_search_spark.functions.text import (
        normalized_text,
        sha60_hash,
    )

    sim = simhash_from_hashes_udf()
    words = F.split(normalized_text("text"), " ")
    sigs = planted.select(
        F.col("doc_id").alias("_id"),
        sim(F.transform(words, lambda w: sha60_hash(w))).alias("_sig"),
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    brute = {
        (r.id_a, r.id_b)
        for r in a.join(b, F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            hamming_distance64(F.col("a._sig"), F.col("b._sig")).alias("h"),
        )
        .filter(F.col("h") <= 3)
        .collect()
    }
    banded = {
        (r.id_a, r.id_b)
        for r in simhash_near_dup_pairs(planted, max_hamming=3, chunks=4).collect()
    }
    assert banded == brute


@pytest.mark.full
def test_cosine_ivf_blocking_recall_vs_exact(spark):
    """The cluster_id-blocked cosine dedup (the 100 TB path) must find
    >= 95% of the pairs the unblocked exact scan finds on clustered
    data, with every reported pair a true pair (cosine verified inside
    the block)."""
    import numpy as np

    from rag_vertex_ai_vector_search_spark.operators import (
        embedding_cosine_pairs,
        embedding_cosine_pairs_ivf,
    )

    rng = np.random.RandomState(7)
    n_centers, per_center, dim = 12, 20, 16
    centers = rng.randn(n_centers, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows, vid = [], 0
    for c in centers:
        base = None
        for j in range(per_center):
            if j % 4 == 0 or base is None:
                v = c + 0.2 * rng.randn(dim)       # fresh member
            else:
                v = base + 0.02 * rng.randn(dim)   # near-dup of it
            v = v / np.linalg.norm(v)
            if j % 4 == 0:
                base = v
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    exact = {
        (r.id_a, r.id_b)
        for r in embedding_cosine_pairs(
            emb, block_col=None, threshold=0.95
        ).collect()
    }
    assert exact, "fixture planted no near-dup pairs"
    blocked = {
        (r.id_a, r.id_b)
        for r in embedding_cosine_pairs_ivf(
            emb, n_clusters=n_centers, threshold=0.95
        ).collect()
    }
    assert blocked <= exact          # precision 1.0: no false pairs
    recall = len(blocked & exact) / len(exact)
    assert recall >= 0.95, f"recall = {recall:.3f} ({len(exact)} true pairs)"


def test_minhash_hot_bucket_star_cap(spark):
    """A 600-doc boilerplate cluster must NOT produce ~180k quadratic
    candidates: over-cap band buckets are star-capped to the min-id hub,
    so candidates stay O(n) and the whole cluster remains connected for
    downstream component assembly."""
    n_dups = 600
    docs = [(i, "the same boilerplate legal disclaimer text repeated verbatim")
            for i in range(n_dups)]
    docs += [(1000 + i, f"unique document number {i} with its own words {i*7}")
             for i in range(50)]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    pairs = minhash_candidate_pairs(
        df, shingle_words=3, num_hashes=64, bands=16,
        jaccard_threshold=0.5, max_bucket_df=64,
    ).collect()
    dup_pairs = [(r.id_a, r.id_b) for r in pairs if r.id_a < n_dups]
    # linear, not quadratic: the 600-clique collapses to a 599-edge star
    assert len(dup_pairs) == n_dups - 1, len(dup_pairs)
    assert all(a == 0 for a, _ in dup_pairs)  # hub = min id
    assert {b for _, b in dup_pairs} == set(range(1, n_dups))
    assert all(abs(r.jaccard - 1.0) < 1e-12 for r in pairs if r.id_a < n_dups)


@pytest.mark.full
def test_minhash_star_cap_preserves_small_bucket_pairs(spark, sf_smoke):
    """With the cap far above every fixture bucket size, results are
    identical to the uncapped join (the cap only rewires hot buckets)."""
    docs = load_table(spark, sf_smoke, "documents")
    kw = dict(shingle_words=3, num_hashes=64, bands=16, jaccard_threshold=0.5)
    capped = {
        (r.id_a, r.id_b, r.jaccard)
        for r in minhash_candidate_pairs(docs, max_bucket_df=10_000, **kw).collect()
    }
    uncapped = {
        (r.id_a, r.id_b, r.jaccard)
        for r in minhash_candidate_pairs(docs, max_bucket_df=None, **kw).collect()
    }
    assert capped == uncapped


def test_duplicate_span_stats_counts_and_short_docs(spark):
    """Corpus-global exact-substring duplication (Lee et al. style):
    spans repeated across docs AND within one doc both count; docs
    shorter than one span report (0, 0, 0.0)."""
    from rag_vertex_ai_vector_search_spark.operators.dedup import (
        duplicate_span_stats,
    )

    boiler = "subscribe to our newsletter for updates"  # 6 tokens
    rows = [
        (1, boiler + " alpha beta gamma"),
        (2, boiler + " delta epsilon zeta"),
        (3, "eta theta iota kappa lam mu nu xi"),       # unique text
        (4, "one two three four one two three four"),   # self-repeat
        (5, "too short"),                               # < span_tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in duplicate_span_stats(df, span_tokens=6).collect()}

    # doc 1/2: 9 tokens -> 4 spans each; the span equal to `boiler`
    # (positions 1) appears in both docs -> 1 dup span each.
    assert out[1].n_spans == 4 and out[2].n_spans == 4
    assert out[1].n_dup_spans == 1 and out[2].n_dup_spans == 1
    assert abs(out[1].dup_span_fraction - 0.25) < 1e-12
    # doc 3: all spans unique
    assert out[3].n_spans == 3 and out[3].n_dup_spans == 0
    # doc 4: 8 tokens -> 3 spans; "one two three four one two" etc are
    # unique, but the doc repeats its own 4-gram -- at span=6 no span
    # repeats within the doc, so 0.
    assert out[4].n_dup_spans == 0
    # doc 5: shorter than one span
    assert out[5].n_spans == 0 and out[5].n_dup_spans == 0
    assert out[5].dup_span_fraction == 0.0


def test_duplicate_span_stats_within_doc_repeat(spark):
    from rag_vertex_ai_vector_search_spark.operators.dedup import (
        duplicate_span_stats,
    )

    # "a b c a b c a b c" with span=3: spans at pos 1,4,7 are all
    # "a b c" etc -- within-doc repeats count as duplicated.
    df = spark.createDataFrame(
        [(1, "a b c a b c a b c")], "doc_id long, text string"
    )
    out = duplicate_span_stats(df, span_tokens=3).collect()[0]
    assert out.n_spans == 7
    assert out.n_dup_spans == 7  # every 3-gram here occurs >= 2 times


def test_remove_duplicate_spans_semantics(spark):
    """The removal half of Lee et al.: tokens covered by any
    corpus-duplicated span are cut, survivors reassemble in order,
    short docs pass through untouched, and a fully-duplicated doc
    comes back with empty text instead of disappearing."""
    from rag_vertex_ai_vector_search_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    boiler = "subscribe to our newsletter for updates"  # 6 tokens
    rows = [
        (1, boiler + " alpha beta gamma"),
        (2, boiler + " delta epsilon zeta"),
        (3, "eta theta iota kappa lam mu nu xi"),       # unique text
        (4, "too short"),                               # < span_tokens
        (5, boiler),                                    # exactly one dup span
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in remove_duplicate_spans(
        df, span_tokens=6
    ).collect()}

    assert len(out) == 5
    # docs 1/2: the 6-token boiler span (start 1) duplicates across
    # docs, so tokens 1..6 go; the unique tail survives in order.
    assert out[1].text == "alpha beta gamma"
    assert (out[1].n_tokens, out[1].n_removed_tokens) == (9, 6)
    assert out[2].text == "delta epsilon zeta"
    # doc 3: nothing duplicated, text unchanged (already normalized)
    assert out[3].text == "eta theta iota kappa lam mu nu xi"
    assert out[3].n_removed_tokens == 0
    # doc 4: shorter than one span -> no spans, untouched
    assert out[4].text == "too short"
    assert (out[4].n_tokens, out[4].n_removed_tokens) == (2, 0)
    # doc 5: the whole doc is one duplicated span -> present, empty
    assert out[5].text == ""
    assert (out[5].n_tokens, out[5].n_removed_tokens) == (6, 6)


def test_remove_duplicate_spans_overlapping_coverage(spark):
    """Within-doc self-repeat with OVERLAPPING dup spans: every token
    of 'a b c a b c a b c' is covered by some duplicated 3-gram, so
    the doc empties; overlap must not double-count removals."""
    from rag_vertex_ai_vector_search_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    df = spark.createDataFrame(
        [(1, "a b c a b c a b c"), (2, "p q r s t u v w x")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in remove_duplicate_spans(
        df, span_tokens=3
    ).collect()}
    assert out[1].text == ""
    assert (out[1].n_tokens, out[1].n_removed_tokens) == (9, 9)
    assert out[2].text == "p q r s t u v w x"
    assert out[2].n_removed_tokens == 0


def test_remove_duplicate_spans_partial_overlap_tail_kept(spark):
    """A dup span in the middle removes exactly its covered window:
    tokens on both sides survive and rejoin across the cut."""
    from rag_vertex_ai_vector_search_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    shared = "x y z w"  # 4 tokens, planted in both docs mid-text
    rows = [
        (1, f"head1 one {shared} tail1 two"),
        (2, f"head2 three {shared} tail2 four"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in remove_duplicate_spans(
        df, span_tokens=4
    ).collect()}
    # Only the exact shared 4-gram duplicates; its window covers
    # positions 3..6 of each 8-token doc.
    assert out[1].text == "head1 one tail1 two"
    assert (out[1].n_tokens, out[1].n_removed_tokens) == (8, 4)
    assert out[2].text == "head2 three tail2 four"


def test_dedup_boilerplate_lines_semantics(spark):
    """Planted boilerplate: a footer shared by 3 docs is removed
    everywhere, unique lines survive in order, a line repeated WITHIN
    one doc stays (df counts distinct docs), and a fully-boilerplate
    doc comes back with empty text instead of disappearing."""
    from rag_vertex_ai_vector_search_spark.operators.dedup import (
        dedup_boilerplate_lines,
    )

    footer = "copyright acme corp all rights reserved"
    rows = [
        (1, f"alpha unique one\n{footer}\nbravo unique two"),
        (2, f"charlie unique\n{footer}"),
        (3, f"{footer}\ndelta unique\ndelta unique"),
        (4, footer),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dedup_boilerplate_lines(
        df, max_line_df=1
    ).collect()}

    assert len(out) == 4
    assert out[1].text == "alpha unique one\nbravo unique two"
    assert (out[1].n_lines, out[1].n_removed) == (3, 1)
    assert out[2].text == "charlie unique"
    # within-doc repetition is NOT boilerplate (distinct-doc frequency)
    assert out[3].text == "delta unique\ndelta unique"
    assert (out[3].n_lines, out[3].n_removed) == (3, 1)
    # fully-boilerplate doc: present, empty
    assert out[4].text == ""
    assert (out[4].n_lines, out[4].n_removed) == (1, 1)
