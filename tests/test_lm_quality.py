"""Unigram surprisal: rare text scores higher, external-model scoring,
quantization bound."""

import math

from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.operators.lm_quality import (
    SURPRISAL_SCALE,
    unigram_counts,
    unigram_surprisal,
)


def test_rare_words_score_higher(spark):
    common = "the cat sat on the mat " * 10
    docs = spark.createDataFrame(
        [(1, common), (2, common), (3, common),
         (4, "zyx wvu tsr qpo nml kji")],  # singleton words
        "doc_id long, text string",
    )
    out = {r.doc_id: r.avg_surprisal_nats
           for r in unigram_surprisal(docs).collect()}
    assert out[4] > out[1] * 1.5
    assert out[1] == out[2] == out[3]  # identical docs, identical score


def test_matches_python_reference(spark):
    docs = spark.createDataFrame(
        [(1, "a b a c"), (2, "b b c")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in unigram_surprisal(docs, alpha=0.5).collect()}
    counts = {"a": 2, "b": 3, "c": 2}
    N, V, alpha = 7, 3, 0.5
    denom = N + alpha * V

    def surp(w):
        return math.floor(
            -math.log((counts[w] + alpha) / denom) * SURPRISAL_SCALE
        )

    for doc_id, words in ((1, "a b a c".split()), (2, "b b c".split())):
        expected = sum(surp(w) for w in words) / (
            SURPRISAL_SCALE * len(words)
        )
        assert out[doc_id].avg_surprisal_nats == expected
        assert out[doc_id].n_words == len(words)


def test_external_model_unseen_words(spark):
    """Scoring under a reference-corpus model: unseen words take the
    alpha-smoothed zero-count probability (max surprisal)."""
    ref = spark.createDataFrame(
        [(0, "common words common words")], "doc_id long, text string"
    )
    model = unigram_counts(ref)
    docs = spark.createDataFrame(
        [(1, "common words"), (2, "unseen tokens")], "doc_id long, text string"
    )
    out = {r.doc_id: r.avg_surprisal_nats
           for r in unigram_surprisal(docs, counts=model).collect()}
    assert out[2] > out[1]


def test_bigram_matches_python_reference(spark):
    from collections import Counter

    from rag_vertex_ai_vector_search_spark.operators.lm_quality import (
        bigram_surprisal,
    )

    corpus = {1: "a b a c".split(), 2: "b b c".split()}
    docs = spark.createDataFrame(
        [(k, " ".join(v)) for k, v in corpus.items()],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bigram_surprisal(docs, alpha=0.5).collect()}

    seqs = {
        k: list(zip(["<s>"] + v[:-1], v)) for k, v in corpus.items()
    }
    bg = Counter(p for s in seqs.values() for p in s)
    ctx = Counter(p[0] for s in seqs.values() for p in s)
    V = len({w for v in corpus.values() for w in v})

    def surp(prev, w, alpha=0.5):
        return math.floor(
            -math.log((bg[(prev, w)] + alpha) / (ctx[prev] + alpha * V))
            * SURPRISAL_SCALE
        )

    for doc_id, seq in seqs.items():
        expected = sum(surp(p, w) for p, w in seq) / (
            SURPRISAL_SCALE * len(seq)
        )
        assert out[doc_id].avg_surprisal_nats == expected
        assert out[doc_id].n_words == len(seq)


def test_bigram_separates_shuffled_text(spark):
    """The point of the higher Markov order: word-shuffled text has the
    SAME unigram distribution as fluent text but much higher bigram
    surprisal -- the unigram scorer cannot tell them apart, the bigram
    scorer must."""
    from rag_vertex_ai_vector_search_spark.operators.lm_quality import (
        bigram_surprisal,
        unigram_surprisal,
    )

    fluent = ("the cat sat on the mat " * 8).strip()
    # same word MULTISET, destroyed word order: sorting groups repeats
    # into bigrams ("cat cat", "mat on") the fluent corpus never emits
    shuffled = " ".join(sorted(fluent.split()))
    rows = [(i, fluent) for i in range(1, 11)] + [(99, shuffled)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uni = {r.doc_id: r.avg_surprisal_nats
           for r in unigram_surprisal(docs).collect()}
    bi = {r.doc_id: r.avg_surprisal_nats
          for r in bigram_surprisal(docs).collect()}
    assert abs(uni[1] - uni[99]) < 0.05         # unigram: indistinguishable
    assert bi[99] > bi[1] + 0.5                 # bigram: clearly separated


def test_surprisal_buckets_equal_frequency_per_group(spark):
    """CCNet head/middle/tail: each language cuts into equal-frequency
    buckets independently; head holds the lowest-surprisal docs."""
    from rag_vertex_ai_vector_search_spark.operators.lm_quality import (
        surprisal_buckets,
    )

    rows = [(i, "en", float(i)) for i in range(9)] + [
        (100 + i, "fr", float(-i)) for i in range(6)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, avg_surprisal_nats double"
    )
    out = surprisal_buckets(df, group_cols=["lang"]).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, n in (("en", 9), ("fr", 6)):
        rs = by_lang[lang]
        assert len(rs) == n
        from collections import Counter

        c = Counter(r.ppl_bucket for r in rs)
        assert c["head"] == c["middle"] == c["tail"] == n // 3
        # head = lowest surprisal
        head_max = max(r.avg_surprisal_nats for r in rs if r.ppl_bucket == "head")
        tail_min = min(r.avg_surprisal_nats for r in rs if r.ppl_bucket == "tail")
        assert head_max < tail_min


def test_trigram_separates_bigram_preserving_shuffle(spark):
    """The trigram scorer detects reordering the bigram scorer provably
    cannot: the probe doc is an Eulerian recombination of the fluent
    pattern "a b a c a d" -> "a c a b a d", which preserves the exact
    MULTISET of bigrams (including the BOS-"a" start), so any bigram
    model assigns both probes identical total surprisal -- while three
    of the probe's trigram contexts are corpus-unseen."""
    from rag_vertex_ai_vector_search_spark.operators.lm_quality import (
        bigram_surprisal,
        trigram_surprisal,
    )

    fluent, shuffled = "a b a c a d", "a c a b a d"
    rows = [(i, fluent) for i in range(50)]
    rows += [(1000, fluent), (1001, shuffled)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    bg = {r.doc_id: r.avg_surprisal_nats
          for r in bigram_surprisal(df).collect()}
    tg = {r.doc_id: r.avg_surprisal_nats
          for r in trigram_surprisal(df).collect()}

    # Bigram: bit-identical scores (same bigram multiset per doc).
    assert bg[1000] == bg[1001]
    # Trigram: the shuffled probe is strictly, clearly more surprising.
    assert tg[1001] > tg[1000] + 0.5
    # And the fluent probe scores like the corpus it repeats.
    assert abs(tg[1000] - tg[0]) < 1e-9


def test_trigram_matches_python_reference(spark):
    """Exact equality against a direct Python implementation of the
    interpolated mixture (same quantization)."""
    import math
    from collections import Counter

    from rag_vertex_ai_vector_search_spark.operators.lm_quality import (
        SURPRISAL_SCALE,
        trigram_surprisal,
    )

    docs = {1: "the cat sat", 2: "the cat ran", 3: "a dog sat the cat"}
    df = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_words, r.avg_surprisal_nats)
           for r in trigram_surprisal(df, alpha=0.5).collect()}

    seqs = {k: v.split() for k, v in docs.items()}
    tri, tctx, bi, bctx, uni = Counter(), Counter(), Counter(), Counter(), Counter()
    n_total = 0
    for ws in seqs.values():
        prevs = ["<s>", "<s>"]
        for w in ws:
            tri[(prevs[0], prevs[1], w)] += 1
            tctx[(prevs[0], prevs[1])] += 1
            bi[(prevs[1], w)] += 1
            bctx[prevs[1]] += 1
            uni[w] += 1
            n_total += 1
            prevs = [prevs[1], w]
    V = float(len(uni))
    a = 0.5
    for k, ws in seqs.items():
        prevs = ["<s>", "<s>"]
        s = 0
        for w in ws:
            p3 = (tri[(prevs[0], prevs[1], w)] + a) / (tctx[(prevs[0], prevs[1])] + a * V)
            p2 = (bi[(prevs[1], w)] + a) / (bctx[prevs[1]] + a * V)
            p1 = (uni[w] + a) / (float(n_total) + a * V)
            p = 0.6 * p3 + 0.3 * p2 + 0.1 * p1
            s += math.floor(-math.log(p) * SURPRISAL_SCALE)
            prevs = [prevs[1], w]
        assert got[k][0] == len(ws)
        assert got[k][1] == s / (SURPRISAL_SCALE * float(len(ws)))


def test_kneser_ney_matches_python_reference(spark):
    """Exact micronat equality against a driver-side recomputation of
    interpolated KN (discount 0.75, add-alpha continuation)."""
    import math

    from rag_vertex_ai_vector_search_spark.operators.lm_quality import (
        kneser_ney_bigram_surprisal,
    )

    rows = [
        (1, "san francisco is in california"),
        (2, "san francisco has fog"),
        (3, "the city is big"),
        (4, "the fog is thick"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_words, r.avg_surprisal_nats)
        for r in kneser_ney_bigram_surprisal(df).collect()
    }

    # python reference
    seqs = {}
    for doc_id, text in rows:
        ws = text.lower().split()
        seqs[doc_id] = list(zip(["<s>"] + ws[:-1], ws))
    bg, ctx = {}, {}
    for pairs in seqs.values():
        for p, w in pairs:
            bg[(p, w)] = bg.get((p, w), 0) + 1
            ctx[p] = ctx.get(p, 0) + 1
    tprev, ncw = {}, {}
    for (p, w) in bg:
        tprev[p] = tprev.get(p, 0) + 1
        ncw[w] = ncw.get(w, 0) + 1
    n_types = float(len(bg))
    vocab = float(len({w for pairs in seqs.values() for _, w in pairs}))
    d, a = 0.75, 0.5
    for doc_id, pairs in seqs.items():
        total = 0
        for p, w in pairs:
            pcont = (ncw[w] + a) / (n_types + a * vocab)
            pr = max(bg[(p, w)] - d, 0.0) / ctx[p] + (
                (d * tprev[p]) / ctx[p]
            ) * pcont
            total += math.floor(-math.log(pr) * 1_000_000)
        n = len(pairs)
        assert got[doc_id] == (n, total / (1_000_000 * n)), doc_id

    # the KN property: 'francisco' is frequent but single-context, so
    # its continuation probability is LOW -- a novel context pairing
    # must surprise KN more than a same-frequency diverse-context word
    assert ncw["francisco"] == 1


def test_kneser_ney_fluent_beats_shuffled(spark):
    from rag_vertex_ai_vector_search_spark.operators.lm_quality import (
        kneser_ney_bigram_surprisal,
    )

    base = "the quick brown fox jumps over the lazy dog " * 5
    shuf = "dog the over quick lazy fox brown the jumps " * 5
    corpus = [(i, base) for i in range(8)] + [(100, shuf)]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        r.doc_id: r.avg_surprisal_nats
        for r in kneser_ney_bigram_surprisal(df).collect()
    }
    assert got[0] < got[100]
