"""Tokenizer corpus-prep: vocab coverage curve + BPE pair counts."""

import pytest
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.operators.tokenizer import (
    bpe_merge_pairs,
    vocab_coverage_report,
)


def test_vocab_coverage_hand_computed(spark):
    # tokens: aa x4, bb x3, cc x2, dd x1 -> total 10
    df = spark.createDataFrame(
        [(1, "aa bb aa cc"), (2, "aa bb dd"), (3, "aa bb cc")],
        "doc_id long, text string",
    )
    rows = vocab_coverage_report(df, top_k=3).orderBy("rank").collect()
    assert [(r.rank, r.word, r.n) for r in rows] == [
        (1, "aa", 4), (2, "bb", 3), (3, "cc", 2),
    ]
    assert abs(rows[0].cum_fraction - 0.4) < 1e-12
    assert abs(rows[1].cum_fraction - 0.7) < 1e-12
    assert abs(rows[2].cum_fraction - 0.9) < 1e-12


def test_vocab_coverage_tie_break_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "zz aa zz aa")], "doc_id long, text string"
    )
    rows = vocab_coverage_report(df, top_k=2).orderBy("rank").collect()
    # equal counts -> lexicographic word order
    assert [r.word for r in rows] == ["aa", "zz"]


def test_bpe_pairs_weighted_by_word_frequency(spark):
    # "abc" x3 -> pairs ab x3, bc x3; "abd" x1 -> ab x1, bd x1
    # totals: ab 4, bc 3, bd 1; single-char word ignored
    df = spark.createDataFrame(
        [(1, "abc abc abc abd x")], "doc_id long, text string"
    )
    rows = bpe_merge_pairs(df, top_k=10).orderBy("rank").collect()
    assert [(r.rank, r.pair, r.n_occurrences) for r in rows] == [
        (1, "ab", 4), (2, "bc", 3), (3, "bd", 1),
    ]


def test_topk_cuts_are_take_ordered(spark, sf_smoke):
    """Both top-K cuts must compile to TakeOrderedAndProject (partial
    distributed top-K), never a global sort or a vocab-wide window."""
    from rag_vertex_ai_vector_search_spark.sources import load_table

    docs = load_table(spark, sf_smoke, "documents")
    for out in (
        vocab_coverage_report(docs, top_k=10),
        bpe_merge_pairs(docs, top_k=10),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan


def test_apply_bpe_hand_example(spark):
    """Classic BPE scan semantics on a hand-worked example."""
    from rag_vertex_ai_vector_search_spark.operators.tokenizer import (
        apply_bpe_to_words,
    )

    words = spark.createDataFrame(
        [("lower",), ("lowest",), ("newer",), ("aaa",)], "word string"
    )
    merges = [("l", "o"), ("lo", "w"), ("e", "r"), ("a", "a")]
    got = {r.word: r.toks for r in
           apply_bpe_to_words(words, merges).collect()}
    assert got["lower"] == "low er"
    assert got["lowest"] == "low e s t"
    assert got["newer"] == "n e w er"
    # greedy left-to-right non-overlap: aaa -> (aa) a
    assert got["aaa"] == "aa a"


def test_apply_bpe_fold_equals_udf(spark):
    """The JVM fold chain and the production pandas-UDF scan loop
    implement the same algorithm."""
    from rag_vertex_ai_vector_search_spark.operators.tokenizer import (
        apply_bpe_to_words,
    )

    words = spark.createDataFrame(
        [(w,) for w in ["banana", "bandana", "cabana", "x", "zz",
                        "mississippi", "aaaa"]],
        "word string",
    )
    merges = [("a", "n"), ("an", "a"), ("s", "s"), ("a", "a")]
    fold = {r.word: r.toks for r in
            apply_bpe_to_words(words, merges, method="fold").collect()}
    udf = {r.word: r.toks for r in
           apply_bpe_to_words(words, merges, method="udf").collect()}
    assert fold == udf


def test_bpe_tokenize_roundtrip_consistency(spark, sf_smoke):
    """Tokenizing with the merges train_bpe just learned must
    reproduce exactly the trainer's final vocabulary rewrite: joining
    the token stream back word-by-word equals applying the merges to
    each distinct word."""
    from rag_vertex_ai_vector_search_spark.operators.tokenizer import (
        bpe_tokenize,
        train_bpe,
    )
    from rag_vertex_ai_vector_search_spark.sources import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(50)
    merges = [
        (r.left, r.right)
        for r in train_bpe(docs, n_merges=4).orderBy("merge_rank").collect()
    ]
    out = bpe_tokenize(docs, merges).collect()
    assert len(out) == 50
    for r in out:
        assert r.n_tokens >= r.n_words  # merging never crosses words
        toks = r.tokens.split(" ")
        assert len(toks) == r.n_tokens
        # no token contains a space; merged symbols are concatenations
        assert all(t for t in toks)


@pytest.mark.full
def test_train_bpe_batched_equals_sequential_fixture(spark, sf_smoke):
    """The batched trainer learns the IDENTICAL merge list (ranks,
    pairs, counts) as one-merge-per-round training -- batching is an
    execution strategy, not an approximation."""
    from rag_vertex_ai_vector_search_spark.operators.tokenizer import (
        train_bpe,
    )
    from rag_vertex_ai_vector_search_spark.sources import load_table

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    seq = [tuple(r) for r in
           train_bpe(docs, n_merges=40).orderBy("merge_rank").collect()]
    stats: dict = {}
    bat = [tuple(r) for r in
           train_bpe(docs, n_merges=40, batch_candidates=64, stats=stats)
           .orderBy("merge_rank").collect()]
    assert bat == seq
    # the batch path must actually batch (else the test is vacuous)
    assert stats["rounds"] < 40
    assert max(stats["batch_sizes"]) > 1


@pytest.mark.full
def test_train_bpe_batched_equals_sequential_adversarial(spark):
    """Collision-heavy corpus: a 3-letter alphabet forces shared
    substrings, so created tokens regularly collide with existing
    symbols (the case where naive top-N batching diverges from
    sequential greedy). The stop-at-collision guard must keep the
    merge lists identical anyway."""
    import random

    from rag_vertex_ai_vector_search_spark.operators.tokenizer import (
        train_bpe,
    )

    rng = random.Random(7)
    words = [
        "".join(rng.choice("abc") for _ in range(rng.randint(3, 10)))
        for _ in range(400)
    ]
    docs = spark.createDataFrame(
        [(i, " ".join(words[i * 4:(i + 1) * 4])) for i in range(100)],
        "doc_id long, text string",
    )
    seq = [tuple(r) for r in
           train_bpe(docs, n_merges=60).orderBy("merge_rank").collect()]
    stats: dict = {}
    bat = [tuple(r) for r in
           train_bpe(docs, n_merges=60, batch_candidates=128, stats=stats)
           .orderBy("merge_rank").collect()]
    assert bat == seq
    assert stats["rounds"] < 60


@pytest.mark.full
def test_train_bpe_driver_path_equals_sequential(spark, sf_smoke):
    """driver_threshold collects the (fixed-size) vocabulary once and
    trains in memory -- output identical to the distributed sequential
    loop, on the fixture AND an adversarial 3-letter corpus."""
    import random

    from rag_vertex_ai_vector_search_spark.operators.tokenizer import (
        train_bpe,
    )
    from rag_vertex_ai_vector_search_spark.sources import load_table

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    seq = [tuple(r) for r in
           train_bpe(docs, n_merges=40).orderBy("merge_rank").collect()]
    stats: dict = {}
    drv = [tuple(r) for r in
           train_bpe(docs, n_merges=40, driver_threshold=1_000_000,
                     stats=stats).orderBy("merge_rank").collect()]
    assert drv == seq
    assert stats["rounds"] == 0 and stats["driver_rows"] > 0

    rng = random.Random(11)
    words = [
        "".join(rng.choice("abc") for _ in range(rng.randint(3, 10)))
        for _ in range(400)
    ]
    adv = spark.createDataFrame(
        [(i, " ".join(words[i * 4:(i + 1) * 4])) for i in range(100)],
        "doc_id long, text string",
    )
    seq2 = [tuple(r) for r in
            train_bpe(adv, n_merges=60).orderBy("merge_rank").collect()]
    drv2 = [tuple(r) for r in
            train_bpe(adv, n_merges=60, driver_threshold=1_000_000)
            .orderBy("merge_rank").collect()]
    assert drv2 == seq2


# ---- WordPiece (r12) ------------------------------------------------------


def test_wordpiece_encode_word_longest_match_and_unk():
    from rag_vertex_ai_vector_search_spark.operators.tokenizer import (
        wordpiece_encode_word,
    )

    init = frozenset({"h", "he", "hell", "w"})
    cont = frozenset({"e", "l", "lo", "llo", "o"})
    # longest-match-first: 'hell' beats 'he' at the word start, then
    # continuation 'o'; NOT the 'he'+'llo' split a shorter-first or
    # merge-replay scheme would produce
    assert wordpiece_encode_word("hello", (init, cont)) == ["hell", "##o"]
    # a single unmatched position maps the WHOLE word to [UNK]
    # (BERT WordpieceTokenizer semantics), not a partial stream
    assert wordpiece_encode_word("hex", (init, cont)) == ["[UNK]"]
    assert wordpiece_encode_word("xe", (init, cont)) == ["[UNK]"]


def test_wordpiece_trainer_score_vs_count(spark):
    """The WordPiece argmax is likelihood-ranked, not count-ranked:
    with pair counts (a,##b)=4 of symbols 8x8 (score 1/16) and
    (c,##d)=3 of symbols 3x3 (score 1/3), WordPiece merges (c,##d)
    first where BPE would take (a,##b)."""
    from rag_vertex_ai_vector_search_spark.operators.tokenizer import (
        train_wordpiece,
    )

    docs = spark.createDataFrame(
        # 'ab' x4 + lone 'a'/'b' occurrences to inflate symbol counts;
        # 'cd' x3 with no other c/d
        [(1, "ab ab ab ab a a a a b b b b cd cd cd")],
        "doc_id long, text string",
    )
    m = train_wordpiece(docs, n_merges=1).first()
    assert (m.left, m.right, m.merged) == ("c", "##d", "cd")
    assert (m.n_pair, m.n_left, m.n_right) == (3, 3, 3)


def test_wordpiece_merged_strips_continuation_prefix(spark, sf_smoke):
    from rag_vertex_ai_vector_search_spark.operators.tokenizer import (
        train_wordpiece,
    )

    from rag_vertex_ai_vector_search_spark.sources import load_table

    docs = load_table(spark, sf_smoke, "documents")
    rows = train_wordpiece(docs, n_merges=4).collect()
    for r in rows:
        # the right symbol of an in-word pair is always a continuation
        assert r.right.startswith("##"), r
        expect = r.left + r.right[2:]
        assert r.merged == expect, r
        # a continuation left keeps its prefix on the merged token
        assert r.merged.startswith("##") == r.left.startswith("##"), r


def test_wordpiece_self_corpus_encode_has_no_unk(spark, sf_smoke):
    """Encoding the training corpus can never hit [UNK]: every
    continuation character of every word is in the alphabet by
    construction -- the assumption the SQL mirror's no-UNK branch
    leans on."""
    from pyspark.sql import functions as F

    from rag_vertex_ai_vector_search_spark.operators.tokenizer import (
        train_wordpiece,
        wordpiece_tokenize,
        wordpiece_vocab,
    )

    from rag_vertex_ai_vector_search_spark.sources import load_table

    docs = load_table(spark, sf_smoke, "documents")
    merges_df = train_wordpiece(docs, n_merges=4)
    vocab = wordpiece_vocab(docs, merges_df)
    out = wordpiece_tokenize(docs, vocab)
    n_unk = out.filter(
        F.col("tokens").contains("[UNK]")
    ).count()
    assert n_unk == 0
    # and the stream really uses the merged tokens somewhere
    merged = [r.merged for r in merges_df.collect()]
    hits = out.filter(
        F.col("tokens").contains(merged[0])
    ).count()
    assert hits > 0


def test_bpe_heap_trainer_equals_recount_reference():
    """The r12 incremental pair-heap driver trainer must reproduce the
    full-recount reference EXACTLY -- including tie-breaks and the
    exhaustion error -- on adversarial small-alphabet corpora (dense
    collisions: merged tokens equal existing symbols, counts tie
    constantly)."""
    import random

    from rag_vertex_ai_vector_search_spark.operators.tokenizer import (
        _train_bpe_driver,
        _train_bpe_driver_recount,
    )

    for seed, alpha, n_merges in [(1, "ab", 60), (2, "abc", 150)]:
        rng = random.Random(seed)
        rows = [
            (
                " ".join(
                    "".join(
                        rng.choice(alpha)
                        for _ in range(rng.randint(2, 12))
                    )
                ),
                rng.randint(1, 9),
            )
            for _ in range(500)
        ]
        def run(fn):
            try:
                return fn(list(rows), n_merges)
            except ValueError as e:
                return ("exhausted", str(e))

        assert run(_train_bpe_driver) == run(_train_bpe_driver_recount)


def test_wordpiece_heap_trainer_equals_recount_reference():
    """The r17 incremental heap driver trainer (ratio score: pair and
    denominator-symbol count changes both repush) must reproduce the
    full-recount reference EXACTLY -- including tie-breaks and the
    exhaustion error -- on adversarial small-alphabet corpora where
    scores tie constantly and merged tokens collide with existing
    symbols."""
    import random

    from rag_vertex_ai_vector_search_spark.operators.tokenizer import (
        _train_wordpiece_driver,
        _train_wordpiece_driver_recount,
    )

    for seed, alpha, n_merges in [(1, "ab", 60), (2, "abc", 150)]:
        rng = random.Random(seed)
        rows = []
        for _ in range(500):
            chars = [
                rng.choice(alpha) for _ in range(rng.randint(2, 12))
            ]
            toks = " ".join(
                [chars[0]] + ["##" + c for c in chars[1:]]
            )
            rows.append((toks, rng.randint(1, 9)))

        def run(fn):
            try:
                return fn(list(rows), n_merges)
            except ValueError as e:
                return ("exhausted", str(e))

        assert run(_train_wordpiece_driver) == run(
            _train_wordpiece_driver_recount
        )


@pytest.mark.full
def test_wordpiece_driver_path_equals_spark_loop(spark, sf_smoke):
    """train_wordpiece(driver_threshold) collects the vocabulary once
    and runs the exact greedy loop in memory -- output identical to
    the per-round Spark loop, on the fixture AND an adversarial
    corpus with constant score ties."""
    import random

    from rag_vertex_ai_vector_search_spark.operators.tokenizer import (
        train_wordpiece,
    )
    from rag_vertex_ai_vector_search_spark.sources import load_table

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    seq = [tuple(r) for r in
           train_wordpiece(docs, n_merges=12).orderBy("merge_rank").collect()]
    drv = [tuple(r) for r in
           train_wordpiece(docs, n_merges=12, driver_threshold=1_000_000)
           .orderBy("merge_rank").collect()]
    assert drv == seq

    rng = random.Random(23)
    words = [
        "".join(rng.choice("abc") for _ in range(rng.randint(3, 9)))
        for _ in range(300)
    ]
    adv = spark.createDataFrame(
        [(i, " ".join(words[i * 3:(i + 1) * 3])) for i in range(100)],
        "doc_id long, text string",
    )
    seq2 = [tuple(r) for r in
            train_wordpiece(adv, n_merges=20).orderBy("merge_rank").collect()]
    drv2 = [tuple(r) for r in
            train_wordpiece(adv, n_merges=20, driver_threshold=1_000_000)
            .orderBy("merge_rank").collect()]
    assert drv2 == seq2


@pytest.mark.full
def test_unigram_em_properties(spark, sf_smoke):
    """The real float EM trainer (train_unigram, Kudo 2018) under its
    property gates: (1) corpus log-likelihood is NON-DECREASING across
    EM steps at a fixed piece set (the EM guarantee -- prune steps
    reset the baseline, so monotonicity is checked within each
    fixed-vocab stretch); (2) the returned probs normalize; (3) the
    character alphabet survives pruning (segmentability); (4) Viterbi
    decode under the trained log-probs reconstructs every corpus word
    losslessly."""
    import math

    from rag_vertex_ai_vector_search_spark.operators.tokenizer import (
        train_unigram,
        unigram_tokenize_word,
    )
    from rag_vertex_ai_vector_search_spark.sources import load_table

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    stats: dict = {}
    pieces = train_unigram(
        docs, vocab_size=48, em_iters=3, stats=stats
    ).collect()

    # (1) monotone LL within each fixed-vocab EM stretch of 3 steps.
    # Tolerance is RELATIVE (1e-7): each LL is a sum of thousands of
    # double terms, so ~1e-8-relative reassociation noise is expected;
    # a genuine EM violation (the per-iteration alphabet-floor bug this
    # gate caught in development) shows up as a multiple-percent drop.
    trace = stats["ll_trace"]
    assert len(trace) >= 3
    for s0 in range(0, len(trace) - (len(trace) % 3), 3):
        chunk = trace[s0:s0 + 3]
        assert all(
            b >= a - 1e-7 * abs(a) for a, b in zip(chunk, chunk[1:])
        ), (s0, chunk)

    # (2) normalization
    assert abs(sum(r.prob for r in pieces) - 1.0) < 1e-9
    assert len(pieces) <= 48

    # (3) alphabet retained
    from pyspark.sql import functions as F

    words = [
        r.word for r in docs.select(
            F.explode(
                F.split(
                    F.trim(
                        F.regexp_replace(F.lower("text"), r"\s+", " ")
                    ),
                    " ",
                )
            ).alias("word")
        ).distinct().collect()
    ]
    alphabet = {c for w in words for c in w}
    have = {r.piece for r in pieces}
    assert alphabet <= have

    # (4) lossless Viterbi decode of every corpus word
    lp = {r.piece: math.log(r.prob) for r in pieces if r.prob > 0}
    for w in words:
        toks = unigram_tokenize_word(w, lp)
        assert "".join(toks) == w
        assert all(t in have for t in toks), (w, toks)


def test_unigram_quantized_em_tracks_float_trainer(spark):
    """train_unigram_em_quantized (r13, the EM hash gate's Spark
    side) must track the REAL float E-step through the same lattice:
    eq / scale ~= the float expected counts after one iteration (the
    only difference is the per-occurrence floor, bounded by one
    micro-unit per occurrence), and the integer output is
    deterministic across runs."""
    from rag_vertex_ai_vector_search_spark.operators.tokenizer import (
        UNIGRAM_EM_SCALE,
        _unigram_forward_backward,
        _word_counts,
        train_unigram_em_quantized,
    )

    docs = spark.createDataFrame(
        [(1, "abab cd abcd"), (2, "ab ab cd cd dcba")],
        "doc_id long, text string",
    )
    out1 = {
        r.piece: r.expected_q
        for r in train_unigram_em_quantized(docs, em_iters=1).collect()
    }
    out1b = {
        r.piece: r.expected_q
        for r in train_unigram_em_quantized(docs, em_iters=1).collect()
    }
    assert out1 == out1b and len(out1) > 0

    # float reference: same seed probs, one float E-step
    rows = [
        (r.word, int(r.n))
        for r in _word_counts(docs, "text").collect()
    ]
    from collections import Counter

    seed: Counter = Counter()
    for word, n in rows:
        for i in range(len(word)):
            for ln in range(1, min(4, len(word) - i) + 1):
                seed[word[i:i + ln]] += n
    pieces = {p: c for p, c in seed.items() if c >= 2 or len(p) == 1}
    total = float(sum(pieces.values()))
    probs = {p: float(c) / total for p, c in pieces.items()}
    expected: dict = {}
    n_occ = 0
    for word, n in rows:
        _unigram_forward_backward(word, n, probs, 4, expected)
    for piece, ev in expected.items():
        q = out1.get(piece, 0)
        # floor drops < 1 micro-unit per occurrence
        assert 0 <= ev - q / UNIGRAM_EM_SCALE < 1e-6 + 64 / UNIGRAM_EM_SCALE, piece
