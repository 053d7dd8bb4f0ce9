"""Value tests for the training-data pipeline text operators:
repetition signals, PII scrub, deterministic splits.

The oracle-parity suite checks these against DuckDB on the fixture
tables; here the checks are against hand-computed values and the
operators' own invariants on crafted inputs.
"""

import math

import pytest
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.functions import (
    dup_bigram_fraction,
    dup_word_fraction,
    mean_word_length,
    pii_count,
    redact_pii,
    top_word_fraction,
)
from rag_vertex_ai_vector_search_spark.operators import (
    assign_splits,
    split_bounds,
)


def _signals(spark, text):
    row = (
        spark.createDataFrame([(text,)], ["text"])
        .select(
            dup_word_fraction("text").alias("dupw"),
            dup_bigram_fraction("text").alias("dupb"),
            top_word_fraction("text").alias("topw"),
            mean_word_length("text").alias("meanw"),
        )
        .collect()[0]
    )
    return row


def test_repetition_signals_hand_computed(spark):
    # "a a b c" -> words 4, distinct 3; bigrams [a a, a b, b c] distinct 3
    r = _signals(spark, "a a b c")
    assert r.dupw == pytest.approx(1.0 / 4.0)
    assert r.dupb == 0.0
    assert r.topw == pytest.approx(2.0 / 4.0)
    assert r.meanw == pytest.approx(1.0)

    # pure loop: "x y x y x y" -> 6 words, 2 distinct; 5 bigrams, 2 distinct
    r = _signals(spark, "x y x y x y")
    assert r.dupw == pytest.approx(4.0 / 6.0)
    assert r.dupb == pytest.approx(3.0 / 5.0)
    assert r.topw == pytest.approx(3.0 / 6.0)


def test_repetition_signals_edge_cases(spark):
    for text in ["", "   ", "word"]:
        r = _signals(spark, text)
        assert r.dupw == 0.0 and r.dupb == 0.0
    # single word: top fraction is 1, mean length is its length
    r = _signals(spark, "hello")
    assert r.topw == 1.0 and r.meanw == 5.0
    # normalization folds case and whitespace before counting
    r = _signals(spark, "The   THE the")
    assert r.dupw == pytest.approx(2.0 / 3.0)


def test_pii_counts_and_redaction(spark):
    text = (
        "mail a.user+tag@sub.example.org or bob@x.io, "
        "server 10.0.255.1 port 80, ssn 123-45-6789 end"
    )
    df = spark.createDataFrame([(text,)], ["text"])
    row = df.select(
        pii_count("text", "email").alias("e"),
        pii_count("text", "ipv4").alias("i"),
        pii_count("text", "ssn").alias("s"),
        redact_pii("text").alias("red"),
    ).collect()[0]
    assert (row.e, row.i, row.s) == (2, 1, 1)
    assert row.red == (
        "mail [PII] or [PII], server [PII] port 80, ssn [PII] end"
    )


def test_pii_clean_text_untouched(spark):
    text = "no pii here, just words and 42 numbers."
    row = (
        spark.createDataFrame([(text,)], ["text"])
        .select(redact_pii("text").alias("red"))
        .collect()[0]
    )
    assert row.red == text


def test_split_bounds_cover_and_order():
    bounds = split_bounds({"train": 0.9, "val": 0.05, "test": 0.05}, 10_000)
    assert bounds == [("train", 9000), ("val", 9500), ("test", 10_000)]
    # weird weights still cover every bucket
    bounds = split_bounds({"a": 1, "b": 2}, 7)
    assert bounds[-1][1] == 7


def test_split_deterministic_and_partition_invariant(spark):
    ids = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = assign_splits(ids, "doc_id").select("doc_id", "split")
    b = assign_splits(ids.repartition(7), "doc_id").select("doc_id", "split")
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()

    counts = dict(
        (r["split"], r["count"])
        for r in a.groupBy("split").count().collect()
    )
    # 90/5/5 within sampling noise on 2000 ids
    assert abs(counts["train"] / 2000 - 0.9) < 0.03
    assert abs(counts.get("val", 0) / 2000 - 0.05) < 0.02
    assert abs(counts.get("test", 0) / 2000 - 0.05) < 0.02


def test_split_stable_under_growth(spark):
    """Adding documents never moves an existing one between splits."""
    small = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 1500).withColumnRenamed("id", "doc_id")
    s = assign_splits(small, "doc_id").select("doc_id", "split")
    b = assign_splits(big, "doc_id").select("doc_id", "split")
    joined = s.alias("s").join(b.alias("b"), "doc_id").filter(
        F.col("s.split") != F.col("b.split")
    )
    assert joined.isEmpty()


def test_split_salt_rerolls(spark):
    ids = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    v1 = assign_splits(ids, "doc_id", salt="v1").select("doc_id", "split")
    v2 = assign_splits(ids, "doc_id", salt="v2").select("doc_id", "split")
    moved = (
        v1.alias("a")
        .join(v2.alias("b"), "doc_id")
        .filter(F.col("a.split") != F.col("b.split"))
        .count()
    )
    # a re-salt moves roughly 1 - (0.9^2 + 0.05^2 + 0.05^2) ~ 18.5% of ids
    assert 80 < moved < 300


def test_split_is_narrow_plan(spark):
    """No Exchange: the assignment must stay a scan-side projection."""
    ids = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    plan = (
        assign_splits(ids, "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# Gopher quality-rule bundle (Rae et al. 2021, A1.1)
# ---------------------------------------------------------------------------

def _gopher(spark, text, **kw):
    from rag_vertex_ai_vector_search_spark.functions.text import (
        gopher_quality_flags,
    )

    return (
        spark.createDataFrame([(text,)], "text string")
        .select(gopher_quality_flags("text", **kw).alias("g"))
        .collect()[0]
        .g
    )


def test_gopher_clean_prose_keeps(spark):
    prose = (
        "the quick brown fox jumps over the lazy dog and runs to be "
        "with that other fine animal which they have seen many times "
        "before in the wide green field near the old stone bridge "
        "while the sun sets slowly of an evening and the birds sing "
        "softly in the trees above the quiet flowing river below"
    )
    g = _gopher(spark, prose)
    assert g.keep is True
    assert g.n_words >= 50
    assert 3.0 <= g.mean_word_len <= 10.0
    assert g.symbol_ratio == 0.0
    assert g.bullet_line_fraction == 0.0
    assert g.alpha_word_fraction == 1.0
    assert g.n_stopwords_present >= 2


@pytest.mark.full
def test_gopher_individual_rules_fail(spark):
    # too short
    assert _gopher(spark, "the cat sat of and").keep is False
    # bullet-heavy lines (every line a bullet)
    bullets = "\n".join("- item " + "word " * 20 for _ in range(5))
    g = _gopher(spark, bullets, max_bullet_line_fraction=0.9)
    assert g.bullet_line_fraction == 1.0 and g.keep is False
    # ellipsis-heavy lines
    dots = "\n".join("the thing and more of that be have with..." 
                     for _ in range(10))
    g = _gopher(spark, dots, min_words=5)
    assert g.ellipsis_line_fraction == 1.0 and g.keep is False
    # symbol spam
    spam = "the # of # and # that # have # with " * 20
    g = _gopher(spark, spam, min_words=5)
    assert g.symbol_ratio > 0.1 and g.keep is False
    # numeric words fail the alpha-fraction rule
    nums = ("the of and that be have with " + "12345 " * 60)
    g = _gopher(spark, nums, min_words=5)
    assert g.alpha_word_fraction < 0.8 and g.keep is False
    # no stopwords at all
    rand = "zyx wvu tsr qpo nml kji " * 12
    g = _gopher(spark, rand, min_words=5)
    assert g.n_stopwords_present == 0 and g.keep is False


def test_c4_line_rules_individually(spark):
    """Each C4 line rule drops exactly its target (Raffel et al. §2.2):
    missing terminal punctuation, under 5 words, javascript lines."""
    from rag_vertex_ai_vector_search_spark.functions.text import (
        c4_clean_lines,
    )

    text = "\n".join([
        "this sentence properly ends with a period.",
        "no terminal punctuation on this long line here",
        "too short.",
        "Please enable JavaScript to continue browsing now.",
        'a quoted ending counts as terminal punctuation okay."',
        "exclamations also terminate a sentence just fine!",
    ])
    df = spark.createDataFrame([(text,)], "t string")
    [r] = df.select(c4_clean_lines("t").alias("c")).collect()
    kept = r.c.split("\n")
    assert kept == [
        "this sentence properly ends with a period.",
        'a quoted ending counts as terminal punctuation okay."',
        "exclamations also terminate a sentence just fine!",
    ]


def test_c4_page_rules_individually(spark):
    """Page-level verdicts: sentence minimum, brace, lorem, blocklist."""
    from rag_vertex_ai_vector_search_spark.functions.text import (
        c4_quality_flags,
    )

    three = ("one full sentence right here okay. "
             "a second full sentence follows now. "
             "and a third one completes the page.")
    cases = {
        "ok": (three, True),
        "few": ("just one single sentence on this page.", False),
        "brace": (three + "\nconfig { x } is set here properly.", False),
        "lorem": (three + "\nLorem ipsum dolor sit amet friends.", False),
        "bad": (three + "\nsomeone wrote badword2 in here sadly.", False),
    }
    df = spark.createDataFrame(
        [(k, v[0]) for k, v in cases.items()], "k string, t string"
    )
    got = {
        r.k: r.f
        for r in df.select("k", c4_quality_flags("t").alias("f")).collect()
    }
    for k, (_, want_keep) in cases.items():
        assert got[k].keep == want_keep, (k, got[k])
    assert got["few"].n_sentences == 1
    assert got["brace"].has_brace and not got["ok"].has_brace
    assert got["lorem"].has_lorem
    assert got["bad"].has_badword
    # empty-after-cleaning page: zero kept lines, keep False
    [empty] = spark.createDataFrame(
        [("nothing here terminates so all lines go away",)], "t string"
    ).select(c4_quality_flags("t").alias("f")).collect()
    assert empty.f.n_kept_lines == 0 and not empty.f.keep


def test_luhn_card_detection_hand_cases(spark):
    """Valid test numbers (Visa 16, Amex 15, Mastercard 16; spaced and
    dashed forms) pass; one-digit-off near-misses and plain digit runs
    fail the checksum or the candidate pattern."""
    from rag_vertex_ai_vector_search_spark.functions.text import (
        credit_card_counts,
    )

    rows = [
        (1, "pay with 4111111111111111 now", 1, 1),
        (2, "fake 4111111111111112 number", 1, 0),
        (3, "card 4539 5787 6362 1486 and 5500-0000-0000-0004", 2, 2),
        (4, "order 123456 on 2024-01-01", 0, 0),
        (5, "amex 378282246310005", 1, 1),
        (6, "short 123456789012 run", 0, 0),  # 12 digits: no candidate
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _, _ in rows], "id long, text string"
    )
    got = {
        r.id: (r.cc.n_candidates, r.cc.n_valid)
        for r in df.select(
            "id", credit_card_counts("text").alias("cc")
        ).collect()
    }
    for i, _, nc, nv in rows:
        assert got[i] == (nc, nv), i
