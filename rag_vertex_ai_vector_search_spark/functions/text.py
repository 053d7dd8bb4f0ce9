"""Text-analysis scalar functions, all JVM-side Column expressions.

The reference's only text ops are tiktoken counting + a max-token gate
(common/utils/embeddings.py:62-90) and length/suffix checks
(setup_vector_search.py:61,195). This module carries those plus the
LLM-pipeline extensions (language-ID heuristic, quality scoring,
fingerprinting) -- every one expressed with built-in functions so it
stays inside whole-stage codegen and scales linearly with no Python.

Each function has an exact ANSI-SQL mirror in ``__spark_entry__.py``'s
oracles; the arithmetic is structured (fixed operation order, double
precision) so Spark and DuckDB produce bit-identical values.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def let_col(expr: Column, body) -> Column:
    """Bind ``expr`` to a lambda variable and evaluate ``body(var)``.

    Catalyst performs NO common-subexpression elimination inside
    higher-order-function lambda bodies: a lambda that references a
    derived expression (e.g. ``split(normalized_text(text), ' ')``)
    re-evaluates the WHOLE subtree once per array element, turning a
    linear scan quadratic (measured r17: the bigram-counts pass was
    5.9 s inlined vs 0.45 s bound at sf0.1 -- 13x). Wrapping the
    expression as the one-element array argument of an outer
    ``transform`` binds it to a lambda VARIABLE, which IS evaluated
    once and shared by every inner-lambda evaluation.

    Semantics are identical (a NULL expr flows through as a NULL
    binding), and the values are bit-equal -- only the evaluation
    count changes, so SQL oracle mirrors are unaffected.
    """
    return F.element_at(F.transform(F.array(expr), body), 1)


# A BPE-ish token: a letter run, a digit run, or one non-alnum symbol.
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny multilingual stopword marker sets for the language-ID heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it"),
    "es": ("el", "la", "de", "que", "los", "las", "una", "por"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "fr": ("le", "les", "des", "est", "une", "dans", "pour", "que"),
}

STOPWORDS_EN = LANG_MARKERS["en"] + ("a", "for", "on", "with", "as")


def whitespace_token_count(col: Column | str) -> Column:
    """Number of whitespace-separated tokens; 0 for blank text."""
    c = _c(col)
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def token_count(col: Column | str) -> Column:
    """BPE-ish token count: letter runs + digit runs + symbols.

    Stands in for the reference's tiktoken cl100k_base count
    (embeddings.py:62-68) -- same role (an ingest-gate statistic),
    deterministic, and pure SQL.
    """
    # regexp_count == size(regexp_extract_all(...)) without materializing
    # the match array -- same value, ~2x cheaper in the 100 TB scan pass.
    return F.regexp_count(_c(col), F.lit(TOKEN_PATTERN))


def exact_token_count_udf(
    encoding_name: str = "cl100k_base", encoder_factory=None
):
    """EXACT tokenizer counts as a vectorized pandas UDF -- the
    reference's tiktoken cl100k_base count (embeddings.py:62-68,
    encodings enum :32-35), for users porting real corpora whose
    MAX_TOKENS_PER_TEXT=2042 gate decisions (config.py:57) must match
    the reference bit-for-bit.

    Import-gated: tiktoken is a public package but not in this image, so
    the import happens lazily on the executor and raises a clear error
    if absent. ``encoder_factory`` injects any object with
    ``.encode(str) -> list`` (how tests exercise the seam hermetically).

    The ingest gate default stays on the SQL-expressible regex
    ``token_count`` so the DuckDB oracle can mirror it; swap this UDF in
    via ``ingest_documents(token_counter=...)`` when exactness beats
    oracle-checkability.
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    def _make_encoder():
        if encoder_factory is not None:
            return encoder_factory()
        try:
            import tiktoken
        except ImportError as e:  # pragma: no cover - tiktoken not in image
            raise ImportError(
                "exact token counting needs the public 'tiktoken' package "
                "(pip install tiktoken); the regex token_count() is the "
                "hermetic fallback"
            ) from e
        return tiktoken.get_encoding(encoding_name)

    holder: list = []  # one encoder per python worker, built on first batch

    def _count(texts):
        if not holder:
            holder.append(_make_encoder())
        enc = holder[0]
        return texts.fillna("").map(lambda t: len(enc.encode(t))).astype("int32")

    return F.pandas_udf(_count, T.IntegerType())


def alpha_ratio(col: Column | str) -> Column:
    """Fraction of characters that are ASCII letters."""
    c = _c(col)
    return F.when(F.length(c) == 0, F.lit(0.0)).otherwise(
        F.regexp_count(c, F.lit(r"[A-Za-z]")).cast("double")
        / F.length(c).cast("double")
    )


def stopword_ratio(col: Column | str, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    """Fraction of whitespace tokens that are (English) stopwords."""
    c = _c(col)
    pattern = r"\b(" + "|".join(stopwords) + r")\b"
    n_tokens = whitespace_token_count(c)
    return F.when(n_tokens == 0, F.lit(0.0)).otherwise(
        F.regexp_count(F.lower(c), F.lit(pattern)).cast("double")
        / n_tokens.cast("double")
    )


def quality_score(col: Column | str) -> Column:
    """Heuristic document quality in [0, 1].

    0.5 * alpha_ratio + 0.3 * length term + 0.2 * stopword presence.
    Fixed operation order so the oracle SQL reproduces it exactly.
    """
    c = _c(col)
    length_term = F.least(F.length(c).cast("double") / F.lit(500.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(c) * F.lit(4.0), F.lit(1.0))
    return (
        F.lit(0.5) * alpha_ratio(c)
        + F.lit(0.3) * length_term
        + F.lit(0.2) * stop_term
    )


def language_id(col: Column | str) -> Column:
    """n-gram/marker-word language heuristic over LANG_MARKERS.

    Scores each language by marker-word hits; returns the argmax,
    ``und`` (undetermined) when no marker hits at all. Ties break by
    language code order (en < es < de < fr evaluation order).
    """
    lowered = F.lower(_c(col))
    scores = {
        lang: F.regexp_count(
            lowered, F.lit(r"\b(" + "|".join(words) + r")\b")
        )
        for lang, words in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    result = F.lit("und")
    # Reverse order so earlier languages win ties via later .when override.
    for lang in reversed(list(LANG_MARKERS)):
        result = F.when(scores[lang] == best, F.lit(lang)).otherwise(result)
    return F.when(best == 0, F.lit("und")).otherwise(result)


def normalized_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapsed whitespace."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))


def doc_fingerprint(col: Column | str) -> Column:
    """SHA-256 hex fingerprint of the normalized text (lowercase hex)."""
    return F.sha2(normalized_text(_c(col)), 256)


def sha60_hash(col: Column | str) -> Column:
    """60-bit base hash computable bit-identically in Spark AND plain SQL
    (DuckDB): the first 15 hex chars of sha256, parsed as an integer.

    Spark:  conv(substring(sha2(s, 256), 1, 15), 16, 10)::long
    DuckDB: ('0x' || substr(sha256(s), 1, 15))::BIGINT

    Used as the base hash under MinHash / SimHash / winnowing so those
    pipelines admit a bit-exact DuckDB oracle in the driver gate.
    ``xxhash64`` stays available as the cheaper non-oracle option
    (pass base_hash="xxhash64" to the dedup operators) -- same plan
    shape, ~2-4x less per-row hash cost, no SQL mirror. Values are
    < 2^60, so they are positive in int64 and already reduced modulo
    the MinHash Mersenne prime 2^61 - 1.
    """
    return F.conv(F.substring(F.sha2(_c(col), 256), 1, 15), 16, 10).cast("long")


def base_hash_fn(name: str):
    """Resolve a base-hash name ('sha60' | 'xxhash64') to a Column fn."""
    if name == "sha60":
        return sha60_hash
    if name == "xxhash64":
        return F.xxhash64
    raise ValueError(f"unknown base_hash {name!r} (want 'sha60'|'xxhash64')")


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct n-word shingles of the normalized text.

    The word array is let_col-bound: referencing the split expression
    inside the window lambda re-evaluated normalize+split per shingle
    (quadratic per document; 3.6 s -> 0.6 s at sf0.1 for the shingle
    count pass). The shingle windows themselves are built by a
    zip_with chain over shifted slices -- every slice is a HOF
    ARGUMENT (evaluated once) and no inner lambda captures the outer
    binding, which matters twice: it avoids a second per-element
    re-evaluation, and a captured-binding lambda nested under a
    Python UDF argument breaks ExtractPythonUDFs (the UDF is left
    inline in the projection and fails as unevaluable -- hit by
    minhash signatures over planted corpora, r17)."""
    def body(words):
        k = F.size(words) - F.lit(n - 1)
        sh = F.slice(words, 1, k)
        for j in range(1, n):
            sh = F.zip_with(
                sh,
                F.slice(words, 1 + j, k),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        return F.when(k <= 0, F.array(F.concat_ws(" ", words))).otherwise(
            F.array_distinct(sh)
        )

    return let_col(F.split(normalized_text(_c(col)), " "), body)


def gram_hashes(col: Column | str, k: int = 5, base_hash: str = "sha60") -> Column:
    """Base hash of every k-char gram of the normalized text (in order).

    Default base hash is sha60 (oracle-mirrorable, see ``sha60_hash``);
    pass base_hash="xxhash64" for the cheaper non-oracle variant.
    """
    hash_fn = base_hash_fn(base_hash)

    def body(text):
        n_grams = F.greatest(F.length(text) - F.lit(k - 1), F.lit(1))
        return F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: hash_fn(F.substring(text, i, k)),
        )

    # let_col-bound: an inlined text expression re-normalizes per gram
    # (quadratic per document).
    return let_col(normalized_text(_c(col)), body)


def winnow_from_hashes(hashes: Column | str, w: int = 4) -> Column:
    """Winnowing min-hash selection over a MATERIALIZED gram-hash column.

    IMPORTANT: pass a real column (withColumn/select the gram_hashes()
    result first). Inlining the gram-hash expression here makes Catalyst
    re-evaluate the whole k-gram transform once PER WINDOW -- quadratic
    per document (observed: a 3000-char doc never finishes).
    """
    h = _c(hashes)
    n_windows = F.greatest(F.size(h) - F.lit(w - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda i: F.array_min(F.slice(h, i, w)),
        )
    )


def winnowing_fingerprints(col: Column | str, k: int = 5, w: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003):
    hash every k-gram (rolling window), then keep the minimum hash of
    each w-window of consecutive k-gram hashes. Guarantees any shared
    substring of length >= k + w - 1 yields a shared fingerprint.

    Entirely built-in expressions (substring/hash/slice/array_min) --
    codegen'd, no Python. NOTE: as a single inline expression this is
    quadratic in document length (see winnow_from_hashes); fine for
    short texts, but pipelines over real documents must materialize
    gram_hashes() into a column first (winnow_candidate_pairs does).
    """
    return winnow_from_hashes(gram_hashes(_c(col), k), w)


def char_ngrams(col: Column | str, n: int = 5) -> Column:
    """Distinct character n-grams of the normalized text (let_col-bound
    -- see word_shingles)."""
    def body(text):
        k = F.length(text) - F.lit(n - 1)
        return F.when(k <= 0, F.array(text)).otherwise(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), k),
                    lambda i: F.substring(text, i, n),
                )
            )
        )

    return let_col(normalized_text(_c(col)), body)


# ---------------------------------------------------------------------------
# Repetition signals (Gopher-style quality heuristics, Rae et al. 2021
# §A1.1): excessive within-document repetition is the strongest cheap
# predictor of boilerplate / spam / generation loops in web corpora.
# All pure Column expressions over the normalized word array -- linear
# per document except top_word_fraction (distinct x words per doc, see
# its docstring) -- with exact DuckDB list-function mirrors.
# ---------------------------------------------------------------------------


def _words(col: Column | str) -> Column:
    """Word array of the normalized text (no empties by construction)."""
    return F.split(normalized_text(_c(col)), " ")


def dup_word_fraction(col: Column | str) -> Column:
    """Fraction of word occurrences that repeat an earlier word:
    1 - distinct/total. 0.0 for empty text."""
    words = _words(col)
    n = F.size(words).cast("double")
    d = F.size(F.array_distinct(words)).cast("double")
    return F.when(F.length(F.trim(_c(col))) == 0, F.lit(0.0)).otherwise(
        (n - d) / n
    )


def dup_bigram_fraction(col: Column | str) -> Column:
    """Fraction of word-bigram occurrences that are repeats. Catches the
    'looping n-gram' failure mode single-word stats miss. 0.0 when the
    text has fewer than two words."""
    def body(words):
        n = F.size(words)
        bigrams = F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(" ", F.slice(words, i, 2)),
        )
        nb = F.size(bigrams).cast("double")
        db = F.size(F.array_distinct(bigrams)).cast("double")
        return F.when(n < 2, F.lit(0.0)).otherwise((nb - db) / nb)

    # let_col-bound (see word_shingles): the inlined word array made
    # this quadratic per document.
    return let_col(_words(col), body)


def top_word_fraction(col: Column | str) -> Column:
    """Occurrence share of the most frequent word. ~0.01 for natural
    prose; >0.2 flags degenerate repetition.

    The most frequent word's count equals the longest equal-run in the
    SORTED word array, so this is one array_sort plus a linear
    struct-accumulator fold -- O(n log n) per document instead of the
    r17 O(distinct * words) filter-scan-per-distinct-word, with no
    shuffle and no length-threshold branch (r18, VERDICT r17 #3; the
    100k-word long-doc microbench is in OPTIMIZATION_r18.md). The top
    count is an exact integer either way, so the division -- and the
    DuckDB mirror, which keeps its own list_filter form -- stays
    bit-identical."""
    def body(ws):
        hit = lambda acc, w: F.when(  # noqa: E731
            w == acc.getField("prev"), acc.getField("run") + 1
        ).otherwise(F.lit(1))
        top = F.aggregate(
            ws,
            F.struct(
                F.lit("").alias("prev"),
                F.lit(0).alias("run"),
                F.lit(0).alias("best"),
            ),
            lambda acc, w: F.struct(
                w.alias("prev"),
                hit(acc, w).alias("run"),
                F.greatest(acc.getField("best"), hit(acc, w)).alias("best"),
            ),
            lambda acc: acc.getField("best"),
        ).cast("double")
        return top / F.size(ws).cast("double")

    # let_col binds the sorted array once; the fold's per-element work
    # is O(1) (two string equalities on lambda variables).
    return F.when(F.length(F.trim(_c(col))) == 0, F.lit(0.0)).otherwise(
        let_col(F.array_sort(_words(col)), body)
    )


def mean_word_length(col: Column | str) -> Column:
    """Mean characters per word over the normalized text, computed
    without lambdas: total chars = length(norm) - (n-1) separators."""
    norm = normalized_text(_c(col))
    n = F.size(_words(col)).cast("double")
    chars = (F.length(norm) - (F.size(_words(col)) - F.lit(1))).cast("double")
    return F.when(F.length(norm) == 0, F.lit(0.0)).otherwise(chars / n)


def split_sentences(col: Column | str) -> Column:
    """Sentence array of the text: maximal runs of non-terminator
    characters plus their trailing ``.!?`` run, trimmed, empties
    dropped. RE2-safe (no lookbehind -- the terminators stay ATTACHED
    to their sentence instead of being split on), so the same pattern
    mirrors in any SQL engine; abbreviation handling ("e.g.") is a
    model-based segmenter's job and slots into the same seam."""
    parts = F.regexp_extract_all(
        _c(col), F.lit(r"[^.!?]+[.!?]*"), F.lit(0)
    )
    return F.filter(
        F.transform(parts, lambda s: F.trim(s)), lambda s: s != ""
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

_BULLET_CHARS = ("-", "*", "•")  # -, *, •


def gopher_quality_flags(
    col: Column | str,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_fraction: float = 0.9,
    max_ellipsis_line_fraction: float = 0.3,
    min_alpha_word_fraction: float = 0.8,
    min_stopword_hits: int = 2,
) -> Column:
    """The Gopher quality-rule bundle (Rae et al. 2021, Appendix A1.1)
    as ONE struct column -- the published heuristic filter most
    web-corpus recipes start from:

      - word count in [min_words, max_words]
      - mean word length in [min, max] chars
      - symbol-to-word ratio ('#' and '...') <= max
      - at most max_bullet_line_fraction of lines start with a bullet
      - at most max_ellipsis_line_fraction of lines end with ellipsis
      - >= min_alpha_word_fraction of words contain a letter
      - text contains >= min_stopword_hits of the 8 Gopher stop words

    Fields: n_words, mean_word_len, symbol_ratio, bullet_line_fraction,
    ellipsis_line_fraction, alpha_word_fraction, n_stopwords_present,
    keep (the conjunction). Pure codegen'd array expressions, linear
    per document, mirrored exactly by DuckDB list functions -- zero
    shuffles; the gate composes as a narrow filter at any scale.
    """
    raw = _c(col)
    words = _words(col)
    n = F.size(words)
    nd = n.cast("double")
    mwl = mean_word_length(col)
    symbols = (
        F.regexp_count(raw, F.lit("#")) + F.regexp_count(raw, F.lit(r"\.\.\."))
    )
    symbol_ratio = F.when(n > 0, symbols.cast("double") / nd).otherwise(
        F.lit(0.0)
    )
    lines = F.split(raw, "\n")
    n_lines = F.size(lines).cast("double")
    bullet = F.size(
        F.filter(
            lines,
            lambda l: F.substring(F.ltrim(l), 1, 1).isin(*_BULLET_CHARS),
        )
    ).cast("double")
    ellipsis = F.size(
        F.filter(
            lines,
            lambda l: F.endswith(F.rtrim(l), F.lit("..."))
            | F.endswith(F.rtrim(l), F.lit("…")),
        )
    ).cast("double")
    alpha = F.size(F.filter(words, lambda w: w.rlike("[a-z]"))).cast("double")
    alpha_frac = F.when(n > 0, alpha / nd).otherwise(F.lit(0.0))
    stop_hits = let_col(
        words,
        lambda ws: F.size(
            F.filter(
                F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
                lambda s: F.array_contains(ws, s),
            )
        ),
    )
    bullet_frac = bullet / n_lines
    ellipsis_frac = ellipsis / n_lines
    keep = (
        (n >= F.lit(min_words))
        & (n <= F.lit(max_words))
        & (mwl >= F.lit(float(min_mean_word_len)))
        & (mwl <= F.lit(float(max_mean_word_len)))
        & (symbol_ratio <= F.lit(float(max_symbol_word_ratio)))
        & (bullet_frac <= F.lit(float(max_bullet_line_fraction)))
        & (ellipsis_frac <= F.lit(float(max_ellipsis_line_fraction)))
        & (alpha_frac >= F.lit(float(min_alpha_word_fraction)))
        & (stop_hits >= F.lit(min_stopword_hits))
    )
    return F.struct(
        n.cast("long").alias("n_words"),
        mwl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_line_fraction"),
        ellipsis_frac.alias("ellipsis_line_fraction"),
        alpha_frac.alias("alpha_word_fraction"),
        stop_hits.cast("long").alias("n_stopwords_present"),
        keep.alias("keep"),
    )


# ---------------------------------------------------------------------------
# PII detection / redaction. Patterns are deliberately RE2-safe (no
# backreferences, no lookaround) so the exact same pattern string runs
# on the JVM (java.util.regex) and in DuckDB (RE2) with identical
# matches -- which is what makes the scrub oracle-checkable.
# ---------------------------------------------------------------------------

PII_PATTERNS: dict[str, str] = {
    # order matters for redaction: emails contain dot-runs an ipv4
    # pattern could bite into, so email is replaced first.
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
}


def pii_count(col: Column | str, kind: str) -> Column:
    """Number of matches of one PII pattern ('email'|'ipv4'|'ssn')."""
    return F.regexp_count(_c(col), F.lit(PII_PATTERNS[kind]))


def redact_pii(col: Column | str, replacement: str = "[PII]") -> Column:
    """Replace every PII match with ``replacement``, applying patterns
    in the fixed PII_PATTERNS order (email -> ipv4 -> ssn) so Spark and
    any SQL mirror produce byte-identical output."""
    out = _c(col)
    for pattern in PII_PATTERNS.values():
        out = F.regexp_replace(out, pattern, replacement)
    return out


# --------------------------------------------------------------------------
# C4 cleaning rules (Raffel et al. 2020, "Exploring the Limits of
# Transfer Learning...", section 2.2 -- the published heuristics the
# C4 corpus was built with)
# --------------------------------------------------------------------------

# Placeholder slice of the "List of Dirty, Naughty, Obscene..." public
# blocklist C4 cites; swap the full list in for production (same
# any-match expression, the list is data).
C4_BADWORDS = ("badword1", "badword2", "obscenity")

_C4_TERMINAL = ('.', '!', '?', '"')


def _literal_split_pattern(sep: str) -> str:
    """Quote ``sep`` for F.split, which treats its pattern as a Java
    REGEX: \\Q...\\E quoting makes any separator (e.g. '.', '|')
    split literally. Embedded \\E sequences are re-quoted."""
    return "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def c4_clean_lines(
    col: Column | str,
    *,
    sep: str = "\n",
    min_line_words: int = 5,
) -> Column:
    """C4's LINE-level pass, reassembled: keep only lines that end in
    terminal punctuation (. ! ? or closing quote), have at least
    ``min_line_words`` words, and do not contain the word
    'javascript' (case-insensitive) -- the paper's line rules.
    ('lorem ipsum', '{' and the blocklist are PAGE-level removals;
    ``c4_quality_flags`` checks those.) Returns the surviving lines
    re-joined with ``sep`` ('' when nothing survives) -- the
    filtered-reassembly shape whose DuckDB mirror (list_filter +
    array_to_string) is bit-proven. Pure codegen'd array expressions,
    zero shuffles. ``sep`` is split as a LITERAL (regex-quoted), so
    separators containing regex metacharacters are safe."""
    lines = F.split(_c(col), F.lit(_literal_split_pattern(sep)))

    def keep_line(ln):
        trimmed = F.trim(ln)
        ends_ok = F.substring(trimmed, -1, 1).isin(list(_C4_TERMINAL))
        n_words = F.size(F.split(trimmed, " "))
        return (
            ends_ok
            & (n_words >= min_line_words)
            & ~F.lower(trimmed).contains("javascript")
        )

    return F.array_join(F.filter(lines, keep_line), sep)


def c4_quality_flags(
    col: Column | str,
    *,
    sep: str = "\n",
    min_sentences: int = 3,
    min_line_words: int = 5,
    badwords: tuple[str, ...] = C4_BADWORDS,
) -> Column:
    """C4's PAGE-level verdict over the line-cleaned text, as one
    struct column (the same shape as gopher_quality_flags):

      - n_kept_lines / cleaned_chars: what the line pass left
      - n_sentences >= min_sentences (terminal-punctuation count)
      - no curly brace '{' (code page marker)
      - no 'lorem ipsum'
      - no blocklist word
      - keep: the conjunction

    Fields: n_kept_lines, cleaned_chars, n_sentences, has_brace,
    has_lorem, has_badword, keep. Zero shuffles; compose with
    ``c4_clean_lines`` for the cleaned text itself."""
    cleaned = c4_clean_lines(
        _c(col), sep=sep, min_line_words=min_line_words
    )
    lower = F.lower(cleaned)
    n_sentences = (
        F.length(F.regexp_replace(cleaned, r"[^.!?]", ""))
    ).cast("long")
    # any-match over the blocklist as a simple OR chain (tiny list;
    # the full published list is data behind the same expression)
    has_badword = F.lit(False)
    for w in badwords:
        has_badword = has_badword | lower.contains(w)
    n_kept_lines = F.when(cleaned == "", F.lit(0)).otherwise(
        F.size(F.split(cleaned, F.lit(_literal_split_pattern(sep))))
    ).cast("long")
    has_brace = cleaned.contains("{")
    has_lorem = lower.contains("lorem ipsum")
    keep = (
        (n_sentences >= min_sentences)
        & ~has_brace
        & ~has_lorem
        & ~has_badword
    )
    return F.struct(
        n_kept_lines.alias("n_kept_lines"),
        F.length(cleaned).cast("long").alias("cleaned_chars"),
        n_sentences.alias("n_sentences"),
        has_brace.alias("has_brace"),
        has_lorem.alias("has_lorem"),
        has_badword.alias("has_badword"),
        keep.alias("keep"),
    )


# --------------------------------------------------------------------------
# Credit-card detection with Luhn validation (r7). A bare 13-19-digit
# regex false-positives on order numbers, timestamps and phone
# strings; the Luhn check (ISO/IEC 7812's checksum, mod-10
# double-every-second-digit) filters to checksum-consistent numbers --
# the standard PII-scanner refinement. Pure integer column
# expressions (no UDF), so counts and verdicts mirror bit-exactly in
# SQL: integer sums admit no float drift.
# --------------------------------------------------------------------------

CARD_CANDIDATE_PATTERN = r"\b\d(?:[ -]?\d){12,18}\b"


def luhn_valid(col: Column | str) -> Column:
    """True iff the DIGIT-ONLY string passes the Luhn mod-10 check and
    has a plausible card length (13-19). Fold: from the right, double
    every second digit, subtract 9 when the double exceeds 9, sum,
    check mod 10."""
    ds = _c(col)
    length = F.length(ds)
    total = F.aggregate(
        F.sequence(F.lit(1), length),
        F.lit(0),
        lambda acc, i: acc + F.when(
            i % 2 == 0,
            F.substring(ds, (length - i + 1).cast("int"), 1).cast("int") * 2
            - F.when(
                F.substring(ds, (length - i + 1).cast("int"), 1).cast("int")
                * 2 > 9,
                F.lit(9),
            ).otherwise(F.lit(0)),
        ).otherwise(
            F.substring(ds, (length - i + 1).cast("int"), 1).cast("int")
        ),
    )
    return (total % 10 == 0) & (length >= 13) & (length <= 19)


def credit_card_counts(col: Column | str) -> Column:
    """struct(n_candidates, n_valid) over a text column: candidate =
    13-19 digits with optional space/dash separators; valid = Luhn-
    checked after stripping the separators (chained LITERAL replaces,
    the engine-portable order)."""
    c = _c(col)
    cands = F.regexp_extract_all(c, F.lit(CARD_CANDIDATE_PATTERN), F.lit(0))
    digits_only = lambda x: F.replace(  # noqa: E731
        F.replace(x, F.lit(" "), F.lit("")), F.lit("-"), F.lit("")
    )
    return F.struct(
        F.size(cands).cast("long").alias("n_candidates"),
        F.size(
            F.filter(cands, lambda x: luhn_valid(digits_only(x)))
        ).cast("long").alias("n_valid"),
    )
