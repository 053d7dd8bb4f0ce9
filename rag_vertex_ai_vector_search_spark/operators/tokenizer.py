"""Tokenizer corpus-prep: the aggregate statistics a tokenizer build
(BPE/WordPiece) extracts from a training corpus before any model runs.

Two operators, both classic first-steps of tokenizer training:

- ``vocab_coverage_report``: top-K words by frequency with the running
  corpus-coverage fraction -- the curve that answers "how big must the
  vocabulary be to cover X% of tokens" (vocab-size budgeting).
- ``bpe_merge_pairs``: adjacent-character-pair frequencies inside
  words, weighted by word frequency -- exactly the statistic BPE's
  first merge iteration maximizes (Sennrich et al. 2016). One
  iteration is enough for the engine's job (the corpus-side count);
  the greedy merge loop itself is vocabulary-sized driver work.

Scale shape: both reduce to word-count tables first (one shuffle with
map-side combine over ~corpus tokens), then operate on the
vocabulary-sized side (bounded by distinct words, not corpus rows).
The top-K cut is orderBy+limit -> TakeOrderedAndProject (distributed
partial top-K, tiny driver merge), and the rank/cumsum windows run
over only the K survivors under a constant partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import let_col, normalized_text
from ..functions.vector import constant_partition_key


def _word_counts(df: DataFrame, text_col: str) -> DataFrame:
    return (
        df.select(
            F.explode(
                F.split(normalized_text(F.col(text_col)), " ")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def vocab_coverage_report(
    df: DataFrame, *, text_col: str = "text", top_k: int = 100
) -> DataFrame:
    """(rank, word, n, cum_fraction) for the ``top_k`` most frequent
    words; ``cum_fraction`` is the running fraction of ALL corpus
    tokens covered by ranks 1..rank. Deterministic (n desc, word asc)
    ordering makes ranks and fractions engine-portable. The corpus
    total rides along as a broadcast one-row aggregate -- no driver
    collect."""
    return vocab_coverage_from_counts(_word_counts(df, text_col), top_k=top_k)


def vocab_coverage_from_counts(counts: DataFrame, *, top_k: int = 100) -> DataFrame:
    """Coverage report over a prebuilt (word, n) table -- the shared
    tail of the batch path and the streaming path
    (streaming/vocab.py's incrementally-maintained counts)."""
    total = counts.agg(F.sum("n").cast("long").alias("_total"))
    top = (
        counts.orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(top_k)
        .crossJoin(F.broadcast(total))
    )
    w = Window.partitionBy(constant_partition_key("word")).orderBy(
        F.col("n").desc(), F.col("word").asc()
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn(
            "cum_fraction",
            F.sum("n").over(run).cast("double") / F.col("_total").cast("double"),
        )
        .select("rank", "word", F.col("n").cast("long").alias("n"),
                "cum_fraction")
    )


def bpe_merge_pairs(
    df: DataFrame, *, text_col: str = "text", top_k: int = 100
) -> DataFrame:
    """(rank, pair, n_occurrences) for the ``top_k`` most frequent
    adjacent character pairs inside words, weighted by word frequency
    -- BPE's first-iteration merge candidates. Pair enumeration runs
    on the VOCABULARY table (distinct words), so the explode is
    bounded by vocab size x word length, not corpus tokens."""
    return bpe_merge_pairs_from_counts(
        _word_counts(df, text_col), top_k=top_k
    )


def bpe_merge_pairs_from_counts(
    counts: DataFrame, *, top_k: int = 100
) -> DataFrame:
    """Pair statistics over a prebuilt (word, n) table (shared with the
    streaming count maintenance)."""
    pairs = counts.select(
        F.explode(
            F.when(
                F.length("word") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.length("word") - 1),
                    lambda i: F.col("word").substr(i, F.lit(2)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pair"),
        F.col("n"),
    )
    agg = pairs.groupBy("pair").agg(
        F.sum("n").cast("long").alias("n_occurrences")
    )
    w = Window.partitionBy(constant_partition_key("pair")).orderBy(
        F.col("n_occurrences").desc(), F.col("pair").asc()
    )
    return (
        agg.orderBy(F.col("n_occurrences").desc(), F.col("pair").asc())
        .limit(top_k)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "pair", "n_occurrences")
    )


# --------------------------------------------------------------------------
# Iterative BPE training (Sennrich et al. 2016, Algorithm 1)
# --------------------------------------------------------------------------

_PAIR_SEP = "\x01"  # joins (left, right) into one pair key


def _merge_fold(toks_col, left, right, merged_tok: str | None = None):
    """Apply ONE merge (left, right) -> ``merged_tok`` (default
    left+right, the BPE convention; WordPiece passes the
    '##'-stripped concatenation) to a space-joined symbol string,
    greedy left-to-right non-overlapping -- the exact scan semantics
    of the reference BPE implementation, expressed as a sequential
    fold: seed with the first symbol, then for each next symbol
    either merge it into the accumulator's LAST token (when
    last == left and s == right) or append. A just-merged token can no
    longer match as ``left`` unless it literally equals it, which
    reproduces the i += 2 skip of the scanning loop.

    The accumulator is a STRING (not an array) so the identical
    lambda runs as DuckDB ``list_reduce`` in the oracle -- same
    algorithm, same types, both engines.
    """
    arr = F.split(toks_col, " ")
    merged = F.lit(merged_tok) if merged_tok is not None else F.concat(
        F.lit(left), F.lit(right)
    )

    def step(acc, s):
        accarr = F.split(acc, " ")
        last = F.element_at(accarr, -1)
        stripped = F.array_join(
            F.slice(accarr, 1, F.size(accarr) - 1), " "
        )
        head = F.when(
            F.size(accarr) == 1, F.lit("")
        ).otherwise(F.concat(stripped, F.lit(" ")))
        return F.when(
            (last == F.lit(left)) & (s == F.lit(right)),
            F.concat(head, merged),
        ).otherwise(F.concat(acc, F.lit(" "), s))

    return F.aggregate(
        F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
        F.element_at(arr, 1),
        step,
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(pair, cnt) over the current symbolized vocabulary.

    Deliberately NOT let_col-bound (r17): the input is the
    vocabulary table (short symbol arrays), so the in-lambda split
    re-evaluation is O(word_len^2) on tiny strings -- measured noise
    -- while the extra binding layer costs real driver-side analysis
    time on the round loop's accumulated fold lineage (8-round
    bpe_train_merges: ~0.5 s slower with the binding)."""
    arr = F.split(F.col("toks"), " ")
    pairs = vocab.select(
        F.explode(
            F.when(
                F.size(arr) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(arr) - 1),
                    lambda i: F.concat(
                        F.element_at(arr, i),
                        F.lit(_PAIR_SEP),
                        F.element_at(arr, i + 1),
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pair"),
        "n",
    )
    return pairs.groupBy("pair").agg(F.sum("n").cast("long").alias("cnt"))


def _accept_batch(rows, alphabet: set, remaining: int) -> list:
    """Greedy prefix of the (count desc, pair asc)-sorted candidate
    list that is PROVABLY the same choice sequence the one-merge-at-a-
    time loop makes. Four rules, each required for exact equivalence:

    1. Disjoint symbols: a candidate sharing a symbol with an already-
       accepted merge stops the round (it is not taken): its count
       changes under the accepted rewrites, so its post-rewrite rank
       is unknowable without recounting.
    2. Stop at first rejection: everything ranked below a rejected
       candidate stays unaccepted too -- the rejected pair might still
       outrank them after the rewrite.
    3. Created-token collision: if an accepted merge's concatenation
       equals an EXISTING symbol (e.g. merging ('re','d') when 'red'
       is already a symbol from ('r','ed')), the rewrite can INCREASE
       counts of pairs containing that symbol -- including pairs
       ranked below everything collected -- so the round stops right
       after accepting it.
    4. Count-band safety: a merge-created pair inherits a count BOUND
       from an old pair overlapping the accepted symbols -- and when
       that bound TIES the next candidate's count, the new pair's
       fresh pair-string can win the lexicographic break (observed:
       merging (c,o) creates ('co','lu') at 978, beating ('lu','m')
       at 978). So after the first accept, a candidate is taken only
       if its ENTIRE count band is visible in the collected list
       (its count exceeds the last collected count) and no same-count
       row overlaps the accepted symbols.

    Why the accepted prefix is exactly the sequential choice sequence:
    every pair overlapping accepted symbols ranks below the current
    candidate (else the scan stopped earlier), so decreases stay
    below it; created pairs are bounded by those overlapping counts,
    which rule 4 forces STRICTLY below the candidate's count. So
    after each accepted rewrite, the next accepted candidate is still
    the global argmax under the (count desc, pair asc) total order.
    Proven batched==sequential in tests/test_tokenizer.py, including
    an adversarial collision corpus.
    """
    parsed = [
        (tuple(r["pair"].split(_PAIR_SEP)), r["cnt"]) for r in rows
    ]
    min_cnt = parsed[-1][1]
    accepted = []
    used: set = set()
    for i, ((left, right), cnt) in enumerate(parsed):
        if len(accepted) >= remaining:
            break
        if left in used or right in used:
            break
        if used:
            # rule 4 (needed only once witnesses exist): the count
            # band must be fully collected and overlap-free
            if cnt <= min_cnt:
                break
            if any(
                l2 in used or r2 in used
                for (l2, r2), c2 in parsed[i + 1:]
                if c2 == cnt
            ):
                break
        merged = left + right
        accepted.append((left, right, merged, cnt))
        used.update((left, right, merged))
        if merged in alphabet:
            break
        alphabet.add(merged)
    return accepted


def _apply_merges_udf(toks_col, merges):
    """Arrow-batched rewrite applying an ORDERED merge list to a
    space-joined symbol string -- the standard greedy scan loop, the
    same semantics as chaining _merge_fold per merge (bit-equality
    proven in tests/test_tokenizer.py). One UDF pass replaces
    len(merges) chained fold expressions: the batched trainer's
    per-round rewrite."""
    from pyspark.sql import types as T

    merge_list = [(m[0], m[1]) for m in merges]

    @F.pandas_udf(T.StringType())
    def _apply(col):
        def rewrite(toks: str) -> str:
            syms = toks.split(" ")
            for left, right in merge_list:
                i = 0
                out = []
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == left
                        and syms[i + 1] == right
                    ):
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return " ".join(syms)

        return col.map(rewrite)

    return _apply(toks_col)


def _scan_merge(syms: list, left: str, right: str, merged: str) -> list:
    """One greedy left-to-right non-overlapping merge pass over a
    symbol list -- the scan semantics every BPE path shares."""
    i = 0
    out = []
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _train_bpe_driver_recount(vocab_rows, n_merges: int) -> list:
    """Reference implementation: full O(total_symbols) pair recount
    per merge. Kept as the equality anchor for the incremental heap
    trainer below (tests/test_tokenizer.py proves heap == recount)."""
    from collections import Counter

    words = [(toks.split(" "), int(n)) for toks, n in vocab_rows]
    merges = []
    while len(merges) < n_merges:
        counts: Counter = Counter()
        for syms, n in words:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += n
        if not counts:
            raise ValueError(
                f"BPE pairs exhausted after {len(merges)} merges "
                f"(requested {n_merges}): every word is one symbol"
            )
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((len(merges) + 1, left, right, left + right, cnt))
        for wi, (syms, n) in enumerate(words):
            out = _scan_merge(syms, left, right, left + right)
            if len(out) != len(syms):
                words[wi] = (out, n)
    return merges


def _train_bpe_driver(vocab_rows, n_merges: int) -> list:
    """Exact greedy BPE on a collected (toks, n) vocabulary -- the
    in-memory phase every production tokenizer trainer ends with
    (HF tokenizers / SentencePiece train from word counts, not corpus
    scans). Same algorithm, same (count desc, pair asc) tie-break as
    the Spark loop: the tuple order (left, right) equals the joined
    'left\\x01right' string order because \\x01 sorts below every
    symbol character. Returns [(rank, left, right, merged, cnt)].

    Incremental since r12 (the classic pair-count + lazy max-heap
    scheme): per merge, only the words CONTAINING the chosen pair are
    rewritten and only their pairs' counts change, so a merge costs
    O(affected symbols + heap churn) instead of a full recount. Output
    is PROVABLY the recount reference's: a popped heap entry is used
    only when it matches the live count, and every count change pushes
    a fresh entry, so each pop is the true (count desc, pair asc)
    argmax (heapq orders (-count, left, right) tuples -- the same
    total order). Equality is test-pinned against
    _train_bpe_driver_recount AND the per-merge Spark loop."""
    import heapq
    from collections import Counter, defaultdict

    words = [(toks.split(" "), int(n)) for toks, n in vocab_rows]
    counts: Counter = Counter()
    where: defaultdict = defaultdict(set)  # pair -> word indices
    for wi, (syms, n) in enumerate(words):
        for pair in zip(syms, syms[1:]):
            counts[pair] += n
            where[pair].add(wi)
    heap = [(-c, a, b) for (a, b), c in counts.items()]
    heapq.heapify(heap)

    merges = []
    while len(merges) < n_merges:
        while heap:
            negc, left, right = heapq.heappop(heap)
            if counts.get((left, right), 0) == -negc:
                break
        else:
            raise ValueError(
                f"BPE pairs exhausted after {len(merges)} merges "
                f"(requested {n_merges}): every word is one symbol"
            )
        cnt = -negc
        merged = left + right
        merges.append((len(merges) + 1, left, right, merged, cnt))

        changed_pairs = set()
        for wi in sorted(where[(left, right)]):
            syms, n = words[wi]
            out = _scan_merge(syms, left, right, merged)
            if len(out) == len(syms):
                continue
            words[wi] = (out, n)
            old_pairs = Counter(zip(syms, syms[1:]))
            new_pairs = Counter(zip(out, out[1:]))
            for pair in old_pairs.keys() | new_pairs.keys():
                delta = new_pairs[pair] - old_pairs[pair]
                if delta:
                    counts[pair] += delta * n
                    changed_pairs.add(pair)
                    if counts[pair] <= 0:
                        del counts[pair]
                if pair in new_pairs:
                    where[pair].add(wi)
                else:
                    where[pair].discard(wi)
        for pair in changed_pairs:
            c = counts.get(pair, 0)
            if c > 0:
                heapq.heappush(heap, (-c, pair[0], pair[1]))
    return merges


def train_bpe(
    df: DataFrame | None,
    *,
    text_col: str = "text",
    n_merges: int = 8,
    checkpoint_every: int = 8,
    counts: DataFrame | None = None,
    batch_candidates: int = 1,
    driver_threshold: int = 0,
    stats: dict | None = None,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus: the full greedy
    loop, not just the first iteration's statistics. Returns
    ``(merge_rank, left, right, merged, n_occurrences)`` -- the merge
    list a tokenizer ships.

    ``counts`` (a prebuilt (word, n) table) replaces the corpus scan
    -- the same seam vocab_coverage_from_counts exposes, so the
    streaming-maintained vocabulary (streaming/vocab.py) feeds BPE
    training without re-reading documents.

    ``batch_candidates`` is the production-scale lever (VERDICT r6
    #2): with the default 1, every round is one driver round-trip per
    merge (one argmax row collected; the chained-fold rewrite keeps
    the round SQL-oracle-able as a CTE stage) -- fine for gates, a
    scale-killer at a real tokenizer's 30k+ merges. With N > 1, each
    round collects the top-N candidate pairs and accepts the longest
    prefix that provably commutes with the sequential choice order
    (see _accept_batch: disjoint symbols, stop-at-first-overlap,
    created-token collision guard), then applies the whole batch in
    ONE Arrow-batched rewrite pass. Rounds shrink from n_merges to
    ~n_merges/batch while the learned merge list stays IDENTICAL --
    batched(N) == sequential is a proven invariant
    (tests/test_tokenizer.py), not an approximation.

    ``driver_threshold`` (rows): when > 0 and the vocabulary table
    has at most that many rows, training collects (toks, n) ONCE and
    runs the exact greedy loop in memory (_train_bpe_driver) -- the
    shape of every production tokenizer trainer: Spark does the
    corpus-scale half (100 TB -> word counts, one shuffle), the
    Zipf-small vocabulary trains driver-side. Identical output to
    both Spark paths (proven in tests/test_tokenizer.py); ASCII-safe
    tie-breaks (exotic non-BMP symbols could order differently under
    Java UTF-16 comparison -- not a corpus this engine normalizes).

    Scale shape per round (distributed paths): pair counting and the
    rewrite run on the VOCABULARY table (distinct words x word length
    -- bounded, never corpus-sized), and driver traffic is
    <= batch_candidates rows.
    ``checkpoint_every`` localCheckpoints the vocabulary every that
    many ROUNDS so round i+1's scan doesn't replay i accumulated
    rewrites. Default 8 (r18, VERDICT r17 #7): each checkpoint is a
    ~0.35 s materialization job while re-running up to 8 accumulated
    folds on the vocabulary-sized table is near-free, so the 8-round
    gate trainings measured 3.43 s at cadence 4 vs 2.28 s with no
    mid-loop checkpoint; the FINAL round never checkpoints (the loop's
    vocab is discarded -- only the merge list is returned).
    Deterministic: ties break (count desc, pair asc) like
    bpe_merge_pairs. ``stats`` (optional dict) receives
    {"rounds": int, "batch_sizes": [int, ...]} for observability.
    """
    base = counts if counts is not None else _word_counts(df, text_col)
    spark = (df if df is not None else base).sparkSession
    schema = (
        "merge_rank long, left string, right string, merged string, "
        "n_occurrences long"
    )
    vocab = base.select(
        "word",
        F.array_join(F.split(F.col("word"), ""), " ").alias("toks"),
        F.col("n").cast("long").alias("n"),
    )

    n_rows = None
    if driver_threshold > 0 or batch_candidates > 1:
        # The count feeds the in-memory decision and the collect
        # follows immediately -- materialize the (bounded,
        # vocabulary-sized) table ONCE so the corpus-scale lineage
        # behind it (explode + groupBy over every document) doesn't
        # execute twice (the CLAUDE.md bounded-intermediate rule; this
        # was the actual cost of bpe_train_production_1000, not the
        # greedy loop).
        vocab = vocab.localCheckpoint(eager=True)
        n_rows = vocab.count()

    # The vocabulary row count is FIXED throughout training (merges
    # rewrite toks, never add/remove words), so the in-memory decision
    # is one count at the start. At 100 TB the heavy half -- corpus ->
    # (word, n) counts -- already ran as one Spark shuffle; Zipf makes
    # the vocabulary table orders of magnitude smaller than the
    # corpus, and when it fits the driver, the exact greedy loop runs
    # there (the production-trainer shape). Distributed batched rounds
    # below cover vocabularies beyond driver memory.
    if driver_threshold > 0 and n_rows <= driver_threshold:
        rows = vocab.select("toks", "n").collect()
        merges = _train_bpe_driver(
            [(r["toks"], r["n"]) for r in rows], n_merges
        )
        if stats is not None:
            stats["rounds"] = 0
            stats["driver_rows"] = n_rows
        return spark.createDataFrame(merges, schema)

    if batch_candidates > 1:
        # small vocab tables otherwise pay 32-task scheduling per
        # round: right-size partitions before the round loop
        target = min(
            spark.sparkContext.defaultParallelism,
            max(1, n_rows // 65536),
        )
        vocab = vocab.repartition(target)
    vocab = vocab.localCheckpoint(eager=True)

    alphabet: set = set()
    if batch_candidates > 1:
        # the collision guard needs the live symbol set; seed it with
        # the initial character alphabet (tiny: one distinct collect)
        alphabet = {
            r[0]
            for r in vocab.select(
                F.explode(F.split(F.col("word"), "")).alias("s")
            )
            .distinct()
            .collect()
        }

    merges = []
    rounds = 0
    while len(merges) < n_merges:
        rounds += 1
        remaining = n_merges - len(merges)
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(max(1, batch_candidates))
            .collect()
        )
        if not top:
            raise ValueError(
                f"BPE pairs exhausted after {len(merges)} merges "
                f"(requested {n_merges}): every word is one symbol"
            )
        if batch_candidates > 1:
            batch = _accept_batch(top, alphabet, remaining)
            vocab = vocab.withColumn(
                "toks", _apply_merges_udf(F.col("toks"), batch)
            )
        else:
            left, right = top[0]["pair"].split(_PAIR_SEP)
            batch = [(left, right, left + right, top[0]["cnt"])]
            vocab = vocab.withColumn(
                "toks", _merge_fold(F.col("toks"), left, right)
            )
        for left, right, merged, cnt in batch:
            merges.append((len(merges) + 1, left, right, merged, cnt))
        if len(merges) < n_merges and rounds % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)
        if stats is not None:
            stats.setdefault("batch_sizes", []).append(len(batch))
            stats["rounds"] = rounds

    return spark.createDataFrame(merges, schema)


def apply_bpe_to_words(
    words: DataFrame,
    merges,
    *,
    word_col: str = "word",
    method: str = "fold",
) -> DataFrame:
    """Apply an ORDERED merge list to each word: the encode side of
    BPE (what a tokenizer does at corpus-processing time with a
    published merges.txt). Returns the input plus ``toks`` -- the
    word's final space-joined symbol sequence.

    ``merges``: [(left, right), ...] in training order (driver-held;
    a production merges.txt is ~32k pairs, a few hundred KiB).

    ``method="fold"``: one chained JVM fold per merge -- bit-exact
    against the training rewrite (and the SQL oracle) but the
    expression tree grows with len(merges); right for gates and short
    merge lists. ``method="udf"``: one Arrow-batched pandas UDF
    applying all merges per word with the standard scan loop -- the
    production path for real merge lists (per-word cost ~word_len x
    matching merges, independent of expression-tree limits). Both
    paths produce IDENTICAL results (tests/test_tokenizer.py).
    """
    if method == "fold":
        toks = F.array_join(F.split(F.col(word_col), ""), " ")
        out = words.withColumn("toks", toks)
        for left, right in merges:
            out = out.withColumn(
                "toks", _merge_fold(F.col("toks"), left, right)
            )
        return out

    if method != "udf":
        raise ValueError(f"method must be 'fold' or 'udf', got {method!r}")

    from pyspark.sql import types as T

    merge_list = list(merges)

    # no pd.Series annotations: pandas is imported locally, so string
    # type hints would not resolve for pandas_udf's inference
    @F.pandas_udf(T.StringType())
    def _apply(col):
        def encode(w: str) -> str:
            syms = list(w)
            for left, right in merge_list:
                i = 0
                out = []
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == left
                        and syms[i + 1] == right
                    ):
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return " ".join(syms)

        return col.map(encode)

    return words.withColumn("toks", _apply(F.col(word_col)))


def bpe_tokenize(
    df: DataFrame,
    merges,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    method: str = "fold",
) -> DataFrame:
    """Tokenize a corpus with a trained merge list: per-document
    ``(id, n_words, n_tokens, tokens)`` where ``tokens`` is the
    space-joined BPE symbol stream in word order.

    Scale shape (the per-DISTINCT-word rule): merges apply once per
    VOCABULARY entry, then one join maps positions back -- the
    encode work is bounded by distinct words x word length however
    large the corpus, and the join shuffles corpus positions once.
    """
    pos = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(normalized_text(F.col(text_col)), " ")
        ).alias("_pos", "word"),
    )
    vocab = apply_bpe_to_words(
        pos.select("word").distinct(), merges, method=method
    )
    joined = pos.join(vocab, "word")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_pos"), F.col("toks")))
                    ),
                    lambda s: s.getField("toks"),
                ),
                " ",
            ).alias("tokens"),
        )
        .withColumn(
            "n_tokens",
            F.size(F.split(F.col("tokens"), " ")).cast("long"),
        )
        .select(id_col, "n_words", "n_tokens", "tokens")
    )


# ---------------------------------------------------------------------------
# WordPiece (r12, VERDICT r11 #7): the second tokenizer family. Public
# algorithm: Schuster & Nakajima 2012 / BERT's tokenizer; trainer
# semantics follow HF tokenizers' WordPieceTrainer -- BPE's greedy
# merge loop but ranked by the likelihood score
# count(pair) / (count(left) * count(right)), with continuation
# symbols '##'-prefixed; encoding is greedy longest-match-first
# against the final vocabulary (NOT merge replay -- WordPiece's
# defining difference from BPE).
# ---------------------------------------------------------------------------

WORDPIECE_UNK = "[UNK]"


def _wordpiece_toks(word_col):
    """Initial WordPiece symbolization: first character plain, every
    later character '##'-prefixed."""
    chars = F.split(word_col, "")
    return F.array_join(
        F.transform(
            chars,
            lambda c, i: F.when(i == 0, c).otherwise(
                F.concat(F.lit("##"), c)
            ),
        ),
        " ",
    )


def _symbol_counts(vocab: DataFrame) -> DataFrame:
    """(sym, cnt) over the current symbolized vocabulary, weighted by
    word frequency -- the denominator terms of the WordPiece score."""
    return (
        vocab.select(
            F.explode(F.split(F.col("toks"), " ")).alias("sym"), "n"
        )
        .groupBy("sym")
        .agg(F.sum("n").cast("long").alias("cnt"))
    )


def _wp_merged(left: str, right: str) -> str:
    """The token a WordPiece merge creates: right's '##' continuation
    prefix is absorbed (the pair is adjacent inside one word, so the
    right symbol is always a continuation in well-formed input)."""
    return left + (right[2:] if right.startswith("##") else right)


def _train_wordpiece_driver_recount(vocab_rows, n_merges: int) -> list:
    """Reference implementation: full pair+symbol recount per merge
    (O(n_merges x total symbols)). Kept as the equality anchor for the
    incremental heap trainer below (tests/test_tokenizer.py proves
    heap == recount), exactly the _train_bpe_driver_recount pattern."""
    from collections import Counter

    words = [(toks.split(" "), int(n)) for toks, n in vocab_rows]
    merges = []
    while len(merges) < n_merges:
        pair_counts: Counter = Counter()
        sym_counts: Counter = Counter()
        for syms, n in words:
            for sym in syms:
                sym_counts[sym] += n
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += n
        if not pair_counts:
            raise ValueError(
                f"WordPiece pairs exhausted after {len(merges)} merges "
                f"(requested {n_merges}): every word is one symbol"
            )
        best = min(
            pair_counts.items(),
            # float() each count BEFORE multiplying so the rounding
            # order replicates the engine expression double(cnt) /
            # (double(nl) * double(nr)) exactly -- an exact Python
            # integer product rounds once where the engines round
            # twice, and past 2^53 the last ulp can flip the argmax
            # (the same-association rule for inlined float constants).
            key=lambda kv: (
                -(
                    float(kv[1])
                    / (
                        float(sym_counts[kv[0][0]])
                        * float(sym_counts[kv[0][1]])
                    )
                ),
                kv[0][0] + _PAIR_SEP + kv[0][1],
            ),
        )
        (left, right), cnt = best
        merged = _wp_merged(left, right)
        merges.append(
            (len(merges) + 1, left, right, merged, cnt,
             sym_counts[left], sym_counts[right])
        )
        for wi, (syms, n) in enumerate(words):
            out = _scan_merge(syms, left, right, merged)
            if len(out) != len(syms):
                words[wi] = (out, n)
    return merges


def _train_wordpiece_driver(vocab_rows, n_merges: int) -> list:
    """Exact greedy WordPiece on a collected (toks, n) vocabulary --
    the in-memory phase of the production trainer (the BPE
    driver-path shape). Same likelihood score and (score DESC, pair
    ASC) tie-break as the Spark round loop; the pair order compares
    the joined 'left\x01right' string exactly like the Spark path's
    ORDER BY pair. Proven output-identical to the Spark loop in
    tests/test_tokenizer.py.

    Incremental since r17 (the _train_bpe_driver lazy-heap scheme,
    extended to a RATIO score): per merge only the words containing
    the chosen pair are rewritten. A WordPiece score
    cnt(pair) / (cnt(left_sym) * cnt(right_sym)) changes when the
    pair's count changes OR when either denominator symbol's count
    changes -- and a rewrite only ever changes the counts of the three
    symbols (left, right, merged), so the repush set per merge is the
    delta'd pairs plus every live pair touching one of those three
    symbols (tracked in pairs_by_sym). Every score change pushes a
    fresh heap entry and a popped entry is used only when it matches
    the CURRENT score computed by the identical float expression
    float(c) / (float(nl) * float(nr)), so each pop is the true
    (score DESC, pair ASC) argmax. Output is test-pinned equal to
    _train_wordpiece_driver_recount AND the per-round Spark loop."""
    import heapq
    from collections import Counter, defaultdict

    words = [(toks.split(" "), int(n)) for toks, n in vocab_rows]
    counts: Counter = Counter()  # pair -> occurrences
    sym_counts: Counter = Counter()  # symbol -> occurrences
    where: defaultdict = defaultdict(set)  # pair -> word indices
    pairs_by_sym: defaultdict = defaultdict(set)  # symbol -> live pairs
    for wi, (syms, n) in enumerate(words):
        for sym in syms:
            sym_counts[sym] += n
        for pair in zip(syms, syms[1:]):
            counts[pair] += n
            where[pair].add(wi)
            pairs_by_sym[pair[0]].add(pair)
            pairs_by_sym[pair[1]].add(pair)

    def _score(pair) -> float:
        # float() each operand BEFORE multiplying: replicates the
        # engine expression double(cnt) / (double(nl) * double(nr))
        # bit-exactly (same-association rule; see the recount anchor).
        return float(counts[pair]) / (
            float(sym_counts[pair[0]]) * float(sym_counts[pair[1]])
        )

    heap = [
        (-_score(pair), pair[0] + _PAIR_SEP + pair[1], pair)
        for pair in counts
    ]
    heapq.heapify(heap)

    merges = []
    while len(merges) < n_merges:
        while heap:
            negs, _joined, pair = heapq.heappop(heap)
            if counts.get(pair, 0) > 0 and _score(pair) == -negs:
                break
        else:
            raise ValueError(
                f"WordPiece pairs exhausted after {len(merges)} merges "
                f"(requested {n_merges}): every word is one symbol"
            )
        left, right = pair
        cnt = counts[pair]
        merged = _wp_merged(left, right)
        merges.append(
            (len(merges) + 1, left, right, merged, cnt,
             sym_counts[left], sym_counts[right])
        )

        repush = set()
        for wi in sorted(where[pair]):
            syms, n = words[wi]
            out = _scan_merge(syms, left, right, merged)
            if len(out) == len(syms):
                continue
            words[wi] = (out, n)
            for sym in syms:
                sym_counts[sym] -= n
            for sym in out:
                sym_counts[sym] += n
            old_pairs = Counter(zip(syms, syms[1:]))
            new_pairs = Counter(zip(out, out[1:]))
            for p in old_pairs.keys() | new_pairs.keys():
                delta = new_pairs[p] - old_pairs[p]
                if delta:
                    counts[p] += delta * n
                    repush.add(p)
                    if counts[p] <= 0:
                        del counts[p]
                        pairs_by_sym[p[0]].discard(p)
                        pairs_by_sym[p[1]].discard(p)
                    else:
                        pairs_by_sym[p[0]].add(p)
                        pairs_by_sym[p[1]].add(p)
                if p in new_pairs:
                    where[p].add(wi)
                else:
                    where[p].discard(wi)
        # Denominator changes: every live pair touching a symbol whose
        # count moved (only left/right/merged can move) must be
        # rescored, even when its own pair count is unchanged.
        for sym in (left, right, merged):
            repush.update(pairs_by_sym[sym])
        for p in repush:
            if counts.get(p, 0) > 0:
                heapq.heappush(
                    heap, (-_score(p), p[0] + _PAIR_SEP + p[1], p)
                )
    return merges


def train_wordpiece(
    df: DataFrame | None,
    *,
    text_col: str = "text",
    n_merges: int = 8,
    checkpoint_every: int = 4,
    counts: DataFrame | None = None,
    driver_threshold: int = 0,
) -> DataFrame:
    """Learn ``n_merges`` WordPiece merges: each round scores every
    adjacent symbol pair by cnt(pair) / (cnt(left) * cnt(right))
    (the likelihood gain of merging, HF WordPieceTrainer semantics),
    takes the deterministic argmax (score DESC, pair ASC -- the score
    is a ratio of exact integers, so both engines compute the
    identical double and the order is engine-portable), and rewrites
    the vocabulary with the same sequential merge fold BPE uses
    (merged token = left + right-without-'##').

    Returns (merge_rank, left, right, merged, n_pair, n_left,
    n_right) -- integer counts rather than the float score, so every
    output cell is exactly hashable; the score is reconstructible.

    Scale shape matches train_bpe's one-merge-per-round loop: pair
    and symbol counting run on the VOCABULARY table (bounded by
    distinct words x word length, never corpus-sized); driver traffic
    is one argmax row per round. The corpus-scale half (word counts)
    is one shuffle, shared via the ``counts`` seam with the
    streaming-maintained vocabulary."""
    base = counts if counts is not None else _word_counts(df, text_col)
    spark = (df if df is not None else base).sparkSession
    schema = (
        "merge_rank long, left string, right string, merged string, "
        "n_pair long, n_left long, n_right long"
    )
    vocab = base.select(
        "word",
        _wordpiece_toks(F.col("word")).alias("toks"),
        F.col("n").cast("long").alias("n"),
    ).localCheckpoint(eager=True)

    # Production-trainer seam (the train_bpe shape): when the
    # vocabulary fits the driver, collect (toks, n) once and run the
    # exact greedy loop in memory -- identical output, proven in
    # tests/test_tokenizer.py.
    if driver_threshold > 0 and vocab.count() <= driver_threshold:
        rows = vocab.select("toks", "n").collect()
        merges = _train_wordpiece_driver(
            [(r["toks"], r["n"]) for r in rows], n_merges
        )
        return spark.createDataFrame(merges, schema)

    merges = []
    for k in range(n_merges):
        pairs = _pair_counts(vocab)
        # Collect the symbol counts into a true LocalRelation (pandas
        # createDataFrame, the r12 serving lesson) instead of handing
        # the agg to two broadcast exchanges: the sl/sr broadcast
        # builds were separate jobs that each re-ran _symbol_counts
        # over the vocab lineage (no plan reuse across broadcasts) --
        # 3 lineage evaluations per round. The symbol table is BOUNDED
        # by |alphabet| + n_merges (merges add one symbol each), so
        # the per-round collect is driver-safe at any corpus size.
        # Paired A/B (8 merges, sf0.1): 4.60 -> 4.27 s, merge lists
        # identical (r18).
        syms = spark.createDataFrame(_symbol_counts(vocab).toPandas())
        sl = syms.select(
            F.col("sym").alias("_l"), F.col("cnt").alias("n_left")
        )
        sr = syms.select(
            F.col("sym").alias("_r"), F.col("cnt").alias("n_right")
        )
        scored = (
            pairs.withColumn(
                "_l", F.split(F.col("pair"), _PAIR_SEP).getItem(0)
            )
            .withColumn("_r", F.split(F.col("pair"), _PAIR_SEP).getItem(1))
            .join(F.broadcast(sl), "_l")
            .join(F.broadcast(sr), "_r")
            .withColumn(
                "score",
                F.col("cnt").cast("double")
                / (
                    F.col("n_left").cast("double")
                    * F.col("n_right").cast("double")
                ),
            )
        )
        top = scored.orderBy(
            F.col("score").desc(), F.col("pair").asc()
        ).limit(1).collect()
        if not top:
            raise ValueError(
                f"WordPiece pairs exhausted after {len(merges)} merges "
                f"(requested {n_merges}): every word is one symbol"
            )
        row = top[0]
        left, right = row["_l"], row["_r"]
        merged = _wp_merged(left, right)
        vocab = vocab.withColumn(
            "toks", _merge_fold(F.col("toks"), left, right, merged)
        )
        merges.append(
            (k + 1, left, right, merged,
             int(row["cnt"]), int(row["n_left"]), int(row["n_right"]))
        )
        # Cadence stays 4 here, UNLIKE train_bpe's 8 (r18, measured):
        # each WordPiece round evaluates the vocab lineage THREE times
        # (pair scan + the sl/sr broadcast symbol-count builds, no plan
        # reuse across broadcasts), so deep un-checkpointed fold chains
        # cost triple -- ck=8 measured 3.90 s vs ck=4 3.47 s paired.
        # The FINAL round never checkpoints (vocab is discarded; only
        # the merge list returns).
        if (k + 1) < n_merges and (k + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)

    return spark.createDataFrame(merges, schema)


def wordpiece_vocab(df: DataFrame, merges_df: DataFrame,
                    *, text_col: str = "text") -> list[str]:
    """The final WordPiece vocabulary: the initial character alphabet
    of the corpus (first chars plain + '##' continuations) plus every
    merged token, in no particular order (longest-match encoding is
    set-driven). Both collects are alphabet/merge-list-sized."""
    words = df.select(
        F.explode(
            F.split(normalized_text(F.col(text_col)), " ")
        ).alias("word")
    ).distinct()
    alpha = [
        r[0]
        for r in words.select(
            F.explode(
                F.split(_wordpiece_toks(F.col("word")), " ")
            ).alias("sym")
        )
        .distinct()
        .collect()
    ]
    merged = [r["merged"] for r in merges_df.select("merged").collect()]
    return sorted(set(alpha) | set(merged))


def wordpiece_encode_word(word: str, body_sets, unk: str = WORDPIECE_UNK):
    """Greedy longest-match-first WordPiece encoding of one word
    (BERT's WordpieceTokenizer algorithm): repeatedly take the longest
    vocabulary entry matching a prefix of the remaining text (plain
    entries at word start, '##' entries after); any position with no
    match maps the WHOLE word to ``unk``. ``body_sets`` is the
    (initial_bodies, continuation_bodies) pair of frozensets of
    PREFIX-STRIPPED token bodies."""
    init_bodies, cont_bodies = body_sets
    out = []
    rest = word
    cont = False
    while rest:
        bodies = cont_bodies if cont else init_bodies
        ln = len(rest)
        while ln > 0 and rest[:ln] not in bodies:
            ln -= 1
        if ln == 0:
            return [unk]
        out.append(("##" if cont else "") + rest[:ln])
        rest = rest[ln:]
        cont = True
    return out


def wordpiece_encode_words(
    words_df: DataFrame,
    vocab_tokens,
    *,
    word_col: str = "word",
    unk: str = WORDPIECE_UNK,
) -> DataFrame:
    """Greedy longest-match WordPiece encode per word: input plus a
    space-joined ``toks`` column. The per-DISTINCT-word half of
    ``wordpiece_tokenize``, factored out so the SQL front end can
    register it as a joinable view (engine_wordpiece_encode). Arrow-
    batched pandas UDF with the prefix-stripped token sets broadcast."""
    from pyspark.sql import types as T

    init_bodies = frozenset(
        t for t in vocab_tokens if not t.startswith("##")
    )
    cont_bodies = frozenset(
        t[2:] for t in vocab_tokens if t.startswith("##")
    )
    spark = words_df.sparkSession
    bc = spark.sparkContext.broadcast((init_bodies, cont_bodies))

    @F.pandas_udf(T.StringType())
    def _encode(col):
        sets = bc.value
        return col.map(
            lambda w: " ".join(wordpiece_encode_word(w, sets, unk))
        )

    return words_df.withColumn("toks", _encode(F.col(word_col)))


def wordpiece_tokenize(
    df: DataFrame,
    vocab_tokens,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    unk: str = WORDPIECE_UNK,
) -> DataFrame:
    """Tokenize a corpus with a trained WordPiece vocabulary: greedy
    longest-match per word, per-document ``(id, n_words, n_tokens,
    tokens)`` with the space-joined token stream in word order.

    Scale shape (the per-DISTINCT-word rule, shared with
    bpe_tokenize): longest-match runs once per vocabulary entry via
    an Arrow-batched pandas UDF with the token set broadcast, then
    one join maps positions back -- encode work is bounded by
    distinct words x word length however large the corpus."""
    pos = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(normalized_text(F.col(text_col)), " ")
        ).alias("_pos", "word"),
    )
    vocab = wordpiece_encode_words(
        pos.select("word").distinct(), vocab_tokens, unk=unk
    )
    joined = pos.join(vocab, "word")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_pos"), F.col("toks")))
                    ),
                    lambda s: s.getField("toks"),
                ),
                " ",
            ).alias("tokens"),
        )
        .withColumn(
            "n_tokens",
            F.size(F.split(F.col("tokens"), " ")).cast("long"),
        )
        .select(id_col, "n_words", "n_tokens", "tokens")
    )


# ---------------------------------------------------------------------------
# Unigram LM (r12, the third tokenizer family): SentencePiece-style
# (Kudo 2018, "Subword Regularization"). Two halves with the repo's
# standard gate split:
# - train_unigram: the REAL EM trainer (driver-side on collected word
#   counts, the production-trainer shape) -- float forward/backward,
#   so it is pytest-PROPERTY-gated (corpus log-likelihood must be
#   non-decreasing across EM steps; probs normalize; the character
#   alphabet is never pruned), not SQL-hashed.
# - viterbi_segment: the decode machinery under an INTEGER score
#   model (piece score = corpus substring count), where the optimal
#   segmentation VALUE is closed-form and the DuckDB mirror is a
#   carried-window recursive DP -- the hash-gated sibling that pins
#   the lattice/DP code path exactly (the knn_ivf_pruned /
#   ann_recall_ivf pattern applied to tokenizers).
# ---------------------------------------------------------------------------

UNIGRAM_MAX_PIECE_LEN = 4
# combined DP key = total_score * _SEG_KEY_BASE - n_pieces: maximizing
# it is lexicographic (score DESC, n_pieces ASC); the base just has to
# exceed any word's piece count.
_SEG_KEY_BASE = 1000


def substring_piece_counts(
    df: DataFrame,
    *,
    text_col: str = "text",
    max_len: int = UNIGRAM_MAX_PIECE_LEN,
    min_count: int = 2,
) -> DataFrame:
    """(piece, cnt): corpus-weighted counts of every word substring up
    to ``max_len`` chars -- the unigram seed lattice (and the pinned
    integer score model of the Viterbi gate). Single-character pieces
    are ALWAYS kept (the alphabet guarantees segmentability).
    Enumeration runs on the VOCABULARY table: distinct words x word
    length x max_len, never corpus-sized."""
    counts = _word_counts(df, text_col)
    pieces = counts.select(
        "n",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.length("word")),
                    lambda i: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.least(
                                F.lit(max_len),
                                F.length("word") - i + 1,
                            ),
                        ),
                        lambda ln: F.col("word").substr(i, ln),
                    ),
                )
            )
        ).alias("piece"),
    )
    agg = pieces.groupBy("piece").agg(
        F.sum("n").cast("long").alias("cnt")
    )
    return agg.filter(
        (F.col("cnt") >= min_count) | (F.length("piece") == 1)
    )


def unigram_piece_score(cnt: int, total_bits: int) -> int:
    """The pinned integer score of the Viterbi GATE: the bit-length
    log2 surrogate of the unigram log-prob, bit_length(cnt) -
    bit_length(total piece mass). Strictly negative (cnt < total), so
    every extra piece COSTS -- the DP genuinely balances piece count
    against piece frequency exactly like sum-of-log-probs Viterbi
    (score = raw cnt degenerates to per-char splits because character
    counts dominate additively). bit_length is the proven engine-
    shared integer log (Spark length(bin(x)) == DuckDB
    length(format('{:b}', x)))."""
    return int(cnt).bit_length() - int(total_bits)


def viterbi_segment_words(
    words_df: DataFrame,
    piece_scores: dict,
    *,
    word_col: str = "word",
    max_len: int = UNIGRAM_MAX_PIECE_LEN,
) -> DataFrame:
    """Optimal-segmentation DP per word under an integer score model:
    maximize (sum of piece scores, then fewest pieces) -- the Viterbi
    decode of a unigram tokenizer with the float log-probs replaced by
    pinned integers so the optimum VALUE is engine-exact. Returns the
    input plus ``seg_key`` (= best_score * 1000 - n_pieces, the
    combined lexicographic key), ``seg_score`` and ``n_pieces``.

    Arrow-batched pandas UDF over DISTINCT words with the score table
    broadcast; per-word cost O(len * max_len)."""
    from pyspark.sql import types as T

    spark = words_df.sparkSession
    bc = spark.sparkContext.broadcast(dict(piece_scores))

    @F.pandas_udf(T.LongType())
    def _vit(col):
        scores = bc.value

        def solve(w: str) -> int:
            neg = float("-inf")
            best = [neg] * (len(w) + 1)
            best[0] = 0
            for p in range(1, len(w) + 1):
                for ln in range(1, min(max_len, p) + 1):
                    piece = w[p - ln:p]
                    sc = scores.get(piece)
                    if sc is None or best[p - ln] == neg:
                        continue
                    cand = best[p - ln] + sc * _SEG_KEY_BASE - 1
                    if cand > best[p]:
                        best[p] = cand
            return int(best[len(w)]) if best[len(w)] != neg else -1

        return col.map(solve)

    out = words_df.withColumn("seg_key", _vit(F.col(word_col)))
    # key = S*B - P with S >= 1, 1 <= P < B  =>  S = floor((key+B-1)/B)
    # (floor() on both engines -- the bucket-division parity rule;
    # % would need sign gymnastics on a negative dividend)
    b = _SEG_KEY_BASE
    s_expr = F.floor(
        (F.col("seg_key") + F.lit(b - 1)) / F.lit(b)
    ).cast("long")
    return (
        out.withColumn("seg_score", s_expr)
        .withColumn(
            "n_pieces",
            (F.col("seg_score") * F.lit(b) - F.col("seg_key"))
            .cast("long"),
        )
    )


def _unigram_forward_backward(word: str, n: int, probs: dict,
                              max_len: int, expected: dict,
                              accumulate=None) -> float:
    """One word's E-step: marginalize over every segmentation
    (forward/backward over the piece lattice), accumulate expected
    piece counts weighted by the word's corpus frequency. Returns the
    word's contribution n * log Z to the corpus log-likelihood.

    ``accumulate(expected, piece, contrib)`` hooks the per-OCCURRENCE
    accumulation (default: float +=). The quantized-EM hash gate
    (train_unigram_em_quantized) passes an integer-floor accumulator
    through the SAME lattice code path, so the oracle pins this
    forward/backward exactly."""
    import math

    L = len(word)
    alpha = [0.0] * (L + 1)
    alpha[0] = 1.0
    for p in range(1, L + 1):
        for ln in range(1, min(max_len, p) + 1):
            pr = probs.get(word[p - ln:p])
            if pr:
                alpha[p] += alpha[p - ln] * pr
    z = alpha[L]
    if z <= 0.0:
        return 0.0  # unsegmentable (cannot happen with the alphabet kept)
    beta = [0.0] * (L + 1)
    beta[L] = 1.0
    for p in range(L - 1, -1, -1):
        for ln in range(1, min(max_len, L - p) + 1):
            pr = probs.get(word[p:p + ln])
            if pr:
                beta[p] += pr * beta[p + ln]
    if accumulate is None:
        def accumulate(acc, piece, contrib):
            acc[piece] = acc.get(piece, 0.0) + contrib
    for p in range(L):
        for ln in range(1, min(max_len, L - p) + 1):
            piece = word[p:p + ln]
            pr = probs.get(piece)
            if pr:
                accumulate(
                    expected, piece,
                    n * alpha[p] * pr * beta[p + ln] / z,
                )
    return n * math.log(z)


def train_unigram(
    df: DataFrame | None,
    *,
    text_col: str = "text",
    vocab_size: int = 64,
    max_piece_len: int = UNIGRAM_MAX_PIECE_LEN,
    min_count: int = 2,
    em_iters: int = 2,
    shrink: float = 0.25,
    counts: DataFrame | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """SentencePiece-style unigram LM trainer (Kudo 2018): seed the
    piece lattice with frequent substrings, alternate EM over the
    full segmentation marginal with expected-count pruning until
    ``vocab_size`` pieces remain (the character alphabet is never
    pruned -- segmentability invariant). Driver-side on the collected
    word counts, the production-trainer shape (Spark does the
    corpus -> (word, n) shuffle; the Zipf-small vocabulary trains in
    memory). Float EM -> property-gated in pytest (corpus
    log-likelihood non-decreasing per EM step at a fixed piece set;
    probs normalize; alphabet retained), not SQL-hashed; the DECODE
    machinery is hash-gated separately (viterbi_segment_words with
    pinned integer scores, the unigram_viterbi archive row).

    Returns (piece, prob) ordered by prob desc, piece asc. ``stats``
    receives {"ll_trace": [per-EM-step corpus log-likelihoods]}."""
    base = counts if counts is not None else _word_counts(df, text_col)
    spark = (df if df is not None else base).sparkSession
    rows = [(r[0], int(r[1])) for r in base.select("word", "n").collect()]

    from collections import Counter

    seed: Counter = Counter()
    for word, n in rows:
        for i in range(len(word)):
            for ln in range(1, min(max_piece_len, len(word) - i) + 1):
                seed[word[i:i + ln]] += n
    alphabet = {p for p in seed if len(p) == 1}
    pieces = {
        p: c for p, c in seed.items() if c >= min_count or len(p) == 1
    }
    total = float(sum(pieces.values()))
    probs = {p: c / total for p, c in pieces.items()}
    ll_trace: list = []

    while True:
        for _ in range(max(1, em_iters)):
            expected: dict = {}
            ll = 0.0
            for word, n in rows:
                ll += _unigram_forward_backward(
                    word, n, probs, max_piece_len, expected
                )
            ll_trace.append(ll)
            tot = sum(expected.values())
            # The M-step is PURE (p = E/sum E): EM's monotone-
            # likelihood guarantee requires it (a per-iteration
            # alphabet floor was a 4x LL drop in development, and even
            # late-convergence floors cost nats: characters fully
            # absorbed into longer pieces legitimately converge to
            # prob 0). Segmentability is restored ONCE at output time
            # below, SentencePiece's required-chars semantics.
            probs = {
                p: c / tot for p, c in expected.items() if c > 0.0
            }
        # count the required characters that output-time restoration
        # will re-add, so the final vocabulary honors vocab_size
        if len(set(probs) | alphabet) <= vocab_size:
            break
        # prune: keep the alphabet + the highest-probability pieces
        keep = max(
            vocab_size, int(round(len(probs) * (1.0 - shrink)))
        )
        ranked = sorted(
            ((p, pr) for p, pr in probs.items() if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )
        kept = dict(ranked[: max(0, keep - len(alphabet))])
        for a in alphabet:
            kept[a] = probs.get(a, 0.0)
        s = sum(kept.values())
        probs = {p: pr / s for p, pr in kept.items()}

    # required-chars restoration (once, at output): characters whose
    # probability converged to 0 under EM (fully absorbed by longer
    # pieces) come back with a floor so ANY string stays segmentable
    # at decode time -- outside the EM trace, so the monotone-LL
    # property gate sees only pure steps.
    missing = [a for a in alphabet if a not in probs]
    if missing:
        floor = min(probs.values()) * 0.01 if probs else 1.0
        for a in missing:
            probs[a] = floor
        z = sum(probs.values())
        probs = {p: v / z for p, v in probs.items()}

    if stats is not None:
        stats["ll_trace"] = ll_trace
    out = sorted(probs.items(), key=lambda kv: (-kv[1], kv[0]))
    return spark.createDataFrame(out, "piece string, prob double")


UNIGRAM_EM_SCALE = 1 << 33


def train_unigram_em_quantized(
    df: DataFrame | None,
    *,
    text_col: str = "text",
    max_piece_len: int = UNIGRAM_MAX_PIECE_LEN,
    min_count: int = 2,
    em_iters: int = 2,
    scale: int = UNIGRAM_EM_SCALE,
    counts: DataFrame | None = None,
) -> DataFrame:
    """The unigram EM trainer's HASH GATE (VERDICT r12 #3): the same
    seed lattice and the same ``_unigram_forward_backward`` code path
    as ``train_unigram``, with the per-OCCURRENCE expected-count
    contribution quantized to integer micro-units
    (floor(contrib * scale)) before accumulation. That one hook makes
    the whole EM chain engine-exact:

    - integer per-piece sums are association-free, so the oracle's
      GROUP BY matches bit-for-bit however DuckDB orders the rows;
    - every FLOAT in the chain (alpha, beta, z, probabilities, the
      contribution product) is a fixed-association expression --
      alpha[p] folds its <= max_piece_len terms in ascending length
      order (skipped terms add exact 0.0, so a 4-term COALESCE chain
      in SQL is bit-identical), the contribution is the left-
      associated n * alpha * pr * beta / z * scale, and the M-step
      divides float(eq)/float(total) (both operands rounded to double
      BEFORE the divide -- the engine rounding order, per the r12
      wordpiece-driver lesson);
    - so the DuckDB mirror (chained per-iteration recursive
      forward/backward CTEs, the wordpiece-recursion JOIN rule)
      reproduces every floor input exactly and the floor can never
      disagree.

    The production trainer stays ``train_unigram`` (pure float M-step
    -- per-iteration quantization breaks EM's monotone-likelihood
    guarantee, see its docstring); this is the pinned-configuration
    sibling in the ann_recall_* tradition: same machinery, closed
    form. Returns (piece, expected_q) -- the FINAL iteration's integer
    expected counts."""
    base = counts if counts is not None else _word_counts(df, text_col)
    spark = (df if df is not None else base).sparkSession
    rows = [(r[0], int(r[1])) for r in base.select("word", "n").collect()]

    from collections import Counter
    from math import floor

    seed: Counter = Counter()
    for word, n in rows:
        for i in range(len(word)):
            for ln in range(
                1, min(max_piece_len, len(word) - i) + 1
            ):
                seed[word[i:i + ln]] += n
    pieces = {
        p: c for p, c in seed.items() if c >= min_count or len(p) == 1
    }
    total = float(sum(pieces.values()))
    probs = {p: float(c) / total for p, c in pieces.items()}

    def _quantize(acc: dict, piece: str, contrib: float) -> None:
        acc[piece] = acc.get(piece, 0) + floor(contrib * scale)

    eq: dict = {}
    for _ in range(max(1, em_iters)):
        eq = {}
        for word, n in rows:
            _unigram_forward_backward(
                word, n, probs, max_piece_len, eq,
                accumulate=_quantize,
            )
        tot = float(sum(eq.values()))
        probs = {
            p: float(c) / tot for p, c in eq.items() if c > 0
        }

    import pandas as pd

    out = sorted(eq.items())
    return spark.createDataFrame(
        pd.DataFrame(
            {"piece": [p for p, _ in out],
             "expected_q": [int(c) for _, c in out]}
        ),
        "piece string, expected_q long",
    )


def unigram_tokenize_word(word: str, log_probs: dict,
                          max_len: int = UNIGRAM_MAX_PIECE_LEN) -> list:
    """Viterbi decode of one word under trained unigram log-probs
    (ties broken toward fewer pieces, then the DP's left-scan order);
    the float-scored production decode -- the integer-scored twin
    (viterbi_segment_words) carries the SQL hash gate."""
    L = len(word)
    neg = float("-inf")
    best = [neg] * (L + 1)
    back = [None] * (L + 1)
    best[0] = 0.0
    for p in range(1, L + 1):
        for ln in range(1, min(max_len, p) + 1):
            lp = log_probs.get(word[p - ln:p])
            if lp is None or best[p - ln] == neg:
                continue
            cand = best[p - ln] + lp
            if cand > best[p]:
                best[p] = cand
                back[p] = ln
    if best[L] == neg:
        return [word]  # unsegmentable -> pass through whole
    out = []
    p = L
    while p > 0:
        ln = back[p]
        out.append(word[p - ln:p])
        p -= ln
    return out[::-1]
