"""weighted_sample (dataset mixing) and pack_sequences properties."""

from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.operators.pack import (
    pack_sequences,
    packing_efficiency,
)
from rag_vertex_ai_vector_search_spark.operators.splits import weighted_sample
from rag_vertex_ai_vector_search_spark.sources import load_table


def test_weighted_sample_rates_and_nesting(spark, sf_correct):
    docs = load_table(spark, sf_correct, "documents")
    n_en = docs.filter(F.col("lang") == "en").count()

    full = weighted_sample(docs, {"en": 1.0})
    assert full.count() == n_en  # rate 1.0 keeps everything, others drop

    half = weighted_sample(docs, {"en": 0.5})
    quarter = weighted_sample(docs, {"en": 0.25})
    assert 0.35 * n_en < half.count() < 0.65 * n_en
    # NESTING: the 25% sample is a strict subset of the 50% sample.
    half_ids = {r.doc_id for r in half.select("doc_id").collect()}
    quarter_ids = {r.doc_id for r in quarter.select("doc_id").collect()}
    assert quarter_ids <= half_ids

    # determinism across invocations
    again = {r.doc_id for r in weighted_sample(docs, {"en": 0.5})
             .select("doc_id").collect()}
    assert again == half_ids

    # different salt re-rolls membership
    other = {r.doc_id for r in
             weighted_sample(docs, {"en": 0.5}, salt="mix2")
             .select("doc_id").collect()}
    assert other != half_ids


def test_pack_sequences_offsets_are_consistent(spark):
    rows = [(i, "g", 100 + (i % 7) * 30) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, n_tokens long")
    packed = pack_sequences(
        df, token_col="n_tokens", budget=512, group_col="grp"
    ).orderBy("doc_id").collect()

    # Replay the packing sequentially and compare every assignment.
    start = 0
    for r in packed:
        assert r.seq_id == start // 512
        assert r.seq_offset == start % 512
        start += r.n_tokens

    # efficiency: fill fraction in (0, 1]
    eff = packing_efficiency(
        pack_sequences(df, token_col="n_tokens", budget=512, group_col="grp"),
        token_col="n_tokens", budget=512,
    ).collect()[0]
    assert 0.0 < eff.fill_fraction <= 1.0


def test_pack_sequences_groups_are_independent(spark):
    rows = [(i, "a" if i % 2 == 0 else "b", 200) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, n_tokens long")
    packed = pack_sequences(
        df, token_col="n_tokens", budget=512, group_col="grp"
    )
    # each group packs from offset 0 independently
    firsts = (
        packed.groupBy("pack_group")
        .agg(F.min("seq_id").alias("s"), F.min("seq_offset").alias("o"))
        .collect()
    )
    assert all(r.s == 0 and r.o == 0 for r in firsts)


def test_pack_sequences_hash_sharding_no_group(spark):
    """With no natural group, hash shards bound each window partition;
    every row still gets a valid deterministic assignment."""
    rows = [(i, 300) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    p1 = pack_sequences(df, token_col="n_tokens", budget=1024, n_shards=8)
    p2 = pack_sequences(df, token_col="n_tokens", budget=1024, n_shards=8)
    assert sorted(map(tuple, p1.collect())) == sorted(map(tuple, p2.collect()))
    assert p1.select("pack_group").distinct().count() <= 8
    assert p1.filter(F.col("seq_offset") >= 1024).count() == 0
    assert p1.count() == 200


def test_concat_sequences_order_and_content(spark):
    from rag_vertex_ai_vector_search_spark.operators.pack import (
        concat_sequences,
        pack_sequences,
    )

    rows = [(i, "g", f"doc{i}", 300) for i in range(6)]
    df = spark.createDataFrame(
        rows, "doc_id long, grp string, text string, n_tokens long"
    )
    packed = pack_sequences(df, token_col="n_tokens", budget=512, group_col="grp")
    seqs = {r.seq_id: r for r in concat_sequences(packed).collect()}
    # 300-token docs, 512 budget: starts at 0,300,600,... -> seq 0 holds
    # docs 0-1 (starts 0,300), seq 1 docs 2-3 (600,900), seq 2 docs 4-5.
    assert seqs[0].seq_text == "doc0\n\ndoc1"
    assert seqs[1].seq_text == "doc2\n\ndoc3"
    assert seqs[2].seq_text == "doc4\n\ndoc5"
    assert all(r.n_docs == 2 for r in seqs.values())


def test_weighted_upsample_copy_counts(spark, sf_correct):
    from rag_vertex_ai_vector_search_spark.operators.splits import (
        weighted_sample,
        weighted_upsample,
    )

    docs = load_table(spark, sf_correct, "documents")
    n_en = docs.filter(F.col("lang") == "en").count()

    up = weighted_upsample(docs, {"en": 2.5}).filter(F.col("lang") == "en")
    total = up.count()
    # every doc twice + ~50% a third time
    assert 2.3 * n_en < total < 2.7 * n_en
    per_doc = up.groupBy("doc_id").count()
    assert per_doc.filter((F.col("count") < 2) | (F.col("count") > 3)).count() == 0

    # integer rate: exactly n copies, copy_id 1..n
    two = weighted_upsample(docs, {"en": 2.0}).filter(F.col("lang") == "en")
    assert two.count() == 2 * n_en
    assert two.groupBy("doc_id").count().filter(F.col("count") != 2).count() == 0

    # sub-1.0 rate == weighted_sample membership (same hash threshold)
    down = weighted_upsample(docs, {"en": 0.5}).filter(F.col("lang") == "en")
    samp = weighted_sample(docs, {"en": 0.5})
    assert ({r.doc_id for r in down.select("doc_id").collect()}
            == {r.doc_id for r in samp.select("doc_id").collect()})

    # determinism
    again = weighted_upsample(docs, {"en": 2.5}).filter(F.col("lang") == "en")
    assert sorted(map(tuple, again.select("doc_id", "copy_id").collect())) == \
           sorted(map(tuple, up.select("doc_id", "copy_id").collect()))


def test_packing_efficiency_spill_never_exceeds_one(spark):
    """Round-3 bug: a last doc spilling past its start sequence made
    fill_fraction > 1.0 (slots counted by max(seq_id)+1, not consumed
    tokens). Two docs of 400 tokens at budget 512: doc 2 STARTS in
    seq 0 (offset 400) but consumes through seq 1 -> 2 slots, fill
    800/1024."""
    df = spark.createDataFrame(
        [(0, "g", 400), (1, "g", 400)],
        "doc_id long, grp string, n_tokens long",
    )
    packed = pack_sequences(df, token_col="n_tokens", budget=512, group_col="grp")
    eff = packing_efficiency(packed, token_col="n_tokens", budget=512).collect()[0]
    assert eff.n_seqs == 2
    assert abs(eff.fill_fraction - 800 / 1024) < 1e-12
    assert eff.fill_fraction <= 1.0


def test_cap_per_group_deterministic_capped_and_growth_stable(spark, sf_smoke):
    """Per-domain cap: deterministic across runs, never more than the
    cap per group, and stable under growth (new rows insert uniformly
    into the hash order, so the kept set churns proportionally instead
    of shifting wholesale)."""
    from pyspark.sql import functions as F

    from rag_vertex_ai_vector_search_spark.operators.splits import (
        cap_per_group,
    )
    from rag_vertex_ai_vector_search_spark.sources import load_table

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "source")
    a = {(r.doc_id, r.source) for r in cap_per_group(
        docs, max_per_group=10).collect()}
    b = {(r.doc_id, r.source) for r in cap_per_group(
        docs, max_per_group=10).collect()}
    assert a == b

    import collections

    per = collections.Counter(s for _, s in a)
    n_groups = docs.select("source").distinct().count()
    assert len(per) == n_groups
    assert max(per.values()) <= 10
    # groups with >= 10 docs are capped exactly
    sizes = {r.source: r["count"] for r in
             docs.groupBy("source").count().collect()}
    for src, n in sizes.items():
        assert per[src] == min(10, n)

    # growth: add 5 synthetic docs per source; most of the kept set
    # survives (expected churn ~ cap * new/(old+new))
    extra = docs.select("source").distinct().withColumn(
        "doc_id", F.xxhash64("source") + 1_000_000
    ).select("doc_id", "source")
    grown = docs.unionByName(extra)
    c = {(r.doc_id, r.source) for r in cap_per_group(
        grown, max_per_group=10).collect()}
    assert len(a & c) >= int(0.7 * len(a))

    # different salt -> different (but still capped) selection
    d = {(r.doc_id, r.source) for r in cap_per_group(
        docs, max_per_group=10, salt="other").collect()}
    assert d != a
