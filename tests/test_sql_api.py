"""SQL front end: engine functions from spark.sql match the DataFrame
builders exactly."""

import pytest
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.sql_api import register_sql_api
from rag_vertex_ai_vector_search_spark.functions import (
    doc_fingerprint,
    language_id,
    quality_score,
    token_count,
)
from rag_vertex_ai_vector_search_spark.functions.vector import dot_product
from rag_vertex_ai_vector_search_spark.sources import load_table


def test_sql_functions_match_dataframe_builders(spark, sf_smoke):
    register_sql_api(spark, sf_smoke)
    via_sql = {
        r.doc_id: (r.tc, r.q, r.lid, r.fp)
        for r in spark.sql("""
            SELECT doc_id, engine_token_count(text) AS tc,
                   engine_quality(text) AS q,
                   engine_lang_id(text) AS lid,
                   engine_fingerprint(text) AS fp
            FROM documents
        """).collect()
    }
    via_df = {
        r.doc_id: (r.tc, r.q, r.lid, r.fp)
        for r in load_table(spark, sf_smoke, "documents").select(
            "doc_id",
            token_count("text").alias("tc"),
            quality_score("text").alias("q"),
            language_id("text").alias("lid"),
            doc_fingerprint("text").alias("fp"),
        ).collect()
    }
    assert via_sql == via_df


def test_sql_knn_end_to_end(spark, sf_smoke):
    register_sql_api(spark, sf_smoke)
    rows = spark.sql("""
        WITH q AS (
          SELECT vec_id AS query_id, CAST(embedding AS ARRAY<DOUBLE>) AS qv
          FROM embeddings WHERE vec_id < 3
        ), scored AS (
          SELECT q.query_id, e.vec_id AS neighbor_id,
                 engine_dot(q.qv, CAST(e.embedding AS ARRAY<DOUBLE>)) AS score
          FROM q CROSS JOIN embeddings e
        ), ranked AS (
          SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
          FROM scored
        )
        SELECT * FROM ranked WHERE rank <= 5
    """).collect()
    assert len(rows) == 15
    assert all(r.neighbor_id == r.query_id for r in rows if r.rank == 1)


def test_sql_embed_udf(spark, sf_smoke):
    register_sql_api(spark, sf_smoke, dim=16)
    row = spark.sql("SELECT engine_embed('hello') AS v").first()
    assert len(row.v) == 16
    from rag_vertex_ai_vector_search_spark.functions import hash_embedding_numpy
    import numpy as np

    assert np.array_equal(
        np.asarray(row.v, dtype="float32"), hash_embedding_numpy("hello", 16)
    )


def test_sql_hash_bucket_matches_split_assignment(spark, sf_smoke):
    """engine_hash_bucket == operators/splits.py bucketing, so a SQL
    user can reproduce split/sample membership exactly."""
    from rag_vertex_ai_vector_search_spark.sql_api import register_sql_api
    from rag_vertex_ai_vector_search_spark.operators.splits import assign_splits
    from rag_vertex_ai_vector_search_spark.sources import load_table

    register_sql_api(spark, sf_smoke)
    sql_rows = {
        r.doc_id: r.b
        for r in spark.sql(
            "SELECT doc_id, engine_hash_bucket(CAST(doc_id AS STRING), 'v1', 10000) AS b"
            " FROM documents"
        ).collect()
    }
    df_rows = {
        r.doc_id: r.split_bucket
        for r in assign_splits(
            load_table(spark, sf_smoke, "documents"), salt="v1"
        ).select("doc_id", "split_bucket").collect()
    }
    assert sql_rows == df_rows


def test_sql_ewma_matches_operator(spark, sf_smoke):
    """engine_ewma over the sort_array'd per-key series == the ewma
    operator, bit-for-bit (same fold, same alpha operation order)."""
    from rag_vertex_ai_vector_search_spark.operators.timeseries import ewma

    register_sql_api(spark, sf_smoke)
    via_sql = {
        (r.user_id, r.ts, r.event_id): r.ewma
        for r in spark.sql("""
            WITH packed AS (
              SELECT user_id,
                     sort_array(collect_list(
                       struct(ts AS _ts, event_id AS _tie,
                              CAST(value AS DOUBLE) AS _v))) AS series
              FROM events GROUP BY user_id
            ), folded AS (
              SELECT user_id, series,
                     engine_ewma(transform(series, s -> s._v), 1, 4) AS ew
              FROM packed
            )
            SELECT user_id, s._ts AS ts, s._tie AS event_id, ew[i] AS ewma
            FROM folded
            LATERAL VIEW posexplode(series) AS i, s
        """).collect()
    }
    ev = load_table(spark, sf_smoke, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    via_df = {
        (r.user_id, r.ts, r.event_id): r.ewma
        for r in ewma(
            ev, key_cols=("user_id",), ts_col="ts", value_col="value",
            alpha_num=1, alpha_den=4, tie_col="event_id",
        ).collect()
    }
    assert via_sql == via_df


@pytest.mark.full
def test_sql_bloom_matches_operator(spark, sf_smoke):
    """Bloom build + probe composed from engine_bloom_* in pure SQL ==
    bloom_sketch / bloom_contains (same words, bits, verdicts)."""
    from rag_vertex_ai_vector_search_spark.operators.sketch import (
        bloom_contains,
        bloom_sketch,
    )

    register_sql_api(spark, sf_smoke)
    n_bits, k = 1 << 16, 3
    words_sql = {
        (r.word, r.bits)
        for r in spark.sql(f"""
            WITH toks AS (
              SELECT explode(split(trim(regexp_replace(lower(text),
                       '\\\\s+', ' ')), ' ')) AS w
              FROM documents
            ), posarr AS (
              -- SQL UDFs cannot sit inside a Generate: materialize the
              -- array column first, then explode it
              SELECT engine_bloom_positions(w, {n_bits}, {k}) AS ps
              FROM toks
            ), pos AS (
              SELECT explode(ps) AS p FROM posarr
            )
            SELECT engine_bloom_word(p) AS word,
                   CAST(bit_or(engine_bloom_mask(p)) AS BIGINT) AS bits
            FROM pos GROUP BY engine_bloom_word(p)
        """).collect()
    }
    from rag_vertex_ai_vector_search_spark.functions.text import (
        normalized_text,
    )

    docs = load_table(spark, sf_smoke, "documents")
    toks = docs.select(
        F.explode(F.split(normalized_text(F.col("text")), " ")).alias("w")
    )
    sketch = bloom_sketch(toks, "w", n_bits=n_bits, k=k)
    words_df = {(r.word, r.bits) for r in sketch.collect()}
    assert words_sql == words_df

    # probe: planted present + absent items
    items = spark.createDataFrame(
        [("the",), ("zzz-not-a-word",)], "item string"
    )
    items.createOrReplaceTempView("_probe_items")
    sketch.createOrReplaceTempView("_bloom_words")
    probe_sql = {
        (r.item, r.might_contain)
        for r in spark.sql(f"""
            WITH posarr AS (
              SELECT item,
                     engine_bloom_positions(item, {n_bits}, {k}) AS ps
              FROM _probe_items
            ), pos AS (
              SELECT item, explode(ps) AS p FROM posarr
            ), probed AS (
              SELECT pos.item,
                     coalesce(w.bits, 0L) & engine_bloom_mask(pos.p) AS hit
              FROM pos LEFT JOIN _bloom_words w
                ON w.word = engine_bloom_word(pos.p)
            )
            SELECT item,
                   CAST(min(CAST(hit != 0 AS INT)) AS BOOLEAN)
                     AS might_contain
            FROM probed GROUP BY item
        """).collect()
    }
    probe_df = {
        (r.item, r.might_contain)
        for r in bloom_contains(
            sketch, items, n_bits=n_bits, k=k
        ).collect()
    }
    assert probe_sql == probe_df
    assert ("zzz-not-a-word", False) in probe_df


@pytest.mark.full
def test_sql_histogram_quantiles_match_operator(spark, sf_smoke):
    """engine_hist_bin + a plain-SQL cumulative window == the
    histogram_sketch/histogram_quantiles pipeline (declared
    price_histogram_quantiles config)."""
    from rag_vertex_ai_vector_search_spark.operators.sketch import (
        histogram_quantiles,
        histogram_sketch,
    )

    register_sql_api(spark, sf_smoke)
    lo, hi, nb = 0, 12_000_000, 256
    via_sql = {
        (r.l_returnflag, r.q_num, r.q_den): (r.n_rows, r.q_bin, r.q_value)
        for r in spark.sql(f"""
            WITH cents AS (
              SELECT l_returnflag,
                     CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS c
              FROM lineitem
            ), hist AS (
              SELECT l_returnflag,
                     engine_hist_bin(c, {lo}, {hi}, {nb}) AS bin,
                     CAST(count(1) AS BIGINT) AS cnt
              FROM cents GROUP BY l_returnflag, engine_hist_bin(c, {lo}, {hi}, {nb})
            ), cum AS (
              SELECT l_returnflag, bin, cnt,
                     sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin)
                       AS cm,
                     sum(cnt) OVER (PARTITION BY l_returnflag) AS total
              FROM hist
            ), qs AS (
              SELECT explode(array(
                struct(1 AS q_num, 2 AS q_den),
                struct(9 AS q_num, 10 AS q_den),
                struct(99 AS q_num, 100 AS q_den))) AS q
            )
            SELECT l_returnflag, q.q_num, q.q_den,
                   CAST(max(total) AS BIGINT) AS n_rows,
                   CAST(min(bin) AS INT) AS q_bin,
                   CAST({lo} + (CAST(min(bin) AS BIGINT) * {hi - lo})
                        div {nb} AS BIGINT) AS q_value
            FROM cum CROSS JOIN qs
            WHERE cm * q.q_den >= total * q.q_num
            GROUP BY l_returnflag, q.q_num, q.q_den
        """).collect()
    }
    li = load_table(spark, sf_smoke, "lineitem")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
        "long"
    )
    hist = histogram_sketch(
        li.select("l_returnflag", cents.alias("cents")), "cents",
        group_cols=("l_returnflag",), lo=lo, hi=hi, n_bins=nb,
    )
    via_df = {
        (r.l_returnflag, r.q_num, r.q_den): (r.n_rows, r.q_bin, r.q_value)
        for r in histogram_quantiles(
            hist, group_cols=("l_returnflag",), lo=lo, hi=hi, n_bins=nb,
            quantiles=((1, 2), (9, 10), (99, 100)),
        ).collect()
    }
    assert via_sql == via_df


@pytest.mark.full
def test_sql_phrase_count_matches_operator(spark, sf_smoke):
    """engine_phrase_count per doc == phrase_occurrences counts for
    the same phrases (docs with zero occurrences absent there)."""
    from rag_vertex_ai_vector_search_spark.operators.ranking import (
        phrase_occurrences,
    )

    register_sql_api(spark, sf_smoke)
    phrases = ["order fast", "stream column", "zz-never-present"]
    docs = load_table(spark, sf_smoke, "documents")
    via_df = {
        (r.phrase, r.doc_id): r.n_occurrences
        for r in phrase_occurrences(docs, phrases).collect()
    }
    in_list = ", ".join(f"'{p}'" for p in phrases)
    via_sql = {
        (r.phrase, r.doc_id): r.n
        for r in spark.sql(f"""
            SELECT p.phrase, d.doc_id,
                   engine_phrase_count(d.text, p.phrase) AS n
            FROM documents d
            CROSS JOIN (SELECT explode(array({in_list})) AS phrase) p
            WHERE engine_phrase_count(d.text, p.phrase) > 0
        """).collect()
    }
    assert via_sql == via_df
    assert via_df  # non-vacuous: some phrase occurs in the fixture


@pytest.mark.full
def test_sql_kn_surprisal_view_matches_operator(spark, sf_smoke):
    """SELECT * FROM engine_kn_surprisal == the KN DataFrame builder."""
    from rag_vertex_ai_vector_search_spark.operators.lm_quality import (
        kneser_ney_bigram_surprisal,
    )

    register_sql_api(spark, sf_smoke)
    via_sql = sorted(
        tuple(r) for r in spark.sql(
            "SELECT * FROM engine_kn_surprisal"
        ).collect()
    )
    via_df = sorted(
        tuple(r)
        for r in kneser_ney_bigram_surprisal(
            load_table(spark, sf_smoke, "documents")
        ).collect()
    )
    assert via_sql == via_df


def test_sql_html_url_functions_match_builders(spark):
    """engine_html_text / engine_link_density / engine_url_domain /
    engine_url_normalize from spark.sql are bit-identical to the
    DataFrame builders they mirror."""
    from pyspark.sql import functions as F

    from rag_vertex_ai_vector_search_spark.functions.html import (
        html_to_text, link_density,
    )
    from rag_vertex_ai_vector_search_spark.functions.url import (
        normalize_url, url_domain,
    )
    from rag_vertex_ai_vector_search_spark.sql_api import register_sql_api

    register_sql_api(spark)
    html = ("<html><head><title>T</title><script>var a=1;</script></head>"
            "<body><p>Some &amp; text</p><a href='/x'>Link&nbsp;here</a>"
            "</body></html>")
    url = "HTTP://User@Sub.Ex.COM:80/P?utm_source=a&q=1&gclid=g#frag"
    df = spark.createDataFrame([(html, url)], "h string, u string")
    df.createOrReplaceTempView("_pages")

    sql_row = spark.sql("""
        SELECT engine_html_text(h) AS vis,
               engine_link_density(h) AS ld,
               engine_url_domain(u) AS dom,
               engine_url_normalize(u) AS norm
        FROM _pages
    """).collect()[0]
    ref = df.select(
        html_to_text("h").alias("vis"),
        link_density("h").alias("ld"),
        url_domain("u").alias("dom"),
        normalize_url("u").alias("norm"),
    ).collect()[0]
    assert sql_row.vis == ref.vis == "T Some & text Link here"
    assert sql_row.ld == ref.ld
    assert sql_row.dom == ref.dom == "ex.com"
    assert sql_row.norm == ref.norm == "http://user@sub.ex.com/P?q=1"


@pytest.mark.full
def test_sql_probe_media_matches_operator(spark, sf_smoke):
    """engine_probe_media(binary) == extract_media_probe row for row,
    including the counted-skip status classification on planted
    defects."""
    from rag_vertex_ai_vector_search_spark.multimodal.binary_ops import (
        DECODE_CORRUPT,
        DECODE_OK,
        DECODE_UNSUPPORTED,
    )
    from rag_vertex_ai_vector_search_spark.multimodal.probe import (
        extract_media_probe,
    )
    from rag_vertex_ai_vector_search_spark.multimodal.synthesis import (
        synthesize_media_with_defects,
    )

    register_sql_api(spark)
    docs = load_table(spark, sf_smoke, "documents").select("doc_id").limit(40)
    # r15: the planted MP3/MP4 items PROBE ok now (that's the point of
    # the header probes) -- plant one genuinely foreign blob so the
    # unsupported branch stays non-vacuous
    foreign = spark.createDataFrame(
        [(999999, "application/unknown", bytearray(b"\x01no container"))],
        "doc_id long, media_type string, content binary",
    )
    media = (
        synthesize_media_with_defects(docs)
        .unionByName(foreign)
        .localCheckpoint(eager=True)
    )
    media.createOrReplaceTempView("probe_media_fixture")

    cols = (
        "doc_id", "media_type", "decode_status", "container", "width",
        "height", "channels", "bits", "sample_rate", "n_frames",
        "duration_s",
    )
    via_op = extract_media_probe(media, on_error="skip").select(*cols)
    via_sql = spark.sql(
        "SELECT doc_id, media_type, p.* FROM (SELECT doc_id, media_type, "
        "engine_probe_media(content) AS p FROM probe_media_fixture)"
    )
    assert via_sql.columns == list(cols)
    a = sorted(tuple(r) for r in via_op.collect())
    b = sorted(tuple(r) for r in via_sql.collect())
    assert a == b
    # planted defects keep every status branch non-vacuous (probe-level:
    # the bit-flipped IDAT probes ok by design -- header-only contract --
    # but the truncated WAV and the MP3 bytes classify)
    statuses = {r[2] for r in a}
    assert {DECODE_OK, DECODE_CORRUPT, DECODE_UNSUPPORTED} <= statuses


def test_engine_zorder2_matches_dataframe_key(spark, sf_smoke):
    """The SQL front end's Morton key (engine_zorder2, r12) must equal
    operators/layout.py::zorder_key bit-for-bit -- one expression
    generator (z_value_sql) feeds both."""
    from rag_vertex_ai_vector_search_spark.operators.layout import (
        zorder_key,
    )
    from rag_vertex_ai_vector_search_spark.sources import load_table

    register_sql_api(spark, sf_smoke)
    orders = load_table(spark, sf_smoke, "orders").select(
        "o_orderkey", "o_custkey",
        F.col("o_orderdate").cast("long").alias("o_epoch"),
    )
    lo_c, hi_c, lo_e, hi_e = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"),
        F.min("o_epoch"), F.max("o_epoch"),
    ).first()
    orders.createOrReplaceTempView("_zorders")
    got = sorted(
        (r.o_orderkey, r.z)
        for r in spark.sql(
            f"SELECT o_orderkey, engine_zorder2(o_custkey, o_epoch, "
            f"{lo_c}, {hi_c}, {lo_e}, {hi_e}) AS z FROM _zorders"
        ).collect()
    )
    want = sorted(
        (r.o_orderkey, r._z)
        for r in zorder_key(
            orders, ["o_custkey", "o_epoch"], bits=16,
            bounds={"o_custkey": (lo_c, hi_c), "o_epoch": (lo_e, hi_e)},
        ).collect()
    )
    assert got == want


def test_sql_tokenizer_views_match_dataframe_builders(spark, sf_smoke):
    """engine_wordpiece_encode / engine_unigram_segment (r13, VERDICT
    r12 #5): the SQL-only route to the tokenizer families must be
    bit-equal to the DataFrame builders -- same trained vocabulary,
    same pinned integer scores, joined per distinct word."""
    from rag_vertex_ai_vector_search_spark.functions.text import (
        normalized_text,
    )
    from rag_vertex_ai_vector_search_spark.operators.tokenizer import (
        substring_piece_counts,
        train_wordpiece,
        unigram_piece_score,
        viterbi_segment_words,
        wordpiece_encode_words,
        wordpiece_vocab,
    )

    register_sql_api(spark, sf_smoke)
    docs = spark.table("documents")
    words = docs.select(
        F.explode(
            F.split(normalized_text(F.col("text")), " ")
        ).alias("word")
    ).distinct()

    got_wp = sorted(
        tuple(r) for r in spark.sql(
            "SELECT word, toks FROM engine_wordpiece_encode"
        ).collect()
    )
    vocab = wordpiece_vocab(docs, train_wordpiece(docs, n_merges=8))
    want_wp = sorted(
        tuple(r)
        for r in wordpiece_encode_words(words, vocab)
        .select("word", "toks").collect()
    )
    assert got_wp == want_wp and len(got_wp) > 0

    got_us = sorted(
        tuple(r) for r in spark.sql(
            "SELECT word, seg_key, seg_score, n_pieces "
            "FROM engine_unigram_segment"
        ).collect()
    )
    rows = substring_piece_counts(docs).collect()
    tb = int(sum(r.cnt for r in rows)).bit_length()
    scores = {r.piece: unigram_piece_score(r.cnt, tb) for r in rows}
    want_us = sorted(
        tuple(r)
        for r in viterbi_segment_words(words, scores)
        .select("word", "seg_key", "seg_score", "n_pieces").collect()
    )
    assert got_us == want_us and len(got_us) > 0
    # a SQL user can actually COMPOSE with them: tokens for the
    # longest word of every document via a plain join
    joined = spark.sql(
        """
        SELECT d.doc_id, w.toks
        FROM documents d
        JOIN engine_wordpiece_encode w
          ON w.word = split(trim(regexp_replace(lower(d.text),
                     '\\\\s+', ' ')), ' ')[0]
        LIMIT 5
        """
    ).collect()
    assert len(joined) == 5


def test_sql_knn_search_view_bit_equal_to_serving(spark, sf_smoke):
    """engine_knn_search (r14, VERDICT r13 #6): a SQL-only user's
    headline query -- embedded query table -> probe-pruned PQ cascade
    -> exact rerank -> hydrated top-k -- must be BIT-EQUAL per request
    to the DataFrame serving route (ServingReplica.query_batch over
    the identical built index) and to ivf_pq_search directly."""
    from rag_vertex_ai_vector_search_spark.operators.pq import (
        ivf_pq_search,
    )
    from rag_vertex_ai_vector_search_spark.operators.serving import (
        ServingReplica,
        surrogate_key,
    )
    from rag_vertex_ai_vector_search_spark.sql_api import (
        DEFAULT_KNN_QUERY_TEXTS,
        register_knn_search_view,
    )

    register_sql_api(spark, sf_smoke)
    state = register_knn_search_view(spark)  # cached default build

    via_sql = sorted(
        tuple(r)
        for r in spark.sql("SELECT * FROM engine_knn_search").collect()
    )
    assert len(via_sql) == 10 * len(DEFAULT_KNN_QUERY_TEXTS)

    # route 1: the same cascade through ivf_pq_search + hydration
    hits = ivf_pq_search(
        state["ivf_index"], state["pq_index"],
        state["queries_df"].select("query_id", "query_vector"),
        10, probe_percent=10.0, method="broadcast",
    )
    docs = state["docs"]
    via_df = sorted(
        tuple(r) for r in hits.join(
            F.broadcast(docs), hits.neighbor_id == docs.doc_id, "left"
        ).select(
            "query_id", F.col("rank").cast("long").alias("rank"),
            "neighbor_id", "score", "lang", "source",
        ).collect()
    )
    assert via_sql == via_df

    # route 2: the warm-replica coalesced window over the same state
    rep = ServingReplica(
        spark, state["ivf_index"], state["pq_index"], docs, dim=64
    )
    batched = rep.query_batch(
        list(DEFAULT_KNN_QUERY_TEXTS), k=10, probe_percent=10.0
    )
    via_replica = sorted(
        tuple(row)
        for _qid, rows in batched
        for row in rows
    )
    assert via_sql == via_replica

    # the embedded query table is registered too, keyed like serving
    qrows = spark.sql(
        "SELECT query_id, query_text FROM engine_knn_queries"
    ).collect()
    assert {r.query_id for r in qrows} == {
        surrogate_key(q) for q, _ in DEFAULT_KNN_QUERY_TEXTS
    }


def test_sql_doremi_weights_view_matches_operator(spark, sf_smoke):
    """engine_doremi_weights (r14): the Group-DRO weight table from
    spark.sql matches the DataFrame operator row-for-row."""
    from rag_vertex_ai_vector_search_spark.operators.doremi import (
        doremi_domain_log_weights,
    )

    register_sql_api(spark, sf_smoke)
    via_sql = sorted(
        tuple(r)
        for r in spark.sql(
            "SELECT domain, n_tokens, excess_micronats, "
            "log_weight_micronats FROM engine_doremi_weights"
        ).collect()
    )
    via_df = sorted(
        tuple(r)
        for r in doremi_domain_log_weights(
            load_table(spark, sf_smoke, "documents")
        ).select(
            "domain", "n_tokens", "excess_micronats",
            "log_weight_micronats",
        ).collect()
    )
    assert via_sql == via_df
    assert len(via_sql) >= 2


def test_sql_pipeline_views_match_dataframe_builders(spark, sf_smoke):
    """engine_dedup_candidates / engine_contamination_pairs /
    engine_decontaminate (r15, VERDICT r14 #7): the SQL-only route to
    the corpus-curation half of the pipeline must be bit-equal to the
    DataFrame builders in their declared configurations."""
    from pyspark.sql import functions as F

    from rag_vertex_ai_vector_search_spark.operators.decontaminate import (
        contamination_pairs,
        decontaminate,
    )
    from rag_vertex_ai_vector_search_spark.operators.dedup import (
        minhash_candidate_pairs,
    )

    register_sql_api(spark, sf_smoke)
    docs = load_table(spark, sf_smoke, "documents")

    via_sql = sorted(
        tuple(r)
        for r in spark.sql(
            "SELECT id_a, id_b, jaccard FROM engine_dedup_candidates"
        ).collect()
    )
    via_df = sorted(
        tuple(r)
        for r in minhash_candidate_pairs(
            docs, shingle_words=3, num_hashes=64, bands=16,
            jaccard_threshold=0.5,
        ).collect()
    )
    assert via_sql == via_df and len(via_sql) > 0

    train = docs.filter(F.col("doc_id") % 10 != 0)
    ev = docs.filter(F.col("doc_id") % 10 == 0)
    pairs_sql = sorted(
        tuple(r)
        for r in spark.sql(
            "SELECT train_id, eval_id, shared_grams "
            "FROM engine_contamination_pairs"
        ).collect()
    )
    pairs_df = sorted(
        tuple(r)
        for r in contamination_pairs(
            train, ev, n=5, min_shared=1, max_gram_df=64
        ).select("train_id", "eval_id", "shared_grams").collect()
    )
    assert pairs_sql == pairs_df and len(pairs_sql) > 0

    clean_sql = sorted(
        r.doc_id
        for r in spark.sql(
            "SELECT doc_id FROM engine_decontaminate"
        ).collect()
    )
    clean_df = sorted(
        r.doc_id
        for r in decontaminate(
            train, ev, n=5, min_shared=1, max_gram_df=64
        ).select("doc_id").collect()
    )
    assert clean_sql == clean_df
    # the flags and the clean table agree: removed = flagged train ids
    flagged = {t for t, _, _ in pairs_df}
    assert flagged == set(
        r.doc_id for r in train.select("doc_id").collect()
    ) - set(clean_df)


def test_sql_mixing_views_match_dataframe_builders(spark, sf_smoke):
    """r16 (VERDICT r15 #7): the mixing/packing half of the pipeline
    from pure SQL -- engine_temperature_mix / engine_domain_cap /
    engine_pack_sequences are bit-equal to the DataFrame builders in
    the gated configurations."""
    import math

    import pandas as pd

    from rag_vertex_ai_vector_search_spark.operators.importance import (
        dsir_gumbel_select,
    )
    from rag_vertex_ai_vector_search_spark.operators.pack import (
        concat_sequences,
        pack_sequences,
    )
    from rag_vertex_ai_vector_search_spark.operators.splits import (
        cap_per_group,
    )

    register_sql_api(spark, sf_smoke)
    docs = load_table(spark, sf_smoke, "documents")

    # domain cap
    via_sql = sorted(
        tuple(r) for r in spark.sql(
            "SELECT doc_id, source FROM engine_domain_cap"
        ).collect()
    )
    via_df = sorted(
        tuple(r) for r in cap_per_group(
            docs.select("doc_id", "source"),
            group_col="source", id_col="doc_id",
            max_per_group=10, salt="cap1",
        ).select("doc_id", "source").collect()
    )
    assert via_sql == via_df and via_sql

    # pack sequences
    via_sql = sorted(
        tuple(r) for r in spark.sql(
            "SELECT pack_group, seq_id, n_docs, seq_chars, seq_sha256 "
            "FROM engine_pack_sequences"
        ).collect()
    )
    packed = pack_sequences(
        docs.select(
            "doc_id", "lang", "text",
            token_count(F.col("text")).alias("n_tokens"),
        ),
        token_col="n_tokens", budget=512, group_col="lang",
    )
    via_df = sorted(
        tuple(r) for r in concat_sequences(packed).select(
            "pack_group", "seq_id", "n_docs",
            F.length("seq_text").alias("seq_chars"),
            F.sha2("seq_text", 256).alias("seq_sha256"),
        ).collect()
    )
    assert via_sql == via_df and via_sql

    # temperature mix (the declared dataset_temperature_mix config)
    via_sql = sorted(
        tuple(r) for r in spark.sql(
            "SELECT doc_id, source, source_docs, log_weight_micronats, "
            "gumbel_key_micronats FROM engine_temperature_mix"
        ).collect()
    )
    counts = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("source_docs")
    ).collect()
    mapping = spark.createDataFrame(
        pd.DataFrame(
            {
                "source": [r.source for r in counts],
                "source_docs": [int(r.source_docs) for r in counts],
                "log_weight_micronats": [
                    int(math.floor(
                        -500000.0 * math.log(float(r.source_docs))
                    ))
                    for r in counts
                ],
            }
        ),
        "source string, source_docs long, log_weight_micronats long",
    )
    scored = docs.select("doc_id", "source").join(
        F.broadcast(mapping), "source"
    ).select("doc_id", "source", "source_docs", "log_weight_micronats")
    via_df = sorted(
        tuple(r) for r in dsir_gumbel_select(
            scored, 100, salt="tmix"
        ).select(
            "doc_id", "source", "source_docs", "log_weight_micronats",
            "gumbel_key_micronats",
        ).collect()
    )
    assert via_sql == via_df and len(via_sql) == 100


# ---- storage-layer SQL surface (r17, VERDICT r16 #5) -------------------


def _tx_table(spark, tmp_path, name="t"):
    from rag_vertex_ai_vector_search_spark.sources.txlog import tx_append

    path = str(tmp_path / name)
    df1 = spark.range(0, 60).select(
        "id", (F.col("id") % 3).alias("part"), (F.col("id") * 2).alias("v")
    )
    df2 = spark.range(60, 90).select(
        "id", (F.col("id") % 3).alias("part"), (F.col("id") * 2).alias("v")
    )
    tx_append(spark, path, df1.repartition(4), partition_cols=("part",))
    tx_append(spark, path, df2.repartition(4), partition_cols=("part",))
    return path


def test_storage_sql_snapshot_view_time_travel(spark, tmp_path):
    from rag_vertex_ai_vector_search_spark.sources.txlog import read_table
    from rag_vertex_ai_vector_search_spark.sql_api import storage_sql

    path = _tx_table(spark, tmp_path)
    storage_sql(spark, f"CREATE SNAPSHOT VIEW t_now FROM '{path}'")
    storage_sql(
        spark, f"CREATE SNAPSHOT VIEW t_v1 FROM '{path}' VERSION AS OF 1"
    )
    now_sql = sorted(tuple(r) for r in spark.sql(
        "SELECT id, part, v FROM t_now").collect())
    now_py = sorted(tuple(r) for r in read_table(spark, path).select(
        "id", "part", "v").collect())
    assert now_sql == now_py and len(now_sql) == 90
    old_sql = sorted(tuple(r) for r in spark.sql(
        "SELECT id, part, v FROM t_v1").collect())
    old_py = sorted(tuple(r) for r in read_table(
        spark, path, version=1).select("id", "part", "v").collect())
    assert old_sql == old_py and len(old_sql) == 60


def test_storage_sql_describe_history(spark, tmp_path):
    from rag_vertex_ai_vector_search_spark.sources.txlog import (
        TxLog, tx_append,
    )
    from rag_vertex_ai_vector_search_spark.sql_api import storage_sql

    path = _tx_table(spark, tmp_path)
    tx_append(
        spark, path,
        spark.range(90, 95).select(
            "id", (F.col("id") % 3).alias("part"),
            (F.col("id") * 2).alias("v"),
        ),
        meta={"txn_app": "app", "txn_batch": 7},
    )
    hist = {r.version: r for r in storage_sql(
        spark, f"DESCRIBE HISTORY '{path}'").collect()}
    log = TxLog(spark, path)
    assert sorted(hist) == [v for v, _ in log._version_files()]
    assert hist[0].action == "init" and hist[0].is_checkpoint
    assert hist[1].action == "append" and hist[1].n_added > 0
    assert hist[3].txn_app == "app" and hist[3].txn_batch == "7"
    assert not hist[1].schema_change


def test_storage_sql_history_sees_schema_evolution(spark, tmp_path):
    from rag_vertex_ai_vector_search_spark.sources.txlog import tx_append
    from rag_vertex_ai_vector_search_spark.sql_api import storage_sql

    path = str(tmp_path / "t")
    tx_append(spark, path, spark.range(0, 10).select(
        "id", (F.col("id") * 2).alias("v")))
    tx_append(
        spark, path,
        spark.range(10, 15).select(
            "id", (F.col("id") * 2).alias("v"), F.lit("en").alias("lang")
        ),
        merge_schema=True,
    )
    hist = {r.version: r for r in storage_sql(
        spark, f"DESCRIBE HISTORY '{path}'").collect()}
    assert hist[2].schema_change and not hist[1].schema_change


def test_storage_sql_changes_view_matches_python_twin(spark, tmp_path):
    from rag_vertex_ai_vector_search_spark.sources.changes import (
        read_table_changes,
    )
    from rag_vertex_ai_vector_search_spark.sources.txlog import tx_merge
    from rag_vertex_ai_vector_search_spark.sql_api import storage_sql

    path = _tx_table(spark, tmp_path)
    tx_merge(
        spark, path,
        spark.range(85, 95).select(
            "id", (F.col("id") % 3).alias("part"),
            (F.col("id") * 5).alias("v"),
        ),
        key="id", n_buckets=4,
    )
    storage_sql(
        spark, f"CREATE CHANGES VIEW t_cdc FROM '{path}' SINCE VERSION 1"
    )
    got = sorted(tuple(r) for r in spark.sql(
        "SELECT id, part, v, _change_type, _commit_version FROM t_cdc"
    ).collect())
    want = sorted(tuple(r) for r in read_table_changes(
        spark, path, 1
    ).select("id", "part", "v", "_change_type", "_commit_version")
        .collect())
    assert got == want and len(got) > 0


def _data_file_count(path):
    import os

    n = 0
    for r, _d, fs_ in os.walk(path):
        if "_txlog" in r or ".tx-stage" in r:
            continue
        n += sum(1 for f in fs_ if not f.startswith(("_", ".")))
    return n


def test_storage_sql_vacuum_matches_python_twin(spark, tmp_path):
    from rag_vertex_ai_vector_search_spark.sources.txlog import (
        TxLog, read_table, tx_compact,
    )
    from rag_vertex_ai_vector_search_spark.sql_api import storage_sql

    path = _tx_table(spark, tmp_path)
    tx_compact(spark, path, target_file_bytes=1 << 30)
    phys_before = _data_file_count(path)
    live = len(TxLog(spark, path).live_files())
    rep = storage_sql(
        spark,
        f"VACUUM '{path}' RETAIN 1 VERSIONS MIN AGE 0 SECONDS PRUNE LOG",
    ).collect()[0]
    assert rep.deleted_files == phys_before - live
    assert rep.pruned_commits >= 0
    assert read_table(spark, path).count() == 90  # rows intact


def test_storage_sql_optimize_scoped_and_full(spark, tmp_path):
    from rag_vertex_ai_vector_search_spark.sources.txlog import (
        read_table, tx_append,
    )
    from rag_vertex_ai_vector_search_spark.sql_api import storage_sql

    path = str(tmp_path / "t")
    for i in range(4):  # fragment one partition with tiny appends
        tx_append(
            spark, path,
            spark.range(i * 10, i * 10 + 10).select(
                "id", F.lit("en").alias("lang")
            ).coalesce(1),
            partition_cols=("lang",),
        )
    before = sorted(tuple(r) for r in read_table(spark, path).collect())
    rep = storage_sql(spark, f"OPTIMIZE '{path}'").collect()[0]
    assert rep.partitions_fragmented == 1
    assert rep.files_after < rep.files_before
    after = sorted(tuple(r) for r in read_table(spark, path).collect())
    assert after == before
    full = storage_sql(spark, f"OPTIMIZE '{path}' FULL").collect()[0]
    assert full.files_after == 1
    assert sorted(
        tuple(r) for r in read_table(spark, path).collect()
    ) == before


def test_storage_sql_rejects_unknown_statement(spark):
    from rag_vertex_ai_vector_search_spark.sql_api import storage_sql

    with pytest.raises(ValueError, match="storage statement"):
        storage_sql(spark, "DROP TABLE everything")
