"""SQL front end: engine functions from spark.sql match the DataFrame
builders exactly."""

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
