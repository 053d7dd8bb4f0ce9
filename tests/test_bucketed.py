"""Bucketed layout: keyed joins co-locate without a shuffle."""

import pytest
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.sources import load_table, write_bucketed


def test_bucketed_join_has_no_shuffle(spark, sf_smoke):
    li = load_table(spark, sf_smoke, "lineitem")
    orders = load_table(spark, sf_smoke, "orders")
    write_bucketed(li, "li_b", "l_orderkey", num_buckets=8)
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "ord_b", "l_orderkey", num_buckets=8,
    )
    try:
        a = spark.table("li_b")
        b = spark.table("ord_b")
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = a.join(b, "l_orderkey")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            # and the result is still correct
            expected = (
                li.join(orders, li.l_orderkey == orders.o_orderkey).count()
            )
            assert joined.count() == expected
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")
