"""HTML extraction signals (functions/html.py): visible text, title,
link density, tag weight -- hand-built documents with known answers."""

import pytest
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.functions.html import (
    anchor_text,
    html_title,
    html_to_text,
    link_density,
    tag_count,
)

PAGE = (
    "<html><head><title> My Page </title>"
    "<style>body { color: red }</style>"
    "<script>var x = '<p>not text</p>';</script></head>"
    "<body><!-- hidden comment -->"
    "<h1>Header</h1><p>Some &amp; proper &lt;prose&gt; here.</p>"
    "<div class='nav'><a href='/a'>Home</a> <a href='/b'>About&nbsp;us</a>"
    "</div></body></html>"
)


def _one(spark, expr, text=PAGE):
    return (
        spark.createDataFrame([(text,)], "html string")
        .select(expr.alias("v"))
        .collect()[0]
        .v
    )


def test_html_to_text_strips_everything_invisible(spark):
    out = _one(spark, html_to_text("html"))
    assert out == "My Page Header Some & proper <prose> here. Home About us"
    # script/style/comment bodies must NOT leak
    assert "color" not in out and "var x" not in out and "hidden" not in out


def test_html_title_and_tag_count(spark):
    assert _one(spark, html_title("html")) == "My Page"
    assert _one(spark, html_title("html"), "no markup at all") == ""
    assert _one(spark, tag_count("html"), "<p>a</p><br>") == 3


def test_anchor_text_and_link_density(spark):
    assert _one(spark, anchor_text("html")) == "Home About us"
    # link chars = len("Home About us") = 13; text chars = len(full text)
    full = "My Page Header Some & proper <prose> here. Home About us"
    expected = 13 / len(full)
    assert _one(spark, link_density("html")) == pytest.approx(expected)
    # a pure link farm saturates at 1.0, plain prose scores 0.0
    farm = "<a href='/x'>one</a><a href='/y'>two</a>"
    assert _one(spark, link_density("html"), farm) == pytest.approx(1.0)
    assert _one(spark, link_density("html"), "just plain words") == 0.0
    assert _one(spark, link_density("html"), "") == 0.0


def test_entity_order_no_double_decode(spark):
    # '&amp;lt;' must decode to the literal text '&lt;', NOT to '<'
    assert _one(spark, html_to_text("html"), "x &amp;lt; y") == "x &lt; y"


def test_nested_tags_inside_anchor(spark):
    out = _one(
        spark, anchor_text("html"),
        "<a href='/'><b>Bold</b> link</a> trailing",
    )
    assert out == "Bold link"
