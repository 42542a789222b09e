from __future__ import annotations

from pyspark.sql import functions as F

from chatbot_spark.operators.html import extract_main_content


def _run(spark, html: str, **kw):
    df = spark.createDataFrame([(html,)], "html string")
    cols = extract_main_content(F.col("html"), **kw)
    return df.select(
        F.size(cols["blocks"]).alias("nb"),
        F.size(cols["kept"]).alias("nk"),
        cols["content"].alias("content"),
    ).collect()[0]


def test_html_basic_classification(spark):
    html = (
        '<div><a href="/a">only links here now</a></div>'
        "<p>this paragraph is long enough to keep around</p>"
        "<p>short</p>"
    )
    r = _run(spark, html)
    assert (r["nb"], r["nk"]) == (3, 1)
    assert r["content"] == "this paragraph is long enough to keep around"


def test_html_link_density_boundary(spark):
    # text len 30, link chars 10 -> 3*10 == 30, NOT < 30 -> dropped;
    # one char less link text -> kept.
    dropped = "<p>" + "x" * 20 + '<a href="/l">' + "y" * 10 + "</a></p>"
    kept = "<p>" + "x" * 21 + '<a href="/l">' + "y" * 9 + "</a></p>"
    assert _run(spark, dropped)["nk"] == 0
    assert _run(spark, kept)["nk"] == 1


def test_html_min_len_boundary(spark):
    assert _run(spark, "<p>" + "a" * 19 + "</p>")["nk"] == 0
    assert _run(spark, "<p>" + "a" * 20 + "</p>")["nk"] == 1


def test_html_no_blocks_and_document_order(spark):
    assert _run(spark, "plain text, no markup")["nb"] == 0
    html = "<p>first paragraph long enough ok</p><div>second block also long enough</div>"
    r = _run(spark, html)
    assert r["content"] == (
        "first paragraph long enough ok\nsecond block also long enough"
    )
