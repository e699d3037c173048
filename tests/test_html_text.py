"""Byte-identity of HTML→text extraction (BASELINE.md per-row invariant)."""

from pyspark.sql import functions as F

from knowledgegraph_spark.operators.html_text import extract_text_py, with_extracted_text


def test_byte_identity_pure_python(corpus):
    for p in corpus["pages"]:
        got = extract_text_py(p["html"], p["text"])
        assert got == corpus["goldens"][p["url"]], p["url"]


def test_byte_identity_on_spark(spark, corpus, pages_df):
    gold = spark.createDataFrame(
        list(corpus["goldens"].items()), "url string, golden string"
    )
    mismatches = (
        with_extracted_text(pages_df)
        .join(gold, "url")
        .filter(F.col("text") != F.col("golden"))
        .count()
    )
    assert mismatches == 0


def test_null_html_passthrough():
    assert extract_text_py(None, "pre-extracted") == "pre-extracted"
    assert extract_text_py(None, None) is None


def test_tag_soup_fallback():
    out = extract_text_py(b"<html><body><p>a &amp; b</p></body></html>", None)
    assert out == "a & b"


def test_boilerplate_dropped():
    html = (
        b"<html><body><nav>MENU</nav><article><h1>T</h1><p>body</p></article>"
        b"<footer>FOOT</footer><script>x()</script></body></html>"
    )
    assert extract_text_py(html, None) == "T\n\nbody"


def test_garbage_bytes_no_crash():
    out = extract_text_py(b"\xff\xfe not html at all", None)
    assert isinstance(out, str)
