"""Extraction parity: planted mentions/triples are recovered exactly."""

from knowledgegraph_spark.operators.extraction import (
    extract_mentions_and_triples,
    extract_page_py,
    mentions_of,
    triples_of,
)
from knowledgegraph_spark.operators.html_text import with_extracted_text


def test_pure_python_parity(corpus):
    planted_m = {
        (m["url"], m["name"], m["type"], m.get("email"), m.get("domain"))
        for m in corpus["mentions"]
    }
    planted_t = {(t["url"], t["s"], t["p"], t["o"]) for t in corpus["triples"]}
    got_m, got_t = set(), set()
    for p in corpus["pages"]:
        if p["lang"] != "en":
            continue
        for r in extract_page_py(p["url"], p["warc_ts"], corpus["goldens"][p["url"]]):
            if r["kind"] == "mention":
                got_m.add((r["url"], r["name"], r["type"], r["email"], r["domain"]))
            else:
                got_t.add((r["url"], r["subj_name"], r["pred"], r["obj_name"]))
    assert got_m == planted_m
    assert got_t == planted_t


def test_spark_counts_match_pure_python(spark, corpus, pages_df):
    ext = extract_mentions_and_triples(with_extracted_text(pages_df)).cache()
    n_m = mentions_of(ext).count()
    n_t = triples_of(ext).count()
    assert n_m == len(corpus["mentions"])
    assert n_t == len(corpus["triples"])


def test_strength_in_band(spark, pages_df):
    from pyspark.sql import functions as F

    ext = extract_mentions_and_triples(with_extracted_text(pages_df))
    bad = triples_of(ext).filter(
        (F.col("strength") < 6.0) | (F.col("strength") > 10.0)
    )
    assert bad.count() == 0


def test_noise_and_non_english_yield_nothing():
    assert extract_page_py("u", None, "The weather was mild.\nNothing here.") == []
    assert extract_page_py("u", None, "") == []
    assert extract_page_py("u", None, None) == []
