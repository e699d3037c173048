"""Text analysis + embedding function unit tests."""

import math

import pytest
from pyspark.sql import functions as F

from knowledgegraph_spark.functions.embedding import embed_text_py, embedding
from knowledgegraph_spark.operators.cooccur import term_graph
from knowledgegraph_spark.operators.textstats import (
    bpe_token_count,
    detect_lang,
    fingerprint,
    quality_features,
    token_count,
)


def test_token_counts(spark):
    df = spark.createDataFrame([("a  b   c", ), ("", ), ("x y.z 12", )], "text string")
    got = df.select(
        token_count(F.col("text")).alias("ws"),
        bpe_token_count(F.col("text")).alias("bpe"),
    ).collect()
    assert [r.ws for r in got] == [3, 0, 3]
    # "x y.z 12" → x, y, ., z, 12
    assert got[2].bpe == 5


def test_detect_lang(spark):
    rows = [
        ("the cat sat on the mat and it was good",),
        ("der hund ist mit der katze und das war gut",),
        ("le chat est avec la souris et les oiseaux",),
        ("zzz qqq www",),
    ]
    df = spark.createDataFrame(rows, "text string")
    got = [r.l for r in df.select(detect_lang(F.col("text")).alias("l")).collect()]
    assert got == ["en", "de", "fr", "und"]


def test_quality_features(spark):
    df = spark.createDataFrame([("The cat, the hat!",)], "text string")
    r = quality_features(df).collect()[0]
    assert r.n_tokens == 4
    assert r.stopword_ratio == 0.5  # "the" twice / 4 tokens
    assert r.punct_ratio > 0


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [("Hello  World",), ("  hello world ",)], "text string"
    )
    fps = [r.fp for r in df.select(fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1]


def test_embedding_deterministic_and_normalized(spark):
    v1 = embed_text_py("spark knowledge graph")
    v2 = embed_text_py("spark knowledge graph")
    assert v1 == v2
    assert abs(math.sqrt(sum(x * x for x in v1)) - 1.0) < 1e-6
    df = spark.createDataFrame([("spark knowledge graph",)], "text string")
    got = df.select(embedding(F.col("text")).alias("e")).collect()[0].e
    assert [round(x, 5) for x in got] == [round(x, 5) for x in v1]


def test_term_graph_counts(spark):
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    got = {(r.subj, r.obj): (r.weight, r.n_docs) for r in term_graph(df).collect()}
    assert got[("a", "b")] == (3, 2)
    assert got[("b", "a")] == (1, 1)
    assert got[("b", "c")] == (1, 1)
