"""Relevance-ranked full-text search: inverted token index + BM25.

The reference's content search is Vespa ``userQuery()`` with a ranking
profile (vespa_integration.py:406-441); the round-1/2 stand-in was a
linear ``text.contains(term)`` scan (SURVEY §2.1 S4).  This module is the
analytics-engine-native answer: build a token index ONCE (one explode +
one groupBy — the shape of every other stage in this repo), then score
queries against the index with BM25 (Robertson/Sparck Jones; public), all
as JVM-side column expressions.

Scale notes:
  * the index is (term, id, tf) — shuffle-bounded by corpus token count;
    at 100 TB it partitions by term (head terms are exactly the ones the
    idf factor down-weights, and a ``max_df`` guard can drop them from
    the index entirely, like the shingle-DF guard in dedup).
  * a query touches only its terms' postings (semi-join on a literal
    term list → the scan prunes); scoring is one groupBy(id) over the
    matched postings; top-k compiles to TakeOrderedAndProject.
  * no UDFs anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from knowledgegraph_spark.operators.textstats import tokens


def _norm_tokens(text_col):
    return tokens(F.regexp_replace(F.lower(F.trim(text_col)), r"\s+", " "))


def token_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """(term, id, tf) inverted index — one explode + one count aggregation.

    ``max_df``: optional head-term guard — terms appearing in more than
    ``max_df`` documents are dropped from the index (stopword-class terms
    carry ~zero BM25 weight but dominate posting volume)."""
    idx = (
        df.select(F.col(id_col).alias("id"), F.explode(_norm_tokens(F.col(text_col))).alias("term"))
        .groupBy("term", "id")
        .agg(F.count("*").alias("tf"))
    )
    if max_df is not None:
        keep = (
            idx.groupBy("term")
            .agg(F.count("*").alias("df_"))
            .filter(F.col("df_") <= max_df)
            .select("term")
        )
        idx = idx.join(keep, "term")
    return idx


def doc_lengths(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, dl) document token lengths for the BM25 length normalization."""
    return df.select(
        F.col(id_col).alias("id"), F.size(_norm_tokens(F.col(text_col))).alias("dl")
    )


def bm25_search(
    index: DataFrame,
    lengths: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    n_docs: int | None = None,
    avg_dl: float | None = None,
    score_round: int | None = None,
) -> DataFrame:
    """Top-k documents by BM25 over a prebuilt index.

    idf = ln((N - df + 0.5)/(df + 0.5) + 1)  (the Lucene-standard
    non-negative variant); tf term = tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl)).
    ``n_docs``/``avg_dl`` can be passed from corpus stats to avoid the two
    tiny aggregations; computed from ``lengths`` otherwise (one job).

    Plan shape: postings semi-filtered to the literal query terms (the
    scan prunes on term), broadcast-joined to the per-term df/idf (≤
    |query| rows), one groupBy(id), TakeOrderedAndProject for the top-k.
    """
    terms = [t.lower() for t in query_terms]
    if n_docs is None or avg_dl is None:
        row = lengths.agg(
            F.count("*").alias("n"), F.avg("dl").alias("avg")
        ).collect()[0]
        n_docs = n_docs if n_docs is not None else int(row["n"])
        avg_dl = avg_dl if avg_dl is not None else float(row["avg"] or 0.0)

    postings = index.filter(F.col("term").isin(terms))
    dfreq = postings.groupBy("term").agg(F.count("*").alias("df_"))
    idf = dfreq.select(
        "term",
        F.log(
            (F.lit(float(n_docs)) - F.col("df_") + 0.5) / (F.col("df_") + 0.5) + 1.0
        ).alias("idf"),
    )
    scored = (
        postings.join(F.broadcast(idf), "term")
        .join(lengths, "id")
        .select(
            "id",
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.lit(max(avg_dl, 1e-9)))
                )
            ).alias("s"),
        )
        .groupBy("id")
        .agg(F.sum("s").alias("score"))
    )
    if score_round is not None:
        # round BEFORE ranking so an oracle ordering on rounded scores
        # tie-breaks identically — still inside the same TakeOrdered plan
        # (a caller re-sorting rounded scores AFTER a huge-k top-k would
        # force the global sort this path exists to avoid)
        scored = scored.withColumn("score", F.round("score", score_round))
    return scored.orderBy(F.desc("score"), F.col("id")).limit(k)


def bm25_idf(n_docs: int, df: int) -> float:
    """Reference scalar for tests: the same idf the plan computes."""
    return math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
