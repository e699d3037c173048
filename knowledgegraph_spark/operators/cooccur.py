"""Term co-occurrence graph: the generic-text degenerate KG.

When input text has no extractable typed entities (arbitrary web text /
word-soup corpora), the KG pipeline degrades gracefully to a term graph:
tokens are Term nodes and adjacent-token pairs are CO_OCCURS edges with
corpus-level weights.  Same dataflow shape as the typed pipeline
(extract → fold → materialize), fully expressible in SQL (DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from knowledgegraph_spark.operators.textstats import tokens


def term_bigrams(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc, a, b) — adjacent token pairs, one row per occurrence."""
    toks = tokens(F.lower(F.col(text_col)))
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    return df.select(F.col(id_col).alias("doc"), F.explode(pairs).alias("p")).select(
        "doc", F.col("p.a").alias("subj"), F.col("p.b").alias("obj")
    )


def term_graph(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Folded co-occurrence triples: (subj, pred, obj, weight, n_docs)."""
    bg = term_bigrams(df, id_col, text_col)
    return (
        bg.groupBy("subj", "obj")
        .agg(
            F.count("*").alias("weight"),
            F.countDistinct("doc").alias("n_docs"),
        )
        .select("subj", F.lit("CO_OCCURS").alias("pred"), "obj", "weight", "n_docs")
    )


def term_nodes(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Term node table: (name, occurrences, n_docs)."""
    tok = df.select(
        F.col(id_col).alias("doc"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("name"),
    )
    return tok.groupBy("name").agg(
        F.count("*").alias("occurrences"), F.countDistinct("doc").alias("n_docs")
    )
