"""knowledgegraph_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch rebuild of the capabilities of SirajuddinShaik/KnowledgeGraph
(see SURVEY.md) expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst, Arrow-vectorized pandas UDFs for the row-level extraction logic,
distributed connected components for canonicalization, and parquet/Iceberg
table boundaries between stages.

Pipeline stages (SURVEY.md §7.1):

    pages (url, warc_ts, html, text, lang)
      -> extract_text     (operators.html_text)      html -> text, byte-stable
      -> extract           (operators.extraction)     mentions + raw triples
      -> link              (operators.linking)        alias-dictionary broadcast join
      -> canonicalize      (operators.components)     large-star/small-star CC
      -> fold              (operators.merge)          per-field merge strategies
      -> materialize       (sources.catalog)          entity_nodes + triples tables
      -> query             (query)                    stats / lookup / 1-hop / top-k
"""

__version__ = "0.1.0"

from knowledgegraph_spark.session import get_spark  # noqa: F401
