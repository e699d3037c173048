"""Export sinks / sources (SURVEY.md §2.1 S7-S12).

The reference hand-rolls JSON exporters over HTTP-paged reads
(vespa_integration.py:627-950); in Spark each is a one-liner plan and the
driver-side pagination disappears:

  S7  export_all_documents_to_json  → ``export_json``
  S8  export_by_document_type      → ``export_partitioned_json``
  S9  export_lightweight_json      → ``export_selected_json``
  S10 documents_to_json_lines      → Spark's JSON sink IS line-delimited
  S11 process_extracted_file       → ``read_extraction_results``
  S12 process_directory glob       → ``read_extraction_results`` (globs natively)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def export_json(df: DataFrame, path: str) -> None:
    """All rows as line-delimited JSON (S7/S10 — JSONL is Spark-native)."""
    df.write.mode("overwrite").json(path)


def export_partitioned_json(df: DataFrame, path: str, by: str = "lang") -> None:
    """One directory per partition value (S8's file-per-doc_type,
    generalized; partition pruning on read is free)."""
    df.write.mode("overwrite").partitionBy(by).json(path)


def export_selected_json(df: DataFrame, path: str, fields: list[str]) -> None:
    """Column-pruned export (S9) — pruning reaches the scan via Catalyst."""
    df.select(*fields).write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSONL loader (S10 reader; accepts globs and directories, S12)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_extraction_results(spark: SparkSession, path: str) -> DataFrame:
    """Extraction-dump reader (S11): accepts ``{"results": [...]}``
    envelopes or bare ``{entities, relations}`` objects; directories and
    glob patterns work natively (S12)."""
    raw = spark.read.option("multiLine", "true").json(path)
    if "results" in raw.columns:
        return raw.select(F.explode("results").alias("r")).select("r.*")
    return raw
