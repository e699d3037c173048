"""Checkpoint ledger + per-partition lineage/metrics (north_rule: resumable
from checkpoint with per-partition lineage + metrics).

Replaces the reference's JSON progress file (vespa_email_pipeline.py:49-127,
saved per batch) with two catalog tables:

  * ``checkpoint_ledger`` (written by plans.pipeline.run_pipeline):
    processed urls; resume = left-anti join.
  * ``run_metrics``: per-stage, per-partition row counts + wall clock,
    collected executor-side via mapPartitions-style instrumentation and
    committed once per stage — the queryable version of the reference's
    per-email processing_time_ms log (vespa_email_pipeline.py:166).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("session_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("rows_out", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), False),
    ]
)


def partition_metrics(df: DataFrame, session_id: str, stage: str) -> DataFrame:
    """Per-partition (rows, wall_ms) for a frame — one extra narrow pass.

    Implemented with mapInArrow-free RDD mapPartitions (tiny output, no
    row-level Python on the data path: only counting within the iterator).
    """
    spark = df.sparkSession

    def count_partition(split_index, it):
        t0 = time.time()
        n = 0
        for _ in it:
            n += 1
        yield (session_id, stage, split_index, n, int((time.time() - t0) * 1000))

    rows = df.rdd.mapPartitionsWithIndex(count_partition)
    return spark.createDataFrame(rows, METRICS_SCHEMA)


def record_metrics(cat, df: DataFrame, session_id: str, stage: str) -> None:
    """Append a stage's partition metrics to the run_metrics table."""
    m = partition_metrics(df, session_id, stage)
    if cat.exists("run_metrics"):
        merged = cat.read("run_metrics").unionByName(m)
        cat.write(merged, "run_metrics")
    else:
        cat.write(m, "run_metrics")


def stage_summary(cat) -> DataFrame:
    """Rows/wall per stage — the reference's session stats report
    (vespa_email_pipeline.py:571-607) as a query."""
    m = cat.read("run_metrics")
    return (
        m.groupBy("session_id", "stage")
        .agg(
            F.sum("rows_out").alias("rows"),
            F.max("wall_ms").alias("slowest_partition_ms"),
            F.count("*").alias("n_partitions"),
        )
        .orderBy("session_id", "stage")
    )
