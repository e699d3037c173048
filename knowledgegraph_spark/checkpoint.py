"""Checkpoint ledger + per-partition lineage/metrics (north_rule: resumable
from checkpoint with per-partition lineage + metrics).

Replaces the reference's JSON progress file (vespa_email_pipeline.py:49-127,
saved per batch) with two catalog tables:

  * ``checkpoint_ledger`` (written by plans.pipeline.run_pipeline):
    processed urls; resume = left-anti join.
  * ``run_metrics``: per-stage, per-partition row counts + wall clock,
    aggregated JVM-side (groupBy spark_partition_id) and appended once
    per stage — the queryable version of the reference's per-email
    processing_time_ms log (vespa_email_pipeline.py:166).
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
    """Per-partition row counts for a frame — entirely JVM-side.

    ``groupBy(spark_partition_id()).count()`` stays inside whole-stage
    codegen: no row ever crosses into Python (the previous RDD
    ``mapPartitionsWithIndex`` version serialized EVERY row into a Python
    worker just to be counted — a second full pass through Python per
    stage at 100 TB).  The aggregated result is O(n_partitions) rows; the
    driver collect is therefore bounded by partition count, not data.
    ``wall_ms`` is the driver-observed wall of the counting job, stamped
    on every row of the stage.  Empty partitions produce no group and so
    no row (they carry no skew signal).
    """
    spark = df.sparkSession
    t0 = time.time()
    counts = (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count(F.lit(1)).alias("rows_out"))
        .collect()
    )
    wall = int((time.time() - t0) * 1000)
    rows = [
        (session_id, stage, int(c.partition_id), int(c.rows_out), wall)
        for c in counts
    ]
    return spark.createDataFrame(rows, METRICS_SCHEMA)


def record_metrics(cat, df: DataFrame, session_id: str, stage: str) -> None:
    """Append a stage's partition metrics to the run_metrics table.

    Append-only commit — O(delta) per stage, never a rewrite of the
    whole metrics table.
    """
    cat.append(partition_metrics(df, session_id, stage), "run_metrics")


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
