"""Incremental / streaming ingestion of the pages table.

The reference is batch-incremental (a for-loop over batch slices with a
resume ledger, vespa_email_pipeline.py:551-566 — no watermarks or
event-time state), and the core engine keeps that model: run_pipeline is
idempotent over any new slice of pages (SURVEY.md §2.9).

Two front-ends are provided on top:

  * ``run_micro_batches`` — the reference's batch loop, Spark-side:
    partitions the input into warc_ts windows and feeds each through
    run_pipeline; kill anywhere, rerun, converges to the one-shot result
    (tests/test_pipeline.py::test_incremental_equals_oneshot).

  * ``stream_pages`` — a Structured Streaming front door for parity with
    streaming sources: readStream on a pages directory, each micro-batch
    handed to run_pipeline via foreachBatch.  Useful when pages arrive as
    files; the batch engine does the actual work, so semantics are
    identical (exactly-once via the ledger's anti-join + idempotent
    upserts, not via sink transactions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knowledgegraph_spark.config import PAGES_SCHEMA
from knowledgegraph_spark.plans.pipeline import run_pipeline


def run_micro_batches(
    spark: SparkSession,
    pages: DataFrame,
    warehouse: str,
    n_batches: int = 4,
    session_prefix: str = "mb",
):
    """Process pages in warc_ts-ordered micro-batches through run_pipeline."""
    bounds = pages.select(
        F.min("warc_ts").alias("lo"), F.max("warc_ts").alias("hi")
    ).collect()[0]
    if bounds["lo"] is None:
        return None
    lo, hi = bounds["lo"], bounds["hi"]
    span = (hi - lo) / n_batches
    cat = None
    for i in range(n_batches):
        upper = lo + span * (i + 1)
        batch = pages.filter(
            F.col("warc_ts") <= F.lit(upper) if i < n_batches - 1 else F.lit(True)
        )
        # run_pipeline anti-joins the ledger, so overlapping slices are fine
        cat = run_pipeline(spark, batch, warehouse, session_id=f"{session_prefix}-{i}")
    return cat


def stream_pages(
    spark: SparkSession,
    input_dir: str,
    warehouse: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Structured Streaming front door: watch a directory of pages parquet.

    foreachBatch → run_pipeline: the ledger + idempotent upserts give
    effective exactly-once per url even under micro-batch replays.
    """
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .format("parquet")
        .load(input_dir)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        run_pipeline(
            spark, batch_df, warehouse, session_id=f"stream-{batch_id}"
        )

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
