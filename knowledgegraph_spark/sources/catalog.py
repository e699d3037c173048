"""Warehouse catalog: parquet-backed stage tables with atomic swap + upsert.

Production target is Iceberg (``MERGE INTO``, snapshot-isolated commits,
incremental reads — SURVEY.md §1.3); this sandbox has no Iceberg runtime
jars, so the catalog provides the same table contract over plain parquet:

  * ``write``   — write-to-temp + atomic directory rename (a commit);
  * ``upsert``  — read current + relational merge fold + swap (the
    engine-level ``MERGE INTO ... WHEN MATCHED`` equivalent);
  * ``read``    — plain ``spark.read.parquet``.

Every mutation keeps the previous table generation until the swap, so a
killed job never leaves a half-written table — the property the reference
approximates with its save-per-batch JSON ledger
(vespa_email_pipeline.py:111-127).

On Iceberg, ``upsert`` becomes a single ``MERGE INTO`` SQL statement and
``write`` a ``replace``; the call sites would not change.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class Catalog:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)
        # Sweep generations orphaned by a crash mid-write.  .tmp-* dirs were
        # never swapped in — always safe to drop.  A .old-* dir is the
        # PREVIOUS generation: normally the live dir exists and the .old is
        # garbage, but a crash in write()'s swap window (after final→old,
        # before tmp→final) leaves the .old as the ONLY copy of the table —
        # restore it instead of deleting it.
        for d in sorted(os.listdir(warehouse)):
            p = os.path.join(warehouse, d)
            if ".tmp-" in d:
                shutil.rmtree(p, ignore_errors=True)
            elif ".old-" in d:
                live = os.path.join(warehouse, d.split(".old-")[0])
                if os.path.isdir(live):
                    shutil.rmtree(p, ignore_errors=True)
                else:
                    os.rename(p, live)

    def path(self, table: str) -> str:
        return os.path.join(self.warehouse, table)

    def exists(self, table: str) -> bool:
        p = self.path(table)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f == "_SUCCESS" for f in os.listdir(p)
        )

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(table))

    def write(
        self,
        df: DataFrame,
        table: str,
        partition_by: list[str] | None = None,
        repartition_cols: list[str] | None = None,
    ) -> None:
        """Atomic replace: write a new generation dir, then swap it in."""
        final = self.path(table)
        tmp = f"{final}.tmp-{uuid.uuid4().hex[:8]}"
        writer = df
        if repartition_cols:
            writer = writer.repartition(*repartition_cols)
        w = writer.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(tmp)
        old = f"{final}.old-{uuid.uuid4().hex[:8]}"
        if os.path.exists(final):
            os.rename(final, old)
        os.rename(tmp, final)
        if os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)

    def replace_partitions(
        self, df: DataFrame, table: str, partition_col: str, values: list
    ) -> None:
        """Replace exactly the given partition directories — the
        parquet-catalog form of Iceberg's partition-scoped MERGE commit.

        ``df`` must hold the COMPLETE new content of those partitions.
        The new data is staged to a tmp dir first, then each touched
        partition dir is swapped in with a directory rename; partitions
        not listed are never touched, so an incremental batch costs
        O(touched partitions), not O(table).  A touched partition with
        no surviving rows is deleted (dynamic partition overwrite cannot
        express that case).  A crash mid-swap leaves some partitions
        updated and some not — callers order the ledger commit last, so
        a rerun re-applies the same idempotent merge and heals the table.
        """
        final = self.path(table)
        tmp = f"{final}.tmp-{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").partitionBy(partition_col).parquet(tmp)
        try:
            for v in values:
                dst = os.path.join(final, f"{partition_col}={v}")
                src = os.path.join(tmp, f"{partition_col}={v}")
                shutil.rmtree(dst, ignore_errors=True)
                if os.path.isdir(src):
                    os.rename(src, dst)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    def append(self, df: DataFrame, table: str) -> None:
        """Append-only commit for log-style tables (metrics, ledgers).

        O(delta) — new parquet files land next to the existing ones; no
        read-modify-rewrite of the table.  Readers ignore `_`-prefixed
        committer temp dirs, so a crashed append leaves no torn reads.
        """
        df.write.mode("append").parquet(self.path(table))

    def upsert(self, incoming: DataFrame, table: str, merge_fn) -> None:
        """merge_fn(existing_df, incoming_df) -> merged_df; swap atomically.

        The merged frame is fully materialized to the new generation before
        the old one is dropped (no read-overwrite hazard).
        """
        if self.exists(table):
            merged = merge_fn(self.read(table), incoming)
        else:
            merged = merge_fn(None, incoming) if _accepts_none(merge_fn) else incoming
        self.write(merged, table)

    def drop(self, table: str) -> None:
        shutil.rmtree(self.path(table), ignore_errors=True)


def _accepts_none(fn) -> bool:
    return getattr(fn, "accepts_none", False)
