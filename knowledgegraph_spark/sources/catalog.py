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

import json
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
            elif os.path.isdir(p):
                # Partition-level sweep: replace_partitions renames each
                # replaced partition dir to a sibling ``<part>.old-<gen>``
                # before swapping the new one in.  A crash between the two
                # renames leaves the .old as the ONLY copy of that
                # partition — restore it; if the live partition exists the
                # .old is garbage from the post-swap window — drop it.
                for e in sorted(os.listdir(p)):
                    ep = os.path.join(p, e)
                    if ".tmp-" in e:  # orphaned meta tmp file
                        (shutil.rmtree if os.path.isdir(ep) else os.remove)(ep)
                        continue
                    if ".old-" not in e:
                        continue
                    live_p = os.path.join(p, e.split(".old-")[0])
                    if os.path.isdir(live_p):
                        shutil.rmtree(ep, ignore_errors=True)
                    else:
                        os.rename(ep, live_p)
        # Legacy hygiene: retire commit-manifest files written by earlier
        # revisions (the marker-based heal above is complete without them).
        for d in sorted(os.listdir(warehouse)):
            if ".commit-" in d and d.endswith(".json"):
                os.remove(os.path.join(warehouse, d))

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
        meta: dict | None = None,
    ) -> None:
        """Atomic replace: write a new generation dir, then swap it in.

        ``meta``: table-level metadata (bucket layout) written INTO the
        new generation dir before the swap, so data + meta commit in one
        rename — a crash can never leave a bucketed table without its
        ``_kg_meta.json`` (the round-3 advice's write-then-put_meta gap).
        """
        final = self.path(table)
        tmp = f"{final}.tmp-{uuid.uuid4().hex[:8]}"
        writer = df
        if repartition_cols:
            writer = writer.repartition(*repartition_cols)
        w = writer.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(tmp)
        if meta is not None:
            with open(os.path.join(tmp, "_kg_meta.json"), "w") as f:
                json.dump(meta, f)
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
        partition dir is swapped in; partitions not listed are never
        touched, so an incremental batch costs O(touched partitions),
        not O(table).  A touched partition with no surviving rows is
        deleted (dynamic partition overwrite cannot express that case).

        Crash safety: each partition is swapped via rename-aside (dst →
        ``dst.old-<gen>``; src → dst; drop .old) — never
        rmtree-then-rename, so no crash window deletes the only copy of
        previously committed rows.  ``Catalog.__init__`` heals any
        interrupted state from the .old/.tmp markers alone (restore an
        .old whose live partition is missing; drop the rest), after
        which a rerun re-applies the same idempotent merge — the ledger
        commits last, so the batch is re-processed, not lost.  (An
        earlier revision also wrote a commit manifest before the swap
        loop; recovery never consulted it — the markers are complete —
        and a manifest file was a hazard under two concurrent Catalogs
        on one warehouse, so it was dropped; round-3 advice item 4.)
        """
        final = self.path(table)
        gen = uuid.uuid4().hex[:8]
        tmp = f"{final}.tmp-{gen}"
        df.write.mode("overwrite").partitionBy(partition_col).parquet(tmp)
        try:
            for v in values:
                dst = os.path.join(final, f"{partition_col}={v}")
                src = os.path.join(tmp, f"{partition_col}={v}")
                old = f"{dst}.old-{gen}"
                if os.path.isdir(dst):
                    os.rename(dst, old)
                if os.path.isdir(src):
                    os.rename(src, dst)
                if os.path.isdir(old):
                    shutil.rmtree(old, ignore_errors=True)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    def append(self, df: DataFrame, table: str, partition_by: list[str] | None = None) -> None:
        """Append-only commit for log-style tables (metrics, ledgers).

        O(delta) — new parquet files land next to the existing ones; no
        read-modify-rewrite of the table.  Readers ignore `_`-prefixed
        committer temp dirs, so a crashed append leaves no torn reads.
        ``partition_by``: append into partition subdirs (the bucketed
        ledger layout) so readers can prune.
        """
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(table))

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

    def put_meta(self, table: str, meta: dict) -> None:
        """Persist table-level metadata (bucket layout, partition col) as a
        ``_kg_meta.json`` file inside the table dir — Spark readers ignore
        ``_``-prefixed files.  Written AFTER the table write (a full
        ``write`` swaps the directory and discards any previous meta, so
        callers re-put on every full rewrite; ``replace_partitions`` only
        touches partition subdirs and leaves the meta in place)."""
        p = self.path(table)
        os.makedirs(p, exist_ok=True)
        tmp = os.path.join(p, f"_kg_meta.tmp-{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(p, "_kg_meta.json"))

    def get_meta(self, table: str) -> dict | None:
        p = os.path.join(self.path(table), "_kg_meta.json")
        if not os.path.isfile(p):
            return None
        with open(p) as f:
            return json.load(f)

    def drop(self, table: str) -> None:
        shutil.rmtree(self.path(table), ignore_errors=True)


def _accepts_none(fn) -> bool:
    return getattr(fn, "accepts_none", False)
