"""Warehouse admin: init / status / backup / clean.

DataFrame-era equivalent of the reference's setup CLI
(kuzu_init.py:405-475 — init/clean/status/backup/schema/clear): the
"database" is a directory of catalog tables, so each admin verb is a few
lines over the Catalog.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from knowledgegraph_spark.config import node_schema, triple_schema
from knowledgegraph_spark.sources.catalog import Catalog

CORE_TABLES = (
    "entity_nodes", "triples", "checkpoint_ledger", "run_metrics", "failed_pages"
)


def init(cat: Catalog) -> None:
    """Create empty entity/triple tables with the unified schemas
    (kuzu_init.py:92-135's DDL, as empty parquet generations)."""
    spark = cat.spark
    if not cat.exists("entity_nodes"):
        cat.write(spark.createDataFrame([], node_schema(with_embedding=False)), "entity_nodes")
    if not cat.exists("triples"):
        cat.write(spark.createDataFrame([], triple_schema(with_embedding=False)), "triples")


def status(cat: Catalog) -> dict:
    """Row counts + on-disk bytes per table (kuzu_init.py status verb)."""
    out = {}
    for t in CORE_TABLES:
        if cat.exists(t):
            path = cat.path(t)
            size = sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(path)
                for f in fs
            )
            out[t] = {"rows": cat.read(t).count(), "bytes": size}
        else:
            out[t] = None
    return out


def backup(cat: Catalog, dest: str) -> str:
    """Copy the live generation of every table (kuzu_init.py backup verb).
    The atomic-swap layout means a plain copy of the live dirs is a
    consistent snapshot."""
    os.makedirs(dest, exist_ok=True)
    for t in CORE_TABLES:
        if cat.exists(t):
            shutil.copytree(cat.path(t), os.path.join(dest, t), dirs_exist_ok=True)
    return dest


def reset_failed(cat: Catalog) -> int:
    """Retry-reset for quarantined pages (vespa_email_pipeline.py:159-187):
    drop their 'failed' ledger rows and the failed_pages table, so the next
    run re-processes them.  Returns the number of pages reset."""
    n = 0
    if cat.exists("checkpoint_ledger"):
        led = cat.read("checkpoint_ledger")
        failed = led.filter(F.col("status") == "failed")
        n = failed.count()
        if n:
            cat.write(led.filter(F.col("status") != "failed"), "checkpoint_ledger")
    cat.drop("failed_pages")
    return n


def clean(cat: Catalog, include_stages: bool = True) -> None:
    """Drop all tables (kuzu_init.py clean/drop verbs)."""
    for t in CORE_TABLES:
        cat.drop(t)
    if include_stages:
        for d in list(os.listdir(cat.warehouse)):
            if d.startswith("stage_"):
                shutil.rmtree(os.path.join(cat.warehouse, d), ignore_errors=True)
