"""Admin verbs: init/status/backup/clean over a live warehouse, plus
catalog crash-recovery invariants."""

import os

from knowledgegraph_spark.admin import backup, clean, init, status
from knowledgegraph_spark.plans.pipeline import run_pipeline
from knowledgegraph_spark.sources.catalog import Catalog


def test_admin_lifecycle(spark, pages_df, tmp_path):
    wh = str(tmp_path / "wh")
    cat = Catalog(spark, wh)
    init(cat)
    s0 = status(cat)
    assert s0["entity_nodes"]["rows"] == 0 and s0["triples"]["rows"] == 0

    run_pipeline(spark, pages_df.limit(0).unionByName(pages_df), wh, session_id="a")
    s1 = status(cat)
    assert s1["entity_nodes"]["rows"] > 0
    assert s1["checkpoint_ledger"]["rows"] > 0

    b = backup(cat, str(tmp_path / "bk"))
    bcat = Catalog(spark, b)
    assert bcat.read("triples").count() == s1["triples"]["rows"]

    clean(cat)
    s2 = status(cat)
    assert s2["entity_nodes"] is None and s2["triples"] is None
    # backup untouched by clean
    assert bcat.read("entity_nodes").count() == s1["entity_nodes"]["rows"]


def test_catalog_restores_old_generation_when_live_missing(spark, tmp_path):
    """Crash in write()'s swap window (final renamed to .old, new tmp not
    yet renamed in): the .old dir is the only copy — the init sweep must
    restore it, not delete it."""
    wh = str(tmp_path / "wh")
    cat = Catalog(spark, wh)
    cat.write(spark.createDataFrame([(1,), (2,)], "x long"), "t")
    os.rename(cat.path("t"), cat.path("t") + ".old-deadbeef")

    recovered = Catalog(spark, wh)
    assert recovered.exists("t")
    assert recovered.read("t").count() == 2
    assert not os.path.exists(cat.path("t") + ".old-deadbeef")


def test_catalog_drops_old_generation_when_live_exists(spark, tmp_path):
    """Normal case: live dir present, the .old is garbage from a crash
    after the swap completed — sweep deletes it."""
    wh = str(tmp_path / "wh")
    cat = Catalog(spark, wh)
    cat.write(spark.createDataFrame([(1,)], "x long"), "t")
    cat.write(spark.createDataFrame([(9,), (8,)], "x long"), "t2")
    os.rename(cat.path("t2"), cat.path("t") + ".old-cafe0000")  # stale gen of t

    recovered = Catalog(spark, wh)
    assert recovered.read("t").count() == 1  # live generation wins
    assert not os.path.exists(cat.path("t") + ".old-cafe0000")


def test_resume_after_kill_between_entity_and_triple_write(spark, pages_df, tmp_path):
    """A first run killed after the entity_nodes write but before the
    triples write must be recoverable: the rerun rebuilds triples instead
    of crashing on the missing table."""
    wh = str(tmp_path / "wh")
    run_pipeline(spark, pages_df, wh, session_id="a")
    cat = Catalog(spark, wh)
    expected = cat.read("triples").count()
    # simulate the kill window: triples + ledger gone, entity_nodes kept
    cat.drop("triples")
    cat.drop("checkpoint_ledger")

    run_pipeline(spark, pages_df, wh, session_id="b")
    assert cat.exists("triples")
    assert cat.read("triples").count() == expected
