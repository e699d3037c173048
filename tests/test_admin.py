"""Admin verbs: init/status/backup/clean over a live warehouse."""

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
