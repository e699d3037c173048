"""Exports, multimodal plumbing, skew helpers, metrics, streaming."""

import pytest
from pyspark.sql import functions as F

from knowledgegraph_spark.checkpoint import record_metrics, stage_summary
from knowledgegraph_spark.operators.multimodal import (
    audio_features,
    image_features,
    sample_frames,
)
from knowledgegraph_spark.operators.skew import head_keys, salted_agg
from knowledgegraph_spark.sources.catalog import Catalog
from knowledgegraph_spark.sources.exports import (
    export_json,
    export_partitioned_json,
    export_selected_json,
    read_extraction_results,
    read_jsonl,
)


def test_export_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", "en"), (2, "b", "de")], "id long, text string, lang string"
    )
    p = str(tmp_path / "j")
    export_json(df, p)
    back = read_jsonl(spark, p)
    assert back.count() == 2

    p2 = str(tmp_path / "part")
    export_partitioned_json(df, p2, by="lang")
    back2 = read_jsonl(spark, p2 + "/lang=en")
    assert back2.count() == 1

    p3 = str(tmp_path / "sel")
    export_selected_json(df, p3, ["id"])
    assert read_jsonl(spark, p3).columns == ["id"]


def test_read_extraction_envelope(spark, tmp_path):
    p = tmp_path / "dump.json"
    p.write_text('{"results": [{"item_id": "a", "n": 1}, {"item_id": "b", "n": 2}]}')
    df = read_extraction_results(spark, str(p))
    assert sorted(r.item_id for r in df.collect()) == ["a", "b"]


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        ("m1", "image", b"\x01\x02\x03\x04" * 100, "image/png", 10, 10, None),
        ("m2", "image", None, "image/png", None, None, None),
        ("m3", "video", b"\xff" * 20000, "video/mp4", None, None, 1000),
        ("m4", "audio", b"\x05\x06" * 64, "audio/wav", None, None, 2000),
    ]
    from knowledgegraph_spark.operators.multimodal import MEDIA_SCHEMA

    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_image_features_shape_and_determinism(spark, media_df):
    got = {r.media_id: r for r in image_features(media_df).collect()}
    assert set(got) == {"m1", "m2"}
    assert got["m1"].n_bytes == 400
    assert len(got["m1"].feature) == 16
    assert got["m2"].feature is None
    again = {r.media_id: r for r in image_features(media_df).collect()}
    assert got["m1"].feature == again["m1"].feature


def test_frame_sampling_explodes(spark, media_df):
    frames = sample_frames(media_df, every_n_bytes=4096, max_frames=8).collect()
    assert {f.media_id for f in frames} == {"m3"}
    assert len(frames) == 4  # 20000 // 4096
    assert all(len(f.frame_payload) > 0 for f in frames)


def test_audio_features(spark, media_df):
    got = audio_features(media_df).collect()
    assert len(got) == 1 and got[0].media_id == "m4"


def test_salted_agg_equals_plain(spark):
    df = spark.createDataFrame(
        [("k1", f"u{i % 7}") for i in range(100)] + [("k2", "u0")],
        "name string, url string",
    )
    plain = {
        r.name: sorted(r.urls)
        for r in df.groupBy("name")
        .agg(F.collect_set("url").alias("urls"))
        .collect()
    }
    salted = {
        r.name: sorted(r.urls)
        for r in salted_agg(
            df,
            ["name"],
            lambda: [F.collect_set("url").alias("urls")],
            lambda: [
                F.array_distinct(F.flatten(F.collect_list("urls"))).alias("urls")
            ],
            n_salts=8,
            salt_source="url",
        ).collect()
    }
    assert plain == salted


def test_head_keys(spark):
    df = spark.createDataFrame(
        [("hot",)] * 50 + [("cold",)] * 2, "k string"
    )
    hot = [r.k for r in head_keys(df, ["k"], min_count=10).collect()]
    assert hot == ["hot"]


def test_metrics_and_summary(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame([(i,) for i in range(100)], "x long").repartition(4)
    record_metrics(cat, df, "s1", "extract")
    record_metrics(cat, df, "s1", "fold")
    summary = {r.stage: r for r in stage_summary(cat).collect()}
    assert summary["extract"].rows == 100
    assert summary["extract"].n_partitions == 4


def test_streaming_foreachbatch(spark, tmp_path, corpus, pages_df):
    from knowledgegraph_spark.streaming.incremental import stream_pages

    inp = str(tmp_path / "in")
    pages_df.write.mode("overwrite").parquet(inp)
    wh = str(tmp_path / "wh")
    q = stream_pages(spark, inp, wh, str(tmp_path / "ckpt"), trigger_once=True)
    q.awaitTermination(300)
    cat = Catalog(spark, wh)
    assert cat.exists("triples") and cat.read("triples").count() > 0


def test_micro_batches_equal_oneshot(spark, tmp_path, pages_df):
    from knowledgegraph_spark.plans.pipeline import run_pipeline
    from knowledgegraph_spark.streaming.incremental import run_micro_batches

    cat_mb = run_micro_batches(spark, pages_df, str(tmp_path / "mb"), n_batches=3)
    cat_one = run_pipeline(spark, pages_df, str(tmp_path / "one"), session_id="x")
    t_mb = {(r.subj, r.pred, r.obj) for r in cat_mb.read("triples").collect()}
    t_one = {(r.subj, r.pred, r.obj) for r in cat_one.read("triples").collect()}
    assert t_mb == t_one
