"""Stateful streaming: watermarked windowed counts + applyInPandasWithState
gap sessionization (state carried across micro-batches, event-time
timeout closes idle sessions)."""

from __future__ import annotations

import datetime

from pyspark.sql import Row

from knowledgegraph_spark.streaming.stateful import sessionize_stream, windowed_counts


def _ts(h, m=0):
    return datetime.datetime(2026, 1, 1, h, m)


def test_windowed_counts_batch_semantics(spark):
    rows = [
        ("click", _ts(10, 1)),
        ("click", _ts(10, 4)),
        ("view", _ts(10, 12)),
        ("click", _ts(10, 14)),
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {
        (r.window_start.minute, r.event_type): r.n
        for r in windowed_counts(df, window="10 minutes").collect()
    }
    assert out == {(0, "click"): 2, (10, "view"): 1, (10, "click"): 1}


def test_sessionize_stream_across_micro_batches(spark, tmp_path):
    """Three single-file micro-batches: an in-batch gap closes the first
    session; the advancing watermark (event-time timeout) closes idle
    ones — each session emitted exactly once."""
    inp = tmp_path / "in"
    inp.mkdir()

    def write_file(name, rows):
        spark.createDataFrame(
            [Row(user_id=u, ts=t) for u, t in rows], "user_id string, ts timestamp"
        ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "stage" / name))
        import shutil, glob, os

        src = glob.glob(str(tmp_path / "stage" / name / "part-*.parquet"))[0]
        shutil.copy(src, str(inp / f"{name}.parquet"))

    write_file("f1", [("u", _ts(10, 0)), ("u", _ts(10, 5)), ("w", _ts(10, 2))])
    write_file("f2", [("u", _ts(12, 0))])  # >30 min gap: closes u's first session
    write_file("f3", [("z", _ts(15, 0))])  # watermark → 14:00: times out u2 + w

    stream = (
        spark.readStream.schema("user_id string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(inp))
    )
    sessions = sessionize_stream(stream, gap_minutes=30.0, watermark="1 hour")
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    # closed in-batch by the 12:00 event
    assert ("u", _ts(10, 0), _ts(10, 5), 2) in got
    # closed by event-time timeout once the watermark passed end+gap
    assert ("w", _ts(10, 2), _ts(10, 2), 1) in got
    assert ("u", _ts(12, 0), _ts(12, 0), 1) in got
    # no session emitted twice
    users = [g[0] for g in got]
    assert len(users) == len(set((g[0], g[1]) for g in got))
