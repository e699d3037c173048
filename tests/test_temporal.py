"""Temporal operators: as-of join snapshot semantics and sessionize
determinism under equal timestamps (ties are certain at web scale)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from knowledgegraph_spark.operators.temporal import asof_join, sessionize


def _ts(minute: int):
    return datetime.datetime(2026, 1, 1, 10, minute)


def test_asof_carries_one_right_row_not_a_mix(spark):
    """A NULL field in the latest right row must stay NULL — never filled
    from an older right row (single-struct carry, not per-column carry)."""
    left = spark.createDataFrame(
        [("u", _ts(30), "p1")], "user_id string, ts timestamp, purchase_id string"
    )
    right = spark.createDataFrame(
        [
            ("u", _ts(10), "old-a", "old-b"),
            ("u", _ts(20), "new-a", None),  # latest: b is genuinely NULL
        ],
        "user_id string, ts timestamp, a string, b string",
    )
    out = asof_join(left, right, key="user_id", ts="ts").collect()
    assert len(out) == 1
    assert out[0].a_asof == "new-a"
    assert out[0].b_asof is None  # a per-column carry would leak "old-b"


def test_asof_right_ties_resolved_by_tiebreak(spark):
    left = spark.createDataFrame(
        [("u", _ts(30), "p1")], "user_id string, ts timestamp, purchase_id string"
    )
    right = spark.createDataFrame(
        [("u", _ts(10), "c1"), ("u", _ts(10), "c9"), ("u", _ts(10), "c5")],
        "user_id string, ts timestamp, click_id string",
    ).repartition(4)
    out = asof_join(
        left, right, key="user_id", ts="ts",
        right_cols=["click_id"], right_tiebreak="click_id",
    ).collect()
    assert out[0].click_id_asof == "c9"  # greatest tiebreak wins


def test_asof_tie_at_left_ts_is_inclusive(spark):
    left = spark.createDataFrame(
        [("u", _ts(10), "p1")], "user_id string, ts timestamp, purchase_id string"
    )
    right = spark.createDataFrame(
        [("u", _ts(10), "c1")], "user_id string, ts timestamp, click_id string"
    )
    out = asof_join(left, right, key="user_id", ts="ts").collect()
    assert out[0].click_id_asof == "c1"


def test_asof_no_prior_right_is_null(spark):
    left = spark.createDataFrame(
        [("u", _ts(5), "p1")], "user_id string, ts timestamp, purchase_id string"
    )
    right = spark.createDataFrame(
        [("u", _ts(10), "c1")], "user_id string, ts timestamp, click_id string"
    )
    out = asof_join(left, right, key="user_id", ts="ts").collect()
    assert out[0].click_id_asof is None


def test_sessionize_tie_straddling_gap_boundary_is_deterministic(spark):
    """Three events share one timestamp right after a >gap silence.  The
    break lands on the tiebreak-first row, so every tied row gets the
    same session regardless of partition order."""
    rows = [
        ("u", _ts(0), "e0", 1.0),
        # 40-minute silence, then three simultaneous events
        ("u", _ts(40), "e3", 1.0),
        ("u", _ts(40), "e1", 1.0),
        ("u", _ts(40), "e2", 1.0),
    ]
    for perm in (rows, rows[::-1]):
        df = spark.createDataFrame(
            perm, "user_id string, ts timestamp, event_id string, value double"
        ).repartition(4)
        out = {
            r.event_id: r.session_seq
            for r in sessionize(
                df, key="user_id", ts="ts", gap_minutes=30.0, tiebreak="event_id"
            ).collect()
        }
        assert out == {"e0": 1, "e1": 2, "e2": 2, "e3": 2}


def test_sessionize_gap_splits_sessions(spark):
    df = spark.createDataFrame(
        [("u", _ts(0), "a", 1.0), ("u", _ts(10), "b", 1.0), ("u", _ts(50), "c", 1.0)],
        "user_id string, ts timestamp, event_id string, value double",
    )
    out = sessionize(df, key="user_id", ts="ts", gap_minutes=30.0, tiebreak="event_id")
    got = {r.event_id: (r.session_seq, r.session_id) for r in out.collect()}
    assert got["a"][0] == 1 and got["b"][0] == 1 and got["c"][0] == 2
    assert got["c"][1] == "u#2"
