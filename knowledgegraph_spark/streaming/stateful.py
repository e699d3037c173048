"""Stateful streaming operators: watermarked windowed aggregation and
gap sessionization over an unbounded event stream.

The reference has no streaming surface (its loop is batch-incremental);
these extend the engine to true event streams the Spark-native way:

  * ``windowed_counts`` — event-time tumbling/sliding window aggregation
    with a watermark bounding late data (built-in operators only: the
    state store, late-row dropping, and incremental emission all come
    from Structured Streaming).

  * ``sessionize_stream`` — gap-based sessions as a CUSTOM stateful
    operator via ``applyInPandasWithState`` (Arrow-batched, grouped
    state, event-time timeout).  This is the streaming twin of
    operators.temporal.sessionize: the batch version replays history
    with a window; this one carries per-key state forward and emits a
    session exactly once, when the gap (or the watermark) closes it.

Scale notes: state is partitioned by key across the cluster's state
store; each micro-batch touches only keys present in the batch plus
timed-out keys.  The watermark bounds state size — a key silent for
longer than (gap + watermark delay) is closed and evicted, so state
does not grow with the all-time key universe.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("session_start", T.TimestampType(), True),
        T.StructField("session_end", T.TimestampType(), True),
        T.StructField("n_events", T.LongType(), True),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType(), True),
        T.StructField("last_ms", T.LongType(), True),
        T.StructField("n_events", T.LongType(), True),
    ]
)


def windowed_counts(
    events: DataFrame,
    ts: str = "ts",
    key: str = "event_type",
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked event-time windowed counts per key.

    Works on both a streaming and a batch DataFrame (batch mode ignores
    the watermark), so the same plan is testable offline.
    """
    w = F.window(F.col(ts), window, slide) if slide else F.window(F.col(ts), window)
    src = events.withWatermark(ts, watermark) if events.isStreaming else events
    return (
        src.groupBy(w.alias("win"), F.col(key))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key,
            "n",
        )
    )


def _session_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState, gap_ms: int
) -> Iterator[pd.DataFrame]:
    """Grouped-state handler: fold this batch's timestamps into the open
    session, emit every session that closes (gap exceeded in-batch, or
    watermark timeout with no new data)."""
    user = key[0]
    cols = ["user_id", "session_start", "session_end", "n_events"]

    def row(start_ms: int, end_ms: int, n: int) -> list[Any]:
        return [
            user,
            pd.Timestamp(start_ms, unit="ms", tz="UTC").tz_localize(None),
            pd.Timestamp(end_ms, unit="ms", tz="UTC").tz_localize(None),
            n,
        ]

    if state.hasTimedOut:
        start_ms, last_ms, n = state.get
        state.remove()
        yield pd.DataFrame([row(start_ms, last_ms, n)], columns=cols)
        return

    ts_ms: list[int] = []
    for pdf in pdfs:
        ts_ms.extend(int(v.value // 1_000_000) for v in pdf["ts"])
    ts_ms.sort()

    start_ms, last_ms, n = state.get if state.exists else (None, None, 0)
    closed: list[list[Any]] = []
    for t in ts_ms:
        if start_ms is None:
            start_ms, last_ms, n = t, t, 1
        elif t - last_ms > gap_ms:
            closed.append(row(start_ms, last_ms, n))
            start_ms, last_ms, n = t, t, 1
        else:
            last_ms, n = t, n + 1
    state.update((start_ms, last_ms, n))
    # close the open session once the watermark passes last_ms + gap:
    # no on-time event can extend it after that point
    state.setTimeoutTimestamp(last_ms + gap_ms)
    if closed:
        yield pd.DataFrame(closed, columns=cols)


def sessionize_stream(
    events: DataFrame,
    ts: str = "ts",
    key: str = "user_id",
    gap_minutes: float = 30.0,
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap sessionization over a stream (applyInPandasWithState).

    Emits one row per CLOSED session: (user_id, session_start,
    session_end, n_events).  A session closes when a same-key event
    arrives more than ``gap_minutes`` later, or when the event-time
    watermark passes session_end + gap (event-time timeout) — whichever
    happens first.
    """
    gap_ms = int(gap_minutes * 60_000)

    def fn(k, pdfs, state):
        yield from _session_fn(k, pdfs, state, gap_ms)

    return (
        events.withWatermark(ts, watermark)
        .groupBy(key)
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
