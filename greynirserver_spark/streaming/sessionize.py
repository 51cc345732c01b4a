"""Custom stateful streaming operator: gap-based sessionization.

The reference keeps per-client conversational state in a table and
fetches "last query within 30 minutes" per client
(queries/__init__.py:757-794) — a hand-rolled session notion. Here it
is the real thing: ``applyInPandasWithState`` groups events by user,
keeps (session_start, last_ts, n_events) as state, emits a session row
when the idle gap exceeds *gap* (or on event-time timeout), and scales
to any key cardinality because state is partitioned by the grouping
key.

``sessionize_batch`` is the batch-mode oracle: the classic
"gap > threshold -> new session" window trick (lag + cumulative sum),
used by the tests to validate the streaming operator's output.
"""

from __future__ import annotations

import datetime as dt
from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.window import Window

__all__ = ["sessionize_stream", "sessionize_batch", "SESSION_SCHEMA"]

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long"
)
_STATE_SCHEMA = "starts array<long>, lasts array<long>, ns array<long>"


def _session_step(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    gap_s: int,
) -> Iterator[pd.DataFrame]:
    """Per-user state update, correct for ANY arrival order inside the
    watermark.

    State holds every still-open session as parallel (start, last, n)
    arrays. Each invocation merges the batch's events into that interval
    set (classic interval merge: adjacent if the gap between spans is
    <= *gap*), then emits exactly the sessions the watermark has sealed
    (``last + gap < watermark`` — no event at or above the watermark can
    extend or bridge them). Closing on watermark passage rather than on
    the first gap-exceeding event is what makes out-of-order arrivals
    safe: a late event t inside an earlier session's gap window arrives
    before that session is sealed and merges into it, updating
    session_start via the interval min."""
    (user_id,) = key
    # state keeps MICROSECOND epochs: event times carry sub-second
    # precision and session boundaries must round-trip exactly
    gap_us = gap_s * 1_000_000
    ts_list = []
    for pdf in pdfs:
        ts_list.extend(
            int(t.value // 1000) for t in pd.to_datetime(pdf["ts"])
        )
    sessions: list = []
    if state.exists:
        starts, lasts, ns = state.get
        sessions = sorted(zip(starts, lasts, ns))
    if ts_list:
        spans = sorted(sessions + [(t, t, 1) for t in ts_list])
        sessions = []
        for s0, s1, n in spans:
            if sessions and s0 - sessions[-1][1] <= gap_us:
                p0, p1, pn = sessions[-1]
                sessions[-1] = (p0, max(p1, s1), pn + n)
            else:
                sessions.append((s0, s1, n))
    wm_ms = state.getCurrentWatermarkMs()
    wm_us = wm_ms * 1000
    closed = [
        (user_id, s0, s1, n) for s0, s1, n in sessions
        if s1 + gap_us < wm_us
    ]
    still_open = [(s0, s1, n) for s0, s1, n in sessions if s1 + gap_us >= wm_us]
    if still_open:
        state.update((
            [s[0] for s in still_open],
            [s[1] for s in still_open],
            [s[2] for s in still_open],
        ))
        # fire just past the earliest seal point (must exceed watermark)
        timeout_ms = min(s[1] + gap_us for s in still_open) // 1000 + 1
        state.setTimeoutTimestamp(max(timeout_ms, wm_ms + 1))
    elif state.exists:
        state.remove()
    if closed:
        epoch = dt.datetime(1970, 1, 1)
        yield pd.DataFrame(
            {
                "user_id": [c[0] for c in closed],
                "session_start": [
                    epoch + dt.timedelta(microseconds=c[1]) for c in closed
                ],
                "session_end": [
                    epoch + dt.timedelta(microseconds=c[2]) for c in closed
                ],
                "n_events": [c[3] for c in closed],
            }
        )


def sessionize_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming sessionization over (user_id, ts) with event-time
    timeout — sessions close either when a later event exceeds the gap
    or when the watermark passes session_end + gap."""
    gap_s = _parse_gap_seconds(gap)

    def fn(key, pdfs, state):
        yield from _session_step(key, pdfs, state, gap_s)

    # watermarks require TIMESTAMP (with timezone); parquet written with
    # TIMESTAMP_NTZ (as the driver's testdata is) must be cast
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _parse_gap_seconds(gap: str) -> int:
    n, unit = gap.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600}[unit]
    return int(n) * mult


def sessionize_batch(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Batch oracle: lag + cumulative-sum session ids (pure SQL shape)."""
    gap_us = _parse_gap_seconds(gap) * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts")
    # microsecond arithmetic: second-truncation would misplace session
    # boundaries on sub-second event times
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    with_gap = events.select("user_id", "ts").withColumn(
        "new_sess",
        (us - F.coalesce(F.lag(us).over(w), us) > gap_us).cast("int"),
    )
    with_id = with_gap.withColumn(
        "sess_id", F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
    )
    return (
        with_id.groupBy("user_id", "sess_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").cast("long").alias("n_events"),
        )
        .drop("sess_id")
    )
