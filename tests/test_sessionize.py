"""Stateful streaming sessionization vs the batch window oracle."""

import datetime as dt
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from greynirserver_spark.streaming.sessionize import (
    sessionize_batch,
    sessionize_stream,
)


def _events_rows():
    """Two users, clear sessions separated by > 30 min gaps."""
    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = []
    # user 1: session A (3 events), 2h gap, session B (2 events)
    for off in (0, 5, 10):
        rows.append((1, t0 + off * m))
    for off in (130, 140):
        rows.append((1, t0 + off * m))
    # user 2: one long session (4 events, max gap 20m)
    for off in (0, 20, 40, 55):
        rows.append((2, t0 + off * m))
    # user 1: session C far later (forces B to close via gap)
    rows.append((1, t0 + 400 * m))
    # sentinel event far in the future: pushes the watermark past all
    # real sessions so event-time timeouts fire in availableNow mode
    rows.append((99, t0 + dt.timedelta(days=2)))
    return rows


def test_batch_oracle(spark):
    ev = spark.createDataFrame(_events_rows(), "user_id long, ts timestamp")
    got = {
        (r.user_id, r.session_start.minute, r.n_events)
        for r in sessionize_batch(ev, "30 minutes").collect()
        if r.user_id != 99
    }
    assert (1, 0, 3) in got          # session A
    assert (1, 10, 2) in got         # session B (starts 12:10 -> minute 10)
    assert (2, 0, 4) in got
    assert sum(1 for u, *_ in got if u == 1) == 3


def test_stream_matches_batch_for_closed_sessions(spark, tmp_path):
    ev = spark.createDataFrame(_events_rows(), "user_id long, ts timestamp")
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ev.write.parquet(in_dir)

    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(in_dir)
    q = (
        sessionize_stream(stream, gap="30 minutes", watermark="1 minute")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize_batch(ev, "30 minutes").collect()
    }
    # every streamed session must be a true session; with the sentinel
    # pushing the watermark, all real-user sessions close
    assert got <= batch
    real_users = {(u, a, b, n) for (u, a, b, n) in batch if u != 99}
    assert real_users <= got, (sorted(got), sorted(real_users))


def test_stream_merges_late_out_of_order_event(spark, tmp_path):
    """Advisory repro: an event EARLIER than the open session's start
    arrives in a later micro-batch (still inside the watermark). The
    session must extend backward (start = min) instead of keeping the
    old start or splitting."""
    import time

    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)
    m = dt.timedelta(minutes=1)
    in_dir = tmp_path / "in2"
    in_dir.mkdir()
    out_dir = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")

    batch1 = [(1, t0), (1, t0 + 10 * m)]
    batch2 = [(1, t0 - 10 * m), (99, t0 + dt.timedelta(days=2))]
    spark.createDataFrame(batch1, "user_id long, ts timestamp").coalesce(
        1
    ).write.parquet(str(in_dir / "f1"))
    time.sleep(1.1)  # distinct mtimes -> deterministic file order
    spark.createDataFrame(batch2, "user_id long, ts timestamp").coalesce(
        1
    ).write.parquet(str(in_dir / "f2"))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir / "*"))
    )
    q = (
        sessionize_stream(stream, gap="30 minutes", watermark="2 hours")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(out_dir).collect()
        if r.user_id == 1
    }
    assert got == {(1, t0 - 10 * m, t0 + 10 * m, 3)}, sorted(got)
