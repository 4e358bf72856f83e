"""Sessionization: the stateful-streaming operator's closed sessions must
agree with the batch window-function formulation."""

import pytest
from pyspark.sql import functions as F

from ringo_spark.catalog import load_catalog
from ringo_spark.operators.session import sessionize_df
from ringo_spark.streaming.sessionize import streaming_sessionize
from ringo_spark.testbed import EVENTS

SF = "/root/testdata/sf0.001"


def test_batch_sessions_cover_all_events(spark):
    out = sessionize_df(spark, SF)
    total = spark.read.parquet(f"{SF}/events.parquet").count()
    assert out.agg(F.sum("n_events")).collect()[0][0] == total
    rows = out.collect()
    assert all(r.duration_sec >= 0 for r in rows)
    # session indexes are 1..k per user, contiguous
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r.session_idx)
    for idxs in by_user.values():
        assert sorted(idxs) == list(range(1, len(idxs) + 1))


def test_streaming_stateful_matches_batch_closed_sessions(spark, tmp_path):
    src = str(tmp_path / "src")
    ev = load_catalog(spark, SF, [EVENTS])["events"] \
        .select("user_id", "ts", "value")
    ev.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (streaming_sessionize(stream, watermark_delay=None)
         .writeStream.format("memory").queryName("sessions")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.user_id, r.session_start_sec, r.session_end_sec, r.n_events)
           for r in spark.sql("select * from sessions").collect()}

    batch = sessionize_df(spark, SF).collect()
    # the stream (NoTimeout) emits only *closed* sessions: every batch
    # session except each user's final one
    last_per_user = {}
    for r in batch:
        cur = last_per_user.get(r.user_id)
        if cur is None or r.session_idx > cur.session_idx:
            last_per_user[r.user_id] = r
    expect = {(r.user_id, r.session_start_sec, r.session_end_sec, r.n_events)
              for r in batch if last_per_user[r.user_id].session_idx != r.session_idx}
    assert got == expect


def test_streaming_idle_sessions_flush_and_state_is_dropped(spark, tmp_path):
    """EventTimeTimeout: when the watermark passes last_seen + gap, the idle
    session flushes and its state is removed; still-active keys stay."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)

    def at(s):
        return t0 + dt.timedelta(seconds=s)

    # user 1: session A (0s, 100s), then gap, session B (10_000s) -> idle
    # user 2: event at 20_000s -> advances the watermark; stays active
    rows = [(1, at(0), 1.0), (1, at(100), 2.0), (1, at(10_000), 3.0),
            (2, at(20_000), 4.0)]
    src = str(tmp_path / "expiry_src")
    spark.createDataFrame(rows, "user_id long, ts timestamp, value double") \
        .coalesce(1).write.parquet(src)

    stream = (spark.readStream
              .schema("user_id long, ts timestamp, value double").parquet(src))
    q = (streaming_sessionize(stream, watermark_delay="60 seconds")
         .writeStream.format("memory").queryName("expiry_sessions")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.user_id, r.session_start_sec, r.session_end_sec, r.n_events,
            r.value_sum)
           for r in spark.sql("select * from expiry_sessions").collect()}

    base = int(t0.replace(tzinfo=dt.timezone.utc).timestamp())
    assert got == {
        # session A closed in-batch by the gap rule
        (1, base, base + 100, 2, 3.0),
        # session B flushed by the event-time timeout (watermark 19940s
        # passed 10_000 + 1800), state removed
        (1, base + 10_000, base + 10_000, 1, 3.0),
        # user 2's open session (timeout 21_800 > watermark) is NOT emitted
    }
    # state store retains only the still-active key (user 2)
    progress = q.lastProgress
    assert progress["stateOperators"][0]["numRowsTotal"] == 1


def test_native_session_window_agrees_with_two_window_form(spark):
    """The built-in session_window operator and the classic two-window
    formulation agree EXACTLY — session_window merges touching windows,
    so both split only at strictly-greater-than-gap (verified at sf0.1
    where a pair lands exactly on the boundary; r15).  Session sets
    must correspond 1:1 and both partitions count every event once."""
    from pyspark.sql import functions as F

    from ringo_spark.operators.session import (
        SESSION_GAP_SECONDS, sessionize_df, sessionize_native_df,
    )

    SF = "/root/testdata/sf0.001"
    classic = sessionize_df(spark, SF).collect()
    native = sessionize_native_df(spark, SF).collect()
    total = (spark.read.parquet(f"{SF}/events.parquet").count())
    assert sum(r.n_events for r in classic) == total
    assert sum(r.n_events for r in native) == total
    # identical boundary rule -> identical session partitions; only the
    # end encoding differs (native end = last event + gap, exclusive)
    assert len(native) == len(classic)
    c = {(r.user_id, r.session_start_sec, r.session_end_sec, r.n_events)
         for r in classic}
    n = {(r.user_id, r.session_start_sec,
          r.session_end_sec - SESSION_GAP_SECONDS, r.n_events)
         for r in native}
    assert n == c
