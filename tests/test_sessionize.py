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
    q = (streaming_sessionize(stream)
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
