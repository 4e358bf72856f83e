"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

This is the operator class Spark's built-ins can't express as a windowed
aggregation: session boundaries depend on arbitrary per-key state (the
last-seen event time), so each user's state — (session start, last seen,
event count, value sum) — lives in the state store, updated per
micro-batch with Arrow-batched pandas, emitting a row whenever a gap
closes a session.

Batch twin (oracle-checked): :mod:`ringo_spark.operators.session`.

Scale notes: state is O(active users) and constant per key; the only
shuffle is the groupBy(user_id) routing each key to its state partition.
A production deployment adds ``GroupStateTimeout.EventTimeTimeout`` +
``withWatermark`` so idle sessions flush and state is reclaimed; the
structure is identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SECONDS = 1800

OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start_sec", T.LongType()),
    T.StructField("session_end_sec", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("value_sum", T.DoubleType()),
])

# state: (session_start_sec, last_sec, n_events, value_sum)
STATE_SCHEMA = "start LONG, last LONG, n LONG, vsum DOUBLE"


def sessionize_kernel(key, pdfs: Iterator[pd.DataFrame],
                      state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        start, last, n, vsum = state.get
    else:
        start, last, n, vsum = None, None, 0, 0.0

    closed = []
    for pdf in pdfs:
        for sec, value in sorted(zip(pdf["sec"], pdf["value"])):
            sec = int(sec)
            if last is not None and sec - last > SESSION_GAP_SECONDS:
                closed.append((user_id, start, last, n, vsum))
                start, n, vsum = sec, 0, 0.0
            if start is None:
                start = sec
            last = sec
            n += 1
            vsum += float(value)
    state.update((start, last, n, vsum))
    if closed:
        yield pd.DataFrame(closed, columns=[f.name for f in OUTPUT_SCHEMA])


def streaming_sessionize(stream_df: DataFrame) -> DataFrame:
    """stream_df needs columns (user_id, ts, value)."""
    prepared = stream_df.select(
        "user_id", F.unix_timestamp("ts").alias("sec"),
        F.col("value").cast("double").alias("value"))
    return (prepared.groupBy("user_id")
            .applyInPandasWithState(
                sessionize_kernel, OUTPUT_SCHEMA, STATE_SCHEMA,
                "append", GroupStateTimeout.NoTimeout))
