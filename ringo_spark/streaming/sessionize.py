"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

This is the operator class Spark's built-ins can't express as a windowed
aggregation: session boundaries depend on arbitrary per-key state (the
last-seen event time), so each user's state — (session start, last seen,
event count, value sum) — lives in the state store, updated per
micro-batch with Arrow-batched pandas, emitting a row whenever a gap
closes a session.

Batch twin (oracle-checked): :mod:`ringo_spark.operators.session`.

State lifecycle (the 100 TB requirement): by default the stream runs with
``withWatermark`` + ``GroupStateTimeout.EventTimeTimeout`` — when the
watermark passes a user's ``last_seen + gap``, the open session flushes
and the key's state is **removed**, so the state store stays O(currently
active users), not O(all users ever seen).  Pass ``watermark_delay=None``
for the unexpiring variant (exact closed-session semantics for bounded
replays/tests).

Scale notes: state is O(active users) and constant per key; the only
shuffle is the groupBy(user_id) routing each key to its state partition.
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

_OUT_COLS = [f.name for f in OUTPUT_SCHEMA]


def make_sessionize_kernel(expire: bool):
    """Kernel factory: ``expire`` wires the event-time timeout protocol
    (flush + state.remove on timeout, re-arm after each batch)."""

    def sessionize_kernel(key, pdfs: Iterator[pd.DataFrame],
                          state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if expire and state.hasTimedOut:
            # watermark passed last_seen + gap: the session is closed by
            # time, not by a newer event — emit it and reclaim the state
            start, last, n, vsum = state.get
            state.remove()
            yield pd.DataFrame([(user_id, start, last, n, vsum)],
                               columns=_OUT_COLS)
            return

        if state.exists:
            start, last, n, vsum = state.get
        else:
            start, last, n, vsum = None, None, 0, 0.0

        closed = []
        # CONCAT then sort: a micro-batch's rows for one key can span
        # multiple Arrow chunks — per-chunk sorting left cross-chunk
        # disorder unabsorbed, splitting sessions at chunk boundaries
        # (r18 review; same fix as the funnel twin)
        rows = [pdf[["sec", "value"]] for pdf in pdfs if len(pdf)]
        if rows:
            batch = pd.concat(rows)
            for sec, value in sorted(zip(batch["sec"], batch["value"])):
                sec = int(sec)
                if last is not None and sec - last > SESSION_GAP_SECONDS:
                    closed.append((user_id, start, last, n, vsum))
                    start, n, vsum = sec, 0, 0.0
                if start is None:
                    start = sec
                last = sec
                n += 1
                if not pd.isna(value):
                    # SQL sum skips nulls; float(NaN) would poison vsum
                    # where the batch twin's sum(value) ignores the row
                    vsum += float(value)
        state.update((start, last, n, vsum))
        if expire:
            # flush when the watermark passes the gap after the last event
            # (never set a timeout at/behind the current watermark)
            state.setTimeoutTimestamp(
                max((last + SESSION_GAP_SECONDS) * 1000,
                    state.getCurrentWatermarkMs() + 1))
        if closed:
            yield pd.DataFrame(closed, columns=_OUT_COLS)

    return sessionize_kernel


def streaming_sessionize(stream_df: DataFrame,
                         watermark_delay: str | None = "10 minutes") -> DataFrame:
    """stream_df needs columns (user_id, ts, value).

    ``watermark_delay`` bounds event lateness; the watermark it drives
    both drops late data and expires idle-session state.  ``None``
    disables expiry (state then grows with the number of distinct keys —
    bounded-replay use only)."""
    expire = watermark_delay is not None
    src = stream_df.withWatermark("ts", watermark_delay) if expire else stream_df
    prepared = src.select(
        "user_id", "ts", F.unix_timestamp("ts").alias("sec"),
        F.col("value").cast("double").alias("value"))
    timeout = (GroupStateTimeout.EventTimeTimeout if expire
               else GroupStateTimeout.NoTimeout)
    return (prepared.groupBy("user_id")
            .applyInPandasWithState(
                make_sessionize_kernel(expire), OUTPUT_SCHEMA, STATE_SCHEMA,
                "append", timeout))
