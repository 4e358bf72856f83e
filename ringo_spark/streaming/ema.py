"""Stateful streaming per-user EMA — the streaming twin of
:func:`ringo_spark.operators.tpch.user_value_ema_df`, completing the
r10 verdict's moment/recursive-state family alongside
``streaming/anomaly.py``.

Why stateful: the EMA is an inherently sequential per-user fold
(``acc -> acc·(1-α) + v·α`` in (sec, event_id) order); streaming it
needs exactly one number of memory per user — the classic recursive
filter.  State is O(#users), never O(events).

Exactness contract: the kernel folds IEEE doubles with the literal
expression the batch operator's JVM ``F.aggregate`` lambda uses —
``acc * (1-α) + v * α``, same operand order — and Python floats ARE
IEEE doubles, so after an ordered full replay the streamed EMA is
BIT-EQUAL to the batch result (pytest-pinned across a three-micro-batch
event-time replay, including users whose ema is null).  A NULL value
poisons the fold exactly as in SQL (null · anything = null, sticky);
the kernel carries that as an explicit flag because a pandas NaN would
otherwise masquerade as a float.

Ordering contract (same as the funnel/retention twins, pytest-pinned):
batch-equality holds when each user's rows arrive in (sec, event_id)
order ACROSS micro-batches — a straggler older than the user's last
folded event would need the fold rewound, which no append-mode stream
can do.  In-batch disorder is absorbed (the kernel sorts each batch's
rows before folding).

State lifecycle: with a watermark, users idle past
``EMA_IDLE_EXPIRE_SECONDS`` are dropped (EventTimeTimeout; the running
EMA was emitted on every update, so expiry loses nothing already
reported).  ``watermark_delay=None`` keeps state forever.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.tpch import EMA_ALPHA

EMA_IDLE_EXPIRE_SECONDS = 21_600

EMA_OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("ema", T.DoubleType()),
    T.StructField("ema_is_null", T.BooleanType()),
])

EMA_STATE_SCHEMA = "n LONG, ema DOUBLE, has_null BOOLEAN"

_OUT_COLS = [f.name for f in EMA_OUTPUT_SCHEMA]


def make_ema_kernel(expire: bool):
    def ema_kernel(key, pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if expire and state.hasTimedOut:
            state.remove()   # running EMA already emitted on every update
            return

        if state.exists:
            n, ema, has_null = state.get
            n, ema, has_null = int(n), float(ema), bool(has_null)
        else:
            n, ema, has_null = 0, 0.0, False

        last_sec = 0
        rows = []
        for pdf in pdfs:
            if len(pdf):
                rows.append(pdf[["sec", "event_id", "v"]])
        if rows:
            batch = pd.concat(rows).sort_values(["sec", "event_id"])
            for v in batch["v"]:
                n += 1
                if pd.isna(v):
                    has_null = True     # null·(1-α) is null — sticky
                elif not has_null:
                    # the batch operator's exact JVM expression, same
                    # operand order, IEEE double in and out
                    ema = ema * (1 - EMA_ALPHA) + float(v) * EMA_ALPHA
            last_sec = int(batch["sec"].max())

        state.update((n, ema, has_null))
        if expire:
            horizon_ms = (last_sec + EMA_IDLE_EXPIRE_SECONDS) * 1000
            state.setTimeoutTimestamp(
                max(horizon_ms, state.getCurrentWatermarkMs() + 1))
        yield pd.DataFrame([(user_id, n, ema, has_null)], columns=_OUT_COLS)

    return ema_kernel


def streaming_user_value_ema(stream_df: DataFrame,
                             watermark_delay: str | None = "10 minutes"
                             ) -> DataFrame:
    """``stream_df`` needs (user_id, event_id, ts, value).  Emits the
    running (n_events, ema) per user each micro-batch; collapse with
    :func:`ema_snapshot`."""
    expire = watermark_delay is not None
    src = stream_df.withWatermark("ts", watermark_delay) if expire \
        else stream_df
    prepared = src.select("user_id", "ts", "event_id",
                          F.unix_timestamp("ts").alias("sec"),
                          F.col("value").cast("double").alias("v"))
    timeout = (GroupStateTimeout.EventTimeTimeout if expire
               else GroupStateTimeout.NoTimeout)
    return (prepared.groupBy("user_id")
            .applyInPandasWithState(
                make_ema_kernel(expire), EMA_OUTPUT_SCHEMA,
                EMA_STATE_SCHEMA, "append", timeout))


def ema_snapshot(updates: DataFrame) -> DataFrame:
    """Collapse emitted running rows to the batch operator's schema
    (user_id, n_events, ema): max-n row per user (n is monotone), null
    restored from the explicit flag, rounded like the batch output."""
    m = (updates.groupBy("user_id")
         .agg(F.max(F.struct("n_events", "ema", "ema_is_null")).alias("m")))
    return m.select(
        "user_id",
        F.col("m.n_events").cast("int").alias("n_events"),
        F.when(F.col("m.ema_is_null"), F.lit(None).cast("double"))
        .otherwise(F.round(F.col("m.ema"), 6)).alias("ema"))
