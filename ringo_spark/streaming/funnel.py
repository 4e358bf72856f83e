"""Stateful streaming conversion funnel with ``applyInPandasWithState``
— the streaming twin of :func:`ringo_spark.operators.session.
event_funnel_df` (r08/r09 VERDICT item: every batch analytic family has
a streaming story; the funnel was the last one without).

Why stateful and not a windowed aggregate: step N counts a user only
for events STRICTLY AFTER their earliest completion of step N−1 — the
qualification time is per-user derived state, not a window boundary, so
the operator class is the same as sessionization: per-key state folded
per micro-batch with Arrow-batched pandas.

State per user is O(#steps) longs: the earliest strictly-ordered
completion second of each step (the same (t1 < t2 < t3) chain the batch
decorrelation computes).  Each micro-batch folds the user's new events
in event-time order and emits the user's current progress row.

Ordering contract (documented, pytest-pinned): the fold is exact —
bit-equal to the batch funnel — when each user's events are processed
in event-time order ACROSS micro-batches (events inside one batch are
sorted by the kernel).  That holds for replays and for time-ordered
ingestion (Kafka per-key ordering, time-partitioned files).  Step-1
times are min-folded so in-order arrival fixes them immediately; later
steps qualify against already-final predecessor times.  Out-of-order
arrival across batches degrades exactly like every funnel product:
a straggler predecessor event admits followers only from later batches.

State lifecycle (the 100 TB requirement): with a watermark, a user's
funnel state expires via ``EventTimeTimeout`` once the watermark passes
``last activity + FUNNEL_IDLE_EXPIRE_SECONDS`` — the timeout emits the
user's final progress row and removes the key, keeping the store
O(users active within the horizon), not O(all users ever).  Pass
``watermark_delay=None`` for the unexpiring exact variant (bounded
replays / the batch-equality test).

Scale notes: the only shuffle is the groupBy(user_id) routing keys to
state partitions — identical to the batch funnel's single shared hash
partitioning; emitted rows are one per (user, batch), never per event.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.localrel import literal_df
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.session import FUNNEL_STEPS

FUNNEL_IDLE_EXPIRE_SECONDS = 6 * 3600   # conversion horizon before expiry

_STEP_IDX = {s: i for i, s in enumerate(FUNNEL_STEPS)}
_N = len(FUNNEL_STEPS)

FUNNEL_OUTPUT_SCHEMA = T.StructType(
    [T.StructField("user_id", T.LongType()),
     T.StructField("steps_reached", T.IntegerType())]
    + [T.StructField(f"t{i + 1}", T.LongType()) for i in range(_N)])

FUNNEL_STATE_SCHEMA = ", ".join(f"t{i + 1} LONG" for i in range(_N))

_OUT_COLS = [f.name for f in FUNNEL_OUTPUT_SCHEMA]


def _progress_row(user_id, ts):
    reached = 0
    for t in ts:
        if t is None:
            break
        reached += 1
    return (user_id, reached, *ts)


def make_funnel_kernel(expire: bool):
    """Kernel factory; ``expire`` wires the event-time timeout protocol
    (emit final progress + state.remove on timeout)."""

    def funnel_kernel(key, pdfs: Iterator[pd.DataFrame],
                      state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if expire and state.hasTimedOut:
            ts = list(state.get)
            state.remove()
            yield pd.DataFrame([_progress_row(user_id, ts)],
                               columns=_OUT_COLS)
            return

        ts = list(state.get) if state.exists else [None] * _N
        last = None
        # CONCAT then sort: one micro-batch's rows for a key arrive as
        # MULTIPLE Arrow chunks (maxRecordsPerBatch), and sorting each
        # chunk separately only absorbed disorder WITHIN a chunk — a
        # later chunk carrying earlier events broke the fold's in-batch
        # ordering guarantee exactly like cross-batch disorder (r18
        # review; the ema twin already concatenated)
        rows = [pdf[["sec", "event_type"]] for pdf in pdfs if len(pdf)]
        batch = pd.concat(rows) if rows else None
        if batch is not None:
            # in-batch disorder is absorbed here; the cross-batch
            # ordering contract is the module docstring's
            for sec, et in sorted(zip(batch["sec"], batch["event_type"])):
                sec = int(sec)
                i = _STEP_IDX.get(et)
                if i is None:
                    continue
                last = sec if last is None else max(last, sec)
                if i == 0:
                    if ts[0] is None or sec < ts[0]:
                        ts[0] = sec
                else:
                    prev = ts[i - 1]
                    if (prev is not None and sec > prev
                            and (ts[i] is None or sec < ts[i])):
                        ts[i] = sec
        state.update(tuple(ts))
        if expire:
            horizon = ((last or 0) + FUNNEL_IDLE_EXPIRE_SECONDS) * 1000
            state.setTimeoutTimestamp(
                max(horizon, state.getCurrentWatermarkMs() + 1))
        yield pd.DataFrame([_progress_row(user_id, ts)], columns=_OUT_COLS)

    return funnel_kernel


def streaming_event_funnel(stream_df: DataFrame,
                           watermark_delay: str | None = "10 minutes"
                           ) -> DataFrame:
    """``stream_df`` needs (user_id, ts, event_type).  Emits one
    progress row per (user, micro-batch): ``steps_reached`` plus the
    per-step earliest strictly-ordered completion seconds.  Aggregate
    with :func:`funnel_counts` for the batch funnel's output shape."""
    expire = watermark_delay is not None
    src = stream_df.withWatermark("ts", watermark_delay) if expire \
        else stream_df
    prepared = (src
                .where(F.col("user_id").isNotNull()
                       & F.col("event_type").isin(*FUNNEL_STEPS))
                .select("user_id", "ts",
                        F.unix_timestamp("ts").alias("sec"), "event_type"))
    timeout = (GroupStateTimeout.EventTimeTimeout if expire
               else GroupStateTimeout.NoTimeout)
    return (prepared.groupBy("user_id")
            .applyInPandasWithState(
                make_funnel_kernel(expire), FUNNEL_OUTPUT_SCHEMA,
                FUNNEL_STATE_SCHEMA, "append", timeout))


def funnel_counts(updates: DataFrame) -> DataFrame:
    """Collapse emitted progress rows to the batch funnel's schema
    (step_idx, step, users_reached, conversion_pct).  ``steps_reached``
    is monotone per user under the ordering contract, so the per-user
    max IS the final state; the explode fans each user into one row per
    step reached (bounded x#steps)."""
    spark = updates.sparkSession
    per_user = (updates.groupBy("user_id")
                .agg(F.max("steps_reached").alias("sr"))
                .where(F.col("sr") > 0))
    counts = (per_user
              .select(F.explode(F.sequence(F.lit(1), F.col("sr")))
                      .alias("step_idx"))
              .groupBy("step_idx")
              .agg(F.count(F.lit(1)).alias("users_reached")))
    names = literal_df(spark, 
        [(i + 1, s) for i, s in enumerate(FUNNEL_STEPS)],
        "step_idx int, step string")
    # left join from the step list: a step no user reached still emits
    # its zero row, exactly like the batch funnel's per-step aggregates
    full = (names.join(counts, "step_idx", "left")
            .select("step_idx", "step",
                    F.coalesce(F.col("users_reached"), F.lit(0))
                    .cast("long").alias("users_reached")))
    first = (full.where(F.col("step_idx") == 1)
             .select(F.col("users_reached").alias("step1_users")))
    # guarded division: on an empty (or pre-step-1) stream step1_users
    # is 0 and every users_reached is 0 too (steps are monotone from
    # step 1), so conversion is DEFINED as 0.0 rather than the null a
    # bare x/0 would give.  On any stream where step 1 was reached this
    # is identical to the batch funnel's unguarded division.
    return (full.crossJoin(F.broadcast(first))
            .select("step_idx", "step", "users_reached",
                    F.when(F.col("step1_users") > 0,
                           F.round(F.col("users_reached")
                                   / F.col("step1_users"), 6))
                    .otherwise(F.lit(0.0)).alias("conversion_pct")))
