"""Stateful streaming retention cohorts with ``applyInPandasWithState``
— the streaming twin of :func:`ringo_spark.operators.session.
retention_cohorts_df`.

Why stateful: a user's cohort is their FIRST active week — per-key
derived state — and each (cohort, offset) cell must count a user once
across the whole stream, which needs per-user memory of what was
already emitted.  Same operator class as the funnel twin.

State per user: the cohort week plus the set of week offsets already
emitted (bounded by the number of distinct weeks the stream spans —
tens of longs, not events).  Each micro-batch emits one
(user_id, cohort_wk, week_offset) row per NEWLY seen offset;
:func:`retention_counts` folds the emissions into the batch operator's
exact output shape.

Ordering contract (same as the funnel twin, pytest-pinned): equality
with the batch result holds when per-user arrival respects event-time
order across micro-batches — a straggler week EARLIER than the user's
current cohort would re-anchor the cohort and invalidate offsets
already emitted, which no append-mode stream can retract.  In-batch
disorder is absorbed (the kernel folds the batch's weeks as a set).

State lifecycle: with a watermark, a user idle past
``RETENTION_IDLE_EXPIRE_WEEKS`` is dropped from the store
(EventTimeTimeout; nothing to flush — emission happens on sight).  A
user returning after expiry would re-anchor a fresh cohort — the
standard bounded-state trade; pass ``watermark_delay=None`` for the
unexpiring exact variant.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

WEEK_SECONDS = 604800
RETENTION_IDLE_EXPIRE_WEEKS = 8

RETENTION_OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("cohort_wk", T.LongType()),
    T.StructField("week_offset", T.LongType()),
])

RETENTION_STATE_SCHEMA = "cohort LONG, seen ARRAY<BIGINT>"

_OUT_COLS = [f.name for f in RETENTION_OUTPUT_SCHEMA]


def make_retention_kernel(expire: bool):
    def retention_kernel(key, pdfs: Iterator[pd.DataFrame],
                         state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if expire and state.hasTimedOut:
            state.remove()   # emission already happened on sight
            return

        if state.exists:
            cohort, seen = state.get
            seen = set(int(x) for x in seen)
        else:
            cohort, seen = None, set()

        weeks = set()
        for pdf in pdfs:
            weeks.update(int(s) // WEEK_SECONDS for s in pdf["sec"])
        out = []
        if weeks:
            lo = min(weeks)
            if cohort is None or lo < cohort:
                # first sight (or an in-order stream's first batch for
                # this user); an out-of-order re-anchor would land here
                # too — the ordering contract above is what rules it out
                cohort = lo
            for wk in sorted(weeks):
                off = wk - cohort
                if off not in seen:
                    seen.add(off)
                    out.append((user_id, cohort, off))
        state.update((cohort, sorted(seen)))
        if expire:
            horizon_ms = ((max(weeks) + RETENTION_IDLE_EXPIRE_WEEKS)
                          * WEEK_SECONDS * 1000) if weeks else 0
            state.setTimeoutTimestamp(
                max(horizon_ms, state.getCurrentWatermarkMs() + 1))
        if out:
            yield pd.DataFrame(out, columns=_OUT_COLS)

    return retention_kernel


def streaming_retention(stream_df: DataFrame,
                        watermark_delay: str | None = "10 minutes"
                        ) -> DataFrame:
    """``stream_df`` needs (user_id, ts).  Emits one row per newly
    reached (user, week_offset) cell; aggregate with
    :func:`retention_counts`."""
    expire = watermark_delay is not None
    src = stream_df.withWatermark("ts", watermark_delay) if expire \
        else stream_df
    prepared = (src.where(F.col("user_id").isNotNull())
                .select("user_id", "ts",
                        F.unix_timestamp("ts").alias("sec")))
    timeout = (GroupStateTimeout.EventTimeTimeout if expire
               else GroupStateTimeout.NoTimeout)
    return (prepared.groupBy("user_id")
            .applyInPandasWithState(
                make_retention_kernel(expire), RETENTION_OUTPUT_SCHEMA,
                RETENTION_STATE_SCHEMA, "append", timeout))


def retention_counts(updates: DataFrame) -> DataFrame:
    """Collapse emitted (user, cohort, offset) rows to the batch
    operator's schema (cohort_wk, week_offset, active_users,
    cohort_size, retention).  Each cell row is unique per user by
    construction (the kernel's ``seen`` set), so a plain count matches
    the batch distinct semantics."""
    counts = (updates.groupBy("cohort_wk", "week_offset")
              .agg(F.count(F.lit(1)).alias("active_users")))
    # renamed join key: `size` derives from `counts`, and a self-join on
    # the shared column name trips attribute dedup on some sources
    # (memory-sink lineage) — the alias breaks the reference cycle
    size = (counts.where(F.col("week_offset") == 0)
            .select(F.col("cohort_wk").alias("__cw"),
                    F.col("active_users").alias("cohort_size")))
    return (counts.join(size, F.col("cohort_wk") == F.col("__cw"))
            .select("cohort_wk", "week_offset", "active_users",
                    "cohort_size",
                    F.round(F.col("active_users") / F.col("cohort_size"), 6)
                    .alias("retention")))
