"""Stateful streaming moments for z-score anomaly gating — the
streaming twin of :func:`ringo_spark.operators.relational.
anomaly_zscore_df` (VERDICT r10 item 5: the last analytic family
without a streaming expression; pattern follows
``streaming/retention.py``).

Why stateful: the z-score needs per-``event_type`` corpus moments
(n, Σv, Σv²), which stream as a classic incremental-moment recursion —
each micro-batch FOLDS its rows into three numbers per key, so state is
O(#event_types), never O(events).

Exactness contract: moments accumulate as INTEGERS — values are
decimal(18,2), carried as cents (``v·100``, int64) and Σv² as
ten-thousandths (``(v·100)²``, arbitrary-precision Python int,
serialized as a string in the state row so the STATE column never
overflows — but :func:`latest_moments` reconstructs it through a
``decimal(38,0)`` cast, so the kernel raises loudly past 38 digits
rather than let that cast silently NULL the key's z-scores; see the
OverflowError in the kernel).  :func:`moment_scores` reconstructs the exact
decimal sums and casts to double inside the SAME variance/z expressions
as the batch operator, so after a full replay the streamed scores are
BIT-EQUAL to the batch result (pytest-pinned across a three-micro-batch
event-time replay).

Emission model: every micro-batch emits the UPDATED running totals for
each key it touched (append-mode friendly); the latest row per key —
selected by max n, which is monotone — is the current stats snapshot.
Unlike the funnel/retention twins there is no ordering contract at all:
moment accumulation is commutative, so ANY arrival order converges to
the batch moments.

State lifecycle: with a watermark, a key idle past
``ANOMALY_IDLE_EXPIRE_SECONDS`` is dropped (EventTimeTimeout; totals
were already emitted on every update, so nothing is lost at expiry —
but a returning key restarts its moments from zero, the standard
bounded-state trade).  ``watermark_delay=None`` keeps state forever for
the exact variant.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ANOMALY_IDLE_EXPIRE_SECONDS = 21_600

MOMENTS_OUTPUT_SCHEMA = T.StructType([
    T.StructField("event_type", T.StringType()),
    T.StructField("n", T.LongType()),
    T.StructField("s1_cents", T.LongType()),
    T.StructField("s2_tt", T.StringType()),
])

MOMENTS_STATE_SCHEMA = "n LONG, s1_cents LONG, s2_tt STRING"

_OUT_COLS = [f.name for f in MOMENTS_OUTPUT_SCHEMA]


def make_moments_kernel(expire: bool):
    def moments_kernel(key, pdfs: Iterator[pd.DataFrame],
                       state: GroupState) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        if expire and state.hasTimedOut:
            state.remove()   # totals already emitted on every update
            return

        if state.exists:
            n, s1, s2_str = state.get
            n, s1, s2 = int(n), int(s1), int(s2_str)
        else:
            n, s1, s2 = 0, 0, 0

        last_sec = 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            cents = [int(c) for c in pdf["cents"]]
            n += len(cents)
            s1 += sum(cents)
            s2 += sum(c * c for c in cents)   # Python int: no overflow
            if expire:
                # Spark-computed epoch seconds (the `sec` column), like
                # the funnel/retention/ema twins — pandas .timestamp()
                # on the tz-naive ts would re-interpret local wall time
                # as UTC and shift the expiry horizon by the session
                # timezone offset
                last_sec = max(last_sec, int(pdf["sec"].max()))

        s2_str = str(s2)
        if len(s2_str) > 38:
            # latest_moments reconstructs s2 via a decimal(38,0) cast —
            # past 38 digits that cast would NULL (or ANSI-error) and
            # silently poison every downstream z-score for this key, so
            # fail loudly at the accumulation site instead (ADVICE r11).
            # 38 digits allows Σ(v·100)² ≈ 1e38: ~1e6 events at the
            # decimal(18,2) max magnitude, or ~1e18 typical-value events.
            raise OverflowError(
                f"anomaly moment Σ(v·100)² for key {event_type!r} needs "
                f"{len(s2_str)} digits; decimal(38,0) reconstruction in "
                "latest_moments caps at 38 — shard the key or rescale "
                "values before streaming")
        state.update((n, s1, s2_str))
        if expire:
            horizon_ms = (last_sec + ANOMALY_IDLE_EXPIRE_SECONDS) * 1000
            state.setTimeoutTimestamp(
                max(horizon_ms, state.getCurrentWatermarkMs() + 1))
        yield pd.DataFrame([(event_type, n, s1, s2_str)],
                           columns=_OUT_COLS)

    return moments_kernel


def streaming_anomaly_moments(stream_df: DataFrame,
                              watermark_delay: str | None = "10 minutes"
                              ) -> DataFrame:
    """``stream_df`` needs (event_type, ts, value).  Emits the running
    (n, Σv·100, Σv²·10⁴) per event_type each micro-batch; score with
    :func:`moment_scores`."""
    expire = watermark_delay is not None
    src = stream_df.withWatermark("ts", watermark_delay) if expire \
        else stream_df
    prepared = (src.where(F.col("value").isNotNull())
                .select(F.coalesce("event_type", F.lit("__UNKNOWN_VAL__"))
                        .alias("event_type"),
                        "ts",
                        F.unix_timestamp("ts").alias("sec"),
                        (F.col("value").cast("decimal(18,2)") * 100)
                        .cast("long").alias("cents")))
    timeout = (GroupStateTimeout.EventTimeTimeout if expire
               else GroupStateTimeout.NoTimeout)
    return (prepared.groupBy("event_type")
            .applyInPandasWithState(
                make_moments_kernel(expire), MOMENTS_OUTPUT_SCHEMA,
                MOMENTS_STATE_SCHEMA, "append", timeout))


def latest_moments(updates: DataFrame) -> DataFrame:
    """Current stats snapshot: the max-n (monotone) row per key, its
    integer totals reconstructed into the batch operator's exact decimal
    sums cast to double (s1 = Σv, s2 = Σv²)."""
    m = (updates.groupBy("event_type")
         .agg(F.max(F.struct("n", "s1_cents", "s2_tt")).alias("m"))
         .select("event_type", F.col("m.n").alias("n"),
                 F.col("m.s1_cents").alias("s1_cents"),
                 F.col("m.s2_tt").alias("s2_tt")))
    # exact rational -> double, same value path as the batch aggregate:
    # decimal division by a power of ten keeps every digit (result scale
    # >= operand scale + 6 under Spark decimal math), so the cast sees
    # the identical decimal value the batch SUM produced
    return m.select(
        "event_type",
        (F.col("s1_cents").cast("decimal(38,2)") / F.lit(100))
        .cast("double").alias("s1"),
        (F.col("s2_tt").cast("decimal(38,0)") / F.lit(10_000))
        .cast("double").alias("s2"),
        "n")


def moment_scores(events: DataFrame, updates: DataFrame) -> DataFrame:
    """Score ``events`` (event_id, event_type, value) against streamed
    moments — the batch ``anomaly_zscore_df`` output shape, with the
    IDENTICAL guarded variance/z expressions (relational.py) so a full
    replay is bit-equal to the batch result."""
    from ..operators.relational import ZSCORE_THRESHOLD

    ev = (events.where(F.col("value").isNotNull())
          .select("event_id",
                  F.coalesce("event_type", F.lit("__UNKNOWN_VAL__"))
                  .alias("event_type"),
                  F.col("value").cast("decimal(18,2)").alias("v")))
    stats = latest_moments(updates)
    var_expr = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) \
        / (F.col("n") - 1)
    z_expr = F.round((F.col("v").cast("double") - F.col("s1") / F.col("n"))
                     / F.sqrt(var_expr), 6)
    z = F.when(F.col("n") > 1, F.when(var_expr > 0, z_expr))
    return (ev.join(stats, "event_type")
            .select("event_id", "event_type",
                    F.col("v").cast("double").alias("value"),
                    z.alias("zscore"),
                    (F.abs(z) > ZSCORE_THRESHOLD).alias("is_anomaly")))
