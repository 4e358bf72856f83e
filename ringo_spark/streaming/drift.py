"""Stateful streaming twin of the per-source ingestion drift gate —
:func:`ringo_spark.operators.text.text_quality_drift_df` (VERDICT r11
item 4: the one new-family operator without a streaming counterpart;
its integer-moment state is exactly the ``streaming/anomaly.py``
pattern).

Why stateful: the gate compares the INCOMING batch's mean token count
per source against a fixed already-ingested baseline.  The baseline
moments (n, Σt, Σt²) are computed once, batch-side; the incoming stream
folds into two integers per source — (n_batch, Σt) — so state is
O(#sources), never O(documents).

Exactness contract: token counts are exact ints (the same JVM
``tokens()`` expression as the batch gate, evaluated BEFORE the Python
kernel so the hot path stays vectorized); the kernel only sums int64s.
:func:`drift_scores` reconstructs the batch operator's identical
guarded mean/variance/z expressions, so after a full replay the
streamed verdicts are BIT-EQUAL to the batch gate (pytest-pinned across
a hash-split three-micro-batch replay — like the anomaly twin, moment
accumulation is commutative, so NO ordering contract is needed).

Σt bounds: int64 state holds ~9.2e18 — at 10⁴ tokens/doc that is
~10¹⁴ documents per source before overflow, far past any real source;
unlike the anomaly twin there is no squared term on the streamed side
(Σt² lives in the batch-computed baseline), so no string-int carry is
needed.

State lifecycle: with a watermark, a source idle past
``DRIFT_IDLE_EXPIRE_SECONDS`` is dropped (EventTimeTimeout; totals were
emitted on every update, so expiry loses nothing already reported).
``watermark_delay=None`` keeps state forever for the exact variant.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DRIFT_IDLE_EXPIRE_SECONDS = 21_600

TOTALS_OUTPUT_SCHEMA = T.StructType([
    T.StructField("source", T.StringType()),
    T.StructField("n_batch", T.LongType()),
    T.StructField("sn", T.LongType()),
])

TOTALS_STATE_SCHEMA = "n_batch LONG, sn LONG"

_OUT_COLS = [f.name for f in TOTALS_OUTPUT_SCHEMA]


def make_totals_kernel(expire: bool):
    def totals_kernel(key, pdfs: Iterator[pd.DataFrame],
                      state: GroupState) -> Iterator[pd.DataFrame]:
        (source,) = key
        if expire and state.hasTimedOut:
            state.remove()   # totals already emitted on every update
            return

        n, sn = state.get if state.exists else (0, 0)
        n, sn = int(n), int(sn)

        last_sec = 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            # null token counts (null text -> size(tokens(null)) is
            # NULL): SQL count(*) includes the doc while sum(t) skips
            # it, so fold them as count-1/contribute-0 — int(NaN) used
            # to crash the kernel where the batch gate scored fine (r18
            # review)
            tvals = pdf["t"]
            n += len(tvals)
            sn += int(tvals.fillna(0).sum())
            if expire:
                # Spark-computed epoch seconds, like the anomaly twin
                # (pandas .timestamp() on tz-naive wall time would shift
                # the horizon by the session timezone offset)
                last_sec = max(last_sec, int(pdf["sec"].max()))

        state.update((n, sn))
        if expire:
            horizon_ms = (last_sec + DRIFT_IDLE_EXPIRE_SECONDS) * 1000
            state.setTimeoutTimestamp(
                max(horizon_ms, state.getCurrentWatermarkMs() + 1))
        yield pd.DataFrame([(source, n, sn)], columns=_OUT_COLS)

    return totals_kernel


def streaming_batch_token_totals(stream_df: DataFrame,
                                 watermark_delay: str | None = "10 minutes"
                                 ) -> DataFrame:
    """``stream_df`` needs (source, ts, text).  Emits the running
    (n_batch, Σ token count) per source each micro-batch; score with
    :func:`drift_scores`."""
    from ..operators.textfn import tokens

    expire = watermark_delay is not None
    src = stream_df.withWatermark("ts", watermark_delay) if expire \
        else stream_df
    prepared = (src.select(
        F.coalesce("source", F.lit("__UNKNOWN_SRC__")).alias("source"),
        "ts",
        F.unix_timestamp("ts").alias("sec"),
        F.size(tokens(F.col("text"))).cast("long").alias("t")))
    timeout = (GroupStateTimeout.EventTimeTimeout if expire
               else GroupStateTimeout.NoTimeout)
    return (prepared.groupBy("source")
            .applyInPandasWithState(
                make_totals_kernel(expire), TOTALS_OUTPUT_SCHEMA,
                TOTALS_STATE_SCHEMA, "append", timeout))


def latest_totals(updates: DataFrame) -> DataFrame:
    """Current totals snapshot: the max-n (monotone) row per source."""
    return (updates.groupBy("source")
            .agg(F.max(F.struct("n_batch", "sn")).alias("m"))
            .select("source", F.col("m.n_batch").alias("n_batch"),
                    F.col("m.sn").alias("sn")))


def drift_scores(baseline_docs: DataFrame, updates: DataFrame) -> DataFrame:
    """Score the streamed batch totals against the fixed baseline cohort
    — the batch ``text_quality_drift_df`` output shape with the
    IDENTICAL guarded mean/variance/z expressions (operators/text.py),
    so a full replay of the batch cohort is bit-equal to the batch gate.

    ``baseline_docs`` is the already-ingested cohort (source, text) —
    its exact integer moments aggregate once, to #sources rows; only
    sources present in BOTH cohorts emit (inner join), matching the
    batch gate's n_base > 0 AND n_batch > 0 filter."""
    from ..operators.text import DRIFT_Z_THRESHOLD
    from ..operators.textfn import tokens

    t = F.size(tokens(F.col("text"))).cast("long")
    # same null-source sentinel as the streamed side and the batch gate —
    # a raw-null baseline group would never join the streamed
    # '__UNKNOWN_SRC__' totals and the verdict would silently drop
    # (ADVICE r12; pinned by test_drift_null_source_round_trip)
    base = (baseline_docs.select(
                F.coalesce("source", F.lit("__UNKNOWN_SRC__"))
                .alias("source"), t.alias("t"))
            .groupBy("source")
            .agg(F.count("*").alias("n_base"),
                 F.sum("t").alias("s1"),
                 F.sum(F.col("t") * F.col("t")).alias("s2")))
    totals = latest_totals(updates).where(F.col("n_batch") > 0)
    base_mean = F.col("s1").cast("double") / F.col("n_base")
    batch_mean = F.col("sn").cast("double") / F.col("n_batch")
    var = ((F.col("s2").cast("double")
            - F.col("s1").cast("double") * F.col("s1") / F.col("n_base"))
           / (F.col("n_base") - 1))
    z_expr = F.round((batch_mean - base_mean)
                     / F.sqrt(var / F.col("n_batch")), 6)
    z = F.when(F.col("n_base") > 1, F.when(var > 0, z_expr))
    return (base.join(totals, "source")
            .select("source", "n_base", "n_batch",
                    F.round(base_mean, 6).alias("base_mean_tokens"),
                    F.round(batch_mean, 6).alias("batch_mean_tokens"),
                    z.alias("drift_z"),
                    (F.abs(z) > DRIFT_Z_THRESHOLD).alias("drifted"))
            .orderBy("source"))
