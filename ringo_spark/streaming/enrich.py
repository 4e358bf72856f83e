"""Streaming point-in-time enrichment against an SCD2 dimension.

The batch engine proves PIT semantics in ``scd2_fact_incremental``
(operators/relational.py); this is its streaming twin: a stream-static
LEFT join that stamps every streaming fact row with the dimension
attribute that was valid AT EVENT TIME (not the current one — the
classic training-data leak is enriching history with today's dim).

Scale notes: the interval table is dimension-sized, so the static side
broadcasts into every micro-batch — the stream never shuffles for the
join, and row-level enrichment is stateless (no watermark, no state
store; add ``withWatermark`` + windowed aggregation downstream when the
enriched stream feeds a rollup).  The UNKNOWN sentinel mirrors the fact
loader's ``-1`` missing-dimension convention, so row counts are
conserved through the enrichment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_pit_enrich(stream_df: DataFrame, intervals: DataFrame,
                         key: str, time_col: str, attr: str,
                         sentinel: str = "UNKNOWN") -> DataFrame:
    """Enrich ``stream_df`` with ``attr`` from the SCD2 ``intervals``
    frame (columns: ``key``, ``attr``, ``valid_from``, ``valid_to`` with
    NULL meaning open-ended) — each row gets the attribute valid at its
    ``time_col``.  Works identically on batch frames (used by the test
    to prove stream/batch equivalence)."""
    iv = intervals.select(F.col(key).alias("__pit_key"),
                          F.col(attr).alias("__pit_attr"),
                          "valid_from", "valid_to")
    joined = stream_df.join(
        F.broadcast(iv),
        (F.col(key) == F.col("__pit_key"))
        & (F.col(time_col) >= F.col("valid_from"))
        & (F.col("valid_to").isNull()
           | (F.col(time_col) < F.col("valid_to"))),
        "left")
    return (joined
            .withColumn(attr, F.coalesce("__pit_attr", F.lit(sentinel)))
            .drop("__pit_key", "__pit_attr", "valid_from", "valid_to"))
