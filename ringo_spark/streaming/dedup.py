"""Streaming exact deduplication — the continuous form of
:func:`ringo_spark.operators.dedup.dedup_exact_df`.

A training-data ingest stream must drop re-crawled/replayed documents
on arrival.  ``dropDuplicatesWithinWatermark`` keys the state store on
the content hash and — unlike plain ``dropDuplicates`` — expires each
key once the watermark passes its event time + delay, so state is
bounded by the dedup horizon, not by all content ever seen.  Exactness
holds within the horizon; cross-horizon dups are the batch operator's
job (periodic compaction against the persisted corpus).

Scale: one shuffle on the 16-byte md5 key; state O(docs per horizon).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(stream_df: DataFrame,
                          watermark_delay: str = "10 minutes",
                          text_col: str = "text",
                          time_col: str = "ts") -> DataFrame:
    """stream_df needs (``time_col`` timestamp, ``text_col``); emits the
    first-seen row per distinct text within the watermark horizon."""
    return (stream_df
            .withColumn("text_hash", F.md5(F.col(text_col)))
            .withWatermark(time_col, watermark_delay)
            .dropDuplicatesWithinWatermark(["text_hash"]))
