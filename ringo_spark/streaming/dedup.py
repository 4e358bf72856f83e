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


def streaming_near_dedup(index_path: str,
                         text_col: str = "text",
                         id_col: str = "doc_id"):
    """Continuous form of
    :func:`ringo_spark.operators.dedup.dedup_minhash_incremental_df`:
    each micro-batch's documents are shingled and MinHash-signed with the
    SAME portable expression pipeline as the batch operator, their band
    keys probed against the persisted corpus band index
    (:func:`~ringo_spark.operators.dedup.build_minhash_index`), and
    candidates verified by exact Jaccard against the corpus shingle
    table.  Returns a ``foreachBatch`` function emitting
    (doc_new, doc_seen, jaccard) hit rows — the stream an ingest
    pipeline uses to reject or link near-duplicate arrivals.

    Scale shape: the batch side is micro-batch-sized, so its band rows
    and candidate pairs BROADCAST; the corpus-side band scan and the
    shingle verification are map-only — nothing corpus-sized shuffles
    per trigger, and the index is appended (not rebuilt) as batches are
    admitted.  Within-batch exact dups are
    :func:`streaming_exact_dedup`'s job; cross-corpus EXACT dups also
    surface here (jaccard = 1.0).

    Usage::

        prober = streaming_near_dedup(index_path)
        (stream.writeStream.foreachBatch(prober(sink_path))
         .trigger(availableNow=True).start())
    """
    import os

    from ..operators.dedup import (
        JACCARD_THRESHOLD, NUM_PERM, SHINGLE_N, _band_rows,
    )
    from ..operators.textfn import (
        minhash_signature, shingle_hashes, shingles, tokens,
    )

    def batch_prober(sink_path: str):
        def probe(batch_df: DataFrame, batch_id: int) -> None:
            spark = batch_df.sparkSession
            # every trigger counts as a USE of the index: bump the marker
            # so gc_index_root's LRU never collects a live stream's index
            marker = os.path.join(index_path, "_INDEX_OK")
            if os.path.exists(marker):
                from ..operators.similarity import _touch

                _touch(marker)
            # delete propagation: tombstoned corpus docs never match an
            # arrival (merge-on-read; operators/deletion.py)
            from ..operators.dedup import _index_tables

            bands_t, sh_t = _index_tables(spark, index_path)
            corpus_bands = bands_t.withColumnRenamed("doc_id", "doc_seen")
            corpus_sh = (sh_t
                         .withColumnRenamed("doc_id", "doc_seen")
                         .withColumnRenamed("sh", "sh_s"))
            shingled = (batch_df
                        .select(F.col(id_col).alias("doc_id"),
                                tokens(F.col(text_col)).alias("__toks"))
                        .select("doc_id",
                                shingles(F.col("__toks"), SHINGLE_N).alias("sh"))
                        .where(F.size("sh") > 0))
            sigs = (shingled
                    .withColumn("hs", shingle_hashes(F.col("sh")))
                    .select("doc_id",
                            minhash_signature(F.col("hs"), NUM_PERM)
                            .alias("sig")))
            bands = (_band_rows(sigs)
                     .withColumnRenamed("doc_id", "doc_new"))
            cand = (corpus_bands.join(F.broadcast(bands), "band_key")
                    .select("doc_new", "doc_seen")
                    .dropDuplicates(["doc_new", "doc_seen"]))
            sh_n = shingled.select(F.col("doc_id").alias("doc_new"),
                                   F.col("sh").alias("sh_n"))
            inter = F.size(F.array_intersect("sh_n", "sh_s"))
            jac = inter / (F.size("sh_n") + F.size("sh_s") - inter)
            hits = (cand.join(F.broadcast(sh_n), "doc_new")
                    .join(corpus_sh, "doc_seen")
                    .select("doc_new", "doc_seen",
                            F.round(jac, 6).alias("jaccard"))
                    .where(F.col("jaccard") >= JACCARD_THRESHOLD))
            # Idempotent sink: foreachBatch's exactly-once caveat is that
            # a retried micro-batch re-runs the whole function, so a
            # bare mode("append") would re-append the same hit rows.
            # Writing each batch under its batch_id-derived partition
            # dir with overwrite makes the retry replace its own output
            # instead (r06 ADVICE); readers of sink_path see batch_id as
            # a discovered partition column.
            hits.write.mode("overwrite").parquet(
                os.path.join(sink_path, f"batch_id={batch_id}"))
        return probe

    return batch_prober


def build_chunk_hash_index(docs: DataFrame, index_path: str) -> str:
    """Persist the already-ingested corpus's DISTINCT chunk-hash set —
    the index :func:`streaming_span_dedup` probes and appends to.  The
    layout is a ``chunks/`` parquet of the 16-byte ``h`` column plus the
    ``batch_id`` that admitted it (-1 for this pre-stream corpus build)
    — the batch_id stamp is what makes a micro-batch RETRY read exactly
    the index state it saw the first time (see
    :func:`streaming_span_dedup`).  The span twin never needs the
    corpus text or token payload again."""
    import os

    from ..operators.dedup import _chunk_hashes

    (_chunk_hashes(docs).select("h").distinct()
     .withColumn("batch_id", F.lit(-1).cast("long"))
     .write.mode("overwrite").parquet(os.path.join(index_path, "chunks")))
    open(os.path.join(index_path, "_INDEX_OK"), "w").close()
    return index_path


def streaming_span_dedup(index_path: str,
                         text_col: str = "text",
                         id_col: str = "doc_id"):
    """Continuous duplicate-SPAN removal — the streaming form of
    :func:`ringo_spark.operators.dedup.doc_dedup_spans_incremental_df`
    (VERDICT r12 item 6): each micro-batch's documents are chunked with
    the SAME kernel as the batch operators (``_chunks_from_tokens``),
    their removal lists computed against the persisted corpus
    chunk-hash index plus the within-batch canonical-owner rule
    (``_span_removal_lists`` — one shared kernel), the cleaned token
    streams written to the sink, and the batch's own chunk hashes
    APPENDED to the index so later micro-batches treat this batch as
    corpus.

    ORDERING CONTRACT (unlike the drift/anomaly twins, whose moments
    are commutative): the canonical owner is the globally LEAST
    (doc_id, chunk index), so replay equality to the batch operator
    requires micro-batches to arrive in ascending doc-id ranges —
    ingestion order, the same precedence assumption the incremental
    operator documents ("corpus ids precede batch ids").  Under that
    contract the UNION of the per-batch outputs is bit-equal to
    :func:`doc_dedup_spans_df` restricted to the streamed docs: a
    chunk's first streamed occurrence keeps exactly its in-batch owner,
    and every later micro-batch sees the hash in the index and removes
    all of its occurrences (pytest-pinned replay in
    ``test_streaming.py``).

    Idempotency: the sink write is batch_id-partitioned overwrite (a
    retried micro-batch replaces its own output), and the probe reads
    only index rows with ``batch_id`` STRICTLY BELOW the current batch
    — so a retry's own earlier append is invisible and its output is
    bit-identical to the first run (without the filter, a retried
    batch would find its own hashes "in the corpus" and remove every
    chunk it has).  The retry's re-append merely duplicates (h,
    batch_id) rows, harmless in a DISTINCT-set probe (contrast
    ``append_to_minhash_index``, where a double-append self-pairs).

    Scale shape per trigger: the corpus side is only its 16-byte hash
    column (never text); batch chunk rows shuffle on the hash (owner
    min + index probe) and the removal lists on doc_id — all
    batch-sized; reconstruction is map-side (`array_except`).

    Usage::

        cleaner = streaming_span_dedup(index_path)
        (stream.writeStream.foreachBatch(cleaner(sink_path))
         .trigger(availableNow=True).start())
    """
    import os

    from ..operators.dedup import (
        _chunks_from_tokens, _span_removal_lists, _spans_cleaned,
    )
    from ..operators.textfn import tokens

    def batch_cleaner(sink_path: str):
        def clean(batch_df: DataFrame, batch_id: int) -> None:
            spark = batch_df.sparkSession
            chunks_dir = os.path.join(index_path, "chunks")
            corpus_h = (spark.read.parquet(chunks_dir)
                        .where(F.col("batch_id") < batch_id)
                        .select("h").distinct())
            base = (batch_df
                    .select(F.col(id_col).alias("doc_id"),
                            tokens(F.col(text_col)).alias("__toks"))
                    .persist())
            chunks = _chunks_from_tokens(base, with_index=True)
            out = _spans_cleaned(base,
                                 _span_removal_lists(chunks, corpus_h))
            out.write.mode("overwrite").parquet(
                os.path.join(sink_path, f"batch_id={batch_id}"))
            # admit AFTER the cleaned write, stamped with this batch's
            # id: the probe filters to strictly-prior ids, so neither
            # this append nor a retry's duplicate of it can leak into
            # the batch's own (or a retried) verdict
            (chunks.select("h").distinct()
             .withColumn("batch_id", F.lit(batch_id).cast("long"))
             .write.mode("append").parquet(chunks_dir))
            base.unpersist()
        return clean

    return batch_cleaner
