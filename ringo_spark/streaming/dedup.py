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
            from .. import index_lifecycle as _ilc

            # every trigger counts as a USE of the index: bump the marker
            # so gc_index_root's LRU never collects a live stream's index
            marker = os.path.join(index_path, "_INDEX_OK")
            if os.path.exists(marker):
                from ..operators.similarity import _touch

                _touch(marker)
            # content-stamped sink partition (r17 review): Spark's
            # batch_id is per-CHECKPOINT, so a restart with a fresh
            # checkpoint restarts at 0 and would OVERWRITE the prior
            # run's batch-0 output with unrelated rows.  The sink ledger
            # assigns each distinct batch CONTENT a monotone stamp;
            # replays (same content) REUSE their stamp.  Unlike the
            # span cleaner below, a committed replay is NOT skipped: a
            # probe's verdict depends on index state (tombstoned corpus
            # docs must stop matching), so re-probing the same arrivals
            # must overwrite the stamp's partition with the FRESH
            # verdict — pinned by the deletion suite's re-probe test.
            fp = _ilc.batch_fingerprint(
                batch_df.select(id_col, text_col), [id_col, text_col])
            stamp = _next_stamp(sink_path, fp)
            # delete propagation: tombstoned corpus docs never match an
            # arrival (merge-on-read; operators/deletion.py)
            from ..operators.dedup import _index_tables

            bands_t, sh_t = _index_tables(spark, index_path)
            corpus_bands = bands_t.withColumnRenamed("doc_id", "doc_seen")
            corpus_sh = (sh_t
                         .withColumnRenamed("doc_id", "doc_seen")
                         .withColumnRenamed("sh", "sh_s"))
            # persisted: the signature/band branch AND the exact-Jaccard
            # verification branch both consume the shingle pipeline in
            # ONE action — unpersisted, the CPU-bound tokenize+shingle
            # ran twice per trigger (r17 review; build_minhash_index
            # persists for the same reason)
            # emptiness guard as a token-count bound BELOW the
            # projection (r19 opt, the dedup._shingled fix): the
            # ``size(sh) > 0`` form is predicate-pushed under the
            # Project and shingles every row twice
            shingled = (batch_df
                        .where(F.size(tokens(F.col(text_col))) >= SHINGLE_N)
                        .select(F.col(id_col).alias("doc_id"),
                                tokens(F.col(text_col)).alias("__toks"))
                        .select("doc_id",
                                shingles(F.col("__toks"), SHINGLE_N).alias("sh"))
                        .persist())
            try:
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
                # Idempotent sink: a retried (or re-checkpointed) batch
                # replaces ITS OWN stamped partition, then the ledger
                # commit makes any further replay a no-op before the
                # write.  Readers of sink_path see batch_id as a
                # discovered partition column, stamps ascending in
                # admission order.
                _ilc.admit_intent(sink_path, fp, str(stamp))
                hits.write.mode("overwrite").parquet(
                    os.path.join(sink_path, f"batch_id={stamp}"))
                _ilc.admit_commit(sink_path, fp)
            finally:
                # unpersist even when the sink write throws — a retried
                # trigger re-persists, and repeated failures otherwise
                # accumulate cached frames for the session's life
                shingled.unpersist()
        return probe

    return batch_prober


def _next_stamp(index_path: str, fp: str) -> int:
    """The stamp for batch ``fp``: its previously assigned one when a
    torn attempt recorded an intent (the retry must replace the SAME
    sink partition and keep the same index visibility), else one past
    the largest stamp any batch ever recorded here (monotone across
    stream runs and checkpoint lineages — the property Spark's
    per-checkpoint batch_id lacks, r17 review).  Driver-side: one tiny
    ledger-dir listdir."""
    import os

    from .. import index_lifecycle as _ilc

    note = _ilc.admit_note(index_path, fp)
    if note:
        return int(note)
    led = os.path.join(index_path, _ilc.ADMITTED)
    top = -1
    if os.path.isdir(led):
        for n in os.listdir(led):
            try:
                with open(os.path.join(led, n)) as fh:
                    top = max(top, int(fh.read()))
            except (ValueError, OSError):
                continue
    return top + 1


def build_chunk_hash_index(docs: DataFrame, index_path: str,
                           force: bool = False) -> str:
    """Persist (once) the already-ingested corpus's DISTINCT chunk-hash
    set — the index :func:`streaming_span_dedup` probes and appends to.
    The layout is a ``chunks/`` parquet of the 16-byte ``h`` column
    plus the admission stamp that admitted it (-1 for this pre-stream
    corpus build) — the stamp is what makes a micro-batch RETRY read
    exactly the index state it saw the first time (see
    :func:`streaming_span_dedup`).  The span twin never needs the
    corpus text or token payload again."""
    import os

    from .. import index_lifecycle as _ilc
    from ..operators.dedup import _chunk_hashes

    # build-once gate (r17 review): re-invoking this as an idempotent
    # "ensure index exists" setup step used to mode("overwrite") the
    # chunks table and ERASE every batch-admitted row from prior stream
    # runs — the sibling build_minhash_index's serve_cached semantics
    # apply here too
    if _ilc.serve_cached(index_path, "_INDEX_OK", force):
        return index_path
    marker = os.path.join(index_path, "_INDEX_OK")
    try:
        # a stale marker must not survive a crash mid-overwrite: drop
        # it BEFORE rewriting so completeness is only ever claimed by
        # the marker landing LAST (the kernel's finish_build order)
        os.unlink(marker)
    except FileNotFoundError:
        pass
    (_chunk_hashes(docs).select("h").distinct()
     .withColumn("batch_id", F.lit(-1).cast("long"))
     .write.mode("overwrite").parquet(os.path.join(index_path, "chunks")))
    open(marker, "w").close()
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

    Idempotency (r17: content-stamped): each batch's CONTENT
    fingerprint gets a monotone stamp through the index's admission
    ledger — committed replays are no-ops, torn replays reuse their
    stamp — so the sink write is stamp-partitioned overwrite (a retry
    replaces its own output, and a NEW checkpoint lineage can never
    collide with a prior run's partitions, which per-checkpoint Spark
    batch_ids did).  The probe reads only index rows with a stamp
    STRICTLY BELOW the current one, so a torn attempt's own earlier
    append is invisible and the retry's output is bit-identical
    (without the filter, a retried batch would find its own hashes "in
    the corpus" and remove every chunk it has).  A torn retry's
    re-append merely duplicates (h, stamp) rows, harmless in a
    DISTINCT-set probe (contrast ``append_to_minhash_index``, where a
    double-append self-pairs).

    SINK CONTRACT (ADVICE r17): the sink is keyed by CONTENT, not by
    trigger — a committed batch whose content arrives again produces NO
    new sink partition for that trigger (its output already exists
    under its original stamp; the old batch_id scheme emitted a
    fully-cleaned duplicate instead).  Downstream consumers must read
    the sink as a keyed table (key = doc_id within stamp partitions),
    never count one output partition per trigger.  A genuine second
    arrival of the same rows IS the same batch: its cleaned output is
    the partition already written.  When the corpus index is force-
    rebuilt, the admission ledger is archived with it
    (``index_lifecycle.archive_admissions``), so post-rebuild replays
    re-run against the rebuilt corpus rather than being refused as
    'done' against hashes that no longer exist; the re-run lands under
    a FRESH stamp (the archive seeds a monotone floor), so a consumer
    that keeps the pre-rebuild sink must merge on the LATEST stamp per
    doc_id — starting a fresh sink alongside the rebuilt index is the
    simpler deployment.

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
            from .. import index_lifecycle as _ilc

            chunks_dir = os.path.join(index_path, "chunks")
            # content-stamped admission (r17 review): Spark's batch_id
            # is per-checkpoint — a fresh checkpoint lineage restarts
            # at 0, which under the old id-keyed scheme hid every
            # previously admitted batch from the probe (duplicate spans
            # leaked through uncleaned) AND overwrote the prior run's
            # sink partitions.  The index ledger assigns each batch
            # CONTENT a monotone stamp; a replay (same content) is a
            # committed no-op or reuses its torn attempt's stamp, so
            # sink partitions and probe visibility are stable across
            # retries and checkpoint lineages alike.
            fp = _ilc.batch_fingerprint(
                batch_df.select(id_col, text_col), [id_col, text_col])
            if _ilc.admit_state(index_path, fp) == "done":
                return
            stamp = _next_stamp(index_path, fp)
            corpus_h = (spark.read.parquet(chunks_dir)
                        .where(F.col("batch_id") < stamp)
                        .select("h").distinct())
            base = (batch_df
                    .select(F.col(id_col).alias("doc_id"),
                            tokens(F.col(text_col)).alias("__toks"))
                    .persist())
            try:
                chunks = _chunks_from_tokens(base, with_index=True)
                out = _spans_cleaned(base,
                                     _span_removal_lists(chunks, corpus_h),
                                     ordered=False)
                _ilc.admit_intent(index_path, fp, str(stamp))
                out.write.mode("overwrite").parquet(
                    os.path.join(sink_path, f"batch_id={stamp}"))
                # admit AFTER the cleaned write, stamped: the probe
                # filters to strictly-prior stamps, so neither this
                # append nor a torn retry's duplicate of it can leak
                # into the batch's own verdict (duplicate (h, stamp)
                # rows are harmless in the DISTINCT-set probe)
                (chunks.select("h").distinct()
                 .withColumn("batch_id", F.lit(stamp).cast("long"))
                 .write.mode("append").parquet(chunks_dir))
                _ilc.admit_commit(index_path, fp)
            finally:
                # unpersist on failure too: Structured Streaming retries
                # the trigger and re-persists — without this, repeated
                # failures pile cached token frames up for the session
                base.unpersist()
        return clean

    return batch_cleaner
