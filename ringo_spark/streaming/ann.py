"""Streaming vector ingestion — the embedding-side twin of the minhash
near-dup prober (:func:`ringo_spark.streaming.dedup.streaming_near_dedup`)
and the continuous form of
:func:`ringo_spark.operators.dedup.dedup_embedding_incremental_df`:
each micro-batch of (vec_id, embedding) rows is PROBED against the
persisted corpus LSH-bucket index (exact-cosine verification,
tombstone-aware) and then ADMITTED via the index's append path — the
probe-then-admit lifecycle a vector store runs at ingestion time, so a
near-duplicate arrival is flagged BEFORE it becomes part of the corpus
other arrivals are checked against.

Semantics/ordering contract: within one trigger the probe runs before
the admit, so the INDEX never matches same-trigger arrivals against
each other — in-batch pairs are instead caught by a dedicated
micro-batch self-join (VERDICT r14 item 6; the batch is trigger-sized,
so the self-join is broadcast-vs-broadcast — free), oriented by vec_id
(vec_new = the larger id) since same-trigger arrivals have no order.
Cross-trigger, an arrival matches every earlier-admitted arrival —
the canonical-owner rule under ascending micro-batches (the span
twin's documented contract) — so the full emitted pair set closes the
lifecycle: no near-dup pair with at least one streamed end escapes.

Retry safety: since r17 the append path itself is EXACTLY-once per
batch (the kernel's admission ledger refuses a lost-ack replay and
completes a torn one — ``similarity._admit_batch``), so a retried
trigger no longer lands duplicate (vec_id, ...) rows.  The probe keeps
its corpus-side dedup by vec_id as defense in depth for pre-ledger
indexes, and still excludes the current batch's own ids, so emitted
hits are IDEMPOTENT (pytest-pinned) on every index vintage.

Scale shape: the batch side is micro-batch-sized (its bucketed rows
BROADCAST); the corpus side is the persisted ``bucket=`` index, so the
probe scan is partition-prunable and map-only; the admit is the
append path's batch-sized shuffle.  Nothing corpus-sized moves per
trigger.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..catalog import read_parquet_stable as _rps

from ..operators.dedup import COSINE_THRESHOLD
from ..operators.textfn import cosine_pre, vnorm


def streaming_vector_ingest(index_path: str, bits: int,
                            threshold: float = COSINE_THRESHOLD):
    """foreachBatch maker.  ``bits`` must equal the index's build width
    (the caller owns that invariant — it is encoded in the index tag;
    a mismatched width would route probes to buckets the stored rows
    are not in).

    Usage::

        ingest = streaming_vector_ingest(index_path, bits)
        (stream.writeStream.foreachBatch(ingest(sink_path))
         .trigger(availableNow=True).start())
    """

    def maker(sink_path: str):
        def ingest(batch_df: DataFrame, batch_id: int) -> None:
            spark = batch_df.sparkSession
            from .. import index_lifecycle as _ilc
            from ..operators.deletion import index_rows
            from ..operators.similarity import (
                _bucket_expr, append_to_lsh_index,
            )

            marker = os.path.join(index_path, "_SUCCESS")
            if os.path.exists(marker):
                _ilc.touch(marker)  # LRU: a live stream's index is in use
            b = (batch_df.select("vec_id", "embedding")
                 .withColumn("bucket",
                             _bucket_expr(F.col("embedding"), bits))
                 .withColumn("__vn", vnorm(F.col("embedding"))))
            # self-match exclusion as a broadcast ANTI-join, not an
            # isin() literal list (r16 review): a backfill-sized
            # trigger would otherwise embed 100k+ literals in the plan
            # (driver memory + super-linear analysis cost) — the
            # anti-join keeps the plan size constant in batch size
            idx = (index_rows(spark, index_path, id_col="vec_id")
                   .dropDuplicates(["vec_id"])          # retried admits
                   .join(F.broadcast(b.select("vec_id")),
                         "vec_id", "left_anti")
                   .withColumn("__vn", vnorm(F.col("embedding"))))
            # per-side norms hoisted once per row (r19 opt batch 8)
            cos = F.round(cosine_pre(F.col("n.embedding"),
                                     F.col("c.embedding"),
                                     F.col("n.__vn"), F.col("c.__vn")), 6)
            hits = (idx.alias("c")
                    .join(F.broadcast(b.alias("n")),
                          F.col("n.bucket") == F.col("c.bucket"))
                    .select(F.col("n.vec_id").alias("vec_new"),
                            F.col("c.vec_id").alias("vec_seen"),
                            cos.alias("cosine"))
                    .where(F.col("cosine") >= threshold))
            # in-batch near-dups (VERDICT r14 item 6): same-trigger
            # arrivals self-join within the micro-batch (broadcast x
            # broadcast — trigger-sized, never touches the index),
            # oriented vec_new > vec_seen by vec_id.  Recomputed from
            # the batch alone, so a retried trigger emits identical
            # in-batch pairs (idempotent like the index probe).
            inb = (b.alias("c")
                   .join(F.broadcast(b.alias("n")),
                         (F.col("n.bucket") == F.col("c.bucket"))
                         & (F.col("n.vec_id") > F.col("c.vec_id")))
                   .select(F.col("n.vec_id").alias("vec_new"),
                           F.col("c.vec_id").alias("vec_seen"),
                           cos.alias("cosine"))
                   .where(F.col("cosine") >= threshold))
            # overwrite-by-batch_id: a retried trigger replaces its own
            # output (exactly-once sink semantics)
            hits.unionByName(inb).write.mode("overwrite").parquet(
                os.path.join(sink_path, f"batch_id={batch_id}"))
            # admit AFTER the probe — the index side never sees its own
            # trigger (in-batch pairs came from the self-join above)
            append_to_lsh_index(spark, index_path,
                                batch_df.select("vec_id", "embedding"),
                                bits=bits)

        return ingest

    return maker


# --- registered driver row ----------------------------------------------------

VEC_INGEST_SPLITS = 3


def streaming_vector_ingest_df(spark, sf_dir: str):
    """EAGER (registry.EAGER_QUERIES) registered row for the vector
    ingestion lifecycle: the LOWER half of the embeddings table is
    indexed fresh (overwrite — so reruns are deterministic and the
    stream-owned index never accumulates), the UPPER half replays as
    VEC_INGEST_SPLITS ascending micro-batches through the
    probe-then-admit foreachBatch, and the union of emitted hits is
    returned.  The oracle reproduces the whole lifecycle as one
    chunk-ordering predicate over the width-parameterized LSH pair
    graph: a pair is a hit iff its later end is streamed and its
    earlier end was admitted in an earlier-or-equal chunk (corpus =
    chunk -1; equal chunk = the in-batch self-join, oriented by
    vec_id) — exactly the probe-before-admit + in-batch-check
    semantics."""
    import math

    from .. import index_lifecycle as _ilc
    from ..operators.dedup import _auto_dedup_bits
    from ..operators.similarity import _bucket_expr
    from .vocab import _sink_root

    emb = _rps(spark, f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    half = n // 2
    w = math.ceil((n - half) / VEC_INGEST_SPLITS)
    bits = _auto_dedup_bits(spark, sf_dir)
    fp = _ilc.source_fingerprint(sf_dir)
    # "|inb" = in-batch self-join pairs included (r15): sinks replayed
    # under the pre-item-6 semantics miss the tag and replay fresh
    tag = _ilc.index_tag(
        f"{os.path.abspath(sf_dir)}|vecing|{bits}|{VEC_INGEST_SPLITS}|{fp}|inb")
    p = os.path.join(_sink_root(), f"vecing-idx-{tag}")
    sink = os.path.join(_sink_root(), f"vecing-hits-{tag}")
    if not _ilc.serve_cached(sink, "_VECING_OK"):
        # first invocation per corpus version runs the full lifecycle:
        # fresh lower-half index (overwrite — the stream-owned index
        # starts clean), then the ordered replay.  Reruns serve the
        # completed sink read-only (the *_indexed amortization pattern;
        # the sink is a pure function of the tagged inputs).
        (emb.where(F.col("vec_id") < half)
         .withColumn("bucket", _bucket_expr(F.col("embedding"), bits))
         .write.mode("overwrite").partitionBy("bucket").parquet(p))
        from ..operators.similarity import _write_lsh_width

        _write_lsh_width(p, bits)   # self-describing width (r19)
        ingest = streaming_vector_ingest(p, bits)
        for i in range(VEC_INGEST_SPLITS):
            lo, hi = half + i * w, min(n, half + (i + 1) * w)
            ingest(sink)(emb.where((F.col("vec_id") >= lo)
                                   & (F.col("vec_id") < hi)), i)
        _ilc.finish_build(sink, _sink_root(), marker="_VECING_OK")
    else:
        _ilc.gc_index_root(_sink_root(), protect=sink)
    return (spark.read.parquet(sink)
            .select("vec_new", "vec_seen", "cosine")
            .orderBy("vec_new", "vec_seen"))


def _streaming_vector_ingest_sql() -> str:
    from ..operators.dedup import (
        COSINE_THRESHOLD as THR, DEDUP_BUCKET_TARGET_ROWS, EMB_LSH_BITS,
    )
    from ..operators.similarity import sql_auto_bits_cte, sql_bucket_dyn
    from ..operators.textfn import sql_cosine

    nb = sql_auto_bits_cte(EMB_LSH_BITS, DEDUP_BUCKET_TARGET_ROWS)
    return f"""
WITH nb AS ({nb}),
nn AS (SELECT count(*) AS n, count(*) // 2 AS half,
              CAST(ceil((count(*) - count(*) // 2)
                        / {VEC_INGEST_SPLITS}.0) AS BIGINT) AS w
       FROM embeddings),
bk AS (SELECT vec_id, embedding, {sql_bucket_dyn()} AS bucket
       FROM embeddings, nb),
ch AS (SELECT vec_id,
              CASE WHEN vec_id < half THEN -1
                   ELSE CAST(floor((vec_id - half) * 1.0 / w) AS INT)
              END AS chunk
       FROM embeddings, nn)
SELECT b.vec_id AS vec_new, a.vec_id AS vec_seen,
       round({sql_cosine('b.embedding', 'a.embedding')}, 6) AS cosine
FROM bk a JOIN bk b ON a.bucket = b.bucket
JOIN ch ca ON ca.vec_id = a.vec_id
JOIN ch cb ON cb.vec_id = b.vec_id
WHERE cb.chunk >= 0
  AND (ca.chunk < cb.chunk
       OR (ca.chunk = cb.chunk AND a.vec_id < b.vec_id))
  AND round({sql_cosine('b.embedding', 'a.embedding')}, 6) >= {THR}
ORDER BY vec_new, vec_seen
"""


STREAMING_VECTOR_INGEST_SQL = _streaming_vector_ingest_sql()
