"""Streaming twin of the count-min heavy-hitter bounds —
:func:`ringo_spark.operators.text.vocab_topk_cms_bounds_df` — closing
the streaming story for the third mergeable sketch (HLL distincts and
GK quantiles already have batch bounds rows; drift/anomaly/sessionize/
span-dedup have stateful twins).

Why this shape: token-frequency tracking over an UNBOUNDED ingest
stream cannot keep exact per-token state (the vocabulary grows without
bound).  A count-min sketch is fixed-size and mergeable — each
micro-batch aggregates its own partial sketch distributed (the same
JVM ``count_min_sketch`` expression as the batch operator, map-side
combined), and partials merge by cell-wise counter ADDITION, which is
commutative and associative.  So unlike the span-dedup twin there is
NO ordering contract: any batch split, any replay order, merges to the
bit-identical sketch the batch single-pass aggregation produces —
that is the mergeability property, and the test pins it.

State/driver cost: one sketch per micro-batch in the sink (eps=0.005,
conf=0.99 -> ~2.7 KB x depth rows each); the snapshot reader merges
them driver-side — O(batches) sketch bytes, never O(vocabulary).
:func:`compact_cms_sink` folds old ``batch_id=`` partitions into one
merged row (the same ``mergeInPlace``), bounding sink growth on a
long-running deployment; snapshots over the compacted sink are
bit-identical (pytest-pinned).

Exact probe counts ride along per batch for a FIXED probe set only
(bounded, broadcast as a literal array) so the sink also carries the
ground truth the CMS guarantee is checked against — the streaming form
of the batch operator's exact_count column.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..catalog import read_parquet_stable as _rps

from ..functions.localrel import literal_df

from ..operators.text import CMS_CONFIDENCE, CMS_EPS, CMS_SEED
from ..operators.textfn import tokens


def streaming_cms_vocab(probe_tokens: list[str]):
    """foreachBatch maker (the :mod:`streaming.dedup` pattern): each
    micro-batch of (doc_id, text) rows writes one partial row —
    (n_tokens, CMS sketch bytes, exact counts over ``probe_tokens``) —
    under its ``batch_id=`` partition.  Overwrite-by-batch_id makes a
    retried trigger replace its own output (exactly-once sink
    semantics, the r06 ADVICE pattern).

    Usage::

        writer = streaming_cms_vocab(probes)
        (stream.writeStream.foreachBatch(writer(sink_path))
         .trigger(availableNow=True).start())
    """
    probe_arr = F.array(*[F.lit(t) for t in probe_tokens])

    def batch_writer(sink_path: str):
        def write(batch_df: DataFrame, batch_id: int) -> None:
            toks = batch_df.select(
                F.explode(tokens(F.col("text"))).alias("token"))
            partial = toks.agg(
                F.count(F.lit(1)).alias("n_tokens"),
                F.count_min_sketch(
                    "token", F.lit(CMS_EPS), F.lit(CMS_CONFIDENCE),
                    F.lit(CMS_SEED)).alias("sketch"))
            probes = (toks.where(F.array_contains(probe_arr, F.col("token")))
                      .groupBy("token")
                      .agg(F.count(F.lit(1)).alias("exact_count")))
            row = partial.crossJoin(
                probes.agg(F.map_from_entries(F.collect_list(
                    F.struct("token", "exact_count"))).alias("probe_counts")))
            row.write.mode("overwrite").parquet(
                os.path.join(sink_path, f"batch_id={batch_id}"))

        return write

    return batch_writer


def _merge_partial_rows(jvm, rows):
    """Driver-side fold of partial rows -> (merged_sketch|None, n_total,
    exact_counts): cell-wise CountMinSketch.mergeInPlace over
    identically-seeded sketches plus exact-count/token-total addition.
    ONE implementation shared by compaction and snapshot (r16 review:
    two copies of this loop had already drifted in structure), so the
    pinned bit-identical-snapshot contract cannot silently diverge."""
    merged, n_total = None, 0
    exact: dict[str, int] = {}
    for r in rows:
        n_total += r.n_tokens or 0
        for t, c in (r.probe_counts or {}).items():
            exact[t] = exact.get(t, 0) + c
        if r.sketch is None:     # an EMPTY micro-batch aggregates a null
            continue             # sketch and zero counts — nothing to merge
        s = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
            jvm.java.io.ByteArrayInputStream(bytes(r.sketch)))
        merged = s if merged is None else (merged.mergeInPlace(s) or merged)
    return merged, n_total, exact


def _base_state(parts_rows) -> tuple[int, object | None]:
    """(folded_through, newest_base_row) from a sink's collected rows:
    base rows live under NEGATIVE batch ids (trigger ids are >= 0, so a
    retried trigger can never overwrite a base — r16 review) and carry
    ``folded_through`` in-row; the newest base wins.  (-1, None) on a
    never-compacted sink."""
    up, base = -1, None
    for r in parts_rows:
        if (r.batch_id is not None and r.batch_id < 0
                and r.asDict().get("folded_through") is not None
                and r.folded_through > up):
            up, base = int(r.folded_through), r
    return up, base


def _read_sink(spark: SparkSession, sink_path: str):
    # mergeSchema: base rows carry the extra folded_through column that
    # pre-compaction partials lack
    return (spark.read.option("mergeSchema", "true").parquet(sink_path)
            .collect())


def compact_cms_sink(spark: SparkSession, sink_path: str,
                     up_to_batch_id: int) -> None:
    """Fold the newest base row and every partial with
    ``batch_id <= up_to_batch_id`` into ONE merged base row — the
    O(batches)→O(1) state compaction the module contract promises.

    Layout (r16 review — the old design stored the merged row under the
    LIVE trigger id ``batch_id=up_to``, so a checkpoint-replayed
    trigger's overwrite-by-batch_id DESTROYED the compacted prefix):

    * the merged row lands under ``batch_id=-(up_to+1)`` — trigger ids
      are >= 0, so no retried trigger can ever collide with a base —
      and carries ``folded_through = up_to`` IN-ROW, so the single
      rename that publishes the base atomically publishes which
      partials it absorbed;
    * snapshots skip partials with ``batch_id <= folded_through``
      (a late retry of a folded trigger recreates its partial
      harmlessly — it is ignored, then reclaimed);
    * folded partials and superseded bases are deleted at the START of
      the NEXT compaction call, never in the publish path: deletion is
      pure space reclamation, so correctness never races it and an
      in-flight snapshot gets a full compaction interval of grace.

    Crash safety: the merged row lands DURABLY first in an
    underscore-hidden staging dir (invisible to partition discovery;
    ``_SUCCESS`` + ``_up_to`` prove completeness) and the publish is
    one rename; an INCOMPLETE staging dir is discarded and redone."""
    import shutil

    from pyspark.sql import types as T

    stage = os.path.join(sink_path, "_compact_staging")
    marker = os.path.join(stage, "_up_to")

    def _finish(up: int) -> None:
        # publish ONLY: deletions are deferred to the next call
        final = os.path.join(sink_path, f"batch_id=-{up + 1}")
        shutil.rmtree(final, ignore_errors=True)   # idempotent redo
        os.rename(stage, final)

    from .. import index_lifecycle as _ilc
    _ilc.recover_staging(stage, "_up_to",
                         lambda: _finish(int(open(marker).read())))

    rows = _read_sink(spark, sink_path)
    up_prev, base = _base_state(rows)
    # deferred reclamation: partials the newest base already absorbed,
    # and bases it superseded
    for d in os.listdir(sink_path):
        if not d.startswith("batch_id="):
            continue
        bid = int(d.split("=", 1)[1])
        if (0 <= bid <= up_prev) or (bid < 0 and -bid - 1 < up_prev):
            shutil.rmtree(os.path.join(sink_path, d), ignore_errors=True)
    if up_to_batch_id <= up_prev:
        return                      # nothing new to fold
    fold = ([base] if base is not None else []) +         [r for r in rows
         if r.batch_id is not None
         and up_prev < r.batch_id <= up_to_batch_id]
    if not [r for r in fold if r.batch_id is not None and r.batch_id >= 0]:
        return                      # no unfolded partials in range
    jvm = spark._jvm
    merged, n_total, exact = _merge_partial_rows(jvm, fold)
    buf = jvm.java.io.ByteArrayOutputStream()
    if merged is not None:
        merged.writeTo(buf)
    sketch_bytes = bytes(buf.toByteArray()) if merged is not None else None
    schema = T.StructType([
        T.StructField("n_tokens", T.LongType()),
        T.StructField("sketch", T.BinaryType()),
        T.StructField("probe_counts",
                      T.MapType(T.StringType(), T.LongType())),
        T.StructField("folded_through", T.LongType()),
    ])
    compacted = spark.createDataFrame(
        [(n_total, sketch_bytes, exact or None, up_to_batch_id)], schema)
    compacted.write.mode("overwrite").parquet(stage)
    with open(marker, "w") as fh:       # marker completes the staging;
        fh.write(str(up_to_batch_id))   # only now may the publish run
    _finish(up_to_batch_id)


def cms_vocab_snapshot(spark: SparkSession, sink_path: str,
                       probe_tokens: list[str]) -> DataFrame:
    """Merge every live batch partial (plus the newest compacted base)
    into the current corpus view: one row per probe token with the
    exact streamed count, the merged-sketch estimate, and the CMS
    guarantee verdict (estimate never BELOW the exact count; overcount
    bounded by eps * total stream size).

    Partials with ``batch_id <= base.folded_through`` are SKIPPED —
    they are either awaiting deferred reclamation or a late trigger
    retry recreated them, and their contribution already lives in the
    base (r16 review: double-count hazard).  The merge is
    ``CountMinSketch.mergeInPlace`` — cell-wise counter addition over
    identically-seeded sketches, so the result is bit-identical to a
    single-pass aggregation over the union of the batches (pinned by
    ``test_streaming_cms_vocab_matches_batch``).  Driver cost:
    O(batches) sketch reads, each a few KB."""
    parts = _read_sink(spark, sink_path)
    up, base = _base_state(parts)
    live = ([base] if base is not None else []) +         [r for r in parts if r.batch_id is not None and r.batch_id > up]
    merged, n_total, exact_got = _merge_partial_rows(spark._jvm, live)
    exact = {t: exact_got.get(t, 0) for t in probe_tokens}
    rows = []
    for t in probe_tokens:
        est = merged.estimateCount(t) if merged is not None else 0
        ok = bool(exact[t] <= est <= exact[t] + CMS_EPS * n_total)
        rows.append((t, exact[t], int(est), ok))
    return literal_df(
        spark, rows, "token string, exact_count long, cms_estimate long, "
                     "within_cms_bounds boolean")


# --- registered driver row (r14, VERDICT r13 item 8) -------------------------
#
# The streaming twins were pytest-proven only (bit-equal replay); this
# batch-facing query gives the streaming STATE machinery a driver row:
# it replays the corpus through the foreachBatch writer as
# STREAM_SPLITS deterministic hash-split micro-batches into a
# fingerprint-tagged sink, merges the persisted partial sketches with
# cms_vocab_snapshot, and emits per probe token the STREAMED exact
# count (summed across batch partials — must equal the oracle's batch
# groupBy cell-exactly) plus the CMS guarantee verdict (pinned TRUE).
# The writer is idempotent (overwrite per batch_id), so reruns serve
# the identical snapshot.

STREAM_SPLITS = 3
STREAM_PROBE_N = 10


def _sink_root() -> str:
    from .. import index_lifecycle as _ilc
    return os.path.join(_ilc.repo_root(), ".stream_sinks")


def _stream_probes(spark: SparkSession, sf_dir: str) -> list[str]:
    """Deterministic probe set: the exact top-N tokens by (count desc,
    token) — the oracle derives the same set."""
    docs = _rps(spark, f"{sf_dir}/documents.parquet")
    top = (docs.select(F.explode(tokens(F.col("text"))).alias("token"))
           .groupBy("token").agg(F.count(F.lit(1)).alias("c"))
           .orderBy(F.desc("c"), F.asc("token"))
           .limit(STREAM_PROBE_N).collect())
    return [r.token for r in top]


def streaming_cms_snapshot_df(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """EAGER (registry.EAGER_QUERIES): replays hash-split micro-batches
    through the CMS writer, then snapshots the merged sink."""
    from .. import index_lifecycle as _ilc

    probes = _stream_probes(spark, sf_dir)
    fp = _ilc.source_fingerprint(sf_dir, "documents.parquet")
    tag = _ilc.index_tag(f"{os.path.abspath(sf_dir)}|cms|{STREAM_SPLITS}|{fp}")
    sink = os.path.join(_sink_root(), f"cms-{tag}")
    docs = _rps(spark, f"{sf_dir}/documents.parquet")
    writer = streaming_cms_vocab(probes)
    for i in range(STREAM_SPLITS):
        writer(sink)(
            docs.where(F.pmod(F.col("doc_id"),
                              F.lit(STREAM_SPLITS)) == i), i)
    # sink dirs are per (corpus, fingerprint): a regenerated corpus
    # retags, so stale sinks would otherwise accumulate forever — the
    # same LRU GC as every persisted index root
    _ilc.gc_index_root(_sink_root(), protect=sink)
    return (cms_vocab_snapshot(spark, sink, probes)
            .select("token", "exact_count", "within_cms_bounds")
            .orderBy(F.desc("exact_count"), F.asc("token")))


def _streaming_cms_snapshot_sql() -> str:
    from ..operators.textfn import sql_tokens

    return f"""
SELECT token, count(*) AS exact_count, TRUE AS within_cms_bounds
FROM (SELECT unnest({sql_tokens('text')}) AS token FROM documents)
GROUP BY token
ORDER BY exact_count DESC, token
LIMIT {STREAM_PROBE_N}
"""


STREAMING_CMS_SNAPSHOT_SQL = _streaming_cms_snapshot_sql()
