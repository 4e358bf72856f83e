"""Streaming twin of weighted sampling without replacement —
:func:`ringo_spark.operators.sampling.sample_weighted_df` as a
continuously-maintained reservoir.

Why this is exact, not approximate: the Efraimidis–Spirakis key
``-ln(u)/w`` is a pure per-document function (u from the portable
content hash), so top-k over a union decomposes —
``topk(A ∪ B) == topk(topk(A) ∪ topk(B))``.  Each micro-batch
therefore contributes its own local top-k and the reservoir merge is
associative AND commutative: any batch split, any replay order,
converges to the bit-identical reservoir the batch operator computes
over the full corpus (pytest-pinned under an honest hash-split replay,
like the CMS twin; contrast the span twin's ordering contract).

State is O(k) rows.  Each trigger writes the merged reservoir under an
immutable ``v<batch_id>`` dir and flips a one-line ``_LATEST`` pointer
— the engine's manifest-commit idea in miniature: a retried
micro-batch rewrites its own version dir and re-flips the pointer to
the same value, so retries are idempotent (also pinned); reservoir
rows are deduped by doc_id before the cut, so a retry re-offering docs
already in the reservoir cannot double-insert them.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from ..catalog import read_parquet_stable as _rps

from .. import index_lifecycle as _ilc
from ..operators.sampling import WEIGHTED_K, aes_weight_key
from ..operators.textfn import phash

_LATEST = "_LATEST"


def _key_cols(df: DataFrame) -> DataFrame:
    # the SHARED batch key expression (r17 review) — bit-equality with
    # sample_weighted_df is this row's whole contract
    w, key = aes_weight_key()
    return df.select("doc_id", w.alias("weight"), key.alias("k"))


def streaming_weighted_reservoir(k: int = WEIGHTED_K):
    """foreachBatch maker: maintain the corpus-wide A-ES reservoir (the
    k smallest exponential keys seen so far) across micro-batches.

    Usage::

        updater = streaming_weighted_reservoir()
        (stream.writeStream.foreachBatch(updater(reservoir_path))
         .trigger(availableNow=True).start())
    """

    def maker(reservoir_path: str):
        def update(batch_df: DataFrame, batch_id: int) -> None:
            spark = batch_df.sparkSession
            cand = _key_cols(batch_df).orderBy("k", "doc_id").limit(k)
            ptr = os.path.join(reservoir_path, _LATEST)
            prev = _ilc.read_pointer(ptr)
            if prev is not None:
                cand = spark.read.parquet(
                    os.path.join(reservoir_path, prev)).unionByName(cand)
            merged = (cand.dropDuplicates(["doc_id"])
                      .orderBy("k", "doc_id").limit(k))
            vdir = f"v{batch_id}"
            merged.write.mode("overwrite").parquet(
                os.path.join(reservoir_path, vdir))
            _ilc.flip_pointer(ptr, vdir)
            # GC: without this, v<id> dirs accrue O(k x batches) on a
            # long-running deployment.  Keep the current version and
            # the one just superseded (in-flight readers may still
            # hold it); older unreachable dirs are removed only past
            # the kernel's liveness age (r17 review: an immediate
            # delete raced concurrent sessions sharing the sink root —
            # the exact hazard gc_index_root's GC_MIN_AGE_SECONDS
            # guards everywhere else — and a retried batch, whose
            # prev == vdir, deleted the genuinely-previous version).
            import shutil
            import time
            cutoff = time.time() - _ilc.GC_MIN_AGE_SECONDS
            for d in os.listdir(reservoir_path):
                full = os.path.join(reservoir_path, d)
                try:
                    if d.startswith("v") and d not in (vdir, prev) \
                            and os.path.getmtime(full) < cutoff:
                        shutil.rmtree(full, ignore_errors=True)
                except OSError:
                    continue   # a concurrent GC got it first
        return update

    return maker


# --- registered driver row (r14, VERDICT r13 item 8) -------------------------

RESERVOIR_SPLITS = 3


def streaming_reservoir_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EAGER (registry.EAGER_QUERIES): the reservoir twin's driver row.
    Replays the corpus as deterministic hash-split micro-batches
    through the foreachBatch updater into a fingerprint-tagged sink,
    then snapshots — the result must be BIT-EQUAL to the batch
    ``sample_weighted`` operator (topk-of-union decomposition), so it
    shares sample_weighted's oracle verbatim: the streaming state
    machinery itself (version dirs, pointer flips, per-batch merge, GC)
    sits under the driver hash.  Reruns re-merge the already-final
    reservoir per batch — a fixed point, so the row is rerun-stable."""
    fp = _ilc.source_fingerprint(sf_dir, "documents.parquet")
    tag = _ilc.index_tag(
        f"{os.path.abspath(sf_dir)}|reservoir|{RESERVOIR_SPLITS}|{fp}")
    from .vocab import _sink_root
    res = os.path.join(_sink_root(), f"res-{tag}")
    docs = _rps(spark, f"{sf_dir}/documents.parquet")
    updater = streaming_weighted_reservoir()
    for i in range(RESERVOIR_SPLITS):
        updater(res)(
            docs.where(F.pmod(F.col("doc_id"),
                              F.lit(RESERVOIR_SPLITS)) == i), i)
    _ilc.gc_index_root(_sink_root(), protect=res)   # stale-tag LRU, as above
    return reservoir_snapshot(spark, res)


def reservoir_snapshot(spark: SparkSession,
                       reservoir_path: str) -> DataFrame:
    """The current reservoir in the batch operator's output shape
    (doc_id, weight, sel_rank) — bit-comparable to
    ``sample_weighted_df`` after a full replay."""
    latest = _ilc.read_pointer(os.path.join(reservoir_path, _LATEST))
    if latest is None:
        # surface the real condition instead of os.path.join(None)'s
        # TypeError (r17 review)
        raise FileNotFoundError(
            f"{reservoir_path}: no completed reservoir batch "
            "(missing _LATEST pointer — empty sink)")
    cur = spark.read.parquet(os.path.join(reservoir_path, latest))
    rk = Window.orderBy("k", "doc_id")    # k rows: single partition OK
    return (cur.select("doc_id", "weight",
                       F.row_number().over(rk).alias("sel_rank"))
            .orderBy("sel_rank"))
