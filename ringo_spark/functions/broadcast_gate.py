"""Size-gated broadcast hints.

An explicit ``F.broadcast(df)`` OVERRIDES Catalyst's
``autoBroadcastJoinThreshold`` size check — useful when the optimizer's
file-size estimate is too pessimistic for a filtered dimension, but
dangerous for tables that grow with the data (TPC-H ``customer`` /
``supplier`` scale linearly with SF: at sf100 customer is ~15M rows /
several GB, and a forced broadcast OOMs the driver and every executor
instead of degrading to a shuffle join).

``broadcast_if_small`` keeps the hint's latency benefit where it is safe
and removes the scale cliff: the hint is applied only when Catalyst's
own size estimate for the (already filtered/pruned) plan is under a
gate.  Above the gate no hint is emitted, so the join planner falls back
to its normal strategy — and AQE, seeing the *actual* post-filter sizes
at runtime, still converts to a broadcast join whenever the filtered
side really is small.  The gate errs high on purpose: plan-size
estimates are pre-filter file sizes, so a gate of 256 MB still only
admits genuinely dim-sized inputs while never admitting a fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Conf key the plan tests (and operators) use to move the gate; value in
# bytes.  Estimates compare against this, not autoBroadcastJoinThreshold,
# because plan estimates are inflated (pre-filter, on-disk size).
GATE_CONF_KEY = "ringo.broadcastGateBytes"
DEFAULT_GATE_BYTES = 256 * 1024 * 1024


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's sizeInBytes estimate for the optimized logical plan
    (file size scaled by pruning; works on any filesystem the cluster
    reads, unlike stat()ing paths locally).  Costs an optimizer pass
    (~100ms on a fresh read) — for hot query-builder paths prefer the
    cached ``size_path`` route in :func:`broadcast_if_small`."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


# On-disk size per source path, resolved through the Hadoop FileSystem
# (works on any scheme the cluster reads: file://, s3a://, hdfs://).
# The size IS getContentSummary's recursive length (every depth — the
# r08 ADVICE's partition-subdir staleness hole cannot exist, because
# the measurement and the answer are the same recursive walk; there is
# no token to go stale).  Cost model (r09 ADVICE — the old token-keyed
# cache re-listed on every call, making it dead weight): each
# measurement is one namenode RPC on HDFS but a full recursive list on
# s3a/gcs, so measurements are amortized by a TTL.  TTL=0 (default)
# re-measures every call — always fresh, right for local/HDFS and for
# the correctness tests; set ``ringo.sizeTtlSeconds`` on object stores
# to trade a bounded staleness window for not re-listing per gated
# join build.  Staleness within the TTL only mis-sizes a HINT: the
# gate is a latency optimization, and AQE re-picks the join strategy
# from real runtime sizes either way.
SIZE_TTL_CONF_KEY = "ringo.sizeTtlSeconds"
_SIZE_CACHE: dict[str, tuple[float, int]] = {}  # path -> (measured_at, bytes)


def _measure_size(spark, path: str) -> int:
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return int(fs.getContentSummary(p).getLength())  # recursive: all depths


def table_size_bytes(spark, path: str) -> int:
    import time

    ttl_conf = spark.conf.get(SIZE_TTL_CONF_KEY, None)
    ttl = float(ttl_conf) if ttl_conf is not None else 0.0
    now = time.monotonic()
    hit = _SIZE_CACHE.get(path)
    if hit is not None and ttl > 0 and now - hit[0] < ttl:
        return hit[1]
    size = _measure_size(spark, path)
    _SIZE_CACHE[path] = (now, size)
    return size


def invalidate_size_cache(path: str | None = None) -> None:
    """Drop cached sizes: forces the next ``table_size_bytes`` to
    re-measure even inside a ``ringo.sizeTtlSeconds`` window.  A public
    escape hatch for callers that set ``ringo.sizeTtlSeconds`` > 0 and
    rewrite a source in place before re-planning against it; with the
    default TTL of 0 it is a no-op beyond hygiene (every call
    re-measures anyway)."""
    if path is None:
        _SIZE_CACHE.clear()
    else:
        _SIZE_CACHE.pop(path, None)


def broadcast_if_small(df: DataFrame, gate_bytes: int | None = None,
                       size_path: str | None = None) -> DataFrame:
    """Apply ``F.broadcast`` only when the size estimate is under the
    gate; otherwise return ``df`` unhinted so Catalyst/AQE pick the join
    strategy from real sizes.  Gate order: explicit arg > spark conf
    ``ringo.broadcastGateBytes`` > 256 MB default.

    ``size_path``: gate on the (cached) on-disk size of the source table
    instead of a per-call optimizer pass — the right choice inside query
    builders that are re-invoked per run.  Conservative: the on-disk
    size ignores filters, so it only ever WITHHOLDS a hint the plan
    estimate would grant; AQE re-adds runtime broadcasts from real
    post-filter sizes."""
    if gate_bytes is None:
        conf = df.sparkSession.conf.get(GATE_CONF_KEY, None)
        gate_bytes = int(conf) if conf is not None else DEFAULT_GATE_BYTES
    size = (table_size_bytes(df.sparkSession, size_path)
            if size_path is not None else plan_size_bytes(df))
    if size <= gate_bytes:
        return F.broadcast(df)
    return df
