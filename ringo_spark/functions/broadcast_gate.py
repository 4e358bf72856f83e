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
# The cache entry is keyed by a freshness token built from the path's
# modification time PLUS a one-level listStatus digest (child count,
# summed child lengths, max child mtime), so a table rewritten
# in-session (corpus regen, probes rewriting under the same path) is
# re-measured instead of served a stale small size — a stale grant here
# would force-broadcast a now-large table, the exact OOM the gate
# exists to prevent (r06 ADVICE).  mtime ALONE misses in-place rewrites
# inside the filesystem's mtime granularity (same-second overwrites on
# coarse-mtime stores — r07 ADVICE); the listed lengths catch those
# unless the rewrite is byte-identical, in which case the cached size is
# right anyway.  Both stats are pure namenode/liststatus calls, ~free
# next to the query they guard.
_SIZE_CACHE: dict[str, tuple[tuple, int]] = {}  # path -> (token, bytes)


def _freshness_token(fs, p) -> tuple:
    st = fs.getFileStatus(p)
    n = total = child_mtime = 0
    for k in fs.listStatus(p):        # a plain file lists as itself
        n += 1
        total += int(k.getLen())
        child_mtime = max(child_mtime, int(k.getModificationTime()))
    return (int(st.getModificationTime()), n, total, child_mtime)


def table_size_bytes(spark, path: str) -> int:
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    token = _freshness_token(fs, p)
    hit = _SIZE_CACHE.get(path)
    if hit is None or hit[0] != token:
        _SIZE_CACHE[path] = (token,
                             int(fs.getContentSummary(p).getLength()))
    return _SIZE_CACHE[path][1]


def invalidate_size_cache(path: str | None = None) -> None:
    """Drop cached sizes — an explicit escape hatch for CALLERS that
    rewrite a gated source path in place (corpus-regeneration tooling,
    tests) and must not rely on the freshness token catching the
    rewrite.  The engine itself never needs it: its own outputs are
    joined via explicit ``F.broadcast``, not the size gate."""
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
