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
# Freshness (r06/r07/r08 ADVICE lineage): the token is the path's own
# mtime plus getContentSummary's RECURSIVE (length, fileCount,
# directoryCount) — the summary covers every depth, so an in-place
# rewrite inside a partition subdirectory (which leaves the top-level
# mtime and one-level listStatus digest unchanged — the depth-1+ hole
# the r08 ADVICE found in the previous design) changes the token
# whenever it changes any byte count or file count.  A rewrite the
# summary CAN'T see (identical total length AND file/dir counts AND
# top mtime) necessarily leaves the cached size correct, since the size
# IS the summed length.  Cost: getContentSummary is one namenode RPC on
# HDFS / a recursive list on object stores per gated build — the length
# it returns is also the answer, so the "cache" now only avoids the
# Path/FileSystem JVM round-trips, and correctness never rides on it.
_SIZE_CACHE: dict[str, tuple[tuple, int]] = {}  # path -> (token, bytes)


def _freshness_token(fs, p) -> tuple:
    st = fs.getFileStatus(p)
    cs = fs.getContentSummary(p)   # recursive: all depths
    return (int(st.getModificationTime()), int(cs.getLength()),
            int(cs.getFileCount()), int(cs.getDirectoryCount()))


def table_size_bytes(spark, path: str) -> int:
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    token = _freshness_token(fs, p)
    hit = _SIZE_CACHE.get(path)
    if hit is None or hit[0] != token:
        _SIZE_CACHE[path] = (token, token[1])  # size = summary length
    return _SIZE_CACHE[path][1]


def invalidate_size_cache(path: str | None = None) -> None:
    """Drop cached sizes — an explicit escape hatch kept for API
    stability.  Since the token moved to the recursive content summary
    (r09) the gate re-measures every rewrite that changes any byte or
    file count at any depth on its own; the only rewrites the token
    misses leave the summed length — i.e. the cached answer — correct.
    The engine itself never needs it: its own outputs are joined via
    explicit ``F.broadcast``, not the size gate."""
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
