"""Input-split widening for compute-bound map stages.

A parquet scan parallelizes at row-group granularity, so a corpus that
arrives as few large-row-group files (the local testdata ships ONE
row group per table; real corpora hit this with bulk-exported files)
runs every downstream map stage — including interpreted higher-order
expressions like shingling — on a handful of cores no matter how small
``spark.sql.files.maxPartitionBytes`` is set.

``spread`` round-robin-repartitions ONLY when the plan currently has
fewer partitions than the session's parallelism: on a well-split corpus
(100k splits on a cluster) it is the identity and never introduces the
catastrophic down-shuffle an unconditional ``repartition(cores)`` would
be.  Reserve it for stages whose per-row compute dwarfs the one-time
shuffle of the raw rows (shingling, signature building, decode lanes) —
cheap map-only projections keep their zero-Exchange plans.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# logical nodes whose presence means the frame is NOT a bare scan: its
# stage parallelism comes from shuffle.partitions, and — the real hazard
# (r17 review) — counting its partitions via df.rdd would finalize the
# AQE plan, EXECUTING every shuffle stage as a throwaway job before the
# caller's own action re-plans and re-executes them.
# Repartition/coalesce deliberately NOT listed: a caller-applied
# repartition is cheap to probe and the partition count is exactly
# what spread must inspect (coalesce(1) plans as logical Repartition).
# Matching is anchored to the NODE NAME position — the first token of
# each treeString line, after the tree-drawing prefix (``+- ``/``:- ``/
# ``:  ``) — because a substring match anywhere in the line
# false-positives on CamelCase column/relation names in the node's
# argument list and silently skips the up-repartition on a genuinely
# bare scan (ADVICE r17).  startswith, not equality: variant nodes
# (DeduplicateWithinWatermark, WindowGroupLimit) are the same families.
_NODE_HEAD = re.compile(r"^[ :+|-]*([A-Za-z]\w*)")
_MULTI_STAGE_HEADS = ("Join", "Aggregate", "Window", "Sort",
                      "Deduplicate", "CoGroup", "Distinct")


def _is_multi_stage(tree: str) -> bool:
    for line in tree.splitlines():
        m = _NODE_HEAD.match(line)
        if m and m.group(1).startswith(_MULTI_STAGE_HEADS):
            return True
    return False


def spread(df: DataFrame) -> DataFrame:
    try:
        tree = df._jdf.queryExecution().optimizedPlan().treeString()
        if _is_multi_stage(tree):
            return df
    except Exception:
        pass   # unknown plan shape: the partition probe below decides
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
