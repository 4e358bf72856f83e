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
    reads, unlike stat()ing paths locally)."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def broadcast_if_small(df: DataFrame, gate_bytes: int | None = None) -> DataFrame:
    """Apply ``F.broadcast`` only when the plan-size estimate is under the
    gate; otherwise return ``df`` unhinted so Catalyst/AQE pick the join
    strategy from real sizes.  Gate order: explicit arg > spark conf
    ``ringo.broadcastGateBytes`` > 256 MB default."""
    if gate_bytes is None:
        conf = df.sparkSession.conf.get(GATE_CONF_KEY, None)
        gate_bytes = int(conf) if conf is not None else DEFAULT_GATE_BYTES
    if plan_size_bytes(df) <= gate_bytes:
        return F.broadcast(df)
    return df
