"""Bucketed storage for co-located joins.

The reference's one potentially-large join is the parent-fact source join
(e.g. lineitem ⋈ orders on the declared FK, Populate/Fact.hs:212).  Dims
broadcast; this one doesn't.  At 100 TB that's the single biggest shuffle
in the pipeline — unless both sources are stored bucketed by the join key,
in which case Spark's bucketed scan lines partitions up and the sort-merge
join runs with **no Exchange on either side**.

Bucket count sizing: target ~128-256 MB of post-pruning data per bucket
per side; for a 100 TB lineitem that's O(100k) buckets — pick a power of
two so a later re-bucketing can split/merge cleanly.

``tests/test_bucketing.py`` proves the exchange elimination on the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table_name: str, bucket_cols: list[str],
                   num_buckets: int, path: str | None = None,
                   sort_cols: list[str] | None = None) -> None:
    """Persist a source bucketed (and sorted) by its join key."""
    w = (df.write.mode("overwrite").format("parquet")
         .bucketBy(num_buckets, *bucket_cols)
         .sortBy(*(sort_cols or bucket_cols)))
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def bucketize_for_fact_join(spark: SparkSession, catalog: dict[str, DataFrame],
                            pairs: list[tuple],
                            num_buckets: int = 8,
                            prefix: str = "bkt_",
                            path_root: str | None = None) -> dict[str, DataFrame]:
    """Bucket both sides of each (left_table, left_cols, right_table,
    right_cols) join pair; returns a catalog of the bucketed tables.
    Column entries may be a single name or a sequence — a composite FK
    buckets on ALL its columns (bucketing on a prefix would still
    shuffle: Spark only elides the Exchange when the join keys equal the
    bucket spec).  A table requested with two DIFFERENT bucket keys is an
    error — one physical layout can't co-locate both joins; bucket for
    one and let the other shuffle, explicitly.
    ``path_root`` places the bucketed files under a chosen directory
    (e.g. the engine's storage path) instead of the session warehouse."""
    out = dict(catalog)
    done: dict[str, list[str]] = {}
    for lt, lc, rt, rc in pairs:
        for name, cols in ((lt, lc), (rt, rc)):
            cols = [cols] if isinstance(cols, str) else list(cols)
            if name in done:
                if done[name] != cols:
                    raise ValueError(
                        f"table {name!r} requested with two different bucket "
                        f"keys ({done[name]} vs {cols}); one physical layout "
                        f"cannot co-locate both joins — pass explicit pairs "
                        f"bucketing it for one key only")
                continue
            path = f"{path_root}/{prefix}{name}" if path_root else None
            write_bucketed(catalog[name], prefix + name, cols, num_buckets,
                           path=path)
            out[name] = spark.table(prefix + name)
            done[name] = cols
    return out
