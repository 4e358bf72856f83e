"""Delete propagation for persisted indexes — the right-to-be-forgotten
path a production training-data pipeline must have.

A takedown/GDPR request names document ids; every PERSISTED derivative
(minhash band+shingle index, chunk-hash index, cluster table) still
carries those ids and would keep matching against them.  Rewriting a
corpus-sized index per request is the wrong cost model at 100 TB, so
this module implements the lakehouse merge-on-read design:

- :func:`tombstone_docs` APPENDS the ids to a ``_tombstones`` log
  inside the index dir — O(request), no data rewrite;
- :func:`subtract_tombstones` anti-joins the log at read time (the
  delete set is request-sized, so the anti-join broadcasts; under the
  size gate it degrades to a shuffle anti-join) — every index reader
  in this package goes through it;
- :func:`apply_tombstones` is the periodic compaction: physically
  rewrite the index subdirs minus the tombstoned ids, then clear the
  log — read amplification returns to zero.

Derived tables are NOT patched in place: the cluster table's
``cluster_id`` is the min doc id of its component, so deleting a
representative would orphan the label — rebuild it from the (already
tombstone-filtered) index instead (``build_cluster_table(force=True)``),
which is the derived-data answer, not a special case.

Collapsed (``collapse=True``) minhash indexes store exact-dup
REPRESENTATIVES; deleting a representative requires re-electing one
from the exact-dup group, which needs the dedup_exact table — callers
must tombstone the representative AND re-append the new representative
(the probes treat the index as per-doc rows, so the swap is two rows).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOMBSTONES = "_tombstones"


def tombstone_docs(spark: SparkSession, index_path: str, ids,
                   id_col: str = "doc_id") -> None:
    """Record a delete request against ``index_path`` — an O(request)
    append to the tombstone log; no index data is touched.  Idempotent
    for readers (they distinct the log), so retrying a request is
    harmless."""
    df = spark.createDataFrame([(int(i),) for i in ids],
                               f"{id_col} LONG")
    df.coalesce(1).write.mode("append").parquet(
        os.path.join(index_path, TOMBSTONES))


def load_tombstones(spark: SparkSession, index_path: str,
                    id_col: str = "doc_id") -> DataFrame | None:
    p = os.path.join(index_path, TOMBSTONES)
    if not os.path.isdir(p):
        return None
    return spark.read.parquet(p).select(id_col).distinct()


def subtract_tombstones(df: DataFrame, tombs: DataFrame | None,
                        id_col: str = "doc_id") -> DataFrame:
    """Merge-on-read: drop rows whose ``id_col`` is tombstoned.  The
    delete set is request-sized by nature, so it rides a size-gated
    broadcast anti-join — map-only against the index scan; a
    pathologically huge log degrades to a shuffle anti-join instead of
    an OOM (and is the signal to run :func:`apply_tombstones`)."""
    if tombs is None:
        return df
    from ..functions.broadcast_gate import broadcast_if_small

    keyed = tombs.withColumnRenamed(tombs.columns[0], id_col)
    return df.join(broadcast_if_small(keyed), id_col, "left_anti")


def apply_tombstones(spark: SparkSession, index_path: str,
                     subdirs: list[str],
                     id_col: str = "doc_id") -> None:
    """Compaction (merge-on-read -> merge-on-write): rewrite each index
    subdir minus the tombstoned ids, swap it in, then clear the log.

    Crash safety on the local-fs layout: each subdir rewrites to a
    ``<sub>__compact`` sibling and swaps via rename; a crash mid-swap
    leaves either the old subdir (log intact — rerun) or the new one
    (rerun rewrites a second time, a no-op).  The log clears LAST, so
    a crash anywhere before that point keeps deletes visible through
    the read path.  On object storage the same sequence rides the
    manifest-pointer protocol the engine's table commits use."""
    tombs = load_tombstones(spark, index_path, id_col)
    if tombs is None:
        return
    for sub in subdirs:
        src = os.path.join(index_path, sub)
        tmp = os.path.join(index_path, f"{sub}__compact")
        old = os.path.join(index_path, f"{sub}__old")
        # a prior crash can leave either leftover; both are safe to
        # clear — __compact is an incomplete rewrite (redone below),
        # __old only exists after its replacement is already in place
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
        kept = subtract_tombstones(spark.read.parquet(src), tombs, id_col)
        kept.write.mode("overwrite").parquet(tmp)
        os.rename(src, old)
        os.rename(tmp, src)
        shutil.rmtree(old)
    shutil.rmtree(os.path.join(index_path, TOMBSTONES))


def apply_tombstones_partitioned(spark: SparkSession, index_path: str,
                                 partition_col: str,
                                 id_col: str = "doc_id") -> None:
    """Compaction for a PARTITIONED index root (LSH ``bucket=`` / IVF
    ``cell=`` directories): rewrite the data minus tombstoned ids with
    the same ``partitionBy`` layout, swap the partition dirs in, keep
    every underscore-hidden sidecar (``_centroids``, markers) in place,
    and clear the log last (same crash story as
    :func:`apply_tombstones`).  Partition dirs the filter empties are
    removed — their rows are all deleted."""
    tombs = load_tombstones(spark, index_path, id_col)
    if tombs is None:
        return
    kept = subtract_tombstones(spark.read.parquet(index_path), tombs,
                               id_col)
    tmp = index_path.rstrip("/") + "__compact"
    shutil.rmtree(tmp, ignore_errors=True)
    kept.write.mode("overwrite").partitionBy(partition_col).parquet(tmp)
    is_part = f"{partition_col}="
    for d in os.listdir(index_path):
        if d.startswith(is_part):
            shutil.rmtree(os.path.join(index_path, d))
    for d in os.listdir(tmp):
        if d.startswith(is_part):
            os.rename(os.path.join(tmp, d), os.path.join(index_path, d))
    shutil.rmtree(tmp)
    shutil.rmtree(os.path.join(index_path, TOMBSTONES))


def index_rows(spark: SparkSession, index_path: str,
               id_col: str = "doc_id") -> DataFrame:
    """Read an index's data rows with delete propagation applied — the
    one-call form every partitioned-index reader uses (the
    ``_tombstones`` subdir is underscore-hidden, so Spark's partition
    discovery never reads it as data)."""
    return subtract_tombstones(spark.read.parquet(index_path),
                               load_tombstones(spark, index_path, id_col),
                               id_col)


def delete_report(spark: SparkSession, index_path: str,
                  subdirs: list[str],
                  id_col: str = "doc_id") -> DataFrame:
    """Audit view: per subdir, how many physical rows the tombstone log
    currently masks — the read-amplification signal that schedules
    :func:`apply_tombstones`."""
    tombs = load_tombstones(spark, index_path, id_col)
    rows = []
    for sub in subdirs:
        df = spark.read.parquet(os.path.join(index_path, sub))
        total = df.count()
        masked = 0 if tombs is None else \
            total - subtract_tombstones(df, tombs, id_col).count()
        rows.append((sub, total, masked))
    return spark.createDataFrame(
        rows, "subdir string, total_rows long, masked_rows long")
