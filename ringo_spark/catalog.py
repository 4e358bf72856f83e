"""Source catalog: named tables -> DataFrames, cast to declared schemas.

The reference's generated SQL runs against Postgres tables whose types are
declared in the YAML input; our equivalent is loading Parquet (or any Spark
source) and casting each declared column to its declared type
(SURVEY.md §1.3: explicit StructType per source table, validated against
the actual DataFrame schema at load time).

Scale notes: the cast-select is a narrow projection that Catalyst pushes
into the scan (column pruning reaches the Parquet reader); unreferenced
parquet columns are never read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .model import Env, Table
from .sparktypes import pg_type_to_spark

# reserved prefix for pushdown shadow columns of nanos-encoded timestamps
RAW_NS_PREFIX = "__raw_ns_"


def cast_to_declared(df: DataFrame, table: Table) -> DataFrame:
    """Project the declared columns, casting to declared types."""
    from pyspark.sql import types as T

    missing = [c.name for c in table.columns if c.name not in df.columns]
    if missing:
        raise ValueError(f"table {table.name}: source is missing columns {missing}")
    actual = {f.name: f.dataType for f in df.schema.fields}
    exprs = []
    for c in table.columns:
        target = pg_type_to_spark(c.type)
        col = F.col(c.name)
        if (isinstance(target, T.TimestampType)
                and isinstance(actual[c.name], T.LongType)):
            # Parquet TIMESTAMP(NANOS) read as long via
            # spark.sql.legacy.parquet.nanosAsLong (Spark rejects the nanos
            # logical type otherwise); truncate to microseconds.  Truncation
            # never moves a value across a micro-aligned boundary, so time
            # filters and bucket floors are unaffected.
            #
            # Predicates on the converted expression can NOT be pushed to
            # the parquet scan (the scan column is the raw long), which
            # would kill row-group/partition pruning on the watermark
            # column at scale — so the raw nanos column is kept alongside
            # under a reserved name; the populate executors add an
            # equivalent pushable predicate on it (populate.common
            # raw_time_filter) and it never reaches any output projection.
            exprs.append(F.col(c.name).alias(RAW_NS_PREFIX + c.name))
            col = F.timestamp_micros(F.floor(col / F.lit(1000)).cast("long"))
        exprs.append(col.cast(target).alias(c.name))
    return df.select(*exprs)


# Footer-schema memo (r19 opt, guide §1/§5 — driver overhead): every
# bare ``spark.read.parquet`` pays a schema-inference job (list + read
# footers) at CONSTRUCTION time; a fact query builds against 2-4 tables
# and the bench constructs every query twice, so these metadata jobs
# alone cost ~0.2 s wall per construction.  This is metastore
# semantics, NOT result caching: only the inferred StructType is
# reused — every read still scans the parquet data — and the key
# includes the file's (size, mtime_ns), so any data change re-infers.
# Scoped to SINGLE-FILE sources (the immutable base tables); directory
# sources (indexes, sinks) have rewrite lifecycles whose root mtime is
# not a reliable fingerprint and keep the plain read.
_SCHEMA_CACHE: dict = {}


def read_parquet_stable(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet(path)`` with the footer schema memoized per
    (path, size, mtime_ns) — single regular files only (falls back to a
    plain read otherwise).  Requires the session confs the engine
    always sets (nanosAsLong; see load_catalog) to be in place before
    the first inference of a nanos-timestamped table."""
    import os

    try:
        st = os.stat(path)
        if not os.path.isfile(path):
            return spark.read.parquet(path)
    except OSError:
        return spark.read.parquet(path)
    key = (os.path.abspath(path), st.st_size, st.st_mtime_ns)
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


def load_catalog(spark: SparkSession, sf_dir: str, tables) -> dict[str, DataFrame]:
    """Load ``<sf_dir>/<table>.parquet`` for each declared table, cast to the
    declared schema."""
    # Runtime confs the engine depends on, set here so an externally built
    # session (e.g. the driver's) works too: nanos timestamps readable, and
    # UTC epoch bucketing regardless of machine timezone.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out = {}
    for t in tables:
        path = f"{sf_dir}/{t.name}.parquet"
        raw = read_parquet_stable(spark, path)
        df = cast_to_declared(raw, t)
        # breadcrumbs for consumers that run CPU-dense map work over
        # this frame (populate/fact.py): the source path feeds
        # spread_source's driver-side split estimate, and the raw
        # pre-cast frame lets the widener put the declared-schema casts
        # ABOVE the round-robin exchange — the single-row-group local
        # file decodes serially either way, but the decimal/timestamp
        # casts then run at full width and the exchange carries the
        # narrower raw types.  Plain Python attributes — never
        # serialized, never part of the plan.
        df._ringo_src_path = path
        df._ringo_raw = (raw, t)
        out[t.name] = df
    return out


def get_spark(app_name: str = "ringo-spark", cpus: str | int = "*") -> SparkSession:
    """Session tuned for the local test harness; on a real cluster these
    come from spark-submit conf.  AQE handles runtime re-planning (skew
    joins, dynamic coalescing); session TZ pinned UTC so epoch bucketing is
    deterministic.

    maxPartitionBytes: the testdata ships ONE parquet file per table, so
    the default 128m would run every scan (and its map-side partial
    aggregation) as a single task.  8m splits the file across cores —
    the local analogue of the many-split layout a real corpus has.  At
    cluster scale leave the default (or size to executor memory) via
    SPARK_GRAFT_MAX_PARTITION_BYTES.

    coalescePartitions.minPartitionSize (r19 opt, guide §2): with
    parallelismFirst (default on), AQE coalesces small shuffles down to
    ``max(bytes / minPartitionSize, parallelism)`` partitions — at the
    default 1m floor a CPU-dense 9 MB exchange (dedup cluster
    propagation, per-pair cosine verification) collapses to ~9 tasks on
    32 cores.  256k keeps such stages at full width; on a real cluster
    the shuffles that matter dwarf both floors, so the setting is inert
    there (env-tunable like maxPartitionBytes)."""
    import os

    mpb = os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m")
    mps = os.environ.get("SPARK_GRAFT_MIN_PARTITION_SIZE", "256k")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
                mps)
        .config("spark.sql.files.maxPartitionBytes", mpb)
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
