"""Source connectors.

The reference reads only Postgres tables (its generated SQL runs inside
Postgres).  Our engine's native format is Parquet; for parity with "a user
could point this at their OLTP data" we accept CSV, JSON, JDBC, and ORC
sources too — every reader lands on the same declared-schema cast
(:func:`ringo_spark.catalog.cast_to_declared`), so the rest of the engine
is source-agnostic.

Scale notes: Parquet/ORC scans get predicate pushdown + column pruning;
CSV/JSON are schema-applied at read (no inference pass over 100 TB);
JDBC reads are partitioned on a numeric column when bounds are given
(``partition_column``/``num_partitions``) — a single-connection JDBC read
of a big table is a driver bottleneck otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import cast_to_declared
from ..model import Table
from ..sparktypes import table_to_struct


def read_source(
    spark: SparkSession,
    table: Table,
    path: str,
    fmt: str = "parquet",
    options: dict | None = None,
    jdbc_url: str | None = None,
    partition_column: str | None = None,
    num_partitions: int = 32,
    lower_bound=None,
    upper_bound=None,
) -> DataFrame:
    """Read one declared table from any supported source and cast it to its
    declared schema.  ``path`` is a filesystem path (file formats) or the
    dbtable/query (JDBC)."""
    options = dict(options or {})
    if fmt in ("parquet", "orc"):
        df = spark.read.options(**options).format(fmt).load(path)
    elif fmt == "csv":
        options.setdefault("header", "true")
        # schema applied up front: no inference pass over the data.
        # enforceSchema=false makes Spark CHECK the header against the
        # declared column names instead of assigning values by position
        # (r17 review: a reordered-column export was silently misread —
        # wrong data cast into every column, no validation failure)
        options.setdefault("enforceSchema", "false")
        df = (spark.read.options(**options)
              .schema(table_to_struct(table)).csv(path))
    elif fmt == "json":
        df = (spark.read.options(**options)
              .schema(table_to_struct(table)).json(path))
    elif fmt == "jdbc":
        if jdbc_url is None:
            raise ValueError("jdbc source requires jdbc_url")
        reader = (spark.read.format("jdbc")
                  .option("url", jdbc_url).option("dbtable", path))
        for k, v in options.items():
            reader = reader.option(k, v)
        if partition_column is not None:
            if lower_bound is None or upper_bound is None:
                # fail here, not as a NumberFormatException on the
                # stringified 'None' deep inside the JDBC relation
                raise ValueError(
                    "jdbc partition_column requires lower_bound and "
                    "upper_bound")
            reader = (reader.option("partitionColumn", partition_column)
                      .option("numPartitions", str(num_partitions))
                      .option("lowerBound", str(lower_bound))
                      .option("upperBound", str(upper_bound)))
        df = reader.load()
    else:
        raise ValueError(f"unsupported source format: {fmt}")
    return cast_to_declared(df, table)


def read_media_dir(spark: SparkSession, path: str,
                   glob: str | None = None) -> DataFrame:
    """Binary media ingest via Spark's built-in ``binaryFile`` source:
    one row per file with (path, length, payload) — the on-ramp from
    "a directory of images/audio" to the multimodal decode kernels
    (``operators/multimodal.py``), which take any (id, payload) frame.

    Scale notes: binaryFile assigns whole files to tasks (no splitting),
    so a 100 TB media corpus reads embarrassingly parallel; the
    small-file explosion is the real risk — set
    ``spark.sql.files.maxPartitionBytes`` to batch many small files per
    task, and prefer consolidating tiny media into container files
    upstream.  ``glob`` maps to ``pathGlobFilter`` so non-media droppings
    in the directory are pruned at listing time."""
    from pyspark.sql import functions as F

    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    return r.load(path).select(
        "path", "length", F.col("content").alias("payload"))


def load_mixed_catalog(spark: SparkSession, specs: dict[str, dict],
                       tables) -> dict[str, DataFrame]:
    """Build a catalog from per-table source specs:
    ``{"events": {"path": "/x/events.csv", "fmt": "csv"}, ...}``"""
    by_name = {t.name: t for t in tables}
    return {
        name: read_source(spark, by_name[name], **spec)
        for name, spec in specs.items()
    }
