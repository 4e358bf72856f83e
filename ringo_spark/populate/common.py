"""Shared expression builders for the population executors.

Mirrors ``/root/reference/src/Ringo/Generator/Internal.hs``:
- ``dim_column_mapping``  -> Generator/Internal.hs:18-22
- ``coalesce_column``     -> Generator/Internal.hs:24-36 (type-prefix default
  lookup; fail-fast when no default is known)

The reference emits SQL text with Postgres literals for the defaults; we
parse those literals into Spark ``Column`` literals once, here.
"""

from __future__ import annotations

import re

from pyspark.sql import Column as SparkColumn, DataFrame
from pyspark.sql import functions as F

from ..model import Column, DimVal, Env, Fact, Nullable, Table

_CAST_RE = re.compile(r"^(.*?)::[\w ]+$")  # strip Postgres '...'::type casts


def default_literal(env: Env, column_type: str) -> SparkColumn:
    """Spark literal for the type default of ``column_type``.

    Defaults are stored as SQL literal text (e.g. ``'__UNKNOWN_VAL__'``,
    ``-1``, ``false``, ``'00...'::uuid``) for parity with the reference's
    YAML input; we interpret the common literal shapes.
    """
    raw = env.type_default_for(column_type).strip()
    m = _CAST_RE.match(raw)
    if m:
        raw = m.group(1).strip()
    if raw.startswith("'") and raw.endswith("'"):
        return F.lit(raw[1:-1])
    if raw.lower() in ("true", "false"):
        return F.lit(raw.lower() == "true")
    try:
        return F.lit(int(raw))
    except ValueError:
        pass
    try:
        return F.lit(float(raw))
    except ValueError:
        pass
    return F.lit(raw)


def qcol(qualifier: str | None, name: str) -> SparkColumn:
    return F.col(f"{qualifier}.{name}") if qualifier else F.col(name)


def coalesce_column(env: Env, table: Table, col: Column,
                    qualifier: str | None = None) -> SparkColumn:
    """``coalesce(t.col, <type default>)`` for nullable columns, else the
    raw column (Generator/Internal.hs:24-36)."""
    expr = qcol(qualifier, col.name)
    if col.nullable == Nullable.NULL:
        return F.coalesce(expr, default_literal(env, col.type))
    return expr


def dim_column_mapping(dim_prefix: str, fact: Fact, dim_table_name: str
                       ) -> list[tuple[str, str]]:
    """[(dim column name, source column name)] for one derived dimension."""
    from ..extractor import dim_column_name

    return [
        (dim_column_name(fc.type.table, fc.target_column), fc.target_column)
        for fc in fact.columns
        if isinstance(fc.type, DimVal) and dim_prefix + fc.type.table == dim_table_name
    ]


def fk_spark_type(settings) -> str:
    """Spark cast target for surrogate ids / dim FK columns, derived from
    ``settings.dim_table_id_column_type`` ('serial' -> int, 'bigserial' ->
    bigint) via the same mapping the extracted schema uses
    (Extractor/Internal.hs:54-59)."""
    from ..extractor import id_col_type_to_fk_id_col_type
    from ..sparktypes import pg_type_to_spark

    return pg_type_to_spark(
        id_col_type_to_fk_id_col_type(settings.dim_table_id_column_type)
    ).simpleString()


def table_pk_column(table: Table) -> str | None:
    """The table's PrimaryKey column name, if declared.

    The reference counts distinct over the source table's primary key when
    FactCountDistinct names no source column (Populate/Fact.hs:75,
    ``fromMaybe tablePKColName scName``) — it crashes via ``head`` when the
    table has no PK; we validate instead (validator.MissingPrimaryKey)."""
    from ..model import PrimaryKey

    for c in table.constraints:
        if isinstance(c, PrimaryKey):
            return c.column
    return None


def time_column_name(fact: Fact) -> str:
    from ..model import DimTime

    for fc in fact.columns:
        if isinstance(fc.type, DimTime):
            return fc.target_column
    raise ValueError(f"fact {fact.name} has no DimTime column")


def time_bucket_expr(col: SparkColumn, unit_seconds: int) -> SparkColumn:
    """``cast(floor(extract(epoch from ts) / secs) as bigint)``
    (Populate/Fact.hs:141-148).  ``unix_timestamp`` evaluates JVM-side and
    stays inside whole-stage codegen."""
    return F.floor(F.unix_timestamp(col) / F.lit(unit_seconds)).cast("long")


def time_filter(df: DataFrame, tcol: str, op: str, bound,
                qualifier: str | None = None) -> SparkColumn:
    """Time-bound predicate that reaches the parquet scan.

    For plainly-typed timestamp columns the predicate on ``tcol`` itself is
    pushable.  For nanos-encoded sources (read as long, converted in
    :func:`ringo_spark.catalog.cast_to_declared`) the conversion blocks
    pushdown, so when the reserved raw shadow column is present an
    equivalent predicate on raw nanoseconds is AND-ed in — that one the
    scanner can prune row groups (and partitions) with."""
    import datetime as dt

    from ..catalog import RAW_NS_PREFIX

    cols = df.columns if qualifier is None else df.select(f"{qualifier}.*").columns
    expr = qcol(qualifier, tcol) < F.lit(bound) if op == "<" \
        else qcol(qualifier, tcol) >= F.lit(bound)
    raw_name = RAW_NS_PREFIX + tcol
    if raw_name in cols and isinstance(bound, dt.datetime):
        # exact integer nanos: float timestamp()*1e6 truncates
        # microsecond-precision bounds (.123456 -> .123455999...), and
        # since this predicate is AND-ed with the cast-column one, a
        # 1us-low raw bound silently DROPS rows the cast predicate
        # includes (r18 review).  Whole seconds from the calendar
        # fields, microseconds added as integers.
        aware = bound if bound.tzinfo is not None \
            else bound.replace(tzinfo=dt.timezone.utc)
        whole = int(aware.replace(microsecond=0).timestamp())
        ns = (whole * 1_000_000 + aware.microsecond) * 1000
        raw = qcol(qualifier, raw_name)
        expr = expr & (raw < F.lit(ns) if op == "<" else raw >= F.lit(ns))
    return expr
