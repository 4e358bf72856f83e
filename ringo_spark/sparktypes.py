"""Postgres type-string -> Spark DataType mapping (SURVEY.md §1.2).

The reference treats column types as opaque Postgres strings
(``type ColumnType = Text``, Types/Internal.hs:20).  Our execution layer
interprets them exactly once: to produce Spark ``StructType`` schemas and
to cast loaded sources to their declared types.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

from .model import Column, Nullable, Table

_DECIMAL_RE = re.compile(r"^(?:numeric|decimal)\s*\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)")


def pg_type_to_spark(pg_type: str) -> T.DataType:
    t = pg_type.strip().lower()
    m = _DECIMAL_RE.match(t)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2) or 0))
    if t in ("numeric", "decimal"):
        return T.DecimalType(38, 18)
    if t in ("integer", "int", "int4", "serial"):
        return T.IntegerType()
    if t in ("smallint", "int2", "smallserial"):
        return T.ShortType()
    if t in ("bigint", "int8", "bigserial"):
        return T.LongType()
    if t in ("double precision", "float8", "double"):
        return T.DoubleType()
    if t in ("real", "float4", "float"):
        return T.FloatType()
    if t == "boolean":
        return T.BooleanType()
    if t == "date":
        return T.DateType()
    if t.startswith("timestamp"):
        # Both tz-less and tz'd Postgres timestamps map to TimestampType with
        # the session timezone pinned to UTC (catalog.get_spark), making
        # epoch arithmetic identical to naive-UTC semantics while avoiding
        # NTZ-vs-instant comparison casts in every predicate.
        return T.TimestampType()
    if (t in ("uuid", "text", "json", "jsonb") or t.startswith("character")
            or t.startswith("varchar") or t.startswith("char")):
        return T.StringType()
    if t.startswith("array<") or t.endswith("[]"):
        inner = t[6:-1] if t.startswith("array<") else t[:-2]
        return T.ArrayType(pg_type_to_spark(inner))
    if t == "binary" or t == "bytea":
        return T.BinaryType()
    raise ValueError(f"Unmapped column type: {pg_type}")


def column_to_field(col: Column) -> T.StructField:
    return T.StructField(col.name, pg_type_to_spark(col.type),
                         nullable=col.nullable == Nullable.NULL)


def table_to_struct(table: Table) -> T.StructType:
    return T.StructType([column_to_field(c) for c in table.columns])
