"""Core data model: tables, columns, constraints, facts, settings.

Mirrors the reference's type layer (``/root/reference/src/Ringo/Types/Internal.hs``):

- ``Column``                 -> Internal.hs:29-33
- ``TableConstraint``        -> Internal.hs:41-44 (PrimaryKey | UniqueKey | ForeignKey)
- ``Table``                  -> Internal.hs:51-55
- ``TimeUnit``               -> Internal.hs:61-72
- ``Fact`` / ``FactColumn``  -> Internal.hs:74-117
- ``FactColumnType`` algebra -> Internal.hs:87-98 (11 constructors)
- ``Settings``               -> Internal.hs:134-169 (defaults at :152-169)
- ``ValidationError``        -> Internal.hs:171-180
- ``Env``                    -> Internal.hs:184-194

Everything here is pure Python — no Spark imports.  The Spark execution
layer consumes these values; this module is the declarative schema side.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field, replace
from typing import Optional, Union

ColumnName = str
ColumnType = str  # opaque type string, e.g. "integer", "character varying(50)"
TableName = str


class Nullable(enum.Enum):
    NULL = "null"
    NOT_NULL = "notnull"


@dataclass(frozen=True)
class Column:
    name: ColumnName
    type: ColumnType
    nullable: Nullable = Nullable.NULL

    def with_name(self, name: ColumnName) -> "Column":
        return replace(self, name=name)

    def not_null(self) -> "Column":
        return replace(self, nullable=Nullable.NOT_NULL)


@dataclass(frozen=True)
class PrimaryKey:
    column: ColumnName


@dataclass(frozen=True)
class UniqueKey:
    columns: tuple[ColumnName, ...]

    def __init__(self, columns):
        object.__setattr__(self, "columns", tuple(columns))


@dataclass(frozen=True)
class ForeignKey:
    table: TableName
    # [(this-table column, other-table column)]
    columns: tuple[tuple[ColumnName, ColumnName], ...]

    def __init__(self, table, columns):
        object.__setattr__(self, "table", table)
        object.__setattr__(self, "columns", tuple((a, b) for a, b in columns))


TableConstraint = Union[PrimaryKey, UniqueKey, ForeignKey]


@dataclass(frozen=True)
class Table:
    name: TableName
    columns: tuple[Column, ...]
    constraints: tuple[TableConstraint, ...] = ()

    def __init__(self, name, columns, constraints=()):
        object.__setattr__(self, "name", name)
        object.__setattr__(self, "columns", tuple(columns))
        object.__setattr__(self, "constraints", tuple(constraints))

    def find_column(self, name: ColumnName) -> Optional[Column]:
        for c in self.columns:
            if c.name == name:
                return c
        return None

    def column_names(self) -> list[ColumnName]:
        return [c.name for c in self.columns]


class TimeUnit(enum.Enum):
    """Reference Internal.hs:61-72."""

    SECOND = ("second", 1)
    MINUTE = ("minute", 60)
    HOUR = ("hour", 3600)
    DAY = ("day", 86400)
    WEEK = ("week", 604800)

    @property
    def unit_name(self) -> str:
        return self.value[0]

    @property
    def seconds(self) -> int:
        return self.value[1]


# --- FactColumnType algebra (reference Internal.hs:87-98) -------------------
# Each variant pairs with a FactColumn target column name.  Semantics per
# SURVEY.md §2.3; population expressions in Populate/Fact.hs:155-192.


@dataclass(frozen=True)
class DimTime:
    """Time dimension: rollup grain + incremental watermark column."""


@dataclass(frozen=True)
class NoDimId:
    """Degenerate dimension: keep raw column as a grouping key."""


@dataclass(frozen=True)
class TenantId:
    """Multi-tenant partition key (grouping key + storage partition)."""


@dataclass(frozen=True)
class DimId:
    """FK to a pre-existing dimension table."""

    table: TableName


@dataclass(frozen=True)
class DimVal:
    """Value normalized into a derived dimension table."""

    table: TableName


@dataclass(frozen=True)
class FactCount:
    source_column: Optional[ColumnName] = None


@dataclass(frozen=True)
class FactCountDistinct:
    source_column: Optional[ColumnName] = None


@dataclass(frozen=True)
class FactSum:
    source_column: ColumnName


@dataclass(frozen=True)
class FactAverage:
    source_column: ColumnName


@dataclass(frozen=True)
class FactMax:
    source_column: ColumnName


@dataclass(frozen=True)
class FactMin:
    source_column: ColumnName


FactColumnType = Union[
    DimTime, NoDimId, TenantId, DimId, DimVal,
    FactCount, FactCountDistinct, FactSum, FactAverage, FactMax, FactMin,
]


@dataclass(frozen=True)
class FactColumn:
    """Reference Internal.hs:113-117."""

    target_column: ColumnName
    type: FactColumnType

    def source_column_name(self) -> Optional[ColumnName]:
        """Reference Internal.hs:119-132 (factSourceColumnName)."""
        t = self.type
        if isinstance(t, (DimTime, NoDimId, TenantId, DimId, DimVal)):
            return self.target_column
        if isinstance(t, (FactCount, FactCountDistinct)):
            return t.source_column
        return t.source_column  # Sum/Average/Max/Min


@dataclass(frozen=True)
class Fact:
    """Reference Internal.hs:74-80."""

    name: TableName
    table_name: TableName            # OLTP source table
    columns: tuple[FactColumn, ...]
    persistent: bool = True
    parent_names: tuple[TableName, ...] = ()

    def __init__(self, name, table_name, columns, persistent=True, parent_names=()):
        object.__setattr__(self, "name", name)
        object.__setattr__(self, "table_name", table_name)
        object.__setattr__(self, "columns", tuple(columns))
        object.__setattr__(self, "persistent", persistent)
        object.__setattr__(self, "parent_names", tuple(parent_names))


@dataclass(frozen=True)
class Settings:
    """Reference Internal.hs:134-169; defaults Internal.hs:152-169."""

    dim_prefix: str = "dim_"
    fact_prefix: str = "fact_"
    time_unit: TimeUnit = TimeUnit.MINUTE
    avg_count_column_suffix: str = "_count"
    avg_sum_column_suffix: str = "_sum"
    dim_table_id_column_name: str = "id"
    dim_table_id_column_type: str = "serial"
    fact_count_column_type: str = "integer"
    fact_count_distinct_error_rate: float = 0.05
    fact_infix: str = "_by_"
    dependencies_json_file_name: str = "dependencies.json"
    facts_json_file_name: str = "facts.json"
    dimension_json_file_name: str = "dimensions.json"
    foreign_key_id_coalesce_value: int = -1
    table_name_suffix_template: str = "{{suff}}"


TypeDefaults = dict[str, str]  # type prefix -> default literal (SQL text)


class PopulationMode(enum.Enum):
    """Reference Internal.hs:196."""

    FULL = "full"
    INCREMENTAL = "incremental"


# --- Validation errors (reference Internal.hs:171-180) ----------------------


@dataclass(frozen=True)
class ValidationError:
    kind: str          # MissingTable | DuplicateTable | MissingFact | ...
    subject: str
    detail: str = ""

    def __str__(self) -> str:
        return f"{self.kind}: {self.subject}" + (f" ({self.detail})" if self.detail else "")


class ValidationFailed(Exception):
    def __init__(self, errors: list[ValidationError]):
        self.errors = errors
        super().__init__("; ".join(map(str, errors)))


@dataclass(frozen=True)
class Env:
    """Validated environment (reference Internal.hs:184-194).

    Construct via :func:`ringo_spark.validator.make_env` — do not build
    directly unless inputs are already known-valid.
    """

    tables: tuple[Table, ...]
    facts: tuple[Fact, ...]
    settings: Settings = field(default_factory=Settings)
    type_defaults: tuple[tuple[str, str], ...] = ()

    def __init__(self, tables, facts, settings=None, type_defaults=()):
        object.__setattr__(self, "tables", tuple(tables))
        object.__setattr__(self, "facts", tuple(facts))
        object.__setattr__(self, "settings", settings or Settings())
        if isinstance(type_defaults, dict):
            type_defaults = tuple(type_defaults.items())
        object.__setattr__(self, "type_defaults", tuple(type_defaults))

    def find_table(self, name: TableName) -> Optional[Table]:
        for t in self.tables:
            if t.name == name:
                return t
        return None

    def find_fact(self, name: TableName) -> Optional[Fact]:
        for f in self.facts:
            if f.name == name:
                return f
        return None

    def type_default_for(self, column_type: ColumnType) -> str:
        """Longest-prefix-free lookup mirroring Generator/Internal.hs:24-36:
        first key (in sorted order, as Haskell's Map.toList yields) that is a
        prefix of the column type.  Raises if absent (fail-fast parity)."""
        for k, v in sorted(self.type_defaults):
            if column_type.startswith(k):
                return v
        raise KeyError(f"Default value not known for column type: {column_type}")
