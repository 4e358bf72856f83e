"""YAML input parser (reference ``app/Ringo/InputParser.hs``).

Accepts the same YAML shape the reference does:

.. code-block:: yaml

    tables:
      - name: events
        columns:
          - [event_id, bigint, notnull]   # nullable defaults to "null"
          - [ts, timestamp without time zone, notnull]
        constraints:
          - type: primary
            column: event_id
          - type: foreign
            table: users
            columns: [[user_id, id]]
    facts:
      - name: events
        tablename: events
        persistent: true       # default true   (InputParser.hs:74)
        parentfacts: []        # default []     (InputParser.hs:75)
        columns:
          - { type: dimtime, column: ts }
          - { type: factsum, column: value_sum, sourcecolumn: value }
    defaults:
      integer: "-1"
"""

from __future__ import annotations

from .model import (
    Column, DimId, DimTime, DimVal, Fact, FactAverage, FactColumn, FactCount,
    FactCountDistinct, FactMax, FactMin, FactSum, ForeignKey, NoDimId,
    Nullable, PrimaryKey, Table, TenantId, UniqueKey,
)

try:
    import yaml
except ImportError:  # pragma: no cover
    yaml = None


def _parse_nullable(s: str) -> Nullable:
    if s == "null":
        return Nullable.NULL
    if s == "notnull":
        return Nullable.NOT_NULL
    raise ValueError(f"Invalid value for nullable: {s}")


def _parse_column(spec) -> Column:
    if not isinstance(spec, (list, tuple)) or len(spec) < 2:
        raise ValueError(f"Column needs at least two elements: name and type: {spec!r}")
    name, ctype = spec[0], spec[1]
    try:
        nullable = _parse_nullable(spec[2]) if len(spec) > 2 else Nullable.NULL
    except ValueError as e:
        if "(" in str(ctype) and ")" not in str(ctype):
            # classic YAML flow-list trap: [value, numeric(18,2)] splits the
            # type on its comma; point the user at the real problem
            raise ValueError(
                f"Column {name!r}: type {ctype!r} looks truncated at a comma "
                f"— quote parameterized types in YAML flow lists, e.g. "
                f'[{name}, "numeric(18,2)"]') from e
        raise
    return Column(str(name), str(ctype), nullable)


def _parse_constraint(spec) -> object:
    ctype = spec["type"]
    if ctype == "primary":
        return PrimaryKey(spec["column"])
    if ctype == "unique":
        return UniqueKey(spec["columns"])
    if ctype == "foreign":
        return ForeignKey(spec["table"], [tuple(p) for p in spec["columns"]])
    raise ValueError(f"Invalid constraint type: {ctype}")


def _parse_table(spec) -> Table:
    return Table(
        name=spec["name"],
        columns=[_parse_column(c) for c in spec["columns"]],
        constraints=[_parse_constraint(c) for c in spec.get("constraints", [])],
    )


_FACT_COL_TYPES = {
    "dimtime": lambda s: DimTime(),
    "nodimid": lambda s: NoDimId(),
    "tenantid": lambda s: TenantId(),
    "dimid": lambda s: DimId(s["table"]),
    "dimval": lambda s: DimVal(s["table"]),
    "factcount": lambda s: FactCount(s.get("sourcecolumn")),
    "factcountdistinct": lambda s: FactCountDistinct(s.get("sourcecolumn")),
    "factsum": lambda s: FactSum(s["sourcecolumn"]),
    "factaverage": lambda s: FactAverage(s["sourcecolumn"]),
    "factmax": lambda s: FactMax(s["sourcecolumn"]),
    "factmin": lambda s: FactMin(s["sourcecolumn"]),
}


def _parse_fact_column(spec) -> FactColumn:
    ctype = spec["type"]
    if ctype not in _FACT_COL_TYPES:
        raise ValueError(f"Invalid fact column type: {ctype}")
    return FactColumn(spec["column"], _FACT_COL_TYPES[ctype](spec))


def _parse_fact(spec) -> Fact:
    return Fact(
        name=spec["name"],
        table_name=spec["tablename"],
        persistent=spec.get("persistent", True),
        parent_names=spec.get("parentfacts", []),
        columns=[_parse_fact_column(c) for c in spec["columns"]],
    )


def parse_input_dict(doc: dict) -> tuple[list[Table], list[Fact], dict[str, str]]:
    tables = [_parse_table(t) for t in doc["tables"]]
    facts = [_parse_fact(f) for f in doc["facts"]]
    defaults = {str(k): str(v) for k, v in doc["defaults"].items()}
    return tables, facts, defaults


def parse_input(path: str) -> tuple[list[Table], list[Fact], dict[str, str]]:
    if yaml is None:  # pragma: no cover
        raise ImportError("pyyaml is required to parse YAML input files")
    with open(path) as fh:
        return parse_input_dict(yaml.safe_load(fh))
