"""YAML input parsing (reference app/Ringo/InputParser.hs semantics:
column nullable defaults to "null", fact persistent defaults True,
parentfacts defaults [])."""

import pytest

from ringo_spark.input_parser import parse_input_dict
from ringo_spark.model import (
    DimTime, DimVal, FactSum, ForeignKey, Nullable, PrimaryKey, UniqueKey,
)

DOC = {
    "tables": [
        {
            "name": "events",
            "columns": [
                ["event_id", "bigint", "notnull"],
                ["ts", "timestamp without time zone", "notnull"],
                ["kind", "character varying(20)"],
                ["value", "numeric(18,2)"],
            ],
            "constraints": [
                {"type": "primary", "column": "event_id"},
                {"type": "unique", "columns": ["ts", "kind"]},
                {"type": "foreign", "table": "kinds", "columns": [["kind", "name"]]},
            ],
        }
    ],
    "facts": [
        {
            "name": "events",
            "tablename": "events",
            "columns": [
                {"type": "dimtime", "column": "ts"},
                {"type": "dimval", "column": "kind", "table": "kind"},
                {"type": "factsum", "column": "value_sum", "sourcecolumn": "value"},
            ],
        }
    ],
    "defaults": {"character": "'__UNKNOWN_VAL__'", "numeric": "-1"},
}


def test_parse_input_dict():
    tables, facts, defaults = parse_input_dict(DOC)
    (t,) = tables
    assert t.name == "events"
    assert t.columns[0].nullable == Nullable.NOT_NULL
    assert t.columns[2].nullable == Nullable.NULL  # default "null"
    assert t.constraints == (
        PrimaryKey("event_id"),
        UniqueKey(["ts", "kind"]),
        ForeignKey("kinds", [("kind", "name")]),
    )
    (f,) = facts
    assert f.persistent is True and f.parent_names == ()
    assert isinstance(f.columns[0].type, DimTime)
    assert isinstance(f.columns[1].type, DimVal) and f.columns[1].type.table == "kind"
    assert isinstance(f.columns[2].type, FactSum)
    assert defaults["numeric"] == "-1"


def test_bad_nullable_rejected():
    bad = {"tables": [{"name": "x", "columns": [["a", "integer", "maybe"]],
                       "constraints": []}], "facts": [], "defaults": {}}
    with pytest.raises(ValueError):
        parse_input_dict(bad)


def test_bad_fact_column_type_rejected():
    bad = dict(DOC)
    bad["facts"] = [{"name": "f", "tablename": "events",
                     "columns": [{"type": "wat", "column": "ts"}]}]
    with pytest.raises(ValueError):
        parse_input_dict(bad)


def test_all_eleven_fact_column_constructors_parse():
    """Every FactColumnType constructor round-trips from YAML
    (InputParser.hs:74-117 semantics), including the optional
    sourcecolumn on count/count-distinct."""
    from ringo_spark.model import (
        DimId, FactAverage, FactCount, FactCountDistinct, FactMax, FactMin,
        NoDimId, TenantId,
    )

    doc = {
        "tables": [{
            "name": "t",
            "columns": [["id", "bigint", "notnull"],
                        ["at", "timestamp", "notnull"],
                        ["site", "integer", "notnull"],
                        ["tenant", "integer", "notnull"],
                        ["cust", "integer", "notnull"],
                        ["kind", "text"],
                        ["v", "numeric(18,2)"]],
            "constraints": [{"type": "primary", "column": "id"}],
        }],
        "facts": [{
            "name": "f", "tablename": "t",
            "columns": [
                {"type": "dimtime", "column": "at"},
                {"type": "nodimid", "column": "site"},
                {"type": "tenantid", "column": "tenant"},
                {"type": "dimid", "column": "cust", "table": "customers"},
                {"type": "dimval", "column": "kind", "table": "kind"},
                {"type": "factcount", "column": "n"},
                {"type": "factcount", "column": "n_v", "sourcecolumn": "v"},
                {"type": "factcountdistinct", "column": "uniq"},
                {"type": "factsum", "column": "s", "sourcecolumn": "v"},
                {"type": "factaverage", "column": "avg", "sourcecolumn": "v"},
                {"type": "factmax", "column": "mx", "sourcecolumn": "v"},
                {"type": "factmin", "column": "mn", "sourcecolumn": "v"},
            ],
        }],
        "defaults": {},
    }
    tables, facts, _ = parse_input_dict(doc)
    kinds = [type(fc.type) for fc in facts[0].columns]
    assert kinds == [DimTime, NoDimId, TenantId, DimId, DimVal,
                     FactCount, FactCount, FactCountDistinct, FactSum,
                     FactAverage, FactMax, FactMin]
    by_name = {fc.target_column: fc.type for fc in facts[0].columns}
    assert by_name["n"].source_column is None
    assert by_name["n_v"].source_column == "v"
    assert by_name["uniq"].source_column is None     # -> PK fallback
    assert by_name["cust"].table == "customers"
