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
