"""Validator tests: all 9 error kinds (reference src/Ringo/Validator.hs)."""

import pytest

from ringo_spark.model import (
    Column, DimId, DimTime, Fact, FactColumn, FactCount, ForeignKey, NoDimId,
    Nullable, PrimaryKey, Settings, Table, UniqueKey,
)
from ringo_spark.validator import make_env, validate_env

NN = Nullable.NOT_NULL
DEFAULTS = {"integer": "-1", "timestamp": "'1970-01-01'"}


def tbl(name="t", cols=None, cons=()):
    cols = cols or [Column("id", "integer", NN),
                    Column("at", "timestamp", NN),
                    Column("k", "integer", NN)]
    return Table(name, cols, cons)


def fact(name="f", table="t", cols=None, parents=()):
    cols = cols or [FactColumn("at", DimTime()), FactColumn("n", FactCount())]
    return Fact(name, table, cols, parent_names=parents)


def errs(tables, facts, defaults=DEFAULTS):
    _, errors = validate_env(tables, facts, Settings(), defaults)
    return {e.kind for e in errors}


def test_valid_env():
    env = make_env([tbl()], [fact()], Settings(), DEFAULTS)
    assert env.find_table("t") is not None


def test_missing_table():
    assert "MissingTable" in errs([], [fact()])


def test_missing_fact_parent():
    assert "MissingFact" in errs([tbl()], [fact(parents=["nope"])])


def test_missing_column_in_constraint():
    assert "MissingColumn" in errs([tbl(cons=[PrimaryKey("nope")])], [fact()])


def test_missing_column_in_unique_and_fk():
    t1 = tbl(cons=[UniqueKey(["ghost"])])
    assert "MissingColumn" in errs([t1], [fact()])
    t2 = tbl("a", cons=[ForeignKey("b", [("k", "ghost")])])
    assert "MissingColumn" in errs([t2, tbl("b")], [fact(table="a")])


def test_fk_missing_table():
    t = tbl(cons=[ForeignKey("ghost", [("k", "x")])])
    assert "MissingTable" in errs([t], [fact()])


def test_duplicate_table_fact_column():
    assert "DuplicateTable" in errs([tbl(), tbl()], [fact()])
    assert "DuplicateFact" in errs([tbl()], [fact(), fact()])
    dup = Table("t", [Column("id", "integer", NN), Column("id", "integer", NN),
                      Column("at", "timestamp", NN)])
    assert "DuplicateColumn" in errs([dup], [fact()])


def test_missing_time_column():
    f = Fact("f", "t", [FactColumn("n", FactCount())])
    assert "MissingTimeColumn" in errs([tbl()], [f])


def test_missing_not_null_constraint():
    t = Table("t", [Column("id", "integer", NN), Column("at", "timestamp")])
    assert "MissingNotNullConstraint" in errs([t], [fact()])


def test_missing_type_default():
    f = Fact("f", "t", [FactColumn("at", DimTime()), FactColumn("k", NoDimId())])
    assert "MissingTypeDefault" in errs([tbl()], [f], {"timestamp": "'x'"})


def test_dimid_missing_target_table():
    f = Fact("f", "t", [FactColumn("at", DimTime()), FactColumn("k", DimId("ghost"))])
    assert "MissingTable" in errs([tbl()], [f])


def test_count_distinct_without_source_needs_pk():
    """FactCountDistinct with no source column counts the table PK
    (Populate/Fact.hs:75) — a 10th error kind where the reference crashes."""
    from ringo_spark.model import FactCountDistinct

    f = Fact("f", "t", [FactColumn("at", DimTime()),
                        FactColumn("uniq", FactCountDistinct())])
    assert "MissingPrimaryKey" in errs([tbl()], [f])          # no PK declared
    assert "MissingPrimaryKey" not in errs(
        [tbl(cons=[PrimaryKey("id")])], [f])                  # PK satisfies it
    g = Fact("f", "t", [FactColumn("at", DimTime()),
                        FactColumn("uniq", FactCountDistinct("k"))])
    assert "MissingPrimaryKey" not in errs([tbl()], [g])      # explicit source


def test_parent_fact_cycle_is_a_validation_error():
    """r18 review: a parent cycle in the fact specs (A -> B -> A) used to
    recurse forever in _validate_fact (RecursionError crash on malformed
    YAML input) — and would later hang the extractor's parent unfold.
    It must surface as a FactCycle validation error instead."""
    from ringo_spark.model import (
        Column, DimTime, Fact, FactColumn, FactCount, Nullable, PrimaryKey,
        Settings, Table,
    )
    from ringo_spark.validator import validate_env

    t = Table("ev", [
        Column("id", "bigint", Nullable.NOT_NULL),
        Column("ts", "timestamp without time zone", Nullable.NOT_NULL),
    ], [PrimaryKey("id")])
    cols = [FactColumn("ts", DimTime()), FactColumn("n", FactCount())]
    fa = Fact("a", "ev", cols, parent_names=["b"])
    fb = Fact("b", "ev", cols, parent_names=["a"])
    env, errors = validate_env([t], [fa, fb], Settings(),
                               {"timestamp": "'1970-01-01'"})
    assert env is None
    assert any(e.kind == "FactCycle" for e in errors)
    # a SELF-parent is the degenerate cycle
    fs = Fact("s", "ev", cols, parent_names=["s"])
    env, errors = validate_env([t], [fs], Settings(),
                               {"timestamp": "'1970-01-01'"})
    assert env is None
    assert any(e.kind == "FactCycle" for e in errors)
