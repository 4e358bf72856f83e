"""Input validation -> Env (reference ``src/Ringo/Validator.hs``).

All 9 error kinds (Types/Internal.hs:171-180):
MissingTable, DuplicateTable, MissingFact, DuplicateFact, MissingColumn,
DuplicateColumn, MissingTimeColumn, MissingNotNullConstraint,
MissingTypeDefault.
"""

from __future__ import annotations

from collections import Counter

from .model import (
    DimId, DimTime, DimVal, Env, Fact, FactCountDistinct, ForeignKey,
    NoDimId, Nullable, PrimaryKey, Settings, Table, TenantId, TypeDefaults,
    UniqueKey, ValidationError, ValidationFailed,
)


def _check_table_for_col(table: Table, col: str) -> list[ValidationError]:
    if table.find_column(col) is None:
        return [ValidationError("MissingColumn", table.name, col)]
    return []


def _validate_table(tables: list[Table], table: Table) -> list[ValidationError]:
    errors = []
    for c in table.constraints:
        if isinstance(c, PrimaryKey):
            errors += _check_table_for_col(table, c.column)
        elif isinstance(c, UniqueKey):
            for col in c.columns:
                errors += _check_table_for_col(table, col)
        elif isinstance(c, ForeignKey):
            other = next((t for t in tables if t.name == c.table), None)
            if other is None:
                errors.append(ValidationError("MissingTable", c.table))
            else:
                for mine, theirs in c.columns:
                    errors += _check_table_for_col(table, mine)
                    errors += _check_table_for_col(other, theirs)
    return errors


def _validate_fact(tables, facts, type_defaults: TypeDefaults, fact: Fact,
                   _ancestry: frozenset[str] = frozenset()
                   ) -> list[ValidationError]:
    table = next((t for t in tables if t.name == fact.table_name), None)
    if table is None:
        return [ValidationError("MissingTable", fact.table_name)]
    errors = _validate_table(tables, table)

    ancestry = _ancestry | {fact.name}
    for pname in fact.parent_names:
        if pname in ancestry:
            # a parent cycle in the YAML input would otherwise recurse
            # forever here (and later hang the extractor's parent
            # unfold) — surface it as a validation error instead of a
            # RecursionError crash (r18 review)
            errors.append(ValidationError("FactCycle", fact.name, pname))
            continue
        parent = next((f for f in facts if f.name == pname), None)
        if parent is None:
            errors.append(ValidationError("MissingFact", pname))
        else:
            errors += _validate_fact(tables, facts, type_defaults, parent,
                                     ancestry)

    for fc in fact.columns:
        src = fc.source_column_name()
        if src is not None:
            errors += _check_table_for_col(table, src)
        if isinstance(fc.type, DimId):
            if not any(t.name == fc.type.table for t in tables):
                errors.append(ValidationError("MissingTable", fc.type.table))
        if isinstance(fc.type, FactCountDistinct) and fc.type.source_column is None:
            # count-distinct defaults to the source table's primary key
            # (Populate/Fact.hs:75 uses `head` and crashes when absent —
            # we surface it as a 10th error kind instead)
            has_pk = any(isinstance(c, PrimaryKey) for c in table.constraints)
            if not has_pk:
                errors.append(ValidationError(
                    "MissingPrimaryKey", fact.table_name,
                    f"FactCountDistinct {fc.target_column} needs a source "
                    f"column or a primary key"))

    time_cols = [fc.target_column for fc in fact.columns if isinstance(fc.type, DimTime)]
    if not time_cols:
        errors.append(ValidationError("MissingTimeColumn", fact.table_name))
    for cname in time_cols:
        col = table.find_column(cname)
        if col is not None and col.nullable == Nullable.NULL:
            errors.append(ValidationError("MissingNotNullConstraint", fact.table_name, cname))

    defaults = list(type_defaults)
    for fc in fact.columns:
        if isinstance(fc.type, (DimVal, NoDimId, TenantId, DimId)):
            col = table.find_column(fc.target_column)
            if col is not None and not any(col.type.startswith(k) for k in defaults):
                errors.append(ValidationError("MissingTypeDefault", col.type))
    return errors


def validate_env(tables, facts, settings: Settings, type_defaults: TypeDefaults):
    """Return (env, []) on success or (None, errors)."""
    tables, facts = list(tables), list(facts)
    errors: list[ValidationError] = []
    for t in tables:
        errors += _validate_table(tables, t)
    for f in facts:
        errors += _validate_fact(tables, facts, type_defaults, f)
    for name, n in Counter(t.name for t in tables).items():
        if n > 1:
            errors.append(ValidationError("DuplicateTable", name))
    for name, n in Counter(f.name for f in facts).items():
        if n > 1:
            errors.append(ValidationError("DuplicateFact", name))
    for t in tables:
        for name, n in Counter(c.name for c in t.columns).items():
            if n > 1:
                errors.append(ValidationError("DuplicateColumn", t.name, name))
    # de-dup, preserving first occurrence (reference nubs its error list)
    uniq, seen = [], set()
    for e in errors:
        if e not in seen:
            seen.add(e)
            uniq.append(e)
    if uniq:
        return None, uniq
    return Env(tables, facts, settings, type_defaults), []


def make_env(tables, facts, settings: Settings | None = None,
             type_defaults: TypeDefaults | None = None) -> Env:
    """Validate and build an Env; raises ValidationFailed on any error."""
    env, errors = validate_env(tables, facts, settings or Settings(), type_defaults or {})
    if errors:
        raise ValidationFailed(errors)
    return env
