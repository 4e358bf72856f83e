"""Schema derivation: OLTP tables + fact specs -> OLAP star schema.

Pure functions mirroring the reference extractor:

- ``dim_column_name``            -> Extractor/Internal.hs:34-36
- ``time_unit_column_name``      -> Extractor/Internal.hs:38-40
- ``fact_dim_fk_id_column_name`` -> Extractor/Internal.hs:42-48
- ``extracted_fact_table_name``  -> Extractor/Internal.hs:50-52
- ``id_col_type_to_fk_id_col_type`` -> Extractor/Internal.hs:54-59
- ``extract_dimension_tables``   -> Extractor/Internal.hs:61-94
- ``extract_all_dimension_tables``-> Extractor/Internal.hs:96-103
- ``extract_fact_table``         -> Extractor.hs:23-73
- ``extract_dependencies``       -> Extractor.hs:75-100

Golden-tested in ``tests/test_extractor_golden.py`` against the reference
doctest outputs (``src/Ringo.hs:147-221``).
"""

from __future__ import annotations

from .model import (
    Column, DimId, DimTime, DimVal, Env, Fact, FactAverage, FactColumn,
    FactCount, FactCountDistinct, FactMax, FactMin, FactSum, NoDimId,
    Nullable, PrimaryKey, Settings, Table, TenantId, TimeUnit, UniqueKey,
    ForeignKey,
)


def dim_column_name(dim_name: str, column_name: str) -> str:
    """Strip the leading ``<dim>_`` prefix: geo_country_name -> country_name."""
    prefix = dim_name + "_"
    if column_name.startswith(prefix):
        return column_name[len(prefix):]
    return column_name


def time_unit_column_name(dim_id_col_name: str, col_name: str, time_unit: TimeUnit) -> str:
    return f"{col_name}_{time_unit.unit_name}_{dim_id_col_name}"


def extracted_fact_table_name(fact_prefix: str, fact_infix: str, fact_name: str,
                              time_unit: TimeUnit) -> str:
    return f"{fact_prefix}{fact_name}{fact_infix}{time_unit.unit_name}"


def id_col_type_to_fk_id_col_type(typ: str) -> str:
    return {"serial": "integer", "smallserial": "smallint", "bigserial": "bigint"}.get(
        typ.lower(), typ)


def fact_dim_fk_id_column_name(dim_prefix: str, dim_id_col_name: str, dim_fact: Fact,
                               dim_table: Table, tables) -> str:
    """FK column name in the rolled-up fact table for a dimension.

    Pre-existing (DimId) dims reuse the declaring fact column's name;
    derived dims strip the dim prefix and append ``_id``.
    """
    if any(t.name == dim_table.name for t in tables):
        for fc in dim_fact.columns:
            if isinstance(fc.type, DimId) and fc.type.table == dim_table.name:
                return fc.target_column
    base = dim_table.name
    if base.startswith(dim_prefix):
        base = base[len(dim_prefix):]
    return f"{base}_{dim_id_col_name}"


def extract_dimension_tables(env: Env, fact: Fact) -> list[Table]:
    """Derive this fact's dimension tables (non-recursive).

    DimId columns contribute the referenced *existing* tables; DimVal columns
    are grouped by target dim name (groups ordered alphabetically, columns in
    fact-column order, deduped), each becoming ``<dim_prefix><dim>`` with a
    surrogate ``id`` column, PK(id) and a unique key over the value columns.
    """
    s = env.settings
    table = env.find_table(fact.table_name)
    assert table is not None

    dims_from_ids: list[Table] = []
    for fc in fact.columns:
        if isinstance(fc.type, DimId):
            t = env.find_table(fc.type.table)
            if t is not None:
                dims_from_ids.append(t)

    groups: dict[str, list[Column]] = {}
    for fc in fact.columns:
        if isinstance(fc.type, DimVal):
            col = table.find_column(fc.target_column)
            if col is None:
                continue
            groups.setdefault(fc.type.table, []).append(col)

    dims_from_vals = []
    for dim in sorted(groups):
        seen, cols = set(), []
        for col in groups[dim]:
            if col in seen:
                continue
            seen.add(col)
            cols.append(Column(dim_column_name(dim, col.name), col.type, Nullable.NOT_NULL))
        dims_from_vals.append(Table(
            name=s.dim_prefix + dim,
            columns=[Column(s.dim_table_id_column_name, s.dim_table_id_column_type,
                            Nullable.NOT_NULL)] + cols,
            constraints=[PrimaryKey(s.dim_table_id_column_name),
                         UniqueKey([c.name for c in cols])],
        ))
    return dims_from_ids + dims_from_vals


def extract_all_dimension_tables(env: Env, fact: Fact) -> list[tuple[Fact, Table]]:
    """This fact's dims + (recursively) its parent facts' dims, deduped by table."""
    result: list[tuple[Fact, Table]] = [(fact, t) for t in extract_dimension_tables(env, fact)]
    for pname in fact.parent_names:
        parent = env.find_fact(pname)
        assert parent is not None
        result.extend(extract_all_dimension_tables(env, parent))
    out, seen = [], set()
    for f, t in result:
        if t.name in seen:
            continue
        seen.add(t.name)
        out.append((f, t))
    return out


def extract_fact_table(env: Env, fact: Fact) -> Table:
    """Derive the rolled-up fact table schema (reference Extractor.hs:23-73)."""
    s = env.settings
    all_dims = extract_all_dimension_tables(env, fact)
    table = env.find_table(fact.table_name)
    assert table is not None

    def src(cname: str) -> Column:
        col = table.find_column(cname)
        assert col is not None, cname
        return col

    columns: list[Column] = []
    for fc in fact.columns:
        cname, t = fc.target_column, fc.type
        if isinstance(t, DimTime):
            columns.append(Column(
                time_unit_column_name(s.dim_table_id_column_name, cname, s.time_unit),
                "bigint", Nullable.NOT_NULL))
        elif isinstance(t, (NoDimId, TenantId)):
            columns.append(src(cname).not_null())
        elif isinstance(t, FactCount):
            columns.append(Column(cname, s.fact_count_column_type, Nullable.NOT_NULL))
        elif isinstance(t, FactCountDistinct):
            columns.append(Column(cname, "json", Nullable.NOT_NULL))
        elif isinstance(t, (FactSum, FactMax, FactMin)):
            columns.append(src(t.source_column).not_null().with_name(cname))
        elif isinstance(t, FactAverage):
            columns.append(Column(cname + s.avg_count_column_suffix,
                                  s.fact_count_column_type, Nullable.NOT_NULL))
            columns.append(src(t.source_column).not_null()
                           .with_name(cname + s.avg_sum_column_suffix))
        # DimId / DimVal contribute via fk_columns below

    fk_columns = [
        Column(fact_dim_fk_id_column_name(s.dim_prefix, s.dim_table_id_column_name,
                                          dim_fact, dim_table, env.tables),
               id_col_type_to_fk_id_col_type(s.dim_table_id_column_type),
               Nullable.NOT_NULL)
        for dim_fact, dim_table in all_dims
    ]

    uk_cols = []
    for fc in fact.columns:
        if isinstance(fc.type, DimTime):
            uk_cols.append(time_unit_column_name(s.dim_table_id_column_name,
                                                 fc.target_column, s.time_unit))
        elif isinstance(fc.type, (NoDimId, TenantId)):
            uk_cols.append(fc.target_column)
    uk_cols += [c.name for c in fk_columns]

    return Table(
        name=extracted_fact_table_name(s.fact_prefix, s.fact_infix, fact.name, s.time_unit),
        columns=columns + list(fk_columns),
        constraints=[UniqueKey(uk_cols)],
    )


def extract_dependencies(env: Env, fact: Fact) -> dict[str, list[str]]:
    """Build DAG: derived table -> source tables (reference Extractor.hs:75-100)."""
    s = env.settings

    def parent_facts(f: Fact) -> list[Fact]:
        return [env.find_fact(p) for p in f.parent_names]

    # flatten of the unfold tree: node first, then children depth-first
    def tree_flatten(f: Fact, label):
        out = [label(f)]
        for p in parent_facts(f):
            out.extend(tree_flatten(p, label))
        return out

    def nub(xs):
        seen, out = set(), []
        for x in xs:
            if isinstance(x, list):
                for y in x:
                    if y not in seen:
                        seen.add(y)
                        out.append(y)
            elif x not in seen:
                seen.add(x)
                out.append(x)
        return out

    fact_source_deps = nub(tree_flatten(fact, lambda f: f.table_name))

    def dim_labels(f: Fact) -> list[str]:
        out = []
        for fc in f.columns:
            if isinstance(fc.type, DimVal):
                out.append(s.dim_prefix + fc.type.table)
            elif isinstance(fc.type, DimId):
                out.append(fc.type.table)
        return out

    fact_dim_deps = nub(tree_flatten(fact, dim_labels))

    deps: dict[str, list[str]] = {}
    for fc in fact.columns:
        if isinstance(fc.type, DimVal):
            deps[s.dim_prefix + fc.type.table] = [fact.table_name]
    fact_table = extracted_fact_table_name(s.fact_prefix, s.fact_infix, fact.name, s.time_unit)
    deps[fact_table] = fact_source_deps + fact_dim_deps
    return deps


def topo_order(deps: dict[str, list[str]]) -> list[str]:
    """Topologically order derived tables for execution: a table runs after
    every dependency that is itself a derived table in ``deps``."""
    order, state = [], {}

    def visit(n):
        if state.get(n) == 2:
            return
        if state.get(n) == 1:
            raise ValueError(f"dependency cycle at {n}")
        state[n] = 1
        for d in deps.get(n, []):
            if d in deps:
                visit(d)
        state[n] = 2
        order.append(n)

    for n in deps:
        visit(n)
    return order
