"""Fact population executor.

Executes the dataflow specified by ``factTablePopulateSQL``
(``/root/reference/src/Ringo/Generator/Populate/Fact.hs:127-230``; golden
SQL in ``src/Ringo.hs:477-618``):

1. scan the fact source table;
2. LEFT OUTER JOIN every distinct parent-fact source table on the declared
   ForeignKey column pairs (Populate/Fact.hs:197-202,226-230);
3. per fact column build the output expression (Populate/Fact.hs:155-192):
   time bucket, coalesced degenerate dims, dim surrogate-key lookups,
   aggregates;
4. filter the time window, group by all non-measure expressions, aggregate;

The reference looks dimension surrogate keys up with a correlated scalar
subquery per row (Populate/Fact.hs:185-192).  On Spark we rewrite that as a
**broadcast left equi-join** against the (small) dimension table on its
natural key — semantically identical (the unique key guarantees at most one
match; ``coalesce(id, -1)`` covers the miss case) and strictly better
distributed: no per-row subquery, no shuffle of the big side.

The reference's count-distinct is a two-pass INSERT + UPDATE HLL sketch in
SQL (Populate/Fact.hs:34-125).  We fold it into the same aggregation pass:
``approx_count_distinct(col, rsd)`` (HLL++, same relative-error contract,
default rsd = settings.fact_count_distinct_error_rate = 0.05), or
``hll_sketch_agg`` when mergeable persisted state is requested
(count_distinct_mode="sketch"), or exact ``count_distinct``.
"""

from __future__ import annotations

from pyspark.sql import Column as SparkColumn, DataFrame
from pyspark.sql import functions as F

from ..extractor import (
    extract_all_dimension_tables, fact_dim_fk_id_column_name,
    time_unit_column_name,
)
from ..model import (
    DimId, DimTime, DimVal, Env, Fact, FactAverage, FactCount,
    FactCountDistinct, FactMax, FactMin, FactSum, NoDimId, Nullable,
    PopulationMode, TenantId, ForeignKey,
)
from .common import (
    coalesce_column, dim_column_mapping, fk_spark_type as _fk_spark_type,
    qcol, table_pk_column, time_bucket_expr,
)


def _fk_join_condition(env: Env, fact_table, other_table_name: str):
    """Equi-join predicate from the declared ForeignKey constraint
    (Populate/Fact.hs:226-230)."""
    for c in fact_table.constraints:
        if isinstance(c, ForeignKey) and c.table == other_table_name:
            cond = None
            for mine, theirs in c.columns:
                piece = qcol(fact_table.name, mine) == qcol(other_table_name, theirs)
                cond = piece if cond is None else cond & piece
            return cond
    return None


def fact_population_df(
    env: Env,
    fact: Fact,
    catalog: dict[str, DataFrame],
    dims: dict[str, DataFrame] | None = None,
    mode: PopulationMode = PopulationMode.FULL,
    time_upper=None,
    time_lower=None,
    count_distinct_mode: str = "approx",  # approx | exact | sketch
) -> DataFrame:
    """Return the rolled-up rows to insert into the extracted fact table.

    ``catalog``: source table name -> DataFrame (must cover the fact's source
    table and every parent fact's source table).
    ``dims``: derived dimension table name -> populated DataFrame (with ids).
    """
    s = env.settings
    dims = dims or {}
    all_dims = extract_all_dimension_tables(env, fact)
    f_table = env.find_table(fact.table_name)
    f_name = fact.table_name
    df = catalog[f_name].alias(f_name)

    # --- parent-fact source joins (left outer on declared FKs) -------------
    parent_sources = []
    for dim_fact, _ in all_dims:
        t = dim_fact.table_name
        if t != f_name and t not in parent_sources:
            parent_sources.append(t)
    for pname in parent_sources:
        cond = _fk_join_condition(env, f_table, pname)
        if cond is None:
            raise ValueError(
                f"no ForeignKey from {f_name} to parent source {pname}")
        df = df.join(catalog[pname].alias(pname), cond, "left")

    # --- per-column expressions (Populate/Fact.hs:155-192) -----------------
    group_exprs: list[tuple[str, SparkColumn]] = []   # (output name, expr)
    agg_exprs: list[SparkColumn] = []
    dim_joins: list[tuple[DataFrame, SparkColumn, str, str]] = []

    def coalesce_fk(expr: SparkColumn) -> SparkColumn:
        return F.coalesce(expr, F.lit(s.foreign_key_id_coalesce_value))

    def count_distinct(col: SparkColumn, name: str) -> SparkColumn:
        if count_distinct_mode == "exact":
            return F.count_distinct(col).alias(name)
        if count_distinct_mode == "sketch":
            # mergeable persisted state, like the reference's JSON registers
            return F.hll_sketch_agg(col).alias(name)
        return F.approx_count_distinct(
            col, rsd=s.fact_count_distinct_error_rate).alias(name)

    for fc in fact.columns:
        cname, t = fc.target_column, fc.type
        if isinstance(t, DimTime):
            out = time_unit_column_name(s.dim_table_id_column_name, cname, s.time_unit)
            group_exprs.append((out, time_bucket_expr(qcol(f_name, cname),
                                                      s.time_unit.seconds)))
        elif isinstance(t, (NoDimId, TenantId)):
            col = f_table.find_column(cname)
            group_exprs.append((cname, coalesce_column(env, f_table, col, f_name)))
        elif isinstance(t, FactCount):
            src = qcol(f_name, t.source_column) if t.source_column else F.lit(1)
            agg_exprs.append(F.count(src).alias(cname))
        elif isinstance(t, FactCountDistinct):
            # no source column -> the source table's primary key
            # (Populate/Fact.hs:75); validated in validator._validate_fact
            src_name = t.source_column or table_pk_column(f_table)
            if src_name is None:
                raise ValueError(
                    f"FactCountDistinct {fact.name}.{cname} has no source "
                    f"column and table {f_name} has no primary key")
            agg_exprs.append(count_distinct(qcol(f_name, src_name), cname))
        elif isinstance(t, FactSum):
            agg_exprs.append(F.sum(qcol(f_name, t.source_column)).alias(cname))
        elif isinstance(t, FactMax):
            agg_exprs.append(F.max(qcol(f_name, t.source_column)).alias(cname))
        elif isinstance(t, FactMin):
            agg_exprs.append(F.min(qcol(f_name, t.source_column)).alias(cname))
        elif isinstance(t, FactAverage):
            agg_exprs.append(F.count(qcol(f_name, t.source_column))
                             .alias(cname + s.avg_count_column_suffix))
            agg_exprs.append(F.sum(qcol(f_name, t.source_column))
                             .alias(cname + s.avg_sum_column_suffix))
        # DimId/DimVal handled below via all_dims (order: after fact columns,
        # matching the reference's factColMap ++ dimColMap)

    # --- dimension FK columns (Populate/Fact.hs:172-192) -------------------
    for dim_fact, dim_table in all_dims:
        fk_name = fact_dim_fk_id_column_name(
            s.dim_prefix, s.dim_table_id_column_name, dim_fact, dim_table, env.tables)
        src_table_name = dim_fact.table_name      # parent's source for inherited dims
        src_table = env.find_table(src_table_name)
        if env.find_table(dim_table.name) is not None:
            # pre-existing dimension (DimId): FK passthrough, coalesced if nullable
            fk_col = src_table.find_column(fk_name)
            expr = qcol(src_table_name, fk_name)
            if fk_col.nullable == Nullable.NULL:
                expr = coalesce_fk(expr)
            group_exprs.append((fk_name, expr))
        else:
            # derived dimension: broadcast left join on the natural key,
            # comparing dim columns against coalesced source columns
            # (coalesce-then-compare semantics, Populate/Fact.hs:178-181)
            dim_df = dims[dim_table.name]
            alias = f"__dim_{dim_table.name}"
            cond = None
            for dim_col, src_col in dim_column_mapping(s.dim_prefix, dim_fact,
                                                       dim_table.name):
                piece = qcol(alias, dim_col) == coalesce_column(
                    env, src_table, src_table.find_column(src_col), src_table_name)
                cond = piece if cond is None else cond & piece
            dim_joins.append((dim_df, cond, alias, fk_name))
            group_exprs.append(
                (fk_name,
                 coalesce_fk(qcol(alias, s.dim_table_id_column_name))
                 .cast(_fk_spark_type(s))))

    for dim_df, cond, alias, _ in dim_joins:
        df = df.join(F.broadcast(dim_df.alias(alias)), cond, "left")

    # --- time window filter (scan-pushable, see common.time_filter) --------
    from .common import time_column_name, time_filter

    tcol = time_column_name(fact)
    if time_upper is not None:
        df = df.where(time_filter(df, tcol, "<", time_upper, f_name))
    if mode == PopulationMode.INCREMENTAL and time_lower is not None:
        df = df.where(time_filter(df, tcol, ">=", time_lower, f_name))

    # --- project narrow, then hash-aggregate (map-side partials are free) --
    key_names = [name for name, _ in group_exprs]
    if not agg_exprs:
        return df.select(*[e.alias(n) for n, e in group_exprs]).distinct()
    grouped = df.groupBy(*[e.alias(n) for n, e in group_exprs])
    out = grouped.agg(*agg_exprs)
    # column order parity with the extracted schema: measures in fact-column
    # order interleaved as declared, then FK columns — reorder to match
    ordered = _output_column_order(env, fact)
    return out.select(*ordered)


def _output_column_order(env: Env, fact: Fact) -> list[str]:
    from ..extractor import extract_fact_table

    derived = extract_fact_table(env, fact)
    # count-distinct columns exist in the derived schema as 'json'; our
    # executor emits them under the same name (estimate or sketch), so the
    # name list is identical.
    return [c.name for c in derived.columns]
