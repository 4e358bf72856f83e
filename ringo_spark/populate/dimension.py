"""Dimension population executor.

Executes (rather than prints, as the reference does) the dataflow specified
by ``dimensionTablePopulateSQL``
(``/root/reference/src/Ringo/Generator/Populate/Dimension.hs:27-62``;
golden SQL in ``src/Ringo.hs:349-470``):

full mode::

    SELECT DISTINCT coalesce(c1, def1) AS d1, ...
    FROM   <fact source table>
    WHERE  (c1 IS NOT NULL OR c2 IS NOT NULL OR ...)   -- raw columns
      AND  time_col <  :upper
    [ AND  time_col >= :lower ]                        -- incremental only

incremental mode additionally anti-joins the existing dimension rows
(the reference's LEFT JOIN ... WHERE ... IS NULL manual anti-join,
Populate/Dimension.hs:49-60 — expressed natively as ``left_anti``).

Surrogate keys: Postgres assigns ``serial`` ids implicitly; Spark has no
sequences, so we assign ``row_number() OVER (ORDER BY <natural key>)``
(+ max existing id in incremental mode).  Ids are deterministic for a given
input.  Scale note: the window is single-partition, but it runs *after*
``distinct()`` has reduced the data to dimension cardinality (dimensions
are small by construction — that is the point of a star schema), so the
single task touches only the deduped rows.  The distinct itself is a
map-side-combining shuffle at full parallelism.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..model import Env, Fact, PopulationMode
from .common import (
    coalesce_column, dim_column_mapping, fk_spark_type, time_column_name,
    time_filter,
)


def dimension_population_df(
    env: Env,
    fact: Fact,
    dim_table_name: str,
    catalog: dict[str, DataFrame],
    mode: PopulationMode = PopulationMode.FULL,
    time_upper=None,
    time_lower=None,
    existing_dim: DataFrame | None = None,
    assign_ids: bool = True,
) -> DataFrame:
    """Return the rows to insert into ``dim_table_name``.

    ``catalog`` maps source table name -> DataFrame.  ``existing_dim`` is the
    current dimension contents (required for incremental mode: anti-join +
    id offset).  With ``assign_ids`` the result gains the surrogate
    ``id`` column as its first column.
    """
    s = env.settings
    src_table = env.find_table(fact.table_name)
    src = catalog[fact.table_name]
    mapping = dim_column_mapping(s.dim_prefix, fact, dim_table_name)
    if not mapping:
        raise ValueError(f"fact {fact.name} has no DimVal columns for {dim_table_name}")

    # any-not-null filter over the *raw* source columns (Populate/Dimension.hs:38)
    not_null = reduce(lambda a, b: a | b,
                      [F.col(srcc).isNotNull() for _, srcc in mapping])
    cond = not_null
    tcol = time_column_name(fact)
    if time_upper is not None:
        cond = cond & time_filter(src, tcol, "<", time_upper)
    if mode == PopulationMode.INCREMENTAL and time_lower is not None:
        cond = cond & time_filter(src, tcol, ">=", time_lower)

    rows = (
        src.where(cond)
        .select(*[
            coalesce_column(env, src_table, src_table.find_column(srcc)).alias(dimc)
            for dimc, srcc in mapping
        ])
        .distinct()
    )

    dim_cols = [dimc for dimc, _ in mapping]
    id_col = s.dim_table_id_column_name

    if mode == PopulationMode.INCREMENTAL:
        if existing_dim is None:
            raise ValueError("incremental dimension population requires existing_dim")
        # new-rows-only anti-join (Populate/Dimension.hs:49-60).  Dim columns
        # are coalesced NOT NULL, so plain equality is faithful to the
        # reference's `=` predicates.
        rows = rows.join(F.broadcast(existing_dim.select(*dim_cols)),
                         on=dim_cols, how="left_anti")

    if not assign_ids:
        return rows

    id_type = fk_spark_type(s)  # serial -> int, bigserial -> bigint
    w = Window.orderBy(*[F.col(c) for c in dim_cols])
    with_id = rows.withColumn(id_col, F.row_number().over(w))
    if mode == PopulationMode.INCREMENTAL:
        offset = F.broadcast(
            existing_dim.agg(F.coalesce(F.max(id_col), F.lit(0)).alias("__id_offset")))
        with_id = (with_id.crossJoin(offset)
                   .withColumn(id_col, (F.col(id_col) + F.col("__id_offset"))
                               .cast(id_type))
                   .drop("__id_offset"))
    else:
        with_id = with_id.withColumn(id_col, F.col(id_col).cast(id_type))
    return with_id.select(id_col, *dim_cols)
