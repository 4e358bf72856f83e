"""Randomized executed-correctness: hypothesis generates small event
tables *including NULLs* (absent from the driver testdata), the real
executors populate dim + fact, and DuckDB runs the equivalent SQL over
the very same rows.  Catches NULL-coalescing, any-not-null, and -1
sentinel divergences no fixed fixture would."""

import datetime as dt

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from ringo_spark.model import (
    Column, DimTime, DimVal, Fact, FactColumn, FactCount, FactSum, NoDimId,
    Nullable, Settings, Table, TimeUnit,
)
from ringo_spark.populate.dimension import dimension_population_df
from ringo_spark.populate.fact import fact_population_df
from ringo_spark.validator import make_env

SRC = Table("ev", [
    Column("id", "bigint", Nullable.NOT_NULL),
    Column("at", "timestamp without time zone", Nullable.NOT_NULL),
    Column("site", "integer"),
    Column("kind", "text"),
    Column("val", "integer"),
])
FACT = Fact("ev", "ev", [
    FactColumn("at", DimTime()),
    FactColumn("site", NoDimId()),
    FactColumn("kind", DimVal("kind")),
    FactColumn("n", FactCount()),
    FactColumn("val_sum", FactSum("val")),
])
ENV = make_env([SRC], [FACT], Settings(time_unit=TimeUnit.MINUTE),
               {"integer": "-7", "text": "'__NA__'", "timestamp": "'1970-01-01'"})

BASE = dt.datetime(2024, 3, 1, 0, 0, 0)

rows_strategy = st.lists(
    st.tuples(
        st.integers(0, 10_000),                      # id
        st.integers(0, 300),                         # seconds offset
        st.one_of(st.none(), st.integers(0, 3)),     # site
        st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),  # kind
        st.one_of(st.none(), st.integers(-50, 50)),  # val
    ),
    min_size=1, max_size=40,
)

ORACLE_DIM = """
SELECT CAST(row_number() OVER (ORDER BY kind) AS INT) AS id, kind
FROM (SELECT DISTINCT coalesce(kind, '__NA__') AS kind
      FROM ev WHERE kind IS NOT NULL)
"""

ORACLE_FACT = """
WITH dim AS (
  SELECT CAST(row_number() OVER (ORDER BY kind) AS INT) AS id, kind
  FROM (SELECT DISTINCT coalesce(kind, '__NA__') AS kind
        FROM ev WHERE kind IS NOT NULL))
SELECT CAST(floor(epoch(e.at) / 60) AS BIGINT) AS at_minute_id,
       coalesce(e.site, -7) AS site,
       count(*) AS n,
       sum(e.val) AS val_sum,
       CAST(coalesce(d.id, -1) AS INT) AS kind_id
FROM ev e LEFT JOIN dim d ON d.kind = coalesce(e.kind, '__NA__')
GROUP BY 1, 2, 5
"""


@given(rows_strategy)
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_population_matches_duckdb_on_random_nullable_data(spark, rows):
    data = [(i, BASE + dt.timedelta(seconds=s), site, kind, val)
            for i, s, site, kind, val in rows]
    pdf = pd.DataFrame(data, columns=["id", "at", "site", "kind", "val"])
    pdf = pdf.astype({"site": "Int32", "val": "Int32"})
    sdf = spark.createDataFrame(
        data, "id long, at timestamp, site int, kind string, val int")
    cat = {"ev": sdf}

    con = duckdb.connect()
    con.register("ev", pdf)

    def canon(rows_):
        return sorted((tuple(r) for r in rows_),
                      key=lambda r: tuple((x is None, x) for x in r))

    dim = dimension_population_df(ENV, FACT, "dim_kind", cat)
    assert canon(dim.collect()) == canon(con.execute(ORACLE_DIM).fetchall())

    fact = fact_population_df(ENV, FACT, cat, dims={"dim_kind": dim})
    assert canon(fact.collect()) == canon(con.execute(ORACLE_FACT).fetchall())
