"""SQL-text generation parity: the emitted Spark SQL must be *executable*
(via spark.sql over temp views) and agree with the DataFrame executors."""

import datetime as dt

import pytest

from ringo_spark.generator.sqlgen import (
    dimension_table_defn_sql, dimension_table_populate_sql,
    fact_table_defn_sql, fact_table_populate_sql,
)
from ringo_spark.model import PopulationMode, Settings, TimeUnit
from ringo_spark.populate.dimension import dimension_population_df
from ringo_spark.populate.fact import fact_population_df
from ringo_spark.validator import make_env

from .test_populate_exec import DEFAULTS, FACT, SRC, mk_catalog

ENV = make_env([SRC], [FACT],
               Settings(time_unit=TimeUnit.HOUR, table_name_suffix_template=""),
               DEFAULTS)
T_HI = dt.datetime(2030, 1, 1)


def _select_of(insert_sql: str) -> str:
    # strip the INSERT INTO header and trailing ';'
    body = insert_sql.split("\n", 1)[1].rstrip().rstrip(";")
    return body


def test_ddl_contains_schema_and_constraints():
    from ringo_spark.extractor import extract_dimension_tables

    dim = extract_dimension_tables(ENV, FACT)[0]
    ddl = dimension_table_defn_sql(ENV, dim)
    assert "CREATE TABLE dim_browser" in ddl
    assert "name STRING NOT NULL" in ddl
    assert "UNIQUE (name, version)" in ddl
    fddl = fact_table_defn_sql(ENV, FACT)
    assert "CREATE TABLE fact_clicks_by_hour" in fddl
    assert "at_hour_id BIGINT NOT NULL" in fddl
    assert "PARTITIONED BY" in fddl


def test_dim_populate_sql_executes_and_matches_executor(spark):
    cat = mk_catalog(spark)
    cat["clicks"].createOrReplaceTempView("clicks")
    sql = dimension_table_populate_sql(ENV, FACT, "dim_browser")
    rows = spark.sql(_select_of(sql), args={"time_upper": T_HI}).collect()
    exec_rows = dimension_population_df(ENV, FACT, "dim_browser", cat,
                                        time_upper=T_HI).drop("id").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, exec_rows))


def test_fact_populate_sql_executes_and_matches_executor(spark):
    cat = mk_catalog(spark)
    cat["clicks"].createOrReplaceTempView("clicks")
    dim = dimension_population_df(ENV, FACT, "dim_browser", cat, time_upper=T_HI)
    dim.createOrReplaceTempView("dim_browser")
    sql = fact_table_populate_sql(ENV, FACT)
    got = spark.sql(_select_of(sql), args={"time_upper": T_HI}).collect()
    want = fact_population_df(ENV, FACT, cat, dims={"dim_browser": dim},
                              time_upper=T_HI).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_incremental_sql_has_anti_join_and_lower_bound():
    sql = dimension_table_populate_sql(ENV, FACT, "dim_browser",
                                       PopulationMode.INCREMENTAL)
    assert "LEFT ANTI JOIN dim_browser" in sql and ":time_lower" in sql
    fsql = fact_table_populate_sql(ENV, FACT, PopulationMode.INCREMENTAL)
    assert ":time_lower" in fsql


def test_fact_defn_partition_divisor_follows_grain():
    """Daily partitioning divides the time-bucket id by buckets-per-day:
    1440 at minute grain, 24 at hour, 86400 at second, and 1 at week
    (where a bucket is already coarser than a day)."""
    from ringo_spark.model import Settings, TimeUnit
    from ringo_spark.validator import make_env

    from .fixtures import facts, tables, type_defaults

    for unit, div in [(TimeUnit.SECOND, 86400), (TimeUnit.MINUTE, 1440),
                      (TimeUnit.HOUR, 24), (TimeUnit.DAY, 1),
                      (TimeUnit.WEEK, 1)]:
        env_u = make_env(tables, facts,
                         Settings(time_unit=unit,
                                  table_name_suffix_template=""),
                         type_defaults)
        sql = fact_table_defn_sql(env_u, env_u.facts[0])
        col = f"created_at_{unit.unit_name}_id"
        assert f"FLOOR({col} / {div})" in sql, (unit, sql)


def test_postgres_dialect_artifacts_execute_in_duckdb(spark):
    """dialect='postgres' emits the reference's native target dialect
    (app/Main.hs runs its SQL inside Postgres): original pg types, real
    constraints, CREATE INDEX statements, ? placeholders, and the
    reference's literal LEFT OUTER JOIN + IS NULL anti-join
    (Populate/Dimension.hs:50-60).  Proof: the emitted DDL+DML EXECUTES in
    DuckDB (pg-compatible parser) and produces the same rows as the Spark
    executors."""
    import duckdb

    from ringo_spark.extractor import extract_dimension_tables

    # serial needs a sequence default; use integer ids for the executable
    # smoke (the dialect shape, not the id generator, is under test)
    env = make_env([SRC], [FACT],
                   Settings(time_unit=TimeUnit.HOUR,
                            table_name_suffix_template="",
                            dim_table_id_column_type="integer"),
                   DEFAULTS)
    dim = extract_dimension_tables(env, FACT)[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE clicks (id BIGINT NOT NULL, at TIMESTAMP, "
                "site INTEGER, browser_name VARCHAR(20), "
                "browser_version VARCHAR(20), clicks INTEGER)")
    cat = mk_catalog(spark)
    con.executemany("INSERT INTO clicks VALUES (?, ?, ?, ?, ?, ?)",
                    [tuple(r) for r in cat["clicks"].collect()])

    ddl = dimension_table_defn_sql(env, dim, dialect="postgres")
    assert "character varying(20) NOT NULL" in ddl and "USING PARQUET" not in ddl
    assert "UNIQUE (name, version)" in ddl
    con.execute(ddl)

    dim_full = dimension_table_populate_sql(env, FACT, "dim_browser",
                                            PopulationMode.FULL,
                                            dialect="postgres")
    assert "?" in dim_full and ":time_upper" not in dim_full
    got = set(con.execute(_select_of(dim_full), [T_HI]).fetchall())
    dim_exec = dimension_population_df(env, FACT, "dim_browser", cat,
                                       time_upper=T_HI)
    want = {(r.name, r.version) for r in dim_exec.collect()}
    assert got == want

    dim_incr = dimension_table_populate_sql(env, FACT, "dim_browser",
                                            PopulationMode.INCREMENTAL,
                                            dialect="postgres")
    assert "LEFT OUTER JOIN" in dim_incr and "IS NULL" in dim_incr
    assert "LEFT ANTI JOIN" not in dim_incr and "NOT EXISTS" not in dim_incr

    fddl = fact_table_defn_sql(env, FACT, dialect="postgres")
    assert "CREATE INDEX" in fddl and "PARTITIONED BY" not in fddl
    con.execute(fddl)
    con.executemany("INSERT INTO dim_browser VALUES (?, ?, ?)",
                    [tuple(r) for r in dim_exec.collect()])

    fact_full = fact_table_populate_sql(env, FACT, PopulationMode.FULL,
                                        dialect="postgres")
    assert "extract(epoch FROM" in fact_full and "BROADCAST" not in fact_full
    con.execute(fact_full, [T_HI])
    fact_exec = fact_population_df(env, FACT, cat,
                                   dims={"dim_browser": dim_exec},
                                   time_upper=T_HI)
    cols = ", ".join(fact_exec.columns)
    got = set(con.execute(
        f"SELECT {cols} FROM fact_clicks_by_hour").fetchall())
    want = {tuple(r) for r in fact_exec.collect()}
    assert got == want
