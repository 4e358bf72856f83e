"""ringo_spark — a PySpark-native star-schema ETL engine.

Re-expresses the capabilities of quintype/ringo (an OLTP→OLAP star-schema
transformer that emits Postgres SQL) as a directly-executing Spark engine:
the same declarative inputs (tables + fact specs + settings), the same
derived schemas, but the population dataflows run as Catalyst-optimized
DataFrame plans instead of generated SQL text.

Public API mirrors the reference's 8 exported functions
(``/root/reference/src/Ringo.hs:2-16``) in snake_case, plus executors:

- make_env
- extract_fact_table, extract_dimension_tables, extract_all_dimension_tables,
  extract_dependencies
- dimension_table_defn_sql, fact_table_defn_sql,
  dimension_table_populate_sql, fact_table_populate_sql   (SQL-text parity)
- dimension_population_df, fact_population_df             (executors)
"""

from .model import (  # noqa: F401
    Column, DimId, DimTime, DimVal, Env, Fact, FactAverage, FactColumn,
    FactCount, FactCountDistinct, FactMax, FactMin, FactSum, ForeignKey,
    NoDimId, Nullable, PopulationMode, PrimaryKey, Settings, Table,
    TableConstraint, TenantId, TimeUnit, UniqueKey, ValidationError,
    ValidationFailed,
)
from .validator import make_env, validate_env  # noqa: F401
from .extractor import (  # noqa: F401
    extract_all_dimension_tables, extract_dependencies,
    extract_dimension_tables, extract_fact_table, topo_order,
)
from .input_parser import parse_input, parse_input_dict  # noqa: F401

__version__ = "0.1.0"


def __getattr__(name):
    # Spark-dependent modules are imported lazily so the pure schema layer
    # stays importable without a JVM.
    if name in ("dimension_population_df",):
        from .populate.dimension import dimension_population_df

        return dimension_population_df
    if name in ("fact_population_df",):
        from .populate.fact import fact_population_df

        return fact_population_df
    if name in ("dimension_table_defn_sql", "fact_table_defn_sql",
                "dimension_table_populate_sql", "fact_table_populate_sql"):
        from .generator import sqlgen

        return getattr(sqlgen, name)
    raise AttributeError(name)
