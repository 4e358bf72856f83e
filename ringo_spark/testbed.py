"""Driver-testdata wiring: table specs, fact specs, query builders + oracles.

Maps the engine onto ``/root/testdata/sf*/`` (schemas in ``FIXTURES.md §B``):
three fact specs exercising every FactColumnType constructor, their derived
dimensions, and full + incremental population — each as a ``(spark, sf_dir)
-> DataFrame`` builder with a DuckDB-equivalent ANSI SQL oracle.

Numeric determinism: measure columns generated as 2-decimal doubles are
declared ``numeric(18,2)`` so sums aggregate in exact decimal arithmetic
(order-independent ⇒ identical across Spark and DuckDB partitionings); the
query output presents them as ``double`` in both engines.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_catalog
from .model import (
    Column, DimId, DimTime, DimVal, Fact, FactAverage, FactColumn, FactCount,
    FactCountDistinct, FactMax, FactMin, FactSum, ForeignKey, NoDimId,
    Nullable, PopulationMode, PrimaryKey, Settings, Table, TimeUnit,
)
from .populate.dimension import dimension_population_df
from .populate.fact import fact_population_df
from .validator import make_env

NN = Nullable.NOT_NULL

# --- testdata table declarations (FIXTURES.md §B) ---------------------------

EVENTS = Table("events", [
    Column("event_id", "bigint", NN),
    Column("ts", "timestamp without time zone", NN),
    Column("user_id", "bigint"),
    Column("event_type", "character varying(40)"),
    Column("value", "numeric(18,2)"),
    Column("props", "text"),
], [PrimaryKey("event_id")])

ORDERS = Table("orders", [
    Column("o_orderkey", "bigint", NN),
    Column("o_custkey", "bigint"),
    Column("o_orderstatus", "character varying(4)"),
    Column("o_totalprice", "numeric(18,2)"),
    Column("o_orderdate", "timestamp without time zone", NN),
    Column("o_orderpriority", "character varying(20)"),
], [PrimaryKey("o_orderkey")])

LINEITEM = Table("lineitem", [
    Column("l_orderkey", "bigint", NN),
    Column("l_partkey", "bigint"),
    Column("l_suppkey", "bigint"),
    Column("l_linenumber", "integer"),
    Column("l_quantity", "numeric(18,2)"),
    Column("l_extendedprice", "numeric(18,2)"),
    Column("l_discount", "numeric(18,4)"),
    Column("l_tax", "numeric(18,4)"),
    Column("l_returnflag", "character varying(4)"),
    Column("l_linestatus", "character varying(4)"),
    Column("l_shipdate", "timestamp without time zone", NN),
], [ForeignKey("orders", [("l_orderkey", "o_orderkey")])])

CUSTOMER = Table("customer", [
    Column("c_custkey", "bigint", NN),
    Column("c_name", "text"),
    Column("c_nationkey", "integer"),
    Column("c_acctbal", "numeric(18,2)"),
    Column("c_mktsegment", "text"),
], [PrimaryKey("c_custkey")])

TYPE_DEFAULTS = {
    "integer": "-1",
    "bigint": "-1",
    "numeric": "-1",
    "double": "-1",
    "character": "'__UNKNOWN_VAL__'",
    "text": "'__UNKNOWN_VAL__'",
    "timestamp": "'1970-01-01 00:00:00'",
}

# --- fact specs (FIXTURES.md §B fact specs 1-3) -----------------------------

EVENTS_FACT = Fact("events", "events", [
    FactColumn("ts", DimTime()),
    FactColumn("user_id", NoDimId()),
    FactColumn("event_type", DimVal("event_type")),
    FactColumn("event_count", FactCount()),
    FactColumn("value_sum", FactSum("value")),
    FactColumn("value_avg", FactAverage("value")),
    FactColumn("value_max", FactMax("value")),
    FactColumn("value_min", FactMin("value")),
    FactColumn("user_count", FactCountDistinct("user_id")),
])

ORDERS_FACT = Fact("orders", "orders", [
    FactColumn("o_orderdate", DimTime()),
    FactColumn("o_custkey", DimId("customer")),
    FactColumn("o_orderstatus", DimVal("order_status")),
    FactColumn("o_orderpriority", DimVal("order_priority")),
    FactColumn("order_count", FactCount()),
    FactColumn("price_sum", FactSum("o_totalprice")),
])

LINEITEM_FACT = Fact("lineitem", "lineitem", [
    FactColumn("l_shipdate", DimTime()),
    FactColumn("l_returnflag", DimVal("line_status")),
    FactColumn("l_linestatus", DimVal("line_status")),
    FactColumn("qty_sum", FactSum("l_quantity")),
    FactColumn("part_count", FactCountDistinct("l_partkey")),
], parent_names=["orders"])

EVENTS_ENV = make_env([EVENTS], [EVENTS_FACT],
                      Settings(time_unit=TimeUnit.MINUTE), TYPE_DEFAULTS)
ORDERS_ENV = make_env([ORDERS, LINEITEM, CUSTOMER], [ORDERS_FACT, LINEITEM_FACT],
                      Settings(time_unit=TimeUnit.DAY), TYPE_DEFAULTS)

# time bounds (events span 2024-01; orders/lineitem span 1995..2001)
T_FAR = dt.datetime(2100, 1, 1)
T_EVENTS_MID = dt.datetime(2024, 1, 16)
T_ORDERS_MID = dt.datetime(1998, 1, 1)
SQL_FAR = "TIMESTAMP '2100-01-01 00:00:00'"
SQL_EVENTS_MID = "TIMESTAMP '2024-01-16 00:00:00'"
SQL_ORDERS_MID = "TIMESTAMP '1998-01-01 00:00:00'"


def _dbl(c: str) -> F.Column:
    return F.col(c).cast("double").alias(c)


# --- events pipeline --------------------------------------------------------


def dim_event_type_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_catalog(spark, sf_dir, [EVENTS])
    return dimension_population_df(EVENTS_ENV, EVENTS_FACT, "dim_event_type",
                                   cat, time_upper=T_FAR)


# Surrogate-id scale-gate contract (VERDICT r10 item 3): a dimension
# over the events stream's user_id — the highest-cardinality DimVal the
# testdata offers (grows with SF: 150 visitors at sf0.01) — built with
# ringo.dimIdSingleSortMaxBytes forced to 0, i.e. the PARTITIONED
# id-assignment path (range-partitioned row_number + per-partition
# offsets; populate/dimension.py).  The oracle recomputes the global
# row_number in SQL, so the driver row proves cell-exactly that the
# scale path's ids equal the single-task-sort semantics.  "visitor"
# (not "user") keeps dim_column_name from prefix-stripping user_id down
# to a column that would collide with the surrogate `id`.
VISITOR_DIM_FACT = Fact("events_visitor_dim", "events", [
    FactColumn("ts", DimTime()),
    FactColumn("user_id", DimVal("visitor")),
])
VISITOR_DIM_ENV = make_env([EVENTS], [VISITOR_DIM_FACT],
                           Settings(time_unit=TimeUnit.MINUTE), TYPE_DEFAULTS)


def dim_visitor_partitioned_ids_df(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    from .populate.dimension import DIM_ID_GATE_CONF_KEY

    cat = load_catalog(spark, sf_dir, [EVENTS])
    prev = spark.conf.get(DIM_ID_GATE_CONF_KEY, None)
    spark.conf.set(DIM_ID_GATE_CONF_KEY, "0")
    try:
        # the partitioned path materializes eagerly (localCheckpoint),
        # so the forced gate is consumed before the conf is restored
        return dimension_population_df(
            VISITOR_DIM_ENV, VISITOR_DIM_FACT, "dim_visitor", cat,
            time_upper=T_FAR)
    finally:
        if prev is None:
            spark.conf.unset(DIM_ID_GATE_CONF_KEY)
        else:
            spark.conf.set(DIM_ID_GATE_CONF_KEY, prev)


DIM_VISITOR_PARTITIONED_IDS_SQL = f"""
SELECT CAST(row_number() OVER (ORDER BY user_id) AS INT) AS id, user_id
FROM (SELECT DISTINCT coalesce(user_id, -1) AS user_id
      FROM events
      WHERE user_id IS NOT NULL AND ts < {SQL_FAR})
"""


DIM_EVENT_TYPE_SQL = f"""
SELECT CAST(row_number() OVER (ORDER BY event_type) AS INT) AS id, event_type
FROM (SELECT DISTINCT coalesce(event_type, '__UNKNOWN_VAL__') AS event_type
      FROM events
      WHERE event_type IS NOT NULL AND ts < {SQL_FAR})
"""

_DIM_EVENT_TYPE_CTE = f"""
dim_event_type AS (
  SELECT CAST(row_number() OVER (ORDER BY event_type) AS INT) AS id, event_type
  FROM (SELECT DISTINCT coalesce(event_type, '__UNKNOWN_VAL__') AS event_type
        FROM events
        WHERE event_type IS NOT NULL AND ts < {SQL_FAR}))
"""


def fact_events_by_minute_df(spark: SparkSession, sf_dir: str,
                             count_distinct_mode: str = "exact") -> DataFrame:
    cat = load_catalog(spark, sf_dir, [EVENTS])
    dim = dim_event_type_df(spark, sf_dir)
    out = fact_population_df(EVENTS_ENV, EVENTS_FACT, cat,
                             dims={"dim_event_type": dim},
                             time_upper=T_FAR,
                             count_distinct_mode=count_distinct_mode)
    return out.select(
        "ts_minute_id", "user_id", "event_count",
        _dbl("value_sum"), "value_avg_count", _dbl("value_avg_sum"),
        _dbl("value_max"), _dbl("value_min"), "user_count", "event_type_id")


FACT_EVENTS_BY_MINUTE_SQL = f"""
WITH {_DIM_EVENT_TYPE_CTE}
SELECT CAST(floor(epoch(e.ts) / 60) AS BIGINT)                    AS ts_minute_id,
       coalesce(e.user_id, -1)                                    AS user_id,
       count(*)                                                   AS event_count,
       CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE)        AS value_sum,
       count(e.value)                                             AS value_avg_count,
       CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE)        AS value_avg_sum,
       CAST(max(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE)        AS value_max,
       CAST(min(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE)        AS value_min,
       count(DISTINCT e.user_id)                                  AS user_count,
       CAST(coalesce(d.id, -1) AS INT)                            AS event_type_id
FROM events e
LEFT JOIN dim_event_type d
       ON d.event_type = coalesce(e.event_type, '__UNKNOWN_VAL__')
WHERE e.ts < {SQL_FAR}
GROUP BY 1, 2, 10
"""


def fact_events_by_minute_approx_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate count-distinct variant (HLL++, rsd=0.05) — checked
    rows-only by the driver; ``tests/test_approx.py`` asserts the ε bound.

    DEGENERATE-GRAIN STRESS BENCHMARK, not a production shape: the fact's
    grain keeps ``user_id`` in the group keys, so every HLL sketch
    estimates a 0/1-cardinality set — maximum per-group sketch overhead
    with zero aggregation win.  It is kept exactly because that makes it
    the worst case for sketch-buffer cost (historically the bench's
    biggest mover).  The meaningful-grain contract — week × event_type,
    where distinct-counts are real and the ±3ε bound is falsifiable — is
    ``fact_events_by_minute_approx_bounds_df`` below."""
    return fact_events_by_minute_df(spark, sf_dir, count_distinct_mode="approx")


APPROX_EPS_MULT = 3          # bound: |est - exact| <= max(3·rsd·exact, 2)

# Bounds grain: WEEK × event_type, WITHOUT user_id.  The r06 shape kept
# the fact's own grain (minute, user_id, event_type), where user_id in
# the keys makes exact COUNT(DISTINCT user_id) always 0/1 and the
# tolerance floor of 2 unfalsifiable (r06 ADVICE medium: the oracle
# could never catch HLL drift).  Dropping user_id and widening time to
# weeks yields per-group distinct-counts in the tens (sf0.001) to
# hundreds (sf0.01), so a drifting estimate actually flips
# within_3eps to FALSE.
EVENTS_BOUNDS_FACT = Fact("events_bounds", "events", [
    FactColumn("ts", DimTime()),
    FactColumn("event_type", DimVal("event_type")),
    FactColumn("user_count", FactCountDistinct("user_id")),
])
EVENTS_BOUNDS_ENV = make_env([EVENTS], [EVENTS_BOUNDS_FACT],
                             Settings(time_unit=TimeUnit.WEEK), TYPE_DEFAULTS)


def fact_events_by_minute_approx_bounds_df(spark: SparkSession,
                                           sf_dir: str) -> DataFrame:
    """Driver-hashable bounds check for the HLL++ count-distinct mode:
    runs the SAME fact pipeline twice (exact vs approx) at a week ×
    event_type grain where distinct-counts are non-degenerate, emits the
    exact count (which the oracle reproduces cell-exactly) plus a boolean
    asserting the HLL estimate is within ±3ε (ε = rsd·exact).  Groups
    with exact ≤ 1 require strict equality (HLL sparse mode is exact
    there); larger groups get max(⌈3·rsd·exact⌉, 2).  The oracle pins
    TRUE for every group, so drift past the published bound turns the
    driver row red."""
    cat = load_catalog(spark, sf_dir, [EVENTS])
    dim = dim_event_type_df(spark, sf_dir)
    keys = ["ts_week_id", "event_type_id"]

    def _run(mode: str, out: str) -> DataFrame:
        return (fact_population_df(EVENTS_BOUNDS_ENV, EVENTS_BOUNDS_FACT, cat,
                                   dims={"dim_event_type": dim},
                                   time_upper=T_FAR, count_distinct_mode=mode)
                .select(*keys, F.col("user_count").alias(out)))

    exact = _run("exact", "exact_count")
    approx = _run("approx", "approx_count")
    # rsd comes from the SAME settings the approx run's HLL uses
    # (populate/fact.py) — a free-standing constant would silently
    # diverge if an env tunes fact_count_distinct_error_rate
    rsd = EVENTS_BOUNDS_ENV.settings.fact_count_distinct_error_rate
    tol = F.greatest(
        F.ceil(F.col("exact_count") * (APPROX_EPS_MULT * rsd)), F.lit(2))
    within = F.when(F.col("exact_count") <= 1,
                    F.col("approx_count") == F.col("exact_count")) \
              .otherwise(F.abs(F.col("approx_count") - F.col("exact_count"))
                         <= tol)
    return (exact.join(approx, keys)
            .select(*keys, "exact_count", within.alias("within_3eps")))


FACT_EVENTS_BY_MINUTE_APPROX_BOUNDS_SQL = f"""
WITH {_DIM_EVENT_TYPE_CTE}
SELECT CAST(floor(epoch(e.ts) / 604800) AS BIGINT) AS ts_week_id,
       CAST(coalesce(d.id, -1) AS INT)             AS event_type_id,
       count(DISTINCT e.user_id)                   AS exact_count,
       TRUE                                        AS within_3eps
FROM events e
LEFT JOIN dim_event_type d
       ON d.event_type = coalesce(e.event_type, '__UNKNOWN_VAL__')
WHERE e.ts < {SQL_FAR}
GROUP BY 1, 2
"""


def dim_event_type_incremental_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Populate dim from batch 1 (ts < mid), then incrementally from batch 2
    (mid <= ts < far): anti-join drops already-present rows, new rows get
    offset surrogate ids."""
    cat = load_catalog(spark, sf_dir, [EVENTS])
    b1 = dimension_population_df(EVENTS_ENV, EVENTS_FACT, "dim_event_type",
                                 cat, time_upper=T_EVENTS_MID)
    b2 = dimension_population_df(EVENTS_ENV, EVENTS_FACT, "dim_event_type",
                                 cat, mode=PopulationMode.INCREMENTAL,
                                 time_upper=T_FAR, time_lower=T_EVENTS_MID,
                                 existing_dim=b1)
    return b1.unionByName(b2)


DIM_EVENT_TYPE_INCREMENTAL_SQL = f"""
WITH b1 AS (
  SELECT DISTINCT coalesce(event_type, '__UNKNOWN_VAL__') AS event_type
  FROM events WHERE event_type IS NOT NULL AND ts < {SQL_EVENTS_MID}),
b1id AS (
  SELECT CAST(row_number() OVER (ORDER BY event_type) AS INT) AS id, event_type
  FROM b1),
b2 AS (
  SELECT DISTINCT coalesce(event_type, '__UNKNOWN_VAL__') AS event_type
  FROM events
  WHERE event_type IS NOT NULL AND ts < {SQL_FAR} AND ts >= {SQL_EVENTS_MID}),
new_rows AS (
  SELECT b2.event_type FROM b2
  LEFT JOIN b1id ON b1id.event_type = b2.event_type
  WHERE b1id.event_type IS NULL)
SELECT id, event_type FROM b1id
UNION ALL
SELECT CAST((SELECT count(*) FROM b1id) + row_number() OVER (ORDER BY event_type)
            AS INT) AS id,
       event_type
FROM new_rows
"""


def fact_events_by_minute_incremental_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full population of window 1, incremental append of window 2."""
    cat = load_catalog(spark, sf_dir, [EVENTS])
    dim = dim_event_type_incremental_df(spark, sf_dir)
    w1 = fact_population_df(EVENTS_ENV, EVENTS_FACT, cat,
                            dims={"dim_event_type": dim},
                            time_upper=T_EVENTS_MID,
                            count_distinct_mode="exact")
    w2 = fact_population_df(EVENTS_ENV, EVENTS_FACT, cat,
                            dims={"dim_event_type": dim},
                            mode=PopulationMode.INCREMENTAL,
                            time_upper=T_FAR, time_lower=T_EVENTS_MID,
                            count_distinct_mode="exact")
    out = w1.unionByName(w2)
    return out.select(
        "ts_minute_id", "user_id", "event_count",
        _dbl("value_sum"), "value_avg_count", _dbl("value_avg_sum"),
        _dbl("value_max"), _dbl("value_min"), "user_count", "event_type_id")


# The two windows split on a minute boundary, so the appended windows'
# groups are disjoint and the union equals the full rollup — but against
# the *incrementally built* dimension (batch-1 ids, then offset new ids).
_DIM_EVENT_TYPE_INC_CTE = f"""
b1 AS (
  SELECT DISTINCT coalesce(event_type, '__UNKNOWN_VAL__') AS event_type
  FROM events WHERE event_type IS NOT NULL AND ts < {SQL_EVENTS_MID}),
b1id AS (
  SELECT CAST(row_number() OVER (ORDER BY event_type) AS INT) AS id, event_type
  FROM b1),
b2 AS (
  SELECT DISTINCT coalesce(event_type, '__UNKNOWN_VAL__') AS event_type
  FROM events
  WHERE event_type IS NOT NULL AND ts < {SQL_FAR} AND ts >= {SQL_EVENTS_MID}),
new_rows AS (
  SELECT b2.event_type FROM b2
  LEFT JOIN b1id ON b1id.event_type = b2.event_type
  WHERE b1id.event_type IS NULL),
dim_event_type AS (
  SELECT id, event_type FROM b1id
  UNION ALL
  SELECT CAST((SELECT count(*) FROM b1id)
              + row_number() OVER (ORDER BY event_type) AS INT) AS id,
         event_type
  FROM new_rows)
"""

FACT_EVENTS_BY_MINUTE_INCREMENTAL_SQL = f"""
WITH {_DIM_EVENT_TYPE_INC_CTE}
SELECT CAST(floor(epoch(e.ts) / 60) AS BIGINT)                    AS ts_minute_id,
       coalesce(e.user_id, -1)                                    AS user_id,
       count(*)                                                   AS event_count,
       CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE)        AS value_sum,
       count(e.value)                                             AS value_avg_count,
       CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE)        AS value_avg_sum,
       CAST(max(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE)        AS value_max,
       CAST(min(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE)        AS value_min,
       count(DISTINCT e.user_id)                                  AS user_count,
       CAST(coalesce(d.id, -1) AS INT)                            AS event_type_id
FROM events e
LEFT JOIN dim_event_type d
       ON d.event_type = coalesce(e.event_type, '__UNKNOWN_VAL__')
WHERE e.ts < {SQL_FAR}
GROUP BY 1, 2, 10
"""

# --- orders / lineitem pipeline --------------------------------------------


def _orders_dims(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    cat = load_catalog(spark, sf_dir, [ORDERS])
    return {
        name: dimension_population_df(ORDERS_ENV, ORDERS_FACT, name, cat,
                                      time_upper=T_FAR)
        for name in ("dim_order_status", "dim_order_priority")
    }


def dim_order_status_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _orders_dims(spark, sf_dir)["dim_order_status"]


def dim_order_priority_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _orders_dims(spark, sf_dir)["dim_order_priority"]


_ORDERS_DIM_CTES = f"""
dim_order_status AS (
  SELECT CAST(row_number() OVER (ORDER BY o_orderstatus) AS INT) AS id, o_orderstatus
  FROM (SELECT DISTINCT coalesce(o_orderstatus, '__UNKNOWN_VAL__') AS o_orderstatus
        FROM orders
        WHERE o_orderstatus IS NOT NULL AND o_orderdate < {SQL_FAR})),
dim_order_priority AS (
  SELECT CAST(row_number() OVER (ORDER BY o_orderpriority) AS INT) AS id, o_orderpriority
  FROM (SELECT DISTINCT coalesce(o_orderpriority, '__UNKNOWN_VAL__') AS o_orderpriority
        FROM orders
        WHERE o_orderpriority IS NOT NULL AND o_orderdate < {SQL_FAR}))
"""

DIM_ORDER_STATUS_SQL = f"""
WITH {_ORDERS_DIM_CTES}
SELECT id, o_orderstatus FROM dim_order_status
"""

DIM_ORDER_PRIORITY_SQL = f"""
WITH {_ORDERS_DIM_CTES}
SELECT id, o_orderpriority FROM dim_order_priority
"""


def fact_orders_by_day_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_catalog(spark, sf_dir, [ORDERS])
    dims = _orders_dims(spark, sf_dir)
    out = fact_population_df(ORDERS_ENV, ORDERS_FACT, cat, dims=dims,
                             time_upper=T_FAR)
    return out.select("o_orderdate_day_id", "order_count", _dbl("price_sum"),
                      "o_custkey", "order_priority_id", "order_status_id")


FACT_ORDERS_BY_DAY_SQL = f"""
WITH {_ORDERS_DIM_CTES}
SELECT CAST(floor(epoch(o.o_orderdate) / 86400) AS BIGINT)        AS o_orderdate_day_id,
       count(*)                                                   AS order_count,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum,
       coalesce(o.o_custkey, -1)                                  AS o_custkey,
       CAST(coalesce(dp.id, -1) AS INT)                           AS order_priority_id,
       CAST(coalesce(ds.id, -1) AS INT)                           AS order_status_id
FROM orders o
LEFT JOIN dim_order_status ds
       ON ds.o_orderstatus = coalesce(o.o_orderstatus, '__UNKNOWN_VAL__')
LEFT JOIN dim_order_priority dp
       ON dp.o_orderpriority = coalesce(o.o_orderpriority, '__UNKNOWN_VAL__')
WHERE o.o_orderdate < {SQL_FAR}
GROUP BY 1, 4, 5, 6
"""


def dim_line_status_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_catalog(spark, sf_dir, [LINEITEM])
    return dimension_population_df(ORDERS_ENV, LINEITEM_FACT, "dim_line_status",
                                   cat, time_upper=T_FAR)


_DIM_LINE_STATUS_CTE = f"""
dim_line_status AS (
  SELECT CAST(row_number() OVER (ORDER BY l_returnflag, l_linestatus) AS INT) AS id,
         l_returnflag, l_linestatus
  FROM (SELECT DISTINCT coalesce(l_returnflag, '__UNKNOWN_VAL__') AS l_returnflag,
                        coalesce(l_linestatus, '__UNKNOWN_VAL__') AS l_linestatus
        FROM lineitem
        WHERE (l_returnflag IS NOT NULL OR l_linestatus IS NOT NULL)
          AND l_shipdate < {SQL_FAR}))
"""

DIM_LINE_STATUS_SQL = f"""
WITH {_DIM_LINE_STATUS_CTE}
SELECT id, l_returnflag, l_linestatus FROM dim_line_status
"""


def fact_lineitem_by_day_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exercises the parent-fact left join: lineitem inherits orders' dims
    (customer DimId + the two derived dims) through the declared FK."""
    cat = load_catalog(spark, sf_dir, [LINEITEM, ORDERS])
    dims = _orders_dims(spark, sf_dir)
    dims["dim_line_status"] = dim_line_status_df(spark, sf_dir)
    out = fact_population_df(ORDERS_ENV, LINEITEM_FACT, cat, dims=dims,
                             time_upper=T_FAR, count_distinct_mode="exact")
    return out.select("l_shipdate_day_id", _dbl("qty_sum"), "part_count",
                      "line_status_id", "o_custkey", "order_priority_id",
                      "order_status_id")


FACT_LINEITEM_BY_DAY_SQL = f"""
WITH {_ORDERS_DIM_CTES},
{_DIM_LINE_STATUS_CTE}
SELECT CAST(floor(epoch(l.l_shipdate) / 86400) AS BIGINT)        AS l_shipdate_day_id,
       CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)  AS qty_sum,
       count(DISTINCT l.l_partkey)                               AS part_count,
       CAST(coalesce(dls.id, -1) AS INT)                         AS line_status_id,
       coalesce(o.o_custkey, -1)                                 AS o_custkey,
       CAST(coalesce(dp.id, -1) AS INT)                          AS order_priority_id,
       CAST(coalesce(ds.id, -1) AS INT)                          AS order_status_id
FROM lineitem l
LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
LEFT JOIN dim_line_status dls
       ON dls.l_returnflag = coalesce(l.l_returnflag, '__UNKNOWN_VAL__')
      AND dls.l_linestatus = coalesce(l.l_linestatus, '__UNKNOWN_VAL__')
LEFT JOIN dim_order_status ds
       ON ds.o_orderstatus = coalesce(o.o_orderstatus, '__UNKNOWN_VAL__')
LEFT JOIN dim_order_priority dp
       ON dp.o_orderpriority = coalesce(o.o_orderpriority, '__UNKNOWN_VAL__')
WHERE l.l_shipdate < {SQL_FAR}
GROUP BY 1, 4, 5, 6, 7
"""

# --- registry ---------------------------------------------------------------

CORE_QUERIES: dict[str, tuple] = {
    # name -> (builder, oracle_sql | None)
    "dim_event_type": (dim_event_type_df, DIM_EVENT_TYPE_SQL),
    # surrogate-id scale-gate contract: the partitioned id-assignment
    # path vs the oracle's global row_number (see builder docstring)
    "dim_visitor_partitioned_ids": (dim_visitor_partitioned_ids_df,
                                    DIM_VISITOR_PARTITIONED_IDS_SQL),
    "fact_events_by_minute": (fact_events_by_minute_df, FACT_EVENTS_BY_MINUTE_SQL),
    "fact_events_by_minute_approx": (fact_events_by_minute_approx_df, None),
    # range-style oracle over the HLL variant: exact per-group counts +
    # a ±3ε boolean the oracle pins to TRUE (VERDICT r05 item 6)
    "fact_events_by_minute_approx_bounds": (
        fact_events_by_minute_approx_bounds_df,
        FACT_EVENTS_BY_MINUTE_APPROX_BOUNDS_SQL),
    "dim_event_type_incremental": (dim_event_type_incremental_df,
                                   DIM_EVENT_TYPE_INCREMENTAL_SQL),
    "fact_events_by_minute_incremental": (fact_events_by_minute_incremental_df,
                                          FACT_EVENTS_BY_MINUTE_INCREMENTAL_SQL),
    "dim_order_status": (dim_order_status_df, DIM_ORDER_STATUS_SQL),
    "dim_order_priority": (dim_order_priority_df, DIM_ORDER_PRIORITY_SQL),
    "fact_orders_by_day": (fact_orders_by_day_df, FACT_ORDERS_BY_DAY_SQL),
    "dim_line_status": (dim_line_status_df, DIM_LINE_STATUS_SQL),
    "fact_lineitem_by_day": (fact_lineitem_by_day_df, FACT_LINEITEM_BY_DAY_SQL),
}
