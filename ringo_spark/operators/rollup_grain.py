"""Tenant-keyed facts and multi-grain re-rollup.

Covers the two remaining FactColumnType paths not exercised by the core
testbed specs — ``TenantId`` (multi-tenant grouping + storage partition
key) and ``FactCount(source)`` (non-null counts) — and demonstrates the
reference's central physical-design idea: persisted fact measures are
*mergeable partial aggregates* (avg = (count, sum) pair, Extractor.hs:48-51),
so a coarser grain is a re-aggregation of the stored fact table, never a
rescan of the OLTP source.

``fact_events_hour_regrain`` re-rolls the minute-grain fact to hour grain
purely from the minute fact's columns; its oracle computes the hour rollup
directly from the raw events — equality proves the partial-aggregate
design is lossless.  At 100 TB the minute fact is orders of magnitude
smaller than the source, so the re-grain touches a fraction of the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_catalog
from ..model import (
    DimTime, DimVal, Fact, FactAverage, FactColumn, FactCount, FactMax,
    FactMin, FactSum, Settings, TenantId, TimeUnit,
)
from ..populate.dimension import dimension_population_df
from ..populate.fact import fact_population_df
from ..validator import make_env
from ..testbed import EVENTS, T_FAR, TYPE_DEFAULTS, SQL_FAR, _dbl

# tenant-style fact: user_id is the tenant partition key; value_count
# exercises count(<source column>) (non-null count, Populate/Fact.hs:160-161)
EVENTS_TENANT_FACT = Fact("events_tenant", "events", [
    FactColumn("ts", DimTime()),
    FactColumn("user_id", TenantId()),
    FactColumn("event_type", DimVal("event_type")),
    FactColumn("value_count", FactCount("value")),
    FactColumn("value_sum", FactSum("value")),
    FactColumn("value_avg", FactAverage("value")),
    FactColumn("value_max", FactMax("value")),
    FactColumn("value_min", FactMin("value")),
])

TENANT_ENV = make_env([EVENTS], [EVENTS_TENANT_FACT],
                      Settings(time_unit=TimeUnit.HOUR), TYPE_DEFAULTS)


def _minute_env():
    from ..testbed import EVENTS_ENV, EVENTS_FACT

    return EVENTS_ENV, EVENTS_FACT


def fact_events_tenant_by_hour_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_catalog(spark, sf_dir, [EVENTS])
    dim = dimension_population_df(TENANT_ENV, EVENTS_TENANT_FACT,
                                  "dim_event_type", cat, time_upper=T_FAR)
    out = fact_population_df(TENANT_ENV, EVENTS_TENANT_FACT, cat,
                             dims={"dim_event_type": dim}, time_upper=T_FAR)
    return out.select("ts_hour_id", "user_id", "value_count",
                      _dbl("value_sum"), "value_avg_count",
                      _dbl("value_avg_sum"), _dbl("value_max"),
                      _dbl("value_min"), "event_type_id")


FACT_EVENTS_TENANT_BY_HOUR_SQL = f"""
WITH dim_event_type AS (
  SELECT CAST(row_number() OVER (ORDER BY event_type) AS INT) AS id, event_type
  FROM (SELECT DISTINCT coalesce(event_type, '__UNKNOWN_VAL__') AS event_type
        FROM events WHERE event_type IS NOT NULL AND ts < {SQL_FAR}))
SELECT CAST(floor(epoch(e.ts) / 3600) AS BIGINT)                  AS ts_hour_id,
       coalesce(e.user_id, -1)                                    AS user_id,
       count(e.value)                                             AS value_count,
       CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE)        AS value_sum,
       count(e.value)                                             AS value_avg_count,
       CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE)        AS value_avg_sum,
       CAST(max(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE)        AS value_max,
       CAST(min(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE)        AS value_min,
       CAST(coalesce(d.id, -1) AS INT)                            AS event_type_id
FROM events e
LEFT JOIN dim_event_type d
       ON d.event_type = coalesce(e.event_type, '__UNKNOWN_VAL__')
WHERE e.ts < {SQL_FAR}
GROUP BY 1, 2, 9
"""


def fact_events_hour_regrain_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-grain rollup computed by re-aggregating the minute-grain fact's
    mergeable partial state (never rescanning raw events)."""
    env, fact = _minute_env()
    cat = load_catalog(spark, sf_dir, [EVENTS])
    dim = dimension_population_df(env, fact, "dim_event_type", cat,
                                  time_upper=T_FAR)
    minute = fact_population_df(env, fact, cat, dims={"dim_event_type": dim},
                                time_upper=T_FAR, count_distinct_mode="exact")
    return (minute
            .groupBy(F.floor(F.col("ts_minute_id") / 60).alias("ts_hour_id"),
                     "user_id", "event_type_id")
            .agg(F.sum("event_count").alias("event_count"),
                 F.sum("value_sum").alias("value_sum"),
                 F.sum("value_avg_count").alias("value_avg_count"),
                 F.sum("value_avg_sum").alias("value_avg_sum"),
                 F.max("value_max").alias("value_max"),
                 F.min("value_min").alias("value_min"))
            .select("ts_hour_id", "user_id", "event_type_id", "event_count",
                    _dbl("value_sum"), "value_avg_count", _dbl("value_avg_sum"),
                    _dbl("value_max"), _dbl("value_min")))


# oracle computes the hour grain DIRECTLY from raw events: equality proves
# the minute fact's partial aggregates re-roll losslessly
FACT_EVENTS_HOUR_REGRAIN_SQL = f"""
WITH dim_event_type AS (
  SELECT CAST(row_number() OVER (ORDER BY event_type) AS INT) AS id, event_type
  FROM (SELECT DISTINCT coalesce(event_type, '__UNKNOWN_VAL__') AS event_type
        FROM events WHERE event_type IS NOT NULL AND ts < {SQL_FAR}))
SELECT CAST(floor(epoch(e.ts) / 3600) AS BIGINT)                  AS ts_hour_id,
       coalesce(e.user_id, -1)                                    AS user_id,
       CAST(coalesce(d.id, -1) AS INT)                            AS event_type_id,
       count(*)                                                   AS event_count,
       CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE)        AS value_sum,
       count(e.value)                                             AS value_avg_count,
       CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE)        AS value_avg_sum,
       CAST(max(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE)        AS value_max,
       CAST(min(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE)        AS value_min
FROM events e
LEFT JOIN dim_event_type d
       ON d.event_type = coalesce(e.event_type, '__UNKNOWN_VAL__')
WHERE e.ts < {SQL_FAR}
GROUP BY 1, 2, 3
"""

def fact_orders_by_week_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-grain rollup (TimeUnit.WEEK, 604800-second epoch buckets) of
    the orders fact — same spec as the day-grain testbed fact, coarser
    grain, exercising the remaining time unit."""
    from ..testbed import CUSTOMER, LINEITEM, ORDERS, ORDERS_FACT

    week_env = make_env([ORDERS, LINEITEM, CUSTOMER], [ORDERS_FACT],
                        Settings(time_unit=TimeUnit.WEEK), TYPE_DEFAULTS)
    cat = load_catalog(spark, sf_dir, [ORDERS])
    dims = {
        name: dimension_population_df(week_env, ORDERS_FACT, name, cat,
                                      time_upper=T_FAR)
        for name in ("dim_order_status", "dim_order_priority")
    }
    out = fact_population_df(week_env, ORDERS_FACT, cat, dims=dims,
                             time_upper=T_FAR)
    return out.select("o_orderdate_week_id", "order_count", _dbl("price_sum"),
                      "o_custkey", "order_priority_id", "order_status_id")


FACT_ORDERS_BY_WEEK_SQL = f"""
WITH dim_order_status AS (
  SELECT CAST(row_number() OVER (ORDER BY o_orderstatus) AS INT) AS id, o_orderstatus
  FROM (SELECT DISTINCT coalesce(o_orderstatus, '__UNKNOWN_VAL__') AS o_orderstatus
        FROM orders
        WHERE o_orderstatus IS NOT NULL AND o_orderdate < {SQL_FAR})),
dim_order_priority AS (
  SELECT CAST(row_number() OVER (ORDER BY o_orderpriority) AS INT) AS id, o_orderpriority
  FROM (SELECT DISTINCT coalesce(o_orderpriority, '__UNKNOWN_VAL__') AS o_orderpriority
        FROM orders
        WHERE o_orderpriority IS NOT NULL AND o_orderdate < {SQL_FAR}))
SELECT CAST(floor(epoch(o.o_orderdate) / 604800) AS BIGINT)       AS o_orderdate_week_id,
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


def fact_events_by_second_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-grain rollup (TimeUnit.SECOND, epoch buckets) — the finest
    time unit (Types/Internal.hs:61-72), completing grain coverage."""
    from ..model import NoDimId
    from ..testbed import EVENTS

    sec_fact = Fact("events", "events", [
        FactColumn("ts", DimTime()),
        FactColumn("user_id", NoDimId()),
        FactColumn("event_count", FactCount()),
        FactColumn("value_sum", FactSum("value")),
    ])
    sec_env = make_env([EVENTS], [sec_fact],
                       Settings(time_unit=TimeUnit.SECOND), TYPE_DEFAULTS)
    cat = load_catalog(spark, sf_dir, [EVENTS])
    out = fact_population_df(sec_env, sec_fact, cat, time_upper=T_FAR)
    return out.select("ts_second_id", "user_id", "event_count",
                      _dbl("value_sum"))


FACT_EVENTS_BY_SECOND_SQL = f"""
SELECT CAST(floor(epoch(e.ts)) AS BIGINT)                          AS ts_second_id,
       coalesce(e.user_id, -1)                                     AS user_id,
       count(*)                                                    AS event_count,
       CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE)         AS value_sum
FROM events e
WHERE e.ts < {SQL_FAR}
GROUP BY 1, 2
"""


def fact_lineitem_chain_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-level parent-fact chain: a shipping fact on lineitem whose
    parent is the lineitem fact, whose parent is the orders fact — the
    grandchild inherits the parent's dim (line_status), the grandparent's
    derived dims (order_status, order_priority) and DimId (customer)
    through two levels of ``extractAllDimensionTables`` recursion
    (Extractor/Internal.hs:96-103), with the reference's join rule: the
    child's own FK reaches every ancestor source directly."""
    from ..testbed import (
        CUSTOMER, LINEITEM, LINEITEM_FACT, ORDERS, ORDERS_FACT,
    )

    ship_fact = Fact("lineitem_ship", "lineitem", [
        FactColumn("l_shipdate", DimTime()),
        FactColumn("l_linestatus", DimVal("ship_status")),
        FactColumn("ship_count", FactCount()),
    ], parent_names=["lineitem"])
    chain_env = make_env([ORDERS, LINEITEM, CUSTOMER],
                         [ORDERS_FACT, LINEITEM_FACT, ship_fact],
                         Settings(time_unit=TimeUnit.DAY), TYPE_DEFAULTS)
    cat = load_catalog(spark, sf_dir, [LINEITEM, ORDERS])
    dims = {
        "dim_ship_status": dimension_population_df(
            chain_env, ship_fact, "dim_ship_status", cat, time_upper=T_FAR),
        "dim_line_status": dimension_population_df(
            chain_env, LINEITEM_FACT, "dim_line_status", cat, time_upper=T_FAR),
    }
    for name in ("dim_order_status", "dim_order_priority"):
        dims[name] = dimension_population_df(chain_env, ORDERS_FACT, name,
                                             cat, time_upper=T_FAR)
    out = fact_population_df(chain_env, ship_fact, cat, dims=dims,
                             time_upper=T_FAR)
    return out.select("l_shipdate_day_id", "ship_count", "ship_status_id",
                      "line_status_id", "o_custkey", "order_status_id",
                      "order_priority_id")


FACT_LINEITEM_CHAIN_SQL = f"""
WITH dim_order_status AS (
  SELECT CAST(row_number() OVER (ORDER BY o_orderstatus) AS INT) AS id, o_orderstatus
  FROM (SELECT DISTINCT coalesce(o_orderstatus, '__UNKNOWN_VAL__') AS o_orderstatus
        FROM orders
        WHERE o_orderstatus IS NOT NULL AND o_orderdate < {SQL_FAR})),
dim_order_priority AS (
  SELECT CAST(row_number() OVER (ORDER BY o_orderpriority) AS INT) AS id, o_orderpriority
  FROM (SELECT DISTINCT coalesce(o_orderpriority, '__UNKNOWN_VAL__') AS o_orderpriority
        FROM orders
        WHERE o_orderpriority IS NOT NULL AND o_orderdate < {SQL_FAR})),
dim_line_status AS (
  SELECT CAST(row_number() OVER (ORDER BY l_returnflag, l_linestatus) AS INT) AS id,
         l_returnflag, l_linestatus
  FROM (SELECT DISTINCT coalesce(l_returnflag, '__UNKNOWN_VAL__') AS l_returnflag,
                        coalesce(l_linestatus, '__UNKNOWN_VAL__') AS l_linestatus
        FROM lineitem
        WHERE (l_returnflag IS NOT NULL OR l_linestatus IS NOT NULL)
          AND l_shipdate < {SQL_FAR})),
dim_ship_status AS (
  SELECT CAST(row_number() OVER (ORDER BY l_linestatus) AS INT) AS id, l_linestatus
  FROM (SELECT DISTINCT coalesce(l_linestatus, '__UNKNOWN_VAL__') AS l_linestatus
        FROM lineitem
        WHERE l_linestatus IS NOT NULL AND l_shipdate < {SQL_FAR}))
SELECT CAST(floor(epoch(l.l_shipdate) / 86400) AS BIGINT)         AS l_shipdate_day_id,
       count(*)                                                   AS ship_count,
       CAST(coalesce(dss.id, -1) AS INT)                          AS ship_status_id,
       CAST(coalesce(dls.id, -1) AS INT)                          AS line_status_id,
       coalesce(o.o_custkey, -1)                                  AS o_custkey,
       CAST(coalesce(ds.id, -1) AS INT)                           AS order_status_id,
       CAST(coalesce(dp.id, -1) AS INT)                           AS order_priority_id
FROM lineitem l
LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
LEFT JOIN dim_ship_status dss
       ON dss.l_linestatus = coalesce(l.l_linestatus, '__UNKNOWN_VAL__')
LEFT JOIN dim_line_status dls
       ON dls.l_returnflag = coalesce(l.l_returnflag, '__UNKNOWN_VAL__')
      AND dls.l_linestatus = coalesce(l.l_linestatus, '__UNKNOWN_VAL__')
LEFT JOIN dim_order_status ds
       ON ds.o_orderstatus = coalesce(o.o_orderstatus, '__UNKNOWN_VAL__')
LEFT JOIN dim_order_priority dp
       ON dp.o_orderpriority = coalesce(o.o_orderpriority, '__UNKNOWN_VAL__')
WHERE l.l_shipdate < {SQL_FAR}
GROUP BY 1, 3, 4, 5, 6, 7
"""


# --- skewed tenant rollup, salted twin (r15, VERDICT r14 item 5) -------------
#
# The realistic hot-key failure for a TenantId-keyed fact: one tenant
# owns most of the traffic, so the grain groupBy's shuffle sends that
# key's entire volume to ONE reducer — map-side partial aggregation
# absorbs most of it, but when the agg state spills (wide measures,
# high-cardinality sub-keys) the straggler is back.  The salted twin
# runs the two-phase shape from functions/skew.py: phase 1 groups by
# (tenant, salt16) — the hot tenant's rows spread over 16 reducers —
# and phase 2 merges the 16 mergeable partials per tenant.  Results are
# pinned equal to the plain rollup (same oracle); the plan is pinned to
# exactly two map-side-combining exchanges (tests/test_plans.py), so
# the salt can never silently add a third pass.

TENANT_SKEW_SALT_BUCKETS = 16


def _skewed_tenant(uid):
    """Deterministic skew injection on the events corpus: users 0-8
    collapse into tenant 0 (the hot key, ~60% of rows at the uniform
    user distribution), everyone else keeps their id — the 100x-style
    hot-tenant shape at any SF, derivable in the oracle."""
    return F.when(uid < 9, F.lit(0)).otherwise(uid)


def tenant_rollup_skew_salted_df(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    from ..functions.skew import salted_aggregate

    # load_catalog, not a bare read (r17 review): these two skew rows
    # were the only registered queries bypassing it — on a
    # nanos-timestamp events encoding a bare first read in a fresh
    # session fails outright, and only an earlier query's load_catalog
    # having mutated the shared session conf hid the dependency
    ev = load_catalog(spark, sf_dir, [EVENTS])["events"]
    uid = F.coalesce(F.col("user_id"), F.lit(-1))
    df = ev.select(_skewed_tenant(uid).alias("tenant"), "event_id",
                   F.col("value").cast("decimal(18,2)").alias("v"))
    out = salted_aggregate(
        df, ["tenant"],
        aggs={"n_events": F.count(F.lit(1)),
              "value_sum": F.sum("v"),
              "value_max": F.max("v"),
              "value_min": F.min("v")},
        salt_col="event_id",
        buckets=TENANT_SKEW_SALT_BUCKETS,
        merges={"value_max": F.max(F.col("value_max")),
                "value_min": F.min(F.col("value_min"))})
    return (out.select("tenant",
                       F.col("n_events").cast("long").alias("n_events"),
                       _dbl("value_sum"), _dbl("value_max"),
                       _dbl("value_min"))
            .orderBy("tenant"))


TENANT_ROLLUP_SKEW_SALTED_SQL = """
SELECT CASE WHEN coalesce(user_id, -1) < 9 THEN 0
            ELSE coalesce(user_id, -1) END                         AS tenant,
       count(*)                                                    AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)           AS value_sum,
       CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE)           AS value_max,
       CAST(min(CAST(value AS DECIMAL(18,2))) AS DOUBLE)           AS value_min
FROM events
GROUP BY 1
ORDER BY tenant
"""


# --- skewed tenant join, salted twin (r16, VERDICT r15 item 4) ---------------
#
# The hot-key failure mode for a *join* (the aggregation twin above is
# tenant_rollup_skew_salted): the skewed events side joins a medium
# per-tenant dimension, and the shuffle sends the hot tenant's entire
# volume (~60% of rows) to ONE reducer partition.  AQE's skew-join
# split handles the sort-merge case at runtime; the salted shape below
# is the *static* fix for when the medium side exceeds the broadcast
# gate and the deployment wants a deterministic plan: the medium side
# is replicated ``buckets`` ways (an explode over 8 rows per dim row —
# dim-sized, cheap) and the big side's shuffle key becomes
# (tenant, salt8), spreading the hot key over 8 reducers.  At bench SF
# customer still fits under the session broadcast gate, so the query
# passes an explicit shuffle_hash hint to pin the at-scale shape
# (tests/test_plans.py pins ShuffledHashJoin + __salt in the join key).
# Results are pinned cell-equal to the plain join by the oracle.

TENANT_JOIN_SALT_BUCKETS = 8


def events_skew_salted_join_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.skew import salted_broadcast_left_join
    from ..testbed import CUSTOMER

    # load_catalog, not bare reads (r17 review — see the salted
    # aggregation twin above)
    cat = load_catalog(spark, sf_dir, [EVENTS, CUSTOMER])
    ev, cust = cat["events"], cat["customer"]
    uid = F.coalesce(F.col("user_id"), F.lit(-1))
    big = ev.select(_skewed_tenant(uid).alias("tenant"), "event_id",
                    F.col("value").cast("decimal(18,2)").alias("v"))
    medium = cust.select(F.col("c_custkey").alias("tenant"),
                         F.coalesce("c_mktsegment",
                                    F.lit("__NONE__")).alias("segment"))
    joined = salted_broadcast_left_join(
        big, medium, on=["tenant"], buckets=TENANT_JOIN_SALT_BUCKETS,
        medium_hint="shuffle_hash")
    return (joined
            .groupBy(F.coalesce("segment", F.lit("__NONE__")).alias("segment"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                 F.sum("v").alias("value_sum_dec"),
                 F.max("v").alias("value_max_dec"))
            .select("segment", "n_events",
                    F.col("value_sum_dec").cast("double").alias("value_sum"),
                    F.col("value_max_dec").cast("double").alias("value_max"))
            .orderBy("segment"))


EVENTS_SKEW_SALTED_JOIN_SQL = """
SELECT coalesce(c.c_mktsegment, '__NONE__')                        AS segment,
       count(*)                                                    AS n_events,
       CAST(sum(e.v) AS DOUBLE)                                    AS value_sum,
       CAST(max(e.v) AS DOUBLE)                                    AS value_max
FROM (
  SELECT CASE WHEN coalesce(user_id, -1) < 9 THEN 0
              ELSE coalesce(user_id, -1) END                       AS tenant,
         CAST(value AS DECIMAL(18,2))                              AS v
  FROM events) e
LEFT JOIN customer c ON e.tenant = c.c_custkey
GROUP BY 1
ORDER BY segment
"""


GRAIN_QUERIES: dict[str, tuple] = {
    "tenant_rollup_skew_salted": (tenant_rollup_skew_salted_df,
                                  TENANT_ROLLUP_SKEW_SALTED_SQL),
    "events_skew_salted_join": (events_skew_salted_join_df,
                                EVENTS_SKEW_SALTED_JOIN_SQL),
    "fact_events_tenant_by_hour": (fact_events_tenant_by_hour_df,
                                   FACT_EVENTS_TENANT_BY_HOUR_SQL),
    "fact_events_hour_regrain": (fact_events_hour_regrain_df,
                                 FACT_EVENTS_HOUR_REGRAIN_SQL),
    "fact_orders_by_week": (fact_orders_by_week_df, FACT_ORDERS_BY_WEEK_SQL),
    "fact_events_by_second": (fact_events_by_second_df,
                              FACT_EVENTS_BY_SECOND_SQL),
    "fact_lineitem_chain": (fact_lineitem_chain_df, FACT_LINEITEM_CHAIN_SQL),
}
