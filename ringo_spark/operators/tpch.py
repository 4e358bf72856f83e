"""TPC-H-style reference queries over the testdata (adapted to its
schema), plus a per-key ordered-fold analytic.

- ``q1_pricing_summary`` — the classic multi-aggregate scan (TPC-H Q1
  shape): one pass, map-side partials, every derived measure in exact
  decimal arithmetic.
- ``q6_forecast_revenue`` — the classic selective-scan aggregate (Q6
  shape): all predicates reach the parquet scan.
- ``user_value_ema`` — exponential moving average of ``value`` per user in
  event order: a recursive (order-sensitive) analytic no plain aggregate
  expresses.  Implemented as sort_array(collect_list(struct)) + a
  higher-order fold — identical left-to-right double arithmetic in
  DuckDB's ``list_reduce``, so even this is hash-checked exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..catalog import read_parquet_stable as _rps

from ..functions.broadcast_gate import broadcast_if_small


def q1_pricing_summary_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _rps(spark, f"{sf_dir}/lineitem.parquet")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    # factors kept narrow so the triple product stays under decimal
    # precision 38 in BOTH engines (Spark would otherwise reduce scale
    # lossily on overflow and diverge from DuckDB)
    disc_f = (1 - F.col("l_discount").cast("decimal(18,4)")).cast("decimal(8,4)")
    tax_f = (1 + F.col("l_tax").cast("decimal(18,4)")).cast("decimal(8,4)")
    disc_price = price * disc_f            # decimal(27,6), exact
    charge = price * disc_f * tax_f        # decimal(36,10), exact
    return (li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(qty).cast("double").alias("sum_qty"),
                 F.sum(price).cast("double").alias("sum_base_price"),
                 # rounded to 2 before the double cast: >15-significant-digit
                 # decimals convert to double with double-rounding in DuckDB
                 # but correct rounding in Spark; at scale 2 both are exact
                 F.round(F.sum(disc_price), 2).cast("double")
                 .alias("sum_disc_price"),
                 F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
                 F.count(F.lit(1)).alias("count_order")))


Q1_PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - CAST(l_discount AS DECIMAL(18,4)) AS DECIMAL(8,4))), 2)
            AS DOUBLE) AS sum_disc_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - CAST(l_discount AS DECIMAL(18,4)) AS DECIMAL(8,4))
                * CAST(1 + CAST(l_tax AS DECIMAL(18,4)) AS DECIMAL(8,4))), 2)
            AS DOUBLE) AS sum_charge,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY 1, 2
"""


def q6_forecast_revenue_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _rps(spark, f"{sf_dir}/lineitem.parquet")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,4)")
    return (li.where((F.col("l_shipdate") >= F.lit("1996-01-01"))
                     & (F.col("l_shipdate") < F.lit("1997-01-01"))
                     & (F.col("l_discount").cast("decimal(18,4)")
                        .between(0.05, 0.07))
                     & (F.col("l_quantity") < 24))
            .agg(F.sum((price * disc).cast("decimal(28,6)"))
                 .cast("double").alias("revenue"),
                 F.count(F.lit(1)).alias("n_rows")))


Q6_FORECAST_REVENUE_SQL = """
SELECT CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                     * CAST(l_discount AS DECIMAL(18,4))
                     AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND CAST(l_discount AS DECIMAL(18,4)) BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""

EMA_ALPHA = 0.5


def user_value_ema_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EMA of value in (second, event_id) order — an inherently
    sequential fold executed as a JVM higher-order aggregate.

    Bound: collects each user's full sequence into one row — fine while
    max-events-per-user × struct size fits an executor's row budget (the
    testdata's worst key is ~10² events).  For skewed corpora use
    :func:`user_value_ema_segmented_df`, which never materializes more
    than one time-segment of one user per row."""
    from ..catalog import load_catalog
    from ..testbed import EVENTS

    ev = (load_catalog(spark, sf_dir, [EVENTS])["events"]
          .select("user_id", "event_id",
                  F.unix_timestamp("ts").alias("sec"),
                  F.col("value").cast("double").alias("v")))
    per_user = (ev.groupBy("user_id")
                .agg(F.sort_array(F.collect_list(
                    F.struct("sec", "event_id", "v"))).alias("seq")))
    ema = F.aggregate(
        F.col("seq"), F.lit(0.0),
        lambda acc, x: acc * (1 - EMA_ALPHA) + x["v"] * EMA_ALPHA)
    return per_user.select("user_id", F.size("seq").alias("n_events"),
                           F.round(ema, 6).alias("ema"))


USER_VALUE_EMA_SQL = f"""
SELECT user_id, CAST(len(seq) AS INT) AS n_events,
       round(list_reduce(list_prepend(0.0, seq),
                         (acc, v) -> acc * {1 - EMA_ALPHA} + v * {EMA_ALPHA}),
             6) AS ema
FROM (SELECT user_id,
             list(value ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
               AS seq
      FROM events GROUP BY user_id)
"""

def user_value_ema_segmented_df(spark: SparkSession, sf_dir: str,
                                segment_seconds: int = 86400) -> DataFrame:
    """Skew-bounded EMA: the same fold as :func:`user_value_ema_df`, but no
    row ever holds a user's full history.

    An EMA segment is an affine map ``acc -> acc*m + c`` with
    ``m = (1-α)^k`` and ``c`` the fold of the segment from 0 — and affine
    maps compose.  So: fold each (user, time-segment) group's bounded
    event list into (m, c), then fold the per-segment coefficients in
    segment order.  The first level bounds rows by events-per-segment
    (tune ``segment_seconds``); the second by the time range, independent
    of how hot a user is.  A hot key costs many small rows across
    partitions instead of one giant row on one executor."""
    from ..catalog import load_catalog
    from ..testbed import EVENTS

    ev = (load_catalog(spark, sf_dir, [EVENTS])["events"]
          .select("user_id", "event_id",
                  F.unix_timestamp("ts").alias("sec"),
                  F.col("value").cast("double").alias("v")))
    ev = ev.withColumn("seg", F.floor(F.col("sec") / segment_seconds))
    per_seg = (ev.groupBy("user_id", "seg")
               .agg(F.sort_array(F.collect_list(
                   F.struct("sec", "event_id", "v"))).alias("seq")))
    c = F.aggregate(
        F.col("seq"), F.lit(0.0),
        lambda acc, x: acc * (1 - EMA_ALPHA) + x["v"] * EMA_ALPHA)
    per_seg = per_seg.select(
        "user_id", "seg", F.size("seq").alias("n"), c.alias("c"),
        F.pow(F.lit(1 - EMA_ALPHA), F.size("seq")).alias("m"))
    per_user = (per_seg.groupBy("user_id")
                .agg(F.sum("n").alias("n_events"),
                     F.sort_array(F.collect_list(
                         F.struct("seg", "m", "c"))).alias("parts")))
    ema = F.aggregate(F.col("parts"), F.lit(0.0),
                      lambda acc, p: acc * p["m"] + p["c"])
    return per_user.select("user_id", "n_events", F.round(ema, 6).alias("ema"))


# the oracle mirrors the two-level fold exactly (same operation order =>
# identical IEEE doubles); the struct accumulator carries a dummy 'm'
USER_VALUE_EMA_SEGMENTED_SQL = f"""
WITH seg AS (
  SELECT user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS seg,
         list(value ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS seq
  FROM events GROUP BY 1, 2),
parts AS (
  SELECT user_id, seg, len(seq) AS n,
         list_reduce(list_prepend(0.0, seq),
                     (acc, v) -> acc * {1 - EMA_ALPHA} + v * {EMA_ALPHA}) AS c,
         pow({1 - EMA_ALPHA}, len(seq)) AS m
  FROM seg),
folded AS (
  SELECT user_id, CAST(sum(n) AS BIGINT) AS n_events,
         list_reduce(
           list_prepend({{'m': 1.0::DOUBLE, 'c': 0.0::DOUBLE}},
                        list({{'m': m, 'c': c}} ORDER BY seg)),
           (acc, x) -> {{'m': 1.0::DOUBLE, 'c': acc.c * x.m + x.c}}).c AS raw
  FROM parts GROUP BY user_id)
SELECT user_id, n_events, round(raw, 6) AS ema FROM folded
"""


# --- multi-join aggregations (Q3 / Q5 / Q10 shapes) --------------------------
#
# The three classic join-heavy TPC-H shapes, adapted to the testdata
# schema.  These are the queries whose PLANS matter most at 100 TB: the
# small sides broadcast, the one fact-sized join (orders ⋈ lineitem) is
# the single shuffle, aggregation is partial+final, and top-k is
# TakeOrderedAndProject (never a global sort).  All revenue arithmetic
# follows the q1/q6 decimal discipline so the DuckDB oracle hash-matches
# exactly; top-k orderings carry a unique tie-break key so LIMIT is
# deterministic across engines.
#
# Broadcast discipline: nation/region are constant-sized (25/5 rows at
# every SF) and may always broadcast, but customer and supplier GROW
# with scale factor — a forced F.broadcast on them OOMs at sf100+.  All
# hints below go through broadcast_if_small: under the size gate the
# hint applies (sf0.1's latency win), above it the join is unhinted and
# Catalyst/AQE degrade gracefully to a shuffle join (or convert back to
# broadcast at runtime if the FILTERED side turns out small).  Plan test:
# tests/test_plans.py::test_tpch_broadcast_gate_degrades.


def _revenue_cols():
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc_f = (1 - F.col("l_discount").cast("decimal(18,4)")).cast("decimal(8,4)")
    return (price * disc_f).cast("decimal(28,6)")


_REV_SQL = ("CAST(CAST(l_extendedprice AS DECIMAL(18,2))"
            " * CAST(1 - CAST(l_discount AS DECIMAL(18,4)) AS DECIMAL(8,4))"
            " AS DECIMAL(28,6))")


def q3_shipping_priority_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: revenue of not-yet-shipped orders for one market segment,
    top 10.  The filtered customer side broadcasts only while it is
    actually small (size-gated — customer scales with SF); the
    orders⋈lineitem join is the one shuffle, top-k is
    TakeOrderedAndProject."""
    cust = _rps(spark, f"{sf_dir}/customer.parquet")
    orders = _rps(spark, f"{sf_dir}/orders.parquet")
    li = _rps(spark, f"{sf_dir}/lineitem.parquet")
    cutoff = F.lit("1998-03-15").cast("timestamp")
    return (li.where(F.col("l_shipdate") > cutoff)
            .join(orders.where(F.col("o_orderdate") < cutoff),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .join(broadcast_if_small(
                      cust.where(F.col("c_mktsegment") == "BUILDING"),
                      size_path=f"{sf_dir}/customer.parquet"),
                  F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(F.round(F.sum(_revenue_cols()), 2).cast("double")
                 .alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("o_orderdate"),
                     F.asc("l_orderkey"))
            .limit(10))


Q3_SHIPPING_PRIORITY_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(round(sum({_REV_SQL}), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
"""


def q5_local_supplier_volume_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: per-nation revenue where supplier and customer share the
    nation, one region, one year.  nation⋈region is constant-sized and
    always broadcasts; supplier and customer scale with SF, so their
    hints are size-gated (above the gate the planner shuffles them — the
    orders⋈lineitem join is the one unavoidable fact-sized shuffle
    either way)."""
    cust = _rps(spark, f"{sf_dir}/customer.parquet")
    orders = _rps(spark, f"{sf_dir}/orders.parquet")
    li = _rps(spark, f"{sf_dir}/lineitem.parquet")
    supp = _rps(spark, f"{sf_dir}/supplier.parquet")
    nation = _rps(spark, f"{sf_dir}/nation.parquet")
    region = _rps(spark, f"{sf_dir}/region.parquet")
    nr = (nation.join(F.broadcast(region.where(F.col("r_name") == "ASIA")),
                      F.col("n_regionkey") == F.col("r_regionkey"))
          .select("n_nationkey", "n_name"))
    return (li.join(orders.where(
                (F.col("o_orderdate") >= F.lit("1996-01-01"))
                & (F.col("o_orderdate") < F.lit("1997-01-01"))),
                F.col("l_orderkey") == F.col("o_orderkey"))
            .join(broadcast_if_small(supp,
                                     size_path=f"{sf_dir}/supplier.parquet"),
                  F.col("l_suppkey") == F.col("s_suppkey"))
            .join(broadcast_if_small(cust,
                                     size_path=f"{sf_dir}/customer.parquet"),
                  (F.col("o_custkey") == F.col("c_custkey"))
                  & (F.col("c_nationkey") == F.col("s_nationkey")))
            .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy("n_name")
            .agg(F.round(F.sum(_revenue_cols()), 2).cast("double")
                 .alias("revenue"),
                 F.count(F.lit(1)).alias("n_items")))


Q5_LOCAL_SUPPLIER_VOLUME_SQL = f"""
SELECT n_name,
       CAST(round(sum({_REV_SQL}), 2) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


def q10_returned_items_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: top 20 customers by revenue lost to returns in one
    quarter, with their nation."""
    cust = _rps(spark, f"{sf_dir}/customer.parquet")
    orders = _rps(spark, f"{sf_dir}/orders.parquet")
    li = _rps(spark, f"{sf_dir}/lineitem.parquet")
    nation = _rps(spark, f"{sf_dir}/nation.parquet")
    return (li.where(F.col("l_returnflag") == "R")
            .join(orders.where(
                (F.col("o_orderdate") >= F.lit("1997-10-01"))
                & (F.col("o_orderdate") < F.lit("1998-01-01"))),
                F.col("l_orderkey") == F.col("o_orderkey"))
            .join(broadcast_if_small(cust,
                                     size_path=f"{sf_dir}/customer.parquet"),
                  F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(nation),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("c_custkey", "c_name", "n_name")
            .agg(F.round(F.sum(_revenue_cols()), 2).cast("double")
                 .alias("revenue"),
                 F.count(F.lit(1)).alias("n_returned"))
            .orderBy(F.desc("revenue"), F.asc("c_custkey"))
            .limit(20))


Q10_RETURNED_ITEMS_SQL = f"""
SELECT c_custkey, c_name, n_name,
       CAST(round(sum({_REV_SQL}), 2) AS DOUBLE) AS revenue,
       count(*) AS n_returned
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q4_order_priority_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: per-priority count of orders (one quarter) having at
    least one qualifying lineitem — the classic correlated EXISTS,
    decorrelated to a LEFT SEMI join.  (The testdata carries no
    commit/receipt dates, so the qualifying predicate is 'has a returned
    item'; the plan shape — pushed date filter, semi join on the FK, one
    agg shuffle — is the Q4 shape regardless.)"""
    orders = _rps(spark, f"{sf_dir}/orders.parquet")
    li = _rps(spark, f"{sf_dir}/lineitem.parquet")
    return (orders.where((F.col("o_orderdate") >= F.lit("1996-07-01"))
                         & (F.col("o_orderdate") < F.lit("1996-10-01")))
            .join(li.where(F.col("l_returnflag") == "R")
                  .select(F.col("l_orderkey").alias("o_orderkey")),
                  "o_orderkey", "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count")))


Q4_ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY 1
"""


Q7_NATION_A, Q7_NATION_B = "NATION_1", "NATION_2"


def q7_volume_shipping_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: trade volume between two nations in BOTH directions,
    grouped by (supplier nation, customer nation, ship year) — the
    classic OR-of-conjunctions join predicate.  The nation pair filter
    applies as a residual on broadcast nation lookups (constant-sized,
    always safe); supplier/customer route through the size gate; the
    orders⋈lineitem join is the one fact shuffle."""
    cust = _rps(spark, f"{sf_dir}/customer.parquet")
    orders = _rps(spark, f"{sf_dir}/orders.parquet")
    li = _rps(spark, f"{sf_dir}/lineitem.parquet")
    supp = _rps(spark, f"{sf_dir}/supplier.parquet")
    nation = _rps(spark, f"{sf_dir}/nation.parquet")
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"),
                       F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"),
                       F.col("n_name").alias("cust_nation"))
    pair = (((F.col("supp_nation") == Q7_NATION_A)
             & (F.col("cust_nation") == Q7_NATION_B))
            | ((F.col("supp_nation") == Q7_NATION_B)
               & (F.col("cust_nation") == Q7_NATION_A)))
    return (li.where((F.col("l_shipdate") >= F.lit("1996-01-01"))
                     & (F.col("l_shipdate") < F.lit("1998-01-01")))
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(broadcast_if_small(supp,
                                     size_path=f"{sf_dir}/supplier.parquet"),
                  F.col("l_suppkey") == F.col("s_suppkey"))
            .join(broadcast_if_small(cust,
                                     size_path=f"{sf_dir}/customer.parquet"),
                  F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
            .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
            .where(pair)
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").alias("l_year"))
            .agg(F.round(F.sum(_revenue_cols()), 2).cast("double")
                 .alias("revenue"),
                 F.count(F.lit(1)).alias("n_items")))


Q7_VOLUME_SHIPPING_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
       CAST(round(sum({_REV_SQL}), 2) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = '{Q7_NATION_A}' AND n2.n_name = '{Q7_NATION_B}')
    OR (n1.n_name = '{Q7_NATION_B}' AND n2.n_name = '{Q7_NATION_A}'))
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1, 2, 3
"""


Q18_QTY_THRESHOLD = 300


def q18_large_volume_customer_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: customers holding orders whose total quantity exceeds a
    threshold — the classic grouped-HAVING IN-subquery, decorrelated as a
    semi-join.  Scale shape: one partial+final agg over lineitem computes
    the qualifying keys (a tiny set — the threshold is deep in the tail),
    which BROADCASTS into the semi-join; the orders⋈lineitem join is the
    one fact shuffle; top-k is TakeOrderedAndProject."""
    cust = _rps(spark, f"{sf_dir}/customer.parquet")
    orders = _rps(spark, f"{sf_dir}/orders.parquet")
    li = _rps(spark, f"{sf_dir}/lineitem.parquet")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(qty).alias("__q"))
           .where(F.col("__q") > Q18_QTY_THRESHOLD)
           .select("l_orderkey"))
    return (li.join(F.broadcast(big), "l_orderkey", "left_semi")
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(broadcast_if_small(cust,
                                     size_path=f"{sf_dir}/customer.parquet"),
                  F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                     "o_totalprice")
            .agg(F.sum(qty).cast("double").alias("sum_qty"))
            .orderBy(F.desc("o_totalprice"), F.asc("o_orderdate"),
                     F.asc("o_orderkey"))
            .limit(100))


Q18_LARGE_VOLUME_CUSTOMER_SQL = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > {Q18_QTY_THRESHOLD})
GROUP BY 1, 2, 3, 4, 5
ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
LIMIT 100
"""


def q13_customer_distribution_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: distribution of customers by order count — the classic
    LEFT OUTER JOIN + COUNT over empty groups.  The trap this exercises:
    the order filter must live in the JOIN CONDITION, not a WHERE — a
    WHERE would silently drop the zero-order customers and the c_count=0
    bucket with them (the testdata has such a customer, so getting this
    wrong is hash-visible).  Scale shape: one shuffle joins both sides on
    custkey; the first groupBy(c_custkey) reuses that exchange's
    partitioning (no second shuffle); the outer groupBy(c_count) is
    distinct-order-count-sized, i.e. tiny."""
    cust = _rps(spark, f"{sf_dir}/customer.parquet")
    orders = _rps(spark, f"{sf_dir}/orders.parquet")
    per_cust = (cust.select("c_custkey")
                .join(orders.where(F.col("o_orderpriority") != "1-URGENT")
                      .select("o_custkey", "o_orderkey"),
                      F.col("c_custkey") == F.col("o_custkey"), "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist"))
            .orderBy(F.desc("custdist"), F.desc("c_count")))


Q13_CUSTOMER_DISTRIBUTION_SQL = """
SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q15_top_supplier_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: supplier(s) achieving the maximum quarterly revenue —
    the classic correlated scalar-MAX subquery over a derived aggregate,
    decorrelated as agg → 1-row max → broadcast compare (Catalyst plans
    the equality against the broadcast literal; ties all surface, exactly
    like the view-based original).  The revenue agg shuffles on suppkey
    once; everything downstream is supplier-cardinality-sized.  The
    equality compares EXACT decimals (sum of decimal(28,6)) — comparing
    rounded doubles would make tie detection engine-dependent."""
    li = _rps(spark, f"{sf_dir}/lineitem.parquet")
    supp = _rps(spark, f"{sf_dir}/supplier.parquet")
    rev = (li.where((F.col("l_shipdate") >= F.lit("1996-01-01"))
                    & (F.col("l_shipdate") < F.lit("1996-04-01")))
           .groupBy(F.col("l_suppkey").alias("supplier_no"))
           .agg(F.sum(_revenue_cols()).alias("__rev")))
    mx = rev.agg(F.max("__rev").alias("__mx"))
    return (rev.join(F.broadcast(mx), F.col("__rev") == F.col("__mx"))
            .join(broadcast_if_small(supp,
                                     size_path=f"{sf_dir}/supplier.parquet"),
                  F.col("supplier_no") == F.col("s_suppkey"))
            .select("s_suppkey", "s_name",
                    F.round("__rev", 2).cast("double").alias("total_revenue"))
            .orderBy("s_suppkey"))


Q15_TOP_SUPPLIER_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, sum({_REV_SQL}) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY 1)
SELECT s_suppkey, s_name,
       CAST(round(total_revenue, 2) AS DOUBLE) AS total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


Q21_REGION = "ASIA"


def q21_suppliers_kept_waiting_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers who were the SOLE late supplier on a
    multi-supplier finished order — the classic EXISTS + NOT EXISTS
    double correlation on the same key, decorrelated as a LEFT SEMI and
    a LEFT ANTI join against the same lineitem relation.  (The testdata
    has no commit/receipt dates; 'late' is adapted to l_returnflag='R',
    which preserves both correlation shapes.)  Scale shape: the
    semi/anti probes join on orderkey with the suppkey inequality as a
    residual — equi hash joins, never a cartesian (plan-tested); the
    supplier/nation/region chain rides broadcast lookups exactly like
    Q5's."""
    li = _rps(spark, f"{sf_dir}/lineitem.parquet")
    orders = _rps(spark, f"{sf_dir}/orders.parquet")
    supp = _rps(spark, f"{sf_dir}/supplier.parquet")
    nation = _rps(spark, f"{sf_dir}/nation.parquet")
    region = _rps(spark, f"{sf_dir}/region.parquet")
    l1 = (li.where(F.col("l_returnflag") == "R")
          .select("l_orderkey", "l_suppkey").alias("l1"))
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (li.where(F.col("l_returnflag") == "R")
          .select("l_orderkey", "l_suppkey").alias("l3"))
    nr = (nation.join(F.broadcast(region.where(F.col("r_name") == Q21_REGION)),
                      F.col("n_regionkey") == F.col("r_regionkey"))
          .select("n_nationkey"))
    return (l1
            .join(orders.where(F.col("o_orderstatus") == "F")
                  .select("o_orderkey"),
                  F.col("l1.l_orderkey") == F.col("o_orderkey"))
            .join(l2, (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
                  & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
                  "left_semi")
            .join(l3, (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
                  & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
                  "left_anti")
            .join(broadcast_if_small(supp,
                                     size_path=f"{sf_dir}/supplier.parquet"),
                  F.col("l1.l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"),
                  "left_semi")
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.desc("numwait"), F.asc("s_name"))
            .limit(100))


Q21_SUPPLIERS_KEPT_WAITING_SQL = f"""
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders   ON o_orderkey = l1.l_orderkey
JOIN supplier ON s_suppkey = l1.l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN region   ON r_regionkey = n_regionkey
WHERE o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND r_name = '{Q21_REGION}'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 100
"""


# Q22's "country codes": the testdata customer has no phone column, so
# the substring-code set adapts to a nationkey set (same IN-set shape)
Q22_CODES = tuple(range(13))
Q22_CUTOFF = "2000-01-01"


def q22_global_sales_opportunity_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: customers from a code set with above-average positive
    balances and no recent orders — a scalar-AVG subquery plus a
    correlated NOT EXISTS (anti join).  (Adapted: nationkey set for the
    phone-prefix codes; 'no orders at all' relaxed to 'no orders since
    {Q22_CUTOFF}' because every testdata customer has orders.)  The
    average is compared as ``c_acctbal * cnt > total`` in EXACT decimal
    arithmetic — dividing first would put an engine-dependent double on
    the threshold boundary.  Scale shape: the 1-row aggregate broadcasts
    into the filter; the anti join's order side carries its date filter
    down to the scan; one shuffle on custkey."""
    cust = _rps(spark, f"{sf_dir}/customer.parquet")
    orders = _rps(spark, f"{sf_dir}/orders.parquet")
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    sel = cust.where(F.col("c_nationkey").isin(*Q22_CODES))
    pos = (sel.where(F.col("c_acctbal") > 0)
           .agg(F.sum(bal).alias("__total"),
                F.count(F.lit(1)).cast("decimal(12,0)").alias("__cnt")))
    return (sel.join(F.broadcast(pos), bal * F.col("__cnt") > F.col("__total"))
            .join(orders.where(F.col("o_orderdate") >= F.lit(Q22_CUTOFF))
                  .select(F.col("o_custkey").alias("c_custkey")),
                  "c_custkey", "left_anti")
            .groupBy(F.col("c_nationkey").alias("cntrycode"))
            .agg(F.count(F.lit(1)).alias("numcust"),
                 F.sum(bal).cast("double").alias("totacctbal")))


Q22_GLOBAL_SALES_OPPORTUNITY_SQL = f"""
WITH pos AS (
  SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS total,
         CAST(count(*) AS DECIMAL(12,0)) AS cnt
  FROM customer
  WHERE c_nationkey IN {Q22_CODES} AND c_acctbal > 0)
SELECT c_nationkey AS cntrycode, count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer, pos
WHERE c_nationkey IN {Q22_CODES}
  AND CAST(c_acctbal AS DECIMAL(18,2)) * cnt > total
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '{Q22_CUTOFF} 00:00:00')
GROUP BY 1
"""


def q14_promo_effect_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: conditional (CASE) aggregation over a fact⋈dim join —
    promo revenue share for one ship month.  The part side routes
    through the size gate; numerator and denominator are exact decimal
    sums, and the share divides them only AFTER both are rounded to
    identical doubles, so the division is the same IEEE operation in
    both engines (dividing raw decimals would hit engine-specific
    decimal-division scale rules)."""
    li = _rps(spark, f"{sf_dir}/lineitem.parquet")
    part = _rps(spark, f"{sf_dir}/part.parquet")
    promo = F.when(F.col("p_type") == "PROMO", _revenue_cols()) \
             .otherwise(F.lit(0).cast("decimal(28,6)"))
    out = (li.where((F.col("l_shipdate") >= F.lit("1996-03-01"))
                    & (F.col("l_shipdate") < F.lit("1996-04-01")))
           .join(broadcast_if_small(part.select("p_partkey", "p_type"),
                                    size_path=f"{sf_dir}/part.parquet"),
                 F.col("l_partkey") == F.col("p_partkey"))
           .agg(F.round(F.sum(promo), 2).cast("double")
                .alias("promo_revenue"),
                F.round(F.sum(_revenue_cols()), 2).cast("double")
                .alias("total_revenue")))
    return out.select(
        "promo_revenue", "total_revenue",
        F.round(F.col("promo_revenue") * 100.0 / F.col("total_revenue"), 6)
        .alias("promo_pct"))


Q14_PROMO_EFFECT_SQL = f"""
WITH agg AS (
  SELECT CAST(round(sum(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL}
                             ELSE CAST(0 AS DECIMAL(28,6)) END), 2) AS DOUBLE)
           AS promo_revenue,
         CAST(round(sum({_REV_SQL}), 2) AS DOUBLE) AS total_revenue
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00')
SELECT promo_revenue, total_revenue,
       round(promo_revenue * 100.0 / total_revenue, 6) AS promo_pct
FROM agg
"""


Q17_BRAND = "Brand#9"


def q17_small_quantity_revenue_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: revenue from orders of less than 20% of a part's
    average quantity — the classic PER-KEY correlated scalar-AVG
    subquery, decorrelated as a per-partkey aggregate joined back to
    lineitem (distinct from Q22's uncorrelated scalar: here the subquery
    re-aggregates the probe side itself, so Catalyst must plan lineitem
    twice with one agg+join, never a per-row subquery).  The threshold
    compares ``l_quantity * cnt * 5 < sum_qty`` in EXACT decimals — the
    algebraic form of ``q < 0.2 * avg`` that avoids an order-dependent
    double average on the boundary."""
    li = _rps(spark, f"{sf_dir}/lineitem.parquet")
    part = _rps(spark, f"{sf_dir}/part.parquet")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    per_part = (li.groupBy(F.col("l_partkey").alias("pk"))
                .agg(F.sum(qty).alias("sum_qty"),
                     F.count(F.lit(1)).cast("decimal(12,0)").alias("cnt")))
    return (li
            .join(broadcast_if_small(
                      part.where(F.col("p_brand") == Q17_BRAND)
                          .select("p_partkey"),
                      size_path=f"{sf_dir}/part.parquet"),
                  F.col("l_partkey") == F.col("p_partkey"))
            .join(per_part, F.col("l_partkey") == F.col("pk"))
            .where(qty * F.col("cnt") * F.lit(5) < F.col("sum_qty"))
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               .cast("decimal(18,2)")), 2).cast("double")
                 .alias("small_qty_revenue"),
                 F.count(F.lit(1)).alias("n_rows")))


Q17_SMALL_QUANTITY_REVENUE_SQL = f"""
WITH per_part AS (
  SELECT l_partkey AS pk,
         sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
         CAST(count(*) AS DECIMAL(12,0)) AS cnt
  FROM lineitem GROUP BY 1)
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS small_qty_revenue,
       count(*) AS n_rows
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN per_part ON l_partkey = pk
WHERE p_brand = '{Q17_BRAND}'
  AND CAST(l_quantity AS DECIMAL(18,2)) * cnt * 5 < sum_qty
"""


Q12_LATE_DAYS = 60          # ship lag that counts as "late"
Q12_HIGH = ("1-URGENT", "2-HIGH")


def q12_late_shipments_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape (shipping modes and order priority): per shipping
    class, count late-shipped lines split into high- vs low-priority —
    the canonical conditional aggregation keyed on a comparison of TWO
    date columns from the two joined tables.

    The driver testdata carries no ``l_shipmode`` / ``l_commitdate`` /
    ``l_receiptdate``, so the shape is mapped onto existing columns
    (documented per the r07 VERDICT item 6): ``l_shipmode`` →
    ``l_linestatus`` (the mode-like categorical on lineitem);
    "commit missed" (``l_commitdate < l_receiptdate``) → ship lag ≥ 60
    days (``l_shipdate`` vs ``o_orderdate`` — still a cross-table
    timestamp comparison, which is the defining predicate: it can only
    be a RESIDUAL on the equi join, never a pushed scan filter);
    ``l_receiptdate`` year window → ``l_shipdate`` year window (this
    one DOES push to the lineitem scan).  The lag compares epoch
    seconds as exact integers, so both engines decide "late" with the
    same arithmetic.

    Scale shape: one equi-join on the FK (hash or SMJ — both sides
    fact-sized, the single unavoidable shuffle), conditional agg with
    map-side partials, 2-row final agg."""
    li = _rps(spark, f"{sf_dir}/lineitem.parquet")
    orders = _rps(spark, f"{sf_dir}/orders.parquet")
    lag = (F.unix_timestamp("l_shipdate")
           - F.unix_timestamp("o_orderdate"))
    hi = F.col("o_orderpriority").isin(*Q12_HIGH)
    return (li.where((F.col("l_shipdate") >= F.lit("1996-01-01"))
                     & (F.col("l_shipdate") < F.lit("1997-01-01")))
            .join(orders.select("o_orderkey", "o_orderdate",
                                "o_orderpriority"),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .where(lag >= Q12_LATE_DAYS * 86400)
            .groupBy(F.col("l_linestatus").alias("ship_class"))
            .agg(F.sum(F.when(hi, 1).otherwise(0)).cast("long")
                 .alias("high_line_count"),
                 F.sum(F.when(hi, 0).otherwise(1)).cast("long")
                 .alias("low_line_count"))
            .orderBy("ship_class"))


Q12_LATE_SHIPMENTS_SQL = f"""
SELECT l_linestatus AS ship_class,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND epoch(l_shipdate) - epoch(o_orderdate) >= {Q12_LATE_DAYS} * 86400
GROUP BY 1 ORDER BY 1
"""


Q8_NATION, Q8_REGION, Q8_TYPE = "NATION_8", "ASIA", "ECONOMY"


def q8_national_market_share_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape (national market share): one nation's share of a
    region's yearly import volume for one part type — the largest join
    tree in TPC-H (part ⋈ supplier ⋈ lineitem ⋈ orders ⋈ customer ⋈
    nation×2 ⋈ region, with nation playing BOTH roles: n1 restricts the
    customer's region, n2 names the supplier's nation for the CASE).

    Scale shape: every dimension is either constant-sized
    (nation/region — always broadcast) or size-gated
    (part/supplier/customer — broadcast under the gate, shuffle above
    it); the selective part-type filter rides the broadcast into
    lineitem, so the probe side shrinks before the one unavoidable
    fact-sized exchange (lineitem ⋈ orders).  lineitem itself is never
    sort-merged at dim joins (plan-tested).  Share arithmetic follows
    the q14 discipline: numerator and denominator are exact decimal
    sums rounded to identical doubles BEFORE the one IEEE division."""
    li = _rps(spark, f"{sf_dir}/lineitem.parquet")
    part = _rps(spark, f"{sf_dir}/part.parquet")
    supp = _rps(spark, f"{sf_dir}/supplier.parquet")
    orders = _rps(spark, f"{sf_dir}/orders.parquet")
    cust = _rps(spark, f"{sf_dir}/customer.parquet")
    nation = _rps(spark, f"{sf_dir}/nation.parquet")
    region = _rps(spark, f"{sf_dir}/region.parquet")
    n1 = (nation.join(F.broadcast(region.where(F.col("r_name") == Q8_REGION)),
                      F.col("n_regionkey") == F.col("r_regionkey"))
          .select(F.col("n_nationkey").alias("n1_key")))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"),
                       F.col("n_name").alias("supp_nation"))
    nation_vol = F.when(F.col("supp_nation") == Q8_NATION, _revenue_cols()) \
                  .otherwise(F.lit(0).cast("decimal(28,6)"))
    out = (li.join(broadcast_if_small(
                       part.where(F.col("p_type") == Q8_TYPE)
                           .select("p_partkey"),
                       size_path=f"{sf_dir}/part.parquet"),
                   F.col("l_partkey") == F.col("p_partkey"))
           .join(orders.where(
                     (F.col("o_orderdate") >= F.lit("1995-01-01"))
                     & (F.col("o_orderdate") < F.lit("1997-01-01"))),
                 F.col("l_orderkey") == F.col("o_orderkey"))
           .join(broadcast_if_small(supp.select("s_suppkey", "s_nationkey"),
                                    size_path=f"{sf_dir}/supplier.parquet"),
                 F.col("l_suppkey") == F.col("s_suppkey"))
           .join(broadcast_if_small(cust.select("c_custkey", "c_nationkey"),
                                    size_path=f"{sf_dir}/customer.parquet"),
                 F.col("o_custkey") == F.col("c_custkey"))
           .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"),
                 "left_semi")
           .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
           .groupBy(F.year("o_orderdate").alias("o_year"))
           .agg(F.round(F.sum(nation_vol), 2).cast("double")
                .alias("nation_volume"),
                F.round(F.sum(_revenue_cols()), 2).cast("double")
                .alias("total_volume")))
    return (out.select("o_year", "nation_volume", "total_volume",
                       F.round(F.col("nation_volume")
                               / F.col("total_volume"), 6)
                       .alias("mkt_share"))
            .orderBy("o_year"))


Q8_NATIONAL_MARKET_SHARE_SQL = f"""
WITH agg AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
         CAST(round(sum(CASE WHEN n2.n_name = '{Q8_NATION}' THEN {_REV_SQL}
                             ELSE CAST(0 AS DECIMAL(28,6)) END), 2) AS DOUBLE)
           AS nation_volume,
         CAST(round(sum({_REV_SQL}), 2) AS DOUBLE) AS total_volume
  FROM lineitem
  JOIN part      ON l_partkey = p_partkey
  JOIN orders    ON l_orderkey = o_orderkey
  JOIN supplier  ON l_suppkey = s_suppkey
  JOIN customer  ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = '{Q8_REGION}' AND p_type = '{Q8_TYPE}'
    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY 1)
SELECT o_year, nation_volume, total_volume,
       round(nation_volume / total_volume, 6) AS mkt_share
FROM agg ORDER BY o_year
"""


Q19_BRACKETS = (("Brand#1", 1, 15, 1, 11),
                ("Brand#2", 1, 25, 10, 20),
                ("Brand#3", 1, 35, 20, 30))


def q19_discounted_revenue_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: disjunction of conjunctive brackets over a fact⋈dim
    join — Catalyst must still extract the common ``l_partkey =
    p_partkey`` equi condition into a hash join and evaluate only the
    OR-of-ANDs as a residual (a naive planner degenerates to a nested
    loop; plan-tested not to)."""
    li = _rps(spark, f"{sf_dir}/lineitem.parquet")
    part = _rps(spark, f"{sf_dir}/part.parquet")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    bracket = None
    for brand, s_lo, s_hi, q_lo, q_hi in Q19_BRACKETS:
        b = ((F.col("p_brand") == brand)
             & F.col("p_size").between(s_lo, s_hi)
             & qty.between(q_lo, q_hi))
        bracket = b if bracket is None else (bracket | b)
    return (li.join(broadcast_if_small(
                        part.select("p_partkey", "p_brand", "p_size"),
                        size_path=f"{sf_dir}/part.parquet"),
                    (F.col("l_partkey") == F.col("p_partkey")) & bracket)
            .agg(F.round(F.sum(_revenue_cols()), 2).cast("double")
                 .alias("revenue"),
                 F.count(F.lit(1)).alias("n_items")))


def _q19_sql() -> str:
    ors = " OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi} "
        f"AND CAST(l_quantity AS DECIMAL(18,2)) BETWEEN {qlo} AND {qhi})"
        for b, slo, shi, qlo, qhi in Q19_BRACKETS)
    return f"""
SELECT CAST(round(sum({_REV_SQL}), 2) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE {ors}
"""


Q19_DISCOUNTED_REVENUE_SQL = _q19_sql()


# --- partsupp-mapped decorrelation shapes (Q2 / Q9 / Q11 / Q16 / Q20) -------
#
# The driver testdata carries no ``partsupp`` table, so the five TPC-H
# shapes that need one are mapped onto a pair table DERIVED from
# lineitem (documented per the r08/r09 VERDICT item: same join/subquery
# structure, existing columns):
#
#   partsupp              → distinct (l_partkey, l_suppkey) observed pairs
#   ps_supplycost         → min unit price min(l_extendedprice/l_quantity)
#                           (min over IEEE-double divisions — exact and
#                           order-independent in both engines)
#   ps_availqty           → sum of l_quantity per pair as DECIMAL(18,2)
#                           (exact decimal sum, so threshold comparisons
#                           hash-match; q20 uses the per-year split)
#
# Scale shape shared by all five: the pair table is ONE groupBy over
# lineitem on (l_partkey, l_suppkey) — the same key prefix a bucketed
# lineitem layout co-locates — and every decorrelated "scalar subquery"
# becomes a groupBy + join-back on the group key, never a per-row
# re-scan.  Dimension joins ride broadcast_if_small like the rest of
# this module.


def _pair_costs(li: DataFrame) -> DataFrame:
    """The derived-partsupp cost table: (ps_partkey, ps_suppkey,
    ps_supplycost) — one shuffle on the pair key."""
    return (li.groupBy(F.col("l_partkey").alias("ps_partkey"),
                       F.col("l_suppkey").alias("ps_suppkey"))
            .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
                 .alias("ps_supplycost")))


_PAIR_COSTS_CTE = """
pairs AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         min(l_extendedprice / l_quantity) AS ps_supplycost
  FROM lineitem GROUP BY 1, 2)
"""

Q2_REGION = "EUROPE"
Q2_SIZE_LO, Q2_SIZE_HI = 10, 20
Q2_TYPE = "STANDARD"


def q2_min_cost_region_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape (minimum-cost supplier): for each part of one size band
    and type, the supplier(s) in one region achieving the MINIMUM
    supply cost — the canonical correlated scalar-min subquery
    (``ps_supplycost = (SELECT min(..) WHERE ps_partkey = p_partkey
    AND region)``) decorrelated into a groupBy-min over the
    region-restricted pair table + an equi join back on
    (part, cost = min_cost).

    The min-cost join-back key includes the DOUBLE cost — safe because
    both sides carry the identical IEEE value (the min of the same
    division results), never recomputed arithmetic.  Scale shape: the
    pair table is the one fact-sized shuffle; supplier rides the size
    gate; nation/region always broadcast; the part filter semi-joins
    the pair table BEFORE the min groupBy (legal: the min is per-part,
    so restricting parts early never changes a surviving group);
    top-100 is TakeOrderedAndProject with a unique
    (s_name, p_partkey) tie-break."""
    li = _rps(spark, f"{sf_dir}/lineitem.parquet")
    supp = _rps(spark, f"{sf_dir}/supplier.parquet")
    nation = _rps(spark, f"{sf_dir}/nation.parquet")
    region = _rps(spark, f"{sf_dir}/region.parquet")
    part = _rps(spark, f"{sf_dir}/part.parquet")
    part_f = part.where(F.col("p_size").between(Q2_SIZE_LO, Q2_SIZE_HI)
                        & (F.col("p_type") == Q2_TYPE)) \
                 .select("p_partkey", "p_name")
    eu_nations = (nation
                  .join(F.broadcast(region.where(F.col("r_name") == Q2_REGION)),
                        F.col("n_regionkey") == F.col("r_regionkey"))
                  .select("n_nationkey", "n_name"))
    eligible = (_pair_costs(li)
                .join(broadcast_if_small(part_f.select("p_partkey"),
                                         size_path=f"{sf_dir}/part.parquet"),
                      F.col("ps_partkey") == F.col("p_partkey"), "left_semi")
                .join(broadcast_if_small(
                          supp.select("s_suppkey", "s_name", "s_acctbal",
                                      "s_nationkey"),
                          size_path=f"{sf_dir}/supplier.parquet"),
                      F.col("ps_suppkey") == F.col("s_suppkey"))
                .join(F.broadcast(eu_nations),
                      F.col("s_nationkey") == F.col("n_nationkey")))
    minc = (eligible.groupBy(F.col("ps_partkey").alias("mk"))
            .agg(F.min("ps_supplycost").alias("min_cost")))
    return (eligible
            .join(minc, (F.col("ps_partkey") == F.col("mk"))
                  & (F.col("ps_supplycost") == F.col("min_cost")))
            .join(broadcast_if_small(part_f,
                                     size_path=f"{sf_dir}/part.parquet"),
                  F.col("ps_partkey") == F.col("p_partkey"))
            .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
                    F.round("ps_supplycost", 6).alias("supply_cost"))
            .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
            .limit(100))


Q2_MIN_COST_REGION_SQL = f"""
WITH {_PAIR_COSTS_CTE.strip()},
eligible AS (
  SELECT ps_partkey, ps_suppkey, ps_supplycost, s_acctbal, s_name, n_name
  FROM pairs
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{Q2_REGION}'),
minc AS (
  SELECT ps_partkey AS mk, min(ps_supplycost) AS min_cost
  FROM eligible GROUP BY 1)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       round(ps_supplycost, 6) AS supply_cost
FROM eligible
JOIN minc ON ps_partkey = mk AND ps_supplycost = min_cost
JOIN part ON ps_partkey = p_partkey
WHERE p_size BETWEEN {Q2_SIZE_LO} AND {Q2_SIZE_HI} AND p_type = '{Q2_TYPE}'
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""

Q9_NAME_PAT = "widget"      # p_name substring (the Q9 '%green%' role)
Q9_COST_FACTOR = "0.6"      # retail-to-cost proxy, exact DECIMAL(2,1)


def q9_product_profit_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape (product-type profit): per supplier nation per order
    year, total profit = revenue − supply cost across a 5-table join
    tree, for parts whose name matches a substring — the classic
    computed-measure rollup over the largest non-Q8 join tree.

    ``ps_supplycost × l_quantity`` is mapped to
    ``p_retailprice × 0.6 × l_quantity`` (the testdata carries no
    partsupp; p_retailprice is the only cost-like part attribute).
    All arithmetic is exact decimal — revenue decimal(28,6) minus cost
    decimal(28,5) (retail(12,2) × qty(12,2) → (25,4), × 0.6(2,1) →
    (28,5)) stays inside precision 38 through the sum, rounded to 2
    BEFORE the one double cast, per the q1/q14 discipline.

    Scale shape: the name-filtered part side rides the broadcast gate
    into lineitem (probe shrinks before any exchange), supplier is
    size-gated, nation broadcast; lineitem ⋈ orders is the single
    fact-sized shuffle; the rollup is partial+final on (nation, year)."""
    li = _rps(spark, f"{sf_dir}/lineitem.parquet")
    part = _rps(spark, f"{sf_dir}/part.parquet")
    supp = _rps(spark, f"{sf_dir}/supplier.parquet")
    nation = _rps(spark, f"{sf_dir}/nation.parquet")
    orders = _rps(spark, f"{sf_dir}/orders.parquet")
    cost = (F.col("p_retailprice").cast("decimal(12,2)")
            * F.col("l_quantity").cast("decimal(12,2)")) \
        .cast("decimal(25,4)") * F.lit(0.6).cast("decimal(2,1)")
    return (li.join(broadcast_if_small(
                        part.where(F.col("p_name").contains(Q9_NAME_PAT))
                            .select("p_partkey", "p_retailprice"),
                        size_path=f"{sf_dir}/part.parquet"),
                    F.col("l_partkey") == F.col("p_partkey"))
            .join(broadcast_if_small(supp.select("s_suppkey", "s_nationkey"),
                                     size_path=f"{sf_dir}/supplier.parquet"),
                  F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .join(orders.select("o_orderkey", "o_orderdate"),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("o_orderdate").alias("o_year"))
            .agg(F.round(F.sum(_revenue_cols() - cost), 2).cast("double")
                 .alias("profit"))
            .orderBy("nation", F.desc("o_year")))


Q9_PRODUCT_PROFIT_SQL = f"""
SELECT n_name AS nation, CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       CAST(round(sum(
         {_REV_SQL}
         - CAST(CAST(p_retailprice AS DECIMAL(12,2))
                * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(25,4))
           * CAST({Q9_COST_FACTOR} AS DECIMAL(2,1))
       ), 2) AS DOUBLE) AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%{Q9_NAME_PAT}%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""

Q11_NATION = "NATION_3"
Q11_SHARE_DENOM = 1000      # keep parts with value > total/1000


def q11_important_stock_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape (important stock): per-part inventory value restricted
    to one nation's suppliers, keeping parts whose value exceeds a
    FRACTION OF THE GRAND TOTAL — the canonical group-share-of-total
    HAVING with an uncorrelated scalar subquery.

    Inventory value is mapped to the exact decimal sum of
    l_extendedprice over the nation's lineitems (no partsupp).  The
    share threshold compares ``value × 1000 > total`` in EXACT decimal
    (no 0.0001-style literal whose decimal scale each engine might
    type differently).  Scale shape: ONE groupBy over the
    nation-filtered fact produces the per-part values; the grand total
    re-aggregates THOSE group rows (parts-sized, not fact-sized) and
    joins back as a broadcast single row — the scalar subquery costs
    one extra reduce over group rows, never a second fact scan."""
    li = _rps(spark, f"{sf_dir}/lineitem.parquet")
    supp = _rps(spark, f"{sf_dir}/supplier.parquet")
    nation = _rps(spark, f"{sf_dir}/nation.parquet")
    nat_supp = (supp.join(F.broadcast(
                              nation.where(F.col("n_name") == Q11_NATION)),
                          F.col("s_nationkey") == F.col("n_nationkey"))
                .select("s_suppkey"))
    val = (li.join(broadcast_if_small(nat_supp,
                                      size_path=f"{sf_dir}/supplier.parquet"),
                   F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
           .groupBy(F.col("l_partkey").alias("ps_partkey"))
           .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .alias("v")))
    total = val.agg(F.sum("v").alias("total"))
    return (val.crossJoin(F.broadcast(total))
            .where(F.col("v") * Q11_SHARE_DENOM > F.col("total"))
            .select("ps_partkey", F.col("v").cast("double").alias("part_value"))
            .orderBy(F.desc("part_value"), "ps_partkey"))


Q11_IMPORTANT_STOCK_SQL = f"""
WITH val AS (
  SELECT l_partkey AS ps_partkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS v
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = '{Q11_NATION}'
  GROUP BY 1),
tot AS (SELECT sum(v) AS total FROM val)
SELECT ps_partkey, CAST(v AS DOUBLE) AS part_value
FROM val, tot
WHERE v * {Q11_SHARE_DENOM} > total
ORDER BY part_value DESC, ps_partkey
"""

Q16_EXCL_BRAND = "Brand#1"
Q16_EXCL_TYPE = "PROMO"
Q16_SIZES = (1, 4, 9, 14, 23, 36, 45, 49)


def q16_supplier_part_counts_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape (supplier-part counts): distinct suppliers per
    (brand, type, size) over the pair table, EXCLUDING one brand, one
    type, and every supplier in a NOT-IN subquery — the canonical
    count-distinct + negated-membership pattern.

    The "customer complaints" supplier exclusion is mapped to negative
    account balance (s_acctbal < 0 — the only complaint-like supplier
    attribute).  The NOT IN decorrelates to a LEFT ANTI join (legal:
    s_suppkey is never NULL, so NOT-IN three-valued-logic never
    differs).  Scale shape: the distinct pair projection is the one
    fact shuffle (two narrow int64 columns); part and the (tiny)
    excluded-supplier list both broadcast; countDistinct re-shuffles
    only pair-table-sized rows on the 3-attribute group key."""
    li = _rps(spark, f"{sf_dir}/lineitem.parquet")
    part = _rps(spark, f"{sf_dir}/part.parquet")
    supp = _rps(spark, f"{sf_dir}/supplier.parquet")
    ps = (li.select(F.col("l_partkey").alias("ps_partkey"),
                    F.col("l_suppkey").alias("ps_suppkey"))
          .distinct())
    part_f = part.where((F.col("p_brand") != Q16_EXCL_BRAND)
                        & (F.col("p_type") != Q16_EXCL_TYPE)
                        & F.col("p_size").isin(*Q16_SIZES)) \
                 .select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = supp.where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (ps.join(broadcast_if_small(part_f,
                                       size_path=f"{sf_dir}/part.parquet"),
                    F.col("ps_partkey") == F.col("p_partkey"))
            .join(broadcast_if_small(bad_supp,
                                     size_path=f"{sf_dir}/supplier.parquet"),
                  F.col("ps_suppkey") == F.col("s_suppkey"), "left_anti")
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
            .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size"))


Q16_SUPPLIER_PART_COUNTS_SQL = f"""
WITH ps AS (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
            FROM lineitem)
SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
FROM ps JOIN part ON ps_partkey = p_partkey
WHERE p_brand <> '{Q16_EXCL_BRAND}' AND p_type <> '{Q16_EXCL_TYPE}'
  AND p_size IN {Q16_SIZES}
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

Q20_NATION = "NATION_3"   # nonzero result at every SF incl. the
                          # driver's sf0.001 smoke (NATION_7 was empty
                          # there)
Q20_NAME_PREFIX = "small"
Q20_YEAR_LO, Q20_YEAR_HI = "1996-01-01", "1997-01-01"


def q20_surplus_suppliers_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape (surplus suppliers): suppliers in one nation holding a
    part (name-prefix filtered) whose availability exceeds half a
    year's shipped quantity — the canonical DOUBLY-nested IN with a
    correlated half-sum threshold subquery.

    Mapping: with no ps_availqty, the threshold inverts to "the pair's
    target-year shipped quantity exceeds half its all-time quantity"
    — same nested structure (supplier IN (pairs WHERE part
    IN (filtered parts) AND correlated-sum comparison)), computed from
    one grouped pass with a conditional year split.  The half-sum
    comparison is ``qty_year × 2 > qty_all`` in exact decimal (integer
    doubling, no 0.5 literal).  Scale shape: one pair-key groupBy over
    lineitem (the single fact shuffle) with the part-name semi-join
    pushed BEFORE it; both IN memberships decorrelate to semi joins;
    supplier/nation broadcast."""
    li = _rps(spark, f"{sf_dir}/lineitem.parquet")
    part = _rps(spark, f"{sf_dir}/part.parquet")
    supp = _rps(spark, f"{sf_dir}/supplier.parquet")
    nation = _rps(spark, f"{sf_dir}/nation.parquet")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    in_year = (F.col("l_shipdate") >= F.lit(Q20_YEAR_LO)) \
        & (F.col("l_shipdate") < F.lit(Q20_YEAR_HI))
    surplus = (li.join(broadcast_if_small(
                           part.where(F.col("p_name")
                                      .startswith(Q20_NAME_PREFIX))
                               .select("p_partkey"),
                           size_path=f"{sf_dir}/part.parquet"),
                       F.col("l_partkey") == F.col("p_partkey"), "left_semi")
               .groupBy(F.col("l_partkey").alias("pk"),
                        F.col("l_suppkey").alias("sk"))
               .agg(F.sum(qty).alias("qty_all"),
                    F.sum(F.when(in_year, qty)
                          .otherwise(F.lit(0).cast("decimal(18,2)")))
                    .alias("qty_year"))
               .where(F.col("qty_year") * 2 > F.col("qty_all"))
               .select("sk").distinct())
    return (supp.join(F.broadcast(
                          nation.where(F.col("n_name") == Q20_NATION)),
                      F.col("s_nationkey") == F.col("n_nationkey"))
            .join(surplus, F.col("s_suppkey") == F.col("sk"), "left_semi")
            .select("s_name", "s_acctbal")
            .orderBy("s_name"))


Q20_SURPLUS_SUPPLIERS_SQL = f"""
WITH yearq AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty_all,
         sum(CASE WHEN l_shipdate >= TIMESTAMP '{Q20_YEAR_LO} 00:00:00'
                   AND l_shipdate <  TIMESTAMP '{Q20_YEAR_HI} 00:00:00'
                  THEN CAST(l_quantity AS DECIMAL(18,2))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS qty_year
  FROM lineitem GROUP BY 1, 2),
surplus AS (
  SELECT DISTINCT sk FROM yearq
  WHERE pk IN (SELECT p_partkey FROM part
               WHERE p_name LIKE '{Q20_NAME_PREFIX}%')
    AND qty_year * 2 > qty_all)
SELECT s_name, s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = '{Q20_NATION}' AND s_suppkey IN (SELECT sk FROM surplus)
ORDER BY s_name
"""


TPCH_QUERIES: dict[str, tuple] = {
    "q1_pricing_summary": (q1_pricing_summary_df, Q1_PRICING_SUMMARY_SQL),
    "q3_shipping_priority": (q3_shipping_priority_df, Q3_SHIPPING_PRIORITY_SQL),
    "q5_local_supplier_volume": (q5_local_supplier_volume_df,
                                 Q5_LOCAL_SUPPLIER_VOLUME_SQL),
    "q6_forecast_revenue": (q6_forecast_revenue_df, Q6_FORECAST_REVENUE_SQL),
    "q10_returned_items": (q10_returned_items_df, Q10_RETURNED_ITEMS_SQL),
    "q18_large_volume_customer": (q18_large_volume_customer_df,
                                  Q18_LARGE_VOLUME_CUSTOMER_SQL),
    "q7_volume_shipping": (q7_volume_shipping_df, Q7_VOLUME_SHIPPING_SQL),
    "q4_order_priority": (q4_order_priority_df, Q4_ORDER_PRIORITY_SQL),
    "q13_customer_distribution": (q13_customer_distribution_df,
                                  Q13_CUSTOMER_DISTRIBUTION_SQL),
    "q15_top_supplier": (q15_top_supplier_df, Q15_TOP_SUPPLIER_SQL),
    "q21_suppliers_kept_waiting": (q21_suppliers_kept_waiting_df,
                                   Q21_SUPPLIERS_KEPT_WAITING_SQL),
    "q22_global_sales_opportunity": (q22_global_sales_opportunity_df,
                                     Q22_GLOBAL_SALES_OPPORTUNITY_SQL),
    "q14_promo_effect": (q14_promo_effect_df, Q14_PROMO_EFFECT_SQL),
    "q17_small_quantity_revenue": (q17_small_quantity_revenue_df,
                                   Q17_SMALL_QUANTITY_REVENUE_SQL),
    "q19_discounted_revenue": (q19_discounted_revenue_df,
                               Q19_DISCOUNTED_REVENUE_SQL),
    "q8_national_market_share": (q8_national_market_share_df,
                                 Q8_NATIONAL_MARKET_SHARE_SQL),
    "q12_late_shipments": (q12_late_shipments_df, Q12_LATE_SHIPMENTS_SQL),
    "q2_min_cost_region": (q2_min_cost_region_df, Q2_MIN_COST_REGION_SQL),
    "q9_product_profit": (q9_product_profit_df, Q9_PRODUCT_PROFIT_SQL),
    "q11_important_stock": (q11_important_stock_df, Q11_IMPORTANT_STOCK_SQL),
    "q16_supplier_part_counts": (q16_supplier_part_counts_df,
                                 Q16_SUPPLIER_PART_COUNTS_SQL),
    "q20_surplus_suppliers": (q20_surplus_suppliers_df,
                              Q20_SURPLUS_SUPPLIERS_SQL),
    "user_value_ema": (user_value_ema_df, USER_VALUE_EMA_SQL),
    "user_value_ema_segmented": (user_value_ema_segmented_df,
                                 USER_VALUE_EMA_SEGMENTED_SQL),
}
