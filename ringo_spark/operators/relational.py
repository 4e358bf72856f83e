"""Relational-operator coverage queries (SURVEY.md §2.7 checklist).

The reference's generated SQL exercises only a narrow relational core
(outer/anti joins, filters, grouped aggregation, distinct).  Everything
else in the standard catalog comes free with Spark; each query here
demonstrates one such category over the TPC-H-ish testdata with an exact
DuckDB oracle — inner/semi/anti joins, window functions (rank, lag),
rollup, set ops, sorts/top-k, string/date/conditional functions, scalar
subqueries.

Sums follow the decimal-determinism rule (testbed.py): aggregate in
DECIMAL(18,2), present as DOUBLE — partition-order independent in both
engines.  Some queries use ``spark.sql`` over temp views deliberately:
the engine's SQL surface is as supported as the DataFrame surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from ..catalog import read_parquet_stable as _rps

from ..functions.localrel import literal_df


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return _rps(spark, f"{sf_dir}/{name}.parquet")


def _dec_sum(col: str, alias: str):
    return F.sum(F.col(col).cast("decimal(18,2)")).cast("double").alias(alias)


# --- joins ------------------------------------------------------------------


def join_inner_agg_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join + grouped aggregation (TPC-H Q3 flavor): revenue by
    market segment.  Catalyst broadcasts the small build side."""
    orders, cust = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    return (orders.join(cust, orders.o_custkey == cust.c_custkey, "inner")
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("order_count"),
                 _dec_sum("o_totalprice", "revenue")))


JOIN_INNER_AGG_SQL = """
SELECT c_mktsegment,
       count(*) AS order_count,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1
"""


def join_semi_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers having at least one late-epoch order."""
    orders, cust = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    recent = orders.where(F.col("o_orderdate") >= F.lit("2000-01-01"))
    return (cust.join(recent, cust.c_custkey == recent.o_custkey, "left_semi")
            .select("c_custkey", "c_mktsegment"))


JOIN_SEMI_SQL = """
SELECT c_custkey, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey
                AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
"""


def join_anti_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders at all."""
    orders, cust = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    return (cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
            .select("c_custkey", "c_name"))


JOIN_ANTI_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# --- window functions -------------------------------------------------------


def window_rank_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per customer by price (row_number, deterministic
    tie-break on key)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (orders.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 2)
            .select("o_custkey", "o_orderkey", F.col("rn").cast("int").alias("rn"),
                    F.col("o_totalprice").cast("decimal(18,2)").cast("double")
                    .alias("price")))


WINDOW_RANK_SQL = """
SELECT o_custkey, o_orderkey, CAST(rn AS INT) AS rn,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
WHERE rn <= 2
"""


def window_lag_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame navigation: month-over-month revenue delta (lag over an
    aggregated series)."""
    orders = _t(spark, sf_dir, "orders")
    monthly = (orders.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
               .agg(_dec_sum("o_totalprice", "revenue")))
    # Unpartitioned window => single-task sort.  Safe ONLY because the
    # input is already aggregated to months (~80 rows at any SF — time
    # axis, not data volume).  Do NOT copy this shape onto raw data: an
    # unpartitioned window over a fact table serializes the whole table
    # through one task; partition it (e.g. by year) instead.
    w = Window.orderBy("month")
    return (monthly
            .withColumn("prev_revenue", F.lag("revenue").over(w))
            .select(F.date_format("month", "yyyy-MM").alias("month"),
                    "revenue", "prev_revenue"))


WINDOW_LAG_SQL = """
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1)
SELECT strftime(month, '%Y-%m') AS month, revenue,
       lag(revenue) OVER (ORDER BY month) AS prev_revenue
FROM monthly
"""


# --- grouping sets / rollup -------------------------------------------------


def rollup_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus): per-group, per-flag subtotal,
    and grand total rows (NULL-marked, as in SQL)."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.rollup("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).alias("row_count"),
                 _dec_sum("l_quantity", "qty_sum")))


ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       count(*) AS row_count,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_sum
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def cube_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^n grouping combinations in one pass."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.cube("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).alias("row_count")))


CUBE_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS row_count
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# --- set operations ---------------------------------------------------------


def set_ops_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT + EXCEPT: nations present among customers vs suppliers."""
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")).distinct()
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")).distinct()
    both = cust.intersect(supp).withColumn("membership", F.lit("both"))
    cust_only = cust.exceptAll(supp).withColumn("membership", F.lit("customer_only"))
    return both.unionByName(cust_only)


SET_OPS_SQL = """
SELECT nationkey, 'both' AS membership
FROM (SELECT DISTINCT c_nationkey AS nationkey FROM customer
      INTERSECT
      SELECT DISTINCT s_nationkey FROM supplier)
UNION ALL
SELECT nationkey, 'customer_only' AS membership
FROM (SELECT DISTINCT c_nationkey AS nationkey FROM customer
      EXCEPT
      SELECT DISTINCT s_nationkey FROM supplier)
"""


# --- sorts / top-k ----------------------------------------------------------


def topk_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by price with deterministic tie-break; Spark plans
    this as TakeOrderedAndProject (no full sort at scale)."""
    orders = _t(spark, sf_dir, "orders")
    return (orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
            .limit(10)
            .select("o_orderkey",
                    F.col("o_totalprice").cast("decimal(18,2)").cast("double")
                    .alias("price")))


TOPK_SQL = """
SELECT o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


# --- string functions -------------------------------------------------------


def string_funcs_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper(F.substring("p_name", 1, 12)).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_brand"), F.lit("#"), F.lit("_")).alias("brand_clean"),
        F.size(F.split("p_name", " ")).alias("name_words"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"))


STRING_FUNCS_SQL = """
SELECT p_partkey,
       upper(substr(p_name, 1, 12)) AS name_prefix,
       length(p_name) AS name_len,
       replace(p_brand, '#', '_') AS brand_clean,
       len(string_split(p_name, ' ')) AS name_words,
       concat_ws('|', p_brand, p_type) AS brand_type
FROM part
"""
# brand_type via concat_ws on BOTH sides: `||` null-propagates while
# concat_ws skips null operands — on a null p_type the two diverged
# ('Brand#11' vs NULL; the null-injected sweep, r18).  Skip-null is the
# operator's documented semantics.


# --- date/time functions ----------------------------------------------------


def date_funcs_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (orders.groupBy(
        F.year("o_orderdate").alias("y"),
        F.quarter("o_orderdate").alias("q"),
        F.month("o_orderdate").alias("m"))
        .agg(F.count(F.lit(1)).alias("order_count"))
        .select(F.col("y").cast("int"), F.col("q").cast("int"),
                F.col("m").cast("int"), "order_count"))


DATE_FUNCS_SQL = """
SELECT CAST(year(o_orderdate) AS INT) AS y,
       CAST(quarter(o_orderdate) AS INT) AS q,
       CAST(month(o_orderdate) AS INT) AS m,
       count(*) AS order_count
FROM orders
GROUP BY 1, 2, 3
"""


# --- conditional / null functions ------------------------------------------


def conditional_funcs_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    band = (F.when(F.col("l_quantity") < 10, "small")
            .when(F.col("l_quantity") < 30, "medium")
            .otherwise("large"))
    return (li.groupBy(band.alias("qty_band"),
                       F.coalesce(F.nullif("l_returnflag", F.lit("N")),
                                  F.lit("unreturned")).alias("flag"))
            .agg(F.count(F.lit(1)).alias("row_count"),
                 F.greatest(F.max("l_tax"), F.max("l_discount"))
                 .cast("decimal(18,4)").cast("double").alias("max_rate")))


CONDITIONAL_FUNCS_SQL = """
SELECT CASE WHEN l_quantity < 10 THEN 'small'
            WHEN l_quantity < 30 THEN 'medium'
            ELSE 'large' END AS qty_band,
       coalesce(nullif(l_returnflag, 'N'), 'unreturned') AS flag,
       count(*) AS row_count,
       CAST(CAST(greatest(max(l_tax), max(l_discount)) AS DECIMAL(18,4))
            AS DOUBLE) AS max_rate
FROM lineitem
GROUP BY 1, 2
"""


# --- scalar subquery (SQL surface) ------------------------------------------


def scalar_subquery_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery through the engine's SQL surface (Catalyst plans the
    subquery as a broadcast-exchanged single-row relation)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql("""
        SELECT o_orderpriority, count(*) AS n
        FROM orders_v
        WHERE CAST(o_totalprice AS DECIMAL(18,2)) >
              (SELECT CAST(max(o_totalprice) AS DECIMAL(18,2)) * 0.9
               FROM orders_v)
        GROUP BY o_orderpriority
    """)


SCALAR_SUBQUERY_SQL = """
SELECT o_orderpriority, count(*) AS n
FROM orders
WHERE CAST(o_totalprice AS DECIMAL(18,2)) >
      (SELECT CAST(max(o_totalprice) AS DECIMAL(18,2)) * 0.9 FROM orders)
GROUP BY o_orderpriority
"""


RANGE_TIERS = [(0, 100, "low"), (100, 200, "mid"),
               (200, 300, "high"), (300, 10**9, "top")]


def range_join_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join: events banded into value tiers via a non-equi
    join against a (tiny, broadcast) bounds table.  The scale shape for
    range joins is exactly this — small side broadcast, big side streamed
    map-side through a nested-loop probe of a handful of intervals; a
    big-big range join would instead bucketize both sides to an equi-join
    (the ann_lsh pattern)."""
    from ..catalog import load_catalog
    from ..testbed import EVENTS

    tiers = literal_df(spark, RANGE_TIERS, "lo INT, hi INT, tier STRING")
    ev = load_catalog(spark, sf_dir, [EVENTS])["events"].select(
        F.col("value").cast("decimal(18,2)").alias("value"))
    joined = ev.join(F.broadcast(tiers),
                     (ev.value >= tiers.lo) & (ev.value < tiers.hi))
    return (joined.groupBy("tier")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("value").cast("double").alias("value_sum")))


_SQL_TIERS = ", ".join(f"({lo}, {hi}, '{t}')" for lo, hi, t in RANGE_TIERS)

RANGE_JOIN_SQL = f"""
SELECT tier, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM events
JOIN (VALUES {_SQL_TIERS}) tiers(lo, hi, tier)
  ON CAST(value AS DECIMAL(18,2)) >= lo AND CAST(value AS DECIMAL(18,2)) < hi
GROUP BY 1
"""


def asof_join_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, the union + carry-forward window trick: for every
    order, the customer's most recent completed ('F') order total at or
    before its date.  One shuffle on (custkey), no range explosion —
    the distributed shape DuckDB's native ASOF JOIN (the oracle) picks
    on one node."""
    orders = _t(spark, sf_dir, "orders")
    day = F.floor(F.unix_timestamp("o_orderdate") / 86400).cast("long")
    probe = orders.select(F.col("o_custkey").alias("k"),
                          day.alias("t"), "o_orderkey")
    # k IS NOT NULL on the ref side: ASOF JOIN equality never matches a
    # null key, but the union+window trick groups null-k probes WITH
    # null-k refs and would carry prices across them (r18 null sweep)
    ref = (orders.where(F.col("o_orderstatus") == "F")
           .where(F.col("o_custkey").isNotNull())
           .select(F.col("o_custkey").alias("k"), day.alias("t"),
                   F.col("o_totalprice").cast("decimal(18,2)")
                   .alias("ref_price")))
    u = (probe.select("k", "t", "o_orderkey", F.lit(None).cast("decimal(18,2)")
                      .alias("ref_price"), F.lit(1).alias("tag"))
         .unionByName(ref.select("k", "t", F.lit(None).cast("long")
                                 .alias("o_orderkey"), "ref_price",
                                 F.lit(0).alias("tag"))))
    # ordering ties by ref_price makes carry-forward pick the max-price row
    # of a tied date — the oracle's GROUP BY max(...) — without a separate
    # pre-aggregation shuffle; the whole as-of is ONE exchange on k
    w = (Window.partitionBy("k").orderBy("t", "tag", "ref_price")
         .rowsBetween(Window.unboundedPreceding, 0))
    # carry the latest ref ROW as one struct, not last-non-null per
    # column: an F order with a NULL price IS the as-of match (ASOF
    # matches rows; the oracle's max() skips nulls only WITHIN a tied
    # date) — per-column ignorenulls carried an OLDER price alongside
    # the newer row's date, an inconsistent pair (r18 null sweep)
    carried = u.withColumn(
        "asof", F.last(F.when(F.col("tag") == 0,
                              F.struct("t", "ref_price")),
                       ignorenulls=True).over(w))
    return (carried.where(F.col("tag") == 1)
            .select(F.col("k").alias("o_custkey"), "o_orderkey",
                    F.col("t").alias("order_day"),
                    F.col("asof.ref_price").cast("double")
                    .alias("asof_price"),
                    F.col("asof.t").alias("asof_day")))


ASOF_JOIN_SQL = """
WITH probe AS (
  SELECT o_custkey AS k, CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS t,
         o_orderkey
  FROM orders),
ref AS (
  SELECT o_custkey AS k, CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS t,
         max(CAST(o_totalprice AS DECIMAL(18,2))) AS ref_price
  FROM orders WHERE o_orderstatus = 'F' GROUP BY 1, 2)
SELECT probe.k AS o_custkey, probe.o_orderkey, probe.t AS order_day,
       CAST(ref.ref_price AS DOUBLE) AS asof_price,
       ref.t AS asof_day
FROM probe ASOF LEFT JOIN ref ON probe.k = ref.k AND probe.t >= ref.t
"""


def json_funcs_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON functions over ``events.props`` — both extraction paths
    (``get_json_object`` path strings and ``from_json`` schema parse) and
    JSON generation (``to_json``), the Spark equivalents of the
    reference's json operators (Populate/Fact.hs:102-103,162).  Identical
    sums from both paths prove the parsers agree."""
    from ..catalog import load_catalog
    from ..testbed import EVENTS

    ev = load_catalog(spark, sf_dir, [EVENTS])["events"]
    parsed = F.from_json("props", "k INT")
    base = ev.select(
        F.coalesce("event_type", F.lit("__UNKNOWN_VAL__")).alias("event_type"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k1"),
        parsed.getField("k").cast("bigint").alias("k2"))
    return (base.groupBy("event_type")
            .agg(F.count("k1").alias("n_with_k"),
                 F.sum("k1").alias("k_sum"),
                 F.sum("k2").alias("k_sum_parsed"),
                 F.max("k1").alias("k_max"))
            .withColumn("jdoc", F.to_json(
                F.struct("event_type", "k_max"),
                # keep null fields: Spark's default drops them while
                # DuckDB's json_object always emits "k_max":null — a
                # group with no extractable $.k would hash-mismatch
                # (r17 review; both behaviors verified empirically)
                {"ignoreNullFields": "false"})))


JSON_FUNCS_SQL = """
SELECT coalesce(event_type, '__UNKNOWN_VAL__') AS event_type,
       count(CAST(props->>'$.k' AS BIGINT)) AS n_with_k,
       CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_sum,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
           AS k_sum_parsed,
       max(CAST(props->>'$.k' AS BIGINT)) AS k_max,
       CAST(json_object('event_type', coalesce(event_type, '__UNKNOWN_VAL__'),
                        'k_max', max(CAST(props->>'$.k' AS BIGINT)))
            AS VARCHAR) AS jdoc
FROM events
GROUP BY 1
"""


def window_frames_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: 7-day rolling revenue per order priority —
    the frame-clause coverage (rank/lag are elsewhere).  Rolling sums run
    over the pre-aggregated daily series (one row per priority×day), so
    the window state is days, not orders; sums stay in exact decimal."""
    o = _t(spark, sf_dir, "orders")
    daily = (o.groupBy(F.col("o_orderpriority").alias("pr"),
                       F.floor(F.unix_timestamp("o_orderdate") / 86400)
                       .cast("long").alias("day_id"))
             .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                  .alias("rev")))
    w = (Window.partitionBy("pr").orderBy("day_id").rangeBetween(-6, 0))
    return (daily.select("pr", "day_id",
                         F.col("rev").cast("double").alias("daily_rev"),
                         F.sum("rev").over(w).cast("double")
                         .alias("rolling_7d_rev")))


WINDOW_FRAMES_SQL = """
WITH daily AS (
  SELECT o_orderpriority AS pr,
         CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day_id,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1, 2)
SELECT pr, day_id,
       CAST(rev AS DOUBLE) AS daily_rev,
       CAST(sum(rev) OVER (PARTITION BY pr ORDER BY day_id
                           RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS rolling_7d_rev
FROM daily
"""


def window_stats_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank window functions: ntile quartile, percent_rank,
    and cume_dist of order totalprice within each priority — the
    remaining analytic-window surface (rank/lag/frames covered
    elsewhere).  One shuffle on the partition key; output restricted to
    two priorities to keep the driver row compact."""
    o = _t(spark, sf_dir, "orders")
    # explicit NULLS FIRST: it's Spark's ASC default but DuckDB defaults
    # NULLS LAST, which re-ranks EVERY row of a partition containing a
    # null price (the r18 null-injected sweep) — rank semantics must be
    # pinned, not inherited
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").cast("decimal(18,2)").asc_nulls_first(),
        "o_orderkey")
    return (o.where(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
            .select(F.col("o_orderpriority").alias("pr"), "o_orderkey",
                    F.col("o_totalprice").cast("decimal(18,2)")
                    .cast("double").alias("price"),
                    F.ntile(4).over(w).alias("quartile"),
                    F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
                    F.round(F.cume_dist().over(w), 6).alias("cume")))


WINDOW_STATS_SQL = """
SELECT o_orderpriority AS pr, o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) NULLS FIRST,
                      o_orderkey)
"""


def quantiles_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ordered-set aggregates: p50/p90/p99 of event value per event
    type (linear interpolation — identical in Spark's `percentile` and
    DuckDB's `quantile_cont`).  Exact percentiles need the full sorted
    group; at 100 TB swap in `approx_percentile` (KLL/GK sketch, mergeable
    map-side) — same query shape, ε contract instead of exactness."""
    from ..catalog import load_catalog
    from ..testbed import EVENTS

    ev = load_catalog(spark, sf_dir, [EVENTS])["events"]
    q = F.expr("percentile(CAST(value AS DOUBLE), array(0.5D, 0.9D, 0.99D))")
    return (ev.groupBy(F.coalesce("event_type", F.lit("__UNKNOWN_VAL__"))
                       .alias("event_type"))
            .agg(F.count("value").alias("n"), q.alias("qs"))
            .select("event_type", "n",
                    F.round(F.element_at("qs", 1), 6).alias("p50"),
                    F.round(F.element_at("qs", 2), 6).alias("p90"),
                    F.round(F.element_at("qs", 3), 6).alias("p99")))


QUANTILES_SQL = """
SELECT coalesce(event_type, '__UNKNOWN_VAL__') AS event_type,
       count(value) AS n,
       round(quantile_cont(CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE), 0.5), 6) AS p50,
       round(quantile_cont(CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE), 0.9), 6) AS p90,
       round(quantile_cont(CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE), 0.99), 6) AS p99
FROM events
GROUP BY 1
"""


QUANTILE_PS = (0.5, 0.9, 0.99)
QUANTILE_ACCURACY = 1000          # GK sketch: rank error <= n / accuracy
QUANTILE_RANK_EPS = 3.0 / QUANTILE_ACCURACY   # 3x the published bound


def quantiles_approx_bounds_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable-sketch path of :func:`quantiles_df`, with its rank
    -error contract made driver-hashable — the quantile twin of
    ``fact_events_by_minute_approx_bounds`` (same motive as the
    reference's mergeable count-distinct state, ``Populate/Fact.hs:
    60-120``): ``approx_percentile`` aggregates a Greenwald-Khanna
    sketch that MERGES map-side (partial + final, unlike exact
    ``percentile`` which must see the whole sorted group), guaranteeing
    the returned element's rank is within n/accuracy of p*n.

    Per group the query emits the exact p50/p90/p99 (the oracle
    reproduces them cell-exactly) plus a boolean asserting each sketch
    estimate lies between the group's order statistics at ranks
    p*n ± 3ε·n (ε = 1/accuracy) — a rank-space bracket on real elements,
    so there are no interpolation edge cases on tiny groups.  The oracle
    pins TRUE, so sketch drift past 3x the published bound turns the
    driver row red.  (The bracket itself needs the sorted group — fine
    for a bounds/diagnostic query; the production path is the sketch
    alone.)"""
    from ..catalog import load_catalog
    from ..testbed import EVENTS

    ev = load_catalog(spark, sf_dir, [EVENTS])["events"]
    ps_arr = "array(" + ", ".join(f"{p}D" for p in QUANTILE_PS) + ")"
    agg = (ev.groupBy(F.coalesce("event_type", F.lit("__UNKNOWN_VAL__"))
                      .alias("event_type"))
           .agg(F.count("value").alias("n"),
                F.expr(f"percentile(CAST(value AS DOUBLE), {ps_arr})")
                .alias("qs"),
                F.expr(f"approx_percentile(CAST(value AS DOUBLE), {ps_arr},"
                       f" {QUANTILE_ACCURACY})").alias("aps"),
                F.sort_array(F.collect_list(F.col("value").cast("double")))
                .alias("vals")))

    def within(i: int, p: float) -> F.Column:
        n = F.col("n").cast("int")
        lo = F.greatest(F.lit(1),
                        F.floor(F.lit(p - QUANTILE_RANK_EPS)
                                * F.col("n")).cast("int"))
        hi = F.least(n, (F.ceil(F.lit(p + QUANTILE_RANK_EPS) * F.col("n"))
                         + F.lit(1)).cast("int"))
        ap = F.element_at("aps", i)
        return (F.element_at("vals", lo) <= ap) \
            & (ap <= F.element_at("vals", hi))

    ok = F.lit(True)
    for i, p in enumerate(QUANTILE_PS, start=1):
        ok = ok & within(i, p)
    return agg.select(
        "event_type", "n",
        F.round(F.element_at("qs", 1), 6).alias("p50"),
        F.round(F.element_at("qs", 2), 6).alias("p90"),
        F.round(F.element_at("qs", 3), 6).alias("p99"),
        F.when(F.col("n") == 0, F.lit(True)).otherwise(ok)
        .alias("within_rank_bounds"))


QUANTILES_APPROX_BOUNDS_SQL = """
SELECT coalesce(event_type, '__UNKNOWN_VAL__') AS event_type,
       count(value) AS n,
       round(quantile_cont(CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE), 0.5), 6) AS p50,
       round(quantile_cont(CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE), 0.9), 6) AS p90,
       round(quantile_cont(CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE), 0.99), 6) AS p99,
       TRUE AS within_rank_bounds
FROM events
GROUP BY 1
"""


OVERLAP_RSD = 0.05
OVERLAP_EPS_MULT = 3


def segment_overlap_bounds_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL set-algebra bounds — the fourth mergeable-sketch driver row
    (after HLL distincts, GK quantiles, CMS frequencies): the overlap of
    two user segments estimated by INCLUSION-EXCLUSION over three HLL
    sketches (|A∩B| ≈ est|A| + est|B| − est|A∪B|; sketches union, they
    never intersect directly), checked against the exact intersection
    with a pinned tolerance of ±3·rsd·(|A|+|B|+|A∪B|) — each term
    contributes its own rsd-scaled error, so the triangle-inequality
    budget sums them.  The oracle reproduces the exact cardinalities
    cell-exactly and pins the boolean TRUE; the bound genuinely
    constrains (it is far below the exact overlap, so a drifting
    estimate flips it).

    Segments: users with high-value clicks vs users with high-value
    purchases — partially overlapping by construction.  Scale shape:
    ONE aggregation pass computes all three exact distincts and all
    three HLL estimates with map-side partial sketches; output is a
    single audit row."""
    from ..catalog import load_catalog
    from ..testbed import EVENTS

    ev = (load_catalog(spark, sf_dir, [EVENTS])["events"]
          .where(F.col("user_id").isNotNull()))
    hi = F.col("value") > 90
    in_a = (F.col("event_type") == "click") & hi
    in_b = (F.col("event_type") == "purchase") & hi
    ua = F.when(in_a, F.col("user_id"))
    ub = F.when(in_b, F.col("user_id"))
    uu = F.when(in_a | in_b, F.col("user_id"))
    agg = ev.agg(
        F.countDistinct(ua).alias("n_a"),
        F.countDistinct(ub).alias("n_b"),
        F.countDistinct(uu).alias("n_union"),
        F.approx_count_distinct(ua, OVERLAP_RSD).alias("__ea"),
        F.approx_count_distinct(ub, OVERLAP_RSD).alias("__eb"),
        F.approx_count_distinct(uu, OVERLAP_RSD).alias("__eu"))
    est_inter = F.col("__ea") + F.col("__eb") - F.col("__eu")
    n_inter = F.col("n_a") + F.col("n_b") - F.col("n_union")
    tol = F.ceil((F.col("n_a") + F.col("n_b") + F.col("n_union"))
                 * (OVERLAP_EPS_MULT * OVERLAP_RSD))
    return agg.select(
        "n_a", "n_b", "n_union", n_inter.alias("n_inter"),
        (F.abs(est_inter - n_inter) <= tol).alias("within_ie_bounds"))


SEGMENT_OVERLAP_BOUNDS_SQL = """
SELECT count(DISTINCT CASE WHEN event_type = 'click' AND value > 90
                           THEN user_id END) AS n_a,
       count(DISTINCT CASE WHEN event_type = 'purchase' AND value > 90
                           THEN user_id END) AS n_b,
       count(DISTINCT CASE WHEN event_type IN ('click', 'purchase')
                            AND value > 90
                           THEN user_id END) AS n_union,
       count(DISTINCT CASE WHEN event_type = 'click' AND value > 90
                           THEN user_id END)
       + count(DISTINCT CASE WHEN event_type = 'purchase' AND value > 90
                             THEN user_id END)
       - count(DISTINCT CASE WHEN event_type IN ('click', 'purchase')
                              AND value > 90
                             THEN user_id END) AS n_inter,
       TRUE AS within_ie_bounds
FROM events WHERE user_id IS NOT NULL
"""


ZSCORE_THRESHOLD = 3.0


def anomaly_zscore_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outlier flags over the event stream — the
    standard first-pass anomaly gate.  Group moments are EXACT decimal
    sums (Σv as decimal(18,2), Σv² as decimal(38,4)) cast to double only
    inside the identical variance expression in both engines, so the
    z-scores hash-match without relying on stddev implementations
    agreeing; the sample-variance form is (Σv² − (Σv)²/n)/(n−1).

    Degenerate groups are guarded identically in both engines
    (post-review hardening): the one-pass variance
    (Σv² − (Σv)²/n)/(n−1) can land a few ULP BELOW zero for
    constant-valued groups (double cancellation), where DuckDB's sqrt
    raises while Spark yields NaN — and n=1 groups divide by zero,
    which ANSI Spark turns into an error even for doubles.  Both cases
    route through nested lazy CASEs (n > 1, then var > 0; CASE branches
    evaluate lazily in both engines), yielding NULL zscore/is_anomaly
    for groups with no defined deviation.

    Scale shape: one map-side-combining aggregate per event_type (K
    groups), joined back unhinted (K-row side — AQE broadcasts it); the
    event stream itself never shuffles."""
    from ..catalog import load_catalog
    from ..testbed import EVENTS

    ev = (load_catalog(spark, sf_dir, [EVENTS])["events"]
          .where(F.col("value").isNotNull())
          .select("event_id",
                  F.coalesce("event_type", F.lit("__UNKNOWN_VAL__"))
                  .alias("event_type"),
                  F.col("value").cast("decimal(18,2)").alias("v")))
    stats = (ev.groupBy("event_type")
             .agg(F.sum("v").cast("double").alias("s1"),
                  F.sum((F.col("v") * F.col("v")).cast("decimal(38,4)"))
                  .cast("double").alias("s2"),
                  F.count(F.lit(1)).alias("n")))
    var_expr = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) \
        / (F.col("n") - 1)
    z_expr = F.round((F.col("v").cast("double") - F.col("s1") / F.col("n"))
                     / F.sqrt(var_expr), 6)
    z = F.when(F.col("n") > 1, F.when(var_expr > 0, z_expr))
    return (ev.join(stats, "event_type")
            .select("event_id", "event_type",
                    F.col("v").cast("double").alias("value"),
                    z.alias("zscore"),
                    (F.abs(z) > ZSCORE_THRESHOLD).alias("is_anomaly")))


ANOMALY_ZSCORE_SQL = f"""
WITH ev AS (
  SELECT event_id,
         coalesce(event_type, '__UNKNOWN_VAL__') AS event_type,
         CAST(value AS DECIMAL(18,2)) AS v
  FROM events WHERE value IS NOT NULL),
stats AS (
  SELECT event_type,
         CAST(sum(v) AS DOUBLE) AS s1,
         CAST(sum(CAST(v * v AS DECIMAL(38,4))) AS DOUBLE) AS s2,
         count(*) AS n
  FROM ev GROUP BY 1),
scored AS (
  SELECT event_id, ev.event_type, CAST(v AS DOUBLE) AS value,
         CASE WHEN n > 1 THEN
           CASE WHEN (s2 - s1 * s1 / n) / (n - 1) > 0 THEN
             round((CAST(v AS DOUBLE) - s1 / n)
                   / sqrt((s2 - s1 * s1 / n) / (n - 1)), 6)
           END
         END AS zscore
  FROM ev JOIN stats USING (event_type))
SELECT event_id, event_type, value, zscore,
       abs(zscore) > {ZSCORE_THRESHOLD} AS is_anomaly
FROM scored
"""


RELATIONAL_QUERIES: dict[str, tuple] = {
    "join_inner_agg": (join_inner_agg_df, JOIN_INNER_AGG_SQL),
    "join_semi": (join_semi_df, JOIN_SEMI_SQL),
    "join_anti": (join_anti_df, JOIN_ANTI_SQL),
    "window_rank": (window_rank_df, WINDOW_RANK_SQL),
    "window_lag": (window_lag_df, WINDOW_LAG_SQL),
    "rollup_agg": (rollup_df, ROLLUP_SQL),
    "cube_agg": (cube_df, CUBE_SQL),
    "set_ops": (set_ops_df, SET_OPS_SQL),
    "topk": (topk_df, TOPK_SQL),
    "string_funcs": (string_funcs_df, STRING_FUNCS_SQL),
    "date_funcs": (date_funcs_df, DATE_FUNCS_SQL),
    "conditional_funcs": (conditional_funcs_df, CONDITIONAL_FUNCS_SQL),
    "scalar_subquery": (scalar_subquery_df, SCALAR_SUBQUERY_SQL),
    "json_funcs": (json_funcs_df, JSON_FUNCS_SQL),
    "range_join": (range_join_df, RANGE_JOIN_SQL),
    "asof_join": (asof_join_df, ASOF_JOIN_SQL),
    "quantiles": (quantiles_df, QUANTILES_SQL),
    # mergeable GK-sketch quantiles with the rank-error contract pinned
    # TRUE by the oracle (the quantile twin of the HLL bounds row)
    "quantiles_approx_bounds": (quantiles_approx_bounds_df,
                                QUANTILES_APPROX_BOUNDS_SQL),
    "window_frames": (window_frames_df, WINDOW_FRAMES_SQL),
    "window_stats": (window_stats_df, WINDOW_STATS_SQL),
    # per-type z-score outliers with exact-decimal moment computation
    "anomaly_zscore": (anomaly_zscore_df, ANOMALY_ZSCORE_SQL),
    # HLL set-algebra (inclusion-exclusion overlap) bounds — the fourth
    # mergeable-sketch driver row
    "segment_overlap_bounds": (segment_overlap_bounds_df,
                               SEGMENT_OVERLAP_BOUNDS_SQL),
}
# NB: the operators defined below (scd2_dim, timeseries_gapfill,
# listagg, value_histogram, grouping_sets, map_funcs,
# scd2_fact_incremental, ...) are appended to RELATIONAL_QUERIES after
# their definitions at the bottom of this module.


# --- SCD2 dimension history -------------------------------------------------


def scd2_dim_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 derivation: per-customer order-
    status history as (valid_from, valid_to, is_current) intervals.  The
    reference's dimensions are SCD1 (refresh keeps latest values only,
    Populate/Dimension.hs); this derives the full change history from the
    fact stream itself — change detection via lag() over the per-customer
    event sequence, interval close via lead().

    Scale: both windows partition by o_custkey — per-key sequences,
    never a global sort; a 100 TB history shuffles once on the customer
    key and every later step is within-partition."""
    orders = _t(spark, sf_dir, "orders")
    seq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    changes = (orders
               .select("o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey")
               .withColumn("prev", F.lag("o_orderstatus").over(seq))
               .where(F.col("prev").isNull()
                      | (F.col("prev") != F.col("o_orderstatus"))))
    # the interval close MUST use the same ordering as the change
    # detection — reusing seq states that invariant in code
    return (changes
            .withColumn("valid_to", F.lead("o_orderdate").over(seq))
            .select("o_custkey",
                    F.col("o_orderstatus").alias("status"),
                    F.col("o_orderdate").alias("valid_from"),
                    "valid_to",
                    F.col("valid_to").isNull().alias("is_current")))


SCD2_DIM_SQL = """
WITH seq AS (
  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
         lag(o_orderstatus) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS prev
  FROM orders),
changes AS (
  SELECT * FROM seq
  WHERE prev IS NULL OR prev != o_orderstatus)
SELECT o_custkey, o_orderstatus AS status, o_orderdate AS valid_from,
       lead(o_orderdate) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) AS valid_to,
       lead(o_orderdate) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) IS NULL
         AS is_current
FROM changes
"""


RELATIONAL_QUERIES["scd2_dim"] = (scd2_dim_df, SCD2_DIM_SQL)


# --- SCD2 + incremental fact composition -------------------------------------

# watermark splitting the "initial load" from the "incremental batch"
# (median-ish ship date — plenty of customer status changes on both sides)
SCD2_SPLIT_DATE = "1998-06-01"


def scd2_fact_incremental_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time fact load against the SCD2 history, composed as an
    INCREMENTAL refresh: lineitems are split at a ship-date watermark into
    an initial load and an incremental batch; each batch is aggregated
    separately against the customer-status intervals (which CHANGE across
    the watermark — the corner the reference's SCD1 refresh cannot
    express), then the partials are unioned and re-aggregated.  The oracle
    is the direct single-pass recompute, so a hash match proves the
    incremental composition is lossless even when dimension keys change
    mid-window.

    Each lineitem joins the status interval valid AT SHIP TIME
    (ship date >= valid_from and < valid_to) — a later status change on
    the same customer re-buckets only post-change shipments.

    Scale: the PIT join is an equi-join on o_custkey with the interval
    predicate as a residual filter — one shuffle on the customer key for
    facts, the SCD2 interval side is dim-sized; each batch pre-aggregates
    map-side before the tiny partial union."""
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    hist = (scd2_dim_df(spark, sf_dir)
            .select(F.col("o_custkey").alias("h_custkey"),
                    "status", "valid_from", "valid_to"))
    facts = (lineitem
             .join(orders.select("o_orderkey", "o_custkey"),
                   F.col("l_orderkey") == F.col("o_orderkey"))
             .select("o_custkey", "l_shipdate", "l_returnflag",
                     F.col("l_quantity").cast("decimal(18,2)").alias("qty"),
                     F.col("l_extendedprice").cast("decimal(18,2)")
                     .alias("price")))

    def pit_partial(batch: DataFrame) -> DataFrame:
        # LEFT join + sentinel: facts shipping before the customer's first
        # status interval land in an 'UNKNOWN' bucket instead of dropping —
        # the same missing-dimension convention as the fact loader's -1
        # sentinel (populate/fact.py), so row counts are conserved.
        joined = batch.join(
            hist,
            (F.col("o_custkey") == F.col("h_custkey"))
            & (F.col("l_shipdate") >= F.col("valid_from"))
            & (F.col("valid_to").isNull()
               | (F.col("l_shipdate") < F.col("valid_to"))),
            "left").withColumn("status", F.coalesce("status", F.lit("UNKNOWN")))
        return (joined.groupBy("status", "l_returnflag")
                .agg(F.sum("qty").alias("part_qty"),
                     F.sum("price").alias("part_price"),
                     F.count(F.lit(1)).alias("part_n")))

    w = F.lit(SCD2_SPLIT_DATE).cast("timestamp")
    initial = pit_partial(facts.where(F.col("l_shipdate") < w))
    increment = pit_partial(facts.where(F.col("l_shipdate") >= w))
    return (initial.unionByName(increment)
            .groupBy("status", "l_returnflag")
            .agg(F.sum("part_qty").alias("q"),
                 F.sum("part_price").alias("p"),
                 F.sum("part_n").alias("n"))
            .select("status", "l_returnflag",
                    F.col("q").cast("double").alias("sum_qty"),
                    F.col("p").cast("double").alias("sum_price"),
                    F.col("n").cast("long").alias("n_items")))


SCD2_FACT_INCREMENTAL_SQL = """
WITH seq AS (
  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
         lag(o_orderstatus) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS prev
  FROM orders),
changes AS (
  SELECT * FROM seq WHERE prev IS NULL OR prev != o_orderstatus),
hist AS (
  SELECT o_custkey, o_orderstatus AS status, o_orderdate AS valid_from,
         lead(o_orderdate) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS valid_to
  FROM changes),
f AS (
  SELECT o.o_custkey, l.l_shipdate, l.l_returnflag,
         CAST(l.l_quantity AS DECIMAL(18,2)) AS qty,
         CAST(l.l_extendedprice AS DECIMAL(18,2)) AS price
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
SELECT coalesce(h.status, 'UNKNOWN') AS status, f.l_returnflag,
       CAST(sum(f.qty) AS DOUBLE) AS sum_qty,
       CAST(sum(f.price) AS DOUBLE) AS sum_price,
       count(*) AS n_items
FROM f LEFT JOIN hist h ON f.o_custkey = h.o_custkey
  AND f.l_shipdate >= h.valid_from
  AND (h.valid_to IS NULL OR f.l_shipdate < h.valid_to)
GROUP BY coalesce(h.status, 'UNKNOWN'), f.l_returnflag
"""


RELATIONAL_QUERIES["scd2_fact_incremental"] = (
    scd2_fact_incremental_df, SCD2_FACT_INCREMENTAL_SQL)


# --- time-series gap filling ------------------------------------------------

GAPFILL_DAY = "2024-01-05"


def timeseries_gapfill_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize a sparse per-series time series: per event type, one
    row for EVERY minute between the series' first and last observation,
    missing minutes carry the last observed value forward and are
    flagged.  The downsample-then-densify shape every monitoring /
    feature-engineering pipeline needs before joining series.

    Scale shape: the dense grid is generated per series with
    ``sequence`` + ``explode`` (series-local, never a global calendar
    cross join); the grid⋈observations join and the carry-forward
    window both key on the series, so the whole fill is two exchanges on
    the series key no matter how many series there are.  Grid size is
    bounded by each series' own span — a quiet series costs its own gap
    count, not the corpus'."""
    from ..catalog import load_catalog
    from ..testbed import EVENTS

    ev = load_catalog(spark, sf_dir, [EVENTS])["events"]
    lo = F.lit(GAPFILL_DAY).cast("timestamp")
    hi = F.date_add(lo, 1).cast("timestamp")
    minute = F.floor(F.unix_timestamp("ts") / 60).cast("long")
    base = (ev.where((F.col("ts") >= lo) & (F.col("ts") < hi))
            .groupBy(F.coalesce("event_type", F.lit("__UNKNOWN_VAL__"))
                     .alias("event_type"),
                     minute.alias("m"))
            .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("v")))
    grid = (base.groupBy("event_type")
            .agg(F.min("m").alias("mn"), F.max("m").alias("mx"))
            .select("event_type",
                    F.explode(F.sequence("mn", "mx")).alias("m")))
    w = (Window.partitionBy("event_type").orderBy("m")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (grid.join(base, ["event_type", "m"], "left")
            .select("event_type", "m",
                    F.last("v", ignorenulls=True).over(w)
                    .cast("double").alias("v_filled"),
                    F.col("v").isNull().alias("is_gap")))


TIMESERIES_GAPFILL_SQL = f"""
WITH base AS (
  SELECT coalesce(event_type, '__UNKNOWN_VAL__') AS event_type,
         CAST(floor(epoch(ts) / 60) AS BIGINT) AS m,
         sum(CAST(value AS DECIMAL(18,2))) AS v
  FROM events
  WHERE ts >= TIMESTAMP '{GAPFILL_DAY} 00:00:00'
    AND ts <  TIMESTAMP '{GAPFILL_DAY} 00:00:00' + INTERVAL 1 DAY
  GROUP BY 1, 2),
bounds AS (SELECT event_type, min(m) AS mn, max(m) AS mx
           FROM base GROUP BY event_type),
grid AS (SELECT event_type, unnest(generate_series(mn, mx)) AS m
         FROM bounds)
SELECT g.event_type, g.m,
       CAST(last_value(b.v IGNORE NULLS) OVER (
              PARTITION BY g.event_type ORDER BY g.m
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS v_filled,
       b.v IS NULL AS is_gap
FROM grid g
LEFT JOIN base b ON b.event_type = g.event_type AND b.m = g.m
"""


# densify-and-carry-forward: per-series minute grid + last-observation
# fill (series-local sequence explode; two exchanges on the series key)
RELATIONAL_QUERIES["timeseries_gapfill"] = (timeseries_gapfill_df,
                                            TIMESERIES_GAPFILL_SQL)


def listagg_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / string_agg): per market
    segment, the sorted distinct nation keys as a CSV plus their count.
    Deterministic across engines because the collected set is sorted
    before joining — never rely on aggregation order."""
    cust = _t(spark, sf_dir, "customer")
    return (cust.groupBy("c_mktsegment")
            .agg(F.concat_ws(",", F.array_sort(F.collect_set(
                     F.col("c_nationkey").cast("string"))))
                 .alias("nations_csv"),
                 F.count_distinct("c_nationkey").cast("long")
                 .alias("n_nations")))


LISTAGG_SQL = """
SELECT c_mktsegment,
       array_to_string(list_sort(list_distinct(
           list(c_nationkey::VARCHAR))), ',') AS nations_csv,
       count(DISTINCT c_nationkey) AS n_nations
FROM customer
GROUP BY 1
"""


HIST_BINS = 10


def value_histogram_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (width_bucket shape): event values binned
    into {HIST_BINS} buckets between the global min and max, counted per
    (event_type, bin).  The bounds come from a 1-row broadcast aggregate;
    binning is a map-side expression, so the whole histogram costs one
    stats pass + one (type, bin) aggregation — the standard profile
    query at any scale.  The bin index is computed WITHOUT division:
    bin = #edges at or below the value, i.e. a sum of BINS-1 exact
    decimal comparisons ``(v-mn)*BINS >= k*(mx-mn)`` — a floored decimal
    (or double) quotient would round differently across engines exactly
    at bin edges."""
    from ..catalog import load_catalog
    from ..testbed import EVENTS

    ev = load_catalog(spark, sf_dir, [EVENTS])["events"]
    v = F.col("value").cast("decimal(18,2)")
    mm = ev.agg(F.min(v).alias("__mn"), F.max(v).alias("__mx"))
    num = ((v - F.col("__mn")) * HIST_BINS).cast("decimal(28,2)")
    span = (F.col("__mx") - F.col("__mn")).cast("decimal(18,2)")
    raw = sum((num >= span * k).cast("int")
              for k in range(1, HIST_BINS))
    bin_ = F.least(raw, F.lit(HIST_BINS - 1))
    return (ev.where(v.isNotNull()).join(F.broadcast(mm))
            .groupBy(F.coalesce("event_type", F.lit("__UNKNOWN_VAL__"))
                     .alias("event_type"),
                     bin_.alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select("event_type", F.col("bin").cast("int").alias("bin"), "n"))


VALUE_HISTOGRAM_SQL = f"""
WITH mm AS (
  SELECT min(CAST(value AS DECIMAL(18,2))) AS mn,
         max(CAST(value AS DECIMAL(18,2))) AS mx
  FROM events)
SELECT coalesce(event_type, '__UNKNOWN_VAL__') AS event_type,
       CAST(least(CAST(CAST((CAST(value AS DECIMAL(18,2)) - mn) * {HIST_BINS} AS DECIMAL(28,2)) >= CAST(mx - mn AS DECIMAL(18,2)) * 1 AS INT) + CAST(CAST((CAST(value AS DECIMAL(18,2)) - mn) * {HIST_BINS} AS DECIMAL(28,2)) >= CAST(mx - mn AS DECIMAL(18,2)) * 2 AS INT) + CAST(CAST((CAST(value AS DECIMAL(18,2)) - mn) * {HIST_BINS} AS DECIMAL(28,2)) >= CAST(mx - mn AS DECIMAL(18,2)) * 3 AS INT) + CAST(CAST((CAST(value AS DECIMAL(18,2)) - mn) * {HIST_BINS} AS DECIMAL(28,2)) >= CAST(mx - mn AS DECIMAL(18,2)) * 4 AS INT) + CAST(CAST((CAST(value AS DECIMAL(18,2)) - mn) * {HIST_BINS} AS DECIMAL(28,2)) >= CAST(mx - mn AS DECIMAL(18,2)) * 5 AS INT) + CAST(CAST((CAST(value AS DECIMAL(18,2)) - mn) * {HIST_BINS} AS DECIMAL(28,2)) >= CAST(mx - mn AS DECIMAL(18,2)) * 6 AS INT) + CAST(CAST((CAST(value AS DECIMAL(18,2)) - mn) * {HIST_BINS} AS DECIMAL(28,2)) >= CAST(mx - mn AS DECIMAL(18,2)) * 7 AS INT) + CAST(CAST((CAST(value AS DECIMAL(18,2)) - mn) * {HIST_BINS} AS DECIMAL(28,2)) >= CAST(mx - mn AS DECIMAL(18,2)) * 8 AS INT) + CAST(CAST((CAST(value AS DECIMAL(18,2)) - mn) * {HIST_BINS} AS DECIMAL(28,2)) >= CAST(mx - mn AS DECIMAL(18,2)) * 9 AS INT), {HIST_BINS - 1}) AS INT) AS bin,
       count(*) AS n
FROM events CROSS JOIN mm
WHERE value IS NOT NULL
GROUP BY 1, 2
"""

RELATIONAL_QUERIES["listagg"] = (listagg_df, LISTAGG_SQL)
RELATIONAL_QUERIES["value_histogram"] = (value_histogram_df,
                                         VALUE_HISTOGRAM_SQL)


def grouping_sets_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping_id: the two single-column
    marginals in one pass (neither ROLLUP nor CUBE — the arbitrary-sets
    form), each row tagged with which grouping produced it.  Uses the
    SQL surface deliberately (GROUPING SETS has no DataFrame shorthand);
    the physical plan is the same single Expand + hash agg."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping_id(l_returnflag, l_linestatus) AS INT) AS gid,
               count(*) AS row_count,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 AS qty_sum
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """)


GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(grouping_id(l_returnflag, l_linestatus) AS INT) AS gid,
       count(*) AS row_count,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_sum
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
"""


def map_funcs_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: build a status→count map per customer
    nation (map_from_entries over a grouped collect), read it back with
    element_at, filter it with map_filter, and list its keys sorted.
    Maps serialize engine-specifically, so the hash-checked outputs are
    the scalar lookups/cardinalities, not the raw map."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    # null statuses coalesce to the standard sentinel BEFORE becoming a
    # map key: Spark hard-aborts on NULL_MAP_KEY where DuckDB would
    # build the map — the null-injected sweep caught the crash (r18).
    # No-op on data with the declared NOT NULL statuses.
    per = (orders.join(cust, orders.o_custkey == cust.c_custkey)
           .groupBy("c_nationkey",
                    F.coalesce("o_orderstatus", F.lit("__UNKNOWN_VAL__"))
                    .alias("o_orderstatus"))
           .agg(F.count(F.lit(1)).alias("n")))
    m = F.map_from_entries(
        F.array_sort(F.collect_list(F.struct("o_orderstatus", "n"))))
    return (per.groupBy("c_nationkey").agg(m.alias("m"))
            .select("c_nationkey",
                    F.size("m").alias("n_statuses"),
                    F.coalesce(F.element_at("m", "F"), F.lit(0).cast("long"))
                    .alias("n_f"),
                    F.size(F.map_filter("m", lambda k, v: v > 100))
                    .alias("n_big"),
                    F.concat_ws(",", F.array_sort(F.map_keys("m")))
                    .alias("statuses_csv")))


MAP_FUNCS_SQL = """
WITH per AS (
  SELECT c_nationkey,
         coalesce(o_orderstatus, '__UNKNOWN_VAL__') AS o_orderstatus,
         count(*) AS n
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2),
m AS (
  SELECT c_nationkey,
         map_from_entries(list_sort(list({'k': o_orderstatus, 'v': n})))
           AS mp
  FROM per GROUP BY c_nationkey)
SELECT c_nationkey,
       CAST(cardinality(mp) AS INT) AS n_statuses,
       coalesce(mp['F'][1], 0) AS n_f,
       CAST(len(list_filter(map_values(mp), v -> v > 100)) AS INT) AS n_big,
       array_to_string(list_sort(map_keys(mp)), ',') AS statuses_csv
FROM m
"""

RELATIONAL_QUERIES["grouping_sets"] = (grouping_sets_df, GROUPING_SETS_SQL)
RELATIONAL_QUERIES["map_funcs"] = (map_funcs_df, MAP_FUNCS_SQL)
