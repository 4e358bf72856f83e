"""Bucketed co-located joins: storing both parent-join sides bucketed by
the FK eliminates the shuffle (no Exchange feeding the join)."""

import pytest
from pyspark.sql import functions as F

from ringo_spark.catalog import load_catalog
from ringo_spark.sources.bucketing import bucketize_for_fact_join
from ringo_spark.testbed import LINEITEM, ORDERS

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark):
    cat = load_catalog(spark, SF, [ORDERS, LINEITEM])
    bucketed = bucketize_for_fact_join(
        spark, cat, [("lineitem", "l_orderkey", "orders", "o_orderkey")],
        num_buckets=4)
    li, od = bucketed["lineitem"], bucketed["orders"]
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(od, li.l_orderkey == od.o_orderkey, "left")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: bucketed scan both sides
        # and the data is intact
        assert joined.count() == cat["lineitem"].count()

        # the unbucketed same join shuffles both sides
        plain = (cat["lineitem"].join(
            cat["orders"],
            cat["lineitem"].l_orderkey == cat["orders"].o_orderkey, "left"))
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        for t in ("bkt_lineitem", "bkt_orders"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_composite_fk_buckets_on_all_columns(spark):
    """A composite join key must bucket on ALL its columns: Spark elides
    the Exchange only when the join keys equal the bucket spec, so a
    first-column-only bucketing silently shuffles (ADVICE r05)."""
    cat = load_catalog(spark, SF, [ORDERS, LINEITEM])
    li = cat["lineitem"].withColumn("part", F.col("l_orderkey") % 4)
    od = cat["orders"].withColumn("part", F.col("o_orderkey") % 4)
    bucketed = bucketize_for_fact_join(
        spark, {"li2": li, "od2": od},
        [("li2", ("l_orderkey", "part"), "od2", ("o_orderkey", "part"))],
        num_buckets=4)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        l, o = bucketed["li2"], bucketed["od2"]
        joined = l.join(o, (l.l_orderkey == o.o_orderkey)
                        & (l.part == o.part), "left")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        for t in ("bkt_li2", "bkt_od2"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_conflicting_bucket_keys_raise(spark):
    """One table, two different bucket keys: refuse instead of silently
    overwriting the first layout (the second join would shuffle anyway)."""
    cat = load_catalog(spark, SF, [ORDERS, LINEITEM])
    with pytest.raises(ValueError, match="two different bucket keys"):
        bucketize_for_fact_join(
            spark, cat,
            [("lineitem", "l_orderkey", "orders", "o_orderkey"),
             ("lineitem", "l_suppkey", "orders", "o_orderkey")],
            num_buckets=4)
    for t in ("bkt_lineitem", "bkt_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
