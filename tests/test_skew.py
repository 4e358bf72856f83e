"""Salted two-phase aggregation / replicated salted join equal their
unsalted counterparts (correctness; the win is partition balance)."""

from pyspark.sql import functions as F

from ringo_spark.functions.skew import (
    salted_aggregate, salted_broadcast_left_join,
)


def test_salted_aggregate_matches_plain(spark):
    # 90% of rows share one key: the classic hot-key shape
    df = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(
            (F.col("id") % 97).cast("string")).alias("k"),
        (F.col("id") % 7).alias("v"))
    got = salted_aggregate(
        df, ["k"],
        {"n": F.count(F.lit(1)), "v_sum": F.sum("v"), "v_max": F.max("v")},
        salt_col="v", buckets=8,
        merges={"v_max": F.max("v_max")},
    )
    want = df.groupBy("k").agg(F.count(F.lit(1)).alias("n"),
                               F.sum("v").alias("v_sum"),
                               F.max("v").alias("v_max"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_join_matches_plain(spark):
    big = spark.range(5_000).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("payload"))
    medium = spark.range(5).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("dim_val"))
    got = salted_broadcast_left_join(big, medium, on=["k"], buckets=4)
    want = big.join(medium, on=["k"], how="left")
    assert sorted(map(tuple, got.select("k", "payload", "dim_val").collect())) \
        == sorted(map(tuple, want.select("k", "payload", "dim_val").collect()))


def test_spread_is_identity_on_well_split_input(spark):
    """spread() must NEVER down-shuffle a corpus that already has at
    least session-parallelism partitions — on a real many-split corpus
    it is the identity (same DataFrame object, no added Exchange)."""
    from ringo_spark.functions.spread import spread

    target = spark.sparkContext.defaultParallelism
    wide = spark.range(10_000).repartition(target + 4)
    assert spread(wide) is wide
    narrow = spark.range(10_000).coalesce(1)
    out = spread(narrow)
    assert out is not narrow
    assert out.rdd.getNumPartitions() == target


def test_salted_tenant_rollup_equals_plain_rollup(spark):
    """The registered salted twin (r15, VERDICT r14 item 5) equals the
    plain one-phase rollup cell-for-cell on the skew-injected corpus —
    the salt changes the shuffle layout, never the result — and the
    injection is real: the hot tenant owns the majority of rows."""
    from pyspark.sql import functions as F

    from ringo_spark.operators.rollup_grain import (
        _skewed_tenant, tenant_rollup_skew_salted_df,
    )

    SF = "/root/testdata/sf0.001"
    got = {tuple(r) for r in
           tenant_rollup_skew_salted_df(spark, SF).collect()}

    ev = spark.read.parquet(f"{SF}/events.parquet")
    uid = F.coalesce(F.col("user_id"), F.lit(-1))
    plain = (ev.select(_skewed_tenant(uid).alias("tenant"),
                       F.col("value").cast("decimal(18,2)").alias("v"))
             .groupBy("tenant")
             .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                  F.sum("v").cast("double").alias("value_sum"),
                  F.max("v").cast("double").alias("value_max"),
                  F.min("v").cast("double").alias("value_min")))
    assert got == {tuple(r) for r in plain.collect()} and got
    counts = sorted(n for _, n, *_ in got)
    assert counts[-1] > sum(counts) / 2   # hot tenant: majority of rows


def test_salted_count_distinct_is_exact(spark):
    """Value-hash salting keeps exact-distinct EXACT (the saltagg probe
    finding, pinned): salting phase 1 by hash(distinct_col) puts each
    distinct value in exactly one bucket, so the per-bucket distinct
    counts SUM to the true distinct count — unlike a row-salt, which
    would double-count values straddling buckets."""
    from pyspark.sql import functions as F

    from ringo_spark.functions.skew import salted_aggregate

    ev = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
          .select(F.coalesce(F.col("user_id"), F.lit(-1)).alias("tenant"),
                  "event_type"))   # few distinct values, heavy repeats
    plain = {(r.tenant, r.n) for r in
             ev.groupBy("tenant")
             .agg(F.count_distinct("event_type").alias("n")).collect()}
    salted = {(r.tenant, r.n) for r in salted_aggregate(
        ev, ["tenant"], {"n": F.count_distinct("event_type")},
        salt_col="event_type", buckets=4).collect()}
    assert salted == plain and plain


def test_salt_expression_has_one_definition():
    """VERDICT r16 item 4: the pmod-hash salt lives ONLY in
    functions/skew.py's salt_expr — a copy-pasted fourth site could
    silently regress the INT_MIN lesson the helper pins."""
    import os

    import ringo_spark

    pkg = os.path.dirname(ringo_spark.__file__)
    offenders = []
    for root, _, files in os.walk(pkg):
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            src = open(path).read()
            if "pmod(F.hash" in src.replace(" ", "") and \
                    not path.endswith(os.path.join("functions", "skew.py")):
                offenders.append(path)
    assert offenders == []
