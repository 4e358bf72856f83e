"""literal_df (functions/localrel.py) — the Python-worker-free metadata
frame must be ROW-IDENTICAL to plain createDataFrame, including None
cells (the pandas/Arrow route would silently coerce None -> NaN if a
column ever left dtype=object), and must not plan any Python stage."""

from __future__ import annotations

from ringo_spark.functions.localrel import literal_df


def _rows(df):
    return sorted(
        [tuple(r) for r in df.collect()],
        key=lambda t: tuple(str(x) for x in t))


def test_literal_df_matches_createdataframe(spark):
    schema = ("cid int, cvec array<double>, name string, ok boolean, "
              "n long, x double")
    rows = [
        (0, [1.0, 2.5, -3.125], "plain", True, 7, 0.1),
        (1, [], "quo'te\\back\nslash", False, None, None),
        (2, None, None, None, 2**40, float("1e300")),
    ]
    a = literal_df(spark, rows, schema)
    b = spark.createDataFrame(rows, schema)
    assert a.schema == b.schema
    assert _rows(a) == _rows(b)


def test_literal_df_plans_no_python_stage(spark):
    df = literal_df(spark, [(i, float(i)) for i in range(64)],
                    "cid int, v double")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan            # the old parallelize path showed
    # data-backed, not expression-backed (Spark 4's Arrow route lands a
    # true LocalTableScan; an RDD-backed Scan ExistingRDD is also fine)
    assert "LocalTableScan" in plan or "Scan ExistingRDD" in plan


def test_literal_df_fallback_keeps_values(spark):
    # binary is outside the Arrow allow-list: must silently take the
    # plain createDataFrame path with identical rows
    rows = [(1, bytearray(b"\x00\xff")), (2, None)]
    a = literal_df(spark, rows, "k int, payload binary")
    b = spark.createDataFrame(rows, "k int, payload binary")
    assert _rows(a) == _rows(b)
