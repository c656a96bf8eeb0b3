"""Salted-join correctness + plan shape: result equals the plain join,
and the shuffle key carries the salt column."""

from __future__ import annotations

from pyspark.sql import functions as F

from dc_moving_violations_cloud_etl_spark import catalog
from dc_moving_violations_cloud_etl_spark.operators.skew import salted_join


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = catalog.base(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    orders = catalog.base(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    salted = salted_join(li, orders, "l_orderkey", salt_col="l_linenumber", salt=8)
    plain = li.join(orders, "l_orderkey")
    cols = sorted(salted.columns)
    assert cols == sorted(plain.columns)
    got = sorted(map(tuple, salted.select(*cols).collect()))
    want = sorted(map(tuple, plain.select(*cols).collect()))
    assert got == want and len(got) > 0


def test_salted_join_key_carries_salt(spark, sf_dir):
    li = catalog.base(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    orders = catalog.base(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    df = salted_join(li, orders, "l_orderkey", salt_col="l_linenumber", salt=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan  # the join/shuffle key includes the salt
    assert "CartesianProduct" not in plan


def test_salted_join_is_deterministic_under_retry(spark, sf_dir):
    """The salt must be a pure function of row data (no rand()): two
    evaluations give identical assignments."""
    li = catalog.base(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    orders = catalog.base(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    a = sorted(map(tuple, salted_join(li, orders, "l_orderkey", "l_linenumber").collect()))
    b = sorted(map(tuple, salted_join(li, orders, "l_orderkey", "l_linenumber").collect()))
    assert a == b
