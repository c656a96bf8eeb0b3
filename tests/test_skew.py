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


def test_aqe_runtime_skew_split_fires(spark):
    """The OTHER half of the skew story: AQE's runtime skew-join split
    must actually fire on a hot key when the sort-merge path is taken —
    the plan's SortMergeJoin carries ``skew=true`` and the result is
    unchanged. (Manual salting above is the planner-independent
    fallback; AQE is the default remediation on a 100 TB cluster.)
    Conf changes are confined to a guard and restored — the session is
    shared across the whole test run."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        # the split must fire even when AQE judges it would add a
        # shuffle (the downstream aggregate re-partitions anyway); in
        # the full suite AQE's cost check is order-sensitive without it
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    olds = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # 80% of fact rows share key 7 — one shuffle partition dwarfs
        # the rest until AQE splits it
        fact = spark.range(0, 400000).select(
            F.when(F.col("id") % 5 != 0, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            (F.col("id") % 100).alias("payload"),
        )
        dim = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("attr")
        )
        j = fact.join(dim, "k").groupBy("attr").agg(F.count("*").alias("n"))
        rows = {r["attr"]: r["n"] for r in j.collect()}
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
        # result sanity: the hot key holds exactly the 4-out-of-5 rows
        # (ids with id%1000==7 all have id%5==2, so they took the hot
        # branch too — no extra residue share lands on key 7)
        assert rows[14] == 320000
    finally:
        for k, v in olds.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark, sf_dir):
    """AQE's runtime skew mitigation — the OTHER half of the skew story
    next to explicit salting: with skew thresholds scaled to the
    fixture, a deliberately hot-keyed sort-merge join must come back
    with its skewed partition SPLIT (``SortMergeJoin(skew=true)`` in
    the final adaptive plan). This is the mechanism a 1000-executor job
    leans on when a hot key appears at runtime with no pre-planned
    salt. Two structural preconditions this test pins (found
    empirically): BOTH join children must be plain shuffles — an
    aggregate between the sort and the shuffle stage defeats the rule's
    pattern match — and the map side needs >1 task, or the hot reduce
    partition has no mapper ranges to split by (the fixture's single
    parquet file arrives as one map task; repartition(16) restores the
    multi-mapper shape a real cluster always has)."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1024",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1024",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # the downstream global aggregate would otherwise veto a split
        # that adds a shuffle — force it, exactly the trade a real hot
        # key warrants
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = catalog.base(spark, sf_dir, "lineitem").repartition(16)
        orders = catalog.base(spark, sf_dir, "orders").repartition(16)

        def hot(c):
            return F.when(c % 50 != 0, F.lit(1)).otherwise(c)

        left = li.select(hot(F.col("l_orderkey")).alias("k"), "l_quantity")
        right = orders.select(
            hot(F.col("o_orderkey")).alias("k"), "o_totalprice"
        )
        joined = left.join(right, "k").agg(F.count(F.lit(1)).alias("n"))
        assert joined.collect()[0]["n"] > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_join_rejects_outer_types(spark, sf_dir):
    """Salting replicates every dim row per salt value, so an outer
    join type that keeps unmatched DIM rows would emit `salt` copies
    of each (r10 review finding) — the operator must refuse instead
    of silently corrupting."""
    import pytest

    from dc_moving_violations_cloud_etl_spark.operators.skew import salted_join

    facts = spark.createDataFrame([(1, 100)], "k int, sc int")
    dim = spark.createDataFrame([(1, "a"), (2, "orphan")], "k int, d string")
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="not salt-sound"):
            salted_join(facts, dim, "k", "sc", salt=4, how=how)
    # left join stays sound: unmatched FACT rows are not replicated
    out = salted_join(facts, dim, "k", "sc", salt=4, how="left").collect()
    assert len(out) == 1
