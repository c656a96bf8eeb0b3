"""Distributed global ranking (operators/ranking.py, VERDICT r4 rec #4):
exact equivalence to the unpartitioned-window rank, and plans whose only
single-partition exchange carries the constant-size offset ledger —
never the data."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dc_moving_violations_cloud_etl_spark.operators.ranking import (
    global_rank,
    global_topk,
)


def _scrambled(spark, n=997):
    # deterministic, tie-heavy, hash-scrambled partition placement
    return (
        spark.range(n)
        .repartition(8)
        .select(
            F.col("id").alias("k"),
            (F.xxhash64("id") % 50).alias("v"),
        )
    )


def test_global_rank_equals_window_rank(spark):
    df = _scrambled(spark)
    got = global_rank(df, F.desc("v"), F.asc("k"), alias="r")
    want = df.withColumn(
        "r",
        F.row_number()
        .over(Window.orderBy(F.desc("v"), F.asc("k")))
        .cast("long"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_global_rank_is_dense_and_unique(spark):
    df = _scrambled(spark, 501)
    ranks = [
        r["r"]
        for r in global_rank(df, F.asc("v"), F.asc("k"), alias="r")
        .select("r")
        .collect()
    ]
    assert sorted(ranks) == list(range(1, 502))


def test_global_topk_equals_window_topk(spark):
    df = _scrambled(spark)
    got = global_topk(df, 10, F.desc("v"), F.asc("k"), alias="r")
    want = (
        df.withColumn(
            "r",
            F.row_number()
            .over(Window.orderBy(F.desc("v"), F.asc("k")))
            .cast("long"),
        )
        .where(F.col("r") <= 10)
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_global_rank_plan_no_data_sized_single_partition(spark):
    """The data path must stay range-partitioned: any SinglePartition
    exchange in the plan may only feed the per-partition-count offset
    ledger (input = one row per partition, i.e. below an aggregate on
    the synthetic partition-id key)."""
    plan = _plan(global_rank(_scrambled(spark), F.asc("v"), F.asc("k")))
    assert "rangepartitioning" in plan.lower()
    for chunk in plan.split("Exchange SinglePartition")[1:]:
        # the subtree below the single-partition exchange must reduce to
        # the per-pid count aggregate before any data-sized input
        assert "HashAggregate" in chunk.split("Exchange", 1)[0] or (
            "HashAggregate" in chunk[:600]
        ), plan


def test_global_topk_plan_prereduces_before_global_window(spark):
    """The first (parallel) window keyed by SPARK_PARTITION_ID must
    appear below the final unpartitioned window, so the global ordering
    only ever sees <= k x numPartitions rows."""
    plan = _plan(global_topk(_scrambled(spark), 5, F.asc("v"), F.asc("k")))
    assert "SPARK_PARTITION_ID" in plan
    first_win = plan.index("Window")
    assert "SPARK_PARTITION_ID" in plan[first_win:], plan


def test_global_rank_property_random_data(spark):
    """Hypothesis-style property sweep without per-example Spark jobs
    (one job per case is already slow): several adversarial datasets —
    all-equal keys, pre-sorted, reverse-sorted, heavy ties, singleton —
    must all rank identically to the single-window reference."""
    cases = [
        [(i, 7) for i in range(100)],            # all sort-values equal
        [(i, i) for i in range(100)],            # pre-sorted
        [(i, -i) for i in range(100)],           # reverse-sorted
        [(i, i % 3) for i in range(101)],        # heavy ties
        [(0, 42)],                               # singleton
        [(i, (i * 37) % 11) for i in range(257)],  # scrambled, odd size
    ]
    for rows in cases:
        df = spark.createDataFrame(rows, "k long, v long").repartition(7)
        got = {
            (r["k"], r["r"])
            for r in global_rank(df, F.asc("v"), F.asc("k"), alias="r")
            .select("k", "r")
            .collect()
        }
        want = {
            (r["k"], r["r"])
            for r in df.withColumn(
                "r",
                F.row_number()
                .over(Window.orderBy(F.asc("v"), F.asc("k")))
                .cast("long"),
            )
            .select("k", "r")
            .collect()
        }
        assert got == want, rows[:5]
