"""Bucketed co-located join test (100 TB posture): writing both join
sides bucketed on the join key lets Spark join them WITHOUT any shuffle
exchange — the layout a large deployment uses for repeated fact⋈fact
merges (e.g. the upsert sinks' existing⋈incoming joins on the PK)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dc_moving_violations_cloud_etl_spark import catalog

N_BUCKETS = 8


def test_bucketed_join_runs_without_exchange(spark, sf_dir):
    v = catalog.violations(spark, sf_dir).select(
        "violation_id", "month", "fine_amount"
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for t in ("v_bucket_a", "v_bucket_b"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            (
                v.write.bucketBy(N_BUCKETS, "violation_id")
                .sortBy("violation_id")
                .mode("overwrite")
                .saveAsTable(t)
            )
        a = spark.table("v_bucket_a")
        b = spark.table("v_bucket_b").select(
            "violation_id", F.col("fine_amount").alias("fine_b")
        )
        j = a.join(b, "violation_id")
        assert j.count() == v.count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        # co-located: both sides read pre-bucketed — no shuffle exchange
        assert "Exchange hashpartitioning" not in plan, plan[:800]
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        for t in ("v_bucket_a", "v_bucket_b"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucket_pruning_selects_one_bucket(spark, sf_dir):
    """Point predicates on the bucket key must PRUNE the scan to one
    bucket (SelectedBucketsCount: 1 out of 8) — the read-side payoff of
    bucketed layout beyond shuffle-free joins: a PK probe touches 1/N
    of the files. autoBucketedScan is disabled for the probe because
    the planner otherwise falls back to a plain file scan when no join
    needs the bucketed distribution (pruning rides ON the bucketed
    scan)."""
    from dc_moving_violations_cloud_etl_spark import catalog
    from pyspark.sql import functions as F

    saved = spark.conf.get(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", None
    )
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
    )
    spark.sql("DROP TABLE IF EXISTS bucket_prune_probe")
    try:
        (
            catalog.base(spark, sf_dir, "lineitem")
            .write.mode("overwrite")
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .saveAsTable("bucket_prune_probe")
        )
        df = (
            spark.table("bucket_prune_probe")
            .where(F.col("l_orderkey") == 42)
            .select("l_orderkey", "l_quantity")
        )
        explained = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "SelectedBucketsCount: 1 out of 8" in explained, explained[:1200]
    finally:
        spark.sql("DROP TABLE IF EXISTS bucket_prune_probe")
        if saved is None:
            spark.conf.unset(
                "spark.sql.sources.bucketing.autoBucketedScan.enabled"
            )
        else:
            spark.conf.set(
                "spark.sql.sources.bucketing.autoBucketedScan.enabled", saved
            )
