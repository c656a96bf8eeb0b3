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
