"""Z-order layout operator: Morton-code correctness, clustering plan
shape, and the locality property the layout exists to provide."""

from __future__ import annotations

from pyspark.sql import functions as F

from dc_moving_violations_cloud_etl_spark import catalog
from dc_moving_violations_cloud_etl_spark.operators.layout import (
    bucketize,
    cluster_by_zorder,
    zorder_key,
)


def _morton_py(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_reference_interleave(spark):
    pts = [(x, y) for x in (0, 1, 5, 130, 255) for y in (0, 3, 77, 255)]
    df = spark.createDataFrame(pts, "x int, y int")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zorder_key([F.col("x"), F.col("y")]).alias("z")
        ).collect()
    }
    for (x, y), z in got.items():
        assert z == _morton_py(x, y), (x, y)


def test_zorder_key_is_codegen_expression(spark):
    df = spark.range(10).select(
        zorder_key([F.col("id"), F.col("id")]).alias("z")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cluster_by_zorder_range_shuffles_and_bounds_rectangles(spark, sf_dir):
    ev = catalog.base(spark, sf_dir, "events").select("user_id", "value")
    z = zorder_key(
        [bucketize(F.col("user_id"), 256), bucketize(F.col("value"), 256)]
    )
    out = cluster_by_zorder(ev, z, partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    # locality: each clustered partition spans a far smaller (x, y)
    # rectangle than the full 256x256 domain
    spans = (
        out.withColumn("x", bucketize(F.col("user_id"), 256))
        .withColumn("y", bucketize(F.col("value"), 256))
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("xs"),
            (F.max("y") - F.min("y")).alias("ys"),
        )
        .collect()
    )
    assert len(spans) > 1
    avg_area = sum((r.xs + 1) * (r.ys + 1) for r in spans) / len(spans)
    assert avg_area < 256 * 256 / 2, avg_area


def test_bucketize_sign_safe(spark):
    df = spark.createDataFrame([(-300.7,), (-1.0,), (0.2,), (300.9,)], "v double")
    vals = [r.b for r in df.select(bucketize(F.col("v"), 256).alias("b")).collect()]
    assert all(0 <= b < 256 for b in vals)
