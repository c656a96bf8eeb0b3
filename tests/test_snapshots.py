"""Operator-level contracts of the snapshot-versioned table
(operators/snapshots.py): monotone version numbering, manifest-gated
visibility (uncommitted directories are invisible), and immutability of
published versions under later writes."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dc_moving_violations_cloud_etl_spark.operators.snapshots import (
    list_versions,
    read_snapshot,
    write_snapshot,
)


def test_versions_accumulate_and_resolve(spark, tmp_path):
    d = str(tmp_path / "tbl")
    assert write_snapshot(spark.range(3), d) == 1
    assert write_snapshot(spark.range(5), d) == 2
    assert list_versions(d) == [1, 2]
    assert read_snapshot(spark, d, 1).count() == 3
    assert read_snapshot(spark, d, 2).count() == 5
    # default = latest
    assert read_snapshot(spark, d).count() == 5


def test_unpublished_directory_is_invisible(spark, tmp_path):
    d = str(tmp_path / "tbl")
    write_snapshot(spark.range(3), d)
    # a crashed writer's directory without a manifest entry must not
    # resolve — visibility is manifest-gated, not directory-gated
    spark.range(99).write.parquet(os.path.join(d, "v=2"))
    assert list_versions(d) == [1]
    assert read_snapshot(spark, d).count() == 3
    with pytest.raises(ValueError):
        read_snapshot(spark, d, 2)


def test_published_version_immutable_under_later_writes(spark, tmp_path):
    d = str(tmp_path / "tbl")
    write_snapshot(spark.range(10).withColumn("x", F.lit(1)), d)
    first = read_snapshot(spark, d, 1).agg(F.sum("x")).collect()[0][0]
    write_snapshot(spark.range(10).withColumn("x", F.lit(100)), d)
    # v1 re-read after the v2 commit is bit-identical to before
    assert read_snapshot(spark, d, 1).agg(F.sum("x")).collect()[0][0] == first
    assert read_snapshot(spark, d, 2).agg(F.sum("x")).collect()[0][0] == 1000


def test_missing_table_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, str(tmp_path / "absent"))
