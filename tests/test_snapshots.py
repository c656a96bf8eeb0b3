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


def test_expire_snapshots_keeps_newest_and_deletes_rest(spark, tmp_path):
    import os

    from dc_moving_violations_cloud_etl_spark.operators.snapshots import (
        expire_snapshots,
        list_versions,
        read_snapshot,
        write_snapshot,
    )

    d = str(tmp_path / "tbl")
    for i in range(3):
        write_snapshot(
            spark.range(i * 10, i * 10 + 5).toDF("x"), d
        )
    assert list_versions(d) == [1, 2, 3]
    expired = expire_snapshots(d, keep_last=2)
    assert expired == [1]
    assert list_versions(d) == [2, 3]
    # retained versions stay readable and unchanged
    assert read_snapshot(spark, d, 2).count() == 5
    assert sorted(
        r["x"] for r in read_snapshot(spark, d, 3).collect()
    ) == [20, 21, 22, 23, 24]
    # the expired directory is gone and its version unresolvable
    assert not os.path.exists(os.path.join(d, "v=1"))
    import pytest as _pytest

    with _pytest.raises(ValueError):
        read_snapshot(spark, d, 1)


def test_expire_snapshots_noop_when_nothing_to_expire(spark, tmp_path):
    from dc_moving_violations_cloud_etl_spark.operators.snapshots import (
        expire_snapshots,
        list_versions,
        write_snapshot,
    )

    d = str(tmp_path / "tbl2")
    write_snapshot(spark.range(3).toDF("x"), d)
    assert expire_snapshots(d, keep_last=5) == []
    assert list_versions(d) == [1]


def test_occ_commit_raises_on_stale_base(spark, tmp_path):
    import pytest as _pytest

    from dc_moving_violations_cloud_etl_spark.operators.snapshots import (
        SnapshotConflictError,
        list_versions,
        write_snapshot_occ,
    )

    d = str(tmp_path / "occ_tbl")
    # first writer: empty table, expected None
    v1 = write_snapshot_occ(spark.range(3).toDF("x"), d, None)
    assert v1 == 1
    # writer A reads latest=1, writer B commits first
    v2 = write_snapshot_occ(spark.range(5).toDF("x"), d, 1)
    assert v2 == 2
    # writer A's commit (still based on v1) must fail, not last-wins
    with _pytest.raises(SnapshotConflictError):
        write_snapshot_occ(spark.range(9).toDF("x"), d, 1)
    assert list_versions(d) == [1, 2]
    # retry after re-reading the manifest succeeds
    v3 = write_snapshot_occ(spark.range(9).toDF("x"), d, 2)
    assert v3 == 3


def test_expire_snapshots_retention_defers_delete(spark, tmp_path):
    """Two-phase expire (ADVICE r4): with a retention window the expired
    version is UNPUBLISHED immediately (invisible through the manifest)
    but its directory survives until it ages out — an in-flight reader
    that resolved the old manifest can finish its scan."""
    import os

    from dc_moving_violations_cloud_etl_spark.operators.snapshots import (
        expire_snapshots,
        list_versions,
        read_snapshot,
        write_snapshot,
    )

    d = str(tmp_path / "tbl3")
    write_snapshot(spark.range(5).toDF("x"), d)
    write_snapshot(spark.range(7).toDF("x"), d)
    expired = expire_snapshots(d, keep_last=1, retention_s=3600)
    assert expired == [1]
    # unpublished: manifest no longer resolves v1 ...
    assert list_versions(d) == [2]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        read_snapshot(spark, d, 1)
    # ... but the data files are still on disk for in-flight readers
    assert os.path.exists(os.path.join(d, "v=1"))
    assert spark.read.parquet(os.path.join(d, "v=1")).count() == 5
    # the grace window is fixed at unpublish time (ADVICE r5): a later
    # pass with the DEFAULT retention_s=0 must NOT shorten the promise
    assert expire_snapshots(d, keep_last=1, retention_s=0) == []
    assert os.path.exists(os.path.join(d, "v=1"))
    # age the ledgered deadline out, then any pass sweeps it
    import json

    ledger_path = os.path.join(d, "_expired.json")
    with open(ledger_path) as f:
        ledger = json.load(f)
    with open(ledger_path, "w") as f:
        json.dump({k: 0.0 for k in ledger}, f)
    assert expire_snapshots(d, keep_last=1, retention_s=0) == []
    assert not os.path.exists(os.path.join(d, "v=1"))
