"""Partitioned-layout tests (SURVEY.md §2.A7 / §4.O2): the reference's
month→MapServer-layer routing is a hand-rolled partition-pruning table;
the engine's equivalent is `partitionBy('month')` parquet layout with
Catalyst partition pruning. These tests prove the layout round-trips and
that a month-equality predicate prunes the scan to one partition."""

from __future__ import annotations

from pyspark.sql import functions as F

from dc_moving_violations_cloud_etl_spark import catalog


def test_partitioned_write_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    v = catalog.violations(spark, sf_dir)
    out = str(tmp_path / "violations_by_month")
    v.write.partitionBy("month").mode("overwrite").parquet(out)

    # layout: one directory per month value
    months = sorted(r["month"] for r in v.select("month").distinct().collect())
    dirs = sorted(
        p.name.removeprefix("month=")
        for p in (tmp_path / "violations_by_month").glob("month=*")
    )
    assert dirs == months

    back = spark.read.parquet(out)
    target = months[0]
    pruned = back.where(F.col("month") == target)

    # correctness: pruned read == in-memory filter == direct partition read
    expect = v.where(F.col("month") == target).count()
    assert pruned.count() == expect
    direct = spark.read.parquet(f"{out}/month={target}")
    assert direct.count() == expect

    # pruning: the physical scan carries the month partition filter (no
    # data-file scan outside the selected partition)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "month" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]


def test_month_layer_query_prunes_partitions(spark, sf_dir):
    """The registered partitioned-layout query's scan must carry the
    month as a PartitionFilter (directory-level pruning), not a data
    filter over a flat file."""
    from dc_moving_violations_cloud_etl_spark.queries.source_ops import (
        _PRUNE_MONTH,
        _partitioned_layout_agg,
    )

    import re

    df = _partitioned_layout_agg(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m, "no PartitionFilters in the scan"
    # the month EQUALITY itself must live at the directory level —
    # isnotnull alone (with the literal demoted to a data filter)
    # would mean pruning regressed
    assert re.search(rf"month#\d+ = {_PRUNE_MONTH}", m.group(1)), m.group(1)
    # and the pruned partition is non-empty: the literal matched real
    # directory values (a type-inference change would yield 0 rows)
    assert df.count() > 0
