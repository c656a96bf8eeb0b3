"""Physical-plan assertions (SURVEY.md §4): the optimizations the engine
relies on must actually appear in the executed plan — broadcast of the
dimension side, predicate/column pushdown to the parquet scan, and
whole-stage codegen on the reference query surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dc_moving_violations_cloud_etl_spark import catalog
from dc_moving_violations_cloud_etl_spark.queries import QUERIES, get_queries

get_queries()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_qd_join_is_broadcast(spark, sf_dir):
    """E1/O9: the fact⋈weather join must broadcast the ~2.5k-row
    dimension, never shuffle the fact side."""
    plan = _plan(QUERIES["qd_rainy_day_tickets"].build(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_qb_filter_pushed_to_scan(spark, sf_dir):
    """O1: the date predicate must reach the parquet reader (shows up as
    a pushed filter on the shipdate column the view derives from)."""
    df = catalog.base(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") >= "1998-01-01"
    )
    plan = _plan(df.select("l_orderkey"))
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    """O3: a two-column projection must scan two columns, not the table."""
    df = catalog.base(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    plan = _plan(df)
    scan = plan.split("FileScan", 1)[1]
    read_schema = scan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_comment" not in read_schema


def test_reference_queries_use_wholestage_codegen(spark, sf_dir):
    """The reference surface must stay JVM-side: every Qa–Qh plan runs
    inside WholeStageCodegen spans and contains no Python evaluation."""
    for name in (
        "qa_monthly_agency_tickets",
        "qc_avg_tickets_per_weekday",
        "qh_accidents_rain_vs_dry",
    ):
        df = QUERIES[name].build(spark, sf_dir)
        df.collect()  # finalize the AQE plan — codegen shows post-execution
        plan = _plan(df)
        # codegen spans print as `*(n)` stage markers in the plan string
        assert "*(" in plan, name
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_no_cartesian_products_anywhere(spark, sf_dir):
    """No registered query may plan a cartesian product (the broadcast
    nested loop in the brute-force ANN baseline is the one deliberate
    exception — a broadcast of the tiny query set, not a shuffle
    cartesian)."""
    for name, spec in QUERIES.items():
        if name.startswith("stream_"):
            continue  # streaming queries execute at build time
        plan = _plan(spec.build(spark, sf_dir))
        assert "CartesianProduct" not in plan, name


def test_asof_join_plans_no_join_operator(spark, sf_dir):
    """The as-of join must compile to union + ONE windowed carry — no
    join node at all (a naive inequality join would plan a per-key
    nested loop)."""
    plan = _plan(QUERIES["asof_click_before_error"].build(spark, sf_dir))
    for node in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                 "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert node not in plan
    assert "Window" in plan


def test_range_join_plans_hash_equi_join(spark, sf_dir):
    """The bounded range join must plan a HASH equi-join on
    (key, bucket) — never the nested-loop/cartesian a raw inequality
    join degenerates to."""
    plan = _plan(QUERIES["range_click_before_error"].build(spark, sf_dir))
    assert "HashJoin" in plan  # Broadcast- or Shuffled-, both are equi
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
