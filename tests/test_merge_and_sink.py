"""Unit coverage for the round-4 MERGE matrix operator and the custom
Python DataSource writer's commit protocol (the oracle-parity test
checks their query-level results; these pin the operator-level
contracts directly)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from dc_moving_violations_cloud_etl_spark.operators.sinks import merge_matrix


def _merge(spark):
    target = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")], "k int, n int, s string"
    )
    source = spark.createDataFrame(
        [(2, 5, "b2", False), (3, 0, "c2", True), (4, 40, "d", False)],
        "k int, n int, s string, kill boolean",
    )
    return merge_matrix(
        target,
        source,
        ["k"],
        delete_cond=F.col("s.kill"),
        update_cols={
            "n": F.col("t.n") + F.col("s.n"),
            "s": F.col("s.s"),
        },
    )


def test_merge_matrix_covers_all_four_cells(spark):
    rows = {r["k"]: r for r in _merge(spark).collect()}
    # carry: untouched target row unchanged
    assert rows[1]["n"] == 10 and rows[1]["s"] == "a"
    assert rows[1]["_action"] == "carry"
    # update: additive columns applied
    assert rows[2]["n"] == 25 and rows[2]["s"] == "b2"
    assert rows[2]["_action"] == "update"
    # delete: matched row with delete_cond is gone
    assert 3 not in rows
    # insert: source-only key present with source values
    assert rows[4]["n"] == 40 and rows[4]["s"] == "d"
    assert rows[4]["_action"] == "insert"
    assert len(rows) == 3


def test_merge_matrix_empty_source_is_identity(spark):
    target = spark.createDataFrame([(1, 10), (2, 20)], "k int, n int")
    source = spark.createDataFrame([], "k int, n int, kill boolean")
    out = merge_matrix(
        target,
        source,
        ["k"],
        delete_cond=F.col("s.kill"),
        update_cols={"n": F.col("t.n") + F.col("s.n")},
    )
    got = {(r["k"], r["n"], r["_action"]) for r in out.collect()}
    assert got == {(1, 10, "carry"), (2, 20, "carry")}


def test_py_sink_commit_manifest_and_staging_clean(spark, tmp_path):
    from dc_moving_violations_cloud_etl_spark.sources.py_sink import (
        SINK_NAME,
        make_jsonl_sink,
    )

    spark.dataSource.register(make_jsonl_sink())
    df = spark.range(100).select(
        F.col("id").alias("event_id"), (F.col("id") % 7).alias("user_id")
    )
    out = str(tmp_path / "sink")
    df.repartition(3).write.format(SINK_NAME).mode("append").save(out)

    with open(os.path.join(out, "_MANIFEST")) as f:
        manifest = json.load(f)
    assert manifest["n_rows"] == 100
    part_files = [p for p in os.listdir(out) if p.startswith("part-")]
    assert sorted(part_files) == manifest["files"]
    assert len(part_files) == 3
    # staging dir must hold no orphans after a successful commit
    staging = os.path.join(out, "_staging")
    assert not os.path.exists(staging) or os.listdir(staging) == []
    # committed data is complete and readable
    back = spark.read.schema("event_id long, user_id long").json(
        os.path.join(out, "part-*.jsonl")
    )
    assert back.count() == 100
    assert back.agg(F.sum("event_id")).collect()[0][0] == 4950
