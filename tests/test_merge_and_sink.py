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


def test_stream_sink_commit_sweeps_unreferenced_orphans(tmp_path):
    """Crash-window hygiene (ADVICE r4): a commit that died after some
    staged->final renames but before the manifest write leaves
    committed-looking part files referenced by NO manifest; the next
    commit must sweep them, publish its manifest atomically, and never
    name a missing file."""
    import types

    from dc_moving_violations_cloud_etl_spark.sources.py_sink import (
        make_jsonl_stream_sink,
    )

    out = str(tmp_path / "ssink")
    os.makedirs(os.path.join(out, "_staging"))
    # debris of a crashed previous commit: final-named, no manifest
    orphan = os.path.join(out, "part-00000-deadbeef0000.jsonl")
    with open(orphan, "w") as f:
        f.write('{"x": 1}\n')
    # a file referenced by a published manifest must survive
    kept = os.path.join(out, "part-00000-cafecafe0000.jsonl")
    with open(kept, "w") as f:
        f.write('{"x": 2}\n')
    with open(os.path.join(out, "_BATCH0_MANIFEST"), "w") as f:
        json.dump({"batch_id": 0, "n_rows": 1,
                   "files": [os.path.basename(kept)]}, f)

    writer = make_jsonl_stream_sink()({"path": out}).streamWriter(None, False)
    staged = os.path.join(out, "_staging", "part-00001-aaaa.jsonl")
    with open(staged, "w") as f:
        f.write('{"x": 3}\n{"x": 4}\n')
    final = os.path.join(out, "part-00001-aaaa.jsonl")
    msg = types.SimpleNamespace(staged=staged, final=final, n_rows=2)
    writer.commit([msg], 1)

    assert not os.path.exists(orphan), "unreferenced orphan not swept"
    assert os.path.exists(kept), "manifest-referenced file was swept"
    assert os.path.exists(final)
    with open(os.path.join(out, "_BATCH1_MANIFEST")) as f:
        m = json.load(f)
    assert m["files"] == [os.path.basename(final)]
    assert m["n_rows"] == 2
    # every manifest-named file exists (no manifest names a missing file)
    for man in ("_BATCH0_MANIFEST", "_BATCH1_MANIFEST"):
        with open(os.path.join(out, man)) as f:
            for name in json.load(f)["files"]:
                assert os.path.exists(os.path.join(out, name))


def test_merge_matrix_null_delete_cond_updates_not_deletes(spark):
    """ANSI MERGE: a NULL delete condition is NOT satisfied — the
    matched row must take the update branch. Pre-r10-review,
    three-valued logic made where(~(matched & NULL)) drop the row
    silently (r10 review finding)."""
    target = spark.createDataFrame([(1, 10)], "k int, n int")
    source = spark.createDataFrame(
        [(1, 5, None)], "k int, n int, kill boolean"
    )
    out = merge_matrix(
        target,
        source,
        ["k"],
        delete_cond=F.col("s.kill"),
        update_cols={"n": F.col("t.n") + F.col("s.n")},
    ).collect()
    assert len(out) == 1
    assert out[0]["n"] == 15 and out[0]["_action"] == "update"


def test_sinks_null_key_replay_is_fixpoint(spark):
    """The module's standing invariant — merging the same batch twice
    is a fixpoint — must hold for NULL key values too: plain `=` never
    matches NULL = NULL, so pre-fix the NULL-keyed row was re-appended
    on every replay (r10 review finding)."""
    from dc_moving_violations_cloud_etl_spark.operators.sinks import (
        insert_if_absent,
        upsert_last_writer_wins,
    )

    existing = spark.createDataFrame(
        [(1, "a"), (None, "nul")], "k int, v string"
    )
    batch = spark.createDataFrame(
        [(2, "b"), (None, "nul2")], "k int, v string"
    )
    def canon(df):
        return sorted(
            map(tuple, df.collect()),
            key=lambda t: tuple((x is None, x) for x in t),
        )

    once = insert_if_absent(existing, batch, ["k"])
    twice = insert_if_absent(once, batch, ["k"])
    assert once.count() == 3  # NULL key already present -> not inserted
    assert canon(once) == canon(twice)
    up_once = upsert_last_writer_wins(existing, batch, ["k"])
    up_twice = upsert_last_writer_wins(up_once, batch, ["k"])
    rows = canon(up_once)
    assert len(rows) == 3  # NULL-key row REPLACED, not duplicated
    assert ("nul2" in {r[1] for r in rows}) and ("nul" not in {r[1] for r in rows})
    assert canon(up_once) == canon(up_twice)
