"""foreachBatch incremental upsert — the reference's daily cadence
(fetch the new day, UPSERT into the serving table, reference
etl/daily_load/violation_etl_daily.py:318-365) as Structured Streaming:
micro-batches → ``foreachBatch`` merge into a keyed parquet store.

The merge state per key is ASSOCIATIVE — (last-event struct via max,
event count via sum) — so any micro-batch slicing of the input yields
the same final store; driven with ``availableNow`` over the staged
fixture the result is deterministic and fully oracle-checkable.

Scale: the store is a hash-partitioned parquet table; each batch does
one map-side-combined aggregate of the batch plus an equi-join-free
union-aggregate with the store (shuffle on user_id only). This is the
standard streaming-merge shape that replaces the reference's row-at-a-
time ``ON DUPLICATE KEY UPDATE`` loop at 100 TB.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import normalize_event_ts, read_parquet
from .daily import _run_to_completion


def _batch_aggregate(df: DataFrame) -> DataFrame:
    """Per-user mergeable state: last event (max over the unique
    (ts, event_id) order) + event count."""
    return df.groupBy("user_id").agg(
        F.max(
            F.struct("ts", "event_id", "event_type", "value")
        ).alias("last"),
        F.count(F.lit(1)).alias("n_events"),
    )


def _stage_split(spark: SparkSession, path: str, tag: str) -> str:
    """Stage the events fixture as TWO parquet files (even/odd event_id)
    so ``maxFilesPerTrigger=1`` drives REAL multi-batch execution: the
    second micro-batch exercises the store read-merge-rewrite path, not
    just the initial write. Staged once per (fixture, tag); the split is
    deterministic so re-runs see identical batches."""
    d = f"/tmp/spark_graft_stream/split_{tag}"
    done = os.path.join(d, "_STAGED")
    if os.path.exists(done):
        return d
    # stage into a process-private dir, publish with ONE atomic rename —
    # the same protocol as backfill._stage_multifile: write-in-place +
    # marker let a concurrent harness rmtree a directory another
    # process was actively writing or streaming from (r10 review)
    tmp = f"{d}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    src = read_parquet(spark, path)
    for i in (0, 1):
        (
            src.where(F.col("event_id") % 2 == i)
            .coalesce(1)
            .write.mode("append")
            .parquet(tmp)
        )
    with open(os.path.join(tmp, "_STAGED"), "w") as f:
        f.write("ok")
    try:
        os.rename(tmp, d)
    except OSError:
        if os.path.exists(done):  # lost the publish race
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            shutil.rmtree(d, ignore_errors=True)
            os.rename(tmp, d)
    return d


def incremental_upsert_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events stream → foreachBatch merge into a keyed parquet store →
    final per-user last-event table. The input is staged as two files
    and read one file per trigger, so the merge genuinely runs
    incrementally across micro-batches (associativity makes the final
    store independent of the slicing — proven in tests)."""
    path = f"{sf_dir}/events.parquet"
    schema = read_parquet(spark, path).schema
    # tag includes the fixture file's identity (size + mtime) so a
    # regenerated fixture never reuses a stale staged copy
    st = os.stat(path)
    tag = hashlib.md5(
        f"upsert:{sf_dir}:{st.st_size}:{st.st_mtime_ns}".encode()
    ).hexdigest()[:8]
    store = f"/tmp/spark_graft_stream/store_{tag}"
    # store and checkpoint are ONE unit of state: a hard kill after the
    # batches committed but before the finally-rmtree leaves a ckpt
    # that says "all input processed" — the next run would then delete
    # the store, commit nothing, and fail reading it back (r10 review)
    shutil.rmtree(store, ignore_errors=True)
    shutil.rmtree(f"{store}_ckpt", ignore_errors=True)

    events = normalize_event_ts(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(_stage_split(spark, path, tag))
    )

    def merge(batch_df: DataFrame, _batch_id: int) -> None:
        sess = batch_df.sparkSession
        upd = _batch_aggregate(batch_df)
        if os.path.isdir(store):
            cur = sess.read.parquet(store)
            # associative re-aggregate of store ∪ batch state: max of the
            # last-event structs, sum of the counts — same plan shape a
            # MERGE INTO on a keyed table compiles to
            merged = (
                cur.unionByName(upd)
                .groupBy("user_id")
                .agg(
                    F.max("last").alias("last"),
                    F.sum("n_events").alias("n_events"),
                )
            )
        else:
            merged = upd
        out = f"{store}_next"
        merged.write.mode("overwrite").parquet(out)
        shutil.rmtree(store, ignore_errors=True)
        os.rename(out, store)

    try:
        _run_to_completion(
            spark,
            events.writeStream.foreachBatch(merge)
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{store}_ckpt"),
        )
    finally:
        shutil.rmtree(f"{store}_ckpt", ignore_errors=True)

    return (
        spark.read.parquet(store)
        .select(
            "user_id",
            F.date_format("last.ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
            F.col("last.event_type").alias("last_event_type"),
            F.col("last.value").alias("last_value"),
            F.col("n_events").cast("long").alias("n_events"),
        )
        .orderBy("user_id")
    )
