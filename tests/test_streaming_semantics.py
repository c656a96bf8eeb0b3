"""Event-time watermark semantics under REAL multi-batch execution
(maxFilesPerTrigger=1 over two controlled files).

Pinned guarantees (stable in Spark 4.1):
- the run executes as multiple micro-batches;
- the watermark ADVANCES across batches from observed event time
  (reported per-batch in query progress);
- append mode withholds every window the final watermark has not
  passed (the trailing-days cutoff the reference implements manually,
  violation_etl_daily.py:139-141).

Deliberately NOT pinned: the exact batch at which late input is
dropped. In 4.1's availableNow, source offsets are pre-planned and the
operative watermark application can lag a batch — rows later than the
final watermark still influence no emitted-then-retracted output, but
intermediate-batch drop counts are version-specific scheduling detail.
"""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def two_batch_dir(spark, tmp_path):
    """Two parquet files with controlled modification times so the file
    stream source processes them oldest-mtime-first: batch 0 = days
    10..20 (advances the watermark), batch 1 = days 1..5 (late)."""
    d = str(tmp_path / "in")
    os.makedirs(d)

    def write(name, day_lo, day_hi, mtime):
        df = spark.range(day_lo * 24, day_hi * 24).select(
            (F.col("id") * 3600).cast("timestamp").alias("ts")
        )
        path = os.path.join(d, name)
        df.coalesce(1).write.parquet(path)
        for root, _, files in os.walk(path):
            os.utime(root, (mtime, mtime))
            for f in files:
                os.utime(os.path.join(root, f), (mtime, mtime))

    write("batch1.parquet", 10, 21, 1_000_000)
    write("batch2.parquet", 1, 6, 2_000_000)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_multibatch_watermark_advances_and_append_withholds(
    spark, two_batch_dir, tmp_path
):
    ev = (
        spark.readStream.schema("ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{two_batch_dir}/*")
    )
    agg = (
        ev.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_semantics")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
        progresses = [json.loads(p.json) if not isinstance(p, dict) else p
                      for p in q.recentProgress]
    finally:
        q.stop()

    # (a) genuinely multi-batch
    assert len(progresses) >= 2, [p.get("batchId") for p in progresses]

    # (b) watermark advanced from epoch as event time was observed
    wms = [p.get("eventTime", {}).get("watermark") for p in progresses]
    assert wms[0] == "1970-01-01T00:00:00.000Z"
    assert any(w and w > "1970-01-02" for w in wms), wms

    # (c) append withholds windows the final watermark has not passed:
    # max event time = day-21 23:00 -> watermark day-20 23:00 -> windows
    # for days 20 and 21 (dayofyear) must be absent; all emitted windows
    # are complete 24-row days
    out = {
        r["d"]: r["n"]
        for r in spark.table("wm_semantics")
        .select(F.dayofyear("win.start").alias("d"), "n")
        .collect()
    }
    assert out, "append emitted nothing"
    assert 20 not in out and 21 not in out, sorted(out)
    assert all(n == 24 for n in out.values()), out


def test_progress_reports_rows_dropped_by_watermark(spark, tmp_path):
    """The engine's own telemetry must show late rows being DROPPED by
    the watermark (stateOperators[].numRowsDroppedByWatermark in query
    progress) — stronger evidence than output absence alone, and the
    metric an operator dashboards at scale. Because the operative
    watermark lags one batch in availableNow (module docstring), the
    late file arrives as the THIRD batch: batch 0 (days 10..21)
    advances event time, batch 1 (day 22) runs under the propagated
    watermark, batch 2 (days 1..6) is then genuinely below it. Exact
    per-batch counts stay unpinned; the run-total must account for
    some-to-all of the 120 late rows (5 days x 24)."""
    d = str(tmp_path / "in3")
    os.makedirs(d)

    def write(name, day_lo, day_hi, mtime):
        df = spark.range(day_lo * 24, day_hi * 24).select(
            (F.col("id") * 3600).cast("timestamp").alias("ts")
        )
        path = os.path.join(d, name)
        df.coalesce(1).write.parquet(path)
        for root, _, files in os.walk(path):
            os.utime(root, (mtime, mtime))
            for f in files:
                os.utime(os.path.join(root, f), (mtime, mtime))

    write("b0.parquet", 10, 21, 1_000_000)
    write("b1.parquet", 21, 22, 2_000_000)
    write("b2.parquet", 1, 6, 3_000_000)
    ev = (
        spark.readStream.schema("ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{d}/*")
    )
    agg = (
        ev.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_dropped_metric")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
        progresses = [
            json.loads(p.json) if not isinstance(p, dict) else p
            for p in q.recentProgress
        ]
    finally:
        q.stop()
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in progresses
        for op in p.get("stateOperators", [])
    )
    assert 0 < dropped <= 120, (
        dropped,
        [p.get("batchId") for p in progresses],
    )
    spark.catalog.dropTempView("wm_dropped_metric")


def test_checkpoint_restart_resumes_exactly_once(spark, tmp_path):
    """Recovery contract: a stream stopped and RESTARTED from its
    checkpoint must process exactly the unseen input — no re-emission
    of committed batches, no loss. Deterministic (no mid-batch kill
    race): run 1 processes file A to completion, files B and C land
    while the query is DOWN, run 2 resumes from the same checkpoint.
    The parquet sink must hold every row exactly once."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def add_file(name, lo, hi):
        spark.range(lo, hi).select(
            F.col("id"), (F.col("id") * 3600).cast("timestamp").alias("ts")
        ).coalesce(1).write.parquet(os.path.join(src, name))

    def run():
        ev = spark.readStream.schema("id long, ts timestamp").parquet(
            f"{src}/*"
        )
        q = (
            ev.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()

    add_file("a.parquet", 0, 100)
    run()
    n1 = spark.read.parquet(sink).count()
    assert n1 == 100

    add_file("b.parquet", 100, 250)
    add_file("c.parquet", 250, 300)
    run()
    out = spark.read.parquet(sink)
    assert out.count() == 300  # no loss, no re-emission of file A
    assert out.select("id").distinct().count() == 300  # no duplicates
    assert out.agg(F.sum("id")).collect()[0][0] == 299 * 300 // 2
