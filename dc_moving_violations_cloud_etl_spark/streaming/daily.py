"""Structured Streaming daily rollup — the streaming analog of the
reference's daily Lambda micro-batch (SURVEY.md §2.J): the reference's
weather/violation granularity is exactly a 1-day tumbling window, so the
capability demonstration is a windowed streaming aggregation over the
``events`` fixture driven to completion with ``availableNow``.

In production this is ``readStream`` from a queue/object-store with a
watermark for late data (J2's completeness delay) and checkpointed
offsets replacing the MAX-date watermark (J1); here the parquet file
source + availableNow trigger reproduces the daily batch semantics
synchronously so the result is deterministic and oracle-checkable.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import normalize_event_ts, read_parquet


_SCRATCH_ROOT = "/tmp/spark_graft_stream"


def _stage_dir(path: str, tag: str) -> str:
    """The parquet file-stream source requires a DIRECTORY; the fixtures
    are single read-only files. Stage a symlink in a scratch dir (the
    local FS source follows symlinks; no data copy).

    The dir name includes the fixture file's identity (size + mtime), so
    a regenerated fixture never aliases a stale staging dir; stale
    generations of the same tag are swept best-effort (VERDICT r2 rec #6:
    scratch state accumulating across rounds)."""
    import shutil

    st = os.stat(path)
    ident = f"{tag}-{st.st_size}-{st.st_mtime_ns}"
    try:
        for entry in os.listdir(_SCRATCH_ROOT):
            if entry.startswith(f"{tag}-") and entry != ident:
                shutil.rmtree(
                    os.path.join(_SCRATCH_ROOT, entry), ignore_errors=True
                )
    except FileNotFoundError:
        pass
    d = os.path.join(_SCRATCH_ROOT, ident)
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, os.path.basename(path))
    # idempotent link: two concurrent harnesses can both pass the
    # islink check before either links (TOCTOU, r10 review) — the
    # loser's symlink must be a no-op, not a crash
    try:
        os.symlink(path, link)
    except FileExistsError:
        pass
    return d


# Stateful streaming operators instantiate one state store PER SHUFFLE
# PARTITION per stateful operator (a stream-stream join keeps four). The
# partition count is baked into the query's checkpoint at first start,
# so it is a deliberate sizing decision: state partitions should track
# stateful-key cardinality and executor count, NOT the batch-analytics
# shuffle width. For these availableNow micro-demonstrators 8 partitions
# measured 3.2x faster on the stream-stream join than inheriting the
# batch session's 32; a production deployment sizes this up with the
# key space.
STREAM_SHUFFLE_PARTITIONS = 8


# Streaming-plan audit ledger (VERDICT r4 rec #5): batch queries get
# their physical plans asserted registry-wide (tests/test_plans.py),
# but stream_* queries execute at build time, so their auditable
# surface is the per-batch PROGRESS record instead — watermark
# advancement and state-store row counts. Every _run_to_completion
# appends (query name, [progress dicts]) here; the pytest audit
# (tests/test_streaming_audit.py) replays selected stream queries and
# asserts watermark presence + bounded state from these records.
PROGRESS_LEDGER: list[tuple[str, list[dict]]] = []
_LEDGER_MAX = 200  # bounded: a long bench session must not accumulate


def record_progress(name: str, trail: list[dict]) -> None:
    """Append a (query name, progress trail) entry, trimming the ledger
    to ``_LEDGER_MAX`` first — the single choke point every stream
    runner must use so no call site can grow the ledger unboundedly."""
    del PROGRESS_LEDGER[: max(0, len(PROGRESS_LEDGER) + 1 - _LEDGER_MAX)]
    PROGRESS_LEDGER.append((name, trail))


def _run_to_completion(spark: SparkSession, writer) -> None:
    """Start the streaming query with the stream-sized shuffle-partition
    conf (plans resolve at ``start()``), await availableNow completion,
    stop, record its progress trail in ``PROGRESS_LEDGER``, and always
    restore the caller's conf."""
    try:
        old = spark.conf.get("spark.sql.shuffle.partitions")
    except Exception:
        old = None
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(STREAM_SHUFFLE_PARTITIONS)
    )
    try:
        q = writer.start()
        try:
            q.awaitTermination()
        finally:
            try:
                record_progress(
                    q.name or str(q.id), [p for p in q.recentProgress if p]
                )
            except Exception:  # noqa: BLE001 - audit trail is best-effort
                pass
            q.stop()
    finally:
        if old is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old)


def _drain_memory_sink(
    spark: SparkSession, name: str, df: DataFrame
) -> DataFrame:
    """Materialize the (small) final result off the memory sink, then
    DROP the sink table: the sink pins every emitted row in driver
    memory for the session's lifetime, and a bench/notebook process that
    runs many streaming queries would accumulate all of them (measured
    in round 3 as multi-× slowdowns of unrelated later queries). The
    ``localCheckpoint`` is eager, so the result survives the drop."""
    out = df.localCheckpoint()
    spark.catalog.dropTempView(name)
    return out


def daily_rollup_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day window × event_type: count + exact value sum,
    computed by a real streaming query (file source → availableNow →
    memory sink), returned as a batch DataFrame."""
    path = f"{sf_dir}/events.parquet"
    schema = read_parquet(spark, path).schema  # ts arrives as nanos long
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    name = f"daily_rollup_{tag}"

    events = normalize_event_ts(
        spark.readStream.schema(schema).parquet(_stage_dir(path, tag))
    )

    agg = events.groupBy(
        F.window("ts", "1 day").alias("win"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )

    _run_to_completion(
        spark,
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True),
    )

    return _drain_memory_sink(
        spark,
        name,
        spark.table(name)
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd").alias("event_day"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("event_day", "event_type"),
    )


def late_data_watermark_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2's completeness delay ("only ingest through yesterday", reference
    violation_etl_daily.py:139-141) as REAL watermark semantics: a 1-day
    ``withWatermark`` + tumbling daily window in APPEND mode. Only windows
    the watermark has passed are emitted — with availableNow the final
    watermark is max(ts) - 1 day, so the trailing (incomplete) day is
    withheld exactly like the reference's yesterday-cutoff. Deterministic,
    hence fully oracle-checkable: the DuckDB twin drops windows whose end
    exceeds max(ts) - INTERVAL 1 DAY.
    """
    path = f"{sf_dir}/events.parquet"
    schema = read_parquet(spark, path).schema
    tag = hashlib.md5(f"wm:{sf_dir}".encode()).hexdigest()[:8]
    name = f"late_rollup_{tag}"

    events = normalize_event_ts(
        spark.readStream.schema(schema).parquet(_stage_dir(path, tag))
    )

    agg = (
        events.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )

    _run_to_completion(
        spark,
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True),
    )

    return _drain_memory_sink(
        spark,
        name,
        spark.table(name)
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd").alias("event_day"),
            "n_events",
        )
        .orderBy("event_day"),
    )


def session_window_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native streaming sessionization: ``session_window`` (30-min gap)
    per user under a 1-day watermark in APPEND mode — Spark's built-in
    merging-session state machine, complementing the custom
    ``applyInPandasWithState`` twin. Append emits exactly the sessions
    whose window end (last event + gap) the final watermark
    (max ts − 1 day) has passed — deterministic under availableNow, so
    the DuckDB gaps-and-islands oracle filters on the same cutoff."""
    path = f"{sf_dir}/events.parquet"
    schema = read_parquet(spark, path).schema
    tag = hashlib.md5(f"sessw:{sf_dir}".encode()).hexdigest()[:8]
    name = f"session_window_{tag}"

    events = normalize_event_ts(
        spark.readStream.schema(schema).parquet(_stage_dir(path, tag))
    )

    agg = (
        events.withWatermark("ts", "1 day")
        .groupBy(
            F.session_window("ts", "30 minutes").alias("win"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )

    _run_to_completion(
        spark,
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True),
    )

    return _drain_memory_sink(
        spark,
        name,
        spark.table(name)
        .select(
            "user_id",
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format("win.end", "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
            "n_events",
        )
        .orderBy("user_id", "session_start"),
    )


def update_mode_counts_streaming(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """UPDATE output mode over real multi-batch execution — the third
    output mode (append and complete are covered by the other
    demonstrators). The events fixture is staged as two files (even/odd
    event_id, reused from the foreachBatch upsert) and read one file
    per trigger; update mode emits each (event_type) count row EVERY
    time a batch changes it, so the memory sink accumulates per-batch
    snapshots. Counts are monotone, so the final table is the per-key
    MAX over emissions — deterministic regardless of slicing, hence
    fully oracle-checkable (= the flat per-type counts)."""
    import hashlib
    import os

    from pyspark.sql import functions as F

    from .upsert import _stage_split

    path = f"{sf_dir}/events.parquet"
    schema = read_parquet(spark, path).schema
    st = os.stat(path)
    tag = hashlib.md5(
        f"upsert:{sf_dir}:{st.st_size}:{st.st_mtime_ns}".encode()
    ).hexdigest()[:8]
    name = "update_mode_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]

    events = normalize_event_ts(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(_stage_split(spark, path, tag))
    )
    agg = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )

    _run_to_completion(
        spark,
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True),
    )

    return _drain_memory_sink(
        spark,
        name,
        spark.table(name)
        .groupBy("event_type")
        .agg(F.max("n_events").cast("long").alias("n_events"))
        .orderBy("event_type"),
    )


def hopping_window_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOPPING (sliding) windows on a real stream — the third streaming
    window shape next to the tumbling rollup and session windows: 2-day
    windows every 1 day (each event lands in 2 windows via the engine's
    Expand), 1-day watermark, APPEND mode so only watermark-sealed
    windows emit. With availableNow the final watermark is
    max(ts) - 1 day; the oracle drops windows whose END the watermark
    has not passed — deterministic, fully hash-checkable."""
    path = f"{sf_dir}/events.parquet"
    schema = read_parquet(spark, path).schema
    tag = hashlib.md5(f"hop:{sf_dir}".encode()).hexdigest()[:8]
    name = f"hop_rollup_{tag}"

    events = normalize_event_ts(
        spark.readStream.schema(schema).parquet(_stage_dir(path, tag))
    )
    agg = (
        events.withWatermark("ts", "1 day")
        .groupBy(
            F.window("ts", "2 days", "1 day").alias("win"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    _run_to_completion(
        spark,
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True),
    )
    return _drain_memory_sink(
        spark,
        name,
        spark.table(name)
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
        )
        .orderBy("window_start", "event_type"),
    )
