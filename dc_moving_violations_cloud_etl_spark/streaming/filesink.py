"""Exactly-once streaming file sink (SURVEY.md §2.J sink surface): the
production path a 100 TB ingest actually lands on — append-mode parquet
written by the checkpointed file sink, whose ``_spark_metadata``
manifest makes readers see each committed batch exactly once.

The reference gets idempotent replay from MySQL upserts
(violation_etl_daily.py:120-176, INSERT…ON DUPLICATE KEY); the file-sink
analog is transactional manifest commits: a re-run over the same
checkpoint sees no new input files, commits no batch, and the batch
reader (which trusts the manifest, not the directory listing) returns
the identical table — proven here by answering an aggregate from the
sink's own output.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import normalize_event_ts, read_parquet
from .daily import _SCRATCH_ROOT, _run_to_completion, _stage_dir


def file_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events stream → checkpointed append parquet sink → manifest-aware
    batch read of the sink → per-type aggregate (equal to the flat
    batch aggregate over the source)."""
    path = f"{sf_dir}/events.parquet"
    schema = read_parquet(spark, path).schema
    st = os.stat(path)
    tag = hashlib.md5(f"fsink:{sf_dir}".encode()).hexdigest()[:8]
    # sweep is keyed per FIXTURE (tag) like statestore._checkpoint_dir:
    # only a regenerated generation of the SAME sf dir is stale — an
    # unscoped sweep would delete the other fixtures' sinks on every
    # sf0.001/sf0.01/sf0.1 alternation and defeat the warm-replay path
    ident = f"fsink-{tag}-{st.st_size}-{st.st_mtime_ns}"
    try:
        for entry in os.listdir(_SCRATCH_ROOT):
            if entry.startswith(f"fsink-{tag}-") and entry != ident:
                shutil.rmtree(
                    os.path.join(_SCRATCH_ROOT, entry), ignore_errors=True
                )
    except FileNotFoundError:
        pass
    root = os.path.join(_SCRATCH_ROOT, ident)
    out_dir = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")

    # Drive the sink. On a warm checkpoint the availableNow run sees no
    # new files and commits nothing — the manifest (and therefore the
    # read below) is unchanged: exactly-once across replays.
    events = normalize_event_ts(
        spark.readStream.schema(schema).parquet(_stage_dir(path, tag))
    )
    projected = events.select(
        "event_id",
        "event_type",
        F.col("value").cast("decimal(18,2)").alias("value_d"),
    )
    _run_to_completion(
        spark,
        projected.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True),
    )

    sunk = spark.read.parquet(out_dir)  # honors _spark_metadata manifest
    return (
        sunk.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("event_id").cast("long").alias("n_unique_ids"),
            F.sum("value_d").cast("double").alias("total_value"),
        )
        .orderBy("event_type")
    )
