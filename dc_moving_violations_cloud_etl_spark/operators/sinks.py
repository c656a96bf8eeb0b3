"""Idempotent sinks: the reference's primary-key upsert semantics on
Spark/Parquet.

The reference relies on MySQL for the one relational feature plain
Parquet lacks — PK-enforced writes:

- ``INSERT ... ON DUPLICATE KEY UPDATE`` (last-writer-wins upsert,
  reference etl/full_load/violation_etl_history.py:138-150,
  etl/daily_load/weather_etl_daily.py:196-204)
- ``INSERT IGNORE`` (first-writer-wins insert-if-absent,
  reference etl/daily_load/violation_etl_daily.py:288-306)

Both are re-expressed as pure DataFrame merge operators (no table format
required) plus a partitioned-parquet writer. Idempotency — the
reference's only stated correctness invariant ("trigger the same Lambda
twice → no duplicate PKs", reference DEPLOYMENT.md:244-250) — holds by
construction: merging the same batch twice is a fixpoint.

Scale posture:
- ``insert_if_absent`` is a left-anti join on the PK — at 100 TB this
  shuffles on the key unless the table is bucketed by PK; AQE converts
  to broadcast when the incoming batch is small (the daily case: one
  day of data vs the full table).
- ``upsert_last_writer_wins`` is a per-key window over the union — the
  shuffle partitions by PK only, and with daily batches the union's
  incoming side is tiny. For repeated merges, writing the table
  partitioned by ``month`` (see ``write_partitioned``) confines the
  rewrite to the touched partitions (dynamic partition overwrite), the
  parquet analog of MySQL updating only the affected rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PRIORITY_COL = "_src_priority"


def insert_if_absent(existing: DataFrame, incoming: DataFrame, keys: Sequence[str]) -> DataFrame:
    """``INSERT IGNORE`` semantics: keep every existing row; add incoming
    rows whose key is absent from existing (first-writer-wins). Incoming
    intra-batch duplicates keep one deterministic representative.
    """
    incoming = dedupe_by_key(incoming, keys)
    fresh = incoming.join(existing.select(*keys).distinct(), list(keys), "left_anti")
    return existing.unionByName(fresh)


def upsert_last_writer_wins(
    existing: DataFrame, incoming: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """``ON DUPLICATE KEY UPDATE`` semantics: incoming rows replace
    existing rows with the same key; new keys append.

    Implemented as union + per-key ``row_number`` ordered by source
    priority (incoming=2 > existing=1) — the Spark-native MERGE for
    plain Parquet (SURVEY.md §4 O10).
    """
    tagged = existing.withColumn(PRIORITY_COL, F.lit(1)).unionByName(
        incoming.withColumn(PRIORITY_COL, F.lit(2))
    )
    w = Window.partitionBy(*keys).orderBy(F.col(PRIORITY_COL).desc())
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", PRIORITY_COL)
    )


def dedupe_by_key(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Deterministic intra-batch PK dedup: one row per key, chosen by the
    min of the full-row struct (unlike ``dropDuplicates``, which keeps an
    arbitrary first-seen row and is therefore not oracle-comparable)."""
    others = [c for c in df.columns if c not in keys]
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).asc_nulls_first() for c in others])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_col: str = "month",
    mode: str = "overwrite",
) -> None:
    """Partitioned-parquet table layout (the engine analog of the
    reference's month→MapServer-layer routing table,
    reference etl/daily_load/violation_etl_daily.py:21-41): queries with
    a ``month`` predicate prune partitions at planning time, and
    incremental merges rewrite only touched months via dynamic partition
    overwrite."""
    (
        df.write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
