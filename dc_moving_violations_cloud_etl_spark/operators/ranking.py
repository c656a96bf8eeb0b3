"""Distributed global ranking — the scale-safe replacement for
``Window.orderBy(...)`` with no ``partitionBy`` (VERDICT r4 rec #4).

An unpartitioned rank window funnels the ENTIRE input through one task:
fine on a 600-row fixture, a single-executor bottleneck (and OOM risk)
at 100 TB. Both helpers here keep every heavy step partition-parallel:

- :func:`global_rank` computes an exact global ``row_number`` with the
  classic three-step distributed ranking: range-repartition on the sort
  key (so partition *p* holds a contiguous key range), rank WITHIN each
  partition (parallel), then add each partition's starting offset —
  a cumulative sum over the per-partition COUNTS, which is one row per
  partition (constant-size: the only unpartitioned window in the plan
  runs over ~hundreds of rows regardless of data scale) — broadcast
  back. This is how ``zipWithIndex``/Spark's own ``RangePartitioner``
  sorts scale, expressed in DataFrame ops.
- :func:`global_topk` pre-reduces to the per-partition top-k BEFORE the
  single global ordering window, which then sees at most
  ``k x numPartitions`` rows — lossless, because a row outside its own
  partition's top-k cannot be in the global top-k.

Requirement for determinism: the sort expressions must define a TOTAL
order (ties broken by a unique key), as with any distributed rank.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame, *order: Column, alias: str = "rank"
) -> DataFrame:
    """Exact global ``row_number`` over ``order`` (a total order),
    computed without an unpartitioned data-sized window. Adds column
    ``alias`` (long, 1-based); preserves all input columns."""
    part = df.repartitionByRange(*order).withColumn(
        "_grk_pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("_grk_pid").orderBy(*order)
    ranked = part.withColumn(
        "_grk_local", F.row_number().over(w_local).cast("long")
    )
    counts = ranked.groupBy("_grk_pid").agg(
        F.count(F.lit(1)).alias("_grk_n")
    )
    # one row PER PARTITION: this window's input is constant-size in
    # the data (bounded by the partition count), so unpartitioned is
    # safe — it is the offset ledger, not the data
    w_off = Window.orderBy("_grk_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "_grk_pid",
        F.coalesce(F.sum("_grk_n").over(w_off), F.lit(0)).alias("_grk_off"),
    )
    return (
        ranked.join(F.broadcast(offsets), "_grk_pid")
        .withColumn(alias, (F.col("_grk_off") + F.col("_grk_local")))
        .drop("_grk_pid", "_grk_local", "_grk_off")
    )


def global_topk(
    df: DataFrame, k: int, *order: Column, alias: str = "rank"
) -> DataFrame:
    """Global top-``k`` by ``order`` (a total order) with a lossless
    per-partition pre-reduction: each partition emits its own top-k
    (parallel window keyed by partition id), then ONE small global
    window ranks the surviving ``<= k x numPartitions`` rows. Adds
    column ``alias`` (long, 1-based) and keeps only rank <= k."""
    w_pre = Window.partitionBy(F.spark_partition_id()).orderBy(*order)
    pre = (
        df.withColumn("_gtk_pre", F.row_number().over(w_pre))
        .where(F.col("_gtk_pre") <= k)
        .drop("_gtk_pre")
    )
    w_final = Window.orderBy(*order)
    return (
        pre.withColumn(alias, F.row_number().over(w_final).cast("long"))
        .where(F.col(alias) <= k)
    )
