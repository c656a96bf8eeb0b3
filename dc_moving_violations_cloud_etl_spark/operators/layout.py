"""Multi-dimensional file-layout operators: Z-order (Morton) clustering.

A 100 TB table is usually filtered on more than one column (``user_id``
AND a value/time range). Partitioning or range-sorting on one column
gives data skipping on that column only; interleaving the bits of
several columns into one Morton code and range-clustering on it keeps
rows close in EVERY interleaved dimension, so parquet row-group min/max
stats prune scans for predicates on any of them (the layout trick behind
Delta/Iceberg ``OPTIMIZE ZORDER BY``; public technique, e.g. the Morton
order literature).

Spark-first shape: the Morton code is a pure integer expression
(shiftleft/shiftright/bitwise-or — whole-stage codegen, no UDF), and the
clustering itself is ``repartitionByRange`` on the code (one range
shuffle over sampled split points) + ``sortWithinPartitions`` so every
output file covers a tight (x, y) rectangle.

Quantizer caveat (r10 review): the pruning story holds for predicates
in the code's own coordinates — i.e. on the quantized values, or on RAW
columns only when the quantizer is MONOTONE in the raw value. The
convenience ``bucketize`` (pmod) wraps: it is monotone only while the
raw domain fits inside the bucket count, so a wider-domain column keeps
tight file stats in bucket space but NOT in raw space (a file holding
bucket 123 of user_id % 256 spans raw ids 123, 379, 635, …). For raw
range predicates quantize monotonically instead — e.g.
``F.shiftright(c, k)`` or ``floor((c - lo) * buckets / (hi - lo))``
with known domain bounds — and feed THAT to ``zorder_key``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: "list[Column]", bits: int = 8) -> Column:
    """Morton code interleaving the low ``bits`` bits of each column.

    Columns must already be non-negative integers (callers bucketize
    first — see ``bucketize``); values are masked to ``bits`` bits.
    With k columns the result occupies ``k * bits`` bits: bit i of
    column j lands at output bit ``i * k + j``, so a lexicographic range
    over the code walks a space-filling curve over the k-d grid.
    """
    k = len(cols)
    out = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        masked = c.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
        for i in range(bits):
            bit = F.shiftright(masked, i).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, i * k + j))
    return out


def bucketize(c: Column, buckets: int = 256) -> Column:
    """Non-negative integer bucket of any numeric column: floor to a
    long, then a sign-safe mod (``pmod``) into [0, buckets).

    NOT monotone once the raw domain exceeds ``buckets`` (the mod
    wraps) — fine as a bounded z-order coordinate or a hash-style
    bucket, but raw-column range predicates then get no file-stat
    pruning; see the module docstring for the monotone alternative."""
    return F.pmod(F.floor(c).cast("long"), F.lit(buckets))


def cluster_by_zorder(
    df: DataFrame, zcol: Column, partitions: int | None = None
) -> DataFrame:
    """Range-cluster ``df`` on a Morton code: one range shuffle
    (sampled split points, skew-free for any key distribution) plus an
    in-partition sort, so each output file's row-group stats span a
    tight hyper-rectangle — the write-side half of multi-column data
    skipping."""
    z = zcol.alias("_z")
    out = df.withColumn("_z", z)
    out = (
        out.repartitionByRange(partitions, "_z")
        if partitions
        else out.repartitionByRange("_z")
    )
    return out.sortWithinPartitions("_z").drop("_z")
