"""Temporal join operators Spark's built-ins don't ship: AS-OF join and
bounded RANGE join, composed from DataFrame primitives (no cross joins,
no pandas merge_asof in the hot path).

**As-of join** — for each left row, the latest right row with
``right.ts <= left.ts`` per key — is implemented as the union-and-carry
pattern: tag both inputs, union, then one window sorted by
``(ts, side)`` carrying the last right payload forward
(``last(..., ignorenulls=True)``). Cost: ONE shuffle (the window's
partitionBy key) over |L|+|R| rows — the optimal distributed shape; a
join-based formulation would need an extra aggregation to pick the
latest match, and a naive inequality join is a per-key cross product.

**Range join** — pairs with ``lower <= left.ts - right.ts <= upper`` —
is implemented as a bucketed equi-join: quantize time into
``width = upper - lower`` buckets, explode each left row to the 2-3
candidate buckets its window can overlap, equi-join on (key, bucket),
then apply the exact predicate. Candidates per row are O(1), so the
join stays linear in input size instead of the |L|·|R| per-key blowup
of a raw inequality join. This is the interval-bucketing strategy used
by time-series engines for bounded-window joins.

Determinism: as-of ties at equal ts resolve right-row-first (inclusive
as-of), and among right rows at the same ts the one with the largest
tiebreak column wins — both encoded in the sort key, so results are
exact in any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload: list[str],
    tiebreak: str,
) -> DataFrame:
    """Left as-of join: every ``left`` row + the payload of the latest
    ``right`` row with ``right[ts] <= left[ts]`` and equal ``key``
    (NULL payload when no prior right row exists).

    ``tiebreak`` orders right rows sharing a timestamp (largest wins) —
    required for a total, engine-independent order.
    """
    r = right.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("_side"),
        F.col(tiebreak).alias("_tb"),
        F.struct(*[F.col(c) for c in payload]).alias("_payload"),
    )
    l = left.select(
        F.col(key),
        F.col(ts),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_tb"].dataType).alias("_tb"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
    )
    u = r.withColumn("_lrow", F.lit(None).cast(l.schema["_lrow"].dataType)).unionByName(l)

    # right rows sort before left rows at equal ts (inclusive as-of);
    # among right rows, larger tiebreak later → carried value is the max
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn(
        "_asof", F.last("_payload", ignorenulls=True).over(w)
    )
    return (
        carried.where(F.col("_side") == 1)
        .select(F.col("_lrow.*"), F.col("_asof"))
    )


def range_join_pairs(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    left_cols: list[str],
    right_cols: list[str],
) -> DataFrame:
    """All (left, right) pairs with equal ``key`` and
    ``lower_s <= left_ts - right_ts <= upper_s`` (seconds), via the
    bucketed equi-join (explode ≤3 candidate buckets per left row —
    linear, never per-key cross product)."""
    width = upper_s - lower_s
    if width <= 0:
        raise ValueError("upper_s must exceed lower_s")

    def bucket(c: Column) -> Column:
        return F.floor(F.unix_timestamp(c) / F.lit(width)).cast("long")

    # left row's admissible right-ts window is
    # [left_ts - upper_s, left_ts - lower_s] — width `width`, so it
    # overlaps at most 2 buckets; scan 3 to be robust at exact edges
    l = left.select(
        F.col(key),
        F.col(left_ts).alias("_lts"),
        *[F.col(c) for c in left_cols],
    ).withColumn(
        "_bucket",
        F.explode(
            F.array(
                *[
                    bucket(F.col("_lts") - F.expr(f"INTERVAL {upper_s} SECOND"))
                    + F.lit(i)
                    for i in range(3)
                ]
            )
        ),
    )
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_rts"),
        bucket(F.col(right_ts)).alias("_bucket"),
        *[F.col(c) for c in right_cols],
    )
    # the 3 exploded buckets per left row are DISTINCT values and each
    # right row has exactly one bucket, so a candidate pair matches at
    # most once — no dedup pass needed after the join
    delta = F.unix_timestamp(F.col("_lts")) - F.unix_timestamp(F.col("_rts"))
    return (
        l.join(r, [key, "_bucket"])
        .where((delta >= lower_s) & (delta <= upper_s))
        .drop("_bucket")
    )


def gapfill_linear(
    daily: DataFrame, day: str = "day", value: str = "v"
) -> DataFrame:
    """Calendar gap-fill with linear interpolation over a (date, value)
    series: restore missing days from a ``sequence(min, max)`` spine,
    attach the nearest observation on each side via LOCF windows
    (``last``/``first`` with ignoreNulls), and fill gaps with the
    linear interpolation between them — nearest-edge carry where only
    one side exists.

    Returns the spine with columns ``{day}``, ``{value}`` (null at
    gaps), ``value_filled`` and ``fill_kind`` ('observed' |
    'interpolated' | 'edge-carried'). The spine derives from two scalar
    aggregates and one generator — no driver loop; the windows run over
    |days| rows, not the underlying fact table. Used by the
    `timeseries_gapfill_interpolate` query and property-tested in
    tests/test_gapfill_property.py (exact reconstruction of linear
    series)."""
    bounds = daily.agg(
        F.min(day).alias("_lo"), F.max(day).alias("_hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("_lo", "_hi")).alias(day)
    )
    w_prev = Window.orderBy(day).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_next = Window.orderBy(day).rowsBetween(
        0, Window.unboundedFollowing
    )
    v = F.col(value)
    g = (
        spine.join(daily, day, "left")
        .withColumn("_prev_v", F.last(v, ignorenulls=True).over(w_prev))
        .withColumn(
            "_prev_d",
            F.last(F.when(v.isNotNull(), F.col(day)), True).over(w_prev),
        )
        .withColumn("_next_v", F.first(v, ignorenulls=True).over(w_next))
        .withColumn(
            "_next_d",
            F.first(F.when(v.isNotNull(), F.col(day)), True).over(w_next),
        )
    )
    frac = F.datediff(F.col(day), F.col("_prev_d")) / F.datediff(
        F.col("_next_d"), F.col("_prev_d")
    )
    lerp = F.col("_prev_v") + (F.col("_next_v") - F.col("_prev_v")) * frac
    return g.select(
        day,
        value,
        F.coalesce(v, lerp, F.col("_prev_v"), F.col("_next_v")).alias(
            "value_filled"
        ),
        F.when(v.isNotNull(), "observed")
        .when(
            F.col("_prev_v").isNotNull() & F.col("_next_v").isNotNull(),
            "interpolated",
        )
        .otherwise("edge-carried")
        .alias("fill_kind"),
    )
