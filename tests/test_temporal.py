"""Temporal operator edge semantics: as-of inclusivity/tie rules and
range-join bucket-boundary correctness vs a brute-force reference."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dc_moving_violations_cloud_etl_spark.operators.temporal import (
    asof_join,
    range_join_pairs,
)


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def test_asof_inclusive_and_tiebreak(spark):
    left = spark.createDataFrame(
        [(1, _ts(100), "e1"), (1, _ts(50), "e2"), (2, _ts(10), "e3")],
        "user_id long, ts timestamp, name string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(100), 7),  # exactly AT e1's ts → included (inclusive)
            (1, _ts(100), 9),  # same ts, larger tiebreak → wins
            (1, _ts(40), 1),
            # user 2 has no right rows → NULL payload
        ],
        "user_id long, ts timestamp, rid long",
    )
    out = {
        r["name"]: r["_asof"]
        for r in asof_join(
            left, right, key="user_id", ts="ts", payload=["rid"], tiebreak="rid"
        ).collect()
    }
    assert out["e1"]["rid"] == 9  # inclusive at equal ts, max tiebreak
    assert out["e2"]["rid"] == 1  # latest earlier row
    assert out["e3"] is None  # no prior right row


def test_range_join_matches_brute_force(spark):
    """Bucketed range join == brute-force inequality join on a grid that
    hits every bucket boundary (deltas exactly at lower, upper, and the
    bucket width)."""
    lower, upper = 1, 10  # width 9
    left = spark.createDataFrame(
        [(1, _ts(t), t) for t in range(0, 60, 7)],
        "k long, ts timestamp, lid long",
    )
    right = spark.createDataFrame(
        [(1, _ts(t), 100 + t) for t in range(0, 60, 3)],
        "k long, ts timestamp, rid long",
    )
    got = sorted(
        (r["lid"], r["rid"])
        for r in range_join_pairs(
            left, right, "k", "ts", "ts", lower, upper, ["lid"], ["rid"]
        ).collect()
    )
    brute = sorted(
        (r["lid"], r["rid"])
        for r in left.alias("l")
        .join(right.alias("r"), F.col("l.k") == F.col("r.k"))
        .where(
            (F.unix_timestamp("l.ts") - F.unix_timestamp("r.ts") >= lower)
            & (F.unix_timestamp("l.ts") - F.unix_timestamp("r.ts") <= upper)
        )
        .select(F.col("l.lid").alias("lid"), F.col("r.rid").alias("rid"))
        .collect()
    )
    assert got == brute and len(got) > 0
    assert len(got) == len(set(got))  # no duplicate pairs from bucketing
