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


def test_user_rolling_7d_oracle_parity(spark, sf_dir, ddb):
    from dc_moving_violations_cloud_etl_spark.queries.registry import (
        QUERIES,
        get_queries,
    )
    from dc_moving_violations_cloud_etl_spark.queries.temporal import (
        _user_rolling_7d,
    )

    from .conftest import assert_df_matches_oracle

    get_queries()
    assert_df_matches_oracle(
        _user_rolling_7d(spark, sf_dir),
        ddb,
        QUERIES["events_user_rolling_7d"].oracle,
        "events_user_rolling_7d",
    )


def test_rolling_7d_range_frame_spans_gaps(spark):
    """A value-based RANGE frame must include only days within 6 of the
    current day — a rows-based frame would wrongly count across gaps."""
    from dc_moving_violations_cloud_etl_spark.queries.temporal import (
        _user_rolling_7d,
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        # user 1: days 1, 2, then a jump to day 20 — the day-20 window
        # must NOT include days 1-2
        rows = [
            (1, "2024-01-01 10:00:00", 1, "click", 1.0, "{}"),
            (2, "2024-01-02 10:00:00", 1, "click", 1.0, "{}"),
            (3, "2024-01-20 10:00:00", 1, "click", 1.0, "{}"),
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).withColumn("ts", F.to_timestamp("ts"))
        df.write.parquet(os.path.join(d, "events.parquet"))
        out = {
            r["day"]: (r["n_day"], r["n_7d"])
            for r in _user_rolling_7d(spark, d).collect()
        }
    assert out["2024-01-02"] == (1, 2)   # day 1 in range
    assert out["2024-01-20"] == (1, 1)   # gap: earlier days excluded


def test_pivot_daily_oracle_parity(spark, sf_dir, ddb):
    from dc_moving_violations_cloud_etl_spark.queries.registry import (
        QUERIES,
        get_queries,
    )
    from dc_moving_violations_cloud_etl_spark.queries.temporal import (
        _pivot_daily,
        _PIVOT_TYPES,
    )

    from .conftest import assert_df_matches_oracle

    get_queries()
    df = _pivot_daily(spark, sf_dir)
    assert df.columns == ["day"] + [f"n_{t}" for t in _PIVOT_TYPES]
    assert_df_matches_oracle(
        df, ddb, QUERIES["events_pivot_daily"].oracle, "events_pivot_daily"
    )
