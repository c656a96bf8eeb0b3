"""Property-based check: the bucketed range join emits exactly the
pairs a brute-force nested loop finds — every key collision, duplicate
timestamp, window-boundary hit (delta == lower_s / upper_s), and bucket
edge (the ≤3 exploded candidate buckets must cover the admissible
right-ts window for every left row, and never double-emit a pair)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dc_moving_violations_cloud_etl_spark.operators.temporal import (
    range_join_pairs,
)

_EPOCH = dt.datetime(2024, 1, 1)

_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # key: few keys → collisions
        st.integers(min_value=0, max_value=120),  # ts seconds: dup-heavy
    ),
    min_size=1,
    max_size=10,
)

# (lower_s, width): windows that sit at zero, straddle zero, and start
# strictly positive — the three bucket-alignment regimes
_windows = st.tuples(
    st.integers(min_value=-40, max_value=40),
    st.integers(min_value=1, max_value=45),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left_rows=_rows, right_rows=_rows, window=_windows)
def test_range_join_matches_nested_loop(spark, left_rows, right_rows, window):
    lower_s, width = window
    upper_s = lower_s + width
    left = spark.createDataFrame(
        [
            (k, _EPOCH + dt.timedelta(seconds=s), i)
            for i, (k, s) in enumerate(left_rows)
        ],
        "k long, lts timestamp, lid long",
    )
    right = spark.createDataFrame(
        [
            (k, _EPOCH + dt.timedelta(seconds=s), 100 + i)
            for i, (k, s) in enumerate(right_rows)
        ],
        "k long, rts timestamp, rid long",
    )
    rows = range_join_pairs(
        left,
        right,
        key="k",
        left_ts="lts",
        right_ts="rts",
        lower_s=lower_s,
        upper_s=upper_s,
        left_cols=["lid"],
        right_cols=["rid"],
    ).collect()
    got = [(int(r["lid"]), int(r["rid"])) for r in rows]

    want = [
        (i, 100 + j)
        for i, (lk, ls) in enumerate(left_rows)
        for j, (rk, rs) in enumerate(right_rows)
        if lk == rk and lower_s <= ls - rs <= upper_s
    ]
    # sorted-list (not set) comparison: a bucket-coverage bug that
    # double-emits a pair must fail, not dedupe away
    assert sorted(got) == sorted(want)
