"""Property tests for operators/temporal.gapfill_linear: on a series
sampled from a LINEAR function, interpolation must reconstruct every
interior gap EXACTLY (a linear interpolant of a linear function is the
function), edges must carry the nearest observation, and the spine must
restore precisely the missing calendar days."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dc_moving_violations_cloud_etl_spark.operators.temporal import (
    gapfill_linear,
)

BASE = dt.date(2024, 3, 1)


def _series(spark, n_days: int, observed_idx: set[int], a: float, b: float):
    rows = [
        (BASE + dt.timedelta(days=i), float(a * i + b))
        for i in sorted(observed_idx)
    ]
    return spark.createDataFrame(rows, "day date, v double"), n_days


@given(
    n_days=st.integers(min_value=3, max_value=40),
    data=st.data(),
    a=st.floats(min_value=-5, max_value=5, allow_nan=False),
    b=st.floats(min_value=-100, max_value=100, allow_nan=False),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_linear_series_reconstructed_exactly(spark, n_days, data, a, b):
    observed = data.draw(
        st.sets(
            st.integers(min_value=0, max_value=n_days - 1),
            min_size=2,
            max_size=n_days,
        )
    )
    df, _ = _series(spark, n_days, observed, a, b)
    out = {
        r["day"]: r
        for r in gapfill_linear(df, "day", "v").collect()
    }
    lo, hi = min(observed), max(observed)
    # the spine spans exactly [min observed, max observed]
    assert len(out) == hi - lo + 1
    for i in range(lo, hi + 1):
        r = out[BASE + dt.timedelta(days=i)]
        expect = a * i + b
        if i in observed:
            assert r["fill_kind"] == "observed"
            assert r["value_filled"] == expect
        else:
            assert r["fill_kind"] == "interpolated"
            # linear interpolation of a linear function: exact up to
            # float rounding of the lerp expression
            assert abs(r["value_filled"] - expect) < 1e-9 * (
                1.0 + abs(expect)
            )


def test_edges_carry_nearest_observation(spark):
    """Null-valued boundary rows (an outage at the series edge) must be
    edge-carried from the nearest observation, not interpolated."""
    rows = [
        (BASE, None),
        (BASE + dt.timedelta(days=1), 10.0),
        (BASE + dt.timedelta(days=2), None),
        (BASE + dt.timedelta(days=3), 40.0),
        (BASE + dt.timedelta(days=4), None),
    ]
    df = spark.createDataFrame(rows, "day date, v double")
    out = {r["day"].day: r for r in gapfill_linear(df, "day", "v").collect()}
    assert out[1]["fill_kind"] == "edge-carried"
    assert out[1]["value_filled"] == 10.0
    assert out[3]["fill_kind"] == "interpolated"
    assert out[3]["value_filled"] == 25.0
    assert out[5]["fill_kind"] == "edge-carried"
    assert out[5]["value_filled"] == 40.0
