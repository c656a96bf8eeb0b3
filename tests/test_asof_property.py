"""Property-based check: the distributed as-of join agrees with pandas
``merge_asof`` (backward, inclusive) on arbitrary inputs — keys missing
on either side, duplicate timestamps, single-row groups."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dc_moving_violations_cloud_etl_spark.operators.temporal import asof_join

_EPOCH = dt.datetime(2024, 1, 1)

_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # key: few keys → collisions
        st.integers(min_value=0, max_value=50),  # ts seconds: dup-heavy
    ),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left_rows=_rows, right_rows=_rows)
def test_asof_matches_pandas_merge_asof(spark, left_rows, right_rows):
    left = spark.createDataFrame(
        [
            (k, _EPOCH + dt.timedelta(seconds=s), i)
            for i, (k, s) in enumerate(left_rows)
        ],
        "k long, ts timestamp, lid long",
    )
    right = spark.createDataFrame(
        [
            (k, _EPOCH + dt.timedelta(seconds=s), 100 + i)
            for i, (k, s) in enumerate(right_rows)
        ],
        "k long, ts timestamp, rid long",
    )
    got = {
        r["lid"]: (r["_asof"]["rid"] if r["_asof"] is not None else None)
        for r in asof_join(
            left, right, key="k", ts="ts", payload=["rid"], tiebreak="rid"
        ).collect()
    }

    lp = pd.DataFrame(
        [(k, _EPOCH + dt.timedelta(seconds=s), i) for i, (k, s) in enumerate(left_rows)],
        columns=["k", "ts", "lid"],
    ).sort_values(["ts", "lid"], kind="mergesort")
    rp = pd.DataFrame(
        [
            (k, _EPOCH + dt.timedelta(seconds=s), 100 + i)
            for i, (k, s) in enumerate(right_rows)
        ],
        columns=["k", "ts", "rid"],
        # merge_asof picks the LAST matching right row in sort order →
        # sorting by (ts, rid) makes ties resolve to max rid, matching
        # the operator's tiebreak contract
    ).sort_values(["ts", "rid"], kind="mergesort")
    merged = pd.merge_asof(
        lp, rp, on="ts", by="k", direction="backward", allow_exact_matches=True
    )
    want = {
        int(row.lid): (None if pd.isna(row.rid) else int(row.rid))
        for row in merged.itertuples()
    }
    assert got == want
