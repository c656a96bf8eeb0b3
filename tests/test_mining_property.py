"""Property tests for the data-mining pack: the Spark implementations
must agree with tiny brute-force Python references on randomized
inputs (same contract style as test_components_property.py)."""

from __future__ import annotations

import itertools

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dc_moving_violations_cloud_etl_spark.queries import mining_ops

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# triangle census vs itertools brute force
# ---------------------------------------------------------------------------


def _brute_census(edges: set[tuple[int, int]]):
    nodes = {n for e in edges for n in e}
    deg = {n: 0 for n in nodes}
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    tri = sum(
        1
        for a, b, c in itertools.combinations(sorted(nodes), 3)
        if (a, b) in edges and (b, c) in edges and (a, c) in edges
    )
    return len(nodes), len(edges), wedges, tri


@settings(**_SETTINGS)
@given(
    st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ).map(lambda t: (min(t), max(t))).filter(lambda t: t[0] < t[1]),
        min_size=1,
        max_size=20,
    )
)
def test_triangle_census_matches_brute_force(spark, edges):
    edf = spark.createDataFrame(sorted(edges), "u long, v long")
    deg = (
        edf.select(F.col("u").alias("n"))
        .unionAll(edf.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    stats = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum(F.expr("deg * (deg - 1) div 2")).cast("long").alias("n_wedges"),
    ).collect()[0]
    tri = (
        edf.alias("ab")
        .join(edf.alias("bc"), F.col("ab.v") == F.col("bc.u"))
        .join(
            edf.alias("ac"),
            (F.col("ac.u") == F.col("ab.u"))
            & (F.col("ac.v") == F.col("bc.v")),
        )
        .count()
    )
    n_nodes, n_edges, n_wedges, n_tri = _brute_census(set(edges))
    assert stats["n_nodes"] == n_nodes
    assert stats["n_wedges"] == n_wedges
    assert tri == n_tri


# ---------------------------------------------------------------------------
# z-score outliers vs Python integer reference
# ---------------------------------------------------------------------------


def _brute_outliers(cents: list[int]) -> int:
    n = len(cents)
    s = sum(cents)
    s2 = sum(c * c for c in cents)
    return sum(1 for c in cents if (n * c - s) ** 2 > 4 * (n * s2 - s * s))


@settings(**_SETTINGS)
@given(
    st.lists(
        st.integers(min_value=0, max_value=100_000),  # cents
        min_size=2,
        max_size=40,
    )
)
def test_zscore_matches_integer_reference(spark, sf_dir, monkeypatch, cents):
    rows = [("t", c / 100.0) for c in cents]
    df = spark.createDataFrame(rows, "event_type string, value double")
    monkeypatch.setattr(mining_ops, "_events", lambda _s, _f: df)
    got = mining_ops._zscore_outliers(spark, sf_dir).collect()[0]
    assert got["n_outliers"] == _brute_outliers(cents)


# ---------------------------------------------------------------------------
# drift audit vs Python reference
# ---------------------------------------------------------------------------


@settings(**_SETTINGS)
@given(
    st.lists(
        st.integers(min_value=0, max_value=20_000),  # cents
        min_size=2,
        max_size=50,
    )
)
def test_drift_audit_matches_reference(spark, sf_dir, monkeypatch, cents):
    rows = [(i, c / 100.0) for i, c in enumerate(cents)]
    df = spark.createDataFrame(rows, "event_id long, value double")
    monkeypatch.setattr(mining_ops, "_events", lambda _s, _f: df)
    got = {
        r["value_bin"]: r
        for r in mining_ops._value_drift_audit(spark, sf_dir).collect()
    }

    mid = (0 + (len(cents) - 1)) // 2
    bins: dict[int, list[int]] = {}
    for i, c in enumerate(cents):
        bins.setdefault(c // 1000, []).append(i)
    t_old = sum(1 for i in range(len(cents)) if i < mid)
    t_new = len(cents) - t_old
    assert set(got) == set(bins)
    for b, idxs in bins.items():
        n_old = sum(1 for i in idxs if i < mid)
        n_new = len(idxs) - n_old
        assert got[b]["n_old"] == n_old and got[b]["n_new"] == n_new
        want_drift = 50 * abs(n_new * t_old - n_old * t_new) > t_new * t_old
        assert got[b]["drift"] == want_drift, (b, n_old, n_new, t_old, t_new)
