"""Property test: the distributed connected-components operator
(hook + pointer-jump min-label propagation, operators/dedup.py::
components_from_edges) must agree with a reference union-find on
arbitrary small graphs — chains, stars, cycles, forests, self-loops,
whatever hypothesis generates."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dc_moving_violations_cloud_etl_spark.operators.dedup import (
    components_from_edges,
)


def _union_find(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node of the component
    return {x: find(x) for x in parent}


EDGES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=0, max_value=30),
    ),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=EDGES)
def test_components_match_union_find(spark, edges):
    df = spark.createDataFrame(edges, "a long, b long")
    got = {
        r["node"]: r["label"]
        for r in components_from_edges(df, max_iter=30).collect()
    }
    assert got == _union_find(edges)
