"""Property tests for the iterative graph/coreset cores: the greedy
farthest-point k-center traversal and the synchronous k-core peel must
agree with exact Python replays on randomized synthetic inputs —
including degenerate cases the fixture never produces (fewer points
than centers, graphs that peel to empty in round 1, isolated ties).
Extends the property-test pattern of test_eval_property.py /
test_corpus_property.py to the graph family."""

from __future__ import annotations

from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dc_moving_violations_cloud_etl_spark.queries.mining_ops import (
    _KC_K,
    _KCORE_K,
    _KCORE_ROUNDS,
    kcenter_seeds,
    kcore_peel_core,
    pagerank_undirected,
)

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _half_up(x: float) -> int:
    return int(Decimal(repr(x)).to_integral_value(rounding=ROUND_HALF_UP))


def _brute_kcenter(vectors: dict[int, list[float]], k: int):
    """Python replay of kcenter_seeds: milli-unit quantization, seed =
    lowest vec_id, then k-1 rounds of farthest-point (ties -> lowest
    vec_id; an exhausted point set re-selects at min_d2 = 0, exactly
    like the engine's limit(1) over the zeroed state)."""
    q = {
        i: [_half_up(x * 1000.0) for x in v] for i, v in vectors.items()
    }
    seed = min(q)
    seeds = [(0, seed, 0)]

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    min_d2 = {i: d2(q[i], q[seed]) for i in q}
    for rnd in range(1, k):
        far = max(q, key=lambda i: (min_d2[i], -i))
        seeds.append((rnd, far, min_d2[far]))
        for i in q:
            min_d2[i] = min(min_d2[i], d2(q[i], q[far]))
    return seeds


@settings(**_SETTINGS)
@given(
    st.integers(min_value=2, max_value=4).flatmap(
        lambda d: st.lists(
            st.lists(
                st.floats(
                    min_value=-2.0,
                    max_value=2.0,
                    allow_nan=False,
                    width=32,
                ),
                min_size=d,
                max_size=d,
            ),
            min_size=1,
            max_size=10,
        )
    )
)
def test_kcenter_matches_greedy_replay(spark, vectors):
    import numpy as np

    d = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vectors)],
        "vec_id long, embedding array<float>",
    )
    _, seeds, _ = kcenter_seeds(d)
    want = _brute_kcenter(
        {
            i: [float(np.float32(x)) for x in v]
            for i, v in enumerate(vectors)
        },
        _KC_K,
    )
    assert seeds == want


def _brute_kcore(edges: list[tuple[int, int]], k: int, rounds: int):
    """Python replay of kcore_peel_core: per round, remove EVERY node
    whose current degree (row multiplicity counted) is below k, then
    drop edges touching a removed node."""
    cur = list(edges)
    trace = []
    for r in range(1, rounds + 1):
        deg = Counter()
        for u, v in cur:
            deg[u] += 1
            deg[v] += 1
        low = {n for n, c in deg.items() if c < k}
        cur = [(u, v) for u, v in cur if u not in low and v not in low]
        trace.append((r, len(low), len(cur)))
    return trace


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7),
            st.integers(min_value=0, max_value=7),
        ),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
def test_kcore_peel_matches_python_cascade(spark, edges):
    d = spark.createDataFrame(edges, "u long, v long")
    got = [
        (int(r.round), int(r.n_removed), int(r.n_edges))
        for r in kcore_peel_core(d).collect()
    ]
    assert got == _brute_kcore(edges, _KCORE_K, _KCORE_ROUNDS)


def test_pagerank_empty_graph_returns_empty_not_zerodivision(spark):
    """A no-edges day is legitimate input: the uniform init 1/n_nodes is
    a driver-side Python division, so an empty edge list must return the
    empty rank vector, not raise ZeroDivisionError (r10 review)."""
    edges = spark.createDataFrame([], "u long, v long")
    out = pagerank_undirected(edges, n_iter=2)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == ["node", "r"]


def test_pagerank_empty_graph_derives_node_type_from_edges(spark):
    """pagerank_undirected is generic over the edge-id type: the empty
    branch must carry the CALLER's node type (here string), not a
    hardcoded long, so empty and non-empty days union cleanly
    (ADVICE r10)."""
    from pyspark.sql.types import DoubleType, StringType

    edges = spark.createDataFrame([], "u string, v string")
    out = pagerank_undirected(edges, n_iter=2)
    assert out.collect() == []
    assert out.schema["node"].dataType == StringType()
    assert out.schema["r"].dataType == DoubleType()
    # and the empty-day frame unions with a populated-day result
    populated = pagerank_undirected(
        spark.createDataFrame([("a", "b")], "u string, v string"), n_iter=1
    )
    assert out.unionByName(populated).count() == 2
