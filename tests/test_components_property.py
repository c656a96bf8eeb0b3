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


def _clone_fixture(spark, n_clones: int):
    """32 deterministic 'plane' vectors (vec_id 1..32 — the rows
    _embedding_banded reads its hyperplanes from) plus a flood of
    n_clones IDENTICAL vectors: every clone shares every band
    signature, so the clones form band buckets of population >=
    n_clones."""
    import math

    rows = []
    for vid in range(1, 33):
        rows.append(
            (
                vid,
                "plane",
                [
                    round(math.sin(vid * 7.3 + d * 1.9), 6)
                    for d in range(8)
                ],
            )
        )
    clone = [round(math.cos(d * 0.7) + 2.0, 6) for d in range(8)]
    for k in range(n_clones):
        rows.append((1000 + k, "clone", clone))
    return spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )


def test_capped_edges_boundary_semantics(spark):
    """The overflow accounting's boundary theorem (ADVICE r8): a bucket
    of exactly cap+1 members loses NO candidate pairs (the single
    non-anchor pairs with every anchor). With cap = max-bucket-
    population - 1, every bucket is at or below cap+1, so (a) the
    capped verified edges must EQUAL the uncapped all-pairs verified
    edges and (b) overflow_buckets must be 0; at cap one lower, the max
    bucket genuinely truncates — overflow_buckets > 0 — while the clone
    flood stays CONNECTED (one component), the property the cap exists
    to preserve."""
    from dc_moving_violations_cloud_etl_spark import caching
    from dc_moving_violations_cloud_etl_spark.operators.dedup import (
        _embedding_banded,
        embedding_capped_pair_edges,
        embedding_cosine_pairs,
    )
    from pyspark.sql import functions as F

    emb = _clone_fixture(spark, 12)
    try:
        _, banded = _embedding_banded(emb)
        m = (
            banded.groupBy("band_idx", "band_sig")
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        assert m >= 12  # the clone flood dominates its buckets
        uncapped = {
            (r.a_vec_id, r.b_vec_id)
            for r in embedding_cosine_pairs(emb).collect()
        }

        # cap+1 == max population: nothing truncates, nothing is lost
        edges, overflow = embedding_capped_pair_edges(emb, cap=m - 1)
        assert overflow.collect()[0]["overflow_buckets"] == 0
        capped = {
            (r.a_vec_id, r.b_vec_id)
            for r in edges.select("a_vec_id", "b_vec_id").collect()
        }
        assert capped == uncapped

        # one lower: the max bucket truncates and the accounting says so
        edges2, overflow2 = embedding_capped_pair_edges(emb, cap=m - 2)
        assert overflow2.collect()[0]["overflow_buckets"] > 0
        clone_ids = {1000 + k for k in range(12)}
        labels = components_from_edges(
            edges2.selectExpr("a_vec_id as a", "b_vec_id as b")
        ).collect()
        covered = {r["node"] for r in labels if r["node"] in clone_ids}
        clone_labels = {
            r["label"] for r in labels if r["node"] in clone_ids
        }
        assert covered == clone_ids
        assert len(clone_labels) == 1, clone_labels
    finally:
        caching.release_tracked()
