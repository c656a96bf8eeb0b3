"""Property tests for the iterative graph/ML operators against dense
pure-Python references on random small inputs — the same layering as
``test_components_property`` (operator core vs an independent
implementation, decoupled from the fixture-derived edge construction)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from dc_moving_violations_cloud_etl_spark.queries.mining_ops import (
    pagerank_undirected,
)


def _ref_pagerank(edges, n_iter=3, damp=0.85):
    """Dense reference power iteration (same uniform init / teleport /
    no-dangling assumptions as the operator — undirected edges, every
    node has degree >= 1)."""
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    nbrs = {i: [] for i in range(len(nodes))}
    for a, b in edges:
        nbrs[idx[a]].append(idx[b])
        nbrs[idx[b]].append(idx[a])
    n = len(nodes)
    r = [1.0 / n] * n
    for _ in range(n_iter):
        nxt = [(1.0 - damp) / n] * n
        for i in range(n):
            share = damp * r[i] / len(nbrs[i])
            for j in nbrs[i]:
                nxt[j] += share
        r = nxt
    return {nodes[i]: r[i] for i in range(n)}


@pytest.mark.parametrize("seed", [7, 23, 99])
def test_pagerank_matches_dense_reference(spark, seed):
    rng = random.Random(seed)
    n = rng.randint(5, 16)
    # random undirected graph, no isolated nodes by construction
    edges = set()
    for v in range(1, n):
        u = rng.randrange(v)  # spanning-tree edge keeps everyone deg>=1
        edges.add((u, v))
    for _ in range(n):
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    edf = spark.createDataFrame(sorted(edges), "u long, v long")
    got = {
        row["node"]: row["r"]
        for row in pagerank_undirected(edf).collect()
    }
    want = _ref_pagerank(sorted(edges))
    assert set(got) == set(want)
    for node, r in want.items():
        assert abs(got[node] - r) < 1e-9, (node, got[node], r)
    # probability mass is conserved (no dangling leakage)
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_star_hub_outranks_leaves(spark):
    # star graph: the hub (degree 4) must outrank every leaf (degree 1).
    # (A structural check a regular graph cannot provide — PageRank of
    # any regular component is uniform.)
    star = [(0, leaf) for leaf in range(1, 5)]
    edf = spark.createDataFrame(star, "u long, v long")
    got = {r["node"]: r["r"] for r in pagerank_undirected(edf).collect()}
    assert got[0] > max(got[leaf] for leaf in range(1, 5))


def _ref_kmeans(vecs, k=8, rounds=2):
    """Dense reference of the exact quantized k-means: q = round(x*1000),
    first-k init, argmin by (dist, cluster), round-half-up centroid
    requantization via floor((2S+n)/(2n))."""
    import math

    q = {vid: [round(x * 1000) for x in v] for vid, v in vecs.items()}

    def assign(cent):
        out = {}
        for vid, vq in q.items():
            best = None
            for c, cv in sorted(cent.items()):
                d = sum((a - b) * (a - b) for a, b in zip(vq, cv))
                if best is None or d < best[0]:
                    best = (d, c)
            out[vid] = best[1]
        return out

    cent = {vid: q[vid] for vid in sorted(q) if vid < k}
    a = assign(cent)
    dims = len(next(iter(q.values())))
    cent2 = {}
    for c in set(a.values()):
        members = [q[v] for v in q if a[v] == c]
        n = len(members)
        cent2[c] = [
            int(math.floor((2.0 * sum(m[i] for m in members) + n) / (2.0 * n)))
            for i in range(dims)
        ]
    return assign(cent2)


@pytest.mark.parametrize("seed", [3, 41])
def test_kmeans_matches_dense_reference(spark, seed):
    from dc_moving_violations_cloud_etl_spark.queries.mining_ops import (
        kmeans_assign,
    )

    rng = random.Random(seed)
    n, dims = rng.randint(20, 40), rng.randint(3, 6)
    vecs = {
        vid: [rng.uniform(-1, 1) for _ in range(dims)] for vid in range(n)
    }
    emb = spark.createDataFrame(
        [(vid, [float(x) for x in v]) for vid, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    # reference quantizes from the FLOAT32-rounded values the DataFrame
    # stores, matching what the operator reads back from the column
    import struct

    f32 = lambda x: struct.unpack("f", struct.pack("f", x))[0]  # noqa: E731
    vecs32 = {vid: [f32(x) for x in v] for vid, v in vecs.items()}
    _, a2 = kmeans_assign(emb)
    got = {r["vec_id"]: r["cluster"] for r in a2.collect()}
    want = _ref_kmeans(vecs32)
    assert got == want
