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
