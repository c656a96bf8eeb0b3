"""Property coverage for greedy k-center seeding
(queries/mining_ops.kcenter_seeds) — the oracle twin checks end-to-end
equality; these pin the algorithm against a dense pure-Python reference
independent of the fixture."""

from __future__ import annotations

import numpy as np
import pytest

from dc_moving_violations_cloud_etl_spark.queries import get_queries
from dc_moving_violations_cloud_etl_spark.queries.mining_ops import (
    _KC_K,
    kcenter_seeds,
)

get_queries()


def _dense_kcenter(vecs: dict[int, np.ndarray], k: int):
    """Greedy farthest-point traversal with the engine's exact rules:
    milli-unit quantization, integer squared-L2, farthest ties break
    to lowest vec_id, seed = lowest vec_id."""
    q = {i: np.round(v.astype(np.float64) * 1000).astype(np.int64)
         for i, v in vecs.items()}
    seed = min(q)
    seeds = [(0, seed, 0)]
    centers = [q[seed]]
    min_d2 = {i: int(((v - centers[0]) ** 2).sum()) for i, v in q.items()}
    for rnd in range(1, k):
        far = max(min_d2, key=lambda i: (min_d2[i], -i))
        seeds.append((rnd, far, min_d2[far]))
        centers.append(q[far])
        for i, v in q.items():
            min_d2[i] = min(min_d2[i], int(((v - centers[-1]) ** 2).sum()))
    return seeds


@pytest.mark.parametrize("seed", [3, 11])
def test_kcenter_matches_dense_reference(spark, seed):
    rng = np.random.default_rng(seed)
    n, dim = 40, 6
    vecs = {i: rng.normal(size=dim).astype(np.float32) for i in range(n)}
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    _, got, _ = kcenter_seeds(emb)
    assert got == _dense_kcenter(vecs, _KC_K)


def test_kcenter_query_invariants(spark, sf_dir):
    from dc_moving_violations_cloud_etl_spark.queries.registry import QUERIES

    rows = QUERIES["embedding_kcenter_seeds"].build(spark, sf_dir).collect()
    assert [r["round"] for r in rows] == list(range(_KC_K))
    # distinct centers; selection radii non-increasing after round 0
    ids = [r["center_vec_id"] for r in rows]
    assert len(set(ids)) == _KC_K
    radii = [r["d2_at_selection"] for r in rows[1:]]
    assert radii == sorted(radii, reverse=True)
    # every corpus point lands in exactly one cell
    n_total = sum(r["n_assigned"] for r in rows)
    emb_count = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert n_total == emb_count
