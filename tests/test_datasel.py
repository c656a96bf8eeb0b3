"""Property/unit coverage for the round-6 data-selection operators
(queries/datasel_ops.py) — the oracle twins check end-to-end equality;
these pin the algorithmic cores independently of the fixture."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dc_moving_violations_cloud_etl_spark.queries import QUERIES, get_queries
from dc_moving_violations_cloud_etl_spark.queries.datasel_ops import (
    hits_authorities,
)

get_queries()


def _numpy_hits(edges: list[tuple[int, int]], n_iter: int) -> dict[int, float]:
    """Dense reference: L1-normalized HITS on a bipartite edge list."""
    users = sorted({u for u, _ in edges})
    items = sorted({k for _, k in edges})
    ui = {u: i for i, u in enumerate(users)}
    ki = {k: i for i, k in enumerate(items)}
    m = np.zeros((len(users), len(items)))
    for u, k in edges:
        m[ui[u], ki[k]] = 1.0
    h = np.ones(len(users))
    a = None
    for _ in range(n_iter):
        a = m.T @ h
        a = a / a.sum()
        h = m @ a
        h = h / h.sum()
    return {k: a[ki[k]] for k in items}


@pytest.mark.parametrize("n_iter", [1, 3])
def test_hits_matches_dense_numpy(spark, n_iter):
    rng = np.random.default_rng(7)
    edges = sorted(
        {
            (int(rng.integers(0, 12)), int(rng.integers(100, 112)))
            for _ in range(60)
        }
    )
    df = spark.createDataFrame(edges, "u long, k long")
    got = {
        r["k"]: r["a"]
        for r in hits_authorities(df, n_iter).collect()
    }
    want = _numpy_hits(edges, n_iter)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12), k


def test_kneser_ney_discount_mass_bounded(spark, sf_dir):
    """For every reported bigram, 0 < p_kn <= 1, and the discounted
    direct term never exceeds the raw MLE c2/c1 — the invariant the
    D=0.75 absolute discount exists to provide."""
    rows = QUERIES["corpus_kneser_ney_bigram"].build(spark, sf_dir).collect()
    assert len(rows) == 50
    for r in rows:
        assert 0.0 < r["p_kn"] <= 1.0, r


def test_seqlen_histogram_shares_sum_to_one(spark, sf_dir):
    df = QUERIES["corpus_seqlen_histogram"].build(spark, sf_dir)
    per_lang = (
        df.groupBy("lang").agg(F.round(F.sum("share"), 3).alias("s")).collect()
    )
    assert per_lang
    for r in per_lang:
        assert abs(r["s"] - 1.0) <= 0.01, r  # 6dp-rounded cell shares

    # power-of-2 bucket invariant: min/max token counts sit inside
    # [bucket_lo, 2*bucket_lo)
    for r in df.collect():
        assert r["bucket_lo"] <= r["min_toks"] <= r["max_toks"], r
        assert r["max_toks"] < 2 * r["bucket_lo"], r


def test_naive_bayes_confusion_covers_all_test_docs(spark, sf_dir):
    """Every held-out doc gets exactly one prediction: confusion-matrix
    mass equals the test-split size."""
    from dc_moving_violations_cloud_etl_spark import catalog

    conf = QUERIES["curation_naive_bayes_langid"].build(spark, sf_dir)
    n_pred = conf.agg(F.sum("n_docs")).collect()[0][0]
    n_test = (
        catalog.base(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 5 == 0)
        .count()
    )
    assert n_pred == n_test


def test_dsir_target_slice_scores_higher(spark, sf_dir):
    """The importance weight must rank the TARGET domain above the
    rest on average — the defining property of the log-likelihood
    ratio (target docs' features ARE the target distribution)."""
    df = QUERIES["corpus_dsir_importance_weights"].build(spark, sf_dir)
    rows = df.groupBy(F.col("lang") == "en").agg(
        F.avg("avg_log_ratio").alias("m")
    ).collect()
    means = {r[0]: r["m"] for r in rows}
    assert means[True] > means[False]
