"""Crafted-input unit tests for the data-mining pack (queries/
mining_ops.py) — tiny hand-computable graphs/corpora where the right
answer is known on paper, complementing the sf0.01 oracle differential
the driver runs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dc_moving_violations_cloud_etl_spark.queries import mining_ops


# ---------------------------------------------------------------------------
# triangle census building blocks
# ---------------------------------------------------------------------------


def _census_from_edges(spark, edge_rows):
    """Run the census arithmetic the query applies, over an explicit
    edge list (u < v assumed)."""
    edges = spark.createDataFrame(edge_rows, "u long, v long")
    deg = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    node_stats = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum(F.expr("deg * (deg - 1) div 2")).cast("long").alias("n_wedges"),
    )
    tri = (
        edges.alias("ab")
        .join(edges.alias("bc"), F.col("ab.v") == F.col("bc.u"))
        .join(
            edges.alias("ac"),
            (F.col("ac.u") == F.col("ab.u"))
            & (F.col("ac.v") == F.col("bc.v")),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    row = node_stats.crossJoin(tri).collect()[0]
    return row["n_nodes"], row["n_wedges"], row["n_triangles"]


def test_triangle_census_on_k4(spark):
    """K4: 4 nodes, 6 edges, C(3,2)*4 = 12 wedges, 4 triangles."""
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    n_nodes, n_wedges, n_tri = _census_from_edges(spark, k4)
    assert (n_nodes, n_wedges, n_tri) == (4, 12, 4)


def test_triangle_census_on_path(spark):
    """Path a-b-c: one wedge, zero triangles."""
    n_nodes, n_wedges, n_tri = _census_from_edges(spark, [(1, 2), (2, 3)])
    assert (n_nodes, n_wedges, n_tri) == (3, 1, 0)


def test_triangle_query_runs_on_fixture(spark, sf_dir):
    row = mining_ops._triangle_census(spark, sf_dir).collect()[0]
    # structural invariants: every triangle contains 3 wedges; edge
    # count bounded by wedge-generating degrees
    assert row["n_triangles"] * 3 <= row["n_wedges"] or row["n_wedges"] == 0
    assert row["n_nodes"] >= 0 and row["n_edges"] >= 0


# ---------------------------------------------------------------------------
# z-score outliers: hand-computable moments
# ---------------------------------------------------------------------------


def test_zscore_flags_exactly_the_far_point(spark, sf_dir, monkeypatch):
    """9 values at 1.00 and one at 100.00: only the far point has
    |z| > 2 (z ≈ 3 for the outlier, ≈ 0.33 for the cluster)."""
    data = [("a", 1.00)] * 9 + [("a", 100.00)]
    df = spark.createDataFrame(data, "event_type string, value double")
    monkeypatch.setattr(
        mining_ops, "_events", lambda _spark, _sf: df
    )
    out = mining_ops._zscore_outliers(spark, sf_dir).collect()
    assert len(out) == 1
    row = out[0]
    assert row["n_events"] == 10
    assert row["n_outliers"] == 1
    assert row["max_outlier_cents"] == 10000


def test_zscore_uniform_group_has_no_outliers(spark, sf_dir, monkeypatch):
    df = spark.createDataFrame(
        [("b", 5.0)] * 8, "event_type string, value double"
    )
    monkeypatch.setattr(mining_ops, "_events", lambda _s, _f: df)
    row = mining_ops._zscore_outliers(spark, sf_dir).collect()[0]
    assert row["n_outliers"] == 0 and row["max_outlier_cents"] is None


# ---------------------------------------------------------------------------
# sorted-neighborhood dedup: crafted near-dup corpus
# ---------------------------------------------------------------------------


def test_sorted_neighborhood_finds_prefix_cluster(spark, sf_dir, monkeypatch):
    """Three docs sharing a 32+-char prefix (small tail edits) must land
    in one prefix block and verify as dups (lev <= 20); an unrelated doc
    shares no block. Pairs per block ≤ W * (block size - 1)."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = [
        (0, base),
        (1, base + " tail-edit"),
        (2, base.replace("again and again", "again & again")),
        (3, "completely different content with nothing shared at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    monkeypatch.setattr(mining_ops, "_documents", lambda _s, _f: df)
    rows = {
        r["kind"]: r
        for r in mining_ops._sorted_neighborhood(spark, sf_dir).collect()
    }
    pre = rows["prefix"]
    # one multi-doc block (docs 0,1,2) -> 3 ordered neighbor pairs
    assert pre["n_blocks"] == 1
    assert pre["n_candidate_pairs"] == 3
    assert pre["n_dup_pairs"] == 3
    # doc 2's edit is mid-string: pairs with 0/1 are within lev 20,
    # none identical
    assert pre["n_exact_pairs"] == 0


def test_sorted_neighborhood_window_caps_pairs(spark, sf_dir, monkeypatch):
    """An identical cluster of 20 docs yields W*(n-1)-ish pairs (here
    sum over i of min(W, n-1-i) = 5*19 - (4+3+2+1) = 85 per block
    pass), never C(20,2) = 190 — the linear-vs-quadratic contract."""
    docs = [(i, "identical text payload shared by every document here")
            for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    monkeypatch.setattr(mining_ops, "_documents", lambda _s, _f: df)
    rows = {
        r["kind"]: r
        for r in mining_ops._sorted_neighborhood(spark, sf_dir).collect()
    }
    for kind in ("prefix", "suffix"):
        r = rows[kind]
        assert r["n_candidate_pairs"] == 85  # < 190 all-pairs
        assert r["n_exact_pairs"] == 85


# ---------------------------------------------------------------------------
# basket lift: independence arithmetic
# ---------------------------------------------------------------------------


def test_basket_lift_exact_arithmetic(spark, sf_dir, monkeypatch):
    """2 baskets: both contain A and B, one contains C.
    lift(A,B): 2*2 > 2*2 is False (exact independence — strict >).
    lift(A,C): 1*2 > 2*1 is False. Counts are exact."""
    rows = [
        (1, "2024-01-01 10:00:00", "A"),
        (1, "2024-01-01 11:00:00", "B"),
        (1, "2024-01-01 12:00:00", "C"),
        (2, "2024-01-08 10:00:00", "A"),
        (2, "2024-01-08 11:00:00", "B"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    monkeypatch.setattr(mining_ops, "_events", lambda _s, _f: df)
    out = {
        (r["type_a"], r["type_b"]): r
        for r in mining_ops._basket_lift(spark, sf_dir).collect()
    }
    ab = out[("A", "B")]
    assert (ab["n_a"], ab["n_b"], ab["n_both"]) == (2, 2, 2)
    assert ab["positive_lift"] is False
    ac = out[("A", "C")]
    assert (ac["n_a"], ac["n_b"], ac["n_both"]) == (2, 1, 1)
    assert ac["positive_lift"] is False
