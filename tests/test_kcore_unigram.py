"""Pure-Python reference checks for the round-6 iterative additions:
k-core peeling (mining_ops) and the unigram-LM Viterbi coder
(corpus_ops) — oracle twins prove cross-engine equality; these prove
the algorithms themselves on independently computed references."""

from __future__ import annotations

from collections import Counter

from dc_moving_violations_cloud_etl_spark.queries import get_queries
from dc_moving_violations_cloud_etl_spark.queries.corpus_ops import (
    _UNI_MAXPOS,
    _uni_viterbi_wordlens,
)
from dc_moving_violations_cloud_etl_spark.queries.mining_ops import (
    _KCORE_K,
    _KCORE_ROUNDS,
    _coclick_edges,
)

get_queries()


def _python_peel(edges: set[tuple[int, int]], k: int, rounds: int):
    trace = []
    cur = set(edges)
    for _ in range(rounds):
        deg = Counter()
        for u, v in cur:
            deg[u] += 1
            deg[v] += 1
        low = {n for n, d in deg.items() if d < k}
        cur = {(u, v) for u, v in cur if u not in low and v not in low}
        trace.append((len(low), len(cur)))
    return trace


def test_kcore_matches_python_reference(spark, sf_dir):
    from dc_moving_violations_cloud_etl_spark.queries.registry import QUERIES

    edges = {
        (r["u"], r["v"])
        for r in _coclick_edges(spark, sf_dir).collect()
    }
    want = _python_peel(edges, _KCORE_K, _KCORE_ROUNDS)
    got = [
        (r["n_removed"], r["n_edges"])
        for r in QUERIES["graph_kcore_peel"].build(spark, sf_dir).collect()
    ]
    assert got == want
    # the peel only shrinks, and the fixture reaches fixpoint in-bounds
    sizes = [e for _, e in got]
    assert sizes == sorted(sizes, reverse=True)
    assert got[-1][0] == 0


def _python_viterbi(word: str, lp: dict[str, int]):
    """Max-sum DP with the engine's tie-break (fewer pieces on equal
    score); returns (n_pieces, best_lp)."""
    best: list[tuple[int, int] | None] = [None] * (len(word) + 1)
    best[0] = (0, 0)  # (score, -npieces) lexicographic max
    for e in range(1, len(word) + 1):
        cands = []
        for s in range(max(0, e - 6), e):
            piece = word[s:e]
            if piece in lp and best[s] is not None:
                cands.append((best[s][0] + lp[piece], best[s][1] - 1))
        if cands:
            best[e] = max(cands)
    sc, negnp = best[len(word)]
    return (-negnp, sc)


def test_unigram_viterbi_matches_python_reference(spark, sf_dir):
    from dc_moving_violations_cloud_etl_spark.queries.corpus_ops import (
        _uni_core,
    )

    _, vocab = _uni_core(spark, sf_dir)
    lp = {r["piece"]: r["lp"] for r in vocab.collect()}
    _, wlen = _uni_viterbi_wordlens(spark, sf_dir)
    for r in wlen.collect():
        w = r["w"]
        if len(w) > _UNI_MAXPOS:
            assert r["n_pieces"] == len(w) and r["best_lp"] is None
            continue
        np_ref, lp_ref = _python_viterbi(w, lp)
        assert (r["n_pieces"], r["best_lp"]) == (np_ref, lp_ref), w
