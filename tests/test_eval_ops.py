"""Semantic tests for the eval_ops module — dense numpy / pure-python
replays and estimator invariants that the oracle-parity gate (which
checks cross-engine agreement, not algorithmic truth) cannot see."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from dc_moving_violations_cloud_etl_spark.queries import QUERIES, get_queries

get_queries()  # force registration


def _run(spark, sf_dir, name) -> pd.DataFrame:
    return QUERIES[name].build(spark, sf_dir).toPandas()


# ---------------------------------------------------------------------------
# PCA power iteration
# ---------------------------------------------------------------------------


def _load_q(sf_dir) -> np.ndarray:
    import duckdb

    arr = (
        duckdb.connect()
        .execute(
            f"SELECT embedding FROM read_parquet('{sf_dir}/embeddings.parquet')"
            " ORDER BY vec_id"
        )
        .df()["embedding"]
    )
    x = np.stack([np.asarray(v, dtype=np.float64) for v in arr])
    return np.floor(x * 1000.0 + 0.5).astype(np.int64)


def test_pca_matches_dense_numpy_schedule(spark, sf_dir):
    """The distributed query must reproduce the IDENTICAL fixed schedule
    run densely in numpy (object-exact: integer micro-unit loadings)."""
    q = _load_q(sf_dir)
    n, d = q.shape
    s = q.T.astype(object) @ q.astype(object)  # exact big-int arithmetic
    m = q.sum(axis=0).astype(object)
    cov = n * s - np.outer(m, m)
    v = np.full(d, 1_000_000, dtype=object)
    for _ in range(8):
        u = cov @ v
        umax = max(abs(int(x)) for x in u)
        v = np.array(
            [int(math.floor(int(x) / umax * 1_000_000 + 0.5)) for x in u],
            dtype=object,
        )
    order = sorted(range(d), key=lambda i: (-abs(int(v[i])), i))[:8]
    got = _run(spark, sf_dir, "embedding_pca_power_iteration")
    assert list(got["dim"]) == order
    assert [int(x) for x in got["loading_micro"]] == [int(v[i]) for i in order]
    # Rayleigh variance-explained share replay
    u = cov @ v
    num = float(sum(int(a) * int(b) for a, b in zip(u, v)))
    den = float(sum(int(a) * int(a) for a in v))
    tr = float(sum(int(cov[i, i]) for i in range(d)))
    want = round(num / den / tr, 6)
    assert got["var_explained_top1"].iloc[0] == pytest.approx(want, abs=1e-9)


def test_pca_top1_share_close_to_true_eigenvalue(sf_dir):
    """8 power-iteration rounds must land near the TRUE dominant
    eigenvalue share (semantic correctness, not just schedule parity)."""
    q = _load_q(sf_dir).astype(np.float64)
    c = np.cov(q, rowvar=False, bias=True)
    w = np.linalg.eigvalsh(c)
    true_share = w[-1] / w.sum()
    # replay the integer schedule to get the query's reported share
    n, d = q.shape
    cov = n * n * c  # same matrix up to the n^2 scale factor
    v = np.full(d, 1_000_000.0)
    for _ in range(8):
        u = cov @ v
        v = np.floor(u / np.abs(u).max() * 1_000_000 + 0.5)
    got_share = (v @ cov @ v) / (v @ v) / np.trace(cov)
    assert got_share <= true_share + 1e-9  # Rayleigh quotient upper bound
    assert got_share >= 0.8 * true_share  # converged near the top eigenpair


# ---------------------------------------------------------------------------
# Suffix-array prefix doubling
# ---------------------------------------------------------------------------


def test_suffix_groups_match_direct_python_grouping(spark, sf_dir):
    import duckdb
    import re

    rows = (
        duckdb.connect()
        .execute(
            f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet')"
            " ORDER BY doc_id"
        )
        .fetchall()
    )
    from collections import Counter, defaultdict

    cnt: Counter[str] = Counter()
    docs_of: defaultdict[str, set] = defaultdict(set)
    for doc_id, (text,) in enumerate(rows):
        s = re.sub(r"\s+", " ", text.strip()).lower()[:48]
        for i in range(len(s)):
            suf = s[i:]
            if len(suf) >= 12:
                cnt[suf] += 1
                docs_of[suf].add(doc_id)
    expect = sorted(
        ((c, suf) for suf, c in cnt.items() if c >= 2),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    got = _run(spark, sf_dir, "corpus_suffix_array_doubling")
    assert [(int(r.n_positions), r.suffix) for r in got.itertuples()] == expect
    for r in got.itertuples():
        assert int(r.n_docs) == len(docs_of[r.suffix])


# ---------------------------------------------------------------------------
# pass@k and best-of-n estimator invariants
# ---------------------------------------------------------------------------


def test_pass_at_k_estimator_formula():
    """The telescoping product equals 1 - C(n-c,k)/C(n,k) exactly."""
    for n, c, k in [(10, 3, 5), (15, 0, 10), (8, 8, 4), (12, 2, 12)]:
        prod = 1.0
        for i in range(k):
            prod *= (n - c - i) / (n - i)
        direct = 1.0 - (
            math.comb(n - c, k) / math.comb(n, k) if n - c >= k else 0.0
        )
        assert prod == pytest.approx(1.0 - direct, abs=1e-12)


def test_pass_at_k_monotone_in_k(spark, sf_dir):
    got = _run(spark, sf_dir, "eval_pass_at_k").sort_values("k")
    vals = list(got["mean_pass_at_k"])
    assert all(b >= a - 1e-9 for a, b in zip(vals, vals[1:]))
    assert all(0.0 <= v <= 1.0 for v in vals)


def test_best_of_n_monotone_in_n(spark, sf_dir):
    got = _run(spark, sf_dir, "mining_best_of_n_gains").sort_values(
        "n_samples"
    )
    vals = list(got["mean_best_reward"])
    assert all(b >= a - 1e-9 for a, b in zip(vals, vals[1:]))
    lifts = list(got["lift_vs_n1"])
    assert lifts[0] == pytest.approx(1.0)
    assert all(l >= 1.0 - 1e-9 for l in lifts)


# ---------------------------------------------------------------------------
# calibration bins
# ---------------------------------------------------------------------------


def test_calibration_bins_are_consistent(spark, sf_dir):
    got = _run(spark, sf_dir, "curation_calibration_ece")
    assert (got["bin"] >= 0).all() and (got["bin"] <= 9).all()
    assert got["bin"].is_unique
    # every confidence mean must sit inside its bin (softmax max-class
    # confidence is >= 1/5 for 5 classes, so bins below 2 are empty)
    for r in got.itertuples():
        lo, hi = r.bin / 10.0, (r.bin + 1) / 10.0 if r.bin < 9 else 1.0 + 1e-9
        assert lo - 1e-9 <= r.mean_conf <= hi + 1e-9
        assert 0.0 <= r.accuracy <= 1.0
        assert r.abs_gap == pytest.approx(abs(r.mean_conf - r.accuracy), abs=2e-6)
    # ECE equals the doc-weighted mean |gap| and is constant across rows
    assert got["ece"].nunique() == 1
    want = (got["n_docs"] * got["abs_gap"]).sum() / got["n_docs"].sum()
    assert got["ece"].iloc[0] == pytest.approx(want, abs=2e-6)


# ---------------------------------------------------------------------------
# ROUGE-2 replay
# ---------------------------------------------------------------------------


def test_rouge2_matches_python_replay(spark, sf_dir):
    import duckdb
    import re
    from collections import defaultdict

    rows = (
        duckdb.connect()
        .execute(
            f"SELECT doc_id, lang, text FROM"
            f" read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
        )
        .fetchall()
    )
    by_lang = defaultdict(list)
    for doc_id, lang, text in rows:
        toks = re.sub(r"\s+", " ", text.strip()).lower().split(" ")
        grams = {f"{a} {b}" for a, b in zip(toks, toks[1:])}
        by_lang[lang].append(grams)
    got = _run(spark, sf_dir, "eval_rouge2_pairs").set_index("lang")
    for lang, gs in by_lang.items():
        ps, rs, f1s = [], [], []
        for cb, rb in zip(gs, gs[1:]):
            ov = len(cb & rb)
            p = ov / len(cb) if cb else 0.0
            r = ov / len(rb) if rb else 0.0
            ps.append(p)
            rs.append(r)
            f1s.append(2 * p * r / (p + r) if p + r > 0 else 0.0)
        row = got.loc[lang]
        assert int(row.n_pairs) == len(ps)
        assert row.rouge2_precision == pytest.approx(
            sum(ps) / len(ps), abs=2e-6
        )
        assert row.rouge2_recall == pytest.approx(sum(rs) / len(rs), abs=2e-6)
        assert row.rouge2_f1 == pytest.approx(sum(f1s) / len(f1s), abs=2e-6)

# ---------------------------------------------------------------------------
# AUC and Spearman replays
# ---------------------------------------------------------------------------


def _doc_signals(sf_dir):
    import duckdb
    import re

    rows = (
        duckdb.connect()
        .execute(
            f"SELECT doc_id, lang, text FROM"
            f" read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
        )
        .fetchall()
    )
    stop = {"the", "a", "of", "and", "to", "is"}
    out = []
    for doc_id, lang, text in rows:
        toks = re.sub(r"\s+", " ", text.strip()).lower().split(" ")
        ttr = len(set(toks)) / len(toks)
        sr = sum(1 for t in toks if t in stop) / len(toks)
        out.append((doc_id, lang, ttr, sr))
    return out


def test_auc_matches_python_midrank_replay(spark, sf_dir):
    sig = _doc_signals(sf_dir)
    pairs = sorted((sr, 1 if lang == "en" else 0) for _, lang, _, sr in sig)
    # midranks per tied score group
    from collections import defaultdict

    groups = defaultdict(lambda: [0, 0])
    for s, y in pairs:
        groups[s][y] += 1
    below, rank_sum_pos, n_pos, n_neg = 0, 0.0, 0, 0
    for s in sorted(groups):
        nn, np_ = groups[s]
        cnt = nn + np_
        mid = below + (cnt + 1) / 2.0
        rank_sum_pos += np_ * mid
        n_pos += np_
        n_neg += nn
        below += cnt
    want = (rank_sum_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
    got = _run(spark, sf_dir, "eval_auc_quality_gate").iloc[0]
    assert int(got.n_pos) == n_pos and int(got.n_neg) == n_neg
    assert got.auc == pytest.approx(round(want, 6), abs=2e-6)


def test_spearman_matches_python_replay(spark, sf_dir):
    sig = _doc_signals(sf_dir)
    ra = {
        doc: i + 1
        for i, (doc, *_rest) in enumerate(
            sorted(sig, key=lambda r: (r[2], r[0]))
        )
    }
    rb = {
        doc: i + 1
        for i, (doc, *_rest) in enumerate(
            sorted(sig, key=lambda r: (r[3], r[0]))
        )
    }
    n = len(sig)
    d2 = sum((ra[doc] - rb[doc]) ** 2 for doc, *_ in sig)
    want = 1.0 - 6.0 * d2 / (n * (n * n - 1.0))
    got = _run(spark, sf_dir, "eval_spearman_signals").iloc[0]
    assert int(got.n_docs) == n
    assert got.spearman_rho == pytest.approx(round(want, 6), abs=2e-6)


def test_ndcg_mrr_matches_python_replay(spark, sf_dir):
    import duckdb
    import hashlib
    import math as m
    import re
    from collections import defaultdict

    rows = (
        duckdb.connect()
        .execute(
            f"SELECT doc_id, text FROM"
            f" read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
        )
        .fetchall()
    )
    stop = {"the", "a", "of", "and", "to", "is"}
    buckets = defaultdict(list)
    for doc_id, text in rows:
        toks = re.sub(r"\s+", " ", text.strip()).lower().split(" ")
        q = int(hashlib.md5(f"q:{doc_id}".encode()).hexdigest()[:8], 16) % 32
        s = len(set(toks)) / len(toks)
        sr = sum(1 for t in toks if t in stop) / len(toks)
        rel = 0 if len(toks) < 20 else (2 if sr >= 0.02 and len(toks) >= 40 else 1)
        buckets[q].append((doc_id, s, rel))
    ndcgs, mrrs = [], []
    for q, cands in buckets.items():
        by_score = sorted(cands, key=lambda c: (-c[1], c[0]))
        by_rel = sorted(cands, key=lambda c: (-c[2], c[0]))
        dcg = sum(
            (2.0 ** r - 1.0) / m.log2(i + 2)
            for i, (_, _, r) in enumerate(by_score[:10])
        )
        idcg = sum(
            (2.0 ** r - 1.0) / m.log2(i + 2)
            for i, (_, _, r) in enumerate(by_rel[:10])
        )
        ndcgs.append(dcg / idcg if idcg > 0 else 0.0)
        first = next(
            (i + 1 for i, (_, _, r) in enumerate(by_score[:10]) if r == 2),
            None,
        )
        mrrs.append(1.0 / first if first else 0.0)
    got = _run(spark, sf_dir, "eval_ndcg_mrr").iloc[0]
    assert int(got.n_queries) == len(buckets)
    assert got.mean_ndcg_at10 == pytest.approx(
        sum(ndcgs) / len(ndcgs), abs=2e-6
    )
    assert got.mean_mrr_at10 == pytest.approx(sum(mrrs) / len(mrrs), abs=2e-6)
