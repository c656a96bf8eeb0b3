"""Property tests for the eval_ops algorithmic cores: the distributed
suffix-array grouping and PCA power iteration must agree with tiny
exact Python/numpy references on randomized synthetic corpora —
including degenerate inputs the fixture never produces (multibyte
alphabets, docs shorter than the seed width, zero-variance embeddings).
Same contract style as test_mining_property.py."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dc_moving_violations_cloud_etl_spark.queries.eval_ops import (
    pca_top_component,
    suffix_repeat_groups,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small alphabet (dup-heavy) + a multibyte char + space, like normalized text
_ALPHA = "ab 的"


def _brute_suffix_groups(texts: list[str], minlen=12, topk=10):
    cnt: Counter[str] = Counter()
    docs_of: defaultdict[str, set] = defaultdict(set)
    for doc_id, s in enumerate(texts):
        for i in range(len(s)):
            suf = s[i:]
            if len(suf) >= minlen:
                cnt[suf] += 1
                docs_of[suf].add(doc_id)
    top = sorted(
        ((c, suf) for suf, c in cnt.items() if c >= 2),
        key=lambda t: (-t[0], t[1]),
    )[:topk]
    return [(suf, c, len(docs_of[suf])) for c, suf in top]


@settings(**_SETTINGS)
@given(
    st.lists(
        st.text(alphabet=_ALPHA, min_size=0, max_size=30),
        min_size=1,
        max_size=12,
    )
)
def test_suffix_groups_match_brute_force(spark, texts):
    # drop empty strings the production path never emits (normalized
    # windowed text of a non-empty doc is non-empty); keep short ones
    rows = [(i, s) for i, s in enumerate(texts) if s]
    if not rows:
        return
    d = spark.createDataFrame(rows, "doc_id long, s string")
    got = [
        (r.suffix, int(r.n_positions), int(r.n_docs))
        for r in suffix_repeat_groups(d).collect()
    ]
    assert got == _brute_suffix_groups([s for _, s in rows])


def _brute_pca(vectors: list[list[float]], iters=8, topd=8):
    x = np.asarray(vectors, dtype=np.float64)
    q = np.floor(x * 1000.0 + 0.5).astype(np.int64).astype(object)
    n, d = q.shape
    s = q.T @ q
    m = q.sum(axis=0)
    cov = n * s - np.outer(m, m)
    v = np.array([1_000_000] * d, dtype=object)
    for _ in range(iters):
        u = cov @ v
        umax = max(abs(int(a)) for a in u)
        if umax == 0:
            v = np.array([0] * d, dtype=object)
        else:
            v = np.array(
                [int(math.floor(int(a) / umax * 1_000_000 + 0.5)) for a in u],
                dtype=object,
            )
    u = cov @ v
    num = sum(int(a) * int(b) for a, b in zip(u, v))
    den = sum(int(a) * int(a) for a in v)
    tr = sum(int(cov[i, i]) for i in range(d))
    share = None if den == 0 or tr == 0 else round(num / den / tr, 6)
    order = sorted(range(d), key=lambda i: (-abs(int(v[i])), i))[:topd]
    return [(i, int(v[i])) for i in order], share


@settings(**_SETTINGS)
@given(
    st.integers(min_value=2, max_value=5).flatmap(
        lambda d: st.lists(
            st.lists(
                st.floats(
                    min_value=-1.0,
                    max_value=1.0,
                    allow_nan=False,
                    width=32,
                ),
                min_size=d,
                max_size=d,
            ),
            min_size=2,
            max_size=12,
        )
    )
)
def test_pca_matches_bigint_reference(spark, vectors):
    from pyspark.sql import functions as F

    d = spark.createDataFrame(
        [(v,) for v in vectors], "embedding array<float>"
    ).select(F.col("embedding"))
    got = pca_top_component(d).collect()
    want_load, want_share = _brute_pca(
        [[float(np.float32(x)) for x in v] for v in vectors]
    )
    assert [(r.dim, int(r.loading_micro)) for r in got] == want_load[: len(got)]
    for r in got:
        if want_share is None:
            assert r.var_explained_top1 is None
        else:
            assert abs(r.var_explained_top1 - want_share) < 2e-6


def test_pca_zero_variance_corpus(spark):
    """A constant corpus must degrade gracefully: zero loadings, NULL
    variance share — not a NaN/divide-by-zero crash."""
    from pyspark.sql import functions as F

    d = spark.createDataFrame(
        [([0.5, 0.5, 0.5],)] * 4, "embedding array<float>"
    ).select(F.col("embedding"))
    got = pca_top_component(d).collect()
    assert all(int(r.loading_micro) == 0 for r in got)
    assert all(r.var_explained_top1 is None for r in got)
