"""Property tests for the corpus_ops tokenizer/sampling cores: the
unigram-LM seed-vocab scoring + relational Viterbi DP and the word2vec
negative-sampling integer CDF / bucketed alias-table lookup must agree
with exhaustive Python references on randomized synthetic vocabularies
— including degenerate inputs the fixture never produces (single-word
vocabularies, all-identical words, multibyte alphabets, words longer
than the DP horizon). Same contract style as test_eval_property.py
(VERDICT r6 rec #5: extend the property-test pattern to the unigram
Viterbi and negative-sampling cores)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dc_moving_violations_cloud_etl_spark.queries.corpus_ops import (
    _UNI_MAXPOS,
    _UNI_MAX_PIECE,
    _UNI_TOP_MULTI,
    negative_samples_core,
    unigram_vocab_core,
    viterbi_wordlens_core,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small alphabet (dup-heavy, collision-heavy) + a multibyte char, like
# the normalized token stream the production path feeds these cores
_ALPHA = "ab的"

# random (word, freq) vocabularies; min_size=1 exercises the
# single-word degenerate case, max word length 20 exercises the
# > _UNI_MAXPOS char-fallback path
_WORDS = st.dictionaries(
    st.text(alphabet=_ALPHA, min_size=1, max_size=20),
    st.integers(min_value=1, max_value=50),
    min_size=1,
    max_size=10,
)


def _half_up(x: float) -> int:
    """Spark's ROUND(double, 0): BigDecimal.valueOf(double) (shortest
    decimal repr, = Python repr) + setScale(0, HALF_UP)."""
    return int(
        Decimal(repr(x)).to_integral_value(rounding=ROUND_HALF_UP)
    )


def _brute_vocab(words: dict[str, int]) -> dict[str, tuple[int, int, int]]:
    """Python replay of unigram_vocab_core: piece -> (pfreq, score, lp)."""
    pfreq: Counter[str] = Counter()
    for w, f in words.items():
        n = len(w)
        for s in range(n):
            for ln in range(1, min(_UNI_MAX_PIECE, n - s) + 1):
                pfreq[w[s : s + ln]] += f
    score = {p: c * len(p) for p, c in pfreq.items()}
    chars = [p for p in score if len(p) == 1]
    multi = sorted(
        (p for p in score if len(p) > 1), key=lambda p: (-score[p], p)
    )[:_UNI_TOP_MULTI]
    kept = chars + multi
    total = sum(score[p] for p in kept)
    return {
        p: (pfreq[p], score[p], _half_up(math.log(score[p] / total) * 1e4))
        for p in kept
    }


def _brute_viterbi(
    w: str, lp: dict[str, int]
) -> tuple[int, int | None]:
    """Exhaustive DP twin: maximize (sum lp, -n_pieces) over all
    segmentations into vocab pieces; char fallback past the horizon."""
    if len(w) > _UNI_MAXPOS:
        return len(w), None
    best: dict[int, tuple[int, int]] = {0: (0, 0)}  # pos -> (lp, np)
    for e in range(1, len(w) + 1):
        cands = [
            (best[s][0] + lp[w[s:e]], best[s][1] + 1)
            for s in range(max(0, e - _UNI_MAX_PIECE), e)
            if s in best and w[s:e] in lp
        ]
        if cands:
            best[e] = max(cands, key=lambda t: (t[0], -t[1]))
    b, np_ = best[len(w)]  # always reachable: every char is in the vocab
    return np_, b


@settings(**_SETTINGS)
@given(_WORDS)
def test_unigram_vocab_matches_python_replay(spark, words):
    d = spark.createDataFrame(list(words.items()), "w string, freq long")
    got = {
        r.piece: (int(r.pfreq), int(r.score), int(r.lp))
        for r in unigram_vocab_core(d).collect()
    }
    assert got == _brute_vocab(words)


@settings(**_SETTINGS)
@given(_WORDS)
def test_viterbi_matches_exhaustive_segmentation(spark, words):
    d = spark.createDataFrame(list(words.items()), "w string, freq long")
    vocab = unigram_vocab_core(d)
    got = {
        r.w: (int(r.n_pieces), None if r.best_lp is None else int(r.best_lp))
        for r in viterbi_wordlens_core(d, vocab).collect()
    }
    lp = {p: v[2] for p, v in _brute_vocab(words).items()}
    assert got == {w: _brute_viterbi(w, lp) for w in words}


def _brute_negatives(
    words: dict[str, int], pairs: list[tuple[str, str, int]], k: int = 5
) -> set[tuple[str, str, int, int, str, bool]]:
    """Python replay of negative_samples_core: exact integer CDF over
    the w-ordered vocabulary + brute interval scan per 60-bit md5 draw
    (the alias-table bucketing must be a pure lookup optimization)."""
    ivs = []
    lo = 0
    for w in sorted(words):
        wt = _half_up(words[w] ** 0.75 * 1_000_000)
        ivs.append((w, lo, lo + wt))
        lo += wt
    total = lo
    out = set()
    for w1, w2, rank in pairs:
        for kk in range(1, k + 1):
            h = int(
                hashlib.md5(f"{w1}|{w2}|{kk}".encode()).hexdigest()[:15], 16
            )
            u = h % total
            neg = next(w for w, a, b in ivs if a <= u < b)
            out.add((w1, w2, rank, kk, neg, neg in (w1, w2)))
    return out


@settings(**_SETTINGS)
@given(
    _WORDS.flatmap(
        lambda words: st.tuples(
            st.just(words),
            st.lists(
                st.tuples(
                    st.sampled_from(sorted(words)),
                    st.sampled_from(sorted(words)),
                ),
                min_size=1,
                max_size=6,
                unique=True,
            ),
        )
    )
)
def test_negative_sampling_matches_interval_scan(spark, words_pairs):
    words, raw_pairs = words_pairs
    pairs = [(w1, w2, i + 1) for i, (w1, w2) in enumerate(raw_pairs)]
    wd = spark.createDataFrame(list(words.items()), "w string, freq long")
    pd_ = spark.createDataFrame(pairs, "w1 string, w2 string, rank long")
    rows = negative_samples_core(wd, pd_).collect()
    got = {
        (r.w1, r.w2, int(r.rank), int(r.k), r.neg_word, bool(r.is_collision))
        for r in rows
    }
    want = _brute_negatives(words, pairs)
    # exactly K draws per pair AND each draw resolved by exactly one
    # covering interval (the alias-table join emits one row per draw)
    assert len(rows) == len(pairs) * 5
    assert got == want


@settings(**_SETTINGS)
@given(_WORDS)
def test_negative_sampling_bucket_map_covers_cdf_exactly(spark, words):
    """The alias-table BUCKETING invariant on its own (VERDICT r8 rec
    #8): every vocab interval must land in exactly the fixed-width
    buckets it overlaps — so for EVERY point u in [0, total), the
    bucket-filtered candidate set contains the covering interval
    (lookup completeness) and the range filter leaves exactly one row
    (lookup uniqueness). Replays the integer bucket arithmetic in
    Python against the DataFrame-built bucket map."""
    from dc_moving_violations_cloud_etl_spark.queries.corpus_ops import (
        _NEG_BUCKETS,
        _NEG_POW_SCALE,
    )
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    wd = spark.createDataFrame(list(words.items()), "w string, freq long")
    w = Window.orderBy("w")
    vocab = wd.select(
        "w",
        F.round(F.pow(F.col("freq").cast("double"), 0.75) * _NEG_POW_SCALE, 0)
        .cast("long")
        .alias("wt"),
    )
    cdf = vocab.select(
        "w",
        (F.sum("wt").over(w) - F.col("wt")).alias("lo"),
        F.sum("wt").over(w).alias("hi"),
    )
    total = cdf.agg(F.max("hi")).collect()[0][0]
    bmap = cdf.select(
        "w",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.expr(f"(lo * {_NEG_BUCKETS}) div {total}"),
                F.expr(f"((hi - 1) * {_NEG_BUCKETS}) div {total}"),
            )
        ).alias("bucket"),
    ).collect()
    by_bucket: dict[int, list] = {}
    for r in bmap:
        by_bucket.setdefault(int(r.bucket), []).append(r)
        # an interval appears ONLY in buckets it genuinely overlaps
        b_lo = int(r.bucket) * total // _NEG_BUCKETS
        b_hi = (int(r.bucket) + 1) * total // _NEG_BUCKETS
        assert r.lo < max(b_hi, b_lo + 1) and r.hi > b_lo
    # probe every interval boundary (first/last unit of each interval)
    # plus the bucket boundaries — the off-by-one hot spots
    probes = set()
    ivs = sorted((r.lo, r.hi, r.w) for r in bmap)
    for lo, hi, _ in ivs:
        probes.update((lo, hi - 1))
    for b in range(_NEG_BUCKETS):
        probes.add(b * total // _NEG_BUCKETS)
    for u in probes:
        if not (0 <= u < total):
            continue
        bucket = u * _NEG_BUCKETS // total
        hits = [
            r for r in by_bucket.get(bucket, []) if r.lo <= u < r.hi
        ]
        assert len(hits) == 1, (u, bucket, hits)


def test_negative_sampling_survives_64bit_interval_products(spark):
    """Overflow regression (r10): with corpus-scale frequencies the CDF
    total passes 2^57, so the alias-table's ``lo * B`` /``(hi-1) * B``
    products exceed int64 — the r10 widening routes them through
    DECIMAL(38,0) (HUGEINT in the oracle). Frequencies are exact powers
    of two so ``pow(freq, 0.75)`` is ulp-exact in both Python and the
    JVM and the brute-force replay stays bit-identical."""
    freq = 1 << 48  # wt = 2^36 * 1e6 per word; 3 words -> total > 2^57
    words = {"aa": freq, "ab": freq, "zz": freq}
    pairs = [("aa", "zz", 1)]
    wd = spark.createDataFrame(list(words.items()), "w string, freq long")
    pd_ = spark.createDataFrame(pairs, "w1 string, w2 string, rank long")
    rows = negative_samples_core(wd, pd_).collect()
    got = {
        (r.w1, r.w2, int(r.rank), int(r.k), r.neg_word, bool(r.is_collision))
        for r in rows
    }
    assert len(rows) == 5
    assert got == _brute_negatives(words, pairs)
