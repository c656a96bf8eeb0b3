"""Property tests for the r12 acceptance-gate math (bench.py): the
per-group median-of-per-query-ratios comparison must be immune to the
two failure modes that motivated it (ADVICE r11) — catalog drift and
single-query outliers — under ANY timing data, not just the unit
fixtures. Pure Python: no Spark session."""

from hypothesis import given, settings
from hypothesis import strategies as st

from bench import (
    HEADLINE,
    gate_deviations,
    group_of,
    group_ratio_medians,
    worst_ratio,
)

# positive, finite, sane-ranged query timings (seconds)
timing = st.floats(min_value=1e-3, max_value=1e4,
                   allow_nan=False, allow_infinity=False)


def _names(prefix: str, n: int) -> list[str]:
    return [f"{prefix}_{i}" for i in range(n)]


@st.composite
def query_maps(draw, prefix="ext_q", min_n=3, max_n=12):
    names = _names(prefix, draw(st.integers(min_n, max_n)))
    hist = {n: draw(timing) for n in names}
    cur = {n: draw(timing) for n in names}
    return hist, cur


@given(query_maps())
@settings(max_examples=200)
def test_unknown_queries_never_affect_ratios(maps):
    """Catalog drift: adding queries with NO history row must leave
    every group ratio unchanged (they drop out of the intersection)."""
    hist, cur = maps
    base = group_ratio_medians(cur, hist, HEADLINE)
    cur2 = dict(cur)
    cur2["ext_brand_new_a"] = 9999.0
    cur2["stream_brand_new_b"] = 9999.0
    assert group_ratio_medians(cur2, hist, HEADLINE) == base


@given(query_maps(min_n=5, max_n=15), timing)
@settings(max_examples=200)
def test_single_outlier_bounded_by_neighbor_ratios(maps, spike):
    """One arbitrarily slow query moves the group median at most to the
    next order statistic: the reported ratio stays within the range of
    the OTHER queries' ratios whenever at least 3 others exist."""
    hist, cur = maps
    victim = sorted(cur)[0]
    cur2 = dict(cur)
    cur2[victim] = cur[victim] * 1000.0  # the 15x-and-beyond exhibit
    others = [cur[n] / hist[n] for n in cur if n != victim]
    got = group_ratio_medians(cur2, hist, HEADLINE)["extensions_total"]
    # got is rounded to 3 decimals in the report — allow that quantum
    assert min(others) - 0.0005 <= got <= max(others) + 0.0005


@given(query_maps(), st.floats(min_value=0.1, max_value=10.0,
                               allow_nan=False))
@settings(max_examples=200)
def test_uniform_slowdown_scales_the_ratio(maps, k):
    """A whole-group-coherent slowdown by k (true contamination) scales
    the group ratio median by exactly k — the signature the gate fires
    on."""
    hist, cur = maps
    base = group_ratio_medians(cur, hist, HEADLINE)["extensions_total"]
    scaled = group_ratio_medians(
        {n: v * k for n, v in cur.items()}, hist, HEADLINE
    )["extensions_total"]
    assert abs(scaled - round(base / 1 * k, 10)) <= 0.002 * max(1.0, k)


@given(query_maps())
@settings(max_examples=100)
def test_deviations_subset_and_worst_ratio_consistency(maps):
    hist, cur = maps
    ratios = group_ratio_medians(cur, hist, HEADLINE)
    dev = gate_deviations(ratios)
    assert set(dev) <= set(ratios)
    for g, r in dev.items():
        assert r > 1.25 and ratios[g] == r
    if ratios:
        assert worst_ratio(ratios) == max(ratios.values())
    assert worst_ratio({}) == 0.0


def test_group_of_partition():
    """Every query name lands in exactly one of the three groups, and
    headline membership wins over the stream_ prefix (no headline query
    is stream_-prefixed today, but the precedence is pinned)."""
    assert group_of(HEADLINE[0], HEADLINE) == "value"
    assert group_of("stream_anything", HEADLINE) == "streaming_total"
    assert group_of("dedup_exact_summary", HEADLINE) == "extensions_total"
