"""The driver records only the LAST ~2000 bytes of bench.py stdout —
round 3's headline was lost because one big JSON line put "value" at
the head. These tests pin the fix: stdout must END with a short
headline-only JSON line that always survives the tail cut (VERDICT r3
rec #3). Pure-Python: no Spark session involved.
"""

import json

from bench import HEADLINE, build_summary

DRIVER_TAIL_BYTES = 2000


def _fake_out(n_extras: int = 200) -> tuple[dict, list[str]]:
    """A worst-case full record: every headline query timed plus a large
    extension surface with long names (the size the summary must stay
    immune to)."""
    extras = [f"extension_query_with_a_long_name_{i:04d}" for i in range(n_extras)]
    per_query = {n: round(0.1 + i * 0.001, 4) for i, n in enumerate(HEADLINE)}
    per_query.update({n: 1.2345 for n in extras})
    out = {
        "metric": "reference_surface_total_wallclock",
        "value": 4.8123,
        "unit": "sec",
        "queries": per_query,
        "streaming_total": 22.4413,
        "calib_start_sec": 0.61,
        "calib_end_sec": 0.64,
        "sf": 0.1,
        "errors": {"some_query": "RuntimeError: boom"},
    }
    return out, extras


def test_summary_fits_driver_stdout_tail():
    out, extras = _fake_out()
    line = json.dumps(build_summary(out, HEADLINE, extras, "/tmp/d.json"))
    assert len(line.encode()) < DRIVER_TAIL_BYTES // 2, (
        f"summary line is {len(line)} bytes; it must fit the driver's "
        f"{DRIVER_TAIL_BYTES}-byte tail with headroom"
    )


def test_summary_carries_the_official_record():
    out, extras = _fake_out()
    s = build_summary(out, HEADLINE, extras, "/tmp/d.json")
    # the driver-spec headline shape
    assert s["metric"] == "reference_surface_total_wallclock"
    assert s["value"] == 4.8123 and s["unit"] == "sec" and s["sf"] == 0.1
    # every reference query's individual time is retained
    assert set(s["queries"]) == set(HEADLINE)
    # streaming segregated from the headline; extensions summed
    assert s["streaming_total"] == 22.4413
    assert s["extensions_total"] == round(1.2345 * len(extras), 4)
    assert s["n_errors"] == 1
    assert s["n_queries_timed"] == len(out["queries"])
    # the load-calibration probes ride along so round-over-round deltas
    # are interpretable against host load (VERDICT r8 rec #4)
    assert s["calib_start_sec"] == 0.61 and s["calib_end_sec"] == 0.64


def test_load_calibration_is_fast_and_positive():
    from bench import load_calibration

    dt = load_calibration(iters=10_000)
    assert 0 < dt < 5.0


def test_summary_tolerates_missing_headline_times():
    """A headline query that errored has no per-query time — the
    summary must simply omit it, never raise (the record of a partially
    failed run is more valuable than a crash)."""
    out, extras = _fake_out()
    del out["queries"][HEADLINE[0]]
    s = build_summary(out, HEADLINE, extras, "/tmp/d.json")
    assert HEADLINE[0] not in s["queries"]
    assert len(s["queries"]) == len(HEADLINE) - 1


def test_median_of_completed_fault_isolation():
    """ADVICE r9: a raising re-pass must never discard the already
    successful first pass — fall back to the median/min of completed
    passes."""
    from bench import median_of_completed

    # all passes complete -> true median of three
    times = iter([0.0, 5.0, 0.0, 1.0])
    import time as _t

    real = _t.perf_counter
    try:
        _t.perf_counter = lambda: next(times)
        got = median_of_completed(3.0, lambda: None)
    finally:
        _t.perf_counter = real
    assert got == 3.0  # passes [3.0, 5.0, 1.0] -> median 3.0

    # first re-pass raises -> keep the single completed pass
    def boom():
        raise RuntimeError("re-pass died")

    assert median_of_completed(2.5, boom) == 2.5

    # one re-pass completes, second raises -> min of the two completed
    calls = {"n": 0}

    def second_boom():
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("pass 3 died")

    times2 = iter([0.0, 9.0, 0.0])  # 3rd value: t1 read before pass 3 raises
    try:
        _t.perf_counter = lambda: next(times2)
        got2 = median_of_completed(4.0, second_boom)
    finally:
        _t.perf_counter = real
    assert got2 == 4.0  # completed [4.0, 9.0] -> lower middle


# ── acceptance gate (r11, VERDICT r10 rec #1) ──────────────────────────


def _hist_entry(value, ext_each, stream, sf=0.1, **kw):
    q = {n: 0.1 for n in HEADLINE}
    q.update({f"ext_{i}": ext_each for i in range(10)})
    q.update({"stream_a": stream / 2, "stream_b": stream / 2})
    e = {"value": value, "queries": q, "streaming_total": stream, "sf": sf}
    e.update(kw)
    return e


def test_extensions_total_recomputed_from_queries():
    from bench import extensions_total_of

    e = _hist_entry(3.0, 2.0, 10.0)
    # 10 extension queries at 2.0 each; headline + stream_ excluded
    assert extensions_total_of(e, HEADLINE) == 20.0


def test_comparable_history_filters(tmp_path):
    from bench import comparable_history_entries, per_query_history_medians

    p = tmp_path / "hist.jsonl"
    lines = [
        _hist_entry(3.0, 2.0, 40.0),
        _hist_entry(2.8, 2.1, 44.0),
        _hist_entry(2.9, 1.9, 42.0),
        # non-comparable rows the gate must skip:
        _hist_entry(9.9, 9.9, 99.0, sf=0.01),  # other sf
        _hist_entry(9.9, 9.9, 99.0, contaminated=True),  # gate loser
        # accepted under sustained load: stays out of future medians
        # (ADVICE r11)
        _hist_entry(9.9, 9.9, 99.0, gate_deviant=True),
    ]
    p.write_text("\n".join(json.dumps(e) for e in lines) + "\nnot json\n")
    entries = comparable_history_entries(str(p), 0.1)
    assert len(entries) == 3
    pq = per_query_history_medians(entries)
    assert pq["ext_0"] == 2.0  # median of 2.0 / 2.1 / 1.9
    assert pq["stream_a"] == 21.0  # median of 20 / 22 / 21


def test_comparable_history_insufficient_passes(tmp_path):
    from bench import comparable_history_entries

    p = tmp_path / "hist.jsonl"
    p.write_text(json.dumps(_hist_entry(3.0, 2.0, 40.0)) + "\n")
    assert comparable_history_entries(str(p), 0.1) is None
    assert comparable_history_entries(str(tmp_path / "absent"), 0.1) is None


def test_group_ratio_medians_intersection_and_outliers():
    """ADVICE r11: the gate compares per-query ratio MEDIANS over the
    name intersection — catalog drift (added/removed queries) and one
    contention-hypersensitive outlier must both be unable to trip a
    group."""
    from bench import group_ratio_medians, per_query_history_medians

    base = _hist_entry(3.0, 2.0, 40.0)
    base["queries"]["stream_c"] = 20.0
    hist = per_query_history_medians([base, base, base])
    cur = {n: 0.1 for n in HEADLINE}
    cur.update({f"ext_{i}": 2.0 for i in range(9)})
    cur["ext_brand_new_query"] = 500.0  # not in history: must drop out
    # the r11 exhibit: one stream query 15x slow, its siblings in-band
    cur.update({"stream_a": 20.0 * 15, "stream_b": 20.0, "stream_c": 20.0})
    ratios = group_ratio_medians(cur, hist, HEADLINE)
    assert ratios["value"] == 1.0
    assert ratios["extensions_total"] == 1.0  # outlier name intersected away
    # one 15x outlier among three stream queries: median 1.0 — the
    # group no longer trips on a single hypersensitive query
    assert ratios["streaming_total"] == 1.0
    # a group with fewer than min_common shared names is skipped
    assert "streaming_total" not in group_ratio_medians(
        {"stream_a": 300.0, "stream_b": 20.0}, hist, HEADLINE
    )
    # no history -> no ratios -> unconditional accept
    assert group_ratio_medians(cur, None, HEADLINE) == {}


def test_mark_untrusted_stamps_kept_still_deviant():
    """VERDICT r11 rec #2: when BOTH gate passes deviate, the kept
    record must carry the deviant groups and their queries as
    untrusted — a 23.7 s similarity_ivfpq_recall must never land in
    BENCH_DETAIL_latest.json as an unqualified latest reading — and
    the history line must be excluded from future acceptance medians."""
    from bench import mark_untrusted

    out, _ = _fake_out(n_extras=2)
    out["queries"]["stream_a"] = 19.91
    out["accept"] = {"status": "retried", "kept_still_deviant": True}
    mark_untrusted(out, {"streaming_total": 1.602}, HEADLINE)
    assert out["accept"]["kept_deviations"] == {"streaming_total": 1.602}
    assert out["gate_deviant"] is True
    assert out["untrusted_groups"] == ["streaming_total"]
    assert out["untrusted_queries"] == ["stream_a"]
    # headline/extension queries stay trusted
    assert HEADLINE[0] not in out["untrusted_queries"]


def test_gate_deviations_slow_direction_only():
    from bench import gate_deviations, worst_ratio

    dev = gate_deviations(
        {"value": 1.543, "extensions_total": 1.12, "streaming_total": 1.917}
    )
    assert set(dev) == {"value", "streaming_total"}
    # a faster-than-history pass is a better record, not contamination
    assert gate_deviations(
        {"value": 0.69, "extensions_total": 0.86, "streaming_total": 0.71}
    ) == {}
    assert worst_ratio({"value": 1.1, "streaming_total": 1.917}) == 1.917
    assert worst_ratio({}) == 0.0


def test_summary_carries_gate_and_mid_probes():
    out, extras = _fake_out()
    out["calib_mid_sec"] = [0.62, 0.66]
    out["accept"] = {
        "status": "ok",
        "worst_ratio": 1.02,
        "groups_compared": ["extensions_total", "streaming_total", "value"],
    }
    s = build_summary(out, HEADLINE, extras, "/tmp/d.json")
    assert s["calib_mid_sec"] == [0.62, 0.66]
    assert s["accept"]["worst_ratio"] == 1.02
    assert s["accept"]["groups_compared"] == [
        "extensions_total", "streaming_total", "value",
    ]
    # and the summary still fits the driver tail with the new fields
    assert len(json.dumps(s).encode()) < DRIVER_TAIL_BYTES // 2
