"""Regenerate QUERIES.md: the auto-generated catalog of every
registered query — name, tags, one-line doc, oracle presence.

Run from the repo root:  python tools/dump_queries.py
"""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _official_rounds() -> dict[str, str]:
    """Rotation ledger (VERDICT r4 rec #3): per-query round of the
    LATEST official driver CORRECTNESS row — ``green-rN`` / ``red-rN``
    from the committed CORRECTNESS_r0N.json records — so each window
    rotation is mechanically enumerable from the catalog."""
    import glob
    import json
    import re

    def _round_of(path: str) -> int:
        m = re.search(r"r0*(\d+)", os.path.basename(path))
        return int(m.group(1)) if m else 0

    latest: dict[str, str] = {}
    # numeric round order so r10+ still overrides r0N lexically
    for path in sorted(glob.glob("CORRECTNESS_r*.json"), key=_round_of):
        rnd = _round_of(path)
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, v in rows.items():
            ok = (
                bool(v.get("rows_match"))
                and v.get("schema_match", True) in (True, None)
                and v.get("hash_match", True) in (True, None)
                and not v.get("err")
            )
            latest[name] = f"{'green' if ok else 'RED'}-r{rnd}"
    return latest


def main() -> None:
    from dc_moving_violations_cloud_etl_spark.queries import QUERIES, get_queries
    from dc_moving_violations_cloud_etl_spark.queries.registry import (
        DRIVER_WINDOW,
    )

    get_queries()
    official = _official_rounds()
    by_tag = Counter()
    for spec in QUERIES.values():
        for t in spec.tags:
            by_tag[t] += 1

    out = [
        "# QUERIES — auto-generated catalog",
        "",
        f"`python tools/dump_queries.py`. **{len(QUERIES)} queries**, every",
        "one a `queries()` entry with a DuckDB `oracle_sql()` twin unless",
        "marked otherwise. The first 50 in registration order form the",
        "driver's per-round CORRECTNESS window",
        "(`queries/registry.py::DRIVER_WINDOW`).",
        "",
        "Tag counts: "
        + ", ".join(
            f"{t}={n}" for t, n in sorted(by_tag.items(), key=lambda kv: -kv[1])
        ),
        "",
        "Rotation ledger — the `official` column is the round of each",
        "query's LATEST official driver CORRECTNESS row (green-rN /",
        "RED-rN), `in-window` marks queries the CURRENT `DRIVER_WINDOW`",
        "submits for their first official row this round, and `queued`",
        "queries await a future rotation (all queued queries are",
        "sim-green under tools/driver_sim.py).",
        "",
        "| # | query | tags | oracle | official | doc |",
        "|---|---|---|---|---|---|",
    ]
    n_green = n_red = n_window = n_queued = 0
    for i, (name, spec) in enumerate(QUERIES.items(), 1):
        doc = " ".join((spec.doc or "").split())
        tags = ",".join(spec.tags)
        oracle = "sql" if spec.oracle else "rows-only"
        if name in official:
            off = official[name]
            if off.startswith("green"):
                n_green += 1
            else:
                n_red += 1
        elif name in DRIVER_WINDOW:
            off, n_window = "in-window", n_window + 1
        else:
            off, n_queued = "queued", n_queued + 1
        out.append(f"| {i} | `{name}` | {tags} | {oracle} | {off} | {doc} |")
    summary = (
        f"Ledger summary: {n_green} official-green, {n_red} official-red, "
        f"{n_window} in the current window, {n_queued} queued for a "
        "future rotation."
    )
    idx = out.index("| # | query | tags | oracle | official | doc |")
    out[idx:idx] = [summary, ""]
    with open("QUERIES.md", "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"QUERIES.md written ({len(QUERIES)} queries)")


if __name__ == "__main__":
    main()
