"""Regenerate QUERIES.md: the auto-generated catalog of every
registered query — name, tags, one-line doc, oracle presence.

Run from the repo root:  python tools/dump_queries.py
"""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from dc_moving_violations_cloud_etl_spark.queries import QUERIES, get_queries

    get_queries()
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
        "| # | query | tags | oracle | doc |",
        "|---|---|---|---|---|",
    ]
    for i, (name, spec) in enumerate(QUERIES.items(), 1):
        doc = " ".join((spec.doc or "").split())
        tags = ",".join(spec.tags)
        oracle = "sql" if spec.oracle else "rows-only"
        out.append(f"| {i} | `{name}` | {tags} | {oracle} | {doc} |")
    with open("QUERIES.md", "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"QUERIES.md written ({len(QUERIES)} queries)")


if __name__ == "__main__":
    main()
