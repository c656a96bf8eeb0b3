"""Per-query isolation profiler for optimization work (round 14).

Times the named queries exactly the way bench.py does —
``queries[name](spark, sf_dir).collect()`` with ``release_tracked()``
after every pass — but in ISOLATION, as the median of N passes, so a
one-off host-load spike cannot masquerade as a regression/win.
Optionally dumps ``explain("formatted")`` to a file per query.

Usage:
  python tools/profile_queries.py [--reps N] [--plans DIR --suffix before]
         name [name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dc_moving_violations_cloud_etl_spark import caching, catalog  # noqa: E402
from dc_moving_violations_cloud_etl_spark.queries import get_queries  # noqa: E402
from dc_moving_violations_cloud_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plans", default=None,
                    help="directory to write explain('formatted') files")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    import hashlib

    def calib() -> float:
        t0 = time.perf_counter()
        h = b"spark-graft-load-calibration"
        for _ in range(1_500_000):
            h = hashlib.sha256(h).digest()
        return round(time.perf_counter() - t0, 4)

    c0 = calib()
    print(f"calib_start {c0}  (idle band ~0.5-0.7s)", flush=True)

    spark = get_spark(app_name="profile")
    queries = get_queries()
    # warm the Python worker pool (same as bench.py warmup)
    spark.createDataFrame([(1,)], "x int").mapInPandas(
        lambda it: (b[["x"]] for b in it), "x int"
    ).collect()
    from dc_moving_violations_cloud_etl_spark.sources.paged_api import (
        paged_fixture_path,
    )
    paged_fixture_path(args.sf_dir)

    out = {}
    for name in args.names:
        if name not in queries:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = queries[name](spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w"
            ) as f:
                f.write(plan)
            caching.release_tracked()
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            queries[name](spark, args.sf_dir).collect()
            dt = time.perf_counter() - t0
            caching.release_tracked()
            times.append(round(dt, 4))
        med = statistics.median(times)
        out[name] = {"median": round(med, 4), "passes": times}
        print(f"{med:8.3f}s  {name}  {times}", flush=True)

    catalog.release(spark)
    out["_calib"] = {"start": c0, "end": calib()}
    print(f"calib_end {out['_calib']['end']}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
