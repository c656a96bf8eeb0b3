"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall-clock of one timed pass over all headline
queries (after a warm-up of the flagship query to exclude JVM/session
startup, which a long-running cluster amortizes away).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from dc_moving_violations_cloud_etl_spark import caching, catalog
from dc_moving_violations_cloud_etl_spark.queries import get_queries
from dc_moving_violations_cloud_etl_spark.session import get_spark

# reference-surface queries are the headline; extension operators are
# benchmarked too but tagged separately in the queries map
HEADLINE = [
    "q0_flagship_rainy_count",
    "qa_monthly_agency_tickets",
    "qb_total_tickets_since",
    "qc_avg_tickets_per_weekday",
    "qd_rainy_day_tickets",
    "qe_monthly_precipitation",
    "qf_monthly_speeding_fines",
    "qg_avg_tickets_per_hour",
    "qh_accidents_rain_vs_dry",
    "v1_violations_verification",
    "v2_weather_verification",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="bench")
    queries = get_queries()
    names = [n for n in HEADLINE if n in queries]
    # extension operators registered beyond the reference surface.
    # Excluded from the timed pass:
    # - stream_daily_rollup: drives a real Structured Streaming query
    #   (checkpoint + memory-sink lifecycle, not a scan benchmark);
    # - the two all-PAIRS near-dup reports: their OUTPUT is quadratic in
    #   dup-cluster size (a 1.5k-doc identical cluster alone emits ~1.1M
    #   pairs at sf0.1), so wall-clock measures result materialization,
    #   not the operator. dedup_minhash_assign benchmarks the same
    #   MinHash+LSH pipeline with the linear keeper-assignment output.
    # - etl_violations_transform: the row-for-row echo collects the full
    #   fact table to the driver (600k rows × 13 cols at sf0.1) — it
    #   measures py4j result materialization, not the transform.
    #   etl_violations_checksum times the same transform with in-engine
    #   aggregate verification (constant-size output, the 100 TB shape).
    extras = sorted(
        set(queries)
        - set(HEADLINE)
        - {
            "stream_daily_rollup",
            "dedup_minhash_lsh_pairs",
            "dedup_ngram_jaccard_pairs",
            "etl_violations_transform",
        }
    )

    # warm-up: session/code paths, parquet footer caches
    queries[names[0]](spark, sf_dir).collect()
    # warm the Python worker pool too (spark.python.worker.reuse keeps it
    # alive session-long, as on a long-running cluster): without this the
    # first Arrow-batched query pays ~5-30s of daemon/fork/import cost
    # that is startup, not operator time
    spark.createDataFrame([(1,)], "x int").mapInPandas(
        lambda it: (b[["x"]] for b in it), "x int"
    ).collect()

    per_query: dict[str, float] = {}
    total = 0.0
    for name in names + extras:
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        df.collect()
        dt = time.perf_counter() - t0
        per_query[name] = round(dt, 4)
        if name in names:
            total += dt

    # cache-release hook: a bench run must end with no cached relations
    # (persisted fact/dim/sketch tables are session-local working set,
    # not process-lifetime state)
    catalog.release(spark)
    assert caching.tracked_count() == 0, "tracked persists survived release"

    print(
        json.dumps(
            {
                "metric": "reference_surface_total_wallclock",
                "value": round(total, 4),
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
