"""Executable entry points — the engine as an APPLICATION, mirroring how
the reference is actually run (SURVEY.md §3):

| reference invocation                         | engine command        |
|----------------------------------------------|-----------------------|
| ``python violation_etl_history.py`` (+weather)| ``history-load``      |
| ``violation_etl_daily.lambda_handler``        | ``daily-load``        |
| ``mysql < sql/analysis_queries.sql``          | ``analyze``           |
| DEPLOYMENT.md:229-242 verification queries    | ``verify``            |
| —                                            | ``query`` / ``list``  |

Usage::

    python -m dc_moving_violations_cloud_etl_spark history-load \
        --sf-dir /root/testdata/sf0.01 --warehouse /tmp/dcmv_warehouse
    python -m dc_moving_violations_cloud_etl_spark daily-load \
        --sf-dir /root/testdata/sf0.01 --warehouse /tmp/dcmv_warehouse
    python -m dc_moving_violations_cloud_etl_spark analyze \
        --sf-dir /root/testdata/sf0.01
    python -m dc_moving_violations_cloud_etl_spark query qa_monthly_agency_tickets

The warehouse is partitioned parquet (``violations/`` by month — the
engine analog of the reference's month→layer routing — plus
``weather_daily/``); ``daily-load`` is replay-safe (insert-if-absent on
the PK) exactly like the reference's idempotency contract
(DEPLOYMENT.md:244-250).
"""

from __future__ import annotations

import argparse
import datetime as dt
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _spark() -> SparkSession:
    from .session import get_spark

    return get_spark(app_name="dc-moving-violations-spark-cli")


def _show(df: DataFrame, n: int = 25) -> None:
    df.show(n, truncate=False)


def cmd_history_load(args) -> int:
    """Full historical load: build both tables from the source fixtures,
    PK-dedupe, write the partitioned warehouse (reference
    etl/full_load/*, one-time)."""
    from . import catalog
    from .operators.sinks import dedupe_by_key, write_partitioned

    spark = _spark()
    v = dedupe_by_key(
        catalog.violations(spark, args.sf_dir), ["violation_id"]
    )
    write_partitioned(v, f"{args.warehouse}/violations", "month")
    w = dedupe_by_key(
        catalog.weather_daily(spark, args.sf_dir), ["weather_date"]
    )
    w.coalesce(1).write.mode("overwrite").parquet(
        f"{args.warehouse}/weather_daily"
    )
    nv = spark.read.parquet(f"{args.warehouse}/violations").count()
    nw = spark.read.parquet(f"{args.warehouse}/weather_daily").count()
    print(f"history-load complete: violations={nv} weather_daily={nw}")
    print(f"warehouse: {args.warehouse}")
    return 0


def cmd_daily_load(args) -> int:
    """Incremental load: watermark resume → bounded source scan →
    insert-if-absent merge → rewrite touched partitions (reference
    etl/daily_load/violation_etl_daily.py lambda_handler). Replay-safe:
    re-running inserts nothing."""
    from . import catalog
    from .operators.incremental import get_watermark, incremental_merge
    from .operators.sinks import write_partitioned

    spark = _spark()
    source = catalog.violations(spark, args.sf_dir)
    try:
        existing = spark.read.parquet(f"{args.warehouse}/violations")
        cold = False
    except Exception:
        existing = source.limit(0)
        cold = True
    today = (
        dt.date.fromisoformat(args.as_of)
        if args.as_of
        else (source.agg(F.max("violation_date")).collect()[0][0]
              + dt.timedelta(days=1))
    )
    wm_before = None if cold else get_watermark(existing, "violation_date")
    merged = incremental_merge(
        existing,
        source,
        date_col="violation_date",
        key_cols=["violation_id"],
        cold_start_default=dt.date(1900, 1, 1),
        today=today,
    )
    n_before = existing.count()
    n_after = merged.count()
    if n_after != n_before:
        write_partitioned(merged, f"{args.warehouse}/violations", "month")

    # weather twin (reference weather_etl_daily.lambda_handler):
    # last-writer-wins upsert keyed on weather_date
    from .operators.sinks import upsert_last_writer_wins

    w_src = catalog.weather_daily(spark, args.sf_dir)
    try:
        w_existing = spark.read.parquet(f"{args.warehouse}/weather_daily")
    except Exception:
        w_existing = w_src.limit(0)
    w_before = w_existing.count()
    w_merged = upsert_last_writer_wins(w_existing, w_src, ["weather_date"])
    w_after = w_merged.count()
    if w_after != w_before:
        # two-phase rewrite: the merge reads the current table, so the
        # new version lands in a scratch dir first (overwriting a path
        # that is also an input is rejected by Spark)
        import shutil

        w_merged.coalesce(1).write.mode("overwrite").parquet(
            f"{args.warehouse}/weather_daily_next"
        )
        next_df = spark.read.parquet(f"{args.warehouse}/weather_daily_next")
        next_df.coalesce(1).write.mode("overwrite").parquet(
            f"{args.warehouse}/weather_daily"
        )
        shutil.rmtree(
            f"{args.warehouse}/weather_daily_next", ignore_errors=True
        )

    print(
        f"daily-load complete: watermark_before={wm_before} "
        f"as_of={today} inserted={n_after - n_before} total={n_after} "
        f"weather_upserted={w_after - w_before}"
    )
    return 0


def cmd_stream_ingest(args) -> int:
    """The daily ingest as Structured Streaming over the custom Python
    streaming source (engine-managed offsets; streaming/source.py) —
    the streaming form of ``daily-load``."""
    from .streaming.source import custom_source_ingest_streaming

    spark = _spark()
    _show(custom_source_ingest_streaming(spark, args.sf_dir), args.rows)
    return 0


def cmd_analyze(args) -> int:
    """Run the reference's full analytical surface (Qa–Qh + Q0,
    sql/analysis_queries.sql:5-91 + README.md:45-51)."""
    from .queries import QUERIES, get_queries

    get_queries()
    spark = _spark()
    names = [
        "qa_monthly_agency_tickets", "qb_total_tickets_since",
        "qc_avg_tickets_per_weekday", "qd_rainy_day_tickets",
        "qe_monthly_precipitation", "qf_monthly_speeding_fines",
        "qg_avg_tickets_per_hour", "qh_accidents_rain_vs_dry",
        "q0_flagship_rainy_count",
    ]
    for name in names:
        print(f"\n=== {name}: {QUERIES[name].doc}")
        _show(QUERIES[name].build(spark, args.sf_dir), args.rows)
    return 0


def cmd_verify(args) -> int:
    """Post-load verification (reference DEPLOYMENT.md:229-242)."""
    from .queries import get_queries

    qs = get_queries()
    spark = _spark()
    for name in ("v1_violations_verification", "v2_weather_verification"):
        print(f"=== {name}")
        _show(qs[name](spark, args.sf_dir))
    return 0


def cmd_query(args) -> int:
    """Run any registered query by name."""
    from .queries import get_queries

    qs = get_queries()
    if args.name not in qs:
        print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
        return 2
    _show(qs[args.name](_spark(), args.sf_dir), args.rows)
    return 0


def cmd_list(args) -> int:
    """List every registered query with its one-line description."""
    from .queries import QUERIES, get_queries

    get_queries()
    for name, spec in QUERIES.items():
        print(f"{name:40s} {spec.doc.splitlines()[0] if spec.doc else ''}")
    print(f"\n{len(QUERIES)} queries registered")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="dc_moving_violations_cloud_etl_spark",
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, warehouse=False):
        sp.add_argument(
            "--sf-dir", default="/root/testdata/sf0.01",
            help="fixture directory (default sf0.01)",
        )
        sp.add_argument("--rows", type=int, default=25)
        if warehouse:
            sp.add_argument(
                "--warehouse", default="/tmp/dcmv_warehouse",
                help="partitioned-parquet warehouse root",
            )

    sp = sub.add_parser("history-load", help=cmd_history_load.__doc__)
    common(sp, warehouse=True)
    sp.set_defaults(fn=cmd_history_load)

    sp = sub.add_parser("daily-load", help=cmd_daily_load.__doc__)
    common(sp, warehouse=True)
    sp.add_argument(
        "--as-of", default=None,
        help="treat this ISO date as 'today' (default: source max + 1)",
    )
    sp.set_defaults(fn=cmd_daily_load)

    sp = sub.add_parser("stream-ingest", help=cmd_stream_ingest.__doc__)
    common(sp)
    sp.set_defaults(fn=cmd_stream_ingest)

    sp = sub.add_parser("analyze", help=cmd_analyze.__doc__)
    common(sp)
    sp.set_defaults(fn=cmd_analyze)

    sp = sub.add_parser("verify", help=cmd_verify.__doc__)
    common(sp)
    sp.set_defaults(fn=cmd_verify)

    sp = sub.add_parser("query", help=cmd_query.__doc__)
    sp.add_argument("name")
    common(sp)
    sp.set_defaults(fn=cmd_query)

    sp = sub.add_parser("list", help=cmd_list.__doc__)
    sp.set_defaults(fn=cmd_list)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
