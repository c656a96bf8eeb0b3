"""Fixture catalog: base tables + reference-shaped views.

The driver's synthetic star schema (TESTDATA.md) stands in for the
reference's two MySQL tables via the FIXTURES.md §2 mapping:

- ``violations``    ← lineitem ⋈ orders  (event-grained fact, 13 columns,
  authoritative DDL reference etl/full_load/violation_etl_history.py:46-60)
- ``weather_daily`` ← per-day-of-month aggregates of ``events`` replicated
  over the fact table's date spine (daily dimension, PK weather_date,
  reference sql/create_tables.sql:10-20)

The mapping is *defined once, twice*: here as DataFrame builders (the
engine) and in ``oracle.py`` as DuckDB CTE SQL (the differential oracle).
``tests/test_oracle_parity.py`` holds the two in exact (hash-level)
agreement. Every derived column below is deterministic in both engines:
integer arithmetic, single-flop double ops, or decimal-exact aggregation
(see ``expressions.exact_decimal_sum``).

Scale notes (100 TB posture):
- ``violations`` is fact-sized: derived with a key equi-join
  lineitem⋈orders that Spark plans as broadcast (orders small here) or
  sort-merge on the cluster; all other columns are narrow projections that
  stay in whole-stage codegen.
- ``weather_daily`` is dimension-sized (1 row/day): ~30 aggregated rows
  replicated over the date spine → always broadcast-joined to the fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .etl.violations import build_violations
from .etl.weather import build_weather_daily

BASE_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read that works in ANY caller-supplied SparkSession.

    The ``events`` fixture stores ``ts`` as parquet TIMESTAMP(NANOS),
    which Spark's reader rejects (PARQUET_TYPE_ILLEGAL) unless
    ``spark.sql.legacy.parquet.nanosAsLong`` is set. Our own factory
    (session.py) sets it at build time, but the engine must not depend on
    being handed its own session — the conf is runtime-settable, so set
    it defensively before every fixture read. Downstream normalization of
    the resulting ``bigint`` ts lives in ``base()`` and the streaming
    readers.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        # Spark builds lacking the legacy conf read nanos natively
        pass
    return spark.read.parquet(path)


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize the fixture's ``ts`` column to a plain ``timestamp``.

    The fixture's physical type has varied across driver regenerations:

    - parquet TIMESTAMP(NANOS) → Spark reads ``bigint`` under the
      nanosAsLong legacy conf → convert with integer ``div`` (double
      division would lose precision at 1e18-scale nanos);
    - parquet timestamp[us] with isAdjustedToUTC=false → Spark 4 reads
      ``timestamp_ntz`` → cast to ``timestamp``. The session TZ is UTC
      (session.py) so wall-clock values are unchanged; the cast matters
      because event-time operators (``withWatermark``) REQUIRE
      TimestampType and raise EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on NTZ.

    Single choke point: both the batch catalog (``base``) and every
    streaming reader that CONSUMES ``ts`` normalize through here. One
    intentional exception (ADVICE r12): streaming/backfill.py reads the
    raw fixture schema and prunes to a constant column — its plan never
    touches ts, and the raw schema is what lets the vectorized reader
    serve row counts from parquet footer metadata.
    """
    t = dict(df.dtypes).get("ts")
    if t == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif t == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def base(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one base fixture table (columnar parquet scan; Catalyst prunes
    columns and pushes predicates down to the reader)."""
    if name not in BASE_TABLES:
        raise KeyError(f"unknown base table {name!r}")
    df = read_parquet(spark, f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_event_ts(df)
    return df


# Per-session temp-view registration memo. The VALUE holds the session
# object itself so the identity check below is immune to CPython id()
# reuse after a session is garbage-collected.
_VIEWS: dict[tuple[int, str], tuple[SparkSession, str]] = {}


def _session_alive(spark: SparkSession) -> bool:
    try:
        return not spark.sparkContext._jsc.sc().isStopped()
    except Exception:
        return False


def register_views(
    spark: SparkSession, sf_dir: str, names: "set[str] | list[str]"
) -> None:
    """Register ONLY the named tables/views, memoized per (session,
    sf_dir). The SQL-text path calls this with the tables a query
    actually references — registering all 10 base tables eagerly per
    query both widened the nanos-bug blast radius and re-paid parquet
    footer reads on every ``run_sql`` call (VERDICT r1 'what's wrong' #2).
    """
    for name in names:
        key = (id(spark), name)
        entry = _VIEWS.get(key)
        if entry is not None:
            sess, sf = entry
            if sess is spark and sf == sf_dir and _session_alive(sess):
                continue
            _VIEWS.pop(key, None)
        if name in BASE_TABLES:
            df = base(spark, sf_dir, name)
        elif name == "violations":
            df = violations(spark, sf_dir)
        elif name == "weather_daily":
            df = weather_daily(spark, sf_dir)
        else:
            raise KeyError(f"unknown table/view {name!r}")
        df.createOrReplaceTempView(name)
        _VIEWS[key] = (spark, sf_dir)


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register base tables and the reference-shaped views as temp views
    (``violations`` / ``weather_daily``), mirroring the driver's DuckDB
    view registration so ``spark.sql`` text can target the same names."""
    register_views(
        spark, sf_dir, [*BASE_TABLES, "violations", "weather_daily"]
    )


# Session-local materialization of the derived tables, mirroring the
# reference architecture (ETL writes MySQL tables once; the 8 analysis
# queries hit the materialized tables, not the raw feeds —
# reference README.md:12, sql/analysis_queries.sql). At 100 TB the same
# role is played by the partitioned parquet layout written by
# operators/sinks.py; in-session we persist() so repeated queries don't
# re-derive the fact/dimension per query.
_MATERIALIZED: dict[tuple[int, str, str], DataFrame] = {}


def _materialized(
    spark: SparkSession, sf_dir: str, name: str, build
) -> DataFrame:
    key = (id(spark), sf_dir, name)
    df = _MATERIALIZED.get(key)
    if df is not None and not _session_alive(df.sparkSession):
        # the cached DataFrame pins its (stopped) session alive, so the
        # id() key would otherwise keep matching forever — evict
        _MATERIALIZED.pop(key, None)
        df = None
    if df is None:
        df = build().persist()
        _MATERIALIZED[key] = df
    return df


def release(spark: SparkSession | None = None) -> None:
    """Cache-release hook: unpersist every session-local materialization,
    drop the view-registration memo, and (when a session is given) clear
    its SQL cache. Long-running processes (the bench loop, a notebook)
    call this so persisted fact/dimension/sketch tables don't accumulate
    executor memory across runs (VERDICT r1 'what's wrong' #3)."""
    from .caching import release_tracked

    for key, df in list(_MATERIALIZED.items()):
        try:
            df.unpersist()
        except Exception:
            pass
        _MATERIALIZED.pop(key, None)
    _VIEWS.clear()
    release_tracked()
    if spark is not None and _session_alive(spark):
        try:
            spark.catalog.clearCache()
        except Exception:
            pass


def violations(
    spark: SparkSession, sf_dir: str, materialized: bool = True
) -> DataFrame:
    """The 13-column ``violations`` fact view (FIXTURES.md §1.1 schema)."""

    def build() -> DataFrame:
        return build_violations(
            base(spark, sf_dir, "lineitem"), base(spark, sf_dir, "orders")
        )

    if not materialized:
        return build()
    return _materialized(spark, sf_dir, "violations", build)


def weather_daily(
    spark: SparkSession, sf_dir: str, materialized: bool = True
) -> DataFrame:
    """The 9-column ``weather_daily`` daily dimension (FIXTURES.md §1.2)."""

    def build() -> DataFrame:
        # dimension-sized (1 row/day): coalesce to one partition before
        # the persist — the build's groupBy shuffle otherwise pins the
        # cache at shuffle.partitions tiny blocks and every downstream
        # query pays a 32-task stage to scan ~2.5k rows. One partition is
        # also exactly the broadcast-side layout the joins want.
        return build_weather_daily(
            base(spark, sf_dir, "events"), base(spark, sf_dir, "lineitem")
        ).coalesce(1)

    if not materialized:
        return build()
    return _materialized(spark, sf_dir, "weather_daily", build)
