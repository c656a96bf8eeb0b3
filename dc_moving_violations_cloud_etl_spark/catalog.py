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


def base(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one base fixture table (columnar parquet scan; Catalyst prunes
    columns and pushes predicates down to the reader)."""
    if name not in BASE_TABLES:
        raise KeyError(f"unknown base table {name!r}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos-as-long (see session.py): convert to microsecond timestamp
        # with integer `div` — double division would lose precision at
        # 1e18-scale nanos
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register base tables and the reference-shaped views as temp views
    (``violations`` / ``weather_daily``), mirroring the driver's DuckDB
    view registration so ``spark.sql`` text can target the same names."""
    for name in BASE_TABLES:
        base(spark, sf_dir, name).createOrReplaceTempView(name)
    violations(spark, sf_dir).createOrReplaceTempView("violations")
    weather_daily(spark, sf_dir).createOrReplaceTempView("weather_daily")


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
    if df is None:
        df = build().persist()
        _MATERIALIZED[key] = df
    return df


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
