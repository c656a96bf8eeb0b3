"""Weather transform pipeline: the reference's VisualCrossing day-record
shredding (reference etl/daily_load/weather_etl_daily.py:118-172
``transform_weather_row``; etl/full_load/weather_etl_history.py:75-86)
re-expressed as a declarative aggregation over the ``events`` fixture.

The events table covers one calendar month; its per-day-of-month
aggregates become 30 deterministic "weather profiles" replicated over the
fact table's date spine — preserving the reference's core shape: a 1-row-
per-day dimension joined to the fact on a DATE key
(reference README.md:39-41, sql/analysis_queries.sql:40-42).

``is_rain`` uses the daily-load (canonical, richer) rule v2
(reference weather_etl_daily.py:158-160); v1 stays available in
``expressions.is_rain_v1`` (SURVEY.md §1.4.2 divergence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..expressions import is_rain_v2


def build_weather_daily(events: DataFrame, lineitem: DataFrame) -> DataFrame:
    """events → per-day-of-month profile → replicated over the fact date
    spine. All aggregates are deterministic: max/min/count are exact;
    sums go through decimal (see expressions.exact_decimal_sum rationale).

    Scale: the profile is ~30 rows and the spine 1 row/day — both tiny;
    Spark broadcasts them. The only fact-sized scan is the DISTINCT date
    spine, a cheap partial-agg over one column pruned at the parquet scan.
    """
    dec = "decimal(18,2)"
    profile = events.groupBy(F.dayofmonth("ts").alias("dom")).agg(
        F.max("value").alias("tempmax"),
        F.min("value").alias("tempmin"),
        (F.sum(F.col("value").cast(dec)).cast("double") / F.count(F.lit(1))).alias(
            "temp"
        ),
        F.sum(F.when(F.col("event_type") == "click", F.col("value").cast(dec)))
        .cast("double")
        .alias("rain_total"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("err_cnt"),
        F.max(F.when(F.col("event_type") == "view", F.col("value"))).alias("windspeed"),
    )

    precip = F.when(F.col("dom") % 3 == 0, F.lit(0.0)).otherwise(
        F.coalesce(F.col("rain_total"), F.lit(0.0))
    )
    conditions = (
        F.when(F.col("dom") % 15 == 0, F.lit("Light rain, overcast"))
        .when(F.col("dom") % 3 == 0, F.lit("Clear"))
        .otherwise(F.lit("Rain, Partially cloudy"))
    )

    # date spine = distinct fact dates (the dimension covers the fact's
    # range, reference weather_etl_history.py:125-126); days-of-month with
    # no profile row (day 31 — events span days 1..30) drop out, modelling
    # the reference's missing-API-day case (weather_etl_daily.py:133-146).
    spine = lineitem.select(F.to_date("l_shipdate").alias("weather_date")).distinct()

    w = (
        spine.join(
            F.broadcast(profile),
            F.dayofmonth(F.col("weather_date")) == F.col("dom"),
            "inner",
        )
        .select(
            "weather_date",
            "tempmax",
            "tempmin",
            "temp",
            precip.alias("precip"),
            F.least(F.lit(100.0), F.col("err_cnt").cast("double")).alias("humidity"),
            "windspeed",
            conditions.alias("conditions"),
            is_rain_v2(precip, conditions).alias("is_rain"),
        )
    )
    return w
