"""Semi-structured JSON source boundary (SURVEY.md §2.A1–A4).

The reference ingests two JSON HTTP APIs row-at-a-time in Python:
ArcGIS feature pages (``features[].attributes`` dicts, reference
etl/daily_load/violation_etl_daily.py:180-184) and VisualCrossing
timeline documents (``days[]`` array, reference
etl/full_load/weather_etl_history.py:73). The Spark-first equivalent
keeps the page payloads opaque strings until they are on executors, then
parses with ``from_json`` + ``explode`` — schema-checked, vectorized,
and parallel over pages.

In production the page payloads arrive from a fetch layer (a
``foreachBatch`` HTTP stage or files landed by a collector); here any
DataFrame with a ``payload`` string column works, which is also exactly
how the unit tests drive it. Pagination (A1's count-then-page loop)
becomes partition-parallel page rows; the server-side day predicate
(A2) stays a normal ``where`` that Catalyst pushes to the source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ArcGIS page: {"features": [{"attributes": {...}}, ...]}
ARCGIS_ATTRIBUTES = T.StructType(
    [
        T.StructField("OBJECTID", T.LongType()),
        T.StructField("ISSUE_DATE", T.LongType()),  # ms epoch (wire format)
        T.StructField("ISSUING_AGENCY_NAME", T.StringType()),
        T.StructField("VIOLATION_CODE", T.StringType()),
        T.StructField("VIOLATION_PROCESS_DESC", T.StringType()),
        T.StructField("LOCATION", T.StringType()),
        T.StructField("FINE_AMOUNT", T.DoubleType()),
        T.StructField("TOTAL_PAID", T.DoubleType()),
        T.StructField("LATITUDE", T.DoubleType()),
        T.StructField("LONGITUDE", T.DoubleType()),
        T.StructField("ACCIDENT_INDICATOR", T.StringType()),
    ]
)
ARCGIS_PAGE = T.StructType(
    [
        T.StructField(
            "features",
            T.ArrayType(
                T.StructType([T.StructField("attributes", ARCGIS_ATTRIBUTES)])
            ),
        )
    ]
)

# VisualCrossing timeline: {"days": [{...}, ...]}
WEATHER_DAY = T.StructType(
    [
        T.StructField("datetime", T.StringType()),  # 'yyyy-MM-dd'
        T.StructField("tempmax", T.DoubleType()),
        T.StructField("tempmin", T.DoubleType()),
        T.StructField("temp", T.DoubleType()),
        T.StructField("precip", T.DoubleType()),
        T.StructField("humidity", T.DoubleType()),
        T.StructField("windspeed", T.DoubleType()),
        T.StructField("conditions", T.StringType()),
    ]
)
WEATHER_TIMELINE = T.StructType(
    [T.StructField("days", T.ArrayType(WEATHER_DAY))]
)


def plan_pages(spark, total_count: int, page_size: int = 1000) -> DataFrame:
    """A1/I3 count-then-page planning (reference
    etl/full_load/violation_etl_history.py:90-103): the reference asks
    the server for ``returnCountOnly`` then loops
    ``resultOffset += resultRecordCount`` serially. The Spark-first
    shape turns the count into a DataFrame of page windows — one row per
    fetch task, so a fetch layer (``foreachBatch`` HTTP stage or a
    mapInPandas fetcher) executes ALL pages partition-parallel instead
    of one at a time.

    ``spark.range`` is a parallel, shuffle-free source; the windows are
    pure projections of the page index.
    """
    n_pages = max(0, -(-int(total_count) // page_size))
    return spark.range(n_pages).select(
        F.col("id").alias("page_index"),
        (F.col("id") * page_size).alias("result_offset"),
        F.least(
            F.lit(int(total_count)) - F.col("id") * page_size,
            F.lit(page_size).cast("long"),
        ).alias("result_record_count"),
    )


def arcgis_features(pages: DataFrame, payload_col: str = "payload") -> DataFrame:
    """JSON page payloads → one row per feature's attributes.

    Mirrors the reference's per-feature dict shredding (reference
    violation_etl_daily.py:180-184) as parse → explode → struct-star:
    pages parallelize across partitions, features vectorize within them.
    Malformed payloads yield NULL structs (PERMISSIVE mode) and drop out
    of the explode — the engine analog of the reference's per-day
    try/except quarantine (J4).
    """
    return (
        pages.select(
            F.from_json(F.col(payload_col), ARCGIS_PAGE).alias("page")
        )
        .select(F.explode("page.features").alias("f"))
        .select("f.attributes.*")
    )


def weather_days(pages: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Timeline JSON payloads → one row per ``days[]`` element (reference
    weather_etl_history.py:73-86 day-record shredding)."""
    return (
        pages.select(
            F.from_json(F.col(payload_col), WEATHER_TIMELINE).alias("t")
        )
        .select(F.explode("t.days").alias("d"))
        .select("d.*")
    )
