"""Golden tests for the dialect shims (SURVEY.md §5, §7 hard-part 2/3):
DAYNAME English-pinning, FIELD absent-value ordering, the two is_rain
variants, Python-`or` vs SQL-coalesce divergence, epoch-ms UTC math."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dc_moving_violations_cloud_etl_spark.expressions import (
    dayname,
    field_order,
    is_rain_v1,
    is_rain_v2,
    month_bucket,
    ms_to_date,
    ms_to_timestamp,
    safe_double,
    wide_product,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_dayname_english_all_days(spark):
    # 2024-01-01 is a Monday; locale-free derivation must hold for all 7
    rows = (
        spark.range(7)
        .select(
            dayname(F.date_add(F.lit(dt.date(2024, 1, 1)), F.col("id").cast("int")))
            .alias("d")
        )
        .collect()
    )
    assert [r["d"] for r in rows] == [
        "Monday",
        "Tuesday",
        "Wednesday",
        "Thursday",
        "Friday",
        "Saturday",
        "Sunday",
    ]


def test_field_order_mysql_semantics(spark):
    # MySQL FIELD(): 1-based position, absent → 0 (sorts first)
    vals = ["Wednesday", "Monday", "NotADay", "Sunday"]
    got = [
        _one(spark, field_order(F.lit(v))) for v in vals
    ]
    assert got == [3, 1, 0, 7]


def test_is_rain_variants(spark):
    # v1: precip only; v2: also conditions substring (the canonical rule)
    cases = [
        (0.0, "Rain, Partially cloudy", 0, 1),
        (0.0, "Clear", 0, 0),
        (2.5, "Clear", 1, 1),
        (None, "Light rain, overcast", 0, 1),
        (None, None, 0, 0),
    ]
    for precip, cond, want1, want2 in cases:
        r1 = _one(
            spark,
            is_rain_v1(F.lit(precip).cast("double")),
        )
        r2 = _one(
            spark,
            is_rain_v2(F.lit(precip).cast("double"), F.lit(cond).cast("string")),
        )
        assert (r1, r2) == (want1, want2), (precip, cond)


def test_coalesce_vs_python_or_divergence(spark):
    # the reference's `x or default` maps falsy 0/'' to the default; the
    # engine's F.coalesce is NULL-only (SURVEY.md §2.G16) — 0 survives
    assert _one(spark, F.coalesce(F.lit(0.0), F.lit(9.9))) == 0.0
    assert _one(spark, F.coalesce(F.lit(None).cast("double"), F.lit(9.9))) == 9.9


def test_safe_double_nan_and_parse_failure(spark):
    assert _one(spark, safe_double(F.lit("12.5"))) == 12.5
    assert _one(spark, safe_double(F.lit("not-a-number"))) is None
    assert _one(spark, safe_double(F.lit(float("nan")))) is None


def test_epoch_ms_utc_and_month_bucket(spark):
    # 2024-10-05T14:30:00Z = 1728138600000 ms; session TZ pinned UTC so
    # the date never shifts with the host timezone (G14)
    ms = F.lit(1728138600000)
    assert _one(spark, ms_to_timestamp(ms)) == dt.datetime(2024, 10, 5, 14, 30)
    assert _one(spark, ms_to_date(ms)) == dt.date(2024, 10, 5)
    assert _one(spark, month_bucket(ms_to_timestamp(ms))) == "2024-10"


def test_wide_product_exact_past_64_bits(spark):
    # two corpus-sized counts whose long*long product exceeds 2^63: the
    # naive form KILLS the query under Spark 4's default ANSI mode
    # (ArithmeticException: long overflow — confirmed by try_multiply
    # returning NULL) and silently wraps with ANSI off; wide_product
    # must return the exact integer (DECIMAL(38,0) promotion) and keep
    # comparisons exact
    a, b = (1 << 40) + 7, (1 << 40) + 11  # product ≈ 2^80, >> 2^63
    row = (
        spark.createDataFrame([(a, b)], "a long, b long")
        .select(
            wide_product(F.col("a"), F.col("b")).alias("wide"),
            F.expr("try_multiply(a, b)").alias("naive"),
            (wide_product(F.col("a"), F.col("b"))
             > wide_product(F.col("b") + 1, F.col("a"))).alias("cmp"),
        )
        .collect()[0]
    )
    assert int(row["wide"]) == a * b
    assert row["naive"] is None  # the 64-bit trap wide_product avoids
    assert row["cmp"] is False  # (a+eps)*b ordering survives widening
