"""MySQL-dialect shims and canonical ETL expressions as native Columns.

The reference's custom logic is row-level Python + MySQL-only SQL functions;
every one maps to a JVM-side Column expression (SURVEY.md §2.C/§2.G) — no
Python UDFs anywhere in the hot path, so the whole query surface stays
inside whole-stage codegen.

Reference citations (read-only at /root/reference):
- DAYNAME:            sql/analysis_queries.sql:27
- FIELD(weekday,...): sql/analysis_queries.sql:33-35
- is_rain v1:         etl/full_load/weather_etl_history.py:85
- is_rain v2:         etl/daily_load/weather_etl_daily.py:158-160
- to_float_safe:      etl/daily_load/violation_etl_daily.py:201-210
- ms_to_datetime:     etl/daily_load/violation_etl_daily.py:213-224
- month bucket:       etl/full_load/violation_etl_history.py:120
- synthetic key:      etl/daily_load/violation_etl_daily.py:247-248
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WEEKDAY_ORDER = [
    "Monday",
    "Tuesday",
    "Wednesday",
    "Thursday",
    "Friday",
    "Saturday",
    "Sunday",
]


def dayname(c: Column) -> Column:
    """MySQL ``DAYNAME(d)`` → English weekday name.

    ``date_format(c, 'EEEE')`` is locale-dependent; this engine pins the
    result to English regardless of JVM locale by deriving the name from
    the locale-free ``dayofweek`` (1=Sunday..7=Saturday).
    """
    names = ["Sunday", "Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday"]
    return F.element_at(F.array(*[F.lit(n) for n in names]), F.dayofweek(c))


def field_order(c: Column, values: list[str] | None = None) -> Column:
    """MySQL ``FIELD(c, v1, v2, ...)`` — 1-based index of ``c`` in the list,
    0 if absent (MySQL sorts absent values first; we replicate with 0).
    Used as the custom sort key for weekday ordering (Qc).
    """
    values = values or WEEKDAY_ORDER
    return F.coalesce(
        F.array_position(F.array(*[F.lit(v) for v in values]), c), F.lit(0)
    ).cast("int")


def month_bucket(ts: Column) -> Column:
    """``'yyyy-MM'`` month key (MySQL DATE_FORMAT '%Y-%m')."""
    return F.date_format(ts, "yyyy-MM")


def is_rain_v1(precip: Column) -> Column:
    """Full-load rule: ``1 if precip > 0 else 0`` with null→0 guard."""
    return (F.coalesce(precip, F.lit(0.0)) > 0).cast("int")


def is_rain_v2(precip: Column, conditions: Column) -> Column:
    """Daily-load (canonical) rule: precip>0 OR 'rain' in lower(conditions)."""
    return (
        (F.coalesce(precip, F.lit(0.0)) > 0)
        | F.lower(F.coalesce(conditions, F.lit(""))).contains("rain")
    ).cast("int")


def safe_double(c: Column) -> Column:
    """``to_float_safe``: parse-failure/NaN → NULL. ``try_cast`` (not
    ``cast``) because ANSI mode — Spark 4's default — makes a plain cast
    THROW on malformed input; the reference's contract is NULL
    (reference violation_etl_daily.py:201-210). NaN maps to NULL
    explicitly.

    Cost note: TryEval-family expressions evaluate ~18x slower than a
    guarded cast on a corpus-sized scan (measured; see
    queries/modern_sql.py::_ansi_try_functions). Fine here — this shim
    parses API payload fields at ingest grain — but on a fact-scan hot
    path, evaluate it per DISTINCT value and broadcast back."""
    d = c.try_cast("double")
    return F.when(F.isnan(d), F.lit(None).cast("double")).otherwise(d)


def ms_to_timestamp(ms: Column) -> Column:
    """ArcGIS ms-epoch → UTC timestamp (session TZ is pinned to UTC)."""
    return F.timestamp_millis(ms.cast("long"))


def ms_to_date(ms: Column) -> Column:
    """ms-epoch → UTC calendar date (reference derives violation_date so)."""
    return F.to_date(F.timestamp_millis(ms.cast("long")))


def synthetic_violation_id(month: Column, object_id: Column) -> Column:
    """Canonical key ``'{yyyy-MM}_{objectid}'`` (the daily-load scheme;
    chosen as the single key scheme per SURVEY.md §1.4.4)."""
    return F.concat_ws("_", month, object_id.cast("string"))


def exact_decimal_sum(c: Column, precision: int = 18, scale: int = 2) -> Column:
    """Order-independent exact SUM for monetary/metric doubles.

    Summing doubles is not associative — partial-aggregation order would
    make results differ run-to-run and engine-to-engine. Casting to
    decimal first makes the aggregation exact (and therefore identical to
    the DuckDB oracle bit-for-bit); the final cast back to double is a
    single deterministic conversion.
    """
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def wide_product(a: Column, b: Column) -> Column:
    """Exact integer product that cannot silently wrap at 64 bits.

    ``long * long`` in Spark wraps silently with ANSI off (and errors
    with it on) the moment both factors are corpus-sized counts —
    ~1e10 × 1e10 already exceeds 2^63 — while the DuckDB oracle twin
    widens to HUGEINT. Casting ONE factor to DECIMAL(19,0) makes Spark
    promote the product to DECIMAL(38,0): exact to 38 digits, room for
    any product of two 64-bit counts. The twin's matching spell is
    ``CAST(a AS HUGEINT) * b``. Used by the lift/covariance/Gini
    cross-products and the WordPiece score denominator; the
    negative-sampling alias-table applies the same widening inline in
    its SQL-string expressions.
    """
    return a.cast("decimal(19,0)") * b
