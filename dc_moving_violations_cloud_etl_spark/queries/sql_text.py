"""SQL-text entry path, oracle-checked (SURVEY.md §3.3).

The reference's users submit raw MySQL strings; these entries drive the
same queries through ``sql_compat.run_sql`` — MySQL-dialect text →
shim translation → ``spark.sql`` → Catalyst — proving the text
interface end-to-end, not just the DataFrame API. Only fully
integer-deterministic queries are exposed here (counts and averages of
counts) so the text path meets the same hash gate as everything else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..oracle import with_ref_views
from ..sql_compat import run_sql
from .registry import QuerySpec, register

# Qc through the text path: exercises MYSQL_DAYNAME + MYSQL_FIELD and a
# derived-table two-level aggregation, written as a MySQL user would.
_QC_MYSQL = """
SELECT weekday, AVG(daily_tickets) AS avg_tickets
FROM (
    SELECT violation_date,
           DAYNAME(violation_date) AS weekday,
           COUNT(*) AS daily_tickets
    FROM violations
    GROUP BY violation_date, DAYNAME(violation_date)
) AS per_day
GROUP BY weekday
ORDER BY FIELD(weekday, 'Monday', 'Tuesday', 'Wednesday', 'Thursday',
               'Friday', 'Saturday', 'Sunday')
"""

# DATE_FORMAT('%Y-%m') through the text path (G2/G13), integer counts.
_MONTHLY_MYSQL = """
SELECT DATE_FORMAT(issue_date, '%Y-%m') AS ym, COUNT(*) AS n_tickets
FROM violations
GROUP BY DATE_FORMAT(issue_date, '%Y-%m')
ORDER BY ym
"""


def _sql_qc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_sql(spark, sf_dir, _QC_MYSQL)


def _sql_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_sql(spark, sf_dir, _MONTHLY_MYSQL)


# The remaining reference query texts that are integer-deterministic
# (pure counts — no double-sum hash risk on the raw text path), written
# exactly as the reference ships them (sql/analysis_queries.sql) with
# only the date literal moved into the fixture's 1995–2001 range per the
# FIXTURES.md mapping.

# Qb verbatim shape (reference analysis_queries.sql:14-18)
_QB_MYSQL = """
SELECT
    COUNT(*) AS total_tickets_since
FROM violations
WHERE violation_date >= '1998-10-01'
"""

# Qd verbatim (reference analysis_queries.sql:37-43): the fact⋈dimension
# join through the text path
_QD_MYSQL = """
SELECT
    COUNT(*) AS tickets_on_rainy_days
FROM violations v
JOIN weather_daily w
      ON v.violation_date = w.weather_date
WHERE w.is_rain = 1
"""

# Qg verbatim (reference analysis_queries.sql:67-80): MySQL DATE()/HOUR()
# over a derived table — both exist in Spark SQL with identical semantics
_QG_MYSQL = """
SELECT
    hour_of_day,
    AVG(tickets_per_hour) AS avg_tickets_per_hour
FROM (
    SELECT
        DATE(issue_date) AS violation_day,
        HOUR(issue_date) AS hour_of_day,
        COUNT(*) AS tickets_per_hour
    FROM violations
    GROUP BY DATE(issue_date), HOUR(issue_date)
) AS h
GROUP BY hour_of_day
ORDER BY hour_of_day
"""

# Qh verbatim (reference analysis_queries.sql:82-91): join + conditional
# aggregation + NULL-aware inequality
_QH_MYSQL = """
SELECT
    w.is_rain,
    SUM(CASE WHEN v.accident_indicator = 'Y' THEN 1 ELSE 0 END) AS tickets_with_accident,
    SUM(CASE WHEN v.accident_indicator IS NULL OR v.accident_indicator <> 'Y'
             THEN 1 ELSE 0 END) AS tickets_without_accident
FROM violations v
JOIN weather_daily w
      ON v.violation_date = w.weather_date
GROUP BY w.is_rain
"""


def _text_query(mysql_text: str):
    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        return run_sql(spark, sf_dir, mysql_text)

    return build


register(
    QuerySpec(
        "sql_text_qb_since",
        _text_query(_QB_MYSQL),
        with_ref_views(
            """
SELECT count(*) AS total_tickets_since
FROM violations WHERE violation_date >= DATE '1998-10-01'
"""
        ),
        doc="Qb VERBATIM MySQL text via sql_compat.run_sql (reference "
        "analysis_queries.sql:14-18; date literal mapped to fixture range)",
        tags=("sql-text",),
    )
)

register(
    QuerySpec(
        "sql_text_qd_rainy",
        _text_query(_QD_MYSQL),
        with_ref_views(
            """
SELECT count(*) AS tickets_on_rainy_days
FROM violations v JOIN weather_daily w ON v.violation_date = w.weather_date
WHERE w.is_rain = 1
"""
        ),
        doc="Qd VERBATIM MySQL text: fact-to-dimension join through the "
        "text path (reference analysis_queries.sql:37-43)",
        tags=("sql-text",),
    )
)

register(
    QuerySpec(
        "sql_text_qg_hourly",
        _text_query(_QG_MYSQL),
        with_ref_views(
            """
SELECT hour_of_day, avg(tickets_per_hour) AS avg_tickets_per_hour
FROM (
  SELECT CAST(issue_date AS DATE) AS violation_day,
         hour(issue_date) AS hour_of_day,
         count(*) AS tickets_per_hour
  FROM violations
  GROUP BY CAST(issue_date AS DATE), hour(issue_date)
) h
GROUP BY hour_of_day
ORDER BY hour_of_day
"""
        ),
        doc="Qg VERBATIM MySQL text: DATE()/HOUR() two-level aggregation "
        "through the text path (reference analysis_queries.sql:67-80)",
        tags=("sql-text",),
    )
)

register(
    QuerySpec(
        "sql_text_qh_accidents",
        _text_query(_QH_MYSQL),
        with_ref_views(
            """
SELECT w.is_rain,
       CAST(sum(CASE WHEN v.accident_indicator = 'Y' THEN 1 ELSE 0 END)
            AS BIGINT) AS tickets_with_accident,
       CAST(sum(CASE WHEN v.accident_indicator IS NULL
                       OR v.accident_indicator <> 'Y'
                THEN 1 ELSE 0 END) AS BIGINT) AS tickets_without_accident
FROM violations v JOIN weather_daily w ON v.violation_date = w.weather_date
GROUP BY w.is_rain
"""
        ),
        doc="Qh VERBATIM MySQL text: conditional aggregation + NULL-aware "
        "inequality through the text path (reference analysis_queries.sql:82-91)",
        tags=("sql-text",),
    )
)

register(
    QuerySpec(
        "sql_text_qc_weekday",
        _sql_qc,
        with_ref_views(
            """
SELECT weekday, avg(daily_tickets) AS avg_tickets
FROM (
  SELECT violation_date, dayname(violation_date) AS weekday,
         count(*) AS daily_tickets
  FROM violations
  GROUP BY violation_date, dayname(violation_date)
) d
GROUP BY weekday
ORDER BY CASE weekday
  WHEN 'Monday' THEN 1 WHEN 'Tuesday' THEN 2 WHEN 'Wednesday' THEN 3
  WHEN 'Thursday' THEN 4 WHEN 'Friday' THEN 5 WHEN 'Saturday' THEN 6
  WHEN 'Sunday' THEN 7 ELSE 0 END
"""
        ),
        doc="Qc submitted as MySQL TEXT via sql_compat.run_sql: DAYNAME/FIELD "
        "shims as Spark-4 SQL UDFs, token rewrite, spark.sql execution "
        "(reference analysis_queries.sql:20-35 via its real interface)",
        tags=("sql-text", "dialect-shim"),
    )
)

register(
    QuerySpec(
        "sql_text_monthly_tickets",
        _sql_monthly,
        with_ref_views(
            """
SELECT strftime(issue_date, '%Y-%m') AS ym, count(*) AS n_tickets
FROM violations
GROUP BY strftime(issue_date, '%Y-%m')
ORDER BY ym
"""
        ),
        doc="MySQL DATE_FORMAT %-pattern query via the SQL-text path "
        "(G2/G13 shim: %-tokens -> JDK pattern inside a SQL UDF)",
        tags=("sql-text", "dialect-shim"),
    )
)


# The three remaining reference texts carry double SUMs (Qe/Qf) or are
# pure counts (Qa). Qa runs verbatim through the plain text path; Qe/Qf
# run verbatim under the engine's exact-aggregation mode
# (``exact_decimal_sums=True``): SUM(x) is routed through DECIMAL(18,2)
# so the result is order-independent and identical to the DuckDB oracle
# (same policy the DataFrame twins apply via expressions.exact_decimal_sum).

# Qa verbatim (reference analysis_queries.sql:5-12)
_QA_MYSQL = """
SELECT
    month,
    issuing_agency_name,
    COUNT(*) AS tickets_count
FROM violations
GROUP BY month, issuing_agency_name
ORDER BY month, issuing_agency_name
"""

# Qe verbatim (reference analysis_queries.sql:45-51): DATE_FORMAT shim +
# GROUP BY alias + ROUND over the routed sum
_QE_MYSQL = """
SELECT
    DATE_FORMAT(weather_date, '%Y-%m') AS year_month_,
    ROUND(SUM(precip),2) AS total_precipitation
FROM weather_daily
GROUP BY year_month_
ORDER BY year_month_
"""

# Qf verbatim (reference analysis_queries.sql:54-63): LIKE + 2x NOT LIKE
_QF_MYSQL = """
SELECT
    month,
    SUM(fine_amount) AS total_fine_over_10mph
FROM violations
WHERE violation_desc LIKE '%MPH OVER%'
  AND violation_desc NOT LIKE '%UP TO TEN MPH OVER%'
  AND violation_desc NOT LIKE '%1-10 MPH OVER%'
GROUP BY month
ORDER BY month
"""


def _text_query_decimal(mysql_text: str):
    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        return run_sql(spark, sf_dir, mysql_text, exact_decimal_sums=True)

    return build


register(
    QuerySpec(
        "sql_text_qa_monthly_agency",
        _text_query(_QA_MYSQL),
        with_ref_views(
            """
SELECT month, issuing_agency_name, count(*) AS tickets_count
FROM violations
GROUP BY month, issuing_agency_name
ORDER BY month, issuing_agency_name
"""
        ),
        doc="Qa VERBATIM MySQL text via sql_compat.run_sql "
        "(reference analysis_queries.sql:5-12)",
        tags=("sql-text",),
    )
)

register(
    QuerySpec(
        "sql_text_qe_precip",
        _text_query_decimal(_QE_MYSQL),
        with_ref_views(
            """
SELECT strftime(weather_date, '%Y-%m') AS year_month_,
       CAST(round(sum(CAST(precip AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS total_precipitation
FROM weather_daily
GROUP BY strftime(weather_date, '%Y-%m')
ORDER BY year_month_
"""
        ),
        doc="Qe VERBATIM MySQL text under exact-decimal-sum routing: "
        "DATE_FORMAT shim, GROUP BY alias, ROUND over the exact sum "
        "(reference analysis_queries.sql:45-51)",
        tags=("sql-text", "dialect-shim"),
    )
)

register(
    QuerySpec(
        "sql_text_qf_speeding_fines",
        _text_query_decimal(_QF_MYSQL),
        with_ref_views(
            """
SELECT month,
       CAST(sum(CAST(fine_amount AS DECIMAL(18,2))) AS DOUBLE)
         AS total_fine_over_10mph
FROM violations
WHERE violation_desc LIKE '%MPH OVER%'
  AND violation_desc NOT LIKE '%UP TO TEN MPH OVER%'
  AND violation_desc NOT LIKE '%1-10 MPH OVER%'
GROUP BY month
ORDER BY month
"""
        ),
        doc="Qf VERBATIM MySQL text under exact-decimal-sum routing "
        "(reference analysis_queries.sql:54-63)",
        tags=("sql-text",),
    )
)


# MySQL's default collation makes LIKE case-INsensitive; a reference user
# writes lowercase patterns against the uppercase violation_desc data and
# still matches. ci_like=True closes that documented divergence (LIKE →
# ILIKE, literal-aware); this entry proves it: same result set as Qf with
# the patterns lowercased.
_QF_CI_MYSQL = """
SELECT
    month,
    SUM(fine_amount) AS total_fine_over_10mph
FROM violations
WHERE violation_desc LIKE '%mph over%'
  AND violation_desc NOT LIKE '%up to ten mph over%'
  AND violation_desc NOT LIKE '%1-10 mph over%'
GROUP BY month
ORDER BY month
"""


def _sql_qf_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_sql(
        spark, sf_dir, _QF_CI_MYSQL, exact_decimal_sums=True, ci_like=True
    )


register(
    QuerySpec(
        "sql_text_qf_ci_like",
        _sql_qf_ci,
        with_ref_views(
            """
SELECT month,
       CAST(sum(CAST(fine_amount AS DECIMAL(18,2))) AS DOUBLE)
         AS total_fine_over_10mph
FROM violations
WHERE violation_desc ILIKE '%mph over%'
  AND violation_desc NOT ILIKE '%up to ten mph over%'
  AND violation_desc NOT ILIKE '%1-10 mph over%'
GROUP BY month
ORDER BY month
"""
        ),
        doc="Qf with MySQL case-INsensitive LIKE semantics (lowercase "
        "patterns match uppercase data): ci_like mode rewrites LIKE -> "
        "ILIKE, closing the documented collation divergence",
        tags=("sql-text", "dialect-shim"),
    )
)
