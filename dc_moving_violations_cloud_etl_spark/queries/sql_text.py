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
