"""Modern Spark SQL surface (round 3): the VARIANT semi-structured
type, parameterized SQL (named parameter markers), and SQL scripting
(BEGIN/DECLARE/WHILE control flow).

These are the Spark-4-era answers to patterns the reference handles in
Python glue: ad-hoc JSON dict access (reference
etl/daily_load/violation_etl_daily.py:180-184) → VARIANT binary
encoding with typed path extraction; f-string SQL assembly of the date
cutoff (violation_etl_daily.py:168) → server-side parameter binding
(no injection surface); the Lambda's imperative month loop
(violation_etl_history.py:160-167) → SQL-native control flow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..oracle import with_ref_views
from .registry import QuerySpec, register


# ---------------------------------------------------------------------------
# VARIANT: binary semi-structured encoding with typed path access
# ---------------------------------------------------------------------------


def _variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``parse_json`` → VariantType → ``variant_get`` typed path reads.
    Unlike ``get_json_object`` (string re-parse per access), VARIANT
    parses once into a binary encoding; repeated path reads are
    structural lookups — the right shape when many expressions touch
    the same semi-structured column at 100 TB."""
    ev = catalog.base(spark, sf_dir, "events").select(
        "event_type", F.parse_json("props").alias("v")
    )
    k = F.variant_get("v", "$.k", "long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(k).cast("long").alias("k_sum"),
            F.min(k).cast("long").alias("k_min"),
            F.max(k).cast("long").alias("k_max"),
        )
        .orderBy("event_type")
    )


register(
    QuerySpec(
        "variant_props_extract",
        _variant_extract,
        """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS k_sum,
       CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS k_min,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS k_max
FROM events
GROUP BY event_type ORDER BY event_type
""",
        doc="VARIANT semi-structured pipeline: parse_json once into the "
        "binary encoding, typed variant_get path reads (vs per-access "
        "string re-parsing)",
        tags=("extension", "json", "variant"),
    )
)


# ---------------------------------------------------------------------------
# parameterized SQL: named parameter markers
# ---------------------------------------------------------------------------

from .reference import QB_CUTOFF  # fixture-mapped Qb date literal


def _parameterized_qb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference assembles its pushdown predicate by f-string
    (violation_etl_daily.py:168); the Spark-native form is a named
    parameter marker bound server-side — same plan as the literal
    query (the bound value still reaches the parquet scan as a pushed
    filter), no SQL-injection surface."""
    catalog.register_views(spark, sf_dir, ["violations"])
    return spark.sql(
        """
        SELECT CAST(count(*) AS BIGINT) AS total_tickets
        FROM violations
        WHERE violation_date >= :cutoff
        """,
        args={"cutoff": QB_CUTOFF},
    )


register(
    QuerySpec(
        "sql_parameterized_qb",
        _parameterized_qb,
        with_ref_views(
            f"""
SELECT CAST(count(*) AS BIGINT) AS total_tickets
FROM violations
WHERE violation_date >= DATE '{QB_CUTOFF}'
"""
        ),
        doc="named-parameter-marker SQL (spark.sql(text, args=...)): "
        "Qb's date cutoff bound server-side instead of f-string "
        "splicing (reference violation_etl_daily.py:168); the bound "
        "predicate still pushes to the scan",
        tags=("extension", "sql-text", "parameterized"),
    )
)


# ---------------------------------------------------------------------------
# SQL scripting: BEGIN / DECLARE / WHILE control flow
# ---------------------------------------------------------------------------


def _scripting_month_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's driver-side month loop (violation_etl_history.py
    :160-167, `for month in LAYER_2024+LAYER_2025`) as SQL-native
    control flow: a WHILE loop accumulating per-month counts into a
    session variable. Each iteration's subquery is a full Catalyst
    query (partition-prunable at scale); the loop is orchestration,
    exactly like the reference's Python for-loop — but inside the SQL
    engine."""
    catalog.register_views(spark, sf_dir, ["violations"])
    return spark.sql(
        """
        BEGIN
          DECLARE total BIGINT DEFAULT 0;
          DECLARE m INT DEFAULT 1;
          WHILE m <= 12 DO
            SET total = total + (
              SELECT count(*) FROM violations
              WHERE month(violation_date) = m
            );
            SET m = m + 1;
          END WHILE;
          SELECT total AS n_violations;
        END
        """
    )


register(
    QuerySpec(
        "sql_scripting_month_loop",
        _scripting_month_loop,
        with_ref_views(
            "SELECT CAST(count(*) AS BIGINT) AS n_violations FROM violations"
        ),
        doc="SQL scripting (BEGIN/DECLARE/WHILE): the reference's "
        "imperative month loop as engine-native control flow; the "
        "accumulated total equals the flat count",
        tags=("extension", "sql-text", "scripting"),
    )
)


# ---------------------------------------------------------------------------
# Observation API: pipeline metrics without a second scan
# ---------------------------------------------------------------------------


def _observed_etl_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ counters collected DURING the ETL pass via ``observe`` —
    Spark's accumulator-backed metrics API. The reference counts rows
    with a second query after each load (DEPLOYMENT.md:231-241
    verification queries); ``observe`` rides the write/action itself,
    so the metrics cost zero extra scans at 100 TB. The observed values
    (constant-size) are returned as the result table; the oracle
    recomputes them with plain aggregates."""
    from pyspark.sql import Observation

    obs = Observation("etl_metrics")
    v = catalog.violations(spark, sf_dir, materialized=False).observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("fine_amount").isNull().cast("long")).alias(
            "n_missing_fine"
        ),
        F.sum(F.col("fine_amount").cast("decimal(18,2)")).alias("fine_sum"),
        # DISTINCT aggregates are rejected in observed metrics
        # (INVALID_OBSERVED_METRICS); min/max month bound the range
        F.min("month").alias("first_month"),
        F.max("month").alias("last_month"),
    )
    # the action that drives the pipeline (a real ETL would be writing
    # here); metrics are harvested from the SAME pass
    v.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                int(m["n_rows"]),
                int(m["n_missing_fine"]),
                float(m["fine_sum"]),
                str(m["first_month"]),
                str(m["last_month"]),
            )
        ],
        "n_rows long, n_missing_fine long, fine_sum double, "
        "first_month string, last_month string",
    )


register(
    QuerySpec(
        "observed_etl_metrics",
        _observed_etl_metrics,
        with_ref_views(
            """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (WHERE fine_amount IS NULL) AS BIGINT)
         AS n_missing_fine,
       CAST(sum(CAST(fine_amount AS DECIMAL(18,2))) AS DOUBLE) AS fine_sum,
       min(month) AS first_month,
       max(month) AS last_month
FROM violations
"""
        ),
        doc="Observation/observe metrics harvested during the ETL action "
        "itself (noop-format write) — the reference's post-load "
        "verification queries (DEPLOYMENT.md:231-241) with zero extra "
        "scans",
        tags=("extension", "observability"),
    )
)
