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
    the same semi-structured column at 100 TB. The try_ variants make
    malformed JSON / non-path values NULL instead of failing the scan —
    the strict forms raise under ANSI the moment one dirty payload
    appears (r10 dirty-fixture audit).

    ``try_variant_get(v, path, 'long')`` has RICHER coercion than the
    string-side ``get_json_object(...).try_cast('long')`` (measured on
    Spark 4.1, r11): JSON doubles truncate toward zero (12.7 → 12,
    -3.9 → -3; overflow → NULL), booleans map to 1/0, and integral
    STRINGS cast (" 12 " → 12) while non-integral strings ("12.7") are
    NULL. The DuckDB twin mirrors each branch off ``json_type`` — a
    bare TRY_CAST twin diverges because DuckDB ROUNDS varchar → BIGINT
    (12.7 → 13, ADVICE r10)."""
    ev = catalog.base(spark, sf_dir, "events").select(
        "event_type", F.try_parse_json("props").alias("v")
    )
    k = F.try_variant_get("v", "$.k", "long")
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
       CAST(sum(k) AS BIGINT) AS k_sum,
       CAST(min(k) AS BIGINT) AS k_min,
       CAST(max(k) AS BIGINT) AS k_max
FROM (
  SELECT event_type,
         CASE
           WHEN NOT json_valid(props) THEN NULL
           WHEN json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
             THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
           WHEN json_type(props, '$.k') = 'DOUBLE'
             THEN TRY_CAST(trunc(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS BIGINT)
           WHEN json_type(props, '$.k') = 'BOOLEAN'
             THEN (CASE json_extract_string(props, '$.k')
                   WHEN 'true' THEN 1 WHEN 'false' THEN 0 END)
           WHEN json_type(props, '$.k') = 'VARCHAR'
                AND regexp_matches(json_extract_string(props, '$.k'),
                                   '^[\\x00-\\x20\\x7f]*[+-]?[0-9]+[\\x00-\\x20\\x7f]*$')
             THEN TRY_CAST(regexp_replace(json_extract_string(props, '$.k'),
                                          '^[\\x00-\\x20\\x7f]+|[\\x00-\\x20\\x7f]+$',
                                          '', 'g') AS BIGINT)
         END AS k
  FROM events
)
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


# ---------------------------------------------------------------------------
# Recursive CTE (Spark 4): calendar-spine generation
# ---------------------------------------------------------------------------

SPINE_START, SPINE_END = "1995-01-01", "2001-08-01"


def _recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``WITH RECURSIVE`` month-spine generation — the warehouse
    calendar-dimension pattern (a spine left-joined to facts exposes
    zero-activity periods, which a plain GROUP BY silently drops).
    The recursion is 80 driver-coordinated iterations of a 1-row
    relation — pure orchestration, like the reference's month loop
    (violation_etl_history.py:160-167); the fact aggregation underneath
    is one ordinary shuffle, so the shape scales."""
    catalog.register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        f"""
        WITH RECURSIVE spine(m) AS (
          SELECT DATE '{SPINE_START}'
          UNION ALL
          SELECT add_months(m, 1) FROM spine
          WHERE m < DATE '{SPINE_END}'
        )
        SELECT date_format(m, 'yyyy-MM') AS month,
               CAST(coalesce(c.n, 0) AS BIGINT) AS n_orders
        FROM spine
        LEFT JOIN (
          SELECT date_format(o_orderdate, 'yyyy-MM') AS om,
                 count(*) AS n
          FROM orders GROUP BY om
        ) c ON date_format(m, 'yyyy-MM') = c.om
        ORDER BY month
        """
    )


register(
    QuerySpec(
        "sql_recursive_month_spine",
        _recursive_month_spine,
        f"""
WITH RECURSIVE spine(m) AS (
  SELECT DATE '{SPINE_START}'
  UNION ALL
  SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM spine
  WHERE m < DATE '{SPINE_END}'
)
SELECT strftime(m, '%Y-%m') AS month,
       CAST(coalesce(c.n, 0) AS BIGINT) AS n_orders
FROM spine
LEFT JOIN (
  SELECT strftime(o_orderdate, '%Y-%m') AS om, count(*) AS n
  FROM orders GROUP BY om
) c ON strftime(m, '%Y-%m') = c.om
ORDER BY month
""",
        doc="WITH RECURSIVE calendar spine (80 months) left-joined to "
        "monthly order counts — zero-activity months surface as 0 rows "
        "instead of disappearing",
        tags=("extension", "sql-text", "recursive-cte"),
    )
)


# ---------------------------------------------------------------------------
# LATERAL subquery: correlated top-k without a window function
# ---------------------------------------------------------------------------


def _lateral_topk_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type top-3 busiest days via a correlated LATERAL subquery
    (ORDER BY + LIMIT inside the lateral) — the set-returning-correlation
    SQL surface. Catalyst decorrelates the lateral into a join +
    per-group limit over the pre-aggregated daily counts; the
    equivalent window-rank formulation is `topk_busiest_days_per_type`
    (same engine shape, different SQL spelling)."""
    catalog.register_views(spark, sf_dir, ["events"])
    return spark.sql(
        """
        SELECT et.event_type, top.day, top.n_events
        FROM (SELECT DISTINCT event_type FROM events) et,
        LATERAL (
          SELECT date_format(e.ts, 'yyyy-MM-dd') AS day,
                 CAST(count(*) AS BIGINT) AS n_events
          FROM events e
          WHERE e.event_type = et.event_type
          GROUP BY day
          ORDER BY n_events DESC, day
          LIMIT 3
        ) top
        ORDER BY et.event_type, top.n_events DESC, top.day
        """
    )


register(
    QuerySpec(
        "sql_lateral_topk_days",
        _lateral_topk_days,
        """
SELECT et.event_type, top.day, top.n_events
FROM (SELECT DISTINCT event_type FROM events) et,
LATERAL (
  SELECT strftime(e.ts, '%Y-%m-%d') AS day,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events e
  WHERE e.event_type = et.event_type
  GROUP BY day
  ORDER BY n_events DESC, day
  LIMIT 3
) top
ORDER BY et.event_type, top.n_events DESC, top.day
""",
        doc="correlated LATERAL subquery with ORDER BY/LIMIT: per-type "
        "top-3 busiest days, decorrelated by Catalyst into join + "
        "per-group limit",
        tags=("extension", "sql-text", "lateral"),
    )
)


# ---------------------------------------------------------------------------
# SQL pipe syntax (Spark 4.1): |> operator chains
# ---------------------------------------------------------------------------


def _pipe_syntax_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same logical plan Qg-style aggregations declare, written in
    Spark 4.1's pipe syntax (FROM ... |> WHERE |> EXTEND |> AGGREGATE
    |> ORDER BY) — each |> stage maps 1:1 onto a DataFrame
    transformation, and Catalyst optimizes the chain identically to
    the nested-SELECT spelling (the oracle twin is that spelling)."""
    catalog.register_views(spark, sf_dir, ["events"])
    return spark.sql(
        """
        FROM events
        |> WHERE event_type = 'click'
        |> EXTEND date_format(ts, 'yyyy-MM-dd') AS day
        |> AGGREGATE CAST(count(*) AS BIGINT) AS n_clicks GROUP BY day
        |> ORDER BY day
        """
    )


register(
    QuerySpec(
        "sql_pipe_syntax_daily",
        _pipe_syntax_daily,
        """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       CAST(count(*) AS BIGINT) AS n_clicks
FROM events
WHERE event_type = 'click'
GROUP BY day ORDER BY day
""",
        doc="SQL pipe syntax (|> WHERE / EXTEND / AGGREGATE / ORDER "
        "BY): daily click counts; identical Catalyst plan to the "
        "nested-SELECT spelling",
        tags=("extension", "sql-text", "pipe-syntax"),
    )
)


# ---------------------------------------------------------------------------
# ntile decile report (global ranked bucketing)
# ---------------------------------------------------------------------------


def _ntile_price_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-value deciles with EXACT ``ntile(10)`` semantics over a
    deterministic total order (price, then unique key — ties can never
    straddle engines), computed WITHOUT a single-task global sort
    (VERDICT r4 rec #4): the global rank comes from the distributed
    three-step ranking (operators/ranking.global_rank — range
    repartition, per-partition rank, constant-size offset cumsum) and
    the ntile bucket is then closed-form in (rank, n): the first
    ``n mod b`` buckets hold ``ceil(n/b)`` rows, the rest ``floor``.
    ``n`` is a 1-row aggregate broadcast back (scalar-combine pattern,
    allow-listed in the BNLJ guardrail). The approximate scale-path
    twin is `doc_length_quartile_assignment` (approx_percentile bounds
    broadcast, no exact ranks at all)."""
    from ..operators.ranking import global_rank

    orders = catalog.base(spark, sf_dir, "orders")
    ranked = global_rank(
        orders.select("o_totalprice", "o_orderkey"),
        F.asc("o_totalprice"),
        F.asc("o_orderkey"),
        alias="rk",
    )
    n_row = orders.agg(F.count(F.lit(1)).alias("_n"))
    # ntile(b) closed form: the first (n mod b) buckets are ceil-sized
    # (size+1), the rest floor-sized — integer-exact `div` arithmetic
    decile = F.expr(
        "CASE WHEN rk <= ((_n div 10) + 1) * (_n % 10) "
        "THEN (rk - 1) div ((_n div 10) + 1) + 1 "
        "ELSE (_n % 10) "
        "  + (rk - ((_n div 10) + 1) * (_n % 10) - 1) div (_n div 10) + 1 "
        "END"
    )
    return (
        ranked.crossJoin(F.broadcast(n_row))
        .withColumn("decile", decile.cast("long"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
        .orderBy("decile")
    )


register(
    QuerySpec(
        "sql_ntile_price_deciles",
        _ntile_price_deciles,
        """
WITH ranked AS (
  SELECT o_totalprice,
         ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders
)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n_orders,
       min(o_totalprice) AS lo,
       max(o_totalprice) AS hi,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM ranked
GROUP BY decile ORDER BY decile
""",
        doc="ntile(10) decile report over a deterministic total order "
        "(price + unique key tiebreak); exact ranked bucketing",
        tags=("extension", "window", "ntile"),
    )
)


# ---------------------------------------------------------------------------
# EXECUTE IMMEDIATE + IDENTIFIER: injection-safe dynamic SQL
# ---------------------------------------------------------------------------


def _execute_immediate_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic per-table profiling via ``EXECUTE IMMEDIATE`` with an
    ``IDENTIFIER(:t)`` table parameter — the engine-native form of the
    reference's f-string SQL assembly (violation_etl_daily.py:168):
    the table NAME is bound as a parameter and resolved as an
    identifier, so neither values nor names are string-spliced. One
    constant-size EXECUTE per table (3), unioned driver-side; each
    inner query is an ordinary pushdown count over the parquet scan."""
    catalog.register_views(
        spark, sf_dir, ["events", "documents", "embeddings"]
    )
    out = None
    for t in ("documents", "embeddings", "events"):
        one = spark.sql(
            """
            EXECUTE IMMEDIATE
              'SELECT :name AS table_name,
                      CAST(count(*) AS BIGINT) AS n_rows
               FROM IDENTIFIER(:name)'
              USING ? AS name
            """,
            args=[t],
        )
        out = one if out is None else out.unionByName(one)
    return out.orderBy("table_name")


register(
    QuerySpec(
        "execute_immediate_profile",
        _execute_immediate_profile,
        """
SELECT 'documents' AS table_name, CAST(count(*) AS BIGINT) AS n_rows
FROM documents
UNION ALL
SELECT 'embeddings', CAST(count(*) AS BIGINT) FROM embeddings
UNION ALL
SELECT 'events', CAST(count(*) AS BIGINT) FROM events
ORDER BY table_name
""",
        doc="EXECUTE IMMEDIATE with IDENTIFIER(:name) parameter binding: "
        "dynamic table-name SQL without string splicing (the injection-"
        "safe form of the reference's f-string assembly)",
        tags=("extension", "sql-text", "dynamic-sql"),
    )
)


# ---------------------------------------------------------------------------
# SQL-bodied CREATE FUNCTION (declarative scalar UDFs, Spark 4)
# ---------------------------------------------------------------------------


def _sql_udf_weather_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's scalar shims (G-ops) as SQL-BODIED functions:
    ``CREATE TEMPORARY FUNCTION ... RETURN <expr>`` — Spark 4's
    declarative UDF mechanism. Unlike Python UDFs these inline into the
    plan as Catalyst expressions (whole-stage codegen, pushdown-safe),
    so they are the idiomatic way to package the reference's per-row
    helper logic (is_rain weather_etl_daily.py:158-160 /
    weather_etl_history.py:85, month bucket
    violation_etl_history.py:120) as reusable catalog objects rather
    than copy-pasted CASE expressions. The oracle inlines the same
    expressions (DuckDB macros would be the twin mechanism)."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION is_rain_v1_f(p DOUBLE) "
        "RETURNS INT RETURN CASE WHEN coalesce(p, 0.0) > 0 "
        "THEN 1 ELSE 0 END"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION is_rain_v2_f("
        "p DOUBLE, c STRING) RETURNS INT RETURN CASE WHEN "
        "coalesce(p, 0.0) > 0 OR contains(lower(coalesce(c, '')), "
        "'rain') THEN 1 ELSE 0 END"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION month_bucket_f(d DATE) "
        "RETURNS STRING RETURN date_format(d, 'yyyy-MM')"
    )
    catalog.weather_daily(spark, sf_dir).createOrReplaceTempView(
        "weather_daily_sqludf"
    )
    return spark.sql(
        """
        SELECT month_bucket_f(weather_date) AS ym,
               count(*) AS n_days,
               CAST(sum(is_rain_v1_f(precip)) AS BIGINT) AS rainy_v1_days,
               CAST(sum(is_rain_v2_f(precip, conditions)) AS BIGINT)
                 AS rainy_v2_days
        FROM weather_daily_sqludf
        GROUP BY month_bucket_f(weather_date)
        ORDER BY ym
        """
    )


register(
    QuerySpec(
        "sql_udf_weather_flags",
        _sql_udf_weather_flags,
        with_ref_views(
            """
SELECT strftime(weather_date, '%Y-%m') AS ym,
       count(*) AS n_days,
       CAST(sum(CASE WHEN coalesce(precip, 0.0) > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS rainy_v1_days,
       CAST(sum(CASE WHEN coalesce(precip, 0.0) > 0
                       OR contains(lower(coalesce(conditions, '')), 'rain')
                     THEN 1 ELSE 0 END) AS BIGINT) AS rainy_v2_days
FROM weather_daily
GROUP BY strftime(weather_date, '%Y-%m')
ORDER BY ym
"""
        ),
        doc="SQL-bodied CREATE TEMPORARY FUNCTION (Spark 4 declarative "
        "UDFs): the reference's is_rain v1/v2 and month-bucket shims as "
        "catalog functions that inline into codegen — zero Python, "
        "pushdown-safe",
        tags=("extension", "modern-sql", "udf"),
    )
)


# ---------------------------------------------------------------------------
# collation-aware grouping: UTF8_LCASE as an engine-level semantic
# ---------------------------------------------------------------------------


def _collated_group_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collations: group by a string column under the
    ``UTF8_LCASE`` collation, so differently-cased spellings collapse
    into one group *inside the engine* — unlike ``lower()``
    normalization, the data itself is untouched and every comparison
    operator (GROUP BY, joins, DISTINCT, ORDER BY) picks up the
    case-insensitive semantic from the type.

    The fixture's ``lang`` values are uniformly cased, so the query
    first synthesizes the mess a real multi-source corpus has —
    ``doc_id % 3`` routes each row through upper / initcap / raw — and
    the collated GROUP BY must fold the 15 spellings back to 5 groups
    (a failed collation would triple the row count and fail the row
    check, so the collapse itself is what the oracle verifies). The
    displayed key is lowercased because the engine is free to surface
    any representative of a collation-equal group.
    """
    docs = catalog.base(spark, sf_dir, "documents")
    mixed = (
        F.when(F.col("doc_id") % 3 == 0, F.upper("lang"))
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.upper(F.substring("lang", 1, 1)), F.substring("lang", 2, 100)
            ),
        )
        .otherwise(F.col("lang"))
    )
    d = docs.select(F.collate(mixed, "UTF8_LCASE").alias("k"))
    return (
        d.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            F.lower(F.col("k")).cast("string").alias("lang"),
            "n_docs",
        )
        .orderBy("lang")
    )


register(
    QuerySpec(
        "sql_collated_group_by",
        _collated_group_by,
        """
WITH m AS (
  SELECT CASE CAST(doc_id % 3 AS INTEGER)
           WHEN 0 THEN upper(lang)
           WHEN 1 THEN upper(substr(lang, 1, 1)) || substr(lang, 2)
           ELSE lang END AS k
  FROM documents
)
SELECT lower(k) AS lang, count(*) AS n_docs
FROM m
GROUP BY lower(k)
ORDER BY lang
""",
        doc="collation-aware GROUP BY (Spark 4 UTF8_LCASE): case-variant "
        "spellings collapse inside the engine with the data untouched; "
        "the oracle's lower()-normalized twin pins both the grouping "
        "and the counts",
        tags=("extension", "modern-sql", "collation"),
    )
)


# ---------------------------------------------------------------------------
# ANSI-mode error-safe functions (round 4)
# ---------------------------------------------------------------------------


def _ansi_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 runs ANSI mode by default — divide-by-zero and bad casts
    are ERRORS, not silent NULLs — and the ``try_*`` family is the
    explicit per-expression opt-out a 100 TB pipeline uses so one dirty
    row degrades to NULL instead of killing a 6-hour job. The probe
    exercises the two classic traps over the violations fact:
    ``try_divide`` (paid/fine ratio where fine_amount is 0 or NULL) and
    ``try_cast`` (alphanumeric violation codes to int), and aggregates
    how many rows each guard absorbed.

    Cost caveat, measured at sf0.1: inline ``try_cast`` (a ``TryEval``
    wrapper) evaluates ~18x slower than the equivalent guarded cast on
    the same scan (5.0 s vs 0.28 s — even when every input string is
    VALID, so it is the evaluation path, not exception cost).
    ``try_divide`` shows no such penalty inline. So the 100 TB pattern
    demonstrated here: evaluate the expensive try-expression once per
    DISTINCT code (a vocabulary-bounded table where slow eval is free)
    and broadcast it back over the fact — the fact-scan stage keeps
    its fast path (query warm time 4.8 s -> 0.8 s), and the semantics
    are genuine ``try_cast``, trim/overflow behavior included."""
    v = catalog.violations(spark, sf_dir)
    ratio = F.expr("try_divide(total_paid, fine_amount)")
    codes = (
        v.select("violation_code")
        .distinct()
        .select(
            "violation_code",
            F.expr("try_cast(violation_code AS int)").alias("code_num"),
        )
    )
    v = v.join(F.broadcast(codes), "violation_code", "left")
    code_num = F.col("code_num")
    return v.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(ratio.isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_ratio_null"),
        F.round(
            F.sum(ratio.cast("decimal(28,12)")).cast("double")
            / F.sum(F.when(ratio.isNotNull(), 1).otherwise(0)),
            6,
        ).alias("avg_paid_ratio_r6"),
        F.sum(F.when(code_num.isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_numeric_codes"),
    )


register(
    QuerySpec(
        "sql_ansi_try_functions",
        _ansi_try_functions,
        with_ref_views(
            """
, probe AS (
  SELECT CASE WHEN fine_amount IS NULL OR fine_amount = 0 THEN NULL
              ELSE total_paid / fine_amount END AS ratio,
         TRY_CAST(violation_code AS INTEGER) AS code_num
  FROM violations
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN ratio IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_ratio_null,
       round(CAST(sum(CAST(ratio AS DECIMAL(28,12))) AS DOUBLE)
             / sum(CASE WHEN ratio IS NOT NULL THEN 1 ELSE 0 END), 6)
         AS avg_paid_ratio_r6,
       CAST(sum(CASE WHEN code_num IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_numeric_codes
FROM probe
"""
        ),
        doc="ANSI-mode error-safe surface: try_divide over zero/NULL "
        "fines and try_cast over alphanumeric codes, with counts of "
        "rows each guard absorbed — the per-expression opt-out that "
        "keeps one dirty row from killing a 6-hour ANSI job",
        tags=("extension", "modern-sql", "ansi"),
    )
)
