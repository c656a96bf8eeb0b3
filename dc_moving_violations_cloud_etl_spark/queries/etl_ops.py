"""ETL operator layer as oracle-checked queries (SURVEY.md §2.B/C/J).

Each entry exercises a real engine operator (transform pipeline, sink
merge, watermark incremental) deterministically so the driver's DuckDB
differential gate covers the ETL semantics, not just the analytics:

- etl_violations_transform / etl_weather_transform — the full C1–C11
  transform pipelines echoed row-for-row (13/9 columns).
- sink_insert_ignore — B3 first-writer-wins merge: overlapping batch
  with poisoned values must NOT replace existing rows.
- sink_upsert_lww — B1/B2/B4 last-writer-wins merge: overlapping batch
  MUST replace existing rows.
- sink_dedupe_by_key — intra-batch PK dedup with a deterministic
  representative.
- watermark_incremental — J1–J3+J5: watermark read → bounded scan →
  idempotent merge, with a pinned "today".

Temporal split literals put the overlap mid-range (fixture dates span
1995..2001).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..expressions import exact_decimal_sum
from ..operators.incremental import incremental_merge
from ..operators.sinks import dedupe_by_key, insert_if_absent, upsert_last_writer_wins
from ..oracle import with_ref_views
from .registry import QuerySpec, register

EXISTING_BEFORE = "1999-01-01"  # existing table = violations before this
OVERLAP_START = "1998-06-01"  # incoming batch overlaps existing here
INCOMING_END = "1999-07-01"
WM_EXISTING_THROUGH = "1999-12-31"  # watermark scenario: existing through
WM_TODAY = dt.date(2000, 4, 1)  # pinned "today" → ingest through 03-31
COLD_START = dt.date(1995, 1, 1)


def _fmt_ts(c: str) -> F.Column:
    return F.date_format(F.col(c), "yyyy-MM-dd HH:mm:ss").alias(c)


def _fmt_d(c: str) -> F.Column:
    return F.date_format(F.col(c), "yyyy-MM-dd").alias(c)


def _etl_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = catalog.violations(spark, sf_dir)
    return v.select(
        "violation_id",
        _fmt_ts("issue_date"),
        _fmt_d("violation_date"),
        "issuing_agency_name",
        "accident_indicator",
        "location",
        "violation_code",
        "violation_desc",
        "fine_amount",
        "total_paid",
        "latitude",
        "longitude",
        "month",
    )


register(
    QuerySpec(
        "etl_violations_transform",
        _etl_violations,
        with_ref_views(
            """
SELECT violation_id,
       strftime(issue_date, '%Y-%m-%d %H:%M:%S') AS issue_date,
       strftime(violation_date, '%Y-%m-%d') AS violation_date,
       issuing_agency_name, accident_indicator, location, violation_code,
       violation_desc, fine_amount, total_paid, latitude, longitude, month
FROM violations
"""
        ),
        doc="C1-C6: full 13-column violations transform echoed row-for-row "
        "(reference transform_row, violation_etl_daily.py:227-278)",
        tags=("etl", "transform"),
    )
)


def _etl_violations_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE-PATH transform verification: per-month exact aggregates
    covering all 13 transform columns. The row-for-row echo above is the
    strongest check at sf0.01, but its cost is driver-side result
    materialization — at 100 TB nobody ships the table to the driver; a
    transform is verified by checksumming it in-engine (84 output rows
    regardless of input scale, all aggregation map-side partial). This is
    the variant ``bench.py`` times."""
    v = catalog.violations(spark, sf_dir)
    epoch_day = F.lit("1970-01-01").cast("date")
    # the PK-uniqueness count runs as its own narrow aggregation: mixing
    # countDistinct with 19 other aggregates makes Spark group the
    # partial stage by (month, violation_id) and drag every agg buffer
    # through 600k groups; standalone it shuffles two columns. The join
    # back is 84 rows → broadcast.
    distinct_ids = v.groupBy("month").agg(
        F.countDistinct("violation_id").alias("n_ids")
    )
    return (
        v.groupBy("month")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("violation_id").alias("min_id"),
            F.max("violation_id").alias("max_id"),
            F.sum(F.unix_timestamp("issue_date")).alias("issue_epoch_sum"),
            F.sum(F.datediff(F.col("violation_date"), epoch_day)).alias(
                "vdate_day_sum"
            ),
            # one exact DISTINCT only (the PK-uniqueness check): a second
            # distinct column set would make Spark plan an Expand — a 5×
            # row multiplication of the fact shuffled per distinct group.
            # The other string columns are covered value-wise by min/max +
            # length sums, which stay in the single hash aggregate.
            F.min("issuing_agency_name").alias("min_agency"),
            F.max("issuing_agency_name").alias("max_agency"),
            F.sum(F.length("issuing_agency_name")).alias("agency_len_sum"),
            F.sum(
                F.when(F.col("accident_indicator") == "Y", 1).otherwise(0)
            ).alias("n_accident_y"),
            F.sum(
                F.when(F.col("accident_indicator").isNull(), 1).otherwise(0)
            ).alias("n_accident_null"),
            F.min("location").alias("min_location"),
            F.max("location").alias("max_location"),
            F.sum(F.length("location")).alias("loc_len_sum"),
            F.min("violation_code").alias("min_code"),
            F.max("violation_code").alias("max_code"),
            F.sum(F.length("violation_code")).alias("code_len_sum"),
            F.sum(F.length("violation_desc")).alias("desc_len_sum"),
            exact_decimal_sum(F.col("fine_amount")).alias("fine_sum"),
            # total_paid carries 4 decimal digits (scale-2 × scale-2
            # decimal product): summing at scale 4 is tie-free; a scale-2
            # cast would hit .xx5 midpoints that Spark (shortest-repr
            # HALF_UP) and DuckDB (binary-value rounding) resolve
            # differently
            exact_decimal_sum(F.col("total_paid"), scale=4).alias("paid_sum"),
            exact_decimal_sum(F.col("latitude")).alias("lat_sum"),
            exact_decimal_sum(F.col("longitude")).alias("lon_sum"),
        )
        .join(F.broadcast(distinct_ids), "month")
        .orderBy("month")
    )


register(
    QuerySpec(
        "etl_violations_checksum",
        _etl_violations_checksum,
        with_ref_views(
            """
SELECT month,
       count(*) AS n_rows,
       count(DISTINCT violation_id) AS n_ids,
       min(violation_id) AS min_id,
       max(violation_id) AS max_id,
       CAST(sum(CAST(epoch(issue_date) AS BIGINT)) AS BIGINT) AS issue_epoch_sum,
       CAST(sum(date_diff('day', DATE '1970-01-01', violation_date)) AS BIGINT)
         AS vdate_day_sum,
       min(issuing_agency_name) AS min_agency,
       max(issuing_agency_name) AS max_agency,
       CAST(sum(length(issuing_agency_name)) AS BIGINT) AS agency_len_sum,
       CAST(sum(CASE WHEN accident_indicator = 'Y' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_accident_y,
       CAST(sum(CASE WHEN accident_indicator IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_accident_null,
       min(location) AS min_location,
       max(location) AS max_location,
       CAST(sum(length(location)) AS BIGINT) AS loc_len_sum,
       min(violation_code) AS min_code,
       max(violation_code) AS max_code,
       CAST(sum(length(violation_code)) AS BIGINT) AS code_len_sum,
       CAST(sum(length(violation_desc)) AS BIGINT) AS desc_len_sum,
       CAST(sum(CAST(fine_amount AS DECIMAL(18,2))) AS DOUBLE) AS fine_sum,
       CAST(sum(CAST(total_paid AS DECIMAL(18,4))) AS DOUBLE) AS paid_sum,
       CAST(sum(CAST(latitude AS DECIMAL(18,2))) AS DOUBLE) AS lat_sum,
       CAST(sum(CAST(longitude AS DECIMAL(18,2))) AS DOUBLE) AS lon_sum
FROM violations
GROUP BY month ORDER BY month
"""
        ),
        doc="C1-C6 scale-path verification: per-month exact aggregate "
        "checksums over all 13 transform columns (constant-size output; "
        "how a 100 TB transform is actually verified)",
        tags=("etl", "transform", "bench"),
    )
)


def _etl_weather(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = catalog.weather_daily(spark, sf_dir)
    return w.select(
        _fmt_d("weather_date"),
        "tempmax",
        "tempmin",
        "temp",
        "precip",
        "humidity",
        "windspeed",
        "conditions",
        "is_rain",
    )


register(
    QuerySpec(
        "etl_weather_transform",
        _etl_weather,
        with_ref_views(
            """
SELECT strftime(weather_date, '%Y-%m-%d') AS weather_date,
       tempmax, tempmin, temp, precip, humidity, windspeed, conditions, is_rain
FROM weather_daily
"""
        ),
        doc="C7-C11: full 9-column weather transform echoed row-for-row "
        "(reference transform_weather_row, weather_etl_daily.py:118-172)",
        tags=("etl", "transform"),
    )
)


def _summarize(df: DataFrame) -> DataFrame:
    """Stable per-month summary of a merged violations set: row count +
    exact fine sum reveal both cardinality and which row version won."""
    return (
        df.groupBy("month")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            exact_decimal_sum(F.col("fine_amount")).alias("fine_sum"),
        )
        .orderBy("month")
    )


_SUMMARIZE_SQL = """
SELECT month, count(*) AS n_rows,
       CAST(sum(CAST(fine_amount AS DECIMAL(18,2))) AS DOUBLE) AS fine_sum
FROM merged GROUP BY month ORDER BY month
"""


def _split(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    v = catalog.violations(spark, sf_dir)
    existing = v.where(F.col("violation_date") < EXISTING_BEFORE)
    # overlapping incoming batch with poisoned fine_amount: whichever merge
    # policy wins is visible in fine_sum
    incoming = v.where(
        (F.col("violation_date") >= OVERLAP_START)
        & (F.col("violation_date") < INCOMING_END)
    ).withColumn("fine_amount", F.lit(-1.0))
    return existing, incoming


_SPLIT_SQL = f"""
existing AS (
  SELECT * FROM violations WHERE violation_date < DATE '{EXISTING_BEFORE}'
),
incoming AS (
  SELECT * REPLACE (-1.0 AS fine_amount) FROM violations
  WHERE violation_date >= DATE '{OVERLAP_START}'
    AND violation_date < DATE '{INCOMING_END}'
)
"""


def _sink_insert_ignore(spark: SparkSession, sf_dir: str) -> DataFrame:
    existing, incoming = _split(spark, sf_dir)
    return _summarize(insert_if_absent(existing, incoming, ["violation_id"]))


register(
    QuerySpec(
        "sink_insert_ignore",
        _sink_insert_ignore,
        with_ref_views(
            f""",
{_SPLIT_SQL.strip().lstrip(',')},
merged AS (
  SELECT * FROM existing
  UNION ALL
  SELECT i.* FROM incoming i
  WHERE NOT EXISTS (
    SELECT 1 FROM existing e WHERE e.violation_id = i.violation_id)
)
{_SUMMARIZE_SQL}
"""
        ),
        doc="B3 INSERT IGNORE: first-writer-wins left-anti merge; existing "
        "rows keep original fines (reference violation_etl_daily.py:281-311)",
        tags=("etl", "sink"),
    )
)


def _sink_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    existing, incoming = _split(spark, sf_dir)
    return _summarize(upsert_last_writer_wins(existing, incoming, ["violation_id"]))


register(
    QuerySpec(
        "sink_upsert_lww",
        _sink_upsert,
        with_ref_views(
            f""",
{_SPLIT_SQL.strip().lstrip(',')},
merged AS (
  SELECT * EXCLUDE (_src_priority) FROM (
    SELECT * FROM (
      SELECT *, 1 AS _src_priority FROM existing
      UNION ALL
      SELECT *, 2 AS _src_priority FROM incoming
    ) QUALIFY row_number() OVER (
        PARTITION BY violation_id ORDER BY _src_priority DESC) = 1
  )
)
{_SUMMARIZE_SQL}
"""
        ),
        doc="B1/B2/B4 ON DUPLICATE KEY UPDATE: last-writer-wins window merge; "
        "overlap rows take incoming fines (reference violation_etl_history.py:127-154)",
        tags=("etl", "sink"),
    )
)


def _sink_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = catalog.violations(spark, sf_dir)
    # duplicate every key with a poisoned copy; the deterministic
    # representative is the min over the non-key columns in schema order
    dup_batch = v.unionByName(v.withColumn("fine_amount", F.lit(-1.0)))
    deduped = dedupe_by_key(dup_batch, ["violation_id"])
    return deduped.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("violation_id").alias("n_keys"),
        exact_decimal_sum(F.col("fine_amount")).alias("fine_sum"),
    )


register(
    QuerySpec(
        "sink_dedupe_by_key",
        _sink_dedupe,
        with_ref_views(
            """,
dup_batch AS (
  SELECT * FROM violations
  UNION ALL
  SELECT * REPLACE (-1.0 AS fine_amount) FROM violations
),
deduped AS (
  SELECT * FROM dup_batch
  QUALIFY row_number() OVER (
    PARTITION BY violation_id
    ORDER BY issue_date ASC NULLS FIRST, violation_date ASC NULLS FIRST,
             issuing_agency_name ASC NULLS FIRST,
             accident_indicator ASC NULLS FIRST, location ASC NULLS FIRST,
             violation_code ASC NULLS FIRST, violation_desc ASC NULLS FIRST,
             fine_amount ASC NULLS FIRST, total_paid ASC NULLS FIRST,
             latitude ASC NULLS FIRST, longitude ASC NULLS FIRST,
             month ASC NULLS FIRST) = 1
)
SELECT count(*) AS n_rows,
       count(DISTINCT violation_id) AS n_keys,
       CAST(sum(CAST(fine_amount AS DECIMAL(18,2))) AS DOUBLE) AS fine_sum
FROM deduped
"""
        ),
        doc="Intra-batch PK dedup with deterministic representative "
        "(engine analog of relying on MySQL PK, SURVEY.md §1.3)",
        tags=("etl", "sink"),
    )
)


def _watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = catalog.violations(spark, sf_dir)
    existing = v.where(F.col("violation_date") <= WM_EXISTING_THROUGH)
    merged = incremental_merge(
        existing,
        v,
        date_col="violation_date",
        key_cols=["violation_id"],
        cold_start_default=COLD_START,
        today=WM_TODAY,
    )
    return merged.agg(
        F.count(F.lit(1)).alias("merged_count"),
        F.date_format(F.min("violation_date"), "yyyy-MM-dd").alias("min_date"),
        F.date_format(F.max("violation_date"), "yyyy-MM-dd").alias("max_date"),
    )


register(
    QuerySpec(
        "watermark_incremental",
        _watermark,
        with_ref_views(
            f""",
existing AS (
  SELECT * FROM violations WHERE violation_date <= DATE '{WM_EXISTING_THROUGH}'
),
fresh AS (
  SELECT v.* FROM violations v
  WHERE v.violation_date > (SELECT max(violation_date) FROM existing)
    AND v.violation_date <= DATE '{WM_TODAY - dt.timedelta(days=1)}'
    AND NOT EXISTS (
      SELECT 1 FROM existing e WHERE e.violation_id = v.violation_id)
),
merged AS (
  SELECT * FROM existing UNION ALL SELECT * FROM fresh
)
SELECT count(*) AS merged_count,
       strftime(min(violation_date), '%Y-%m-%d') AS min_date,
       strftime(max(violation_date), '%Y-%m-%d') AS max_date
FROM merged
"""
        ),
        doc="J1-J3+J5 watermark incremental: max(date) watermark, bounded "
        "scan through pinned yesterday, idempotent insert-if-absent merge "
        "(reference violation_etl_daily.py:120-146,318-365)",
        tags=("etl", "incremental"),
    )
)


def _weather_sentinel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9: the missing-API-day null-sentinel — date spine LEFT JOIN the
    dimension; unmatched days (day 31: the events profile spans days
    1..30) become all-NULL rows tagged 'missing_from_api', is_rain=0
    (reference weather_etl_daily.py:133-146)."""
    w = catalog.weather_daily(spark, sf_dir)
    spine = (
        catalog.base(spark, sf_dir, "lineitem")
        .select(F.to_date("l_shipdate").alias("weather_date"))
        .distinct()
    )
    return (
        spine.join(F.broadcast(w), "weather_date", "left")
        .select(
            F.date_format("weather_date", "yyyy-MM-dd").alias("weather_date"),
            F.coalesce("conditions", F.lit("missing_from_api")).alias("conditions"),
            F.coalesce("is_rain", F.lit(0)).alias("is_rain"),
            "tempmax",
            "precip",
        )
        .orderBy("weather_date")
    )


register(
    QuerySpec(
        "etl_weather_missing_sentinel",
        _weather_sentinel,
        with_ref_views(
            """,
spine AS (
  SELECT DISTINCT CAST(l_shipdate AS DATE) AS weather_date FROM lineitem
)
SELECT strftime(s.weather_date, '%Y-%m-%d') AS weather_date,
       coalesce(w.conditions, 'missing_from_api') AS conditions,
       coalesce(w.is_rain, 0) AS is_rain,
       w.tempmax, w.precip
FROM spine s LEFT JOIN weather_daily w ON s.weather_date = w.weather_date
ORDER BY 1
"""
        ),
        doc="C9 missing-day null-sentinel: date-spine left join + coalesce "
        "defaults (reference weather_etl_daily.py:133-146)",
        tags=("etl", "transform", "outer-join"),
    )
)


def _date_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I1: the 15-day date-range chunker — reference
    ``create_date_ranges`` (weather_etl_history.py:54-61) as a generator
    expression: sequence → explode → bucket by floor(datediff/15). The
    driver-side while-loop becomes a distributed date spine."""
    li = catalog.base(spark, sf_dir, "lineitem")
    rng = li.agg(
        F.min(F.to_date("l_shipdate")).alias("d0"),
        F.max(F.to_date("l_shipdate")).alias("d1"),
    )
    days = rng.select("d0", F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("d"))
    return (
        days.select(F.expr("datediff(d, d0) div 15").alias("chunk_id"), "d")
        .groupBy("chunk_id")
        .agg(
            F.date_format(F.min("d"), "yyyy-MM-dd").alias("chunk_start"),
            F.date_format(F.max("d"), "yyyy-MM-dd").alias("chunk_end"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .orderBy("chunk_id")
    )


register(
    QuerySpec(
        "gen_date_chunks",
        _date_chunks,
        """
WITH rng AS (
  SELECT min(CAST(l_shipdate AS DATE)) AS d0,
         max(CAST(l_shipdate AS DATE)) AS d1
  FROM lineitem
),
days AS (
  SELECT d0, unnest(generate_series(0, date_diff('day', d0, d1))) AS k FROM rng
)
SELECT CAST(k // 15 AS BIGINT) AS chunk_id,
       strftime(min(d0 + k * INTERVAL 1 DAY), '%Y-%m-%d') AS chunk_start,
       strftime(max(d0 + k * INTERVAL 1 DAY), '%Y-%m-%d') AS chunk_end,
       count(*) AS n_days
FROM days GROUP BY 1 ORDER BY 1
""",
        doc="I1/I2 date-range chunker: sequence+explode date spine bucketed "
        "into 15-day windows (reference create_date_ranges, "
        "weather_etl_history.py:54-61)",
        tags=("etl", "generator"),
    )
)


def _is_rain_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §1.4.2 divergence, oracle-exercised: the reference ships
    TWO is_rain rules — v1 ``precip > 0`` (full load,
    reference etl/full_load/weather_etl_history.py:85) and v2
    ``precip > 0 OR 'rain' in conditions`` (daily load, canonical,
    reference etl/daily_load/weather_etl_daily.py:158-160). The
    dimension stores v2; this query recomputes v1 per day and reports
    per-month day counts where the two rules disagree (all-integer →
    hash-exact)."""
    from ..expressions import is_rain_v1

    w = catalog.weather_daily(spark, sf_dir)
    v1 = is_rain_v1(F.col("precip"))
    return (
        w.select(
            F.date_format("weather_date", "yyyy-MM").alias("ym"),
            v1.alias("v1"),
            F.col("is_rain").alias("v2"),
        )
        .groupBy("ym")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("v1").cast("long").alias("rainy_days_v1"),
            F.sum("v2").cast("long").alias("rainy_days_v2"),
            F.sum(F.when(F.col("v1") != F.col("v2"), 1).otherwise(0))
            .cast("long")
            .alias("disagree_days"),
        )
        .orderBy("ym")
    )


register(
    QuerySpec(
        "weather_is_rain_variants",
        _is_rain_variants,
        with_ref_views(
            """
SELECT strftime(weather_date, '%Y-%m') AS ym,
       count(*) AS n_days,
       CAST(sum(CASE WHEN coalesce(precip, 0.0) > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS rainy_days_v1,
       CAST(sum(is_rain) AS BIGINT) AS rainy_days_v2,
       CAST(sum(CASE WHEN (CASE WHEN coalesce(precip, 0.0) > 0
                           THEN 1 ELSE 0 END) <> is_rain
                     THEN 1 ELSE 0 END) AS BIGINT) AS disagree_days
FROM weather_daily
GROUP BY strftime(weather_date, '%Y-%m')
ORDER BY ym
"""
        ),
        doc="C7 vs C8: per-month disagreement between the reference's two "
        "is_rain rules (v1 full-load weather_etl_history.py:85; v2 daily-"
        "load weather_etl_daily.py:158-160 — the canonical rule the "
        "dimension stores)",
        tags=("etl", "divergence"),
    )
)


PAGE_SIZE = 5000


def _page_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/I3 demonstrator: server row count → parallel page-fetch plan
    (reference violation_etl_history.py:90-103 count-then-page loop).
    The count is the one legitimate driver-side scalar (mirrors the
    reference's returnCountOnly request); the plan itself is a
    distributed range projection."""
    from ..sources.json_api import plan_pages

    total = catalog.base(spark, sf_dir, "lineitem").count()
    return plan_pages(spark, total, PAGE_SIZE).orderBy("page_index")


register(
    QuerySpec(
        "gen_page_plan",
        _page_plan,
        with_ref_views(
            f""",
t AS (SELECT count(*) AS n FROM lineitem)
SELECT CAST(r.range AS BIGINT) AS page_index,
       CAST(r.range * {PAGE_SIZE} AS BIGINT) AS result_offset,
       CAST(least(t.n - r.range * {PAGE_SIZE}, {PAGE_SIZE}) AS BIGINT)
         AS result_record_count
FROM t, range(1000000) r
WHERE r.range * {PAGE_SIZE} < t.n
ORDER BY page_index
"""
        ),
        doc="A1/I3 count-then-page planning: row count -> one page-window "
        "row per fetch task, partition-parallel (reference "
        "violation_etl_history.py:90-103)",
        tags=("source", "pagination"),
    )
)


def _salted_join_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted fact⋈dim join (operators/skew.salted_join): result is
    identical to the plain equi-join — the oracle IS the plain join —
    while the shuffle spreads each hot key over 8 salt partitions
    (manual fallback for skew AQE can't fix; salt is a pure row hash,
    deterministic under task retry)."""
    from ..operators.skew import salted_join

    li = catalog.base(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    orders = catalog.base(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    return (
        salted_join(li, orders, "l_orderkey", salt_col="l_linenumber", salt=8)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("qty_sum"),
        )
        .orderBy("o_orderpriority")
    )


register(
    QuerySpec(
        "salted_join_summary",
        _salted_join_summary,
        """
SELECT o.o_orderpriority,
       count(*) AS n_rows,
       CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_sum
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
""",
        doc="Skew-salted join (8-way deterministic salt on the fact, "
        "dimension replicated per salt) whose result equals the plain "
        "equi-join — the explicit skew fallback beside session AQE",
        tags=("etl", "join", "skew"),
    )
)


# ---------------------------------------------------------------------------
# sink-semantics table diff (round 3)
# ---------------------------------------------------------------------------


def _sink_semantics_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-reconciliation operator: key-aligned DIFF of the two merge
    policies' outputs on the SAME overlapping batches — exactly the
    audit a migration off the reference would run to quantify where
    first-writer-wins (INSERT IGNORE) and last-writer-wins (ON
    DUPLICATE KEY UPDATE) disagree. One equi-join on the PK over the
    two merged sets; the changed-row count equals the overlap
    cardinality by construction."""
    existing, incoming = _split(spark, sf_dir)
    fww = insert_if_absent(existing, incoming, ["violation_id"]).select(
        "violation_id", F.col("fine_amount").alias("fww_fine")
    )
    lww = upsert_last_writer_wins(
        existing, incoming, ["violation_id"]
    ).select("violation_id", F.col("fine_amount").alias("lww_fine"))
    j = fww.join(lww, "violation_id", "full_outer")
    changed = ~(
        F.col("fww_fine").eqNullSafe(F.col("lww_fine"))
    )
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum(changed.cast("long")).cast("long").alias("n_changed"),
        exact_decimal_sum(F.col("fww_fine")).alias("fww_fine_sum"),
        exact_decimal_sum(F.col("lww_fine")).alias("lww_fine_sum"),
    )


register(
    QuerySpec(
        "sink_semantics_diff",
        _sink_semantics_diff,
        with_ref_views(
            f""",
{_SPLIT_SQL.strip().lstrip(',')},
fww AS (
  SELECT violation_id, fine_amount AS fww_fine FROM (
    SELECT * FROM existing
    UNION ALL
    SELECT i.* FROM incoming i
    WHERE NOT EXISTS (
      SELECT 1 FROM existing e WHERE e.violation_id = i.violation_id)
  )
),
lww AS (
  SELECT violation_id, fine_amount AS lww_fine FROM (
    SELECT * EXCLUDE (_src_priority) FROM (
      SELECT * FROM (
        SELECT *, 1 AS _src_priority FROM existing
        UNION ALL
        SELECT *, 2 AS _src_priority FROM incoming
      ) QUALIFY row_number() OVER (
          PARTITION BY violation_id ORDER BY _src_priority DESC) = 1
    )
  )
)
SELECT CAST(count(*) AS BIGINT) AS n_keys,
       CAST(count(*) FILTER (
         WHERE fww_fine IS DISTINCT FROM lww_fine) AS BIGINT) AS n_changed,
       CAST(sum(CAST(fww_fine AS DECIMAL(18,2))) AS DOUBLE) AS fww_fine_sum,
       CAST(sum(CAST(lww_fine AS DECIMAL(18,2))) AS DOUBLE) AS lww_fine_sum
FROM fww FULL OUTER JOIN lww USING (violation_id)
"""
        ),
        doc="sink-semantics reconciliation: key-aligned full-outer diff "
        "of first-writer-wins vs last-writer-wins merges on identical "
        "overlapping batches (null-safe change detection, exact decimal "
        "sums)",
        tags=("etl", "sink", "reconciliation"),
    )
)
