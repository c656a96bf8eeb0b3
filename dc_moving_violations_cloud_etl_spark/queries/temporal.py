"""Temporal-operator queries: as-of join, bounded range join, and the
multi-granularity time rollup ladder — the time-series operations Spark
has no built-in for, composed from DataFrame primitives
(operators/temporal.py) and oracle-checked. The as-of oracle uses
DuckDB's NATIVE ``ASOF JOIN``, cross-validating our union-and-carry
implementation against an independent engine's built-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..operators.temporal import asof_join, gapfill_linear, range_join_pairs
from .registry import QuerySpec, register


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return catalog.base(spark, sf_dir, "events")


# ---------------------------------------------------------------------------
# as-of join: latest click at-or-before each error, per user
# ---------------------------------------------------------------------------


def _asof_click_before_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    errors = ev.where(F.col("event_type") == "error")
    clicks = ev.where(F.col("event_type") == "click")
    joined = asof_join(
        errors,
        clicks,
        key="user_id",
        ts="ts",
        payload=["ts"],
        tiebreak="event_id",
    )
    gap = F.unix_timestamp("ts") - F.unix_timestamp("_asof.ts")
    return (
        joined.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_errors"),
            F.count("_asof.ts").cast("long").alias("n_with_prior_click"),
            F.max(gap).cast("long").alias("max_gap_s"),
        )
        .orderBy("user_id")
    )


register(
    QuerySpec(
        "asof_click_before_error",
        _asof_click_before_error,
        """
WITH errors AS (SELECT * FROM events WHERE event_type = 'error'),
clicks AS (SELECT * FROM events WHERE event_type = 'click')
SELECT e.user_id,
       count(*) AS n_errors,
       CAST(count(c.ts) AS BIGINT) AS n_with_prior_click,
       CAST(max(CAST(floor(epoch(e.ts)) AS BIGINT)
                - CAST(floor(epoch(c.ts)) AS BIGINT)) AS BIGINT) AS max_gap_s
FROM errors e
ASOF LEFT JOIN clicks c ON e.user_id = c.user_id AND e.ts >= c.ts
GROUP BY e.user_id ORDER BY e.user_id
""",
        doc="AS-OF JOIN (latest click at-or-before each error, per user) "
        "via the union-and-carry window — one shuffle over |L|+|R|; "
        "oracle is DuckDB's native ASOF JOIN (independent-engine "
        "cross-validation)",
        tags=("extension", "temporal", "asof-join"),
    )
)


# ---------------------------------------------------------------------------
# bounded range join: clicks 1..300 s before an error, per user
# ---------------------------------------------------------------------------

RANGE_LOWER_S = 1
RANGE_UPPER_S = 300


def _range_click_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    errors = ev.where(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("event_id").alias("error_id")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    pairs = range_join_pairs(
        errors,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        lower_s=RANGE_LOWER_S,
        upper_s=RANGE_UPPER_S,
        left_cols=["error_id"],
        right_cols=["click_id"],
    )
    return (
        pairs.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("error_id").cast("long").alias("n_errors_matched"),
        )
        .orderBy("user_id")
    )


register(
    QuerySpec(
        "range_click_before_error",
        _range_click_error,
        f"""
WITH errors AS (
  SELECT user_id, ts, event_id AS error_id FROM events
  WHERE event_type = 'error'
),
clicks AS (
  SELECT user_id, ts, event_id AS click_id FROM events
  WHERE event_type = 'click'
)
SELECT e.user_id,
       count(*) AS n_pairs,
       CAST(count(DISTINCT e.error_id) AS BIGINT) AS n_errors_matched
FROM errors e JOIN clicks c
  ON e.user_id = c.user_id
 AND CAST(floor(epoch(e.ts)) AS BIGINT) - CAST(floor(epoch(c.ts)) AS BIGINT)
     BETWEEN {RANGE_LOWER_S} AND {RANGE_UPPER_S}
GROUP BY e.user_id ORDER BY e.user_id
""",
        doc="Bounded RANGE join (clicks 1-300 s before an error) via "
        "time-bucketed equi-join: <=3 candidate buckets per left row, "
        "linear in input — never the per-key cross product a raw "
        "inequality join plans",
        tags=("extension", "temporal", "range-join"),
    )
)


# ---------------------------------------------------------------------------
# hypertable-style rollup ladder: (day, hour) -> (day) -> total
# ---------------------------------------------------------------------------


def _time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate ladder over the event stream: ROLLUP
    (day, hour) emits hourly, daily, and grand-total rows from ONE
    pass (partial aggregation per grain, no re-scan per level) —
    the hypertable materialized-rollup shape."""
    ev = _events(spark, sf_dir)
    day = F.date_format("ts", "yyyy-MM-dd")
    hour = F.hour("ts").cast("long")
    return (
        ev.select(day.alias("day"), hour.alias("hour"), "value")
        .rollup("day", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.coalesce("day", F.lit("ALL")).alias("day"),
            F.coalesce("hour", F.lit(-1)).cast("long").alias("hour"),
            "n_events",
            "total_value",
        )
        .orderBy("day", "hour")
    )


register(
    QuerySpec(
        "events_time_rollup",
        _time_rollup,
        """
SELECT coalesce(strftime(date_trunc('day', ts), '%Y-%m-%d'), 'ALL') AS day,
       CAST(coalesce(hour(ts), -1) AS BIGINT) AS hour,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY ROLLUP (date_trunc('day', ts), hour(ts))
ORDER BY day, hour
""",
        doc="Hypertable-style rollup ladder: hourly/daily/total grains "
        "from one ROLLUP pass with decimal-exact value sums",
        tags=("extension", "temporal", "rollup"),
    )
)


# ---------------------------------------------------------------------------
# trailing 7-day rolling window per user (RANGE frame)
# ---------------------------------------------------------------------------


def _user_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing-7-day activity features (the sliding-window
    aggregate behind rate limits, engagement scores, and per-entity
    training features): events pre-aggregated to (user, day), then a
    RANGE frame over day number sums the trailing week — the frame is
    value-based, so gap days neither break nor pad the window.

    Scale: the pre-aggregation shrinks the window input from events to
    user x active-day rows BEFORE any sort, and the window partitions
    by user — per-partition state is one user's days, never the table.
    Decimal-routed value sums keep the double output order-independent.
    """
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    daily = (
        ev.select(
            "user_id",
            F.date_trunc("day", "ts").cast("date").alias("day"),
            "value",
        )
        .groupBy("user_id", "day")
        .agg(
            F.count(F.lit(1)).alias("n_day"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("v_day"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_date(F.col("day")))
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n_day").cast("long").alias("n_day"),
        F.sum("n_day").over(w).cast("long").alias("n_7d"),
        F.sum("v_day").over(w).cast("double").alias("value_7d"),
    ).orderBy("user_id", "day")


register(
    QuerySpec(
        "events_user_rolling_7d",
        _user_rolling_7d,
        """
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         count(*) AS n_day,
         sum(CAST(value AS DECIMAL(18,2))) AS v_day
  FROM events GROUP BY 1, 2
)
SELECT user_id,
       strftime(day, '%Y-%m-%d') AS day,
       CAST(n_day AS BIGINT) AS n_day,
       CAST(sum(n_day) OVER w AS BIGINT) AS n_7d,
       CAST(sum(v_day) OVER w AS DOUBLE) AS value_7d
FROM daily
WINDOW w AS (PARTITION BY user_id ORDER BY day
             RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
ORDER BY user_id, day
""",
        doc="Trailing 7-day rolling count/sum per user via a value-based "
        "RANGE frame over pre-aggregated user-days (window input shrunk "
        "before the sort; partitioned by user so state stays bounded)",
        tags=("extension", "temporal", "window"),
    )
)


# ---------------------------------------------------------------------------
# daily event-type pivot (explicit value list — no discovery pass)
# ---------------------------------------------------------------------------

_PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _pivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide daily activity matrix: one row per day, one count column per
    event type. The pivot values are EXPLICIT — with an unspecified
    list, Spark first runs a distinct scan to discover them (an extra
    full pass at 100 TB) and the output schema becomes data-dependent;
    pinning the list keeps the plan a single pass and the schema stable.
    """
    ev = _events(spark, sf_dir)
    piv = (
        ev.select(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"), "event_type")
        .groupBy("day")
        .pivot("event_type", _PIVOT_TYPES)
        .count()
        .na.fill(0, [t for t in _PIVOT_TYPES])
    )
    renamed = piv.select(
        "day", *[F.col(t).cast("long").alias(f"n_{t}") for t in _PIVOT_TYPES]
    )
    return renamed.orderBy("day")


register(
    QuerySpec(
        "events_pivot_daily",
        _pivot_daily,
        """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events GROUP BY 1 ORDER BY 1
""",
        doc="Daily x event-type pivot with an explicit value list (single "
        "pass, stable schema — no distinct-discovery scan); nulls filled "
        "to 0 so absent types are exact zero counts",
        tags=("extension", "temporal", "pivot"),
    )
)


# ---------------------------------------------------------------------------
# gap-fill + linear interpolation over a daily series
# ---------------------------------------------------------------------------


def _gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill with linear interpolation — the time-series
    repair step every sensor/metrics pipeline needs (TimescaleDB's
    ``time_bucket_gapfill`` + ``interpolate``, re-expressed in Spark
    primitives). A deterministic 'outage' drops every day-of-month
    divisible by 5 from the observed daily revenue series, then:

    1. a date spine ``sequence(min_day, max_day)`` (explode) restores
       the missing calendar rows;
    2. LOCF windows (``last``/``first`` with ignoreNulls over unbounded
       preceding/following) attach the nearest observation on each side;
    3. the fill is the linear interpolation between them, falling back
       to nearest-edge carry at the series boundaries.

    Scale shape: the spine is two scalar aggregates + a generator (no
    driver loop); both windows and the join are one partition-less pass
    over ~|days| rows, NOT the fact table — the fact table is touched
    once by the pre-aggregate. Daily totals route through DECIMAL so
    the observed values are bit-identical on both engines; the lerp
    itself is the same IEEE expression order, rounded to 6 digits."""
    ev = catalog.base(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("v")
        )
    )
    # null out the outage days IN PLACE (rather than filtering rows) so
    # the spine still spans the full series — a dropped boundary day
    # stays in range and is reported 'edge-carried'
    observed = daily.withColumn(
        "v", F.when(F.dayofmonth("day") % 5 != 0, F.col("v"))
    )
    g = gapfill_linear(observed, day="day", value="v")
    return (
        g.select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("v").isNotNull().cast("int").alias("is_observed"),
            F.round("value_filled", 6).alias("value_filled"),
            "fill_kind",
        )
        .orderBy("day")
    )


register(
    QuerySpec(
        "timeseries_gapfill_interpolate",
        _gapfill_interpolate,
        """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
  FROM events GROUP BY d
),
observed AS (SELECT * FROM daily WHERE day(d) % 5 <> 0),
spine AS (
  SELECT unnest(generate_series((SELECT min(d) FROM daily),
                                (SELECT max(d) FROM daily),
                                INTERVAL 1 DAY))::DATE AS d
),
g AS (
  SELECT s.d, o.v,
         last_value(o.v IGNORE NULLS) OVER
           (ORDER BY s.d ROWS UNBOUNDED PRECEDING) AS prev_v,
         last_value(CASE WHEN o.v IS NOT NULL THEN s.d END IGNORE NULLS)
           OVER (ORDER BY s.d ROWS UNBOUNDED PRECEDING) AS prev_d,
         first_value(o.v IGNORE NULLS) OVER
           (ORDER BY s.d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS next_v,
         first_value(CASE WHEN o.v IS NOT NULL THEN s.d END IGNORE NULLS)
           OVER (ORDER BY s.d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS next_d
  FROM spine s LEFT JOIN observed o ON s.d = o.d
)
SELECT strftime(d, '%Y-%m-%d') AS day,
       CAST(v IS NOT NULL AS INT) AS is_observed,
       round(coalesce(
         v,
         prev_v + (next_v - prev_v)
           * (date_diff('day', prev_d, d)
              / CAST(date_diff('day', prev_d, next_d) AS DOUBLE)),
         prev_v, next_v), 6) AS value_filled,
       CASE WHEN v IS NOT NULL THEN 'observed'
            WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
              THEN 'interpolated'
            ELSE 'edge-carried' END AS fill_kind
FROM g ORDER BY day
""",
        doc="calendar gap-fill + linear interpolation (deterministic "
        "outage: days divisible by 5 dropped, then reconstructed): "
        "spine via sequence/explode, LOCF windows both directions, "
        "decimal-routed daily totals, IEEE-identical lerp",
        tags=("extension", "temporal", "gapfill"),
    )
)


# ---------------------------------------------------------------------------
# classical seasonal decomposition (round 4)
# ---------------------------------------------------------------------------


def _seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the daily event
    count: trend = 7-day centered moving average, seasonal = per-ISO-
    weekday mean of the detrended series, residual = the rest — the
    moving-average decomposition at the core of STL, on exact
    arithmetic (integer daily counts, /7.0 trend, decimal-routed
    weekday means so group sums are aggregation-order-independent).

    Shape: one fact-table shuffle to daily counts, then every later
    step runs on the tiny per-day table — the single-partition ORDER BY
    window is over |days| rows (bounded by calendar span, not fact
    rows), and the weekday-effect join is a 7-row broadcast. Edge days
    without a full 7-day window are excluded (count(n) OVER w = 7), so
    the trend is never a partial average.
    """
    ev = _events(spark, sf_dir)
    from pyspark.sql.window import Window

    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    t = (
        daily.select(
            "d",
            "n",
            F.when(
                F.count("n").over(w7) == 7, F.sum("n").over(w7) / 7.0
            ).alias("trend"),
        )
        .where(F.col("trend").isNotNull())
        .withColumn("wd", F.expr("weekday(d)") + F.lit(1))
        .withColumn("det", F.col("n") - F.col("trend"))
    )
    eff = t.groupBy("wd").agg(
        (
            F.sum(F.col("det").cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("seasonal")
    )
    return (
        t.join(F.broadcast(eff), "wd")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day_s"),
            F.col("n").cast("long").alias("n_events"),
            F.round("trend", 6).alias("trend_r6"),
            # + 0.0 normalizes IEEE negative zero: a detrended value
            # rounding to -0.0 stringifies as '-0' on one engine and
            # '0' on the other (r11 dirty-fixture catch); adding +0.0
            # maps -0.0 -> +0.0 and is a no-op everywhere else
            (F.round("seasonal", 6) + F.lit(0.0)).alias("seasonal_r6"),
            (F.round(F.col("det") - F.col("seasonal"), 6) + F.lit(0.0)).alias(
                "residual_r6"
            ),
        )
        .orderBy("day_s")
    )


register(
    QuerySpec(
        "timeseries_seasonal_decompose",
        _seasonal_decompose,
        """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, count(*) AS n FROM events GROUP BY 1
),
ma AS (
  SELECT d, n,
         CASE WHEN count(n) OVER w = 7
              THEN sum(n) OVER w / 7.0 END AS trend
  FROM daily
  WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
t AS (
  SELECT d, n, trend, isodow(d) AS wd, n - trend AS det
  FROM ma WHERE trend IS NOT NULL
),
eff AS (
  SELECT wd,
         CAST(sum(CAST(det AS DECIMAL(28,12))) AS DOUBLE) / count(*)
           AS seasonal
  FROM t GROUP BY wd
)
SELECT strftime(t.d, '%Y-%m-%d') AS day_s,
       CAST(t.n AS BIGINT) AS n_events,
       round(t.trend, 6) AS trend_r6,
       round(eff.seasonal, 6) + 0.0 AS seasonal_r6,
       round(t.det - eff.seasonal, 6) + 0.0 AS residual_r6
FROM t JOIN eff USING (wd) ORDER BY day_s
""",
        doc="classical additive seasonal decomposition of daily event "
        "counts: 7-day centered-MA trend (full windows only), per-ISO-"
        "weekday seasonal effect over the detrended series (decimal-"
        "routed means), residual — fact shuffle once, then tiny per-day "
        "windows and a 7-row broadcast join",
        tags=("extension", "temporal", "timeseries"),
    )
)


# ---------------------------------------------------------------------------
# timezone-correct local-day rollup (round 4)
# ---------------------------------------------------------------------------

_LOCAL_TZ = "America/New_York"


def _local_day_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily rollup in the BUSINESS timezone, not UTC — the classic
    reporting trap: the fixture's timestamps are UTC instants, and a
    UTC-day GROUP BY silently splits every New-York business day at
    7 pm local (the reference's DC violations domain reports on
    America/New_York days; IANA rules, DST-correct by construction).
    Each event is converted instant→NY wall clock and grouped by the
    local date; ``n_shifted`` counts the rows whose local day differs
    from their UTC day — the rows a UTC rollup misassigns.

    Determinism: both engines use the same IANA zone database for
    1-month-2024 data (fixed EST offset here; the conversion path is
    DST-general). One fact shuffle on the local-day key; the
    conversion is a per-row expression in codegen."""
    ev = _events(spark, sf_dir)
    local_ts = F.from_utc_timestamp("ts", _LOCAL_TZ)
    return (
        ev.select(
            F.date_format(F.to_date(local_ts), "yyyy-MM-dd").alias(
                "local_day_s"
            ),
            (F.to_date(local_ts) != F.to_date("ts"))
            .cast("int")
            .alias("shifted"),
            "value",
        )
        .groupBy("local_day_s")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("shifted").cast("long").alias("n_shifted"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("local_day_s")
    )


register(
    QuerySpec(
        "events_local_day_rollup",
        _local_day_rollup,
        f"""
WITH conv AS (
  SELECT CAST(timezone('{_LOCAL_TZ}', ts AT TIME ZONE 'UTC') AS DATE)
           AS local_day,
         CAST(ts AS DATE) AS utc_day,
         value
  FROM events
)
SELECT strftime(local_day, '%Y-%m-%d') AS local_day_s,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN local_day <> utc_day THEN 1 ELSE 0 END)
            AS BIGINT) AS n_shifted,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM conv GROUP BY local_day ORDER BY local_day
""",
        doc="timezone-correct daily rollup: UTC instants converted to "
        "America/New_York wall clock (IANA rules, DST-general) and "
        "grouped by LOCAL date, with a count of rows a UTC-day rollup "
        "would misassign — the business-day reporting trap, solved "
        "per-row in codegen",
        tags=("extension", "temporal", "timezone"),
    )
)
