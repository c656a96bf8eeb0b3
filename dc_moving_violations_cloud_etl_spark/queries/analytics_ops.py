"""Event-analytics operator queries (round 3): multi-stage funnel,
cohort retention, CUBE grouping sets, partitioned-window top-k,
referential-integrity anti-join audit, and native hopping (sliding)
windows — the analytics shapes a serving layer over the reference's
fact/dimension model would add next (the reference's own surface stops
at flat GROUP BYs, sql/analysis_queries.sql:5-91).

Scale posture notes per query are inline; the common theme: every
aggregation pre-shrinks to a per-key/per-day table before any window or
join, so no operator ever windows/sorts the raw fact table globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .. import caching, catalog
from ..oracle import with_ref_views
from .registry import QuerySpec, register


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return catalog.base(spark, sf_dir, "events")


# ---------------------------------------------------------------------------
# multi-stage sequential funnel: view → click → purchase
# ---------------------------------------------------------------------------


def _funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: first view, first click AFTER that view, first
    purchase AFTER that click, per user; one summary row of stage
    counts. Each stage is a per-user aggregate (bounded by |users|, far
    smaller than the fact table) equi-joined back — at cluster scale the
    stage tables broadcast and the fact scan happens exactly 3 times
    with the event_type filter pushed to parquet."""
    ev = _events(spark, sf_dir).select("user_id", "event_type", "ts")
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vts"))
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .join(views, "user_id")
        .where(F.col("ts") > F.col("vts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("cts"))
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .where(F.col("ts") > F.col("cts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pts"))
    )
    return (
        views.agg(F.count(F.lit(1)).cast("long").alias("n_view"))
        .crossJoin(
            clicks.agg(
                F.count(F.lit(1)).cast("long").alias("n_click_after_view")
            )
        )
        .crossJoin(
            purchases.agg(
                F.count(F.lit(1))
                .cast("long")
                .alias("n_purchase_after_click")
            )
        )
    )


register(
    QuerySpec(
        "funnel_view_click_purchase",
        _funnel,
        """
WITH v AS (
  SELECT user_id, min(ts) AS vts FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS cts
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.vts
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS pts
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.cts
  GROUP BY e.user_id
)
SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
       CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click_after_view,
       CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase_after_click
""",
        doc="ordered 3-stage funnel (view → click-after-view → "
        "purchase-after-click) via per-stage min-ts aggregates and "
        "equi-joins; stage tables are user-bounded → broadcastable",
        tags=("extension", "analytics", "funnel"),
    )
)


# ---------------------------------------------------------------------------
# weekly cohort retention
# ---------------------------------------------------------------------------


def _cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort grid: users grouped by first-seen ISO week, activity
    counted per week-offset. Two shuffles total: the first-seen aggregate
    (user-bounded) and the final (cohort_week, week_offset) count —
    the first-seen table joins back user-keyed (co-partitioned with the
    fact shuffle at scale, or broadcast when |users| is dimension-like)."""
    ev = _events(spark, sf_dir).select("user_id", "ts")
    first = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day")
    )
    return (
        ev.join(first, "user_id")
        .select(
            F.date_format(F.date_trunc("week", "first_day"), "yyyy-MM-dd")
            .alias("cohort_week"),
            F.floor(
                F.datediff(F.to_date("ts"), F.col("first_day")) / 7
            )
            .cast("long")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").cast("long").alias("n_active_users"))
        .orderBy("cohort_week", "week_offset")
    )


register(
    QuerySpec(
        "cohort_weekly_retention",
        _cohort_retention,
        """
WITH first_seen AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS first_day
  FROM events GROUP BY user_id
)
SELECT strftime(date_trunc('week', f.first_day), '%Y-%m-%d')
         AS cohort_week,
       CAST(floor(datediff('day', f.first_day, CAST(e.ts AS DATE)) / 7.0)
            AS BIGINT) AS week_offset,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active_users
FROM events e JOIN first_seen f USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
""",
        doc="weekly cohort retention grid (first-seen ISO week × "
        "week-offset distinct actives); pre-aggregated first-seen table "
        "joined back on the user key",
        tags=("extension", "analytics", "cohort"),
    )
)


# ---------------------------------------------------------------------------
# CUBE over (event_type, weekday)
# ---------------------------------------------------------------------------


def _cube_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets: all 4 aggregation levels of
    (event_type, weekday) in ONE pass — Spark's Expand covers the
    reference's natural extension beyond flat GROUP BY (SURVEY.md §2.F
    notes Qa as the rollup candidate; this is the full cube). Grand
    totals/subtotals are labeled 'ALL' so the result is NULL-free and
    hash-stable. Cardinality after Expand is 4× a tiny key space —
    constant-size output."""
    ev = _events(spark, sf_dir).select(
        "event_type", F.date_format("ts", "EEEE").alias("weekday"), "value"
    )
    return (
        ev.cube("event_type", "weekday")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce("weekday", F.lit("ALL")).alias("weekday"),
            "n_events",
            "total_value",
        )
        .orderBy("event_type", "weekday")
    )


register(
    QuerySpec(
        "events_cube_type_weekday",
        _cube_type_dow,
        """
SELECT coalesce(event_type, 'ALL') AS event_type,
       coalesce(dayname(ts), 'ALL') AS weekday,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY CUBE (event_type, dayname(ts))
ORDER BY 1, 2
""",
        doc="one-pass CUBE over (event_type, weekday) with exact decimal "
        "value sums; subtotal rows labeled 'ALL'",
        tags=("extension", "analytics", "grouping-sets"),
    )
)


# ---------------------------------------------------------------------------
# per-group top-k via partitioned window
# ---------------------------------------------------------------------------

TOPK_DAYS = 3


def _topk_days_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 busiest days per event_type. The window ranks the
    PRE-AGGREGATED per-(type, day) counts — a table bounded by
    |types| × |days|, not the raw events — and partitions by event_type,
    so no global single-partition sort exists anywhere in the plan.
    Ties broken on the day string for determinism."""
    daily = (
        _events(spark, sf_dir)
        .groupBy(
            "event_type",
            F.date_format("ts", "yyyy-MM-dd").alias("event_day"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("n_events"), F.col("event_day")
    )
    return (
        daily.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= TOPK_DAYS)
        .orderBy("event_type", "rank")
    )


register(
    QuerySpec(
        "topk_busiest_days_per_type",
        _topk_days_per_type,
        f"""
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS event_day,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
           PARTITION BY event_type
           ORDER BY n_events DESC, event_day) AS BIGINT) AS rank
  FROM daily
)
SELECT event_type, event_day, n_events, rank
FROM ranked WHERE rank <= {TOPK_DAYS}
ORDER BY event_type, rank
""",
        doc="per-group top-k (3 busiest days per event_type) via "
        "partitioned row_number over a pre-aggregated daily table — "
        "no global sort",
        tags=("extension", "analytics", "topk-window"),
    )
)


# ---------------------------------------------------------------------------
# referential-integrity audit: anti/semi join vs the customer dimension
# ---------------------------------------------------------------------------


def _orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose user_id has no customer row (left_anti) vs matched
    (left_semi) — the DQ gate a fact/dim warehouse runs pre-publish.
    The dimension side is keys-only and explicitly broadcast: at 100 TB
    the fact side never shuffles for this check."""
    ev = _events(spark, sf_dir).select("user_id")
    dim = F.broadcast(
        catalog.base(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("user_id")
        )
    )
    orphans = ev.join(dim, "user_id", "left_anti")
    matched = ev.join(dim, "user_id", "left_semi")
    return (
        orphans.agg(
            F.count(F.lit(1)).cast("long").alias("n_orphan_events"),
            F.countDistinct("user_id").cast("long").alias("n_orphan_users"),
        )
        .crossJoin(
            matched.agg(
                F.count(F.lit(1)).cast("long").alias("n_matched_events")
            )
        )
    )


register(
    QuerySpec(
        "events_orphan_user_audit",
        _orphan_audit,
        """
SELECT CAST(count(*) FILTER (WHERE c.c_custkey IS NULL) AS BIGINT)
         AS n_orphan_events,
       CAST(count(DISTINCT e.user_id)
              FILTER (WHERE c.c_custkey IS NULL) AS BIGINT)
         AS n_orphan_users,
       CAST(count(*) FILTER (WHERE c.c_custkey IS NOT NULL) AS BIGINT)
         AS n_matched_events
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
""",
        doc="referential-integrity audit: anti-join orphan counts + "
        "semi-join matched count against a broadcast keys-only dimension",
        tags=("extension", "quality", "anti-join"),
    )
)


# ---------------------------------------------------------------------------
# hopping (sliding) windows: 1-day windows every 6 hours
# ---------------------------------------------------------------------------

HOP_WINDOW = "1 day"
HOP_SLIDE = "6 hours"
_SLIDE_S = 6 * 3600
_HOPS = 4  # window/slide


def _hopping_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native hopping-window aggregation: each event lands in 4
    overlapping 1-day windows (slide 6 h). Spark's ``window()`` plans
    this as an Expand (×4) + one hash aggregate — linear, no self-join.
    The oracle reproduces the window-assignment arithmetic explicitly
    (epoch-bucket × hop-offset cross join), cross-validating Spark's
    window alignment (epoch-aligned under the UTC session)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", HOP_WINDOW, HOP_SLIDE).alias("win"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias(
                "win_start"
            ),
            "n_events",
        )
        .orderBy("win_start")
    )


register(
    QuerySpec(
        "events_hopping_window_counts",
        _hopping_counts,
        f"""
SELECT strftime(
         make_timestamp(
           ((CAST(floor(epoch(ts) / {_SLIDE_S}) AS BIGINT) - h.i)
             * {_SLIDE_S}) * 1000000),
         '%Y-%m-%d %H:%M:%S') AS win_start,
       CAST(count(*) AS BIGINT) AS n_events
FROM events, range({_HOPS}) h(i)
GROUP BY 1 ORDER BY 1
""",
        doc="hopping-window counts (1-day window, 6-hour slide) via "
        "native window() Expand — each event in exactly 4 windows, "
        "one aggregate pass; oracle recomputes the assignment "
        "arithmetic explicitly",
        tags=("extension", "temporal", "hopping-window"),
    )
)


# ---------------------------------------------------------------------------
# geo hotspot binning over the violations lat/lon surface
# ---------------------------------------------------------------------------

GEO_TOPK = 10


def _geo_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-cell hotspot detection on the fact table's coordinates
    (reference stores latitude/longitude per violation,
    violation_etl_history.py:116-117, and never aggregates them): bin
    to ~100 m integer cells, count per cell, rank the top 10. The
    binning is two floor() projections fused into the scan; the top-k
    is TakeOrderedAndProject over the (bounded) cell aggregate. Both
    engines evaluate the identical IEEE double expressions, so the
    cells hash-match exactly."""
    v = catalog.violations(spark, sf_dir)
    cells = (
        v.where(F.col("latitude").isNotNull() & F.col("longitude").isNotNull())
        .groupBy(
            F.floor(F.col("latitude") * 1000).cast("long").alias("cell_lat"),
            F.floor(F.col("longitude") * 1000).cast("long").alias("cell_lon"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_violations"),
            F.sum(F.col("fine_amount").cast("decimal(18,2)"))
            .cast("double")
            .alias("fine_total"),
        )
    )
    return cells.orderBy(
        F.desc("n_violations"), "cell_lat", "cell_lon"
    ).limit(GEO_TOPK)


register(
    QuerySpec(
        "geo_cell_hotspots",
        _geo_hotspots,
        with_ref_views(f"""
SELECT CAST(floor(latitude * 1000) AS BIGINT) AS cell_lat,
       CAST(floor(longitude * 1000) AS BIGINT) AS cell_lon,
       CAST(count(*) AS BIGINT) AS n_violations,
       CAST(sum(CAST(fine_amount AS DECIMAL(18,2))) AS DOUBLE)
         AS fine_total
FROM violations
WHERE latitude IS NOT NULL AND longitude IS NOT NULL
GROUP BY 1, 2
ORDER BY n_violations DESC, cell_lat, cell_lon
LIMIT {GEO_TOPK}
"""),
        doc="geo hotspot binning: ~100m integer grid cells over the "
        "fact table's lat/lon, per-cell counts + exact fine totals, "
        "deterministic top-10 (TakeOrderedAndProject)",
        tags=("extension", "geo", "topk"),
    )
)


# ---------------------------------------------------------------------------
# month-over-month growth (lag over the monthly aggregate)
# ---------------------------------------------------------------------------


def _mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month ticket growth: lag() over the (tiny) monthly
    aggregate — the time-series derivative the reference's Qa/Qe
    monthly reports stop short of. The window input is |months| rows;
    the fact table is touched once by the grouped count."""
    v = catalog.violations(spark, sf_dir)
    monthly = v.groupBy("month").agg(
        F.count(F.lit(1)).cast("long").alias("n_tickets")
    )
    w = Window.orderBy("month")
    return (
        monthly.withColumn("prev_n", F.lag("n_tickets").over(w))
        .select(
            "month",
            "n_tickets",
            F.round(
                (F.col("n_tickets") - F.col("prev_n"))
                / F.col("prev_n").cast("double"),
                6,
            ).alias("mom_growth"),
        )
        .orderBy("month")
    )


register(
    QuerySpec(
        "monthly_ticket_growth",
        _mom_growth,
        with_ref_views("""
, monthly AS (
  SELECT month, CAST(count(*) AS BIGINT) AS n_tickets
  FROM violations GROUP BY month
)
SELECT month, n_tickets,
       round((n_tickets - lag(n_tickets) OVER (ORDER BY month))
             / CAST(lag(n_tickets) OVER (ORDER BY month) AS DOUBLE), 6)
         AS mom_growth
FROM monthly ORDER BY month
"""),
        doc="month-over-month growth via lag() over the pre-aggregated "
        "monthly series (window input = |months| rows, never the fact "
        "table)",
        tags=("extension", "analytics", "timeseries"),
    )
)


# ---------------------------------------------------------------------------
# DAU / WAU stickiness (exact trailing-window distinct users)
# ---------------------------------------------------------------------------


def _dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-analytics stickiness: daily actives and EXACT trailing-
    7-day actives per day, via a bounded range join of the distinct
    (day, user) table to the day spine — |days|×|users| worst case,
    never the fact table; countDistinct dedupes users across the
    window. (Approximate at 100 TB would swap in HLL sketch merge; the
    exact form is the oracle-checkable baseline.)"""
    ev = catalog.base(spark, sf_dir, "events")
    day_user = ev.select(
        F.to_date("ts").alias("d"), "user_id"
    ).distinct()
    days = day_user.select("d").distinct()
    trailing = day_user.alias("a").join(
        days.alias("s"),
        (F.col("a.d") <= F.col("s.d"))
        & (F.col("a.d") >= F.date_sub(F.col("s.d"), 6)),
    )
    wau = trailing.groupBy(F.col("s.d").alias("d")).agg(
        F.countDistinct("a.user_id").cast("long").alias("wau")
    )
    dau = day_user.groupBy("d").agg(
        F.countDistinct("user_id").cast("long").alias("dau")
    )
    return (
        dau.join(wau, "d")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("event_day"),
            "dau",
            "wau",
            F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
        )
        .orderBy("event_day")
    )


register(
    QuerySpec(
        "dau_wau_stickiness",
        _dau_wau,
        """
WITH day_user AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
),
days AS (SELECT DISTINCT d FROM day_user),
dau AS (SELECT d, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        FROM day_user GROUP BY d),
wau AS (
  SELECT s.d, CAST(count(DISTINCT a.user_id) AS BIGINT) AS wau
  FROM day_user a JOIN days s
    ON a.d <= s.d AND a.d >= s.d - INTERVAL 6 DAY
  GROUP BY s.d
)
SELECT strftime(dau.d, '%Y-%m-%d') AS event_day, dau.dau, wau.wau,
       round(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness
FROM dau JOIN wau ON dau.d = wau.d
ORDER BY event_day
""",
        doc="DAU/WAU stickiness with EXACT trailing-7-day distinct "
        "actives (bounded range join over the distinct (day,user) "
        "table; HLL-merge is the 100 TB drop-in)",
        tags=("extension", "analytics", "stickiness"),
    )
)


# ---------------------------------------------------------------------------
# gaps-and-islands: longest consecutive-day activity streak per user
# ---------------------------------------------------------------------------


def _activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the classic
    gaps-and-islands shape via the row_number-difference trick:
    ``day - row_number`` is constant within a consecutive run, so one
    partitioned window + one hash-agg finds every island without a
    self-join. Distinct active days pre-shrink the input (≤ |users| x
    |days| rows); every value is an integer or date, so the oracle
    hash-matches exactly. Complements `sessionize_gap30` (time-gap
    islands) at day granularity."""
    ev = _events(spark, sf_dir)
    days = ev.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = (
        days.withColumn(
            "grp", F.date_sub("d", F.row_number().over(w))
        )
        .groupBy("user_id", "grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("len"),
            F.min("d").alias("start"),
        )
    )
    pick = Window.partitionBy("user_id").orderBy(
        F.desc("len"), F.asc("start")
    )
    return (
        islands.withColumn("rn", F.row_number().over(pick))
        .groupBy("user_id")
        .agg(
            F.sum("len").cast("long").alias("n_active_days"),
            F.count(F.lit(1)).cast("long").alias("n_streaks"),
            F.max("len").cast("long").alias("longest_streak"),
            F.date_format(
                F.min(F.when(F.col("rn") == 1, F.col("start"))),
                "yyyy-MM-dd",
            ).alias("streak_start"),
        )
        .orderBy("user_id")
    )


register(
    QuerySpec(
        "user_activity_streaks",
        _activity_streaks,
        """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
islands AS (
  SELECT user_id, grp,
         count(*) AS len, min(d) AS start
  FROM (
    SELECT user_id, d,
           d - CAST(row_number() OVER (
                 PARTITION BY user_id ORDER BY d) AS INT) AS grp
    FROM days
  )
  GROUP BY user_id, grp
),
ranked AS (
  SELECT *, row_number() OVER (
           PARTITION BY user_id ORDER BY len DESC, start) AS rn
  FROM islands
)
SELECT user_id,
       CAST(sum(len) AS BIGINT) AS n_active_days,
       CAST(count(*) AS BIGINT) AS n_streaks,
       CAST(max(len) AS BIGINT) AS longest_streak,
       strftime(min(CASE WHEN rn = 1 THEN start END), '%Y-%m-%d')
         AS streak_start
FROM ranked
GROUP BY user_id ORDER BY user_id
""",
        doc="gaps-and-islands: longest consecutive-day streak per user "
        "via the row_number-difference trick (one window + one agg, no "
        "self-join); integer/date-exact",
        tags=("extension", "analytics", "gaps-islands"),
    )
)


# ---------------------------------------------------------------------------
# Python UDTF with TABLE(...) PARTITION BY: per-partition analytic
# ---------------------------------------------------------------------------


def _udtf_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's PARTITIONED Python UDTF surface: ``TABLE(events)
    PARTITION BY user_id ORDER BY ts`` streams each user's rows through
    one stateful class instance (eval per row, terminate per
    partition) — the imperative escape hatch for per-key sequence
    logic no window expression covers (here: max inter-event gap,
    which lag() CAN express — deliberately, so the declarative twin is
    the oracle). The class lives inside this function so cloudpickle
    ships it by value; gaps stay integer microseconds end-to-end.
    Row-at-a-time Python is the cost of this surface — fine for a
    per-user analytic over pre-projected columns, never for the
    hot path (the package's batch compute is all Column/Arrow)."""
    from pyspark.sql.functions import udtf

    # NOTE (r14, measured): useArrow=True on this UDTF was tried and
    # REVERTED — 6.25 s → 22.2 s isolated median at sf0.1. The Arrow
    # UDTF path materializes each eval() call's per-row result through
    # an Arrow batch builder, and for a 1-column high-row-count
    # PARTITION BY stream the per-row conversion overhead dwarfs the
    # pickle serialization it replaces. Pickled rows stay.
    @udtf(returnType="user_id bigint, n_events bigint, max_gap_us bigint")
    class GapStats:
        def __init__(self):
            self.user = None
            self.seen = False  # distinct from user None: a NULL
            # user_id is a REAL partition (SQL GROUP BY keeps the NULL
            # group) - guarding terminate on `user is not None`
            # silently dropped it (r11 dirty-fixture catch)
            self.n = 0
            self.prev = None
            self.mx = 0

        def eval(self, row):
            self.user = row.user_id
            self.seen = True
            self.n += 1
            if row.ts_us is None:
                # a NULL ts contributes no gap on either side of the
                # chain - the declarative twin's lag() yields NULL
                # there and max() skips it; arithmetic on None would
                # kill the partition instead
                return
            if self.prev is not None and row.ts_us - self.prev > self.mx:
                self.mx = row.ts_us - self.prev
            self.prev = row.ts_us

        def terminate(self):
            if self.seen:
                yield self.user, self.n, self.mx

    spark.udtf.register("user_gap_stats_udtf", GapStats)
    _events(spark, sf_dir).select(
        "user_id", F.unix_micros("ts").alias("ts_us")
    ).createOrReplaceTempView("_events_ts_us")
    return spark.sql(
        """
        SELECT user_id, n_events, max_gap_us
        FROM user_gap_stats_udtf(
          TABLE(_events_ts_us) PARTITION BY user_id ORDER BY ts_us)
        ORDER BY user_id
        """
    )


register(
    QuerySpec(
        "udtf_partitioned_gap_stats",
        _udtf_gap_stats,
        """
WITH gaps AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts)) AS gap_us
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(coalesce(max(gap_us), 0) AS BIGINT) AS max_gap_us
FROM gaps
GROUP BY user_id ORDER BY user_id
""",
        doc="partitioned Python UDTF (TABLE(...) PARTITION BY ORDER BY): "
        "per-user max inter-event gap via one stateful instance per "
        "partition, verified against the declarative lag() twin",
        tags=("extension", "udtf", "partitioned"),
    )
)


# ---------------------------------------------------------------------------
# explicit GROUPING SETS (the third of the rollup/cube/sets trio)
# ---------------------------------------------------------------------------


def _grouping_sets_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom grouping sets via the Spark 4 ``DataFrame.groupingSets``
    API — exactly the two marginals plus the grand total, WITHOUT the
    full cross-product a CUBE would compute (``events_cube_type_weekday``
    is the CUBE twin; ``qa_rollup_totals`` the ROLLUP one). One Expand
    (×3) + one hash aggregate; ``grouping_id`` disambiguates the NULLs
    of each set from data NULLs."""
    ev = _events(spark, sf_dir).select(
        "event_type",
        (F.dayofweek("ts") - 1).cast("long").alias("wd"),  # 0 = Sunday; BIGINT both engines
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    return (
        ev.groupingSets([["event_type"], ["wd"], []], "event_type", "wd")
        .agg(
            F.expr("grouping_id(event_type, wd)").cast("long").alias("gid"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .orderBy("gid", "event_type", "wd")
    )


register(
    QuerySpec(
        "events_grouping_sets_matrix",
        _grouping_sets_matrix,
        """
SELECT event_type,
       CASE WHEN GROUPING(dayofweek(ts)) = 0
            THEN dayofweek(ts) END AS wd,
       CAST(GROUPING(event_type) * 2 + GROUPING(dayofweek(ts)) AS BIGINT)
         AS gid,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM events
GROUP BY GROUPING SETS ((event_type), (dayofweek(ts)), ())
ORDER BY gid, event_type, wd
""",
        doc="explicit GROUPING SETS (marginals + grand total, no cube "
        "cross-product) via the Spark 4 DataFrame.groupingSets API; "
        "grouping_id disambiguates set NULLs",
        tags=("extension", "analytics", "grouping-sets"),
    )
)


# ---------------------------------------------------------------------------
# time-bounded conversion funnel (click -> purchase within 24 h)
# ---------------------------------------------------------------------------

_CONV_WINDOW_H = 24


def _conversion_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution-style conversion: per click day, how many clicks had
    a purchase by the same user within the following 24 hours — the
    TIME-BOUNDED funnel (the ordered funnel `funnel_view_click_purchase`
    has no deadline; ad attribution always does).

    Scale posture: the existence test is a day-bucketed equi-join, the
    bounded-range-join pattern of `range_click_before_error` — each
    purchase explodes to its (day, day-1) candidate buckets, the join
    key is (user, day), and the exact 0 < Δt <= 24 h filter runs inside
    the joined bucket, so candidate volume is bounded by per-(user,
    adjacent-day) activity, never all click×purchase pairs. EXISTS
    multiplicity is collapsed with a distinct on the click identity
    BEFORE the final aggregate, so multi-purchase users cannot
    double-count a click."""
    ev = _events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("cts"),
        F.to_date("ts").alias("click_day"),
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("pts"))
        .withColumn(
            "click_day",
            F.explode(
                F.array(
                    F.to_date("pts"), F.date_sub(F.to_date("pts"), 1)
                )
            ),
        )
    )
    converted = (
        clicks.join(purchases, ["user_id", "click_day"])
        .where(
            (F.col("pts") > F.col("cts"))
            & (
                F.col("pts")
                <= F.col("cts") + F.expr(f"INTERVAL {_CONV_WINDOW_H} HOURS")
            )
        )
        .select("user_id", "cts")
        .distinct()
        .withColumn("converted", F.lit(1))
    )
    return (
        clicks.join(converted, ["user_id", "cts"], "left")
        .groupBy(F.date_format("click_day", "yyyy-MM-dd").alias("click_day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clicks"),
            F.sum(F.coalesce(F.col("converted"), F.lit(0)))
            .cast("long")
            .alias("n_converted"),
            F.countDistinct(
                F.when(F.col("converted") == 1, F.col("user_id"))
            )
            .cast("long")
            .alias("n_converting_users"),
        )
        .orderBy("click_day")
    )


register(
    QuerySpec(
        "funnel_conversion_window_24h",
        _conversion_window,
        f"""
WITH clicks AS (
  SELECT user_id, ts AS cts, CAST(ts AS DATE) AS click_day
  FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, ts AS pts FROM events WHERE event_type = 'purchase'
),
conv AS (
  SELECT c.user_id, c.cts, c.click_day
  FROM clicks c
  WHERE EXISTS (
    SELECT 1 FROM purchases p
    WHERE p.user_id = c.user_id
      AND p.pts > c.cts
      AND p.pts <= c.cts + INTERVAL {_CONV_WINDOW_H} HOUR
  )
)
SELECT strftime(c.click_day, '%Y-%m-%d') AS click_day,
       CAST(count(*) AS BIGINT) AS n_clicks,
       CAST(sum(CASE WHEN v.cts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_converted,
       CAST(count(DISTINCT CASE WHEN v.cts IS NOT NULL
                                THEN c.user_id END) AS BIGINT)
         AS n_converting_users
FROM clicks c
LEFT JOIN conv v ON v.user_id = c.user_id AND v.cts = c.cts
GROUP BY strftime(c.click_day, '%Y-%m-%d')
ORDER BY click_day
""",
        doc="time-bounded conversion funnel: click -> same-user purchase "
        "within 24 h via the day-bucketed bounded range join; EXISTS "
        "multiplicity collapsed before aggregation",
        tags=("extension", "analytics", "funnel", "temporal"),
    )
)


# ---------------------------------------------------------------------------
# bucketed geo radius join (spatial join without a spatial index)
# ---------------------------------------------------------------------------

_GEO_R_U = 10_000  # radius in integer micro-degrees (0.01 deg ~ 1.1 km)
_GEO_TOPK = 5


def _geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius join — "how many violations fall within R of each hotspot
    center" — the canonical spatial join, expressed with the engine's
    bucketing discipline instead of a spatial index: coordinates
    quantize to integer micro-degrees, space is gridded at cell = R, a
    center's candidates come ONLY from its 3x3 neighbor cells (a
    9-key equi-join, never a distance cross join), and the exact
    in-radius test is integer planar distance-squared inside the
    bucket — every comparison exact in both engines (no trig, no float
    thresholds; at DC's latitude the planar metric is the right
    operational approximation for km-scale radii, and the grid/filter
    SHAPE is unchanged for a haversine refinement).

    Centers are the top-5 busiest cells (deterministic count-desc /
    cell-asc tie-break), each represented by its centroid. At 100 TB:
    the center set is broadcast (45 candidate-cell rows), the fact side
    is one scan + one equi-join on the cell key — the same posture as
    the banded dedup joins."""
    v = catalog.violations(spark, sf_dir)
    pts = v.where(
        F.col("latitude").isNotNull() & F.col("longitude").isNotNull()
    ).select(
        F.round(F.col("latitude") * 1e6, 0).cast("long").alias("lat_u"),
        F.round(F.col("longitude") * 1e6, 0).cast("long").alias("lon_u"),
    )
    pts = pts.select(
        "lat_u",
        "lon_u",
        F.floor(F.col("lat_u") / _GEO_R_U).cast("long").alias("cell_lat"),
        F.floor(F.col("lon_u") / _GEO_R_U).cast("long").alias("cell_lon"),
    )
    pts = caching.persist_tracked(pts)
    centers = (
        pts.groupBy("cell_lat", "cell_lon")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(
            F.col("cnt").desc(),
            F.col("cell_lat").asc(),
            F.col("cell_lon").asc(),
        )
        .limit(_GEO_TOPK)
        .select(
            (F.col("cell_lat") * _GEO_R_U + _GEO_R_U // 2).alias("c_lat_u"),
            (F.col("cell_lon") * _GEO_R_U + _GEO_R_U // 2).alias("c_lon_u"),
        )
    )
    off = F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)]))
    cand_cells = (
        centers.withColumn("dlat", off)
        .withColumn("dlon", off)
        .select(
            "c_lat_u",
            "c_lon_u",
            (F.floor(F.col("c_lat_u") / _GEO_R_U) + F.col("dlat"))
            .cast("long")
            .alias("cell_lat"),
            (F.floor(F.col("c_lon_u") / _GEO_R_U) + F.col("dlon"))
            .cast("long")
            .alias("cell_lon"),
        )
    )
    d2 = (F.col("lat_u") - F.col("c_lat_u")) * (
        F.col("lat_u") - F.col("c_lat_u")
    ) + (F.col("lon_u") - F.col("c_lon_u")) * (
        F.col("lon_u") - F.col("c_lon_u")
    )
    return (
        pts.join(F.broadcast(cand_cells), ["cell_lat", "cell_lon"])
        .where(d2 <= _GEO_R_U * _GEO_R_U)
        .groupBy("c_lat_u", "c_lon_u")
        .agg(F.count(F.lit(1)).cast("long").alias("n_in_radius"))
        .orderBy("c_lat_u", "c_lon_u")
    )


register(
    QuerySpec(
        "geo_radius_join_hotspots",
        _geo_radius_join,
        with_ref_views(
            f"""
, pts AS (
  SELECT CAST(round(latitude * 1e6) AS BIGINT) AS lat_u,
         CAST(round(longitude * 1e6) AS BIGINT) AS lon_u
  FROM violations
  WHERE latitude IS NOT NULL AND longitude IS NOT NULL
),
cells AS (
  SELECT lat_u, lon_u,
         CAST(floor(lat_u / {_GEO_R_U}.0) AS BIGINT) AS cell_lat,
         CAST(floor(lon_u / {_GEO_R_U}.0) AS BIGINT) AS cell_lon
  FROM pts
),
centers AS (
  SELECT cell_lat * {_GEO_R_U} + {_GEO_R_U // 2} AS c_lat_u,
         cell_lon * {_GEO_R_U} + {_GEO_R_U // 2} AS c_lon_u
  FROM (
    SELECT cell_lat, cell_lon, count(*) AS cnt
    FROM cells GROUP BY cell_lat, cell_lon
    ORDER BY cnt DESC, cell_lat ASC, cell_lon ASC LIMIT {_GEO_TOPK}
  )
),
cand AS (
  SELECT c.c_lat_u, c.c_lon_u,
         CAST(floor(c.c_lat_u / {_GEO_R_U}.0) AS BIGINT) + dl.d AS cell_lat,
         CAST(floor(c.c_lon_u / {_GEO_R_U}.0) AS BIGINT) + dn.d AS cell_lon
  FROM centers c,
       (SELECT unnest([-1, 0, 1]) AS d) dl,
       (SELECT unnest([-1, 0, 1]) AS d) dn
)
SELECT cand.c_lat_u, cand.c_lon_u,
       CAST(count(*) AS BIGINT) AS n_in_radius
FROM cells JOIN cand USING (cell_lat, cell_lon)
WHERE (cells.lat_u - cand.c_lat_u) * (cells.lat_u - cand.c_lat_u)
    + (cells.lon_u - cand.c_lon_u) * (cells.lon_u - cand.c_lon_u)
   <= {_GEO_R_U * _GEO_R_U}
GROUP BY cand.c_lat_u, cand.c_lon_u
ORDER BY c_lat_u, c_lon_u
"""
        ),
        doc="bucketed geo radius join: grid at cell = R, candidates "
        "from 3x3 neighbor cells only (broadcast 45-row equi-join), "
        "exact integer planar distance-squared filter inside the "
        "bucket — the spatial join without a spatial index",
        tags=("extension", "analytics", "geo", "join"),
    )
)


# ---------------------------------------------------------------------------
# exponentially-decayed leaderboard (trending items, exact integers)
# ---------------------------------------------------------------------------


def _decayed_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending-item leaderboard under exponential time decay — recency
    weighting with a 1-week half-life, in EXACT integers: ages bucket
    to weeks and the weight ladder is powers of two
    (16/8/4/2/1, >4 weeks → 0), so the decayed score is a plain BIGINT
    sum in both engines — no float pow(), no decay-constant drift. This
    is how a leaderboard stays hash-comparable across engines AND
    mergeable: per-day integer partials can be stored and re-weighted
    at query time by shifting, the standard trick for incremental
    trending at scale.

    One scan + one groupBy on the item key; the reference day (max
    event date) is the 1-row broadcast scalar-combine."""
    ev = _events(spark, sf_dir).select(
        F.get_json_object("props", "$.k").try_cast("long").alias("k"),
        F.to_date("ts").alias("d"),
    ).where(F.col("k").isNotNull())
    ref = ev.agg(F.max("d").alias("ref_d"))
    age_w = F.floor(F.datediff(F.col("ref_d"), F.col("d")) / 7)
    weight = (
        F.when(age_w == 0, 16)
        .when(age_w == 1, 8)
        .when(age_w == 2, 4)
        .when(age_w == 3, 2)
        .when(age_w == 4, 1)
        .otherwise(0)
    )
    return (
        ev.crossJoin(F.broadcast(ref))
        .groupBy("k")
        .agg(
            F.sum(weight).cast("long").alias("decayed_score"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .orderBy(F.col("decayed_score").desc(), F.col("k").asc())
        .limit(10)
    )


register(
    QuerySpec(
        "events_decayed_leaderboard",
        _decayed_leaderboard,
        """
WITH ev AS (
  SELECT TRY_CAST(CASE WHEN json_valid(props) AND regexp_matches(json_extract_string(props, '$.k'), '^[\\x00-\\x20\\x7f]*[+-]?[0-9]+[\\x00-\\x20\\x7f]*$') THEN regexp_replace(json_extract_string(props, '$.k'), '^[\\x00-\\x20\\x7f]+|[\\x00-\\x20\\x7f]+$', '', 'g') END AS BIGINT) AS k,
         CAST(ts AS DATE) AS d
  FROM events
  WHERE TRY_CAST(CASE WHEN json_valid(props) AND regexp_matches(json_extract_string(props, '$.k'), '^[\\x00-\\x20\\x7f]*[+-]?[0-9]+[\\x00-\\x20\\x7f]*$') THEN regexp_replace(json_extract_string(props, '$.k'), '^[\\x00-\\x20\\x7f]+|[\\x00-\\x20\\x7f]+$', '', 'g') END AS BIGINT) IS NOT NULL
),
ref AS (SELECT max(d) AS ref_d FROM ev)
SELECT k,
       CAST(sum(CASE date_diff('day', d, (SELECT ref_d FROM ref)) // 7
                WHEN 0 THEN 16 WHEN 1 THEN 8 WHEN 2 THEN 4
                WHEN 3 THEN 2 WHEN 4 THEN 1 ELSE 0 END) AS BIGINT)
         AS decayed_score,
       CAST(count(*) AS BIGINT) AS n_events
FROM ev
GROUP BY k
ORDER BY decayed_score DESC, k ASC LIMIT 10
""",
        doc="trending leaderboard under 1-week-half-life decay in exact "
        "integers (power-of-two weight ladder, no float pow) — "
        "mergeable per-day partials re-weighted by shifting",
        tags=("extension", "analytics", "trending"),
    )
)


# ---------------------------------------------------------------------------
# grouped-aggregate pandas UDAF: the custom-aggregate extension point
# ---------------------------------------------------------------------------


def _udaf_grouped_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group median via a GROUPED_AGG pandas UDF — the
    vectorized custom-aggregate surface (median is the textbook
    non-decomposable aggregate: no map-side combine exists, so it's the
    honest showcase for a UDAF rather than a Column expression).

    The UDAF is defined NESTED so cloudpickle ships it by value (workers
    have no package on PYTHONPATH), and it arrives as one Arrow batch
    per group — which is also the scale caveat: a grouped-agg pandas UDF
    materializes each whole group in executor memory. Groups here are
    the 5 event types; at 100 TB grain this coarse, switch to the exact
    two-pass rank selection (``events_value_percentiles``) or
    ``approx_percentile``. A second UDAF (count) rides in the same
    agg() — Catalyst refuses to mix pandas and JVM aggregates in one
    Aggregate node, so a UDAF query is all-pandas by construction.

    Both engines interpolate even-count medians as the midpoint of the
    two middle values; rounding to 4 dp absorbs the one-ulp difference
    between ``(a+b)/2`` (numpy) and ``a+(b-a)/2`` (DuckDB
    quantile_cont) on 2-dp inputs.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # the UDAF-vs-scalar dispatch reads the type hints; this module's
    # ``from __future__ import annotations`` would stringify inline
    # hints into unresolvable 'pd.Series', so attach real objects
    def _median(v):
        return float(v.median())

    _median.__annotations__ = {"v": pd.Series, "return": float}
    median_value = pandas_udf(_median, "double")

    def _n(v):
        return len(v)

    _n.__annotations__ = {"v": pd.Series, "return": int}
    n_events = pandas_udf(_n, "long")

    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.round(median_value(F.col("value")), 4).alias("median_value"),
            n_events(F.col("value")).alias("n_events"),
        )
        .orderBy("event_type")
    )


register(
    QuerySpec(
        "udaf_grouped_median",
        _udaf_grouped_median,
        """
SELECT event_type,
       round(median(value), 4) AS median_value,
       count(*) AS n_events
FROM events
GROUP BY event_type
ORDER BY event_type
""",
        doc="GROUPED_AGG pandas UDAF (Arrow-batched custom aggregate) "
        "computing the exact median — the non-decomposable aggregate "
        "built-ins can't express — beside a second UDAF count in the "
        "same Aggregate; completes the UDF surface next to the scalar "
        "pandas UDF, UDTF, SQL UDF and mapInPandas/mapInArrow paths",
        tags=("extension", "udf", "analytics"),
    )
)


# ---------------------------------------------------------------------------
# point-in-polygon ward assignment (round 4): ray casting, exact ints
# ---------------------------------------------------------------------------

# Ward polygons in integer MICRO-DEGREES (x = longitude, y = latitude),
# deliberately non-rectangular (a pentagon and an L-shape) so the test
# exercises real ray casting, not bbox checks. Vertices sit on 5000-µ°
# half-steps while the fixture grid lives on 10000-µ° steps — no point
# can ever land exactly on an edge or share a vertex y, so the
# half-open crossing rule never faces a tie.
_WARD_POLYGONS = {
    "pentagon_nw": [
        (-77075000, 38905000),
        (-77035000, 38905000),
        (-77030000, 38950000),
        (-77055000, 38995000),
        (-77078000, 38955000),
    ],
    "lshape_e": [
        (-77025000, 38905000),
        (-77005000, 38905000),
        (-77005000, 38995000),
        (-77015000, 38995000),
        (-77015000, 38935000),
        (-77025000, 38935000),
    ],
}


def _poly_edges(poly: list[tuple[int, int]]) -> list[tuple[int, int, int, int]]:
    return [
        (x1, y1, x2, y2)
        for (x1, y1), (x2, y2) in zip(poly, poly[1:] + poly[:1])
    ]


def _crossings(px: F.Column, py: F.Column, poly) -> F.Column:
    """Ray-casting crossing count as a pure integer Column expression:
    a horizontal ray from (px, py) crosses edge (x1,y1)-(x2,y2) iff the
    edge straddles py (half-open, so a shared vertex counts once) and
    the intersection lies right of px — the float intersection test
    ``px < x1 + (py-y1)(x2-x1)/(y2-y1)`` cross-multiplied to exact
    64-bit integers with the sign of (y2-y1) flipping the inequality.

    The per-edge tests are UNROLLED into a static when()-sum rather
    than folded with F.aggregate: the polygons are plan-time literals,
    and higher-order functions evaluate their lambdas interpreted (per
    element, per row) — the unrolled tree stays in codegen and the
    edge-direction branch resolves in Python (measured at sf0.1: the
    HOF fold ran ~5.7 s, the unrolled sum ~1.1 s warm).
    Horizontal edges (y2 == y1) can never straddle and are dropped at
    build time."""
    total: F.Column | None = None
    for x1, y1, x2, y2 in _poly_edges(poly):
        d = y2 - y1
        if d == 0:
            continue
        straddle = (F.lit(y1) > py) != (F.lit(y2) > py)
        lhs = (px - F.lit(x1)) * F.lit(d)
        rhs = (py - F.lit(y1)) * F.lit(x2 - x1)
        cond = straddle & ((lhs < rhs) if d > 0 else (lhs > rhs))
        term = F.when(cond, 1).otherwise(0)
        total = term if total is None else total + term
    return F.coalesce(total, F.lit(0))


def _ward_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon spatial join, the ward-assignment query a DC
    violations warehouse actually needs: every violation's (lat, lon)
    is ray-cast against each ward polygon and aggregated per ward
    (plus 'none' for the gap between wards).

    Scale shape: the polygons are LITERAL arrays folded by a HOF inside
    the projection — whole-stage codegen over the fact scan, no join,
    no shuffle until the final small groupBy. At 100 TB this is the
    textbook map-side spatial tag; a thousand-ward real deployment
    would bbox-grid the polygons first (the geo_radius_join discipline)
    and keep this exact integer crossing test inside each grid cell.
    """
    v = catalog.violations(spark, sf_dir).where(
        F.col("latitude").isNotNull() & F.col("longitude").isNotNull()
    )
    px = F.round(F.col("longitude") * 1e6, 0).cast("long")
    py = F.round(F.col("latitude") * 1e6, 0).cast("long")
    tagged = v.select(
        "fine_amount",
        *[
            (_crossings(px, py, poly) % 2 == 1).alias(f"in_{name}")
            for name, poly in _WARD_POLYGONS.items()
        ],
    )
    ward = F.coalesce(
        *[
            F.when(F.col(f"in_{name}"), F.lit(name))
            for name in _WARD_POLYGONS
        ],
        F.lit("none"),
    )
    return (
        tagged.select(ward.alias("ward"), "fine_amount")
        .groupBy("ward")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_violations"),
            F.sum(F.col("fine_amount").cast("decimal(18,2)"))
            .cast("double")
            .alias("fines_total"),
        )
        .orderBy("ward")
    )


def _ward_sql() -> str:
    rows = []
    for name, poly in _WARD_POLYGONS.items():
        for x1, y1, x2, y2 in _poly_edges(poly):
            rows.append(f"('{name}', {x1}, {y1}, {x2}, {y2})")
    edges = ",\n         ".join(rows)
    return with_ref_views(
        f"""
, v AS (
  SELECT violation_id,
         CAST(round(longitude * 1e6) AS BIGINT) AS px,
         CAST(round(latitude * 1e6) AS BIGINT) AS py,
         fine_amount
  FROM violations
  WHERE latitude IS NOT NULL AND longitude IS NOT NULL
),
edges(ward, x1, y1, x2, y2) AS (
  VALUES {edges}
),
cross_cnt AS (
  SELECT v.violation_id, e.ward,
         sum(CASE WHEN (e.y1 > v.py) != (e.y2 > v.py)
                   AND ((e.y2 - e.y1 > 0 AND
                         (v.px - e.x1) * (e.y2 - e.y1)
                           < (v.py - e.y1) * (e.x2 - e.x1))
                     OR (e.y2 - e.y1 < 0 AND
                         (v.px - e.x1) * (e.y2 - e.y1)
                           > (v.py - e.y1) * (e.x2 - e.x1)))
                  THEN 1 ELSE 0 END) AS c
  FROM v, edges e GROUP BY 1, 2
),
assign AS (
  SELECT violation_id,
         coalesce(max(CASE WHEN c % 2 = 1 THEN ward END), 'none') AS ward
  FROM cross_cnt GROUP BY violation_id
)
SELECT a.ward,
       CAST(count(*) AS BIGINT) AS n_violations,
       CAST(sum(CAST(v.fine_amount AS DECIMAL(18,2))) AS DOUBLE)
         AS fines_total
FROM v JOIN assign a USING (violation_id)
GROUP BY a.ward ORDER BY a.ward
"""
    )


register(
    QuerySpec(
        "geo_ward_point_in_polygon",
        _ward_assignment,
        _ward_sql(),
        doc="point-in-polygon ward assignment by ray casting: literal "
        "polygon edges folded by a HOF inside the projection (exact "
        "cross-multiplied 64-bit integer crossing test, half-open rule) "
        "— whole-stage codegen over the fact scan, no join; the spatial "
        "tag every violations warehouse applies before per-ward rollups",
        tags=("extension", "geo", "spatial"),
    )
)


# ---------------------------------------------------------------------------
# feature-store point-in-time labels (round 4): leakage-free by shape
# ---------------------------------------------------------------------------

_PIT_HORIZON_D = 7


def _pit_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct training-set assembly — the feature-store
    join every supervised pipeline needs and most leak: for each
    (user, day) observation, FEATURES are computed from events at or
    BEFORE the day (running totals via an ordered window) and the LABEL
    comes strictly from the (day, day+7] future window (purchase
    within the horizon). Leakage-free by construction: the feature
    window and the label window cannot overlap, and the per-day
    aggregate output carries both sides so the oracle re-derives the
    same split.

    Shape: one fact shuffle to (user, day) grain, a per-user cumulative
    window over that bounded table, and a day-bucketed self-join for
    the label window (1..7 day offsets on per-day rows — never the raw
    fact table). Output is per-day (calendar-bounded)."""
    ev = catalog.base(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("d")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(
            (F.col("event_type") == "purchase").cast("long")
        ).alias("n_purch"),
    )
    daily = caching.persist_tracked(daily)
    w = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    feat = daily.select(
        "user_id",
        "d",
        F.sum("n_events").over(w).cast("long").alias("cum_events"),
    )
    fut = daily.where(F.col("n_purch") > 0).select(
        F.col("user_id").alias("f_user"), F.col("d").alias("f_d")
    )
    labeled = (
        feat.join(
            fut,
            (F.col("user_id") == F.col("f_user"))
            & (F.datediff(F.col("f_d"), F.col("d")).between(1, _PIT_HORIZON_D)),
            "left",
        )
        .groupBy("user_id", "d", "cum_events")
        .agg(
            F.max(F.col("f_d").isNotNull().cast("int")).alias("label")
        )
    )
    return (
        labeled.groupBy(F.date_format("d", "yyyy-MM-dd").alias("day_s"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_user_days"),
            F.sum("label").cast("long").alias("n_positive"),
            F.sum("cum_events").cast("long").alias("sum_cum_events"),
        )
        .orderBy("day_s")
    )


register(
    QuerySpec(
        "feature_store_pit_labels",
        _pit_labels,
        f"""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_purch
  FROM events GROUP BY user_id, CAST(ts AS DATE)
),
feat AS (
  SELECT user_id, d,
         CAST(sum(n_events) OVER (PARTITION BY user_id ORDER BY d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum_events
  FROM daily
),
fut AS (
  SELECT user_id AS f_user, d AS f_d FROM daily WHERE n_purch > 0
),
labeled AS (
  SELECT f.user_id, f.d, f.cum_events,
         max(CASE WHEN fu.f_d IS NOT NULL THEN 1 ELSE 0 END) AS label
  FROM feat f
  LEFT JOIN fut fu
    ON fu.f_user = f.user_id
   AND fu.f_d - f.d BETWEEN 1 AND {_PIT_HORIZON_D}
  GROUP BY f.user_id, f.d, f.cum_events
)
SELECT strftime(d, '%Y-%m-%d') AS day_s,
       CAST(count(*) AS BIGINT) AS n_user_days,
       CAST(sum(label) AS BIGINT) AS n_positive,
       CAST(sum(cum_events) AS BIGINT) AS sum_cum_events
FROM labeled GROUP BY d ORDER BY day_s
""",
        doc="point-in-time-correct label generation (the feature-store "
        "join): per-(user, day) features from at-or-before the day "
        "(cumulative window), labels strictly from the (day, day+7] "
        "future window — leakage-free by construction; day-bucketed "
        "label join over per-day rows, never the raw fact",
        tags=("extension", "analytics", "feature-store"),
    )
)


# ---------------------------------------------------------------------------
# marketing touch attribution (round 5)
# ---------------------------------------------------------------------------

_ATTR_WINDOW_S = 86_400  # 24h lookback


def _touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch vs last-touch purchase attribution: each purchase is
    credited to the FIRST and to the LAST view/click by the same user
    in the 24h before it (ties broken by event id), under both models;
    purchases with no touch in-window report as 'none'. The revenue
    split across touch types is the report marketing pipelines ship.

    Shape at 100 TB: the purchase-touch pairing is the engine's
    bucketed RANGE join (operators/temporal.range_join_pairs — <= 3
    candidate day-buckets per purchase, hash equi-join, never a per-user
    cross product); first/last election is a row_number window
    PARTITIONED per purchase (bounded by that purchase's 24h touches);
    the final aggregate is (2 models x |touch types|) rows."""
    from ..operators.temporal import range_join_pairs

    ev = _events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        "value",
    )
    touches = ev.where(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("ts").alias("t_ts"),
        F.col("event_id").alias("t_id"),
        F.col("event_type").alias("touch_type"),
    )
    pairs = range_join_pairs(
        purchases,
        touches,
        key="user_id",
        left_ts="p_ts",
        right_ts="t_ts",
        lower_s=0,
        upper_s=_ATTR_WINDOW_S,
        left_cols=["p_id"],
        right_cols=["t_id", "touch_type"],
    )
    w_first = Window.partitionBy("p_id").orderBy(
        F.asc("_rts"), F.asc("t_id")
    )
    w_last = Window.partitionBy("p_id").orderBy(
        F.desc("_rts"), F.desc("t_id")
    )
    first_t = (
        pairs.withColumn("rn", F.row_number().over(w_first))
        .where(F.col("rn") == 1)
        .select("p_id", "touch_type")
    )
    last_t = (
        pairs.withColumn("rn", F.row_number().over(w_last))
        .where(F.col("rn") == 1)
        .select("p_id", "touch_type")
    )
    base = purchases.select("p_id", "value")

    def model(name: str, elected: DataFrame) -> DataFrame:
        return base.join(elected, "p_id", "left").select(
            F.lit(name).alias("model"),
            F.coalesce("touch_type", F.lit("none")).alias("touch_type"),
            "value",
        )

    return (
        model("first_touch", first_t)
        .unionByName(model("last_touch", last_t))
        .groupBy("model", "touch_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("model", "touch_type")
    )


register(
    QuerySpec(
        "events_touch_attribution",
        _touch_attribution,
        f"""
WITH p AS (
  SELECT event_id AS p_id, user_id, ts AS p_ts, value
  FROM events WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id, ts AS t_ts, event_id AS t_id, event_type AS touch_type
  FROM events WHERE event_type IN ('view', 'click')
),
pairs AS (
  SELECT p.p_id, t.t_ts, t.t_id, t.touch_type
  FROM p JOIN t USING (user_id)
  WHERE CAST(floor(epoch(p.p_ts)) AS BIGINT)
        - CAST(floor(epoch(t.t_ts)) AS BIGINT)
        BETWEEN 0 AND {_ATTR_WINDOW_S}
),
first_t AS (
  SELECT p_id, touch_type FROM (
    SELECT *, row_number() OVER (PARTITION BY p_id
        ORDER BY t_ts ASC, t_id ASC) AS rn
    FROM pairs) WHERE rn = 1
),
last_t AS (
  SELECT p_id, touch_type FROM (
    SELECT *, row_number() OVER (PARTITION BY p_id
        ORDER BY t_ts DESC, t_id DESC) AS rn
    FROM pairs) WHERE rn = 1
),
attributed AS (
  SELECT 'first_touch' AS model,
         coalesce(f.touch_type, 'none') AS touch_type, p.value
  FROM p LEFT JOIN first_t f USING (p_id)
  UNION ALL
  SELECT 'last_touch', coalesce(l.touch_type, 'none'), p.value
  FROM p LEFT JOIN last_t l USING (p_id)
)
SELECT model, touch_type,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM attributed
GROUP BY model, touch_type
ORDER BY model, touch_type
""",
        doc="First-touch vs last-touch purchase attribution over a 24h "
        "lookback: bucketed range join (<= 3 day-bucket candidates per "
        "purchase), per-purchase election windows, revenue split by "
        "touch type under both models",
        tags=("extension", "analytics", "range-join"),
    )
)


# ---------------------------------------------------------------------------
# bot-traffic audit (round 5)
# ---------------------------------------------------------------------------

_BOT_FAST_GAP_S = 600  # inter-arrival <= 10 min counts as a burst step


def _bot_user_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot/abuse screening over the event log — the log-hygiene filter
    a training pipeline runs before treating user behavior as signal:
    per user, the share of inter-arrival gaps at burst speed (<= 10
    min), reported as the top-10 most burst-heavy users. The per-user
    lag window is key-partitioned (bounded by one user's events); the
    top-10 goes through the lossless per-partition pre-reduction
    (operators/ranking.global_topk), so nothing global ever sorts the
    fact table."""
    from ..operators.ranking import global_topk

    ev = _events(spark, sf_dir).select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        (
            F.unix_timestamp("ts")
            - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap_s"),
    )
    per_user = gaps.groupBy("user_id").agg(
        # one gaps row per EVENT (the user's first has a null gap)
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(
            F.when(F.col("gap_s") <= _BOT_FAST_GAP_S, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_fast_gaps"),
        F.count("gap_s").cast("long").alias("n_gaps"),
    )
    scored = per_user.where(F.col("n_gaps") > 0).select(
        "user_id",
        "n_events",
        "n_fast_gaps",
        F.round(
            F.col("n_fast_gaps").cast("double") / F.col("n_gaps"), 6
        ).alias("fast_ratio_r6"),
    )
    return global_topk(
        scored,
        10,
        F.desc("fast_ratio_r6"),
        F.asc("user_id"),
        alias="rank",
    ).select(
        "user_id", "n_events", "n_fast_gaps", "fast_ratio_r6",
        F.col("rank").cast("long").alias("rank"),
    ).orderBy("rank")


register(
    QuerySpec(
        "events_bot_user_audit",
        _bot_user_audit,
        f"""
WITH g AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT)
         - lag(CAST(floor(epoch(ts)) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
  FROM events
),
per_user AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CASE WHEN gap_s <= {_BOT_FAST_GAP_S} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_fast_gaps,
         count(gap_s) AS n_gaps
  FROM g GROUP BY user_id
)
SELECT user_id, n_events, n_fast_gaps,
       round(CAST(n_fast_gaps AS DOUBLE) / n_gaps, 6) AS fast_ratio_r6,
       CAST(row_number() OVER (ORDER BY
           round(CAST(n_fast_gaps AS DOUBLE) / n_gaps, 6) DESC,
           user_id ASC) AS BIGINT) AS rank
FROM per_user WHERE n_gaps > 0
QUALIFY rank <= 10
ORDER BY rank
""",
        doc="Bot/abuse screening: per-user share of burst-speed "
        "inter-arrival gaps (<= 10 min) via key-partitioned lag "
        "windows, top-10 burst-heavy users through the lossless "
        "pre-reduced global ranking",
        tags=("extension", "analytics", "quality"),
    )
)
