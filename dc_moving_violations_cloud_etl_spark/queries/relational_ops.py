"""Relational-completeness operators (round 3): full-outer
reconciliation, set operations (EXCEPT / INTERSECT), wide→long unpivot,
and exact-quantile bucket assignment.

The reference's query surface uses exactly one join type (inner) and no
set operations (SURVEY.md §2.E/H); these close out the relational
matrix a user migrating real workloads onto the engine reaches for
next. All shapes pre-aggregate before any join/window; the quantile
assignment broadcasts four scalar thresholds instead of globally
sorting the table (the classic ntile trap at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from .registry import QuerySpec, register


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return catalog.base(spark, sf_dir, "events")


# ---------------------------------------------------------------------------
# full-outer reconciliation: event actors vs customer dimension
# ---------------------------------------------------------------------------


def _full_outer_recon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided reconciliation via FULL OUTER join of the per-user
    event aggregate against the customer dimension: every row falls in
    exactly one of {both, events_only, customer_only}. Both inputs are
    pre-aggregated/keyed before the join, so the full outer runs over
    |users| + |customers| rows, not the fact table."""
    per_user = (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    cust = catalog.base(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment")
    )
    j = per_user.join(cust, "user_id", "full_outer")
    status = (
        F.when(
            F.col("n_events").isNotNull() & F.col("c_mktsegment").isNotNull(),
            F.lit("both"),
        )
        .when(F.col("n_events").isNotNull(), F.lit("events_only"))
        .otherwise(F.lit("customer_only"))
    )
    return (
        j.groupBy(status.alias("presence"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.coalesce(F.sum("n_events"), F.lit(0))
            .cast("long")
            .alias("n_events"),
        )
        .orderBy("presence")
    )


register(
    QuerySpec(
        "full_outer_reconciliation",
        _full_outer_recon,
        """
WITH per_user AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id
)
SELECT CASE
         -- side presence by PAYLOAD columns, not key nullness: the
         -- events side can contribute a NULL-user aggregate row whose
         -- KEY is NULL yet whose side is present - key-as-proxy
         -- misfiled it as customer_only (r11 dirty-fixture alignment;
         -- matches the Spark twin's n_events/mktsegment test)
         WHEN p.n_events IS NOT NULL AND c.c_mktsegment IS NOT NULL
           THEN 'both'
         WHEN p.n_events IS NOT NULL THEN 'events_only'
         ELSE 'customer_only'
       END AS presence,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(coalesce(sum(p.n_events), 0) AS BIGINT) AS n_events
FROM per_user p
FULL OUTER JOIN customer c ON p.user_id = c.c_custkey
GROUP BY 1 ORDER BY 1
""",
        doc="two-sided reconciliation via FULL OUTER join of keyed "
        "pre-aggregates (both / events_only / customer_only counts)",
        tags=("extension", "relational", "full-outer"),
    )
)


# ---------------------------------------------------------------------------
# set operations: EXCEPT / INTERSECT over behavioral key sets
# ---------------------------------------------------------------------------


def _set_ops_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral segmentation with set operators: clickers EXCEPT
    purchasers, clickers INTERSECT purchasers, and the symmetric
    difference — each a distinct-key set operation (Spark plans
    EXCEPT/INTERSECT as left-anti / left-semi over distincts; keys-only
    projections keep the shuffles narrow)."""
    ev = _events(spark, sf_dir)
    clickers = ev.where(F.col("event_type") == "click").select("user_id")
    buyers = ev.where(F.col("event_type") == "purchase").select("user_id")
    # subtract/intersect are the SET-semantics operators (SQL EXCEPT /
    # INTERSECT [DISTINCT]); exceptAll would be bag semantics and only
    # remove one occurrence per match
    click_not_buy = clickers.subtract(buyers)
    buy_not_click = buyers.subtract(clickers)
    both = clickers.intersect(buyers)
    return (
        click_not_buy.agg(
            F.count(F.lit(1)).cast("long").alias("n_click_only")
        )
        .crossJoin(
            both.agg(F.count(F.lit(1)).cast("long").alias("n_click_and_buy"))
        )
        .crossJoin(
            buy_not_click.agg(
                F.count(F.lit(1)).cast("long").alias("n_buy_only")
            )
        )
    )


register(
    QuerySpec(
        "set_ops_user_segments",
        _set_ops_audit,
        """
WITH clickers AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
),
buyers AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
)
SELECT
  CAST((SELECT count(*) FROM (SELECT * FROM clickers EXCEPT
                              SELECT * FROM buyers)) AS BIGINT)
    AS n_click_only,
  CAST((SELECT count(*) FROM (SELECT * FROM clickers INTERSECT
                              SELECT * FROM buyers)) AS BIGINT)
    AS n_click_and_buy,
  CAST((SELECT count(*) FROM (SELECT * FROM buyers EXCEPT
                              SELECT * FROM clickers)) AS BIGINT)
    AS n_buy_only
""",
        doc="set-operator segmentation: EXCEPT / INTERSECT over distinct "
        "behavioral key sets (planned as anti/semi joins)",
        tags=("extension", "relational", "set-ops"),
    )
)


# ---------------------------------------------------------------------------
# unpivot (wide -> long) of a daily metrics table
# ---------------------------------------------------------------------------


def _unpivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trips the pivot: build the wide per-day table (one column
    per event type), then ``unpivot`` back to (day, metric, value) long
    form — the melt step feature stores and plotting layers need. The
    unpivot is a zero-shuffle Expand over the already-tiny wide table."""
    ev = _events(spark, sf_dir)
    wide = (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("event_day"))
        .pivot(
            "event_type", ["click", "error", "purchase", "signup", "view"]
        )
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
    long = wide.unpivot(
        ids=["event_day"],
        values=["click", "error", "purchase", "signup", "view"],
        variableColumnName="metric",
        valueColumnName="n",
    )
    return long.select(
        "event_day", "metric", F.col("n").cast("long").alias("n")
    ).orderBy("event_day", "metric")


register(
    QuerySpec(
        "events_unpivot_daily_metrics",
        _unpivot_daily,
        """
WITH wide AS (
  SELECT strftime(ts, '%Y-%m-%d') AS event_day,
         CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT)
           AS click,
         CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT)
           AS error,
         CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
           AS purchase,
         CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT)
           AS signup,
         CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT)
           AS view
  FROM events GROUP BY 1
)
SELECT event_day, metric, n
FROM wide
UNPIVOT (n FOR metric IN (click, error, purchase, signup, view))
ORDER BY event_day, metric
""",
        doc="pivot round-trip: explicit-value pivot to the wide daily "
        "table, unpivot (Expand, zero shuffle) back to long form",
        tags=("extension", "relational", "unpivot"),
    )
)


# ---------------------------------------------------------------------------
# exact-quantile bucket assignment without a global sort
# ---------------------------------------------------------------------------


def _quartile_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document a length quartile WITHOUT the global-sort
    ntile trap: compute the three exact interior quartile boundaries as
    one scalar aggregate (sort-based exact ``percentile``, fine at
    fixture scale; approx_percentile is the drop-in at 100 TB), then
    broadcast-join the 1-row threshold table and assign with a
    when-chain — the fact table is never globally sorted or
    single-partitioned."""
    docs = catalog.base(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("double").alias("len")
    )
    thresholds = docs.agg(
        F.expr("percentile(len, 0.25)").alias("q1"),
        F.expr("percentile(len, 0.5)").alias("q2"),
        F.expr("percentile(len, 0.75)").alias("q3"),
    )
    bucket = (
        F.when(F.col("len") <= F.col("q1"), F.lit(1))
        .when(F.col("len") <= F.col("q2"), F.lit(2))
        .when(F.col("len") <= F.col("q3"), F.lit(3))
        .otherwise(F.lit(4))
    )
    return (
        docs.crossJoin(F.broadcast(thresholds))
        .select("doc_id", "len", bucket.alias("quartile"))
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("len").alias("min_len"),
            F.max("len").alias("max_len"),
        )
        .orderBy("quartile")
    )


register(
    QuerySpec(
        "doc_length_quartile_assignment",
        _quartile_assignment,
        """
WITH thresholds AS (
  SELECT quantile_cont(CAST(n_chars AS DOUBLE), 0.25) AS q1,
         quantile_cont(CAST(n_chars AS DOUBLE), 0.5)  AS q2,
         quantile_cont(CAST(n_chars AS DOUBLE), 0.75) AS q3
  FROM documents
),
assigned AS (
  SELECT d.doc_id, CAST(d.n_chars AS DOUBLE) AS len,
         CASE WHEN d.n_chars <= t.q1 THEN 1
              WHEN d.n_chars <= t.q2 THEN 2
              WHEN d.n_chars <= t.q3 THEN 3
              ELSE 4 END AS quartile
  FROM documents d CROSS JOIN thresholds t
)
SELECT quartile,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(len) AS min_len,
       max(len) AS max_len
FROM assigned
GROUP BY quartile ORDER BY quartile
""",
        doc="exact-quantile bucket assignment via a broadcast 1-row "
        "threshold table + when-chain — no global sort / single "
        "partition anywhere (the ntile trap)",
        tags=("extension", "curation", "quantile-bucketing"),
    )
)


# ---------------------------------------------------------------------------
# nested arrays-of-structs: reassembly + higher-order-function processing
# ---------------------------------------------------------------------------


def _nested_hof_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-data cell: lineitems are REASSEMBLED into one
    array-of-structs per order (the document shape a JSON/VARIANT
    pipeline carries) and every per-order metric is then computed with
    higher-order functions over the nested column — ``size``/``filter``
    / ``transform``/``aggregate`` with an exact integer-cents
    accumulator — never by re-flattening. The oracle computes the same
    metrics RELATIONALLY from the flat table, so the green row proves
    the nested pipeline is semantics-preserving (reassembly loses no
    rows; the HOF fold equals the relational aggregate).

    Scale posture: the reassembly is one groupBy(orderkey) collect_list
    — the shuffle any per-entity nesting costs; all HOF evaluation is
    JVM codegen over the array column with no explode and no second
    shuffle. Orders with < 4 lines are filtered (inside the HOF
    pipeline) to keep the checked output compact."""
    li = catalog.base(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("long")
        .alias("cents"),
    )
    nested = li.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct("l_linenumber", "l_quantity", "cents")
        ).alias("lines")
    )
    return (
        nested.select(
            F.col("l_orderkey").alias("order_key"),
            F.size("lines").cast("long").alias("n_lines"),
            F.size(
                F.filter("lines", lambda l: l["l_quantity"] > 25)
            )
            .cast("long")
            .alias("n_bulk_lines"),
            F.aggregate(
                "lines",
                F.lit(0).cast("long"),
                lambda acc, l: acc + l["cents"],
            ).alias("total_cents"),
            F.array_max(
                F.transform("lines", lambda l: l["cents"])
            ).alias("max_line_cents"),
        )
        .where(F.col("n_lines") >= 4)
        .orderBy("order_key")
    )


register(
    QuerySpec(
        "nested_hof_order_amounts",
        _nested_hof_orders,
        """
SELECT l_orderkey AS order_key,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bulk_lines,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents,
       CAST(max(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS max_line_cents
FROM lineitem
GROUP BY l_orderkey
HAVING count(*) >= 4
ORDER BY order_key
""",
        doc="nested arrays-of-structs: per-order reassembly + "
        "size/filter/transform/aggregate HOFs with an exact "
        "integer-cents fold, proven equal to the relational "
        "computation over the flat table",
        tags=("extension", "relational", "nested", "hof"),
    )
)
