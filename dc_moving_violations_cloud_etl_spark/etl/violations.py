"""Violations transform pipeline: the reference's ETL row-shredding
(reference etl/daily_load/violation_etl_daily.py:227-278 ``transform_row``
and etl/full_load/violation_etl_history.py:105-124 per-feature projection)
re-expressed as one declarative projection over the fixture fact tables.

Every reference C-operator (SURVEY.md §2.C) appears here as a Column
expression: synthetic key (C5), month bucket (C6), safe casts (C3),
timestamp derivation (C4), field projection (C1/C2), non-empty-key filter
(D1). No Python runs per row — the whole transform is one
whole-stage-codegen'd projection over the lineitem⋈orders join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..expressions import month_bucket, synthetic_violation_id


def issue_timestamp() -> F.Column:
    """Fixture shipdates are midnight-only; spread deterministic
    hour/minute offsets so the hour-of-day profile (Qg,
    reference sql/analysis_queries.sql:67-80) has all 24 buckets.
    Offsets < 24h keep the calendar date unchanged."""
    return F.col("l_shipdate") + F.make_interval(
        hours=(F.col("l_orderkey") % 24).cast("int"),
        mins=(F.col("l_partkey") % 60).cast("int"),
    )


def violation_desc() -> F.Column:
    """Deterministic description classes covering the Qf LIKE surface
    (reference sql/analysis_queries.sql:59-61): '%MPH OVER%' matches plus
    both excluded variants plus non-speeding classes."""
    q = F.col("l_quantity")
    return (
        F.when(q <= 10, F.lit("SPEED UP TO TEN MPH OVER THE LIMIT"))
        .when(q <= 20, F.lit("SPEED 1-10 MPH OVER THE LIMIT"))
        .when(q <= 30, F.lit("SPEED 11-15 MPH OVER THE LIMIT"))
        .when(q <= 40, F.lit("SPEED 16-20 MPH OVER THE LIMIT"))
        .when(q <= 45, F.lit("FAIL TO STOP PER REGULATIONS FACING RED SIGNAL"))
        .otherwise(F.lit("PASSING STOP SIGN WITHOUT COMING TO A COMPLETE STOP"))
    )


def build_violations(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """lineitem ⋈ orders → the authoritative 13-column violations schema
    (reference etl/full_load/violation_etl_history.py:46-60).

    Join note: orders is the smaller side; locally Catalyst broadcasts it.
    At 100 TB both sides are fact-sized → AQE picks sort-merge on
    l_orderkey; pre-bucketing both tables on orderkey would eliminate the
    shuffle entirely (see operators/sinks.py for the bucketed-layout
    writer).
    """
    issue = issue_timestamp()
    month = month_bucket(issue)
    v = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"), "inner")
        .select(
            # reference key scheme is '{month}_{objectid}'
            # (violation_etl_daily.py:247-248); the fixture lacks a single
            # unique int — (orderkey,linenumber) alone collides — so the
            # object-id part is the unique natural key
            # (orderkey*8+linenumber, partkey, shipdate)
            synthetic_violation_id(
                month,
                F.concat_ws(
                    "_",
                    (F.col("l_orderkey") * 8 + F.col("l_linenumber")).cast("string"),
                    F.col("l_partkey").cast("string"),
                    F.date_format(issue, "yyyyMMdd"),
                ),
            ).alias("violation_id"),
            issue.alias("issue_date"),
            F.to_date(issue).alias("violation_date"),
            F.col("o_orderpriority").alias("issuing_agency_name"),
            # three-valued indicator for Qh's NULL-aware branch
            # (reference sql/analysis_queries.sql:85-87)
            F.when(F.col("l_returnflag") == "R", F.lit("Y"))
            .when(F.col("l_returnflag") == "A", F.lit("N"))
            .alias("accident_indicator"),
            F.concat(
                F.lit("BLK "),
                (F.col("l_suppkey") * 100).cast("string"),
                F.lit(" MAIN ST NW"),
            ).alias("location"),
            F.concat(F.lit("T"), (100 + F.col("l_partkey") % 900).cast("string")).alias(
                "violation_code"
            ),
            violation_desc().alias("violation_desc"),
            # NULLs present (to_float_safe semantics,
            # reference etl/daily_load/violation_etl_daily.py:201-210)
            F.when(F.col("l_discount") < 0.1, F.col("l_extendedprice")).alias(
                "fine_amount"
            ),
            # decimal-exact product cast back to double: double round() is
            # engine-dependent at midpoints, decimal arithmetic is not
            F.when(
                F.col("l_tax") < 0.08,
                (
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
                ).cast("double"),
            ).alias("total_paid"),
            (F.lit(38.9) + F.col("l_discount")).alias("latitude"),
            (F.lit(-77.0) - F.col("l_tax")).alias("longitude"),
            month.alias("month"),
        )
        # D1 non-empty-key guard (reference violation_etl_history.py:124)
        .where(F.length(F.col("violation_id")) > 0)
    )
    return v
