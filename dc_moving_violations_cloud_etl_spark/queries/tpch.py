"""TPC-H-derived analytical pack over the driver's star-schema fixtures
(the `region nation customer supplier orders lineitem` tables ARE
reduced TPC-H): all 22 queries adapted to the fixture's columns and
1995-2001 date window. The fixture has no partsupp table, so Q2, Q9,
Q11, Q16 and Q20 run against a derived partsupp CTE (identical on both
engines); Q12 and Q21 substitute the return flag for the missing
shipmode/commit/receipt columns — every adaptation keeps the query's
defining plan shape (correlated scalar MIN, HAVING over a global
aggregate, nested IN with correlated SUM, double-correlated
EXISTS/NOT EXISTS).

These exercise the multi-way-join side of the engine the reference's
two-table surface never reaches: Q5 is a six-way star join (Catalyst
reorders it into broadcast cascades over the small dims), Q3/Q10 are
join + top-k revenue rankings, Q1/Q6 are the canonical scan-heavy
aggregations. Revenue math runs in DECIMAL(18,2) on both engines
(`expressions.exact_decimal_sum` pattern) so double-accumulation order
can never break the oracle hash.

Scale posture: every query is pure built-ins; the dims broadcast, the
fact scan carries pushed date/flag predicates, aggregates are
partial+final hash aggs, top-k is TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from .registry import QuerySpec, register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return catalog.base(spark, sf_dir, name)


def _dec(c: str):
    return F.col(c).cast("decimal(18,2)")


# revenue term, exact in both engines: DECIMAL(18,2) product arithmetic
def _revenue():
    return _dec("l_extendedprice") * (
        F.lit("1.00").cast("decimal(18,2)") - _dec("l_discount")
    )


_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST('1.00' AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)


# ---------------------------------------------------------------------------
# Q1: pricing summary report
# ---------------------------------------------------------------------------

Q1_CUTOFF = "2001-08-06"  # fixture max shipdate - ~90 days


def _q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit(Q1_CUTOFF)
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice"))
            .cast("double")
            .alias("sum_base_price"),
            F.sum(_revenue()).cast("double").alias("sum_disc_price"),
            F.sum(
                _revenue()
                * (F.lit("1.00").cast("decimal(18,2)") + _dec("l_tax"))
            )
            .cast("double")
            .alias("sum_charge"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
        .withColumn(
            "avg_qty", F.round(F.col("sum_qty") / F.col("count_order"), 6)
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


register(
    QuerySpec(
        "tpch_q1_pricing_summary",
        _q1,
        f"""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_base_price,
       CAST(sum({_REV_SQL}) AS DOUBLE) AS sum_disc_price,
       CAST(sum({_REV_SQL}
             * (CAST('1.00' AS DECIMAL(18,2))
                + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
       CAST(count(*) AS BIGINT) AS count_order,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             / count(*), 6) AS avg_qty
FROM lineitem
WHERE l_shipdate <= DATE '{Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
        doc="TPC-H Q1 pricing summary (scan-heavy grouped aggregate; all "
        "money math in DECIMAL(18,2) so hashes are order-independent)",
        tags=("extension", "tpch", "aggregation"),
    )
)


# ---------------------------------------------------------------------------
# Q3: shipping-priority revenue ranking
# ---------------------------------------------------------------------------

Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-01-01"


def _q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == Q3_SEGMENT
    )
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit(Q3_DATE)
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit(Q3_DATE)
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        )
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


register(
    QuerySpec(
        "tpch_q3_shipping_priority",
        _q3,
        f"""
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < DATE '{Q3_DATE}'
  AND l_shipdate > DATE '{Q3_DATE}'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
        doc="TPC-H Q3 shipping priority (3-way join, revenue top-10 with "
        "deterministic tiebreak; customer side broadcast)",
        tags=("extension", "tpch", "join-topk"),
    )
)


# ---------------------------------------------------------------------------
# Q5: local supplier volume (six-way star join)
# ---------------------------------------------------------------------------

Q5_REGION = "ASIA"
Q5_START, Q5_END = "1996-01-01", "1997-01-01"


def _q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(Q5_START))
        & (F.col("o_orderdate") < F.lit(Q5_END))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == Q5_REGION)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("n_name"))
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


register(
    QuerySpec(
        "tpch_q5_local_supplier_volume",
        _q5,
        f"""
SELECT n_name, CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = '{Q5_REGION}'
  AND o_orderdate >= DATE '{Q5_START}'
  AND o_orderdate < DATE '{Q5_END}'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
        doc="TPC-H Q5 local supplier volume: SIX-way star join (Catalyst "
        "reorders; nation/region broadcast; same-nation customer-"
        "supplier condition folded into the supplier join)",
        tags=("extension", "tpch", "multiway-join"),
    )
)


# ---------------------------------------------------------------------------
# Q6: forecasting revenue change
# ---------------------------------------------------------------------------

Q6_START, Q6_END = "1996-01-01", "1997-01-01"
Q6_DISC_LO, Q6_DISC_HI = "0.05", "0.07"
Q6_QTY = 24


def _q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit(Q6_START))
        & (F.col("l_shipdate") < F.lit(Q6_END))
        & (_dec("l_discount") >= F.lit(Q6_DISC_LO).cast("decimal(18,2)"))
        & (_dec("l_discount") <= F.lit(Q6_DISC_HI).cast("decimal(18,2)"))
        & (F.col("l_quantity") < Q6_QTY)
    ).agg(
        F.sum(_dec("l_extendedprice") * _dec("l_discount"))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


register(
    QuerySpec(
        "tpch_q6_forecast_revenue",
        _q6,
        f"""
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= DATE '{Q6_START}'
  AND l_shipdate < DATE '{Q6_END}'
  AND CAST(l_discount AS DECIMAL(18,2))
        BETWEEN CAST('{Q6_DISC_LO}' AS DECIMAL(18,2))
            AND CAST('{Q6_DISC_HI}' AS DECIMAL(18,2))
  AND l_quantity < {Q6_QTY}
""",
        doc="TPC-H Q6 forecast revenue (pure pushed-predicate scan + "
        "single aggregate; discount compared in DECIMAL to avoid double "
        "boundary ambiguity)",
        tags=("extension", "tpch", "scan-agg"),
    )
)


# ---------------------------------------------------------------------------
# Q10: returned-item reporting
# ---------------------------------------------------------------------------

Q10_START, Q10_END = "1996-01-01", "1996-04-01"


def _q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(Q10_START))
        & (F.col("o_orderdate") < F.lit(Q10_END))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(_revenue()).cast("double").alias("revenue"),
            F.max(_dec("c_acctbal")).cast("double").alias("c_acctbal"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


register(
    QuerySpec(
        "tpch_q10_returned_items",
        _q10,
        f"""
SELECT c_custkey, c_name, n_name,
       CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue,
       CAST(max(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS c_acctbal
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate >= DATE '{Q10_START}'
  AND o_orderdate < DATE '{Q10_END}'
  AND l_returnflag = 'R'
  AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
        doc="TPC-H Q10 returned items (4-way join, revenue top-20 per "
        "customer with deterministic tiebreak)",
        tags=("extension", "tpch", "join-topk"),
    )
)


# ---------------------------------------------------------------------------
# Q4 (adapted): order-priority checking via correlated EXISTS
# ---------------------------------------------------------------------------

Q4_START, Q4_END = "1996-07-01", "1996-10-01"


def _q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-EXISTS shape (the fixture lacks commit/receipt dates,
    so 'late' = any line shipped after the order date): Catalyst
    decorrelates the subquery into a left-semi join on the order key."""
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(Q4_START))
        & (F.col("o_orderdate") < F.lit(Q4_END))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).where(F.col("l_shipdate") > F.col("o_orderdate")).select("l_orderkey")
    return (
        orders.join(
            late, orders.o_orderkey == late.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


register(
    QuerySpec(
        "tpch_q4_order_priority",
        _q4,
        f"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= DATE '{Q4_START}'
  AND o_orderdate < DATE '{Q4_END}'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
        doc="TPC-H Q4 (adapted: late = shipped after order date): "
        "correlated EXISTS decorrelated to a left-semi join on the "
        "order key",
        tags=("extension", "tpch", "semi-join"),
    )
)


# ---------------------------------------------------------------------------
# Q14: promotion-effect revenue share
# ---------------------------------------------------------------------------

Q14_START, Q14_END = "1996-03-01", "1996-04-01"


def _q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q14_START))
        & (F.col("l_shipdate") < F.lit(Q14_END))
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    promo = F.when(
        F.col("p_type").like("PROMO%"), _revenue()
    ).otherwise(F.lit("0.00").cast("decimal(18,2)"))
    return j.agg(
        F.round(
            F.lit(100.0)
            * F.sum(promo).cast("double")
            / F.sum(_revenue()).cast("double"),
            6,
        ).alias("promo_revenue_pct"),
        F.sum(_revenue()).cast("double").alias("total_revenue"),
    )


register(
    QuerySpec(
        "tpch_q14_promo_effect",
        _q14,
        f"""
SELECT round(100.0
         * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                         THEN {_REV_SQL}
                         ELSE CAST('0.00' AS DECIMAL(18,2)) END) AS DOUBLE)
         / CAST(sum({_REV_SQL}) AS DOUBLE), 6) AS promo_revenue_pct,
       CAST(sum({_REV_SQL}) AS DOUBLE) AS total_revenue
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= DATE '{Q14_START}'
  AND l_shipdate < DATE '{Q14_END}'
""",
        doc="TPC-H Q14 promotion effect: broadcast part join + "
        "conditional decimal revenue share (the LIKE-driven CASE "
        "aggregate shape)",
        tags=("extension", "tpch", "conditional-agg"),
    )
)


# ---------------------------------------------------------------------------
# Q7: volume shipping between two nations
# ---------------------------------------------------------------------------

Q7_N1, Q7_N2 = "FRANCE", "GERMANY"


def _q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bi-directional two-nation trade volume: supplier nation and
    customer nation resolved through two independent broadcast joins of
    the same tiny dimension (self-alias), yearly rollup."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nk"))
        .where(
            (
                (F.col("supp_nation") == Q7_N1)
                & (F.col("cust_nation") == Q7_N2)
            )
            | (
                (F.col("supp_nation") == Q7_N2)
                & (F.col("cust_nation") == Q7_N1)
            )
        )
    )
    return (
        j.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


register(
    QuerySpec(
        "tpch_q7_nation_volume",
        _q7,
        f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         {_REV_SQL} AS volume
  FROM supplier, lineitem, orders, customer, nation n1, nation n2
  WHERE s_suppkey = l_suppkey
    AND o_orderkey = l_orderkey
    AND c_custkey = o_custkey
    AND s_nationkey = n1.n_nationkey
    AND c_nationkey = n2.n_nationkey
    AND ((n1.n_name = '{Q7_N1}' AND n2.n_name = '{Q7_N2}')
      OR (n1.n_name = '{Q7_N2}' AND n2.n_name = '{Q7_N1}'))
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
        doc="TPC-H Q7 bi-nation trade volume: the same dimension joined "
        "twice under different roles (self-alias broadcasts), "
        "disjunctive nation-pair predicate, yearly rollup",
        tags=("extension", "tpch", "self-join"),
    )
)


# ---------------------------------------------------------------------------
# Q13: customer distribution by order count
# ---------------------------------------------------------------------------


def _q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of customers by order count INCLUDING zero-order
    customers — the left-outer + double-aggregate shape (count per
    customer, then histogram of counts)."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        per.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


register(
    QuerySpec(
        "tpch_q13_customer_distribution",
        _q13,
        """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
        doc="TPC-H Q13 customer order-count distribution: left outer "
        "join keeps zero-order customers, double aggregate histograms "
        "the per-key counts",
        tags=("extension", "tpch", "outer-join"),
    )
)


# ---------------------------------------------------------------------------
# Q18: large-volume customers (HAVING + IN subquery)
# ---------------------------------------------------------------------------

Q18_QTY = 250


def _q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("sum_qty"))
        .where(F.col("sum_qty") > F.lit(Q18_QTY).cast("decimal(18,2)"))
        .select("l_orderkey")
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        li.join(
            F.broadcast(big), "l_orderkey", "left_semi"
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            _dec("o_totalprice").cast("double").alias("o_totalprice"),
        )
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


register(
    QuerySpec(
        "tpch_q18_large_volume_customers",
        _q18,
        f"""
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey
    HAVING sum(CAST(l_quantity AS DECIMAL(18,2)))
             > CAST('{Q18_QTY}' AS DECIMAL(18,2)))
  AND c_custkey = o_custkey
  AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""",
        doc="TPC-H Q18 large-volume customers: HAVING-filtered IN "
        "subquery planned as a broadcast semi-join on the order key",
        tags=("extension", "tpch", "having-in"),
    )
)


# ---------------------------------------------------------------------------
# Q19: disjunctive bracket predicates
# ---------------------------------------------------------------------------


def _q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three OR-ed predicate brackets over the part join — the shape
    that stresses predicate normalization (Catalyst pushes the common
    p_partkey = l_partkey conjunct below the OR)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    bracket = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity") >= 1)
            & (F.col("l_quantity") <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size").between(10, 25))
            & (F.col("l_quantity") >= 10)
            & (F.col("l_quantity") <= 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(20, 40))
            & (F.col("l_quantity") >= 20)
            & (F.col("l_quantity") <= 40)
        )
    )
    return j.where(bracket).agg(
        F.sum(_revenue()).cast("double").alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


register(
    QuerySpec(
        "tpch_q19_bracket_predicates",
        _q19,
        f"""
SELECT CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        AND l_quantity BETWEEN 1 AND 20)
    OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 25
        AND l_quantity BETWEEN 10 AND 30)
    OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 40
        AND l_quantity BETWEEN 20 AND 40))
""",
        doc="TPC-H Q19 disjunctive bracket predicates over the part "
        "join (common join conjunct pushed below the OR)",
        tags=("extension", "tpch", "disjunctive"),
    )
)


# ---------------------------------------------------------------------------
# Q22 (adapted): rich customers with no orders
# ---------------------------------------------------------------------------

# ~top-3% of o_totalprice: every fixture customer has SOME order, so the
# anti-join runs against high-value orders to stay non-trivial
Q22_BIG_ORDER = 460000


def _q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-scalar subquery + anti-join: customers with above-average
    positive account balance and NO orders (the fixture lacks phone
    country codes, so the cntrycode grouping becomes the customer's
    nation; every fixture customer has SOME order, so 'no orders'
    becomes 'no high-value order' — the NOT EXISTS anti-join gains a
    pushed o_totalprice predicate and the result stays non-trivial,
    ~300 customers at sf0.01).

    ``bal > avg(positive bal)`` is cross-multiplied to the exact
    ``bal * count > sum`` in DECIMAL so the threshold can never differ
    between Spark's rounded decimal avg and DuckDB's double avg
    (ADVICE r3)."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey"), F.col("n_name")
    )
    pos_stats = (
        cust.where(_dec("c_acctbal") > F.lit("0.00").cast("decimal(18,2)"))
        .agg(
            F.sum(_dec("c_acctbal")).alias("pos_sum"),
            F.count(F.lit(1)).cast("long").alias("pos_cnt"),
        )
    )
    big_orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > Q22_BIG_ORDER)
        .select("o_custkey")
    )
    rich = (
        cust.crossJoin(F.broadcast(pos_stats))
        .where(_dec("c_acctbal") * F.col("pos_cnt") > F.col("pos_sum"))
        .join(big_orders, cust.c_custkey == big_orders.o_custkey, "left_anti")
    )
    return (
        rich.join(F.broadcast(nation), rich.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("n_name")
    )


register(
    QuerySpec(
        "tpch_q22_rich_inactive_customers",
        _q22,
        f"""
WITH pos AS (
  SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS pos_sum,
         count(*) AS pos_cnt
  FROM customer
  WHERE CAST(c_acctbal AS DECIMAL(18,2)) > CAST('0.00' AS DECIMAL(18,2))
)
SELECT n.n_name,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
         AS totacctbal
FROM customer c, nation n, pos
WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * pos.pos_cnt > pos.pos_sum
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_totalprice > {Q22_BIG_ORDER})
  AND c.c_nationkey = n.n_nationkey
GROUP BY n.n_name ORDER BY n.n_name
""",
        doc="TPC-H Q22 (adapted: nation for cntrycode): global-scalar "
        "subquery + NOT EXISTS anti-join + grouped rollup (threshold "
        "cross-multiplied to exact decimals, no rounded avg)",
        tags=("extension", "tpch", "anti-join-scalar"),
    )
)


# ---------------------------------------------------------------------------
# Q8: national market share
# ---------------------------------------------------------------------------

Q8_NATION, Q8_REGION = "BRAZIL", "AMERICA"


def _q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market share of one nation's suppliers within a region's
    customer base, per order year — conditional-aggregate ratio over a
    five-table join with the nation dimension again in two roles."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n_cust = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n_supp = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == Q8_REGION)
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_cust), cust.c_nationkey == F.col("cn_key"))
        .join(
            F.broadcast(region), F.col("cn_region") == region.r_regionkey
        )
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_supp), supp.s_nationkey == F.col("sn_key"))
    )
    vol = _revenue()
    national = F.when(F.col("supp_nation") == Q8_NATION, vol).otherwise(
        F.lit("0.00").cast("decimal(18,2)")
    )
    return (
        j.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(national).cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("mkt_share"),
            F.sum(vol).cast("double").alias("total_volume"),
        )
        .orderBy("o_year")
    )


register(
    QuerySpec(
        "tpch_q8_market_share",
        _q8,
        f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(CAST(sum(CASE WHEN n2.n_name = '{Q8_NATION}'
                           THEN {_REV_SQL}
                           ELSE CAST('0.00' AS DECIMAL(18,2)) END)
                  AS DOUBLE)
             / CAST(sum({_REV_SQL}) AS DOUBLE), 6) AS mkt_share,
       CAST(sum({_REV_SQL}) AS DOUBLE) AS total_volume
FROM lineitem, orders, customer, supplier, nation n1, nation n2, region
WHERE l_orderkey = o_orderkey
  AND o_custkey = c_custkey
  AND c_nationkey = n1.n_nationkey
  AND n1.n_regionkey = r_regionkey
  AND r_name = '{Q8_REGION}'
  AND l_suppkey = s_suppkey
  AND s_nationkey = n2.n_nationkey
GROUP BY o_year ORDER BY o_year
""",
        doc="TPC-H Q8 national market share: conditional decimal ratio "
        "per order year over a five-table join, nation dimension in two "
        "roles",
        tags=("extension", "tpch", "market-share"),
    )
)


# ---------------------------------------------------------------------------
# Q15: top supplier (scalar-max subquery over an aggregate view)
# ---------------------------------------------------------------------------

Q15_START, Q15_END = "1996-01-01", "1996-04-01"


def _q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q15_START))
        & (F.col("l_shipdate") < F.lit(Q15_END))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_revenue()).alias("total_rev_dec")
    )
    mx = rev.agg(F.max("total_rev_dec").alias("mx"))
    supp = _t(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_rev_dec") == F.col("mx"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev_dec").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


register(
    QuerySpec(
        "tpch_q15_top_supplier",
        _q15,
        f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, sum({_REV_SQL}) AS total_rev_dec
  FROM lineitem
  WHERE l_shipdate >= DATE '{Q15_START}'
    AND l_shipdate < DATE '{Q15_END}'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       CAST(total_rev_dec AS DOUBLE) AS total_revenue
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_rev_dec = (SELECT max(total_rev_dec) FROM revenue)
ORDER BY s_suppkey
""",
        doc="TPC-H Q15 top supplier: scalar-max subquery over the "
        "revenue aggregate (decimal-exact equality, so ties are "
        "engine-independent)",
        tags=("extension", "tpch", "scalar-subquery"),
    )
)


# ---------------------------------------------------------------------------
# Q17: small-quantity-order revenue (correlated per-part average)
# ---------------------------------------------------------------------------

Q17_BRAND = "Brand#1"


def _q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lines whose quantity is below 20% of their PART's average
    quantity — the correlated aggregate decorrelates into a per-part
    aggregate joined back on the part key (never a per-row subquery).

    The threshold compare is algebraically exact on both engines:
    ``qty < 0.2 * avg(qty)`` is rewritten as ``5 * qty * count <
    sum(qty)`` in DECIMAL — no rounded average whose last digit could
    differ between Spark's decimal avg and DuckDB's double avg
    (ADVICE r3)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(
        F.col("p_brand") == Q17_BRAND
    ).select("p_partkey")
    per_part = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(9,2)")).alias(
                "part_sum_qty"
            ),
            F.count(F.lit(1)).cast("long").alias("part_cnt_qty"),
        )
    )
    small = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part, "l_partkey")
        .where(
            F.lit(5) * F.col("l_quantity").cast("decimal(9,2)")
            * F.col("part_cnt_qty")
            < F.col("part_sum_qty")
        )
    )
    return small.agg(
        F.round(
            F.sum(_dec("l_extendedprice")).cast("double") / 7.0, 6
        ).alias("avg_yearly"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


register(
    QuerySpec(
        "tpch_q17_small_quantity_revenue",
        _q17,
        f"""
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0, 6) AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l, part
WHERE p_partkey = l.l_partkey
  AND p_brand = '{Q17_BRAND}'
  AND 5 * CAST(l.l_quantity AS DECIMAL(9,2))
      * (SELECT count(*) FROM lineitem l2
         WHERE l2.l_partkey = l.l_partkey)
    < (SELECT sum(CAST(l2.l_quantity AS DECIMAL(9,2)))
       FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
""",
        doc="TPC-H Q17 small-quantity revenue: correlated per-part "
        "average decorrelated to an aggregate join-back on the part key "
        "(threshold cross-multiplied to exact decimals, no rounded avg)",
        tags=("extension", "tpch", "correlated-agg"),
    )
)


# ---------------------------------------------------------------------------
# Derived partsupp: the fixture has no partsupp table, so the five
# partsupp-dependent queries (Q2, Q9, Q11, Q16, Q20) run against a
# part×supplier relation aggregated from lineitem — supplycost is the
# cheapest observed extended price, availqty the total shipped quantity.
# The POINT of these queries is the subquery/decorrelation shape
# (correlated scalar min, HAVING over a global aggregate, nested IN with
# a correlated aggregate), which is preserved exactly; only the base
# relation is derived. Both engines build it from the identical CTE so
# the oracle comparison stays value-exact (DECIMAL everywhere).
# ---------------------------------------------------------------------------

_PS_SQL = """
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         min(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_supplycost,
         sum(CAST(l_quantity AS DECIMAL(9,2))) AS ps_availqty
  FROM lineitem GROUP BY l_partkey, l_suppkey
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(_dec("l_extendedprice")).alias("ps_supplycost"),
        F.sum(F.col("l_quantity").cast("decimal(9,2)")).alias(
            "ps_availqty"
        ),
    )


# ---------------------------------------------------------------------------
# Q2: minimum-cost supplier (correlated scalar MIN against the regional
# partsupp view)
# ---------------------------------------------------------------------------

Q2_SIZE, Q2_TYPE, Q2_REGION = 15, "STANDARD", "EUROPE"


def _q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every STANDARD size-15 part, the EUROPE supplier(s) offering
    its minimum supply cost. The classic correlated scalar-MIN subquery
    decorrelates into a per-part MIN over the region-filtered partsupp,
    joined back on (part, cost) — cost equality is DECIMAL so the
    join-back can never drop a row to float noise. Dims broadcast; the
    derived partsupp aggregates once and serves both sides."""
    ps = _partsupp(spark, sf_dir)
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").where(F.col("r_name") == Q2_REGION)
    part = (
        _t(spark, sf_dir, "part")
        .where((F.col("p_size") == Q2_SIZE) & (F.col("p_type") == Q2_TYPE))
        .select("p_partkey")
    )
    regional = (
        ps.join(supp, ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    )
    min_cost = regional.groupBy("ps_partkey").agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        regional.join(F.broadcast(part), F.col("ps_partkey") == part.p_partkey)
        .join(
            min_cost.withColumnRenamed("ps_partkey", "mc_partkey"),
            (F.col("p_partkey") == F.col("mc_partkey"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            F.col("ps_supplycost").cast("double").alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


register(
    QuerySpec(
        "tpch_q2_min_cost_supplier",
        _q2,
        f"""
WITH partsupp AS ({_PS_SQL})
SELECT s_acctbal, s_name, n_name, p_partkey,
       CAST(ps_supplycost AS DOUBLE) AS supplycost
FROM part, partsupp, supplier, nation, region
WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
  AND p_size = {Q2_SIZE} AND p_type = '{Q2_TYPE}'
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = '{Q2_REGION}'
  AND ps_supplycost = (
    SELECT min(ps_supplycost)
    FROM partsupp ps2, supplier s2, nation n2, region r2
    WHERE ps2.ps_partkey = part.p_partkey AND s2.s_suppkey = ps2.ps_suppkey
      AND s2.s_nationkey = n2.n_nationkey
      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = '{Q2_REGION}')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
        doc="TPC-H Q2 minimum-cost supplier: correlated scalar-MIN "
        "subquery decorrelated to a per-part MIN joined back on "
        "(part, DECIMAL cost) over the derived partsupp",
        tags=("extension", "tpch", "correlated-scalar"),
    )
)


# ---------------------------------------------------------------------------
# Q9: product-type profit by nation and year
# ---------------------------------------------------------------------------

Q9_COLOR = "red"


def _q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit (revenue minus supply cost x quantity) on 'red' parts,
    per supplier nation per order year — the widest join in the pack:
    lineitem x orders x part x supplier x nation x derived partsupp.
    All money math in DECIMAL; part/supplier/nation broadcast, the
    partsupp join-back keys on (partkey, suppkey)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    part = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").like(f"%{Q9_COLOR}%"))
        .select("p_partkey")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey"), F.col("n_name").alias("nation")
    )
    ps = _partsupp(spark, sf_dir).select(
        "ps_partkey", "ps_suppkey", "ps_supplycost"
    )
    amount = _revenue() - F.col("ps_supplycost") * F.col(
        "l_quantity"
    ).cast("decimal(9,2)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            ps,
            (li.l_partkey == ps.ps_partkey)
            & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            "nation", F.year("o_orderdate").cast("long").alias("o_year")
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


register(
    QuerySpec(
        "tpch_q9_product_type_profit",
        _q9,
        f"""
WITH partsupp AS ({_PS_SQL})
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum({_REV_SQL}
                - ps_supplycost * CAST(l_quantity AS DECIMAL(9,2)))
            AS DOUBLE) AS sum_profit
FROM lineitem, orders, part, supplier, nation, partsupp
WHERE l_partkey = p_partkey AND p_name LIKE '%{Q9_COLOR}%'
  AND l_partkey = ps_partkey AND l_suppkey = ps_suppkey
  AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
  AND l_orderkey = o_orderkey
GROUP BY n_name, o_year
ORDER BY n_name, o_year DESC
""",
        doc="TPC-H Q9 product-type profit: six-relation join with the "
        "derived partsupp, DECIMAL profit per nation per order year",
        tags=("extension", "tpch", "star-join"),
    )
)


# ---------------------------------------------------------------------------
# Q11: important stock (HAVING over a global-aggregate scalar subquery)
# ---------------------------------------------------------------------------

Q11_NATION = "NATION_3"
# decimal literal, exact on both engines; sized to the fixture (a
# nation's stock spreads over ~1200 parts, max part share ~0.56%, p90
# ~0.19% — 0.20% keeps the top decile, ~100 rows at sf0.01)
Q11_FRACTION = "0.0020"


def _q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose stock value at one nation's suppliers exceeds a
    fixed fraction of that nation's TOTAL stock value — HAVING against
    a global-aggregate scalar subquery. Decorrelates into one grouped
    aggregate plus a 1-row total broadcast-crossed back; the fraction
    threshold stays DECIMAL end-to-end."""
    ps = _partsupp(spark, sf_dir)
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = (
        _t(spark, sf_dir, "nation")
        .where(F.col("n_name") == Q11_NATION)
        .select("n_nationkey")
    )
    national = (
        ps.join(supp, ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .withColumn(
            "part_value", F.col("ps_supplycost") * F.col("ps_availqty")
        )
    )
    by_part = national.groupBy("ps_partkey").agg(
        F.sum("part_value").alias("value_dec")
    )
    total = by_part.agg(F.sum("value_dec").alias("total_value"))
    return (
        by_part.crossJoin(F.broadcast(total))
        .where(
            F.col("value_dec")
            > F.lit(Q11_FRACTION).cast("decimal(6,4)")
            * F.col("total_value")
        )
        .select(
            "ps_partkey", F.col("value_dec").cast("double").alias("value")
        )
        .orderBy(F.desc("value"), "ps_partkey")
    )


register(
    QuerySpec(
        "tpch_q11_important_stock",
        _q11,
        f"""
WITH partsupp AS ({_PS_SQL})
SELECT ps_partkey,
       CAST(sum(ps_supplycost * ps_availqty) AS DOUBLE) AS value
FROM partsupp, supplier, nation
WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
  AND n_name = '{Q11_NATION}'
GROUP BY ps_partkey
HAVING sum(ps_supplycost * ps_availqty) > (
  SELECT CAST('{Q11_FRACTION}' AS DECIMAL(6,4))
         * sum(ps_supplycost * ps_availqty)
  FROM partsupp, supplier, nation
  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
    AND n_name = '{Q11_NATION}')
ORDER BY value DESC, ps_partkey
""",
        doc="TPC-H Q11 important stock: HAVING over a global-aggregate "
        "scalar subquery, decorrelated to a 1-row broadcast cross-join; "
        "DECIMAL-exact fraction threshold",
        tags=("extension", "tpch", "having-scalar"),
    )
)


# ---------------------------------------------------------------------------
# Q12 (adapted): priority counts per return-flag bucket
# ---------------------------------------------------------------------------

Q12_START, Q12_END = "1997-01-01", "1998-01-01"


def _q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12's shape — conditional two-way counts per shipping bucket
    after an orders join with a one-year date window. The fixture's
    lineitem has no shipmode/commitdate/receiptdate, so the bucket is
    the A/R return flag and the window runs on shipdate; the
    CASE-summed high/low o_orderpriority split is verbatim Q12."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q12_START))
        & (F.col("l_shipdate") < F.lit(Q12_END))
        & (F.col("l_returnflag").isin("A", "R"))
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1))
            .cast("long")
            .alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


register(
    QuerySpec(
        "tpch_q12_priority_by_bucket",
        _q12,
        f"""
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem, orders
WHERE l_orderkey = o_orderkey
  AND l_shipdate >= DATE '{Q12_START}' AND l_shipdate < DATE '{Q12_END}'
  AND l_returnflag IN ('A', 'R')
GROUP BY l_returnflag ORDER BY l_returnflag
""",
        doc="TPC-H Q12 (adapted: return flag for shipmode, shipdate for "
        "receiptdate): conditional high/low priority counts per bucket "
        "over the orders join",
        tags=("extension", "tpch", "conditional-agg"),
    )
)


# ---------------------------------------------------------------------------
# Q16: supplier count per part descriptor (NOT IN exclusion subquery)
# ---------------------------------------------------------------------------

Q16_BRAND = "Brand#5"
Q16_SIZES = (1, 9, 14, 19, 23, 36, 45, 49)


def _q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-supplier counts per (brand, type, size) for parts
    outside one brand/type, over the derived partsupp, EXCLUDING
    blacklisted suppliers via NOT IN — the fixture has no s_comment, so
    the 'customer complaints' blacklist becomes negative-balance
    suppliers. The NOT IN is a broadcast anti-join (the blacklist is
    tiny); count(DISTINCT) shuffles once on the group keys."""
    ps = _partsupp(spark, sf_dir).select("ps_partkey", "ps_suppkey")
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != Q16_BRAND)
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(*Q16_SIZES))
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(bad), ps.ps_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(
            F.countDistinct("ps_suppkey").cast("long").alias("supplier_cnt")
        )
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


register(
    QuerySpec(
        "tpch_q16_supplier_part_count",
        _q16,
        f"""
WITH partsupp AS ({_PS_SQL})
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
FROM partsupp, part
WHERE p_partkey = ps_partkey
  AND p_brand <> '{Q16_BRAND}'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN ({", ".join(str(s) for s in Q16_SIZES)})
  AND ps_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
        doc="TPC-H Q16 (adapted: negative balance for complaints): "
        "distinct-supplier counts with a NOT IN exclusion subquery as a "
        "broadcast anti-join",
        tags=("extension", "tpch", "not-in"),
    )
)


# ---------------------------------------------------------------------------
# Q20 (adapted): suppliers whose 'red' stock was half-consumed in a year
# ---------------------------------------------------------------------------

Q20_COLOR = "red"
Q20_NATION = "NATION_1"
Q20_START, Q20_END = "1999-01-01", "2000-01-01"


def _q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested IN + correlated aggregate: suppliers in one nation holding
    a 'red' part whose 1999 shipments exceeded HALF its total quantity.
    (Classic Q20 compares availqty to half the window's shipments; with
    availqty derived as total shipped the classic direction is always
    true, so the adapted predicate inverts it — the doubly-nested
    IN/correlated-SUM decorrelation shape is identical.) The compare is
    cross-multiplied (2*shipped > availqty) — DECIMAL-exact, no 0.5
    factor. Inner correlated SUM becomes a grouped aggregate joined on
    (part, supplier); part filter and nation dim broadcast."""
    ps = _partsupp(spark, sf_dir)
    red = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").like(f"%{Q20_COLOR}%"))
        .select("p_partkey")
    )
    shipped = (
        _t(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit(Q20_START))
            & (F.col("l_shipdate") < F.lit(Q20_END))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(9,2)")).alias(
                "window_qty"
            )
        )
    )
    qual = (
        ps.join(F.broadcast(red), ps.ps_partkey == red.p_partkey)
        .join(
            shipped,
            (ps.ps_partkey == shipped.l_partkey)
            & (ps.ps_suppkey == shipped.l_suppkey),
        )
        .where(F.lit(2) * F.col("window_qty") > F.col("ps_availqty"))
        .select("ps_suppkey")
        .distinct()
    )
    supp = _t(spark, sf_dir, "supplier")
    nat = (
        _t(spark, sf_dir, "nation")
        .where(F.col("n_name") == Q20_NATION)
        .select("n_nationkey")
    )
    return (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(qual, supp.s_suppkey == qual.ps_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_name")
    )


register(
    QuerySpec(
        "tpch_q20_halfconsumed_stock",
        _q20,
        f"""
WITH partsupp AS ({_PS_SQL})
SELECT s_suppkey, s_name
FROM supplier, nation
WHERE s_suppkey IN (
  SELECT ps_suppkey FROM partsupp
  WHERE ps_partkey IN (
      SELECT p_partkey FROM part WHERE p_name LIKE '%{Q20_COLOR}%')
    AND 2 * (
      SELECT sum(CAST(l_quantity AS DECIMAL(9,2))) FROM lineitem
      WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        AND l_shipdate >= DATE '{Q20_START}'
        AND l_shipdate < DATE '{Q20_END}') > ps_availqty)
  AND s_nationkey = n_nationkey AND n_name = '{Q20_NATION}'
ORDER BY s_name
""",
        doc="TPC-H Q20 (adapted: predicate inverted for the derived "
        "availqty): nested IN with a correlated window-SUM, "
        "decorrelated to grouped aggregates and semi-joins",
        tags=("extension", "tpch", "nested-in"),
    )
)


# ---------------------------------------------------------------------------
# Q21 (adapted): sole 'returned' supplier on multi-supplier orders
# ---------------------------------------------------------------------------

Q21_NATION = "NATION_0"


def _q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21's double-correlated EXISTS / NOT EXISTS: count, per supplier
    in one nation, the finalized multi-supplier orders where THIS
    supplier had a returned line ('R' — the fixture's lateness proxy;
    it has no commit/receipt dates) and NO OTHER supplier did. EXISTS
    becomes a left-semi and NOT EXISTS a left-anti join, both on the
    order key with a supplier-inequality residual — never a per-row
    subquery."""
    li = _t(spark, sf_dir, "lineitem")
    l1 = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o1_key"),
        F.col("l_suppkey").alias("s1_key"),
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2_key"),
        F.col("l_suppkey").alias("s2_key"),
    )
    l3 = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o3_key"),
        F.col("l_suppkey").alias("s3_key"),
    )
    waiting = (
        l1.join(orders, l1.o1_key == orders.o_orderkey, "left_semi")
        .join(
            l2,
            (F.col("o1_key") == l2.o2_key)
            & (F.col("s1_key") != l2.s2_key),
            "left_semi",
        )
        .join(
            l3,
            (F.col("o1_key") == l3.o3_key)
            & (F.col("s1_key") != l3.s3_key),
            "left_anti",
        )
    )
    supp = _t(spark, sf_dir, "supplier")
    nat = (
        _t(spark, sf_dir, "nation")
        .where(F.col("n_name") == Q21_NATION)
        .select("n_nationkey")
    )
    return (
        waiting.join(supp, F.col("s1_key") == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


register(
    QuerySpec(
        "tpch_q21_sole_returned_supplier",
        _q21,
        f"""
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM lineitem l1, orders, supplier, nation
WHERE l1.l_returnflag = 'R'
  AND l1.l_orderkey = o_orderkey AND o_orderstatus = 'F'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R')
  AND l1.l_suppkey = s_suppkey AND s_nationkey = n_nationkey
  AND n_name = '{Q21_NATION}'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""",
        doc="TPC-H Q21 (adapted: return flag 'R' as the lateness "
        "proxy): double-correlated EXISTS/NOT EXISTS as left-semi and "
        "left-anti joins with supplier-inequality residuals",
        tags=("extension", "tpch", "exists-anti"),
    )
)
