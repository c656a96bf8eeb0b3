"""Join-strategy demonstrator queries: the explicit skew-salted join
and runtime bloom-filter join pruning, driven through the correctness
gate. Both change the SHUFFLE, never the RESULT — so the oracle is the
plain equi-join, and plan tests (tests/test_skew.py, tests/test_plans
.py) separately prove the salt / bloom filter is actually in the plan.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..operators.skew import salted_join
from .registry import QuerySpec, register

_SALT = 8


def _salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events ⋈ customer (user_id = c_custkey) through the 8-way salted
    join, aggregated per market segment. At 100 TB this is the manual
    fallback for a hot-keyed fact⋈dim join when AQE skew splitting
    can't apply (broadcast-ineligible dim, non-sort-merge path): one
    hot user's rows spread over ``salt`` shuffle partitions while the
    dimension replicates ``salt``-fold — correct because the salt is
    derived from a row-unique column, so every fact row meets exactly
    one replica of its key's dim row."""
    ev = catalog.base(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    dim = catalog.base(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(ev, dim, key="user_id", salt_col="event_id", salt=_SALT)
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("c_mktsegment")
    )


register(
    QuerySpec(
        "skew_salted_join_agg",
        _salted_join_agg,
        """
SELECT c.c_mktsegment,
       count(*) AS n_events,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
       CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
""",
        doc="8-way skew-salted fact⋈dim join (deterministic hash salt, "
        "dim replicated per salt) aggregated per market segment — "
        "result-identical to the plain equi-join, which is the oracle",
        tags=("extension", "join", "skew"),
    )
)


# ---------------------------------------------------------------------------
# Runtime bloom-filter join pruning (Spark's runtime row-level filter)
# ---------------------------------------------------------------------------

BLOOM_PRICE_CUTOFF = 490000  # ~top-1% of orders: a genuinely selective side

# Force the demonstration at fixture scale: broadcast is disabled so the
# join takes the shuffle path the filter exists for, and the
# application-side scan-size threshold (default 10 GB — met trivially by
# a 100 TB fact scan, never by a test fixture) is dropped to 0. On a
# real cluster only `enabled` matters; the defaults fire on their own.
_BLOOM_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter."
    "applicationSideScanSizeThreshold": "0",
}


@contextmanager
def bloom_join_confs(spark: SparkSession):
    """Temporarily pin the confs that make the bloom-filter injection
    heuristic fire at test scale; ALWAYS restored — the driver runs all
    queries in one shared session, and leaking autoBroadcastJoinThreshold
    =-1 would degrade every later query's plan."""
    olds = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    for k, v in _BLOOM_CONFS.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in olds.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def build_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The join the bloom filter prunes: full lineitem scan against the
    ~top-1% most expensive orders. Spark builds a bloom filter from the
    selective side's join keys and pushes it into the fact scan as a
    `might_contain` predicate — at 100 TB this skips the shuffle write
    for the ~99% of fact rows that cannot match, the runtime analogue
    of a static partition prune (exported for tests/test_plans.py,
    which asserts bloom_filter_agg in the executed plan)."""
    li = catalog.base(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    big = (
        catalog.base(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > BLOOM_PRICE_CUTOFF)
        .select("o_orderkey", "o_orderpriority")
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit("1.00").cast("decimal(18,2)")
        - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(big, li.l_orderkey == big.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(rev).cast("double").alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


def _bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Executes eagerly inside the conf guard (laziness would let the
    restored confs plan the query without the filter), then hands the
    constant-size aggregate back as a local DataFrame — same contract
    as the streaming queries, which also execute at build time."""
    plan_df = build_bloom_join(spark, sf_dir)
    with bloom_join_confs(spark):
        rows = plan_df.collect()
    return spark.createDataFrame(rows, plan_df.schema)


register(
    QuerySpec(
        "bloom_pruned_fact_join",
        _bloom_pruned_join,
        f"""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST('1.00' AS DECIMAL(18,2))
                   - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM lineitem, orders
WHERE l_orderkey = o_orderkey AND o_totalprice > {BLOOM_PRICE_CUTOFF}
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
        doc="runtime bloom-filter join pruning: the selective dim side's "
        "keys become a might_contain predicate on the fact scan "
        "(runtime analogue of partition pruning); result-identical to "
        "the plain join, which is the oracle",
        tags=("extension", "join", "bloom-filter"),
    )
)
