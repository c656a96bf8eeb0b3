"""Join-strategy demonstrator queries: the explicit skew-salted join
driven through the correctness gate. Salting changes the SHUFFLE, never
the RESULT — so the oracle is the plain equi-join, and the plan test
(tests/test_skew.py) separately proves the join key carries the salt.
"""

from __future__ import annotations

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
