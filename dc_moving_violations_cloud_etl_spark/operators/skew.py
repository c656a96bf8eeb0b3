"""Explicit skew-salted join — the manual fallback when AQE's runtime
skew splitting isn't available (pre-3.0 clusters, non-sort-merge paths)
or when a key's skew is known ahead of time.

``salted_join(facts, dim, key, salt)`` joins a skew-keyed fact table
against a dimension by:
1. appending a uniform salt in [0, salt) to each fact row's key, and
2. exploding the dimension to all ``salt`` replicas per row,
so one hot key's rows spread over ``salt`` shuffle partitions instead of
one straggler task. The replicated side must be the SMALL one — the
replication factor is |dim|·salt.

The salt is derived from a uniform hash of a row-unique column (not
``rand()``) so results are reproducible and re-executions of a failed
stage see the same partitioning (rand() in a shuffle key breaks task
retry determinism — a real-cluster correctness hazard, not a style
point).

Session AQE already handles skew for sort-merge joins
(``spark.sql.adaptive.skewJoin.enabled``, session.py); this operator is
the explicit, planner-independent form with a plan test proving the
join key carries the salt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    salt_col: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``facts`` ⋈ ``dim`` on ``key`` with an ``salt``-way
    salted shuffle. ``salt_col`` is any fact column that distributes
    uniformly per row (an id, a hash) — its value mod ``salt`` spreads
    each hot key across tasks deterministically."""
    # the construction replicates every dim row once per salt value, so
    # it is only sound for join types where unmatched DIM rows are
    # dropped — a right/full outer join would emit each unmatched dim
    # row ``salt`` times (once per replica, r10 review)
    sound = {"inner", "left", "leftouter", "left_outer", "semi",
             "leftsemi", "left_semi", "anti", "leftanti", "left_anti"}
    if how.lower().replace("_", "") not in {
        s.replace("_", "") for s in sound
    }:
        raise ValueError(
            f"salted_join: join type {how!r} is not salt-sound — "
            "unmatched dim rows would appear once per salt replica; "
            "use inner/left/semi/anti, or AQE skew handling for "
            "outer joins"
        )
    f = facts.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(salt)).cast("int")
    )
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return f.join(d, [key, "_salt"], how).drop("_salt")
