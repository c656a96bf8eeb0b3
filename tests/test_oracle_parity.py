"""Differential oracle tests: every registered query's Spark DataFrame
result must match its DuckDB oracle exactly (the driver's correctness
gate, run here at sf0.001 for speed)."""

from __future__ import annotations

import pytest

from dc_moving_violations_cloud_etl_spark.queries import QUERIES, get_queries

from .conftest import assert_df_matches_oracle

get_queries()  # force registration


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, ddb, sf_dir, name):
    spec = QUERIES[name]
    df = spec.build(spark, sf_dir)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only smoke for non-SQL-expressible ops
        return
    assert_df_matches_oracle(df, ddb, spec.oracle, name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None


def test_oracle_keys_subset():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) > 0
