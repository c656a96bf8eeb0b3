"""Cache-release hook: release() must leave no materialized views, no
tracked persists, and no session-cached relations behind."""

from __future__ import annotations

from dc_moving_violations_cloud_etl_spark import caching, catalog


def test_release_unpersists_everything(spark, sf_dir):
    catalog.violations(spark, sf_dir).count()  # materialize the fact view
    from dc_moving_violations_cloud_etl_spark.operators.dedup import (
        minhash_signatures,
    )

    caching.persist_tracked(
        minhash_signatures(catalog.base(spark, sf_dir, "documents"))
    ).count()

    assert catalog._MATERIALIZED
    assert caching.tracked_count() > 0

    catalog.release(spark)

    assert not catalog._MATERIALIZED
    assert caching.tracked_count() == 0
    # and the next access transparently rebuilds
    assert catalog.violations(spark, sf_dir).count() > 0
