"""Dirty semi-structured input must degrade to NULL, not kill the scan
(r10 dirty-fixture audit, tools/dirty_fixture.py): Spark 4's default
ANSI mode turns ``CAST('abc' AS BIGINT)`` into a query-killing error and
FAILFAST/strict JSON parsing raises on malformed payloads, while the
DuckDB twins' ``json_valid`` + ``TRY_CAST`` posture yields NULL. These
tests pin the tolerant path on crafted rows without staging a fixture.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_ROWS = [
    (1, '{"k": 12}'),
    (2, '{"k": "abc"}'),  # non-numeric path value: ANSI cast trap
    (3, "{not json"),  # malformed payload: strict-parse trap
    (4, None),
]


def _df(spark):
    return spark.createDataFrame(_ROWS, "event_id long, props string")


def test_get_json_object_try_cast_degrades_to_null(spark):
    out = {
        r["event_id"]: r["k"]
        for r in _df(spark)
        .select(
            "event_id",
            F.get_json_object("props", "$.k").try_cast("long").alias("k"),
        )
        .collect()
    }
    assert out == {1: 12, 2: None, 3: None, 4: None}


def test_try_variant_path_degrades_to_null(spark):
    out = {
        r["event_id"]: r["k"]
        for r in _df(spark)
        .select(
            "event_id",
            F.try_variant_get(
                F.try_parse_json("props"), "$.k", "long"
            ).alias("k"),
        )
        .collect()
    }
    assert out == {1: 12, 2: None, 3: None, 4: None}


def test_duckdb_twin_spell_matches(spark):
    """The oracle-side spell — json_valid guard + TRY_CAST — must agree
    with the Spark tolerant path row for row."""
    import duckdb

    con = duckdb.connect()
    got = dict(
        con.execute(
            """
SELECT event_id,
       TRY_CAST(CASE WHEN json_valid(props)
                     THEN json_extract_string(props, '$.k') END AS BIGINT)
FROM (VALUES (1, '{"k": 12}'), (2, '{"k": "abc"}'),
             (3, '{not json'), (4, NULL)) t(event_id, props)
"""
        ).fetchall()
    )
    assert got == {1: 12, 2: None, 3: None, 4: None}
