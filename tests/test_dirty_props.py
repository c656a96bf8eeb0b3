"""Dirty semi-structured input must degrade to NULL, not kill the scan
(r10 dirty-fixture audit, tools/dirty_fixture.py): Spark 4's default
ANSI mode turns ``CAST('abc' AS BIGINT)`` into a query-killing error and
FAILFAST/strict JSON parsing raises on malformed payloads, while the
DuckDB twins' ``json_valid`` + ``TRY_CAST`` posture yields NULL.

r11 (ADVICE r10): NULL-degradation alone is not enough — the engines
must agree on VALUES too. A bare DuckDB ``TRY_CAST(varchar AS BIGINT)``
ROUNDS non-integral numerics (``'12.7'`` → 13) where Spark's ANSI
``try_cast`` yields NULL, so every ``props.$.k`` twin guards the cast
with an integral regex; and ``try_variant_get(..., 'long')`` has its
own coercion table (doubles truncate toward zero, booleans → 1/0,
integral strings cast) that the VARIANT twin mirrors branch-for-branch
off ``json_type``. These tests pin BOTH coercion tables row-for-row on
a 20-value battery, on both engines, without staging a fixture.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

# (event_id, props, expected get_json_object+try_cast('long'),
#  expected try_variant_get(..., 'long')) — expectations measured on
# Spark 4.1 (r11 session) and pinned here so an engine upgrade that
# shifts either coercion table fails loudly.
_BATTERY = [
    (1, '{"k": 12}', 12, 12),
    (2, '{"k": "abc"}', None, None),  # non-numeric string: ANSI trap
    (3, "{not json", None, None),  # malformed payload: strict-parse trap
    (4, None, None, None),
    (5, '{"k": 12.7}', None, 12),  # DuckDB bare TRY_CAST would say 13
    (6, '{"k": -3.9}', None, -3),  # variant truncates toward zero
    (7, '{"k": 12.0}', None, 12),
    (8, '{"k": 1e3}', None, 1000),  # get_json_object serializes '1000.0'
    (9, '{"k": "12.7"}', None, None),  # strings never round/truncate
    (10, '{"k": " 12 "}', 12, 12),  # both paths trim integral strings
    (11, '{"k": "+5"}', 5, 5),
    (12, '{"k": "007"}', 7, 7),
    (13, '{"k": true}', None, 1),  # variant-only boolean coercion
    (14, '{"k": false}', None, 0),
    (15, '{"k": null}', None, None),
    (16, '{"k": 9.9e25}', None, None),  # double overflow → NULL
    (17, '{"k": 9223372036854775807}', 9223372036854775807, 9223372036854775807),
    (18, '{"k": "99999999999999999999"}', None, None),  # str overflow
    (19, '{"k": [1]}', None, None),  # non-scalar path values
    (20, "{}", None, None),  # missing key
    # control-char padding (ADVICE r11): Spark's string-to-long trim
    # (UTF8String.trimAll) strips the MEASURED class [\x00-\x20\x7f] —
    # ASCII controls, space, and DEL — but NOT U+0085/U+00A0/U+200B+
    # (probed on Spark 4.1, r12 session; both the try_cast and the
    # try_variant_get path agree). DuckDB's TRY_CAST strips none of the
    # sub-0x21 controls, so the guarded spell must regexp_replace them
    # away before casting.
    (21, '{"k": "\\u000112"}', 12, 12),  # SOH pad: both engines trim
    (22, '{"k": "\\u007f12"}', 12, 12),  # DEL pads too (beyond 0x20!)
    (23, '{"k": "\\u008512"}', None, None),  # NEL: NOT trimmed
    (24, '{"k": "\\u00a012"}', None, None),  # NBSP: NOT trimmed
    (25, '{"k": "\\u200b12"}', None, None),  # zero-width: NOT trimmed
    (26, '{"k": "\\u000b-42\\u001f"}', -42, -42),  # mixed ends + sign
]

# the guarded varchar spell every props.$.k oracle twin now uses
GUARDED_CAST_SQL = (
    "TRY_CAST(CASE WHEN json_valid(props) AND regexp_matches("
    "json_extract_string(props, '$.k'), "
    r"'^[\x00-\x20\x7f]*[+-]?[0-9]+[\x00-\x20\x7f]*$') "
    "THEN regexp_replace(json_extract_string(props, '$.k'), "
    r"'^[\x00-\x20\x7f]+|[\x00-\x20\x7f]+$', '', 'g') "
    "END AS BIGINT)"
)

# the VARIANT-twin mirror: one branch per json_type, matching
# try_variant_get's measured coercion (modern_sql.py)
VARIANT_MIRROR_SQL = """CASE
  WHEN NOT json_valid(props) THEN NULL
  WHEN json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
    THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
  WHEN json_type(props, '$.k') = 'DOUBLE'
    THEN TRY_CAST(trunc(TRY_CAST(json_extract_string(props, '$.k')
                                 AS DOUBLE)) AS BIGINT)
  WHEN json_type(props, '$.k') = 'BOOLEAN'
    THEN (CASE json_extract_string(props, '$.k')
          WHEN 'true' THEN 1 WHEN 'false' THEN 0 END)
  WHEN json_type(props, '$.k') = 'VARCHAR'
       AND regexp_matches(json_extract_string(props, '$.k'),
                          '^[\\x00-\\x20\\x7f]*[+-]?[0-9]+[\\x00-\\x20\\x7f]*$')
    THEN TRY_CAST(regexp_replace(json_extract_string(props, '$.k'),
                                 '^[\\x00-\\x20\\x7f]+|[\\x00-\\x20\\x7f]+$',
                                 '', 'g') AS BIGINT)
END"""


def _df(spark):
    rows = [(i, p) for i, p, _, _ in _BATTERY]
    return spark.createDataFrame(rows, "event_id long, props string")


def test_get_json_object_try_cast_battery(spark):
    out = {
        r["event_id"]: r["k"]
        for r in _df(spark)
        .select(
            "event_id",
            F.get_json_object("props", "$.k").try_cast("long").alias("k"),
        )
        .collect()
    }
    assert out == {i: exp for i, _, exp, _ in _BATTERY}


def test_from_json_typed_schema_battery(spark):
    """``from_json('k BIGINT')`` is the STRICTEST read path: only bare
    JSON integral numbers parse — doubles, numeric strings, and
    booleans are all NULL (measured r11). Its twin gates on
    ``json_type IN ('BIGINT','UBIGINT')`` (events_json_extract)."""
    # only the two bare-integer payloads (ids 1, 17) parse
    exp = {i: None for i, _, _, _ in _BATTERY}
    exp[1], exp[17] = 12, 9223372036854775807
    out = {
        r["event_id"]: r["k"]
        for r in _df(spark)
        .select(
            "event_id",
            F.from_json("props", "k BIGINT").getField("k").alias("k"),
        )
        .collect()
    }
    assert out == exp
    # and the DuckDB json_type gate agrees
    assert _duckdb_battery(
        "CASE WHEN json_valid(props) AND json_type(props, '$.k') IN "
        "('BIGINT', 'UBIGINT') THEN TRY_CAST(json_extract_string(props, "
        "'$.k') AS BIGINT) END"
    ) == exp


def test_try_variant_path_battery(spark):
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
    assert out == {i: exp for i, _, _, exp in _BATTERY}


def _duckdb_battery(spell: str) -> dict:
    import duckdb

    con = duckdb.connect()
    got = {}
    for i, props, _, _ in _BATTERY:
        got[i] = con.execute(
            f"SELECT {spell} FROM (SELECT ?::VARCHAR AS props)", [props]
        ).fetchone()[0]
    return got


def test_duckdb_guarded_cast_matches_spark_try_cast():
    """The guarded oracle spell must agree with Spark ``try_cast`` on
    every battery value — including the non-integral numerics a bare
    TRY_CAST would round (ADVICE r10)."""
    assert _duckdb_battery(GUARDED_CAST_SQL) == {
        i: exp for i, _, exp, _ in _BATTERY
    }


def test_duckdb_variant_mirror_matches_try_variant_get():
    assert _duckdb_battery(VARIANT_MIRROR_SQL) == {
        i: exp for i, _, _, exp in _BATTERY
    }


def test_no_unguarded_props_cast_in_registered_oracles():
    """No registered oracle may regress to the bare rounding TRY_CAST:
    every json_valid(props) cast guard must carry the integral-regex (or
    sit inside the VARIANT json_type mirror)."""
    from dc_moving_violations_cloud_etl_spark.queries.registry import (
        get_oracles,
    )

    # whitespace-tolerant: a reformatted guard (newline between tokens)
    # must not evade the check (ADVICE r11)
    bare = re.compile(
        r"WHEN\s+json_valid\(props\)\s+THEN\s+json_extract_string"
    )
    offenders = [n for n, sql in get_oracles().items() if bare.search(sql)]
    assert not offenders, f"unguarded props casts: {offenders}"


def test_no_narrow_space_guard_in_registered_oracles():
    """The r11 guard class '[[:space:]]' was narrower than Spark's
    string-to-long trim (which also strips sub-0x21 controls and DEL,
    ADVICE r11): every oracle must carry the widened class, and every
    widened guard must strip before casting (DuckDB's TRY_CAST does
    NOT trim control chars, so guard-without-strip still diverges)."""
    from dc_moving_violations_cloud_etl_spark.queries.registry import (
        get_oracles,
    )

    narrow = re.compile(r"\[\[:space:\]\]\s*\*\s*\[\+-\]")
    offenders = [n for n, sql in get_oracles().items() if narrow.search(sql)]
    assert not offenders, f"narrow [[:space:]] guards remain: {offenders}"
    guard = r"'^[\x00-\x20\x7f]*[+-]?[0-9]+[\x00-\x20\x7f]*$'"
    strip = r"'^[\x00-\x20\x7f]+|[\x00-\x20\x7f]+$'"
    for n, sql in get_oracles().items():
        assert sql.count(guard) == sql.count(strip), (
            f"{n}: widened guard without a matching strip-before-cast"
        )
