"""Build the adversarial "dirty" fixture used by the r10 robustness
audit: the sf0.001 tables truncated small, plus rows that violate the
clean fixture's implicit contracts —

- documents: NULL text, empty text, single char, whitespace-only,
  multibyte;
- embeddings: a FULL-dimension all-zero vector (zero norm — stays
  inside the index and exercises the try_divide cosine path), a
  full-dimension vector with NULL label, plus ragged (<64-dim) and
  NULL vectors (r11: these are now EXCLUDED by the ingestion-
  validation filter `embedding IS NOT NULL AND len = 64` that _emb()
  and every embeddings oracle apply — each engine used to make
  off-dimension scoring meaningless DIFFERENTLY, diverging the whole
  ANN family);
- events: NULL value/props/user_id/event_type, malformed JSON props,
  non-numeric ``$.k``, and (r11, ADVICE r10) numeric-but-non-integral
  ``$.k`` payloads — ``12.7`` / ``1e3`` / ``true`` / ``" 12 "`` /
  ``"12.7"`` / ``-3.9`` — where a bare DuckDB ``TRY_CAST(... AS
  BIGINT)`` ROUNDS the string (12.7 → 13) while Spark's ANSI
  ``try_cast`` yields NULL and ``try_variant_get`` truncates toward
  zero (12.7 → 12): every ``props.$.k`` twin now guards the varchar
  cast with an integral regex, and the VARIANT twin branches on
  ``json_type`` (modern_sql.py).

Usage:  python tools/dirty_fixture.py [/tmp/dirty_sf]
Then:   python tools/driver_sim.py /tmp/dirty_sf [query ...]

The audit's bar is ASYMMETRIC-FAILURE-FREE: neither engine may crash
where the other returns rows (Spark 4's default ANSI mode turns
overflow / x0 division / bad casts / OOB element_at into query-killing
errors; DuckDB's json_extract_string raises on malformed JSON). Value
divergences on out-of-contract rows are possible and tolerated — the
graded oracle contract is the clean fixture's domain.

Known tolerated divergence (r11): ``graph_pagerank_coclick`` on THIS
fixture differs in ONE row's 8th decimal (0.21770313 vs 0.21770312).
The tiny dirty graph produces dyadic rank values that land EXACTLY on
the 8dp rounding boundary (Spark's unrounded double is exactly
0.217703125), so the engines' ~1e-15 accumulation-order drift — far
inside the rounding quantum everywhere else — straddles the edge.
Irreducible without exact arithmetic; clean-fixture certification is
unaffected (boundary-exact doubles do not arise from /n_nodes scaling
on real graph sizes). The r10 audit
drove: try_divide/try_element_at across the cosine-ANN family,
try_cast on every ``props.$.k`` read (json_valid + TRY_CAST in the
twins), try_parse_json/try_variant_get in the VARIANT path, the PCA
Gram-pass dimension filter, and the empty-graph PageRank guard.
"""

from __future__ import annotations

import os
import shutil
import sys

SRC = "/root/testdata/sf0.001"


def build(dst: str) -> None:
    import duckdb

    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    con = duckdb.connect()

    for t in ["region", "nation", "customer", "supplier", "part"]:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{SRC}/orders.parquet') LIMIT 300)"
        f" TO '{dst}/orders.parquet' (FORMAT PARQUET)"
    )
    con.execute(
        f"""COPY (
  SELECT * FROM read_parquet('{SRC}/lineitem.parquet')
  WHERE l_orderkey IN (SELECT o_orderkey
                       FROM read_parquet('{dst}/orders.parquet'))
) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (
  (SELECT * FROM read_parquet('{SRC}/documents.parquet') LIMIT 120)
  UNION ALL
  SELECT * FROM (VALUES
    (900001, NULL,           'en', 'dirty', 0),
    (900002, '',             'en', 'dirty', 0),
    (900003, 'x',            NULL, 'dirty', 1),
    (900004, '    ',         'fr', 'dirty', 4),
    (900005, 'héllo wörld é', 'de', 'dirty', 13)
  ) t(doc_id, text, lang, source, n_chars)
) TO '{dst}/documents.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (
  (SELECT * FROM read_parquet('{SRC}/embeddings.parquet') LIMIT 120)
  UNION ALL
  SELECT * FROM (VALUES
    -- full 64-dim zero vector: passes ingestion validation, zero norm
    (900100, CAST(list_transform(generate_series(1, 64), i -> 0.0)
             AS FLOAT[]), 0),
    -- ragged vector: must be EXCLUDED by the dim filter
    (900200, CAST([1.0,-1.0,0.5] AS FLOAT[]), 1),
    -- NULL vector: must be EXCLUDED
    (900300, NULL, 2),
    -- full 64-dim valid vector with NULL label: stays in
    (900400, CAST(list_transform(generate_series(1, 64),
             i -> CAST(i AS DOUBLE) / 64.0 - 0.5) AS FLOAT[]), NULL)
  ) t(vec_id, embedding, label)
) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (
  (SELECT * FROM read_parquet('{SRC}/events.parquet') LIMIT 400)
  UNION ALL
  SELECT * FROM (VALUES
    (900001, TIMESTAMP '2024-01-05 10:00:00', 42, 'click', NULL, NULL),
    (900002, TIMESTAMP '2024-01-05 10:01:00', NULL, 'error', 1.5,
     '{{not json'),
    (900003, TIMESTAMP '2024-01-05 10:02:00', 42, NULL, 2.5,
     '{{"k": "abc"}}'),
    (900004, TIMESTAMP '2024-01-06 11:00:00', 7, 'purchase', -3.0,
     '{{"k": 12}}'),
    (900005, TIMESTAMP '2024-01-06 11:01:00', 7, 'click', 1.0,
     '{{"k": 12.7}}'),
    (900006, TIMESTAMP '2024-01-06 11:02:00', 42, 'click', 2.0,
     '{{"k": "12.7"}}'),
    (900007, TIMESTAMP '2024-01-06 11:03:00', 42, 'purchase', 3.0,
     '{{"k": 1e3}}'),
    (900008, TIMESTAMP '2024-01-06 11:04:00', 9, 'click', 4.0,
     '{{"k": true}}'),
    (900009, TIMESTAMP '2024-01-06 11:05:00', 9, 'click', 5.0,
     '{{"k": " 12 "}}'),
    (900010, TIMESTAMP '2024-01-06 11:06:00', 11, 'click', 6.0,
     '{{"k": -3.9}}'),
    -- control-char padding (r12, ADVICE r11): Spark's string-to-long
    -- trim strips [x00-x20 + DEL]; the guarded twins regexp_replace
    -- the same class away before DuckDB's TRY_CAST (which trims none)
    (900011, TIMESTAMP '2024-01-06 11:07:00', 11, 'click', 7.0,
     '{{"k": "\\u000112"}}'),
    (900012, TIMESTAMP '2024-01-06 11:08:00', 7, 'click', 8.0,
     '{{"k": "\\u00a012"}}')
  ) t(event_id, ts, user_id, event_type, value, props)
) TO '{dst}/events.parquet' (FORMAT PARQUET)"""
    )
    for t in sorted(os.listdir(dst)):
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{t}')"
        ).fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else "/tmp/dirty_sf")
