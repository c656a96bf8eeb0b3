"""MySQL-dialect SQL text execution — the reference's actual user
interface (its whole query surface is raw MySQL strings,
reference sql/analysis_queries.sql:1-91, executed server-side §3.3).

A reference user switching to this engine keeps their SQL: dialect gaps
are bridged with Spark-4 **SQL-defined functions** (JVM-side, inlined by
Catalyst at plan time — no Python UDF slow path) plus a minimal token
rewrite for the three MySQL names Spark either lacks or defines
differently:

- ``DAYNAME(d)``      — MySQL returns 'Wednesday'; Spark 4's builtin
  ``dayname`` returns 'Wed' and cannot be shadowed, so the rewrite maps
  to ``MYSQL_DAYNAME`` (``date_format(d, 'EEEE')``, SURVEY.md §2 G1).
- ``DATE_FORMAT(ts, '%Y-%m')`` — %-token patterns translated to
  JDK patterns inside ``MYSQL_DATE_FORMAT`` (G2/G13).
- ``FIELD(x, v1, ...)`` — no Spark builtin, and SQL UDFs are rejected
  inside Sort, where the reference uses it (``ORDER BY FIELD(...)``) —
  so the translator INLINES it as a native
  ``coalesce(array_position(array(...), x), 0)`` expression (any arity,
  any clause), preserving the MySQL contract including absent-value →
  0, which sorts first (G5; SURVEY.md §7 hard-part 2).

Known divergence (documented, not shimmed): MySQL's default collation
makes ``LIKE`` case-insensitive; Spark's is case-sensitive. The
reference's Qf patterns are uppercase against uppercase data, so both
engines agree there; general-case parity would use Spark 4 collations
(``COLLATE UTF8_LCASE``) per column.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from . import catalog

SHIM_DDL = [
    """CREATE OR REPLACE TEMPORARY FUNCTION MYSQL_DAYNAME(d DATE)
       RETURNS STRING RETURN date_format(d, 'EEEE')""",
    """CREATE OR REPLACE TEMPORARY FUNCTION MYSQL_DATE_FORMAT(ts TIMESTAMP, fmt STRING)
       RETURNS STRING RETURN date_format(ts,
         replace(replace(replace(replace(replace(fmt,
           '%Y', 'yyyy'), '%m', 'MM'), '%d', 'dd'), '%H', 'HH'), '%i', 'mm'))""",
]

_REWRITES = [
    (re.compile(r"\bDAYNAME\s*\(", re.IGNORECASE), "MYSQL_DAYNAME("),
    (re.compile(r"\bDATE_FORMAT\s*\(", re.IGNORECASE), "MYSQL_DATE_FORMAT("),
]

_FIELD_CALL = re.compile(r"\bFIELD\s*\(", re.IGNORECASE)


def enable_mysql_compat(spark: SparkSession) -> None:
    """Register the dialect-shim SQL functions (idempotent)."""
    for ddl in SHIM_DDL:
        spark.sql(ddl)


def _split_top_level(args: str) -> list[str]:
    """Split an argument list on commas not nested in parens/quotes."""
    parts, depth, buf, quote = [], 0, [], None
    for ch in args:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in ("'", '"'):
            quote = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf).strip())
    return parts


def _inline_field(text: str) -> str:
    """Inline every FIELD(x, v1, ...) as a native array_position
    expression (SQL UDFs are not allowed inside Sort, where MySQL users
    put FIELD)."""
    while True:
        m = _FIELD_CALL.search(text)
        if m is None:
            return text
        # balanced-paren scan for the closing paren of this call
        depth, i, quote = 1, m.end(), None
        while i < len(text) and depth:
            ch = text[i]
            if quote:
                if ch == quote:
                    quote = None
            elif ch in ("'", '"'):
                quote = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            i += 1
        args = _split_top_level(text[m.end() : i - 1])
        x, values = args[0], args[1:]
        repl = f"int(coalesce(array_position(array({', '.join(values)}), {x}), 0))"
        text = text[: m.start()] + repl + text[i:]


def translate(text: str) -> str:
    """Rewrite MySQL-only constructs to Spark-executable equivalents."""
    for pat, repl in _REWRITES:
        text = pat.sub(repl, text)
    return _inline_field(text)


def run_sql(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    """Run one MySQL-dialect query string against the engine's tables
    (``violations`` / ``weather_daily`` + the base fixtures), exactly as
    a reference user would against their MySQL instance."""
    catalog.register_all(spark, sf_dir)
    enable_mysql_compat(spark)
    return spark.sql(translate(text))
