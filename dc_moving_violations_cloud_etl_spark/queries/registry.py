"""Query registry: every implemented operator/query gets a named entry
with (a) a Spark DataFrame builder and (b) an equivalent DuckDB oracle SQL
string (or ``None`` for genuinely non-SQL-expressible operators — the
driver then records a weaker rows-only check).

Column-name contract: the driver's comparator sorts columns by NAME before
value-hashing, so every computed column is aliased identically on both
sides (see the repo-level driver contract in ``__spark_entry__.py``).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QuerySpec] = {}


def register(spec: QuerySpec) -> QuerySpec:
    if spec.name in QUERIES:
        raise ValueError(f"duplicate query name {spec.name!r}")
    QUERIES[spec.name] = spec
    return spec


def _load_all() -> None:
    # import for side effect of registration
    from . import reference  # noqa: F401

    try:
        from . import etl_ops  # noqa: F401
    except ImportError:
        pass
    try:
        from . import extensions  # noqa: F401
    except ImportError:
        pass
    try:
        from . import streaming_ops  # noqa: F401
    except ImportError:
        pass
    try:
        from . import sql_text  # noqa: F401
    except ImportError:
        pass


def get_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: spec.build for name, spec in QUERIES.items()}


def get_oracles() -> dict[str, str]:
    _load_all()
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
