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
    import importlib
    import warnings

    from . import reference  # noqa: F401

    for mod in (
        "etl_ops",
        "extensions",
        "curation",
        "corpus_ops",
        "join_ops",
        "quality_audit",
        "temporal",
        "streaming_ops",
        "sql_text",
    ):
        try:
            importlib.import_module(f".{mod}", __package__)
        except ModuleNotFoundError as e:
            # Only a genuinely missing OPTIONAL third-party dep (pandas
            # et al.) may drop a module from the surface — and loudly. A
            # missing module of our own package is a packaging/regression
            # bug and must raise, not silently shrink the query surface.
            root = __package__.split(".")[0]
            if (e.name or "").split(".")[0] == root:
                raise
            warnings.warn(
                f"query module {mod!r} skipped (missing optional "
                f"dependency {e.name!r}): its queries are unregistered",
                stacklevel=2,
            )


def get_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: spec.build for name, spec in QUERIES.items()}


def get_oracles() -> dict[str, str]:
    _load_all()
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
