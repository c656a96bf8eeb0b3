"""Tracked persist() registry.

Operators that materialize an intermediate (MinHash signature tables,
IVF centroid assignments, hyperplane sketches) persist it once and fan
multiple consumers out of it — correct at any scale, but in a
long-running process the caches would accumulate executor memory.
Every such persist goes through ``persist_tracked`` so
``catalog.release()`` (called at the end of a bench run / by the user)
can unpersist them all deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def persist_tracked(df: DataFrame, storage_level=None) -> DataFrame:
    """``df.persist()`` + registration for later bulk release."""
    df = df.persist(storage_level) if storage_level is not None else df.persist()
    _TRACKED.append(df)
    return df


def release_tracked() -> None:
    """Unpersist everything registered via ``persist_tracked``."""
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
        except Exception:
            pass


def tracked_count() -> int:
    return len(_TRACKED)
