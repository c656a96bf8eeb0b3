"""Snapshot-versioned parquet tables: time travel on a plain
filesystem, the minimal transactional core of a table format (Delta /
Iceberg) re-expressed with nothing but parquet directories and one
atomically-swapped manifest.

The reference overwrite-updates its MySQL tables in place, so "what did
the table look like before yesterday's load?" is unanswerable there
(reference DEPLOYMENT.md replays the Lambda instead). Versioned
snapshots answer it structurally:

- ``write_snapshot`` writes a NEW immutable directory ``v=<n>/`` (never
  touching prior versions) and then publishes it by atomically
  replacing the ``_versions.json`` manifest — readers either see the
  old manifest or the new one, never a half-written table (the same
  commit shape as the custom Python sink, sources/py_sink.py, and of
  Delta's _delta_log).
- ``read_snapshot`` resolves a version (default: latest) through the
  manifest, so a reader pinned to v1 is immune to concurrent writers —
  snapshot isolation by immutability.

Scale posture: a snapshot write is one parquet write of the new data —
no rewrite of history; the manifest is O(versions) bytes. Reads are
ordinary parquet scans of one version directory, so every pushdown /
pruning property of the engine applies unchanged. Garbage collection
(dropping unreferenced versions) is a directory delete, omitted here.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


def _manifest_path(table_dir: str) -> str:
    return os.path.join(table_dir, "_versions.json")


def list_versions(table_dir: str) -> list[int]:
    try:
        with open(_manifest_path(table_dir)) as f:
            return sorted(json.load(f)["versions"])
    except FileNotFoundError:
        return []


def write_snapshot(df: DataFrame, table_dir: str) -> int:
    """Write ``df`` as the next version of the table and publish it
    atomically. Returns the new version number."""
    os.makedirs(table_dir, exist_ok=True)
    versions = list_versions(table_dir)
    v = (versions[-1] + 1) if versions else 1
    vdir = os.path.join(table_dir, f"v={v}")
    df.write.mode("overwrite").parquet(vdir)
    fd, tmp = tempfile.mkstemp(dir=table_dir, prefix="_versions.")
    with os.fdopen(fd, "w") as f:
        json.dump({"versions": versions + [v]}, f)
    os.replace(tmp, _manifest_path(table_dir))
    return v


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read one committed version (default latest). Unpublished or
    partially-written directories are invisible — only manifest
    versions resolve."""
    versions = list_versions(table_dir)
    if not versions:
        raise FileNotFoundError(f"no committed snapshots in {table_dir}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(f"version {v} not in {versions}")
    return spark.read.parquet(os.path.join(table_dir, f"v={v}"))


def expire_snapshots(
    table_dir: str, keep_last: int = 1, retention_s: float = 0.0
) -> list[int]:
    """Garbage-collect history: retain the newest ``keep_last``
    versions, atomically publish the shrunk manifest FIRST (unpublish),
    then delete the expired directories — but only those unpublished at
    least ``retention_s`` seconds ago. Two-phase expire (ADVICE r4): a
    reader that resolved the old manifest an instant before the swap
    may still be scanning an expired directory, so with a retention
    window the data files outlive the manifest entry by the longest
    scan you expect — the same grace-period discipline as Delta's
    VACUUM retention. Unpublished-but-retained versions are ledgered in
    ``_expired.json`` (version -> delete-after DEADLINE epoch, fixed at
    unpublish time from the retention_s then in force — ADVICE r5: a
    later call with a smaller/default retention_s must NOT shorten the
    grace window already promised to in-flight readers) and deleted by
    any later ``expire_snapshots`` call once aged out; ``retention_s=0``
    (the default, and the fixture-scale behavior) deletes immediately.
    A version leaves the ledger only once its directory is confirmed
    gone, so a partially-failed delete is retried by the next pass
    instead of orphaning the directory forever (ADVICE r5).
    Returns the NEWLY unpublished version numbers."""
    import shutil
    import tempfile as _tempfile
    import time as _time

    versions = list_versions(table_dir)
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    keep = versions[-keep_last:]
    expired = [v for v in versions if v not in keep]
    ledger_path = os.path.join(table_dir, "_expired.json")
    try:
        with open(ledger_path) as f:
            ledger = {int(k): v for k, v in json.load(f).items()}
    except (OSError, ValueError):
        ledger = {}
    now = _time.time()
    if expired:
        fd, tmp = _tempfile.mkstemp(dir=table_dir, prefix="_versions.")
        with os.fdopen(fd, "w") as f:
            json.dump({"versions": keep}, f)
        os.replace(tmp, _manifest_path(table_dir))
        for v in expired:
            ledger.setdefault(v, now + retention_s)
    for v, deadline in sorted(ledger.items()):
        if now >= deadline:
            vdir = os.path.join(table_dir, f"v={v}")
            shutil.rmtree(vdir, ignore_errors=True)
            if not os.path.exists(vdir):
                del ledger[v]
    fd, tmp = _tempfile.mkstemp(dir=table_dir, prefix="_expired.")
    with os.fdopen(fd, "w") as f:
        json.dump({str(k): v for k, v in ledger.items()}, f)
    os.replace(tmp, ledger_path)
    return expired


class SnapshotConflictError(RuntimeError):
    """Another writer committed since the transaction's base version."""


def write_snapshot_occ(
    df: DataFrame, table_dir: str, expected_latest: int | None
) -> int:
    """Optimistic-concurrency commit: the caller states the latest
    version it BASED its write on (``None`` for an empty table); if
    another writer has published since, the commit raises
    ``SnapshotConflictError`` instead of silently last-wins-ing — the
    Delta/Iceberg OCC contract, reduced to its essence (validate
    against the manifest you read, re-read + retry on conflict).

    The parquet write happens before the validation-and-swap, so a
    losing writer wastes only its own staging work; the manifest swap
    itself remains the single atomic commit point. (A multi-writer
    deployment would re-validate under a rename-based lock; on one
    driver the check-then-swap window is the driver itself.)"""
    versions = list_versions(table_dir)
    latest = versions[-1] if versions else None
    if latest != expected_latest:
        raise SnapshotConflictError(
            f"base version {expected_latest} is stale: table is at {latest}"
        )
    return write_snapshot(df, table_dir)
