"""Custom Python DataSource WRITER (Spark 4 API) — the sink half of the
custom-connector surface (the reader half is ``paged_api.py``).

The reference's write path is a Python loop pushing batched tuples into
MySQL with executemany + commit (reference
etl/full_load/violation_etl_history.py:138-150; daily INSERT IGNORE,
etl/daily_load/violation_etl_daily.py:289). This sink reproduces the
protocol shape inside Spark's writer API instead:

- ``write(iterator)`` runs ONE PER PARTITION as a parallel task — each
  task streams its row iterator to a task-private staging file
  (the analogue of one DB connection's batched inserts; a live
  connector would open the connection and executemany right here),
  fsyncs, and returns the staged path + row count as its commit
  message;
- ``commit(messages)`` is the driver-side transaction: staged files are
  atomically renamed into the destination and a manifest records the
  per-task row counts — so a failed/speculated task (whose ``abort``
  drops its staging file) can never leave partial output visible, the
  same all-or-nothing contract the reference gets from one big DB
  commit and Spark parquet gets from _temporary + rename.

JSON-lines is the staged format so the round-trip query can re-read the
committed output with the built-in JSON reader (schema-first) and prove
losslessness against the parquet oracle.

Everything is defined inside a factory so cloudpickle ships the classes
BY VALUE — executors of a vanilla session don't have this package on
their PYTHONPATH (same pattern as paged_api.py).
"""

from __future__ import annotations

SINK_NAME = "jsonl_tx_sink"


def make_jsonl_sink():
    """Build (by value) the writer DataSource class for registration via
    ``spark.dataSource.register``."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    sink_name = SINK_NAME

    class _StagedFile(WriterCommitMessage):
        def __init__(self, staged: str, final: str, n_rows: int):
            self.staged, self.final, self.n_rows = staged, final, n_rows

    class _JsonlWriter(DataSourceWriter):
        def __init__(self, options):
            self.path = options["path"]
            self.ts_fmt = options.get("tsFormat", "%Y-%m-%dT%H:%M:%S.%f")

        def write(self, iterator):
            """Per-task: stream the partition's rows to a staging file
            (the Python DataSource writer API hands a Row iterator; the
            reference's executemany loop is the same row-wise protocol).
            Runs on executors; imports stay inside (by-value
            pickling)."""
            import json
            import os
            import uuid

            from pyspark import TaskContext

            tc = TaskContext.get()
            pid = tc.partitionId() if tc is not None else 0
            os.makedirs(os.path.join(self.path, "_staging"), exist_ok=True)
            token = uuid.uuid4().hex[:12]
            staged = os.path.join(
                self.path, "_staging", f"part-{pid:05d}-{token}.jsonl"
            )
            final = os.path.join(self.path, f"part-{pid:05d}-{token}.jsonl")
            n = 0
            with open(staged, "w") as f:
                for row in iterator:
                    d = row.asDict()
                    for k, v in d.items():
                        if hasattr(v, "strftime"):
                            d[k] = v.strftime(self.ts_fmt)
                    f.write(json.dumps(d) + "\n")
                    n += 1
                f.flush()
                os.fsync(f.fileno())
            return _StagedFile(staged, final, n)

        def commit(self, messages):
            """Driver-side atomic publish: rename every staged file into
            place, then write the manifest (presence of _MANIFEST is the
            committed marker readers key on). The manifest goes through
            tmp + fsync + os.replace — the same crash-window ordering
            the streaming twin's commit implements (r10 review: an
            in-place manifest write could be left truncated by a driver
            crash, which a manifest-keyed reader fails to parse; with
            the replace protocol the crash leaves either the previous
            state or the complete new manifest, and renamed part files
            without a manifest are invisible to manifest-keyed
            readers)."""
            import json
            import os

            total = 0
            for m in messages:
                os.replace(m.staged, m.final)
                total += m.n_rows
            manifest = os.path.join(self.path, "_MANIFEST")
            tmp = manifest + ".tmp"
            with open(tmp, "w") as f:
                json.dump(
                    {
                        "n_rows": total,
                        "files": sorted(
                            os.path.basename(m.final) for m in messages
                        ),
                    },
                    f,
                )
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, manifest)

        def abort(self, messages):
            import os
            import shutil

            for m in messages:
                try:
                    os.remove(m.staged)
                except FileNotFoundError:
                    pass
            shutil.rmtree(
                os.path.join(self.path, "_staging"), ignore_errors=True
            )

    class _JsonlSinkSource(DataSource):
        @classmethod
        def name(cls):
            return sink_name

        def writer(self, schema, overwrite):
            return _JsonlWriter(self.options)

    return _JsonlSinkSource


STREAM_SINK_NAME = "jsonl_stream_sink"


def make_jsonl_stream_sink():
    """Build (by value) the STREAMING writer DataSource — the
    exactly-once micro-batch counterpart of :func:`make_jsonl_sink`:
    ``write`` stages per-task files exactly like the batch writer, but
    the driver-side ``commit(messages, batchId)`` publishes each
    micro-batch under its own ``_BATCH<id>_MANIFEST`` — the per-batch
    transaction log that, combined with the engine's checkpointed
    offsets, gives end-to-end exactly-once (a replayed batch id
    atomically REPLACES its manifest with the replay's file list, and
    commit() sweeps part files no manifest references; readers key on
    manifests, so neither staging nor orphaned parts are ever
    visible)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamWriter,
        WriterCommitMessage,
    )

    sink_name = STREAM_SINK_NAME

    class _StagedFile(WriterCommitMessage):
        def __init__(self, staged: str, final: str, n_rows: int):
            self.staged, self.final, self.n_rows = staged, final, n_rows

    class _JsonlStreamWriter(DataSourceStreamWriter):
        def __init__(self, options):
            self.path = options["path"]
            self.ts_fmt = options.get("tsFormat", "%Y-%m-%dT%H:%M:%S.%f")

        def write(self, iterator):
            import json
            import os
            import uuid

            from pyspark import TaskContext

            tc = TaskContext.get()
            pid = tc.partitionId() if tc is not None else 0
            os.makedirs(os.path.join(self.path, "_staging"), exist_ok=True)
            token = uuid.uuid4().hex[:12]
            staged = os.path.join(
                self.path, "_staging", f"part-{pid:05d}-{token}.jsonl"
            )
            final = os.path.join(self.path, f"part-{pid:05d}-{token}.jsonl")
            n = 0
            with open(staged, "w") as f:
                for row in iterator:
                    d = row.asDict()
                    for k, v in d.items():
                        if hasattr(v, "strftime"):
                            d[k] = v.strftime(self.ts_fmt)
                    f.write(json.dumps(d) + "\n")
                    n += 1
                f.flush()
                os.fsync(f.fileno())
            return _StagedFile(staged, final, n)

        def commit(self, messages, batchId):
            import glob
            import json
            import os

            # Crash-window ordering (ADVICE r4): a commit that dies
            # between renaming SOME staged files and publishing the
            # manifest leaves committed-looking part files that abort()
            # (staged-only) can never clean, and the replayed batch then
            # publishes a manifest naming DIFFERENT uuids. Readers key
            # on manifests, so those orphans were never *visible* — but
            # they accumulate. Ordering here: (1) sweep part files not
            # referenced by any published manifest (the debris of a
            # previously crashed commit of this or any batch), (2)
            # rename staged -> final, (3) publish the manifest
            # atomically (tmp + fsync + os.replace) only after every
            # referenced file exists. A crash at any point leaves either
            # invisible-and-swept-later debris or a fully published
            # batch — never a manifest naming missing files.
            #
            # Cost bound (ADVICE r5): the manifest re-read + part glob is
            # O(stream lifetime), so doing it EVERY commit is quadratic
            # total. Crashed-commit debris can only predate this writer
            # (a live writer renames exactly what it then publishes), so
            # the full sweep runs once on the first commit after
            # (re)start; later commits maintain the referenced-set
            # incrementally and touch only their own files.
            this_batch = {os.path.basename(m.final) for m in messages}
            if getattr(self, "_referenced", None) is None:
                referenced = set(this_batch)
                for man in glob.glob(
                    os.path.join(self.path, "_BATCH*_MANIFEST")
                ):
                    try:
                        with open(man) as f:
                            referenced.update(json.load(f).get("files", []))
                    except (OSError, ValueError):
                        continue
                for part in glob.glob(
                    os.path.join(self.path, "part-*.jsonl")
                ):
                    if os.path.basename(part) not in referenced:
                        try:
                            os.remove(part)
                        except FileNotFoundError:
                            pass
                self._referenced = referenced
            else:
                self._referenced.update(this_batch)

            total = 0
            for m in messages:
                os.replace(m.staged, m.final)
                total += m.n_rows
            manifest = os.path.join(self.path, f"_BATCH{batchId}_MANIFEST")
            tmp = manifest + ".tmp"
            with open(tmp, "w") as f:
                json.dump(
                    {
                        "batch_id": batchId,
                        "n_rows": total,
                        "files": sorted(this_batch),
                    },
                    f,
                )
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, manifest)

        def abort(self, messages, batchId):
            import os

            for m in messages:
                try:
                    os.remove(m.staged)
                except FileNotFoundError:
                    pass

    class _JsonlStreamSinkSource(DataSource):
        @classmethod
        def name(cls):
            return sink_name

        def streamWriter(self, schema, overwrite):
            return _JsonlStreamWriter(self.options)

    return _JsonlStreamSinkSource
