"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource``) — the
connector-authoring surface (SURVEY §2.1's source family; the engine's
equivalent of writing a new upload adapter, ``app.py:191-205``).

``ArithGridDataSource`` is a deterministic generator source: N
partitions, each producing an arithmetic slice of ``[0, n_rows)`` with
a derived residue column — hermetic (no filesystem, no network), so
the catalog entry that reads it is exactly oracle-able via
``generate_series``. The point is the API contract, not the data:
``partitions()`` drives Spark's task planning (one task per
InputPartition — the same mechanism a real connector uses to expose
splits), and each ``read(partition)`` runs in a separate Python worker.

Determinism contract: rows depend only on (n_rows, n_parts, partition
index) — never on time, order, or worker identity.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

MOD = 97


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class ArithGridReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_parts = int(options.get("n_parts", 8))

    def partitions(self):
        step = -(-self.n_rows // self.n_parts)  # ceil division
        return [
            _Slice(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield (i, (i * i) % MOD)


class ArithGridDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "arith_grid"

    def schema(self) -> str:
        return "i bigint, residue bigint"

    def reader(self, schema) -> DataSourceReader:
        return ArithGridReader(self.options)


# ---------------------------------------------------------------------------
# Writer side of the connector surface — the two-phase commit protocol a
# real sink connector implements (the engine-native generalization of the
# reference's Mongo insert sink, ``app.py:60-71``). Each task streams its
# partition to a uniquely-named staging file ``part-<uuid>.jsonl.tmp`` and
# returns a WriterCommitMessage naming it; ``commit()`` runs exactly once
# on the driver AFTER every task succeeded, atomically renames the staged
# files to their final names, and writes a ``_MANIFEST.json`` recording
# per-file row counts. ``abort()`` deletes the staging files, so a failed
# job leaves no partial output visible — readers only ever trust files
# listed in the manifest. At scale this is the same contract as Spark's
# own FileCommitProtocol: task-temp + driver-side rename, O(1) driver
# state per task (one small message), no data through the driver.
class _JsonlCommit(WriterCommitMessage):
    def __init__(self, staged: str, final: str, n_rows: int):
        self.staged = staged
        self.final = final
        self.n_rows = n_rows


class JsonlCommitWriter(DataSourceWriter):
    def __init__(self, options, schema):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_commit: 'path' option is required")
        self.fields = [f.name for f in schema.fields]

    def write(self, iterator):
        os.makedirs(self.path, exist_ok=True)
        tag = uuid.uuid4().hex[:12]
        final = os.path.join(self.path, f"part-{tag}.jsonl")
        staged = final + ".tmp"
        n = 0
        with open(staged, "w", encoding="utf-8") as fh:
            for row in iterator:
                rec = {f: row[i] for i, f in enumerate(self.fields)}
                fh.write(json.dumps(rec, ensure_ascii=False) + "\n")
                n += 1
        return _JsonlCommit(staged, final, n)

    def commit(self, messages):
        files = {}
        for m in messages:
            os.rename(m.staged, m.final)
            files[os.path.basename(m.final)] = m.n_rows
        manifest = {
            "files": files,
            "total_rows": sum(files.values()),
        }
        with open(
            os.path.join(self.path, "_MANIFEST.json"), "w"
        ) as fh:
            json.dump(manifest, fh, sort_keys=True)

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.staged):
                os.remove(m.staged)


class JsonlCommitDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_commit"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return JsonlCommitWriter(self.options, schema)
