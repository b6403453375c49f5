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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
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
