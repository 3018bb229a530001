"""Arrow IPC as a native Spark 4 Python DataSource.

The modern counterpart of ``sources/arrow_ipc.py``'s binaryFile +
mapInPandas composition: Spark 4's ``pyspark.sql.datasource`` API lets a
pure-Python format plug into the regular reader surface —

    spark.dataSource.register(ArrowIpcDataSource)
    spark.read.format("arrow_ipc").load("/path/to/dir")

with the engine handling partition planning, scheduling and Arrow
transport. Each IPC file is one :class:`InputPartition`, so read
parallelism = file count (the unit every file source has), partitions
ship only a path string to executors, and batches are yielded directly
as ``pyarrow.RecordBatch`` — Spark consumes them without a pandas
detour. Both IPC framings (file + stream) are read, same as the
composition source.

Scale: the driver touches ONE footer for the schema; executors read
only their own file. Writers should keep IPC files at the usual
128 MB–1 GB so one file's decoded batches fit a task comfortably.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .arrow_ipc import _arrow_files, sniff_schema  # shared sniffing helpers


class _ArrowFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class ArrowIpcReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("arrow_ipc: 'path' option or load(path) required")
        self._files = _arrow_files(path)
        if not self._files:
            raise ValueError(f"arrow_ipc: no Arrow IPC files under {path}")

    def partitions(self) -> Sequence[InputPartition]:
        return [_ArrowFilePartition(f) for f in self._files]

    def read(self, partition: _ArrowFilePartition) -> Iterator:
        # executor-side: decode one file, yield arrow batches directly
        import pyarrow.ipc as ipc

        with open(partition.path, "rb") as f:
            head = f.read(6)
        if head == b"ARROW1":
            reader = ipc.open_file(partition.path)
            for i in range(reader.num_record_batches):
                yield reader.get_batch(i)
        else:
            with ipc.open_stream(partition.path) as r:
                for batch in r:
                    yield batch


class ArrowIpcDataSource(DataSource):
    """``spark.read.format("arrow_ipc")`` — register once per session via
    ``spark.dataSource.register(ArrowIpcDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "arrow_ipc"

    def schema(self):
        from pyspark.sql import types as T
        from pyspark.sql.pandas.types import from_arrow_type

        path = self.options.get("path")
        if not path:
            raise ValueError("arrow_ipc: 'path' option or load(path) required")
        files = _arrow_files(path)
        if not files:
            raise ValueError(f"arrow_ipc: no Arrow IPC files under {path}")
        arrow_schema = sniff_schema(files[0])
        return T.StructType(
            [
                T.StructField(f.name, from_arrow_type(f.type), True)
                for f in arrow_schema
            ]
        )

    def reader(self, schema) -> ArrowIpcReader:
        return ArrowIpcReader(dict(self.options))
