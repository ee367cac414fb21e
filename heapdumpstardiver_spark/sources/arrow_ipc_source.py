"""Spark 4 Python DataSource for Arrow IPC containers:
``spark.read.format("arrowipc").load(path)`` — one row per record.

Arrow IPC (the Feather V2 container and its streaming sibling) is the
zero-copy interchange format feature-store exports, DuckDB
``COPY TO ... (FORMAT arrow)``, Polars/pandas ``to_feather`` and ML
dataloaders all speak — a training-data engine needs to ingest it
next to parquet, JSONL (``ingest/jsonl.py``), WARC
(``sources/warc_source.py``) and HPROF. Spark has no built-in reader
for it; this source bridges it through the Python DataSource API
with pyarrow doing the decode.

The fast path matters here: ``read`` yields whole ``pyarrow
RecordBatch`` objects, which the Python DataSource runner ships to
the JVM as Arrow buffers — no per-row Python materialization at all
(the same Arrow-batch discipline as the engine's mapInPandas
stages). Schema comes from the first file's IPC schema footer (a
metadata-only open — no data pages touched), converted with Spark's
own arrow-schema mapping so nested/temporal types land exactly as
``spark.createDataFrame`` would land them.

Scale shape mirrors the WARC source: one input partition per FILE
(exports ship as many moderate files; file count is the parallelism
unit on a 1000-executor cluster), each task streaming only its own
batches. Both layouts are handled: the random-access FILE format
(.arrow / .feather, magic ``ARROW1``) and the STREAM format
(.arrows or anything without the magic).
"""

from __future__ import annotations

import glob as _glob
import os
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_EXTS = (".arrow", ".feather", ".arrows", ".ipc")


@dataclass
class _ArrowFile(InputPartition):
    path: str


def _is_file_format(path: str) -> bool:
    """The IPC FILE container starts with the ARROW1 magic; the
    stream format does not — sniff bytes, never trust extensions."""
    with open(path, "rb") as f:
        return f.read(6) == b"ARROW1"


def _open_reader(path: str):
    import pyarrow.ipc as ipc

    if _is_file_format(path):
        return ipc.open_file(path)
    return ipc.open_stream(path)


def _iter_batches(path: str):
    import pyarrow.ipc as ipc

    if _is_file_format(path):
        with ipc.open_file(path) as r:
            for i in range(r.num_record_batches):
                yield r.get_batch(i)
    else:
        with ipc.open_stream(path) as r:
            yield from r


def resolve_files(path: str) -> list[str]:
    p = os.path.abspath(path)
    if os.path.isdir(p):
        return sorted(
            f
            for ext in _EXTS
            for f in _glob.glob(os.path.join(p, f"*{ext}"))
        )
    return sorted(_glob.glob(p)) or [p]


class ArrowIpcReader(DataSourceReader):
    def __init__(self, path: str):
        self.files = resolve_files(path)
        if not self.files:
            raise ValueError(f"no Arrow IPC files under {path!r}")

    def partitions(self):
        return [_ArrowFile(f) for f in self.files]

    def read(self, partition: _ArrowFile):
        # Arrow-batch fast path: the runner ships RecordBatches to the
        # JVM as Arrow buffers — zero per-row Python cost.
        yield from _iter_batches(partition.path)


class ArrowIpcDataSource(DataSource):
    """``format("arrowipc")``: Arrow IPC file/stream containers, one
    partition per file, batches forwarded as Arrow buffers. Schema is
    read from the first file's IPC metadata; heterogeneous files are
    the caller's error (the strict posture of `catalog.load_table`)."""

    @classmethod
    def name(cls):
        return "arrowipc"

    def schema(self):
        from pyspark.sql.pandas.types import from_arrow_schema

        path = self.options.get("path")
        if not path:
            raise ValueError("format('arrowipc') requires .load(path)")
        first = resolve_files(path)[0]
        with _open_reader(first) as r:
            return from_arrow_schema(r.schema)

    def reader(self, schema):
        return ArrowIpcReader(self.options["path"])


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(ArrowIpcDataSource)
