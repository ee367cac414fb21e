"""Spark 4 Python DataSource for TFRecord containers:
``spark.read.format("tfrecord").load(path)`` — one row per record.

TFRecord is the length-delimited record container TensorFlow's
``tf.data`` pipelines read and write (public framing spec in the
TensorFlow docs and ``tensorflow/core/lib/io/record_writer.h``):

    uint64le  length
    uint32le  masked_crc32c(length bytes)
    byte[length] payload
    uint32le  masked_crc32c(payload)

with ``mask(crc) = ((crc >> 15) | (crc << 17)) + 0xa282ead8 mod 2^32``
and CRC32C the Castagnoli polynomial (reflected 0x82F63B78). A
training-data engine meets these files constantly — exported example
shards, teacher logits, cached features — so this source ingests
them next to parquet, JSONL, WARC, HPROF and Arrow IPC. The payload
is surfaced as an OPAQUE binary column: most payloads are
``tf.train.Example`` protos, and protobuf decode follows the
multimodal injected-codec discipline (this container has no protobuf
runtime; callers inject their decoder as an Arrow-batched UDF over
the payload column — the framing, checksums, partitioning and commit
protocol here are the real, tested engine surface).

Scale shape mirrors the WARC/Arrow sources: one input partition per
FILE (TFRecord datasets ship as many uniform shards; file count is
the parallelism unit on a 1000-executor cluster), each task
streaming only its own records and yielding pyarrow RecordBatches —
the runner ships them to the JVM as Arrow buffers. CRC validation is
on by default and costs a pure-Python table-driven pass per payload;
at 100 TB set ``option("validate", "false")`` (structural framing is
still enforced) or validate a sampled fraction of shards — the same
posture TensorFlow itself takes (its reader skips CRC checks unless
asked).

Writable: ``df.write.format("tfrecord").mode(...).save(path)`` for a
DataFrame with exactly ONE binary column — each partition streams
its payloads into one ``.tfrecord`` shard under the same
staged-rename commit protocol as the Arrow IPC sink (job-unique part
names, job-scoped abort glob, TTL-scoped orphan sweep).
"""

from __future__ import annotations

import glob as _glob
import os
import struct
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    InputPartition,
    WriterCommitMessage,
)

from heapdumpstardiver_spark.sources.dir_tail import DirectoryTailStreamReader
from heapdumpstardiver_spark.sources.stream_sink import BatchReplayStreamWriter

_EXTS = (".tfrecord", ".tfrecords")
_STAGING_TTL_S = 3600.0  # same orphan-sweep policy as the Arrow sink
_BATCH_ROWS = 1024

# ---------------------------------------------------------------------------
# CRC32C (Castagnoli) + the TFRecord mask — pure Python, table-driven.
# ---------------------------------------------------------------------------


def _make_table() -> list[int]:
    poly = 0x82F63B78  # reflected Castagnoli polynomial
    table = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ poly if c & 1 else c >> 1
        table.append(c)
    return table


_CRC_TABLE = _make_table()


def crc32c(data: bytes) -> int:
    """CRC32C over *data* (test vector: b'123456789' -> 0xE3069283)."""
    crc = 0xFFFFFFFF
    tab = _CRC_TABLE
    for b in data:
        crc = tab[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def masked_crc(data: bytes) -> int:
    """TFRecord's masked CRC: rotate right 15 and add the mask delta."""
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# Framing
# ---------------------------------------------------------------------------


def write_record(f, payload: bytes) -> None:
    header = struct.pack("<Q", len(payload))
    f.write(header)
    f.write(struct.pack("<I", masked_crc(header)))
    f.write(payload)
    f.write(struct.pack("<I", masked_crc(payload)))


def iter_records(path: str, validate: bool = True):
    """Yield ``(index, payload, crc_ok)`` tuples; ``crc_ok`` is None
    when validation is off. Truncated framing raises — a half-written
    record means the shard is torn, and silently dropping the tail
    would under-count without a trace."""
    with open(path, "rb") as f:
        idx = 0
        while True:
            header = f.read(8)
            if not header:
                return
            if len(header) < 8:
                raise ValueError(f"{path}: truncated length at record {idx}")
            (length,) = struct.unpack("<Q", header)
            footer = f.read(4)
            if len(footer) < 4:
                raise ValueError(f"{path}: truncated length CRC at record {idx}")
            payload = f.read(length)
            if len(payload) < length:
                raise ValueError(f"{path}: truncated payload at record {idx}")
            pcrc = f.read(4)
            if len(pcrc) < 4:
                raise ValueError(f"{path}: truncated payload CRC at record {idx}")
            ok = None
            if validate:
                ok = struct.unpack("<I", footer)[0] == masked_crc(header) and (
                    struct.unpack("<I", pcrc)[0] == masked_crc(payload)
                )
            yield idx, payload, ok
            idx += 1


def resolve_files(path: str) -> list[str]:
    p = os.path.abspath(path)
    if os.path.isdir(p):
        return sorted(
            f for ext in _EXTS for f in _glob.glob(os.path.join(p, f"*{ext}"))
        )
    return sorted(_glob.glob(p)) or [p]


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------


@dataclass
class _TfrFile(InputPartition):
    path: str
    validate: bool


class TfRecordReader(DataSourceReader):
    def __init__(self, path: str, validate: bool):
        self.path = path
        self.validate = validate
        self.files = resolve_files(path)

    def partitions(self):
        # loud failure lives here, not __init__ (the WRITE command also
        # instantiates the reader against a possibly-empty target)
        if not self.files or not os.path.exists(self.files[0]):
            raise ValueError(f"no TFRecord files under {self.path!r}")
        return [_TfrFile(f, self.validate) for f in self.files]

    def read(self, partition: _TfrFile):
        yield from _file_record_batches(partition.path, partition.validate)


def _file_record_batches(path: str, validate: bool):
    """Arrow RecordBatches for one shard — shared by the batch reader
    and the stream reader so both surfaces decode identically."""
    import pyarrow as pa

    idxs: list[int] = []
    lens: list[int] = []
    pays: list[bytes] = []
    oks: list[bool | None] = []

    def flush():
        return pa.record_batch(
            [
                pa.array(idxs, pa.int64()),
                pa.array(lens, pa.int64()),
                pa.array(pays, pa.binary()),
                pa.array(oks, pa.bool_()),
            ],
            names=["record_index", "length", "payload", "crc_ok"],
        )

    for idx, payload, ok in iter_records(path, validate):
        idxs.append(idx)
        lens.append(len(payload))
        pays.append(payload)
        oks.append(ok)
        if len(idxs) >= _BATCH_ROWS:
            yield flush()
            idxs, lens, pays, oks = [], [], [], []
    if idxs:
        yield flush()


# ---------------------------------------------------------------------------
# Stream reader — tail a shard directory as a Structured Streaming source.
# ---------------------------------------------------------------------------


class TfRecordStreamReader(DirectoryTailStreamReader):
    """``spark.readStream.format("tfrecord").load(dir)`` tails a
    directory of TFRecord shards: each micro-batch reads exactly the
    files that APPEARED since the last committed offset, one input
    partition per new file, records decoded executor-side by the same
    Arrow-batch generator as the batch reader. Offset semantics and
    the rename-atomic discovery contract live in
    :class:`DirectoryTailStreamReader`; an empty directory is a
    normal pre-export state here because the schema is fixed."""

    def __init__(self, path: str, validate: bool, keep: int = 0):
        super().__init__(path, tuple(f"*{e}" for e in _EXTS), keep)
        self.validate = validate

    def _partition(self, path: str):
        return _TfrFile(path, self.validate)

    def read(self, partition: _TfrFile):
        yield from _file_record_batches(partition.path, partition.validate)


# ---------------------------------------------------------------------------
# Writer — the Arrow IPC sink's staged-commit protocol, TFRecord framing.
# ---------------------------------------------------------------------------


@dataclass
class _TfrCommit(WriterCommitMessage):
    staged: str | None = None
    rows: int = 0


class TfRecordWriter(DataSourceArrowWriter):
    """One ``.tfrecord`` shard per non-empty partition, staged as
    ``.staging-<job>-<uuid>`` and promoted to
    ``part-NNNNN-<job>.tfrecord`` by the driver's commit. The abort
    sweep is job-scoped by glob because Spark hands ``abort`` all-None
    messages on job failure (see ArrowIpcWriter for the incident
    notes this protocol encodes)."""

    def __init__(self, path: str, overwrite: bool, preexisting: list[str]):
        import uuid

        self.path = path
        self.overwrite = overwrite
        self.preexisting = preexisting
        self.job_id = uuid.uuid4().hex[:12]

    def write(self, iterator):
        import uuid

        it = iter(iterator)
        first = next(it, None)
        if first is None:
            return _TfrCommit()
        staged = os.path.join(
            self.path, f".staging-{self.job_id}-{uuid.uuid4().hex}"
        )
        rows = 0
        try:
            with open(staged, "wb") as f:
                for batch in [first, *it]:
                    if batch.num_columns != 1:
                        raise ValueError(
                            "format('tfrecord') writes exactly one binary "
                            f"column, got {batch.num_columns}"
                        )
                    for payload in batch.column(0):
                        write_record(f, payload.as_py())
                        rows += 1
        except BaseException:
            try:
                os.remove(staged)  # failing tasks self-clean eagerly
            except OSError:
                pass
            raise
        return _TfrCommit(staged=staged, rows=rows)

    def commit(self, messages):
        staged = [m.staged for m in messages if m and m.staged]
        for i, s in enumerate(sorted(staged)):
            os.rename(
                s,
                os.path.join(
                    self.path, f"part-{i:05d}-{self.job_id}.tfrecord"
                ),
            )
        if self.overwrite:
            for old in self.preexisting:
                try:
                    os.remove(old)
                except OSError:
                    pass

    def abort(self, messages):
        for staged in _glob.glob(
            os.path.join(self.path, f".staging-{self.job_id}-*")
        ):
            try:
                os.remove(staged)
            except OSError:
                pass


class TfRecordStreamWriter(BatchReplayStreamWriter):
    """``df.writeStream.format("tfrecord")`` — continuous export of
    trainer-ready shards. The batch-id-keyed replay-convergent commit
    protocol lives in :class:`BatchReplayStreamWriter`; this subclass
    only frames the payload column per shard."""

    ext = ".tfrecord"

    def write_shard(self, staged_path: str, batches) -> int:
        rows = 0
        with open(staged_path, "wb") as f:
            for batch in batches:
                if batch.num_columns != 1:
                    raise ValueError(
                        "format('tfrecord') writes exactly one binary "
                        f"column, got {batch.num_columns}"
                    )
                for payload in batch.column(0):
                    write_record(f, payload.as_py())
                    rows += 1
        return rows


class TfRecordDataSource(DataSource):
    """``format("tfrecord")``: TFRecord shards, one partition per
    file, records surfaced as (record_index, length, payload, crc_ok)
    with payloads opaque binary. ``option("validate", "false")``
    skips the CRC pass (framing is still enforced). Also readable as
    a stream (``spark.readStream`` tails the directory for newly
    committed shards — see TfRecordStreamReader)."""

    @classmethod
    def name(cls):
        return "tfrecord"

    def schema(self):
        return (
            "record_index bigint, length bigint, payload binary, "
            "crc_ok boolean"
        )

    def _validate_opt(self) -> bool:
        return str(self.options.get("validate", "true")).lower() not in (
            "false",
            "0",
            "no",
        )

    def reader(self, schema):
        return TfRecordReader(self.options["path"], self._validate_opt())

    def streamReader(self, schema):
        return TfRecordStreamReader(
            self.options["path"],
            self._validate_opt(),
            int(self.options.get("offset_keep", 0)),
        )

    def _prep_write_target(self, schema) -> str:
        """Shared batch/stream sink preamble: resolve the target,
        enforce the single-binary-column contract, sweep TTL-expired
        staging orphans of hard-crashed jobs."""
        import time

        path = os.path.abspath(self.options.get("path") or "")
        if not path:
            raise ValueError("format('tfrecord') write requires .save(path)")
        if (
            len(schema.fields) != 1
            or schema.fields[0].dataType.simpleString() != "binary"
        ):
            raise ValueError(
                "format('tfrecord') writes a single binary column; got "
                f"schema {schema.simpleString()}"
            )
        os.makedirs(path, exist_ok=True)
        now = time.time()
        for stale in _glob.glob(os.path.join(path, ".staging-*")):
            try:
                if now - os.path.getmtime(stale) > _STAGING_TTL_S:
                    os.remove(stale)
            except OSError:
                pass
        return path

    def streamWriter(self, schema, overwrite: bool):
        # appending one shard set per micro-batch IS the streaming
        # semantics — the immutable-snapshot refusal below is a
        # batch-sink posture only
        return TfRecordStreamWriter(self._prep_write_target(schema))

    def writer(self, schema, overwrite: bool):
        path = self._prep_write_target(schema)
        preexisting = [
            f for ext in _EXTS for f in _glob.glob(os.path.join(path, f"*{ext}"))
        ]
        if preexisting and not overwrite:
            raise ValueError(
                f"path {path!r} already holds TFRecord shards; use "
                "mode('overwrite') (append is not supported — exports "
                "are immutable snapshots)"
            )
        return TfRecordWriter(path, overwrite, preexisting)


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(TfRecordDataSource)
