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


def _crc32c_bytewise(data: bytes) -> int:
    """Reference per-byte CRC32C (test vector: b'123456789' ->
    0xE3069283). Kept for short inputs (record headers) where numpy
    call overhead exceeds the loop, and as the parity oracle for the
    vectorized path in tests."""
    crc = 0xFFFFFFFF
    tab = _CRC_TABLE
    for b in data:
        crc = tab[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


# Vectorized CRC32C (r13, optimization guide §4 — the per-byte Python
# loop ran at ~8 MB/s and dominated every validating TFRecord scan and
# every sink write). CRC update is affine over GF(2): one byte-step
# from state c is c' = (c >> 8) ^ TAB[(c ^ b) & 0xFF]
#                    = advance_zero(c) ^ TAB[b]        (TAB is linear),
# so the state after a chunk is the zero-advanced initial state XORed
# with each byte's contribution advanced by its TRAILING distance:
# TD[d][b] = TAB[b] advanced d zero-steps. TD is precomputed once per
# process for distances < _CRC_CHUNK and evaluated as one numpy gather
# + xor-reduce; chunks longer than the table chain through
# advance_L(state) = TD[L-1][s0]^TD[L-2][s1]^TD[L-3][s2]^TD[L-4][s3]
# (the state bytes are just contributions at trailing distances
# L..L-3). ~100x the per-byte throughput, bit-identical output.
_CRC_CHUNK = 8192
_CRC_SMALL = 64  # below this the per-byte loop wins
_CRC_TD = None  # lazy: (_CRC_CHUNK, 256) uint32 contribution table
_CRC_TAB_NP = None
_CRC_FLAT = None
_CRC_IDX = None


def _crc_tables():
    global _CRC_TD, _CRC_TAB_NP, _CRC_FLAT, _CRC_IDX
    if _CRC_TD is None:
        import numpy as np

        tab = np.array(_CRC_TABLE, dtype=np.uint32)
        td = np.empty((_CRC_CHUNK + 4, 256), dtype=np.uint32)
        td[0] = tab
        for d in range(1, _CRC_CHUNK + 4):
            prev = td[d - 1]
            td[d] = (prev >> np.uint32(8)) ^ tab[prev & np.uint32(0xFF)]
        _CRC_TD, _CRC_TAB_NP = td, tab
        # flat-gather accelerators: row offsets for trailing distances
        # m-1..0 are the tail of this precomputed descending ramp
        _CRC_FLAT = td.reshape(-1)
        _CRC_IDX = (
            np.arange(_CRC_CHUNK - 1, -1, -1, dtype=np.int64) * 256
        )
    return _CRC_TD, _CRC_TAB_NP


def crc32c(data: bytes) -> int:
    """CRC32C over *data* (test vector: b'123456789' -> 0xE3069283)."""
    n = len(data)
    if n < _CRC_SMALL:
        return _crc32c_bytewise(data)
    import numpy as np

    td, _tab = _crc_tables()
    flat, idx = _CRC_FLAT, _CRC_IDX
    arr = np.frombuffer(data, dtype=np.uint8)
    state = 0xFFFFFFFF
    off = 0
    while n - off >= 4:
        m = min(_CRC_CHUNK, n - off)
        chunk = arr[off : off + m]
        lin = int(
            np.bitwise_xor.reduce(
                flat.take(idx[_CRC_CHUNK - m :] + chunk)
            )
        )
        state = (
            int(td[m - 1][state & 0xFF])
            ^ int(td[m - 2][(state >> 8) & 0xFF])
            ^ int(td[m - 3][(state >> 16) & 0xFF])
            ^ int(td[m - 4][(state >> 24) & 0xFF])
            ^ lin
        )
        off += m
    tab = _CRC_TABLE
    for b in data[off:]:  # <4-byte tail: plain byte-steps
        state = tab[(state ^ b) & 0xFF] ^ (state >> 8)
    return state ^ 0xFFFFFFFF


def masked_crc(data: bytes) -> int:
    """TFRecord's masked CRC: rotate right 15 and add the mask delta."""
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def crc32c_many(items: list[bytes]) -> list[int]:
    """CRC32C of many byte strings in ONE vectorized pass — the
    per-record reader/writer hot path (r13, guide §4): a single
    gather + ``xor.reduceat`` over the concatenated payloads
    amortizes the numpy call overhead that dominates per-record
    calls at typical (~hundreds of bytes) record sizes. Bit-identical
    to ``crc32c`` per item; items outside the vector window (< 4
    bytes or >= _CRC_CHUNK) fall back to the scalar path."""
    import numpy as np

    td, _tab = _crc_tables()
    out = [0] * len(items)
    vec_i: list[int] = []
    vec_p: list[bytes] = []
    for i, p in enumerate(items):
        if 4 <= len(p) < _CRC_CHUNK:
            vec_i.append(i)
            vec_p.append(p)
        else:
            out[i] = crc32c(p)
    if vec_p:
        lens = np.fromiter(
            (len(p) for p in vec_p), dtype=np.int64, count=len(vec_p)
        )
        arr = np.frombuffer(b"".join(vec_p), dtype=np.uint8)
        ends = np.cumsum(lens)
        starts = ends - lens
        d = np.repeat(ends, lens) - 1 - np.arange(arr.shape[0])
        contrib = _CRC_FLAT.take(d * 256 + arr)
        lin = np.bitwise_xor.reduceat(contrib, starts)
        # advance of the 0xFFFFFFFF init over n zero-steps: all four
        # state bytes are 0xFF at trailing distances n-1 .. n-4
        init = (
            td[lens - 1, 0xFF]
            ^ td[lens - 2, 0xFF]
            ^ td[lens - 3, 0xFF]
            ^ td[lens - 4, 0xFF]
        )
        crcs = (init ^ lin) ^ np.uint32(0xFFFFFFFF)
        for i, c in zip(vec_i, crcs):
            out[i] = int(c)
    return out


def masked_crc_many(items: list[bytes]) -> list[int]:
    return [
        (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF
        for c in crc32c_many(items)
    ]


# ---------------------------------------------------------------------------
# Framing
# ---------------------------------------------------------------------------


def write_record(f, payload: bytes) -> None:
    header = struct.pack("<Q", len(payload))
    f.write(header)
    f.write(struct.pack("<I", masked_crc(header)))
    f.write(payload)
    f.write(struct.pack("<I", masked_crc(payload)))


def write_records(f, payloads: list[bytes]) -> None:
    """Frame *payloads* with ONE vectorized CRC pass over all headers
    + payloads and one buffered write (r13, guide §4) — byte-identical
    to per-record `write_record` calls."""
    headers = [struct.pack("<Q", len(p)) for p in payloads]
    crcs = masked_crc_many(headers + payloads)
    n = len(payloads)
    parts: list[bytes] = []
    for i in range(n):
        parts.append(headers[i])
        parts.append(struct.pack("<I", crcs[i]))
        parts.append(payloads[i])
        parts.append(struct.pack("<I", crcs[n + i]))
    f.write(b"".join(parts))


def _iter_frames(path: str):
    """Raw frames: (index, header_bytes, stored_header_crc, payload,
    stored_payload_crc). Truncated framing raises — a half-written
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
            yield (
                idx,
                header,
                struct.unpack("<I", footer)[0],
                payload,
                struct.unpack("<I", pcrc)[0],
            )
            idx += 1


def iter_records(path: str, validate: bool = True):
    """Yield ``(index, payload, crc_ok)`` tuples; ``crc_ok`` is None
    when validation is off."""
    for idx, header, hcrc, payload, pcrc in _iter_frames(path):
        ok = None
        if validate:
            ok = hcrc == masked_crc(header) and pcrc == masked_crc(payload)
        yield idx, payload, ok


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
    heads: list[bytes] = []
    stored: list[tuple[int, int]] = []
    pays: list[bytes] = []

    def flush():
        if validate:
            # ONE vectorized CRC pass over the batch's headers +
            # payloads (r13, guide §4 — the per-record scalar calls
            # dominated every validating scan)
            crcs = masked_crc_many(heads + pays)
            n = len(pays)
            oks: list[bool | None] = [
                stored[i][0] == crcs[i] and stored[i][1] == crcs[n + i]
                for i in range(n)
            ]
        else:
            oks = [None] * len(pays)
        return pa.record_batch(
            [
                pa.array(idxs, pa.int64()),
                pa.array([len(p) for p in pays], pa.int64()),
                pa.array(pays, pa.binary()),
                pa.array(oks, pa.bool_()),
            ],
            names=["record_index", "length", "payload", "crc_ok"],
        )

    for idx, header, hcrc, payload, pcrc in _iter_frames(path):
        idxs.append(idx)
        heads.append(header)
        stored.append((hcrc, pcrc))
        pays.append(payload)
        if len(idxs) >= _BATCH_ROWS:
            yield flush()
            idxs, heads, stored, pays = [], [], [], []
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
                    payloads = [p.as_py() for p in batch.column(0)]
                    write_records(f, payloads)
                    rows += len(payloads)
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
                payloads = [p.as_py() for p in batch.column(0)]
                write_records(f, payloads)
                rows += len(payloads)
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
