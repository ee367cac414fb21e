"""Spark 4 Python DataSource exposing an HPROF dump's top-level record
index as a DataFrame: ``spark.read.format("hprof").load(path)``.

This is the lazy, Catalyst-integrated face of the binary scan (A1/A2):
where :mod:`..ingest.convert` materializes the full warehouse (many
tables, one pass), this source answers record-level questions —
`count-records` tallies, record-size histograms, offset maps — without
writing anything, and composes with any DataFrame operator
(≙ the reference's count_records command,
/root/reference/src/commands/count_records.rs:7-29).

Scale shape: `partitions()` is a driver pass over the 9-byte record
HEADERS only (seek past bodies — O(records), touches ~1 page per
record run), cutting byte ranges at record boundaries every
``split_bytes``. Each executor task then mmaps its own range — the
same no-shared-state posture as the ingest tasks, so a 1000-executor
scan reads disjoint ranges with zero coordination.
"""

from __future__ import annotations

import mmap
import os
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..ingest import hprof as H


@dataclass
class _RecordRange(InputPartition):
    start: int
    end: int


class HprofRecordsReader(DataSourceReader):
    def __init__(self, path: str, split_bytes: int, view: str = "records"):
        self.path = os.path.abspath(path)
        self.split_bytes = split_bytes
        self.view = view
        self.id_size = 8

    def partitions(self):
        parts: list[_RecordRange] = []
        with open(self.path, "rb") as f:
            with mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ) as buf:
                header = H.read_header(buf)
                self.id_size = header.id_size
                start = header.body_offset
                pos = start
                for _tag, body_off, body_len in H.iter_records(buf, header):
                    rec_end = body_off + body_len
                    if rec_end - start >= self.split_bytes:
                        parts.append(_RecordRange(start, rec_end))
                        start = rec_end
                    pos = rec_end
                if pos > start:
                    parts.append(_RecordRange(start, pos))
        return parts or [_RecordRange(0, 0)]

    def read(self, partition: _RecordRange):
        if partition.end <= partition.start:
            return
        with open(self.path, "rb") as f:
            with mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ) as buf:
                pos = partition.start
                while pos + 9 <= partition.end:
                    tag = buf[pos]
                    (length,) = H.struct.unpack_from(">I", buf, pos + 5)
                    body = pos + 9
                    if self.view == "strings":
                        if tag == H.TAG_UTF8 and length >= self.id_size:
                            sid = H._read_id(buf, body, self.id_size)
                            val = bytes(
                                buf[body + self.id_size : body + length]
                            ).decode("utf-8", "replace")
                            yield (sid, val)
                    elif self.view == "instances":
                        if tag in (H.TAG_HEAP_DUMP, H.TAG_HEAP_DUMP_SEGMENT):
                            sp, send = body, body + length
                            while sp < send:
                                sub, nxt, meta = H.skip_sub_record(
                                    buf, sp, self.id_size
                                )
                                row = self._instance_row(buf, sp, sub, meta)
                                if row is not None:
                                    yield row
                                sp = nxt
                    elif self.view == "gc_roots":
                        if tag in (H.TAG_HEAP_DUMP, H.TAG_HEAP_DUMP_SEGMENT):
                            sp, send = body, body + length
                            while sp < send:
                                sub, nxt, _meta = H.skip_sub_record(
                                    buf, sp, self.id_size
                                )
                                if sub in H.ROOT_NAMES:
                                    obj_id = H._read_id(
                                        buf, sp + 1, self.id_size
                                    )
                                    # u64 -> signed int64, the robo-mode
                                    # id convention of the warehouse.
                                    if obj_id >= 1 << 63:
                                        obj_id -= 1 << 64
                                    yield (
                                        obj_id,
                                        H.ROOT_NAMES[sub],
                                        sp,
                                    )
                                sp = nxt
                    else:
                        yield (
                            pos,
                            int(tag),
                            H.TAG_NAMES.get(tag, f"0x{tag:02x}"),
                            length,
                        )
                    pos += 9 + length

    def _instance_row(self, buf, sp: int, sub: int, meta: dict):
        """One row per heap OBJECT sub-record — instance, object array,
        primitive array, or class object — mirroring exactly the row set
        of the warehouse's ``_object_index``
        (≙ /root/reference/src/commands/dump_to_parquet.rs:246-370,
        499-512: every object kind gets an index row)."""
        ids = self.id_size

        def s64(v: int) -> int:
            return v - (1 << 64) if v >= 1 << 63 else v

        if sub == H.SUB_INSTANCE_DUMP:
            obj_id = H._read_id(buf, sp + 1, ids)
            cls_id = H._read_id(buf, sp + 1 + ids + 4, ids)
            (nbytes,) = H.struct.unpack_from(">I", buf, sp + 1 + 2 * ids + 4)
            return (s64(obj_id), "instance", s64(cls_id), int(nbytes))
        if sub == H.SUB_OBJECT_ARRAY_DUMP:
            obj_id = H._read_id(buf, sp + 1, ids)
            (n,) = H.struct.unpack_from(">I", buf, sp + 1 + ids + 4)
            cls_id = H._read_id(buf, sp + 1 + ids + 8, ids)
            return (s64(obj_id), "object_array", s64(cls_id), int(n))
        if sub == H.SUB_PRIMITIVE_ARRAY_DUMP:
            obj_id = H._read_id(buf, sp + 1, ids)
            (n,) = H.struct.unpack_from(">I", buf, sp + 1 + ids + 4)
            return (s64(obj_id), "primitive_array", None, int(n))
        if sub == H.SUB_CLASS_DUMP:
            info = meta["class_info"]
            return (s64(info.class_obj_id), "class", s64(info.class_obj_id), 0)
        return None


class HprofDataSource(DataSource):
    """``format("hprof")``: one row per top-level HPROF record
    (default view); ``option("view", "strings")`` yields the UTF8
    string dictionary (A4), ``option("view", "gc_roots")`` walks
    heap-dump sub-records (explicit lengths — no class registry
    needed) yielding the 9-way GC root set (A17), and
    ``option("view", "instances")`` yields one row per heap object
    (instance / object array / primitive array / class) — the lazy
    twin of the warehouse's ``_object_index`` (A6) — each as a
    DataFrame instead of a materialized warehouse table."""

    @classmethod
    def name(cls):
        return "hprof"

    def schema(self):
        view = self.options.get("view", "records")
        if view == "strings":
            return "string_id BIGINT, value STRING"
        if view == "gc_roots":
            return "obj_id BIGINT, root_type STRING, offset BIGINT"
        if view == "instances":
            return "obj_id BIGINT, kind STRING, class_obj_id BIGINT, n BIGINT"
        return "offset BIGINT, tag INT, tag_name STRING, body_len BIGINT"

    def reader(self, schema):
        path = self.options.get("path")
        if not path:
            raise ValueError("hprof source requires a path: .load('/dump.hprof')")
        return HprofRecordsReader(
            path,
            int(self.options.get("split_bytes", 64 << 20)),
            self.options.get("view", "records"),
        )


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(HprofDataSource)
