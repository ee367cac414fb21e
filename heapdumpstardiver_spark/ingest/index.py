"""Pass 1 — driver-side metadata index over an HPROF file.

The cheap sequential pass (≙ HprofIndex::build_with_segments,
/root/reference/src/hprof_index.rs:54-217): string table, class
registry (LoadClass + ClassDump merge), stack frames/traces, flattened
instance-field layouts with shadow renames, and — the Spark-specific
part — a list of byte-range *splits* aligned to heap sub-record
boundaries, so pass 2 can parse the heavy instance data in parallel
tasks instead of the reference's rayon pool.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

from . import hprof as H


@dataclass
class RawFrame:
    frame_id: int
    method_name_id: int
    signature_id: int
    source_file_id: int
    class_serial: int
    line_num: int


@dataclass
class HprofIndex:
    header: H.Header
    strings: dict[int, str] = field(default_factory=dict)
    # class_obj_id → java name (from LoadClass, normalized)
    class_names: dict[int, str] = field(default_factory=dict)
    serial_to_class: dict[int, int] = field(default_factory=dict)
    classes: dict[int, H.ClassInfo] = field(default_factory=dict)
    frames: list[RawFrame] = field(default_factory=list)
    traces: list[tuple[int, int, list[int]]] = field(default_factory=list)
    splits: list[tuple[int, int]] = field(default_factory=list)
    record_counts: dict[str, int] = field(default_factory=dict)

    def class_name(self, class_obj_id: int) -> str:
        return self.class_names.get(class_obj_id, "(unresolved)")


def _flatten_layouts(idx: HprofIndex) -> None:
    """Build each class's full packed-field layout: own fields first,
    then superclass chain (the HPROF instance-bytes order), renaming
    shadowed names to ``DeclaringShortName@field`` — the reference's
    collision rule (util.rs:148-157)."""
    for info in idx.classes.values():
        layout: list[H.FieldDesc] = []
        seen: set[str] = set()
        cur = info
        while cur is not None:
            decl_name = idx.class_name(cur.class_obj_id)
            short = decl_name.rsplit(".", 1)[-1]
            for name_id, tcode in cur.own_fields:
                base = idx.strings.get(name_id, f"field_{name_id:x}")
                name = base if base not in seen else f"{short}@{base}"
                # extremely defensive: guarantee uniqueness
                while name in seen:
                    name += "_"
                seen.add(name)
                layout.append(H.FieldDesc(name=name, type_code=tcode, declaring_class=decl_name))
            cur = idx.classes.get(cur.super_class_obj_id)
        info.layout = layout


def build_index(path: str, target_split_bytes: int = 64 * 1024 * 1024) -> HprofIndex:
    with open(path, "rb") as f:
        buf = f.read()  # driver pass; mmap-equivalent sequential scan
    header = H.read_header(buf)
    idx = HprofIndex(header=header)
    id_size = header.id_size

    segment_ranges: list[tuple[int, int]] = []
    for tag, off, length in H.iter_records(buf, header):
        idx.record_counts[H.TAG_NAMES.get(tag, f"0x{tag:02x}")] = (
            idx.record_counts.get(H.TAG_NAMES.get(tag, f"0x{tag:02x}"), 0) + 1
        )
        if tag == H.TAG_UTF8:
            sid = H._read_id(buf, off, id_size)
            text = bytes(buf[off + id_size : off + length]).decode("utf-8", "replace")
            idx.strings[sid] = text
        elif tag == H.TAG_LOAD_CLASS:
            (serial,) = struct.unpack_from(">I", buf, off)
            class_obj_id = H._read_id(buf, off + 4, id_size)
            name_id = H._read_id(buf, off + 8 + id_size, id_size)
            name = H.jvm_name_to_java(idx.strings.get(name_id, f"class_{class_obj_id:x}"))
            idx.class_names[class_obj_id] = name
            idx.serial_to_class[serial] = class_obj_id
        elif tag == H.TAG_STACK_FRAME:
            fid = H._read_id(buf, off, id_size)
            m = H._read_id(buf, off + id_size, id_size)
            sig = H._read_id(buf, off + 2 * id_size, id_size)
            src = H._read_id(buf, off + 3 * id_size, id_size)
            serial, line = struct.unpack_from(">Ii", buf, off + 4 * id_size)
            idx.frames.append(RawFrame(fid, m, sig, src, serial, line))
        elif tag == H.TAG_STACK_TRACE:
            serial, thread_serial, n = struct.unpack_from(">III", buf, off)
            fids = [
                H._read_id(buf, off + 12 + i * id_size, id_size) for i in range(n)
            ]
            idx.traces.append((serial, thread_serial, fids))
        elif tag in (H.TAG_HEAP_DUMP, H.TAG_HEAP_DUMP_SEGMENT):
            segment_ranges.append((off, off + length))

    # Skip-scan segments: harvest ClassDumps (schema source) and plan
    # splits on sub-record boundaries.
    split_start = None
    split_bytes = 0
    for seg_start, seg_end in segment_ranges:
        pos = seg_start
        if split_start is None:
            split_start = pos
        while pos < seg_end:
            tag, nxt, meta = H.skip_sub_record(buf, pos, id_size)
            if tag == H.SUB_CLASS_DUMP:
                info = meta["class_info"]
                info.name = idx.class_name(info.class_obj_id)
                idx.classes[info.class_obj_id] = info
            split_bytes += nxt - pos
            pos = nxt
            if split_bytes >= target_split_bytes:
                idx.splits.append((split_start, pos))
                split_start = pos if pos < seg_end else None
                split_bytes = 0
        # segment boundary always ends a split (ranges never span the
        # 9-byte record header between segments)
        if split_start is not None and split_start < seg_end:
            idx.splits.append((split_start, seg_end))
        split_start = None
        split_bytes = 0

    _flatten_layouts(idx)
    return idx
