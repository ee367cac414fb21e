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
    truncated: bool = False

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


def _scan_segment(
    path: str,
    seg_start: int,
    seg_end: int,
    id_size: int,
    target_split_bytes: int,
    tolerate_truncation: bool = False,
) -> tuple[list, list[tuple[int, int]]]:
    """Skip-scan one heap segment: harvest ClassDumps and plan split
    boundaries on sub-record boundaries. Reads ONLY its byte range, so
    it can run as a Spark task (segments are independent — a split
    never spans the record header between segments).

    The walk is a lean inline skipper (no per-record allocation): the
    generic ``skip_sub_record`` builds a meta dict per call, which at
    hundreds of millions of sub-records is the difference between a
    metadata pass and a second data pass. Constant-stride RUNS of
    instance/array records (the bulk of any heap) are leapt over with a
    vectorized numpy probe — same trick as the convert pass — capped at
    the current split's remaining byte budget so split sizes still land
    on ~target_split_bytes.
    """
    import numpy as np

    with open(path, "rb") as f:
        f.seek(seg_start)
        buf = f.read(seg_end - seg_start)
    n = len(buf)
    bnp = np.frombuffer(buf, dtype=np.uint8)
    RUN_PROBE = 4096

    def probe_run(pos, limit, stride, checks):
        """# of consecutive records at *pos* (stride-spaced) passing the
        header *checks*; bounded by *limit* bytes and RUN_PROBE."""
        count = min(RUN_PROBE, limit // stride)
        if count <= 1:
            return 1
        base = pos + stride * np.arange(count, dtype=np.int64)
        ok = np.ones(count, dtype=bool)
        for off, width, want in checks:
            v = bnp[base + off].astype(np.uint64)
            for j in range(1, width):
                v = (v << np.uint64(8)) | bnp[base + off + j]
            ok &= v == want
        run = int(np.argmin(ok)) if not ok.all() else count
        return run if run > 0 else 1

    unpack_I = struct.Struct(">I").unpack_from
    unpack_IB = struct.Struct(">IB").unpack_from  # prim-array count + elem type
    prim_sizes = H.PRIM_SIZES
    CLS, INST, OARR, PARR = (
        H.SUB_CLASS_DUMP,
        H.SUB_INSTANCE_DUMP,
        H.SUB_OBJECT_ARRAY_DUMP,
        H.SUB_PRIMITIVE_ARRAY_DUMP,
    )
    id4 = id_size + 4
    root_skip = {
        H.SUB_ROOT_UNKNOWN: id_size,
        H.SUB_ROOT_STICKY_CLASS: id_size,
        H.SUB_ROOT_MONITOR_USED: id_size,
        H.SUB_ROOT_JNI_GLOBAL: 2 * id_size,
        H.SUB_ROOT_JNI_LOCAL: id_size + 8,
        H.SUB_ROOT_JAVA_FRAME: id_size + 8,
        H.SUB_ROOT_NATIVE_STACK: id_size + 4,
        H.SUB_ROOT_THREAD_BLOCK: id_size + 4,
        H.SUB_ROOT_THREAD_OBJ: id_size + 8,
    }
    classes: list = []
    splits: list[tuple[int, int]] = []
    pos = 0
    split_start = 0
    end = n
    while pos < end:
        rec_start = pos
        try:
            tag = buf[pos]
            p = pos + 1
            if tag == INST:
                (nbytes,) = unpack_I(buf, p + id4 + id_size)
                stride = 1 + id4 + id_size + 4 + nbytes
                run = probe_run(
                    rec_start,
                    min(end - rec_start, split_start + target_split_bytes - rec_start + stride),
                    stride,
                    [(0, 1, INST), (1 + id4 + id_size, 4, nbytes)],
                )
                pos = rec_start + run * stride
            elif tag == PARR:
                cnt, t = unpack_IB(buf, p + id4)
                stride = 1 + id4 + 5 + cnt * prim_sizes[t]
                run = probe_run(
                    rec_start,
                    min(end - rec_start, split_start + target_split_bytes - rec_start + stride),
                    stride,
                    [(0, 1, PARR), (1 + id4, 4, cnt), (1 + id4 + 4, 1, t)],
                )
                pos = rec_start + run * stride
            elif tag == OARR:
                (cnt,) = unpack_I(buf, p + id4)
                stride = 1 + id4 + 4 + id_size + cnt * id_size
                run = probe_run(
                    rec_start,
                    min(end - rec_start, split_start + target_split_bytes - rec_start + stride),
                    stride,
                    [(0, 1, OARR), (1 + id4, 4, cnt)],
                )
                pos = rec_start + run * stride
            elif tag == CLS:
                info, pos = H.parse_class_dump(buf, p, id_size)
            else:
                skip = root_skip.get(tag)
                if skip is None:
                    raise ValueError(
                        f"unknown heap sub-record tag 0x{tag:02x} at offset {seg_start + pos}"
                    )
                pos = p + skip
        except (struct.error, IndexError):
            # record header itself is cut short
            if not tolerate_truncation:
                raise ValueError(
                    f"truncated heap sub-record at offset {seg_start + rec_start}; "
                    "re-run with strict=False to ingest the complete prefix"
                ) from None
            end = rec_start
            break
        if pos > n:
            # declared body extends past the available bytes
            if not tolerate_truncation:
                raise ValueError(
                    f"truncated heap sub-record at offset {seg_start + rec_start}; "
                    "re-run with strict=False to ingest the complete prefix"
                )
            end = rec_start
            break
        if tag == CLS:
            classes.append(info)
        if pos - split_start >= target_split_bytes:
            splits.append((seg_start + split_start, seg_start + pos))
            split_start = pos
    if split_start < end:
        splits.append((seg_start + split_start, seg_start + end))
    return classes, splits


def build_index(
    path: str,
    target_split_bytes: int = 64 * 1024 * 1024,
    spark=None,
    strict: bool = True,
) -> HprofIndex:
    """Driver metadata pass. The top-level walk reads ONLY record
    headers plus the (bounded) metadata record bodies — heap-segment
    bodies, the O(heap) part, are ``seek``ed over and later scanned by
    executor tasks. Driver memory and I/O stay O(strings + classes +
    frames) no matter how large the dump is.

    Real-world dumps are often cut short (disk full, process killed).
    ``strict=True`` (default) raises on any truncation; ``strict=False``
    ingests the complete-record prefix and sets ``idx.truncated``."""
    import os as _os

    file_size = _os.path.getsize(path)
    # Metadata record bodies the driver must materialize; everything
    # else (above all the multi-GB heap segments) is skipped by seek.
    _KEEP_BODY = (H.TAG_UTF8, H.TAG_LOAD_CLASS, H.TAG_STACK_FRAME, H.TAG_STACK_TRACE)

    with open(path, "rb") as f:
        head = f.read(64)
        header = H.read_header(head)
        id_size = header.id_size
        idx = HprofIndex(header=header)

        segment_ranges: list[tuple[int, int]] = []
        f.seek(header.body_offset)
        pos = header.body_offset
        while True:
            rec_hdr = f.read(9)
            if len(rec_hdr) < 9:
                if rec_hdr:  # partial top-level header at EOF
                    if strict:
                        raise ValueError(
                            f"truncated record header at offset {pos}; re-run with "
                            "strict=False to ingest the complete prefix"
                        )
                    idx.truncated = True
                break
            tag = rec_hdr[0]
            (length,) = struct.unpack_from(">I", rec_hdr, 5)
            off = pos + 9
            name = H.TAG_NAMES.get(tag, f"0x{tag:02x}")
            idx.record_counts[name] = idx.record_counts.get(name, 0) + 1
            if tag in _KEEP_BODY:
                buf = f.read(length)
                if len(buf) < length:
                    if strict:
                        raise ValueError(
                            f"truncated {name} record at offset {pos}; "
                            "re-run with strict=False to ingest the complete prefix"
                        )
                    idx.truncated = True
                    break
                if tag == H.TAG_UTF8:
                    sid = H._read_id(buf, 0, id_size)
                    idx.strings[sid] = bytes(buf[id_size:length]).decode("utf-8", "replace")
                elif tag == H.TAG_LOAD_CLASS:
                    (serial,) = struct.unpack_from(">I", buf, 0)
                    class_obj_id = H._read_id(buf, 4, id_size)
                    name_id = H._read_id(buf, 8 + id_size, id_size)
                    cname = H.jvm_name_to_java(
                        idx.strings.get(name_id, f"class_{class_obj_id:x}")
                    )
                    idx.class_names[class_obj_id] = cname
                    idx.serial_to_class[serial] = class_obj_id
                elif tag == H.TAG_STACK_FRAME:
                    fid = H._read_id(buf, 0, id_size)
                    m = H._read_id(buf, id_size, id_size)
                    sig = H._read_id(buf, 2 * id_size, id_size)
                    src = H._read_id(buf, 3 * id_size, id_size)
                    serial, line = struct.unpack_from(">Ii", buf, 4 * id_size)
                    idx.frames.append(RawFrame(fid, m, sig, src, serial, line))
                else:  # TAG_STACK_TRACE
                    serial, thread_serial, n = struct.unpack_from(">III", buf, 0)
                    fids = [
                        H._read_id(buf, 12 + i * id_size, id_size) for i in range(n)
                    ]
                    idx.traces.append((serial, thread_serial, fids))
            else:
                if tag in (H.TAG_HEAP_DUMP, H.TAG_HEAP_DUMP_SEGMENT):
                    seg_end = off + length
                    if seg_end > file_size:
                        if strict:
                            raise ValueError(
                                f"truncated heap segment at offset {off} (declared end "
                                f"{seg_end} > file size {file_size}); re-run with "
                                "strict=False to ingest the complete prefix"
                            )
                        idx.truncated = True
                        seg_end = file_size
                    segment_ranges.append((off, seg_end))
                f.seek(length, 1)
            pos = off + length

    # Skip-scan segments: harvest ClassDumps (schema source) and plan
    # splits on sub-record boundaries. Segments are independent, so
    # when a SparkSession is supplied the scan fans out one task per
    # segment — on a big dump this turns the O(heap) part of pass 1
    # into a parallel job, leaving the driver with only the (bounded)
    # string/class/frame metadata.
    abspath = __import__("os").path.abspath(path)
    if spark is not None and len(segment_ranges) > 1:
        scanned = (
            spark.sparkContext.parallelize(
                list(enumerate(segment_ranges)), numSlices=len(segment_ranges)
            )
            .map(
                lambda t: (
                    t[0],
                    _scan_segment(
                        abspath, t[1][0], t[1][1], id_size, target_split_bytes,
                        tolerate_truncation=not strict,
                    ),
                )
            )
            .collect()
        )
        scanned = [r for _, r in sorted(scanned)]
    else:
        scanned = [
            _scan_segment(
                abspath, s, e, id_size, target_split_bytes,
                tolerate_truncation=not strict,
            )
            for s, e in segment_ranges
        ]
    for class_infos, seg_splits in scanned:
        for info in class_infos:
            info.name = idx.class_name(info.class_obj_id)
            idx.classes[info.class_obj_id] = info
        idx.splits.extend(seg_splits)

    _flatten_layouts(idx)
    return idx
