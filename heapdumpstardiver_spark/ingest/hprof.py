"""Low-level HPROF binary format reader (pure Python, no Spark).

The HPROF format is the JDK's documented heap-dump binary format
(header ``JAVA PROFILE 1.0.2\\0``, sized object IDs, tagged top-level
records, heap-dump segments containing tagged sub-records). This
module implements the record grammar the reference ingests via the
``jvm-hprof`` crate (/root/reference/src/hprof_index.rs:68-93,
/root/reference/src/commands/dump_to_parquet.rs:207-515) — written
from the public format specification, not from that code.

Everything here operates on byte buffers (mmap-able) with explicit
offsets so callers can plan byte-range splits for distributed parsing.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

# Top-level record tags
TAG_UTF8 = 0x01
TAG_LOAD_CLASS = 0x02
TAG_UNLOAD_CLASS = 0x03
TAG_STACK_FRAME = 0x04
TAG_STACK_TRACE = 0x05
TAG_HEAP_DUMP = 0x0C
TAG_HEAP_DUMP_SEGMENT = 0x1C
TAG_HEAP_DUMP_END = 0x2C

TAG_NAMES = {
    0x01: "Utf8",
    0x02: "LoadClass",
    0x03: "UnloadClass",
    0x04: "StackFrame",
    0x05: "StackTrace",
    0x06: "AllocSites",
    0x07: "HeapSummary",
    0x0A: "StartThread",
    0x0B: "EndThread",
    0x0C: "HeapDump",
    0x1C: "HeapDumpSegment",
    0x2C: "HeapDumpEnd",
    0x0D: "CpuSamples",
    0x0E: "ControlSettings",
}

# Heap-dump sub-record tags
SUB_ROOT_UNKNOWN = 0xFF
SUB_ROOT_JNI_GLOBAL = 0x01
SUB_ROOT_JNI_LOCAL = 0x02
SUB_ROOT_JAVA_FRAME = 0x03
SUB_ROOT_NATIVE_STACK = 0x04
SUB_ROOT_STICKY_CLASS = 0x05
SUB_ROOT_THREAD_BLOCK = 0x06
SUB_ROOT_MONITOR_USED = 0x07
SUB_ROOT_THREAD_OBJ = 0x08
SUB_CLASS_DUMP = 0x20
SUB_INSTANCE_DUMP = 0x21
SUB_OBJECT_ARRAY_DUMP = 0x22
SUB_PRIMITIVE_ARRAY_DUMP = 0x23

# GC root kind names, matching the reference's output vocabulary
# (dump_to_parquet.rs:336-362).
ROOT_NAMES = {
    SUB_ROOT_UNKNOWN: "Unknown",
    SUB_ROOT_JNI_GLOBAL: "JniGlobal",
    SUB_ROOT_JNI_LOCAL: "JniLocal",
    SUB_ROOT_JAVA_FRAME: "JavaStackFrame",
    SUB_ROOT_NATIVE_STACK: "NativeStack",
    SUB_ROOT_STICKY_CLASS: "SystemClass",
    SUB_ROOT_THREAD_BLOCK: "ThreadBlock",
    SUB_ROOT_MONITOR_USED: "BusyMonitor",
    SUB_ROOT_THREAD_OBJ: "ThreadObj",
}

# HPROF basic-type codes
T_OBJECT = 2
T_BOOLEAN = 4
T_CHAR = 5
T_FLOAT = 6
T_DOUBLE = 7
T_BYTE = 8
T_SHORT = 9
T_INT = 10
T_LONG = 11

PRIM_SIZES = {T_BOOLEAN: 1, T_CHAR: 2, T_FLOAT: 4, T_DOUBLE: 8, T_BYTE: 1, T_SHORT: 2, T_INT: 4, T_LONG: 8}
PRIM_NAMES = {
    T_BOOLEAN: "boolean",
    T_CHAR: "char",
    T_FLOAT: "float",
    T_DOUBLE: "double",
    T_BYTE: "byte",
    T_SHORT: "short",
    T_INT: "int",
    T_LONG: "long",
}
# struct codes (big-endian) per basic type; object code depends on id size
PRIM_STRUCT = {T_BOOLEAN: "B", T_CHAR: "H", T_FLOAT: "f", T_DOUBLE: "d", T_BYTE: "b", T_SHORT: "h", T_INT: "i", T_LONG: "q"}


def jvm_name_to_java(name: str) -> str:
    """Normalize a JVM internal class name to Java source form:
    '/'→'.', array descriptors → 'Elem[]' (util.rs:20 equivalent)."""
    name = name.replace("/", ".")
    dims = 0
    while name.startswith("["):
        dims += 1
        name = name[1:]
    if dims:
        base = {
            "B": "byte", "Z": "boolean", "C": "char", "S": "short",
            "I": "int", "J": "long", "F": "float", "D": "double",
        }.get(name)
        if base is None and name.startswith("L") and name.endswith(";"):
            base = name[1:-1]
        elif base is None:
            base = name
        name = base + "[]" * dims
    return name


@dataclass
class Header:
    version: str
    id_size: int
    timestamp_ms: int
    body_offset: int


@dataclass
class FieldDesc:
    name: str            # possibly renamed Declaring@name for shadowed fields
    type_code: int
    declaring_class: str


@dataclass
class ClassInfo:
    class_obj_id: int
    name: str = ""
    super_class_obj_id: int = 0
    instance_size: int = 0
    # own instance fields in declaration order: (name_string_id, type_code)
    own_fields: list = field(default_factory=list)
    # statics: (name_string_id, type_code, value)
    static_fields: list = field(default_factory=list)
    # filled during finalize: full flattened descriptor list (this class
    # first, then supers) with shadow renames — the packed-bytes layout.
    layout: list = field(default_factory=list)  # list[FieldDesc]


def read_header(buf) -> Header:
    end = buf.find(b"\x00", 0, 64)
    if end < 0:
        raise ValueError("not an HPROF file: missing version terminator")
    version = bytes(buf[:end]).decode("ascii")
    if not version.startswith("JAVA PROFILE"):
        raise ValueError(f"not an HPROF file: version {version!r}")
    id_size, ts_hi, ts_lo = struct.unpack_from(">III", buf, end + 1)
    if id_size not in (4, 8):
        raise ValueError(f"unsupported identifier size {id_size}")
    return Header(
        version=version,
        id_size=id_size,
        timestamp_ms=(ts_hi << 32) | ts_lo,
        body_offset=end + 1 + 12,
    )


def iter_records(buf, header: Header):
    """Yield (tag, body_offset, body_len) for each top-level record."""
    pos = header.body_offset
    n = len(buf)
    while pos + 9 <= n:
        tag = buf[pos]
        (length,) = struct.unpack_from(">I", buf, pos + 5)
        yield tag, pos + 9, length
        pos += 9 + length


def _read_id(buf, pos: int, id_size: int) -> int:
    if id_size == 8:
        return struct.unpack_from(">Q", buf, pos)[0]
    return struct.unpack_from(">I", buf, pos)[0]


def _read_value(buf, pos: int, type_code: int, id_size: int):
    """Read one typed value; returns (value, nbytes)."""
    if type_code == T_OBJECT:
        return _read_id(buf, pos, id_size), id_size
    size = PRIM_SIZES[type_code]
    code = PRIM_STRUCT[type_code]
    v = struct.unpack_from(">" + code, buf, pos)[0]
    if type_code == T_BOOLEAN:
        v = bool(v)
    return v, size


def parse_class_dump(buf, pos: int, id_size: int) -> tuple[ClassInfo, int]:
    """Parse a CLASS DUMP sub-record body starting at *pos* (after the
    sub-record tag). Returns (ClassInfo, end_pos)."""
    start = pos
    class_obj_id = _read_id(buf, pos, id_size)
    pos += id_size + 4  # stack trace serial
    super_id = _read_id(buf, pos, id_size)
    pos += id_size
    pos += 5 * id_size  # classloader, signers, protection domain, reserved×2
    (instance_size,) = struct.unpack_from(">I", buf, pos)
    pos += 4
    (cp_size,) = struct.unpack_from(">H", buf, pos)
    pos += 2
    for _ in range(cp_size):
        pos += 2  # index
        t = buf[pos]
        pos += 1
        _, nb = _read_value(buf, pos, t, id_size)
        pos += nb
    (n_static,) = struct.unpack_from(">H", buf, pos)
    pos += 2
    statics = []
    for _ in range(n_static):
        name_id = _read_id(buf, pos, id_size)
        pos += id_size
        t = buf[pos]
        pos += 1
        v, nb = _read_value(buf, pos, t, id_size)
        pos += nb
        statics.append((name_id, t, v))
    (n_inst,) = struct.unpack_from(">H", buf, pos)
    pos += 2
    fields = []
    for _ in range(n_inst):
        name_id = _read_id(buf, pos, id_size)
        pos += id_size
        t = buf[pos]
        pos += 1
        fields.append((name_id, t))
    info = ClassInfo(
        class_obj_id=class_obj_id,
        super_class_obj_id=super_id,
        instance_size=instance_size,
        own_fields=fields,
        static_fields=statics,
    )
    return info, pos


def skip_sub_record(buf, pos: int, id_size: int) -> tuple[int, int, dict]:
    """At *pos* (a sub-record tag byte), return (tag, end_pos, meta).

    meta carries the cheap facts a metadata pass wants without full
    decoding: obj ids, class ids, element counts.
    """
    tag = buf[pos]
    p = pos + 1
    meta: dict = {}
    if tag == SUB_ROOT_UNKNOWN or tag == SUB_ROOT_STICKY_CLASS or tag == SUB_ROOT_MONITOR_USED:
        p += id_size
    elif tag == SUB_ROOT_JNI_GLOBAL:
        p += 2 * id_size
    elif tag in (SUB_ROOT_JNI_LOCAL, SUB_ROOT_JAVA_FRAME):
        p += id_size + 8
    elif tag in (SUB_ROOT_NATIVE_STACK, SUB_ROOT_THREAD_BLOCK):
        p += id_size + 4
    elif tag == SUB_ROOT_THREAD_OBJ:
        p += id_size + 8
    elif tag == SUB_CLASS_DUMP:
        info, p = parse_class_dump(buf, p, id_size)
        meta["class_info"] = info
    elif tag == SUB_INSTANCE_DUMP:
        p += id_size + 4
        p += id_size
        (nbytes,) = struct.unpack_from(">I", buf, p)
        p += 4 + nbytes
    elif tag == SUB_OBJECT_ARRAY_DUMP:
        p += id_size + 4
        (n,) = struct.unpack_from(">I", buf, p)
        p += 4 + id_size + n * id_size
    elif tag == SUB_PRIMITIVE_ARRAY_DUMP:
        p += id_size + 4
        (n,) = struct.unpack_from(">I", buf, p)
        t = buf[p + 4]
        p += 5 + n * PRIM_SIZES[t]
    else:
        raise ValueError(f"unknown heap sub-record tag 0x{tag:02x} at offset {pos}")
    return tag, p, meta
