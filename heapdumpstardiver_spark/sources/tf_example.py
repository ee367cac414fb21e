"""Minimal ``tf.train.Example`` wire-format codec — no protobuf
runtime required.

TFRecord payloads are almost always serialized ``tf.train.Example``
protos. The message shapes are public and tiny (TensorFlow's
``example.proto`` / ``feature.proto``):

    Example   { Features features = 1; }
    Features  { map<string, Feature> feature = 1; }
    Feature   { oneof kind { BytesList bytes_list = 1;
                             FloatList float_list = 2;
                             Int64List int64_list = 3; } }
    BytesList { repeated bytes value = 1; }
    FloatList { repeated float value = 1 [packed = true]; }
    Int64List { repeated int64 value = 1 [packed = true]; }

so decoding them needs only the protobuf WIRE format (varints, tags,
length-delimited fields — the published encoding spec), not the
protobuf library. This module hand-rolls exactly that: a strict
encoder (packed repeated scalars, map entries in key order — byte
deterministic, so fixtures hash stably) and a tolerant decoder
(fields in any order, packed AND unpacked repeated encodings, unknown
fields skipped by wire type — the forward-compatibility contract real
TF writers rely on).

Scale note: decode is per-record Python and belongs inside an
Arrow-batched ``mapInPandas`` stage over the ``payload`` column of
``format("tfrecord")`` reads — never a row-at-a-time UDF. The typed
feature columns it yields are then ordinary Spark columns.
"""

from __future__ import annotations

import struct

# wire types
_VARINT = 0
_I64 = 1
_LEN = 2
_I32 = 5


# ---------------------------------------------------------------------------
# varint + tag primitives
# ---------------------------------------------------------------------------


def _write_varint(out: bytearray, v: int) -> None:
    if v < 0:
        v &= (1 << 64) - 1  # two's-complement 64-bit, per the spec
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift >= 70:
            raise ValueError("varint too long")


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _tag(field: int, wire: int) -> int:
    return (field << 3) | wire


def _write_len_field(out: bytearray, field: int, payload: bytes) -> None:
    _write_varint(out, _tag(field, _LEN))
    _write_varint(out, len(payload))
    out.extend(payload)


def _skip(buf: bytes, pos: int, wire: int) -> int:
    """Skip an unknown field by wire type (forward compatibility)."""
    if wire == _VARINT:
        _, pos = _read_varint(buf, pos)
        return pos
    if wire == _I64:
        return pos + 8
    if wire == _LEN:
        n, pos = _read_varint(buf, pos)
        return pos + n
    if wire == _I32:
        return pos + 4
    raise ValueError(f"unsupported wire type {wire}")


# ---------------------------------------------------------------------------
# Encoder (deterministic: map entries in sorted key order, packed lists)
# ---------------------------------------------------------------------------


def encode_example(features: dict) -> bytes:
    """Encode ``{name: list[bytes] | list[int] | list[float]}`` as a
    serialized Example. List element type picks the Feature kind
    (bytes → BytesList, int → Int64List, float → FloatList); empty
    lists are invalid (kind would be ambiguous)."""
    feats = bytearray()
    for name in sorted(features):
        values = features[name]
        if not values:
            raise ValueError(f"feature {name!r}: empty list is ambiguous")
        inner = bytearray()
        if isinstance(values[0], bytes):
            for v in values:
                _write_len_field(inner, 1, v)
            kind_field = 1
        elif isinstance(values[0], bool):
            raise ValueError(f"feature {name!r}: bool is not a Feature kind")
        elif isinstance(values[0], int):
            packed = bytearray()
            for v in values:
                _write_varint(packed, v)
            _write_len_field(inner, 1, bytes(packed))
            kind_field = 3
        elif isinstance(values[0], float):
            _write_len_field(
                inner, 1, struct.pack(f"<{len(values)}f", *values)
            )
            kind_field = 2
        else:
            raise ValueError(f"feature {name!r}: {type(values[0])}")
        feature = bytearray()
        _write_len_field(feature, kind_field, bytes(inner))
        entry = bytearray()
        _write_len_field(entry, 1, name.encode())
        _write_len_field(entry, 2, bytes(feature))
        _write_len_field(feats, 1, bytes(entry))
    out = bytearray()
    _write_len_field(out, 1, bytes(feats))
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder (tolerant: any field order, packed or unpacked, skips unknowns)
# ---------------------------------------------------------------------------


def _decode_bytes_list(buf: bytes) -> list[bytes]:
    out: list[bytes] = []
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        if tag == _tag(1, _LEN):
            n, pos = _read_varint(buf, pos)
            out.append(buf[pos : pos + n])
            pos += n
        else:
            pos = _skip(buf, pos, tag & 7)
    return out


def _decode_int64_list(buf: bytes) -> list[int]:
    out: list[int] = []
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        if tag == _tag(1, _LEN):  # packed
            n, pos = _read_varint(buf, pos)
            end = pos + n
            while pos < end:
                v, pos = _read_varint(buf, pos)
                out.append(_signed64(v))
        elif tag == _tag(1, _VARINT):  # unpacked
            v, pos = _read_varint(buf, pos)
            out.append(_signed64(v))
        else:
            pos = _skip(buf, pos, tag & 7)
    return out


def _decode_float_list(buf: bytes) -> list[float]:
    out: list[float] = []
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        if tag == _tag(1, _LEN):  # packed
            n, pos = _read_varint(buf, pos)
            out.extend(struct.unpack(f"<{n // 4}f", buf[pos : pos + n]))
            pos += n
        elif tag == _tag(1, _I32):  # unpacked
            out.append(struct.unpack("<f", buf[pos : pos + 4])[0])
            pos += 4
        else:
            pos = _skip(buf, pos, tag & 7)
    return out


def _decode_feature(buf: bytes) -> tuple[str, list]:
    pos = 0
    kind, values = "empty", []
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire != _LEN:
            pos = _skip(buf, pos, wire)
            continue
        n, pos = _read_varint(buf, pos)
        body = buf[pos : pos + n]
        pos += n
        if field == 1:
            kind, values = "bytes", _decode_bytes_list(body)
        elif field == 2:
            kind, values = "float", _decode_float_list(body)
        elif field == 3:
            kind, values = "int64", _decode_int64_list(body)
    return kind, values


def decode_example(buf: bytes) -> dict:
    """Decode a serialized Example into
    ``{name: (kind, values)}`` with kind in
    ``{"bytes", "float", "int64", "empty"}``."""
    out: dict = {}
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if field != 1 or wire != _LEN:
            pos = _skip(buf, pos, wire)
            continue
        n, pos = _read_varint(buf, pos)
        features_buf = buf[pos : pos + n]
        pos += n
        fpos = 0
        while fpos < len(features_buf):
            ftag, fpos = _read_varint(features_buf, fpos)
            if ftag != _tag(1, _LEN):
                fpos = _skip(features_buf, fpos, ftag & 7)
                continue
            fn, fpos = _read_varint(features_buf, fpos)
            entry = features_buf[fpos : fpos + fn]
            fpos += fn
            epos = 0
            name = None
            feature = b""
            while epos < len(entry):
                etag, epos = _read_varint(entry, epos)
                if etag == _tag(1, _LEN):
                    en, epos = _read_varint(entry, epos)
                    name = entry[epos : epos + en].decode()
                    epos += en
                elif etag == _tag(2, _LEN):
                    en, epos = _read_varint(entry, epos)
                    feature = entry[epos : epos + en]
                    epos += en
                else:
                    epos = _skip(entry, epos, etag & 7)
            if name is not None:
                out[name] = _decode_feature(feature)
    return out
