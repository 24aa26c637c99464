"""Minimal pure-Python protobuf wire-format decoder + FileDescriptorSet
parser (no protobuf runtime needed).

The protobuf binary wire format and descriptor.proto field numbers are
public, stable knowledge: messages are (tag = field_number<<3 | wire_type)
followed by varint (0), 64-bit (1), length-delimited (2) or 32-bit (5)
payloads; a compiled ``.desc`` file is itself a protobuf-encoded
FileDescriptorSet (file=1 → FileDescriptorProto{name=1, package=2,
message_type=4} → DescriptorProto{name=1, field=2, nested_type=3} →
FieldDescriptorProto{name=1, number=3, label=4, type=5, type_name=6}).
Used by the ``parse-as-protobuf`` directive (reference
directives/parser/ParseProtobuf.java decodes via the Java runtime +
schema registry)."""

from __future__ import annotations

import struct

# FieldDescriptorProto.Type values (descriptor.proto, public)
_T_DOUBLE, _T_FLOAT, _T_INT64, _T_UINT64, _T_INT32 = 1, 2, 3, 4, 5
_T_FIXED64, _T_FIXED32, _T_BOOL, _T_STRING, _T_GROUP = 6, 7, 8, 9, 10
_T_MESSAGE, _T_BYTES, _T_UINT32, _T_ENUM = 11, 12, 13, 14
_T_SFIXED32, _T_SFIXED64, _T_SINT32, _T_SINT64 = 15, 16, 17, 18
_LABEL_REPEATED = 3


def _raw_fields(data: bytes):
    """Yield (field_number, wire_type, value) from a wire-format message."""
    pos = 0
    n = len(data)
    while pos < n:
        tag = 0
        shift = 0
        while True:
            b = data[pos]
            pos += 1
            tag |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        fnum, wt = tag >> 3, tag & 7
        if pos > n:
            raise ValueError("truncated protobuf message")
        if wt == 0:  # varint
            val = 0
            shift = 0
            while True:
                b = data[pos]
                pos += 1
                val |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
        elif wt == 1:
            val = data[pos : pos + 8]
            if len(val) != 8:
                raise ValueError("truncated 64-bit field")
            pos += 8
        elif wt == 2:
            ln = 0
            shift = 0
            while True:
                b = data[pos]
                pos += 1
                ln |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            val = data[pos : pos + ln]
            if len(val) != ln:
                raise ValueError("truncated length-delimited field")
            pos += ln
        elif wt == 5:
            val = data[pos : pos + 4]
            if len(val) != 4:
                raise ValueError("truncated 32-bit field")
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fnum, wt, val


def _field_map(data: bytes) -> dict:
    out: dict = {}
    for fnum, _wt, val in _raw_fields(data):
        out.setdefault(fnum, []).append(val)
    return out


def parse_descriptor_set(data: bytes) -> dict:
    """.desc bytes → {fully.qualified.MessageName: message descriptor}, where
    a descriptor is {"fields": {number: (name, type, label, type_name)}}."""
    messages: dict = {}

    def walk_message(msg_bytes: bytes, prefix: str):
        f = _field_map(msg_bytes)
        name = f.get(1, [b""])[0].decode()
        full = f"{prefix}.{name}" if prefix else name
        fields = {}
        for fd in f.get(2, []):
            fm = _field_map(fd)
            fname = fm.get(1, [b""])[0].decode()
            number = fm.get(3, [0])[0]
            label = fm.get(4, [1])[0]
            ftype = fm.get(5, [_T_STRING])[0]
            type_name = fm.get(6, [b""])[0]
            if isinstance(type_name, bytes):
                type_name = type_name.decode()
            fields[number] = (fname, ftype, label, type_name.lstrip("."))
        messages[full] = {"fields": fields}
        for nested in msg_bytes and f.get(3, []):
            walk_message(nested, full)

    top = _field_map(data)
    for file_bytes in top.get(1, []):
        ff = _field_map(file_bytes)
        package = ff.get(2, [b""])[0].decode()
        for msg in ff.get(4, []):
            walk_message(msg, package)
    return messages


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


# scalar types that may arrive packed (proto3 packs repeated numerics by
# default): every numeric/bool/enum type — never string/bytes/message/group
_PACKABLE = {_T_DOUBLE, _T_FLOAT, _T_INT64, _T_UINT64, _T_INT32, _T_FIXED64,
             _T_FIXED32, _T_BOOL, _T_UINT32, _T_ENUM, _T_SFIXED32,
             _T_SFIXED64, _T_SINT32, _T_SINT64}


def _unpack_packed(ftype: int, payload: bytes) -> list:
    """Decode a packed repeated scalar payload (one length-delimited blob
    holding back-to-back varints / fixed32 / fixed64 values) into a list."""
    vals: list = []
    pos, n = 0, len(payload)
    if ftype in (_T_DOUBLE, _T_FIXED64, _T_SFIXED64):
        for i in range(0, n, 8):
            chunk = payload[i : i + 8]
            if ftype == _T_DOUBLE:
                vals.append(struct.unpack("<d", chunk)[0])
            else:
                vals.append(int.from_bytes(chunk, "little",
                                           signed=ftype == _T_SFIXED64))
        return vals
    if ftype in (_T_FLOAT, _T_FIXED32, _T_SFIXED32):
        for i in range(0, n, 4):
            chunk = payload[i : i + 4]
            if ftype == _T_FLOAT:
                vals.append(struct.unpack("<f", chunk)[0])
            else:
                vals.append(int.from_bytes(chunk, "little",
                                           signed=ftype == _T_SFIXED32))
        return vals
    # varint-encoded scalars
    while pos < n:
        v = 0
        shift = 0
        while True:
            b = payload[pos]
            pos += 1
            v |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        if ftype in (_T_SINT32, _T_SINT64):
            v = _zigzag(v)
        elif ftype in (_T_INT32, _T_INT64, _T_ENUM) and v >= 1 << 63:
            # negative int32/int64/enum values arrive as 10-byte varints
            v -= 1 << 64
        elif ftype == _T_BOOL:
            v = bool(v)
        vals.append(v)
    return vals


def decode_message(data: bytes, messages: dict, name: str) -> dict:
    """Decode a wire-format message into {field_name: value} using the parsed
    descriptors; nested messages decode recursively, repeated fields become
    lists (packed or expanded encoding)."""
    desc = messages.get(name)
    if desc is None:
        raise ValueError(f"protobuf message '{name}' not in descriptor set")
    out: dict = {}
    for fnum, wt, raw in _raw_fields(data):
        spec = desc["fields"].get(fnum)
        if spec is None:
            continue  # unknown field — skip, like the runtime does
        fname, ftype, label, type_name = spec
        if label == _LABEL_REPEATED and wt == 2 and ftype in _PACKABLE:
            out.setdefault(fname, []).extend(_unpack_packed(ftype, raw))
            continue
        if ftype == _T_MESSAGE:
            val = decode_message(raw, messages, type_name)
        elif ftype in (_T_STRING,):
            val = raw.decode("utf-8", "replace")
        elif ftype == _T_BYTES:
            val = raw
        elif ftype in (_T_INT32, _T_INT64, _T_UINT32, _T_UINT64, _T_ENUM):
            val = raw if isinstance(raw, int) else int.from_bytes(raw, "little")
            if ftype in (_T_INT32, _T_INT64, _T_ENUM) and isinstance(val, int) and val >= 1 << 63:
                val -= 1 << 64
        elif ftype in (_T_SINT32, _T_SINT64):
            val = _zigzag(raw)
        elif ftype == _T_BOOL:
            val = bool(raw)
        elif ftype == _T_DOUBLE:
            val = struct.unpack("<d", raw)[0]
        elif ftype == _T_FLOAT:
            val = struct.unpack("<f", raw)[0]
        elif ftype in (_T_FIXED64, _T_SFIXED64):
            val = int.from_bytes(raw, "little", signed=ftype == _T_SFIXED64)
        elif ftype in (_T_FIXED32, _T_SFIXED32):
            val = int.from_bytes(raw, "little", signed=ftype == _T_SFIXED32)
        else:
            val = raw
        if label == _LABEL_REPEATED:
            out.setdefault(fname, []).append(val)
        else:
            out[fname] = val
    return out
