"""Pure-stdlib protobuf wire-format ENCODER + minimal FileDescriptorSet
builder (the encode mirror of directives/proto_reader.py).

The wire format and descriptor.proto field numbers are public, stable
knowledge: a compiled ``.desc`` file is itself a protobuf-encoded
FileDescriptorSet (file=1 → FileDescriptorProto{name=1, package=2,
message_type=4} → DescriptorProto{name=1, field=2, nested_type=3} →
FieldDescriptorProto{name=1, number=3, label=4, type=5, type_name=6}).
Authoring both the descriptor AND the messages here lets driver queries run
``parse-as-protobuf`` end to end on deterministic self-made payloads — the
same approach as ops/xlsx.py / ops/avro_writer.py / ops/avi.py.
"""

from __future__ import annotations

import struct

# FieldDescriptorProto.Type values (descriptor.proto, public)
T_DOUBLE, T_FLOAT, T_INT64, T_UINT64, T_INT32 = 1, 2, 3, 4, 5
T_FIXED64, T_FIXED32, T_BOOL, T_STRING = 6, 7, 8, 9
T_MESSAGE, T_BYTES, T_UINT32, T_ENUM = 11, 12, 13, 14
T_SFIXED32, T_SFIXED64, T_SINT32, T_SINT64 = 15, 16, 17, 18
LABEL_OPTIONAL, LABEL_REQUIRED, LABEL_REPEATED = 1, 2, 3

_VARINT, _I64, _LEN, _I32 = 0, 1, 2, 5


def _varint(v: int) -> bytes:
    if v < 0:
        v += 1 << 64  # negative int32/int64/enum → 10-byte two's-complement
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(fnum: int, wt: int) -> bytes:
    return _varint((fnum << 3) | wt)


def emit_varint(fnum: int, v: int) -> bytes:
    return _tag(fnum, _VARINT) + _varint(v)


def emit_len(fnum: int, payload: bytes) -> bytes:
    return _tag(fnum, _LEN) + _varint(len(payload)) + payload


def emit_string(fnum: int, s: str) -> bytes:
    return emit_len(fnum, s.encode())


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def encode_field(fnum: int, ftype: int, value) -> bytes:
    """Encode one (expanded, non-packed) field occurrence."""
    if ftype in (T_INT32, T_INT64, T_UINT32, T_UINT64, T_ENUM):
        return emit_varint(fnum, int(value))
    if ftype in (T_SINT32, T_SINT64):
        return emit_varint(fnum, _zigzag(int(value)))
    if ftype == T_BOOL:
        return emit_varint(fnum, 1 if value else 0)
    if ftype == T_DOUBLE:
        return _tag(fnum, _I64) + struct.pack("<d", float(value))
    if ftype == T_FLOAT:
        return _tag(fnum, _I32) + struct.pack("<f", float(value))
    if ftype in (T_FIXED64, T_SFIXED64):
        return _tag(fnum, _I64) + int(value).to_bytes(8, "little", signed=ftype == T_SFIXED64)
    if ftype in (T_FIXED32, T_SFIXED32):
        return _tag(fnum, _I32) + int(value).to_bytes(4, "little", signed=ftype == T_SFIXED32)
    if ftype == T_STRING:
        return emit_string(fnum, str(value))
    if ftype in (T_BYTES, T_MESSAGE):
        return emit_len(fnum, bytes(value))
    raise ValueError(f"unsupported field type {ftype}")


def encode_message(fields: dict, spec: dict) -> bytes:
    """Encode {name: value} using spec {name: (fnum, ftype[, label])};
    repeated fields take list values (expanded encoding)."""
    out = bytearray()
    for name, value in fields.items():
        fnum, ftype = spec[name][0], spec[name][1]
        vals = value if isinstance(value, list) else [value]
        for v in vals:
            out += encode_field(fnum, ftype, v)
    return bytes(out)


def make_descriptor_set(package: str, messages: dict) -> bytes:
    """Build a FileDescriptorSet for {MsgName: {field_name: (fnum, ftype)
    or (fnum, ftype, label) or (fnum, ftype, label, type_name)}}."""
    msg_protos = b""
    for msg_name, fields in messages.items():
        fds = b""
        for fname, spec in fields.items():
            fnum, ftype = spec[0], spec[1]
            label = spec[2] if len(spec) > 2 else LABEL_OPTIONAL
            fd = (
                emit_string(1, fname)
                + emit_varint(3, fnum)
                + emit_varint(4, label)
                + emit_varint(5, ftype)
            )
            if len(spec) > 3 and spec[3]:
                fd += emit_string(6, "." + spec[3])
            fds += emit_len(2, fd)
        msg_protos += emit_len(4, emit_string(1, msg_name) + fds)
    file_proto = (
        emit_string(1, f"{package or 'gen'}.proto")
        + (emit_string(2, package) if package else b"")
        + msg_protos
    )
    return emit_len(1, file_proto)
