"""Minimal pure-Python Avro container-file reader (no external dependency).

Implements the public Avro 1.x object-container format (magic 'Obj\\x01',
metadata map with avro.schema/avro.codec, 16-byte sync markers, varint-framed
blocks) and the binary encoding for the full type system: null/boolean/int/
long/float/double/bytes/string/record/enum/array/map/union/fixed. Codecs:
null and deflate (raw zlib). Used by the ``parse-as-avro-file`` directive;
the reference decodes with the Java Avro library (ParseAvroFile.java)."""

from __future__ import annotations

import json
import struct
import zlib


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        out = self.data[self.pos : self.pos + n]
        if len(out) != n:
            raise ValueError("truncated avro data")
        self.pos += n
        return out

    def long(self) -> int:
        # zigzag varint
        shift = 0
        acc = 0
        while True:
            b = self.data[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def eof(self) -> bool:
        return self.pos >= len(self.data)


def _collect_named(schema, named: dict, ns: str | None = None) -> None:
    """Pre-register every named type (record/enum/fixed) by full and short
    name — schemas reference earlier definitions by name, possibly inside
    union branches that are never taken before the reference is hit."""
    if isinstance(schema, list):
        for s in schema:
            _collect_named(s, named, ns)
        return
    if not isinstance(schema, dict):
        return
    t = schema.get("type")
    this_ns = schema.get("namespace", ns)
    name = schema.get("name")
    if t in ("record", "error", "enum", "fixed") and name:
        named.setdefault(name, schema)
        if this_ns and "." not in name:
            named.setdefault(f"{this_ns}.{name}", schema)
    if t in ("record", "error"):
        for f in schema.get("fields", []):
            _collect_named(f.get("type"), named, this_ns)
    elif t == "array":
        _collect_named(schema.get("items"), named, this_ns)
    elif t == "map":
        _collect_named(schema.get("values"), named, this_ns)
    elif isinstance(t, (dict, list)):
        _collect_named(t, named, this_ns)


def _decode(r: _Reader, schema, named: dict):
    if isinstance(schema, str):
        if schema in named:
            return _decode(r, named[schema], named)
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return r.read(1) == b"\x01"
        if t in ("int", "long"):
            return r.long()
        if t == "float":
            return struct.unpack("<f", r.read(4))[0]
        if t == "double":
            return struct.unpack("<d", r.read(8))[0]
        if t == "bytes":
            return r.read(r.long())
        if t == "string":
            return r.read(r.long()).decode("utf-8", "replace")
        raise ValueError(f"unknown avro type {t!r}")
    if isinstance(schema, list):  # union
        return _decode(r, schema[r.long()], named)
    t = schema["type"]
    if t in ("record", "error"):
        fullname = schema.get("name", "")
        ns = schema.get("namespace")
        if ns and "." not in fullname:
            fullname = f"{ns}.{fullname}"
        named.setdefault(fullname, schema)
        named.setdefault(schema.get("name", ""), schema)
        return {
            f["name"]: _decode(r, f["type"], named) for f in schema["fields"]
        }
    if t == "enum":
        named.setdefault(schema.get("name", ""), schema)
        return schema["symbols"][r.long()]
    if t == "array":
        out = []
        while True:
            n = r.long()
            if n == 0:
                break
            if n < 0:
                r.long()  # block byte size, unused
                n = -n
            for _ in range(n):
                out.append(_decode(r, schema["items"], named))
        return out
    if t == "map":
        out = {}
        while True:
            n = r.long()
            if n == 0:
                break
            if n < 0:
                r.long()
                n = -n
            for _ in range(n):
                k = r.read(r.long()).decode("utf-8", "replace")
                out[k] = _decode(r, schema["values"], named)
        return out
    if t == "fixed":
        named.setdefault(schema.get("name", ""), schema)
        return r.read(schema["size"])
    return _decode(r, t, named)  # {"type": "long"} wrapper form


def read_container(data: bytes) -> tuple[dict, list]:
    """Return (schema, records) from an Avro object-container file."""
    r = _Reader(data)
    if r.read(4) != b"Obj\x01":
        raise ValueError("not an avro container file (bad magic)")
    meta: dict = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            r.long()
            n = -n
        for _ in range(n):
            k = r.read(r.long()).decode()
            v = r.read(r.long())
            meta[k] = v
    sync = r.read(16)
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    records: list = []
    named: dict = {}
    _collect_named(schema, named)
    while not r.eof():
        count = r.long()
        size = r.long()
        block = r.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        br = _Reader(block)
        for _ in range(count):
            records.append(_decode(br, schema, named))
        if r.read(16) != sync:
            raise ValueError("avro sync marker mismatch")
    return schema, records
