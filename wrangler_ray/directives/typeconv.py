"""set-type conversion matrix — vectorized equivalent of the reference's
utils/ColumnConverter.java:103-396 (string→number parse, bytes→number
big-endian, decimal(p,s) with rounding, date/time/timestamp logical types).
"""

from __future__ import annotations

import struct

import pyarrow as pa
import pyarrow.compute as pc

_SIMPLE_TYPES = {
    "string": pa.string(),
    "str": pa.string(),
    "int": pa.int32(),
    "integer": pa.int32(),
    "i32": pa.int32(),
    "short": pa.int16(),
    "i64": pa.int64(),
    "long": pa.int64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "bool": pa.bool_(),
    "boolean": pa.bool_(),
    "bytes": pa.binary(),
    "date": pa.date32(),
    "time": pa.time64("us"),
    "timestamp": pa.timestamp("us"),
    "datetime": pa.timestamp("us"),
}

_ROUNDING = {
    "HALF_EVEN": "half_to_even",
    "HALF_UP": "half_towards_infinity",
    "HALF_DOWN": "half_towards_zero",
    "UP": "towards_infinity",
    "DOWN": "towards_zero",
    "FLOOR": "down",
    "CEILING": "up",
}


def _bytes_to_number(arr: pa.ChunkedArray, target: pa.DataType) -> pa.Array:
    """byte[] → number, big-endian, matching the reference's Bytes.toInt/toLong
    semantics (ColumnConverter.java bytes branch)."""
    fmt = {
        pa.int32(): ">i",
        pa.int64(): ">q",
        pa.int16(): ">h",
        pa.float32(): ">f",
        pa.float64(): ">d",
    }[target]
    size = struct.calcsize(fmt)
    out = []
    for v in arr.to_pylist():
        if v is None:
            out.append(None)
        else:
            b = bytes(v)
            out.append(struct.unpack(fmt, b[:size].rjust(size, b"\x00"))[0])
    return pa.array(out, target)


def convert_column(
    arr: pa.ChunkedArray,
    type_name: str,
    scale: int | None = None,
    precision: int | None = None,
    rounding: str = "HALF_EVEN",
) -> pa.ChunkedArray | pa.Array:
    t = type_name.lower()
    src = arr.type

    if t == "decimal":
        p = int(precision) if precision is not None else 38
        s = int(scale) if scale is not None else 0
        target = pa.decimal128(p, s)
        if pa.types.is_floating(src) or pa.types.is_integer(src):
            mode = _ROUNDING.get(rounding.upper(), "half_to_even")
            rounded = pc.round(pc.cast(arr, pa.float64()), ndigits=s, round_mode=mode)
            return pc.cast(rounded, target, safe=False)
        if pa.types.is_string(src) or pa.types.is_large_string(src):
            return pc.cast(pc.utf8_trim_whitespace(arr), target, safe=False)
        return pc.cast(arr, target, safe=False)

    target = _SIMPLE_TYPES.get(t)
    if target is None:
        raise ValueError(f"set-type: unsupported type '{type_name}'")

    if target == src:
        return arr

    # bytes → number: big-endian decode (reference Bytes.toInt path)
    if (pa.types.is_binary(src) or pa.types.is_large_binary(src)) and (
        pa.types.is_integer(target) or pa.types.is_floating(target)
    ):
        return _bytes_to_number(arr, target)

    # bytes → string: UTF-8 decode
    if (pa.types.is_binary(src) or pa.types.is_large_binary(src)) and pa.types.is_string(target):
        return pc.cast(arr, pa.string())

    # string → number: trim then parse; string "1.5" → int parses via double
    if (pa.types.is_string(src) or pa.types.is_large_string(src)) and (
        pa.types.is_integer(target) or pa.types.is_floating(target)
    ):
        trimmed = pc.utf8_trim_whitespace(arr)
        try:
            return pc.cast(trimmed, target)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            dbl = pc.cast(trimmed, pa.float64(), safe=False)
            return pc.cast(pc.round(dbl), target, safe=False)

    # string → bool: "true"/"false" case-insensitive (reference Boolean.parseBoolean)
    if (pa.types.is_string(src) or pa.types.is_large_string(src)) and pa.types.is_boolean(target):
        low = pc.utf8_lower(pc.utf8_trim_whitespace(arr))
        return pc.equal(low, "true")

    # string → timestamp/date/time: ISO parse via cast
    if (pa.types.is_string(src) or pa.types.is_large_string(src)) and (
        pa.types.is_timestamp(target) or pa.types.is_date(target) or pa.types.is_time(target)
    ):
        return pc.cast(pc.utf8_trim_whitespace(arr), target)

    # float → int: round first (Java casts truncate, but reference converts via
    # Number.intValue which truncates toward zero)
    if pa.types.is_floating(src) and pa.types.is_integer(target):
        return pc.cast(pc.trunc(arr), target, safe=False)

    if pa.types.is_decimal(src) and pa.types.is_string(target):
        return pc.cast(arr, pa.string())

    return pc.cast(arr, target, safe=False)
