"""Minimal pure-Python PNG codec (stdlib zlib only — no PIL needed).

The PNG format is public (RFC 2083 / W3C PNG spec): signature, IHDR/IDAT/IEND
chunks, per-scanline filters 0-4, zlib-compressed image data. This gives the
multimodal stages a REAL decode path in containers without imaging libraries;
``wrangler_ray.ops.multimodal.DecodeImage(fake=False)`` prefers PIL when
importable and falls back to this decoder for ``image/png`` payloads.

Supported: 8-bit greyscale (color type 0), truecolor (2), truecolor+alpha (6),
greyscale+alpha (4), non-interlaced. Encoder emits 8-bit RGB, filter 0.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(pixels: np.ndarray) -> bytes:
    """8-bit RGB (h, w, 3) or greyscale (h, w) array → PNG bytes (filter 0)."""
    px = np.asarray(pixels, np.uint8)
    if px.ndim == 2:
        px = px[:, :, None].repeat(3, axis=2)
    h, w, c = px.shape
    if c != 3:
        raise ValueError("png_encode expects RGB or greyscale pixels")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # scanlines: filter byte 0 + raw row
    raw = np.empty((h, 1 + w * 3), np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = px.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa_, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, channels) uint8 array. Raises ValueError on
    malformed input or unsupported variants (16-bit, palette, interlaced)."""
    if not data.startswith(_SIG):
        raise ValueError("not a PNG (bad signature)")
    pos = len(_SIG)
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError("truncated PNG chunk")
        pos += 12 + length  # skip CRC
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", payload)
            )
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or color_type not in _CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={bit_depth}, color={color_type}, "
            f"interlace={interlace})"
        )
    ch = _CHANNELS[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"PNG image data corrupt: {e}") from e
    stride = width * ch
    if len(raw) != height * (1 + stride):
        raise ValueError("PNG data length mismatch")
    rows = np.frombuffer(raw, np.uint8).reshape(height, 1 + stride)
    filters = rows[:, 0]
    out = np.zeros((height, stride), np.uint8)
    bpp = ch  # bytes per pixel at 8-bit depth
    for y in range(height):
        f = filters[y]
        cur = rows[y, 1:].copy()
        prev = out[y - 1] if y else np.zeros(stride, np.uint8)
        if f == 0:
            out[y] = cur
        elif f == 1:  # Sub — sequential in x, vectorize per pixel-column chunk
            for x in range(0, stride, bpp):
                if x:
                    cur[x : x + bpp] += out[y, x - bpp : x]
                out[y, x : x + bpp] = cur[x : x + bpp]
        elif f == 2:  # Up
            out[y] = cur + prev
        elif f == 3:  # Average
            for x in range(0, stride, bpp):
                left = out[y, x - bpp : x].astype(np.uint16) if x else np.zeros(bpp, np.uint16)
                avg = ((left + prev[x : x + bpp].astype(np.uint16)) // 2).astype(np.uint8)
                out[y, x : x + bpp] = cur[x : x + bpp] + avg
        elif f == 4:  # Paeth
            for x in range(0, stride, bpp):
                a = out[y, x - bpp : x] if x else np.zeros(bpp, np.uint8)
                c = prev[x - bpp : x] if x else np.zeros(bpp, np.uint8)
                out[y, x : x + bpp] = cur[x : x + bpp] + _paeth(a, prev[x : x + bpp], c)
        else:
            raise ValueError(f"unknown PNG filter {f}")
    return out.reshape(height, width, ch)


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via numpy fancy indexing (no imaging lib)."""
    h, w = pixels.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return pixels[ys[:, None], xs[None, :]]
