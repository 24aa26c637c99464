"""Pure-stdlib AVI (RIFF) codec for uncompressed 24-bit DIB video.

Same role as ops/png.py (images) and the stdlib ``wave`` path (audio): the
container sandbox has no ffmpeg/imageio, but the classic AVI RIFF layout —
``RIFF('AVI ') → LIST(hdrl){avih, LIST(strl){strh,strf}} → LIST(movi){00db…}``
— is public, stable and simple enough to read and write with ``struct``,
which makes the video half of ops/multimodal.py REAL: deterministic
self-authored clips decode through the actual container/bitmap path and
every sampled-frame statistic has a closed form a SQL oracle can check.

Only the uncompressed-DIB subset is implemented ('00db' frames, 24 bpp,
bottom-up BGR rows padded to 4 bytes — the format Video-for-Windows wrote
by default); compressed fourccs raise, and callers treat that as a per-row
data error. Reference analog: the multimodal decode stages the reference
delegates to external decoders (SURVEY.md §2 multimodal row).
"""

from __future__ import annotations

import struct

import numpy as np


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(kind: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", kind + payload)


def _frame_to_dib(frame: np.ndarray) -> bytes:
    """HxWx3 RGB uint8 → bottom-up BGR rows padded to 4-byte alignment."""
    h, w, _ = frame.shape
    stride = (w * 3 + 3) & ~3
    bgr = frame[::-1, :, ::-1]  # bottom-up, RGB→BGR
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    return rows.tobytes()


def _dib_to_frame(payload: bytes, w: int, h: int) -> np.ndarray:
    stride = (w * 3 + 3) & ~3
    if len(payload) < stride * h:
        raise ValueError("short DIB frame payload")
    rows = np.frombuffer(payload[: stride * h], np.uint8).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    return bgr[::-1, :, ::-1].copy()  # top-down, BGR→RGB


def avi_encode(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """Encode HxWx3 RGB uint8 frames (all same shape) as an uncompressed AVI."""
    if not frames:
        raise ValueError("avi_encode needs at least one frame")
    h, w, c = frames[0].shape
    if c != 3:
        raise ValueError("frames must be HxWx3 RGB")
    n = len(frames)
    stride = (w * 3 + 3) & ~3
    frame_bytes = stride * h

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        frame_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        frame_bytes,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids"
        + b"DIB "
        + struct.pack(
            "<10I",
            0,  # dwFlags
            0,  # wPriority + wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate (fps = rate/scale)
            0,  # dwStart
            n,  # dwLength
            frame_bytes,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality
            0,  # dwSampleSize
        )
        + struct.pack("<4h", 0, 0, w, h)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, 24, 0, frame_bytes, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_payload = b""
    idx_entries = []
    offset = 4  # relative to the start of 'movi' fourcc
    for fr in frames:
        if fr.shape != (h, w, 3):
            raise ValueError("all frames must share one shape")
        dib = _frame_to_dib(np.ascontiguousarray(fr, np.uint8))
        idx_entries.append(struct.pack("<4s3I", b"00db", 0x10, offset, len(dib)))
        ck = _chunk(b"00db", dib)
        movi_payload += ck
        offset += len(ck)
    movi = _list(b"movi", movi_payload)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _iter_chunks(data: bytes, pos: int, end: int):
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        payload_start = pos + 8
        yield fourcc, payload_start, size
        pos = payload_start + size + (size & 1)


def avi_decode(payload: bytes):
    """Decode an uncompressed-DIB AVI. Returns ``(frames, fps, w, h)`` with
    frames as a list of HxWx3 RGB uint8 arrays."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI (bad RIFF/AVI magic)")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    end = min(len(payload), 8 + riff_size)

    w = h = None
    rate, scale = 0, 1
    bitcount = None
    frames: list[np.ndarray] = []

    def walk(pos: int, stop: int):
        nonlocal w, h, rate, scale, bitcount
        for fourcc, start, size in _iter_chunks(payload, pos, stop):
            if fourcc == b"LIST":
                walk(start + 4, start + size)
            elif fourcc == b"strh":
                if payload[start : start + 4] == b"vids":
                    scale, rate = struct.unpack_from("<II", payload, start + 20)
                    handler = payload[start + 4 : start + 8]
                    if handler not in (b"DIB ", b"\x00\x00\x00\x00", b"RGB "):
                        raise ValueError(
                            f"unsupported AVI codec {handler!r} (only uncompressed DIB)"
                        )
            elif fourcc == b"strf":
                if w is None:
                    _, w, h, _, bitcount = struct.unpack_from("<IiiHH", payload, start)
            elif fourcc in (b"00db", b"00dc"):
                if w is None or bitcount != 24:
                    raise ValueError("frame chunk before a 24bpp strf header")
                frames.append(_dib_to_frame(payload[start : start + size], w, abs(h)))

    walk(12, end)
    if w is None:
        raise ValueError("AVI has no video stream header")
    fps = rate // scale if scale else 0
    return frames, fps, w, abs(h)
