"""Minimal deterministic PNG codec (pure numpy + stdlib zlib).

Plays the role of the reference's ``cv::imdecode``/``imencode`` (image
sniffed from *bytes*, never extension — ``cpp/src/task_linux.cpp:106-107``).
The container has no OpenCV/PIL, so the codec is hand-rolled: 8-bit
grayscale / RGB / RGBA, all five PNG scanline filters on decode,
filter-0 grayscale on encode. Deterministic output (fixed zlib level).

Decode failures raise ``PngError`` which the pipeline maps to the
reference's 203/204 status codes (``cpp/include/task.h:13-61``).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"


class PngError(ValueError):
    """Unparseable or unsupported PNG payload (→ status 203/204)."""


def encode_gray(img: np.ndarray) -> bytes:
    """Encode a 2-D uint8 array as an 8-bit grayscale PNG."""
    if img.ndim != 2 or img.dtype != np.uint8:
        raise PngError("encode_gray expects 2-D uint8")
    h, w = img.shape
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))
    idat = zlib.compress(raw, 6)

    def chunk(tag: bytes, payload: bytes) -> bytes:
        body = tag + payload
        return struct.pack(">I", len(payload)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, h: int, w: int, channels: int) -> np.ndarray:
    """Reverse PNG scanline filtering. raw is the decompressed byte stream."""
    stride = w * channels
    if raw.size != h * (stride + 1):
        raise PngError("truncated image data")
    raw = raw.reshape(h, stride + 1)
    filters = raw[:, 0]
    if not filters.any():  # all filter-0 rows: direct view, no per-row loop
        return np.ascontiguousarray(raw[:, 1:]).reshape(h, w, channels)
    data = raw[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    bpp = channels
    for r in range(h):
        f = filters[r]
        line = data[r].copy()
        prev = out[r - 1] if r > 0 else np.zeros(stride, dtype=np.int32)
        if f == 0:
            out[r] = line
        elif f == 1:  # Sub
            acc = line
            for i in range(bpp, stride):
                acc[i] = (acc[i] + acc[i - bpp]) & 0xFF
            out[r] = acc
        elif f == 2:  # Up
            out[r] = (line + prev) & 0xFF
        elif f == 3:  # Average
            acc = line
            for i in range(stride):
                left = acc[i - bpp] if i >= bpp else 0
                acc[i] = (acc[i] + ((left + prev[i]) >> 1)) & 0xFF
            out[r] = acc
        elif f == 4:  # Paeth
            acc = line
            for i in range(stride):
                a = acc[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                acc[i] = (acc[i] + pred) & 0xFF
            out[r] = acc
        else:
            raise PngError(f"unknown filter {f}")
    return out.astype(np.uint8).reshape(h, w, channels)


def decode(data: bytes) -> np.ndarray:
    """Decode PNG bytes → uint8 array, shape (h, w) for gray else (h, w, c).

    Raises PngError on anything unparseable (the 203-analog path)."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise PngError("not bytes")
    data = bytes(data)
    if len(data) < 8 or data[:8] != _SIGNATURE:
        raise PngError("bad signature")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise PngError("truncated chunk")
        pos += 12 + length
        if tag == b"IHDR":
            # a corrupt IHDR declaring length != 13 must be a PngError,
            # not a raw struct.error escaping the callers' "total
            # function" handlers (multimodal.image_metadata catches
            # PngError only — an uncaught struct.error kills the job)
            if length != 13:
                raise PngError(f"bad IHDR length {length}")
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if width is None or not idat:
        raise PngError("missing IHDR/IDAT")
    if bit_depth != 8 or interlace != 0:
        raise PngError(f"unsupported depth/interlace {bit_depth}/{interlace}")
    channels = {0: 1, 2: 3, 6: 4}.get(color_type)
    if channels is None:
        raise PngError(f"unsupported color type {color_type}")
    if width <= 0 or height <= 0 or width * height > 64_000_000:
        raise PngError("bad dimensions")
    try:
        raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    except zlib.error as e:
        raise PngError(f"zlib: {e}") from e
    img = _unfilter(raw.copy(), height, width, channels)
    if channels == 1:
        return img[:, :, 0]
    return img


def to_gray(img: np.ndarray) -> np.ndarray:
    """BT.601 luma, matching OpenCV's RGB→gray rounding convention."""
    if img.ndim == 2:
        return img
    rgb = img[:, :, :3].astype(np.float64)
    y = rgb[:, :, 0] * 0.299 + rgb[:, :, 1] * 0.587 + rgb[:, :, 2] * 0.114
    return np.clip(np.round(y), 0, 255).astype(np.uint8)
