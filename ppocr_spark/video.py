"""From-scratch AVI (RIFF) video codec — the video leg of the multimodal
column family, completing the PNG / PDF / WAV set.

Pure numpy + struct, no codec library: a standard RIFF 'AVI ' container
with uncompressed 24-bit BI_RGB DIB frames ('00db' chunks, bottom-up BGR
rows padded to 4 bytes) — the oldest interchange format real players
still accept. Payloads stay opaque ``binary`` columns; decode runs
executor-side inside Arrow-batched UDFs (functions/multimodal.py).
Compressed codecs (MJPEG/H.264/...) would slot in behind the same
VideoError-total contract.

Container layout written (and the superset tolerated when reading):

    RIFF 'AVI '
      LIST 'hdrl'
        'avih'                    # main header: frame time, dims, count
        LIST 'strl' { 'strh' 'strf' }   # one video stream: DIB, fps, BMIH
      LIST 'movi' { '00db' ... }  # one uncompressed DIB per frame
      'idx1'                      # standard index (players expect it)
"""

from __future__ import annotations

import struct

import numpy as np


class VideoError(ValueError):
    pass


_AVIIF_KEYFRAME = 0x10


def _dib(frame: np.ndarray) -> bytes:
    """(h, w, 3) RGB uint8 → DIB pixel data: bottom-up rows, BGR order,
    row stride padded to a multiple of 4 bytes."""
    h, w, _ = frame.shape
    bgr = frame[::-1, :, ::-1]  # bottom-up + RGB→BGR
    stride = (w * 3 + 3) & ~3
    if stride == w * 3:
        return bgr.tobytes()
    padded = np.zeros((h, stride), dtype=np.uint8)
    padded[:, : w * 3] = bgr.reshape(h, w * 3)
    return padded.tobytes()


def encode_avi(frames: np.ndarray, fps: int) -> bytes:
    """uint8 frames of shape (n, h, w) grayscale or (n, h, w, 3) RGB →
    AVI bytes (uncompressed BI_RGB DIB stream at ``fps`` frames/sec)."""
    a = np.asarray(frames)
    if a.dtype != np.uint8 or a.ndim not in (3, 4) or a.shape[0] < 1:
        raise VideoError("encode_avi expects uint8 (n,h,w[,3]) frames")
    if a.ndim == 3:
        a = np.repeat(a[:, :, :, None], 3, axis=3)
    if a.shape[3] != 3:
        raise VideoError("frames must be grayscale or 3-channel RGB")
    if fps <= 0:
        raise VideoError("fps must be positive")
    n, h, w, _ = a.shape
    stride = (w * 3 + 3) & ~3
    frame_size = stride * h

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,       # microseconds per frame
        frame_size * fps,       # max bytes per second
        0,                      # padding granularity
        0x10,                   # AVIF_HASINDEX
        n, 0, 1,                # total frames, initial frames, streams
        frame_size,             # suggested buffer size
        w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIiI4H",
        b"vids", b"DIB ",
        0, 0, 0, 0,             # flags, priority, language, initial
        1, fps,                 # scale, rate → fps = rate/scale
        0, n,                   # start, length (frames)
        frame_size, -1, 0,      # suggested buffer, quality(i), sample size
        0, 0, 0, 0,             # rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, 24,        # BITMAPINFOHEADER: size, w, h, planes, bpp
        0,                      # BI_RGB (uncompressed)
        frame_size, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )

    movi_body = b"movi"
    idx = b""
    for k in range(n):
        # idx1 offsets are relative to the 'movi' fourcc position
        idx += struct.pack(
            "<4sIII", b"00db", _AVIIF_KEYFRAME, len(movi_body), frame_size
        )
        movi_body += chunk(b"00db", _dib(a[k]))
    movi = chunk(b"LIST", movi_body)

    riff_body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) for each RIFF chunk in
    data[pos:end]; LIST chunks yield their list-type as fourcc with the
    body positioned after the type tag."""
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = pos + 8
        if body + size > end:
            raise VideoError("chunk overruns container")
        if cid == b"LIST" and size >= 4:
            yield data[body : body + 4], body + 4, size - 4
        else:
            yield cid, body, size
        pos = body + size + (size & 1)  # chunks are word-aligned


def decode_avi(data: bytes) -> tuple[np.ndarray, float]:
    """AVI bytes → (uint8 RGB frames (n, h, w, 3), fps).

    Total over malformed input: every failure raises VideoError. Walks
    the RIFF tree properly (unknown chunks skipped), requires one 'vids'
    stream of uncompressed 24-bit BI_RGB DIBs ('00db'/'00dc' chunks)."""
    data = bytes(data)
    if len(data) < 12 or data[0:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise VideoError("not a RIFF/AVI container")
    strh = strf = None
    width = height = None
    payloads: list[bytes] = []
    try:
        for kind, body, size in _walk(data, 12, len(data)):
            if kind == b"hdrl":
                for k2, b2, s2 in _walk(data, body, body + size):
                    if k2 == b"strl":
                        for k3, b3, s3 in _walk(data, b2, b2 + s2):
                            if k3 == b"strh" and s3 >= 48:
                                strh = struct.unpack(
                                    "<4s4sIHHIIIII", data[b3 : b3 + 36]
                                )
                            elif k3 == b"strf" and s3 >= 40:
                                strf = struct.unpack(
                                    "<IiiHHI", data[b3 : b3 + 20]
                                )
            elif kind == b"movi":
                for k2, b2, s2 in _walk(data, body, body + size):
                    if k2 in (b"00db", b"00dc"):
                        payloads.append(data[b2 : b2 + s2])
    except struct.error as e:  # truncated fixed-size header
        raise VideoError(f"malformed header: {e}") from e
    if strh is None or strf is None:
        raise VideoError("missing strh/strf stream headers")
    if strh[0] != b"vids":
        raise VideoError("first stream is not video")
    scale, rate = strh[6], strh[7]
    if scale <= 0 or rate <= 0:
        raise VideoError("bad frame rate")
    _bi_size, width, height, _planes, bpp, compression = strf
    if compression != 0 or bpp != 24:
        raise VideoError("only uncompressed 24-bit BI_RGB is supported")
    if width <= 0 or height == 0:
        raise VideoError("bad dimensions")
    top_down = height < 0  # negative biHeight = top-down DIB
    h = abs(height)
    stride = (width * 3 + 3) & ~3
    if not payloads:
        raise VideoError("no frames in movi list")
    frames = np.empty((len(payloads), h, width, 3), dtype=np.uint8)
    for k, p in enumerate(payloads):
        if len(p) < stride * h:
            raise VideoError(f"frame {k} truncated")
        rows = np.frombuffer(p[: stride * h], dtype=np.uint8).reshape(
            h, stride
        )
        bgr = rows[:, : width * 3].reshape(h, width, 3)
        if not top_down:
            bgr = bgr[::-1]
        frames[k] = bgr[:, :, ::-1]  # BGR→RGB
    return frames, rate / scale


def luma8(frame: np.ndarray) -> np.ndarray:
    """(h, w, 3) RGB uint8 → BT.601 luma uint8 (round-half-even, the numpy
    default — generation truth and the frame-sampling UDF share this exact
    arithmetic, so re-encoded thumbnails are bit-identical)."""
    rgb = frame.astype(np.float64)
    y = rgb[:, :, 0] * 0.299 + rgb[:, :, 1] * 0.587 + rgb[:, :, 2] * 0.114
    return np.clip(np.rint(y), 0, 255).astype(np.uint8)


def frame_luma_profile(frames: np.ndarray) -> np.ndarray:
    """Per-frame mean BT.601 luma in [0, 1] (float32) — the deterministic
    'video embedding' (same arithmetic at generation and in the UDF)."""
    rgb = frames.astype(np.float64)
    y = (
        rgb[:, :, :, 0] * 0.299
        + rgb[:, :, :, 1] * 0.587
        + rgb[:, :, :, 2] * 0.114
    )
    return (y.mean(axis=(1, 2)) / 255.0).astype(np.float32)
