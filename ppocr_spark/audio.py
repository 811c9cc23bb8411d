"""From-scratch WAV (RIFF/PCM) codec — the audio leg of the multimodal
column family.

Pure numpy, no codec library: canonical RIFF chunk walk, PCM 8/16-bit.
Mirrors the repo's PNG codec role: payloads stay opaque ``binary``
columns; decode runs executor-side inside Arrow-batched UDFs
(functions/multimodal.py). Compressed formats (mp3/aac/...) would slot
in behind the same AudioError-total contract.
"""

from __future__ import annotations

import struct

import numpy as np


class AudioError(ValueError):
    pass


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """float32/float64 samples in [-1, 1], shape (n,) or (n, channels) →
    16-bit PCM WAV bytes."""
    a = np.asarray(samples, dtype=np.float64)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    pcm = np.clip(np.round(a * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.reshape(-1).tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, ch, sample_rate, byte_rate, ch * 2, 16
    )
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data), b"WAVE")
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (float32 samples (n, channels) in [-1, 1], sample_rate).

    Total over malformed input: every failure raises AudioError. Walks
    RIFF chunks properly (extra chunks like LIST are skipped), supports
    PCM 8-bit unsigned and 16-bit signed."""
    data = bytes(data)
    if len(data) < 12 or data[0:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise AudioError("not a RIFF/WAVE container")
    pos = 12
    fmt = None
    payload = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or payload is None:
        raise AudioError("missing fmt/data chunk")
    audio_format, ch, rate, _br, _ba, bits = fmt
    if audio_format != 1 or ch < 1 or rate <= 0:
        raise AudioError("not integer PCM")
    if bits == 16:
        raw = np.frombuffer(
            payload[: (len(payload) // (2 * ch)) * 2 * ch], dtype="<i2"
        )
        a = raw.astype(np.float32) / 32768.0
    elif bits == 8:
        raw = np.frombuffer(
            payload[: (len(payload) // ch) * ch], dtype=np.uint8
        )
        a = (raw.astype(np.float32) - 128.0) / 128.0
    else:
        raise AudioError(f"unsupported bit depth {bits}")
    if a.size == 0:
        raise AudioError("empty data chunk")
    return a.reshape(-1, ch), int(rate)


def frame_rms(samples: np.ndarray, n_frames: int) -> np.ndarray:
    """Per-frame RMS energy over n_frames equal windows of the mono mix —
    the deterministic 'audio embedding' (float32; same arithmetic at
    generation and in the UDF, so truth tables match bit-for-bit)."""
    mono = samples.mean(axis=1)
    n = mono.shape[0]
    edges = [(k * n) // n_frames for k in range(n_frames + 1)]
    out = np.zeros(n_frames, dtype=np.float32)
    for k in range(n_frames):
        seg = mono[edges[k] : edges[k + 1]]
        if seg.size:
            out[k] = np.sqrt(np.mean(seg.astype(np.float64) ** 2))
    return out
