"""Multimodal column operators: opaque ``binary`` payloads + typed metadata.

Images are REAL here (the repo ships its own PNG codec + resampler), and so
are audio (from-scratch WAV/PCM codec, ppocr_spark/audio.py) and video
(from-scratch RIFF/AVI container with uncompressed DIB frames,
ppocr_spark/video.py): decode, metadata extraction, frame sampling, and
feature extraction run as Arrow-batched ``mapInPandas`` — the exact
plumbing (schema, batch shape, partitioning) a production pipeline needs.
Compressed video codecs (H.264/VP9) would slot in behind the same
decode_avi contract without touching the plans.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

IMAGE_META_SCHEMA = (
    "media_ref string, width int, height int, channels int, "
    "decode_ok boolean, ink_ratio double"
)

IMAGE_FEATURE_SCHEMA = "media_ref string, features array<float>"

FRAME_SAMPLE_SCHEMA = "media_ref string, frame_idx int, frame binary"


def image_metadata(media: DataFrame) -> DataFrame:
    """Decode-probe every payload: dimensions, channels, ink density.
    Total function — undecodable rows yield decode_ok=false, never throw."""

    def udf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ppocr_spark.png import PngError, decode, to_gray

        for pdf in batches:
            rows = {k: [] for k in
                    ("media_ref", "width", "height", "channels",
                     "decode_ok", "ink_ratio")}
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                rows["media_ref"].append(ref)
                try:
                    img = decode(bytes(content)) if content is not None else None
                    if img is None:
                        raise PngError("null")
                    g = to_gray(img)
                    rows["width"].append(int(g.shape[1]))
                    rows["height"].append(int(g.shape[0]))
                    rows["channels"].append(
                        1 if img.ndim == 2 else int(img.shape[2])
                    )
                    rows["decode_ok"].append(True)
                    rows["ink_ratio"].append(
                        float((g < 128).mean())
                    )
                except PngError:
                    rows["width"].append(0)
                    rows["height"].append(0)
                    rows["channels"].append(0)
                    rows["decode_ok"].append(False)
                    rows["ink_ratio"].append(0.0)
            yield pd.DataFrame(rows)

    return media.select("media_ref", "content").mapInPandas(
        udf, schema=IMAGE_META_SCHEMA
    )


def image_features(media: DataFrame, grid: int = 8) -> DataFrame:
    """grid x grid mean-ink pooled features (a deterministic embedding) —
    the decode→resize→pool pattern of a vision feature extractor, fully
    real: area-resampled, Arrow-batched."""

    def udf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ppocr_spark.png import PngError, decode, to_gray
        from ppocr_spark.resample import area_resize

        for pdf in batches:
            refs, feats = [], []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                try:
                    g = to_gray(decode(bytes(content)))
                    pooled = area_resize(
                        (255.0 - g.astype(np.float32)) / 255.0, grid, grid
                    )
                    refs.append(ref)
                    feats.append([float(x) for x in pooled.reshape(-1)])
                except (PngError, TypeError):
                    continue  # undecodable rows are dropped from features
            # dtype=object: an all-undecodable batch must yield an empty
            # OBJECT column (an empty float64 ndarray can't convert to
            # Arrow list<float>)
            yield pd.DataFrame(
                {
                    "media_ref": pd.Series(refs, dtype="object"),
                    "features": pd.Series(feats, dtype="object"),
                }
            )

    return media.select("media_ref", "content").mapInPandas(
        udf, schema=IMAGE_FEATURE_SCHEMA
    )


AUDIO_META_SCHEMA = (
    "media_ref string, sample_rate int, channels int, n_samples int, "
    "duration_s double, decode_ok boolean, rms double"
)

AUDIO_FEATURE_SCHEMA = "media_ref string, features array<float>"


def audio_metadata(media: DataFrame) -> DataFrame:
    """Decode-probe every audio payload (from-scratch WAV/PCM codec):
    sample rate, channels, length, overall RMS. Total function —
    undecodable rows yield decode_ok=false, never throw."""

    def udf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ppocr_spark.audio import AudioError, decode_wav

        for pdf in batches:
            rows = {k: [] for k in
                    ("media_ref", "sample_rate", "channels", "n_samples",
                     "duration_s", "decode_ok", "rms")}
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                rows["media_ref"].append(ref)
                try:
                    if content is None:
                        raise AudioError("null")
                    a, rate = decode_wav(bytes(content))
                    rows["sample_rate"].append(rate)
                    rows["channels"].append(int(a.shape[1]))
                    rows["n_samples"].append(int(a.shape[0]))
                    rows["duration_s"].append(a.shape[0] / float(rate))
                    rows["decode_ok"].append(True)
                    rows["rms"].append(
                        float(np.sqrt(np.mean(
                            a.mean(axis=1).astype(np.float64) ** 2
                        )))
                    )
                except AudioError:
                    rows["sample_rate"].append(0)
                    rows["channels"].append(0)
                    rows["n_samples"].append(0)
                    rows["duration_s"].append(0.0)
                    rows["decode_ok"].append(False)
                    rows["rms"].append(0.0)
            yield pd.DataFrame(rows)

    return media.select("media_ref", "content").mapInPandas(
        udf, schema=AUDIO_META_SCHEMA
    )


def audio_features(media: DataFrame, n_frames: int = 16) -> DataFrame:
    """Framed RMS-energy vector per payload (decode → mono mix → equal
    windows → RMS): the decode→window→reduce pattern of an audio feature
    extractor, fully real on WAV/PCM. Undecodable rows are dropped."""

    def udf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ppocr_spark.audio import AudioError, decode_wav, frame_rms

        for pdf in batches:
            refs, feats = [], []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                try:
                    if content is None:
                        raise AudioError("null")
                    a, _rate = decode_wav(bytes(content))
                    refs.append(ref)
                    feats.append(
                        [float(x) for x in frame_rms(a, n_frames)]
                    )
                except AudioError:
                    continue
            yield pd.DataFrame(
                {
                    "media_ref": pd.Series(refs, dtype="object"),
                    "features": pd.Series(feats, dtype="object"),
                }
            )

    return media.select("media_ref", "content").mapInPandas(
        udf, schema=AUDIO_FEATURE_SCHEMA
    )


VIDEO_META_SCHEMA = (
    "media_ref string, width int, height int, n_frames int, "
    "fps double, duration_s double, decode_ok boolean"
)

VIDEO_FEATURE_SCHEMA = "media_ref string, features array<float>"


def video_metadata(media: DataFrame) -> DataFrame:
    """Decode-probe every video payload (from-scratch RIFF/AVI codec):
    dimensions, frame count, frame rate, duration. Total function —
    undecodable rows yield decode_ok=false, never throw.

    Reference contract: videos enter the reference engine one extracted
    frame at a time (cpp/src/task.cpp run loop); here the container itself
    is a first-class column."""

    def udf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ppocr_spark.video import VideoError, decode_avi

        for pdf in batches:
            rows = {k: [] for k in
                    ("media_ref", "width", "height", "n_frames", "fps",
                     "duration_s", "decode_ok")}
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                rows["media_ref"].append(ref)
                try:
                    if content is None:
                        raise VideoError("null")
                    frames, fps = decode_avi(bytes(content))
                    n, h, w, _ = frames.shape
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["n_frames"].append(n)
                    rows["fps"].append(float(fps))
                    rows["duration_s"].append(n / float(fps))
                    rows["decode_ok"].append(True)
                except VideoError:
                    rows["width"].append(0)
                    rows["height"].append(0)
                    rows["n_frames"].append(0)
                    rows["fps"].append(0.0)
                    rows["duration_s"].append(0.0)
                    rows["decode_ok"].append(False)
            yield pd.DataFrame(rows)

    return media.select("media_ref", "content").mapInPandas(
        udf, schema=VIDEO_META_SCHEMA
    )


def video_features(media: DataFrame) -> DataFrame:
    """Per-frame mean-luma profile (decode → BT.601 luma → frame mean):
    the deterministic 'video embedding' — same decode→reduce shape an
    embedding extractor would use. Undecodable rows are dropped."""

    def udf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ppocr_spark.video import (VideoError, decode_avi,
                                       frame_luma_profile)

        for pdf in batches:
            refs, feats = [], []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                try:
                    if content is None:
                        raise VideoError("null")
                    frames, _fps = decode_avi(bytes(content))
                    refs.append(ref)
                    feats.append(
                        [float(x) for x in frame_luma_profile(frames)]
                    )
                except VideoError:
                    continue
            yield pd.DataFrame(
                {
                    "media_ref": pd.Series(refs, dtype="object"),
                    "features": pd.Series(feats, dtype="object"),
                }
            )

    return media.select("media_ref", "content").mapInPandas(
        udf, schema=VIDEO_FEATURE_SCHEMA
    )


def sample_video_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Sample every ``every_n``-th frame from each video payload and emit
    it as a PNG-gray thumbnail (AVI decode → BT.601 luma → the repo's own
    PNG encoder). One output row per sampled frame — the explode shape a
    frame-level training pipeline consumes. Undecodable rows are dropped
    (use video_metadata for the decode_ok taxonomy)."""

    def udf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ppocr_spark.png import encode_gray
        from ppocr_spark.video import VideoError, decode_avi, luma8

        for pdf in batches:
            refs, idxs, blobs = [], [], []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                try:
                    if content is None:
                        raise VideoError("null")
                    frames, _fps = decode_avi(bytes(content))
                except VideoError:
                    continue
                for k in range(0, frames.shape[0], every_n):
                    refs.append(ref)
                    idxs.append(k)
                    blobs.append(encode_gray(luma8(frames[k])))
            yield pd.DataFrame(
                {
                    "media_ref": pd.Series(refs, dtype="object"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame": pd.Series(blobs, dtype="object"),
                }
            )

    return media.select("media_ref", "content").mapInPandas(
        udf, schema=FRAME_SAMPLE_SCHEMA
    )
