"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata struct.
The Spark-side plumbing (schema, batching, partition sizing, UDF
signatures) is real and tested. Decoding is tiered:

- REAL decoders for the library-free uncompressed formats — PPM (P6)
  images and WAV (PCM16) audio are parsed with struct/numpy only, and
  their features (grid color means / segment RMS energies) are
  genuine functions of the pixels/samples.
- Compressed codecs (JPEG/PNG/MP3/video) are STUBBED — the libraries
  are not in this container. Each stub either raises
  ``NotImplementedError`` (strict mode) or produces a deterministic
  payload-derived fake (test mode) so pipelines exercise end-to-end.

At 100 TB: binary payloads dominate row size, so these operators use
``mapInPandas`` with small Arrow batches (payloads stream per-batch,
never accumulate per-partition) and carry only (id, metadata, features)
forward — the payload column is dropped as early as possible.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType,
    StringType, StructField, StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "decode_image_features",
    "decode_audio_features",
    "resize_images",
    "sample_video_frames",
    "media_stats",
]

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),        # image|audio|video
    StructField("payload", BinaryType(), True),      # opaque bytes
    StructField("mime", StringType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", LongType(), True),
])


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake embedding from payload bytes (test mode)."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim).astype(np.float32)
    return v / np.linalg.norm(v)


def _decode_ppm(payload: bytes) -> Optional[np.ndarray]:
    """Parse a binary PPM (P6) image with struct/numpy only → (h, w, 3)
    uint8, or None if the payload is not (valid) P6. No external codecs.

    Malformed payloads that pass the magic check (truncated header,
    short pixel buffer) must return None — not raise — so they route to
    the stub/strict fallback instead of failing the whole Arrow batch."""
    if not payload.startswith(b"P6"):
        return None
    try:
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(payload) and payload[pos:pos + 1].isspace():
                pos += 1
            if payload[pos:pos + 1] == b"#":  # comment to end of line
                nl = payload.find(b"\n", pos)
                pos = nl + 1 if nl >= 0 else len(payload)
                continue
            start = pos
            while pos < len(payload) and not payload[pos:pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
        pos += 1  # single whitespace after maxval
        w, h, maxval = fields
        if maxval > 255 or w <= 0 or h <= 0:
            return None  # 16-bit PPM / degenerate dims — out of scope
        n = w * h * 3
        px = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
        return px.reshape(h, w, 3)
    except (ValueError, IndexError):
        return None


def _decode_with_pil(payload: bytes) -> Optional[np.ndarray]:
    """Optional real decoder for compressed images (JPEG/PNG/WebP/...)
    when Pillow is installed on the cluster — import-gated so this
    container (no PIL) keeps the documented stub behavior. Returns an
    (h, w, 3) uint8 array, or None when Pillow is absent or the payload
    does not decode."""
    try:
        from PIL import Image  # noqa: PLC0415 — worker-side optional dep
    except ImportError:
        return None
    import io

    try:
        with Image.open(io.BytesIO(payload)) as im:
            return np.asarray(im.convert("RGB"), dtype=np.uint8)
    except Exception:
        return None


def _decode_image(payload: bytes) -> Optional[np.ndarray]:
    """THE image decode ladder, shared by every image operator: real
    PPM (P6) parser first, then the import-gated Pillow path; None when
    neither decodes (callers apply the stub/strict contract)."""
    img = _decode_ppm(payload)
    if img is None:
        img = _decode_with_pil(payload)
    return img


def _ppm_grid_features(img: np.ndarray, grid: int = 4) -> np.ndarray:
    """Real image features: per-channel mean over a grid×grid block
    partition (crop to multiples), L2-normalized → 3·grid² floats."""
    h, w, _ = img.shape
    gh, gw = max(h // grid, 1), max(w // grid, 1)
    crop = img[: gh * min(grid, h), : gw * min(grid, w), :].astype(np.float64)
    ch, cw = crop.shape[0] // gh, crop.shape[1] // gw
    blocks = crop.reshape(ch, gh, cw, gw, 3).mean(axis=(1, 3))
    v = blocks.reshape(-1).astype(np.float32)
    norm = float(np.linalg.norm(v))
    return v / norm if norm > 0 else v


def _decode_wav_pcm16(payload: bytes) -> Optional[np.ndarray]:
    """Parse a RIFF/WAVE PCM16 payload with struct/numpy only → float64
    mono samples in [-1, 1], or None if not PCM16 WAV."""
    import struct as _struct

    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    # short/corrupt chunks (e.g. an 'fmt ' body under 16 bytes) must
    # route to the stub fallback, not crash the Arrow batch
    try:
        pos, n_channels, bits, data = 12, None, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos:pos + 4]
            (size,) = _struct.unpack_from("<I", payload, pos + 4)
            body = payload[pos + 8: pos + 8 + size]
            if cid == b"fmt ":
                fmt_code, n_channels = _struct.unpack_from("<HH", body, 0)
                (bits,) = _struct.unpack_from("<H", body, 14)
                if fmt_code != 1 or bits != 16:
                    return None
            elif cid == b"data":
                data = body
            pos += 8 + size + (size & 1)
    except (_struct.error, ValueError, IndexError):
        return None
    if data is None or n_channels is None:
        return None
    samples = np.frombuffer(
        data, dtype="<i2", count=len(data) // 2
    ).astype(np.float64) / 32768.0
    if n_channels > 1:
        samples = samples[: len(samples) // n_channels * n_channels]
        samples = samples.reshape(-1, n_channels).mean(axis=1)
    return samples


def _wav_energy_features(samples: np.ndarray, bins: int = 16) -> np.ndarray:
    """Real audio features: RMS energy over ``bins`` equal segments +
    zero-crossing rate, L2-normalized → bins+1 floats."""
    if samples.size == 0:
        return np.zeros(bins + 1, dtype=np.float32)
    seg = max(samples.size // bins, 1)
    trimmed = samples[: seg * min(bins, samples.size)]
    rms = np.sqrt((trimmed.reshape(-1, seg) ** 2).mean(axis=1))
    if rms.size < bins:
        rms = np.pad(rms, (0, bins - rms.size))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(samples)))))
    v = np.concatenate([rms, [zcr]]).astype(np.float32)
    norm = float(np.linalg.norm(v))
    return v / norm if norm > 0 else v


def decode_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    dim: int = 64,
    stub_mode: str = "fake",
) -> DataFrame:
    """Decode+embed images → (id, feature array).

    PPM (P6) payloads are REALLY decoded (struct/numpy header + pixel
    parse) and featurized with 4×4 grid color means — genuine pixel
    functions, no external codec. Compressed formats fall back to the
    stub: ``stub_mode='fake'`` produces a deterministic payload-derived
    vector; ``'strict'`` raises NotImplementedError where a real
    decoder (PIL / torchvision) would run. The Arrow plumbing is
    identical in all paths.
    """
    out_schema = StructType([
        df.schema[id_col],
        StructField("features", ArrayType(FloatType()), True),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                if payload is None:
                    feats.append(None)
                    continue
                payload_b = bytes(payload)
                img = _decode_image(payload_b)
                if img is not None:
                    feats.append(_ppm_grid_features(img).tolist())
                    continue
                if stub_mode == "strict":
                    raise NotImplementedError(
                        "compressed image decode requires Pillow (install "
                        "it on the cluster to enable the real path); use "
                        "stub_mode='fake' or PPM (P6) payloads"
                    )
                feats.append(_fake_features(payload_b, dim).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def decode_audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    bins: int = 16,
    stub_mode: str = "fake",
) -> DataFrame:
    """Decode+featurize audio → (id, feature array).

    WAV (RIFF PCM16) payloads are REALLY decoded (struct/numpy chunk
    parse, stereo→mono) into per-segment RMS energies + zero-crossing
    rate. Compressed formats (MP3/OGG/...) fall back to the stub, as in
    :func:`decode_image_features`."""
    out_schema = StructType([
        df.schema[id_col],
        StructField("features", ArrayType(FloatType()), True),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                if payload is None:
                    feats.append(None)
                    continue
                payload_b = bytes(payload)
                samples = _decode_wav_pcm16(payload_b)
                if samples is not None:
                    feats.append(_wav_energy_features(samples, bins).tolist())
                    continue
                if stub_mode == "strict":
                    raise NotImplementedError(
                        "compressed audio decode requires ffmpeg/librosa "
                        "(not in this container); use stub_mode='fake' or "
                        "WAV PCM16 payloads"
                    )
                feats.append(_fake_features(payload_b, bins + 1).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def _resize_nn(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize via numpy index gather — pixel-center
    sampling (the standard NN convention), no interpolation libs."""
    h, w, _ = img.shape
    ys = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64),
                    h - 1)
    xs = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64),
                    w - 1)
    return img[ys[:, None], xs[None, :], :]


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
    stub_mode: str = "fake",
) -> DataFrame:
    """Resize image payloads → (id, payload, width, height).

    PPM (P6) payloads (or anything the optional Pillow path decodes)
    are REALLY resized — nearest-neighbor index gather — and re-encoded
    as P6, so downstream decode/feature stages consume them unchanged.
    Undecodable payloads follow the stub contract: ``'strict'`` raises,
    ``'fake'`` yields a deterministic payload-derived gray image of the
    target size.  Payloads stream per Arrow batch via ``mapInPandas``
    (never accumulate per partition), matching the other media ops."""
    if width <= 0 or height <= 0:
        raise ValueError("resize_images needs width > 0 and height > 0")
    out_schema = StructType([
        df.schema[id_col],
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
    ])
    header = b"P6\n%d %d\n255\n" % (width, height)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for payload in pdf[payload_col]:
                if payload is None:
                    payloads.append(None)
                    continue
                payload_b = bytes(payload)
                img = _decode_image(payload_b)
                if img is not None:
                    small = _resize_nn(img, width, height)
                    payloads.append(header + small.tobytes())
                    continue
                if stub_mode == "strict":
                    raise NotImplementedError(
                        "compressed image resize requires Pillow (install "
                        "it on the cluster); use stub_mode='fake' or PPM "
                        "(P6) payloads"
                    )
                # deterministic gray fake of the target geometry
                shade = hashlib.sha256(payload_b).digest()[0]
                payloads.append(
                    header + bytes([shade]) * (width * height * 3)
                )
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "payload": payloads,
                "width": np.full(len(pdf), width, dtype=np.int32),
                "height": np.full(len(pdf), height, dtype=np.int32),
            })

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def sample_video_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    every_ms: int = 1000,
    stub_mode: str = "fake",
) -> DataFrame:
    """Frame sampling: one output row per sampled frame (id, frame_idx,
    frame payload stub). Real decoder (ffmpeg/pyav) is stubbed."""
    out_schema = StructType([
        df.schema[id_col],
        StructField("frame_idx", IntegerType(), False),
        StructField("frame", BinaryType(), True),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            durations = pdf.get("duration_ms")
            for j, payload in enumerate(pdf[payload_col]):
                if payload is None:
                    continue
                if stub_mode == "strict":
                    raise NotImplementedError(
                        "video decode requires ffmpeg/pyav (not in this "
                        "container); use stub_mode='fake'"
                    )
                dur = int(durations.iloc[j]) if durations is not None else 3000
                n_frames = max(dur // every_ms, 1)
                payload_b = bytes(payload)
                for fi in range(n_frames):
                    ids.append(pdf[id_col].iloc[j])
                    idxs.append(fi)
                    frames.append(
                        hashlib.sha256(payload_b + fi.to_bytes(4, "little"))
                        .digest()
                    )
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame": frames}
            )

    cols = [id_col, payload_col] + (
        ["duration_ms"] if "duration_ms" in df.columns else []
    )
    return df.select(*cols).mapInPandas(run, out_schema)


def media_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Payload size stats per media kind — pure built-ins."""
    return (
        df.groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.length(payload_col)).alias("total_bytes"),
            F.avg(F.length(payload_col)).alias("avg_bytes"),
        )
    )
