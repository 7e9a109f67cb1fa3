"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata struct.
The Spark-side plumbing (schema, batching, partition sizing, UDF
signatures) is real and tested; the actual codec calls are STUBBED —
the image/audio libraries are not in this container. Each decode stub
either raises ``NotImplementedError`` (strict mode) or produces a
deterministic fake (test mode) so pipelines can be exercised
end-to-end.

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


def decode_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    dim: int = 64,
    stub_mode: str = "fake",
) -> DataFrame:
    """Decode+embed images → (id, feature array).

    ``stub_mode='fake'`` produces a deterministic payload-derived vector;
    ``'strict'`` raises NotImplementedError where a real decoder (PIL /
    torchvision) would run. The Arrow plumbing is identical either way.
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
                if stub_mode == "strict":
                    raise NotImplementedError(
                        "image decode requires PIL/torchvision (not in "
                        "this container); use stub_mode='fake'"
                    )
                feats.append(_fake_features(bytes(payload), dim).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

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
