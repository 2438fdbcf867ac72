"""Multimodal column plumbing for training-data pipelines.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched functions over ``mapInPandas`` so each partition streams
through Python in columnar batches (never per-row Spark UDF calls).

The image/audio codec libraries are NOT in this container, so the decode
kernels are stubs behind import-tries: with the real library present the
same plumbing runs it; without it, ``deterministic_fake=True`` substitutes
a seeded, content-derived fake (so schema, partitioning, UDF signature and
batch shape are all real and tested), and ``deterministic_fake=False``
raises NotImplementedError as a clearly-marked stub.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("url", StringType()),
        StructField("kind", StringType()),      # image | audio | video
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def _try_real_decoder(kind: str):
    """Probe for real codec libs (absent in this container)."""
    try:
        if kind == "image":
            import PIL.Image  # noqa: F401

            return "PIL"
        if kind == "audio":
            import soundfile  # noqa: F401

            return "soundfile"
    except ImportError:
        pass
    return None


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic content-derived fake embedding: repeated sha256 of
    the payload, mapped to [-1, 1). Stands in for a real decode+encode."""
    out = np.empty(dim, dtype=np.float32)
    h = hashlib.sha256(payload).digest()
    buf = b""
    while len(buf) < dim:
        h = hashlib.sha256(h).digest()
        buf += h
    raw = np.frombuffer(buf[:dim], dtype=np.uint8)
    out[:] = raw.astype(np.float32) / 128.0 - 1.0
    return out


def extract_features(
    media: DataFrame, dim: int = 32, deterministic_fake: bool = True
) -> DataFrame:
    """Decode + feature-extract each media row via mapInPandas.

    Real decoders are used when importable; otherwise the deterministic
    fake (or NotImplementedError when fakes are disallowed)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, nbytes = [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                data = bytes(payload) if payload is not None else b""
                nbytes.append(len(data))
                decoder = _try_real_decoder(kind)
                if decoder is not None:
                    # STUB: real decode path would run here (PIL/soundfile);
                    # not implemented in-container.
                    raise NotImplementedError(
                        f"real {decoder} decode wired but not implemented in sandbox"
                    )
                if not deterministic_fake:
                    raise NotImplementedError(
                        f"no decoder available for kind={kind}; "
                        "enable deterministic_fake for plumbing tests"
                    )
                feats.append(_fake_feature(data, dim))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": np.array(nbytes, dtype=np.int64),
                    "feature": feats,
                }
            )

    return media.mapInPandas(batches, FEATURES_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("frame_sha", StringType()),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 10, max_frames: int = 8) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits one row per
    sampled frame. The decode is the deterministic fake (sha of a byte
    slice per 'frame'); a real implementation swaps in pyav/ffmpeg."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, frames, shas = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                n = min(max_frames, max(1, len(data) // max(every_n, 1)))
                step = max(1, len(data) // max(n, 1))
                for f_no in range(n):
                    chunk = data[f_no * step : (f_no + 1) * step]
                    ids.append(mid)
                    frames.append(f_no)
                    shas.append(hashlib.sha1(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": np.array(ids, dtype=np.int64),
                    "frame_no": np.array(frames, dtype=np.int32),
                    "frame_sha": shas,
                }
            )

    return media.where(F.col("kind") == "video").mapInPandas(batches, FRAME_SCHEMA)
