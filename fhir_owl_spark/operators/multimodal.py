"""Multimodal columns: image/audio/video as opaque ``binary`` with typed
metadata, processed by Arrow-batched ``mapInPandas`` stages.

The Spark-side plumbing here is real and tested — schemas, batch shapes,
partition behavior. The actual media decoding is STUBBED: codec libraries
(PIL/ffmpeg/torchaudio) are not in this container. Each decode function
either raises NotImplementedError (strict mode) or produces a
deterministic fake derived from the bytes (test mode), clearly marked.

At 100 TB the pattern is: media bytes stay columnar in parquet/Iceberg,
flow executor-side through Arrow into the decode UDF, and NEVER pass
through the driver. Metadata predicates (media_type, width, duration)
are plain columns → pushed down to the scan, so a "frames from videos
longer than 60 s" query prunes before any byte is decoded.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # 'image'|'audio'|'video'
        StructField("content", BinaryType()),
        StructField("width", IntegerType()),       # image/video
        StructField("height", IntegerType()),
        StructField("duration_s", DoubleType()),   # audio/video
        StructField("sample_rate", IntegerType()), # audio
    ]
)

IMAGE_FEATURES = StructType(
    [
        StructField("media_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
    ]
)

FRAME_SAMPLES = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ts_s", DoubleType()),
        StructField("frame", BinaryType()),
    ]
)


def _fake_decode(content: bytes, n: int) -> np.ndarray:
    """STUB decoder: deterministic pseudo-pixels from a SHA256 stream of
    the bytes. Replaces PIL/ffmpeg in this container; swap with a real
    decoder in production.

    The block counter is appended as ASCII (``|0``, ``|1``, …), not raw
     32-bit bytes: NUL bytes cannot ride through a VARCHAR-only sha256,
    and the ASCII form lets the DuckDB contract oracle recompute the
    exact stream (media_features query) — value-level verification of
    the whole multimodal plumbing, not just shapes."""
    if content is None:
        content = b""
    out = np.empty(n, dtype=np.float32)
    i = 0
    counter = 0
    while i < n:
        block = hashlib.sha256(content + b"|" + str(counter).encode()).digest()
        chunk = np.frombuffer(block, dtype=np.uint8).astype(np.float32) / 255.0
        take = min(len(chunk), n - i)
        out[i : i + take] = chunk[:take]
        i += take
        counter += 1
    return out


def _try_pil():
    """Real codec seam: PIL when present, None otherwise (absent from
    this container — the import executes on the EXECUTOR inside the
    decode UDF, so a cluster with pillow installed gets real decoding
    with no code change)."""
    try:
        from PIL import Image  # type: ignore

        return Image
    except ImportError:
        return None


def image_features(
    media: DataFrame, feature_dim: int = 64, strict: bool = False
) -> DataFrame:
    """Decode + resize + feature-extract images.

    Real plumbing: filters on metadata columns (pushed to the scan),
    Arrow batches of binary in, fixed-dim float features out.

    Decode paths: ``strict=False`` (default) uses the deterministic
    SHA256 stub — stable across environments, value-oracled by the
    contract's DuckDB query. ``strict=True`` REQUIRES a real codec: with
    PIL installed the bytes are decoded, grayscale-resized and emitted
    as a normalized pixel feature (baseline featurizer; swap in a model
    embedding in production); without PIL it raises NotImplementedError
    (honest container limitation, no silent fake in strict mode).
    """

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pil = _try_pil() if strict else None
        if strict and pil is None:
            raise NotImplementedError(
                "image decoding requires a codec library (pillow) not present "
                "in this container; install PIL for real decoding or run with "
                "strict=False for the deterministic stub"
            )
        import io

        for pdf in batches:
            if pil is None:
                feats = [
                    _fake_decode(c, feature_dim).tolist() for c in pdf["content"]
                ]
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "feature": feats,
                        "out_width": np.minimum(pdf["width"].fillna(0), 224).astype("int32"),
                        "out_height": np.minimum(pdf["height"].fillna(0), 224).astype("int32"),
                    }
                )
                continue
            feats, ows, ohs = [], [], []
            for c in pdf["content"]:
                img = pil.open(io.BytesIO(c)).convert("L")
                ow, oh = (min(img.width, 224), min(img.height, 224))
                small = img.resize((feature_dim, 1))
                feats.append(
                    (np.asarray(small, dtype=np.float32).ravel() / 255.0).tolist()
                )
                ows.append(ow)
                ohs.append(oh)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "out_width": np.asarray(ows, dtype="int32"),
                    "out_height": np.asarray(ohs, dtype="int32"),
                }
            )

    return (
        media.filter(F.col("media_type") == "image")
        .select("media_id", "content", "width", "height")
        .mapInPandas(gen, IMAGE_FEATURES)
    )


def sample_frames(
    media: DataFrame, every_s: float = 1.0, max_frames: int = 16, strict: bool = False
) -> DataFrame:
    """Sample frames from videos at a fixed stride (STUBBED decode).

    UDTF-shaped (1 video row → N frame rows) — the same mapInPandas
    fan-out pattern as mention extraction.
    """

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError("video decoding not available in this container")
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_ts_s": [], "frame": []}
            for mid, content, dur in zip(
                pdf["media_id"], pdf["content"], pdf["duration_s"].fillna(0.0)
            ):
                n = min(max_frames, max(1, int(dur / every_s)))
                for i in range(n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_ts_s"].append(i * every_s)
                    out["frame"].append(
                        hashlib.sha256((content or b"") + i.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("media_type") == "video")
        .select("media_id", "content", "duration_s")
        .mapInPandas(gen, FRAME_SAMPLES)
    )


def fake_media_df(spark, n: int = 20, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        mt = ("image", "audio", "video")[i % 3]
        content = bytes(rng.getrandbits(8) for _ in range(64))
        rows.append(
            (
                i,
                mt,
                content,
                320 if mt in ("image", "video") else None,
                240 if mt in ("image", "video") else None,
                float(i % 10 + 1) if mt in ("audio", "video") else None,
                16000 if mt == "audio" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA)
