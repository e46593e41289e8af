"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side dataflow is real and tested — schemas, Arrow batch shapes,
partitioning, UDF signatures. The actual codec work (image decode, resample,
frame extraction) is STUBBED: the decode libs (PIL/ffmpeg/librosa) are not in
this container, so `decode_stub=True` (default) produces deterministic fake
features derived from the bytes, and `decode_stub=False` raises
NotImplementedError at the exact call site a real codec would plug into.

Schema conventions:
  media(file_id long, kind string, payload binary,
        meta struct<width int, height int, sample_rate int, duration_ms int>)
  features(file_id long, kind string, feature array<float>, feat_dim int)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "file_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int>"
)
FEATURE_SCHEMA = "file_id long, kind string, feature array<float>, feat_dim int"

FEAT_DIM = 32


def _fake_feature(payload: bytes, dim: int = FEAT_DIM) -> np.ndarray:
    """Deterministic stand-in for a real encoder: bytes -> unit vector.
    Same payload ⇒ same vector on any worker (sha256-seeded)."""
    seed = int.from_bytes(hashlib.sha256(payload or b"").digest()[:8], "little")
    rng = np.random.Generator(np.random.Philox(seed))
    v = rng.standard_normal(dim).astype(np.float32)
    return v / np.linalg.norm(v)


def extract_features(media: DataFrame, decode_stub: bool = True,
                     batch_size_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction; one Arrow batch per invocation.

    At scale: payloads stay executor-side (never collected); upstream should
    `repartition` by size buckets so batches have comparable byte volume
    (hot 4K-video partitions starve otherwise).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real codecs unavailable in this container: plug image/"
                    "audio decode here (PIL.Image.open / librosa.load / "
                    "ffmpeg frame sampling)"
                )
            feats = [ _fake_feature(p) for p in pdf["payload"] ]
            yield pd.DataFrame(
                {
                    "file_id": pdf["file_id"],
                    "kind": pdf["kind"],
                    "feature": [f.tolist() for f in feats],
                    "feat_dim": FEAT_DIM,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int,
                  decode_stub: bool = True) -> DataFrame:
    """Resize stub: passes payload through, rewrites meta dims (the real
    implementation decodes/resizes/re-encodes inside the same mapInPandas)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("plug PIL resize here")
            meta = [
                {"width": width, "height": height, "sample_rate": None,
                 "duration_ms": None}
                for _ in range(len(pdf))
            ]
            out = pdf.copy()
            out["meta"] = meta
            yield out

    return media.where(F.col("kind") == "image").mapInPandas(run, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  decode_stub: bool = True) -> DataFrame:
    """Frame sampling stub for video: emits one row per sampled frame with a
    deterministic pseudo-frame payload (sha-derived), real schema."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("plug ffmpeg frame extraction here")
            rows = []
            for r in pdf.itertuples():
                duration = (r.meta or {}).get("duration_ms") or 0
                n_frames = max(1, duration // every_ms)
                for i in range(int(n_frames)):
                    fake = hashlib.sha256(
                        (r.payload or b"") + i.to_bytes(4, "little")
                    ).digest()
                    rows.append((r.file_id, i * every_ms, fake))
            yield pd.DataFrame(rows, columns=["file_id", "ts_ms", "frame"])

    return media.where(F.col("kind") == "video").mapInPandas(
        run, "file_id long, ts_ms long, frame binary"
    )


def media_dedup_features(media: DataFrame) -> DataFrame:
    """Near-dup key for media: exact sha256 + stub-feature vector for
    embedding-cosine dedup (operators/similarity.py handles the rest)."""
    feats = extract_features(media)
    shas = media.select(
        "file_id", F.sha2(F.col("payload"), 256).alias("payload_sha")
    )
    return feats.join(shas, "file_id")
