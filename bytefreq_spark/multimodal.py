"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The decode step itself is STUBBED (no codec libraries in this container —
``decode_image``/``decode_audio`` raise ``NotImplementedError`` unless the
deterministic fake is requested), but the Spark-side machinery is real and
tested: schema, Arrow batch shape through ``mapInPandas``, partition-size
control for large blobs, and typed metadata extraction.

Design for 100 TB of blobs: binary columns ride in the same parquet row
groups; ``spark.sql.files.maxPartitionBytes`` bounds task memory; the
``mapInPandas`` stage streams record batches (never materializes a partition)
and emits fixed-width feature vectors so downstream shuffles carry features,
not blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_DIM = 16


def decode_image(payload: bytes) -> np.ndarray:
    """Real decode requires an image codec — not available in this container."""
    raise NotImplementedError("image codecs not present; use fake_features")


def decode_audio(payload: bytes) -> np.ndarray:
    """Real decode requires an audio codec — not available in this container."""
    raise NotImplementedError("audio codecs not present; use fake_features")


def fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in feature extractor: sha256-seeded vector.
    Keeps the whole pipeline testable end-to-end without codecs."""
    digest = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4],
                        dtype=np.uint32)
    return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payloads + typed metadata)."""
    rng = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(rng.randint(64, 4096))
        rows.append((
            i, kind, bytearray(payload),
            {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
            int(rng.randint(16, 4096)) if kind != "audio" else None,
            int(rng.randint(16, 4096)) if kind != "audio" else None,
            int(rng.randint(100, 600000)) if kind != "image" else None,
        ))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """mapInPandas stage: binary payload → fixed-width feature vector.

    Emits (media_id, kind, n_bytes, feature array) — blobs are dropped before
    any shuffle, which is the load-bearing property at scale.
    """
    out_schema = f"media_id long, kind string, n_bytes long, features array<float>"

    # mapInPandas ships every input column to Python (Spark cannot see which
    # ones the function touches) — project to exactly the three it reads so
    # typed metadata (mime/width/height/duration) never crosses Arrow
    df = df.select("media_id", "kind", "payload")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_features(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                "features": [f.tolist() for f in feats],
            })

    return df.mapInPandas(gen, schema=out_schema)


def media_metadata_summary(df: DataFrame) -> DataFrame:
    """Typed-metadata rollup per kind (no blob movement)."""
    return (
        df.groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.avg("width").alias("avg_width"),
            F.avg("duration_ms").alias("avg_duration_ms"),
        )
        .orderBy("kind")
    )
