"""Multimodal (opaque binary) column plumbing (north-star extension).

Treats image/audio/video payloads as ``binary`` columns with typed
metadata, processed through Arrow-batched ``mapInPandas`` — the real
Spark-side plumbing (schema, partitioning, batch shape) for a decode /
feature-extract stage.  The actual media decode is STUBBED (the
image/audio libraries are not in this environment): ``decode_stub``
raises NotImplementedError unless ``fake=True``, in which case it
produces a deterministic fake feature so the pipeline shape is
testable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame


def binary_metadata(df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """Extract (id, n_bytes, sha256-hex digest) from a binary column via
    mapInPandas.  Arrow carries the bytes to Python in batches; output
    schema is fixed and narrow so downstream stays columnar."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "digest": payloads.map(lambda b: hashlib.sha256(bytes(b)).hexdigest()),
                }
            )

    return df.mapInPandas(extract, schema=f"{id_col} bigint, n_bytes int, digest string")


def decode_stub(payload: bytes, modality: str = "image", fake: bool = False) -> dict:
    """Placeholder for a real media decoder (PIL/librosa/ffmpeg are not
    available here).  With ``fake=True`` returns a deterministic
    pseudo-feature derived from the payload digest, preserving the
    pipeline contract (dict of typed metadata) for tests."""
    if not fake:
        raise NotImplementedError(
            f"media decode for modality={modality!r} requires external libraries not present in this environment"
        )
    digest = hashlib.sha256(payload).digest()
    return {
        "width": 1 + digest[0],
        "height": 1 + digest[1],
        "channels": 3,
        "feature": [b / 255.0 for b in digest[:8]],
    }


def decode_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id", fake: bool = True
) -> DataFrame:
    """Decode/feature-extract stage over binary payloads: mapInPandas
    with an 8-dim feature vector output — the batch shape a real
    image embedder would use."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf[payload_col].map(lambda b: decode_stub(bytes(b), fake=fake))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": feats.map(lambda d: d["width"]).astype("int32"),
                    "height": feats.map(lambda d: d["height"]).astype("int32"),
                    "feature": feats.map(lambda d: d["feature"]),
                }
            )

    return df.mapInPandas(extract, schema=f"{id_col} bigint, width int, height int, feature array<double>")
