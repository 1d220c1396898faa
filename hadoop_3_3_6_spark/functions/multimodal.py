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


def resize_stub(payload: bytes, width: int, height: int, fake: bool = False) -> bytes:
    """Image-resize stage placeholder (no PIL in this environment).
    ``fake=True`` returns a deterministic pseudo-thumbnail: digest-
    derived bytes of size width*height — preserving the contract
    (bytes in, smaller bytes out) for pipeline-shape tests."""
    if not fake:
        raise NotImplementedError("image resize requires PIL/opencv, not present in this environment")
    digest = hashlib.sha256(payload).digest()
    need = width * height
    return (digest * (need // len(digest) + 1))[:need]


def frame_sample_stub(payload: bytes, every_n: int = 10, fake: bool = False) -> list[bytes]:
    """Video frame-sampling placeholder (no ffmpeg here).  ``fake=True``
    treats the payload as a byte stream of 16-byte 'frames' and keeps
    every n-th — same output contract (list of frame blobs) as a real
    decoder."""
    if not fake:
        raise NotImplementedError("video decode requires ffmpeg, not present in this environment")
    frames = [payload[i : i + 16] for i in range(0, len(payload), 16)]
    return frames[::every_n]


def resize_images(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id", width: int = 8, height: int = 8, fake: bool = True
) -> DataFrame:
    """Distributed resize stage: mapInPandas over binary payloads →
    (id, thumbnail binary, n_bytes).  Arrow carries bytes both ways."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = pdf[payload_col].map(lambda b: resize_stub(bytes(b), width, height, fake=fake))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "thumbnail": thumbs, "n_bytes": thumbs.map(len).astype("int32")}
            )

    return df.mapInPandas(run, schema=f"{id_col} bigint, thumbnail binary, n_bytes int")


def sample_frames(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id", every_n: int = 10, fake: bool = True
) -> DataFrame:
    """Distributed frame sampling: one output row per kept frame
    (id, frame_idx, frame binary) — the explode-shaped mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                for j, fr in enumerate(frame_sample_stub(bytes(b), every_n, fake=fake)):
                    ids.append(i)
                    idxs.append(j)
                    frames.append(fr)
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(run, schema=f"{id_col} bigint, frame_idx int, frame binary")


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
