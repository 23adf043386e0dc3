"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as Arrow ``binary`` columns with metadata columns
(media_type, width/height or sample_rate, etc.). The Ray-side plumbing —
schema, small batches for large payloads, actor-pool stage shape, output
layout — is real and tested; the codec kernels themselves are STUBBED (no
image/audio libraries in this container): ``decode`` raises
NotImplementedError unless ``deterministic_fake=True``, which produces a
seeded, content-derived fake (stable across runs/actors) so downstream
pipeline logic is exercisable end-to-end.

Scale notes: payload stages must bound batch bytes, not batch rows — pass
``batch_size`` small (e.g. 64) or rely on block splitting; features, not
payloads, flow to any shuffle.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),      # "image/png", "audio/wav", "video/mp4"
    ("payload", pa.binary()),
    ("meta_width", pa.int32()),       # images/video
    ("meta_height", pa.int32()),
    ("meta_sample_rate", pa.int32()), # audio
    ("meta_n_frames", pa.int32()),    # video
])


def _content_rng(payload: bytes) -> np.random.Generator:
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "big")
    return np.random.default_rng(seed)


class MediaDecoder:
    """Actor-pool stage: payload → fixed-size feature vector.

    Real deployments load the codec/model ONCE here (__init__); this container
    has no media libraries, so the decode kernel is stubbed (documented in the
    module docstring).
    """

    def __init__(self, feature_dim: int = 16, deterministic_fake: bool = False):
        self.feature_dim = feature_dim
        self.fake = deterministic_fake
        # real impl: self.codec = load_codec(); self.model = load_model()

    def _decode_one(self, media_type: str, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "media codecs are unavailable in this environment; "
                "construct MediaDecoder(deterministic_fake=True) for plumbing tests")
        rng = _content_rng(payload or b"")
        return rng.standard_normal(self.feature_dim)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        feats = [self._decode_one(t, p)
                 for t, p in zip(df["media_type"], df["payload"])]
        return pd.DataFrame({
            "media_id": df["media_id"].to_numpy(),
            "media_type": df["media_type"].to_numpy(),
            "feature": feats,
            "payload_bytes": df["payload"].map(lambda b: len(b or b"")).astype("int64"),
        })


def decode_features(media_ds, *, feature_dim: int = 16,
                    deterministic_fake: bool = False,
                    batch_size: int = 64, concurrency=(1, 4)):
    """payload → feature vectors. Small batch_size: batches are sized by
    payload bytes, not row count."""
    return media_ds.map_batches(
        MediaDecoder, batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency, num_cpus=0.5,
        fn_constructor_kwargs=dict(feature_dim=feature_dim,
                                   deterministic_fake=deterministic_fake))


def frame_sample(media_ds, *, every_n: int = 10, batch_size: int = 16):
    """Video frame sampling plumbing: one output row per sampled frame index.

    Frame extraction itself is part of the stubbed decode; the row-explosion
    layout (media_id, frame_idx) is the real, tested part."""
    def f(df: pd.DataFrame) -> pd.DataFrame:
        n = df["meta_n_frames"].fillna(0).astype("int64").to_numpy()
        counts = np.maximum(0, (n + every_n - 1) // every_n)
        owners = np.repeat(np.arange(len(df)), counts)
        offs = np.arange(counts.sum()) - np.repeat(
            np.concatenate(([0], np.cumsum(counts)[:-1])), counts)
        return pd.DataFrame({
            "media_id": df["media_id"].to_numpy()[owners],
            "frame_idx": (offs * every_n).astype("int64"),
        })
    return media_ds.map_batches(f, batch_format="pandas", batch_size=batch_size)


def synthesize_media(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media table for plumbing tests (no external data)."""
    rng = np.random.default_rng(seed)
    types = np.array(["image/png", "audio/wav", "video/mp4"])[
        rng.integers(0, 3, size=n)]
    payloads = [rng.integers(0, 256, size=int(rng.integers(128, 4096)),
                             dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table({
        "media_id": pa.array(np.arange(n), type=pa.int64()),
        "media_type": pa.array(types, type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "meta_width": pa.array(rng.integers(16, 512, n).astype(np.int32)),
        "meta_height": pa.array(rng.integers(16, 512, n).astype(np.int32)),
        "meta_sample_rate": pa.array(
            np.full(n, 16000, dtype=np.int32)),
        "meta_n_frames": pa.array(rng.integers(1, 100, n).astype(np.int32)),
    })
