"""Multimodal (image/audio/video) stages: opaque ``binary`` payload
columns + typed metadata, processed by actor-pool ``map_batches``.

The decode libraries (PIL / torchaudio / ffmpeg) are NOT in this
container, so the codec step is STUBBED: ``DeterministicFakeDecoder``
produces a seeded, content-derived fake so the Ray-side plumbing
(schema, batch sizing for large payloads, actor signature, output
layout) is real and tested; ``StrictDecoder`` raises
NotImplementedError to mark the integration point.

Scale notes baked in: binary payloads dominate bytes, so batch_size is
SMALL (default 64) and these stages should run on the un-shuffled read
path; metadata-only columns are projected out for any downstream
groupby.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from openmldb_ray.context import pool_concurrency

IMAGE_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("payload", pa.binary()),
    ("media_type", pa.string()),      # "image/jpeg" | "audio/wav" | ...
    ("width", pa.int32()),
    ("height", pa.int32()),
])


class StrictDecoder:
    """The real integration point. Raises until a codec lib is vendored."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "image/audio decode requires PIL/torchaudio — not available in "
            "this environment; use DeterministicFakeDecoder for plumbing "
            "tests")


class DeterministicFakeDecoder:
    """Content-derived fake 'decode': emits a fixed-size feature vector
    per payload (sha256-seeded), plus payload byte length — exactly the
    columns a real embed/resize stage would emit."""

    def __init__(self, payload_col: str = "payload", feat_dim: int = 16):
        self.payload_col = payload_col
        self.feat_dim = feat_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        feats = np.empty((len(payloads), self.feat_dim), dtype=np.float32)
        sizes = np.empty(len(payloads), dtype=np.int64)
        for i, p in enumerate(payloads):
            b = p or b""
            sizes[i] = len(b)
            digest = hashlib.sha256(b).digest()
            seed = int.from_bytes(digest[:8], "little")
            rng = np.random.default_rng(seed)
            feats[i] = rng.standard_normal(self.feat_dim)
        return (batch
                .append_column("payload_bytes", pa.array(sizes))
                .append_column("features", pa.array(
                    list(feats), type=pa.list_(pa.float32(), self.feat_dim))))


def decode_stage(ds: ray.data.Dataset, decoder_cls=DeterministicFakeDecoder,
                 batch_size: int = 64,
                 concurrency: int | None = None) -> ray.data.Dataset:
    """Attach decoded features. Small batches: payload bytes x
    batch_size x concurrency must fit the worker heap."""
    return ds.map_batches(decoder_cls, batch_format="pyarrow",
                          batch_size=batch_size,
                          concurrency=concurrency or pool_concurrency())


def frame_sample(ds: ray.data.Dataset, every_n: int = 10) -> ray.data.Dataset:
    """Deterministic 1-in-n sampling by media_id hash (video frame
    sampling analog) — no shuffle, no RNG state."""
    def pick(b: pa.Table) -> pa.Table:
        ids = b["media_id"].to_pylist()
        keep = np.array([
            int(hashlib.sha256((i or "").encode()).hexdigest()[:8], 16)
            % every_n == 0 for i in ids])
        return b.filter(pa.array(keep))
    return ds.map_batches(pick, batch_format="pyarrow")
