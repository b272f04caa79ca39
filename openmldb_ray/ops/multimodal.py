"""Multimodal (image/audio/video) stages: opaque ``binary`` payload
columns + typed metadata, processed by actor-pool ``map_batches``.

The heavy decode libraries (PIL / torchaudio / ffmpeg) are NOT in this
container, but container *metadata* needs no codec: ``HeaderDecoder``
parses PNG / JPEG / GIF / BMP headers (width, height) and RIFF/WAV
chunks (channels, sample rate, duration) directly from the payload
bytes with stdlib ``struct`` — the same work ffprobe's header pass
does. Pixel/sample decode remains the integration point:
``StrictDecoder`` raises NotImplementedError until a codec lib is
vendored; ``DeterministicFakeDecoder`` keeps the embed-stage plumbing
(schema, batch sizing, actor signature) testable.

Scale notes baked in: binary payloads dominate bytes, so batch_size is
SMALL (default 64) and these stages should run on the un-shuffled read
path; metadata-only columns are projected out for any downstream
groupby.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

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

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# SOF markers carrying frame dimensions (ITU T.81 B.2.2); C4/C8/CC are
# DHT/JPG/DAC, not frames.
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def parse_media_header(b: bytes) -> dict:
    """Parse container metadata from the first bytes of a payload.

    Returns a dict with keys media_type, width, height, channels,
    sample_rate, duration_ms (absent dimensions are None). Unknown or
    truncated payloads classify as 'application/octet-stream' rather
    than raising — at 100 TB a corrupt record must not kill the stage.
    """
    out = {"media_type": "application/octet-stream", "width": None,
           "height": None, "channels": None, "sample_rate": None,
           "duration_ms": None}
    if b is None:
        return out
    n = len(b)
    if n >= 24 and b[:8] == _PNG_SIG and b[12:16] == b"IHDR":
        out["media_type"] = "image/png"
        out["width"], out["height"] = struct.unpack(">II", b[16:24])
        return out
    if n >= 4 and b[:2] == b"\xff\xd8":
        # walk marker segments to the first SOFn frame header
        i = 2
        while i + 4 <= n:
            if b[i] != 0xFF:
                break
            # fill bytes: any number of 0xFF may pad before a marker
            while i < n and b[i] == 0xFF:
                i += 1
            if i >= n:
                break
            marker = b[i]
            i += 1
            if marker == 0x01 or 0xD0 <= marker <= 0xD9:
                continue  # standalone markers, no length field
            if i + 2 > n:
                break
            seglen = struct.unpack(">H", b[i:i + 2])[0]
            if marker in _JPEG_SOF and i + 7 <= n:
                out["media_type"] = "image/jpeg"
                out["height"], out["width"] = struct.unpack(
                    ">HH", b[i + 3:i + 7])
                return out
            i += seglen
        out["media_type"] = "image/jpeg"  # SOI present, no frame found
        return out
    if n >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        out["media_type"] = "image/gif"
        out["width"], out["height"] = struct.unpack("<HH", b[6:10])
        return out
    if n >= 26 and b[:2] == b"BM":
        out["media_type"] = "image/bmp"
        w, h = struct.unpack("<ii", b[18:26])
        out["width"], out["height"] = w, abs(h)  # negative h = top-down
        return out
    if n >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        out["media_type"] = "audio/wav"
        i, data_size, rate, channels, bits = 12, None, None, None, None
        while i + 8 <= n:
            cid = b[i:i + 4]
            csize = struct.unpack("<I", b[i + 4:i + 8])[0]
            if cid == b"fmt " and i + 24 <= n:
                channels, rate = struct.unpack("<HI", b[i + 10:i + 16])
                bits = struct.unpack("<H", b[i + 22:i + 24])[0]
            elif cid == b"data":
                data_size = csize
            i += 8 + csize + (csize & 1)  # chunks are word-aligned
        out["channels"] = channels
        out["sample_rate"] = rate
        if data_size is not None and rate and channels and bits:
            out["duration_ms"] = (
                data_size * 8000.0 / (rate * channels * bits))
        return out
    return out


class HeaderDecoder:
    """Actor-pool stage: container metadata from payload bytes (no
    codec lib). Per-row parse is bounded header work, not pixel work."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        metas = [parse_media_header(p) for p in payloads]
        sizes = [len(p) if p is not None else 0 for p in payloads]
        return (batch
                .append_column("media_type", pa.array(
                    [m["media_type"] for m in metas], pa.string()))
                .append_column("width", pa.array(
                    [m["width"] for m in metas], pa.int32()))
                .append_column("height", pa.array(
                    [m["height"] for m in metas], pa.int32()))
                .append_column("channels", pa.array(
                    [m["channels"] for m in metas], pa.int32()))
                .append_column("sample_rate", pa.array(
                    [m["sample_rate"] for m in metas], pa.int32()))
                .append_column("duration_ms", pa.array(
                    [m["duration_ms"] for m in metas], pa.float64()))
                .append_column("payload_bytes", pa.array(
                    sizes, pa.int64())))


# ------------------------------------------------------------------
# Deterministic synthetic payloads (test/bench fixture — REAL file
# bytes, built by an independent code path from the parser above).


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def synth_png(width: int, height: int) -> bytes:
    """A fully valid 8-bit grayscale PNG of zeros. zlib level 0
    (stored blocks) keeps the byte size a closed-form function of the
    dimensions: total = height*(width+1) + 68 while raw <= 65535."""
    raw = b"".join(b"\x00" * (width + 1) for _ in range(height))
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw, 0))
            + _png_chunk(b"IEND", b""))


def synth_wav(n_samples: int, sample_rate: int, channels: int) -> bytes:
    """Valid 16-bit PCM RIFF/WAVE of silence. total = 44 + 2*n*ch."""
    data = b"\x00" * (2 * n_samples * channels)
    byte_rate = sample_rate * channels * 2
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels,
                                    sample_rate, byte_rate,
                                    channels * 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data)


def synth_jpeg(width: int, height: int) -> bytes:
    """JPEG SOI + JFIF APP0 + SOF0 + EOI — header-complete (no scan
    data; a header kernel needs no huffman tables). total = 35."""
    app0 = struct.pack(">H", 16) + b"JFIF\x00" + bytes(
        [1, 1, 0, 0, 1, 0, 1, 0, 0])
    sof0 = struct.pack(">HBHHB", 11, 8, height, width, 1) + bytes(
        [1, 0x11, 0])
    return (b"\xff\xd8" + b"\xff\xe0" + app0 + b"\xff\xc0" + sof0
            + b"\xff\xd9")


def synth_payload(doc_id: int) -> bytes:
    """Deterministic mixed-modality payload keyed by doc_id. The
    metadata formulas are mirrored arithmetically by the SQL oracle in
    __ray_entry__ (and by tests) — synth and parse are independent
    code paths, so an error in either breaks the match."""
    m = doc_id % 3
    if m == 0:
        return synth_png(doc_id % 61 + 1, doc_id % 37 + 1)
    if m == 1:
        return synth_wav(doc_id % 500 + 1, 8000 * (doc_id % 4 + 1),
                         doc_id % 2 + 1)
    return synth_jpeg(doc_id % 127 + 1, doc_id % 83 + 1)


class SynthMedia:
    """map_batches stage attaching the deterministic payload column."""

    def __init__(self, id_col: str = "doc_id"):
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        return batch.append_column(
            "payload", pa.array([synth_payload(int(i)) for i in ids],
                                pa.binary()))


class StrictDecoder:
    """The pixel/sample decode integration point. Raises until a codec
    lib is vendored (header metadata needs none — see HeaderDecoder)."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "pixel/sample decode requires PIL/torchaudio — not available "
            "in this environment; HeaderDecoder covers container "
            "metadata, DeterministicFakeDecoder covers embed plumbing")


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


def decode_stage(ds: ray.data.Dataset, decoder_cls=HeaderDecoder,
                 batch_size: int = 64,
                 concurrency: int | None = None) -> ray.data.Dataset:
    """Attach decoded metadata/features. Small batches: payload bytes x
    batch_size x concurrency must fit the worker heap."""
    return ds.map_batches(decoder_cls, batch_format="pyarrow",
                          batch_size=batch_size,
                          concurrency=concurrency or pool_concurrency())


def frame_sample(ds: ray.data.Dataset, every_n: int = 10) -> ray.data.Dataset:
    """Deterministic 1-in-n sampling by media_id hash (video frame
    sampling analog) — no shuffle, no RNG state, stable across block
    layouts (content-keyed; vectorized FNV+splitmix)."""
    import pyarrow.compute as pc

    def pick(b: pa.Table) -> pa.Table:
        from openmldb_ray.functions.sketches import hash_column
        ids = pc.fill_null(pc.cast(b["media_id"], pa.string()), "")
        keep = hash_column(ids) % np.uint64(every_n) == 0
        return b.filter(pa.array(keep))
    return ds.map_batches(pick, batch_format="pyarrow")
