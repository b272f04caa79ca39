"""Deterministic synthetic corpus generator (FIXTURES.md F1).

Row i is a pure function of i (splitmix64 counters) — independent of
batching, partitioning, process count or Ray version, so goldens and
benchmarks are reproducible anywhere. Distribution per FIXTURES F1:
``n_tok`` 80% uniform [16, 512] with a cubic tail to 8192; ``source``
skewed — ``src-0000`` holds ~30% of rows (exercises the salted
repartition path), the remaining sources ~uniform.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

VOCAB = 50257
_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK
    z = x
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
    return z ^ (z >> np.uint64(31))


def _u01(h: np.ndarray) -> np.ndarray:
    return h.astype(np.float64) / float(1 << 64)


def gen_batch(batch: pa.Table, num_sources: int = 64,
              hot_frac: float = 0.3) -> pa.Table:
    i = batch["id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    h1 = _splitmix64(i)
    h2 = _splitmix64(i ^ np.uint64(0xDEADBEEF12345678))
    h3 = _splitmix64(i ^ np.uint64(0x1234567890ABCDEF))

    # skewed source
    hot = _u01(h1) < hot_frac
    rest = 1 + (h2 % np.uint64(num_sources - 1)).astype(np.int64)
    src_id = np.where(hot, 0, rest)
    sources = np.char.add("src-", np.char.zfill(src_id.astype(str), 4))

    # n_tok: 80% uniform [16, 512], cubic tail to 8192
    u = _u01(h3)
    body = (16 + (_u01(_splitmix64(i + np.uint64(7))) * 496)).astype(np.int64)
    tail_u = _u01(_splitmix64(i + np.uint64(13)))
    tail = (512 + (tail_u ** 3) * (8192 - 512)).astype(np.int64)
    n_tok = np.where(u < 0.8, body, tail).astype(np.int32)

    doc_ids = [f"{s}-{int(x):08d}" for s, x in zip(sources, i)]
    # tokens: affine sequence per doc (deterministic, vectorized)
    offsets = np.concatenate(([0], np.cumsum(n_tok.astype(np.int64))))
    total = int(offsets[-1])
    flat = np.empty(total, dtype=np.int32)
    seeds = (h1 % np.uint64(VOCAB)).astype(np.int64)
    steps = (1 + (h2 % np.uint64(VOCAB - 1))).astype(np.int64)
    for j in range(len(i)):
        lo, hi = offsets[j], offsets[j + 1]
        flat[lo:hi] = ((seeds[j] + steps[j]
                        * np.arange(hi - lo, dtype=np.int64)) % VOCAB
                       ).astype(np.int32)
    tokens = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                      pa.array(flat, type=pa.int32()))
    return pa.table({
        "doc_id": pa.array(doc_ids, type=pa.string()),
        "tokens": tokens,
        "n_tok": pa.array(n_tok, type=pa.int32()),
        "source": pa.array(sources.tolist(), type=pa.string()),
    })


def synth_corpus(num_docs: int, num_sources: int = 64,
                 hot_frac: float = 0.3,
                 override_num_blocks: int | None = None) -> ray.data.Dataset:
    ds = ray.data.range(num_docs,
                        override_num_blocks=override_num_blocks)
    return ds.map_batches(
        lambda b: gen_batch(b, num_sources, hot_frac),
        batch_format="pyarrow", batch_size=8192)


def synth_corpus_parquet(path: str, num_docs: int, num_sources: int = 64,
                         hot_frac: float = 0.3) -> str:
    """Generate once into ``path`` (skipped if complete); returns path."""
    from openmldb_ray.state.checkpoint import checkpoint, is_complete
    if not is_complete(path):
        checkpoint(synth_corpus(num_docs, num_sources, hot_frac), path)
    return path
