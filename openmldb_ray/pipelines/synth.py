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

    # 12-digit zero-pad: doc_id string order must equal numeric doc
    # order at the north-star 10^12-sequence scale. 8 digits overflowed
    # at >1e8 docs ("...-99840003" > "...-100102111" lexicographically),
    # which the blockwise layout verifier correctly refused at 128M —
    # fixed-width ids are the contract, as in any real corpus keyed by
    # sortable ids.
    doc_ids = [f"{s}-{int(x):012d}" for s, x in zip(sources, i)]
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
    """Generate once into ``path`` (skipped if complete); returns path.

    Blocks are chunk-combined before the write so each file holds ONE
    row group (the realistic layout for curated parquet): the 8192-row
    gen batches otherwise become 8k-row row groups, fragmenting every
    row-group-granular reader 4-20x.

    The token lists are written DELTA_BINARY_PACKED (184 B/doc vs
    1400 plain-snappy, measured — the affine sequences delta to
    near-constant runs), so a 128M-doc scaling corpus fits local
    disk. Compression stays snappy so the three non-token columns
    read identically to earlier corpora; readers that prune
    ``tokens`` (the flagship reads only doc_id/n_tok/source) never
    touch the encoded pages."""
    from openmldb_ray.state.checkpoint import checkpoint, is_complete
    if not is_complete(path):
        ds = synth_corpus(num_docs, num_sources, hot_frac).map_batches(
            lambda t: t.combine_chunks(), batch_format="pyarrow",
            batch_size=None, zero_copy_batch=True)
        checkpoint(ds, path,
                   use_dictionary=["doc_id", "source"],
                   column_encoding={
                       "tokens.list.element": "DELTA_BINARY_PACKED"})
    return path


# ---------------------------------------------------------------------------
# synthetic TEXT corpus (for the corpus-hygiene benches: paragraph
# dedup, decontamination). Docs are assembled from a shared pool of
# distinct paragraphs with a small "boilerplate" hot head that appears
# in ~20% of paragraph slots — the realistic shape for paragraph-level
# dedup (C4-style repeated spans). Row i is a pure function of i.
# ---------------------------------------------------------------------------

_TEXT_VOCAB = 8192
_POOL_SIZE = 200_000
_HOT_PARAS = 64


def _para_pool(pool_size: int = _POOL_SIZE) -> np.ndarray:
    """Deterministic pool of distinct paragraphs (12-32 words each),
    built once per worker process and cached."""
    cached = getattr(_para_pool, "_cache", None)
    if cached is not None and len(cached) == pool_size:
        return cached
    idx = np.arange(pool_size, dtype=np.uint64)
    h = _splitmix64(idx ^ np.uint64(0x5151DE57A11))
    nw = (12 + (h % np.uint64(21))).astype(np.int64)
    off = np.concatenate(([0], np.cumsum(nw)))
    wkey = _splitmix64(np.arange(off[-1], dtype=np.uint64)
                       ^ np.uint64(0xABCDEF)) % np.uint64(_TEXT_VOCAB)
    # Arrow-vectorized assembly: dictionary-decode word ids to a flat
    # string array, list-wrap per paragraph, binary_join in C++. A
    # leading "p<idx>" word makes paragraphs pairwise-distinct.
    import pyarrow.compute as pc
    word_dict = pa.array([f"w{j}" for j in range(_TEXT_VOCAB)])
    flat = pa.DictionaryArray.from_arrays(
        pa.array(wkey.astype(np.int32)), word_dict).cast(pa.string())
    lists = pa.ListArray.from_arrays(pa.array(off, pa.int32()), flat)
    body = pc.binary_join(lists, " ")
    prefix = pa.array([f"p{p}" for p in range(pool_size)])
    pool_str = pc.binary_join_element_wise(prefix, body, " ")
    pool = pool_str.to_numpy(zero_copy_only=False)
    _para_pool._cache = pool
    return pool


def gen_text_batch(batch: pa.Table, pool_size: int = _POOL_SIZE,
                   num_sources: int = 16) -> pa.Table:
    i = batch["id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    pool = _para_pool(pool_size)
    h = _splitmix64(i ^ np.uint64(0x7E47C0FFEE))
    k = (2 + (h % np.uint64(4))).astype(np.int64)          # 2..5 paras
    off = np.concatenate(([0], np.cumsum(k)))
    slot_doc = np.repeat(i, k)
    slot_j = np.arange(off[-1], dtype=np.uint64) - np.repeat(
        off[:-1].astype(np.uint64), k)
    hs = _splitmix64(slot_doc * np.uint64(8) + slot_j)
    hot = (hs % np.uint64(5)) == 0                          # ~20% slots
    pidx = np.where(hot, hs % np.uint64(_HOT_PARAS),
                    hs % np.uint64(pool_size)).astype(np.int64)
    paras = pool[pidx]
    texts = ["\n\n".join(paras[lo:hi])
             for lo, hi in zip(off[:-1], off[1:])]
    src = (h % np.uint64(num_sources)).astype(np.int64)
    return pa.table({
        # same fixed-width-at-10^12 contract as the token corpus
        "doc_id": pa.array([f"d{int(x):012d}" for x in i], pa.string()),
        "text": pa.array(texts, pa.string()),
        "source": pa.array([f"s{int(s):02d}" for s in src], pa.string()),
    })


def synth_text_corpus(num_docs: int,
                      override_num_blocks: int | None = None
                      ) -> ray.data.Dataset:
    ds = ray.data.range(num_docs, override_num_blocks=override_num_blocks)
    return ds.map_batches(gen_text_batch, batch_format="pyarrow",
                          batch_size=8192)


def synth_text_corpus_parquet(path: str, num_docs: int) -> str:
    """Generate once into ``path`` (skipped if complete); returns path."""
    from openmldb_ray.state.checkpoint import checkpoint, is_complete
    if not is_complete(path):
        checkpoint(synth_text_corpus(num_docs), path)
    return path


def eval_paragraph_texts(n_docs: int = 100, paras_per_doc: int = 4,
                         start: int = 1000) -> list[str]:
    """Deterministic 'benchmark eval set' built from pool paragraphs
    ``start..start+n_docs*paras_per_doc`` — guaranteed to overlap the
    corpus, so decontamination does real work."""
    pool = _para_pool()
    out = []
    for d in range(n_docs):
        lo = start + d * paras_per_doc
        out.append("\n\n".join(pool[lo:lo + paras_per_doc]))
    return out
