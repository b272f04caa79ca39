"""Vectorized text hashing: the batch-level replacement for per-char
Python loops on the hot text path (tokenize / fingerprint / shingle /
simhash all funnel through here).

Design: whitespace tokenization happens ONCE per batch in Arrow
(``utf8_split_whitespace``), then every per-word FNV-1a hash is
computed over the flat UTF-8 byte buffer with numpy gathers — one
vectorized pass per byte *position* (max word length, typically < 20)
instead of one Python iteration per byte. Downstream hashes
(fingerprint, shingles, simhash votes) are segment reductions over the
flat word-hash array (``np.add.reduceat`` / per-doc numpy slices).

Word hashes are bit-exact FNV-1a (same values the round-1 scalar loops
produced), so token ids are unchanged: token = fnv1a(word) % VOCAB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

FNV_OFF = np.uint64(0xCBF29CE484222325)
FNV_PRIME = np.uint64(0x100000001B3)
POLY_BASE = np.uint64(1_000_003)


def _flat_words(texts) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Split a batch of texts into words entirely in Arrow.

    Returns ``(byte_off, data, doc_off)``: word *i* is
    ``data[byte_off[i]:byte_off[i+1]]`` and doc *d* owns words
    ``doc_off[d]:doc_off[d+1]``. Matches Python ``str.split()``
    semantics (runs of whitespace, no empty tokens).
    """
    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array(list(texts), type=pa.string())
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    if pa.types.is_large_string(texts.type):
        texts = texts.cast(pa.string())
    words = pc.utf8_split_whitespace(texts)
    raw_doc_off = np.asarray(words.offsets, dtype=np.int64)

    flat = words.flatten()
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    lb = flat.cast(pa.large_binary())
    off = np.frombuffer(lb.buffers()[1], dtype=np.int64)
    off = off[lb.offset: lb.offset + len(lb) + 1]
    data = np.frombuffer(lb.buffers()[2], dtype=np.uint8) \
        if lb.buffers()[2] is not None else np.empty(0, dtype=np.uint8)

    # Arrow keeps empty tokens at text boundaries; str.split() does not.
    lens = off[1:] - off[:-1]
    keep = lens > 0
    ndocs = len(raw_doc_off) - 1
    doc_idx = np.repeat(np.arange(ndocs, dtype=np.int64),
                        raw_doc_off[1:] - raw_doc_off[:-1])
    counts = np.bincount(doc_idx[keep], minlength=ndocs)
    doc_off = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    if not keep.all():
        starts = off[:-1][keep]
        lens = lens[keep]
        byte_off = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
        # gather the kept words' bytes into a fresh contiguous buffer:
        # new position byte_off[w] + t reads data[starts[w] + t]
        if len(starts):
            idx = np.repeat(starts - byte_off[:-1], lens) \
                + np.arange(int(lens.sum()))
            data = data[idx]
        else:
            data = np.empty(0, dtype=np.uint8)
        off = byte_off
    return off, data, doc_off


def fnv1a_flat(byte_off: np.ndarray, data: np.ndarray) -> np.ndarray:
    """FNV-1a (64-bit, wraparound) of each word, vectorized: one pass
    per byte position across every word in the batch."""
    n = len(byte_off) - 1
    h = np.full(n, FNV_OFF, dtype=np.uint64)
    if n == 0:
        return h
    lens = byte_off[1:] - byte_off[:-1]
    starts = byte_off[:-1]
    maxlen = int(lens.max()) if n else 0
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            m = lens > j
            b = data[starts[m] + j].astype(np.uint64)
            h[m] = (h[m] ^ b) * FNV_PRIME
    return h


def word_hashes_batch(texts) -> tuple[np.ndarray, np.ndarray]:
    """Per-word FNV-1a hashes for a batch of texts.

    Returns ``(hashes, doc_off)``: doc *d*'s word hashes are
    ``hashes[doc_off[d]:doc_off[d+1]]``.
    """
    byte_off, data, doc_off = _flat_words(texts)
    return fnv1a_flat(byte_off, data), doc_off


def doc_fingerprints(texts) -> np.ndarray:
    """64-bit order-sensitive document fingerprint, one per text:
    polynomial fold (base ``POLY_BASE``, modulus 2**64 wraparound) of
    the word FNV hashes. Deterministic across processes/nodes;
    vectorized via a segment reduction over the flat word-hash array.
    """
    wh, doc_off = word_hashes_batch(texts)
    ndocs = len(doc_off) - 1
    out = np.zeros(ndocs, dtype=np.uint64)
    if len(wh) == 0:
        return out
    counts = doc_off[1:] - doc_off[:-1]
    maxw = int(counts.max())
    pows = np.empty(maxw, dtype=np.uint64)
    with np.errstate(over="ignore"):
        acc = np.uint64(1)
        for i in range(maxw):
            pows[i] = acc
            acc = acc * POLY_BASE
        # exponent of word at flat position p in doc d: doc_end - 1 - p
        ends = np.repeat(doc_off[1:], counts)
        exps = ends - 1 - np.arange(len(wh), dtype=np.int64)
        contrib = wh * pows[exps]
        nonempty = counts > 0
        sums = np.add.reduceat(contrib, doc_off[:-1][nonempty]) \
            if nonempty.any() else np.empty(0, dtype=np.uint64)
    out[nonempty] = sums
    return out


def shingle_hashes_batch(texts, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """k-word shingle hashes (rolling polynomial combine of word
    hashes) per doc. Docs with < k words contribute their word hashes
    as-is; empty docs contribute one 0 shingle (so every doc has >= 1
    shingle and Jaccard is defined).

    Returns ``(shingles, doc_off)`` in the flat layout of
    ``word_hashes_batch``.
    """
    wh, doc_off = word_hashes_batch(texts)
    counts = (doc_off[1:] - doc_off[:-1]).astype(np.int64)
    # per-doc shingle counts under the round-1 semantics
    out_counts = np.where(counts >= k, counts - k + 1,
                          np.maximum(counts, 1))
    out_off = np.concatenate(([0], np.cumsum(out_counts))).astype(np.int64)
    total = int(out_off[-1])
    out = np.zeros(total, dtype=np.uint64)

    # rolling combine over the whole flat array, then select only the
    # windows fully inside one doc; short/empty docs filled separately
    n = len(wh)
    with np.errstate(over="ignore"):
        if n >= k:
            acc = wh[: n - k + 1].copy()
            for j in range(1, k):
                acc = acc * POLY_BASE + wh[j: n - k + 1 + j]
        else:
            acc = np.empty(0, dtype=np.uint64)

    long_docs = counts >= k
    if long_docs.any():
        starts = doc_off[:-1][long_docs]
        m = out_counts[long_docs]
        # gather acc[starts[d] : starts[d] + m[d]] into out rows
        src = np.repeat(starts, m) + _ragged_arange(m)
        dst = np.repeat(out_off[:-1][long_docs], m) + _ragged_arange(m)
        out[dst] = acc[src]
    short = (~long_docs) & (counts > 0)
    if short.any():
        m = counts[short]
        src = np.repeat(doc_off[:-1][short], m) + _ragged_arange(m)
        dst = np.repeat(out_off[:-1][short], m) + _ragged_arange(m)
        out[dst] = wh[src]
    # empty docs already hold the single 0 shingle
    return out, out_off


def _ragged_arange(counts: np.ndarray) -> np.ndarray:
    """[0..c0), [0..c1), ... concatenated."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(counts)
    return np.arange(total, dtype=np.int64) - np.repeat(ends - counts, counts)


def simhash_batch(texts) -> np.ndarray:
    """64-bit SimHash per text: per-bit majority vote over the word
    FNV hashes, vectorized across the whole batch with a segment sum.
    """
    wh, doc_off = word_hashes_batch(texts)
    ndocs = len(doc_off) - 1
    out = np.zeros(ndocs, dtype=np.uint64)
    if len(wh) == 0:
        return out
    # bit j of each little-endian uint64 -> column j (C-fast unpack)
    bits = np.unpackbits(wh[:, None].view(np.uint8), axis=1,
                         bitorder="little")
    counts = doc_off[1:] - doc_off[:-1]
    nonempty = counts > 0
    if not nonempty.any():
        return out
    ones = np.add.reduceat(bits, doc_off[:-1][nonempty], axis=0,
                           dtype=np.int64)
    # majority vote: ones > zeros  <=>  2*ones > n_words
    maj = (2 * ones > counts[nonempty, None]).astype(np.uint8)
    sigs = np.packbits(maj, axis=1, bitorder="little") \
        .view(np.uint64).reshape(-1)
    out[nonempty] = sigs
    return out
