"""Vectorized batch hashing == the scalar per-char definitions.

The scalar reference implementations here ARE the spec (FNV-1a per
word; rolling shingle combine; simhash bit vote); the library computes
them batch-vectorized over Arrow buffers and must match bit-exactly.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from openmldb_ray.functions import hashing as H


def fnv_scalar(word: str) -> int:
    h = 0xCBF29CE484222325
    for b in word.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def word_hashes_scalar(text):
    return np.array([fnv_scalar(w) for w in (text or "").split()],
                    dtype=np.uint64)


def shingles_scalar(text, k=3):
    wh = word_hashes_scalar(text)
    if len(wh) < k:
        return wh if len(wh) else np.array([0], dtype=np.uint64)
    acc = wh[: len(wh) - k + 1].copy()
    for j in range(1, k):
        acc = acc * np.uint64(1_000_003) + wh[j: len(wh) - k + 1 + j]
    return acc


def simhash_scalar(text) -> int:
    wh = word_hashes_scalar(text)
    if len(wh) == 0:
        return 0
    shift = np.arange(64, dtype=np.uint64)
    bits = ((wh[:, None] >> shift[None, :]) & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    sig = np.uint64(0)
    for k in np.flatnonzero(votes > 0):
        sig |= np.uint64(1) << np.uint64(k)
    return int(sig)


TEXTS = ["hello world foo bar", "  pad  ", "", None, "one two", "a",
         "x " * 50, "unicode tëst wörds ünïcode",
         "tab\tsep\nlines mixed   spaces", "a b", "repeat repeat repeat"]


def test_word_hashes_match_scalar():
    wh, off = H.word_hashes_batch(TEXTS)
    for i, t in enumerate(TEXTS):
        assert np.array_equal(word_hashes_scalar(t), wh[off[i]:off[i + 1]])


@pytest.mark.parametrize("k", [1, 2, 3, 5])
def test_shingles_match_scalar(k):
    sh, off = H.shingle_hashes_batch(TEXTS, k)
    for i, t in enumerate(TEXTS):
        assert np.array_equal(shingles_scalar(t, k), sh[off[i]:off[i + 1]])


def test_simhash_matches_scalar():
    sg = H.simhash_batch(TEXTS)
    for i, t in enumerate(TEXTS):
        assert int(sg[i]) == simhash_scalar(t)


def test_fingerprint_order_sensitive_and_deterministic():
    fp = H.doc_fingerprints(["a b c", "c b a", "a b c", "", "a b c d"])
    fp2 = H.doc_fingerprints(["a b c"])
    assert fp[0] == fp[2] == fp2[0]
    assert fp[0] != fp[1]          # order matters
    assert fp[3] == 0              # empty doc
    assert fp[0] != fp[4]          # length matters


@given(st.lists(st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40),
    max_size=8))
@settings(max_examples=60, deadline=None)
def test_word_hashes_property(texts):
    wh, off = H.word_hashes_batch(texts)
    assert len(off) == len(texts) + 1
    for i, t in enumerate(texts):
        assert np.array_equal(word_hashes_scalar(t), wh[off[i]:off[i + 1]])
