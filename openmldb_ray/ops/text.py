"""Text-analysis stages for a training-data pipeline: token counting,
quality scoring, language ID, document fingerprinting.

All are actor-pool ``map_batches`` stages (regexes / tables compiled
once per actor in ``__init__``), vectorized with pandas string kernels
where possible.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from openmldb_ray.context import pool_concurrency

_STOP_EN = {
    "the", "and", "of", "a", "to", "in", "is", "it", "that", "for", "on",
    "with", "as", "was", "at", "by", "an", "be", "this", "are", "or",
}
_STOP_DE = {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"}
_STOP_FR = {"le", "la", "les", "et", "est", "un", "une", "pas", "pour", "que"}
_STOP_ES = {"el", "la", "los", "las", "y", "es", "un", "una", "no", "por"}


class TokenCount:
    """whitespace token count + a BPE-ish sub-word estimate
    (words + extra splits at case/digit/punct boundaries)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.bpe_re = re.compile(
            r"[A-Z][a-z]+|[a-z]+|[A-Z]+(?![a-z])|\d+|[^\sA-Za-z0-9]")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        batch["n_words"] = s.str.split().str.len().astype("int64")
        batch["n_bpe_tokens"] = s.map(
            lambda t: len(self.bpe_re.findall(t))).astype("int64")
        return batch


class QualityScore:
    """Heuristic document quality: length, mean word length,
    punctuation / digit / uppercase ratios, stopword ratio. The exact
    formulas are chosen to be reproducible in ANSI SQL for the oracle."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        n_chars = s.str.len().astype("int64")
        words = s.str.split()
        n_words = words.str.len().astype("int64")
        nw = n_words.replace(0, 1)
        batch["n_chars"] = n_chars
        batch["n_words"] = n_words
        batch["avg_word_len"] = (n_chars - (n_words - 1).clip(lower=0)) / nw
        nc = n_chars.replace(0, 1)
        batch["digit_ratio"] = s.str.count(r"\d") / nc
        batch["upper_ratio"] = s.str.count(r"[A-Z]") / nc
        batch["punct_ratio"] = s.str.count(r"[.,;:!?]") / nc
        batch["stop_ratio"] = _stopword_counts(s, _STOP_EN) / nw
        return batch


def _stopword_counts(s: pd.Series, table: set[str]) -> np.ndarray:
    """Whitespace-token stopword count per text, vectorized: one
    C-backed regex count over the lowercased text instead of a Python
    loop per word. Tokens are whitespace-delimited (a token with
    trailing punctuation does not match — same as ``w.lower() in
    table``)."""
    pat = r"(?:(?<=\s)|^)(?:" + "|".join(sorted(table)) + r")(?=\s|$)"
    return s.str.lower().str.count(pat).to_numpy()


class LangId:
    """Tiny stopword-vote language ID over {en,de,fr,es}; 'und'
    (undetermined) when no stopwords hit. A deterministic heuristic —
    a stand-in with the exact Ray plumbing a fasttext-style model stage
    would have (model load + regex compile once per actor); the vote is
    vectorized (one regex count per language per batch, argmax)."""

    LANGS = ("en", "de", "fr", "es")

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.text_col = text_col
        self.out_col = out_col
        self.tables = [_STOP_EN, _STOP_DE, _STOP_FR, _STOP_ES]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        counts = np.stack([_stopword_counts(s, t) for t in self.tables])
        best = counts.argmax(axis=0)  # first max wins = priority order
        pred = np.array(self.LANGS, dtype=object)[best]
        pred[counts.max(axis=0) == 0] = "und"
        batch[self.out_col] = pred
        return batch


class Fingerprint:
    """64-bit rolling-hash document fingerprint (polynomial fold of the
    per-word FNV hashes, ``functions.hashing.doc_fingerprints``) —
    stable across runs/processes/nodes; the key for exact dedup.
    Batch-vectorized (one Arrow split + numpy segment reduction per
    batch, no per-char Python). Accepts Arrow or pandas batches."""

    def __init__(self, text_col: str = "text", out_col: str = "fingerprint"):
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch):
        from openmldb_ray.functions.hashing import doc_fingerprints
        if isinstance(batch, pa.Table):
            fp = doc_fingerprints(batch[self.text_col])
            return batch.append_column(self.out_col, pa.array(fp))
        fp = doc_fingerprints(batch[self.text_col].tolist())
        batch[self.out_col] = fp
        return batch


class RepetitionScore:
    """Duplicate word-bigram fraction — the Gopher/RefinedWeb intra-
    document repetition quality rule: heavily repetitive documents
    (boilerplate, keyword stuffing, templated spam) show a high
    ``dup_bigram_ratio = 1 - distinct_bigrams / bigrams``.

    Fully vectorized over the batch: one Arrow whitespace split + flat
    FNV word hashes (functions.hashing), adjacent-pair bigram hashes
    masked at document boundaries, then a single lexsort counts
    distinct bigrams per document (no per-document Python). 64-bit
    bigram hashes stand in for the exact strings (collision odds at
    corpus scale ~2^-30 per batch; the DuckDB oracle compares exact
    values and agrees)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def _scores(self, texts):
        from openmldb_ray.functions.hashing import word_hashes_batch
        wh, doc_off = word_hashes_batch(texts)
        ndocs = len(doc_off) - 1
        counts = (doc_off[1:] - doc_off[:-1]).astype(np.int64)
        n_bi = np.maximum(counts - 1, 0)
        distinct = np.zeros(ndocs, dtype=np.int64)
        if len(wh) > 1:
            doc_of_word = np.repeat(np.arange(ndocs), counts)
            same_doc = doc_of_word[:-1] == doc_of_word[1:]
            with np.errstate(over="ignore"):
                bh = wh[:-1] * np.uint64(0x100000001B3) ^ wh[1:]
            bh = bh[same_doc]
            bdoc = doc_of_word[:-1][same_doc]
            if len(bh):
                order = np.lexsort((bh, bdoc))
                sb, sd = bh[order], bdoc[order]
                first = np.concatenate(
                    ([True], (sd[1:] != sd[:-1]) | (sb[1:] != sb[:-1])))
                distinct = np.bincount(sd[first], minlength=ndocs)
        ratio = np.where(n_bi > 0, 1.0 - distinct / np.maximum(n_bi, 1),
                         0.0)
        return n_bi, distinct.astype(np.int64), np.round(ratio, 6)

    def __call__(self, batch):
        if isinstance(batch, pa.Table):
            n_bi, distinct, ratio = self._scores(batch[self.text_col])
            batch = batch.append_column("n_bigrams", pa.array(n_bi))
            batch = batch.append_column("n_distinct_bigrams",
                                        pa.array(distinct))
            return batch.append_column("dup_bigram_ratio",
                                       pa.array(ratio))
        n_bi, distinct, ratio = self._scores(
            batch[self.text_col].tolist())
        batch["n_bigrams"] = n_bi
        batch["n_distinct_bigrams"] = distinct
        batch["dup_bigram_ratio"] = ratio
        return batch


def with_text_features(ds: ray.data.Dataset, stages, batch_size: int = 4096,
                       concurrency: int | None = None) -> ray.data.Dataset:
    """Chain text stages as one actor pool each."""
    c = concurrency or pool_concurrency()
    for cls in stages:
        ds = ds.map_batches(cls, batch_format="pandas",
                            batch_size=batch_size, concurrency=c)
    return ds
