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
        batch["stop_ratio"] = words.map(
            lambda ws: sum(1 for w in ws if w.lower() in _STOP_EN)
        ) / nw
        return batch


class LangId:
    """Tiny stopword-vote language ID over {en,de,fr,es}; 'und'
    (undetermined) when no stopwords hit. A deterministic n-gram
    heuristic — a stand-in with the exact Ray plumbing a fasttext-style
    model stage would have (model load once per actor)."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.text_col = text_col
        self.out_col = out_col
        self.tables = [("en", _STOP_EN), ("de", _STOP_DE),
                       ("fr", _STOP_FR), ("es", _STOP_ES)]

    def _vote(self, text: str) -> str:
        ws = [w.lower() for w in (text or "").split()]
        best, best_n = "und", 0
        for lang, table in self.tables:
            n = sum(1 for w in ws if w in table)
            if n > best_n:
                best, best_n = lang, n
        return best

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch[self.out_col] = batch[self.text_col].map(self._vote)
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


def with_text_features(ds: ray.data.Dataset, stages, batch_size: int = 4096,
                       concurrency: int | None = None) -> ray.data.Dataset:
    """Chain text stages as one actor pool each."""
    c = concurrency or pool_concurrency()
    for cls in stages:
        ds = ds.map_batches(cls, batch_format="pandas",
                            batch_size=batch_size, concurrency=c)
    return ds
