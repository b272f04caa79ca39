"""Deduplication at corpus scale: exact, MinHash+LSH, SimHash,
n-gram Jaccard verification.

Shapes (all shuffle-frugal):

- exact: vectorized content hash per batch -> hash-partition groupby ->
  keep first per group (deterministic tie-break by id).
- MinHash-LSH near-dup: shingle -> k minhashes per doc (one pass,
  vectorized) -> band rows (band_id, band_hash, doc_id) -> groupby
  bands -> candidate pairs -> exact n-gram Jaccard verify -> drop
  docs marked duplicate of a smaller id. Band explode multiplies rows
  by n_bands but each row is ~24 bytes — tiny next to the text we did
  NOT shuffle.
- SimHash: 64-bit signature; near-dup when Hamming distance <= t,
  bucketed by the 4-way table split (each 16-bit chunk) so candidates
  with distance<=3 collide in >=1 bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from openmldb_ray.context import pool_concurrency
from openmldb_ray.ops.text import Fingerprint

_M61 = np.uint64((1 << 61) - 1)


def _word_hashes(text: str) -> np.ndarray:
    """FNV-1a per whitespace token -> uint64 array."""
    out = np.empty(len((text or "").split()), dtype=np.uint64)
    for i, w in enumerate((text or "").split()):
        h = 0xCBF29CE484222325
        for b in w.encode("utf-8"):
            h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        out[i] = h
    return out


def _shingles(text: str, k: int = 3) -> np.ndarray:
    """k-word shingle hashes (rolling combine of word hashes)."""
    wh = _word_hashes(text)
    if len(wh) < k:
        return wh if len(wh) else np.array([0], dtype=np.uint64)
    acc = wh[: len(wh) - k + 1].copy()
    for j in range(1, k):
        acc = (acc * np.uint64(1_000_003) + wh[j: len(wh) - k + 1 + j])
    return acc


def dedup_exact(ds: ray.data.Dataset, text_col: str = "text",
                id_col: str = "doc_id",
                concurrency: int | None = None) -> ray.data.Dataset:
    """Keep, per identical text, the row with the smallest id.
    hash -> groupby(hash) -> min-id row (one shuffle of slim rows)."""
    hashed = ds.map_batches(Fingerprint, batch_format="pandas",
                            batch_size=4096,
                            fn_constructor_args=(text_col,),
                            concurrency=concurrency or pool_concurrency())

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col, kind="stable").head(1)
    first.__name__ = "keep_first"

    return hashed.groupby("fingerprint").map_groups(
        first, batch_format="pandas").drop_columns(["fingerprint"])


class MinHasher:
    """k permutation-free minhashes via k independent linear hashes
    over shingles (vectorized: k x n multiply-mod)."""

    def __init__(self, text_col: str, id_col: str, num_hashes: int,
                 num_bands: int, shingle_k: int):
        assert num_hashes % num_bands == 0
        rng = np.random.default_rng(42)
        self.a = rng.integers(1, int(_M61) - 1, size=num_hashes,
                              dtype=np.uint64)
        self.b = rng.integers(0, int(_M61) - 1, size=num_hashes,
                              dtype=np.uint64)
        self.text_col = text_col
        self.id_col = id_col
        self.num_bands = num_bands
        self.rows_per_band = num_hashes // num_bands
        self.shingle_k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.shingle_k).astype(np.uint64)
        # (k, n): (a*x + b) mod M61, min over shingles
        prod = (self.a[:, None] * sh[None, :] + self.b[:, None]) % _M61
        return prod.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        """Explode each doc into num_bands (band_id, band_hash, id) rows.
        Band hashing is vectorized: (docs, bands, rows_per_band) folded
        with a polynomial mix along the last axis."""
        r = self.rows_per_band
        sigs = np.stack([self.signature(t) for t in batch[self.text_col]])
        chunks = sigs.reshape(len(sigs), self.num_bands, r)
        h = np.full(chunks.shape[:2], 0xCBF29CE484222325, dtype=np.uint64)
        for j in range(r):
            h = ((h ^ chunks[:, :, j]) * np.uint64(0x100000001B3))
        ids = np.repeat(batch[self.id_col].to_numpy(), self.num_bands)
        bands = np.tile(np.arange(self.num_bands, dtype=np.int32),
                        len(sigs))
        return pd.DataFrame({"band_id": bands,
                             "band_hash": h.reshape(-1),
                             self.id_col: ids})


def _jaccard(a: np.ndarray, b: np.ndarray) -> float:
    sa, sb = set(a.tolist()), set(b.tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def minhash_duplicate_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 128,
    num_bands: int = 32,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.8,
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """Candidate generation + exact-Jaccard verification; returns rows
    (id_a, id_b, jaccard) with id_a < id_b, deduplicated.

    Verification re-reads the two texts from a broadcast id->text map
    when the corpus is small; at 100 TB the verify stage would instead
    join texts back by id (documented trade-off).
    """
    import ray

    bands = ds.map_batches(
        MinHasher, batch_format="pandas", batch_size=1024,
        fn_constructor_args=(text_col, id_col, num_hashes, num_bands,
                             shingle_k),
        concurrency=concurrency or pool_concurrency())

    # bucket the (band_id, band_hash) space so the shuffle has B
    # groups, not one python fn call per distinct band hash; pair
    # generation inside the bucket is a vectorized pandas groupby
    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(b[["band_id", "band_hash"]],
                                       index=False).to_numpy()
        b["__bkt__"] = (h % np.uint64(64)).astype(np.int32)
        return b

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, grp in g.groupby(["band_id", "band_hash"], sort=False):
            if len(grp) < 2:
                continue
            ids = sorted(grp[id_col].unique().tolist())
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        df = pd.DataFrame({"id_a": out_a, "id_b": out_b})
        return df.drop_duplicates()
    pairs.__name__ = "band_pairs"

    cand = bands.map_batches(add_bucket, batch_format="pandas") \
        .groupby("__bkt__").map_groups(pairs, batch_format="pandas")
    # distinct candidate pairs (different bands can emit the same pair)
    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=["id_a", "id_b"])
    dedup_pairs.__name__ = "dedup_pairs"
    cand = cand.map_batches(add_pair_bucket := (lambda b: b.assign(
        __pbkt__=(pd.util.hash_pandas_object(b[["id_a", "id_b"]],
                                             index=False).to_numpy()
                  % np.uint64(32)).astype(np.int32))),
        batch_format="pandas") \
        .groupby("__pbkt__").map_groups(dedup_pairs, batch_format="pandas") \
        .drop_columns(["__pbkt__"])

    texts = {}
    for tb in ds.select_columns([id_col, text_col]).iter_batches(
            batch_format="pyarrow", batch_size=1 << 16):
        texts.update(zip(tb[id_col].to_pylist(), tb[text_col].to_pylist()))
    ref = ray.put(texts)
    kk = shingle_k

    class Verify:
        def __init__(self):
            self.texts = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            jac = [
                _jaccard(_shingles(self.texts[a], kk),
                         _shingles(self.texts[c], kk))
                for a, c in zip(b["id_a"], b["id_b"])]
            b["jaccard"] = jac
            return b[b["jaccard"] >= jaccard_threshold]

    return cand.map_batches(Verify, batch_format="pandas", batch_size=4096,
                            concurrency=concurrency or pool_concurrency())


def dedup_minhash(ds: ray.data.Dataset, text_col: str = "text",
                  id_col: str = "doc_id", **kw) -> ray.data.Dataset:
    """Drop near-duplicate docs, keeping the smallest id of each pair
    cluster (greedy: any doc that is id_b of a confirmed pair drops)."""
    import ray

    pairs = minhash_duplicate_pairs(ds, text_col, id_col, **kw)
    drop = set()
    for r in pairs.iter_rows():
        drop.add(r["id_b"])
    ref = ray.put(drop)

    class Keep:
        def __init__(self):
            self.drop = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            return b[~b[id_col].isin(self.drop)]

    return ds.map_batches(Keep, batch_format="pandas", batch_size=4096,
                          concurrency=pool_concurrency())


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.5,
    band_sample: int = 8,
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """n-gram (word-shingle) Jaccard near-dup pairs WITHOUT minhash
    approximation in the verify step: candidates come from exact
    shingle-anchor collisions (each doc emits its ``band_sample``
    smallest shingle hashes — documents sharing any anchor are
    candidates; J >= t implies anchor collision with high probability),
    then exact Jaccard filters.

    Same output schema as minhash_duplicate_pairs."""
    import ray

    def anchors(b: pd.DataFrame) -> pd.DataFrame:
        ids, hs = [], []
        for i, t in zip(b[id_col], b[text_col]):
            sh = np.unique(_shingles(t, shingle_k))
            take = np.sort(sh)[:band_sample]
            ids.extend([i] * len(take))
            hs.extend(take.tolist())
        return pd.DataFrame({id_col: ids,
                             "anchor": np.array(hs, dtype=np.uint64)})

    anc = ds.map_batches(anchors, batch_format="pandas", batch_size=1024)

    def bucket(b: pd.DataFrame) -> pd.DataFrame:
        b["__bkt__"] = (b["anchor"].to_numpy() % np.uint64(64)) \
            .astype(np.int32)
        return b

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, grp in g.groupby("anchor", sort=False):
            ids = sorted(grp[id_col].unique().tolist())
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        return pd.DataFrame({"id_a": out_a,
                             "id_b": out_b}).drop_duplicates()
    pairs.__name__ = "anchor_pairs"

    # pairs() already projects to (id_a, id_b) — no __bkt__ survives
    cand = anc.map_batches(bucket, batch_format="pandas") \
        .groupby("__bkt__").map_groups(pairs, batch_format="pandas")

    texts = {}
    for tb in ds.select_columns([id_col, text_col]).iter_batches(
            batch_format="pyarrow", batch_size=1 << 16):
        texts.update(zip(tb[id_col].to_pylist(), tb[text_col].to_pylist()))
    ref = ray.put(texts)
    kk = shingle_k

    class Verify:
        def __init__(self):
            self.texts = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            if len(b) == 0:
                b["jaccard"] = []
                return b
            jac = [_jaccard(_shingles(self.texts[a], kk),
                            _shingles(self.texts[c], kk))
                   for a, c in zip(b["id_a"], b["id_b"])]
            b = b.copy()
            b["jaccard"] = jac
            return b[b["jaccard"] >= threshold].drop_duplicates(
                subset=["id_a", "id_b"])

    from openmldb_ray.context import pool_concurrency as _pc
    return cand.map_batches(Verify, batch_format="pandas", batch_size=4096,
                            concurrency=concurrency or _pc())


class SimHash:
    """64-bit SimHash over word hashes; near-dup = small Hamming
    distance. Emits signature + 4x16-bit sub-keys for bucketing."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def _sig(self, text: str) -> int:
        wh = _word_hashes(text)
        if len(wh) == 0:
            return 0
        bits = ((wh[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        sig = np.uint64(0)
        for k in np.flatnonzero(votes > 0):
            sig |= np.uint64(1) << np.uint64(k)
        return int(sig)

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        sigs = b[self.text_col].map(self._sig).astype("uint64")
        b["simhash"] = sigs
        for i in range(4):
            b[f"simhash_b{i}"] = ((sigs.values >> np.uint64(16 * i))
                                  & np.uint64(0xFFFF)).astype("int64")
        return b


def simhash_signatures(ds: ray.data.Dataset, text_col: str = "text",
                       concurrency: int | None = None) -> ray.data.Dataset:
    return ds.map_batches(SimHash, batch_format="pandas",
                          batch_size=4096, fn_constructor_args=(text_col,),
                          concurrency=concurrency or pool_concurrency())
