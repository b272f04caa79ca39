"""Similarity search over an embedding column (list<float>).

- ``knn_bruteforce``: exact cosine top-k — one numpy matmul per batch
  against a broadcast query matrix (``ray.put`` once, zero shuffle of
  the corpus), then a tiny global top-k reduce.
- ``knn_lsh``: the scale path — random-hyperplane LSH buckets; only
  rows whose bucket matches a query's bucket (or neighbors within 1
  bit) are scored. Trades recall for touching a fraction of the data.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from openmldb_ray.context import pool_concurrency


def _emb_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col].combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    n = len(arr)
    return flat.reshape(n, -1).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class _ScoreBatch:
    """Per-batch cosine scores against the broadcast queries; emits the
    local top-k per query (partial reduce — only k rows per query per
    batch leave the task)."""

    def __init__(self, qref, id_col: str, emb_col: str, k: int):
        q = ray.get(qref)
        self.qids = q["ids"]
        self.qm = q["matrix"]          # (Q, d), already normalized
        self.id_col = id_col
        self.emb_col = emb_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_emb_matrix(batch, self.emb_col))
        sims = self.qm @ m.T          # (Q, n)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        k = min(self.k, sims.shape[1])
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        out_q, out_id, out_sim = [], [], []
        for qi in range(sims.shape[0]):
            sel = part[qi]
            out_q.extend([self.qids[qi]] * len(sel))
            out_id.extend(ids[sel].tolist())
            out_sim.extend(sims[qi, sel].tolist())
        return pa.table({
            "query_id": pa.array(out_q),
            "vec_id": pa.array(out_id),
            "cosine_sim": pa.array(out_sim, type=pa.float64()),
        })


def knn_bruteforce(
    ds: ray.data.Dataset,
    queries: "np.ndarray | list[list[float]]",
    query_ids: list,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """Exact cosine top-k of every query against the corpus. Output:
    (query_id, vec_id, cosine_sim, rank) with rank 1..k, ties broken
    by vec_id ascending (deterministic)."""
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    qref = ray.put({"ids": list(query_ids), "matrix": qm})
    partial = ds.map_batches(
        _ScoreBatch, batch_format="pyarrow", batch_size=8192,
        fn_constructor_args=(qref, id_col, emb_col, k),
        concurrency=concurrency or pool_concurrency())

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine_sim", "vec_id"],
                          ascending=[False, True], kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g
    topk.__name__ = "global_topk"

    return partial.groupby("query_id").map_groups(topk, batch_format="pandas")


class _LshTag:
    def __init__(self, planes_ref, emb_col: str):
        self.planes = ray.get(planes_ref)  # (d, nbits)
        self.emb_col = emb_col

    def bucket(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.planes) > 0
        return (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_emb_matrix(batch, self.emb_col))
        return batch.append_column(
            "lsh_bucket", pa.array(self.bucket(m).astype(np.int64)))


def knn_lsh(
    ds: ray.data.Dataset,
    queries,
    query_ids: list,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    num_bits: int = 8,
    seed: int = 42,
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """LSH-bucketed approximate top-k: score only rows in each query's
    bucket or a bucket at Hamming distance 1 (recall/cost dial =
    num_bits). Same output schema as knn_bruteforce."""
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    d = qm.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((d, num_bits))
    pref = ray.put(planes)

    tagger = _LshTag(pref, emb_col)
    qb = tagger.bucket(qm)
    cand_buckets: set[int] = set()
    for b in qb:
        cand_buckets.add(int(b))
        for j in range(num_bits):
            cand_buckets.add(int(b) ^ (1 << j))
    keep = ray.put(cand_buckets)

    tagged = ds.map_batches(_LshTag, batch_format="pyarrow", batch_size=8192,
                            fn_constructor_args=(pref, emb_col),
                            concurrency=concurrency or pool_concurrency())

    class Filter:
        def __init__(self):
            self.keep = ray.get(keep)

        def __call__(self, b: pa.Table) -> pa.Table:
            bk = b["lsh_bucket"].to_numpy(zero_copy_only=False)
            mask = np.isin(bk, np.fromiter(self.keep, dtype=np.int64))
            return b.filter(pa.array(mask))

    pruned = tagged.map_batches(Filter, batch_format="pyarrow",
                                batch_size=8192,
                                concurrency=concurrency or pool_concurrency())
    return knn_bruteforce(pruned.drop_columns(["lsh_bucket"]), qm, query_ids,
                          k, id_col, emb_col, concurrency)
