"""Similarity search over an embedding column (list<float>).

- ``knn_bruteforce``: exact cosine top-k — one numpy matmul per batch
  against a broadcast query matrix (``ray.put`` once, zero shuffle of
  the corpus), then a tiny global top-k reduce.
- ``knn_lsh``: the scale path — random-hyperplane LSH buckets; only
  rows whose bucket matches a query's bucket (or neighbors within 1
  bit) are scored. Trades recall for touching a fraction of the data.
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa
import ray
import ray.data



def _emb_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col].combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    n = len(arr)
    return flat.reshape(n, -1).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _score_batch(batch: pa.Table, qids, qm: np.ndarray, id_col: str,
                 emb_col: str, k: int) -> pa.Table:
    """Per-batch cosine scores against the broadcast queries; emits the
    local top-k per query (partial reduce — only k rows per query per
    batch leave the task)."""
    m = _normalize(_emb_matrix(batch, emb_col))
    sims = qm @ m.T          # (Q, n)
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    k = min(k, sims.shape[1])
    part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
    nq = sims.shape[0]
    sel = part.reshape(-1)
    out_q = np.repeat(np.asarray(qids), k)
    return pa.table({
        "query_id": pa.array(out_q),
        "vec_id": pa.array(ids[sel]),
        "cosine_sim": pa.array(np.take_along_axis(sims, part, axis=1)
                               .reshape(-1), type=pa.float64()),
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

    # stateless tasks (elastic; no actor-pool ramp) — the query matrix
    # is ray.put once and fetched zero-copy per task
    def score(batch: pa.Table) -> pa.Table:
        q = ray.get(qref)
        return _score_batch(batch, q["ids"], q["matrix"], id_col,
                            emb_col, k)

    partial = ds.map_batches(score, batch_format="pyarrow",
                             batch_size=8192)

    # tree reduce instead of a groupby shuffle: each partial block holds
    # <= nq*k rows, so a combine at ~cpus partitions then one final
    # block is cheaper than hashing 16 query ids across 64 partitions
    # (and never creates empty shuffle partitions)
    def batch_topk(final: bool):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                out = t
                if final and "rank" not in t.column_names:
                    out = out.append_column(
                        "rank", pa.array([], type=pa.int64()))
                return out
            qid = t["query_id"].to_numpy(zero_copy_only=False)
            sim = t["cosine_sim"].to_numpy(zero_copy_only=False)
            vid = t["vec_id"].to_numpy(zero_copy_only=False)
            order = np.lexsort((vid, -sim, qid))
            qs = qid[order]
            starts = np.flatnonzero(
                np.concatenate(([True], qs[1:] != qs[:-1])))
            lens = np.diff(np.concatenate((starts, [len(qs)])))
            rank = np.arange(len(qs)) - np.repeat(starts, lens)
            keep = rank < k
            out = t.take(pa.array(order[keep]))
            if final:
                out = out.append_column(
                    "rank", pa.array(rank[keep] + 1, type=pa.int64()))
            return out
        fn.__name__ = "final_topk" if final else "combine_topk"
        return fn

    from openmldb_ray.context import cluster_cpus
    combined = partial.repartition(max(2, cluster_cpus() // 4)) \
        .map_batches(batch_topk(False), batch_format="pyarrow",
                     batch_size=None, zero_copy_batch=True)
    return combined.repartition(1) \
        .map_batches(batch_topk(True), batch_format="pyarrow",
                     batch_size=None, zero_copy_batch=True)


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


def _kmeans_lite(sample: np.ndarray, k: int, iters: int = 8,
                 seed: int = 42) -> np.ndarray:
    """Tiny driver-side Lloyd's on a sample -> (k, d) centroids
    (deterministic; k-means++-ish seeding by farthest-point)."""
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=1)]
    while len(cent) < k:
        d2 = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(-1).min(1)
        cent = np.vstack([cent, sample[int(np.argmax(d2))]])
    for _ in range(iters):
        d2 = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        lab = d2.argmin(1)
        for c in range(k):
            pts = sample[lab == c]
            if len(pts):
                cent[c] = pts.mean(0)
    return cent


def kmeans_distributed(
    ds: ray.data.Dataset,
    k: int,
    emb_col: str = "embedding",
    iters: int = 8,
    sample_rows: int = 10_000,
    seed: int = 42,
) -> np.ndarray:
    """Distributed Lloyd's k-means over an embedding column: seeds from
    a bounded driver sample (farthest-point), then each iteration is
    one ``map_batches`` pass emitting per-cluster PARTIAL (sum, count)
    rows — the driver reduces k x (d+1) floats per block, never the
    vectors. O(iters) passes, zero shuffle; the centroids converge on
    the FULL corpus rather than the sample (the scale path when the
    sample misrepresents the distribution). Returns L2-normalized
    (k, d) centroids, deterministic for a fixed seed."""
    samp = ds.limit(sample_rows)
    m = []
    for b in samp.iter_batches(batch_format="pyarrow", batch_size=4096):
        m.append(_normalize(_emb_matrix(b, emb_col)))
    cent = _normalize(_kmeans_lite(np.vstack(m), k, iters=2, seed=seed))

    for _ in range(iters):
        cref = ray.put(cent)

        def partial(b: pa.Table) -> pa.Table:
            c = ray.get(cref)
            mm = _normalize(_emb_matrix(b, emb_col))
            lab = (mm @ c.T).argmax(1)
            sums = np.zeros_like(c)
            np.add.at(sums, lab, mm)
            cnt = np.bincount(lab, minlength=len(c)).astype(np.float64)
            return pa.table({
                "cluster": pa.array(np.arange(len(c), dtype=np.int64)),
                "cnt": pa.array(cnt),
                "vsum": pa.array(list(sums),
                                 type=pa.list_(pa.float64(), c.shape[1])),
            })
        partial.__name__ = "kmeans_partial"
        parts = ds.map_batches(partial, batch_format="pyarrow",
                               batch_size=8192)
        sums = np.zeros_like(cent)
        cnts = np.zeros(len(cent))
        for b in parts.iter_batches(batch_format="pyarrow",
                                    batch_size=4096):
            cl = b["cluster"].to_numpy(zero_copy_only=False)
            cn = b["cnt"].to_numpy(zero_copy_only=False)
            vs = np.asarray(b["vsum"].combine_chunks()
                            .flatten().to_numpy(zero_copy_only=False)
                            ).reshape(len(cl), -1)
            np.add.at(sums, cl, vs)
            np.add.at(cnts, cl, cn)
        nz = cnts > 0
        new = cent.copy()
        new[nz] = sums[nz] / cnts[nz, None]
        new = _normalize(new)
        if np.allclose(new, cent, atol=1e-9):
            cent = new
            break
        cent = new
    return cent


def knn_ivf(
    ds: ray.data.Dataset,
    queries,
    query_ids: list,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    num_clusters: int = 16,
    nprobe: int = 4,
    sample_rows: int = 10_000,
    seed: int = 42,
    concurrency: int | None = None,
    train: str = "sample",
) -> ray.data.Dataset:
    """IVF approximate top-k: coarse k-means centroids, rows assigned
    to their nearest centroid per batch, and each query scores only
    rows in its ``nprobe`` nearest clusters. The scale path when LSH
    recall is insufficient: recall/cost dial = nprobe/num_clusters.
    ``train="sample"`` fits on a bounded driver sample (fast, fine for
    well-mixed corpora); ``train="distributed"`` runs full-corpus
    Lloyd iterations via ``kmeans_distributed`` (one map pass per
    iteration, partial-sum reduce — no vector ever leaves its block).
    Same output schema as knn_bruteforce."""
    if train == "distributed":
        cent = kmeans_distributed(ds, num_clusters, emb_col,
                                  sample_rows=sample_rows, seed=seed)
    else:
        samp = ds.limit(sample_rows)
        m = []
        for b in samp.iter_batches(batch_format="pyarrow",
                                   batch_size=4096):
            m.append(_normalize(_emb_matrix(b, emb_col)))
        cent = _normalize(_kmeans_lite(np.vstack(m), num_clusters,
                                       seed=seed))
    cref = ray.put(cent)

    qm = _normalize(np.asarray(queries, dtype=np.float64))
    q_clusters = np.argsort(-(qm @ cent.T), axis=1)[:, :nprobe]
    probe = ray.put(set(np.unique(q_clusters).tolist()))

    def assign_and_filter(b: pa.Table) -> pa.Table:
        c = ray.get(cref)
        mm = _normalize(_emb_matrix(b, emb_col))
        lab = (mm @ c.T).argmax(1)
        keep = np.isin(lab, np.fromiter(ray.get(probe), dtype=np.int64))
        return b.filter(pa.array(keep)).append_column(
            "__ivf__", pa.array(lab[keep].astype(np.int64)))

    pruned = ds.map_batches(assign_and_filter, batch_format="pyarrow",
                            batch_size=8192)
    # note: scoring still checks ALL probed rows per query (cluster
    # membership prunes the corpus; per-query cluster routing would
    # prune further at the cost of Q x cluster bookkeeping)
    return knn_bruteforce(pruned.drop_columns(["__ivf__"]), qm, query_ids,
                          k, id_col, emb_col, concurrency)


def build_ivf_index(
    ds: ray.data.Dataset,
    index_dir: str,
    num_clusters: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    sample_rows: int = 10_000,
    seed: int = 42,
    train: str = "sample",
    force: bool = False,
) -> str:
    """PERSISTED IVF index — the ANN analog of the pre-agg table
    (window/preagg): train the coarse quantizer once, assign every row
    once, and write the corpus as cluster-partitioned parquet so every
    later query batch prunes AT THE READ (only ``nprobe`` partition
    directories are opened; no re-assignment pass). Layout under
    ``index_dir``:

      centroids.parquet           (cluster:int64, centroid:list<double>)
      assigned/ivf_cluster=<c>/   row partitions (id, embedding)
      _SUCCESS                    build manifest (resume marker)

    Rebuilds are skipped when ``_SUCCESS`` exists (state.checkpoint
    semantics); ``force=True`` rebuilds. Reference parity: OpenMLDB's
    pre-aggregated long-window tables trade one build pass for
    request-time scans (src/storage/aggregator.h); same trade here."""
    import json
    import os
    import shutil
    import time

    from openmldb_ray.state.checkpoint import is_complete
    if is_complete(index_dir) and not force:
        return index_dir
    t0 = time.time()
    if train == "distributed":
        cent = kmeans_distributed(ds, num_clusters, emb_col,
                                  sample_rows=sample_rows, seed=seed)
    else:
        samp = ds.limit(sample_rows)
        m = []
        for b in samp.iter_batches(batch_format="pyarrow",
                                   batch_size=4096):
            m.append(_normalize(_emb_matrix(b, emb_col)))
        cent = _normalize(_kmeans_lite(np.vstack(m), num_clusters,
                                       seed=seed))
    cref = ray.put(cent)

    def assign(b: pa.Table) -> pa.Table:
        c = ray.get(cref)
        mm = _normalize(_emb_matrix(b, emb_col))
        lab = (mm @ c.T).argmax(1)
        return b.append_column("ivf_cluster",
                               pa.array(lab.astype(np.int64)))
    assign.__name__ = "ivf_assign"

    tmp = index_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    assigned = ds.map_batches(assign, batch_format="pyarrow",
                              batch_size=8192)
    # consolidate per cluster before the partitioned write: without
    # this every (block x cluster) pair becomes its own tiny file
    # (measured ~1000 files for 32 blocks x 32 clusters) and query
    # reads pay per-file overhead instead of pruning. One shuffle at
    # build time is the index-build trade.
    def ident(g: pa.Table) -> pa.Table:
        return g
    ident.__name__ = "cluster_consolidate"
    assigned = assigned.groupby("ivf_cluster").map_groups(
        ident, batch_format="pyarrow")
    assigned.write_parquet(os.path.join(tmp, "assigned"),
                           partition_cols=["ivf_cluster"])
    import pyarrow.parquet as pq
    pq.write_table(
        pa.table({"cluster": pa.array(np.arange(len(cent)),
                                      type=pa.int64()),
                  "centroid": pa.array(list(cent),
                                       type=pa.list_(pa.float64()))}),
        os.path.join(tmp, "centroids.parquet"))
    with open(os.path.join(tmp, "_SUCCESS"), "w") as fh:
        fh.write(json.dumps({
            "num_clusters": int(len(cent)), "train": train,
            "seed": seed, "emb_col": emb_col, "id_col": id_col,
            "wall_s": round(time.time() - t0, 3)}))
    shutil.rmtree(index_dir, ignore_errors=True)
    os.rename(tmp, index_dir)
    return index_dir


def knn_ivf_indexed(
    index_dir: str,
    queries,
    query_ids: list,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    nprobe: int = 4,
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """IVF top-k served from a ``build_ivf_index`` directory: route
    each query to its ``nprobe`` nearest centroids and read ONLY those
    cluster partitions — repeated query batches never re-scan or
    re-assign the corpus. Bit-equal to ``knn_ivf`` with the same
    centroids (pytest-covered)."""
    import os

    import pyarrow.parquet as pq
    ct = pq.read_table(os.path.join(index_dir, "centroids.parquet"))
    cent = np.asarray(ct["centroid"].combine_chunks().flatten()
                      .to_numpy(zero_copy_only=False)) \
        .reshape(ct.num_rows, -1)
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    q_clusters = np.argsort(-(qm @ cent.T), axis=1)[:, :nprobe]
    probe = sorted(set(np.unique(q_clusters).tolist()))
    paths = [os.path.join(index_dir, "assigned", f"ivf_cluster={c}")
             for c in probe]
    paths = [p for p in paths if os.path.isdir(p)]
    if not paths:
        empty = pa.table({"query_id": pa.array([], pa.string()),
                          "vec_id": pa.array([], pa.int64()),
                          "cosine_sim": pa.array([], pa.float64()),
                          "rank": pa.array([], pa.int64())})
        return ray.data.from_arrow(empty)
    pruned = ray.data.read_parquet(paths, columns=[id_col, emb_col],
                                   file_extensions=["parquet"])
    return knn_bruteforce(pruned, qm, query_ids, k, id_col, emb_col,
                          concurrency)


def embedding_dup_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    num_bits: int | None = None,
    seed: int = 42,
    target_bucket_rows: int = 10_000,
) -> ray.data.Dataset:
    """Embedding-cosine near-duplicate pairs: random-hyperplane LSH
    bucketing, exact pairwise cosine within each bucket, keep pairs
    with sim >= threshold (id_a < id_b). High-cosine pairs collide in
    the same bucket with probability (1 - theta/pi)^num_bits —
    ``num_bits`` trades recall for bucket size.

    ``num_bits=None`` (default) AUTO-SCALES with the corpus:
    ceil(log2(n / target_bucket_rows)), so the expected bucket stays
    ~``target_bucket_rows`` no matter the corpus size — at 100x the
    data the caller doesn't need to know LSH exists (the O(rows^2)
    bucket kernel stays bounded). ``num_bits=0`` forces one bucket —
    exact all-pairs (small corpora / oracles only). Recall vs the
    exact mode is pytest-covered (tests/test_ann.py)."""
    if num_bits is None:
        n = ds.count()
        num_bits = max(0, int(np.ceil(np.log2(
            max(n, 1) / target_bucket_rows))))
    first = ds.take(1)
    d = len(first[0][emb_col])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((d, max(num_bits, 1)))
    pref = ray.put(planes)

    def tag(b: pa.Table) -> pa.Table:
        if num_bits == 0:
            return b.append_column(
                "lsh_bucket", pa.array(np.zeros(b.num_rows, np.int64)))
        return _LshTag(pref, emb_col)(b)

    tagged = ds.map_batches(tag, batch_format="pyarrow", batch_size=8192)

    def bucket_pairs(g: pa.Table) -> pa.Table:
        n = g.num_rows
        id_type = g.schema.field(id_col).type
        if n < 2:
            return pa.table({"id_a": pa.array([], type=id_type),
                             "id_b": pa.array([], type=id_type),
                             "cosine_sim": pa.array([], type=pa.float64())})
        m = _normalize(_emb_matrix(g, emb_col))
        sims = m @ m.T
        ids = g[id_col].to_numpy(zero_copy_only=False)
        iu, ju = np.triu_indices(n, k=1)
        keep = sims[iu, ju] >= threshold
        a, b = ids[iu[keep]], ids[ju[keep]]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        return pa.table({"id_a": pa.array(a2).cast(id_type),
                         "id_b": pa.array(b2).cast(id_type),
                         "cosine_sim": pa.array(sims[iu[keep], ju[keep]],
                                                type=pa.float64())})
    bucket_pairs.__name__ = "bucket_cosine_pairs"

    return tagged.groupby("lsh_bucket").map_groups(bucket_pairs,
                                                   batch_format="pyarrow")


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

    def tag_and_filter(b: pa.Table) -> pa.Table:
        t = _LshTag(pref, emb_col)(b)
        bk = t["lsh_bucket"].to_numpy(zero_copy_only=False)
        mask = np.isin(bk, np.fromiter(ray.get(keep), dtype=np.int64))
        return t.filter(pa.array(mask))

    pruned = ds.map_batches(tag_and_filter, batch_format="pyarrow",
                            batch_size=8192)
    return knn_bruteforce(pruned.drop_columns(["lsh_bucket"]), qm, query_ids,
                          k, id_col, emb_col, concurrency)
