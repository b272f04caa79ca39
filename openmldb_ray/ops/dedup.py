"""Deduplication at corpus scale: exact, MinHash+LSH, SimHash,
n-gram Jaccard verification.

Shapes (all shuffle-frugal, no whole-dataset materialization anywhere):

- exact: vectorized content hash per batch -> hash-partition groupby ->
  keep first per group (deterministic tie-break by id).
- MinHash-LSH near-dup: shingle -> k minhashes per doc (one vectorized
  pass per batch) -> band rows (band_id, band_hash, doc_id) -> groupby
  band-hash buckets -> candidate pairs (schema-stable Arrow output,
  pair-bucket key emitted IN the same stage) -> groupby pair bucket ->
  distinct pairs -> texts re-attached by TWO bucketed hash_joins (on
  id_a, then id_b) -> exact n-gram Jaccard verify per batch. Band
  explode multiplies rows by n_bands but each row is ~24 bytes — tiny
  next to the text we did NOT shuffle; only *candidate* texts ever
  move, and only pairwise.
- SimHash: 64-bit signature; near-dup when Hamming distance <= t,
  bucketed by the 4-way table split (each 16-bit chunk) so candidates
  with distance<=3 collide in >=1 bucket.

All per-word hashing is the vectorized batch FNV in
``functions.hashing`` (no per-char Python on the hot path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from openmldb_ray.functions.hashing import (shingle_hashes_batch,
                                            simhash_batch,
                                            word_hashes_batch)
from openmldb_ray.ops.text import Fingerprint

_M61 = np.uint64((1 << 61) - 1)


def dedup_exact(ds: ray.data.Dataset, text_col: str = "text",
                id_col: str = "doc_id",
                concurrency: int | None = None) -> ray.data.Dataset:
    """Keep, per identical text, the row with the smallest id.
    hash -> groupby(hash) -> min-id row (one shuffle of slim rows)."""
    # trivial-init stage: a task pool beats an actor pool (no setup
    # to amortize, no pool spin-up; pass concurrency to force actors)
    hashed = ds.map_batches(Fingerprint(text_col),
                            batch_format="pyarrow", batch_size=4096,
                            concurrency=concurrency)

    # bucket by fingerprint; ONE vectorized keep-first kernel per
    # bucket (per-key map_groups costs a Python call per distinct text)
    num_buckets = 64

    def tag(b: pa.Table) -> pa.Table:
        h = b["fingerprint"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        return b.append_column("__bkt__", pa.array(
            (h % np.uint64(num_buckets)).astype(np.int32)))
    tag.__name__ = "tag_fp_bucket"

    def first_per_fp(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[
            ("fingerprint", "ascending"), (id_col, "ascending")])
        s = g.take(order)
        fp = s["fingerprint"].to_numpy(zero_copy_only=False)
        firsts = np.concatenate(([True], fp[1:] != fp[:-1])) \
            if len(fp) else np.empty(0, bool)
        return s.filter(pa.array(firsts)) \
            .drop_columns(["fingerprint", "__bkt__"])
    first_per_fp.__name__ = "keep_first"

    from openmldb_ray.context import shuffle_partitions
    tagged = hashed.map_batches(tag, batch_format="pyarrow")
    try:
        g = tagged.groupby("__bkt__",
                           num_partitions=shuffle_partitions(num_buckets))
    except TypeError:
        g = tagged.groupby("__bkt__")
    return g.map_groups(first_per_fp, batch_format="pyarrow")


class MinHasher:
    """k permutation-free minhashes via k independent linear hashes
    over shingles, vectorized across the whole batch (flat shingle
    array + ``np.minimum.reduceat`` per doc). Emits one
    (band_id, band_hash, id, bucket) row per doc per band."""

    def __init__(self, text_col: str, id_col: str, num_hashes: int,
                 num_bands: int, shingle_k: int, num_buckets: int = 64):
        assert num_hashes % num_bands == 0
        rng = np.random.default_rng(42)
        self.a = rng.integers(1, int(_M61) - 1, size=num_hashes,
                              dtype=np.uint64)
        self.b = rng.integers(0, int(_M61) - 1, size=num_hashes,
                              dtype=np.uint64)
        self.text_col = text_col
        self.id_col = id_col
        self.num_hashes = num_hashes
        self.num_bands = num_bands
        self.rows_per_band = num_hashes // num_bands
        self.shingle_k = shingle_k
        self.num_buckets = num_buckets

    def signatures(self, texts) -> np.ndarray:
        """(ndocs, num_hashes) minhash signatures, batch-vectorized."""
        sh, off = shingle_hashes_batch(texts, self.shingle_k)
        ndocs = len(off) - 1
        sigs = np.empty((ndocs, self.num_hashes), dtype=np.uint64)
        # chunk the hash dimension so (chunk, n_shingles) stays small
        with np.errstate(over="ignore"):
            for c0 in range(0, self.num_hashes, 16):
                c1 = min(c0 + 16, self.num_hashes)
                prod = (self.a[c0:c1, None] * sh[None, :]
                        + self.b[c0:c1, None]) % _M61
                sigs[:, c0:c1] = np.minimum.reduceat(
                    prod, off[:-1], axis=1).T
        return sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        r = self.rows_per_band
        sigs = self.signatures(batch[self.text_col])
        chunks = sigs.reshape(len(sigs), self.num_bands, r)
        h = np.full(chunks.shape[:2], 0xCBF29CE484222325, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(r):
                h = (h ^ chunks[:, :, j]) * np.uint64(0x100000001B3)
        ids = batch[self.id_col].take(
            pa.array(np.repeat(np.arange(batch.num_rows), self.num_bands)))
        bands = np.tile(np.arange(self.num_bands, dtype=np.int32),
                        len(sigs))
        bh = h.reshape(-1)
        bucket = ((bh ^ (bands.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)))
                  % np.uint64(self.num_buckets)).astype(np.int32)
        return pa.table({"band_id": pa.array(bands),
                         "band_hash": pa.array(bh),
                         self.id_col: ids,
                         "__bkt__": pa.array(bucket)})


def _pairs_from_groups(gkeys: np.ndarray, ids: np.ndarray
                       ) -> tuple[np.ndarray, np.ndarray]:
    """All within-group ordered pairs (a<b) for groups >= 2, vectorized
    group detection (sort + run boundaries); the per-group pair
    expansion loops only over colliding groups (rare by design)."""
    order = np.lexsort((ids, gkeys))
    gk, sid = gkeys[order], ids[order]
    bound = np.concatenate(([0], np.flatnonzero(gk[1:] != gk[:-1]) + 1,
                            [len(gk)]))
    out_a, out_b = [], []
    for i in range(len(bound) - 1):
        lo, hi = bound[i], bound[i + 1]
        if hi - lo < 2:
            continue
        grp = np.unique(sid[lo:hi])
        if len(grp) < 2:
            continue
        ia, ib = np.triu_indices(len(grp), k=1)
        out_a.append(grp[ia])
        out_b.append(grp[ib])
    if out_a:
        return np.concatenate(out_a), np.concatenate(out_b)
    return (np.empty(0, dtype=ids.dtype), np.empty(0, dtype=ids.dtype))


def _candidate_pairs(rows: ray.data.Dataset, id_col: str,
                     group_cols: list[str],
                     pair_buckets: int = 32) -> ray.data.Dataset:
    """(group..., id) rows -> distinct (id_a, id_b) candidate pairs.

    Stage 1 groups by the precomputed ``__bkt__`` and emits pairs WITH
    their pair-bucket key in one schema-stable Arrow table (fixes the
    round-1 ``__pbkt__`` empty-block schema bug); stage 2 groups by
    pair bucket and dedups. Empty groups emit explicitly-typed empty
    tables, so every block downstream carries the key column.
    """

    def pairs(g: pa.Table) -> pa.Table:
        id_type = g.schema.field(id_col).type
        ids_np = g[id_col].to_numpy(zero_copy_only=False)
        # combine the group cols into one uint64 key (vectorized)
        key = np.zeros(g.num_rows, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for c in group_cols:
                col = g[c].to_numpy(zero_copy_only=False).astype(np.uint64)
                key = key * np.uint64(0x100000001B3) + col
        a, b = _pairs_from_groups(key, ids_np)
        if len(a):
            if a.dtype.kind in "OUS":  # string ids -> C-backed hash
                ha = pd.util.hash_array(a, categorize=False)
                hb = pd.util.hash_array(b, categorize=False)
            else:
                ha = a.astype(np.uint64)
                hb = b.astype(np.uint64)
            with np.errstate(over="ignore"):
                pb = ((ha * np.uint64(0x9E3779B97F4A7C15) + hb)
                      % np.uint64(pair_buckets)).astype(np.int32)
        else:
            pb = np.empty(0, dtype=np.int32)
        return pa.table({
            "id_a": pa.array(a).cast(id_type),
            "id_b": pa.array(b).cast(id_type),
            "__pbkt__": pa.array(pb, type=pa.int32()),
        })
    pairs.__name__ = "band_pairs"

    def distinct_pairs(g: pa.Table) -> pa.Table:
        g = g.select(["id_a", "id_b"])
        return g.group_by(["id_a", "id_b"]).aggregate([])
    distinct_pairs.__name__ = "distinct_pairs"

    try:
        from openmldb_ray.context import shuffle_partitions
        g1 = rows.groupby(
            "__bkt__", num_partitions=shuffle_partitions(pair_buckets))
    except TypeError:
        g1 = rows.groupby("__bkt__")
    cand = g1.map_groups(pairs, batch_format="pyarrow")
    try:
        g2 = cand.groupby(
            "__pbkt__",
            num_partitions=shuffle_partitions(pair_buckets))
    except TypeError:
        g2 = cand.groupby("__pbkt__")
    return g2.map_groups(distinct_pairs, batch_format="pyarrow")


@ray.remote
def _cand_unique_ids(id_col: str, max_ids: int, refs):
    """(count, uniq-or-None) of distinct candidate-pair ids, computed
    WORKER-side (plasma-backed zero-copy reads; the driver sees only
    the count). Returns uniq=None when the guard fails so the caller
    falls back without ever moving the id set."""
    tables = [t for t in ray.get(refs) if t.num_rows]
    if not tables:
        return 0, None
    ids_tbl = pa.concat_tables(
        [t.select(["id_a"]).rename_columns([id_col]) for t in tables]
        + [t.select(["id_b"]).rename_columns([id_col])
           for t in tables])
    uniq = pc.unique(ids_tbl[id_col].combine_chunks())
    if len(uniq) > max_ids:
        return len(uniq), None
    return len(uniq), uniq


@ray.remote
def _text_broadcast_payload(id_col: str, text_col: str, refs):
    """Sorted (ids ndarray, texts Array) broadcast payload, built
    worker-side from the filtered candidate-text blocks."""
    tables = [t for t in ray.get(refs) if t.num_rows]
    texts = pa.concat_tables(tables) if tables else None
    if texts is None:
        return np.empty(0, dtype=object), pa.array([], pa.string())
    texts = texts.combine_chunks().take(pc.sort_indices(
        texts, sort_keys=[(id_col, "ascending")]))
    return (texts[id_col].to_numpy(zero_copy_only=False),
            texts[text_col].combine_chunks())


def _attach_texts(cand: ray.data.Dataset, ds: ray.data.Dataset,
                  text_col: str, id_col: str,
                  num_buckets: int = 64,
                  broadcast_max_ids: int = 2_000_000,
                  broadcast_max_bytes: int = 256 << 20
                  ) -> ray.data.Dataset:
    """Attach both texts to each candidate pair.

    Near-dup candidates are SPARSE by design, so the default plan is a
    broadcast semi-join: compute the candidate id set (small — pairs,
    not corpus) in a worker task, filter the corpus with one
    zero-shuffle vectorized pass, build the (id -> text) broadcast
    payload in a second worker task and attach both texts in one map
    over the pairs. Two shuffle stages become zero (measured 4.0s ->
    0.6s at sf0.1: the hash_joins' cost was per-stage fixed overhead,
    not bytes). When candidates are NOT sparse (id set or text bytes
    above the guards) it falls back to the two bucketed hash_joins —
    only candidate texts move, pairwise, never a whole-corpus
    broadcast. NOTHING in either plan materializes onto the driver:
    the guards are checked from a worker-side count and from dataset
    size metadata, so a pathological LSH bucket can at worst spill a
    worker, never OOM the driver."""
    cand = cand.materialize()
    count_ref, uniq_ref = _cand_unique_ids.options(num_returns=2) \
        .remote(id_col, broadcast_max_ids,
                list(cand.to_arrow_refs()))
    n_uniq = ray.get(count_ref)
    uniq_ok = 0 < n_uniq <= broadcast_max_ids
    if uniq_ok:
        def pick(b: pa.Table) -> pa.Table:
            return b.filter(pc.is_in(b[id_col],
                                     value_set=ray.get(uniq_ref)))
        pick.__name__ = "candidate_texts"
        texts_ds = ds.select_columns([id_col, text_col]) \
            .map_batches(pick, batch_format="pyarrow").materialize()
        if texts_ds.size_bytes() <= broadcast_max_bytes:
            tref = _text_broadcast_payload.remote(
                id_col, text_col, list(texts_ds.to_arrow_refs()))

            def attach(b: pa.Table) -> pa.Table:
                ids_s, txts = ray.get(tref)
                out = b
                for side in ("a", "b"):
                    k = b[f"id_{side}"].to_numpy(zero_copy_only=False)
                    if len(ids_s):
                        pos = np.searchsorted(ids_s, k)
                        pos[pos >= len(ids_s)] = 0
                        hit = ids_s[pos] == k
                    else:
                        pos = np.zeros(len(k), np.int64)
                        hit = np.zeros(len(k), bool)
                    take = pa.array(np.where(hit, pos, 0), mask=~hit)
                    out = out.append_column(f"__text_{side}__",
                                            txts.take(take))
                return out
            attach.__name__ = "attach_broadcast_texts"
            return cand.map_batches(attach, batch_format="pyarrow")

    from openmldb_ray.joins.hash_join import hash_join
    slim = ds.select_columns([id_col, text_col])
    sschema = slim.schema()
    id_type = sschema.types[sschema.names.index(id_col)]
    txt_type = sschema.types[sschema.names.index(text_col)]
    pair_schema = pa.schema([("id_a", id_type), ("id_b", id_type)])
    sch = pa.schema(list(zip(sschema.names, sschema.types)))
    j = hash_join(cand, slim, on="id_a", right_on=id_col,
                  num_buckets=num_buckets,
                  left_schema=pair_schema, right_schema=sch)
    j = j.rename_columns({text_col: "__text_a__"})
    j = hash_join(j, slim, on="id_b", right_on=id_col,
                  num_buckets=num_buckets,
                  left_schema=pair_schema.append(
                      pa.field("__text_a__", txt_type)),
                  right_schema=sch)
    return j.rename_columns({text_col: "__text_b__"})


class _JaccardVerify:
    """Exact shingle-Jaccard per candidate pair; shingle sets computed
    batch-vectorized for both text columns."""

    def __init__(self, shingle_k: int, threshold: float):
        self.k = shingle_k
        self.threshold = threshold

    def __call__(self, b: pa.Table) -> pa.Table:
        n = b.num_rows
        jac = np.zeros(n, dtype=np.float64)
        if n:
            # flat layout across the whole batch: one lexsort over
            # (pair, hash, side) rows, distinct-(pair,hash) runs give
            # |A|, |B| and |A∩B| per pair with no per-pair Python loop
            sa, offa = shingle_hashes_batch(b["__text_a__"], self.k)
            sb, offb = shingle_hashes_batch(b["__text_b__"], self.k)
            pid = np.concatenate([
                np.repeat(np.arange(n, dtype=np.int64), np.diff(offa)),
                np.repeat(np.arange(n, dtype=np.int64), np.diff(offb))])
            h = np.concatenate([sa, sb])
            side = np.concatenate([
                np.zeros(len(sa), np.int8), np.ones(len(sb), np.int8)])
            if len(h):
                order = np.lexsort((side, h, pid))
                ph, hh, ss = pid[order], h[order], side[order]
                new = np.concatenate(
                    ([True], (ph[1:] != ph[:-1]) | (hh[1:] != hh[:-1])))
                starts = np.flatnonzero(new)
                ends = np.concatenate((starts[1:], [len(ph)]))
                run_pid = ph[starts]
                has_a = ss[starts] == 0          # side-sorted runs
                has_b = ss[ends - 1] == 1
                na = np.bincount(run_pid[has_a], minlength=n)
                nb = np.bincount(run_pid[has_b], minlength=n)
                inter = np.bincount(run_pid[has_a & has_b], minlength=n)
                union = na + nb - inter
                nz = union > 0
                jac[nz] = inter[nz] / union[nz]
                jac[~nz] = 1.0
            else:
                jac[:] = 1.0
        out = pa.table({"id_a": b["id_a"], "id_b": b["id_b"],
                        "jaccard": pa.array(jac)})
        return out.filter(pc.greater_equal(out["jaccard"],
                                           self.threshold))


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
    (id_a, id_b, jaccard) with id_a < id_b, deduplicated."""
    bands = ds.map_batches(
        MinHasher(text_col, id_col, num_hashes, num_bands, shingle_k),
        batch_format="pyarrow", batch_size=1024,
        concurrency=concurrency)
    cand = _candidate_pairs(bands, id_col, ["band_id", "band_hash"])
    # candidates are rare by design: a compact join (16 buckets)
    # avoids two full-size aggregator pools; raise for corpora where
    # near-dup density is high
    withtext = _attach_texts(cand, ds, text_col, id_col,
                             num_buckets=16)
    return withtext.map_batches(
        _JaccardVerify(shingle_k, jaccard_threshold),
        batch_format="pyarrow", batch_size=4096,
        concurrency=concurrency)


def dedup_minhash(ds: ray.data.Dataset, text_col: str = "text",
                  id_col: str = "doc_id", **kw) -> ray.data.Dataset:
    """Drop near-duplicate docs, keeping the smallest id of each pair
    cluster (greedy: any doc that is id_b of a confirmed pair drops).
    The drop set never touches the driver — a distributed anti-join
    on id_b."""
    from openmldb_ray.joins.hash_join import hash_anti_join
    pairs = minhash_duplicate_pairs(ds, text_col, id_col, **kw)
    return hash_anti_join(ds, pairs.select_columns(["id_b"]),
                          on=id_col, right_on="id_b")


class _AnchorRows:
    """Each doc emits its ``band_sample`` smallest distinct shingle
    hashes as anchors (documents sharing any anchor are candidates);
    batch-vectorized via a per-doc sorted segment."""

    def __init__(self, text_col: str, id_col: str, shingle_k: int,
                 band_sample: int, num_buckets: int = 64):
        self.text_col = text_col
        self.id_col = id_col
        self.k = shingle_k
        self.band_sample = band_sample
        self.num_buckets = num_buckets

    def __call__(self, b: pa.Table) -> pa.Table:
        sh, off = shingle_hashes_batch(b[self.text_col], self.k)
        take_idx, take_doc = [], []
        for i in range(b.num_rows):
            u = np.unique(sh[off[i]:off[i + 1]])
            t = u[: self.band_sample]
            take_idx.append(t)
            take_doc.append(np.full(len(t), i, dtype=np.int64))
        anchors = (np.concatenate(take_idx) if take_idx
                   else np.empty(0, dtype=np.uint64))
        docs = (np.concatenate(take_doc) if take_doc
                else np.empty(0, dtype=np.int64))
        ids = b[self.id_col].take(pa.array(docs))
        bucket = (anchors % np.uint64(self.num_buckets)).astype(np.int32)
        return pa.table({self.id_col: ids,
                         "anchor": pa.array(anchors),
                         "__bkt__": pa.array(bucket)})


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
    approximation in the verify step: candidates from exact
    shingle-anchor collisions, then exact Jaccard filters. Same output
    schema as minhash_duplicate_pairs."""
    anc = ds.map_batches(
        _AnchorRows(text_col, id_col, shingle_k, band_sample),
        batch_format="pyarrow", batch_size=1024,
        concurrency=concurrency)
    cand = _candidate_pairs(anc, id_col, ["anchor"])
    # candidates are rare by design: a compact join (16 buckets)
    # avoids two full-size aggregator pools; raise for corpora where
    # near-dup density is high
    withtext = _attach_texts(cand, ds, text_col, id_col,
                             num_buckets=16)
    return withtext.map_batches(
        _JaccardVerify(shingle_k, threshold),
        batch_format="pyarrow", batch_size=4096,
        concurrency=concurrency)


class SimHash:
    """64-bit SimHash over word hashes (batch-vectorized bit votes);
    near-dup = small Hamming distance. Emits signature + 4x16-bit
    sub-keys for bucketing."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, b: pa.Table) -> pa.Table:
        sigs = simhash_batch(b[self.text_col])
        cols = {c: b[c] for c in b.column_names}
        cols["simhash"] = pa.array(sigs)
        for i in range(4):
            cols[f"simhash_b{i}"] = pa.array(
                ((sigs >> np.uint64(16 * i)) & np.uint64(0xFFFF))
                .astype(np.int64))
        return pa.table(cols)


def simhash_signatures(ds: ray.data.Dataset, text_col: str = "text",
                       concurrency: int | None = None) -> ray.data.Dataset:
    return ds.map_batches(SimHash(text_col), batch_format="pyarrow",
                          batch_size=4096, concurrency=concurrency)


def simhash_duplicate_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """Near-dup pairs by SimHash Hamming distance <= ``max_hamming``
    (<= 3 guarantees a collision in one of the 4 16-bit sub-keys —
    the classic table-split guarantee). Candidates collide on any
    sub-key; verify computes the exact Hamming distance from the two
    signatures carried with the pair (no text re-join needed)."""
    sigs = simhash_signatures(ds.select_columns([id_col, text_col]),
                              text_col, concurrency)

    def explode(b: pa.Table) -> pa.Table:
        n = b.num_rows
        idx = np.repeat(np.arange(n), 4)
        table_id = np.tile(np.arange(4, dtype=np.int64), n)
        sub = np.empty(4 * n, dtype=np.int64)
        sig = b["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        for i in range(4):
            sub[i::4] = ((sig >> np.uint64(16 * i))
                         & np.uint64(0xFFFF)).astype(np.int64)
        key = table_id * 65536 + sub
        bucket = (key % 64).astype(np.int32)
        return pa.table({
            id_col: b[id_col].take(pa.array(idx)),
            "subkey": pa.array(key),
            "__bkt__": pa.array(bucket),
        })

    rows = sigs.map_batches(explode, batch_format="pyarrow")
    cand = _candidate_pairs(rows, id_col, ["subkey"])

    # re-attach signatures (slim join: 8 bytes per side); schemas are
    # passed explicitly — schema() on the shuffle-derived candidate set
    # would re-execute its lineage just to learn the column names
    from openmldb_ray.joins.hash_join import hash_join
    dsch = ds.schema()
    id_type = dsch.types[dsch.names.index(id_col)]
    slim = sigs.select_columns([id_col, "simhash"])
    slim_schema = pa.schema([(id_col, id_type), ("simhash", pa.uint64())])
    pair_schema = pa.schema([("id_a", id_type), ("id_b", id_type)])
    j = hash_join(cand, slim, on="id_a", right_on=id_col,
                  left_schema=pair_schema, right_schema=slim_schema)
    j = j.rename_columns({"simhash": "__sig_a__"})
    j = hash_join(j, slim, on="id_b", right_on=id_col,
                  left_schema=pair_schema.append(
                      pa.field("__sig_a__", pa.uint64())),
                  right_schema=slim_schema)
    j = j.rename_columns({"simhash": "__sig_b__"})

    def verify(b: pa.Table) -> pa.Table:
        a = b["__sig_a__"].to_numpy(zero_copy_only=False).astype(np.uint64)
        c = b["__sig_b__"].to_numpy(zero_copy_only=False).astype(np.uint64)
        x = (a ^ c)
        ham = np.unpackbits(x[:, None].view(np.uint8), axis=1).sum(axis=1)
        out = pa.table({"id_a": b["id_a"], "id_b": b["id_b"],
                        "hamming": pa.array(ham.astype(np.int64))})
        return out.filter(pc.less_equal(out["hamming"], max_hamming))

    return j.map_batches(verify, batch_format="pyarrow")
