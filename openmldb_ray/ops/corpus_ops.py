"""Corpus-hygiene operators a large-scale training-data pipeline needs
beyond document-level dedup: paragraph-level exact dedup (the C4
"repeated span" rule at paragraph granularity), benchmark
decontamination (drop documents sharing an n-gram with an eval set),
and deterministic sampling (hash fractions + per-key quotas).

Scale shapes:

- ``dedup_paragraphs``: explode to (doc_id, idx, para_hash) SLIM rows
  (never the paragraph text), one groupby on the hash keeps the first
  occurrence (min (doc_id, idx)), survivors regroup per doc and the
  text is rebuilt from the ORIGINAL row's paragraphs — the only text
  movement is the per-doc rebuild join, bucketed by doc id.
- ``decontaminate``: the eval set is dimension-sized by definition, so
  its n-gram hash set is built once and broadcast (``ray.put``); the
  corpus filter is one vectorized shingle pass per batch against the
  sorted hash array (searchsorted membership) — zero shuffle.
- ``sample_by_hash``: deterministic content-independent sampling by
  id hash — stable across runs/cluster sizes, no RNG state, no
  shuffle. ``sample_per_key`` caps rows per key (e.g. per-source
  quotas) with one slim groupby.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from openmldb_ray.functions.hashing import fnv1a_flat, word_hashes_batch
from openmldb_ray.functions.sketches import _splitmix64

_PRIME = np.uint64(0x100000001B3)


def _split_paras(texts, sep: str = "\n\n") -> tuple[pa.Array, np.ndarray]:
    """Split a batch of texts into non-blank segments entirely in
    Arrow. Returns ``(flat_paras, doc_off)``: doc *d* owns segments
    ``flat_paras[doc_off[d]:doc_off[d+1]]`` in document order, with
    whitespace-only segments dropped (the ``p.strip()`` rule — both
    the explode and the rebuild use THIS function, so segment
    indices always agree between the two passes). ``sep`` picks the
    granularity: blank line = paragraphs, newline = lines."""
    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array(list(texts), type=pa.string())
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    if pa.types.is_large_string(texts.type):
        texts = texts.cast(pa.string())
    split = pc.split_pattern(texts, pattern=sep)
    raw_off = np.asarray(split.offsets, dtype=np.int64)
    flat = split.flatten()
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    keep = pc.greater(pc.utf8_length(pc.utf8_trim_whitespace(flat)), 0)
    keep_np = keep.to_numpy(zero_copy_only=False)
    ndocs = len(raw_off) - 1
    doc_idx = np.repeat(np.arange(ndocs, dtype=np.int64),
                        raw_off[1:] - raw_off[:-1])
    counts = np.bincount(doc_idx[keep_np], minlength=ndocs)
    doc_off = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    return flat.filter(keep), doc_off


def _para_hashes(texts, sep: str = "\n\n") -> tuple[np.ndarray, np.ndarray]:
    """(hashes, doc_off): FNV of each non-blank segment (split on
    ``sep``), flat layout — hashes the UNSTRIPPED segment bytes,
    vectorized over the batch's flat UTF-8 buffer."""
    flat, doc_off = _split_paras(texts, sep)
    lb = flat.cast(pa.large_binary())
    off = np.frombuffer(lb.buffers()[1], dtype=np.int64)
    off = off[lb.offset: lb.offset + len(lb) + 1]
    data = np.frombuffer(lb.buffers()[2], dtype=np.uint8) \
        if lb.buffers()[2] is not None else np.empty(0, dtype=np.uint8)
    return fnv1a_flat(off, data), doc_off


def dedup_paragraphs(ds: ray.data.Dataset, text_col: str = "text",
                     id_col: str = "doc_id",
                     num_buckets: int = 64,
                     sep: str = "\n\n") -> ray.data.Dataset:
    """Paragraph-level exact dedup: each distinct paragraph survives
    only at its FIRST occurrence (smallest (doc_id, paragraph index)
    across the corpus); every doc's text is rebuilt from its surviving
    paragraphs (docs left empty are dropped). Returns
    (id_col, text_col) with text_col rewritten.

    64-bit paragraph hashes stand in for exact strings (collision odds
    ~2^-30 at corpus scale); the oracle/test compares exact strings."""
    def explode(b: pa.Table) -> pa.Table:
        h, doc_off = _para_hashes(b[text_col], sep)
        counts = np.diff(doc_off)
        ids = np.repeat(b[id_col].to_numpy(zero_copy_only=False), counts)
        total = int(doc_off[-1])
        idx = np.arange(total, dtype=np.int64) \
            - np.repeat(doc_off[:-1], counts)
        # map-side combiner: per batch, keep only the min-(doc, idx)
        # row per paragraph hash — hot boilerplate paragraphs collapse
        # before the shuffle (global min of per-batch mins is the same
        # first occurrence)
        order = np.lexsort((idx, ids, h))
        hs = h[order]
        firsts = np.concatenate(([True], hs[1:] != hs[:-1])) \
            if len(hs) else np.empty(0, bool)
        keep = order[firsts]
        return pa.table({
            "para_hash": pa.array(h[keep].view(np.int64)),
            id_col: pa.array(ids[keep]),
            "__pidx__": pa.array(idx[keep]),
        })
    explode.__name__ = "explode_paragraphs"
    slim = ds.map_batches(explode, batch_format="pyarrow")

    # bucket by paragraph hash: ONE vectorized kernel per bucket (a
    # groupby(para_hash).map_groups would make one Python call per
    # distinct paragraph — measured 50s vs <5s at 50k docs)
    def tag(b: pa.Table) -> pa.Table:
        h = b["para_hash"].to_numpy(zero_copy_only=False).view(np.uint64)
        bkt = (_splitmix64(h) % np.uint64(num_buckets)).astype(np.int32)
        return b.append_column("__bkt__", pa.array(bkt))
    tag.__name__ = "tag_hash_bucket"

    def first_per_hash(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[
            ("para_hash", "ascending"), (id_col, "ascending"),
            ("__pidx__", "ascending")])
        s = g.take(order)
        h = s["para_hash"].to_numpy(zero_copy_only=False)
        firsts = np.concatenate(([True], h[1:] != h[:-1])) \
            if len(h) else np.empty(0, bool)
        return s.filter(pa.array(firsts)) \
            .drop_columns(["para_hash", "__bkt__"])
    first_per_hash.__name__ = "first_occurrence"
    from openmldb_ray.context import shuffle_partitions
    survivors = slim.map_batches(tag, batch_format="pyarrow") \
        .groupby("__bkt__", num_partitions=shuffle_partitions(num_buckets)) \
        .map_groups(first_per_hash, batch_format="pyarrow")

    # rebuild: attach surviving (doc, idx) back to the original rows in
    # ONE fused doc-bucket shuffle — texts and slim survivor rows are
    # tagged with the same bucket, unioned, shuffled once, and each
    # bucket builds keep lists + joins + rewrites text locally. (The
    # naive plan — keep-list groupby THEN hash_join — pays two extra
    # shuffle rounds; measured 16.3s -> fused at 2M docs.)
    from openmldb_ray.io import hash_columns
    from openmldb_ray.joins.hash_join import _join_index, _key_codes

    # the survivor side's null text column must carry the CORPUS text
    # type (large_string parquet blocks are common) or the union hits
    # mismatched schemas
    ttype = pa.string()
    try:
        sch = ds.schema(fetch_if_missing=True)
        cand_t = dict(zip(sch.names, sch.types)).get(text_col)
        if isinstance(cand_t, pa.DataType):
            ttype = cand_t
    except Exception:
        pass

    def tag_text(b: pa.Table) -> pa.Table:
        bkt = hash_columns(b, [id_col], num_buckets)
        return pa.table({
            id_col: b[id_col], text_col: b[text_col],
            "__pidx__": pa.nulls(b.num_rows, pa.int64()),
            "__side__": pa.array(np.zeros(b.num_rows, np.int8)),
            "__bkt__": pa.array(bkt)})
    tag_text.__name__ = "tag_text_side"

    def tag_surv(b: pa.Table) -> pa.Table:
        bkt = hash_columns(b, [id_col], num_buckets)
        return pa.table({
            id_col: b[id_col],
            text_col: pa.nulls(b.num_rows, ttype),
            "__pidx__": b["__pidx__"],
            "__side__": pa.array(np.ones(b.num_rows, np.int8)),
            "__bkt__": pa.array(bkt)})
    tag_surv.__name__ = "tag_survivor_side"

    def bucket_rebuild(g: pa.Table) -> pa.Table:
        tmask = pc.equal(g["__side__"], 0)
        tx = g.filter(tmask).select([id_col, text_col])
        sv = g.filter(pc.invert(tmask)).select([id_col, "__pidx__"])
        empty = tx.slice(0, 0)
        if tx.num_rows == 0 or sv.num_rows == 0:
            return empty
        sv = sv.take(pc.sort_indices(sv, sort_keys=[
            (id_col, "ascending"), ("__pidx__", "ascending")]))
        ids = sv[id_col]
        firsts = np.concatenate(([True], pc.not_equal(
            ids.slice(1), ids.slice(0, len(ids) - 1))
            .to_numpy(zero_copy_only=False)))
        starts = np.flatnonzero(firsts)
        keep = pa.table({
            id_col: ids.take(pa.array(starts)),
            "__keep__": pa.ListArray.from_arrays(
                pa.array(np.concatenate((starts, [len(ids)]))
                         .astype(np.int32)),
                sv["__pidx__"].combine_chunks()),
        })
        lcode, rcode = _key_codes(tx, keep, [id_col], [id_col])
        lidx, ridx = _join_index(lcode, rcode, "inner")
        if not len(lidx):
            return empty
        # vectorized rebuild: split each surviving doc's paragraphs
        # (same Arrow rule as the explode, so __pidx__ lines up),
        # gather the kept paragraphs with one flat take and join per
        # doc with pc.binary_join — no per-document Python loop
        flat, doc_off = _split_paras(
            tx[text_col].take(pa.array(lidx)), sep)
        keeps_arr = keep["__keep__"].take(pa.array(ridx))
        if isinstance(keeps_arr, pa.ChunkedArray):
            keeps_arr = keeps_arr.combine_chunks()
        kcnt = np.asarray(keeps_arr.value_lengths(), dtype=np.int64)
        kvals = np.asarray(keeps_arr.flatten(), dtype=np.int64)
        gather = kvals + np.repeat(doc_off[:-1], kcnt)
        paras = flat.take(pa.array(gather))
        off2 = np.concatenate(([0], np.cumsum(kcnt))).astype(np.int32)
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(off2, pa.int32()), paras),
            sep)
        tbl = pa.table({id_col: tx[id_col].take(pa.array(lidx)),
                        text_col: joined.cast(
                            tx.schema.field(text_col).type)})
        return tbl.filter(pc.greater(pc.utf8_length(tbl[text_col]), 0))
    bucket_rebuild.__name__ = "bucket_rebuild"

    unioned = ds.select_columns([id_col, text_col]) \
        .map_batches(tag_text, batch_format="pyarrow") \
        .union(survivors.map_batches(tag_surv, batch_format="pyarrow"))
    return unioned \
        .groupby("__bkt__", num_partitions=shuffle_partitions(num_buckets)) \
        .map_groups(bucket_rebuild, batch_format="pyarrow")


def dedup_lines(ds: ray.data.Dataset, text_col: str = "text",
                id_col: str = "doc_id",
                num_buckets: int = 64) -> ray.data.Dataset:
    """Line-level exact dedup — the finer-than-paragraph repeated-span
    rule (RefinedWeb-style cross-document boilerplate removal): each
    distinct non-blank LINE survives only at its first (doc_id, line
    index) occurrence; every doc is rebuilt from its surviving lines
    (emptied docs dropped). Reuses the dedup_paragraphs machinery
    (slim hash explode with map-side combine -> one bucketed
    first-occurrence shuffle -> one fused doc-bucket rebuild shuffle)
    at newline granularity."""
    return dedup_paragraphs(ds, text_col, id_col, num_buckets,
                            sep="\n")


def _ngram_hash_set(texts, n: int) -> np.ndarray:
    """Sorted unique n-gram hashes of the given texts (rolling
    polynomial combine of word FNV hashes — same family as
    shingle_hashes_batch)."""
    wh, doc_off = word_hashes_batch(list(texts))
    out = []
    with np.errstate(over="ignore"):
        for d in range(len(doc_off) - 1):
            w = wh[doc_off[d]:doc_off[d + 1]]
            if len(w) < n:
                continue
            acc = w[: len(w) - n + 1].copy()
            for j in range(1, n):
                acc = acc * _PRIME ^ w[j: len(w) - n + 1 + j]
            out.append(acc)
    if not out:
        return np.empty(0, np.uint64)
    return np.unique(np.concatenate(out))


class _ContaminationFilter:
    """Actor stage: drop (or tag) docs sharing >= min_hits n-grams with
    the broadcast eval-set hash array (sorted; searchsorted lookup)."""

    def __init__(self, banned, text_col: str, n: int,
                 min_hits: int, tag_only: bool):
        # ``banned`` arrives as a plain ndarray through the actor's
        # task spec (Ray promotes large args to plasma once; actors
        # zero-copy read it). NOT an ObjectRef constructor arg — a
        # restartable actor pool cannot re-resolve a borrowed ref if
        # the object is lost (ray issue 53727); spec-owned args
        # survive restarts.
        self.banned = banned if isinstance(banned, np.ndarray) \
            else ray.get(banned)
        self.text_col = text_col
        self.n = n
        self.min_hits = min_hits
        self.tag_only = tag_only

    def __call__(self, b: pa.Table) -> pa.Table:
        # Flat-batch layout (the RepetitionScore pattern): one rolling
        # combine over the whole batch's word-hash array, doc-boundary
        # grams masked out — no per-document Python loop. ``hits``
        # counts DISTINCT matched n-gram hashes per doc (a document
        # repeating one shared n-gram counts once toward min_hits).
        hits = np.zeros(b.num_rows, dtype=np.int64)
        wh, doc_off = word_hashes_batch(b[self.text_col])
        m = len(wh) - self.n + 1
        if m > 0 and len(self.banned):
            counts = (doc_off[1:] - doc_off[:-1]).astype(np.int64)
            doc_of_word = np.repeat(np.arange(len(counts)), counts)
            with np.errstate(over="ignore"):
                acc = wh[:m].copy()
                for j in range(1, self.n):
                    acc = acc * _PRIME ^ wh[j:j + m]
            valid = doc_of_word[:m] == doc_of_word[self.n - 1:]
            acc = acc[valid]
            gdoc = doc_of_word[:m][valid]
            pos = np.minimum(np.searchsorted(self.banned, acc),
                             len(self.banned) - 1)
            matched = self.banned[pos] == acc
            if matched.any():
                mh, md = acc[matched], gdoc[matched]
                order = np.lexsort((mh, md))
                sh, sd = mh[order], md[order]
                first = np.concatenate(
                    ([True], (sd[1:] != sd[:-1]) | (sh[1:] != sh[:-1])))
                hits = np.bincount(sd[first], minlength=b.num_rows)
        clean = hits < self.min_hits
        if self.tag_only:
            return (b.append_column("ngram_hits", pa.array(hits))
                    .append_column("contaminated",
                                   pa.array(~clean)))
        return b.filter(pa.array(clean))


def decontaminate(ds: ray.data.Dataset, eval_texts,
                  text_col: str = "text", n: int = 8,
                  min_hits: int = 1, tag_only: bool = False,
                  concurrency: int | None = None) -> ray.data.Dataset:
    """Drop corpus documents sharing >= ``min_hits`` word n-grams with
    any eval-set text (train/test contamination removal). The eval set
    is dimension-sized: its hash set is built once on the driver and
    shipped to each actor through the constructor task spec (plasma
    -backed once for large arrays; restart-safe, unlike an ObjectRef
    arg); the corpus side is one zero-shuffle vectorized pass.

    batch_size 8192: the flat-batch kernel is one rolling combine per
    batch, so per-call overhead dominates at small batches (1024 →
    ~2,000 calls at 2M docs measured ~1.5x slower)."""
    banned = _ngram_hash_set(eval_texts, n)
    from openmldb_ray.context import pool_concurrency
    return ds.map_batches(
        _ContaminationFilter, batch_format="pyarrow", batch_size=8192,
        fn_constructor_args=(banned, text_col, n, min_hits, tag_only),
        concurrency=concurrency or pool_concurrency())


def sample_by_hash(ds: ray.data.Dataset, fraction: float,
                   id_col: str = "doc_id",
                   seed: int = 0) -> ray.data.Dataset:
    """Deterministic sampling: keep rows whose splitmix64(id ^ seed)
    falls below fraction * 2^64. Stable across runs, cluster sizes and
    block layouts (content-keyed, not RNG-keyed); zero shuffle."""
    thr = np.uint64(int(fraction * float(1 << 64))) if fraction < 1.0 \
        else np.uint64(0xFFFFFFFFFFFFFFFF)
    sd = np.uint64(seed)

    def pick(b: pa.Table) -> pa.Table:
        from openmldb_ray.functions.sketches import hash_column
        # hash_column drops nulls, which would desync the mask from the
        # batch; null ids hash as the empty string (kept deterministic).
        ids = pc.fill_null(pc.cast(b[id_col], pa.string()), "")
        h = _splitmix64(hash_column(ids) ^ sd)
        return b.filter(pa.array(h < thr))
    pick.__name__ = "hash_sample"
    return ds.map_batches(pick, batch_format="pyarrow")


def sample_per_key(ds: ray.data.Dataset, key: str, max_rows: int,
                   order_col: str | None = None,
                   num_buckets: int = 64) -> ray.data.Dataset:
    """Per-key quota: keep at most ``max_rows`` rows per key value
    (deterministic: smallest ``order_col`` first). One key-hash-bucket
    shuffle + a rank-within-group filter per bucket (per-key
    map_groups would cost one Python call per key value)."""
    from openmldb_ray.io import hash_columns

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column("__bkt__", pa.array(
            hash_columns(b, [key], num_buckets)))
    tag.__name__ = "tag_quota_bucket"

    def head_per_key(g: pa.Table) -> pa.Table:
        sort_keys = [(key, "ascending")] + (
            [(order_col, "ascending")] if order_col is not None else [])
        s = g.take(pc.sort_indices(g, sort_keys=sort_keys)) \
            .drop_columns(["__bkt__"])
        enc = pc.dictionary_encode(s[key].combine_chunks())
        idx = enc.indices.to_numpy(zero_copy_only=False)
        null = enc.indices.is_null().to_numpy(zero_copy_only=False)
        codes = np.where(null, -1, np.nan_to_num(idx)).astype(np.int64)
        n = len(codes)
        firsts = np.concatenate(([True], codes[1:] != codes[:-1])) \
            if n else np.empty(0, bool)
        starts = np.flatnonzero(firsts)
        counts = np.diff(np.concatenate((starts, [n])))
        rank = np.arange(n) - np.repeat(starts, counts)
        return s.filter(pa.array(rank < max_rows))
    head_per_key.__name__ = "per_key_head"

    from openmldb_ray.context import shuffle_partitions
    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__bkt__", num_partitions=shuffle_partitions(num_buckets)) \
        .map_groups(head_per_key, batch_format="pyarrow")


def mix_sources(ds: ray.data.Dataset, weights: dict[str, float],
                total_tokens: int | None = None,
                tok_col: str = "n_tok", source_col: str = "source",
                id_col: str = "doc_id", seed: int = 0):
    """Token-budget data mixing: subsample each source so the kept
    corpus matches the target per-source token proportions
    ``weights`` (the pretraining "data mixture" step).

    Pass 1 computes per-source token totals with a map-side Arrow
    partial per batch, so only |sources| slim rows reach the driver —
    dimension-sized by definition. With ``total_tokens=None`` the
    budget is the LARGEST achievable at the exact target mixture
    (binding source kept whole); otherwise the requested budget
    (fractions cap at 1 — can't mint tokens). Pass 2 is a zero-shuffle
    vectorized filter: keep iff splitmix64(doc_id ^ seed) falls below
    the source's fraction threshold — deterministic, stable across
    runs / cluster sizes / block layouts, no RNG state (the
    ``sample_by_hash`` rule, per source). Sources absent from
    ``weights`` get weight 0 (dropped).

    Returns ``(dataset, stats)`` where stats carries the budget,
    per-source fractions and input token totals. Expected kept tokens
    per source = fraction * total (doc hashes are independent of
    ``n_tok``); exactness is statistical, not a per-source quota — use
    ``sample_per_key`` for hard row caps."""
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("weights must sum > 0")
    w = {k: v / wsum for k, v in weights.items() if v > 0}

    def partial(b: pa.Table) -> pa.Table:
        # cast pins the type so an all-null batch still unions with
        # string batches; null sources aggregate under the null key
        # (weight 0 downstream)
        g = pa.table({source_col: pc.cast(b[source_col], pa.string()),
                      tok_col: b[tok_col]}) \
            .group_by(source_col).aggregate([(tok_col, "sum")])
        return g.rename_columns([source_col, "__tok__"])
    partial.__name__ = "source_token_partial"

    slim = ds.select_columns([source_col, tok_col]) \
        .map_batches(partial, batch_format="pyarrow").materialize()
    parts = [t for t in ray.get(slim.to_arrow_refs()) if t.num_rows]
    if parts:
        totals = pa.concat_tables(parts).group_by(source_col) \
            .aggregate([("__tok__", "sum")])
        tokens_s = dict(zip(totals[source_col].to_pylist(),
                            totals["__tok___sum"].to_pylist()))
    else:
        tokens_s = {}
    if total_tokens is None:
        feas = [tokens_s.get(s, 0) / ws for s, ws in w.items()]
        budget = min(feas) if feas else 0.0
    else:
        budget = float(total_tokens)
    fracs = {}
    for s, ws in w.items():
        have = tokens_s.get(s, 0)
        fracs[s] = min(1.0, budget * ws / have) if have else 0.0

    src_arr = np.array(sorted(fracs), dtype=object)
    thr_arr = np.array(
        [min(int(fracs[s] * float(1 << 64)), (1 << 64) - 1)
         for s in src_arr], dtype=np.uint64)
    sd = np.uint64(seed)

    def pick(b: pa.Table) -> pa.Table:
        from openmldb_ray.functions.sketches import hash_column
        ids = pc.fill_null(pc.cast(b[id_col], pa.string()), "")
        h = _splitmix64(hash_column(ids) ^ sd)
        # null sources take the sentinel path: it matches no weighted
        # source, so known=False -> thr 0 (weight-0 rule; a raw None
        # in an object array would crash np.searchsorted's str compare)
        srcs = pc.fill_null(pc.cast(b[source_col], pa.string()),
                            "\x00__null__").to_numpy(zero_copy_only=False)
        if len(src_arr):
            pos = np.minimum(np.searchsorted(src_arr, srcs),
                             len(src_arr) - 1)
            known = src_arr[pos] == srcs
            thr = np.where(known, thr_arr[pos], np.uint64(0))
        else:
            thr = np.zeros(len(srcs), np.uint64)
        return b.filter(pa.array(h < thr))
    pick.__name__ = "mix_sample"

    stats = {"budget_tokens": budget, "fractions": fracs,
             "source_tokens": tokens_s}
    return ds.map_batches(pick, batch_format="pyarrow"), stats
