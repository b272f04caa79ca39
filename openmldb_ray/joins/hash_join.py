"""Explicit partitioned hash join (the portable Ray Data join pattern):
bucket both sides by key hash, groupby bucket, Arrow-native merge per
bucket (dictionary-encoded key codes -> searchsorted join index ->
``Table.take``).

Exists alongside ``Dataset.join`` because the built-in hash join (and
Acero's) rejects nested non-key columns (e.g. ``tokens: list<int32>``)
— ``take`` carries any Arrow type. Used by the flagship to re-attach
token arrays to window features by doc_id (SURVEY.md §7.4: tokens are
projected OUT of the shuffle and re-joined here — the decisive
bytes-moved optimization) and by the near-dup verify stage to re-attach
texts to candidate pairs.

Join semantics: SQL-style — NULL keys never match (left-join rows with
NULL keys still emit with NULL payload).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from openmldb_ray.io import hash_columns

_SIDE = "__hj_side__"
_BUCKET = "__hj_bucket__"


def _key_codes(lt: pa.Table, rt: pa.Table, lkeys: Sequence[str],
               rkeys: Sequence[str]) -> tuple[np.ndarray, np.ndarray]:
    """Per-row int64 join codes for both sides; rows with NULL in any
    key get code -1 (left) / -2 (right) so they never match."""
    nl, nr = lt.num_rows, rt.num_rows
    lcode = np.zeros(nl, dtype=np.int64)
    rcode = np.zeros(nr, dtype=np.int64)
    lnull = np.zeros(nl, dtype=bool)
    rnull = np.zeros(nr, dtype=bool)
    for lk, rk in zip(lkeys, rkeys):
        la = lt[lk].combine_chunks()
        ra = rt[rk].combine_chunks()
        if ra.type != la.type:
            ra = ra.cast(la.type)
        both = pa.chunked_array([la, ra]).combine_chunks()
        enc = pc.dictionary_encode(both)
        idx = enc.indices.to_numpy(zero_copy_only=False)
        null = enc.indices.is_null().to_numpy(zero_copy_only=False)
        card = len(enc.dictionary) + 1
        codes = np.where(null, 0, np.nan_to_num(idx)).astype(np.int64)
        lcode = lcode * card + codes[:nl]
        rcode = rcode * card + codes[nl:]
        lnull |= null[:nl]
        rnull |= null[nl:]
    lcode[lnull] = -1
    rcode[rnull] = -2
    return lcode, rcode


def _join_index(lcode: np.ndarray, rcode: np.ndarray, how: str
                ) -> tuple[np.ndarray, np.ndarray]:
    """(left_idx, right_idx) row indices realizing the join; right_idx
    holds -1 for unmatched left rows (left join only)."""
    order = np.argsort(rcode, kind="stable")
    rs = rcode[order]
    lo = np.searchsorted(rs, lcode, side="left")
    hi = np.searchsorted(rs, lcode, side="right")
    counts = hi - lo
    if how == "left":
        out_counts = np.maximum(counts, 1)
    else:
        out_counts = counts
    total = int(out_counts.sum())
    left_idx = np.repeat(np.arange(len(lcode), dtype=np.int64), out_counts)
    ends = np.cumsum(out_counts)
    within = np.arange(total, dtype=np.int64) \
        - np.repeat(ends - out_counts, out_counts)
    right_pos = np.repeat(lo, out_counts) + within
    matched = np.repeat(counts > 0, out_counts)
    right_idx = np.full(total, -1, dtype=np.int64)
    right_idx[matched] = order[right_pos[matched]]
    return left_idx, right_idx


def _take_or_null(tbl: pa.Table, idx: np.ndarray) -> pa.Table:
    if (idx >= 0).all():
        return tbl.take(pa.array(idx))
    ind = pa.array(np.where(idx < 0, 0, idx),
                   mask=(idx < 0))  # masked -> null rows
    return tbl.take(ind)


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str | Sequence[str],
    *,
    right_on: str | Sequence[str] | None = None,
    how: str = "inner",
    num_buckets: int = 64,
    suffix: str = "_r",
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
) -> ray.data.Dataset:
    """``left_schema``/``right_schema``: pass when known — ``schema()``
    on a shuffle-derived Dataset partially executes its lineage."""
    on = [on] if isinstance(on, str) else list(on)
    right_on = on if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on))
    if how == "left_outer":
        how = "left"
    if how not in ("inner", "left"):
        raise ValueError(f"hash_join supports inner/left, got {how!r}")
    lschema = left_schema if left_schema is not None else left.schema()
    rschema = right_schema if right_schema is not None else right.schema()
    lcols = lschema.names
    rcols = rschema.names
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))

    ren = {c: (c + suffix if c in lcols and c not in right_on else c)
           for c in rcols}
    rpayload = [c for c in rcols if c not in right_on]
    rpay_named = [ren[c] for c in rpayload]
    key_types = {lk: ltypes[lk] for lk in on}
    # one combined schema for both sides: right key values occupy the
    # LEFT key columns (cast to the left type); everything else is
    # null-padded — Arrow blocks need schema-aligned unions
    combined = [(c, ltypes[c]) for c in lcols] \
        + [(ren[c], rtypes[c]) for c in rpayload]

    def tag_left(b: pa.Table) -> pa.Table:
        h = hash_columns(b, on, num_buckets)
        cols = {c: b[c] for c in lcols}
        for c in rpayload:
            cols[ren[c]] = pa.nulls(b.num_rows, rtypes[c])
        t = pa.table(cols)
        return t.append_column(_BUCKET, pa.array(h)).append_column(
            _SIDE, pa.array(np.full(b.num_rows, 1, dtype=np.int8)))
    tag_left.__name__ = "hj_tag_left"

    def tag_right(b: pa.Table) -> pa.Table:
        h = hash_columns(b, right_on, num_buckets)
        cols = {}
        for c, t in combined:
            cols[c] = pa.nulls(b.num_rows, t)
        for lk, rk in zip(on, right_on):
            col = b[rk]
            if col.type != key_types[lk]:
                col = col.cast(key_types[lk])
            cols[lk] = col
        for c in rpayload:
            cols[ren[c]] = b[c]
        t = pa.table(cols)
        return t.append_column(_BUCKET, pa.array(h)).append_column(
            _SIDE, pa.array(np.full(b.num_rows, 0, dtype=np.int8)))
    tag_right.__name__ = "hj_tag_right"

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))

    class BucketMerge:
        __name__ = "bucket_hash_join"

        def __call__(self, g: pa.Table) -> pa.Table:
            side = g[_SIDE].to_numpy(zero_copy_only=False)
            lt = g.filter(pa.array(side == 1))
            rt = g.filter(pa.array(side == 0))
            lcode, rcode = _key_codes(lt, rt, on, on)
            li, ri = _join_index(lcode, rcode, how)
            out = _take_or_null(lt.select(lcols), li)
            rout = _take_or_null(rt.select(rpay_named), ri) \
                if rpay_named else None
            for c in rpay_named:
                out = out.append_column(c, rout[c])
            return out

    try:
        # partition count = bucket count: a small join shouldn't spin
        # the context-default aggregator pool (fixed actor startup per
        # exchange dominates tiny joins)
        from openmldb_ray.context import shuffle_partitions
        grouped = tagged.groupby(
            _BUCKET, num_partitions=shuffle_partitions(num_buckets))
    except TypeError:
        grouped = tagged.groupby(_BUCKET)
    return grouped.map_groups(BucketMerge(), batch_format="pyarrow")


def hash_anti_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str | Sequence[str],
    *,
    right_on: str | Sequence[str] | None = None,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Left rows whose key appears in NO right row (distributed
    anti-join — the scale-safe replacement for collecting a drop-set
    to the driver). NULL-keyed left rows are kept (SQL NOT IN would
    differ; this is the dedup 'drop only confirmed ids' semantic).
    """
    on = [on] if isinstance(on, str) else list(on)
    right_on = on if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on))
    lcols = left.schema().names

    def tag(keys, side, keep, rename=None):
        def fn(b: pa.Table) -> pa.Table:
            b = b.select(keep)
            h = hash_columns(b, keys, num_buckets)
            if rename:
                b = b.rename_columns([rename.get(c, c)
                                      for c in b.column_names])
            return b.append_column(_BUCKET, pa.array(h)).append_column(
                _SIDE, pa.array(np.full(b.num_rows, side, dtype=np.int8)))
        fn.__name__ = f"anti_tag_{side}"
        return fn

    # the right side is projected to its key columns only — nothing
    # else crosses the shuffle; its keys are renamed to the left names
    # so the padded union keeps them
    tagged = left.map_batches(tag(on, 1, lcols), batch_format="pyarrow")
    rt = right.map_batches(tag(right_on, 0, right_on,
                               rename=dict(zip(right_on, on))),
                           batch_format="pyarrow")

    class BucketAnti:
        __name__ = "bucket_anti_join"

        def __call__(self, g: pa.Table) -> pa.Table:
            side = g[_SIDE].to_numpy(zero_copy_only=False)
            lt = g.filter(pa.array(side == 1)).select(lcols)
            rkeys = g.filter(pa.array(side == 0))
            if rkeys.num_rows == 0 or lt.num_rows == 0:
                return lt
            rt_tbl = pa.table({c: rkeys[c] for c in on})
            lcode, rcode = _key_codes(lt, rt_tbl, on, on)
            drop = np.isin(lcode, np.unique(rcode))
            lcode_null = lcode == -1
            keep = ~drop | lcode_null
            return lt.filter(pa.array(keep))

    # pad the slim right side with NULL columns so the union's blocks
    # share one schema (Arrow shuffles need schema-aligned blocks)
    lsch = left.schema()
    want = list(lsch.names) + [_BUCKET, _SIDE]
    types = {n: t for n, t in zip(lsch.names, lsch.types)}
    types[_BUCKET] = pa.int32()
    types[_SIDE] = pa.int8()

    def pad(b: pa.Table) -> pa.Table:
        cols = {}
        for n in want:
            if n in b.column_names:
                col = b[n]
                if col.type != types[n]:
                    col = col.cast(types[n])
                cols[n] = col
            else:
                cols[n] = pa.nulls(b.num_rows, types[n])
        return pa.table(cols)
    pad.__name__ = "anti_pad_right"

    aligned = tagged.union(rt.map_batches(pad, batch_format="pyarrow"))
    try:
        from openmldb_ray.context import shuffle_partitions
        grouped = aligned.groupby(
            _BUCKET, num_partitions=shuffle_partitions(num_buckets))
    except TypeError:
        grouped = aligned.groupby(_BUCKET)
    return grouped.map_groups(BucketAnti(), batch_format="pyarrow")
