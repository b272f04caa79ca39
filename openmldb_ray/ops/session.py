"""Sequence analytics over (entity, ts)-ordered partitions: lag/lead,
sessionize, backfill (forward/backward fill) — the north-rule sugar ops
built on the same partition-and-sort contract as the window runner.

All three are one hash shuffle + ONE vectorized kernel per BUCKET:
rows are tagged with a key-hash bucket, each bucket sorts once by
(keys..., order_by) and the kernel handles every group in the bucket
with run-boundary vectorization — a groupby(keys).map_groups would
cost one Python call per entity (the per-key pathology measured at
50s/50k groups in the dedup ops).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from openmldb_ray.io import hash_columns, order_to_int64

_BUCKET = "__sess_bkt__"


def _group_starts(g: pa.Table, keys: Sequence[str]) -> np.ndarray:
    """Row indices where a new key group starts (g sorted by keys);
    NULL keys form their own group (SQL groupby semantics)."""
    n = g.num_rows
    if n == 0:
        return np.empty(0, np.int64)
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for k in keys:
        enc = pc.dictionary_encode(g[k].combine_chunks())
        idx = enc.indices.to_numpy(zero_copy_only=False)
        null = enc.indices.is_null().to_numpy(zero_copy_only=False)
        codes = np.where(null, -1, np.nan_to_num(idx)).astype(np.int64)
        change[1:] |= codes[1:] != codes[:-1]
    return np.flatnonzero(change)


def _bucketed(ds: ray.data.Dataset, keys: Sequence[str], order_by: str,
              kernel, name: str, num_buckets: int = 64):
    """Tag -> one shuffle on the bucket -> sort by (keys, order) ->
    ``kernel(sorted_table, seg, ends)`` once per bucket, where ``seg``
    / ``ends`` give each row its group's [start, end) row range."""
    def tag(b: pa.Table) -> pa.Table:
        return b.append_column(
            _BUCKET, pa.array(hash_columns(b, list(keys), num_buckets)))
    tag.__name__ = f"tag_{name}"

    def per_bucket(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[
            (k, "ascending") for k in keys] + [(order_by, "ascending")])
        s = g.take(order).drop_columns([_BUCKET])
        starts = _group_starts(s, keys)
        counts = np.diff(np.concatenate((starts, [s.num_rows])))
        seg = np.repeat(starts, counts)
        ends = np.repeat(starts + counts, counts)
        return kernel(s, seg, ends)
    per_bucket.__name__ = name

    from openmldb_ray.context import shuffle_partitions
    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby(_BUCKET, num_partitions=shuffle_partitions(num_buckets)) \
        .map_groups(per_bucket, batch_format="pyarrow")


def shift(
    ds: ray.data.Dataset,
    partition_by: str | Sequence[str],
    order_by: str,
    cols: dict[str, tuple[str, int]],
) -> ray.data.Dataset:
    """lag/lead: ``cols`` maps output name -> (source col, offset);
    offset > 0 is lag (k rows earlier), < 0 is lead (k rows later).
    NULL outside the partition. Matches SQL lag()/lead() with the same
    PARTITION BY / ORDER BY."""
    keys = [partition_by] if isinstance(partition_by, str) \
        else list(partition_by)

    def kernel(s: pa.Table, seg: np.ndarray, ends: np.ndarray
               ) -> pa.Table:
        n = s.num_rows
        i = np.arange(n, dtype=np.int64)
        for out, (src, k) in cols.items():
            col = s[src].combine_chunks()
            src_idx = i - k
            valid = (src_idx >= seg) & (src_idx < ends)
            take = pa.array(np.where(valid, src_idx, 0),
                            mask=~valid)
            s = s.append_column(out, col.take(take))
        return s

    return _bucketed(ds, keys, order_by, kernel, "shift")


def sessionize(
    ds: ray.data.Dataset,
    partition_by: str | Sequence[str],
    order_by: str,
    gap: int,
    session_col: str = "session_id",
) -> ray.data.Dataset:
    """Gap-based sessionization: a new session starts when the
    order-axis delta to the previous row of the entity exceeds ``gap``
    (same axis units). ``session_col`` = 1-based session index within
    the entity (cumulative sum of boundary flags — the standard SQL
    window formulation)."""
    keys = [partition_by] if isinstance(partition_by, str) \
        else list(partition_by)

    def kernel(s: pa.Table, seg: np.ndarray, ends: np.ndarray
               ) -> pa.Table:
        n = s.num_rows
        if n == 0:
            return s.append_column(session_col,
                                   pa.array([], type=pa.int64()))
        ts = order_to_int64(s[order_by])
        delta = np.diff(ts, prepend=ts[:1])
        new_sess = delta > gap
        new_sess[np.unique(seg)] = True  # each group's first row
        cs = np.cumsum(new_sess.astype(np.int64))
        sess = cs - cs[seg] + 1
        return s.append_column(session_col,
                               pa.array(sess, type=pa.int64()))

    return _bucketed(ds, keys, order_by, kernel, "sessionize")


def backfill(
    ds: ray.data.Dataset,
    partition_by: str | Sequence[str],
    order_by: str,
    cols: Sequence[str],
    direction: str = "forward",
    suffix: str = "_filled",
) -> ray.data.Dataset:
    """Forward/backward fill of NULLs within each entity in ts order —
    SQL ``last_value(col IGNORE NULLS) OVER (... ROWS UNBOUNDED
    PRECEDING)``. Forward fill never reads the future: zero temporal
    leakage."""
    keys = [partition_by] if isinstance(partition_by, str) \
        else list(partition_by)

    def kernel(s: pa.Table, seg: np.ndarray, ends: np.ndarray
               ) -> pa.Table:
        n = s.num_rows
        for c in cols:
            col = s[c].combine_chunks()
            valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
            if direction == "forward":
                idx = np.where(valid, np.arange(n), -1)
                idx = np.maximum.accumulate(idx)
                # accumulated index from an earlier group is always
                # below this row's group start — mask it out
                idx = np.where(idx >= seg, idx, -1)
            else:
                idx = np.where(valid, np.arange(n), n)
                idx = np.minimum.accumulate(idx[::-1])[::-1]
                idx = np.where(idx < ends, idx, -1)
            filled = col.take(pa.array(np.where(idx < 0, 0, idx),
                                       type=pa.int64()))
            out = pc.if_else(pa.array(idx >= 0), filled,
                             pa.nulls(n, col.type))
            s = s.append_column(c + suffix, out)
        return s

    return _bucketed(ds, keys, order_by, kernel, "backfill")
