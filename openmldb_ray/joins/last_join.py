"""LAST JOIN — OpenMLDB's point-in-time / as-of join.

Semantics (reference: JoinGenerator::RowLastJoinTable,
hybridse/src/vm/runner.cc:1925-1976; batch impl
java/openmldb-batch nodes/JoinPlan.scala:39-202):

- left outer; exactly ONE right row per left row;
- without ORDER BY: the first matching right row in right-table order;
- with ORDER BY ts: the match with max ts (asc) / min ts (desc);
- optional point-in-time condition ``right.ts <= left.ts`` (the as-of
  constraint — zero temporal leakage); under ``descending`` the LAST
  qualifying row in descending order is the MIN qualifying ts;
- optional extra non-equi ``condition`` predicate (the reference runs
  these as a JIT row UDF, nodes/JoinPlan.scala:108-143) — here a
  vectorized callable over candidate (left, right) row pairs;
- unmatched left rows keep right-side NULLs.

Two execution paths:

- **broadcast** (default when the right side is small): materialize the
  right side once, ``ray.put`` it, and do a vectorized per-key
  ``searchsorted`` as-of lookup inside ``map_batches`` — the big left
  side never shuffles. This is the 100 TB-friendly path for dimension
  tables.
- **shuffle**: tag + union both sides, hash-``groupby`` on the join
  key, then the SAME vectorized index kernel per bucket (Arrow-native;
  no pandas blocks) — for large right sides.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from openmldb_ray.io import hash_columns

# condition(left_cols, right_cols) -> bool mask over candidate pairs;
# both dicts hold numpy arrays aligned pairwise
Condition = Callable[[dict, dict], np.ndarray]


def _keys_np(tbl: pa.Table, cols: list[str]) -> np.ndarray:
    if not cols:
        # keyless (condition-only) join: every row shares one group —
        # binary_join_element_wise with zero arrays would return a
        # scalar (the separator) and crash downstream
        return np.zeros(tbl.num_rows, dtype=np.int64)
    if len(cols) == 1:
        return tbl[cols[0]].to_numpy(zero_copy_only=False)
    # composite key -> one fused string per row, vectorized in Arrow.
    # (hash_join._key_codes' dictionary-encode fold needs both sides
    # encoded together; the broadcast index sees left batches later, so
    # the encoding must be side-independent.) A NULL component becomes
    # a sentinel, so (1, NULL) matches (1, NULL) but not (2, NULL) —
    # per-column NULL==NULL, consistent with the single-column
    # null-group semantics (JoinPlan.scala:39-202 multi-column keys).
    import pyarrow.compute as pc
    parts = []
    for c in cols:
        col = tbl[c].combine_chunks()
        if pa.types.is_dictionary(col.type):
            col = col.cast(col.type.value_type)
        parts.append(col.cast(pa.string()))
    fused = pc.binary_join_element_wise(
        *parts, "\x1f", null_handling="replace",
        null_replacement="\x00\x1eNULL")
    return fused.to_numpy(zero_copy_only=False)


class _RightIndex:
    """Broadcast/bucket index: contiguous per-key slices over globally
    (key, ts)-sorted arrays — fully vectorized construction (numpy
    lexsort; no Python row loops) so a multi-million-row right side
    builds in well under a second."""

    def __init__(self, rt: pa.Table, right_on: list[str], order_by: str | None,
                 descending: bool, payload: list[str]):
        self.order_by = order_by
        self.descending = descending
        self.payload = payload
        keys = _keys_np(rt, right_on)
        # NULL join keys form their OWN join group: the reference keys
        # the right side by storage index, so a NULL-key left row
        # matches NULL-key right rows (fz_ddl/test_luoji.yaml expects
        # actionValue 3 for the NULL-reqId request). Nulls are moved to
        # a suffix slice — None in an object key array would otherwise
        # break lexsort.
        import pandas as pd
        null = pd.isnull(keys)
        if null.any():
            perm = np.concatenate([np.flatnonzero(~null),
                                   np.flatnonzero(null)])
            rt = rt.take(pa.array(perm))
            keys = keys[perm]
        n = rt.num_rows
        nn = n - int(null.sum())  # non-null prefix length
        self._null_lo, self._null_hi = nn, n

        def _emp():
            return np.empty(0, dtype=np.int64)
        # stable sort by (key, ts ascending); ties keep right-table
        # order; asof picks the LAST qualifying row -> max-ts
        # (runner.cc:1957-1966). Prefix and null suffix sort
        # independently (the suffix by ts only).
        if order_by is not None:
            ts = rt[order_by].to_numpy(zero_copy_only=False)
            o1 = (np.lexsort((np.arange(nn), ts[:nn], keys[:nn]))
                  if nn else _emp())
            o2 = nn + (np.lexsort((np.arange(n - nn), ts[nn:]))
                       if n > nn else _emp())
        else:
            ts = None
            o1 = (np.lexsort((np.arange(nn), keys[:nn]))
                  if nn else _emp())
            o2 = nn + np.arange(n - nn, dtype=np.int64)
        order = np.concatenate([o1, o2]) if n else _emp()
        keys_s = keys[order]
        self.ts = ts[order] if ts is not None else None
        self.rows = {c: rt[c].to_numpy(zero_copy_only=False)[order]
                     for c in payload}
        # numpy degrades nullable int/bool columns to float/object —
        # remember the Arrow types so the emit side restores them
        self.row_types = {c: rt.schema.field(c).type for c in payload}
        self.key_rows = {k: rt[k].to_numpy(zero_copy_only=False)[order]
                         for k in right_on} \
            if any(k not in payload for k in right_on) else {}
        kp = keys_s[:nn]  # searchable non-null prefix
        bounds = np.flatnonzero(kp[1:] != kp[:-1]) + 1 if nn else \
            np.empty(0, dtype=np.int64)
        # array-form index (sorted uniq + slice bounds): ships through
        # the object store as zero-copy numpy buffers (a dict of keys
        # would re-pickle per task) and lookups are one searchsorted
        self.starts = (np.concatenate(([0], bounds)) if nn
                       else bounds).astype(np.int64)
        self.ends = (np.concatenate((bounds, [nn])) if nn
                     else bounds).astype(np.int64)
        self.uniq = kp[self.starts] if nn else kp

    def locate(self, keys: np.ndarray):
        """Vectorized key -> (lo, hi, matched); NULL left keys match
        the right side's NULL-key group (reference index semantics)."""
        import pandas as pd
        null = pd.isnull(keys)
        has_null = bool(null.any())
        if has_null:
            keys = keys.copy()
            keys[null] = self.uniq[0] if len(self.uniq) else 0
        if len(self.uniq):
            pos = np.searchsorted(self.uniq, keys)
            pos_c = np.clip(pos, 0, len(self.uniq) - 1)
            matched = np.asarray(self.uniq[pos_c] == keys)
            lo, hi = self.starts[pos_c], self.ends[pos_c]
        else:  # right side empty or all-NULL keys
            matched = np.zeros(len(keys), bool)
            lo = np.zeros(len(keys), np.int64)
            hi = np.zeros(len(keys), np.int64)
        if has_null:
            if not lo.flags.writeable or len(self.uniq) == 0:
                lo, hi = lo.copy(), hi.copy()
            lo[null] = self._null_lo
            hi[null] = self._null_hi
            matched[null] = self._null_hi > self._null_lo
        return lo, hi, matched

    def right_col(self, c: str) -> np.ndarray:
        if c in self.rows:
            return self.rows[c]
        return self.key_rows[c]


def _ragged_arange(counts: np.ndarray) -> np.ndarray:
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(counts)
    return np.arange(total, dtype=np.int64) - np.repeat(ends - counts, counts)


def _select_with_condition(batch: pa.Table, idx: "_RightIndex",
                           lo: np.ndarray, end: np.ndarray,
                           descending: bool,
                           condition: Condition) -> np.ndarray:
    """Expand candidate slices, evaluate the predicate vectorized over
    every (left, right) candidate pair, keep the LAST passing row per
    left row (respecting the order direction)."""
    counts = np.maximum(end - lo, 0)
    left_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    right_pos = np.repeat(lo, counts) + _ragged_arange(counts)
    lcols = {c: batch[c].to_numpy(zero_copy_only=False)[left_idx]
             for c in batch.column_names}
    rcols = {c: idx.right_col(c)[right_pos]
             for c in (set(idx.rows) | set(idx.key_rows))}
    if idx.ts is not None:
        rcols[idx.order_by] = idx.ts[right_pos]
    ok = np.asarray(condition(lcols, rcols), dtype=bool)
    sel = np.full(len(counts), -1, dtype=np.int64)
    if ok.any():
        # last passing candidate per left row: max right_pos for asc
        # (slices are ts-ascending), min for desc
        score = np.where(ok, right_pos, -1)
        nonzero = counts > 0
        if descending:
            big = np.iinfo(np.int64).max
            score = np.where(ok, right_pos, big)
            mins = np.minimum.reduceat(score, np.cumsum(counts)[nonzero]
                                       - counts[nonzero])
            sel[nonzero] = np.where(mins == big, -1, mins)
        else:
            maxs = np.maximum.reduceat(score, np.cumsum(counts)[nonzero]
                                       - counts[nonzero])
            sel[nonzero] = maxs
    return sel


def _broadcast_join_batch(batch: pa.Table, idx: "_RightIndex",
                          on: list[str], left_ts: str | None,
                          suffix: str,
                          condition: Condition | None = None) -> pa.Table:
    """As-of lookup of one left batch against the index — fully
    vectorized (searchsorted key lookup + per-unique-key searchsorted
    as-of; optional predicate over expanded candidates)."""
    n = batch.num_rows
    if len(idx.uniq) == 0:  # empty right side -> all-null payload
        names = list(batch.column_names)
        cols = list(batch.columns)
        for c in idx.payload:
            out_name = c
            while out_name in batch.column_names:
                out_name += suffix  # repeated for multi-way joins
            names.append(out_name)
            t = getattr(idx, "row_types", {}).get(c)
            if t is None:
                try:
                    t = pa.from_numpy_dtype(idx.rows[c].dtype)
                except (pa.ArrowNotImplementedError, TypeError):
                    t = pa.string()
            cols.append(pa.nulls(n, t))
        return pa.table(cols, names=names)
    keys = _keys_np(batch, on)
    lo, hi, matched = idx.locate(keys)
    lo = np.where(matched, lo, 0)
    hi = np.where(matched, hi, 0)

    # upper bound of the qualifying slice (exclusive)
    if idx.ts is not None and left_ts is not None:
        end = np.zeros(n, dtype=np.int64)
        lts = batch[left_ts].to_numpy(zero_copy_only=False)
        m = np.flatnonzero(matched)
        if len(m):
            # group by the index slice START (int64) rather than by key
            # value: same slice <=> same key, and it dodges pandas'
            # C-string hashing, which truncates object strings at an
            # embedded NUL and conflates distinct keys
            uniq_lo, codes = np.unique(lo[m], return_inverse=True)
            for gi, glo in enumerate(uniq_lo.tolist()):
                rows = m[codes == gi]
                ghi = int(hi[rows[0]])
                pos = np.searchsorted(idx.ts[glo:ghi], lts[rows],
                                      side="right")
                end[rows] = glo + pos
    else:
        end = hi

    if condition is not None:
        sel = _select_with_condition(batch, idx, lo, end,
                                     idx.descending, condition)
    else:
        sel = np.full(n, -1, dtype=np.int64)
        has = end > lo
        if idx.ts is not None and left_ts is not None:
            # LAST qualifying under asc order = max ts <= left ts;
            # under desc order = MIN qualifying ts (runner.cc iterates
            # the ordered table and keeps the final match)
            pick = lo if idx.descending else end - 1
            sel[has] = pick[has]
        elif idx.ts is not None:
            pick = lo if idx.descending else end - 1
            sel[has] = pick[has]
        else:
            sel[has] = lo[has]  # first right row in storage order

    hit = sel >= 0
    names = list(batch.column_names)
    cols = list(batch.columns)
    safe = np.where(hit, sel, 0)
    for c in idx.payload:
        vals = idx.rows[c][safe]
        arr = pa.array(vals, from_pandas=True)
        want_t = getattr(idx, "row_types", {}).get(c)
        if want_t is not None and arr.type != want_t:
            # restore the right table's type (numpy degraded nullable
            # ints/bools to float/object on the way through the index)
            arr = arr.cast(want_t, safe=False)
        if not hit.all():
            arr = pa.compute.if_else(pa.array(hit), arr,
                                     pa.nulls(n, arr.type))
        out_name = c
        while out_name in batch.column_names:
            out_name += suffix  # repeated for multi-way joins
        names.append(out_name)
        cols.append(arr)
    return pa.table(cols, names=names)


def _normalize(on, right_on):
    on = [on] if isinstance(on, str) else list(on)
    right_on = on if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on))
    return on, right_on


def last_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str | Sequence[str],
    *,
    right_on: str | Sequence[str] | None = None,
    order_by: str | None = None,
    descending: bool = False,
    left_ts: str | None = None,
    payload: Sequence[str] | None = None,
    suffix: str = "_r",
    broadcast: bool = True,
    num_buckets: int = 64,
    concurrency: int | None = None,
    condition: Condition | None = None,
) -> ray.data.Dataset:
    """LAST JOIN ``left`` with ``right`` on equi-key ``on``.

    - ``order_by``: right-side ts column; pick argmax (or argmin when
      ``descending``) among matches.
    - ``left_ts``: when set (requires ``order_by``), adds the
      point-in-time condition ``right.order_by <= left.left_ts`` and
      picks the latest (asc) / earliest (desc) qualifying right row —
      the as-of join.
    - ``payload``: right columns to carry (default: all minus keys).
    - ``condition``: extra non-equi predicate
      ``fn(left_cols, right_cols) -> bool mask`` evaluated vectorized
      over candidate pairs (dicts of aligned numpy arrays); the last
      passing candidate wins, preserving LAST JOIN order semantics.
    """
    on, right_on = _normalize(on, right_on)
    if payload is None:
        payload = [c for c in right.schema().names if c not in right_on]
    payload = list(payload)

    if broadcast:
        need = list(dict.fromkeys(right_on + ([order_by] if order_by else [])
                                  + payload))
        rt = _collect(right, need)
        index = _RightIndex(rt, right_on, order_by, descending, payload)
        ref = ray.put(index)

        # stateless tasks (elastic, no actor-pool ramp); ray.get of the
        # array-form index is zero-copy from the local object store
        def join_fn(batch: pa.Table) -> pa.Table:
            return _broadcast_join_batch(batch, ray.get(ref), on, left_ts,
                                         suffix, condition)

        return left.map_batches(join_fn, batch_format="pyarrow",
                                batch_size=32768)
    return _shuffle_last_join(left, right, on, right_on, order_by, descending,
                              left_ts, payload, suffix, num_buckets,
                              condition)


def _collect(ds: ray.data.Dataset, columns: list[str]) -> pa.Table:
    sel = ds.select_columns(columns)
    tables = [t for t in
              sel.iter_batches(batch_format="pyarrow", batch_size=1 << 20)]
    if not tables:
        # empty right side: typed empty table (joins emit all-null
        # payload; fz_ddl/test_bank.yaml history tables start empty)
        sch = sel.schema()
        cols = {}
        for nm, ty in zip(sch.names, sch.types):
            if not isinstance(ty, pa.DataType):
                try:
                    ty = pa.from_numpy_dtype(ty)
                except (pa.ArrowNotImplementedError, TypeError):
                    ty = pa.string()
            cols[nm] = pa.array([], ty)
        return pa.table(cols)
    return pa.concat_tables(tables)


# ------------------------------------------------------------- shuffle path

_SIDE = "__side__"
_BUCKET = "__bucket__"


def _shuffle_last_join(left, right, on, right_on, order_by, descending,
                       left_ts, payload, suffix, num_buckets, condition):
    """Hash-bucket both sides on the join key, then run the SAME
    vectorized index kernel per bucket (Arrow blocks end to end).
    Right rows ride in the left key columns + appended right-only
    columns, null-padded so the union is schema-aligned."""
    def _pa_types(schema) -> dict:
        # pandas-block datasets report numpy dtypes; normalize so the
        # null-pad columns below can be built (same dance as _collect)
        out = {}
        for nm, ty in zip(schema.names, schema.types):
            if not isinstance(ty, pa.DataType):
                try:
                    ty = pa.from_numpy_dtype(ty)
                except (pa.ArrowNotImplementedError, TypeError):
                    ty = pa.string()
            out[nm] = ty
        return out

    lschema = left.schema()
    lcols = list(lschema.names)
    ltypes = _pa_types(lschema)
    rschema = right.schema()
    rtypes = _pa_types(rschema)
    rneed = list(dict.fromkeys(right_on + ([order_by] if order_by else [])
                               + payload))
    # right-only columns appended after the left schema, prefixed to
    # dodge collisions inside the shuffle
    rext = [c for c in rneed if c not in right_on]
    rext_named = {c: f"__r_{c}__" for c in rext}

    def tag_left(b: pa.Table) -> pa.Table:
        h = hash_columns(b, on, num_buckets)
        cols = {c: b[c] for c in lcols}
        for c in rext:
            cols[rext_named[c]] = pa.nulls(b.num_rows, rtypes[c])
        t = pa.table(cols)
        return t.append_column(_BUCKET, pa.array(h)).append_column(
            _SIDE, pa.array(np.ones(b.num_rows, dtype=np.int8)))
    tag_left.__name__ = "lj_tag_left"

    def tag_right(b: pa.Table) -> pa.Table:
        b = b.select(rneed)
        h = hash_columns(b, right_on, num_buckets)
        cols = {}
        for c in lcols:
            cols[c] = pa.nulls(b.num_rows, ltypes[c])
        for lk, rk in zip(on, right_on):
            col = b[rk]
            if col.type != ltypes[lk]:
                col = col.cast(ltypes[lk])
            cols[lk] = col
        for c in rext:
            cols[rext_named[c]] = b[c]
        t = pa.table(cols)
        return t.append_column(_BUCKET, pa.array(h)).append_column(
            _SIDE, pa.array(np.zeros(b.num_rows, dtype=np.int8)))
    tag_right.__name__ = "lj_tag_right"

    class BucketJoin:
        __name__ = "bucket_last_join"

        def __call__(self, g: pa.Table) -> pa.Table:
            side = g[_SIDE].to_numpy(zero_copy_only=False)
            lt = g.filter(pa.array(side == 1)).select(lcols)
            rt_raw = g.filter(pa.array(side == 0))
            # reassemble the right table under its own column names
            rcols = {}
            for lk, rk in zip(on, right_on):
                col = rt_raw[lk]
                if col.type != rtypes.get(rk, col.type):
                    col = col.cast(rtypes[rk])
                rcols[rk] = col
            for c in rext:
                rcols[c] = rt_raw[rext_named[c]]
            rt = pa.table(rcols) if rcols else rt_raw.select([])
            idx = _RightIndex(rt, right_on, order_by, descending, payload)
            return _broadcast_join_batch(lt, idx, on, left_ts, suffix,
                                         condition)

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))
    return tagged.groupby(_BUCKET).map_groups(BucketJoin(),
                                              batch_format="pyarrow")
