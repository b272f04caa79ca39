"""LAST JOIN — OpenMLDB's point-in-time / as-of join.

Semantics (reference: JoinGenerator::RowLastJoinTable,
hybridse/src/vm/runner.cc:1925-1976; batch impl
java/openmldb-batch nodes/JoinPlan.scala:39-202):

- left outer; exactly ONE right row per left row;
- without ORDER BY: the first matching right row in right-table order;
- with ORDER BY ts: the match with max ts (asc) / min ts (desc);
- optional point-in-time condition ``right.ts <= left.ts`` (the as-of
  constraint — zero temporal leakage);
- unmatched left rows keep right-side NULLs.

Two execution paths:

- **broadcast** (default when the right side is small): materialize the
  right side once, ``ray.put`` it, and do a vectorized per-key
  ``searchsorted`` as-of lookup inside ``map_batches`` — the big left
  side never shuffles. This is the 100 TB-friendly path for dimension
  tables.
- **shuffle**: tag + union both sides, hash-``groupby`` on the join
  key, per-group sorted as-of merge — for large right sides.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from openmldb_ray.io import hash_columns


def _normalize(on, right_on):
    on = [on] if isinstance(on, str) else list(on)
    right_on = on if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on))
    return on, right_on


class _RightIndex:
    """Driver-built broadcast index: key -> (sorted ts array, payload rows)."""

    def __init__(self, rt: pa.Table, right_on: list[str], order_by: str | None,
                 descending: bool, payload: list[str]):
        df = rt.to_pandas()
        self.order_by = order_by
        self.payload = payload
        if order_by is not None:
            # stable sort: ties keep right-table order; asof picks the
            # LAST qualifying row -> max-ts (asc) per runner.cc:1957-1966
            df = df.sort_values(order_by, kind="stable",
                                ascending=not descending)
            df = df.reset_index(drop=True)
        key = np.empty(len(df), dtype=object)
        key[:] = list(map(tuple, df[right_on].itertuples(index=False)))
        self.groups: dict[tuple, dict] = {}
        df_idx = np.arange(len(df))
        gb = pd.Series(df_idx).groupby(pd.Series(key), sort=False)
        ts_all = (df[order_by].to_numpy() if order_by is not None else None)
        pay_all = {c: df[c].to_numpy() for c in payload}
        for k, idxs in gb.groups.items():
            idxs = np.asarray(idxs)
            g = {"rows": {c: pay_all[c][idxs] for c in payload}}
            if ts_all is not None:
                g["ts"] = ts_all[idxs]
            self.groups[k if isinstance(k, tuple) else (k,)] = g


class _BroadcastLastJoin:
    """Actor-pool batch fn: as-of lookup against the broadcast index."""

    def __init__(self, index_ref, on: list[str], left_ts: str | None,
                 suffix: str):
        self.index: _RightIndex = ray.get(index_ref) if not isinstance(
            index_ref, _RightIndex) else index_ref
        self.on = on
        self.left_ts = left_ts
        self.suffix = suffix

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = self.index
        n = batch.num_rows
        keydf = batch.select(self.on).to_pandas()
        keys = list(map(tuple, keydf.itertuples(index=False)))
        lts = (batch[self.left_ts].to_pandas().to_numpy()
               if self.left_ts is not None else None)
        # chosen right row index per left row, -1 = no match
        out_cols = {}
        pick: dict[tuple, np.ndarray] = {}
        sel = np.full(n, -1, dtype=np.int64)
        grp_of = np.full(n, -1, dtype=np.int64)
        grp_list = []
        for i, k in enumerate(keys):
            g = idx.groups.get(k)
            if g is None:
                continue
            gi = pick.get(k)
            if gi is None:
                pick[k] = np.int64(len(grp_list))
                grp_list.append(g)
            grp_of[i] = pick[k]
        for gi, g in enumerate(grp_list):
            rows_here = np.flatnonzero(grp_of == gi)
            if "ts" in g and lts is not None:
                # last right row with right.ts <= left.ts
                pos = np.searchsorted(g["ts"], lts[rows_here], side="right") - 1
                ok = pos >= 0
                sel[rows_here[ok]] = pos[ok]
            elif "ts" in g:
                sel[rows_here] = len(g["ts"]) - 1  # max-ts row
            else:
                sel[rows_here] = 0  # first right row in storage order
        matched = sel >= 0
        names = list(batch.column_names)
        cols = list(batch.columns)
        for c in idx.payload:
            vals = np.empty(n, dtype=object)
            vals[:] = None
            for gi, g in enumerate(grp_list):
                rows_here = np.flatnonzero((grp_of == gi) & matched)
                if len(rows_here):
                    vals[rows_here] = g["rows"][c][sel[rows_here]]
            out_name = c + self.suffix if c in batch.column_names else c
            names.append(out_name)
            cols.append(pa.array(vals.tolist()))
        return pa.table(cols, names=names)


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
) -> ray.data.Dataset:
    """LAST JOIN ``left`` with ``right`` on equi-key ``on``.

    - ``order_by``: right-side ts column; pick argmax (or argmin when
      ``descending``) among matches.
    - ``left_ts``: when set (requires ``order_by``), adds the
      point-in-time condition ``right.order_by <= left.left_ts`` and
      picks the latest qualifying right row — the as-of join.
    - ``payload``: right columns to carry (default: all minus keys).
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
        from openmldb_ray.context import pool_concurrency
        return left.map_batches(
            _BroadcastLastJoin, batch_format="pyarrow",
            fn_constructor_args=(ref, on, left_ts, suffix),
            concurrency=concurrency or pool_concurrency())
    return _shuffle_last_join(left, right, on, right_on, order_by, descending,
                              left_ts, payload, suffix, num_buckets)


def _collect(ds: ray.data.Dataset, columns: list[str]) -> pa.Table:
    tables = [t for t in ds.select_columns(columns)
              .iter_batches(batch_format="pyarrow", batch_size=1 << 20)]
    if not tables:
        raise ValueError("empty right side")
    return pa.concat_tables(tables)


# ------------------------------------------------------------- shuffle path

_SIDE = "__side__"


def _shuffle_last_join(left, right, on, right_on, order_by, descending,
                       left_ts, payload, suffix, num_buckets):
    """Hash-bucket both sides on the join key, then per-bucket
    pandas merge picking the last qualifying right row per left row."""
    lcols = left.schema().names

    def tag_left(b: pa.Table) -> pa.Table:
        h = hash_columns(b, on, num_buckets)
        return b.append_column("__bucket__", pa.array(h)).append_column(
            _SIDE, pa.array(np.ones(b.num_rows, dtype=np.int8)))

    rneed = list(dict.fromkeys(right_on + ([order_by] if order_by else [])
                               + payload))

    def tag_right(b: pa.Table) -> pa.Table:
        b = b.select(rneed)
        # align schema: right rows carry only their columns; left columns null
        h = hash_columns(b, right_on, num_buckets)
        return b.append_column("__bucket__", pa.array(h)).append_column(
            _SIDE, pa.array(np.zeros(b.num_rows, dtype=np.int8)))

    class BucketJoin:
        __name__ = "bucket_last_join"

        def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
            lg = g[g[_SIDE] == 1]
            rg = g[g[_SIDE] == 0]
            lg = lg[[c for c in lcols]]
            out = lg.copy()
            rcols = {c: (c + suffix if c in lcols else c) for c in payload}
            if len(rg) == 0:
                for c in payload:
                    out[rcols[c]] = None
                return out
            rg = rg[rneed]
            if order_by is not None:
                rg = rg.sort_values(order_by, kind="stable",
                                    ascending=not descending)
            if left_ts is not None and order_by is not None:
                idx = _RightIndex(pa.Table.from_pandas(rg), right_on,
                                  order_by, descending, payload)
                joiner = _BroadcastLastJoin(idx, on, left_ts, suffix)
                return joiner(pa.Table.from_pandas(lg)).to_pandas()
            # keep the last (max-ts) or first (storage order) match per key
            keep = rg.groupby(right_on, sort=False).tail(1) if order_by \
                else rg.groupby(right_on, sort=False).head(1)
            ren = {c: (c + suffix if c in lcols else c) for c in keep.columns}
            keep = keep.rename(columns=ren)
            rkeys = [ren[r] for r in right_on]
            merged = out.merge(keep, left_on=on, right_on=rkeys, how="left")
            want = list(lcols) + [rcols[c] for c in payload]
            return merged[[c for c in want]]

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))
    # BucketJoin already projects away __bucket__/__side__
    return tagged.groupby("__bucket__").map_groups(BucketJoin(),
                                                   batch_format="pandas")
