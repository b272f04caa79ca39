"""Sequence analytics over (entity, ts)-ordered partitions: lag/lead,
sessionize, backfill (forward/backward fill) — the north-rule sugar ops
built on the same partition-and-sort contract as the window runner.

All three are one hash shuffle (``groupby(key)``) + a vectorized
per-group numpy pass; no Python row loops.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from openmldb_ray.io import order_to_int64


class _PerGroup:
    def __init__(self, name, fn, order_by):
        self.__name__ = name
        self.fn = fn
        self.order_by = order_by

    def __call__(self, g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[(self.order_by, "ascending")])
        return self.fn(g.take(order))


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
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)

    def fn(g: pa.Table) -> pa.Table:
        n = g.num_rows
        for out, (src, k) in cols.items():
            col = g[src].combine_chunks()
            if k >= 0:
                shifted = pa.concat_arrays(
                    [pa.nulls(min(k, n), col.type), col.slice(0, max(n - k, 0))])
            else:
                shifted = pa.concat_arrays(
                    [col.slice(-k), pa.nulls(min(-k, n), col.type)])
            g = g.append_column(out, shifted)
        return g

    return ds.groupby(keys).map_groups(_PerGroup("shift", fn, order_by),
                                       batch_format="pyarrow")


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
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)

    def fn(g: pa.Table) -> pa.Table:
        ts = order_to_int64(g[order_by])
        delta = np.diff(ts, prepend=ts[:1])
        new_sess = delta > gap
        new_sess[0] = True if len(new_sess) else False
        sess = np.cumsum(new_sess.astype(np.int64))
        return g.append_column(session_col, pa.array(sess, type=pa.int64()))

    return ds.groupby(keys).map_groups(_PerGroup("sessionize", fn, order_by),
                                       batch_format="pyarrow")


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
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)

    def fn(g: pa.Table) -> pa.Table:
        n = g.num_rows
        for c in cols:
            col = g[c].combine_chunks()
            valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
            if direction == "forward":
                idx = np.where(valid, np.arange(n), -1)
                idx = np.maximum.accumulate(idx)
            else:
                idx = np.where(valid, np.arange(n), n)
                idx = np.minimum.accumulate(idx[::-1])[::-1]
                idx = np.where(idx == n, -1, idx)
            filled = col.take(pa.array(np.where(idx < 0, 0, idx),
                                       type=pa.int64()))
            out = pc.if_else(pa.array(idx >= 0), filled,
                             pa.nulls(n, col.type))
            g = g.append_column(c + suffix, out)
        return g

    return ds.groupby(keys).map_groups(_PerGroup("backfill", fn, order_by),
                                       batch_format="pyarrow")
