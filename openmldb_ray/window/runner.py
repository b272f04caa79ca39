"""Dataset-level window aggregation.

Execution shape (the Ray-Data re-expression of the reference's
``repartition(hash(partition_by)) -> sortWithinPartitions ->
mapPartitions(WindowComputer)``, java/openmldb-batch
nodes/WindowAggPlan.scala:53-191):

1. prune to the needed columns (keys + order + aggregands + passthrough);
2. tag WINDOW UNION secondaries (``__tag__=0``) and union them in
   (WindowAggPlanUtil.scala:41-92 requires schema equality);
3. add a deterministic hash-bucket column over the partition keys —
   ONE all-to-all shuffle (``groupby(bucket)``), bucket count chosen so
   a bucket fits in a worker's heap at the target scale;
4. per bucket: stable sort by (keys, ts, tag) — union rows sort before
   primary rows at equal ts because the reference buffers union rows
   before projecting the instance row (runner.cc:1521-1541) — then run
   the vectorized kernel over each contiguous entity run;
5. emit one output row per primary input row (rows with NULL/negative
   order keys dropped, WindowAggPlan.scala:783-791).

Skew note (designed for 100 TB): the bucket column is a pure hash of
the entity key, so a hot key lands in one bucket. ``skew.salted_window_agg``
layers the reference's quantile-salting + history-replication scheme
(WindowAggPlan.scala:194-314) on top of this runner for hot keys.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from openmldb_ray.io import column_to_float, hash_columns, order_to_int64
from openmldb_ray.window.kernel import eval_aggs
from openmldb_ray.window.spec import Agg, WindowSpec

_TAG = "__tag__"
_BUCKET = "__bucket__"

_INT_FUNCS = {"count", "count_where", "distinct_count", "row_number"}


def _needed_columns(spec: WindowSpec, aggs: Sequence[Agg],
                    passthrough: Sequence[str]) -> list[str]:
    cols = list(dict.fromkeys(
        list(spec.keys) + [spec.order_by]
        + [a.col for a in aggs if a.col]
        + [a.where for a in aggs if a.where]
        + list(passthrough)
    ))
    return cols


class _BucketWindow:
    """Per-bucket window computation (stateless; used via map_groups)."""

    def __init__(self, spec: WindowSpec, aggs: list[Agg],
                 passthrough: list[str], has_union: bool):
        self.spec = spec
        self.aggs = aggs
        self.passthrough = passthrough
        self.has_union = has_union
        self.__name__ = "bucket_window_agg"  # Ray's map_groups wrapper wants one

    def __call__(self, group: pa.Table) -> pa.Table:
        spec, aggs = self.spec, self.aggs
        if _BUCKET in group.column_names:
            group = group.drop_columns([_BUCKET])
        ts_raw = order_to_int64(group[spec.order_by])
        # reference drops NULL / negative order keys
        keep = ts_raw >= 0
        if not keep.all():
            group = group.filter(pa.array(keep))
            ts_raw = ts_raw[keep]
        n = group.num_rows
        if n == 0:
            return self._empty_table(group)

        sort_keys = [(k, "ascending") for k in spec.keys]
        sort_keys.append((spec.order_by, "ascending"))
        if self.has_union:
            sort_keys.append((_TAG, "ascending"))
        order = pc.sort_indices(group, sort_keys=sort_keys)
        group = group.take(order)
        ts = order_to_int64(group[spec.order_by])

        if self.has_union:
            is_primary = group[_TAG].to_numpy(zero_copy_only=False).astype(bool)
        else:
            is_primary = np.ones(n, dtype=bool)

        # contiguous entity runs within the sorted bucket
        run_id = _run_ids(group, spec.keys)
        boundaries = np.flatnonzero(np.diff(run_id)) + 1
        starts = np.concatenate(([0], boundaries, [n]))

        value_cols = sorted({a.col for a in aggs if a.col}
                            | {a.where for a in aggs if a.where})
        full_vals = {c: column_to_float(group[c]) for c in value_cols}

        outs = {a.name: np.full(n, np.nan) for a in aggs}
        for i in range(len(starts) - 1):
            lo, hi = int(starts[i]), int(starts[i + 1])
            vals = {c: v[lo:hi] for c, v in full_vals.items()}
            res = eval_aggs(ts[lo:hi], vals, aggs, spec,
                            is_primary=is_primary[lo:hi])
            for name, arr in res.items():
                outs[name][lo:hi] = arr

        mask = pa.array(is_primary)
        cols, names = [], []
        for c in self.passthrough:
            names.append(c)
            cols.append(group[c].filter(mask) if not is_primary.all()
                        else group[c])
        for a in aggs:
            names.append(a.name)
            arr = outs[a.name][is_primary]
            if a.func in _INT_FUNCS:
                cols.append(pa.array(np.nan_to_num(arr).astype(np.int64)))
            else:
                cols.append(pa.array(arr, type=pa.float64(),
                                     from_pandas=True))
        return pa.table(cols, names=names)

    def _empty_table(self, group: pa.Table) -> pa.Table:
        cols, names = [], []
        for c in self.passthrough:
            names.append(c)
            cols.append(group[c])
        for a in self.aggs:
            names.append(a.name)
            t = pa.int64() if a.func in _INT_FUNCS else pa.float64()
            cols.append(pa.array([], type=t))
        return pa.table(cols, names=names)


def _run_ids(group: pa.Table, keys: Sequence[str]) -> np.ndarray:
    """Integer run id per row for contiguous equal partition keys."""
    n = group.num_rows
    change = np.zeros(n, dtype=bool)
    for k in keys:
        col = group[k].combine_chunks()
        eq = pc.equal(col.slice(1), col.slice(0, n - 1))
        neq = pc.fill_null(pc.invert(eq), True).to_numpy(zero_copy_only=False)
        nulls_flip = pc.xor(col.slice(1).is_null(),
                            col.slice(0, n - 1).is_null())
        neq = neq | nulls_flip.to_numpy(zero_copy_only=False)
        change[1:] |= neq
    return np.cumsum(change)


def window_agg(
    ds: ray.data.Dataset,
    spec: WindowSpec,
    aggs: Sequence[Agg],
    *,
    union_ds: Sequence[ray.data.Dataset] = (),
    passthrough: Sequence[str] | None = None,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Windowed aggregation over a Dataset; one output row per input row
    (minus dropped NULL/negative order keys).

    ``passthrough``: input columns carried to the output (defaults to
    keys + order column). Project heavy payload columns (token arrays)
    OUT of passthrough and re-join them on a row id afterwards — bytes
    shuffled here are bytes moved across the whole cluster.
    """
    aggs = list(aggs)
    if passthrough is None:
        passthrough = list(spec.keys) + [spec.order_by]
    passthrough = list(passthrough)
    cols = _needed_columns(spec, aggs, passthrough)
    has_union = len(union_ds) > 0

    def prep(tag: int):
        def fn(batch: pa.Table) -> pa.Table:
            batch = batch.select(cols)
            if has_union:
                batch = batch.append_column(
                    _TAG, pa.array(np.full(batch.num_rows, tag, dtype=np.int8)))
            b = hash_columns(batch, list(spec.keys), num_buckets)
            return batch.append_column(_BUCKET, pa.array(b))
        return fn

    main = ds.map_batches(prep(1), batch_format="pyarrow")
    for u in union_ds:
        main = main.union(u.map_batches(prep(0), batch_format="pyarrow"))

    fn = _BucketWindow(spec, aggs, passthrough, has_union)
    return main.groupby(_BUCKET).map_groups(fn, batch_format="pyarrow")
