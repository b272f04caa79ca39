"""Dataset-level window aggregation.

Execution shape (the Ray-Data re-expression of the reference's
``repartition(hash(partition_by)) -> sortWithinPartitions ->
mapPartitions(WindowComputer)``, java/openmldb-batch
nodes/WindowAggPlan.scala:53-191):

1. prune to the needed columns (keys + order + aggregands + passthrough);
2. tag WINDOW UNION secondaries (``__tag__=0``) and union them in
   (WindowAggPlanUtil.scala:41-92 requires schema equality);
3. ONE all-to-all exchange: key-based ``repartition(num_buckets,
   keys=partition_by)`` under the HASH_SHUFFLE strategy (each entity
   lands in exactly one block — integrity stress-tested far past
   target_max_block_size); on sort-shuffle nodes, fall back to a
   deterministic hash-bucket column + ``groupby(bucket).map_groups``;
   bucket count chosen so a bucket fits a worker's heap at the target
   scale (context.default_num_buckets);
4. per bucket/block: stable sort by (keys, sort_cols, tag) — union
   rows sort before primary rows at equal ts because the reference
   buffers union rows before projecting the instance row
   (runner.cc:1521-1541) — then run the vectorized kernel over each
   contiguous entity run;
5. emit one output row per primary input row (rows with NULL/negative
   order keys dropped, WindowAggPlan.scala:783-791).

``window_agg_multi`` evaluates SEVERAL window specs sharing the same
partition keys in the single shuffle (the reference needs ConcatJoin
window-parallelization for this; columnar batches make it free), and
accepts a per-run ``run_transform`` so derived order axes (e.g. the
corpus position axis = running token offset) are computed inside the
same pass instead of a separate shuffle.

Skew note (designed for 100 TB): the bucket column is a pure hash of
the entity key, so a hot key lands in one bucket.
``skew.salted_window_agg`` layers the reference's salting + history-
replication scheme (WindowAggPlan.scala:194-314) on top for hot keys.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from openmldb_ray.io import (column_to_exact, column_to_float,
                             hash_columns, order_to_int64)
from openmldb_ray.window.kernel import eval_aggs
from openmldb_ray.window.spec import Agg, WindowSpec

_TAG = "__tag__"
_BUCKET = "__bucket__"

_INT_FUNCS = {"count", "count_where", "distinct_count", "row_number",
              "count__split", "distinct_count__split"}
_STR_FUNCS = {"top", "topn_frequency", "fz_topn_frequency", "sum_cate",
              "count_cate", "avg_cate", "min_cate", "max_cate",
              "sum_cate_where", "count_cate_where", "avg_cate_where",
              "min_cate_where", "max_cate_where",
              "top_n_key_sum_cate_where", "top_n_key_count_cate_where",
              "top_n_key_avg_cate_where", "top_n_key_min_cate_where",
              "top_n_key_max_cate_where", "fz_join",
              "fz_join__split", "topn_frequency__split"}
_LIST_FUNCS = {"fz_window_split", "fz_window_split_by_key",
               "fz_window_split_by_value"}
# value-passing funcs inherit string-ness from their input column
_VALUE_FUNCS = {"min", "max", "min_where", "max_where", "lag", "lead",
                "at", "first_value", "last_value_in_frame",
                "last_value_ignore_nulls"}


def _value_out_type(a: Agg, schema: pa.Schema | None) -> pa.DataType | None:
    """For value-passing funcs over columns whose values must not
    round-trip through float64 (strings; temporals — microseconds are
    lossy above 2**53), the preserved output type; else None."""
    if schema is None or a.col is None or a.func not in _VALUE_FUNCS:
        return None
    if a.col not in schema.names:
        return None
    t = schema.field(a.col).type
    if pa.types.is_string(t) or pa.types.is_large_string(t) \
            or pa.types.is_binary(t):
        return pa.string()
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return t
    return None


_SUM_FUNCS = {"sum", "sum_zero", "sum_where", "sum_zero_where"}


def sum_source_type(a: Agg, schema: pa.Schema | None) -> pa.DataType | None:
    """Integer sums keep the source column's width and WRAP on overflow
    like the reference (test_window.yaml id 21); returns that type, or
    None when the agg is not an integer sum."""
    if a.func in _SUM_FUNCS and schema is not None and a.col \
            and a.col in schema.names:
        t = schema.field(a.col).type
        if pa.types.is_integer(t):
            return t
    return None


def emit_wrapped_int_sum(arr: np.ndarray, st: pa.DataType) -> pa.Array:
    """float64 sums (NaN = NULL) -> the source integer type, wrapping
    on overflow via the matching numpy width."""
    fa = np.asarray(arr, dtype=np.float64)
    mask = np.isnan(fa)
    wrapped = np.nan_to_num(fa).astype(np.int64).astype(
        {2: np.int16, 4: np.int32}.get(st.bit_width // 8, np.int64))
    pa_arr = pa.array(wrapped.astype(np.int64))
    if mask.any():
        pa_arr = pc.if_else(pa.array(mask), pa.scalar(None, pa.int64()),
                            pa_arr)
    return pa_arr.cast(st, safe=False)


def _agg_type(a: Agg, schema: pa.Schema | None = None) -> pa.DataType:
    if a.func in _INT_FUNCS:
        return pa.int64()
    if a.func in _STR_FUNCS:
        return pa.string()
    vt = _value_out_type(a, schema)
    if vt is not None:
        return vt
    if a.func in _LIST_FUNCS:
        return pa.list_(pa.string())
    st = sum_source_type(a, schema)
    if st is not None:
        return st
    return pa.float64()


class _BucketWindow:
    """Per-bucket window computation (used via groupby().map_groups)."""

    def __init__(self, specs_aggs, passthrough, has_union, sort_cols,
                 run_transform, drop_invalid_order):
        self.specs_aggs: list[tuple[WindowSpec, list[Agg]]] = specs_aggs
        self.passthrough = passthrough
        self.has_union = has_union
        self.sort_cols = sort_cols
        self.run_transform = run_transform
        self.drop_invalid_order = drop_invalid_order
        self.keys = specs_aggs[0][0].keys
        self.__name__ = "bucket_window_agg"  # Ray's map_groups wants one

    def __call__(self, group: pa.Table) -> pa.Table:
        if _BUCKET in group.column_names:
            group = group.drop_columns([_BUCKET])
        if self.drop_invalid_order:
            ts_raw = order_to_int64(group[self.sort_cols[0]])
            keep = ts_raw >= 0
            if not keep.all():
                group = group.filter(pa.array(keep))
        n = group.num_rows
        if n == 0:
            return self._empty_table(group)

        sort_keys = [(k, "ascending") for k in self.keys]
        sort_keys += [(c, "ascending") for c in self.sort_cols]
        if self.has_union:
            sort_keys.append((_TAG, "ascending"))
        group = group.take(pc.sort_indices(group, sort_keys=sort_keys))

        if self.has_union:
            is_primary = group[_TAG].to_numpy(
                zero_copy_only=False) == 0
        else:
            is_primary = np.ones(n, dtype=bool)

        run_id = _run_ids(group, self.keys)
        boundaries = np.flatnonzero(np.diff(run_id)) + 1
        starts = np.concatenate(([0], boundaries, [n])).astype(np.int64)

        all_aggs = [a for _, aggs in self.specs_aggs for a in aggs]
        schema = group.schema
        outs = {a.name: (np.full(n, None, dtype=object)
                         if a.func in _STR_FUNCS or a.func in _LIST_FUNCS
                         or _value_out_type(a, schema) is not None
                         else np.full(n, np.nan))
                for a in all_aggs}
        # columns consumed ONLY by value-preserving funcs over exact
        # types ride as object arrays (no float64 round trip)
        exact_cols = {a.col for a in all_aggs
                      if _value_out_type(a, schema) is not None
                      and not pa.types.is_string(_value_out_type(a, schema))}
        exact_cols -= {a.col for a in all_aggs
                       if a.col and _value_out_type(a, schema) is None}
        def kind_of(t: pa.DataType) -> str:
            if pa.types.is_floating(t):
                return "float"
            if pa.types.is_timestamp(t):
                return "ts"
            if pa.types.is_date(t):
                return "date"
            if pa.types.is_boolean(t):
                return "bool"
            if pa.types.is_string(t) or pa.types.is_large_string(t) \
                    or pa.types.is_binary(t):
                return "str"
            return "int"
        col_kinds = {f.name: kind_of(f.type) for f in schema}

        out_tables = []
        for i in range(len(starts) - 1):
            lo, hi = int(starts[i]), int(starts[i + 1])
            run = group.slice(lo, hi - lo)
            if self.run_transform is not None:
                run = self.run_transform(run)
            value_cols = sorted({a.col for a in all_aggs if a.col}
                                | {a.where for a in all_aggs if a.where}
                                | {a.cate for a in all_aggs if a.cate}
                                | {c for a in all_aggs
                                   if a.func.endswith("__nexpr")
                                   for c in a.params[2]})
            vals = {c: (column_to_exact(run[c]) if c in exact_cols
                        else column_to_float(run[c]))
                    for c in value_cols}
            for spec, aggs in self.specs_aggs:
                ts = order_to_int64(run[spec.order_by])
                # the kernel's searchsorted frame bounds require an
                # ascending axis; a secondary spec whose order_by is
                # not monotone under sort_cols (or a run_transform
                # emitting a non-monotone axis) must fail loudly, not
                # return silently-wrong frames
                if len(ts) > 1 and np.any(np.diff(ts) < 0):
                    raise ValueError(
                        f"order axis {spec.order_by!r} is not "
                        f"non-decreasing under sort_cols="
                        f"{self.sort_cols}; all specs' order_by must "
                        "be monotone under the shared per-run sort")
                res = eval_aggs(ts, vals, aggs, spec,
                                is_primary=is_primary[lo:hi],
                                col_kinds=col_kinds)
                for name, arr in res.items():
                    outs[name][lo:hi] = arr
            if self.run_transform is not None:
                out_tables.append(run)
        table = (pa.concat_tables(out_tables) if out_tables else group)

        mask = pa.array(is_primary)
        all_prim = bool(is_primary.all())
        cols, names = [], []
        for c in self.passthrough:
            names.append(c)
            cols.append(table[c] if all_prim else table[c].filter(mask))
        for a in all_aggs:
            if a.name.startswith("__h"):
                continue  # hidden nested-agg scalar, kernel-internal
            names.append(a.name)
            arr = outs[a.name][is_primary]
            vt = _value_out_type(a, schema)
            if a.func in _INT_FUNCS:
                cols.append(pa.array(np.nan_to_num(
                    arr.astype(np.float64)).astype(np.int64)))
            elif a.func in _STR_FUNCS or vt == pa.string():
                cols.append(pa.array(arr.tolist(), type=pa.string()))
            elif vt is not None:
                # exact ints (epoch us / days) -> the original temporal
                # type; if the source column fell back to float (shared
                # with a numeric agg), convert losslessly-as-possible
                vals_list = [None if x is None
                             or (isinstance(x, float) and np.isnan(x))
                             else int(x) for x in arr.tolist()]
                cols.append(pa.array(vals_list, type=pa.int64())
                            .cast(pa.int32()).cast(vt)
                            if pa.types.is_date32(vt)
                            else pa.array(vals_list, type=vt))
            elif a.func in _LIST_FUNCS:
                cols.append(pa.array(arr.tolist(),
                                     type=pa.list_(pa.string())))
            elif (st := sum_source_type(a, schema)) is not None:
                cols.append(emit_wrapped_int_sum(arr, st))
            else:
                cols.append(pa.array(arr, type=pa.float64(),
                                     from_pandas=True))
        return pa.table(cols, names=names)

    def _empty_table(self, group: pa.Table) -> pa.Table:
        cols, names = [], []
        for c in self.passthrough:
            names.append(c)
            cols.append(group[c] if c in group.column_names
                        else pa.array([], type=pa.int64()))
        for _, aggs in self.specs_aggs:
            for a in aggs:
                if a.name.startswith("__h"):
                    continue
                names.append(a.name)
                cols.append(pa.array([], type=_agg_type(a, group.schema)))
        return pa.table(cols, names=names)


def _run_ids(group: pa.Table, keys: Sequence[str]) -> np.ndarray:
    """Integer run id per row for contiguous equal partition keys."""
    n = group.num_rows
    change = np.zeros(n, dtype=bool)
    for k in keys:
        col = group[k].combine_chunks()
        eq = pc.equal(col.slice(1), col.slice(0, n - 1))
        # NULL partition keys group together (test_window.yaml id 15):
        # null-vs-null is NOT a run boundary, null-vs-value is
        neq = pc.fill_null(pc.invert(eq), False).to_numpy(
            zero_copy_only=False)
        nulls_flip = pc.xor(col.slice(1).is_null(),
                            col.slice(0, n - 1).is_null())
        neq = neq | nulls_flip.to_numpy(zero_copy_only=False)
        change[1:] |= neq
    return np.cumsum(change)


def window_agg_multi(
    ds: ray.data.Dataset,
    specs_aggs: Sequence[tuple[WindowSpec, Sequence[Agg]]],
    *,
    union_ds: Sequence[ray.data.Dataset] = (),
    passthrough: Sequence[str] | None = None,
    num_buckets: int | None = None,
    sort_cols: Sequence[str] | None = None,
    run_transform: Callable[[pa.Table], pa.Table] | None = None,
    input_cols: Sequence[str] | None = None,
    key_buckets: dict | None = None,
) -> ray.data.Dataset:
    """Evaluate several window specs (same partition keys) in ONE
    shuffle. See ``window_agg`` for the single-spec sugar.

    ``sort_cols``: per-run sort order (default: first spec's order_by).
    ``run_transform``: applied to each sorted entity run BEFORE
    aggregation — may append derived columns (e.g. a cumulative
    position axis later used as an order_by). When set, NULL/negative
    order-key dropping is skipped (the transform owns axis validity)
    and ``input_cols`` must list the physical columns to shuffle.
    ``key_buckets``: explicit key-value -> bucket-id map (single
    partition key only; see ``skew.pack_key_buckets``) replacing the
    hash assignment — balanced shuffle partitions by construction.
    Unknown keys fall back to hash % num_buckets.
    """
    if num_buckets is None:
        # sized to the INPUT when source metadata allows (a 100k-row
        # job at 2x-cpus partitions pays ~2 s of pure partition setup);
        # raise explicitly for data where a partition would exceed
        # ~1-2 GB (100 TB: buckets ~ bytes/1GB).
        from openmldb_ray.context import default_num_buckets
        num_buckets = default_num_buckets(ds=ds)
    specs_aggs = [(s, list(a)) for s, a in specs_aggs]
    keys = specs_aggs[0][0].keys
    for s, _ in specs_aggs:
        if s.keys != keys:
            raise ValueError("all specs must share partition_by")
    sort_cols = list(sort_cols or [specs_aggs[0][0].order_by])
    if passthrough is None:
        passthrough = list(keys) + sort_cols
    passthrough = list(passthrough)

    if input_cols is None:
        input_cols = list(dict.fromkeys(
            list(keys) + sort_cols
            + [s.order_by for s, _ in specs_aggs]
            + [a.col for _, aggs in specs_aggs for a in aggs if a.col]
            + [a.where for _, aggs in specs_aggs for a in aggs if a.where]
            + [a.cate for _, aggs in specs_aggs for a in aggs if a.cate]
            + [c for _, aggs in specs_aggs for a in aggs
               if a.func.endswith("__nexpr") for c in a.params[2]]
            + passthrough))
    input_cols = list(input_cols)
    has_union = len(union_ds) > 0

    if not key_buckets:
        key_buckets = None
    if key_buckets is not None:
        if len(keys) != 1:
            raise ValueError("key_buckets requires a single partition key")
        kb_keys = np.array(sorted(key_buckets, key=str))
        kb_vals = np.array([key_buckets[k] for k in kb_keys],
                           dtype=np.int32)
        num_buckets = max(num_buckets, int(kb_vals.max()) + 1)

    def _assign_buckets(batch: pa.Table) -> pa.Table:
        kv = batch[keys[0]].to_numpy(zero_copy_only=False)
        idx = np.clip(np.searchsorted(kb_keys, kv), 0, len(kb_keys) - 1)
        bk = kb_vals[idx].copy()
        miss = kb_keys[idx] != kv
        if miss.any():
            import pandas as pd
            bk[miss] = (pd.util.hash_array(np.asarray(kv[miss]))
                        % num_buckets).astype(np.int32)
        return batch.append_column(_BUCKET, pa.array(bk))

    def prep(tag: int):
        def fn(batch: pa.Table) -> pa.Table:
            batch = batch.select(input_cols)
            if batch.schema.metadata:  # keep schemas hashable for the
                batch = batch.replace_schema_metadata(None)  # shuffle

            if has_union:
                batch = batch.append_column(
                    _TAG, pa.array(np.full(batch.num_rows, tag,
                                           dtype=np.int8)))
            if key_buckets is not None:
                batch = _assign_buckets(batch)
            return batch
        return fn

    # tag encodes the reference's k-way-merge tie order at equal ts
    # (cases/function/window/test_window_union.yaml ids 18-x/19-x):
    # later-listed union tables buffer first, the first-listed union
    # table lands nearest the primary rows, primary rows (tag 0) are
    # the most recent before the instance. Ascending tag sort after ts
    # reproduces it: i-th union table -> tag -(i+1).
    main = ds.map_batches(prep(0), batch_format="pyarrow")
    for i, u in enumerate(union_ds):
        main = main.union(u.map_batches(prep(-(i + 1)),
                                        batch_format="pyarrow"))

    fn = _BucketWindow(specs_aggs, passthrough, has_union, sort_cols,
                       run_transform,
                       drop_invalid_order=run_transform is None)
    # key-hash repartition co-locates each entity in exactly one block;
    # the bucket fn sorts (keys, sort_cols, tag) itself, so sort=False
    # (measured faster than groupby().map_groups by ~25% and than
    # sort=True by ~10%). Key-based repartition needs HASH_SHUFFLE;
    # under the sort-shuffle strategy (small nodes) fall back to the
    # groupby hash-bucket path.
    from ray.data.context import DataContext, ShuffleStrategy
    if DataContext.get_current().shuffle_strategy == \
            ShuffleStrategy.HASH_SHUFFLE:
        part_keys = [_BUCKET] if key_buckets is not None else list(keys)
        rp = main.repartition(num_buckets, keys=part_keys, sort=False)
        return rp.map_batches(fn, batch_format="pyarrow", batch_size=None,
                              zero_copy_batch=True)

    if key_buckets is not None:
        bucketed = main
    else:
        def bucketize(batch: pa.Table) -> pa.Table:
            b = hash_columns(batch, list(keys), num_buckets)
            return batch.append_column(_BUCKET, pa.array(b))

        bucketed = main.map_batches(bucketize, batch_format="pyarrow")
    try:
        grouped = bucketed.groupby(_BUCKET, num_partitions=num_buckets)
    except TypeError:  # older Ray without num_partitions
        grouped = bucketed.groupby(_BUCKET)
    return grouped.map_groups(fn, batch_format="pyarrow")


def window_agg_concat(
    ds: ray.data.Dataset,
    specs_aggs: Sequence[tuple[WindowSpec, Sequence[Agg]]],
    *,
    passthrough: Sequence[str] | None = None,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Windows over DIFFERENT partition keys in one query — the
    reference computes each window separately and zips rows by index
    (ConcatJoin, java/openmldb-batch nodes/ConcatJoinPlan.scala:32-78,
    SparkPlanner.scala:100-108). Here each distinct key group is one
    chained window stage that preserves one output row per input row,
    so no row-id zip is needed; same-key specs still share a single
    shuffle via window_agg_multi.

    All specs must share the same order column (rows with NULL or
    negative order keys are dropped once, identically, by each stage).
    """
    groups: list[tuple[tuple, list]] = []
    for spec, aggs in specs_aggs:
        if groups and groups[-1][0] == spec.keys:
            groups[-1][1].append((spec, list(aggs)))
        else:
            groups.append((spec.keys, [(spec, list(aggs))]))
    if passthrough is None:
        cols = {k for spec, _ in specs_aggs for k in spec.keys}
        cols |= {spec.order_by for spec, _ in specs_aggs}
        passthrough = sorted(cols)

    def needs(group) -> set:
        out = set()
        for spec, aggs in group:
            out |= set(spec.keys) | {spec.order_by}
            out |= {a.col for a in aggs if a.col}
            out |= {a.where for a in aggs if a.where}
            out |= {a.cate for a in aggs if a.cate}
        return out

    done: list[str] = []
    for gi, (_, group) in enumerate(groups):
        downstream = set()
        for _, later in groups[gi + 1:]:
            downstream |= needs(later)
        carry = sorted((set(passthrough) | downstream) - set(done)) + done
        ds = window_agg_multi(ds, group, passthrough=carry,
                              num_buckets=num_buckets)
        done = done + [a.name for _, aggs in group for a in aggs]
    # final projection: declared passthrough + every agg column
    return ds.select_columns(list(passthrough) + done)


def window_agg(
    ds: ray.data.Dataset,
    spec: WindowSpec,
    aggs: Sequence[Agg],
    *,
    union_ds: Sequence[ray.data.Dataset] = (),
    passthrough: Sequence[str] | None = None,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Windowed aggregation over a Dataset; one output row per input row
    (minus dropped NULL/negative order keys).

    ``passthrough``: input columns carried to the output (defaults to
    keys + order column). Project heavy payload columns (token arrays)
    OUT of passthrough and re-join them on a row id afterwards — bytes
    shuffled here are bytes moved across the whole cluster.
    """
    return window_agg_multi(ds, [(spec, aggs)], union_ds=union_ds,
                            passthrough=passthrough,
                            num_buckets=num_buckets)
