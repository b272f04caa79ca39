"""Grouped aggregation with explicit map-side partial combine.

A bare ``groupby(keys).aggregate(...)`` shuffles every row. This
helper pre-aggregates inside ``map_batches`` (one output row per key
per batch) and runs the real groupby over the partials — at 100 TB the
shuffle moves #keys x #blocks rows instead of every row. Supported
aggregate kinds: sum / count / min / max / mean (mean decomposes into
sum+count and is finalized after the reduce).

Usage::

    grouped_aggregate(ds, ["l_returnflag", "l_linestatus"], {
        "sum_qty": ("sum", "l_quantity"),
        "avg_qty": ("mean", "l_quantity"),
        "count_order": ("count", None),
    })
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Max, Min, Sum


_SKETCH_KINDS = frozenset({"percentile_approx", "approx_count_distinct"})


def grouped_aggregate(
    ds: ray.data.Dataset,
    keys: Sequence[str],
    aggs: Mapping[str, tuple] ,
) -> ray.data.Dataset:
    keys = list(keys)
    if any(spec[0] in _SKETCH_KINDS for spec in aggs.values()):
        return _grouped_aggregate_sketch(ds, keys, aggs)
    # columns needed for partials: every mean needs sum+count parts
    plan: dict[str, tuple[str, str | None]] = {}
    finals: dict[str, tuple[str, ...]] = {}
    for out, (kind, col) in aggs.items():
        if kind == "mean":
            plan[f"__{out}_s"] = ("sum", col)
            plan[f"__{out}_c"] = ("count", col)
            finals[out] = ("mean", f"__{out}_s", f"__{out}_c")
        elif kind == "count":
            plan[f"__{out}_c"] = ("count", col)
            finals[out] = ("count", f"__{out}_c")
        elif kind == "sum":
            # SQL sum over an all-NULL group is NULL, not 0 — track a
            # valid count alongside the partial and mask at finalize
            plan[f"__{out}_p"] = ("sum", col)
            plan[f"__{out}_c"] = ("count", col)
            finals[out] = ("sum", f"__{out}_p", f"__{out}_c")
        elif kind in ("min", "max"):
            plan[f"__{out}_p"] = (kind, col)
            finals[out] = (kind, f"__{out}_p")
        else:
            raise ValueError(f"unsupported aggregate kind {kind}")

    # Arrow-native partial: one zero-copy hash group-by per batch
    # (pa.Table.group_by handles sum/count/min/max natively) — no
    # pandas conversion in the 100 TB combiner path. Identical
    # (col, fn) requests share one kernel; null keys group like
    # pandas dropna=False.
    arrow_aggs: dict[tuple, list[str]] = {}
    for part, (kind, col) in plan.items():
        fn = "count_all" if (kind == "count" and col is None) else kind
        arrow_aggs.setdefault((col, fn), []).append(part)
    agg_list = [([] if col is None else col, fn)
                for (col, fn) in arrow_aggs]

    def partial(b: "pa.Table") -> "pa.Table":
        res = b.group_by(keys, use_threads=False).aggregate(agg_list)
        cols = {k: res[k] for k in keys}
        for (col, fn), parts in arrow_aggs.items():
            src = "count_all" if col is None else f"{col}_{fn}"
            for part in parts:
                cols[part] = res[src]
        return pa.table(cols)
    partial.__name__ = "grouped_agg_partial"

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=65536)
    reducers = []
    for part, (kind, _) in plan.items():
        if kind in ("sum", "count"):
            reducers.append(Sum(part, alias_name=part))
        elif kind == "min":
            reducers.append(Min(part, alias_name=part))
        else:
            reducers.append(Max(part, alias_name=part))
    reduced = partials.groupby(keys).aggregate(*reducers)

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        out = b[keys].copy()
        for name, spec in finals.items():
            if spec[0] == "mean":
                out[name] = b[spec[1]] / b[spec[2]]
            elif spec[0] == "count":
                out[name] = b[spec[1]].astype("int64")
            elif spec[0] == "sum":
                out[name] = b[spec[1]].where(b[spec[2]] > 0)
            else:
                out[name] = b[spec[1]]
        return out

    return reduced.map_batches(finalize, batch_format="pandas")


def _grouped_aggregate_sketch(
    ds: ray.data.Dataset,
    keys: list,
    aggs: Mapping[str, tuple],
) -> ray.data.Dataset:
    """Mixed exact + sketch aggregation. Map side folds each batch into
    one partial ROW per key (sums/counts/min/max as scalars, sketches
    as Arrow binary), so the shuffle moves #keys x #blocks sketch rows,
    never raw rows; the reduce is a groupby().map_groups merge over the
    handful of partials per key. Sketches are exact below capacity —
    see functions/sketches.py for the error model above it.

    Reference surface: percentile_approx / approx_count_distinct
    (java/openmldb-batch udf/PercentileApprox.scala; the skew optimizer
    utils/SkewDataFrameUtils.scala:40-43 consumes the same partials).
    """
    import pyarrow as pa

    from openmldb_ray.functions.sketches import (HLLSketch, QuantileSketch,
                                                 hash_column)

    # Arrow-native partial (same pa.Table.group_by pattern as the
    # exact path): scalar parts come from native kernels, and each
    # sketch column rides the SAME group_by as a "list" aggregation —
    # per-key value runs land contiguously in the list child array, so
    # every sketch folds from a numpy slice. The only per-key Python
    # left is the sketch-object fold itself (inherent); no pandas
    # groupby/apply in the combiner.
    exact_parts: dict[tuple, list[str]] = {}
    sketch_specs: list[tuple[str, str, str]] = []
    for out, spec in aggs.items():
        kind, col = spec[0], spec[1]
        if kind == "mean":
            exact_parts.setdefault((col, "sum"), []).append(f"__{out}_s")
            exact_parts.setdefault((col, "count"), []).append(f"__{out}_c")
        elif kind == "count":
            fn = "count_all" if col is None else "count"
            exact_parts.setdefault((col, fn), []).append(f"__{out}_c")
        elif kind == "sum":
            exact_parts.setdefault((col, "sum"), []).append(f"__{out}_p")
            exact_parts.setdefault((col, "count"), []).append(f"__{out}_c")
        elif kind in ("min", "max"):
            exact_parts.setdefault((col, kind), []).append(f"__{out}_p")
        elif kind in _SKETCH_KINDS:
            sketch_specs.append((f"__{out}_k", kind, col))
        else:
            raise ValueError(f"unsupported aggregate kind {kind}")
    list_cols = sorted({col for _, _, col in sketch_specs})
    agg_list = [([] if col is None else col, fn)
                for (col, fn) in exact_parts] \
        + [(col, "list") for col in list_cols]

    def partial(b: pa.Table) -> pa.Table:
        res = b.group_by(keys, use_threads=False).aggregate(agg_list)
        cols: dict = {k: res[k] for k in keys}
        for (col, fn), parts in exact_parts.items():
            src = "count_all" if col is None else f"{col}_{fn}"
            for part in parts:
                cols[part] = res[src]
        ngroups = res.num_rows
        for col in list_cols:
            lst = res[f"{col}_list"].combine_chunks()
            offs = np.asarray(lst.offsets, dtype=np.int64)
            child = lst.flatten()
            fold_q = [p for p, k, c in sketch_specs
                      if c == col and k == "percentile_approx"]
            fold_h = [p for p, k, c in sketch_specs
                      if c == col and k == "approx_count_distinct"]
            if fold_q:
                vals = child.cast(pa.float64()) \
                    .to_numpy(zero_copy_only=False)
                out = []
                for i in range(ngroups):
                    sk = QuantileSketch()
                    sk.add(vals[offs[i]:offs[i + 1]])
                    out.append(sk.to_bytes())
                for part in fold_q:
                    cols[part] = pa.array(out, pa.binary())
            if fold_h:
                # hash once over the null-filtered child; cumsum of
                # the valid mask maps list offsets into hash offsets
                if child.null_count:
                    valid = child.is_valid().to_numpy(
                        zero_copy_only=False)
                else:
                    valid = np.ones(len(child), dtype=bool)
                cs = np.concatenate(([0], np.cumsum(valid)))
                h = hash_column(child)
                out = []
                for i in range(ngroups):
                    sk = HLLSketch()
                    sk.add_hashes(h[cs[offs[i]]:cs[offs[i + 1]]])
                    out.append(sk.to_bytes())
                for part in fold_h:
                    cols[part] = pa.array(out, pa.binary())
        return pa.table(cols)

    def merge(grp: pd.DataFrame) -> pd.DataFrame:
        out = grp[keys].iloc[:1].reset_index(drop=True)
        for name, spec in aggs.items():
            kind = spec[0]
            if kind == "mean":
                c = grp[f"__{name}_c"].sum()
                out[name] = (grp[f"__{name}_s"].sum() / c if c > 0
                             else np.nan)
            elif kind == "count":
                out[name] = np.int64(grp[f"__{name}_c"].sum())
            elif kind == "sum":
                c = grp[f"__{name}_c"].sum()
                out[name] = (grp[f"__{name}_p"].sum() if c > 0
                             else np.nan)
            elif kind in ("min", "max"):
                out[name] = getattr(grp[f"__{name}_p"], kind)()
            elif kind == "percentile_approx":
                sk = QuantileSketch.from_bytes(grp[f"__{name}_k"].iloc[0])
                for b in grp[f"__{name}_k"].iloc[1:]:
                    sk.merge(QuantileSketch.from_bytes(b))
                out[name] = sk.quantile(spec[2])
            else:
                sk = HLLSketch.from_bytes(grp[f"__{name}_k"].iloc[0])
                for b in grp[f"__{name}_k"].iloc[1:]:
                    sk.merge(HLLSketch.from_bytes(b))
                out[name] = np.int64(sk.estimate())
        return out
    merge.__name__ = "sketch_merge"

    # key-hash-bucketed merge: one Ray group per BUCKET, the per-key
    # sketch merges run inside a local pandas groupby (per-key
    # map_groups pays Ray slicing overhead per distinct key)
    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bkt__"] = (pd.util.hash_pandas_object(
            df[keys], index=False).to_numpy() % np.uint64(64)) \
            .astype(np.int32)
        return df
    tag.__name__ = "tag_sketch_bucket"

    def bucket_merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["__bkt__"])
        outs = [merge(grp) for _, grp in
                df.groupby(keys, sort=False, dropna=False)]
        return pd.concat(outs, ignore_index=True)
    bucket_merge.__name__ = "sketch_bucket_merge"

    from openmldb_ray.context import shuffle_partitions
    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=65536)
    return partials.map_batches(tag, batch_format="pandas") \
        .groupby("__bkt__", num_partitions=shuffle_partitions(64)) \
        .map_groups(bucket_merge, batch_format="pandas")


def distinct(ds: ray.data.Dataset,
             keys: Sequence[str]) -> ray.data.Dataset:
    """DISTINCT over ``keys``: per-batch local distinct (Arrow
    group_by, the map-side combiner) shrinks the shuffle to unique
    combos per block, then a key-hash-bucketed shuffle re-runs the
    same Arrow group_by once per BUCKET (a groupby(keys).map_groups
    would cost one Python call per distinct combo)."""
    import pyarrow as pa

    from openmldb_ray.io import hash_columns

    keys = list(keys)
    num_buckets = 64

    def local(b: pa.Table) -> pa.Table:
        u = b.select(keys).group_by(keys).aggregate([])
        return u.append_column("__bkt__", pa.array(
            hash_columns(u, keys, num_buckets)))
    local.__name__ = "local_distinct"

    def bucket_distinct(g: pa.Table) -> pa.Table:
        return g.drop_columns(["__bkt__"]).group_by(keys).aggregate([])
    bucket_distinct.__name__ = "bucket_distinct"

    from openmldb_ray.context import shuffle_partitions
    return ds.map_batches(local, batch_format="pyarrow") \
        .groupby("__bkt__", num_partitions=shuffle_partitions(num_buckets)) \
        .map_groups(bucket_distinct, batch_format="pyarrow")
