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

import pandas as pd
import ray.data
from ray.data.aggregate import Max, Min, Sum


def grouped_aggregate(
    ds: ray.data.Dataset,
    keys: Sequence[str],
    aggs: Mapping[str, tuple[str, str | None]],
) -> ray.data.Dataset:
    keys = list(keys)
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

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(keys, sort=False, dropna=False)
        cols = {}
        for part, (kind, col) in plan.items():
            if kind == "count":
                s = g.size() if col is None else g[col].count()
            else:
                s = getattr(g[col], kind)()
            cols[part] = s
        return pd.DataFrame(cols).reset_index()

    partials = ds.map_batches(partial, batch_format="pandas",
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


def distinct(ds: ray.data.Dataset,
             keys: Sequence[str]) -> ray.data.Dataset:
    """DISTINCT over ``keys``: per-batch local distinct (Arrow
    group_by, the map-side combiner) shrinks the shuffle to unique
    combos per block, then one groupby keeps the first per key."""
    import pyarrow as pa

    keys = list(keys)

    def local(b: pa.Table) -> pa.Table:
        return b.select(keys).group_by(keys).aggregate([])
    local.__name__ = "local_distinct"

    def first(g: pa.Table) -> pa.Table:
        return g.slice(0, 1)
    first.__name__ = "distinct_first"

    pre = ds.map_batches(local, batch_format="pyarrow")
    return pre.groupby(keys[0] if len(keys) == 1 else keys).map_groups(
        first, batch_format="pyarrow")
