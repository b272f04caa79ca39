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
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum


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
        elif kind in ("sum", "min", "max"):
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
            else:
                out[name] = b[spec[1]]
        return out

    return reduced.map_batches(finalize, batch_format="pandas")
