"""Brute-force O(n·w) window evaluator — the test oracle for the
vectorized kernel.

An independent, row-at-a-time re-derivation of the buffer semantics
documented in the reference (HistoryWindow::BufferData,
hybridse/include/vm/mem_catalog.h:385-471; union merge
runner.cc:1521-1541). Deliberately naive: maintains an explicit Python
list buffer per run and recomputes every aggregate from scratch per
row. Used only in tests (the moral analog of the reference's
cross-engine YAML conformance checks, SURVEY.md §5).
"""

from __future__ import annotations

import math

import numpy as np

from openmldb_ray.window.spec import Agg, WindowSpec


def _frame_indices(i, ts, spec: WindowSpec):
    """Indices (ascending buffer order) forming row i's frame."""
    t = ts[i]
    members = []
    for j in range(i + 1):  # only rows buffered at/before instance i
        if j == i:
            # current row membership
            if spec.instance_not_in_window:
                continue
            if spec.end_offset_range > 0 or spec.end_offset_rows > 0:
                continue
            members.append(j)
            continue
        # end bound: too-recent history excluded
        if spec.end_offset_range > 0 and ts[j] > t - spec.end_offset_range:
            continue
        if spec.end_offset_rows > 0 and j > i - spec.end_offset_rows:
            continue
        if spec.exclude_current_time and ts[j] == t:
            continue
        members.append(j)
    # start bound: union of rows / range frames
    def in_start(j):
        ok = False
        if spec.preceding_range is not None:
            if spec.open_preceding:
                ok = ok or ts[j] > t - spec.preceding_range
            else:
                ok = ok or ts[j] >= t - spec.preceding_range
        if spec.preceding_rows is not None:
            lim = spec.preceding_rows - (1 if spec.open_preceding else 0)
            ok = ok or (i - j) <= lim
        return ok

    members = [j for j in members if j == i or in_start(j)]
    if spec.max_size and len(members) > spec.max_size:
        members = members[-spec.max_size:]  # evict oldest first
    return members


def eval_brute(
    ts: np.ndarray,
    values: dict[str, np.ndarray],
    aggs: list[Agg],
    spec: WindowSpec,
    is_primary: np.ndarray | None = None,
) -> dict[str, np.ndarray]:
    n = len(ts)
    if is_primary is None:
        is_primary = np.ones(n, dtype=bool)
    out = {a.name: np.full(n, np.nan) for a in aggs}
    for i in range(n):
        if not is_primary[i]:
            continue
        idxs = _frame_indices(i, ts, spec)
        for a in aggs:
            f = a.func
            base = f[:-6] if f.endswith("_where") else f
            if base in ("lag", "at"):
                p = i - a.k
                frame_ok = p in idxs or (p == i and i in idxs)
                out[a.name][i] = values[a.col][p] if (p >= 0 and frame_ok) else np.nan
                continue
            if base == "first_value":
                out[a.name][i] = values[a.col][idxs[-1]] if idxs else np.nan
                continue
            if base == "last_value_in_frame":
                out[a.name][i] = values[a.col][idxs[0]] if idxs else np.nan
                continue
            if base == "row_number":
                out[a.name][i] = int(np.sum(is_primary[: i + 1]))
                continue
            if base == "count" and a.col is None and a.where is None:
                out[a.name][i] = len(idxs)
                continue
            if "_cate" in base:
                kind = base[:-5]
                groups: dict = {}
                for j in idxs:
                    c = values[a.cate][j]
                    if c is None or (isinstance(c, float) and math.isnan(c)):
                        continue
                    if f.endswith("_where") and not bool(values[a.where][j]):
                        continue
                    v = values[a.col][j] if a.col else 1.0
                    if isinstance(v, float) and math.isnan(v):
                        continue
                    groups.setdefault(c, []).append(v)
                red = {"sum": sum, "count": len, "min": min, "max": max,
                       "avg": lambda g: sum(g) / len(g)}[kind]
                from openmldb_ray.window.kernel import _fmt
                out.setdefault(a.name, np.empty(n, dtype=object))
                out[a.name] = out[a.name].astype(object)
                out[a.name][i] = ",".join(
                    f"{_fmt(k)}:{_fmt(red(groups[k]))}"
                    for k in sorted(groups))
                continue
            vals = []
            for j in idxs:
                v = values[a.col][j]
                if isinstance(v, float) and math.isnan(v):
                    continue
                if f.endswith("_where") and not bool(values[a.where][j]):
                    continue
                vals.append(v)
            if base == "count":
                out[a.name][i] = len(vals)
            elif base == "sum":
                out[a.name][i] = sum(vals) if vals else np.nan
            elif base == "avg":
                out[a.name][i] = sum(vals) / len(vals) if vals else np.nan
            elif base == "min":
                out[a.name][i] = min(vals) if vals else np.nan
            elif base == "max":
                out[a.name][i] = max(vals) if vals else np.nan
            elif base == "distinct_count":
                out[a.name][i] = len(set(vals))
            elif base == "top":
                from openmldb_ray.window.kernel import _fmt
                out[a.name] = out[a.name].astype(object)
                out[a.name][i] = ",".join(
                    _fmt(x) for x in sorted(vals, reverse=True)[: a.k])
            elif base == "topn_frequency":
                from openmldb_ray.window.kernel import _fmt
                out[a.name] = out[a.name].astype(object)
                if vals:
                    vu, cnts = np.unique(vals, return_counts=True)
                    order = np.lexsort((-vu, -cnts))
                    out[a.name][i] = ",".join(_fmt(vu[j])
                                              for j in order[: a.k])
                else:
                    out[a.name][i] = ""
            elif base == "top1_ratio":
                if vals:
                    _, cnts = np.unique(vals, return_counts=True)
                    out[a.name][i] = cnts.max() / len(vals)
            else:
                raise NotImplementedError(f)
    return out
