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


def _buffer(i, ts, spec: WindowSpec, is_primary):
    """Run indices buffered when instance i is evaluated, in buffer
    order. Under INSTANCE_NOT_IN_WINDOW the primary table never feeds
    the buffer (runner.cc:575-578) — only union rows + the instance
    itself (buffered then popped, runner.cc:1003-1005). EXCLUDE
    CURRENT_TIME drops ts-peers from the buffer before any rows-count
    bound or lag offset applies (test_window_union.yaml 18-4/18-5)."""
    if spec.instance_not_in_window:
        hist = [j for j in range(i)
                if is_primary is None or not is_primary[j]]
    else:
        hist = list(range(i))
    if spec.exclude_current_time:
        hist = [j for j in hist if ts[j] != ts[i]]
    return hist + [i]


def _frame_indices(i, ts, spec: WindowSpec, is_primary=None):
    """Indices (ascending buffer order) forming row i's frame."""
    t = ts[i]
    buf = _buffer(i, ts, spec, is_primary)
    npos = len(buf) - 1  # instance's buffer position
    members = []
    for bp, j in enumerate(buf):
        if j == i:
            # current row membership
            if spec.end_offset_range > 0 or spec.end_offset_rows > 0:
                continue
            members.append((bp, j))
            continue
        # end bound: too-recent history excluded (buffer distance for
        # rows offsets)
        if spec.end_offset_range > 0 and ts[j] > t - spec.end_offset_range:
            continue
        if spec.end_offset_rows > 0 and (npos - bp) < spec.end_offset_rows:
            continue
        members.append((bp, j))
    # start bound: union of rows / range frames
    def in_start(bp, j):
        ok = False
        if spec.preceding_range is not None:
            if spec.open_preceding:
                ok = ok or ts[j] > t - spec.preceding_range
            else:
                ok = ok or ts[j] >= t - spec.preceding_range
        if spec.preceding_rows is not None:
            lim = spec.preceding_rows - (1 if spec.open_preceding else 0)
            ok = ok or (npos - bp) <= lim
        return ok

    members = [j for bp, j in members if j == i or in_start(bp, j)]
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
        idxs = _frame_indices(i, ts, spec, is_primary)
        for a in aggs:
            f = a.func
            base = f[:-6] if f.endswith("_where") else f
            if base in ("lag", "at"):
                # pure buffer offset, frame-independent except MAXSIZE
                buf = _buffer(i, ts, spec, is_primary)
                pb = len(buf) - 1 - a.k  # k buffer rows before instance
                ok = pb >= 0 and not (spec.max_size
                                      and a.k > spec.max_size)
                out[a.name][i] = values[a.col][buf[pb]] if ok else np.nan
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
            if base == "count" and a.col is None:
                if a.where is None:
                    out[a.name][i] = len(idxs)
                else:
                    ok = 0
                    for j in idxs:
                        w = values[a.where][j]
                        if w is not None and not (
                                isinstance(w, float) and math.isnan(w)
                        ) and bool(w):
                            ok += 1
                    out[a.name][i] = ok
                continue
            if "_cate" in base:
                kind = base[:-5]
                groups: dict = {}
                for j in idxs:
                    c = values[a.cate][j]
                    if c is None or (isinstance(c, float) and math.isnan(c)):
                        continue
                    w = values[a.where][j] if f.endswith("_where") else True
                    if w is None or (isinstance(w, float)
                                     and math.isnan(w)) or not bool(w):
                        if f.endswith("_where"):
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
                    f"{_fmt(k)}:"
                    f"{_fmt(red(groups[k]), None, kind == 'avg')}"
                    for k in sorted(groups))
                continue
            vals = []
            nulls_seen = 0
            for j in idxs:
                v = values[a.col][j]
                w = values[a.where][j] if f.endswith("_where") else True
                if w is None or (isinstance(w, float) and math.isnan(w)) \
                        or not bool(w):
                    if f.endswith("_where"):
                        continue
                if isinstance(v, float) and math.isnan(v):
                    nulls_seen += 1
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
                # NULL counts as one distinct value (udaf id 5)
                out[a.name][i] = len(set(vals)) + (1 if nulls_seen else 0)
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
