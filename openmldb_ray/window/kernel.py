"""Vectorized per-partition window kernel.

Replays the semantics of OpenMLDB's window buffer
(``HistoryWindow::BufferData``, hybridse/include/vm/mem_catalog.h:385-471)
over sorted numpy arrays instead of a row-at-a-time deque:

- the "buffer" is the ascending-(ts, tag)-sorted run of one entity;
- per-row frame bounds come from ``np.searchsorted`` over the run's ts
  array (O(n log w) for the whole run at once);
- sum/count/avg (+ _where) are prefix-sum differences (O(n));
- min/max use a capped sparse table (O(n log w));
- the frame of row *i* is the contiguous history slice
  ``[start_i, hist_end_i)`` plus, optionally, row *i* itself
  (``self_in``) — this representation captures every reference quirk:
  EXCLUDE CURRENT_TIME removes ts-peers but keeps the current row
  (mem_catalog.h:459-468), INSTANCE_NOT_IN_WINDOW evaluates but never
  buffers the current row (runner.cc:1003-1005), end offsets
  (``BETWEEN .. AND t PRECEDING``) exclude too-recent rows including
  the current one (mem_catalog.h:414-428), MAXSIZE evicts oldest first
  (mem_catalog.h:430-457).

WINDOW UNION rows (``is_primary == False``) participate in frames but
never emit output; at equal ts they sort *before* primary rows because
the reference buffers union rows before projecting the instance row
(k-way merge with ``<=``, runner.cc:1521-1541).
"""

from __future__ import annotations

import numpy as np

from openmldb_ray.window.spec import Agg, WindowSpec

_NULL_INT = np.iinfo(np.int64).min


def frame_bounds(ts: np.ndarray, spec: WindowSpec):
    """Per-row frame bounds over one ascending-sorted run.

    Returns ``(start, hist_end, self_in)``:
      frame(i) = indices [start[i], hist_end[i]) ∪ ({i} if self_in[i]).
    """
    n = len(ts)
    idx = np.arange(n, dtype=np.int64)

    starts = []
    if spec.preceding_range is not None:
        side = "right" if spec.open_preceding else "left"
        starts.append(np.searchsorted(ts, ts - spec.preceding_range, side=side))
    if spec.preceding_rows is not None:
        rs = idx - spec.preceding_rows
        if spec.open_preceding:
            rs += 1
        starts.append(np.maximum(rs, 0))
    # merged frame = union of both frames -> earlier of the two starts
    start = starts[0] if len(starts) == 1 else np.minimum(starts[0], starts[1])
    start = np.maximum(start, 0)

    if spec.end_offset_range > 0:
        end = np.searchsorted(ts, ts - spec.end_offset_range, side="right")
        self_in = np.zeros(n, dtype=bool)
    elif spec.end_offset_rows > 0:
        end = np.maximum(idx - spec.end_offset_rows + 1, 0)
        self_in = np.zeros(n, dtype=bool)
    else:
        end = idx + 1
        self_in = np.ones(n, dtype=bool)
        if spec.instance_not_in_window:
            self_in[:] = False

    if spec.exclude_current_time:
        tie_start = np.searchsorted(ts, ts, side="left")
        hist_end = np.minimum(end, tie_start)
    else:
        hist_end = np.minimum(end, idx)  # history part never includes self
    hist_end = np.maximum(hist_end, start)

    if spec.max_size and spec.max_size > 0:
        cap = spec.max_size - self_in.astype(np.int64)
        start = np.maximum(start, hist_end - np.maximum(cap, 0))

    return start, hist_end, self_in


# ---------------------------------------------------------------- range min/max


def _range_reduce(v: np.ndarray, starts: np.ndarray, ends: np.ndarray, op):
    """Vectorized range-min/max over [starts, ends) via a sparse table
    whose depth is capped at log2(max frame length)."""
    n = len(v)
    m = len(starts)
    out = np.full(m, np.nan)
    lens = ends - starts
    valid = lens > 0
    if not valid.any() or n == 0:
        return out
    maxlen = int(lens[valid].max())
    nlev = max(1, int(np.ceil(np.log2(maxlen))) + 1) if maxlen > 1 else 1
    st = [v.astype(np.float64, copy=True)]
    for k in range(1, nlev):
        half = 1 << (k - 1)
        prev = st[-1]
        if len(prev) <= half:
            break
        st.append(op(prev[:-half], prev[half:]))
    levels = np.zeros(m, dtype=np.int64)
    levels[valid] = np.floor(np.log2(lens[valid])).astype(np.int64)
    levels = np.minimum(levels, len(st) - 1)
    for k in np.unique(levels[valid]):
        mask = valid & (levels == k)
        w = 1 << int(k)
        s = starts[mask]
        e = ends[mask] - w
        out[mask] = op(st[int(k)][s], st[int(k)][np.maximum(e, s)])
    return out


def _combine_self(hist: np.ndarray, selfv: np.ndarray, self_in: np.ndarray, op):
    out = hist.copy()
    both = self_in & ~np.isnan(selfv)
    take_self = both & np.isnan(out)
    out[take_self] = selfv[take_self]
    merge = both & ~np.isnan(hist)
    out[merge] = op(out[merge], selfv[merge])
    return out


# ---------------------------------------------------------------- aggregation


def _isnull(x) -> bool:
    if x is None:
        return True
    return isinstance(x, float) and np.isnan(x)


def _fmt(x) -> str:
    """Value formatting for string-emitting aggs (top / *_cate): integral
    values render as ints (matches the reference for int columns; float
    rendering is best-effort %g)."""
    if isinstance(x, str):
        return x
    f = float(x)
    if f.is_integer():
        return str(int(f))
    return f"{f:g}"


def _frame_items(v: np.ndarray, start, hist_end, self_in, i) -> list:
    """Non-null frame values of row i as a python list (slow path for
    string-emitting aggs; frames are short by construction)."""
    sl = v[start[i]:hist_end[i]]
    items = [x for x in sl.tolist() if not _isnull(x)]
    if self_in[i] and not _isnull(v[i]):
        items.append(v[i])
    return items


def _to_float_with_nan(v: np.ndarray) -> np.ndarray:
    """float64 copy with NULLs as NaN (input may be a masked float array
    already, or an int array paired with an explicit null mask upstream)."""
    return v.astype(np.float64)


def eval_aggs(
    ts: np.ndarray,
    values: dict[str, np.ndarray],
    aggs: list[Agg],
    spec: WindowSpec,
    is_primary: np.ndarray | None = None,
) -> dict[str, np.ndarray]:
    """Evaluate all aggregates for one sorted run.

    ``values[col]`` must be float64 with NaN for NULL (callers convert);
    ``where`` columns are bool. Returns full-length arrays (callers mask
    non-primary rows out).
    """
    n = len(ts)
    start, hist_end, self_in = frame_bounds(ts, spec)
    out: dict[str, np.ndarray] = {}

    # cache prefix structures per (col, where) pair
    pref_cache: dict[tuple, tuple[np.ndarray, np.ndarray]] = {}

    def notnull(v: np.ndarray) -> np.ndarray:
        # works for float (NaN) AND object (None) columns
        if v.dtype == object:
            import pandas as pd
            return ~pd.isna(v)
        return ~np.isnan(v)

    def prefixes(col: str, where: str | None):
        key = (col, where)
        if key not in pref_cache:
            v = values[col]
            ok = notnull(v)
            if where is not None:
                ok = ok & values[where].astype(bool)
            filled = np.where(ok, v, 0.0) if v.dtype != object else None
            psum = (np.concatenate(([0.0], np.cumsum(filled)))
                    if filled is not None else None)
            pcnt = np.concatenate(([0], np.cumsum(ok.astype(np.int64))))
            pref_cache[key] = (psum, pcnt)
        return pref_cache[key]

    def masked_vals(col: str, where: str | None):
        v = values[col]
        if where is None:
            return v
        if v.dtype == object:
            return np.where(values[where].astype(bool), v, None)
        return np.where(values[where].astype(bool), v, np.nan)

    def where_items(col: str, where: str | None, i) -> list:
        """Non-null (+ where-passing) frame values of row i (generic
        slow path — strings and numerics)."""
        v = masked_vals(col, where)
        return _frame_items(v, start, hist_end, self_in, i)

    for a in aggs:
        f = {"fz_top1_ratio": "top1_ratio",
             "fz_topn_frequency": "topn_frequency"}.get(a.func, a.func)
        base = f[:-6] if f.endswith("_where") else f
        where = a.where if f.endswith("_where") else None

        if base == "count" and a.col is None and where is None:
            # count(*): frame row count
            cnt = (hist_end - start) + self_in.astype(np.int64)
            out[a.name] = cnt.astype(np.float64)
        elif base == "count":
            _, pcnt = prefixes(a.col, where)
            hcnt = pcnt[hist_end] - pcnt[start]
            v = values[a.col]
            sok = self_in & notnull(v)
            if where is not None:
                sok = sok & values[where].astype(bool)
            out[a.name] = (hcnt + sok.astype(np.int64)).astype(np.float64)
        elif base in ("sum", "sum_zero", "avg"):
            if values[a.col].dtype == object:
                raise NotImplementedError(
                    f"{base} over a string column is not defined")
            psum, pcnt = prefixes(a.col, where)
            hsum = psum[hist_end] - psum[start]
            hcnt = pcnt[hist_end] - pcnt[start]
            v = values[a.col]
            sok = self_in & notnull(v)
            if where is not None:
                sok = sok & values[where].astype(bool)
            tsum = hsum + np.where(sok, np.nan_to_num(v), 0.0)
            tcnt = hcnt + sok.astype(np.int64)
            if base == "sum_zero":
                # OpenMLDB window sum over an EMPTY frame is 0, not
                # NULL (cases/function/window/test_maxsize.yaml ids
                # 6-7); ANSI/DuckDB semantics keep the plain "sum"
                out[a.name] = tsum
            elif base == "sum":
                r = tsum.copy()
                r[tcnt == 0] = np.nan
                out[a.name] = r
            else:
                with np.errstate(invalid="ignore", divide="ignore"):
                    r = tsum / tcnt
                r[tcnt == 0] = np.nan
                out[a.name] = r
        elif base in ("min", "max") and values[a.col].dtype == object:
            # string min/max: generic slow path (frames are short)
            res = np.full(n, None, dtype=object)
            for i in range(n):
                items = where_items(a.col, where, i)
                if items:
                    res[i] = min(items) if base == "min" else max(items)
            out[a.name] = res
        elif base in ("min", "max"):
            op = np.minimum if base == "min" else np.maximum
            mv = masked_vals(a.col, where)
            # NaNs poison the sparse table -> +/- inf sentinel; an
            # explicit valid-count decides nullity, so legitimate
            # infinite values survive (sentinel only wins when the
            # whole range is null)
            _, pcnt_mm = prefixes(a.col, where)
            sent = np.inf if base == "min" else -np.inf
            mv_f = np.where(np.isnan(mv), sent, mv)
            hist = _range_reduce(mv_f, start, hist_end, op)
            hist[(pcnt_mm[hist_end] - pcnt_mm[start]) == 0] = np.nan
            selfv = np.where(self_in, mv, np.nan)
            out[a.name] = _combine_self(hist, selfv, self_in, op)
        elif base == "distinct_count":
            v = values[a.col]
            res = np.zeros(n, dtype=np.float64)
            for i in range(n):
                res[i] = len(set(_frame_items(v, start, hist_end,
                                              self_in, i)))
            out[a.name] = res
        elif base in ("lag", "at"):
            # value k buffer-rows before the current row, NULL outside the
            # frame (window_functions_def.cc:96-156; lag aliases at :146)
            idx = np.arange(n, dtype=np.int64)
            pos = idx - a.k
            in_hist = (pos >= start) & (pos < hist_end)
            is_self = (pos == idx) & self_in
            ok = in_hist | is_self
            v = values[a.col]
            res = (np.full(n, None, dtype=object) if v.dtype == object
                   else np.full(n, np.nan))
            res[ok] = v[np.clip(pos[ok], 0, n - 1)]
            out[a.name] = res
        elif base == "lead":
            # SQL lead: value k rows AFTER the current row within the
            # partition (frame-independent, ANSI semantics — the SQL
            # front end's lead(); the reference pairs lag/lead the same
            # way via shift)
            idx = np.arange(n, dtype=np.int64)
            pos = idx + a.k
            ok = (pos >= 0) & (pos < n)
            v = values[a.col]
            res = (np.full(n, None, dtype=object) if v.dtype == object
                   else np.full(n, np.nan))
            res[ok] = v[np.clip(pos[ok], 0, n - 1)]
            out[a.name] = res
        elif base == "first_value":
            # OpenMLDB quirk: first_value == at(col, 0) == NEWEST frame row
            # (window_functions_def.cc:154)
            idx = np.arange(n, dtype=np.int64)
            newest = np.where(self_in, idx, hist_end - 1)
            ok = newest >= start
            v = values[a.col]
            res = (np.full(n, None, dtype=object) if v.dtype == object
                   else np.full(n, np.nan))
            res[ok] = v[np.clip(newest[ok], 0, n - 1)]
            out[a.name] = res
        elif base == "last_value_ignore_nulls":
            # newest NON-NULL frame value (ANSI last_value IGNORE NULLS
            # over a history frame = forward fill) — vectorized running
            # maximum of valid indices
            v = values[a.col]
            ok = notnull(v)
            if where is not None:
                ok = ok & values[where].astype(bool)
            idx = np.arange(n, dtype=np.int64)
            running = np.maximum.accumulate(np.where(ok, idx, -1))
            p_hist = np.where(hist_end > 0,
                              running[np.maximum(hist_end - 1, 0)], -1)
            p_hist = np.where((hist_end > 0) & (p_hist >= start),
                              p_hist, -1)
            p_self = np.where(self_in & ok, idx, -1)
            pick = np.maximum(p_hist, p_self)
            res = (np.full(n, None, dtype=object) if v.dtype == object
                   else np.full(n, np.nan))
            got = pick >= 0
            res[got] = v[pick[got]]
            out[a.name] = res
        elif base == "last_value_in_frame":
            # oldest frame row (start index), standard-SQL first_value analog
            ok = (hist_end > start) | self_in
            oldest = np.where(hist_end > start, start, np.arange(n))
            v = values[a.col]
            res = (np.full(n, None, dtype=object) if v.dtype == object
                   else np.full(n, np.nan))
            res[ok] = v[np.clip(oldest[ok], 0, n - 1)]
            out[a.name] = res
        elif base == "row_number":
            if is_primary is None:
                out[a.name] = np.arange(1, n + 1, dtype=np.float64)
            else:
                out[a.name] = np.cumsum(is_primary.astype(np.int64)).astype(
                    np.float64
                )
        elif base == "top":
            # top k values, DESC, comma-joined (TopKContainer::OutputString,
            # hybridse/src/udf/containers.h:99-137 iterates map_ reversed)
            v = values[a.col]
            res = np.empty(n, dtype=object)
            for i in range(n):
                items = _frame_items(v, start, hist_end, self_in, i)
                items.sort(reverse=True)
                res[i] = ",".join(_fmt(x) for x in items[: a.k])
            out[a.name] = res
        elif base == "topn_frequency":
            # top-n values by frequency, ties by larger value first
            v = values[a.col]
            res = np.empty(n, dtype=object)
            for i in range(n):
                items = _frame_items(v, start, hist_end, self_in, i)
                if items:
                    counts: dict = {}
                    for x in items:
                        counts[x] = counts.get(x, 0) + 1
                    # count desc, then value desc (string-safe)
                    ordered = sorted(counts, reverse=True)
                    ordered.sort(key=counts.get, reverse=True)
                    res[i] = ",".join(_fmt(x) for x in ordered[: a.k])
                else:
                    res[i] = ""
            out[a.name] = res
        elif base.endswith("_cate"):
            # 'K:V,K:V' sorted by key asc (udfs_8h.md sum_cate);
            # top_n_key_* variant: top-n keys in DESCENDING key order
            # (udfs_8h.md top_n_key_sum_cate_where)
            top_n_key = base.startswith("top_n_key_")
            agg_kind = base[len("top_n_key_"): -5] if top_n_key \
                else base[: -5]
            v = values[a.col] if a.col else None
            cate = values[a.cate]
            where = values[a.where].astype(bool) if a.where else None
            res = np.empty(n, dtype=object)
            for i in range(n):
                idxs = list(range(start[i], hist_end[i]))
                if self_in[i]:
                    idxs.append(i)
                groups: dict = {}
                for j in idxs:
                    if _isnull(cate[j]):
                        continue
                    if where is not None and not where[j]:
                        continue
                    val = v[j] if v is not None else 1.0
                    if v is not None and _isnull(val):
                        continue
                    groups.setdefault(cate[j], []).append(val)
                keys_sorted = (sorted(groups, reverse=True)[: a.k]
                               if top_n_key else sorted(groups))
                parts = []
                for k in keys_sorted:
                    g = groups[k]
                    if agg_kind == "sum":
                        r = sum(g)
                    elif agg_kind == "count":
                        r = len(g)
                    elif agg_kind == "avg":
                        r = sum(g) / len(g)
                    elif agg_kind == "min":
                        r = min(g)
                    else:
                        r = max(g)
                    parts.append(f"{_fmt(k)}:{_fmt(r)}")
                res[i] = ",".join(parts)
            out[a.name] = res
        elif base in ("fz_window_split", "fz_window_split_by_key",
                      "fz_window_split_by_value", "fz_join"):
            from openmldb_ray.functions import feature_zero as fz
            v = values[a.col]
            res = np.empty(n, dtype=object)
            for i in range(n):
                items = _frame_items(v, start, hist_end, self_in, i)
                if base == "fz_join":
                    res[i] = fz.fz_join(items, *a.params)
                else:
                    fn = {"fz_window_split": fz.fz_split,
                          "fz_window_split_by_key": fz.fz_split_by_key,
                          "fz_window_split_by_value": fz.fz_split_by_value
                          }[base]
                    out_items: list = []
                    for s in items:
                        out_items.extend(fn(s, *a.params))
                    res[i] = out_items
            out[a.name] = res
        elif base == "top1_ratio":
            v = values[a.col]
            res = np.full(n, np.nan)
            for i in range(n):
                sl = _frame_items(v, start, hist_end, self_in, i)
                if sl:
                    vals, cnts = np.unique(sl, return_counts=True)
                    res[i] = cnts.max() / len(sl)
            out[a.name] = res
        else:
            raise NotImplementedError(f"window func {f}")
    return out
