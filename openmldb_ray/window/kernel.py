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
  (mem_catalog.h:459-468), INSTANCE_NOT_IN_WINDOW restricts the
  buffered history to WINDOW UNION rows — the primary table is never
  added as a union source (runner.cc:575-578) and the instance row is
  buffered for its own frame then popped (runner.cc:1003-1005) — so
  frame(i) = {i} ∪ {union rows in range}, end offsets
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

    Returns ``(start, hist_end, self_in, base)``:
      frame(i) = indices [start[i], hist_end[i]) ∪ ({i} if self_in[i]);
      ``base[i]`` is row i's position in its own (ECT-filtered) buffer,
      used by buffer-offset functions (lag/at).
    """
    n = len(ts)
    idx = np.arange(n, dtype=np.int64)
    # EXCLUDE CURRENT_TIME removes ts-peers from the buffer BEFORE
    # rows-count bounds and lag offsets apply (test_window_union.yaml
    # ids 18-4/18-5: 'ROWS 2 preceding EXCLUDE CURRENT_TIME' takes the
    # 2 newest NON-peer rows). The peer-free history of a ts-sorted run
    # is the contiguous prefix [0, tie_start), so `base` — the
    # instance's position in its own (filtered) buffer — is tie_start
    # under ECT and the run index otherwise.
    if spec.exclude_current_time:
        base = np.searchsorted(ts, ts, side="left")
    else:
        base = idx

    starts = []
    if spec.preceding_range is not None:
        side = "right" if spec.open_preceding else "left"
        starts.append(np.searchsorted(ts, ts - spec.preceding_range, side=side))
    if spec.preceding_rows is not None:
        rs = base - spec.preceding_rows
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
        end = np.maximum(base - spec.end_offset_rows + 1, 0)
        self_in = np.zeros(n, dtype=bool)
    else:
        end = base + 1
        self_in = np.ones(n, dtype=bool)

    hist_end = np.minimum(end, base)  # history never includes self/peers
    hist_end = np.maximum(hist_end, start)

    if spec.max_size and spec.max_size > 0:
        cap = spec.max_size - self_in.astype(np.int64)
        start = np.maximum(start, hist_end - np.maximum(cap, 0))

    return start, hist_end, self_in, base


def _inw_bounds(ts: np.ndarray, spec: WindowSpec, is_union: np.ndarray):
    """Frame bounds under INSTANCE_NOT_IN_WINDOW with union rows.

    The buffer of instance *i* holds only union rows sorted before it
    (union rows tie-break before primary rows at equal ts) plus the
    instance itself. Returned ``start``/``hist_end`` index the
    union-only subarray (u-space); ``self_in`` follows the normal
    current-row rules.
    """
    n = len(ts)
    ts_u = ts[is_union]
    if spec.exclude_current_time:
        # peer-free u-space history is the prefix [0, tie_start)
        base = np.searchsorted(ts_u, ts, side="left")
    else:
        # buffer position of each row = number of union rows before it
        base = np.concatenate(
            ([0], np.cumsum(is_union.astype(np.int64))))[:-1]

    starts = []
    if spec.preceding_range is not None:
        side = "right" if spec.open_preceding else "left"
        starts.append(np.searchsorted(ts_u, ts - spec.preceding_range,
                                      side=side))
    if spec.preceding_rows is not None:
        rs = base - spec.preceding_rows
        if spec.open_preceding:
            rs += 1
        starts.append(np.maximum(rs, 0))
    start = starts[0] if len(starts) == 1 else np.minimum(starts[0],
                                                          starts[1])
    start = np.maximum(start, 0)

    if spec.end_offset_range > 0:
        end = np.searchsorted(ts_u, ts - spec.end_offset_range,
                              side="right")
        self_in = np.zeros(n, dtype=bool)
    elif spec.end_offset_rows > 0:
        end = np.maximum(base - spec.end_offset_rows + 1, 0)
        self_in = np.zeros(n, dtype=bool)
    else:
        end = base
        self_in = np.ones(n, dtype=bool)

    hist_end = np.minimum(end, base)
    hist_end = np.maximum(hist_end, start)

    if spec.max_size and spec.max_size > 0:
        cap = spec.max_size - self_in.astype(np.int64)
        start = np.maximum(start, hist_end - np.maximum(cap, 0))

    return start, hist_end, self_in, base


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


def _wmask(arr: np.ndarray) -> np.ndarray:
    """Where-condition column -> bool mask with NULL as False (a NULL
    condition never matches, test_udaf_function.yaml id 45)."""
    if arr.dtype == object:
        return np.array([bool(x) and x == x if x is not None else False
                         for x in arr], dtype=bool)
    return np.nan_to_num(arr, nan=0.0).astype(bool)


def _isnull(x) -> bool:
    if x is None:
        return True
    return isinstance(x, float) and np.isnan(x)


def _fmt(x, kind: str | None = None, force_float: bool = False) -> str:
    """Value formatting for string-emitting aggs (top / *_cate),
    following the reference's renderings (test_udaf_function.yaml
    20-24): float/double values and avg results use '%.6f', integers
    '%d', timestamps/dates their wall-clock strings. ``kind`` is the
    SOURCE column kind ('int'/'float'/'ts'/'date'/'bool'/'str');
    without it, integral floats render as ints (legacy best-effort)."""
    if isinstance(x, str):
        return x
    if kind == "ts":
        import datetime as _dt
        dt = _dt.datetime(1970, 1, 1) + _dt.timedelta(
            milliseconds=int(x) + _tz_offset_ms())
        return dt.strftime("%Y-%m-%d %H:%M:%S")
    if kind == "date":
        import datetime as _dt
        return (_dt.date(1970, 1, 1)
                + _dt.timedelta(days=int(x))).isoformat()
    if kind == "bool":
        return "true" if x else "false"
    f = float(x)
    if force_float or kind == "float":
        return f"{f:.6f}"
    if kind == "int":
        return str(int(f))
    if f.is_integer():
        return str(int(f))
    return f"{f:g}"


def _tz_offset_ms() -> int:
    from openmldb_ray.sql.exprs import OPENMLDB_TZ_OFFSET_MS
    return OPENMLDB_TZ_OFFSET_MS


def _frame_items(hv: np.ndarray, start, hist_end, self_in, i,
                 sv: np.ndarray) -> list:
    """Non-null frame values of row i as a python list (slow path for
    string-emitting aggs; frames are short by construction).

    ``hv`` is the history array (union-only under INW), indexed by
    ``start``/``hist_end``; ``sv`` the full-run array for the row's
    own value."""
    sl = hv[start[i]:hist_end[i]]
    items = [x for x in sl.tolist() if not _isnull(x)]
    if self_in[i] and not _isnull(sv[i]):
        items.append(sv[i])
    return items


def _distinct_count_loop(hv, v, start, hist_end, self_in,
                         null_counts: bool) -> np.ndarray:
    """Per-row reference implementation (fallback for non-monotone
    frame families; also the brute the vectorized path is tested
    against)."""
    n = len(start)
    res = np.zeros(n, dtype=np.float64)
    for i in range(n):
        sl = hv[start[i]:hist_end[i]].tolist()
        if self_in[i]:
            sl.append(v[i])
        nn = [x for x in sl if not _isnull(x)]
        res[i] = len(set(nn)) + (1 if null_counts
                                 and len(nn) < len(sl) else 0)
    return res


def _distinct_count(hv, v, start, hist_end, self_in,
                    null_counts: bool) -> np.ndarray:
    """Vectorized sliding distinct-count. Factorize the values once,
    link each history position to its previous occurrence (one
    lexsort), then exploit that ``start``/``hist_end`` are monotone
    non-decreasing: position j is a DUPLICATE inside frame i iff
    j < hist_end[i] and prev[j] >= start[i], which is a contiguous
    range of frames — one range-add on a difference array per
    position. distinct = countable-length - duplicates (+1 when the
    self row's value is absent from the slice). O((m+n) log m) total
    instead of the per-row Python ``set()``'s O(n*w).

    NULL counts as one distinct value unless ``null_counts`` is False
    (bool columns — test_udaf_function.yaml ids 5 vs 6)."""
    from openmldb_ray.io import exact_factorize
    n = len(start)
    m = len(hv)
    s = np.asarray(start, dtype=np.int64)
    e = np.asarray(hist_end, dtype=np.int64)
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    if (np.diff(s) < 0).any() or (np.diff(e) < 0).any():
        return _distinct_count_loop(hv, v, start, hist_end, self_in,
                                    null_counts)
    combined = np.concatenate([np.asarray(hv), np.asarray(v)])
    codes = exact_factorize(combined)
    if null_counts:
        # nulls merge into one ordinary value
        codes[codes < 0] = (codes.max() + 1) if (codes >= 0).any() else 0
    hcodes, vcodes = codes[:m], codes[m:]
    pos = np.flatnonzero(hcodes >= 0)
    c = hcodes[pos]
    order = np.lexsort((pos, c))
    sp, sc = pos[order], c[order]
    prev = np.full(len(sp), -1, dtype=np.int64)
    same = np.flatnonzero(sc[1:] == sc[:-1]) + 1
    prev[same] = sp[same - 1]
    has_prev = prev >= 0
    pj, pp = sp[has_prev], prev[has_prev]
    # j is duplicate in frames i with hist_end[i] > j (i >= first_e)
    # and start[i] <= prev[j] (i <= last_s)
    first_e = np.searchsorted(e, pj + 1, side="left")
    last_s = np.searchsorted(s, pp, side="right") - 1
    ok = first_e <= last_s
    diff = np.zeros(n + 1, dtype=np.int64)
    np.add.at(diff, first_e[ok], 1)
    np.add.at(diff, last_s[ok] + 1, -1)
    dup = np.cumsum(diff)[:n]
    pref = np.zeros(m + 1, dtype=np.int64)
    np.cumsum((hcodes >= 0).astype(np.int64), out=pref[1:])
    distinct = (pref[e] - pref[s] - dup).astype(np.float64)
    sel = np.asarray(self_in, dtype=bool) & (vcodes >= 0)
    if sel.any():
        # +1 unless the self value already occurs inside the slice;
        # keys are sorted by (code, position) from the lexsort above
        keys = sc * np.int64(m + 1) + sp
        ksel = vcodes[sel] * np.int64(m + 1)
        lo = np.searchsorted(keys, ksel + s[sel], side="left")
        hi = np.searchsorted(keys, ksel + e[sel], side="left")
        distinct[sel] += (hi == lo).astype(np.float64)
    return distinct


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
    col_kinds: dict[str, str] | None = None,
) -> dict[str, np.ndarray]:
    """Evaluate all aggregates for one sorted run.

    ``values[col]`` must be float64 with NaN for NULL (callers convert);
    ``where`` columns are bool. ``col_kinds`` maps columns to their
    source kind ('int'/'float'/'ts'/...) for string-emitting agg
    rendering. Returns full-length arrays (callers mask non-primary
    rows out).
    """
    n = len(ts)
    inw = spec.instance_not_in_window
    if inw and is_primary is not None and not is_primary.all():
        # history = union rows only (u-space); self from the full run
        is_union = ~is_primary
        hvalues = {c: v[is_union] for c, v in values.items()}
        start, hist_end, self_in, bpos = _inw_bounds(ts, spec, is_union)
    else:
        start, hist_end, self_in, bpos = frame_bounds(ts, spec)
        if inw:
            # no union rows in this run: the buffer holds only the
            # instance itself — empty history AND zero buffer position
            # (lag(k>=1) is NULL)
            hist_end = start.copy()
            bpos = np.zeros(n, dtype=np.int64)
        hvalues = values
    out: dict[str, np.ndarray] = {}

    # cache prefix structures per (col, where) pair (over history arrays)
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
            v = hvalues[col]
            ok = notnull(v)
            if where is not None:
                ok = ok & _wmask(hvalues[where])
            filled = np.where(ok, v, 0.0) if v.dtype != object else None
            psum = (np.concatenate(([0.0], np.cumsum(filled)))
                    if filled is not None else None)
            pcnt = np.concatenate(([0], np.cumsum(ok.astype(np.int64))))
            pref_cache[key] = (psum, pcnt)
        return pref_cache[key]

    def masked_vals(vals: dict, col: str, where: str | None):
        v = vals[col]
        if where is None:
            return v
        if v.dtype == object:
            return np.where(_wmask(vals[where]), v, None)
        return np.where(_wmask(vals[where]), v, np.nan)

    def where_items(col: str, where: str | None, i) -> list:
        """Non-null (+ where-passing) frame values of row i (generic
        slow path — strings and numerics)."""
        hv = masked_vals(hvalues, col, where)
        sv = hv if hvalues is values else masked_vals(values, col, where)
        return _frame_items(hv, start, hist_end, self_in, i, sv)

    for a in aggs:
        f = a.func
        base = f[:-6] if f.endswith("_where") else f
        where = a.where if f.endswith("_where") else None

        if base == "count" and a.col is None and where is None:
            # count(*): frame row count
            cnt = (hist_end - start) + self_in.astype(np.int64)
            out[a.name] = cnt.astype(np.float64)
        elif base == "count" and a.col is None:
            # count_where(*, cond): condition-passing frame row count
            wm_h = _wmask(hvalues[where])
            pw = np.concatenate(([0], np.cumsum(wm_h.astype(np.int64))))
            hcnt = pw[hist_end] - pw[start]
            sok = self_in & _wmask(values[where])
            out[a.name] = (hcnt + sok.astype(np.int64)).astype(
                np.float64)
        elif base == "count":
            _, pcnt = prefixes(a.col, where)
            hcnt = pcnt[hist_end] - pcnt[start]
            v = values[a.col]
            sok = self_in & notnull(v)
            if where is not None:
                sok = sok & _wmask(values[where])
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
                sok = sok & _wmask(values[where])
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
            hmv = masked_vals(hvalues, a.col, where)
            smv = hmv if hvalues is values \
                else masked_vals(values, a.col, where)
            # NaNs poison the sparse table -> +/- inf sentinel; an
            # explicit valid-count decides nullity, so legitimate
            # infinite values survive (sentinel only wins when the
            # whole range is null)
            _, pcnt_mm = prefixes(a.col, where)
            sent = np.inf if base == "min" else -np.inf
            mv_f = np.where(np.isnan(hmv), sent, hmv)
            hist = _range_reduce(mv_f, start, hist_end, op)
            hist[(pcnt_mm[hist_end] - pcnt_mm[start]) == 0] = np.nan
            selfv = np.where(self_in, smv, np.nan)
            out[a.name] = _combine_self(hist, selfv, self_in, op)
        elif base == "distinct_count":
            # NULL counts as one distinct value — except over bool
            # columns (test_udaf_function.yaml ids 5 vs 6)
            v = values[a.col]
            hv = hvalues[a.col]
            null_counts = (col_kinds or {}).get(a.col) != "bool"
            out[a.name] = _distinct_count(hv, v, start, hist_end,
                                          self_in, null_counts)
        elif base in ("lag", "at"):
            # value k buffer-rows before the current row — pure buffer
            # offset, INDEPENDENT of the frame bounds except MAXSIZE
            # eviction (window_functions_def.cc:96-156; lag aliases at
            # :146; test_udaf_function.yaml 57-60: lag works under
            # end-offset frames and lag(0) is always the instance row)
            v = values[a.col]
            hv = hvalues[a.col]
            res = (np.full(n, None, dtype=object) if v.dtype == object
                   else np.full(n, np.nan))
            if a.k == 0:
                res[:] = v
            else:
                pos = bpos - a.k
                ok = pos >= 0
                if spec.max_size and spec.max_size > 0:
                    ok &= pos >= (bpos - spec.max_size)
                m = len(hv)
                ok &= pos < m
                if ok.any():
                    res[ok] = hv[pos[ok]]
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
            v = values[a.col]
            hv = hvalues[a.col]
            res = (np.full(n, None, dtype=object) if v.dtype == object
                   else np.full(n, np.nan))
            hsel = ~self_in & (hist_end > start)
            if hsel.any():
                res[hsel] = hv[hist_end[hsel] - 1]
            res[self_in] = v[self_in]
            out[a.name] = res
        elif base == "last_value_ignore_nulls":
            # newest NON-NULL frame value (ANSI last_value IGNORE NULLS
            # over a history frame = forward fill) — vectorized running
            # maximum of valid indices
            v = values[a.col]
            hv = hvalues[a.col]
            hok = notnull(hv)
            if where is not None:
                hok = hok & _wmask(hvalues[where])
            m = len(hv)
            running = np.maximum.accumulate(
                np.where(hok, np.arange(m, dtype=np.int64), -1)) \
                if m else np.empty(0, dtype=np.int64)
            p_hist = np.where(hist_end > 0,
                              running[np.maximum(hist_end - 1, 0)]
                              if m else -1, -1)
            p_hist = np.where((hist_end > 0) & (p_hist >= start),
                              p_hist, -1)
            res = (np.full(n, None, dtype=object) if v.dtype == object
                   else np.full(n, np.nan))
            got = p_hist >= 0
            if got.any():
                res[got] = hv[p_hist[got]]
            sok = self_in & notnull(v)
            if where is not None:
                sok = sok & _wmask(values[where])
            res[sok] = v[sok]  # the instance is always the newest row
            out[a.name] = res
        elif base == "last_value_in_frame":
            # oldest frame row (start index), standard-SQL first_value analog
            v = values[a.col]
            hv = hvalues[a.col]
            res = (np.full(n, None, dtype=object) if v.dtype == object
                   else np.full(n, np.nan))
            res[self_in] = v[self_in]
            hsel = hist_end > start
            if hsel.any():
                res[hsel] = hv[start[hsel]]
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
            hv = hvalues[a.col]
            res = np.empty(n, dtype=object)
            # top renders values with the legacy best-effort format
            # (temporal kinds still get their canonical strings)
            vk = (col_kinds or {}).get(a.col)
            vk = vk if vk in ("ts", "date", "bool") else None
            for i in range(n):
                items = _frame_items(hv, start, hist_end, self_in, i, v)
                items.sort(reverse=True)
                res[i] = ",".join(_fmt(x, vk) for x in items[: a.k])
            out[a.name] = res
        elif base == "topn_frequency":
            # top-n values by frequency, ties by larger value first
            v = values[a.col]
            hv = hvalues[a.col]
            vk = (col_kinds or {}).get(a.col)
            vk = vk if vk in ("ts", "date", "bool") else None
            res = np.empty(n, dtype=object)
            for i in range(n):
                items = _frame_items(hv, start, hist_end, self_in, i, v)
                if items:
                    counts: dict = {}
                    for x in items:
                        counts[x] = counts.get(x, 0) + 1
                    # count desc, then value desc (string-safe)
                    ordered = sorted(counts, reverse=True)
                    ordered.sort(key=counts.get, reverse=True)
                    res[i] = ",".join(_fmt(x, vk) for x in ordered[: a.k])
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
            where = _wmask(values[a.where]) if a.where else None
            hv = hvalues[a.col] if a.col else None
            hcate = hvalues[a.cate]
            hwhere = _wmask(hvalues[a.where]) if a.where else None
            # variable top-n: n evaluated per instance (nested scalar)
            dyn_k = (a.params[1] if a.params[:1] == ("k_scalar",)
                     else None)
            res = np.empty(n, dtype=object)
            for i in range(n):
                # (cate, value, where) triples: history then self
                rows = [(hcate[j], hv[j] if hv is not None else 1.0,
                         hwhere[j] if hwhere is not None else True)
                        for j in range(start[i], hist_end[i])]
                if self_in[i]:
                    rows.append((cate[i], v[i] if v is not None else 1.0,
                                 where[i] if where is not None else True))
                groups: dict = {}
                for c, val, w in rows:
                    if _isnull(c) or not w:
                        continue
                    if v is not None and _isnull(val):
                        continue
                    groups.setdefault(c, []).append(val)
                kk = a.k
                if dyn_k is not None:
                    kv = out[dyn_k][i]
                    kk = int(kv) if kv == kv else 0
                keys_sorted = (sorted(groups, reverse=True)[: kk]
                               if top_n_key else sorted(groups))
                kkind = (col_kinds or {}).get(a.cate)
                vkind = ("int" if agg_kind == "count"
                         else (col_kinds or {}).get(a.col))
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
                    parts.append(f"{_fmt(k, kkind)}:"
                                 f"{_fmt(r, vkind, agg_kind == 'avg')}")
                res[i] = ",".join(parts)
            out[a.name] = res
        elif base.endswith("__split"):
            # composite FeatureZero aggs: outer agg over the flattened
            # split items of every frame value (e.g.
            # distinct_count(fz_window_split(c1, ","))) —
            # test_feature_zero_function.yaml ids 1/3/4/5
            from openmldb_ray.functions import feature_zero as fz
            outer = base[: -len("__split")]
            inner_name = a.params[0]
            nip = 2 if inner_name.endswith(("_by_key", "_by_value")) \
                else 1
            iparams = tuple(a.params[1:1 + nip])
            oparams = tuple(a.params[1 + nip:])
            split_fn = {"fz_window_split": fz.fz_split,
                        "fz_split": fz.fz_split,
                        "fz_window_split_by_key": fz.fz_split_by_key,
                        "fz_split_by_key": fz.fz_split_by_key,
                        "fz_window_split_by_value": fz.fz_split_by_value,
                        "fz_split_by_value": fz.fz_split_by_value
                        }[inner_name]
            v = values[a.col]
            hv = hvalues[a.col]
            res = (np.empty(n, dtype=object)
                   if outer in ("fz_join", "topn_frequency")
                   else np.full(n, np.nan))
            for i in range(n):
                flat: list = []
                # frame rows iterate NEWEST-first (the reference window
                # iterates from the instance row back); within one row
                # the split keeps source order
                for s in _frame_items(hv, start, hist_end, self_in,
                                      i, v)[::-1]:
                    flat.extend(split_fn(s, *iparams))
                if outer == "count":
                    res[i] = float(len(flat))
                elif outer == "distinct_count":
                    res[i] = float(len(set(flat)))
                elif outer == "top1_ratio":
                    # fz semantics: empty -> 0.0
                    if flat:
                        _, cnts = np.unique(flat, return_counts=True)
                        res[i] = cnts.max() / len(flat)
                    else:
                        res[i] = 0.0
                elif outer == "fz_join":
                    res[i] = fz.fz_join(flat, *oparams)
                else:  # topn_frequency: count desc, value asc, padded
                    kk = int(oparams[0]) if oparams else (a.k or 1)
                    if not flat:
                        res[i] = ""  # no split items: no padding
                        continue
                    counts: dict = {}
                    for x in flat:
                        counts[x] = counts.get(x, 0) + 1
                    ordered = sorted(counts)
                    ordered.sort(key=counts.get, reverse=True)
                    parts = [str(x) for x in ordered[:kk]]
                    parts += ["NULL"] * (kk - len(parts))
                    res[i] = ",".join(parts)
            out[a.name] = res
        elif base in ("fz_window_split", "fz_window_split_by_key",
                      "fz_window_split_by_value", "fz_join"):
            from openmldb_ray.functions import feature_zero as fz
            v = values[a.col]
            hv = hvalues[a.col]
            res = np.empty(n, dtype=object)
            for i in range(n):
                # newest-first, like the composite __split path above
                items = _frame_items(hv, start, hist_end, self_in,
                                     i, v)[::-1]
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
        elif base in ("top1_ratio", "fz_top1_ratio"):
            v = values[a.col]
            hv = hvalues[a.col]
            # fz_top1_ratio yields 0.0 over an empty/all-null frame
            # (test_feature_zero_function.yaml id 3 row 4); the plain
            # form keeps NULL
            res = (np.zeros(n) if base == "fz_top1_ratio"
                   else np.full(n, np.nan))
            for i in range(n):
                sl = _frame_items(hv, start, hist_end, self_in, i, v)
                if sl:
                    vals, cnts = np.unique(sl, return_counts=True)
                    res[i] = cnts.max() / len(sl)
            out[a.name] = res
        elif base == "fz_topn_frequency":
            # differs from plain topn_frequency: pads with 'NULL' to k
            # and breaks count ties by ASCENDING value
            # (test_feature_zero_function.yaml id 4)
            v = values[a.col]
            hv = hvalues[a.col]
            vk = (col_kinds or {}).get(a.col)
            res = np.empty(n, dtype=object)
            for i in range(n):
                items = _frame_items(hv, start, hist_end, self_in, i, v)
                counts: dict = {}
                for x in items:
                    counts[x] = counts.get(x, 0) + 1
                ordered = sorted(counts)
                ordered.sort(key=counts.get, reverse=True)
                parts = [_fmt(x, vk) for x in ordered[: a.k]]
                parts += ["NULL"] * (a.k - len(parts))
                res[i] = ",".join(parts)
            out[a.name] = res
        elif base.endswith("__nexpr"):
            # nested-aggregate expression (test_udaf_function.yaml ids
            # 43/53, usecase composites): inner window aggregates are
            # per-INSTANCE scalars over the same frame (computed above
            # as hidden aggs, planner orders them first), the value /
            # where expressions evaluate per FRAME ROW with those
            # scalars broadcast, and the outer reduce runs over the
            # result. Per-row recompute matches the reference's own
            # cost model (JIT recomputes every frame, no incremental
            # state); at scale prefer algebraic rewrites upstream.
            outer = base[: -len("__nexpr")]
            if outer.endswith("_where"):
                outer = outer[:-6]
            val_fn, where_fn, need_cols, scalar_names = a.params
            res = np.full(n, np.nan)
            if outer == "instance":
                # expression on the INSTANCE row with nested scalars
                # (variable top-n args); no frame reduce
                for i in range(n):
                    scal = {s: out[s][i] for s in scalar_names}
                    frame = {c: values[c][i:i + 1] for c in need_cols}
                    r = val_fn(frame, scal, 1)
                    res[i] = (np.nan if r[0] is None else float(r[0])) \
                        if r.dtype == object else float(r[0])
                out[a.name] = res
                continue
            for i in range(n):
                m = int(hist_end[i] - start[i]) + int(self_in[i])
                if m == 0:
                    if outer == "sum_zero":
                        res[i] = 0.0
                    elif outer == "count":
                        res[i] = 0.0
                    continue
                frame = {}
                for c in need_cols:
                    hv = hvalues[c][start[i]:hist_end[i]]
                    frame[c] = (np.concatenate([hv, values[c][i:i + 1]])
                                if self_in[i] else hv)
                scal = {s: out[s][i] for s in scalar_names}
                varr = val_fn(frame, scal, m)
                if varr.dtype == object:
                    import pandas as pd
                    ok = ~pd.isna(varr)
                else:
                    ok = ~np.isnan(varr)
                if where_fn is not None:
                    ok = ok & _wmask(where_fn(frame, scal, m))
                sel = varr[ok]
                if outer == "count":
                    res[i] = float(len(sel))
                elif len(sel) == 0:
                    if outer == "sum_zero":
                        res[i] = 0.0
                elif outer in ("sum", "sum_zero"):
                    res[i] = float(np.sum(sel.astype(np.float64)))
                elif outer == "avg":
                    res[i] = float(np.mean(sel.astype(np.float64)))
                elif outer == "min":
                    res[i] = float(np.min(sel.astype(np.float64)))
                elif outer == "max":
                    res[i] = float(np.max(sel.astype(np.float64)))
                elif outer == "distinct_count":
                    res[i] = float(len(set(sel.tolist())))
                else:
                    raise NotImplementedError(
                        f"nested outer aggregate {outer}")
            out[a.name] = res
        else:
            raise NotImplementedError(f"window func {f}")
    return out
