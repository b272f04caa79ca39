"""ZERO-SHUFFLE window aggregation over time-ordered physical layouts.

Most event logs arrive time-ordered: within every file (and therefore
within every maximal monotone fragment of a read block), each entity's
rows ascend by the ORDER BY column. For such layouts the all-to-all
exchange of the shuffle plan (`window.runner.window_agg`) is
unnecessary — the frames of a row only need that entity's recent
HISTORY, which is a bounded tail of the preceding fragments:

1. pass 1 (map-only): per block, per entity segment (stable-group by
   key, split at order descents — `skew._entity_segments`), emit a
   summary row carrying the segment's key range and its boundary-tail
   ROWS (every projected column, pickled Arrow slice — a few KB);
2. assembly (one Ray task; bytes never cross the driver): per entity,
   order segments by first ts, VERIFY ranges don't interleave
   (`_NotPresorted` on violation — globally time-sorted data can
   never violate), prefix-scan the tails into each segment's
   trimmed history table;
3. pass 2 (map-only): per block, prepend every segment's history rows
   tagged as buffer-only (the WINDOW UNION mechanics) and run the
   SAME `_BucketWindow` eval+emit as the shuffle plan — results are
   identical by construction (tested).

Reference analog: the online engine serves windows from the storage
index without any shuffle (IndexSeek/RequestUnion,
hybridse/src/vm/runner.h:957); this is the batch equivalent for
physically ordered data. Frames must be history-bounded
(``preceding_rows`` and/or ``preceding_range`` finite).
"""

from __future__ import annotations


from typing import Sequence

import numpy as np
import pyarrow as pa
import ray
import ray.data

from openmldb_ray.io import order_to_int64
from openmldb_ray.skew import _NotPresorted, _entity_segments
from openmldb_ray.window.spec import Agg, WindowSpec

_UNBOUNDED = 1 << 39


def _ser_table(t: pa.Table) -> bytes:
    """Arrow IPC serialization: unlike pickle, the writer TRUNCATES
    sliced buffers, so a 50-row tail of a 100k-row block costs 50
    rows, not the whole parent buffer."""
    buf = pa.BufferOutputStream()
    with pa.ipc.new_stream(buf, t.schema) as w:
        w.write_table(t)
    return buf.getvalue().to_pybytes()


def _de_table(b: bytes) -> pa.Table:
    return pa.ipc.open_stream(b).read_all()


def _tail_depths(specs_aggs) -> tuple[int, int]:
    tail_rows, tail_range = 0, 0
    for spec, _ in specs_aggs:
        r = spec.preceding_rows
        t = spec.preceding_range
        if (r is None or r >= _UNBOUNDED) and \
                (t is None or t >= _UNBOUNDED):
            raise _NotPresorted(
                "unbounded frames need the whole history per entity — "
                "use the shuffle plan")
        if r is not None and r < _UNBOUNDED:
            tail_rows = max(tail_rows, int(r) + 1)
        if t is not None and t < _UNBOUNDED:
            tail_range = max(tail_range, int(t))
        if spec.max_size:
            tail_rows = max(tail_rows, int(spec.max_size) + 1)
    return tail_rows, tail_range


class _GenericSummary:
    """Pass 1: (key, first_ts, last_ts, n_rows, pickled tail table)
    per entity segment. Rows with NULL/negative order keys are dropped
    first (the reference drops them, WindowAggPlan.scala:783-791)."""

    def __init__(self, keys, order_by, tail_rows, tail_range, cols):
        self.keys = list(keys)
        self.key_col = keys[0] if len(keys) == 1 else "__ckey__"
        self.order_by = order_by
        self.tail_rows = tail_rows
        self.tail_range = tail_range
        self.cols = cols
        self.__name__ = "blockwise_window_summaries"

    def _clean(self, b: pa.Table) -> pa.Table:
        b = b.select(self.cols)
        ts = order_to_int64(b[self.order_by])
        keep = ts >= 0
        if not keep.all():
            b = b.filter(pa.array(keep))
        if len(self.keys) > 1:
            # composite partition key: one derived segmentation column
            # (the kernel still groups on the real key columns)
            import pyarrow.compute as pc
            ck = pc.cast(b[self.keys[0]], pa.string())
            for kcol in self.keys[1:]:
                ck = pc.binary_join_element_wise(
                    ck, pc.cast(b[kcol], pa.string()), "\x1f")
            b = b.append_column("__ckey__", ck)
        return b

    def _empty(self) -> pa.Table:
        return pa.table({
            "__key__": pa.array([], type=pa.string()),
            "first_ts": pa.array([], type=pa.int64()),
            "last_ts": pa.array([], type=pa.int64()),
            "n_rows": pa.array([], type=pa.int64()),
            "tail_n": pa.array([], type=pa.int64()),
            "tail": pa.array([], type=pa.binary()),
        })

    def __call__(self, b: pa.Table) -> pa.Table:
        b = self._clean(b)
        if b.num_rows == 0:
            return self._empty()
        b2, segs = _entity_segments(b, self.key_col, self.order_by,
                                    split_ties=False)
        keys_out, firsts, lasts, ns, cuts, tails = [], [], [], [], [], []
        for lo, hi, k in segs:
            seg = b2.slice(lo, hi - lo)
            ts = order_to_int64(seg[self.order_by])
            cut = min(hi - lo, self.tail_rows)
            if self.tail_range > 0:
                cut = max(cut, (hi - lo) - int(np.searchsorted(
                    ts, ts[-1] - self.tail_range, side="left")))
            cut = min(cut, hi - lo)
            keys_out.append(str(k))
            firsts.append(int(ts[0]))
            lasts.append(int(ts[-1]))
            ns.append(hi - lo)
            cuts.append(cut)
            tails.append(_ser_table(seg.slice(hi - lo - cut, cut)))
        return pa.table({
            "__key__": pa.array(keys_out, type=pa.string()),
            "first_ts": pa.array(firsts, type=pa.int64()),
            "last_ts": pa.array(lasts, type=pa.int64()),
            "n_rows": pa.array(ns, type=pa.int64()),
            "tail_n": pa.array(cuts, type=pa.int64()),
            "tail": pa.array(tails, type=pa.binary()),
        })


@ray.remote
def _assemble_generic(order_by, tail_rows, tail_range, budget, refs):
    """Per entity: verify disjoint segment ranges, prefix-scan tails
    into each segment's trimmed history slice. Returns (meta,
    (hist_table, index)): ONE concatenated history table plus
    {key: {first_ts: (row_lo, n_rows)}} — one big object serializes at
    memory speed where a dict of thousands of small pa.Tables paid
    ~4 ms of (de)serialization EACH (measured: 9 s assembly return +
    4 s per-worker get at 2k segments)."""
    tables = [t for t in ray.get(refs) if t.num_rows]
    size = sum(t.nbytes for t in tables)
    if size > budget:
        return ({"status": "refuse",
                 "msg": f"summary tails exceed assembly budget "
                        f"({size >> 20} MiB)"}, None)
    if not tables:
        return ({"status": "ok", "nseg": 0}, {})
    t = pa.concat_tables(tables)
    keys_l = t["__key__"].to_pylist()
    firsts_l = t["first_ts"].to_pylist()
    lasts_l = t["last_ts"].to_pylist()
    nrows_l = t["n_rows"].to_pylist()
    tails_l = t["tail"].to_pylist()
    # economics guard: when per-block entity runs are shorter than the
    # frame depth (high-cardinality keys / small blocks), the
    # replicated histories approach the dataset itself and the plan
    # degenerates — the shuffle plan wins there
    total_rows = sum(nrows_l)
    tail_rows_total = sum(t["tail_n"].to_pylist())
    if tail_rows_total > 0.9 * total_rows:
        return ({"status": "refuse",
                 "msg": f"history replication ({tail_rows_total} tail "
                        f"rows over {total_rows} data rows) defeats "
                        "the zero-shuffle plan — entity runs per "
                        "block are shorter than the frame depth"},
                None)
    per: dict = {}
    for i in range(t.num_rows):
        per.setdefault(keys_l[i], []).append(
            (firsts_l[i], lasts_l[i], tails_l[i]))
    index: dict = {}
    parts: list = []
    row_at = 0
    for k, segs in per.items():
        segs.sort(key=lambda s: s[0])
        for (f1, l1, _), (f2, _, _) in zip(segs, segs[1:]):
            # a single shared boundary timestamp (l1 == f2) is a
            # legitimate tie in time-ordered data; anything deeper is
            # genuine interleaving
            if l1 > f2 or f1 == f2:
                return ({"status": "refuse",
                         "msg": f"entity {k!r} segment ranges "
                                f"interleave ([{f1}..{l1}] vs "
                                f"[{f2}..]) — not a time-ordered "
                                "layout"}, None)
        hist: pa.Table | None = None
        idx_k: dict = {}
        for first_ts, _, tail_blob in segs:
            if hist is not None and hist.num_rows:
                idx_k[first_ts] = (row_at, hist.num_rows)
                parts.append(hist)
                row_at += hist.num_rows
            tail = _de_table(tail_blob)
            # __seg__ = source segment id (its first_ts): pass 2 drops
            # a history row exactly when its source segment is primary
            # (or already history-covered) in the SAME block — exact
            # dedup even under boundary ties
            tail = tail.append_column("__seg__", pa.array(
                np.full(tail.num_rows, first_ts, dtype=np.int64)))
            hist = tail if hist is None else \
                pa.concat_tables([hist, tail])
            # trim to what any future frame can reach
            ts = order_to_int64(hist[order_by])
            keep_from = len(ts)
            if tail_range > 0:
                keep_from = int(np.searchsorted(
                    ts, ts[-1] - tail_range, side="left"))
            keep_from = min(keep_from, max(0, len(ts) - tail_rows))
            if keep_from:
                hist = hist.slice(keep_from)
        index[k] = idx_k
    if parts:
        big = pa.concat_tables(parts).combine_chunks()
    else:
        big = None
    return ({"status": "ok", "nseg": t.num_rows}, (big, index))


class _GenericBlockWindow:
    """Pass 2: identical cleaning + segmentation, then ONE shuffle-plan
    `_BucketWindow` call over (history rows tagged buffer-only +
    block rows)."""

    def __init__(self, plan_ref, specs_aggs, passthrough, keys,
                 order_by, tail_rows, tail_range, cols):
        self._plan_ref = plan_ref
        self._plans = None
        self.specs_aggs = specs_aggs
        self.passthrough = passthrough
        self.keys = keys
        self.order_by = order_by
        self.summary = _GenericSummary(keys, order_by, tail_rows,
                                       tail_range, cols)
        self.__name__ = "blockwise_window"

    @property
    def plans(self):
        if self._plans is None:
            self._plans = ray.get(self._plan_ref) if isinstance(
                self._plan_ref, ray.ObjectRef) else self._plan_ref
        return self._plans

    def _runner(self):
        from openmldb_ray.window.runner import _BucketWindow
        return _BucketWindow(self.specs_aggs, self.passthrough, True,
                             [self.order_by], None, False)

    def __call__(self, b: pa.Table) -> pa.Table:
        from openmldb_ray.window.runner import _TAG
        b = self.summary._clean(b)
        if b.num_rows == 0:
            return self._runner()._empty_table(
                b.append_column(_TAG, pa.array([], type=pa.int8())))
        b2, segs = _entity_segments(b, self.summary.key_col,
                                    self.order_by, split_ties=False)
        # per entity, walk segments in ts order (block order of
        # same-entity fragments is arbitrary)
        by_key: dict = {}
        for lo, hi, k in segs:
            ts_seg = order_to_int64(b2.slice(lo, hi - lo)[self.order_by])
            by_key.setdefault(str(k), []).append(int(ts_seg[0]))
        big, index = self.plans
        hist_parts = []
        for k, firsts in by_key.items():
            firsts.sort()
            for j, first_ts in enumerate(firsts):
                loc = index.get(k, {}).get(first_ts)
                if loc is None:
                    continue
                h = big.slice(loc[0], loc[1])
                if j > 0:
                    # keep only history sourced from segments AFTER the
                    # previous same-block segment: earlier sources are
                    # already present — as that segment's primary rows,
                    # or inside ITS history (trim depths guarantee
                    # coverage) — exact dedup even under boundary ties
                    src = h["__seg__"].to_numpy(zero_copy_only=False)
                    h = h.filter(pa.array(src > firsts[j - 1]))
                if h.num_rows:
                    hist_parts.append(h.drop_columns(["__seg__"]))
        prim = b2.append_column(
            _TAG, pa.array(np.zeros(b2.num_rows, dtype=np.int8)))
        if hist_parts:
            hist = pa.concat_tables(hist_parts)
            hist = hist.append_column(_TAG, pa.array(
                np.full(hist.num_rows, -1, dtype=np.int8)))
            combined = pa.concat_tables([hist, prim])
        else:
            combined = prim
        return self._runner()(combined)


def blockwise_window_agg(
    ds: ray.data.Dataset,
    spec: WindowSpec | Sequence[tuple[WindowSpec, Sequence[Agg]]],
    aggs: Sequence[Agg] | None = None,
    *,
    passthrough: Sequence[str] | None = None,
    plan_budget_bytes: int = 1 << 30,
    pin_input: bool = True,
) -> ray.data.Dataset:
    """Zero-shuffle `window_agg` for time-ordered physical layouts.

    Accepts one (spec, aggs) pair or several pairs sharing keys and
    order column (like `window_agg_multi`). Raises ``_NotPresorted``
    when the layout verification fails, frames are unbounded, or the
    economics degenerate (entity runs per block shorter than the frame
    depth) — callers fall back to the shuffle plan. Results are
    identical to `window_agg` (same kernel, same emit path; tested).

    ``pin_input``: materialize the pruned projection once so pass 1
    and pass 2 share it (passes must see identical blocks; without the
    pin a lazy source is decoded twice). Disable when the projection
    exceeds aggregate object-store memory — the 100 TB analog is a
    parquet checkpoint of the projection."""
    specs_aggs = spec if isinstance(spec, (list, tuple)) \
        else [(spec, list(aggs or ()))]
    specs_aggs = [(s, list(a)) for s, a in specs_aggs]
    spec0 = specs_aggs[0][0]
    for s, _ in specs_aggs:
        if tuple(s.keys) != tuple(spec0.keys) \
                or s.order_by != spec0.order_by:
            raise _NotPresorted("all specs must share keys + order")
    tail_rows, tail_range = _tail_depths(specs_aggs)
    all_aggs = [a for _, a in specs_aggs for a in a]
    if passthrough is None:
        passthrough = list(spec0.keys) + [spec0.order_by]
    passthrough = list(passthrough)
    cols = list(dict.fromkeys(
        list(spec0.keys) + [spec0.order_by]
        + [a.col for a in all_aggs if a.col]
        + [a.where for a in all_aggs if a.where]
        + [a.cate for a in all_aggs if a.cate] + passthrough))

    if pin_input:
        def prune(b: pa.Table) -> pa.Table:
            return b.select(cols)
        prune.__name__ = "prune_projection"
        ds = ds.map_batches(prune, batch_format="pyarrow",
                            batch_size=None,
                            zero_copy_batch=True).materialize()
    summaries = ds.map_batches(
        _GenericSummary(spec0.keys, spec0.order_by, tail_rows,
                        tail_range, cols),
        batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True).materialize()
    meta_ref, payload_ref = _assemble_generic.options(
        num_returns=2).remote(
        spec0.order_by, tail_rows, tail_range, plan_budget_bytes,
        list(summaries.to_arrow_refs()))
    meta = ray.get(meta_ref)
    if meta["status"] != "ok":
        raise _NotPresorted(meta["msg"])
    return ds.map_batches(
        _GenericBlockWindow(payload_ref, specs_aggs, passthrough,
                            list(spec0.keys), spec0.order_by,
                            tail_rows, tail_range, cols),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
