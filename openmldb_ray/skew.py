"""Skew handling: hot-key detection + parallel processing of hot
entities with replicated history.

The reference's skew optimizer (java/openmldb-batch
WindowAggPlan.windowPartitionWithSkewOpt, WindowAggPlan.scala:194-314 +
utils/SkewDataFrameUtils.scala:26-143) quantile-splits a hot key's
timeline into parts and re-emits the history rows each part needs with
an EXPANDED flag so they feed the buffer but never emit. This module
re-expresses the same idea two ways:

- ``detect_hot_keys``: tiny groupby-count pre-pass -> driver-side hot
  set (the distribution-table analog).
- ``hot_entity_window``: one hot entity, processed block-parallel:
  range-partitioned sort by the order axis, then (pass 1) per-block
  light summaries (row counts, axis totals, boundary tails) -> driver
  prefix scan -> (pass 2) per-block window evaluation with the
  previous blocks' tail rows prepended as buffer-only history
  (is_primary=False — exactly the reference's EXPANDED_ROW).
  Parts = sorted blocks; replication = the boundary tails; the
  monotone watermark is the block's axis offset.

Exactness: a block's frame never reaches further back than
max(preceding_rows, rows covering preceding_range), and the driver
assembles tails across as many predecessor blocks as that depth needs,
so results are bit-identical to the single-task path (asserted in
tests against the unsalted runner).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import ray
import ray.data

from openmldb_ray.window.kernel import eval_aggs
from openmldb_ray.window.spec import Agg, WindowSpec


def key_counts(ds: ray.data.Dataset, key: str):
    """Per-key row counts as a pandas Series (index = key values).

    Pre-aggregated: each batch emits (key, partial_count) — one row per
    key per batch — and only those partials are reduced on the driver.
    No shuffle of the raw rows (a bare groupby().count() would move
    every row). Driver memory = O(distinct keys), the same contract as
    the reference's skew distribution table."""
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        vc = b[key].value_counts()
        return pa.table({key: vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return parts.groupby(key, sort=False)["n"].sum()


def detect_hot_keys(ds: ray.data.Dataset, key: str,
                    hot_frac: float = 0.05,
                    min_rows: int = 100_000) -> list:
    """Keys holding more than ``hot_frac`` of all rows (and at least
    ``min_rows``)."""
    counts = key_counts(ds, key)
    total = counts.sum()
    hot = counts[(counts > total * hot_frac) & (counts >= min_rows)]
    return hot.index.tolist()


def pack_key_buckets(counts, num_buckets: int) -> dict:
    """Balanced key -> bucket assignment (LPT greedy bin packing) from
    measured per-key row counts.

    Hashing N uniform keys into ~N buckets leaves some buckets with
    2-4 keys and others empty (balls-in-bins), so one shuffle
    partition takes 2-4x longer than the mean — the measured straggler
    tail of the fused corpus shuffle. With the counts already in hand
    (one partial-agg pass, shared with hot-key detection), assigning
    heaviest-first to the least-loaded bucket bounds every bucket at
    mean + one key."""
    import heapq
    loads = [(0, b) for b in range(num_buckets)]
    heapq.heapify(loads)
    out = {}
    for k, n in sorted(dict(counts).items(),
                       key=lambda kv: (-kv[1], str(kv[0]))):
        load, b = heapq.heappop(loads)
        out[k] = b
        heapq.heappush(loads, (load + int(n), b))
    return out


def salted_window_agg(
    ds: ray.data.Dataset,
    spec: WindowSpec,
    aggs: Sequence[Agg],
    *,
    passthrough: Sequence[str] | None = None,
    num_buckets: int | None = None,
    hot_frac: float = 0.05,
    min_rows: int = 100_000,
    parts: int | None = None,
    sample_frac: float = 0.02,
) -> ray.data.Dataset:
    """The reference's quantile-salting scheme, generic form — for a
    window whose ORDER BY axis exists as a physical column (events-
    style tables). Handles BOTH frame kinds:

    - ``preceding_range``: replicate rows by time proximity
      (ts >= boundary - range);
    - ``preceding_rows``: count-based lookback — an exact per-(key,
      part) row-count pre-pass (partial agg, no shuffle) picks, for
      each part, the minimal run of whole predecessor parts covering
      ``preceding_rows`` rows, and replicates those (extra history is
      harmless: frame bounds cap the lookback; the reference bounds
      the same replication by minBlockSize,
      utils/SkewDataFrameUtils.scala:110-127).

    Mirrors WindowAggPlan.windowPartitionWithSkewOpt
    (WindowAggPlan.scala:194-314 + SkewDataFrameUtils.scala:26-143):

    1. distribution pass: partial-agg key counts -> hot keys; sampled
       ts quantiles per hot key -> part boundaries (the
       percentile_approx analog), broadcast;
    2. tag each hot row PART_ID by quantile; re-emit the rows that a
       later part's frames can reach with EXPANDED=true — they feed
       buffers, never emit (the same buffer-only mechanics as WINDOW
       UNION);
    3. shuffle on (key, PART_ID) instead of key -> a hot key spreads
       over ``parts`` tasks; cold keys ride along with PART_ID=0.

    Results are exactly equal to ``window_agg`` (tested).
    """
    import pyarrow.compute as pc

    from openmldb_ray.context import cluster_cpus, default_num_buckets
    from openmldb_ray.io import hash_columns, order_to_int64
    from openmldb_ray.window.runner import _BUCKET, _TAG, _BucketWindow

    if len(spec.keys) != 1:
        raise ValueError("single partition key supported")
    key = spec.keys[0]
    aggs = list(aggs)
    if passthrough is None:
        passthrough = list(spec.keys) + [spec.order_by]
    passthrough = list(passthrough)
    num_buckets = num_buckets or default_num_buckets()
    parts = parts or max(4, cluster_cpus() // 2)

    hot = detect_hot_keys(ds, key, hot_frac, min_rows)
    if not hot:
        from openmldb_ray.window.runner import window_agg
        return window_agg(ds, spec, aggs, passthrough=passthrough,
                          num_buckets=num_buckets)

    # sampled ts quantiles per hot key (distribution table analog)
    hot_set = set(hot)

    def sample(b: pa.Table) -> pa.Table:
        mask = pc.is_in(b[key], value_set=pa.array(list(hot_set)))
        t = b.filter(mask)
        n = t.num_rows
        if n == 0:
            return pa.table({key: t[key], "__ts__": pa.array(
                np.empty(0, dtype=np.int64))})
        take = np.random.default_rng(42).random(n) < max(sample_frac,
                                                         1000 / max(n, 1))
        t = t.filter(pa.array(take))
        return pa.table({key: t[key],
                         "__ts__": pa.array(order_to_int64(
                             t[spec.order_by]))})

    samp = pa.concat_tables(
        ds.map_batches(sample, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20))
    bounds: dict = {}
    sdf = samp.to_pandas()
    for k, g in sdf.groupby(key):
        qs = np.quantile(g["__ts__"].to_numpy(),
                         np.linspace(0, 1, parts + 1)[1:-1])
        bounds[k] = np.unique(qs.astype(np.int64))
    bref = ray.put(bounds)
    rng_t = int(spec.preceding_range) if spec.preceding_range else None
    rows_R = int(spec.preceding_rows) if spec.preceding_rows else None

    # count-based frames need exact per-(key, part) row counts so the
    # minimal set of whole predecessor parts covering R rows can be
    # replicated — one cheap partial-agg pass, no shuffle
    pmin: dict = {}
    if rows_R is not None:
        def part_count(b: pa.Table) -> pa.Table:
            ts = order_to_int64(b[spec.order_by])
            keys_np = b[key].to_numpy(zero_copy_only=False)
            ks, ns, ps = [], [], []
            for k, bnds in bounds.items():
                rows = np.flatnonzero(keys_np == k)
                if len(rows) == 0:
                    continue
                part = np.searchsorted(bnds, ts[rows], side="right")
                u, c = np.unique(part, return_counts=True)
                ks.extend([k] * len(u))
                ps.extend(u.tolist())
                ns.extend(c.tolist())
            return pa.table({key: pa.array(ks),
                             "__part__": pa.array(ps, type=pa.int64()),
                             "__n__": pa.array(ns, type=pa.int64())})
        pdf = ds.map_batches(part_count, batch_format="pyarrow").to_pandas()
        agg = pdf.groupby([key, "__part__"])["__n__"].sum()
        for k, bnds in bounds.items():
            nparts = len(bnds) + 1
            counts = np.zeros(nparts, dtype=np.int64)
            if k in agg.index.get_level_values(0):
                sub = agg.loc[k]
                counts[sub.index.to_numpy()] = sub.to_numpy()
            cum = np.concatenate(([0], np.cumsum(counts)))
            # largest p with sum(counts[p:q]) >= R (minimal replication)
            ps = np.searchsorted(cum, cum - rows_R, side="right") - 1
            pmin[k] = np.maximum(ps, 0)  # index q -> first part to copy

    def expand(b: pa.Table) -> pa.Table:
        bd = ray.get(bref)
        ts = order_to_int64(b[spec.order_by])
        keys_np = b[key].to_numpy(zero_copy_only=False)
        salt = np.zeros(len(ts), dtype=np.int32)
        out_idx = [np.arange(len(ts))]
        out_salt = [salt]
        out_tag = [np.zeros(len(ts), dtype=np.int8)]  # primary tag 0
        for k, bnds in bd.items():
            rows = np.flatnonzero(keys_np == k)
            if len(rows) == 0:
                continue
            part = np.searchsorted(bnds, ts[rows], side="right")
            salt[rows] = part.astype(np.int32)
            # replicate history into each later part whose frames reach it
            for q, b_q in enumerate(bnds, start=1):
                older = part < q
                need_mask = np.zeros(len(rows), dtype=bool)
                if rng_t is not None:
                    need_mask |= older & (ts[rows] >= b_q - rng_t)
                if rows_R is not None:
                    need_mask |= older & (part >= pmin[k][q])
                need = rows[need_mask]
                if len(need):
                    out_idx.append(need)
                    out_salt.append(np.full(len(need), q, dtype=np.int32))
                    out_tag.append(np.full(len(need), -1, dtype=np.int8))
        idx = np.concatenate(out_idx)
        t = b.take(pa.array(idx))
        t = t.append_column("__salt__", pa.array(np.concatenate(out_salt)))
        t = t.append_column(_TAG, pa.array(np.concatenate(out_tag)))
        h = hash_columns(t, [key, "__salt__"], num_buckets)
        return t.append_column(_BUCKET, pa.array(h))

    cols = list(dict.fromkeys(
        [key, spec.order_by] + [a.col for a in aggs if a.col]
        + [a.where for a in aggs if a.where]
        + [a.cate for a in aggs if a.cate] + passthrough))
    tagged = ds.map_batches(lambda b: expand(b.select(cols)),
                            batch_format="pyarrow")

    from dataclasses import replace
    spec2 = replace(spec, partition_by=(key, "__salt__"))
    fn = _BucketWindow([(spec2, aggs)], passthrough, True,
                       [spec.order_by], None, True)
    try:
        grouped = tagged.groupby(_BUCKET, num_partitions=num_buckets)
    except TypeError:
        grouped = tagged.groupby(_BUCKET)
    return grouped.map_groups(fn, batch_format="pyarrow")


class _BlockSummary:
    """Pass 1: per sorted block, emit (first_key, rows, ntok_total,
    tail arrays) — a few KB per block. With ``asof_modulo`` set, also
    this block's LAST dim row (local ts + payload) so the driver scan
    can hand each block the newest dim row preceding it (the
    co-partitioned as-of join carry; see corpus._derive_ts_with_asof).
    """

    def __init__(self, value_col: str, order_col: str, tail_rows: int,
                 tail_range: int, asof_modulo: int | None = None,
                 verify_sorted: bool = False):
        self.value_col = value_col
        self.order_col = order_col
        self.tail_rows = tail_rows
        self.tail_range = tail_range
        self.asof_modulo = asof_modulo
        self.verify_sorted = verify_sorted

    def __call__(self, b: pa.Table, key: str | None = None) -> pa.Table:
        if b.num_rows == 0:
            return self._empty()
        if self.verify_sorted:
            import pyarrow.compute as pc
            col = b[self.order_col].combine_chunks()
            ok = pc.all(pc.less(col.slice(0, len(col) - 1),
                                col.slice(1))).as_py()
            if ok is not True:
                raise _NotPresorted(
                    f"block of {b.num_rows} rows is not strictly "
                    f"ascending by {self.order_col!r}")
        v = b[self.value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        local_ts = np.concatenate(([0], np.cumsum(v)[:-1]))
        end_ts = local_ts[-1] + v[-1] if len(v) else 0
        # tail = rows that any later row's frame could reach:
        # last `tail_rows` rows OR rows with ts >= end_ts - tail_range
        k = len(v)
        cut = min(k, self.tail_rows)
        if self.tail_range > 0:
            cut = max(cut, k - int(np.searchsorted(
                local_ts, end_ts - self.tail_range, side="left")))
        cut = min(cut, k)
        dim_last_ts, dim_last_pay = -1, 0
        if self.asof_modulo is not None and k:
            from openmldb_ray.pipelines.corpus import _doc_idx
            # single-entity segment: every doc_id shares the
            # "<key>-" prefix, so the RE2 strip reduces to a
            # constant-offset slice (see _doc_idx docstring)
            idx = _doc_idx(b[self.order_col],
                           prefix_len=None if key is None
                           else len(key) + 1)
            dims = np.flatnonzero((idx % self.asof_modulo) == 0)
            if len(dims):
                dim_last_ts = int(local_ts[dims[-1]])
                dim_last_pay = int(v[dims[-1]])
        return pa.table({
            "first_doc": [b[self.order_col][0].as_py()],
            "last_doc": [b[self.order_col][k - 1].as_py()],
            "n_rows": pa.array([k], type=pa.int64()),
            "ntok_total": pa.array([int(end_ts)], type=pa.int64()),
            "tail_vals": pa.array([v[k - cut:].tolist()],
                                  type=pa.list_(pa.int64())),
            "tail_ts": pa.array([local_ts[k - cut:].tolist()],
                                type=pa.list_(pa.int64())),
            "dim_last_ts": pa.array([dim_last_ts], type=pa.int64()),
            "dim_last_pay": pa.array([dim_last_pay], type=pa.int64()),
        })

    def _empty(self) -> pa.Table:
        return pa.table({
            "first_doc": pa.array([], type=pa.string()),
            "last_doc": pa.array([], type=pa.string()),
            "n_rows": pa.array([], type=pa.int64()),
            "ntok_total": pa.array([], type=pa.int64()),
            "tail_vals": pa.array([], type=pa.list_(pa.int64())),
            "tail_ts": pa.array([], type=pa.list_(pa.int64())),
            "dim_last_ts": pa.array([], type=pa.int64()),
            "dim_last_pay": pa.array([], type=pa.int64()),
        })


class _NotPresorted(Exception):
    """Raised when a claimed-presorted layout fails verification."""


def _just_after(v):
    """The smallest order value strictly greater than ``v`` — used to
    turn a segment's LAST into an exclusive cut point."""
    if isinstance(v, str):
        return v + "\0"
    return v + 1


def _summary_rows(t: pa.Table) -> list[dict]:
    """Columnar summary-table -> row dicts with NUMPY tails (zero
    per-element conversion; take_all's per-row list materialization of
    the tail columns measured 4s at 12k summaries)."""
    tv = t["tail_vals"].combine_chunks()
    tt = t["tail_ts"].combine_chunks()
    voff = tv.offsets.to_numpy()
    vflat = tv.values.to_numpy() if len(tv.values) else \
        np.empty(0, dtype=np.int64)
    toff = tt.offsets.to_numpy()
    tflat = tt.values.to_numpy() if len(tt.values) else \
        np.empty(0, dtype=np.int64)
    first = t["first_doc"].to_pylist()
    last = t["last_doc"].to_pylist()
    n_rows = t["n_rows"].to_numpy()
    ntok = t["ntok_total"].to_numpy()
    dlt = t["dim_last_ts"].to_numpy()
    dlp = t["dim_last_pay"].to_numpy()
    src = t["__src__"].to_pylist() if "__src__" in t.column_names \
        else None
    rows = []
    for i in range(t.num_rows):
        r = {"first_doc": first[i], "last_doc": last[i],
             "n_rows": int(n_rows[i]), "ntok_total": int(ntok[i]),
             "tail_vals": vflat[voff[i]:voff[i + 1]],
             "tail_ts": tflat[toff[i]:toff[i + 1]],
             "dim_last_ts": int(dlt[i]), "dim_last_pay": int(dlp[i])}
        if src is not None:
            r["__src__"] = src[i]
        rows.append(r)
    return rows


def _collect_table(ds: ray.data.Dataset) -> pa.Table:
    """Materialized small Dataset -> one Arrow table (zero-copy plasma
    reads, no row conversion)."""
    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tables:
        return None
    return pa.concat_tables(tables)


@ray.remote
def _assemble_task(tail_rows, tail_range, min_segment_rows,
                   plan_budget_bytes, table_refs):
    """Plan assembly as a Ray task: summary bytes flow worker->worker
    through plasma and the finished plan stays there for pass 2 — the
    driver reads only the small meta dict. (Measured: this driver's
    plasma client reads at ~10-20 MB/s while worker clients run at
    memory speed, so pulling the ~26 MB of boundary tails through the
    driver cost more than the whole summary map pass.)

    Returns (meta, payload): status "ok" -> payload is the plans dict
    (ObjectRef handed straight to _MultiBlockWindow), "overlap" ->
    payload is the refined cuts dict, "refuse" -> payload None."""
    import time as _time
    _t0 = _time.monotonic()
    _ph: dict = {}
    # refs arrive unresolved (passed inside a list on purpose): a
    # task-arg unpack made the raylet resolve 200 tiny objects one by
    # one (~2s of scheduling); one worker-side batched get is ~50ms
    tables = ray.get(table_refs)
    _ph["get"] = round(_time.monotonic() - _t0, 3)
    size = sum(t.nbytes for t in tables if t is not None)
    if size > plan_budget_bytes:
        return ({"status": "refuse",
                 "msg": f"blockwise plan too large for assembly "
                        f"({size >> 20} MiB of segment summaries > "
                        f"{plan_budget_bytes >> 20} MiB budget)"},
                None)
    _t1 = _time.monotonic()
    rows_all = []
    for t in tables:
        if t is not None and t.num_rows:
            rows_all.extend(_summary_rows(t))
    _ph["rows"] = round(_time.monotonic() - _t1, 3)
    total_rows = sum(r["n_rows"] for r in rows_all)
    meta = {"nseg": len(rows_all), "total_rows": total_rows}
    if rows_all and total_rows / len(rows_all) < min_segment_rows:
        meta.update(status="refuse",
                    msg=f"layout degenerates to {len(rows_all)} "
                        f"segments over {total_rows} rows (avg < "
                        f"{min_segment_rows})")
        return (meta, None)
    _t1 = _time.monotonic()
    per_src: dict = {}
    for r in rows_all:
        per_src.setdefault(r["__src__"], []).append(r)
    try:
        plans = {k: _assemble_offsets(rows, tail_rows, tail_range)
                 for k, rows in per_src.items()}
        _ph["assemble"] = round(_time.monotonic() - _t1, 3)
    except _NotPresorted as e:
        cuts = {
            k: np.array(sorted({r["first_doc"] for r in rows}
                               | {_just_after(r["last_doc"])
                                  for r in rows}), dtype=object)
            for k, rows in per_src.items()}
        meta.update(status="overlap", msg=str(e))
        return (meta, cuts)
    # flatten the history tails into TWO big arrays + integer slices:
    # serializing ~13k small numpy arrays individually costs seconds
    # of per-buffer overhead (same pathology as the generic window's
    # plan payload)
    metas: dict = {}
    ts_parts, val_parts = [], []
    at = 0
    for k, plan in plans.items():
        m = {}
        for first, (off, hts, hvals, dim, n, ntok) in plan.items():
            m[first] = (off, at, at + len(hts), dim, n, ntok)
            ts_parts.append(hts)
            val_parts.append(hvals)
            at += len(hts)
        metas[k] = m
    big_ts = np.concatenate(ts_parts) if ts_parts else \
        np.empty(0, dtype=np.int64)
    big_vals = np.concatenate(val_parts) if val_parts else \
        np.empty(0, dtype=np.int64)
    meta.update(status="ok", task_s=round(_time.monotonic() - _t0, 3),
                phases=_ph)
    return (meta, (metas, big_ts, big_vals))


def _assemble_offsets(summary_rows: list[dict], tail_rows: int,
                      tail_range: int) -> dict:
    """Driver prefix scan: per block (keyed by first order value) ->
    (ts_offset, history ts array, history value array, incoming
    last-dim (ts, payload) — the newest dim row before the block, or
    (-1, 0) when none)."""
    rows = sorted(summary_rows, key=lambda r: r["first_doc"])
    # exactness guard for verified-presorted layouts: block key ranges
    # must not interleave (a split shuffle partition or an unsorted
    # source would silently corrupt every frame otherwise)
    for prev, cur in zip(rows, rows[1:]):
        if "last_doc" in prev and prev["last_doc"] >= cur["first_doc"]:
            raise _NotPresorted(
                f"block ranges interleave: [..{prev['last_doc']}] vs "
                f"[{cur['first_doc']}..]")
    out: dict = {}
    offset = 0
    # rolling global-ts history (tail of everything before this block)
    hist_ts = np.empty(0, dtype=np.int64)
    hist_vals = np.empty(0, dtype=np.int64)
    dim_carry = (-1, 0)
    for r in rows:
        out[r["first_doc"]] = (offset, hist_ts, hist_vals, dim_carry,
                               int(r["n_rows"]), int(r["ntok_total"]))
        bt = np.asarray(r["tail_ts"], dtype=np.int64) + offset
        bv = np.asarray(r["tail_vals"], dtype=np.int64)
        hist_ts = np.concatenate([hist_ts, bt])
        hist_vals = np.concatenate([hist_vals, bv])
        if int(r.get("dim_last_ts", -1)) >= 0:
            dim_carry = (int(r["dim_last_ts"]) + offset,
                         int(r["dim_last_pay"]))
        offset += r["ntok_total"]
        # trim: keep only what any future frame can reach
        keep_from = 0
        if tail_range > 0:
            keep_from = int(np.searchsorted(hist_ts, offset - tail_range,
                                            side="left"))
        keep_from = min(keep_from, max(0, len(hist_ts) - tail_rows))
        hist_ts = hist_ts[keep_from:]
        hist_vals = hist_vals[keep_from:]
    return out


class _BlockWindow:
    """Pass 2: evaluate all specs on (prepended history + block rows);
    emit block rows only."""

    def __init__(self, plan_ref, specs_aggs, value_col, order_col,
                 key_col, key_value, asof_modulo=None):
        self.plan = ray.get(plan_ref) if isinstance(
            plan_ref, ray.ObjectRef) else plan_ref
        self.specs_aggs = specs_aggs
        self.value_col = value_col
        self.order_col = order_col
        self.key_col = key_col
        self.key_value = key_value
        self.asof_modulo = asof_modulo

    def _empty(self, b: pa.Table) -> pa.Table:
        from openmldb_ray.window.runner import sum_source_type
        cols = {
            "doc_id": pa.array([], type=pa.string()),
            "source": pa.array([], type=pa.string()),
            "ts": pa.array([], type=pa.int64()),
            "n_tok": pa.array([], type=b.schema.field(self.value_col).type),
        }
        if self.asof_modulo is not None:
            cols["payload"] = pa.array([], type=pa.int64())
        for _, aggs in self.specs_aggs:
            for a in aggs:
                if a.func in ("count", "count_where", "distinct_count",
                              "row_number"):
                    t = pa.int64()
                else:
                    t = sum_source_type(a, b.schema) or pa.float64()
                cols[a.name] = pa.array([], type=t)
        return pa.table(cols)

    def __call__(self, b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return self._empty(b)
        first = b[self.order_col][0].as_py()
        offset, hist_ts, hist_vals, dim_carry = self.plan[first][:4]
        v = b[self.value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        local_ts = np.concatenate(([0], np.cumsum(v)[:-1])) + offset
        nh, nb = len(hist_ts), len(v)
        ts = np.concatenate([hist_ts, local_ts])
        vals = {self.value_col: np.concatenate(
            [hist_vals, v]).astype(np.float64)}
        is_primary = np.concatenate([np.zeros(nh, bool), np.ones(nb, bool)])
        cols = {
            "doc_id": b[self.order_col],
            "source": pa.array([self.key_value] * nb, type=pa.string()),
            "ts": pa.array(local_ts, type=pa.int64()),
            "n_tok": b[self.value_col],
        }
        if self.asof_modulo is not None:
            # co-partitioned as-of dim: local dim rows + the carried
            # newest-before-block dim row from the driver plan
            from openmldb_ray.pipelines.corpus import _doc_idx
            # single-key block: "<key_value>-" prefix is constant, so
            # the RE2 strip reduces to a constant-offset slice
            idx = _doc_idx(b[self.order_col],
                           prefix_len=len(self.key_value) + 1)
            dims = (idx % self.asof_modulo) == 0
            dts = local_ts[dims]
            dpay = v[dims]
            if dim_carry[0] >= 0:
                dts = np.concatenate(([dim_carry[0]], dts))
                dpay = np.concatenate(([dim_carry[1]], dpay))
            if len(dts) == 0:
                cols["payload"] = pa.nulls(nb, pa.int64())
            else:
                pos = np.searchsorted(dts, local_ts, side="right") - 1
                cols["payload"] = pa.array(
                    np.where(pos >= 0, dpay[np.maximum(pos, 0)], 0)
                    .astype(np.int64), type=pa.int64(), mask=pos < 0)
        from openmldb_ray.window.runner import (emit_wrapped_int_sum,
                                                sum_source_type)
        for spec, aggs in self.specs_aggs:
            res = eval_aggs(ts, vals, list(aggs), spec,
                            is_primary=is_primary)
            for a in aggs:
                arr = res[a.name][nh:]
                if a.func in ("count", "count_where", "distinct_count",
                              "row_number"):
                    cols[a.name] = pa.array(
                        np.nan_to_num(arr).astype(np.int64))
                elif (st := sum_source_type(a, b.schema)) is not None:
                    # match the cold-path emit (source int width)
                    cols[a.name] = emit_wrapped_int_sum(arr, st)
                else:
                    cols[a.name] = pa.array(arr, type=pa.float64(),
                                            from_pandas=True)
        return pa.table(cols)


def _entity_segments(b: pa.Table, key_col: str, order_col: str,
                     cuts: dict | None = None,
                     split_ties: bool = True):
    """Split a raw block into per-entity MONOTONE SEGMENTS without
    assuming anything about block-level ordering.

    A block delivered by a parquet read is, in the common case, a
    concatenation of file fragments, each internally ordered (writers
    emit entity-ordered data) but concatenated in arbitrary order
    (task-completion-ordered file names, reads merging non-adjacent
    files into one block). So: stable-group the rows by entity
    (preserving original block order within each entity), then split
    each entity's subsequence at every order-value descent — each
    resulting segment is strictly ascending by construction and maps
    1:1 onto an original fragment. Segments, not blocks, are the
    blockwise plan's unit; cross-segment disjointness is what
    _assemble_offsets verifies.

    ``cuts`` ({key: sorted order values}): additional mandatory split
    points — fragments concatenated in ascending-but-non-adjacent
    order produce NO descent, merging into one segment with range
    holes that overlap other fragments; the refinement loop in
    blockwise_corpus_features derives cut values from the overlapping
    summaries and re-segments (pass 2 receives the same cuts so both
    passes carve identical segments).

    Returns (regrouped_table, [(lo, hi, key), ...]) with each
    [lo, hi) slice one segment."""
    import pyarrow.compute as pc
    codes = pc.dictionary_encode(b[key_col].combine_chunks())
    if isinstance(codes, pa.ChunkedArray):
        codes = codes.combine_chunks()
    keys = codes.dictionary.to_pylist()
    code_np = codes.indices.to_numpy(zero_copy_only=False)
    order_idx = np.argsort(code_np, kind="stable")
    b2 = b.take(pa.array(order_idx))
    code_s = code_np[order_idx]
    # adjacent-order comparisons via an Arrow kernel over the whole
    # regrouped column — the per-run numpy object-array compare cost
    # ~0.3-0.5 s cpu per 500k-row block of strings
    ocol = b2[order_col].combine_chunks()
    n = len(ocol)
    if n > 1:
        import pyarrow.compute as pc2
        cmpfn = pc2.less_equal if split_ties else pc2.less
        adj = cmpfn(ocol.slice(1), ocol.slice(0, n - 1)) \
            .to_numpy(zero_copy_only=False)
        desc_all = np.flatnonzero(adj) + 1
    else:
        desc_all = np.empty(0, dtype=np.int64)
    ov = None  # object values materialized only when cuts apply
    rb = np.concatenate(
        ([0], np.flatnonzero(code_s[1:] != code_s[:-1]) + 1,
         [len(code_s)]))
    segs = []
    for i in range(len(rb) - 1):
        lo, hi = int(rb[i]), int(rb[i + 1])
        k = keys[int(code_s[lo])]
        # split_ties: unique-order layouts (corpus doc ids) split at
        # equality too (a duplicate = an order restart); for
        # duplicate-bearing time axes, only true descents split
        d0, d1 = np.searchsorted(desc_all, (lo + 1, hi))
        bounds = np.concatenate(([lo], desc_all[d0:d1], [hi]))
        if cuts is not None and k in cuts and len(cuts[k]):
            if ov is None:
                ov = ocol.to_numpy(zero_copy_only=False)
            # cuts must be located WITHIN each descent segment (the
            # run as a whole is not sorted across descents)
            extra = [np.searchsorted(ov[s:e], cuts[k],
                                     side="left") + s
                     for s, e in zip(bounds[:-1], bounds[1:])]
            bounds = np.unique(np.concatenate([bounds] + extra))
            bounds = bounds[(bounds >= lo) & (bounds <= hi)]
        for j in range(len(bounds) - 1):
            segs.append((int(bounds[j]), int(bounds[j + 1]), k))
    return b2, segs


class _MultiSummary:
    """Pass 1 of the ZERO-SHUFFLE blockwise plan: each block emits one
    _BlockSummary row PER entity SEGMENT (see _entity_segments),
    tagged with the entity key. The cross-segment layout contract —
    each entity's segment key ranges must not interleave — is
    verified at assembly (_assemble_offsets raises _NotPresorted)."""

    def __init__(self, value_col, order_col, key_col, tail_rows,
                 tail_range, asof_modulo=None, cuts=None):
        self.value_col = value_col
        self.order_col = order_col
        self.key_col = key_col
        self.cuts = cuts
        self.inner = _BlockSummary(value_col, order_col, tail_rows,
                                   tail_range, asof_modulo)
        self.__name__ = "blockwise_summaries"

    def __call__(self, b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return self.inner._empty().append_column(
                "__src__", pa.array([], type=pa.string()))
        b2, segs = _entity_segments(b, self.key_col, self.order_col,
                                    self.cuts)
        outs = []
        for lo, hi, k in segs:
            t = self.inner(b2.slice(lo, hi - lo), key=k)
            outs.append(t.append_column(
                "__src__", pa.array([k], type=pa.string())))
        # one chunk per column: a per-segment-chunked table costs
        # per-BUFFER (de)serialization downstream — 16k chunks measured
        # 13s to move 23 MiB of summaries
        return pa.concat_tables(outs).combine_chunks()


class _MultiBlockWindow:
    """Pass 2 of the blockwise plan: the same segmentation, then each
    entity segment evaluates through _BlockWindow with its
    driver-assembled (offset, history-tail, dim-carry) entry."""

    def __init__(self, plan_ref, specs_aggs, value_col, order_col,
                 key_col, asof_modulo=None, cuts=None):
        # keep the ObjectRef; resolve on the worker (zero-copy plasma
        # read of the plan's numpy tails) instead of embedding the
        # whole plan dict in the pickled callable
        self._plan_ref = plan_ref
        self._plans = None
        self.specs_aggs = specs_aggs
        self.value_col = value_col
        self.order_col = order_col
        self.key_col = key_col
        self.asof_modulo = asof_modulo
        self.cuts = cuts
        self.__name__ = "blockwise_window"

    @property
    def plans(self):
        if self._plans is None:
            payload = ray.get(self._plan_ref) if isinstance(
                self._plan_ref, ray.ObjectRef) else self._plan_ref
            if isinstance(payload, tuple):
                # flattened form: rebuild per-key plans as zero-copy
                # views into the two big tail arrays
                metas, big_ts, big_vals = payload
                payload = {
                    k: {first: (off, big_ts[lo:hi], big_vals[lo:hi],
                                dim, n, ntok)
                        for first, (off, lo, hi, dim, n, ntok)
                        in m.items()}
                    for k, m in metas.items()}
            self._plans = payload
        return self._plans

    def __call__(self, b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _BlockWindow({}, self.specs_aggs, self.value_col,
                                self.order_col, self.key_col, "",
                                self.asof_modulo)._empty(b)
        b2, segs = _entity_segments(b, self.key_col, self.order_col,
                                    self.cuts)
        outs = []
        ocol = b2[self.order_col]
        for lo, hi, k in segs:
            plan_k = self.plans.get(k)
            if plan_k is None:
                raise _NotPresorted(f"key {k!r} missing from plan")
            bw = _BlockWindow(plan_k, self.specs_aggs,
                              self.value_col, self.order_col,
                              self.key_col, k, self.asof_modulo)
            # walk the segment at plan-FRAGMENT boundaries: the plan
            # was summarized per source fragment (e.g. row-group
            # batches under the fused pin), and the pinned blocks may
            # have merged consecutive fragments — each piece evaluates
            # with its own (offset, history) entry, which is exactly
            # pass 2 on the unmerged layout. GLOBALLY-CONTIGUOUS
            # fragments (next.offset == offset + ntok: nothing of this
            # entity sits between them — the same-file row-group case)
            # coalesce into ONE eval piece, so fragment granularity
            # costs no per-piece overhead in the common layout. A
            # fragment split across blocks (single batch > target
            # block size) cannot be reconstructed and fails loudly.
            pos = lo
            while pos < hi:
                f = ocol[pos].as_py()
                ent = plan_k.get(f)
                if ent is None:
                    raise _NotPresorted(
                        f"fragment starting at {f!r} (key {k!r}) "
                        f"missing from blockwise plan")
                n, end_off = ent[4], ent[0] + ent[5]
                while pos + n < hi:
                    nxt = plan_k.get(ocol[pos + n].as_py())
                    if nxt is None or nxt[0] != end_off:
                        break
                    n += nxt[4]
                    end_off = nxt[0] + nxt[5]
                if pos + n > hi:
                    raise _NotPresorted(
                        f"fragment at {f!r} (key {k!r}, {n} rows) is "
                        f"split across blocks")
                outs.append(bw(b2.slice(pos, n)))
                pos += n
        return pa.concat_tables(outs)


@ray.remote(num_cpus=0)
class _SummaryCollector:
    """Side-channel for the fused pin+summary pass: map tasks push one
    small summary table per block; ``drain`` hands the concatenation to
    the assembly task without a second pass over the data.

    Adds are deduplicated by content fingerprint: a retried pin task
    (worker crash mid-materialize) re-runs its batch and would push
    the SAME summary twice — without the dedupe that duplicate trips
    the interleave guard and silently demotes every retried run to the
    shuffle fallback. Byte-identical summaries can only come from the
    same fragment (two distinct fragments differ in key or range; an
    actual range collision is an interleaved layout the assembly
    refuses anyway), so dropping them is always safe."""

    def __init__(self):
        self._tables = []
        self._fps = set()
        self._max_batch_bytes = 0

    def add(self, t, batch_bytes: int = 0) -> None:
        import hashlib
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, t.schema) as w:
            w.write_table(t)
        fp = hashlib.blake2b(sink.getvalue(),
                             digest_size=16).digest()
        if fp not in self._fps:
            self._fps.add(fp)
            self._tables.append(t)
        if batch_bytes > self._max_batch_bytes:
            self._max_batch_bytes = batch_bytes

    def stats(self) -> tuple[int, int]:
        return len(self._tables), self._max_batch_bytes

    def drain(self):
        if not self._tables:
            return None
        return pa.concat_tables(self._tables).combine_chunks()


class _SummaryTap:
    """Identity map that summarizes each block as a side effect — fuses
    blockwise pass 1 into the slim-pin materialize (one read serves
    both). The blocking ``ray.get`` on ``add`` guarantees every summary
    landed before ``materialize()`` returns."""

    def __init__(self, collector, summarizer):
        self.collector = collector
        self.summarizer = summarizer
        self.__name__ = "pin_with_summaries"

    def __call__(self, b: pa.Table) -> pa.Table:
        ray.get(self.collector.add.remote(self.summarizer(b), b.nbytes))
        return b


def blockwise_corpus_features(
    ds: ray.data.Dataset,
    specs_aggs: Sequence[tuple[WindowSpec, Sequence[Agg]]],
    value_col: str = "n_tok",
    order_col: str = "doc_id",
    key_col: str = "source",
    asof_modulo: int | None = None,
    plan_budget_bytes: int = 1 << 30,
    max_refine_rounds: int = 4,
    min_segment_rows: int = 4,
    fuse_pin: bool = False,
) -> ray.data.Dataset:
    """ZERO-SHUFFLE corpus window features over a verified
    entity-ordered layout — the scale plan for append-only /
    ingest-ordered corpora (the common case for training-data logs).

    Contract: the dataset is some permutation of internally-ordered
    FRAGMENTS — within any maximal run that _entity_segments carves
    out of a block, an entity's rows ascend by ``order_col``, and no
    two of an entity's fragments overlap in key range. This holds for
    entity-ordered data regardless of file naming or of reads merging
    non-adjacent files into one block (both observed in practice:
    write tasks number files by completion order). Two cheap passes
    replace the all-to-all exchange entirely:

    1. per block, per entity segment: a few-KB summary (row count,
       token total, boundary tail, last dim row);
    2. driver prefix-scan per entity (_assemble_offsets) -> broadcast
       plan of (ts offset, replicated history tail, dim carry);
    3. per block, per segment: windowed eval with the prepended tail
       — bit-equal to the shuffle plan (tested).

    The layout contract is VERIFIED, not trusted: interleaved segment
    ranges raise ``_NotPresorted`` at assembly (callers fall back to
    the shuffle plan). Skew is a non-issue by construction — a hot
    entity spreads over every block. Driver plan size is
    O(entities x blocks x tail rows); ``plan_budget_bytes`` bounds it
    — a summary set too big to assemble on the driver raises
    ``_NotPresorted`` so callers fall back to the shuffle plan (a
    hierarchical assembly would lift this).

    Failure timing: every LAYOUT violation raises at PLAN time (block
    summaries, assembly interleave guard, the fused-pin row-count
    check), where callers can catch ``_NotPresorted`` and fall back.
    The raises inside pass-2 eval ("fragment missing from blockwise
    plan" / "split across blocks") are defense-in-depth against
    invariant breakage between planning and eval; they fire when the
    lazy result executes, so a caller that returns the dataset
    unmaterialized (``materialize=False``) surfaces them as task
    errors, not fallbacks — by design: a plan/eval mismatch means
    neither plan can be trusted, and silent fallback would hide the
    bug."""
    tail_rows = max((s.preceding_rows or 0) for s, _ in specs_aggs) + 1
    tail_range = max((s.preceding_range or 0) for s, _ in specs_aggs)
    specs = [(s, list(a)) for s, a in specs_aggs]
    # refinement loop: ascending-but-non-adjacent fragment merges leave
    # no descent, so round-1 segments can span range HOLES that overlap
    # other fragments; cutting at every segment's first value and
    # re-summarizing separates them (holes are covered by the other
    # fragments, so a cut value always lands inside the hole). Truly
    # interleaved layouts make no progress and raise.
    import time

    from openmldb_ray.pipelines.corpus import _phase_log
    # fuse_pin: the caller hands a LAZY slim projection; pass 1 rides
    # the pin materialize (one parquet read serves both the pin and
    # the summaries). The tap summarizes per map BATCH — under read
    # fusion that is a source FRAGMENT (row-group batch), finer than
    # the pinned output blocks, which merge consecutive fragments per
    # task. Pass 2 handles that: plan entries carry n_rows and each
    # segment is walked piece-by-piece at fragment boundaries. The one
    # layout the plan cannot survive is a fragment SPLIT across output
    # blocks, which only happens when a single batch exceeds the block
    # size target — guarded here by refusing the fused summaries (and
    # re-summarizing from the pinned copy) when any batch came close.
    # On plan refusal the pinned dataset rides out on the exception
    # (``e.pinned``) so the shuffle fallback doesn't re-read the
    # source.
    fused_refs = None
    if fuse_pin:
        _t = time.time()
        collector = _SummaryCollector.remote()
        tap = _SummaryTap(collector, _MultiSummary(
            value_col, order_col, key_col, tail_rows, tail_range,
            asof_modulo, cuts=None))
        # batch_size=None: one tap call per fused-read batch (= one
        # parquet row group). A large batch_size would buffer ACROSS
        # files inside a task — merging out-of-order fragments (forcing
        # refinement rounds) and emitting giant blocks that serialize
        # the eval+sink stages (measured 9s vs 4.5s at 2M docs).
        # Fragment granularity is absorbed by the contiguous-fragment
        # coalescing in pass 2.
        ds = ds.map_batches(tap, batch_format="pyarrow",
                            batch_size=None,
                            zero_copy_batch=True).materialize()
        n_tap, max_bytes = ray.get(collector.stats.remote())
        from ray.data.context import DataContext
        budget = DataContext.get_current().target_max_block_size \
            or (128 << 20)
        if max_bytes < budget // 2:
            fused_refs = [collector.drain.remote()]
        _phase_log(
            f"blockwise pin+summary fused ({n_tap} fragments, max "
            f"{max_bytes >> 20} MiB"
            f"{'' if fused_refs else ' — OVERSIZED, re-summarizing'})",
            _t)

    def _raise(msg: str):
        err = _NotPresorted(msg)
        err.pinned = ds if fuse_pin else None
        raise err

    cuts: dict | None = None
    plan_ref = None
    for _round in range(max_refine_rounds):
        _t = time.time()
        if _round == 0 and fused_refs is not None:
            table_refs = fused_refs
        else:
            summaries = ds.map_batches(
                _MultiSummary(value_col, order_col, key_col, tail_rows,
                              tail_range, asof_modulo, cuts=cuts),
                batch_format="pyarrow", batch_size=None,
                zero_copy_batch=True)
            # coalesce the per-block summary tablets into a handful of
            # blocks BEFORE shipping refs: ray.get of ~200 tiny Arrow
            # tables inside the assembly task measured 2.2s of
            # per-object overhead vs ~0.1s for the same bytes in 2
            # blocks
            summaries = summaries.map_batches(
                lambda t: t, batch_format="pyarrow",
                batch_size=1 << 20).materialize()
            table_refs = list(summaries.to_arrow_refs())
            _phase_log(f"blockwise summary map r{_round}", _t)
        _t2 = time.time()
        meta_ref, payload_ref = _assemble_task.options(
            num_returns=2).remote(
            tail_rows, tail_range, min_segment_rows,
            plan_budget_bytes, table_refs)
        meta = ray.get(meta_ref)
        _phase_log(f"blockwise assembly r{_round} "
                   f"({meta.get('nseg')} segs, {meta['status']}, "
                   f"task {meta.get('task_s')}s "
                   f"{meta.get('phases')})", _t2)
        if meta["status"] == "ok":
            # plan-coverage check (fuse_pin only — ds is materialized
            # there, so count() is metadata): a lost summary add would
            # otherwise surface as an EVAL-time "fragment missing from
            # plan" task error, past the caller's fallback try/except
            # when the result rides out lazily (materialize=False)
            if fuse_pin and meta.get("total_rows") is not None:
                pinned_rows = ds.count()
                if meta["total_rows"] != pinned_rows:
                    _raise(f"blockwise plan covers "
                           f"{meta['total_rows']} rows but the pinned "
                           f"dataset has {pinned_rows} (lost or "
                           f"duplicated block summaries)")
            plan_ref = payload_ref
            break
        if meta["status"] == "refuse":
            _raise(meta["msg"])
        # "overlap": every segment boundary becomes a cut — firsts
        # inclusive, lasts exclusive; a merged segment overlapping
        # another always has a boundary of the other inside one of
        # its range holes, so each round strictly separates
        new_cuts = ray.get(payload_ref)
        if cuts is not None and all(
                k in cuts and len(cuts[k]) == len(v)
                and (cuts[k] == v).all()
                for k, v in new_cuts.items()):
            _raise(meta["msg"])  # no progress
        cuts = new_cuts
    if plan_ref is None:
        _raise(f"segment ranges still interleave after "
               f"{max_refine_rounds} refinement rounds")
    return ds.map_batches(
        _MultiBlockWindow(plan_ref, specs, value_col, order_col,
                          key_col, asof_modulo, cuts=cuts),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def hot_entity_corpus_features(
    sub: ray.data.Dataset,
    key_value: str,
    specs_aggs: Sequence[tuple[WindowSpec, Sequence[Agg]]],
    value_col: str = "n_tok",
    order_col: str = "doc_id",
    key_col: str = "source",
    asof_modulo: int | None = None,
    layout: str = "auto",
) -> ray.data.Dataset:
    """Block-parallel corpus window features for ONE hot entity.

    ``sub`` must contain only this entity's rows. Row_number within
    kernel runs is per-block — don't use row_number aggs here.
    ``asof_modulo``: also evaluate the co-partitioned as-of dim join
    (payload column) — dim rows from earlier blocks arrive via the
    driver plan's last-dim carry.

    ``layout`` (how blocks become the sorted-run partition):

    - ``"auto"`` (default): try the zero-shuffle presorted path, fall
      back to the sort path if verification fails;
    - ``"presorted"``: the source layout already delivers this
      entity's rows in ascending ``order_col`` order within AND
      across blocks (append-only logs, ingest-ordered corpora). The
      hot branch then needs NO shuffle at all — summaries + pass 2
      run straight over the filtered blocks. VERIFIED at runtime:
      every block checks strict per-block order and the driver scan
      checks block ranges don't interleave (_NotPresorted on
      violation) — exactness never rests on the hint;
    - ``"sort"``: range-shuffle sort + rebalance (any layout).
    """
    tail_rows = max((s.preceding_rows or 0) for s, _ in specs_aggs) + 1
    tail_range = max((s.preceding_range or 0) for s, _ in specs_aggs)
    specs = [(s, list(a)) for s, a in specs_aggs]

    def run(ordered: ray.data.Dataset, verify: bool):
        summaries = ordered.map_batches(
            _BlockSummary(value_col, order_col, tail_rows, tail_range,
                          asof_modulo, verify_sorted=verify),
            batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True)
        stbl = _collect_table(summaries)
        plan = _assemble_offsets(
            _summary_rows(stbl) if stbl is not None else [],
            tail_rows, tail_range)
        plan_ref = ray.put(plan)

        def block_window(b: pa.Table) -> pa.Table:
            return _BlockWindow(ray.get(plan_ref), specs, value_col,
                                order_col, key_col, key_value,
                                asof_modulo)(b)

        return ordered.map_batches(block_window, batch_format="pyarrow",
                                   batch_size=None, zero_copy_batch=True)

    if layout in ("auto", "presorted"):
        try:
            return run(sub, verify=True)
        except Exception as e:  # _NotPresorted may arrive wrapped in
            unsorted = isinstance(e, _NotPresorted) or \
                "_NotPresorted" in str(type(getattr(e, "cause", None))) \
                or "not strictly ascending" in str(e) \
                or "block ranges interleave" in str(e)
            if not unsorted or layout == "presorted":
                raise
    cpus = int(ray.cluster_resources().get("CPU", 4))
    # right-size blocks: enough for every CPU, big enough to amortize
    # the per-block summary/plan overhead
    ordered = sub.select_columns([order_col, value_col]) \
        .sort(order_col).repartition(max(8, cpus)).materialize()
    return run(ordered, verify=False)
