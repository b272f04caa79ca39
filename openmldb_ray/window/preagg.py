"""Pre-aggregated long-window buckets — the reference's incremental
aggregator (src/storage/aggregator.h:40-52, aggregator.cc — the
machinery that makes 30-day windows cheap online) re-expressed as a
Ray Data partial-aggregate table.

- ``build_preagg``: raw rows -> one (key, bucket_start, rows, cnt,
  sum, min, max) partial row per (entity, time bucket). Per-batch
  local bucket aggregation (the combiner) means the shuffle moves
  #entities x #buckets rows, not raw rows; persist with
  ``write_parquet`` next to the raw table (the reference's pre-agg
  table, meta in ``PRE_AGG_META_NAME``).

- ``LongWindowStore``: the serving-side structure for ONE partition
  (the single-tablet analog): bucket arrays + prefix sums per entity,
  plus the slim raw (ts, value) arrays for edge lookup. ``features()``
  answers one request row's long-window aggregate from FULL buckets +
  the two partial edge buckets' raw rows — O(window/bucket_width +
  edge rows) instead of an O(window) history scan.

- ``ShardedLongWindowStore``: the multi-tablet analog (reference
  src/tablet/tablet_impl.cc request routing): the build output is
  hash-partitioned by entity into per-shard parquet, one Ray actor per
  shard loads ONLY its key range, and requests route by the same key
  hash (batched: one remote call per touched shard). No single process
  ever holds the whole table — the store scales by adding shards.

Supported aggregates: sum / count / avg / min / max over a pure
ROWS_RANGE (``preceding_range``) frame with no modifiers — exactly the
reference's pre-agg coverage (aggregator.cc supports sum/min/max/count/
avg/count_where; *_where is served by the raw path here).

Exactness: ``tests/test_preagg.py`` asserts bit-equality with the raw
``request_features`` path over randomized histories.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from openmldb_ray.io import column_to_float, exact_factorize, order_to_int64
from openmldb_ray.window.spec import Agg, WindowSpec

PREAGG_COLS = ("rows", "cnt", "sum", "min", "max")


def _bucket_partials(b: pa.Table, key: str, order_by: str,
                     value_col: str, width: int) -> pa.Table:
    ts = order_to_int64(b[order_by])
    keep = ts >= 0
    v = column_to_float(b[value_col])
    kv = b[key].to_numpy(zero_copy_only=False)
    ts, v, kv = ts[keep], v[keep], kv[keep]
    bucket = ts // width
    codes, uniq_keys = exact_factorize(kv, return_uniques=True)
    order = np.lexsort((bucket, codes))
    vs, bs, ks = v[order], bucket[order], codes[order]
    changed = (ks[1:] != ks[:-1]) | (bs[1:] != bs[:-1])
    starts = np.concatenate(([0], np.flatnonzero(changed) + 1)) \
        if len(ks) else np.empty(0, dtype=np.int64)
    starts = starts.astype(np.int64)
    rows = np.diff(np.concatenate((starts, [len(ks)]))).astype(np.int64)
    ok = ~np.isnan(vs)
    pcnt = np.concatenate(([0], np.cumsum(ok)))
    psum = np.concatenate(([0.0], np.cumsum(np.where(ok, vs, 0.0))))
    ends = np.concatenate((starts[1:], [len(ks)])).astype(np.int64)
    cnt = (pcnt[ends] - pcnt[starts]).astype(np.int64)
    ssum = psum[ends] - psum[starts]
    mn = np.full(len(starts), np.nan)
    mx = np.full(len(starts), np.nan)
    with np.errstate(invalid="ignore"):
        for i in range(len(starts)):  # groups per batch are few
            seg = vs[starts[i]:ends[i]]
            if cnt[i]:
                mn[i] = np.nanmin(seg)
                mx[i] = np.nanmax(seg)
    # all-null buckets carry NULL (not NaN) min/max so the vectorized
    # Min/Max reduce skips them
    return pa.table({
        key: pa.array(uniq_keys[ks[starts]]),
        "bucket": pa.array(bs[starts], type=pa.int64()),
        "rows": pa.array(rows),
        "cnt": pa.array(cnt),
        "sum": pa.array(ssum, type=pa.float64()),
        "min": pa.array(mn, type=pa.float64(), mask=np.isnan(mn)),
        "max": pa.array(mx, type=pa.float64(), mask=np.isnan(mx)),
    })


def build_preagg(ds: ray.data.Dataset, key: str, order_by: str,
                 value_col: str, bucket_width: int) -> ray.data.Dataset:
    """Raw rows -> reduced (key, bucket) pre-aggregate table."""
    def partial(b: pa.Table) -> pa.Table:
        return _bucket_partials(b, key, order_by, value_col, bucket_width)
    partial.__name__ = "preagg_partial"
    parts = ds.map_batches(partial, batch_format="pyarrow")

    # vectorized reduce: a map_groups here would make one Python call
    # per (key, bucket) group — #entities x #buckets of them (measured
    # seconds at 16k groups); the built-in aggregates reduce whole
    # sorted blocks at once
    from ray.data.aggregate import Max, Min, Sum
    reduced = parts.groupby([key, "bucket"]).aggregate(
        Sum("rows", alias_name="rows"), Sum("cnt", alias_name="cnt"),
        Sum("sum", alias_name="sum"),
        Min("min", alias_name="min"), Max("max", alias_name="max"))

    def fix_types(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        for c, t in (("rows", pa.int64()), ("cnt", pa.int64()),
                     ("sum", pa.float64())):
            i = b.column_names.index(c)
            col = b[c]
            if c == "sum":
                col = pc.fill_null(col, 0.0)
            b = b.set_column(i, c, pc.cast(col, t))
        return b
    fix_types.__name__ = "preagg_types"
    return reduced.map_batches(fix_types, batch_format="pyarrow")


def _check_spec(spec: WindowSpec) -> int:
    if (spec.preceding_range is None or spec.preceding_rows is not None
            or spec.end_offset_range or spec.end_offset_rows
            or spec.max_size or spec.exclude_current_time
            or spec.instance_not_in_window or spec.open_preceding):
        raise ValueError("pre-agg serving covers plain ROWS_RANGE frames "
                         "(preceding_range, no modifiers) — the "
                         "reference pre-agg scope")
    return int(spec.preceding_range)


class LongWindowStore:
    """Per-entity bucket arrays (+ prefix sums) and slim raw arrays
    for edge lookup; answers long-window request features."""

    def __init__(self, preagg: pa.Table | ray.data.Dataset,
                 raw: pa.Table | ray.data.Dataset,
                 key: str, order_by: str, value_col: str,
                 bucket_width: int):
        if isinstance(preagg, ray.data.Dataset):
            preagg = pa.concat_tables(preagg.iter_batches(
                batch_format="pyarrow", batch_size=1 << 20)) \
                if preagg.count() else pa.table({})
        if isinstance(raw, ray.data.Dataset):
            raw = pa.concat_tables(
                raw.select_columns([key, order_by, value_col])
                .iter_batches(batch_format="pyarrow", batch_size=1 << 20))
        self.key = key
        self.order_by = order_by
        self.value_col = value_col
        self.width = int(bucket_width)
        self.buckets: dict = {}
        if preagg.num_rows:
            df = preagg.to_pandas()
            df = df.sort_values([key, "bucket"], kind="stable")
            for k, g in df.groupby(key, sort=False):
                b = g["bucket"].to_numpy(np.int64)
                self.buckets[k] = {
                    "bucket": b,
                    "prow": np.concatenate(([0], np.cumsum(
                        g["rows"].to_numpy(np.int64)))),
                    "pcnt": np.concatenate(([0], np.cumsum(
                        g["cnt"].to_numpy(np.int64)))),
                    "psum": np.concatenate(([0.0], np.cumsum(
                        g["sum"].to_numpy(np.float64)))),
                    "min": g["min"].to_numpy(np.float64),
                    "max": g["max"].to_numpy(np.float64),
                }
        self.raw: dict = {}
        ts = order_to_int64(raw[order_by])
        keep = ts >= 0
        v = column_to_float(raw[value_col])
        kv = raw[key].to_numpy(zero_copy_only=False)
        ts, v, kv = ts[keep], v[keep], kv[keep]
        if len(kv):   # an empty shard/partition is a valid store
            order = np.lexsort((ts, kv))
            ts, v, kv = ts[order], v[order], kv[order]
            bounds = np.concatenate(
                ([0], np.flatnonzero(kv[1:] != kv[:-1]) + 1, [len(kv)]))
            for i in range(len(bounds) - 1):
                lo, hi = int(bounds[i]), int(bounds[i + 1])
                self.raw[kv[lo]] = (ts[lo:hi], v[lo:hi])

    def _edge(self, k, t_lo: int, t_hi: int):
        """Raw (ts, values) of entity k within [t_lo, t_hi]."""
        if k not in self.raw:
            return np.empty(0, np.float64)
        ts, v = self.raw[k]
        a = np.searchsorted(ts, t_lo, side="left")
        b = np.searchsorted(ts, t_hi, side="right")
        return v[a:b]

    def features(self, request_row: Mapping[str, object],
                 spec: WindowSpec, aggs: Sequence[Agg]) -> dict:
        """One request row's aggregates from full buckets + edges.
        The request row itself is the newest frame element (request
        semantics, mem_catalog.h:740-766)."""
        rng = _check_spec(spec)
        assert spec.order_by == self.order_by
        k = request_row[spec.keys[0]]
        req_ts = int(request_row[spec.order_by])
        t0 = req_ts - rng
        W = self.width
        b_lo, b_hi = t0 // W, req_ts // W
        first_full = b_lo if t0 % W == 0 else b_lo + 1

        s = cnt = rows = 0.0
        mn = mx = np.nan
        if k in self.buckets and first_full < b_hi:
            bk = self.buckets[k]
            i0 = np.searchsorted(bk["bucket"], first_full, side="left")
            i1 = np.searchsorted(bk["bucket"], b_hi, side="left")
            if i1 > i0:
                s += bk["psum"][i1] - bk["psum"][i0]
                cnt += bk["pcnt"][i1] - bk["pcnt"][i0]
                rows += bk["prow"][i1] - bk["prow"][i0]
                seg_mn = bk["min"][i0:i1]
                seg_mx = bk["max"][i0:i1]
                with np.errstate(invalid="ignore"):
                    if not np.isnan(seg_mn).all():
                        mn = np.nanmin(seg_mn)
                        mx = np.nanmax(seg_mx)

        # edges: [t0, first_full*W) and [max(b_hi*W, t0), req_ts]
        edges = []
        if first_full > b_lo and first_full <= b_hi:
            edges.append(self._edge(k, t0, min(first_full * W, req_ts + 1)
                                    - 1))
        if b_hi >= first_full:
            edges.append(self._edge(k, max(b_hi * W, t0), req_ts))
        if first_full > b_hi:  # whole frame inside one bucket
            edges = [self._edge(k, t0, req_ts)]
        rv = request_row.get(self.value_col)
        rv = np.nan if rv is None else float(rv)
        edges.append(np.array([rv]))
        ev = np.concatenate(edges) if edges else np.empty(0)
        eok = ~np.isnan(ev)
        s += ev[eok].sum()
        cnt += int(eok.sum())
        rows += len(ev)
        if eok.any():
            emn, emx = ev[eok].min(), ev[eok].max()
            mn = emn if np.isnan(mn) else min(mn, emn)
            mx = emx if np.isnan(mx) else max(mx, emx)

        out = {}
        for a in aggs:
            if a.func == "sum":
                out[a.name] = s if cnt else np.nan
            elif a.func == "count":
                out[a.name] = rows if a.col is None else cnt
            elif a.func == "avg":
                out[a.name] = s / cnt if cnt else np.nan
            elif a.func == "min":
                out[a.name] = mn
            elif a.func == "max":
                out[a.name] = mx
            else:
                raise NotImplementedError(
                    f"pre-agg serving covers sum/count/avg/min/max, "
                    f"got {a.func}")
        return out


def _key_shards(col, n_shards: int) -> np.ndarray:
    """Stable shard id per key value (build and routing MUST agree —
    both call this)."""
    import pyarrow.compute as pc

    from openmldb_ray.functions.sketches import hash_column
    if not isinstance(col, (pa.Array, pa.ChunkedArray)):
        col = pa.array(col)
    s = pc.fill_null(pc.cast(col, pa.string()), "\x00null")
    return (hash_column(s) % np.uint64(n_shards)).astype(np.int32)


class _LongWindowShard:
    """One serving shard: loads its hash partition's parquet from
    local/shared storage (the tablet's segment read) and answers
    request batches. Plain class wrapped with ray.remote at spawn.
    Spawn and ``load`` are separate so process boot overlaps the
    partitioned build write; actor task ordering guarantees any
    ``features_batch`` submitted after ``load`` sees the loaded store.
    """

    def __init__(self, key: str, order_by: str, value_col: str,
                 width: int):
        self.key = key
        self.order_by = order_by
        self.value_col = value_col
        self.width = width
        self.store = None

    def load(self, preagg_dir: str, raw_dir: str) -> int:
        import os

        import pyarrow.parquet as pq

        key, order_by, value_col = self.key, self.order_by, self.value_col

        def rd(d, empty):
            return pq.read_table(d) if os.path.isdir(d) else empty
        empty_pre = pa.table({
            key: pa.array([], pa.string()),
            "bucket": pa.array([], pa.int64()),
            "rows": pa.array([], pa.int64()),
            "cnt": pa.array([], pa.int64()),
            "sum": pa.array([], pa.float64()),
            "min": pa.array([], pa.float64()),
            "max": pa.array([], pa.float64())})
        empty_raw = pa.table({
            key: pa.array([], pa.string()),
            order_by: pa.array([], pa.int64()),
            value_col: pa.array([], pa.float64())})
        self.store = LongWindowStore(
            rd(preagg_dir, empty_pre), rd(raw_dir, empty_raw),
            key, order_by, value_col, self.width)
        return len(self.store.raw)

    def features_batch(self, rows, spec, aggs):
        return [self.store.features(r, spec, aggs) for r in rows]


class ShardedLongWindowStore:
    """Actor-per-key-range serving pool over the distributed
    ``build_preagg`` output. Build: hash-partitioned parquet (hive
    layout, one directory per shard — also the resume/lineage unit);
    serve: requests route by key hash, batched one call per shard."""

    def __init__(self, preagg, raw, key: str, order_by: str,
                 value_col: str, bucket_width: int, *,
                 n_shards: int = 8, storage_dir: str | None = None):
        import os
        import tempfile

        import ray

        self.key = key
        self.n_shards = n_shards
        storage_dir = storage_dir or tempfile.mkdtemp(prefix="lws_")

        def tag(t: pa.Table) -> pa.Table:
            return t.append_column(
                "__shard__", pa.array(_key_shards(t[key], n_shards)))
        tag.__name__ = "shard_tag"
        if isinstance(preagg, pa.Table):
            preagg = ray.data.from_arrow(preagg)
        if isinstance(raw, pa.Table):
            raw = ray.data.from_arrow(raw)
        raw = raw.select_columns([key, order_by, value_col])
        pre_dir = os.path.join(storage_dir, "preagg")
        raw_dir = os.path.join(storage_dir, "raw")
        # spawn first: actor process boot (imports) overlaps the
        # partitioned build write below. num_cpus=0: serving shards are
        # latency-bound and must not reserve the cores the build tasks
        # need (n_shards x 1 cpu deadlocks a small session; on a real
        # cluster give the serving pool dedicated nodes/placement
        # groups instead of logical cpus)
        shard_cls = ray.remote(num_cpus=0)(_LongWindowShard)
        self.actors = [
            shard_cls.remote(key, order_by, value_col, bucket_width)
            for i in range(n_shards)]
        preagg.map_batches(tag, batch_format="pyarrow").write_parquet(
            pre_dir, partition_cols=["__shard__"])
        raw.map_batches(tag, batch_format="pyarrow").write_parquet(
            raw_dir, partition_cols=["__shard__"])
        # fire-and-forget: actor task ordering queues features_batch
        # calls behind load
        for i, a in enumerate(self.actors):
            a.load.remote(os.path.join(pre_dir, f"__shard__={i}"),
                          os.path.join(raw_dir, f"__shard__={i}"))

    def features_batch(self, rows: Sequence[Mapping[str, object]],
                       spec: WindowSpec, aggs: Sequence[Agg]) -> list:
        import ray
        shards = _key_shards([r[self.key] for r in rows], self.n_shards)
        by: dict[int, list[int]] = {}
        for i, s in enumerate(shards):
            by.setdefault(int(s), []).append(i)
        refs = {s: self.actors[s].features_batch.remote(
            [rows[i] for i in idx], spec, aggs)
            for s, idx in by.items()}
        out: list = [None] * len(rows)
        for s, idx in by.items():
            for i, res in zip(idx, ray.get(refs[s])):
                out[i] = res
        return out

    def features(self, row: Mapping[str, object], spec: WindowSpec,
                 aggs: Sequence[Agg]) -> dict:
        return self.features_batch([row], spec, aggs)[0]

    def shutdown(self) -> None:
        import ray
        for a in self.actors:
            ray.kill(a)
        self.actors = []
