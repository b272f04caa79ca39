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
avg/count_where). Passing ``filter_col=`` to ``build_preagg`` and the
stores adds a FILTERED channel (``*_w`` partial columns over rows where
the boolean filter column holds, NULL condition = False) so
``count_where`` / ``sum_where`` / ``avg_where`` / ``min_where`` /
``max_where`` with ``where == filter_col`` are served from buckets too
— the analog of the reference's per-filter-key pre-agg table
(src/storage/aggregator.h:40-52, CountWhereAggregator). A *_where agg
over any OTHER column raises (raw path).

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
PREAGG_WHERE_COLS = ("rows_w", "cnt_w", "sum_w", "min_w", "max_w")


def _filter_mask(col) -> np.ndarray:
    """Where-condition column -> bool (NULL condition never matches —
    same contract as window.kernel._wmask)."""
    from openmldb_ray.window.kernel import _wmask
    return _wmask(col.to_numpy(zero_copy_only=False)
                  if isinstance(col, (pa.Array, pa.ChunkedArray))
                  else np.asarray(col))


def _seg_stats(vs: np.ndarray, ok: np.ndarray, starts: np.ndarray,
               ends: np.ndarray):
    """Per-segment (cnt, sum, min, max) over ``vs`` restricted to the
    ``ok`` mask — prefix sums for cnt/sum, masked loop for min/max
    (segments per batch are few)."""
    pcnt = np.concatenate(([0], np.cumsum(ok)))
    psum = np.concatenate(([0.0], np.cumsum(np.where(ok, vs, 0.0))))
    cnt = (pcnt[ends] - pcnt[starts]).astype(np.int64)
    ssum = psum[ends] - psum[starts]
    mn = np.full(len(starts), np.nan)
    mx = np.full(len(starts), np.nan)
    with np.errstate(invalid="ignore"):
        for i in range(len(starts)):
            if cnt[i]:
                seg = vs[starts[i]:ends[i]][ok[starts[i]:ends[i]]]
                mn[i] = seg.min()
                mx[i] = seg.max()
    return cnt, ssum, mn, mx


def _bucket_partials(b: pa.Table, key: str, order_by: str,
                     value_col: str, width: int,
                     filter_col: str | None = None) -> pa.Table:
    ts = order_to_int64(b[order_by])
    keep = ts >= 0
    v = column_to_float(b[value_col])
    kv = b[key].to_numpy(zero_copy_only=False)
    w = _filter_mask(b[filter_col]) if filter_col else None
    ts, v, kv = ts[keep], v[keep], kv[keep]
    if w is not None:
        w = w[keep]
    bucket = ts // width
    codes, uniq_keys = exact_factorize(kv, return_uniques=True)
    order = np.lexsort((bucket, codes))
    vs, bs, ks = v[order], bucket[order], codes[order]
    changed = (ks[1:] != ks[:-1]) | (bs[1:] != bs[:-1])
    starts = np.concatenate(([0], np.flatnonzero(changed) + 1)) \
        if len(ks) else np.empty(0, dtype=np.int64)
    starts = starts.astype(np.int64)
    rows = np.diff(np.concatenate((starts, [len(ks)]))).astype(np.int64)
    ends = np.concatenate((starts[1:], [len(ks)])).astype(np.int64)
    ok = ~np.isnan(vs)
    cnt, ssum, mn, mx = _seg_stats(vs, ok, starts, ends)
    # all-null buckets carry NULL (not NaN) min/max so the vectorized
    # Min/Max reduce skips them
    cols = {
        key: pa.array(uniq_keys[ks[starts]]),
        "bucket": pa.array(bs[starts], type=pa.int64()),
        "rows": pa.array(rows),
        "cnt": pa.array(cnt),
        "sum": pa.array(ssum, type=pa.float64()),
        "min": pa.array(mn, type=pa.float64(), mask=np.isnan(mn)),
        "max": pa.array(mx, type=pa.float64(), mask=np.isnan(mx)),
    }
    if w is not None:
        ws = w[order]
        prw = np.concatenate(([0], np.cumsum(ws.astype(np.int64))))
        cols["rows_w"] = pa.array(
            (prw[ends] - prw[starts]).astype(np.int64))
        cnt_w, sum_w, mn_w, mx_w = _seg_stats(vs, ok & ws, starts, ends)
        cols["cnt_w"] = pa.array(cnt_w)
        cols["sum_w"] = pa.array(sum_w, type=pa.float64())
        cols["min_w"] = pa.array(mn_w, type=pa.float64(),
                                 mask=np.isnan(mn_w))
        cols["max_w"] = pa.array(mx_w, type=pa.float64(),
                                 mask=np.isnan(mx_w))
    return pa.table(cols)


def build_preagg(ds: ray.data.Dataset, key: str, order_by: str,
                 value_col: str, bucket_width: int,
                 filter_col: str | None = None) -> ray.data.Dataset:
    """Raw rows -> reduced (key, bucket) pre-aggregate table. With
    ``filter_col`` the output additionally carries the ``*_w`` filtered
    channel (rows where the boolean filter column holds)."""
    def partial(b: pa.Table) -> pa.Table:
        return _bucket_partials(b, key, order_by, value_col,
                                bucket_width, filter_col)
    partial.__name__ = "preagg_partial"
    parts = ds.map_batches(partial, batch_format="pyarrow")

    # vectorized reduce: a map_groups here would make one Python call
    # per (key, bucket) group — #entities x #buckets of them (measured
    # seconds at 16k groups); the built-in aggregates reduce whole
    # sorted blocks at once
    from ray.data.aggregate import Max, Min, Sum
    reduce_aggs = [
        Sum("rows", alias_name="rows"), Sum("cnt", alias_name="cnt"),
        Sum("sum", alias_name="sum"),
        Min("min", alias_name="min"), Max("max", alias_name="max")]
    if filter_col:
        reduce_aggs += [
            Sum("rows_w", alias_name="rows_w"),
            Sum("cnt_w", alias_name="cnt_w"),
            Sum("sum_w", alias_name="sum_w"),
            Min("min_w", alias_name="min_w"),
            Max("max_w", alias_name="max_w")]
    reduced = parts.groupby([key, "bucket"]).aggregate(*reduce_aggs)

    int_cols = ["rows", "cnt"] + (["rows_w", "cnt_w"] if filter_col
                                  else [])
    sum_cols = ["sum"] + (["sum_w"] if filter_col else [])

    def fix_types(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        for c in int_cols + sum_cols:
            i = b.column_names.index(c)
            col = b[c]
            if c in sum_cols:
                col = pc.fill_null(col, 0.0)
            b = b.set_column(i, c, pc.cast(
                col, pa.float64() if c in sum_cols else pa.int64()))
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
                 bucket_width: int, filter_col: str | None = None):
        raw_cols = [key, order_by, value_col] + \
            ([filter_col] if filter_col else [])
        if isinstance(preagg, ray.data.Dataset):
            preagg = pa.concat_tables(preagg.iter_batches(
                batch_format="pyarrow", batch_size=1 << 20)) \
                if preagg.count() else pa.table({})
        if isinstance(raw, ray.data.Dataset):
            raw = pa.concat_tables(
                raw.select_columns(raw_cols)
                .iter_batches(batch_format="pyarrow", batch_size=1 << 20))
        self.key = key
        self.order_by = order_by
        self.value_col = value_col
        self.filter_col = filter_col
        if filter_col and preagg.num_rows and \
                "rows_w" not in preagg.column_names:
            raise ValueError("filter_col given but the preagg table has "
                             "no *_w channel — rebuild with "
                             "build_preagg(..., filter_col=...)")
        self.width = int(bucket_width)
        self.buckets: dict = {}
        if preagg.num_rows:
            df = preagg.to_pandas()
            df = df.sort_values([key, "bucket"], kind="stable")
            for k, g in df.groupby(key, sort=False):
                b = g["bucket"].to_numpy(np.int64)
                ent = {
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
                if filter_col:
                    ent.update({
                        "prow_w": np.concatenate(([0], np.cumsum(
                            g["rows_w"].to_numpy(np.int64)))),
                        "pcnt_w": np.concatenate(([0], np.cumsum(
                            g["cnt_w"].to_numpy(np.int64)))),
                        "psum_w": np.concatenate(([0.0], np.cumsum(
                            g["sum_w"].to_numpy(np.float64)))),
                        "min_w": g["min_w"].to_numpy(np.float64),
                        "max_w": g["max_w"].to_numpy(np.float64),
                    })
                self.buckets[k] = ent
        self.raw: dict = {}
        ts = order_to_int64(raw[order_by])
        keep = ts >= 0
        v = column_to_float(raw[value_col])
        kv = raw[key].to_numpy(zero_copy_only=False)
        w = _filter_mask(raw[filter_col]) if filter_col else \
            np.empty(len(ts), bool)
        ts, v, kv, w = ts[keep], v[keep], kv[keep], w[keep]
        if len(kv):   # an empty shard/partition is a valid store
            order = np.lexsort((ts, kv))
            ts, v, kv, w = ts[order], v[order], kv[order], w[order]
            bounds = np.concatenate(
                ([0], np.flatnonzero(kv[1:] != kv[:-1]) + 1, [len(kv)]))
            for i in range(len(bounds) - 1):
                lo, hi = int(bounds[i]), int(bounds[i + 1])
                self.raw[kv[lo]] = (ts[lo:hi], v[lo:hi], w[lo:hi])

    def _edge(self, k, t_lo: int, t_hi: int):
        """Raw (values, filter mask) of entity k within [t_lo, t_hi]."""
        if k not in self.raw:
            return np.empty(0, np.float64), np.empty(0, bool)
        ts, v, w = self.raw[k]
        a = np.searchsorted(ts, t_lo, side="left")
        b = np.searchsorted(ts, t_hi, side="right")
        return v[a:b], w[a:b]

    def features(self, request_row: Mapping[str, object],
                 spec: WindowSpec, aggs: Sequence[Agg]) -> dict:
        """One request row's aggregates from full buckets + edges.
        The request row itself is the newest frame element (request
        semantics, mem_catalog.h:740-766)."""
        rng = _check_spec(spec)
        assert spec.order_by == self.order_by
        need_where = any(a.func.endswith("_where") for a in aggs)
        if need_where:
            if self.filter_col is None:
                raise NotImplementedError(
                    "*_where serving needs a store built with "
                    "filter_col= (raw path otherwise)")
            bad = {a.where for a in aggs
                   if a.func.endswith("_where")
                   and a.where != self.filter_col}
            if bad:
                raise NotImplementedError(
                    f"store pre-aggregates filter column "
                    f"{self.filter_col!r}; *_where over {sorted(bad)} "
                    f"must use the raw path")
        k = request_row[spec.keys[0]]
        req_ts = int(request_row[spec.order_by])
        t0 = req_ts - rng
        W = self.width
        b_lo, b_hi = t0 // W, req_ts // W
        first_full = b_lo if t0 % W == 0 else b_lo + 1

        bk = self.buckets.get(k)
        i0 = i1 = 0
        if bk is not None and first_full < b_hi:
            i0 = int(np.searchsorted(bk["bucket"], first_full,
                                     side="left"))
            i1 = int(np.searchsorted(bk["bucket"], b_hi, side="left"))

        # edges: [t0, first_full*W) and [max(b_hi*W, t0), req_ts]
        spans = []
        if first_full > b_lo and first_full <= b_hi:
            spans.append((t0, min(first_full * W, req_ts + 1) - 1))
        if b_hi >= first_full:
            spans.append((max(b_hi * W, t0), req_ts))
        if first_full > b_hi:  # whole frame inside one bucket
            spans = [(t0, req_ts)]
        ev_parts, ew_parts = [], []
        for lo, hi in spans:
            v, w = self._edge(k, lo, hi)
            ev_parts.append(v)
            ew_parts.append(w)
        # the request row itself is the newest frame element
        rv = request_row.get(self.value_col)
        ev_parts.append(np.array(
            [np.nan if rv is None else float(rv)]))
        if self.filter_col is not None:
            rw = request_row.get(self.filter_col)
            ew_parts.append(np.array(
                [rw is not None and rw == rw and bool(rw)]))
        ev = np.concatenate(ev_parts)
        ew = np.concatenate(ew_parts) if self.filter_col is not None \
            else None

        def channel(sfx: str, erows: np.ndarray | None):
            """(sum, cnt, rows, min, max) over the plain ('') or
            filtered ('_w') channel; ``erows`` masks edge rows."""
            s = cnt = rows = 0.0
            mn = mx = np.nan
            if bk is not None and i1 > i0:
                s += bk["psum" + sfx][i1] - bk["psum" + sfx][i0]
                cnt += bk["pcnt" + sfx][i1] - bk["pcnt" + sfx][i0]
                rows += bk["prow" + sfx][i1] - bk["prow" + sfx][i0]
                seg_mn = bk["min" + sfx][i0:i1]
                seg_mx = bk["max" + sfx][i0:i1]
                with np.errstate(invalid="ignore"):
                    if not np.isnan(seg_mn).all():
                        mn = np.nanmin(seg_mn)
                        mx = np.nanmax(seg_mx)
            eok = ~np.isnan(ev)
            if erows is not None:
                eok = eok & erows
                rows += int(erows.sum())
            else:
                rows += len(ev)
            s += ev[eok].sum()
            cnt += int(eok.sum())
            if eok.any():
                emn, emx = ev[eok].min(), ev[eok].max()
                mn = emn if np.isnan(mn) else min(mn, emn)
                mx = emx if np.isnan(mx) else max(mx, emx)
            return s, cnt, rows, mn, mx

        plain = channel("", None)
        where_ch = channel("_w", ew) if need_where else None

        out = {}
        for a in aggs:
            base = a.func[:-6] if a.func.endswith("_where") else a.func
            s, cnt, rows, mn, mx = where_ch \
                if a.func.endswith("_where") else plain
            if base == "sum":
                out[a.name] = s if cnt else np.nan
            elif base == "count":
                out[a.name] = rows if a.col is None else cnt
            elif base == "avg":
                out[a.name] = s / cnt if cnt else np.nan
            elif base == "min":
                out[a.name] = mn
            elif base == "max":
                out[a.name] = mx
            else:
                raise NotImplementedError(
                    f"pre-agg serving covers sum/count/avg/min/max "
                    f"(+_where), got {a.func}")
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
                 width: int, filter_col: str | None = None):
        self.key = key
        self.order_by = order_by
        self.value_col = value_col
        self.width = width
        self.filter_col = filter_col
        self.store = None

    def load(self, preagg_dir: str, raw_dir: str) -> int:
        import os

        import pyarrow.parquet as pq

        key, order_by, value_col = self.key, self.order_by, self.value_col

        def rd(d, empty):
            return pq.read_table(d) if os.path.isdir(d) else empty
        pre_cols = {
            key: pa.array([], pa.string()),
            "bucket": pa.array([], pa.int64()),
            "rows": pa.array([], pa.int64()),
            "cnt": pa.array([], pa.int64()),
            "sum": pa.array([], pa.float64()),
            "min": pa.array([], pa.float64()),
            "max": pa.array([], pa.float64())}
        raw_cols = {
            key: pa.array([], pa.string()),
            order_by: pa.array([], pa.int64()),
            value_col: pa.array([], pa.float64())}
        if self.filter_col:
            for c in PREAGG_WHERE_COLS:
                pre_cols[c] = pa.array(
                    [], pa.int64() if c in ("rows_w", "cnt_w")
                    else pa.float64())
            raw_cols[self.filter_col] = pa.array([], pa.float64())
        self.store = LongWindowStore(
            rd(preagg_dir, pa.table(pre_cols)),
            rd(raw_dir, pa.table(raw_cols)),
            key, order_by, value_col, self.width, self.filter_col)
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
                 n_shards: int = 8, storage_dir: str | None = None,
                 filter_col: str | None = None):
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
        raw = raw.select_columns(
            [key, order_by, value_col]
            + ([filter_col] if filter_col else []))
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
            shard_cls.remote(key, order_by, value_col, bucket_width,
                             filter_col)
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
