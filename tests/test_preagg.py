"""Pre-agg long-window buckets == raw history scan, bit for bit.

The LongWindowStore (full buckets + edge rows) must agree with
request_features (full history through the window kernel) on
randomized histories, including NULL values, empty frames, and frame
boundaries landing inside/on bucket edges.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from openmldb_ray.request import request_features
from openmldb_ray.window import Agg, WindowSpec
from openmldb_ray.window.preagg import LongWindowStore, build_preagg

AGGS = [Agg("sum", "v", "s"), Agg("count", "v", "c"),
        Agg("count", None, "n"), Agg("avg", "v", "a"),
        Agg("min", "v", "mn"), Agg("max", "v", "mx")]


def _history(n=5000, keys=3, seed=3):
    rng = np.random.default_rng(seed)
    k = rng.integers(0, keys, n)
    ts = rng.integers(0, 100_000, n)
    v = rng.integers(0, 1000, n).astype(float)
    v[rng.random(n) < 0.05] = np.nan  # NULLs
    return pa.table({"k": pa.array([f"u{i}" for i in k]),
                     "ts": pa.array(ts, type=pa.int64()),
                     "v": pa.array(v)})


@pytest.mark.parametrize("width,rng_w", [(1000, 20_000), (777, 13_331),
                                         (1000, 500)])
def test_preagg_equals_raw_request(ray_session, width, rng_w):
    hist = _history()
    ds = ray.data.from_arrow(hist)
    preagg = build_preagg(ds, "k", "ts", "v", width)
    store = LongWindowStore(preagg, hist, "k", "ts", "v", width)
    spec = WindowSpec("k", "ts", preceding_range=rng_w)

    rng = np.random.default_rng(9)
    kv = hist["k"].to_numpy(zero_copy_only=False)
    tv = hist["ts"].to_numpy(zero_copy_only=False)
    for i in rng.choice(hist.num_rows, 60, replace=False):
        k = kv[i]
        req = {"k": k, "ts": int(tv[i]) + int(rng.integers(0, 3)),
               "v": float(rng.integers(0, 1000))}
        sub = hist.filter(pa.compute.equal(hist["k"], k))
        exp = request_features(req, sub, spec, AGGS)
        got = store.features(req, spec, AGGS)
        for a in AGGS:
            e, g = exp[a.name], got[a.name]
            if isinstance(e, float) and np.isnan(e):
                assert np.isnan(g), (a.name, e, g)
            else:
                assert float(e) == pytest.approx(float(g), rel=1e-12), \
                    (a.name, e, g)


def test_preagg_rejects_modified_frames(ray_session):
    store = LongWindowStore(pa.table({}), _history(50), "k", "ts", "v",
                            1000)
    with pytest.raises(ValueError):
        store.features({"k": "u0", "ts": 10, "v": 1.0},
                       WindowSpec("k", "ts", preceding_rows=5),
                       [Agg("sum", "v", "s")])


def test_sharded_store_bit_equal_and_partitioned(ray_session):
    """The actor-per-key-range store must return byte-identical
    features to the single-process store for every request, including
    keys absent from the build (empty-window semantics), and every
    shard actor must hold ONLY its key range."""
    import ray

    from openmldb_ray.window.preagg import (ShardedLongWindowStore,
                                            _key_shards)
    width, rng_w = 1000, 20_000
    hist = _history(n=8000, keys=13, seed=17)
    ds = ray.data.from_arrow(hist)
    preagg = build_preagg(ds, "k", "ts", "v", width)
    single = LongWindowStore(preagg, hist, "k", "ts", "v", width)
    sharded = ShardedLongWindowStore(
        build_preagg(ds, "k", "ts", "v", width), ds,
        "k", "ts", "v", width, n_shards=4)
    spec = WindowSpec("k", "ts", preceding_range=rng_w)

    rng = np.random.default_rng(23)
    kv = hist["k"].to_numpy(zero_copy_only=False)
    tv = hist["ts"].to_numpy(zero_copy_only=False)
    reqs = []
    for i in rng.choice(hist.num_rows, 80, replace=False):
        reqs.append({"k": kv[i], "ts": int(tv[i]) + int(rng.integers(0, 3)),
                     "v": float(rng.integers(0, 1000))})
    reqs.append({"k": "never-seen", "ts": 50_000, "v": 7.0})
    got = sharded.features_batch(reqs, spec, AGGS)
    for req, g in zip(reqs, got):
        exp = single.features(req, spec, AGGS)
        for a in AGGS:
            e, gg = exp[a.name], g[a.name]
            if isinstance(e, float) and np.isnan(e):
                assert np.isnan(gg), (a.name, req)
            else:
                assert float(e) == float(gg), (a.name, req, e, gg)

    # partition check: each actor's store holds exactly its hash range
    all_keys = set(np.unique(kv))
    held = ray.get([a.__ray_call__.remote(
        lambda self: set(self.store.raw.keys())) for a in sharded.actors])
    for s, keys in enumerate(held):
        exp_keys = {k for k in all_keys
                    if int(_key_shards([k], 4)[0]) == s}
        assert keys == exp_keys, s
    assert set().union(*held) == all_keys
    sharded.shutdown()


@pytest.mark.parametrize("seed,n_shards,width,rng_w",
                         [(101, 2, 500, 7_000), (202, 5, 1_000, 25_000),
                          (303, 3, 777, 3_333)])
def test_sharded_store_randomized(ray_session, seed, n_shards, width,
                                  rng_w):
    """Randomized shard counts / bucket widths / frame ranges: the
    sharded store must stay bit-equal to the raw request path."""
    import ray

    from openmldb_ray.window.preagg import ShardedLongWindowStore
    hist = _history(n=4000, keys=7, seed=seed)
    ds = ray.data.from_arrow(hist)
    preagg = build_preagg(ds, "k", "ts", "v", width)
    store = ShardedLongWindowStore(preagg, ds, "k", "ts", "v", width,
                                   n_shards=n_shards)
    spec = WindowSpec("k", "ts", preceding_range=rng_w)

    rng = np.random.default_rng(seed + 1)
    kv = hist["k"].to_numpy(zero_copy_only=False)
    tv = hist["ts"].to_numpy(zero_copy_only=False)
    reqs = [{"k": kv[i], "ts": int(tv[i]) + int(rng.integers(0, 5)),
             "v": float(rng.integers(0, 1000))}
            for i in rng.choice(hist.num_rows, 30, replace=False)]
    got = store.features_batch(reqs, spec, AGGS)
    for req, g in zip(reqs, got):
        sub = hist.filter(pa.compute.equal(hist["k"], req["k"]))
        exp = request_features(req, sub, spec, AGGS)
        for a in AGGS:
            e, gg = exp[a.name], g[a.name]
            if isinstance(e, float) and np.isnan(e):
                assert np.isnan(gg), (a.name, req)
            else:
                assert float(e) == pytest.approx(float(gg), rel=1e-12), \
                    (a.name, req, e, gg)
    store.shutdown()


WHERE_AGGS = [Agg("count_where", None, "nw", where="f"),
              Agg("count_where", "v", "cw", where="f"),
              Agg("sum_where", "v", "sw", where="f"),
              Agg("avg_where", "v", "aw", where="f"),
              Agg("min_where", "v", "mnw", where="f"),
              Agg("max_where", "v", "mxw", where="f")]


def _history_where(n=5000, keys=3, seed=3):
    """_history plus a boolean filter column with NULLs (a NULL
    condition never matches — test_udaf_function.yaml id 45)."""
    hist = _history(n, keys, seed)
    rng = np.random.default_rng(seed + 7)
    f = rng.random(n) < 0.4
    mask = rng.random(n) < 0.1
    return hist.append_column(
        "f", pa.array(f, type=pa.bool_(), mask=mask))


@pytest.mark.parametrize("width,rng_w", [(1000, 20_000), (777, 3_333)])
def test_preagg_where_channel_equals_raw(ray_session, width, rng_w):
    """count_where/sum_where/avg_where/min_where/max_where served from
    the filtered bucket channel (aggregator.h:40-52 count_where
    coverage) must match the raw kernel path bit for bit."""
    hist = _history_where()
    ds = ray.data.from_arrow(hist)
    preagg = build_preagg(ds, "k", "ts", "v", width, filter_col="f")
    store = LongWindowStore(preagg, hist, "k", "ts", "v", width,
                            filter_col="f")
    spec = WindowSpec("k", "ts", preceding_range=rng_w)
    aggs = AGGS + WHERE_AGGS

    rng = np.random.default_rng(11)
    kv = hist["k"].to_numpy(zero_copy_only=False)
    tv = hist["ts"].to_numpy(zero_copy_only=False)
    for i in rng.choice(hist.num_rows, 50, replace=False):
        k = kv[i]
        req = {"k": k, "ts": int(tv[i]) + int(rng.integers(0, 3)),
               "v": float(rng.integers(0, 1000)),
               "f": [True, False, None][int(rng.integers(0, 3))]}
        sub = hist.filter(pa.compute.equal(hist["k"], k))
        exp = request_features(req, sub, spec, aggs)
        got = store.features(req, spec, aggs)
        for a in aggs:
            e, g = exp[a.name], got[a.name]
            if isinstance(e, float) and np.isnan(e):
                assert np.isnan(g), (a.name, e, g)
            else:
                assert float(e) == pytest.approx(float(g), rel=1e-12), \
                    (a.name, e, g)


def test_preagg_where_sharded_parity_and_guards(ray_session):
    """Sharded store with a filter channel matches the single store;
    *_where over an un-preaggregated column refuses (raw path)."""
    from openmldb_ray.window.preagg import ShardedLongWindowStore
    width, rng_w = 1000, 15_000
    hist = _history_where(n=6000, keys=9, seed=29)
    ds = ray.data.from_arrow(hist)
    preagg = build_preagg(ds, "k", "ts", "v", width, filter_col="f")
    single = LongWindowStore(preagg, hist, "k", "ts", "v", width,
                             filter_col="f")
    sharded = ShardedLongWindowStore(
        build_preagg(ds, "k", "ts", "v", width, filter_col="f"), ds,
        "k", "ts", "v", width, n_shards=3, filter_col="f")
    spec = WindowSpec("k", "ts", preceding_range=rng_w)
    aggs = AGGS + WHERE_AGGS

    rng = np.random.default_rng(31)
    kv = hist["k"].to_numpy(zero_copy_only=False)
    tv = hist["ts"].to_numpy(zero_copy_only=False)
    reqs = [{"k": kv[i], "ts": int(tv[i]) + int(rng.integers(0, 3)),
             "v": float(rng.integers(0, 1000)),
             "f": bool(rng.integers(0, 2))}
            for i in rng.choice(hist.num_rows, 40, replace=False)]
    reqs.append({"k": "never-seen", "ts": 50_000, "v": 7.0, "f": True})
    got = sharded.features_batch(reqs, spec, aggs)
    for req, g in zip(reqs, got):
        exp = single.features(req, spec, aggs)
        for a in aggs:
            e, gg = exp[a.name], g[a.name]
            if isinstance(e, float) and np.isnan(e):
                assert np.isnan(gg), (a.name, req)
            else:
                assert float(e) == float(gg), (a.name, req, e, gg)
    sharded.shutdown()

    # guard 1: store built WITHOUT filter_col refuses *_where
    plain = LongWindowStore(build_preagg(ds, "k", "ts", "v", width),
                            hist, "k", "ts", "v", width)
    with pytest.raises(NotImplementedError):
        plain.features(reqs[0], spec, WHERE_AGGS)
    # guard 2: *_where over a different column refuses
    with pytest.raises(NotImplementedError):
        single.features(reqs[0], spec,
                        [Agg("sum_where", "v", "x", where="v")])
