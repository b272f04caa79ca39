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
