"""top / topn_frequency / *_cate window functions — kernel vs brute,
plus reference-doc golden cases (udfs_8h.md)."""

import numpy as np
import pytest

from openmldb_ray.window.brute import eval_brute
from openmldb_ray.window.kernel import eval_aggs
from openmldb_ray.window.spec import Agg, WindowSpec

AGGS = [
    Agg("top", "v", "t3", k=3),
    Agg("topn_frequency", "v", "tf2", k=2),
    Agg("sum_cate", "v", "sc", cate="c"),
    Agg("count_cate", "v", "cc", cate="c"),
    Agg("avg_cate", "v", "ac", cate="c"),
    Agg("min_cate", "v", "mnc", cate="c"),
    Agg("max_cate", "v", "mxc", cate="c"),
    Agg("sum_cate_where", "v", "scw", cate="c", where="w"),
]

SPECS = [
    WindowSpec("k", "ts", preceding_rows=4),
    WindowSpec("k", "ts", preceding_range=6),
    WindowSpec("k", "ts", preceding_range=6, max_size=3),
]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: repr(s)[11:45])
@pytest.mark.parametrize("seed", [5, 6])
def test_string_aggs_match_brute(spec, seed):
    rng = np.random.default_rng(seed)
    n = 40
    ts = np.sort(rng.integers(0, 20, n)).astype(np.int64)
    v = rng.integers(0, 8, n).astype(np.float64)
    v[rng.random(n) < 0.1] = np.nan
    c = rng.integers(0, 3, n).astype(np.float64)
    w = rng.random(n) < 0.5
    vals = {"v": v, "c": c, "w": w}
    got = eval_aggs(ts, vals, AGGS, spec)
    exp = eval_brute(ts, vals, AGGS, spec)
    for a in AGGS:
        assert list(got[a.name]) == list(exp[a.name]), (a.name, spec)


def test_top_reference_golden():
    """udfs_8h.md 'function top': values 0..4, top(value,3) over the
    full window -> '4,3,2' (desc, containers.h:99-137 reverse iter)."""
    ts = np.arange(5, dtype=np.int64)
    vals = {"v": np.arange(5, dtype=np.float64)}
    spec = WindowSpec("k", "ts", preceding_rows=10)
    got = eval_aggs(ts, vals, [Agg("top", "v", "t", k=3)], spec)
    assert got["t"][-1] == "4,3,2"


def test_sum_cate_reference_golden():
    """udfs_8h.md 'function sum_cate': values 0..4, cats x,y,x,y,x ->
    'x:6,y:4' (K:V sorted by key asc)."""
    ts = np.arange(5, dtype=np.int64)
    vals = {"v": np.arange(5, dtype=np.float64),
            "c": np.array(["x", "y", "x", "y", "x"], dtype=object)}
    spec = WindowSpec("k", "ts", preceding_rows=10)
    got = eval_aggs(ts, vals, [Agg("sum_cate", "v", "s", cate="c")], spec)
    assert got["s"][-1] == "x:6,y:4"


def test_string_aggs_through_dataset(ray_session):
    import ray.data

    from openmldb_ray.window import window_agg
    ds = ray.data.from_items([
        {"k": "a", "ts": t, "v": float(t % 4), "c": "xy"[t % 2]}
        for t in range(8)])
    spec = WindowSpec("k", "ts", preceding_rows=3)
    out = window_agg(ds, spec,
                     [Agg("top", "v", "t2", k=2),
                      Agg("sum_cate", "v", "sc", cate="c")],
                     passthrough=["k", "ts"], num_buckets=2) \
        .to_pandas().sort_values("ts")
    assert out["t2"].iloc[-1] == "3,2"
    # float-typed value columns render %.6f in cate strings
    # (function/test_udaf_function.yaml ids 20-24)
    assert out["sc"].iloc[0] == "x:0.000000"


def test_string_column_value_aggs(ray_session):
    """min/max/lag/at/first_value/count over a STRING column (the
    reference supports these; reported broken in round 1)."""
    import ray.data

    from openmldb_ray.window import Agg, WindowSpec, window_agg
    rows = [{"k": "a", "ts": t, "s": v} for t, v in
            zip(range(1, 6), ["d", "b", None, "e", "a"])]
    ds = ray.data.from_items(rows)
    spec = WindowSpec("k", "ts", preceding_rows=2)
    out = window_agg(ds, spec, [
        Agg("min", "s", "mn"), Agg("max", "s", "mx"),
        Agg("count", "s", "c"), Agg("lag", "s", "l1", k=1),
        Agg("first_value", "s", "fv"),
        Agg("topn_frequency", "s", "tf", k=2),
    ], passthrough=["ts"], num_buckets=2).to_pandas() \
        .sort_values("ts").reset_index(drop=True)
    assert out["mn"].tolist() == ["d", "b", "b", "b", "a"]
    assert out["mx"].tolist() == ["d", "d", "d", "e", "e"]
    assert out["c"].tolist() == [1, 2, 2, 2, 2]
    assert out["l1"].tolist() == [None, "d", "b", None, "e"]
    assert out["fv"].tolist() == ["d", "b", None, "e", "a"]
    # ties by larger value first after count
    assert out["tf"].iloc[1] == "d,b"
