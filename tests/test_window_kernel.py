"""Vectorized kernel vs brute-force evaluator — randomized conformance.

The moral analog of the reference's cross-engine YAML corpus
(SURVEY.md §5): random ts/keys/values, every frame-type × modifier
combination, asserting allclose between the O(n log w) kernel and the
O(n·w) row-at-a-time simulation of the documented buffer semantics.
"""

import numpy as np
import pytest

from openmldb_ray.window.brute import eval_brute
from openmldb_ray.window.kernel import eval_aggs, frame_bounds
from openmldb_ray.window.spec import Agg, WindowSpec

AGGS = [
    Agg("sum", "v", "s"),
    Agg("count", "v", "c"),
    Agg("count", None, "cstar"),
    Agg("avg", "v", "a"),
    Agg("min", "v", "mn"),
    Agg("max", "v", "mx"),
    Agg("distinct_count", "v", "dc"),
    Agg("lag", "v", "l1", k=1),
    Agg("at", "v", "l0", k=0),
    Agg("first_value", "v", "fv"),
    Agg("sum_where", "v", "sw", where="w"),
    Agg("count_where", "v", "cw", where="w"),
    Agg("min_where", "v", "mnw", where="w"),
    Agg("max_where", "v", "mxw", where="w"),
    Agg("avg_where", "v", "aw", where="w"),
]

SPECS = [
    WindowSpec("k", "ts", preceding_rows=3),
    WindowSpec("k", "ts", preceding_rows=0),
    WindowSpec("k", "ts", preceding_range=5),
    WindowSpec("k", "ts", preceding_range=0),
    WindowSpec("k", "ts", preceding_rows=4, preceding_range=6),
    WindowSpec("k", "ts", preceding_range=8, end_offset_range=2),
    WindowSpec("k", "ts", preceding_rows=5, end_offset_rows=2),
    WindowSpec("k", "ts", preceding_range=6, max_size=2),
    WindowSpec("k", "ts", preceding_rows=6, max_size=3),
    WindowSpec("k", "ts", preceding_range=5, exclude_current_time=True),
    WindowSpec("k", "ts", preceding_rows=4, exclude_current_time=True),
    WindowSpec("k", "ts", preceding_range=5, instance_not_in_window=True),
    WindowSpec("k", "ts", preceding_range=5, open_preceding=True),
    WindowSpec("k", "ts", preceding_rows=3, open_preceding=True),
    WindowSpec("k", "ts", preceding_range=7, max_size=3,
               exclude_current_time=True),
]


def _case(seed, n=60, with_union=False, with_nulls=True):
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.integers(0, 25, size=n)).astype(np.int64)  # many ties
    v = rng.integers(-5, 10, size=n).astype(np.float64)
    if with_nulls:
        v[rng.random(n) < 0.15] = np.nan
    w = rng.random(n) < 0.5
    is_primary = (rng.random(n) < 0.7) if with_union else np.ones(n, bool)
    # union rows sort before primary rows at equal ts (runner.cc:1521)
    order = np.lexsort((~is_primary, ts))
    return ts[order], {"v": v, "w": w}, is_primary[order]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: repr(s)[11:60])
@pytest.mark.parametrize("seed", [1, 2, 3])
def test_kernel_matches_brute(spec, seed):
    ts, vals, isp = _case(seed)
    got = eval_aggs(ts, vals, AGGS, spec, is_primary=isp)
    exp = eval_brute(ts, vals, AGGS, spec, is_primary=isp)
    for a in AGGS:
        np.testing.assert_allclose(got[a.name], exp[a.name], rtol=1e-9,
                                   err_msg=f"{a.func}/{a.name} spec={spec}")


@pytest.mark.parametrize("spec", SPECS[:8], ids=lambda s: repr(s)[11:60])
@pytest.mark.parametrize("seed", [11, 12])
def test_kernel_matches_brute_union(spec, seed):
    ts, vals, isp = _case(seed, with_union=True)
    got = eval_aggs(ts, vals, AGGS, spec, is_primary=isp)
    exp = eval_brute(ts, vals, AGGS, spec, is_primary=isp)
    for a in AGGS:
        np.testing.assert_allclose(got[a.name][isp], exp[a.name][isp],
                                   rtol=1e-9,
                                   err_msg=f"{a.func}/{a.name} spec={spec}")


def test_frame_bounds_basic():
    ts = np.array([0, 1, 2, 5, 5, 9], dtype=np.int64)
    spec = WindowSpec("k", "ts", preceding_range=3)
    start, hist_end, self_in, _ = frame_bounds(ts, spec)
    # row 3 (ts=5): frame covers ts in [2,5] -> start at index 2
    assert start[3] == 2 and hist_end[3] == 3 and self_in[3]
    # row 4 (ts=5): peers at equal ts that are earlier ARE in frame
    assert start[4] == 2 and hist_end[4] == 4 and self_in[4]


def test_rows_frame_ignores_time_gaps():
    ts = np.array([0, 100, 10_000], dtype=np.int64)
    spec = WindowSpec("k", "ts", preceding_rows=2)
    start, hist_end, self_in, _ = frame_bounds(ts, spec)
    assert start[2] == 0 and hist_end[2] == 2 and self_in[2]


def test_distinct_count_vectorized_equals_loop():
    """The range-add vectorized sliding distinct equals the per-row
    loop fallback on floats-with-NaN, strings, and bool columns
    (null_counts=False), and the non-monotone fallback agrees too."""
    from openmldb_ray.window.kernel import (_distinct_count,
                                            _distinct_count_loop)
    rng = np.random.default_rng(7)
    n = 400
    for hv, v in [
        (np.where(rng.random(n) < 0.1, np.nan,
                  rng.integers(0, 12, n).astype(np.float64)),
         np.where(rng.random(n) < 0.1, np.nan,
                  rng.integers(0, 12, n).astype(np.float64))),
        (np.array([f"s{i}" for i in rng.integers(0, 9, n)], dtype=object),
         np.array([f"s{i}" for i in rng.integers(0, 9, n)], dtype=object)),
    ]:
        w = rng.integers(1, 30, n)
        start = np.maximum(np.arange(n) - w, 0).astype(np.int64)
        hist_end = np.arange(n, dtype=np.int64)
        self_in = rng.random(n) < 0.8
        for null_counts in (True, False):
            got = _distinct_count(hv, v, start, hist_end, self_in,
                                  null_counts)
            exp = _distinct_count_loop(hv, v, start, hist_end, self_in,
                                       null_counts)
            np.testing.assert_allclose(got, exp)
    # non-monotone hist_end exercises the loop fallback inside
    # _distinct_count itself
    hv = rng.integers(0, 5, 50).astype(np.float64)
    v = rng.integers(0, 5, 50).astype(np.float64)
    start = np.zeros(50, dtype=np.int64)
    hist_end = rng.integers(0, 50, 50).astype(np.int64)
    self_in = np.ones(50, dtype=bool)
    got = _distinct_count(hv, v, start, hist_end, self_in, True)
    exp = _distinct_count_loop(hv, v, start, hist_end, self_in, True)
    np.testing.assert_allclose(got, exp)
