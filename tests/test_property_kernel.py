"""Hypothesis property tests: the vectorized kernel equals the
brute-force buffer simulation for arbitrary frames, data, and ties —
the deepest conformance layer (shrinks failures to minimal cases)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from openmldb_ray.window.brute import eval_brute
from openmldb_ray.window.kernel import eval_aggs
from openmldb_ray.window.spec import Agg, WindowSpec

AGGS = [Agg("sum", "v", "s"), Agg("count", None, "c"),
        Agg("min", "v", "mn"), Agg("max", "v", "mx"),
        Agg("avg", "v", "a"), Agg("lag", "v", "l2", k=2),
        Agg("distinct_count", "v", "dc")]


@st.composite
def window_case(draw):
    n = draw(st.integers(1, 40))
    ts = sorted(draw(st.lists(st.integers(0, 15), min_size=n, max_size=n)))
    v = draw(st.lists(st.one_of(st.integers(-5, 9).map(float),
                                st.just(float("nan"))),
                      min_size=n, max_size=n))
    frame_kind = draw(st.sampled_from(["rows", "range", "merged"]))
    kw = {}
    if frame_kind in ("rows", "merged"):
        kw["preceding_rows"] = draw(st.integers(0, 6))
    if frame_kind in ("range", "merged"):
        kw["preceding_range"] = draw(st.integers(0, 10))
    if frame_kind == "range" and draw(st.booleans()):
        kw["end_offset_range"] = draw(st.integers(1, 4))
    elif frame_kind == "rows" and draw(st.booleans()):
        kw["end_offset_rows"] = draw(st.integers(1, 3))
    if draw(st.booleans()):
        kw["max_size"] = draw(st.integers(1, 5))
    kw["exclude_current_time"] = draw(st.booleans())
    kw["instance_not_in_window"] = draw(st.booleans())
    kw["open_preceding"] = draw(st.booleans())
    spec = WindowSpec("k", "ts", **kw)
    return np.array(ts, dtype=np.int64), np.array(v), spec


@given(window_case())
@settings(max_examples=150, deadline=None)
def test_kernel_equals_brute(case):
    ts, v, spec = case
    vals = {"v": v}
    got = eval_aggs(ts, vals, AGGS, spec)
    exp = eval_brute(ts, vals, AGGS, spec)
    for a in AGGS:
        np.testing.assert_allclose(
            got[a.name], exp[a.name], rtol=1e-9,
            err_msg=f"{a.name} spec={spec} ts={ts.tolist()}")
