"""Online/offline consistency: request-mode single-row features must
equal the batch window_agg output for the same row (the reference
guarantees this by sharing one physical plan; we share one kernel)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from openmldb_ray.request import request_features
from openmldb_ray.window import Agg, WindowSpec, window_agg

AGGS = [Agg("sum", "v", "s"), Agg("avg", "v", "a"), Agg("min", "v", "mn"),
        Agg("max", "v", "mx"), Agg("count", None, "n"),
        Agg("lag", "v", "l1", k=1)]

SPECS = [
    WindowSpec("k", "ts", preceding_rows=3),
    WindowSpec("k", "ts", preceding_range=5),
    WindowSpec("k", "ts", preceding_range=8, max_size=3),
    WindowSpec("k", "ts", preceding_range=6, exclude_current_time=True),
]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: repr(s)[11:45])
def test_request_matches_batch(ray_session, spec):
    rng = np.random.default_rng(3)
    n = 30
    ts = np.sort(rng.integers(0, 15, n))
    rows = [{"k": "a", "ts": int(t), "v": float(rng.integers(0, 9))}
            for t in ts]
    ds = ray.data.from_items(rows)
    batch_out = window_agg(ds, spec, AGGS, passthrough=["k", "ts", "v"],
                           num_buckets=2).to_pandas()
    # serve the LAST row (unique max ts so the batch row is identifiable)
    rows_sorted = sorted(rows, key=lambda r: r["ts"])
    req = dict(rows_sorted[-1])
    req["ts"] = rows_sorted[-1]["ts"] + 1  # strictly newest
    history = pa.Table.from_pylist(rows)
    got = request_features(req, history, spec, AGGS)
    # batch equivalent: run with the request row appended
    ds2 = ray.data.from_items(rows + [req])
    b2 = window_agg(ds2, spec, AGGS, passthrough=["k", "ts", "v"],
                    num_buckets=2).to_pandas()
    brow = b2[b2["ts"] == req["ts"]].iloc[0]
    for a in AGGS:
        g, e = got[a.name], brow[a.name]
        if isinstance(e, float) and np.isnan(e):
            assert g is None or (isinstance(g, float) and np.isnan(g)), a.name
        else:
            assert np.isclose(float(g), float(e)), (a.name, g, e)


def test_request_rejects_bad_order_key():
    spec = WindowSpec("k", "ts", preceding_rows=1)
    with pytest.raises(ValueError):
        request_features({"ts": None, "v": 1.0},
                         pa.table({"ts": [], "v": []}), spec,
                         [Agg("sum", "v", "s")])
