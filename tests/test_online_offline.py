"""Online/offline consistency through the session surface: rows
ingested via INSERT statements must produce IDENTICAL features from
(a) the batch window plan over the full table and (b) request-mode
serving against the same history — the reference's core guarantee
(same physical plan + same codegen on both paths; here: one shared
kernel, SURVEY §3.2)."""

import numpy as np
import pyarrow as pa
import pytest

from openmldb_ray.window import Agg, WindowSpec


def test_insert_then_serve_matches_batch(ray_session):
    from openmldb_ray.request import request_features
    from openmldb_ray.sql.script import SqlSession
    from openmldb_ray.window.runner import window_agg

    s = SqlSession({})
    s.execute("create table hist (k string, ts bigint, v double, "
              "index(key=(k), ts=ts))")
    rng = np.random.default_rng(8)
    rows = [("k%d" % (i % 3), int(i * 10 + rng.integers(0, 5)),
             float(rng.integers(0, 100))) for i in range(300)]
    # ingest in chunks through the statement surface
    for lo in range(0, 300, 50):
        vals = ",".join(f"('{k}', {t}L, {v})"
                        for k, t, v in rows[lo:lo + 50])
        s.execute(f"insert into hist values {vals}")

    spec = WindowSpec("k", "ts", preceding_rows=7)
    aggs = [Agg("sum", "v", "s7"), Agg("count", None, "n7"),
            Agg("min", "v", "mn7")]

    # offline: batch window over the session table
    batch = window_agg(s.tables["hist"], spec, aggs,
                       passthrough=["k", "ts"], num_buckets=2) \
        .to_pandas().set_index(["k", "ts"]).sort_index()

    # online: serve sampled rows as requests against their history
    # (the request row itself arrives WITH the request, not in history)
    hdf = s.tables["hist"].to_pandas()
    for i in rng.choice(300, 40, replace=False):
        k, t, v = rows[i]
        sub = hdf[(hdf["k"] == k) & ~(hdf["ts"] == t)]
        got = request_features(
            {"k": k, "ts": t, "v": v},
            pa.Table.from_pandas(sub, preserve_index=False), spec, aggs)
        want = batch.loc[(k, t)]
        assert got["s7"] == pytest.approx(float(want["s7"])), (k, t)
        assert int(got["n7"]) == int(want["n7"]), (k, t)
        assert got["mn7"] == pytest.approx(float(want["mn7"])), (k, t)
