"""Generic quantile-salted window (skew.salted_window_agg) must equal
the unsalted runner exactly, including EXCLUDE CURRENT_TIME and
MAXSIZE, on a hot-key-skewed events-style table."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from openmldb_ray.skew import salted_window_agg
from openmldb_ray.window import Agg, WindowSpec, window_agg

AGGS = [Agg("sum", "v", "s"), Agg("count", None, "n"),
        Agg("min", "v", "mn"), Agg("max", "v", "mx"),
        Agg("avg", "v", "a")]


def _mk(n=20_000, hot_frac=0.4, seed=11):
    rng = np.random.default_rng(seed)
    hot = rng.random(n) < hot_frac
    uid = np.where(hot, 0, rng.integers(1, 50, n))
    ts = rng.integers(0, 1_000_000, n)
    v = rng.integers(0, 100, n).astype(float)
    return pd.DataFrame({"event_id": np.arange(n), "user_id": uid,
                         "ts": ts, "v": v})


def _cmp(a: pd.DataFrame, b: pd.DataFrame):
    a = a.sort_values("event_id").reset_index(drop=True)
    b = b.sort_values("event_id").reset_index(drop=True)
    assert len(a) == len(b)
    for c in ("s", "n", "mn", "mx", "a"):
        np.testing.assert_allclose(a[c].astype(float), b[c].astype(float),
                                   rtol=1e-9, err_msg=c)


@pytest.mark.parametrize("spec", [
    WindowSpec("user_id", "ts", preceding_range=50_000),
    WindowSpec("user_id", "ts", preceding_range=50_000, max_size=20),
    WindowSpec("user_id", "ts", preceding_range=80_000,
               exclude_current_time=True),
    WindowSpec("user_id", "ts", preceding_range=60_000,
               end_offset_range=5_000),
], ids=["range", "maxsize", "ect", "lag"])
def test_salted_equals_unsalted(ray_session, spec):
    df = _mk()
    ds = ray.data.from_pandas(df).materialize()
    base = window_agg(ds, spec, AGGS,
                      passthrough=["event_id", "user_id", "ts"],
                      num_buckets=4).to_pandas()
    salted = salted_window_agg(ds, spec, AGGS,
                               passthrough=["event_id", "user_id", "ts"],
                               num_buckets=4, hot_frac=0.1, min_rows=1000,
                               parts=6).to_pandas()
    _cmp(base, salted)


def _mk_unique_ts(n=20_000, hot_frac=0.4, seed=11):
    """ROWS frames need a deterministic total order -> unique ts."""
    rng = np.random.default_rng(seed)
    hot = rng.random(n) < hot_frac
    uid = np.where(hot, 0, rng.integers(1, 50, n))
    ts = rng.permutation(n * 10)[:n]
    v = rng.integers(0, 100, n).astype(float)
    return pd.DataFrame({"event_id": np.arange(n), "user_id": uid,
                         "ts": ts, "v": v})


@pytest.mark.parametrize("spec", [
    WindowSpec("user_id", "ts", preceding_rows=100),
    WindowSpec("user_id", "ts", preceding_rows=50, end_offset_rows=5),
    WindowSpec("user_id", "ts", preceding_rows=200,
               preceding_range=40_000),
], ids=["rows", "rows_lag", "merged"])
def test_salted_rows_frames_equal_unsalted(ray_session, spec):
    """Count-based frames: whole-predecessor-part replication bounded
    by the exact part-count pre-pass must be bit-equal to the plain
    runner."""
    df = _mk_unique_ts()
    ds = ray.data.from_pandas(df).materialize()
    base = window_agg(ds, spec, AGGS,
                      passthrough=["event_id", "user_id", "ts"],
                      num_buckets=4).to_pandas()
    salted = salted_window_agg(ds, spec, AGGS,
                               passthrough=["event_id", "user_id", "ts"],
                               num_buckets=4, hot_frac=0.1, min_rows=1000,
                               parts=6).to_pandas()
    _cmp(base, salted)
