"""Window partition/order keys of non-int types: date order axis,
date/int partition keys (reference case variants: window cases id 1/4
use int32 and date keys)."""

import datetime

import numpy as np
import pytest
import ray.data

from openmldb_ray.window import Agg, WindowSpec, window_agg


def test_date_order_axis(ray_session):
    """ORDER BY a date32 column: axis = days since epoch; ROWS_RANGE
    offsets are in days."""
    d0 = datetime.date(2020, 5, 1)
    rows = [{"k": "a", "d": d0 + datetime.timedelta(days=i), "v": float(i)}
            for i in range(6)]
    ds = ray.data.from_items(rows)
    spec = WindowSpec("k", "d", preceding_range=2)  # 2 days
    out = window_agg(ds, spec, [Agg("sum", "v", "s")],
                     passthrough=["k", "d"], num_buckets=2).to_pandas() \
        .sort_values("d")
    assert out["s"].tolist() == [0, 1, 3, 6, 9, 12]


def test_int_partition_key(ray_session):
    ds = ray.data.from_items(
        [{"k": i % 3, "ts": i, "v": 1.0} for i in range(12)])
    spec = WindowSpec("k", "ts", preceding_rows=10)
    out = window_agg(ds, spec, [Agg("count", None, "n")],
                     passthrough=["k", "ts"], num_buckets=2).to_pandas()
    assert len(out) == 12
    assert out.groupby("k")["n"].max().tolist() == [4, 4, 4]


def test_timestamp_partition_key(ray_session):
    """Partition by a timestamp column (degenerate but legal)."""
    import pandas as pd
    t0 = pd.Timestamp("2024-01-01")
    ds = ray.data.from_items(
        [{"k": t0 + pd.Timedelta(hours=i % 2), "ts": i, "v": 2.0}
         for i in range(8)])
    spec = WindowSpec("k", "ts", preceding_rows=100)
    out = window_agg(ds, spec, [Agg("sum", "v", "s")],
                     passthrough=["k", "ts"], num_buckets=2).to_pandas()
    assert len(out) == 8
    assert out["s"].max() == 8.0
