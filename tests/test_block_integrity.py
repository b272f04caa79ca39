"""Partition-integrity stress: the repartition-based window path must
keep each entity's rows in ONE map batch even when partitions are far
larger than DataContext.target_max_block_size (a split entity would
silently truncate frames at the boundary)."""

import numpy as np
import pandas as pd
import pytest
import ray.data


def test_entity_never_split_across_batches(ray_session):
    from ray.data.context import DataContext

    from openmldb_ray.window import Agg, WindowSpec, window_agg
    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 256 * 1024  # 256 KB
        n = 200_000
        rng = np.random.default_rng(0)
        df = pd.DataFrame({"k": rng.integers(0, 4, n),
                           "ts": np.arange(n),
                           "v": rng.random(n)})
        ds = ray.data.from_pandas(df).materialize()
        spec = WindowSpec("k", "ts", preceding_rows=5)
        out = window_agg(ds, spec, [Agg("count", None, "c")],
                         passthrough=["k", "ts"], num_buckets=4).to_pandas()
        assert len(out) == n
        bad = 0
        for _, g in out.groupby("k"):
            c = g.sort_values("ts")["c"].to_numpy()
            bad += int((c != np.minimum(np.arange(len(g)) + 1, 6)).sum())
        assert bad == 0  # any entity split would truncate mid-run frames
    finally:
        ctx.target_max_block_size = old
