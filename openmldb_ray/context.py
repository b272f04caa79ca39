"""Engine tuning knobs sized off the Ray cluster, not hard-coded.

Everything here is a per-stage sizing decision that must hold at both
test scale (4 CPUs) and cluster scale (hundreds of nodes): actor pools
must never reserve every CPU (that starves the read/write stages and
can deadlock a small node), and bucket counts must scale with available
parallelism.
"""

from __future__ import annotations

import ray


def vectorized_hash_partition(table, *, hash_cols, num_partitions):
    """Drop-in replacement for Ray Data's ``hash_partition``
    (ray/data/_internal/arrow_ops/transform_pyarrow.py), which assigns
    partitions with a per-row Python loop — ``hash(tuple(scalars))``
    row by row — the dominant cost of every keyed shuffle at millions
    of rows. This version is fully vectorized:

    - single integer key column: partition = value % num_partitions
      (identity for pre-computed bucket-id columns, so an explicitly
      balanced bucket assignment — skew.pack_key_buckets — maps 1:1
      onto shuffle partitions);
    - anything else: one ``pd.util.hash_pandas_object`` pass (C-backed
      row hash, null-safe, deterministic across processes — unlike
      Python's PYTHONHASHSEED-randomized str hash).
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    from ray.data._internal.arrow_ops.transform_pyarrow import (
        try_combine_chunked_columns,
    )

    if table.num_rows == 0:
        return {}
    if num_partitions == 1:
        return {0: table}
    proj = table.select(hash_cols)
    if len(hash_cols) == 1 \
            and pa.types.is_integer(proj.schema.field(0).type) \
            and proj.column(0).null_count == 0:
        vals = proj.column(0).to_numpy(zero_copy_only=False)
        parts = (vals.astype(np.int64, copy=False) % num_partitions)
    else:
        h = pd.util.hash_pandas_object(proj.to_pandas(), index=False)
        parts = (h.to_numpy(dtype=np.uint64) % np.uint64(num_partitions)
                 ).astype(np.int64)
    order = np.argsort(parts, kind="stable")
    bounds = np.searchsorted(parts[order], np.arange(num_partitions + 1))
    table = try_combine_chunked_columns(table)
    out = {}
    for p in range(num_partitions):
        lo, hi = int(bounds[p]), int(bounds[p + 1])
        if hi > lo:
            out[p] = table.take(pa.array(order[lo:hi]))
    return out


def _patch_hash_partition() -> None:
    from ray.data._internal.arrow_ops import transform_pyarrow
    from ray.data._internal.execution.operators import hash_shuffle
    transform_pyarrow.hash_partition = vectorized_hash_partition
    hash_shuffle.hash_partition = vectorized_hash_partition


def tune_data_context() -> None:
    """Engine-wide Ray Data tuning, idempotent.

    HASH_SHUFFLE for groupby/shuffle stages: measured ~19x faster than
    the default sort-based shuffle for our many-small-groups workloads
    (0.35s vs 6.5s for the 200k-row axis stage at 8 CPUs), and it is
    the strategy that matches our explicit hash-bucket design."""
    from ray.data.context import DataContext, ShuffleStrategy
    ctx = DataContext.get_current()
    cpus = cluster_cpus()
    if cpus >= 8:
        # Hash shuffle reserves 0.25 CPU x num_partitions by default
        # (200 partitions -> 50 CPUs!), which starves/deadlocks small
        # nodes. Cap partitions to 2x CPUs and shrink the per-partition
        # reservation so aggregators never crowd out producer stages.
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        ctx.max_hash_shuffle_aggregators = max(4, cpus // 2)
        ctx.default_hash_shuffle_parallelism = min(200, 2 * cpus)
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.05
    _patch_hash_partition()
    ctx.enable_progress_bars = False


def cluster_cpus() -> int:
    try:
        return int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        return 4


def pool_concurrency(frac: float = 0.5, cap: int | None = None
                     ) -> tuple[int, int]:
    """Actor-pool sizing as an AUTOSCALING (min=1, max) tuple.

    A fixed pool reserves max CPUs up-front; with several pools in one
    plan (tokenize + join + ...) that deadlocks a small node — the
    pools hold every CPU and the read stage never runs. min=1 lets the
    streaming executor grow pools only when CPUs are actually free."""
    cpus = cluster_cpus()
    c = max(1, min(int(cpus * frac), cpus - 1))
    if cap:
        c = min(c, cap)
    return (1, c)


def estimate_source_bytes(ds) -> int | None:
    """In-memory input size estimate WITHOUT executing the pipeline:
    exact for materialized datasets (block metadata), else from the
    SOURCE parquet file sizes (lineage metadata; ~4x compressed ->
    in-memory, and an overestimate when columns were pruned).
    Returns None when neither is knowable."""
    import os

    import ray.data
    try:
        if isinstance(ds, ray.data.dataset.MaterializedDataset):
            sz = ds.size_bytes()
            if sz:
                return int(sz)
        files = ds.input_files()
        if not files:
            return None
        raw = sum(os.path.getsize(f) for f in files if os.path.exists(f))
        return raw * 4  # parquet -> in-memory expansion, measured ~3-5x
    except Exception:
        return None


def default_num_buckets(floor: int = 8, ds=None) -> int:
    """Shuffle bucket count.

    Measured sweeps (round 2, LPT-balanced key buckets, 8M-row fused
    window shuffle at 32 cpus): nb32 = cpus is the optimum — 2.6s vs
    4.3s at nb64 = 2x cpus and 4.9s at nb16; per-partition fixed cost
    (~100-150 ms: aggregator submit + finalize + task setup) dominates
    past ~cpus partitions once buckets are balanced. Small jobs:
    a 100k-row job at 64 partitions pays ~2 s of pure setup (measured:
    nb8 2.0s vs nb64 4.0s). When the input size is knowable (exact for
    materialized inputs, else source file metadata), size buckets to
    ~8 MB of in-memory input each, clamped to [4, cpus]; unknown
    sizes keep the cpu-based default.

    At 100 TB raise this so one bucket stays under ~1-2 GB (buckets ~
    data_bytes / 1 GB) — pass num_buckets explicitly in that regime."""
    from ray.data.context import DataContext, ShuffleStrategy
    cpus = cluster_cpus()
    if DataContext.get_current().shuffle_strategy == \
            ShuffleStrategy.HASH_SHUFFLE:
        cap = max(floor, cpus)
        if ds is not None:
            est = estimate_source_bytes(ds)
            if est is not None:
                return int(max(4, min(cap, est // (8 << 20))))
        return cap
    return max(floor, cpus // 2)


def shuffle_partitions(n: int) -> int:
    """Cap an explicit exchange partition count at the context's
    hash-shuffle parallelism: aggregator-actor reservations beyond
    ~2x CPUs starve producer stages on small nodes (observed: a
    64-partition anti-join deadlocking an 8-cpu node)."""
    return max(1, min(int(n), 2 * cluster_cpus()))
