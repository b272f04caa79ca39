"""Engine tuning knobs sized off the Ray cluster, not hard-coded.

Everything here is a per-stage sizing decision that must hold at both
test scale (4 CPUs) and cluster scale (hundreds of nodes): actor pools
must never reserve every CPU (that starves the read/write stages and
can deadlock a small node), and bucket counts must scale with available
parallelism.
"""

from __future__ import annotations

import ray


def cluster_cpus() -> int:
    try:
        return int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        return 4


def pool_concurrency(frac: float = 0.5, cap: int | None = None) -> int:
    """Actor-pool size: a fraction of the cluster CPUs, always leaving
    at least one CPU free for the producer/consumer stages."""
    cpus = cluster_cpus()
    c = max(1, min(int(cpus * frac), cpus - 1))
    return min(c, cap) if cap else c


def default_num_buckets(multiplier: int = 4, floor: int = 16) -> int:
    """Shuffle bucket count: enough buckets that (a) every CPU has work
    and (b) one bucket stays well under a worker's heap at target block
    sizes. At 100 TB this is the knob to raise (buckets ~ data_size /
    1-2 GB), not the algorithm to change."""
    return max(floor, cluster_cpus() * multiplier)
