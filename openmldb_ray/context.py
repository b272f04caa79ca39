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


def default_num_buckets(multiplier: int = 4, floor: int = 16) -> int:
    """Shuffle bucket count: enough buckets that (a) every CPU has work
    and (b) one bucket stays well under a worker's heap at target block
    sizes. At 100 TB this is the knob to raise (buckets ~ data_size /
    1-2 GB), not the algorithm to change."""
    return max(floor, cluster_cpus() * multiplier)
