"""openmldb_ray — a from-scratch, Ray-Data-native feature-engineering engine.

Reimplements the query semantics of OpenMLDB's offline SQL engine
(PARTITION BY entity ORDER BY ts windows with ROWS / ROWS_RANGE frames,
MAXSIZE / EXCLUDE CURRENT_TIME / INSTANCE_NOT_IN_WINDOW / WINDOW UNION,
point-in-time LAST JOIN, and the aggregate/analytic function family) as
idiomatic ``ray.data.Dataset`` pipelines: Parquet in/out, explicit hash
shuffles with skew salting, per-partition sorting, and ``map_batches``
over zero-copy Arrow batches.

Nothing here is a port of reference code; the reference
(/root/reference, OpenMLDB) is cited by file:line in docstrings purely
as a semantics spec.
"""

from openmldb_ray.window.spec import WindowSpec, Agg
from openmldb_ray.window.runner import window_agg
from openmldb_ray.joins.last_join import last_join

# Replace Ray Data's per-row-Python hash partitioner with the
# vectorized one at import time: shuffle-write tasks unpickle our
# map closures (importing this package in every worker that runs an
# openmldb_ray stage), so the patch lands wherever our shuffles run.
try:
    from openmldb_ray.context import _patch_hash_partition
    _patch_hash_partition()
except Exception:  # pragma: no cover - ray internals moved
    pass

__all__ = ["WindowSpec", "Agg", "window_agg", "last_join"]
__version__ = "0.1.0"
