"""Request-mode execution — the online single-row serving semantics.

Reference: a deployed procedure serves one request row by unioning it
as the NEWEST element of its key's indexed history window and running
the same compiled window project (RequestRunSession::Run,
hybridse/src/vm/engine.cc:442-447; RequestUnionTableHandler,
hybridse/include/vm/mem_catalog.h:740-766). Online/offline consistency
holds by construction because both paths share one physical plan.

Here the same guarantee comes from sharing the ONE window kernel
(window.kernel.eval_aggs): ``request_features`` evaluates a single
request row against its entity history, and
``test_request_mode.py`` asserts it matches the batch ``window_agg``
output for that row bit-for-bit.

This is a driver-side / per-actor helper (no Ray pipeline): at serving
time the history lives in a feature store partition, not a Dataset.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np
import pyarrow as pa

from openmldb_ray.io import column_to_float, order_to_int64
from openmldb_ray.window.kernel import eval_aggs
from openmldb_ray.window.spec import Agg, WindowSpec


def request_features(
    request_row: Mapping[str, object],
    history: pa.Table,
    spec: WindowSpec,
    aggs: Sequence[Agg],
) -> dict[str, object]:
    """Evaluate ``aggs`` for one request row against its history.

    ``history`` must contain only rows of the request row's entity
    (any order); rows with ts > request ts are ignored (they are the
    future — zero temporal leakage), ties sort before the request row
    (the request row is buffered last, mem_catalog.h:740-766).
    """
    aggs = list(aggs)
    req_ts = request_row[spec.order_by]
    if req_ts is None or int(req_ts) < 0:
        raise ValueError("request row order key must be a non-negative int")
    req_ts = int(req_ts)

    hts = order_to_int64(history[spec.order_by]) if history.num_rows else \
        np.empty(0, dtype=np.int64)
    keep = (hts >= 0) & (hts <= req_ts)
    order = np.argsort(hts[keep], kind="stable")

    value_cols = sorted({a.col for a in aggs if a.col}
                        | {a.where for a in aggs if a.where}
                        | {a.cate for a in aggs if a.cate})
    vals: dict[str, np.ndarray] = {}
    for c in value_cols:
        hv = column_to_float(history[c])[keep][order]
        rv = request_row.get(c)
        if isinstance(rv, (int, float)) or rv is None:
            rv = np.nan if rv is None else float(rv)
            vals[c] = np.concatenate([hv, [rv]])
        else:
            vals[c] = np.concatenate(
                [hv.astype(object), np.array([rv], dtype=object)])
    ts = np.concatenate([hts[keep][order], [req_ts]])

    res = eval_aggs(ts, vals, aggs, spec)
    return {a.name: res[a.name][-1] for a in aggs}
