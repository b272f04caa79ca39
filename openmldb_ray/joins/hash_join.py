"""Explicit partitioned hash join (the portable Ray Data join pattern):
bucket both sides by key hash, groupby bucket, pandas merge per bucket.

Exists alongside ``Dataset.join`` because the built-in hash join
rejects nested non-key columns (e.g. ``tokens: list<int32>``) — this
path carries any Arrow-to-pandas-representable payload. Used by the
flagship to re-attach token arrays to window features by doc_id
(SURVEY.md §7.4: tokens are projected OUT of the shuffle and re-joined
here — the decisive bytes-moved optimization).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from openmldb_ray.io import hash_columns

_SIDE = "__hj_side__"
_BUCKET = "__hj_bucket__"


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str | Sequence[str],
    *,
    right_on: str | Sequence[str] | None = None,
    how: str = "inner",
    num_buckets: int = 64,
    suffix: str = "_r",
) -> ray.data.Dataset:
    on = [on] if isinstance(on, str) else list(on)
    right_on = on if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on))
    lcols = left.schema().names
    rcols = right.schema().names

    def tag(keys, side):
        def fn(b: pa.Table) -> pa.Table:
            h = hash_columns(b, keys, num_buckets)
            return b.append_column(_BUCKET, pa.array(h)).append_column(
                _SIDE, pa.array(np.full(b.num_rows, side, dtype=np.int8)))
        return fn

    tagged = left.map_batches(tag(on, 1), batch_format="pyarrow").union(
        right.map_batches(tag(right_on, 0), batch_format="pyarrow"))

    ren = {c: (c + suffix if c in lcols and c not in right_on else c)
           for c in rcols}
    out_cols = list(lcols) + [ren[c] for c in rcols if c not in right_on]

    class BucketMerge:
        __name__ = "bucket_hash_join"

        def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
            lg = g[g[_SIDE] == 1][lcols]
            rg = g[g[_SIDE] == 0][rcols].rename(columns=ren)
            merged = lg.merge(rg, how=how, left_on=on,
                              right_on=[ren[c] for c in right_on])
            return merged[[c for c in out_cols if c in merged.columns]]

    return tagged.groupby(_BUCKET).map_groups(BucketMerge(),
                                              batch_format="pandas")
