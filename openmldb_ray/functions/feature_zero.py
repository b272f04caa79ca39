"""FeatureZero string ops (reference:
hybridse/src/udf/default_defs/feature_zero_def.cc, 668 LoC):

scalar (one string -> list<string> / string):
- ``fz_split(s, d)``: split by delimiter; NULL input -> empty list.
- ``fz_split_by_key(s, d, kvd)``: split by d, then each segment as a
  kv pair by kvd; emit the KEYS. Null/illegal (no kvd) segments are
  skipped (UpdateSplitByKey, feature_zero_def.cc:227-270).
- ``fz_split_by_value(s, d, kvd)``: same, emit the VALUES.
- ``fz_join(items, d)``: join a list by delimiter, NULLs skipped
  (doc example feature_zero_def.cc:643-645).

window UDAF forms (frame of strings -> flattened list) are window
functions "fz_window_split", "fz_window_split_by_key",
"fz_window_split_by_value" and the per-frame string join "fz_join" in
the window kernel (Agg(..., params=(delim[, kv_delim]))).
"""

from __future__ import annotations

import pyarrow as pa


def fz_split(s: str | None, d: str) -> list[str]:
    if s is None or d == "":
        return []
    return s.split(d)


def fz_split_by_key(s: str | None, d: str, kvd: str) -> list[str]:
    if s is None or d == "" or kvd == "":
        return []
    out = []
    for seg in s.split(d):
        if kvd in seg:
            k = seg.split(kvd, 1)[0]
            if k:
                out.append(k)
    return out


def fz_split_by_value(s: str | None, d: str, kvd: str) -> list[str]:
    if s is None or d == "" or kvd == "":
        return []
    out = []
    for seg in s.split(d):
        if kvd in seg:
            v = seg.split(kvd, 1)[1]
            if v:
                out.append(v)
    return out


def fz_join(items, d: str) -> str:
    if items is None:
        return ""
    return d.join(str(x) for x in items if x is not None)


def fz_split_column(arr: pa.ChunkedArray | pa.Array, d: str) -> pa.Array:
    """Vectorized column form: string column -> list<string> column."""
    vals = arr.to_pylist() if not isinstance(arr, list) else arr
    return pa.array([fz_split(s, d) for s in vals],
                    type=pa.list_(pa.string()))
