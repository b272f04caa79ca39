"""Scalar function registry — the OpenMLDB built-in surface mapped to
pyarrow.compute kernels (reference inventory:
hybridse/src/udf/default_udf_library.cc — String :466, Math :974,
Trig :1379, Logical :1585, Casts :1661, Time/Date :1822; 121 entries
documented in docs/.../udfs_8h.md).

Usage::

    from openmldb_ray.functions import scalar as F
    ds = project(ds, keep=["id"], exprs={
        "up": (F.upper, "name"),
        "rev2": (lambda t: pc.multiply(t["a"], t["b"]),),   # table-level
    })

Every function takes/returns Arrow arrays — zero-copy, vectorized, no
Python row loops. User extension == registering any callable here
(the analog of the reference's external-UDF .so registry,
SparkPlanner.scala:344-369).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# ---- string (default_udf_library.cc:466) ----
upper = ucase = pc.utf8_upper
lower = lcase = pc.utf8_lower
reverse = pc.utf8_reverse
char_length = pc.utf8_length


def concat(*arrs):
    return pc.binary_join_element_wise(*[_s(a) for a in arrs], "")


def concat_ws(sep, *arrs):
    return pc.binary_join_element_wise(*[_s(a) for a in arrs], sep)


def _s(a):
    return pc.cast(a, pa.string()) if not pa.types.is_string(
        getattr(a, "type", pa.string())) else a


def substring(a, start, length=None):
    """1-based start, like SQL SUBSTRING."""
    if length is None:
        return pc.utf8_slice_codeunits(a, start - 1)
    return pc.utf8_slice_codeunits(a, start - 1, start - 1 + length)


substr = substring


def replace(a, pat, rep):
    return pc.replace_substring(a, pattern=pat, replacement=rep)


def strcmp(a, b):
    lt = pc.less(a, b)
    gt = pc.greater(a, b)
    return pc.if_else(lt, -1, pc.if_else(gt, 1, 0))


def like_match(a, pattern):
    return pc.match_like(a, pattern)


def ilike_match(a, pattern):
    return pc.match_like(a, pattern, ignore_case=True)


# ---- math (:974) / trig (:1379) ----
abs_ = pc.abs
ceil = pc.ceil
floor = pc.floor
exp = pc.exp
sqrt = pc.sqrt
ln = pc.ln
log2 = pc.log2
log10 = pc.log10
round_ = pc.round
pow_ = pc.power
sin, cos, tan = pc.sin, pc.cos, pc.tan
acos, asin, atan, atan2 = pc.acos, pc.asin, pc.atan, pc.atan2


def cot(a):
    return pc.divide(pc.cos(a), pc.sin(a))


def truncate(a):
    return pc.trunc(a)


def degrees(a):
    import math
    return pc.multiply(pc.cast(a, pa.float64()), 180.0 / math.pi)


def radians(a):
    import math
    return pc.multiply(pc.cast(a, pa.float64()), math.pi / 180.0)


# ---- logical (:1585) ----
def is_null(a):
    return pc.is_null(a)


def if_null(a, default):
    return pc.coalesce(a, default)


nvl = if_null


def nvl2(a, v_notnull, v_null):
    return pc.if_else(pc.is_valid(a), v_notnull, v_null)


# ---- casts (:1661) ----
def cast_int32(a):
    return pc.cast(a, pa.int32())


def cast_int64(a):
    return pc.cast(a, pa.int64())


def cast_float(a):
    return pc.cast(a, pa.float32())


def cast_double(a):
    return pc.cast(a, pa.float64())


def cast_string(a):
    return pc.cast(a, pa.string())


def cast_timestamp(a):
    return pc.cast(a, pa.timestamp("us"))


# ---- time/date (:1822) ----
year = pc.year
month = pc.month
day = dayofmonth = pc.day
dayofweek = pc.day_of_week
dayofyear = pc.day_of_year
weekofyear = week = pc.iso_week
hour = pc.hour
minute = pc.minute
second = pc.second


def date_format(a, fmt):
    return pc.strftime(a, format=fmt)


REGISTRY: dict[str, object] = {
    k: v for k, v in globals().items()
    if callable(v) and not k.startswith("_")
}


def register(name: str, fn):
    """User extension hook: add a custom scalar function."""
    REGISTRY[name] = fn


def project(ds: ray.data.Dataset, exprs: dict, keep: list[str] | None = None
            ) -> ray.data.Dataset:
    """Vectorized projection: ``exprs[name]`` is either
    ``(fn, col, *extra_args)`` applying fn to one column, or
    ``(fn,)`` where fn takes the whole pa.Table."""
    def fn(t: pa.Table) -> pa.Table:
        cols, names = [], []
        for c in (keep or []):
            names.append(c)
            cols.append(t[c])
        for name, spec in exprs.items():
            f = spec[0]
            if len(spec) == 1:
                out = f(t)
            else:
                out = f(t[spec[1]], *spec[2:])
            names.append(name)
            cols.append(out)
        return pa.table(cols, names=names)
    return ds.map_batches(fn, batch_format="pyarrow")
