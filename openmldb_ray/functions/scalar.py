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


def replace(a, pat, rep=""):
    """replace(str, search[, target]) — 2-arg form removes the search
    substring; NULL search/target/input -> NULL (udfs_8h.md replace,
    query/udf_query.yaml udf_replace)."""
    if isinstance(pat, pa.Scalar):
        pat = pat.as_py()
    if isinstance(rep, pa.Scalar):
        rep = rep.as_py()
    if a is None:
        return None
    if not hasattr(a, "type"):  # scalar string input
        if pat is None or rep is None:
            return None
        return str(a).replace(pat, rep)
    if pat is None or rep is None:
        return pa.nulls(len(a), pa.string())
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


# ---- remaining documented surface (udfs_8h.md) ----
character_length = pc.utf8_length
isnull = is_null
ifnull = if_null


def add(a, b):
    """udfs_8h.md add: a + b (NULL-propagating)."""
    return pc.add(a, b)


def inc(a):
    return pc.add(a, 1)


def identity(a):
    return a


def char_(a):
    """Integer -> the character of its (ascii) code, like SQL CHAR().

    Vectorized: codes -> uint8 byte buffer -> 1-char strings."""
    import numpy as np
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    codes = pc.cast(a, pa.int64()).to_numpy(zero_copy_only=False)
    mask = pa.array(np.isnan(codes) if codes.dtype.kind == "f"
                    else np.zeros(len(codes), bool))
    by = np.mod(codes, 256).astype(np.uint8)
    off = np.arange(len(by) + 1, dtype=np.int32)
    arr = pa.StringArray.from_buffers(
        len(by), pa.py_buffer(off.tobytes()), pa.py_buffer(by.tobytes()))
    return pc.if_else(mask, pa.nulls(len(by), pa.string()), arr)


def maximum(a, b):
    """Element-wise max of two columns (udfs_8h.md maximum)."""
    return pc.max_element_wise(a, b)


def minimum(a, b):
    return pc.min_element_wise(a, b)


# reference-style named casts (udfs_8h.md bool/int16/int32/int64/...)
def bool_(a):
    return pc.cast(a, pa.bool_())


def cast_int16(a):
    return pc.cast(a, pa.int16())


int16 = cast_int16
int32 = cast_int32
int64 = cast_int64
float_ = cast_float
double = cast_double
string = cast_string
timestamp = cast_timestamp


def date(a):
    """-> date32 (reference date() cast)."""
    t = getattr(a, "type", None)
    if t is not None and pa.types.is_timestamp(t):
        return pc.cast(a, pa.date32())
    return pc.cast(pc.cast(a, pa.timestamp("us")), pa.date32())


def make_tuple(*arrs):
    """-> struct array of the inputs (udfs_8h.md make_tuple)."""
    return pa.StructArray.from_arrays(
        [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
         for a in arrs],
        names=[f"f{i}" for i in range(len(arrs))])


REGISTRY: dict[str, object] = {
    k: v for k, v in globals().items()
    if callable(v) and not k.startswith("_")
}
# canonical names for the *_ python-keyword dodges
REGISTRY.update({"abs": abs_, "round": round_, "pow": pow_,
                 "char": char_, "bool": bool_, "float": float_})


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
