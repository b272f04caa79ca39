"""Vectorized expression evaluation: AST -> pyarrow.compute over a
pa.Table. Every node maps to an Arrow kernel (or a numpy fallback for
the few kernels Arrow lacks); no Python row loops.

SQL semantics notes:
- AND/OR use Kleene (three-valued NULL) logic;
- int / int division returns DOUBLE (DuckDB/OpenMLDB behavior);
- round() rounds half away from zero (DuckDB/OpenMLDB, not banker's);
- dayofweek follows DuckDB (Sunday=0).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from openmldb_ray.sql.ast import (Between, BinOp, Case, Cast, Col, Func,
                                  InList, Interval, IsNull, Like, Lit,
                                  Star, UnOp)

_CAST_TYPES = {
    "BIGINT": pa.int64(), "INT8": pa.int64(), "LONG": pa.int64(),
    "INT64": pa.int64(),
    "INTEGER": pa.int32(), "INT": pa.int32(), "INT4": pa.int32(),
    "INT32": pa.int32(),
    "SMALLINT": pa.int16(), "INT2": pa.int16(), "INT16": pa.int16(),
    "DOUBLE": pa.float64(), "FLOAT8": pa.float64(), "REAL": pa.float32(),
    "FLOAT": pa.float32(),
    "VARCHAR": pa.string(), "STRING": pa.string(), "TEXT": pa.string(),
    "TIMESTAMP": pa.timestamp("us"), "DATE": pa.date32(),
    "BOOLEAN": pa.bool_(), "BOOL": pa.bool_(),
}


# The reference parses timestamp(str) wall-clock strings in the server
# timezone; its conformance cases were authored at UTC+8
# (cases/function/window/test_window_union.yaml 14-3: '2020-05-29
# 15:56:33' == 1590738993000 ms). OpenMLDB-dialect TIMESTAMP casts
# yield epoch-ms int64 (the reference's storage type).
OPENMLDB_TZ_OFFSET_MS = 8 * 3_600_000


def _ts_ms(v):
    """OpenMLDB-dialect timestamp(): -> epoch milliseconds (int64)."""
    if isinstance(v, str):
        parsed = pc.strptime(pa.array([v]), format="%Y-%m-%d %H:%M:%S",
                             unit="ms", error_is_null=True)
        return pa.scalar(parsed.cast(pa.int64())[0].as_py()
                         - OPENMLDB_TZ_OFFSET_MS, pa.int64())
    if isinstance(v, (int, np.integer)):
        return pa.scalar(int(v), pa.int64())
    if pa.types.is_string(v.type) or pa.types.is_large_string(v.type):
        parsed = pc.strptime(v, format="%Y-%m-%d %H:%M:%S", unit="ms",
                             error_is_null=True)
        return pc.subtract(parsed.cast(pa.int64()),
                           pa.scalar(OPENMLDB_TZ_OFFSET_MS, pa.int64()))
    if pa.types.is_timestamp(v.type):
        return pc.cast(v, pa.timestamp("ms")).cast(pa.int64())
    return pc.cast(v, pa.int64())


def _num(a):
    """Promote to float64 when not already floating (SQL division)."""
    t = getattr(a, "type", None)
    if t is not None and not pa.types.is_floating(t):
        return pc.cast(a, pa.float64())
    if isinstance(a, (int, np.integer)):
        return float(a)
    return a


def _mod(a, b):
    an = a.to_numpy(zero_copy_only=False) if hasattr(a, "to_numpy") else a
    bn = b.to_numpy(zero_copy_only=False) if hasattr(b, "to_numpy") else b
    return pa.array(np.mod(an, bn))


def _dayofweek(a):
    dw = pc.day_of_week(a)  # Monday=0
    return pc.cast(_mod(pc.add(dw, 1), 7), pa.int64())


def _round_sql(x, n=0):
    return pc.round(x, ndigits=int(n), round_mode="half_towards_infinity")


def _strcat(a, b):
    def s(x):
        if isinstance(x, str):
            return x
        t = getattr(x, "type", None)
        if t is not None and not (pa.types.is_string(t)
                                  or pa.types.is_large_string(t)):
            return pc.cast(x, pa.string())
        return x
    return pc.binary_join_element_wise(s(a), s(b), "")


# SQL-name -> callable over evaluated args (+ extra registry fallback)
def _sql_funcs():
    from openmldb_ray.functions import scalar as F
    return {
        "upper": F.upper, "ucase": F.upper, "lower": F.lower,
        "lcase": F.lower, "reverse": F.reverse,
        "length": F.char_length, "char_length": F.char_length,
        "len": F.char_length,
        "substring": lambda a, s, ln=None: F.substring(
            a, int(_scalar(s)), None if ln is None else int(_scalar(ln))),
        "substr": lambda a, s, ln=None: F.substring(
            a, int(_scalar(s)), None if ln is None else int(_scalar(ln))),
        "abs": pc.abs, "ceil": pc.ceil, "ceiling": pc.ceil,
        "floor": pc.floor, "exp": pc.exp, "sqrt": pc.sqrt,
        "ln": pc.ln, "log": pc.ln, "log2": pc.log2, "log10": pc.log10,
        "round": _round_sql,
        "pow": lambda a, b: pc.power(_num(a), _num(b)),
        "power": lambda a, b: pc.power(_num(a), _num(b)),
        "sin": pc.sin, "cos": pc.cos, "tan": pc.tan,
        "coalesce": pc.coalesce, "ifnull": pc.coalesce, "nvl": pc.coalesce,
        "greatest": lambda *a: pc.max_element_wise(*a),
        "least": lambda *a: pc.min_element_wise(*a),
        "trim": pc.utf8_trim_whitespace,
        "ltrim": pc.utf8_ltrim_whitespace,
        "rtrim": pc.utf8_rtrim_whitespace,
        "lpad": lambda a, n, p: pc.utf8_lpad(a, int(_scalar(n)),
                                             str(_scalar(p))),
        "rpad": lambda a, n, p: pc.utf8_rpad(a, int(_scalar(n)),
                                             str(_scalar(p))),
        "replace": lambda a, x, y: pc.replace_substring(
            a, pattern=str(_scalar(x)), replacement=str(_scalar(y))),
        "concat": F.concat,
        "concat_ws": lambda s, *a: F.concat_ws(str(_scalar(s)), *a),
        "year": lambda a: pc.cast(pc.year(a), pa.int64()),
        "month": lambda a: pc.cast(pc.month(a), pa.int64()),
        "day": lambda a: pc.cast(pc.day(a), pa.int64()),
        "dayofmonth": lambda a: pc.cast(pc.day(a), pa.int64()),
        "hour": lambda a: pc.cast(pc.hour(a), pa.int64()),
        "minute": lambda a: pc.cast(pc.minute(a), pa.int64()),
        "second": lambda a: pc.cast(pc.second(a), pa.int64()),
        "dayofweek": _dayofweek,
        "weekofyear": lambda a: pc.cast(pc.iso_week(a), pa.int64()),
        "dayofyear": lambda a: pc.cast(pc.day_of_year(a), pa.int64()),
    }


def _scalar(x):
    if isinstance(x, pa.Scalar):
        return x.as_py()
    return x


def eval_expr(e, tbl: pa.Table):
    """Evaluate an expression over a table -> Arrow array or scalar."""
    if isinstance(e, Lit):
        return e.val
    if isinstance(e, Interval):
        return e.micros
    if isinstance(e, Col):
        if e.name not in tbl.column_names:
            raise KeyError(f"unknown column {e.name!r} "
                           f"(have {tbl.column_names})")
        return tbl[e.name]
    if isinstance(e, Star):
        raise ValueError("* outside count(*)")
    if isinstance(e, UnOp):
        v = eval_expr(e.e, tbl)
        if e.op == "NOT":
            return pc.invert(v)
        return pc.negate(v) if hasattr(v, "type") else -v
    if isinstance(e, BinOp):
        l = eval_expr(e.l, tbl)
        r = eval_expr(e.r, tbl)
        op = e.op
        if op == "AND":
            return pc.and_kleene(_b(l, tbl), _b(r, tbl))
        if op == "OR":
            return pc.or_kleene(_b(l, tbl), _b(r, tbl))
        if op == "+":
            return pc.add(l, r) if _anyarr(l, r) else l + r
        if op == "-":
            return pc.subtract(l, r) if _anyarr(l, r) else l - r
        if op == "*":
            return pc.multiply(l, r) if _anyarr(l, r) else l * r
        if op == "/":
            if not _anyarr(l, r):
                return l / r
            return pc.divide(_num(l), _num(r))
        if op == "%":
            return _mod(l, r)
        if op == "||":
            return _strcat(l, r)
        cmps = {"=": pc.equal, "!=": pc.not_equal, "<": pc.less,
                "<=": pc.less_equal, ">": pc.greater,
                ">=": pc.greater_equal}
        if op in cmps:
            l, r = _align_ts(l, r)
            return cmps[op](l, r)
        raise ValueError(f"unknown operator {op}")
    if isinstance(e, IsNull):
        v = eval_expr(e.e, tbl)
        out = pc.is_null(v)
        return pc.invert(out) if e.negated else out
    if isinstance(e, Like):
        v = eval_expr(e.e, tbl)
        out = pc.match_like(v, e.pattern, ignore_case=e.ignore_case)
        return pc.invert(out) if e.negated else out
    if isinstance(e, Between):
        v = eval_expr(e.e, tbl)
        lo = eval_expr(e.lo, tbl)
        hi = eval_expr(e.hi, tbl)
        out = pc.and_(pc.greater_equal(v, lo), pc.less_equal(v, hi))
        return pc.invert(out) if e.negated else out
    if isinstance(e, InList):
        v = eval_expr(e.e, tbl)
        items = [eval_expr(x, tbl) for x in e.items]
        out = pc.is_in(v, value_set=pa.array(items))
        return pc.invert(out) if e.negated else out
    if isinstance(e, Case):
        n = tbl.num_rows
        result = None
        default = (eval_expr(e.default, tbl) if e.default is not None
                   else None)
        for cond, val in reversed(e.whens):
            c = _b(eval_expr(cond, tbl), tbl)
            v = eval_expr(val, tbl)
            if result is None:
                if default is None:
                    t = (v.type if hasattr(v, "type")
                         else pa.array([v]).type)
                    result = pa.nulls(n, t)
                else:
                    result = default
            result = pc.if_else(c, v, result)
        return result
    if isinstance(e, Cast):
        v = eval_expr(e.e, tbl)
        if e.type == "TIMESTAMP_MS":
            return _ts_ms(v)
        ty = _CAST_TYPES.get(e.type)
        if ty is None:
            raise ValueError(f"unsupported cast type {e.type}")
        if isinstance(v, str) and pa.types.is_timestamp(ty):
            return pa.scalar(np.datetime64(v, "us"), ty)
        if isinstance(v, str) and ty == pa.date32():
            import datetime as _dt
            return pa.scalar(_dt.date.fromisoformat(v), ty)
        if not hasattr(v, "type"):
            return pa.scalar(v, ty)
        if pa.types.is_floating(v.type) and pa.types.is_integer(ty):
            # reference int(float) truncates toward zero (int(20.1)=20)
            return pc.cast(pc.trunc(v), ty, safe=False)
        if pa.types.is_string(v.type) and pa.types.is_timestamp(ty):
            return pc.strptime(v, format="%Y-%m-%d %H:%M:%S", unit="us",
                               error_is_null=True)
        return pc.cast(v, ty)
    if isinstance(e, Func):
        funcs = _sql_funcs()
        args = [eval_expr(a, tbl) for a in e.args]
        if e.name in funcs:
            return funcs[e.name](*args)
        from openmldb_ray.functions.scalar import REGISTRY
        if e.name in REGISTRY:
            return REGISTRY[e.name](*args)
        raise ValueError(f"unknown function {e.name}")
    raise ValueError(f"cannot evaluate {type(e).__name__} here")


def _anyarr(*xs):
    return any(hasattr(x, "type") or isinstance(x, (pa.Array,
                                                    pa.ChunkedArray))
               for x in xs)


def _b(v, tbl):
    """Coerce to a boolean array (broadcast python bools)."""
    if isinstance(v, bool):
        return pa.array(np.full(tbl.num_rows, v))
    return v


def _align_ts(l, r):
    """Comparing timestamp/duration values with int/interval micros:
    cast the temporal side to int64 us."""
    def is_temporal(t):
        return t is not None and (pa.types.is_timestamp(t)
                                  or pa.types.is_duration(t))
    lt = getattr(l, "type", None)
    rt = getattr(r, "type", None)
    if is_temporal(lt) and isinstance(r, (int, float)):
        return pc.cast(l, pa.int64()), r
    if is_temporal(rt) and isinstance(l, (int, float)):
        return l, pc.cast(r, pa.int64())
    return l, r


def const_eval(e) -> object:
    """Evaluate a constant expression (frame bounds, limits)."""
    if isinstance(e, Lit):
        return e.val
    if isinstance(e, Interval):
        return e.micros
    if isinstance(e, UnOp) and e.op == "-":
        return -const_eval(e.e)
    if isinstance(e, BinOp):
        l, r = const_eval(e.l), const_eval(e.r)
        return {"+": l + r, "-": l - r, "*": l * r, "/": l / r}[e.op]
    raise ValueError(f"frame bound must be constant, got {e}")


def collect(e, kind) -> list:
    """All nodes of ``kind`` inside expression tree ``e``."""
    out = []

    def walk(x):
        if isinstance(x, kind):
            out.append(x)
        if hasattr(x, "__dataclass_fields__"):
            for f in x.__dataclass_fields__:
                walk_any(getattr(x, f))

    def walk_any(v):
        if isinstance(v, (list, tuple)):
            for it in v:
                walk_any(it)
        elif isinstance(v, dict):
            for it in v.values():
                walk_any(it)
        else:
            walk(v)
    walk(e)
    return out
