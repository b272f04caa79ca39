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

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from openmldb_ray.sql.ast import (Between, BinOp, Case, Cast, Col, Func,
                                  InList, Interval, IsNull, Like, Lit,
                                  Param, Star, UnOp)

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


def _parse_wallclock_ms(s: str):
    """Tolerant wall-clock string -> epoch ms at the reference tz
    (accepts unpadded fields and date-only forms)."""
    import datetime as _dt
    for f in ("%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d"):
        try:
            d = _dt.datetime.strptime(s, f)
        except ValueError:
            continue
        ep = d.replace(tzinfo=_dt.timezone.utc).timestamp()
        return int(ep * 1000) - OPENMLDB_TZ_OFFSET_MS
    return None


def _ts_ms(v, strict_str: bool = False):
    """OpenMLDB timestamp conversion -> timestamp('ms') (the
    reference's storage unit). Integers are epoch ms (negative ->
    NULL), strings parse as wall clock at the reference tz; CAST
    additionally accepts digit strings as epoch ms, the timestamp()
    function (``strict_str``) does not (test_type.yaml 2 vs 21)."""
    TS = pa.timestamp("ms")
    if v is None:
        return pa.scalar(None, TS)
    if isinstance(v, str):
        ms = _parse_wallclock_ms(v)
        if ms is None and not strict_str and v.lstrip("+").isdigit():
            ms = int(v)
        return pa.scalar(ms, TS)
    if isinstance(v, (int, np.integer)):
        return pa.scalar(int(v) if v >= 0 else None, TS)
    if pa.types.is_string(v.type) or pa.types.is_large_string(v.type):
        p1 = pc.strptime(v, format="%Y-%m-%d %H:%M:%S", unit="ms",
                         error_is_null=True)
        p2 = pc.strptime(v, format="%Y-%m-%d", unit="ms",
                         error_is_null=True)
        wall = pc.subtract(pc.coalesce(p1, p2).cast(pa.int64()),
                           pa.scalar(OPENMLDB_TZ_OFFSET_MS, pa.int64()))
        if not strict_str:
            digits = pc.if_else(
                pc.match_substring_regex(v, r"^\+?\d+$"),
                v, pa.scalar(None, v.type if not isinstance(
                    v, pa.ChunkedArray) else pa.string()))
            import pandas as pd
            darr = pd.to_numeric(pd.Series(
                digits.to_pandas()), errors="coerce")
            num = pa.array(darr.to_numpy(np.float64, na_value=np.nan),
                           from_pandas=True).cast(pa.int64(),
                                                  safe=False)
            wall = pc.coalesce(wall, num)
        return pc.cast(wall, TS)
    if pa.types.is_timestamp(v.type):
        return pc.cast(_ts_epoch_ms(v), TS)  # unit-safe (us truncates)
    if pa.types.is_date(v.type):
        # local midnight of that date -> epoch ms at the reference tz
        ts = pc.cast(pc.cast(v, pa.timestamp("ms")), pa.int64())
        ms = pc.subtract(ts, pa.scalar(OPENMLDB_TZ_OFFSET_MS,
                                       pa.int64()))
        return pc.cast(ms, TS)
    if pa.types.is_boolean(v.type):
        return pc.cast(pc.cast(v, pa.int64()), TS)  # false=0, true=1
    if pa.types.is_floating(v.type):
        v = pc.cast(pc.trunc(v), pa.int64(), safe=False)
    ms = pc.cast(v, pa.int64())
    # negative epochs are invalid timestamps in the reference
    # (test_type.yaml id 21: timestamp(-1) -> NULL)
    ms = pc.if_else(pc.greater_equal(ms, 0), ms,
                    pa.scalar(None, pa.int64()))
    return pc.cast(ms, TS)


def _kind(v) -> str:
    """Operand kind for the reference's arithmetic type rules."""
    t = getattr(v, "type", None)
    if t is not None:
        if pa.types.is_timestamp(t) or pa.types.is_duration(t):
            return "ts"
        if pa.types.is_date(t):
            return "date"
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return "str"
        return "num"
    if isinstance(v, str):
        return "str"
    return "num"  # numbers, bools, NULL literals


def _arith_check(op: str, l, r) -> None:
    """Reference arithmetic type rules (expression/test_arithmetic.yaml
    ids 5-14): date and string operands are always invalid; timestamps
    are valid only on + (either side, incl. ts+ts) and as the LEFT
    side of - with a non-timestamp right side; %, *, / reject
    timestamps entirely."""
    lk, rk = _kind(l), _kind(r)
    if "date" in (lk, rk) or "str" in (lk, rk):
        raise ValueError(
            f"operator {op} is not defined for {lk}/{rk} operands")
    if "ts" not in (lk, rk):
        return
    if op == "+":
        return
    if op == "-" and lk == "ts" and rk != "ts":
        return
    raise ValueError(
        f"operator {op} is not defined for timestamp operands here")


def _ts_arith(op: str, l, r):
    """+/- with a timestamp side: compute in the timestamp's native
    integer unit, return the same timestamp type."""
    lt = getattr(l, "type", None)
    rt = getattr(r, "type", None)
    out_t = lt if lt is not None and pa.types.is_timestamp(lt) else rt

    def as_int(v, t):
        if t is not None and pa.types.is_timestamp(t):
            return pc.cast(v, pa.int64())
        return v
    li, ri = as_int(l, lt), as_int(r, rt)
    res = pc.add(li, ri) if op == "+" else pc.subtract(li, ri)
    return pc.cast(pc.cast(res, pa.int64()), out_t)


def _arith_operand(v):
    """Arithmetic promotion: bool participates as an integer
    (expression/test_arithmetic.yaml id 0: c2 * c9 is valid); python
    int literals are int32 like the reference's (so col_int32 + 1
    stays int32 for ifnull's strict type check)."""
    t = getattr(v, "type", None)
    if t is not None and pa.types.is_boolean(t):
        return pc.cast(v, pa.int32())
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, int) and -2**31 <= v < 2**31:
        return pa.scalar(v, pa.int32())
    return v


def _num(a):
    """Promote to float64 when not already floating (SQL division)."""
    t = getattr(a, "type", None)
    if t is not None and not pa.types.is_floating(t):
        return pc.cast(a, pa.float64())
    if isinstance(a, (int, np.integer)):
        return float(a)
    return a


def _ts_epoch_ms(v):
    """Timestamp (any unit) -> epoch ms int64, truncating sub-ms."""
    t = getattr(v, "type", None)
    iv = pc.cast(v, pa.int64())
    unit = t.unit if t is not None and pa.types.is_timestamp(t) else "ms"
    if unit == "s":
        return pc.multiply(iv, pa.scalar(1000, pa.int64()))
    if unit == "ms":
        return iv
    div = 1000 if unit == "us" else 1_000_000
    return pc.divide(iv, pa.scalar(div, pa.int64()))


def _ts_shift(v):
    """Timestamp -> wall-clock at the reference tz, ms unit."""
    ms = _ts_epoch_ms(v)
    return pc.cast(pc.add(ms, pa.scalar(OPENMLDB_TZ_OFFSET_MS,
                                        pa.int64())),
                   pa.timestamp("ms"))


def _ts_to_string(v):
    """Canonical OpenMLDB timestamp rendering: 'YYYY-mm-dd HH:MM:SS'
    wall clock at the reference tz (test_type.yaml id 19). Truncate to
    seconds first — strftime %S renders fractional digits on sub-second
    units."""
    secs = pc.cast(pc.divide(pc.cast(_ts_shift(v), pa.int64()), 1000),
                   pa.timestamp("s"))
    return pc.strftime(secs, format="%Y-%m-%d %H:%M:%S")


def _log(a, b=None):
    """log(x) = ln(x); log(base, x) (udfs_8h.md log)."""
    if b is None:
        return pc.ln(_num(a))
    return pc.divide(pc.ln(_num(b)), pc.ln(_num(a)))


def _date_format(v, fmt):
    """date_format(ts|date, fmt) — wall-clock rendering at the
    reference tz (function/test_date.yaml id 0); other argument types
    are compile errors (id 1)."""
    fmt = str(_scalar(fmt))
    t = getattr(v, "type", None)
    if t is not None and pa.types.is_timestamp(t):
        secs = pc.cast(pc.divide(pc.cast(_ts_shift(v), pa.int64()),
                                 1000), pa.timestamp("s"))
        return pc.strftime(secs, format=fmt)
    if t is not None and pa.types.is_date(t):
        return pc.strftime(pc.cast(v, pa.timestamp("s")), format=fmt)
    raise ValueError("date_format requires a timestamp or date")


def _canon_str(v):
    """Canonical string rendering for concat/|| (timestamps at the
    reference tz wall clock, bools as true/false)."""
    t = getattr(v, "type", None)
    if t is None:
        if v is None:
            return pa.scalar(None, pa.string())
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, float) and float(v).is_integer():
            return str(v)  # keep '30.0' style? match str()
        return str(v)
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return v
    if pa.types.is_timestamp(t):
        return _ts_to_string(v)
    return pc.cast(v, pa.string())


def _concat_render(sep, *args):
    """concat / concat_ws with canonical per-type rendering
    (function/test_string.yaml ids 0-3); any NULL argument (or NULL
    separator) nulls the row. The separator may itself be a column
    (id 3 uses numeric separator columns — rendered too)."""
    arrs = [_canon_str(x) for x in args]
    if sep is None:
        sep_r = ""
    elif hasattr(sep, "type") and not isinstance(sep, pa.Scalar):
        sep_r = _canon_str(sep)          # column-valued separator
    else:
        s = _scalar(sep)
        if s is None:
            n = max((len(a) for a in arrs if hasattr(a, "__len__")),
                    default=1)
            return pa.nulls(n, pa.string())
        sep_r = _canon_str(s) if not isinstance(s, str) else s
    return pc.binary_join_element_wise(
        *arrs, sep_r, null_handling="emit_null")


def _substring(a, s, ln=None):
    """SQL substring (1-based; negative start counts from the end);
    supports column-valued start/length (test_udf_function.yaml 0-1)."""
    from openmldb_ray.functions import scalar as F
    if not (hasattr(s, "__len__") or hasattr(ln, "__len__")
            or isinstance(s, (pa.Array, pa.ChunkedArray))
            or isinstance(ln, (pa.Array, pa.ChunkedArray))):
        return F.substring(a, int(_scalar(s)),
                           None if ln is None else int(_scalar(ln)))
    av = a.to_pylist() if hasattr(a, "to_pylist") else list(a)
    n = len(av)

    def vec(x):
        if hasattr(x, "to_pylist"):
            return x.to_pylist()
        if x is None or isinstance(x, (int, np.integer)):
            return [None if x is None else int(x)] * n
        return list(x)
    sv, lv = vec(s), vec(ln)
    out = []
    for i in range(n):
        x, p = av[i], sv[i]
        ll = lv[i] if ln is not None else None
        if x is None or p is None or (ln is not None and ll is None):
            out.append(None)
            continue
        p0 = int(p) - 1 if int(p) > 0 else len(x) + int(p)
        p0 = max(p0, 0)
        out.append(x[p0:] if ll is None else x[p0:p0 + int(ll)])
    return pa.array(out, type=pa.string())


def _ifnull(a, b):
    """ifnull/nvl with the reference's STRICT type equality: both
    arguments must have the same concrete type (int32 vs int64 or int
    vs double is a compile error, condition/test_condition.yaml ids
    11-13); NULL literals match anything."""
    def tname(x):
        t = getattr(x, "type", None)
        if t is not None:
            return str(t)
        if x is None:
            return None
        if isinstance(x, bool):
            return "bool"
        if isinstance(x, int):
            return "int32"   # reference int literals are int32
        if isinstance(x, float):
            return "double"
        if isinstance(x, str):
            return "string"
        return type(x).__name__
    ta, tb = tname(a), tname(b)
    if ta is not None and tb is not None and ta != tb \
            and not (ta.startswith("null") or tb.startswith("null")):
        raise ValueError(
            f"ifnull argument types must match exactly: {ta} vs {tb}")
    return pc.coalesce(a, b)


def _bool_fn(v):
    """bool() function: parse semantics for strings, truthiness for
    numerics/timestamps, validity for dates (test_type.yaml 22-23)."""
    t = getattr(v, "type", None)
    if t is None:
        if v is None:
            return None
        if isinstance(v, str):
            return _str_to_bool(pa.array([v]))[0]
        return bool(v)
    if pa.types.is_boolean(t):
        return v
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return _str_to_bool(v)
    if pa.types.is_timestamp(t):
        return pc.not_equal(pc.cast(v, pa.int64()), 0)
    if pa.types.is_date(t):
        return pa.nulls(len(v), pa.bool_())  # bool(date) -> NULL (id 32)
    return pc.if_else(pc.is_valid(v), pc.not_equal(v, 0),
                      pa.scalar(None, pa.bool_()))


def _str_to_bool(v):
    """String -> bool, reference semantics (test_type.yaml ids 22-23):
    t/true/y/yes -> true, f/false/n/no -> false; otherwise a C-style
    leading-number parse ('1'->true, '0'->false, '2020-05-22 ...' ->
    2020 -> true); unparseable -> NULL."""
    import pandas as pd
    arr = v.to_numpy(zero_copy_only=False) if hasattr(v, "to_numpy") \
        else np.asarray(v, dtype=object)
    s = pd.Series(arr, dtype=object)
    low = s.str.lower()
    out = pd.Series([None] * len(s), dtype=object)
    out[low.isin(["t", "true", "y", "yes"])] = True
    out[low.isin(["f", "false", "n", "no"])] = False
    undecided = out.isna() & s.notna()
    lead = s[undecided].str.extract(r"^\s*([+-]?\d+\.?\d*)",
                                    expand=False)
    num = pd.to_numeric(lead, errors="coerce")
    out[undecided] = num.map(lambda x: None if x != x else bool(x))
    return pa.array(out.tolist(), type=pa.bool_())


def _cast_py(v, ty: pa.DataType) -> pa.Scalar:
    """Cast a python literal to an Arrow scalar (cast(1 as string))."""
    if v is None:
        return pa.scalar(None, ty)
    try:
        return pa.scalar(v, ty)
    except (pa.ArrowInvalid, pa.ArrowTypeError, OverflowError):
        pass
    if pa.types.is_string(ty) or pa.types.is_large_string(ty):
        if isinstance(v, float) and float(v).is_integer():
            return pa.scalar(str(int(v)), ty)
        return pa.scalar(str(v), ty)
    if pa.types.is_floating(ty):
        return pa.scalar(float(v), ty)
    if pa.types.is_integer(ty):
        return pa.scalar(int(v), ty)
    if pa.types.is_boolean(ty):
        return pa.scalar(bool(v), ty)
    raise ValueError(f"cannot cast literal {v!r} to {ty}")


def _like_regex(pattern: str, escape: str) -> str:
    """SQL LIKE pattern with a custom escape char -> anchored regex
    (an empty escape string disables escaping entirely)."""
    import re as _re
    out, i, n = [], 0, len(pattern)
    while i < n:
        ch = pattern[i]
        if escape and ch == escape:
            if i + 1 >= n:
                # dangling escape at pattern end: matches nothing
                # (v040/test_like.yaml id 29). RE2-safe never-match:
                # a literal after end-of-text can't exist
                return r"$never^"
            out.append(_re.escape(pattern[i + 1]))
            i += 2
            continue
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(_re.escape(ch))
        i += 1
    return "^" + "".join(out) + "$"


def _require_int(v, op: str):
    """Bitwise/DIV operands must be integer (or bool) typed — the
    reference rejects float/string/temporal operands at compile time
    (expression/test_arithmetic.yaml bitwise_operators_fail)."""
    t = getattr(v, "type", None)
    if t is not None:
        if not (pa.types.is_integer(t) or pa.types.is_boolean(t)
                or pa.types.is_null(t)):
            raise ValueError(f"operator {op} requires integer "
                             f"operands, got {t}")
    elif not (v is None or isinstance(v, (int, np.integer, bool))):
        raise ValueError(f"operator {op} requires integer operands, "
                         f"got {type(v).__name__}")


def _mod(a, b):
    if a is None or b is None:
        if hasattr(a, "type") or hasattr(b, "type"):
            arr = a if hasattr(a, "type") else b
            return pa.nulls(len(arr), pa.float64())
        return None
    an = a.to_numpy(zero_copy_only=False) if hasattr(a, "to_numpy") else a
    bn = b.to_numpy(zero_copy_only=False) if hasattr(b, "to_numpy") else b
    with np.errstate(divide="ignore", invalid="ignore"):
        return pa.array(np.mod(an, bn))


def _dayofweek(a):
    """Reference dayofweek: Sunday=1 .. Saturday=7 (null-safe)."""
    dw = pc.day_of_week(a)  # Monday=0
    plus = pc.add(dw, 1)
    wrapped = pc.if_else(pc.equal(plus, 7), pa.scalar(0), plus)
    return pc.cast(pc.add(wrapped, 1), pa.int64())


def _reject_bool(v, name: str):
    t = getattr(v, "type", None)
    if (t is not None and pa.types.is_boolean(t)) or isinstance(v, bool):
        raise ValueError(f"{name} is not defined for bool operands")
    return v


def _mathnum(v):
    """Math functions accept bool as a number (abs(true) = 1.0,
    function/test_calculate.yaml id 0)."""
    t = getattr(v, "type", None)
    if t is not None and pa.types.is_boolean(t):
        return pc.cast(v, pa.float64())
    if isinstance(v, bool):
        return float(v)
    return v


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
        "substring": _substring,
        "substr": _substring,
        "abs": lambda a: pc.abs(_mathnum(a)),
        "ceil": lambda a: pc.ceil(_mathnum(a)),
        "ceiling": lambda a: pc.ceil(_mathnum(a)),
        "floor": lambda a: pc.floor(_mathnum(a)),
        # trig/sqrt/log reject bool operands (test_calculate.yaml id 8)
        # while abs/ceil/floor/round/truncate accept them (ids 0, 5)
        "exp": pc.exp, "sqrt": pc.sqrt, "ln": pc.ln,
        "log": _log, "log2": pc.log2, "log10": pc.log10,
        "round": lambda x, nd=0: _round_sql(_mathnum(x), nd),
        "acos": pc.acos, "asin": pc.asin, "atan": pc.atan,
        "cot": lambda a: pc.divide(1.0, pc.tan(_reject_bool(a, "cot"))),
        "pow": lambda a, b: pc.power(_num(a), _num(b)),
        "power": lambda a, b: pc.power(_num(a), _num(b)),
        "sin": pc.sin, "cos": pc.cos, "tan": pc.tan,
        # documented alias/utility forms (udfs_8h.md)
        "add": lambda a, b: pc.add(_num(a), _num(b)),
        "inc": lambda a: pc.add(_num(a), 1),
        "atan2": lambda a, b: pc.atan2(_num(a), _num(b)),
        "degrees": lambda a: pc.multiply(_num(a), 180.0 / math.pi),
        "radians": lambda a: pc.multiply(_num(a), math.pi / 180.0),
        "maximum": lambda a, b: pc.max_element_wise(a, b),
        "minimum": lambda a, b: pc.min_element_wise(a, b),
        "character_length": F.char_length,
        "if_null": _ifnull, "is_null": pc.is_null,
        "coalesce": pc.coalesce, "ifnull": _ifnull, "nvl": _ifnull,
        "nvl2": lambda x, a, b: pc.if_else(pc.is_valid(x), a, b),
        "isnull": pc.is_null,
        "identity": lambda x: x,
        "__cst__": _cst,
        "bool": _bool_fn,
        "timestamp": lambda v: _ts_ms(v, strict_str=True),
        "greatest": lambda *a: pc.max_element_wise(*a),
        "least": lambda *a: pc.min_element_wise(*a),
        "trim": pc.utf8_trim_whitespace,
        "ltrim": pc.utf8_ltrim_whitespace,
        "rtrim": pc.utf8_rtrim_whitespace,
        "lpad": lambda a, n, p: pc.utf8_lpad(a, int(_scalar(n)),
                                             str(_scalar(p))),
        "rpad": lambda a, n, p: pc.utf8_rpad(a, int(_scalar(n)),
                                             str(_scalar(p))),
        "replace": _fn_replace,
        "concat": lambda *a: _concat_render(None, *a),
        "concat_ws": lambda s, *a: _concat_render(s, *a),
        "year": lambda a: pc.cast(pc.year(_temporal(a)), pa.int64()),
        "month": lambda a: pc.cast(pc.month(_temporal(a)), pa.int64()),
        "day": lambda a: pc.cast(pc.day(_temporal(a)), pa.int64()),
        "dayofmonth": lambda a: pc.cast(pc.day(_temporal(a)),
                                        pa.int64()),
        "hour": lambda a: pc.cast(pc.hour(_temporal(a, False)),
                                  pa.int64()),
        "minute": lambda a: pc.cast(pc.minute(_temporal(a, False)),
                                    pa.int64()),
        "second": lambda a: pc.cast(pc.second(_temporal(a, False)),
                                    pa.int64()),
        "dayofweek": lambda a: _dayofweek(_temporal(a)),
        "weekofyear": lambda a: pc.cast(pc.iso_week(_temporal(a)),
                                        pa.int64()),
        "week": lambda a: pc.cast(pc.iso_week(_temporal(a)),
                                  pa.int64()),
        "dayofyear": lambda a: pc.cast(pc.day_of_year(_temporal(a)),
                                       pa.int64()),
        "date_format": _date_format,
        "truncate": lambda a: pc.trunc(_num(_mathnum(a))),
        "mod": _mod,
        "strcmp": _strcmp,
    }


def _strcmp(a, b):
    """strcmp(string, string) -> -1/0/1, NULL-propagating; non-string
    arguments are compile errors (function/test_string.yaml ids 4-6)."""
    for v in (a, b):
        t = getattr(v, "type", None)
        if t is not None:
            if not (pa.types.is_string(t) or pa.types.is_large_string(t)):
                raise ValueError("strcmp requires string arguments")
        elif v is not None and not isinstance(v, str):
            raise ValueError("strcmp requires string arguments")
    return pc.if_else(pc.less(a, b), pa.scalar(-1, pa.int32()),
                      pc.if_else(pc.greater(a, b),
                                 pa.scalar(1, pa.int32()),
                                 pa.scalar(0, pa.int32())))


def _temporal(a, allow_date: bool = True):
    """Temporal functions accept timestamp, date, and epoch-ms BIGINT
    only (function/test_date.yaml id 3: day(smallint/int/float/string/
    bool) is a compile error; id 5: hour/minute reject date too)."""
    t = getattr(a, "type", None)
    if t is not None:
        if pa.types.is_timestamp(t):
            return a
        if pa.types.is_date(t):
            if allow_date:
                return a
            raise ValueError(
                "this temporal function does not accept date values")
        if t == pa.int64():
            return pc.cast(pc.cast(a, pa.int64()), pa.timestamp("ms"))
        raise ValueError(
            f"temporal function requires timestamp/date/bigint, got {t}")
    if isinstance(a, bool):
        raise ValueError("temporal function requires "
                         "timestamp/date/bigint, got bool")
    if isinstance(a, (int, np.integer)):
        return pa.scalar(int(a), pa.timestamp("ms"))
    raise ValueError("temporal function requires timestamp/date/bigint")


def _cst(a):
    """Shift a timestamp (or epoch-ms int) to the reference-tz wall
    clock; the openmldb dialect wraps temporal extraction functions
    with this so year()/hour()/... match the reference's rendering."""
    a = _temporal(a)
    t = getattr(a, "type", None)
    if t is not None and pa.types.is_timestamp(t):
        return _ts_shift(a)
    return a


def _scalar(x):
    if isinstance(x, pa.Scalar):
        return x.as_py()
    return x


def _fn_replace(a, x, y=""):
    """replace(str, search[, target]): 2-arg form removes the search
    substring; NULL search/target/input -> NULL (udf_query.yaml
    udf_replace)."""
    x, y = _scalar(x), _scalar(y)
    if a is None:
        return None
    if not hasattr(a, "type"):
        return None if (x is None or y is None) else \
            str(a).replace(str(x), str(y))
    if x is None or y is None:
        return pa.nulls(len(a), pa.string())
    return pc.replace_substring(a, pattern=str(x), replacement=str(y))


def eval_expr(e, tbl: pa.Table):
    """Evaluate an expression over a table -> Arrow array or scalar."""
    if isinstance(e, Lit):
        return e.val
    if isinstance(e, Param):
        return e.value
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
            return pc.invert(_b(v, tbl))
        if e.op == "~":
            _require_int(v, "~")
            if not hasattr(v, "type"):
                return None if v is None else ~int(v)
            return pc.bit_wise_not(v)
        if not hasattr(v, "type"):
            return None if v is None else -v
        if _kind(v) in ("ts", "date", "str"):
            raise ValueError(
                "unary minus is not defined for "
                "string/date/timestamp operands")
        if pa.types.is_boolean(v.type):
            # reference: unary minus on bool is a no-op (-true = true,
            # expression/test_arithmetic.yaml id 15)
            return v
        return pc.negate(v)
    if isinstance(e, BinOp):
        l = eval_expr(e.l, tbl)
        r = eval_expr(e.r, tbl)
        op = e.op
        if op == "AND":
            return pc.and_kleene(_b(l, tbl), _b(r, tbl))
        if op == "OR":
            return pc.or_kleene(_b(l, tbl), _b(r, tbl))
        if op in ("+", "-", "*", "/", "%") and getattr(e, "strict",
                                                       False):
            # openmldb dialect: reference arithmetic type rules +
            # int32 literals + timestamp-unit arithmetic
            _arith_check(op, l, r)
            l, r = _arith_operand(l), _arith_operand(r)
            if _kind(l) == "ts" or _kind(r) == "ts":
                return _ts_arith(op, l, r)
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
        if op == "DIV":
            # integer division (udfs_8h.md DIV: int operands only)
            _require_int(l, "DIV")
            _require_int(r, "DIV")
            if l is None or r is None:
                if _anyarr(l, r):
                    arr = l if hasattr(l, "type") else r
                    return pa.nulls(len(arr), pa.int64())
                return None
            if not _anyarr(l, r):
                return int(np.trunc(l / r)) if r != 0 else None
            ln = l.to_numpy(zero_copy_only=False) if hasattr(
                l, "to_numpy") else l
            rn = r.to_numpy(zero_copy_only=False) if hasattr(
                r, "to_numpy") else r
            with np.errstate(divide="ignore", invalid="ignore"):
                res = np.trunc(np.divide(ln, rn))
            mask = ~np.isfinite(res)
            out = pa.array(np.where(mask, 0, res).astype(np.int64),
                           from_pandas=True)
            if mask.any():
                out = pc.if_else(pa.array(mask), pa.scalar(
                    None, pa.int64()), out)
            return out
        if op == "XOR":
            return pc.xor(_b(l, tbl), _b(r, tbl))
        if op in ("&", "|", "^", "<<", ">>"):
            _require_int(l, op)
            _require_int(r, op)
            fn = {"&": pc.bit_wise_and, "|": pc.bit_wise_or,
                  "^": pc.bit_wise_xor, "<<": pc.shift_left,
                  ">>": pc.shift_right}[op]
            if not _anyarr(l, r):
                if l is None or r is None:
                    return None
                return {"&": l & r, "|": l | r, "^": l ^ r,
                        "<<": l << r, ">>": l >> r}[op]
            if l is None or r is None:
                arr = l if hasattr(l, "type") else r
                return pa.nulls(len(arr), arr.type)
            return fn(l, r)
        if op == "||":
            return _concat_render(None, l, r)
        cmps = {"=": pc.equal, "!=": pc.not_equal, "<": pc.less,
                "<=": pc.less_equal, ">": pc.greater,
                ">=": pc.greater_equal}
        if op in cmps:
            if l is None or r is None:
                # comparison with a NULL literal is NULL
                arr = l if hasattr(l, "type") else r
                n = len(arr) if arr is not None else tbl.num_rows
                return pa.nulls(n, pa.bool_())
            lk, rk = _kind(l), _kind(r)
            if {"ts", "date"} == {lk, rk}:
                raise ValueError(
                    "cannot compare timestamp with date "
                    "(expression/test_predicate.yaml id 4)")
            l, r = _align_cmp(*_align_ts(l, r))
            return cmps[op](l, r)
        raise ValueError(f"unknown operator {op}")
    if isinstance(e, IsNull):
        v = eval_expr(e.e, tbl)
        out = pc.is_null(v)
        return pc.invert(out) if e.negated else out
    if isinstance(e, Like):
        v = eval_expr(e.e, tbl)
        if not isinstance(e.pattern, str):
            # pattern from an expression (per-row patterns): compiled-
            # regex cache keyed by distinct pattern; NULL value or NULL
            # pattern -> NULL (like_predicate_7)
            import re as _re
            pat = eval_expr(e.pattern, tbl)
            n = tbl.num_rows
            vals = (v.to_pylist() if hasattr(v, "to_pylist")
                    else [v] * n)
            pats = (pat.to_pylist() if hasattr(pat, "to_pylist")
                    else [pat] * n)
            esc = e.escape if e.escape is not None else "\\"
            flags = _re.IGNORECASE if e.ignore_case else 0
            cache: dict = {}
            res = []
            for s, p in zip(vals, pats):
                if s is None or p is None:
                    res.append(None)
                    continue
                rx = cache.get(p)
                if rx is None:
                    rx = cache[p] = _re.compile(_like_regex(p, esc),
                                                flags)
                res.append(rx.match(str(s)) is not None)
            out = pa.array(res, pa.bool_())
            return pc.invert(out) if e.negated else out
        if e.escape is not None:
            # custom (or empty = disabled) escape char -> regex
            out = pc.match_substring_regex(
                v, _like_regex(e.pattern, e.escape),
                ignore_case=e.ignore_case)
        else:
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

        def is_arr(x):
            return hasattr(x, "type") or hasattr(x, "to_numpy")
        vt = getattr(v, "type", None)
        if vt is None and not any(is_arr(x) for x in items):
            # scalar LHS over a literal list: Python 3VL with numeric-
            # dominant coercion ('1' IN (1.0, 2.0) is true; NULL
            # anywhere unresolved -> NULL)
            def _scalar_eq(a, b):
                if isinstance(a, bool) or isinstance(b, bool):
                    return a == b
                try:
                    return float(a) == float(b)
                except (TypeError, ValueError):
                    return a == b
            if v is None:
                res = None
            else:
                res = False
                for x in items:
                    if x is None:
                        res = True if res is True else None
                    elif _scalar_eq(v, x):
                        res = True
            if e.negated and res is not None:
                res = not res
            return pa.array([res] * tbl.num_rows, pa.bool_())
        if vt is None:
            # scalar LHS but array items: broadcast and fall through
            v = pa.array([v] * tbl.num_rows)
            vt = v.type
        if pa.types.is_string(vt) and items and all(
                (not is_arr(x)) and isinstance(x, (int, float))
                and not isinstance(x, bool) for x in items):
            # an all-numeric list dominates a string LHS: the tested
            # value casts to double (in_predicate_type_cast_3)
            try:
                v = pc.cast(v, pa.float64())
            except pa.ArrowInvalid:
                import pandas as pd
                v = pa.array(pd.to_numeric(
                    v.to_pandas(), errors="coerce"), pa.float64())
            vt = v.type
        # element-wise Kleene ORs of null-propagating equalities:
        # NULL IN (...) -> NULL, and a no-match against a list holding
        # NULL -> NULL (simple_query.yaml in_predicate_normal NULL-IN)
        out = None
        for x in items:
            if is_arr(x):
                eq = pc.equal(*_align_cmp(*_align_ts(v, x)))
            elif x is None:
                eq = pa.nulls(len(v), pa.bool_())
            else:
                xv, bad = x, False
                try:
                    if pa.types.is_integer(vt):
                        fx = float(x)
                        xv, bad = int(fx), fx != int(fx)
                    elif pa.types.is_floating(vt):
                        xv = float(x)
                    elif pa.types.is_string(vt):
                        xv = str(x)
                except (TypeError, ValueError):
                    bad = True  # uncoercible item can't equal anything
                if bad:
                    eq = pa.array(np.zeros(len(v), dtype=bool))
                else:
                    eq = pc.equal(v, pa.scalar(xv, vt))
            out = eq if out is None else pc.or_kleene(out, eq)
        return pc.invert(out) if e.negated else out
    if isinstance(e, Case):
        n = tbl.num_rows
        result = None
        default = (eval_expr(e.default, tbl) if e.default is not None
                   else None)
        for cond, val in reversed(e.whens):
            # a NULL condition is "not matched" (falls through to the
            # next WHEN / ELSE), not a NULL result
            c = pc.fill_null(_b(eval_expr(cond, tbl), tbl), False)
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
            y, m, d = (int(x) for x in v.split("-"))
            return pa.scalar(_dt.date(y, m, d), ty)
        if not hasattr(v, "type"):
            return _cast_py(v, ty)
        if pa.types.is_floating(v.type) and pa.types.is_integer(ty):
            # reference int(float) truncates toward zero (int(20.1)=20)
            return pc.cast(pc.trunc(v), ty, safe=False)
        if pa.types.is_string(v.type) and pa.types.is_timestamp(ty):
            return pc.strptime(v, format="%Y-%m-%d %H:%M:%S", unit="us",
                               error_is_null=True)
        if pa.types.is_string(v.type) and (pa.types.is_integer(ty)
                                           or pa.types.is_floating(ty)):
            # unparseable string -> NULL (test_type.yaml ids 14-18)
            num = _to_num_coerce(v)
            if pa.types.is_integer(ty):
                return pc.cast(pc.trunc(num), ty, safe=False)
            return pc.cast(num, ty)
        if pa.types.is_string(v.type) and pa.types.is_boolean(ty):
            # CAST AS BOOL: parse keywords/numbers, but unparseable
            # non-empty strings are TRUE ('aa' -> true, test_type.yaml
            # id 1) — unlike the bool() function (NULL)
            parsed = _str_to_bool(v)
            return pc.coalesce(parsed, pc.not_equal(
                pc.utf8_length(v), 0))
        if pa.types.is_string(v.type) and ty == pa.date32():
            p1 = pc.strptime(v, format="%Y-%m-%d %H:%M:%S", unit="s",
                             error_is_null=True)
            p2 = pc.strptime(v, format="%Y-%m-%d", unit="s",
                             error_is_null=True)
            return pc.cast(pc.coalesce(p1, p2), ty)
        if pa.types.is_date(v.type) and pa.types.is_boolean(ty):
            # date truthiness: non-NULL -> true (test_type.yaml id 3)
            return pc.if_else(pc.is_valid(v), pa.scalar(True),
                              pa.scalar(None, pa.bool_()))
        if pa.types.is_timestamp(v.type):
            # OpenMLDB renders/derives timestamps at the reference tz
            if pa.types.is_string(ty) or pa.types.is_large_string(ty):
                return _ts_to_string(v)
            if ty == pa.date32():
                return pc.cast(_ts_shift(v), pa.date32())
            if pa.types.is_boolean(ty):
                return pc.not_equal(pc.cast(v, pa.int64()), 0)
            if pa.types.is_integer(ty) or pa.types.is_floating(ty):
                return pc.cast(_ts_epoch_ms(v), ty, safe=False)
        if pa.types.is_integer(v.type) and ty == pa.date32():
            # integers never cast to date (test_type.yaml ids 4, 26-28)
            raise ValueError("cannot cast an integer to date")
        if pa.types.is_date(v.type) and (pa.types.is_integer(ty)
                                         or pa.types.is_floating(ty)):
            # function-style int16(date) -> NULL (test_type.yaml 32);
            # CAST(date AS smallint) is a compile error (id 5)
            if getattr(e, "fn", False):
                return pa.nulls(len(v), ty)
            raise ValueError("cannot CAST date to a numeric type")
        if pa.types.is_boolean(ty) and (pa.types.is_integer(v.type)
                                        or pa.types.is_floating(v.type)):
            return pc.if_else(pc.is_valid(v), pc.not_equal(v, 0),
                              pa.scalar(None, pa.bool_()))
        if pa.types.is_integer(v.type) and pa.types.is_integer(ty):
            return pc.cast(v, ty, safe=False)  # C-style wraparound
        return pc.cast(v, ty)
    if isinstance(e, Func):
        if e.name in ("fz_split", "fz_split_by_key",
                      "fz_split_by_value", "fz_join"):
            # row-level FeatureZero split/join
            # (test_feature_zero_function.yaml id 2): split -> one
            # list<string> per row; join -> delimiter-joined string
            from openmldb_ray.functions import feature_zero as fz
            args = [eval_expr(a, tbl) for a in e.args]
            v, params = args[0], args[1:]
            n = tbl.num_rows
            vals = (v.to_pylist() if hasattr(v, "to_pylist")
                    else [v] * n)
            if e.name == "fz_join":
                return pa.array(
                    [fz.fz_join(x, *params) for x in vals],
                    pa.string())
            fn = {"fz_split": fz.fz_split,
                  "fz_split_by_key": fz.fz_split_by_key,
                  "fz_split_by_value": fz.fz_split_by_value}[e.name]
            return pa.array([fn(s, *params) for s in vals],
                            pa.list_(pa.string()))
        if e.name in ("like_match", "ilike_match"):
            # udf forms of LIKE (query/udf_query.yaml): NULL target,
            # pattern, or escape -> NULL; ''-escape disables escaping.
            # A BARE null literal arg is a compile error (untyped NULL,
            # v040/test_like_match.yaml ids 17-18) — a typed
            # string(null) is fine and yields NULL.
            for a in e.args[1:]:
                if isinstance(a, Lit) and a.val is None:
                    raise ValueError(f"{e.name}: untyped NULL argument")

            def _py(x):
                return x.as_py() if isinstance(x, pa.Scalar) else x
            v = _py(eval_expr(e.args[0], tbl))
            pat = _py(eval_expr(e.args[1], tbl))
            esc = _py(eval_expr(e.args[2], tbl)) if len(e.args) > 2 \
                else "\\"
            ic = e.name == "ilike_match"
            n = tbl.num_rows
            if (pat is None and not hasattr(pat, "type")) or \
                    (esc is None):
                return pa.nulls(n, pa.bool_())
            if isinstance(esc, str) and len(esc) > 1:
                # multi-char escape: no row matches, NULL stays NULL
                # (v040/test_like_match.yaml id 28)
                if hasattr(v, "type"):
                    return pc.and_(pc.true_unless_null(v),
                                   pa.array([False] * n))
                return (pa.nulls(n, pa.bool_()) if v is None
                        else pa.array([False] * n, pa.bool_()))
            import re as _re
            flags = _re.IGNORECASE if ic else 0
            if isinstance(pat, str) and not hasattr(v, "type"):
                if v is None:
                    return pa.nulls(n, pa.bool_())
                rx = _re.compile(_like_regex(pat, esc), flags)
                return pa.array([rx.match(str(v)) is not None] * n,
                                pa.bool_())
            if isinstance(pat, str):
                return pc.match_substring_regex(
                    v, _like_regex(pat, esc), ignore_case=ic)
            # per-row patterns
            vals = (v.to_pylist() if hasattr(v, "to_pylist")
                    else [v] * n)
            pats = pat.to_pylist()
            cache: dict = {}
            res = []
            for s, p in zip(vals, pats):
                if s is None or p is None:
                    res.append(None)
                    continue
                rx = cache.get(p)
                if rx is None:
                    rx = cache[p] = _re.compile(_like_regex(p, esc),
                                                flags)
                res.append(rx.match(str(s)) is not None)
            return pa.array(res, pa.bool_())
        if e.name in ("timestamp_add", "timestampadd", "timestampaddd"):
            # timestamp_add(UNIT, n, ts); the 2-arg form adds one unit
            # (query/simple_query.yaml id 4). UNIT parses as a bare
            # identifier, not a value.
            unit = e.args[0].name.lower() if isinstance(e.args[0], Col) \
                else str(e.args[0]).lower()
            ms = {"second": 1000, "minute": 60_000, "hour": 3_600_000,
                  "day": 86_400_000}[unit]
            rest = [eval_expr(a, tbl) for a in e.args[1:]]
            n, ts = (rest[0], rest[1]) if len(rest) == 2 else (1, rest[0])
            if hasattr(ts, "type") and pa.types.is_timestamp(ts.type):
                unit_div = {"ms": 1, "us": 1000, "ns": 1_000_000}[
                    ts.type.unit]
                delta = pc.multiply(pc.cast(n, pa.int64()) if hasattr(
                    n, "type") else pa.scalar(int(n), pa.int64()),
                    pa.scalar(ms * unit_div, pa.int64()))
                raw = pc.add(pc.cast(ts, pa.int64()), delta)
                return pc.cast(raw, ts.type)
            delta = pc.multiply(pc.cast(n, pa.int64()) if hasattr(
                n, "type") else pa.scalar(int(n), pa.int64()),
                pa.scalar(ms, pa.int64()))
            return pc.add(pc.cast(ts, pa.int64()) if hasattr(
                ts, "type") else pa.scalar(int(ts), pa.int64()), delta)
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
    """Coerce to a boolean array with the reference's truthiness rules
    (expression/test_logic.yaml id 0): numbers/timestamps are true when
    non-zero, strings when non-empty, dates when non-NULL; NULL stays
    NULL (three-valued logic)."""
    if isinstance(v, bool):
        return pa.array(np.full(tbl.num_rows, v))
    if v is None:
        return pa.nulls(tbl.num_rows, pa.bool_())
    if isinstance(v, (int, np.integer, float)):
        return pa.array(np.full(tbl.num_rows, bool(v)))
    t = getattr(v, "type", None)
    if t is None or pa.types.is_boolean(t):
        return v
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return pc.not_equal(pc.utf8_length(v), 0)
    if pa.types.is_timestamp(t):
        return pc.not_equal(pc.cast(v, pa.int64()), 0)
    if pa.types.is_date(t):
        return pc.if_else(pc.is_valid(v), pa.scalar(True),
                          pa.scalar(None, pa.bool_()))
    return pc.not_equal(v, 0)


def _align_cmp(l, r):
    """Mixed-type comparison promotion (expression/test_predicate.yaml
    ids 0-6): string vs numeric compares numerically (unparseable ->
    NULL); string vs date/bool compares lexically (the other side
    rendered as its canonical string)."""
    def ty(x):
        return getattr(x, "type", None)

    def is_str(t):
        return t is not None and (pa.types.is_string(t)
                                  or pa.types.is_large_string(t))

    def is_num(t):
        return t is not None and (pa.types.is_integer(t)
                                  or pa.types.is_floating(t))
    lt, rt = ty(l), ty(r)

    def is_bool(t, x):
        return (t is not None and pa.types.is_boolean(t)) \
            or isinstance(x, bool)
    # bool vs numeric compares numerically (test_predicate.yaml id 1)
    if is_bool(lt, l) and (is_num(rt) or isinstance(r, (int, float))):
        l = pc.cast(l, pa.int32()) if lt is not None else int(l)
        lt = ty(l)
    elif is_bool(rt, r) and (is_num(lt) or isinstance(l, (int, float))):
        r = pc.cast(r, pa.int32()) if rt is not None else int(r)
        rt = ty(r)
    l_str = is_str(lt) or isinstance(l, str)
    r_str = is_str(rt) or isinstance(r, str)
    if l_str == r_str:
        return l, r
    s, o = (l, r) if l_str else (r, l)       # s = string side
    ot = ty(o)
    if is_num(ot) or isinstance(o, (int, float)):
        # string vs numeric compares lexically — the numeric side is
        # rendered as its canonical string (test_predicate.yaml id 1:
        # 10 < 'bb' is TRUE)
        s2 = s
        o2 = pc.cast(o, pa.string()) if ot is not None else str(o)
    elif ot is not None and pa.types.is_boolean(ot) \
            or isinstance(o, bool):
        o2 = pc.cast(o, pa.string()) if ot is not None \
            else ("true" if o else "false")
        s2 = s
    elif ot is not None and pa.types.is_timestamp(ot):
        o2 = _ts_to_string(o)
        s2 = s
    elif ot is not None and pa.types.is_date(ot):
        o2 = pc.cast(o, pa.string())
        s2 = s
    else:
        return l, r
    return (s2, o2) if l_str else (o2, s2)


def _to_num_coerce(v):
    """String -> float64 with NULL for unparseable values."""
    if isinstance(v, str):
        try:
            return float(v)
        except ValueError:
            return None
    import pandas as pd
    arr = v.to_numpy(zero_copy_only=False) if hasattr(v, "to_numpy") \
        else np.asarray(v)
    return pa.array(pd.to_numeric(pd.Series(arr), errors="coerce")
                    .to_numpy(dtype=np.float64, na_value=np.nan),
                    from_pandas=True)


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
    if isinstance(e, Param):
        return e.value
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
