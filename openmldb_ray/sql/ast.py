"""AST for the SQL front-end subset (plain dataclasses; the planner
pattern-matches on these)."""

from __future__ import annotations

from dataclasses import dataclass, field


# ------------------------------------------------------------ expressions

@dataclass
class Lit:
    val: object          # int | float | str | None


@dataclass
class Col:
    name: str
    table: str | None = None


@dataclass
class Star:
    pass


@dataclass
class BinOp:
    op: str              # + - * / % || = != < <= > >= AND OR
    l: object
    r: object
    strict: bool = False  # openmldb dialect: reference type rules
                          # (ts/date/string arithmetic validity)


@dataclass
class UnOp:
    op: str              # NOT | -
    e: object


@dataclass
class Func:
    name: str            # lower-cased
    args: list
    distinct: bool = False
    ignore_nulls: bool = False


@dataclass
class WinCall:
    func: Func
    window: str | None   # named window, or None with inline
    inline: object = None  # WindowDef


@dataclass
class Case:
    whens: list          # [(cond, value)]
    default: object = None


@dataclass
class Cast:
    e: object
    type: str            # upper-cased SQL type name
    fn: bool = False     # function-style (int16(x)) vs CAST syntax —
                         # they differ on invalid conversions
                         # (test_type.yaml id 5 vs 32)


@dataclass
class IsNull:
    e: object
    negated: bool = False


@dataclass
class Like:
    e: object
    pattern: str
    negated: bool = False
    ignore_case: bool = False
    escape: str | None = None


@dataclass
class Between:
    e: object
    lo: object
    hi: object
    negated: bool = False


@dataclass
class InList:
    e: object
    items: list
    negated: bool = False


@dataclass
class Param:
    """Positional ``?`` placeholder (parameterized_query.yaml); the
    planner binds ``value`` from the params list before planning."""
    idx: int
    value: object = None


@dataclass
class ScalarSubquery:
    """Uncorrelated (SELECT ...) inside a value expression; resolved
    to a Lit at plan time (must yield exactly one row, one column)."""
    sel: object


@dataclass
class Interval:
    micros: int          # canonicalized to microseconds


# ------------------------------------------------------------ query parts

@dataclass
class Bound:
    kind: str            # "unbounded" | "current" | "preceding" | "following"
    value: object = None  # expr (rows count or range offset)
    is_open: bool = False


@dataclass
class WindowDef:
    name: str | None
    partition_by: list
    order_by: list       # [(expr, desc: bool)]
    frame_type: str | None   # "rows" | "range" | "rows_range" | None
    start: Bound | None = None
    end: Bound | None = None
    max_size: int | None = None   # None = absent; 0 is a plan error
    exclude_current_time: bool = False
    exclude_current_row: bool = False
    instance_not_in_window: bool = False
    union_tables: list = field(default_factory=list)  # table names/subqueries


@dataclass
class SelectItem:
    expr: object
    alias: str | None
    text: str            # source text (output name fallback)


@dataclass
class TableRef:
    name: str | None     # None for subquery
    alias: str | None
    subquery: object = None  # Select


@dataclass
class Join:
    kind: str            # "left" | "last" | "asof_left"
    table: TableRef
    on: object           # expr
    order_by: object = None   # (col, desc) for LAST JOIN


@dataclass
class Select:
    items: list               # [SelectItem]
    distinct: bool
    table: TableRef | None
    joins: list               # [Join]
    where: object = None
    group_by: list = field(default_factory=list)
    having: object = None
    windows: dict = field(default_factory=dict)   # name -> WindowDef
    order_by: list = field(default_factory=list)  # [(expr, desc)]
    limit: int | None = None
    ctes: dict = field(default_factory=dict)      # name -> Select
    set_ops: list = field(default_factory=list)   # [("all"|"distinct", Select)]
