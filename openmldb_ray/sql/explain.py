"""EXPLAIN: a textual logical plan for a SQL query — the analog of
the reference's plan dump (``explain SELECT ...`` in the CLI,
cases/plan/cmd.yaml ids 7-8; graphviz dump SparkPlanner.scala:95-98).

Parser-level (no data touched): describes the stage pipeline the
planner will build — scans with pruned columns, filters, window specs
with frame/modifier details and the shuffle they imply, joins, group
by, set ops, order/limit.
"""

from __future__ import annotations

from openmldb_ray.sql.ast import Col, Select, Star, WinCall
from openmldb_ray.sql.exprs import collect
from openmldb_ray.sql.parser import parse


def _frame(wd) -> str:
    def bound(b) -> str:
        if b is None:
            return "CURRENT ROW"
        if b.kind == "current":
            return "CURRENT ROW"
        if b.kind == "unbounded":
            return "UNBOUNDED PRECEDING"
        v = b.value
        for f in ("val", "value", "micros"):
            if hasattr(v, f):
                v = getattr(v, f)
                break
        return f"{'OPEN ' if b.is_open else ''}{v} {b.kind.upper()}"

    parts = []
    if wd.frame_type:
        parts.append(f"{wd.frame_type.upper()} BETWEEN "
                     f"{bound(wd.start)} AND {bound(wd.end)}")
    mods = []
    if getattr(wd, "max_size", None):
        mods.append(f"MAXSIZE {wd.max_size}")
    if getattr(wd, "exclude_current_time", False):
        mods.append("EXCLUDE CURRENT_TIME")
    if getattr(wd, "instance_not_in_window", False):
        mods.append("INSTANCE_NOT_IN_WINDOW")
    if getattr(wd, "union_tables", None):
        mods.append(f"UNION x{len(wd.union_tables)}")
    return " ".join(parts + mods) or "(frame per spec)"


def _describe(sel: Select, indent: str = "") -> list[str]:
    out: list[str] = []
    pad = indent

    def line(s):
        out.append(pad + s)

    for name, sub in (sel.ctes or {}).items():
        line(f"WITH {name} AS:")
        out.extend(_describe(sub, pad + "  "))
    if sel.table is not None:
        if sel.table.subquery is not None:
            line("SCAN (subquery):")
            out.extend(_describe(sel.table.subquery, pad + "  "))
        else:
            cols = sorted({c.name for c in collect(sel, Col)})
            star = any(isinstance(it.expr, Star) for it in sel.items)
            line(f"SCAN {sel.table.name}"
                 + (" [*]" if star else f" [prune -> {cols}]"))
    else:
        line("CONST PROJECT (no FROM)")
    for j in sel.joins:
        tgt = j.table.name or "(subquery)"
        line(f"{j.kind.upper().replace('_', ' ')} JOIN {tgt}"
             + (f" ORDER BY "
                f"{getattr(j.order_by[0], 'name', j.order_by[0])}"
                f"{' DESC' if j.order_by[1] else ''}"
                if j.order_by else ""))
    if sel.where is not None:
        line("FILTER (vectorized pc.filter)")
    wins = {}
    for it in sel.items:
        for wc in collect(it.expr, WinCall):
            wd = sel.windows.get(wc.window) if wc.window else wc.inline
            if wd is not None:
                wins[id(wd)] = wd
    for wd in wins.values():
        keys = ",".join(str(getattr(k, "name", k))
                        for k in wd.partition_by)
        order = ",".join(str(getattr(c, "name", c))
                         for c, _ in wd.order_by) if wd.order_by else ""
        line(f"WINDOW AGG [hash-shuffle by ({keys}) -> per-run sort "
             f"by {order} -> vectorized kernel] {_frame(wd)}")
    if sel.group_by:
        line(f"GROUP AGG [partial combine -> shuffle] by "
             f"{[getattr(g, 'name', str(g)) for g in sel.group_by]}")
    if sel.having is not None:
        line("HAVING filter")
    line(f"PROJECT {[it.alias or it.text for it in sel.items]}")
    if sel.distinct:
        line("DISTINCT [local combiner -> shuffle]")
    for op, rhs in sel.set_ops:
        line(f"UNION {'ALL' if op == 'all' else 'DISTINCT'}:")
        out.extend(_describe(rhs, pad + "  "))
    if sel.order_by:
        line("SORT (all-to-all)")
    if sel.limit is not None:
        line(f"LIMIT {sel.limit}")
    return out


def explain(query: str) -> str:
    """Logical plan text for a SELECT (parser-level, no data)."""
    sel = parse(query)
    return "\n".join(_describe(sel))
