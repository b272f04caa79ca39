"""SQL planner: AST -> Ray Data pipeline.

The Ray-Data re-expression of the reference's plan tree
(java/openmldb-batch .../SparkPlanner.scala:70-117: Project ->
WindowAgg -> Join -> GroupBy -> Sort/Limit nodes):

- scans prune columns at the read (only referenced columns leave
  parquet);
- WHERE / projections are vectorized Arrow map_batches;
- each distinct WINDOW definition becomes one window_agg shuffle —
  several windows (even with different partition keys) chain, each
  preserving one output row per input row (the ConcatJoin analog,
  nodes/ConcatJoinPlan.scala:32-78, without the row-id zip);
- LEFT/INNER JOIN -> bucketed hash_join; LAST JOIN / ASOF LEFT JOIN ->
  last_join (broadcast by default);
- GROUP BY -> grouped_aggregate (map-side partial combine);
- DISTINCT / ORDER BY / LIMIT -> distinct / sort / limit.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from openmldb_ray.sql.ast import (BinOp, Col, Func, Lit, Select,
                                  SelectItem, Star, TableRef, WinCall,
                                  WindowDef)
from openmldb_ray.sql.exprs import collect, const_eval, eval_expr
from openmldb_ray.window.spec import Agg, WindowSpec

_UNBOUNDED_ROWS = 1 << 40
_UNBOUNDED_RANGE = 1 << 60

_GROUP_AGGS = {"sum": "sum", "count": "count", "avg": "mean",
               "mean": "mean", "min": "min", "max": "max",
               "percentile_approx": "percentile_approx",
               "approx_count_distinct": "approx_count_distinct"}

# window funcs: SQL name -> kernel func (k-arg funcs handled inline)
_WIN_DIRECT = {"sum", "count", "min", "max", "avg", "row_number",
               "distinct_count", "top", "topn_frequency", "top1_ratio",
               "at", "lag", "lead", "first_value",
               "sum_cate", "count_cate", "avg_cate", "min_cate",
               "max_cate", "fz_join", "fz_window_split",
               "fz_window_split_by_key", "fz_window_split_by_value",
               "fz_top1_ratio", "fz_topn_frequency"}


# nested aggregate-in-aggregate window expressions: inner fns that
# evaluate to a per-INSTANCE scalar over the frame, and the outer
# reduce forms that accept a nested expression
_NESTED_INNER = frozenset({"count", "sum", "avg", "min", "max",
                           "distinct_count", "lag", "at",
                           "first_value", "sum_where", "count_where",
                           "avg_where", "min_where", "max_where"})
_NESTED_OUTER = frozenset({"sum", "count", "avg", "min", "max",
                           "distinct_count", "sum_where", "count_where",
                           "avg_where", "min_where", "max_where"})


def _contains_inner_agg(e) -> bool:
    return any(isinstance(f, Func) and f.name in _NESTED_INNER
               for f in collect(e, Func))


def _scalar_refs(e) -> bool:
    return any(c.name.startswith("__s_") for c in collect(e, Col))


class Catalog:
    """name -> Dataset factory with column pruning."""

    def __init__(self, sf_dir: str | None = None,
                 tables: dict | None = None):
        self.sf_dir = sf_dir
        self.tables = tables or {}

    def full_schema(self, name: str) -> pa.Schema | None:
        """Unpruned schema of a named table (WINDOW UNION requires
        full schema equality, WindowAggPlanUtil.scala:41-92)."""
        if name in self.tables:
            s = self.tables[name].schema()
            return pa.schema(list(zip(s.names, s.types)))
        if self.sf_dir is None:
            return None
        import pyarrow.parquet as pq
        try:
            return pq.read_schema(f"{self.sf_dir}/{name}.parquet")
        except Exception:
            return None

    def load(self, name: str,
             columns: set[str] | None) -> ray.data.Dataset:
        """``columns=None`` means keep everything (SELECT *)."""
        if name in self.tables:
            ds = self.tables[name]
            if columns is None:
                return ds
            have = ds.schema().names
            want = [c for c in have if c in columns]
            return ds.select_columns(want) if want and len(want) < len(
                have) else ds
        if self.sf_dir is None:
            raise ValueError(f"unknown table {name!r}")
        import pyarrow.parquet as pq

        from openmldb_ray.io import clean_read_parquet
        path = f"{self.sf_dir}/{name}.parquet"
        if columns is None:
            return clean_read_parquet(path)
        have = pq.read_schema(path).names
        want = [c for c in have if c in columns] or None
        return clean_read_parquet(path, columns=want)


class Planner:
    def __init__(self, catalog: Catalog, dialect: str = "ansi",
                 presorted: bool = False, skew_opt: bool = False,
                 skew_min_rows: int = 100_000):
        self.catalog = catalog
        self.dialect = dialect
        self.presorted = presorted
        self.skew_opt = skew_opt
        self.skew_min_rows = skew_min_rows
        self._gen = 0

    def _name(self, prefix="c") -> str:
        self._gen += 1
        return f"__{prefix}{self._gen}__"

    def _apply_set_ops(self, left: ray.data.Dataset,
                       ops: list) -> ray.data.Dataset:
        """UNION ALL / UNION DISTINCT over planned branches: positional
        alignment, left branch's names and types win (ANSI). DISTINCT
        dedupes everything accumulated so far (left-assoc fold)."""
        from openmldb_ray.functions.aggregates import distinct
        try:
            lnames = list(left.columns())
            ltypes = [f.type for f in left.schema().base_schema]
        except AttributeError:
            lnames = list(left.columns())
            ltypes = [None] * len(lnames)

        def align(b: pa.Table) -> pa.Table:
            cols = {}
            for i, (nm, ty) in enumerate(zip(lnames, ltypes)):
                c = b.column(i)
                if ty is not None and c.type != ty:
                    c = c.cast(ty)
                cols[nm] = c
            return pa.table(cols)
        align.__name__ = "union_align"

        # run the left branch through the same align map so every
        # union input emits byte-identical (metadata-free) schemas —
        # otherwise the union operator logs schema-mismatch warnings
        acc = left.map_batches(align, batch_format="pyarrow")
        for op, rhs_sel in ops:
            rhs = Planner(self.catalog, self.dialect,
                          presorted=self.presorted).plan(rhs_sel)
            rnames = list(rhs.columns())
            if len(rnames) != len(lnames):
                raise ValueError(
                    f"UNION branches have different column counts "
                    f"({len(lnames)} vs {len(rnames)})")
            if rnames != lnames or any(t is not None for t in ltypes):
                rhs = rhs.map_batches(align, batch_format="pyarrow")
            acc = acc.union(rhs)
            if op == "distinct":
                acc = distinct(acc, lnames)
        return acc

    # ----------------------------------------------------------- entry
    def plan(self, sel: Select,
             carry_window_order: bool = False) -> ray.data.Dataset:
        if self.dialect == "openmldb":
            # OpenMLDB TIMESTAMP is stored as epoch ms and rendered at
            # the reference tz: casts go through the ms-unit path, and
            # temporal extraction funcs see the tz-shifted wall clock
            from openmldb_ray.sql.ast import Cast
            for c in collect(sel, Cast):
                if c.type == "TIMESTAMP":
                    c.type = "TIMESTAMP_MS"
            _CST_FNS = {"year", "month", "day", "dayofmonth", "hour",
                        "minute", "second", "dayofweek", "weekofyear",
                        "dayofyear"}
            for fn in collect(sel, Func):
                if fn.name in _CST_FNS and fn.args and not (
                        isinstance(fn.args[0], Func)
                        and fn.args[0].name == "__cst__"):
                    fn.args = ([Func("__cst__", [fn.args[0]])]
                               + list(fn.args[1:]))
            for b in collect(sel, BinOp):
                if b.op in ("+", "-", "*", "/", "%", "DIV"):
                    b.strict = True
            # interval literals are frame-bound-only syntax; inside a
            # value expression the reference rejects them ("un-support
            # const node", query/fail_query.yaml)
            from openmldb_ray.sql.ast import Interval, WindowDef

            def _no_interval(x):
                if isinstance(x, WindowDef):
                    return
                if isinstance(x, Interval):
                    raise ValueError(
                        "interval literal is not a value expression")
                if hasattr(x, "__dataclass_fields__"):
                    for f in x.__dataclass_fields__:
                        v = getattr(x, f)
                        for it in (v if isinstance(v, list) else [v]):
                            for t in (it if isinstance(it, tuple)
                                      else [it]):
                                if hasattr(t, "__dataclass_fields__"):
                                    _no_interval(t)
            for it in sel.items:
                _no_interval(it)
            if sel.where is not None:
                _no_interval(sel.where)
            if sel.having is not None:
                _no_interval(sel.having)
        if sel.ctes:
            # CTEs become planned datasets in a scoped catalog layer
            scoped = dict(self.catalog.tables)
            for name, sub in sel.ctes.items():
                scoped[name] = Planner(
                    Catalog(self.catalog.sf_dir, scoped),
                    self.dialect, presorted=self.presorted).plan(sub)
            self.catalog = Catalog(self.catalog.sf_dir, scoped)
        self._resolve_scalar_subqueries(sel)
        if sel.set_ops:
            # UNION [ALL|DISTINCT] chain, left-associative
            # (cases/plan/union_query.yaml): branches align by
            # position, keep the left branch's names/types
            ops, sel.set_ops = sel.set_ops, []
            ctes, sel.ctes = sel.ctes, {}  # already installed above
            left = self.plan(sel, carry_window_order)
            return self._apply_set_ops(left, ops)
        # output names resolve from the ORIGINAL items (alias / bare
        # column name / source text) before any qualifier rewriting
        out_names = [self._out_name(it) for it in sel.items]
        cols_referenced = {c.name for c in collect(sel, Col)}
        if getattr(self, "carry_tag", None) \
                and getattr(self, "_carrying", True):
            cols_referenced.add(self.carry_tag)
        if any(isinstance(it.expr, Star) for it in sel.items):
            # SELECT * keeps every column — disable scan pruning
            cols_referenced = None
        ds, colset = self._from(sel.table, cols_referenced, sel)
        # alias scopes: qualified refs ({1}.c3 when both sides share
        # column names) resolve through the join's rename map
        scopes: dict[str, dict[str, str]] = {}
        if sel.table is not None:
            base_alias = sel.table.alias or sel.table.name
            if base_alias:
                scopes[base_alias] = {c: c for c in colset}
                if "." in base_alias:  # db-qualified FROM table
                    scopes.setdefault(base_alias.split(".")[-1],
                                      scopes[base_alias])
        for j in sel.joins:
            ds, colset = self._join(ds, colset, j, cols_referenced,
                                    scopes)
        if scopes:
            for c in collect(sel, Col):
                st = c.table
                if st is not None and st not in scopes \
                        and "." in st and st.split(".")[-1] in scopes:
                    # db-qualified reference (db1.t0.c1) resolving a
                    # table registered/aliased by its bare name
                    st = st.split(".")[-1]
                if st and st in scopes and c.name in scopes[st]:
                    c.name = scopes[st][c.name]
                    c.table = None
        if sel.where is not None:
            ds = _filter(ds, sel.where)

        # pull window calls / group aggregates out of the select items
        win_calls: list[tuple[str, WinCall]] = []
        agg_calls: list[tuple[str, Func]] = []
        out_items: list[SelectItem] = []
        for it, name in zip(sel.items, out_names):
            # agg-named funcs outside OVER are grouping aggregates even
            # without GROUP BY (global aggregate, one output row)
            expr, wcs, acs = self._extract(it.expr, True)
            win_calls.extend(wcs)
            agg_calls.extend(acs)
            out_items.append(SelectItem(expr, name, it.text))

        # HAVING aggregates (sum(col1) > 10) are computed as hidden agg
        # columns alongside the select-list aggregates, then filtered
        # on; the final projection drops them (reference GroupByPlan +
        # filter condition over the aggregated row)
        having = sel.having
        if having is not None:
            having, _hw, hacs = self._extract(having, True)
            agg_calls.extend(hacs)
        if win_calls:
            ds = self._apply_windows(ds, sel, win_calls, colset)
            if carry_window_order and not sel.group_by \
                    and not sel.distinct and not sel.order_by \
                    and getattr(self, "_win_order", None):
                # hidden storage-order key for an enclosing LAST JOIN
                # without ORDER BY: the window shuffle scrambles row
                # order, but the reference picks the newest-by-index-ts
                # match (fz_ddl/test_myhug.yaml id 0) — carry the
                # window's order column so the join can order on it
                out_items.append(SelectItem(Col(self._win_order),
                                            "__jord__", "__jord__"))
        if sel.group_by or agg_calls:
            ds = self._apply_groupby(ds, sel, agg_calls)
            colset = set(ds.schema().names)
        if having is not None:
            ds = _filter(ds, having)

        tag = getattr(self, "carry_tag", None)
        if tag and getattr(self, "_carrying", True) \
                and not sel.group_by and not agg_calls \
                and not sel.distinct \
                and not any(isinstance(it.expr, Star)
                            for it in out_items) \
                and tag in ds.schema().names \
                and tag not in [it.alias for it in out_items]:
            # request-mode instance marker (test harness): ride the
            # tag column through every left-spine projection so the
            # instance row is identifiable in the final output
            out_items.append(SelectItem(Col(tag), tag, tag))
        ds = self._project(ds, out_items)
        out_names = [self._out_name(it) for it in out_items]
        if sel.distinct:
            from openmldb_ray.functions.aggregates import distinct
            ds = distinct(ds, out_names)
        if sel.order_by:
            keys, desc = [], []
            derived: dict = {}
            for e, d in sel.order_by:
                if isinstance(e, Col):
                    keys.append(e.name)
                else:
                    # ORDER BY <expression>: evaluate over the OUTPUT
                    # columns into a hidden sort key, dropped after
                    nm = self._name("ob")
                    derived[nm] = e
                    keys.append(nm)
                desc.append(d)
            if derived:
                ds = _add_columns(ds, derived)
            ds = ds.sort(keys, descending=desc)
            if derived:
                ds = ds.drop_columns(list(derived))
        if sel.limit is not None:
            # OpenMLDB LIMIT 0 means "no limit"
            # (select/test_select_sample.yaml id 12); ANSI returns 0 rows
            if not (self.dialect == "openmldb" and sel.limit == 0):
                ds = ds.limit(sel.limit)
        return ds

    # ------------------------------------------- scalar subqueries
    def _resolve_scalar_subqueries(self, sel: Select) -> None:
        """Replace uncorrelated (SELECT ...) value expressions with
        literals BEFORE column-pruning walks the tree (so the outer
        scan never loads the subquery's columns). Runs after CTE
        installation so subqueries see the CTE scope. Correlated
        references surface as unknown-column errors from the inner
        plan — rewrapped with a clear message."""
        from openmldb_ray.sql.ast import ScalarSubquery

        def resolve(q: ScalarSubquery):
            try:
                ds = Planner(self.catalog, self.dialect,
                             presorted=self.presorted).plan(q.sel)
                rows = ds.take(2)
            except Exception as e:
                raise ValueError(
                    "scalar subquery failed to evaluate (correlated "
                    f"subqueries are not supported): {e}") from e
            if len(rows) != 1 or len(rows[0]) != 1:
                raise ValueError(
                    "scalar subquery must return exactly one row and "
                    f"one column, got {len(rows)} row(s)")
            return Lit(next(iter(rows[0].values())))

        def walk(x):
            if isinstance(x, ScalarSubquery):
                return resolve(x)
            if isinstance(x, Select):
                return x          # nested scopes resolve themselves
            if hasattr(x, "__dataclass_fields__"):
                for f in x.__dataclass_fields__:
                    v = getattr(x, f)
                    if isinstance(v, list):
                        setattr(x, f, [
                            tuple(walk(t) for t in it)
                            if isinstance(it, tuple) else walk(it)
                            for it in v])
                    elif isinstance(v, tuple):
                        setattr(x, f, tuple(walk(t) for t in v))
                    else:
                        setattr(x, f, walk(v))
            return x

        for it in sel.items:
            walk(it)
        sel.where = walk(sel.where)
        sel.having = walk(sel.having)
        sel.group_by = [walk(e) for e in sel.group_by]
        sel.order_by = [tuple(walk(t) for t in ob) if isinstance(ob, tuple)
                        else walk(ob) for ob in sel.order_by]

    # ----------------------------------------------------------- FROM
    def _from(self, t: TableRef | None, referenced: set, sel: Select):
        if t is None:
            # ConstProject (reference ConstProjectPlan.scala): FROM-less
            # SELECT of literal expressions — a one-row carrier table the
            # projection maps over; the carrier column never survives the
            # final projection
            ds = ray.data.from_arrow(
                pa.table({"__const__": pa.array([0], pa.int8())}))
            return ds, {"__const__"}
        if t.subquery is not None:
            ds = self.plan(t.subquery)
            return ds, set(ds.schema().names)
        ds = self.catalog.load(t.name, referenced)
        return ds, set(ds.schema().names)

    # ----------------------------------------------------------- JOIN
    def _join(self, left, lcols: set, j, referenced: set,
              scopes: dict | None = None):
        if j.table.subquery is not None:
            prev_carry = getattr(self, "_carrying", True)
            self._carrying = False  # tag rides the left spine only
            try:
                right = self.plan(j.table.subquery,
                                  carry_window_order=(j.kind == "last"
                                                      and j.order_by
                                                      is None))
            finally:
                self._carrying = prev_carry
        else:
            right = self.catalog.load(j.table.name, referenced)
        rnames = list(right.schema().names)
        hidden_ord = "__jord__" if "__jord__" in rnames else None
        if hidden_ord:
            rnames.remove(hidden_ord)
        rcols = set(rnames)
        r_alias = j.table.alias or j.table.name

        def side(c: Col) -> str:
            if c.table is not None:
                # db-qualified refs match an alias by bare-name suffix
                if c.table == r_alias or (
                        r_alias and (c.table.split(".")[-1] == r_alias
                                     or c.table ==
                                     r_alias.split(".")[-1])):
                    return "r"
                return "l"
            inl, inr = c.name in lcols, c.name in rcols
            if inl and not inr:
                return "l"
            if inr and not inl:
                return "r"
            raise ValueError(f"ambiguous join column {c.name!r}; "
                             "qualify it with a table alias")

        eqs, ineq, residual = _split_on(j.on)
        on, right_on = [], []
        for a, b in eqs:
            la, lb = side(a), side(b)
            if la == "l" and lb == "r":
                on.append(a.name)
                right_on.append(b.name)
            elif la == "r" and lb == "l":
                on.append(b.name)
                right_on.append(a.name)
            else:
                raise ValueError(f"cannot resolve join keys {a} = {b}")
        if j.kind in ("left", "inner", "right"):
            if ineq or residual:
                raise NotImplementedError("non-equi LEFT JOIN predicate")
            from openmldb_ray.joins.hash_join import hash_join
            if j.kind == "right":
                # RIGHT JOIN = LEFT JOIN with the sides swapped. The
                # raw swap emits right-table columns first, suffixes
                # the LEFT side's collisions, and folds the left key
                # away — all diverging from standard left-first output.
                # Standard RIGHT JOIN keeps BOTH key columns (the left
                # one NULL for unmatched right rows), so duplicate the
                # left keys as payload (they ride the swap's
                # null-extension), then rename/reorder to left-first
                # with the RIGHT side suffixed.
                lnames = list(left.schema().names)
                dup = {k: f"__rjk{i}__" for i, k in enumerate(on)}

                def _add_dups(b: pa.Table, _dup=tuple(dup.items())
                              ) -> pa.Table:
                    for k, d in _dup:
                        b = b.append_column(d, b[k])
                    return b
                _add_dups.__name__ = "right_join_key_dup"
                left2 = left.map_batches(_add_dups,
                                         batch_format="pyarrow")
                out = hash_join(right, left2, on=right_on, right_on=on,
                                how="left")
                # positional schema of the swapped join's output:
                cur_order = list(rnames) \
                    + [(c + "_r" if c in rcols else c)
                       for c in lnames if c not in on] \
                    + [dup[k] for k in on]
                used = set(lnames)
                final_r = []
                for c in rnames:
                    want = c
                    while want in used:
                        want += "_r"
                    final_r.append(want)
                    used.add(want)
                pos_final = final_r \
                    + [c for c in lnames if c not in on] + list(on)
                select_order = lnames + final_r

                def _normalize(b: pa.Table, _cur=tuple(cur_order),
                               _fin=tuple(pos_final),
                               _ord=tuple(select_order)) -> pa.Table:
                    assert list(b.column_names) == list(_cur), \
                        (b.column_names, _cur)
                    return b.rename_columns(list(_fin)) \
                        .select(list(_ord))
                _normalize.__name__ = "right_join_normalize"
                out = out.map_batches(_normalize,
                                      batch_format="pyarrow")
                if scopes is not None and r_alias:
                    ren = dict(zip(rnames, final_r))
                    scopes[r_alias] = ren
                    if "." in r_alias:
                        scopes.setdefault(r_alias.split(".")[-1], ren)
                return out, set(select_order)
            else:
                out = hash_join(left, right, on=on, right_on=right_on,
                                how=j.kind)
        elif j.kind in ("asof_left", "last"):
            from openmldb_ray.joins import last_join
            order_by = left_ts = None
            descending = False
            if j.kind == "last" and j.order_by is not None and ineq:
                # explicit ORDER BY: column inequalities are plain
                # join conditions, not the as-of axis
                # (multiple_databases id 11: ORDER BY c4 with
                # c3 <= c3 filtering candidates)
                residual = residual + [BinOp(op, a, b)
                                       for a, b, op in ineq]
                ineq = []
            if j.kind == "asof_left" or ineq:
                if len(ineq) != 1:
                    raise ValueError(
                        "point-in-time join needs exactly one "
                        "inequality in ON")
                a, b, op = ineq[0]
                # normalize to left_ts >= right_ts
                if op in (">=", ">"):
                    lts, rts = a, b
                else:
                    lts, rts = b, a
                if side(lts) != "l":
                    lts, rts = rts, lts
                order_by, left_ts = rts.name, lts.name
            if j.kind == "last" and j.order_by is not None:
                order_by = j.order_by[0].name
                descending = j.order_by[1]
                rsch = right.schema()
                t = dict(zip(rsch.names, rsch.types)).get(order_by)
                if t is not None and not (pa.types.is_integer(t)
                                          or pa.types.is_timestamp(t)):
                    raise ValueError(
                        f"LAST JOIN ORDER BY column {order_by!r} has "
                        f"type {t}; the reference requires an integer "
                        "or timestamp order key "
                        "(test_lastjoin_simple.yaml ids 7-10)")
            if j.kind == "last" and order_by is None \
                    and hidden_ord is not None:
                order_by = hidden_ord
            # the reference's LAST JOIN emits right key columns too
            # (select * / {1}.key are addressable) — carry ALL right
            # columns as payload; collisions get the "_r" suffix
            payload = rnames if j.kind == "last" else None
            cond = (_residual_condition(residual, side)
                    if residual else None)
            out = last_join(left, right, on=on, right_on=right_on,
                            order_by=order_by, left_ts=left_ts,
                            descending=bool(descending),
                            payload=payload, condition=cond)
        else:
            raise NotImplementedError(j.kind)
        if scopes is not None and r_alias:
            # how the joins name right columns: payload collisions get
            # the "_r" suffix (repeated for multi-way joins, matching
            # the join emit); keys not carried fold into the left key
            keys_carried = j.kind == "last"
            ren = {}
            for c in rcols:
                if c in right_on and not keys_carried:
                    ren[c] = on[right_on.index(c)]
                elif c in lcols:
                    cand = c + "_r"
                    while cand in lcols:
                        cand += "_r"
                    ren[c] = cand
                else:
                    ren[c] = c
            scopes[r_alias] = ren
            if "." in r_alias:  # also addressable by bare table name
                scopes.setdefault(r_alias.split(".")[-1], ren)
        return out, set(out.schema().names)

    # ----------------------------------------------------------- window
    def _extract(self, e, in_groupby: bool):
        """Replace WinCall / aggregate Func nodes with generated Cols;
        return (new_expr, [(name, WinCall)], [(name, Func)])."""
        wins: list = []
        aggs: list = []

        def walk(x):
            if isinstance(x, WinCall):
                if not _is_window_fn(x.func.name):
                    # scalar wrapper over window funcs: identity(expr)
                    # OVER w (test_window_union.yaml id 16),
                    # abs(sum(c)) OVER w, isnull(lag(c)) OVER w
                    # (test_udaf_function.yaml 42/49). Nested window
                    # funcs bind to w; the wrapper becomes a plain
                    # post-window projection.
                    return walk(_bind_window(x.func, x))
                nm = self._name("w")
                wins.append((nm, x))
                return Col(nm)
            if isinstance(x, Func) and in_groupby and \
                    x.name in _GROUP_AGGS:
                nm = self._name("g")
                aggs.append((nm, x))
                return Col(nm)
            if hasattr(x, "__dataclass_fields__"):
                for f in x.__dataclass_fields__:
                    v = getattr(x, f)
                    if isinstance(v, list):
                        setattr(x, f, [
                            tuple(walk(t) for t in it) if isinstance(
                                it, tuple) else walk(it) for it in v])
                    elif isinstance(v, tuple):
                        setattr(x, f, tuple(walk(t) for t in v))
                    else:
                        setattr(x, f, walk(v))
            return x
        return walk(e), wins, aggs

    def _apply_windows(self, ds, sel: Select, win_calls, colset):
        from openmldb_ray.window.runner import window_agg_multi
        # group calls by their window definition
        defs: dict[int, WindowDef] = {}
        groups: dict[int, list] = {}
        for nm, wc in win_calls:
            if wc.window is not None:
                if wc.window not in sel.windows:
                    raise ValueError(f"unknown window {wc.window}")
                wd = sel.windows[wc.window]
                key = id(wd)
            else:
                wd = wc.inline
                key = id(wd)
            defs[key] = wd
            groups.setdefault(key, []).append((nm, wc.func))

        for key, calls in groups.items():
            wd = defs[key]
            spec, sort_cols, derived = self._window_spec(wd)
            self._win_order = sort_cols[0] if sort_cols else None
            aggs, derived2 = self._window_aggs(calls)
            derived.update(derived2)
            if derived:
                ds = _add_columns(ds, derived)
            schema = ds.schema()
            self._check_window_types(spec, sort_cols, aggs, schema)
            passthrough = sorted(set(schema.names))

            def with_derived(u):
                # union rows FEED frames, so window-argument columns
                # derived from base columns (count_where conditions,
                # computed aggregands — usecase/autox.yaml w2_visa_cnt)
                # must be computed on union rows too; only columns
                # whose inputs the union table lacks ride as nulls
                if not derived:
                    return u
                names = set(u.schema().names)
                ok = {nm: ex for nm, ex in derived.items()
                      if {c.name for c in collect(ex, Col)} <= names}
                return _add_columns(u, ok) if ok else u

            union_ds = []
            main_full = (self.catalog.full_schema(sel.table.name)
                         if sel.table is not None and sel.table.name
                         else None)
            for tref in wd.union_tables:
                if tref.subquery is not None:
                    # pad/cast the union subquery to the primary's
                    # schema: union rows only FEED frames (never emit),
                    # so columns they lack — e.g. features computed by
                    # an earlier window stage — ride as typed nulls
                    prev_carry = getattr(self, "_carrying", True)
                    self._carrying = False
                    try:
                        union_ds.append(_pad_to_schema(
                            with_derived(self.plan(tref.subquery)),
                            schema))
                    finally:
                        self._carrying = prev_carry
                    continue
                # the reference requires FULL schema equality between
                # the primary and every union table
                # (WindowAggPlanUtil.scala:41-92; union yaml ids 1-3).
                # After a join the window input is the JOIN output —
                # the union table must match that shape instead
                # (test_lastjoin_complex.yaml id 2), so conform via
                # pad/cast rather than name equality.
                if sel.joins:
                    union_ds.append(_pad_to_schema(
                        with_derived(self.catalog.load(tref.name, None)),
                        schema))
                    continue
                u_full = self.catalog.full_schema(tref.name)
                if main_full is not None and \
                        "__reqtag__" in main_full.names:
                    main_full = pa.schema(
                        [f for f in main_full
                         if f.name != "__reqtag__"])
                if main_full is not None and u_full is not None and (
                        main_full.names != u_full.names
                        or list(main_full.types) != list(u_full.types)):
                    raise ValueError(
                        f"WINDOW UNION table {tref.name!r} schema "
                        f"differs from the primary table's "
                        f"({u_full.names} vs {main_full.names})")
                # pad: columns generated by EARLIER window stages
                # (chained multi-window queries, test_window.yaml id
                # 32) ride as typed nulls in union rows
                union_ds.append(_pad_to_schema(
                    with_derived(self.catalog.load(tref.name, None)),
                    schema))
            if self.skew_opt and not union_ds and \
                    sort_cols == [spec.order_by] \
                    and len(spec.keys) == 1:
                # the reference's openmldb.window.skew.opt: quantile-
                # salt hot keys with replicated history; detects hot
                # keys itself and degrades to the plain window plan
                from openmldb_ray.skew import salted_window_agg
                ds = salted_window_agg(ds, spec, aggs,
                                       passthrough=passthrough,
                                       min_rows=self.skew_min_rows)
                continue
            if self.presorted and not union_ds and \
                    sort_cols == [spec.order_by]:
                # presorted optimization flag (the analog of the
                # reference's plan-selection configs like
                # openmldb.window.skew.opt): try the zero-shuffle
                # blockwise plan; verification failure / unbounded
                # frames / degenerate economics fall back to the
                # shuffle plan
                from openmldb_ray.skew import _NotPresorted
                from openmldb_ray.window.blockwise import \
                    blockwise_window_agg
                try:
                    ds = blockwise_window_agg(
                        ds, [(spec, aggs)], passthrough=passthrough)
                    continue
                except _NotPresorted:
                    pass
            ds = window_agg_multi(
                ds, [(spec, aggs)], union_ds=union_ds,
                passthrough=passthrough, sort_cols=sort_cols)
        return ds

    def _check_window_types(self, spec, sort_cols, aggs, schema):
        """Eager rejection semantics mirroring the reference
        (cases/function/window/error_window.yaml): unknown columns
        (ids 11/16) and non-orderable ORDER BY types (ids 4-7) fail at
        plan time, not inside tasks."""
        have = dict(zip(schema.names, schema.types))
        needed = list(spec.keys) + sort_cols + \
            [a.col for a in aggs if a.col] + \
            [a.cate for a in aggs if a.cate]
        for c in needed:
            if c not in have:
                raise ValueError(f"unknown column {c!r} in window "
                                 f"(have {sorted(have)})")
        t = have[sort_cols[0]]
        ok = (pa.types.is_integer(t) or pa.types.is_timestamp(t)
              or (self.dialect == "ansi" and pa.types.is_date(t)))
        if not ok:
            raise ValueError(
                f"window ORDER BY column {sort_cols[0]!r} has type {t}; "
                "the reference requires an integer or timestamp order "
                "key (error_window.yaml ids 4-7)")
        if self.dialect != "openmldb":
            return

        def kindof(c):
            tt = have[c]
            if pa.types.is_floating(tt):
                return "float"
            if pa.types.is_timestamp(tt):
                return "ts"
            if pa.types.is_date(tt):
                return "date"
            if pa.types.is_boolean(tt):
                return "bool"
            if pa.types.is_string(tt) or pa.types.is_large_string(tt):
                return "str"
            return "int"
        # argument-type rules (function/test_udaf_function.yaml):
        # - *_cate / *_where values must be numeric (ids 18/19/26);
        # - cate keys must not be float/double/bool (id 25);
        # - avg rejects timestamp/date (ids 8/11), sum accepts
        #   timestamp (id 7) but not date (id 9)
        for a in aggs:
            base = a.func[:-6] if a.func.endswith("_where") else a.func
            if a.cate is not None:
                if a.col and kindof(a.col) not in ("int", "float"):
                    raise ValueError(
                        f"{a.func} value column {a.col!r} must be "
                        f"numeric, got {have[a.col]}")
                if kindof(a.cate) in ("float", "bool"):
                    raise ValueError(
                        f"{a.func} category column {a.cate!r} cannot "
                        f"be {have[a.cate]}")
            elif a.func == "count_where" and a.col:
                # counting accepts any non-bool value (ids 17 vs 19)
                if kindof(a.col) == "bool":
                    raise ValueError(
                        "count_where value column cannot be bool")
            elif a.func.endswith("_where") and a.col:
                if kindof(a.col) not in ("int", "float"):
                    raise ValueError(
                        f"{a.func} value column {a.col!r} must be "
                        f"numeric, got {have[a.col]}")
            elif base == "avg" and a.col and kindof(a.col) in ("ts",
                                                               "date"):
                raise ValueError(
                    f"avg over {have[a.col]} is not defined")
            elif base in ("sum", "sum_zero") and a.col \
                    and kindof(a.col) in ("date", "str", "bool"):
                raise ValueError(
                    f"sum over {have[a.col]} is not defined")

    def _window_spec(self, wd: WindowDef):
        derived: dict = {}
        keys = []
        for e in wd.partition_by:
            if isinstance(e, Col):
                keys.append(e.name)
            else:
                nm = self._name("pk")
                derived[nm] = e
                keys.append(nm)
        sort_cols = []
        for e, desc in wd.order_by:
            if desc:
                raise NotImplementedError("descending window ORDER BY")
            if not isinstance(e, Col):
                raise NotImplementedError("window ORDER BY expression")
            sort_cols.append(e.name)
        kw: dict = {}
        ft = wd.frame_type
        if ft is None:
            kw["preceding_rows"] = _UNBOUNDED_ROWS
        else:
            s, e_ = wd.start, wd.end
            if ft == "rows":
                from openmldb_ray.sql.ast import Interval as _Iv
                for b in (s, e_):
                    if b is not None and b.value is not None and \
                            collect(b.value, _Iv):
                        raise ValueError(
                            "ROWS frame bounds take plain row counts, "
                            "not time units (error_window.yaml id 8)")
                if wd.max_size is not None:
                    raise ValueError(
                        "ROWS windows do not support MAXSIZE — use "
                        "ROWS_RANGE (error_window.yaml id 13)")
                if s.kind == "unbounded":
                    kw["preceding_rows"] = _UNBOUNDED_ROWS
                elif s.kind == "preceding":
                    kw["preceding_rows"] = int(const_eval(s.value))
                elif s.kind == "current":
                    kw["preceding_rows"] = 0
                if e_ and e_.kind == "preceding":
                    # 'k OPEN PRECEDING' end bound is exclusive: for
                    # rows it equals 'k+1 PRECEDING' closed
                    # (test_window.yaml id 36)
                    kw["end_offset_rows"] = int(const_eval(e_.value)) \
                        + (1 if e_.is_open else 0)
            else:  # range / rows_range
                if s.kind == "unbounded":
                    kw["preceding_range"] = _UNBOUNDED_RANGE
                elif s.kind == "preceding":
                    kw["preceding_range"] = int(const_eval(s.value))
                elif s.kind == "current":
                    kw["preceding_range"] = 0
                if e_ and e_.kind == "preceding":
                    # exclusive OPEN range end: ts < t-k == ts <= t-k-1
                    # in the integer time unit (test_window.yaml id 37)
                    kw["end_offset_range"] = int(const_eval(e_.value)) \
                        + (1 if e_.is_open else 0)
            if s is not None and s.is_open:
                kw["open_preceding"] = True
        if wd.max_size is not None:
            if wd.max_size <= 0:
                raise ValueError("MAXSIZE must be positive "
                                 "(test_maxsize.yaml id 3)")
            kw["max_size"] = wd.max_size
        if wd.exclude_current_time:
            kw["exclude_current_time"] = True
        if wd.exclude_current_row or wd.instance_not_in_window:
            # ANSI EXCLUDE CURRENT ROW == OpenMLDB INSTANCE_NOT_IN_WINDOW
            # for unique order keys (prior peers remain either way)
            kw["instance_not_in_window"] = True
        spec = WindowSpec(tuple(keys), sort_cols[0], **kw)
        return spec, sort_cols, derived

    def _window_aggs(self, calls):
        aggs: list[Agg] = []
        derived: dict = {}

        def argcol(a) -> str | None:
            if isinstance(a, Col):
                return a.name
            nm = self._name("a")
            derived[nm] = a
            return nm

        _SPLIT_FNS = {"fz_window_split", "fz_window_split_by_key",
                      "fz_window_split_by_value", "fz_split",
                      "fz_split_by_key", "fz_split_by_value"}

        def plan_one(nm, fn):
            name = fn.name
            if name in _NESTED_OUTER and fn.args and any(
                    _contains_inner_agg(a) for a in fn.args):
                # nested aggregate-in-aggregate window expression
                # (test_udaf_function.yaml ids 43/47-49/53): inner
                # aggregates become hidden per-instance scalar aggs,
                # the outer reduces an expression over frame rows
                self._plan_nested(nm, fn, aggs, plan_one)
                return
            if name in ("distinct_count", "count", "top1_ratio",
                        "fz_top1_ratio", "topn_frequency",
                        "fz_topn_frequency", "fz_join") and fn.args \
                    and isinstance(fn.args[0], Func) \
                    and fn.args[0].name in _SPLIT_FNS:
                # composite FeatureZero form: agg over the flattened
                # per-frame split items (test_feature_zero_function.yaml
                # ids 1/3/4/5; reference udf registry composes these as
                # list-typed UDAF arguments)
                base = {"fz_top1_ratio": "top1_ratio",
                        "fz_topn_frequency": "topn_frequency"}.get(
                            name, name)
                inner = fn.args[0]
                iparams = tuple(const_eval(a) for a in inner.args[1:])
                oparams = tuple(const_eval(a) for a in fn.args[1:])
                aggs.append(Agg(base + "__split",
                                argcol(inner.args[0]), nm,
                                params=(inner.name,) + iparams + oparams))
                return
            if name == "lead" and self.dialect == "ansi":
                k = int(const_eval(fn.args[1])) if len(fn.args) > 1 else 1
                aggs.append(Agg("lead", argcol(fn.args[0]), nm, k=k))
                return
            if name == "lag":
                k = int(const_eval(fn.args[1])) if len(fn.args) > 1 else 1
                aggs.append(Agg("lag", argcol(fn.args[0]), nm, k=k))
                return
            if name == "at":
                k = int(const_eval(fn.args[1]))
                aggs.append(Agg("at", argcol(fn.args[0]), nm, k=k))
                return
            if name == "last_value":
                if not fn.ignore_nulls:
                    raise NotImplementedError(
                        "last_value is supported with IGNORE NULLS "
                        "(forward fill); plain last_value of a "
                        "history frame is the current row")
                aggs.append(Agg("last_value_ignore_nulls",
                                argcol(fn.args[0]), nm))
                return
            if name == "first_value":
                # ANSI first_value = oldest frame row; OpenMLDB
                # first_value = newest (window_functions_def.cc:154)
                f = ("last_value_in_frame" if self.dialect == "ansi"
                     else "first_value")
                aggs.append(Agg(f, argcol(fn.args[0]), nm))
                return
            if name == "count" and fn.args and isinstance(fn.args[0],
                                                          Star):
                aggs.append(Agg("count", None, nm))
                return
            if name == "count" and fn.distinct:
                aggs.append(Agg("distinct_count", argcol(fn.args[0]), nm))
                return
            if name in ("distinct_count", "top1_ratio"):
                aggs.append(Agg(name, argcol(fn.args[0]), nm))
                return
            if name == "count_where" and fn.args \
                    and isinstance(fn.args[0], Star):
                aggs.append(Agg("count_where", None, nm,
                                where=argcol(fn.args[1])))
                return
            if name in ("sum_where", "count_where", "avg_where",
                        "min_where", "max_where"):
                if name == "sum_where" and self.dialect == "openmldb":
                    # like plain sum: an empty / no-matching frame
                    # yields 0, not NULL (test_udaf_function.yaml id
                    # 53 a3 row 0; avg_where stays NULL there)
                    name = "sum_zero_where"
                aggs.append(Agg(name, argcol(fn.args[0]), nm,
                                where=argcol(fn.args[1])))
                return
            if name.endswith("_cate_where"):
                # f(value, condition, category[, n]) — udfs_8h.md
                kw = {}
                params = ()
                if name.startswith("top_n_key_"):
                    try:
                        kw["k"] = int(const_eval(fn.args[3]))
                    except ValueError:
                        # variable n: evaluated per instance (a column
                        # ref or an expression with nested aggregates —
                        # hybridsql_gen composites)
                        hidden = self._plan_scalar_expr(
                            fn.args[3], aggs, plan_one)
                        kw["k"] = 0
                        params = ("k_scalar", hidden)
                aggs.append(Agg(name, argcol(fn.args[0]), nm,
                                where=argcol(fn.args[1]),
                                cate=argcol(fn.args[2]),
                                params=params, **kw))
                return
            if name in ("top", "topn_frequency", "fz_topn_frequency"):
                k = int(const_eval(fn.args[1]))
                aggs.append(Agg(name, argcol(fn.args[0]), nm, k=k))
                return
            if name.endswith("_cate"):
                aggs.append(Agg(name, argcol(fn.args[0]), nm,
                                cate=argcol(fn.args[1])))
                return
            if name.startswith("fz_"):
                params = tuple(const_eval(a) for a in fn.args[1:])
                aggs.append(Agg(name, argcol(fn.args[0]), nm,
                                params=params))
                return
            if name == "row_number":
                aggs.append(Agg("row_number", None, nm))
                return
            if name in ("sum", "count", "min", "max", "avg"):
                # OpenMLDB window sum over an empty frame is 0, not
                # NULL (test_maxsize.yaml ids 6-7); ANSI keeps NULL
                if name == "sum" and self.dialect == "openmldb":
                    name = "sum_zero"
                aggs.append(Agg(name, argcol(fn.args[0]), nm))
                return
            raise NotImplementedError(f"window function {name}")

        for nm, fn in calls:
            plan_one(nm, fn)
        return aggs, derived

    def _plan_nested(self, nm, fn, aggs, plan_one):
        """Plan ``outer(expr-with-inner-aggs) OVER w`` — the
        reference's nested-UDAF window form (test_udaf_function.yaml
        ids 43/47-49/53, hybridsql_gen composites).

        Semantics (verified against the expected rows): each INNER
        aggregate call evaluates to one scalar per instance over the
        SAME frame (first_value/lag(k) are instance-relative buffer
        reads), the value/where expression evaluates per FRAME ROW
        with those scalars broadcast, and the outer aggregate reduces
        the results. Inner calls become hidden kernel aggs (name
        prefix ``__h``; the runner drops them from output); inner
        calls that THEMSELVES reference scalars recurse into this
        form."""
        import copy
        fn = copy.deepcopy(fn)

        def walk(x):
            return self._rewrite_inner(x, aggs, plan_one)

        val_expr = walk(fn.args[0])
        owhere = walk(fn.args[1]) if fn.name.endswith("_where") else None
        exprs = [val_expr] + ([owhere] if owhere is not None else [])
        need = sorted({c.name for e in exprs for c in collect(e, Col)
                       if not c.name.startswith("__s_")})
        scalars = sorted({c.name[4:] for e in exprs
                          for c in collect(e, Col)
                          if c.name.startswith("__s_")})
        outer = fn.name
        if outer == "sum" and self.dialect == "openmldb":
            outer = "sum_zero"
        val_fn = self._compile_nexpr(val_expr, need, scalars)
        where_fn = (self._compile_nexpr(owhere, need, scalars)
                    if owhere is not None else None)
        aggs.append(Agg(outer + "__nexpr", None, nm,
                        params=(val_fn, where_fn, tuple(need),
                                tuple(scalars))))

    def _rewrite_inner(self, x, aggs, plan_one):
        """Replace nested aggregate Func nodes (innermost first) with
        hidden per-instance scalar refs ``Col(__s_<hidden>)``."""
        if isinstance(x, Func) and x.name in _NESTED_INNER:
            x.args = [self._rewrite_inner(a, aggs, plan_one)
                      for a in x.args]
            hidden = self._name("h")
            if any(_scalar_refs(a) for a in x.args):
                self._plan_nested(hidden, x, aggs, plan_one)
            else:
                plan_one(hidden, x)
            return Col("__s_" + hidden)
        if hasattr(x, "__dataclass_fields__") \
                and not isinstance(x, (Col, WindowDef)):
            for f in x.__dataclass_fields__:
                v = getattr(x, f)
                if isinstance(v, list):
                    setattr(x, f, [
                        tuple(self._rewrite_inner(t, aggs, plan_one)
                              for t in it) if isinstance(it, tuple)
                        else self._rewrite_inner(it, aggs, plan_one)
                        for it in v])
                elif isinstance(v, tuple):
                    setattr(x, f, tuple(
                        self._rewrite_inner(t, aggs, plan_one)
                        for t in v))
                else:
                    setattr(x, f,
                            self._rewrite_inner(v, aggs, plan_one))
        return x

    def _plan_scalar_expr(self, e, aggs, plan_one) -> str:
        """Per-instance scalar expression containing nested aggregates
        (variable top-n arguments, hybridsql_gen composites): plans a
        hidden ``instance__nexpr`` agg and returns its name."""
        import copy
        e = self._rewrite_inner(copy.deepcopy(e), aggs, plan_one)
        need = sorted({c.name for c in collect(e, Col)
                       if not c.name.startswith("__s_")})
        scalars = sorted({c.name[4:] for c in collect(e, Col)
                          if c.name.startswith("__s_")})
        hidden = self._name("h")
        aggs.append(Agg("instance__nexpr", None, hidden,
                        params=(self._compile_nexpr(e, need, scalars),
                                None, tuple(need), tuple(scalars))))
        return hidden

    def _compile_nexpr(self, ex, need_cols, scalar_names):
        """Compile an expression over (frame columns + broadcast
        instance scalars) into ``fn(frame_arrays, scalars, m) ->
        np.ndarray`` for the kernel's __nexpr slow path."""
        from openmldb_ray.io import column_to_float

        def fn(frame, scalars, m):
            import numpy as _np
            cols = {}
            for c in need_cols:
                arr = frame[c]
                if arr.dtype == object:
                    cols[c] = pa.array(arr.tolist())
                else:
                    cols[c] = pa.array(arr, from_pandas=True)
            for s in scalar_names:
                v = scalars[s]
                if isinstance(v, _np.generic):
                    v = v.item()
                if isinstance(v, float) and v != v:
                    v = None
                if v is None:
                    # type the null broadcast from nothing: strings are
                    # the only object scalars the inner aggs emit
                    cols["__s_" + s] = pa.nulls(m, pa.string())
                else:
                    cols["__s_" + s] = pa.array([v] * m)
            t = pa.table(cols) if cols else pa.table(
                {"__dummy__": pa.nulls(m)})
            r = eval_expr(ex, t)
            if isinstance(r, (pa.Array, pa.ChunkedArray)):
                return column_to_float(r)
            if hasattr(r, "as_py"):
                r = r.as_py()
            if isinstance(r, bool):
                r = float(r)
            if r is None or isinstance(r, str):
                out = _np.full(m, None, dtype=object)
                out[:] = r
                return out
            return _np.full(m, float(r))
        return fn

    # ----------------------------------------------------------- groupby
    def _apply_groupby(self, ds, sel: Select, agg_calls):
        from openmldb_ray.functions.aggregates import grouped_aggregate
        keys = []
        derived: dict = {}
        for e in sel.group_by:
            if isinstance(e, Col):
                keys.append(e.name)
            else:
                nm = self._name("gk")
                derived[nm] = e
                keys.append(nm)
        if self.dialect == "openmldb" and keys and not derived:
            # the reference rejects float/double grouping keys
            # (v040/test_groupby.yaml ids 6-7: Untyped partition keys)
            sch = ds.schema()
            for k, t in zip(sch.names, sch.types):
                if k in keys and t in (pa.float32(), pa.float64()):
                    raise ValueError(
                        f"GROUP BY key {k!r} has float type {t}; "
                        "the reference rejects float partition keys")
        plan: dict = {}
        for nm, fn in agg_calls:
            kind = _GROUP_AGGS[fn.name]
            if fn.name == "count" and (not fn.args or isinstance(
                    fn.args[0], Star)):
                plan[nm] = ("count", None)
                continue
            a = fn.args[0]
            from openmldb_ray.sql.ast import Lit
            if self.dialect == "openmldb" and fn.name == "count" and \
                    isinstance(a, Lit):
                # count(const) is a compile error in the reference
                # (v040/test_udaf.yaml id 1); count(*) is the valid form
                raise ValueError("count over a constant is not "
                                 "supported; use count(*)")
            if isinstance(a, Col):
                col = a.name
            else:
                col = self._name("ga")
                derived[col] = a
            if fn.name == "percentile_approx":
                # second arg: the quantile fraction, a literal
                if len(fn.args) != 2 or not isinstance(fn.args[1], Lit):
                    raise ValueError(
                        "percentile_approx(col, q) needs a literal q")
                plan[nm] = (kind, col, float(fn.args[1].val))
            else:
                plan[nm] = (kind, col)
        if not keys:
            # global aggregate: one output row — synthesize a constant
            # group key (the partial-combine path still applies)
            from openmldb_ray.sql.ast import Lit
            derived["__gall__"] = Lit(1)
            keys = ["__gall__"]
            drop_key = True
        else:
            drop_key = False
        if derived:
            ds = _add_columns(ds, derived)
        out = grouped_aggregate(ds, keys, plan)
        return out.drop_columns(["__gall__"]) if drop_key else out

    # ----------------------------------------------------------- project
    def _out_name(self, it: SelectItem) -> str:
        if it.alias:
            return it.alias
        if isinstance(it.expr, Col):
            return it.expr.name
        return it.text

    def _project(self, ds, items):
        if len(items) == 1 and isinstance(items[0].expr, Star):
            return ds
        names = [self._out_name(it) for it in items]
        # duplicate output names (select a.c1, b.c1) break Ray's block
        # schema handling — disambiguate with a strippable marker
        seen: dict = {}
        for i, n in enumerate(names):
            if n in seen:
                seen[n] += 1
                names[i] = f"{n}__dup{seen[n]}__"
            else:
                seen[n] = 0
        exprs = [it.expr for it in items]
        star = any(isinstance(e, Star) for e in exprs)

        def fn(t: pa.Table) -> pa.Table:
            cols, ns = [], []
            for e, n in zip(exprs, names):
                if isinstance(e, Star):
                    for c in t.column_names:
                        if not c.startswith("__"):
                            ns.append(c)
                            cols.append(t[c])
                    continue
                v = eval_expr(e, t)
                if isinstance(v, pa.Scalar):
                    v = pa.nulls(t.num_rows, v.type) if v.as_py() is None \
                        else pa.array([v.as_py()] * t.num_rows,
                                      type=v.type)
                elif not hasattr(v, "type"):
                    v = pa.array([v] * t.num_rows)
                ns.append(n)
                cols.append(v)
            return pa.table(cols, names=ns)
        fn.__name__ = "sql_project"
        return ds.map_batches(fn, batch_format="pyarrow") if not star \
            else ds.map_batches(fn, batch_format="pyarrow")


_WINDOW_FUNC_NAMES = (_WIN_DIRECT
                      | {"last_value", "distinct_count", "top1_ratio"}
                      | {f + "_where" for f in
                         ("sum", "count", "min", "max", "avg")})


def _is_window_fn(name: str) -> bool:
    return (name in _WINDOW_FUNC_NAMES
            or name.endswith("_cate") or name.endswith("_cate_where"))


def _bind_window(e, wc: WinCall):
    """Rewrite bare window-func calls inside ``e`` to WinCalls bound
    to ``wc``'s window (identity(...) OVER w lifting)."""
    import copy
    if isinstance(e, Func) and _is_window_fn(e.name):
        return WinCall(e, wc.window, wc.inline)
    if hasattr(e, "__dataclass_fields__"):
        e = copy.copy(e)
        for f in e.__dataclass_fields__:
            v = getattr(e, f)
            if isinstance(v, list):
                setattr(e, f, [
                    tuple(_bind_window(t, wc) for t in it)
                    if isinstance(it, tuple) else _bind_window(it, wc)
                    for it in v])
            elif isinstance(v, tuple):
                setattr(e, f, tuple(_bind_window(t, wc) for t in v))
            elif hasattr(v, "__dataclass_fields__"):
                setattr(e, f, _bind_window(v, wc))
        return e
    return e


def _pad_to_schema(ds, schema) -> ray.data.Dataset:
    """Conform ``ds`` to the (Ray) schema: add missing columns as
    typed nulls, cast type mismatches, order columns identically."""
    names = list(schema.names)
    types = dict(zip(schema.names, schema.types))

    def fn(b: pa.Table) -> pa.Table:
        cols = {}
        for n in names:
            if n in b.column_names:
                col = b[n]
                if col.type != types[n]:
                    col = col.cast(types[n])
                cols[n] = col
            else:
                cols[n] = pa.nulls(b.num_rows, types[n])
        return pa.table(cols)
    fn.__name__ = "pad_to_schema"
    return ds.map_batches(fn, batch_format="pyarrow")


def _filter(ds, cond):
    def fn(t: pa.Table) -> pa.Table:
        mask = eval_expr(cond, t)
        import pyarrow.compute as pc
        return t.filter(pc.fill_null(mask, False))
    fn.__name__ = "sql_filter"
    return ds.map_batches(fn, batch_format="pyarrow")


def _add_columns(ds, derived: dict):
    def fn(t: pa.Table) -> pa.Table:
        for nm, e in derived.items():
            v = eval_expr(e, t)
            if not hasattr(v, "type"):
                v = pa.array([v] * t.num_rows)
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            t = t.append_column(nm, v)
        return t
    fn.__name__ = "sql_derive"
    return ds.map_batches(fn, batch_format="pyarrow")


def _split_on(e):
    """ON conjunction -> ([(colA, colB) equalities], [(a, b, op)
    inequalities], [residual predicate exprs]).

    Residuals (BETWEEN / IN / LIKE / comparisons against literals)
    run as the join's non-equi condition over candidate pairs — the
    reference compiles them into a row predicate
    (nodes/JoinPlan.scala:108-143)."""
    eqs, ineq, residual = [], [], []

    def walk(x):
        if isinstance(x, BinOp) and x.op == "AND":
            walk(x.l)
            walk(x.r)
            return
        if isinstance(x, BinOp) and x.op == "=":
            if isinstance(x.l, Col) and isinstance(x.r, Col):
                eqs.append((x.l, x.r))
                return
        if isinstance(x, BinOp) and x.op in (">=", "<=", ">", "<"):
            if isinstance(x.l, Col) and isinstance(x.r, Col):
                ineq.append((x.l, x.r, x.op))
                return
        residual.append(x)
    walk(e)
    return eqs, ineq, residual


def _residual_condition(residuals, side):
    """Build a last_join condition callable from residual ON
    predicates: rewrite each column to a side-prefixed name, then
    evaluate the conjunction vectorized over the candidate-pair
    arrays (NULL -> no match)."""
    import copy

    def prefix(x):
        if isinstance(x, Col):
            tag = "l" if side(x) == "l" else "r"
            return Col(f"__{tag}__{x.name}")
        if hasattr(x, "__dataclass_fields__"):
            x = copy.copy(x)
            for f in x.__dataclass_fields__:
                v = getattr(x, f)
                if isinstance(v, list):
                    setattr(x, f, [prefix(i) for i in v])
                elif isinstance(v, tuple):
                    setattr(x, f, tuple(prefix(i) for i in v))
                else:
                    setattr(x, f, prefix(v))
        return x

    exprs = [prefix(copy.deepcopy(r)) for r in residuals]

    def cond(lcols: dict, rcols: dict):
        import numpy as np
        cols = {f"__l__{k}": pa.array(v, from_pandas=True)
                for k, v in lcols.items()}
        cols.update({f"__r__{k}": pa.array(v, from_pandas=True)
                     for k, v in rcols.items()})
        n = len(next(iter(cols.values()))) if cols else 0
        t = pa.table(cols)
        mask = np.ones(n, dtype=bool)
        for ex in exprs:
            m = eval_expr(ex, t)
            if not hasattr(m, "to_numpy"):
                m = pa.array([bool(m)] * n)
            import pyarrow.compute as _pc
            m = _pc.fill_null(m, False)
            mask &= m.to_numpy(zero_copy_only=False).astype(bool)
        return mask
    cond.__name__ = "sql_join_condition"
    return cond


def sql(query: str, sf_dir: str | None = None,
        tables: dict | None = None,
        dialect: str = "ansi",
        params: list | tuple | None = None,
        presorted: bool = False,
        skew_opt: bool = False,
        skew_min_rows: int = 100_000) -> ray.data.Dataset:
    """Run a SQL query (the engine's supported subset) over the testdata
    tables in ``sf_dir`` and/or explicit ``tables`` (name -> Dataset).

    ``dialect`` controls the few functions whose semantics differ:
    ``first_value`` is the oldest frame row under ``"ansi"`` and the
    newest under ``"openmldb"`` (window_functions_def.cc:154).

    ``params`` binds positional ``?`` placeholders left to right
    (parameterized queries, hybridse RequestRunSession parameter row).

    ``presorted``: hint that source tables are physically time-ordered
    — window stages try the zero-shuffle blockwise plan first and fall
    back to the shuffle plan when verification, frame bounds, or
    economics say otherwise.

    ``skew_opt``: the reference's ``openmldb.window.skew.opt`` —
    window stages run through the quantile-salting plan
    (skew.salted_window_agg): hot keys (> hot_frac of rows and >=
    ``skew_min_rows``) spread over time-quantile parts with replicated
    buffer-only history; no hot keys means the plain window plan.
    """
    from openmldb_ray.sql.ast import Param
    from openmldb_ray.sql.parser import parse
    sel = parse(query)
    phs = collect(sel, Param)
    if phs:
        if params is None or len(params) < 1 + max(p.idx for p in phs):
            raise ValueError(
                f"query has {1 + max(p.idx for p in phs)} parameter "
                f"placeholders but {len(params or ())} values bound")
        for p in phs:
            p.value = params[p.idx]
    return Planner(Catalog(sf_dir, tables), dialect,
                   presorted=presorted, skew_opt=skew_opt,
                   skew_min_rows=skew_min_rows).plan(sel)
