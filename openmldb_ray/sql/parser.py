"""Recursive-descent parser for the front-end subset.

Covers the query shapes of the reference dialect (SELECT + WINDOW with
ROWS / ROWS_RANGE frames + every frame modifier, LAST JOIN, WHERE /
GROUP BY / ORDER BY / LIMIT, subqueries in FROM) AND the ANSI forms the
oracle suite uses (RANGE BETWEEN INTERVAL .. PRECEDING, EXCLUDE
CURRENT ROW, ASOF LEFT JOIN, CASE WHEN, CAST, BETWEEN, LIKE).
Reference surface: hybridse/src/vm/sql_compiler.cc:322 (Parse) and
docs/zh/reference/sql/dql/WINDOW_CLAUSE.md.
"""

from __future__ import annotations

from openmldb_ray.sql.ast import (Between, BinOp, Bound, Case, Cast, Col,
                                  Func, InList, Interval, IsNull, Join,
                                  Like, Lit, Param, Select, SelectItem,
                                  Star, TableRef, UnOp, WinCall,
                                  WindowDef)
from openmldb_ray.sql.lexer import Tok, tokenize

# function-style cast names (udfs_8h.md: bigint/int/smallint/float/
# double/string; date/timestamp handled in the keyword branch; bool()
# keeps parse semantics distinct from CAST AS BOOL truthiness)
_CAST_FUNCS = {"BIGINT", "INT", "INT16", "INT32", "INT64", "SMALLINT",
               "STRING", "VARCHAR", "FLOAT", "DOUBLE"}

_INTERVAL_US = {"MICROSECOND": 1, "MICROSECONDS": 1,
                "MILLISECOND": 1_000, "MILLISECONDS": 1_000,
                "SECOND": 1_000_000, "SECONDS": 1_000_000,
                "MINUTE": 60_000_000, "MINUTES": 60_000_000,
                "HOUR": 3_600_000_000, "HOURS": 3_600_000_000,
                "DAY": 86_400_000_000, "DAYS": 86_400_000_000}


class Parser:
    def __init__(self, text: str):
        self.text = text
        self.toks: list[Tok] = tokenize(text)
        self.i = 0

    # ------------------------------------------------------------ helpers
    def peek(self, off=0) -> Tok:
        return self.toks[min(self.i + off, len(self.toks) - 1)]

    def next(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def at_kw(self, *kws) -> bool:
        t = self.peek()
        return t.kind == "KW" and t.val in kws

    def eat_kw(self, *kws) -> bool:
        if self.at_kw(*kws):
            self.next()
            return True
        return False

    def expect_kw(self, kw):
        if not self.eat_kw(kw):
            raise ValueError(f"expected {kw} at {self.peek().pos}: "
                             f"...{self.text[self.peek().pos:][:40]!r}")

    def at_op(self, *ops) -> bool:
        t = self.peek()
        return t.kind == "OP" and t.val in ops

    def eat_op(self, *ops) -> bool:
        if self.at_op(*ops):
            self.next()
            return True
        return False

    def expect_op(self, op):
        if not self.eat_op(op):
            raise ValueError(f"expected {op!r} at {self.peek().pos}: "
                             f"...{self.text[self.peek().pos:][:40]!r}")

    def ident(self) -> str:
        t = self.next()
        if t.kind != "IDENT":
            raise ValueError(f"expected identifier at {t.pos}, got {t.val}")
        return t.val

    # ------------------------------------------------------------ entry
    def parse(self) -> Select:
        ctes: dict = {}
        if self.eat_kw("WITH"):
            while True:
                name = self.ident()
                self.expect_kw("AS")
                self.expect_op("(")
                ctes[name] = self.query_expr()
                self.expect_op(")")
                if not self.eat_op(","):
                    break
        sel = self.query_expr()
        sel.ctes = ctes
        self.eat_op(";")
        if self.peek().kind != "END":
            t = self.peek()
            raise ValueError(f"trailing input at {t.pos}: "
                             f"{self.text[t.pos:][:40]!r}")
        return sel

    # ------------------------------------------------------------ select
    def query_expr(self) -> Select:
        """SELECT [UNION [ALL|DISTINCT] SELECT]* — left-associative set
        chain (cases/plan/union_query.yaml; bare UNION = DISTINCT per
        the standard)."""
        sel = self.select()
        while self.at_kw("UNION") and self.peek(1).kind == "KW" and \
                self.peek(1).val in ("ALL", "DISTINCT", "SELECT"):
            self.next()
            op = "distinct"
            if self.eat_kw("ALL"):
                op = "all"
            else:
                self.eat_kw("DISTINCT")
            sel.set_ops.append((op, self.select()))
        if self.at_kw("CONFIG"):
            # CONFIG (k=v, ...) suffix: a cluster-execution hint in the
            # reference (simple_query.yaml "select with config"); it
            # carries no meaning for this engine — parse and ignore,
            # consuming the balanced parens
            self.next()
            self.expect_op("(")
            depth = 1
            while depth and self.peek().kind != "END":
                t = self.next()
                if t.kind == "OP" and t.val == "(":
                    depth += 1
                elif t.kind == "OP" and t.val == ")":
                    depth -= 1
            if depth:
                raise ValueError("unterminated CONFIG clause")
        return sel

    def select(self) -> Select:
        self.expect_kw("SELECT")
        distinct = self.eat_kw("DISTINCT")
        items = [self.select_item()]
        while self.eat_op(","):
            if self.at_kw("FROM"):  # tolerate a trailing comma
                break               # (test_window.yaml ids 33-35)
            items.append(self.select_item())
        table = None
        joins: list[Join] = []
        if self.eat_kw("FROM"):
            table = self.table_ref()
            while True:
                j = self.maybe_join()
                if j is None:
                    break
                joins.append(j)
        where = self.expr() if self.eat_kw("WHERE") else None
        group_by: list = []
        if self.eat_kw("GROUP"):
            self.expect_kw("BY")
            group_by.append(self.expr())
            while self.eat_op(","):
                group_by.append(self.expr())
        having = self.expr() if self.eat_kw("HAVING") else None
        windows: dict = {}
        if self.eat_kw("WINDOW"):
            while True:
                name = self.ident()
                self.expect_kw("AS")
                self.expect_op("(")
                if name in windows:
                    # duplicate window name is a plan error in the
                    # reference (cases/plan/error_query.yaml id 2)
                    raise ValueError(
                        f"duplicate window definition {name!r}")
                windows[name] = self.window_def(name)
                self.expect_op(")")
                if not self.eat_op(","):
                    break
        order_by: list = []
        if self.eat_kw("ORDER"):
            self.expect_kw("BY")
            order_by.append(self.order_item())
            while self.eat_op(","):
                order_by.append(self.order_item())
        limit = None
        if self.eat_kw("LIMIT"):
            t = self.next()
            limit = int(t.val)
        return Select(items, distinct, table, joins, where, group_by,
                      having, windows, order_by, limit)

    def order_item(self):
        e = self.expr()
        desc = False
        if self.eat_kw("DESC"):
            desc = True
        else:
            self.eat_kw("ASC")
        return (e, desc)

    def select_item(self) -> SelectItem:
        start = self.peek().pos
        e = self.expr()
        end = self.peek().pos
        alias = None
        if self.eat_kw("AS"):
            alias = self.ident()
        elif self.peek().kind == "IDENT":
            alias = self.ident()
        return SelectItem(e, alias, self.text[start:end].strip())

    def table_ref(self) -> TableRef:
        if self.eat_op("("):
            sub = self.query_expr()
            self.expect_op(")")
            alias = None
            if self.eat_kw("AS"):
                alias = self.ident()
            elif self.peek().kind == "IDENT":
                alias = self.ident()
            return TableRef(None, alias, sub)
        name = self.ident()
        if self.at_op("."):  # db-qualified table: db.tbl
            self.next()
            name += "." + self.ident()
        alias = None
        if self.eat_kw("AS"):
            alias = self.ident()
        elif self.peek().kind == "IDENT":
            alias = self.ident()
        return TableRef(name, alias)

    def maybe_join(self) -> Join | None:
        if self.at_kw("ASOF"):
            self.next()
            self.expect_kw("LEFT")
            self.expect_kw("JOIN")
            t = self.table_ref()
            self.expect_kw("ON")
            on = self.expr()
            return Join("asof_left", t, on)
        if self.at_kw("LEFT"):
            self.next()
            self.eat_kw("OUTER")
            self.expect_kw("JOIN")
            t = self.table_ref()
            self.expect_kw("ON")
            on = self.expr()
            return Join("left", t, on)
        if self.at_kw("RIGHT"):
            self.next()
            self.eat_kw("OUTER")
            self.expect_kw("JOIN")
            t = self.table_ref()
            self.expect_kw("ON")
            on = self.expr()
            return Join("right", t, on)
        if self.at_kw("LAST"):
            self.next()
            self.expect_kw("JOIN")
            t = self.table_ref()
            order = None
            if self.eat_kw("ORDER"):
                self.expect_kw("BY")
                order = self.order_item()
            self.expect_kw("ON")
            on = self.expr()
            return Join("last", t, on, order)
        if self.at_kw("JOIN") or self.at_kw("INNER"):
            self.eat_kw("INNER")
            self.expect_kw("JOIN")
            t = self.table_ref()
            self.expect_kw("ON")
            on = self.expr()
            return Join("inner", t, on)
        return None

    # ------------------------------------------------------------ window
    def window_def(self, name) -> WindowDef:
        w = WindowDef(name, [], [], None)
        # OpenMLDB WINDOW UNION: (UNION t1[, t2] PARTITION BY ...)
        if self.eat_kw("UNION"):
            while True:
                if self.at_op("("):
                    self.next()
                    ref = TableRef(None, None, self.select())
                    self.expect_op(")")
                else:
                    un = self.ident()
                    if self.at_op("."):  # db-qualified union table
                        self.next()
                        un += "." + self.ident()
                    ref = TableRef(un, None)
                if self.eat_kw("AS"):  # optional union-table alias
                    ref.alias = self.ident()
                elif self.peek().kind == "IDENT" and \
                        not self.at_kw("PARTITION"):
                    ref.alias = self.ident()
                w.union_tables.append(ref)
                if not self.eat_op(","):
                    break
        self.expect_kw("PARTITION")
        self.expect_kw("BY")
        w.partition_by.append(self.expr())
        while self.eat_op(","):
            w.partition_by.append(self.expr())
        self.expect_kw("ORDER")
        self.expect_kw("BY")
        w.order_by.append(self.order_item())
        while self.eat_op(","):
            w.order_by.append(self.order_item())
        if self.at_kw("ROWS", "RANGE", "ROWS_RANGE"):
            w.frame_type = self.next().val.lower()
            if self.eat_kw("BETWEEN"):
                w.start = self.frame_bound()
                self.expect_kw("AND")
                w.end = self.frame_bound()
            else:
                w.start = self.frame_bound()
                w.end = Bound("current")
        # frame modifiers, any order
        while True:
            if self.eat_kw("MAXSIZE"):
                w.max_size = int(self.next().val)
            elif self.at_kw("EXCLUDE"):
                self.next()
                if self.eat_kw("CURRENT_TIME"):
                    w.exclude_current_time = True
                else:
                    self.expect_kw("CURRENT")
                    self.expect_kw("ROW")
                    w.exclude_current_row = True
            elif self.eat_kw("INSTANCE_NOT_IN_WINDOW"):
                w.instance_not_in_window = True
            else:
                break
        return w

    def frame_bound(self) -> Bound:
        if self.eat_kw("UNBOUNDED"):
            self.expect_kw("PRECEDING")
            return Bound("unbounded")
        if self.eat_kw("CURRENT"):
            self.expect_kw("ROW")
            return Bound("current")
        is_open = self.eat_kw("OPEN")
        val = self.expr()
        # OpenMLDB also writes "n OPEN PRECEDING"
        is_open = self.eat_kw("OPEN") or is_open
        if self.eat_kw("PRECEDING"):
            return Bound("preceding", val, is_open)
        self.expect_kw("FOLLOWING")
        return Bound("following", val, is_open)

    # ------------------------------------------------------------ exprs
    def expr(self):
        return self.or_expr()

    def or_expr(self):
        e = self.xor_expr()
        while self.eat_kw("OR"):
            e = BinOp("OR", e, self.xor_expr())
        return e

    def xor_expr(self):  # MySQL-style: OR < XOR < AND
        e = self.and_expr()
        while self.eat_kw("XOR"):
            e = BinOp("XOR", e, self.and_expr())
        return e

    def and_expr(self):
        e = self.not_expr()
        while self.eat_kw("AND"):
            e = BinOp("AND", e, self.not_expr())
        return e

    def not_expr(self):
        if self.eat_kw("NOT") or self.eat_op("!"):
            return UnOp("NOT", self.not_expr())
        return self.cmp_expr()

    def cmp_expr(self):
        e = self.bitor_expr()
        while True:
            if self.at_op("=", "==", "!=", "<>", "<", "<=", ">", ">="):
                op = self.next().val
                op = {"==": "=", "<>": "!="}.get(op, op)
                e = BinOp(op, e, self.bitor_expr())
                continue
            if self.at_kw("IS"):
                self.next()
                neg = self.eat_kw("NOT")
                self.expect_kw("NULL")
                e = IsNull(e, neg)
                continue
            neg = False
            if self.at_kw("NOT") and self.peek(1).kind == "KW" and \
                    self.peek(1).val in ("LIKE", "ILIKE", "BETWEEN", "IN"):
                self.next()
                neg = True
            if self.at_kw("LIKE", "ILIKE"):
                ic = self.next().val == "ILIKE"
                # pattern is an expression (a column ref is legal:
                # query/simple_query.yaml like_predicate_7/11); string
                # literals stay plain strings for the vectorized kernel
                pat = self.add_expr()
                if isinstance(pat, Lit) and pat.val is None:
                    # LIKE NULL is a compile error in the reference
                    # (v040/test_like.yaml id 17)
                    raise ValueError("LIKE pattern must not be NULL")
                esc = None
                if self.eat_kw("ESCAPE"):
                    et = self.next()
                    if et.kind == "KW" and et.val == "NULL":
                        raise ValueError("ESCAPE must not be NULL")
                    esc = str(et.val)
                    if len(esc) > 1:
                        raise ValueError(
                            "ESCAPE must be a single character")
                pv = pat.val if isinstance(pat, Lit) and \
                    isinstance(pat.val, str) else pat
                e = Like(e, pv, neg, ic, esc)
                continue
            if self.at_kw("BETWEEN"):
                self.next()
                lo = self.add_expr()
                self.expect_kw("AND")
                hi = self.add_expr()
                e = Between(e, lo, hi, neg)
                continue
            if self.at_kw("IN"):
                self.next()
                self.expect_op("(")
                items = [self.expr()]
                while self.eat_op(","):
                    items.append(self.expr())
                self.expect_op(")")
                e = InList(e, items, neg)
                continue
            return e

    # bitwise precedence (ZetaSQL-style): << >> bind tighter than &,
    # then ^, then | — all between arithmetic and comparisons
    def bitor_expr(self):
        e = self.bitxor_expr()
        while self.at_op("|"):
            self.next()
            e = BinOp("|", e, self.bitxor_expr())
        return e

    def bitxor_expr(self):
        e = self.bitand_expr()
        while self.at_op("^"):
            self.next()
            e = BinOp("^", e, self.bitand_expr())
        return e

    def bitand_expr(self):
        e = self.shift_expr()
        while self.at_op("&"):
            self.next()
            e = BinOp("&", e, self.shift_expr())
        return e

    def shift_expr(self):
        e = self.add_expr()
        while self.at_op("<<", ">>"):
            op = self.next().val
            e = BinOp(op, e, self.add_expr())
        return e

    def add_expr(self):
        e = self.mul_expr()
        while self.at_op("+", "-", "||"):
            op = self.next().val
            e = BinOp(op, e, self.mul_expr())
        return e

    def mul_expr(self):
        e = self.unary()
        while True:
            if self.at_op("*", "/", "%"):
                op = self.next().val
            elif self.at_kw("MOD"):
                self.next()
                op = "%"
            elif self.at_kw("DIV"):
                self.next()
                op = "DIV"
            else:
                return e
            e = BinOp(op, e, self.unary())

    def unary(self):
        if self.eat_op("-"):
            return UnOp("-", self.unary())
        if self.eat_op("~"):
            return UnOp("~", self.unary())
        if self.eat_op("+"):
            return self.unary()
        return self.postfix()

    def postfix(self):
        e = self.primary()
        # window call: <func> OVER (name | inline def)
        if isinstance(e, Func) and self.at_kw("OVER"):
            self.next()
            if self.at_op("("):
                self.next()
                wd = self.window_def(None)
                self.expect_op(")")
                return WinCall(e, None, wd)
            return WinCall(e, self.ident())
        return e

    def primary(self):
        t = self.peek()
        if t.kind == "NUM":
            self.next()
            return Lit(t.val)
        if t.kind == "DUR":
            self.next()
            return Interval(int(t.val))
        if t.kind == "STR":
            self.next()
            return Lit(t.val)
        if t.kind == "OP" and t.val == "(":
            self.next()
            if self.at_kw("SELECT"):
                sub = self.select()
                self.expect_op(")")
                from openmldb_ray.sql.ast import ScalarSubquery
                return ScalarSubquery(sub)
            e = self.expr()
            self.expect_op(")")
            return e
        if t.kind == "OP" and t.val == "*":
            self.next()
            return Star()
        if t.kind == "OP" and t.val == "?":
            self.next()
            self._nparams = getattr(self, "_nparams", 0) + 1
            return Param(self._nparams - 1)
        if t.kind == "KW":
            if t.val == "NULL":
                self.next()
                return Lit(None)
            if t.val == "INTERVAL":
                self.next()
                n = self.next()
                unit = self.next()
                u = str(unit.val).upper()
                if u not in _INTERVAL_US:
                    raise ValueError(f"unknown interval unit {unit.val}")
                return Interval(int(n.val) * _INTERVAL_US[u])
            if t.val in ("TIMESTAMP", "DATE"):
                self.next()
                if self.at_op("("):
                    # function-style: timestamp(x) parses datetime
                    # strings ONLY (digit strings -> NULL), unlike
                    # CAST(x AS TIMESTAMP) (test_type.yaml 2 vs 21);
                    # date(x) shares CAST semantics
                    self.next()
                    e = self.expr()
                    self.expect_op(")")
                    return (Func("timestamp", [e])
                            if t.val == "TIMESTAMP" else Cast(e, t.val))
                lit = self.next()
                return Cast(Lit(lit.val), t.val)
            if t.val == "CASE":
                self.next()
                operand = None
                if not self.at_kw("WHEN"):
                    # simple CASE: CASE x WHEN v THEN r ... END
                    operand = self.expr()
                whens = []
                while self.eat_kw("WHEN"):
                    c = self.expr()
                    if operand is not None:
                        import copy
                        c = BinOp("=", copy.deepcopy(operand), c)
                    self.expect_kw("THEN")
                    v = self.expr()
                    whens.append((c, v))
                default = self.expr() if self.eat_kw("ELSE") else None
                self.expect_kw("END")
                return Case(whens, default)
            if t.val == "CAST":
                self.next()
                self.expect_op("(")
                e = self.expr()
                self.expect_kw("AS")
                ty = self.next()
                # types like DOUBLE PRECISION or BIGINT are idents/kws
                tyname = str(ty.val).upper()
                if self.at_op("("):  # length param: VARCHAR(60)
                    self.next()
                    self.next()  # the length literal
                    self.expect_op(")")
                self.expect_op(")")
                return Cast(e, tyname)
            if t.val in ("LEFT", "ROW"):  # left(s, n) etc. as functions
                pass
        if t.kind == "IDENT" and str(t.val).lower() in ("true", "false"):
            self.next()
            return Lit(str(t.val).lower() == "true")
        if t.kind in ("IDENT", "KW"):
            self.next()
            name = str(t.val)
            if self.at_op("("):
                self.next()
                distinct = self.eat_kw("DISTINCT")
                args: list = []
                if not self.at_op(")"):
                    args.append(self.expr())
                    while self.eat_op(","):
                        args.append(self.expr())
                ignore_nulls = False
                if self.peek().kind == "IDENT" and \
                        str(self.peek().val).upper() == "IGNORE":
                    self.next()
                    nxt = self.next()  # NULLS (ident) / NULL (kw)
                    if str(nxt.val).upper() not in ("NULLS", "NULL"):
                        raise ValueError("expected NULLS after IGNORE")
                    ignore_nulls = True
                self.expect_op(")")
                # HybridSQL function-style casts: bigint(x), int(x), ...
                if (name.upper() in _CAST_FUNCS and len(args) == 1
                        and not distinct):
                    return Cast(args[0], name.upper(), fn=True)
                return Func(name.lower(), args, distinct, ignore_nulls)
            if self.at_op(".") :
                self.next()
                col = self.next()
                if self.at_op("."):  # db.tbl.col three-part reference
                    self.next()
                    third = self.next()
                    return Col(str(third.val),
                               table=f"{name}.{col.val}")
                return Col(str(col.val), table=name)
            return Col(name)
        raise ValueError(f"unexpected token {t.val!r} at {t.pos}")


def parse(text: str) -> Select:
    return Parser(text).parse()
