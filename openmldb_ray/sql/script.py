"""Multi-statement SQL scripts: ``SELECT ... INTO OUTFILE`` and
``LOAD DATA INFILE`` statements plus a session that threads a mutable
table catalog through a statement sequence.

Reference surface (semantics reproduced here, code is original):
- ``SELECT INTO`` grammar + options —
  docs/zh/reference/sql/dql/SELECT_INTO_STATEMENT.md (delimiter ',',
  header true, null_value 'null', format 'csv', mode 'error_if_exists',
  quote '' = no quoting, floats rendered ``%.6f``, timestamps as epoch
  ms, bools as true/false);
- ``LOAD DATA INFILE`` grammar + options —
  docs/zh/reference/sql/dml/LOAD_DATA_STATEMENT.md (same csv options;
  values are parsed STRICTLY against the target table's schema, a
  header line must match the target column names exactly);
- option-key and option-type validation errors, file-exists /
  missing-path errors: cases/function/out_in/test_out_in.yaml.

Scale note: this statement executor is the *session/catalog* surface —
single files, driver-side rendering, faithful to the standalone
reference's one-file semantics (including custom null_value rendering
Arrow's csv writer can't express). The distributed ingest/egress path
for big data is ``sources.load_data`` / ``sources.select_into``
(ray.data.read_csv / write_parquet over sharded files); LOAD DATA with
``format='parquet'`` routes there.
"""

from __future__ import annotations

import os
import re
from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_OUTFILE_RE = re.compile(
    r"\binto\s+outfile\s+'(?P<path>[^']*)'\s*"
    r"(?P<opts>options\s*\(.*\))?\s*;?\s*$",
    re.I | re.S)
_ID0 = r"(?:`[^`]+`|[A-Za-z_]\w*)"
_QID0 = rf"{_ID0}(?:\.{_ID0})?"
_LOAD_RE = re.compile(
    rf"^\s*load\s+data\s+infile\s+'(?P<path>[^']*)'\s+"
    rf"into\s+table\s+(?P<table>{_QID0})\s*"
    r"(?P<opts>options\s*\(.*\))?\s*;?\s*$",
    re.I | re.S)

_DROP_RE = re.compile(
    rf"^\s*drop\s+table\s+(?:if\s+exists\s+)?(?P<table>{_QID0})"
    r"\s*;?\s*$", re.I)
_CREATE_RE = re.compile(
    rf"^\s*create\s+table\s+(?:if\s+not\s+exists\s+)?"
    rf"(?P<table>{_QID0})"
    r"\s*\((?P<cols>.*?)\)\s*(?:options\s*\([^()]*\))?\s*;?\s*$",
    re.I | re.S)

# session / catalog statements (the reference's CLI surface,
# cases/plan/cmd.yaml + insert.yaml): back-quoted identifiers allowed
_ID = _ID0
_QID = _QID0
_CREATE_DB_RE = re.compile(
    rf"^\s*create\s+database\s+(?:if\s+not\s+exists\s+)?"
    rf"(?P<db>{_ID})\s*;?\s*$", re.I)
_DROP_DB_RE = re.compile(
    rf"^\s*drop\s+database\s+(?:if\s+exists\s+)?(?P<db>{_ID})\s*;?\s*$",
    re.I)
_USE_RE = re.compile(rf"^\s*use\s+(?P<db>{_ID})\s*;?\s*$", re.I)
_SHOW_RE = re.compile(
    r"^\s*show\s+(?P<what>tables|databases)\s*;?\s*$", re.I)
_DESC_RE = re.compile(rf"^\s*desc(?:ribe)?\s+(?P<table>{_QID})\s*;?\s*$",
                      re.I)
_SET_RE = re.compile(
    r"^\s*set\s+(?:(?:global|session)\s+|@@(?:global\.|session\.)?)?"
    r"(?P<var>[A-Za-z_]\w*)\s*=\s*(?P<val>[^;]+);?\s*$", re.I)
_INDEX_RE = re.compile(
    rf"^\s*(?:create\s+index\s+{_ID}\s+on\s+{_QID}\s*\(.*\)"
    rf"|drop\s+index\s+{_QID}(?:\.{_ID})?)\s*;?\s*$", re.I | re.S)
_INSERT_RE = re.compile(
    rf"^\s*insert\s+into\s+(?P<table>{_QID})\s*"
    r"(?:\((?P<cols>[^)]*)\)\s*)?values\s*(?P<vals>\(.*\))\s*;?\s*$",
    re.I | re.S)


_PARAM = object()  # unbound `?` placeholder in a prepared INSERT

# CREATE TABLE without a column list parses in the reference (schema
# arrives later / LIKE); recognized here, rejected at execution
_CREATE_BARE_RE = re.compile(
    rf"^\s*create\s+table\s+(?:if\s+not\s+exists\s+)?(?P<table>{_QID})"
    r"\s*;?\s*$", re.I)


def _unquote_id(s: str) -> str:
    return s[1:-1] if s.startswith("`") and s.endswith("`") else s


def _split_tuples(src: str) -> list[list[str]]:
    """VALUES (...),(...) -> element strings per tuple (quote- and
    paren-aware scan)."""
    tuples, cur, depth, q = [], [], 0, None
    buf = []
    for ch in src:
        if q:
            buf.append(ch)
            if ch == q:
                q = None
            continue
        if ch in "'\"":
            q = ch
            buf.append(ch)
            continue
        if ch == "(":
            depth += 1
            if depth == 1:
                cur, buf = [], []
                continue
        if ch == ")":
            depth -= 1
            if depth == 0:
                cur.append("".join(buf).strip())
                tuples.append(cur)
                buf = []
                continue
        if ch == "," and depth == 1:
            cur.append("".join(buf).strip())
            buf = []
            continue
        if depth >= 1:
            buf.append(ch)
    if depth != 0:
        raise ValueError("unbalanced parentheses in VALUES")
    return tuples


def _parse_literal(tok: str):
    """One INSERT literal -> (value, arrow type|None). Reference typed
    literals (cases/plan/insert.yaml): bare int -> int32, ``L`` suffix
    -> int64, ``f`` suffix -> float, decimal -> double, quoted ->
    string, true/false, NULL."""
    t = tok.strip()
    u = t.upper()
    if u == "NULL":
        return None, None
    if u == "TRUE":
        return True, pa.bool_()
    if u == "FALSE":
        return False, pa.bool_()
    if t == "?":
        return _PARAM, None  # prepared placeholder; bound at execute
    if len(t) >= 2 and t[0] in "'\"" and t[-1] == t[0]:
        return t[1:-1], pa.string()
    if re.fullmatch(r"[+-]?\d+[lL]", t):
        return int(t[:-1]), pa.int64()
    if re.fullmatch(r"[+-]?\d+", t):
        return int(t), pa.int32()
    if re.fullmatch(r"[+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?[fF]", t):
        return float(t[:-1]), pa.float32()
    if re.fullmatch(r"[+-]?(?:\d+\.\d*|\.\d+)(?:[eE][+-]?\d+)?", t):
        return float(t), pa.float64()
    raise ValueError(f"bad INSERT literal {tok!r}")


def parse_insert(stmt: str):
    """INSERT INTO t [(cols)] VALUES (...)[, (...)] -> (table,
    cols|None, rows of (value, type))."""
    m = _INSERT_RE.match(stmt)
    if not m:
        return None
    cols = None
    if m.group("cols") is not None:
        cols = [_unquote_id(c.strip()) for c in
                m.group("cols").split(",") if c.strip()]
    rows = [[_parse_literal(e) for e in tup]
            for tup in _split_tuples(m.group("vals"))]
    if not rows:
        raise ValueError("INSERT requires at least one VALUES tuple")
    widths = {len(r) for r in rows}
    if len(widths) != 1:
        raise ValueError("VALUES tuples have differing arity")
    if cols is not None and len(cols) != len(rows[0]):
        raise ValueError("column list and VALUES arity differ")
    return _unquote_id(m.group("table")), cols, rows


_DDL_TYPES = {
    "smallint": pa.int16(), "int16": pa.int16(),
    "int": pa.int32(), "int32": pa.int32(),
    "bigint": pa.int64(), "int64": pa.int64(), "long": pa.int64(),
    "float": pa.float32(), "double": pa.float64(),
    "string": pa.string(), "varchar": pa.string(),
    "timestamp": pa.timestamp("ms"), "date": pa.date32(),
    "bool": pa.bool_(), "boolean": pa.bool_(),
}

_OUTFILE_KEYS = ("delimiter", "header", "null_value", "format", "mode",
                 "quote")
_LOAD_KEYS = ("delimiter", "header", "null_value", "format", "quote",
              "mode", "deep_copy")
_BOOL_KEYS = ("header", "deep_copy")
_STR_KEYS = ("delimiter", "null_value", "format", "mode", "quote")


def _split_options(inner: str) -> list[str]:
    """Split 'k=v, k=v' on commas outside single quotes."""
    out, cur, in_q = [], [], False
    for ch in inner:
        if ch == "'":
            in_q = not in_q
            cur.append(ch)
        elif ch == "," and not in_q:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if "".join(cur).strip():
        out.append("".join(cur))
    return out


def parse_options(text: str | None, allowed) -> dict:
    """``options(k=v, ...)`` -> dict; unknown keys and wrongly-typed
    values are errors (test_out_in.yaml ids 12/13: ``head=true`` and
    ``header='true'`` must both fail)."""
    if not text:
        return {}
    inner = text[text.index("(") + 1:text.rindex(")")]
    out: dict = {}
    for part in _split_options(inner):
        if "=" not in part:
            raise ValueError(f"malformed option {part!r}")
        k, v = part.split("=", 1)
        k = k.strip().lower()
        if k not in allowed:
            raise ValueError(f"unknown option {k!r}")
        v = v.strip()
        if v.startswith("'") and v.endswith("'") and len(v) >= 2:
            val: object = v[1:-1]
        elif v.lower() in ("true", "false"):
            val = v.lower() == "true"
        else:
            raise ValueError(f"bad option value {v!r} for {k!r}")
        if k in _BOOL_KEYS and not isinstance(val, bool):
            raise ValueError(f"option {k!r} expects a bool literal")
        if k in _STR_KEYS and not isinstance(val, str):
            raise ValueError(f"option {k!r} expects a string literal")
        out[k] = val
    return out


def _render_column(col: pa.ChunkedArray, null_value: str) -> list[str]:
    """Reference csv rendering: %.6f floats, epoch-ms timestamps, ISO
    dates, true/false bools, null_value for NULLs (all types)."""
    t = col.type
    if pa.types.is_timestamp(t):
        vals = pc.cast(col, pa.int64()).to_pylist()
        return [null_value if v is None else str(v) for v in vals]
    vals = col.to_pylist()
    if pa.types.is_floating(t):
        return [null_value if v is None else f"{v:.6f}" for v in vals]
    if pa.types.is_boolean(t):
        return [null_value if v is None
                else ("true" if v else "false") for v in vals]
    if pa.types.is_date(t):
        return [null_value if v is None else v.isoformat() for v in vals]
    return [null_value if v is None else str(v) for v in vals]


def render_csv_lines(table: pa.Table, *, delimiter: str = ",",
                     header: bool = True, null_value: str = "null",
                     quote: str = "") -> list[str]:
    cols = [_render_column(table[c], null_value)
            for c in table.column_names]
    if quote:
        cols = [[f"{quote}{v}{quote}" for v in c] for c in cols]
    lines = []
    if header:
        names = table.column_names
        if quote:
            names = [f"{quote}{n}{quote}" for n in names]
        lines.append(delimiter.join(names))
    for i in range(table.num_rows):
        lines.append(delimiter.join(c[i] for c in cols))
    return lines


def _parse_field(s: str, t: pa.DataType, null_value: str, quote: str):
    """Strict single-field parse against the target type; raises on
    mismatch (test_out_in.yaml ids 22/25: type mismatch must fail)."""
    if quote and len(s) >= 2 and s.startswith(quote) and s.endswith(quote):
        s = s[1:-1]
    if s == null_value:
        return None
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return s
    if pa.types.is_integer(t) or pa.types.is_timestamp(t):
        return int(s)
    if pa.types.is_floating(t):
        return float(s)
    if pa.types.is_boolean(t):
        if s.lower() == "true":
            return True
        if s.lower() == "false":
            return False
        raise ValueError(f"bad bool literal {s!r}")
    if pa.types.is_date(t):
        import datetime
        y, m, d = (int(x) for x in s.split("-"))
        return datetime.date(y, m, d)
    raise ValueError(f"unsupported load type {t}")


def parse_csv_lines(lines: list[str], schema: pa.Schema, *,
                    delimiter: str = ",", header: bool = True,
                    null_value: str = "null",
                    quote: str = "") -> pa.Table:
    names = list(schema.names)
    if header:
        if not lines:
            raise ValueError("empty file but header=true")
        got = lines[0].split(delimiter)
        if quote:
            got = [g[1:-1] if len(g) >= 2 and g.startswith(quote)
                   and g.endswith(quote) else g for g in got]
        if got != names:
            raise ValueError(
                f"csv header {got} does not match table columns {names}")
        lines = lines[1:]
    cols: dict[str, list] = {n: [] for n in names}
    for line in lines:
        fields = line.split(delimiter)
        if len(fields) != len(names):
            raise ValueError(
                f"row has {len(fields)} fields, table has {len(names)}")
        for n, f in zip(names, fields):
            cols[n].append(_parse_field(f, schema.field(n).type,
                                        null_value, quote))
    return pa.table({n: pa.array(cols[n], type=schema.field(n).type)
                     for n in names})


def _dataset_arrow(ds: ray.data.Dataset) -> pa.Table:
    batches = list(ds.iter_batches(batch_format="pyarrow",
                                   batch_size=1 << 20))
    if batches:
        return pa.concat_tables(batches, promote_options="permissive")
    sch = ds.schema()
    names = list(sch.names)
    types = list(sch.types)
    return pa.table({n: pa.array([], type=t)
                     for n, t in zip(names, types)})


class SqlSession:
    """Executes a sequence of SQL statements against a mutable table
    catalog (name -> Dataset). ``run_select`` plans a SELECT string
    against the CURRENT catalog (callers inject dialect / time-unit
    handling); ``aliases`` maps a table name to every catalog key that
    must track it (db-qualified names)."""

    def __init__(self, tables: dict, run_select: Callable | None = None,
                 workdir: str | None = None,
                 aliases: dict[str, set] | None = None,
                 dialect: str = "openmldb"):
        self.tables = tables
        self.workdir = workdir
        self.aliases = aliases or {}
        self.databases: set[str] = set()
        self.current_db: str | None = None
        self.variables: dict[str, str] = {}
        if run_select is None:
            from openmldb_ray.sql.planner import Catalog, Planner
            from openmldb_ray.sql.parser import parse

            def run_select(q):
                return Planner(Catalog(None, self.tables),
                               dialect=dialect).plan(parse(q))
        self.run_select = run_select

    def _path(self, p: str) -> str:
        if os.path.isabs(p) or self.workdir is None:
            return p
        return os.path.join(self.workdir, p)

    def _set_table(self, name: str, ds: ray.data.Dataset) -> None:
        if name not in self.tables:
            raise ValueError(f"table {name!r} does not exist")
        for alias in self.aliases.get(name, {name}):
            self.tables[alias] = ds

    def execute(self, stmt: str, params: list | tuple | None = None):
        """Run one statement; returns a Dataset for plain SELECTs,
        None for INTO OUTFILE / LOAD DATA. ``params`` binds ``?``
        placeholders of a prepared INSERT left to right (the SDK's
        PreparedStatement surface, dml/test_insert_prepared.yaml)."""
        m = _LOAD_RE.match(stmt)
        if m:
            self._load_data(m.group("path"),
                            _unquote_id(m.group("table")),
                            parse_options(m.group("opts"), _LOAD_KEYS))
            return None
        m = _DROP_RE.match(stmt)
        if m:
            name = _unquote_id(m.group("table"))
            if name not in self.tables:
                raise ValueError(f"table {name!r} does not exist")
            for alias in self.aliases.pop(name, {name}):
                self.tables.pop(alias, None)
                self.aliases.pop(alias, None)
            return None
        m = _CREATE_RE.match(stmt)
        if m:
            self._create_table(m.group("table"), m.group("cols"))
            return None
        m = _OUTFILE_RE.search(stmt)
        if m and re.match(r"\s*(select|with)\b", stmt, re.I):
            opts = parse_options(m.group("opts"), _OUTFILE_KEYS)
            select_part = stmt[:m.start()]
            self._select_into(select_part, m.group("path"), opts)
            return None
        m = _CREATE_DB_RE.match(stmt)
        if m:
            self.databases.add(_unquote_id(m.group("db")))
            return None
        m = _DROP_DB_RE.match(stmt)
        if m:
            self.databases.discard(_unquote_id(m.group("db")))
            return None
        m = _USE_RE.match(stmt)
        if m:
            db = _unquote_id(m.group("db"))
            known = self.databases | {k.split(".", 1)[0]
                                      for k in self.tables if "." in k}
            if known and db not in known:
                raise ValueError(f"database {db!r} does not exist")
            self.current_db = db
            return None
        m = _SHOW_RE.match(stmt)
        if m:
            if m.group("what").lower() == "databases":
                names = sorted(self.databases)
                return ray.data.from_arrow(pa.table(
                    {"Databases": pa.array(names, type=pa.string())}))
            names = sorted(k for k in self.tables if "." not in k)
            return ray.data.from_arrow(pa.table(
                {"Tables": pa.array(names, type=pa.string())}))
        m = _DESC_RE.match(stmt)
        if m:
            name = _unquote_id(m.group("table"))
            if name not in self.tables:
                raise ValueError(f"table {name!r} does not exist")
            sch = self.tables[name].schema()
            base = getattr(sch, "base_schema", None)
            fields = list(base) if base is not None else [
                pa.field(n, t) for n, t in zip(sch.names, sch.types)]
            return ray.data.from_arrow(pa.table({
                "Field": pa.array([f.name for f in fields]),
                "Type": pa.array([str(f.type) for f in fields]),
                "Null": pa.array(["YES" if f.nullable else "NO"
                                  for f in fields]),
            }))
        m = _SET_RE.match(stmt)
        if m:
            self.variables[m.group("var").lower()] = \
                m.group("val").strip()
            return None
        if _INDEX_RE.match(stmt):
            # index DDL = storage hints; no batch-engine semantics
            # (reference ColumnKey, common.proto:58-64)
            return None
        ins = parse_insert(stmt)
        if ins is not None:
            self._insert(*ins, params=params)
            return None
        if _CREATE_BARE_RE.match(stmt):
            raise ValueError(
                "CREATE TABLE without a column list is recognized but "
                "not materializable (no schema source)")
        m = re.match(r"\s*explain\s+(?:logical\s+|physical\s+)?(?P<q>.+)$",
                     stmt, re.I | re.S)
        if m:
            from openmldb_ray.sql.explain import explain
            return ray.data.from_arrow(pa.table({
                "plan": pa.array(explain(m.group("q")).splitlines(),
                                 type=pa.string())}))
        return self.run_select(stmt)

    def _insert(self, name: str, cols: list | None, rows: list,
                params: list | tuple | None = None) -> None:
        """Offline INSERT ... VALUES: append literal rows to a catalog
        table (the online tablet path, src/tablet/tablet_impl.cc, is
        out of scope — this is the session/catalog analog)."""
        if params is not None:
            it = iter(params)
            try:
                rows = [[(next(it), None) if v[0] is _PARAM else v
                         for v in r] for r in rows]
            except StopIteration:
                raise ValueError("not enough INSERT parameters bound")
        if any(v[0] is _PARAM for r in rows for v in r):
            raise ValueError("prepared INSERT parameters are not bound")
        if name not in self.tables:
            raise ValueError(f"table {name!r} does not exist")
        ds = self.tables[name]
        sch = ds.schema()
        base = getattr(sch, "base_schema", None)
        schema = base if base is not None else pa.schema(
            [pa.field(n, t) for n, t in zip(sch.names, sch.types)])
        names = [f.name for f in schema]
        if cols is None:
            cols = names
        bad = [c for c in cols if c not in names]
        if bad:
            raise ValueError(f"unknown INSERT columns {bad}")
        arrays = {}
        for f in schema:
            if f.name in cols:
                i = cols.index(f.name)
                vals = [r[i][0] for r in rows]
                # int-ms literals into timestamp/date columns cast
                # through the epoch, matching LOAD DATA semantics
                src = pa.array(vals)
                arrays[f.name] = src.cast(f.type) if src.type != f.type \
                    else src
            else:
                arrays[f.name] = pa.nulls(len(rows), f.type)
        lit = pa.table({n: arrays[n] for n in names})
        self._set_table(name, ds.union(ray.data.from_arrow(lit)))

    def _create_table(self, name: str, cols_src: str) -> None:
        """CREATE TABLE t(col type, ..., index(...)): column defs only;
        index specs are storage hints with no batch-engine semantics
        and are skipped (the reference's ColumnKey, common.proto:58-64).
        """
        name = _unquote_id(name)
        if name in self.tables:
            raise ValueError(f"table {name!r} already exists")
        fields = []
        depth, cur, parts = 0, [], []
        for ch in cols_src:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                parts.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        if "".join(cur).strip():
            parts.append("".join(cur))
        for part in parts:
            part = part.strip()
            if not part or part.lower().startswith("index"):
                continue
            toks = part.split()
            if len(toks) < 2:
                raise ValueError(f"bad column def {part!r}")
            cname, ctype = _unquote_id(toks[0]), toks[1].lower()
            if ctype not in _DDL_TYPES:
                raise ValueError(f"unknown column type {ctype!r}")
            fields.append(pa.field(cname, _DDL_TYPES[ctype]))
        if not fields:
            raise ValueError("table needs at least one column")
        empty = pa.table({f.name: pa.array([], type=f.type)
                          for f in fields})
        if self.current_db and "." not in name:
            # a table created under USE db is addressable both ways
            ds = ray.data.from_arrow(empty)
            qual = f"{self.current_db}.{name}"
            self.aliases[name] = self.aliases[qual] = {name, qual}
            self.tables[name] = self.tables[qual] = ds
            return
        self.aliases[name] = {name}
        self.tables[name] = ray.data.from_arrow(empty)

    def _select_into(self, select_sql: str, path: str, opts: dict):
        fmt = opts.get("format", "csv")
        if fmt not in ("csv", "parquet"):
            raise ValueError(f"format must be csv or parquet, got {fmt!r}")
        mode = opts.get("mode", "error_if_exists")
        if mode not in ("error_if_exists", "overwrite", "append"):
            raise ValueError(f"bad mode {mode!r}")
        path = self._path(path)
        parent = os.path.dirname(path) or "."
        if not os.path.isdir(parent):
            raise FileNotFoundError(
                f"output directory {parent!r} does not exist")
        if mode == "error_if_exists" and os.path.exists(path):
            raise FileExistsError(path)
        ds = self.run_select(select_sql)
        if fmt == "parquet":
            if mode == "append":
                raise ValueError("append mode applies to csv files")
            _dataset_arrow(ds)  # force plan errors before the write
            import pyarrow.parquet as pq
            pq.write_table(_dataset_arrow(ds), path)
            return
        table = _dataset_arrow(ds)
        lines = render_csv_lines(
            table, delimiter=opts.get("delimiter", ","),
            header=opts.get("header", True),
            null_value=opts.get("null_value", "null"),
            quote=opts.get("quote", ""))
        with open(path, "a" if mode == "append" else "w") as fh:
            fh.write("\n".join(lines) + "\n")

    def _load_data(self, path: str, table: str, opts: dict):
        fmt = opts.get("format", "csv")
        if fmt not in ("csv", "parquet"):
            raise ValueError(f"format must be csv or parquet, got {fmt!r}")
        # default append: the docs table says error_if_exists for the
        # OFFLINE store, but the observable harness behavior loads into
        # a non-empty table fine (test_out_in.yaml id 33) — online
        # imports are always append (LOAD_DATA_STATEMENT.md note)
        mode = opts.get("mode", "append")
        if mode not in ("error_if_exists", "overwrite", "append"):
            raise ValueError(f"bad mode {mode!r}")
        if table not in self.tables:
            raise ValueError(f"table {table!r} does not exist")
        path = self._path(path)
        existing = _dataset_arrow(self.tables[table])
        if fmt == "parquet":
            from openmldb_ray.sources.load_data import load_data
            loaded = _dataset_arrow(load_data(path, "parquet"))
            loaded = loaded.cast(existing.schema)
        else:
            if not os.path.isfile(path):
                raise FileNotFoundError(path)
            with open(path) as fh:
                lines = fh.read().split("\n")
            while lines and lines[-1] == "":
                lines.pop()
            loaded = parse_csv_lines(
                lines, existing.schema,
                delimiter=opts.get("delimiter", ","),
                header=opts.get("header", True),
                null_value=opts.get("null_value", "null"),
                quote=opts.get("quote", ""))
        if mode == "error_if_exists" and existing.num_rows:
            raise FileExistsError(f"table {table!r} already has data")
        if mode == "overwrite":
            out = loaded
        else:
            out = pa.concat_tables([existing, loaded])
        self._set_table(table, ray.data.from_arrow(out))


def run_script(statements: list[str], tables: dict | None = None,
               workdir: str | None = None, dialect: str = "openmldb"):
    """Convenience: execute statements in order; returns the last
    plain-SELECT result (a Dataset) or None."""
    session = SqlSession(dict(tables or {}), workdir=workdir,
                         dialect=dialect)
    last = None
    for stmt in statements:
        r = session.execute(stmt)
        if r is not None:
            last = r
    return last
