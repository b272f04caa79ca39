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
_LOAD_RE = re.compile(
    r"^\s*load\s+data\s+infile\s+'(?P<path>[^']*)'\s+"
    r"into\s+table\s+(?P<table>[A-Za-z_]\w*(?:\.[A-Za-z_]\w*)?)\s*"
    r"(?P<opts>options\s*\(.*\))?\s*;?\s*$",
    re.I | re.S)

_DROP_RE = re.compile(
    r"^\s*drop\s+table\s+(?P<table>[A-Za-z_]\w*(?:\.[A-Za-z_]\w*)?)"
    r"\s*;?\s*$", re.I)
_CREATE_RE = re.compile(
    r"^\s*create\s+table\s+(?P<table>[A-Za-z_]\w*(?:\.[A-Za-z_]\w*)?)"
    r"\s*\((?P<cols>.*?)\)\s*(?:options\s*\([^()]*\))?\s*;?\s*$",
    re.I | re.S)

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

    def execute(self, stmt: str):
        """Run one statement; returns a Dataset for plain SELECTs,
        None for INTO OUTFILE / LOAD DATA."""
        m = _LOAD_RE.match(stmt)
        if m:
            self._load_data(m.group("path"), m.group("table"),
                            parse_options(m.group("opts"), _LOAD_KEYS))
            return None
        m = _DROP_RE.match(stmt)
        if m:
            name = m.group("table")
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
        return self.run_select(stmt)

    def _create_table(self, name: str, cols_src: str) -> None:
        """CREATE TABLE t(col type, ..., index(...)): column defs only;
        index specs are storage hints with no batch-engine semantics
        and are skipped (the reference's ColumnKey, common.proto:58-64).
        """
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
            cname, ctype = toks[0], toks[1].lower()
            if ctype not in _DDL_TYPES:
                raise ValueError(f"unknown column type {ctype!r}")
            fields.append(pa.field(cname, _DDL_TYPES[ctype]))
        if not fields:
            raise ValueError("table needs at least one column")
        empty = pa.table({f.name: pa.array([], type=f.type)
                          for f in fields})
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
