"""Run reference-style YAML conformance cases through the SQL front
end (cases/function/**/*.yaml in the reference repo: inputs tables +
SQL + expected rows). The loader builds Ray datasets from the case's
``inputs``, substitutes ``{0}``/``{1}`` table placeholders, executes
``sql(...)`` (OpenMLDB dialect, ms time unit — the reference stores
timestamps as epoch-millisecond ints), and compares against
``expect.rows`` ordered by ``expect.order``.

This is the engine's analog of the reference's own YAML harness
(hybridse/src/testing + java sdk test runner): semantics + expected
rows come from the case file, execution is this engine.
"""

from __future__ import annotations

import datetime as _dt
import math

import pyarrow as pa
import yaml

_TYPES = {
    "int": pa.int32(), "int32": pa.int32(),
    "bigint": pa.int64(), "int64": pa.int64(), "long": pa.int64(),
    "smallint": pa.int16(), "int16": pa.int16(),
    "i16": pa.int16(), "i32": pa.int32(), "i64": pa.int64(),
    "float": pa.float32(), "double": pa.float64(),
    "string": pa.string(),
    # reference timestamps: epoch-ms values with a real timestamp
    # logical type (so type rules / casts / rendering see timestamps);
    # case unit literals are rescaled to ms to match (run_case)
    "timestamp": pa.timestamp("ms"),
    "date": pa.date32(),
    "bool": pa.bool_(), "boolean": pa.bool_(),
}


def load_cases(path: str) -> dict:
    with open(path) as fh:
        doc = yaml.safe_load(fh)
    for c in doc["cases"]:
        if "expect" not in c and isinstance(
                c.get("unequalExpect"), dict):
            # batch vs request engines legitimately disagree
            # (ut_case/test_unique_expect.yaml); this is the batch analog
            c["expect"] = c["unequalExpect"].get("batch_expect", {})
    return {c["id"]: c for c in doc["cases"]}


def expand_case(case: dict) -> list[tuple[str, dict]]:
    """Expand a ``dataProvider`` templated case (the reference's
    expression suites): each ``d[i]`` placeholder in the SQL takes one
    value from provider list i; ``expectProvider`` (keyed by the first
    provider's index, optionally nested by the second) overrides the
    base ``expect`` per combination. Returns [(combo_label, case)]."""
    import copy
    import itertools
    dp = case.get("dataProvider")
    if not dp:
        ep = case.get("expectProvider")
        if isinstance(ep, dict) and 0 in ep:
            # providerless cases sometimes park their rows under
            # expectProvider[0] (expression/test_type.yaml id 2)
            c = copy.deepcopy(case)
            c.setdefault("expect", {}).update(copy.deepcopy(ep[0]))
            return [("", c)]
        return [("", case)]
    out = []
    for combo in itertools.product(*[range(len(lst)) for lst in dp]):
        c = copy.deepcopy(case)
        s = c["sql"]
        for di, vi in enumerate(combo):
            s = s.replace(f"d[{di}]", str(dp[di][vi]))
        c["sql"] = s
        exp = copy.deepcopy(case.get("expect", {}) or {})
        node = case.get("expectProvider")
        for vi in combo:
            if isinstance(node, dict) and vi in node:
                node = node[vi]
            else:
                break
        if isinstance(node, dict) and ("rows" in node or "columns"
                                       in node or "success" in node
                                       or "data" in node):
            exp.update(copy.deepcopy(node))
        c["expect"] = exp
        out.append(("-".join(str(dp[di][vi]) for di, vi
                             in enumerate(combo)), c))
    return out


def _coerce(v, t: pa.DataType):
    if v is None:
        return None
    if pa.types.is_timestamp(t):
        return int(v)  # epoch ms; pa.array interprets per unit
    if t == pa.date32():
        if isinstance(v, str):
            y, m, d = (int(x) for x in v.split("-"))
            return _dt.date(y, m, d)
        return v
    if pa.types.is_floating(t):
        return float(v)
    if pa.types.is_integer(t):
        if isinstance(v, str) and v.strip("-+") in ("Infinity", "inf",
                                                    "NaN"):
            return float(v.replace("Infinity", "inf"))
        return int(v)
    if t == pa.bool_():
        if isinstance(v, str):
            return v.lower() == "true"
        return bool(v)
    return v


def _parse_spec(spec: dict):
    """Normalize the reference's table-spec formats: ``columns`` (list
    of "name type") or ``schema`` ("name:type,..."), with row data as
    ``rows`` (list of lists) or ``data`` (CSV string)."""
    names, types = [], []
    if "schema" in spec:
        for col in spec["schema"].split(","):
            if not col.strip():  # tolerate ',,' typos in case files
                continue
            n, t = col.strip().split(":")
            names.append(n.strip())
            types.append(_TYPES[t.strip().lower()])
    else:
        for col in spec["columns"]:
            # "name type" or "name:type" (both appear in the suites)
            if " " in col.strip():
                n, t = col.rsplit(" ", 1)
            else:
                n, t = col.strip().split(":")
            names.append(n.strip())
            types.append(_TYPES[t.strip().lower()])
    if "data" in spec:
        rows = [[c.strip() for c in line.split(",")]
                for line in str(spec["data"]).strip().splitlines()]
        rows = [[None if c in ("null", "NULL", "") else c for c in r]
                for r in rows]
    else:
        # no rows at all = empty table (fz_ddl/test_bank.yaml inputs
        # carry only a schema; data arrives via batch_request)
        rows = spec.get("rows")
    return names, types, rows if rows is not None else []


_SQL_ESC = {"\\": "\\", "'": "'", '"': '"', "`": "`"}


def _unescape(s: str) -> str:
    """Input rows reach the reference through SQL INSERT literals, so
    backslash escapes collapse ('\\\\' -> one backslash,
    v040/test_like.yaml id 8). Expected rows are literal result values
    and are NOT unescaped."""
    if "\\" not in s:
        return s
    out, i, n = [], 0, len(s)
    while i < n:
        if s[i] == "\\" and i + 1 < n:
            out.append(_SQL_ESC.get(s[i + 1], s[i + 1]))
            i += 2
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


def _build_table(spec: dict) -> pa.Table:
    names, types, rows = _parse_spec(spec)
    rep = int(spec.get("repeat", 1))
    if rep > 1:  # each row inserted `repeat` times (test_batch_request)
        rows = [r for r in rows for _ in range(rep)]
    cols = {n: [] for n in names}
    for row in rows:
        for n, t, v in zip(names, types, row):
            v = _coerce(v, t)
            if isinstance(v, str) and pa.types.is_string(t):
                v = _unescape(v)
            cols[n].append(v)
    table = pa.table({n: pa.array(cols[n], type=t)
                      for n, t in zip(names, types)})
    # reference STORAGE order: the online table iterates each index
    # key's skiplist newest-ts-first (src/storage/segment.h:145-148),
    # and LAST JOIN without ORDER BY picks the first row in that order
    # — usecase/autox.yaml expects the newest t2 row. Mirror the
    # loader: WITHIN each first-index key, stable ts-descending; key
    # groups keep first-appearance (insertion) order — a full scan is
    # not globally ts-ordered (expression/test_predicate.yaml id 8).
    idx = spec.get("indexs") or ()
    if idx:
        parts = str(idx[0]).split(":")
        key_cols = [c for c in (parts[1].split("|")
                                if len(parts) > 1 else []) if c]
        ts_col = parts[2] if len(parts) > 2 else None
        if ts_col and ts_col in table.column_names \
                and all(c in table.column_names for c in key_cols) \
                and table.num_rows > 1:
            import pyarrow.compute as pc
            kvals = (list(zip(*[table[c].to_pylist()
                                for c in key_cols]))
                     if key_cols else [()] * table.num_rows)
            rank: dict = {}
            for kv in kvals:
                rank.setdefault(kv, len(rank))
            tmp = table.select([ts_col]).append_column(
                "__rank__", pa.array([rank[kv] for kv in kvals],
                                     type=pa.int32()))
            order = pc.sort_indices(
                tmp, sort_keys=[("__rank__", "ascending"),
                                (ts_col, "descending")],
                null_placement="at_end")
            table = table.take(order)
    return table


def _run_script_case(case: dict, tables: dict, names_order: list,
                     aliases: dict):
    """``sqls:`` statement-sequence cases (out_in suite): INTO OUTFILE
    / LOAD DATA / SELECT threaded through one SqlSession with a fresh
    temp workdir. ``expect.cat`` compares the produced file's lines
    (multiset + first line: intra-file row order is reference-storage
    order, which this engine does not reproduce)."""
    import os
    import tempfile

    import pandas as pd

    from openmldb_ray.sql.ast import Interval
    from openmldb_ray.sql.exprs import collect
    from openmldb_ray.sql.parser import parse
    from openmldb_ray.sql.planner import Catalog, Planner
    from openmldb_ray.sql.script import SqlSession

    tmp = tempfile.mkdtemp(prefix="openmldb_outin_")

    def sub(s: str) -> str:
        for i, nm in enumerate(names_order):
            s = s.replace("{%d}" % i, nm)
        return s

    def run_sel(qstr):
        sel = parse(qstr)
        for iv in collect(sel, Interval):
            iv.micros //= 1000
        return Planner(Catalog(None, tables),
                       dialect="openmldb").plan(sel)

    session = SqlSession(tables, run_select=run_sel, workdir=tmp,
                         aliases=aliases)
    last = None
    out_path, out_header = None, True
    import re as _re
    from openmldb_ray.sql.script import _OUTFILE_RE
    for s in case["sqls"]:
        s = sub(s)
        m = _OUTFILE_RE.search(s)
        if m and _re.match(r"\s*(select|with)\b", s, _re.I):
            out_path = m.group("path")
            out_header = "false" not in (m.group("opts") or "").lower()
        r = session.execute(s)
        if r is not None:
            last = r.to_pandas()
    exp = case.get("expect", {}) or {}
    if last is None and out_path is not None \
            and exp.get("count") is not None:
        # count-only expectation against the exported file itself
        # (v040/test_out_in_offline.yaml id 0)
        p = out_path if os.path.isabs(out_path) \
            else os.path.join(tmp, out_path)
        with open(p) as fh:
            n = sum(1 for _ in fh) - (1 if out_header else 0)
        assert n == int(exp["count"]), (n, exp["count"])
        return (pd.DataFrame(), {})
    if "cat" in exp:
        cat = exp["cat"]
        p = sub(cat["path"])
        if not os.path.isabs(p):
            p = os.path.join(tmp, p)
        with open(p) as fh:
            got_lines = fh.read().splitlines()
        want = [str(x) for x in cat["lines"]]
        assert sorted(got_lines) == sorted(want), (got_lines, want)
        assert got_lines[0] == want[0], (got_lines[0], want[0])
        return (pd.DataFrame(), {})
    return (last if last is not None else pd.DataFrame(), exp)


def run_case(case: dict, num_buckets: int = 2):
    """Execute one case; returns (result_df, expect_df_columns_rows)."""
    import ray.data

    from openmldb_ray.sql import sql
    from openmldb_ray.sql.ast import Interval
    from openmldb_ray.sql.exprs import collect
    from openmldb_ray.sql.parser import parse

    tables = {}
    q = case.get("sql", "")
    names_order: list[str] = []
    aliases: dict[str, set] = {}
    for i, spec in enumerate(case.get("inputs") or ()):
        if "resource" in spec:
            # shared table spec (cases/resource/*.yaml) referenced by
            # path relative to the reference checkout
            with open(f"/root/reference/{spec['resource']}") as fh:
                res = yaml.safe_load(fh)["table"]
            res.update({k: v for k, v in spec.items()
                        if k not in ("resource",)})
            spec = res
        name = spec.get("name", f"t{i}")
        if "create" in spec:
            # DDL/DML input form (cases/function/dml): the table is
            # declared and populated through session statements
            from openmldb_ray.sql.script import SqlSession
            sess = SqlSession(tables, aliases=aliases)
            sess.execute(spec["create"].replace("{%d}" % i, name))
            ins = spec.get("insert") or spec.get("inserts") or []
            for stmt in ([ins] if isinstance(ins, str) else ins):
                stmt = stmt.replace("{%d}" % i, name)
                if "?" in stmt and spec.get("rows"):
                    # prepared form: executed once per parameter row
                    for prow in spec["rows"]:
                        sess.execute(stmt, params=prow)
                else:
                    sess.execute(stmt)
        else:
            tables[name] = ray.data.from_arrow(_build_table(spec))
        names_order.append(name)
        aliases[name] = {name}
        db = spec.get("db") or case.get("db")
        if db:  # multi-database cases address db.table
            tables[f"{db}.{name}"] = tables[name]
            aliases[name].add(f"{db}.{name}")
            aliases[f"{db}.{name}"] = aliases[name]
        if i == 0:
            t0_name = name
        q = q.replace("{%d}" % i, name)

    if case.get("sqls"):
        return _run_script_case(case, tables, names_order, aliases)

    def plan_once(carry_tag: str | None = None):
        # fresh parse per run: the planner rewrites the AST in place.
        # Reference time-unit literals are milliseconds against ms
        # data; the lexer canonicalizes to us — rescale Interval nodes
        sel = parse(q)
        for iv in collect(sel, Interval):
            iv.micros //= 1000
        if case.get("parameters"):
            from openmldb_ray.sql.ast import Param
            pn, pt, prows = _parse_spec(case["parameters"])
            vals = [_coerce(v, t) for v, t in zip(prows[0], pt)]
            for p in collect(sel, Param):
                p.value = vals[p.idx]
        from openmldb_ray.sql.planner import Catalog, Planner
        planner = Planner(Catalog(None, tables), dialect="openmldb")
        if carry_tag:
            planner.carry_tag = carry_tag
        return planner.plan(sel).to_pandas()

    if case.get("batch_request"):
        # batch-request mode (SQLBatchRequestQueryTest): each request
        # row is served independently — unioned as the newest element
        # of ITS key's history, never seeing the other request rows.
        # Per-request evaluation over base ∪ {row}; the output row is
        # matched back by the projected request id column.
        # common_column_indices is a computation-sharing hint with no
        # result semantics and is ignored here.
        import pandas as pd
        bn, bt, brows = _parse_spec(case["batch_request"])
        base = _build_table(case["inputs"][0]) if case.get("inputs") \
            else pa.table({})
        outs = []
        for row in brows:
            one = _build_table({**case["batch_request"],
                                "rows": [row]})
            joined = (pa.concat_tables([base, one])
                      if base.num_rows else one)
            # instance marker: 0 for history rows, 1 for the request
            # row; the planner rides it down the left spine so the
            # request's output row is identifiable even when every
            # source column is aliased away (fz_ddl suites)
            tag = pa.array([0] * base.num_rows + [1], pa.int8())
            tables[t0_name] = ray.data.from_arrow(
                joined.append_column("__reqtag__", tag))
            df = plan_once(carry_tag="__reqtag__")
            tagcols = [c for c in df.columns
                       if c.startswith("__reqtag__")]
            if "__reqtag__" in df.columns:
                picked = df[df["__reqtag__"] == 1].drop(
                    columns=tagcols)
                if len(picked) != 1:
                    raise AssertionError(
                        f"batch_request tag matched {len(picked)} "
                        "rows (expected exactly the instance row)")
                outs.append(picked)
                continue
            # fallback: match the request row back by a projected
            # request id column
            df = df.drop(columns=tagcols)
            idcol = next(c for c in bn if c in df.columns)
            rid = _coerce(row[bn.index(idcol)], bt[bn.index(idcol)])
            outs.append(df[df[idcol] == rid])
        return (pd.concat(outs).reset_index(drop=True),
                case["expect"])

    return plan_once(), case["expect"]


BATCH_UNSUPPORTED_MODES = ("batch-unsupport", "offline-unsupport")


def is_batch_unsupported(case: dict) -> bool:
    """True when the reference marks the case as not applicable to
    batch/offline engines (this engine is the batch analog). Exact
    token match: 'rtidb-batch-unsupport' is an ONLINE restriction and
    does NOT count."""
    import re
    toks = re.split(r"[,\s]+", str(case.get("mode") or ""))
    return any(t in BATCH_UNSUPPORTED_MODES for t in toks)


def check_case(case: dict) -> None:
    expect0 = case.get("expect", {}) or {}
    if expect0.get("success") is True and "columns" not in expect0 \
            and "rows" not in expect0 and "data" not in expect0:
        run_case(case)  # success-only expectation: just execute
        return
    got, expect = run_case(case)
    if "columns" not in expect and "schema" not in expect:
        # count-only / already-checked (cat) expectations carry no
        # schema; row count is all that is specified
        if expect.get("count") is not None:
            assert len(got) == int(expect["count"]), \
                (len(got), expect["count"])
        return
    enames, etypes, rows = _parse_spec(expect)
    order = expect.get("order")
    if order and (order in got.columns
                  if isinstance(order, str) else True):
        got = got.sort_values(order, kind="stable")
        # the reference harness sorts BOTH sides by the order column —
        # expect rows are not necessarily pre-sorted
        # (v040/test_groupby.yaml id 0: 'aa','bb','a%' under order c1)
        if isinstance(order, str) and order in enames:
            oi = enames.index(order)
            ot = etypes[oi]
            rows = sorted(rows, key=lambda r: (
                _coerce(r[oi], ot) is None,
                _coerce(r[oi], ot) if _coerce(r[oi], ot)
                is not None else 0))
    elif not order and len(rows) > 1:
        # no order key: row order is unspecified (batch GROUP BY) —
        # canonicalize BOTH sides by a type-tolerant row key
        def _key(vals):
            out = []
            for v in vals:
                if v is None or (isinstance(v, float) and v != v):
                    out.append("")
                elif isinstance(v, bool):
                    out.append(str(v))
                else:
                    try:
                        out.append(f"{float(v):.6g}")
                    except (TypeError, ValueError):
                        out.append(str(v))
            return out
        rows = sorted(rows, key=lambda r: _key(
            [_coerce(v, t) for v, t in zip(r, etypes)]))
        got = got.iloc[sorted(range(len(got)),
                              key=lambda i: _key(list(got.iloc[i])))]
    got = got.reset_index(drop=True)

    def norm(n: str) -> str:  # reference prints 'sum(c4)over w1'
        import re
        n = re.sub(r"__dup\d+__$", "", n)  # planner dedup marker
        return n.replace(" ", "").lower()
    if len(rows) == 0 and len(got) == 0 and len(got.columns) == 0:
        # Ray drops fully-empty blocks, so a 0-row result loses its
        # schema; row-count equality is all that's checkable
        return
    assert [norm(c) for c in got.columns] == [norm(c) for c in enames], \
        (list(got.columns), enames)
    if not rows and expect.get("count") is not None:
        # count-only expectation (cluster/test_cluster_batch.yaml
        # LIMIT cases): schema + row count, values unspecified
        assert len(got) == int(expect["count"]), \
            (len(got), expect["count"])
        return
    assert len(got) == len(rows), (len(got), len(rows))
    for ri, row in enumerate(rows):
        for ci, (n, t, v) in enumerate(zip(enames, etypes, row)):
            g = got.iloc[ri, ci]  # positional: duplicate names happen
            e = _coerce(v, t)
            if e is None:
                assert g is None or (isinstance(g, float) and math.isnan(g)) \
                    or str(g) in ("None", "NaT", "nan"), \
                    f"row {ri} col {n}: expected NULL, got {g!r}"
                continue
            if isinstance(e, float):
                if math.isnan(e):
                    assert g is None or g != g, \
                        f"row {ri} col {n}: {g!r} != NaN"
                elif math.isinf(e):
                    assert float(g) == e, \
                        f"row {ri} col {n}: {g!r} != {e!r}"
                else:
                    assert g == g and abs(float(g) - e) <= 1e-4 * max(
                        1.0, abs(e)), f"row {ri} col {n}: {g!r} != {e!r}"
            elif pa.types.is_timestamp(t):
                if isinstance(g, (int, float)) or (
                        hasattr(g, "dtype")
                        and getattr(g.dtype, "kind", "") in "if"):
                    gv = int(round(float(g)))  # engine emitted epoch ms
                elif hasattr(g, "value"):      # pandas Timestamp (ns)
                    gv = int(g.value) // 1_000_000
                else:                          # numpy datetime64 etc.
                    import pandas as pd
                    gv = int(pd.Timestamp(g).value) // 1_000_000
                assert gv == e, f"row {ri} col {n}: {g!r} != {e!r}"
            elif t == pa.date32():
                gs = g.isoformat() if hasattr(g, "isoformat") else str(g)
                assert gs[:10] == e.isoformat(), \
                    f"row {ri} col {n}: {g!r} != {e!r}"
            else:
                if isinstance(g, float):
                    assert g == g and int(round(g)) == e, \
                        f"row {ri} col {n}: {g!r} != {e!r}"
                elif hasattr(g, "isoformat") and not hasattr(g, "value"):
                    # date result vs string expectation (GROUP BY date,
                    # v040/test_groupby.yaml id 8)
                    assert g.isoformat()[:10] == str(e), \
                        f"row {ri} col {n}: {g!r} != {e!r}"
                elif hasattr(g, "value") and hasattr(g, "tz_localize"):
                    # pandas Timestamp vs epoch-ms int expectation
                    assert int(g.value) // 1_000_000 == int(e), \
                        f"row {ri} col {n}: {g!r} != {e!r}"
                else:
                    assert g == e, f"row {ri} col {n}: {g!r} != {e!r}"
