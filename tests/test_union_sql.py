"""UNION ALL / UNION DISTINCT set operations through sql() vs DuckDB
(cases/plan/union_query.yaml is the reference's parser surface; the
batch engine semantics are the ANSI left-associative fold)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data


def _t1():
    rng = np.random.default_rng(2)
    return pd.DataFrame({"a": rng.integers(0, 6, 40),
                         "b": rng.integers(0, 100, 40).astype("int64")})


def _t2():
    rng = np.random.default_rng(5)
    return pd.DataFrame({"a": rng.integers(3, 9, 30),
                         "b": rng.integers(50, 150, 30).astype("int64")})


def _run(q, **dfs):
    from openmldb_ray.sql import sql
    tables = {k: ray.data.from_arrow(pa.Table.from_pandas(v))
              for k, v in dfs.items()}
    got = sql(q, tables=tables, dialect="ansi").to_pandas()
    con = duckdb.connect()
    for k, v in dfs.items():
        con.register(k, v)
    want = con.execute(q).df()
    ga = got.sort_values(list(got.columns)).reset_index(drop=True)
    wa = want.sort_values(list(want.columns)).reset_index(drop=True)
    assert list(ga.columns) == list(wa.columns)
    pd.testing.assert_frame_equal(
        ga, wa.astype({c: ga[c].dtype for c in ga.columns}),
        check_exact=False, rtol=1e-9)


def test_union_all(ray_session):
    _run("select a, b from t1 union all select a, b from t2",
         t1=_t1(), t2=_t2())


def test_union_distinct(ray_session):
    _run("select a from t1 union distinct select a from t2",
         t1=_t1(), t2=_t2())


def test_bare_union_is_distinct(ray_session):
    _run("select a from t1 union select a from t2",
         t1=_t1(), t2=_t2())


def test_union_mixed_chain(ray_session):
    _run("select a from t1 union all select a from t2 "
         "union select a + 1 as a from t1",
         t1=_t1(), t2=_t2())


def test_union_positional_rename(ray_session):
    # right branch's names differ; left names win (ANSI positional)
    _run("select a as x, b as y from t1 union all "
         "select a, b from t2", t1=_t1(), t2=_t2())


def test_union_in_subquery(ray_session):
    _run("select x, count(*) as n from "
         "(select a as x from t1 union all select a as x from t2) u "
         "group by x", t1=_t1(), t2=_t2())


def test_union_with_where_and_agg(ray_session):
    _run("select a, sum(b) as s from t1 where b > 20 group by a "
         "union all select a, sum(b) as s from t2 group by a",
         t1=_t1(), t2=_t2())


def test_union_arity_mismatch_rejected(ray_session):
    from openmldb_ray.sql import sql
    t = ray.data.from_arrow(pa.Table.from_pandas(_t1()))
    with pytest.raises(ValueError, match="column counts"):
        sql("select a, b from t1 union all select a from t1",
            tables={"t1": t}).to_pandas()
