"""Property-style cross-engine check: seeded random ANSI queries run
through sql() AND DuckDB on the same random tables; results must
match. Independent of the YAML corpus and the oracle harness — a
second engine validates composition (window x filter x group x join x
union) rather than single features."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data


def _tables(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(300, 900))
    t1 = pd.DataFrame({
        "id": np.arange(n),
        "k": rng.integers(0, 8, n).astype(np.int64),
        # unique ts per k so ROWS frames are order-unambiguous
        "ts": (np.arange(n) * 8 + rng.integers(0, 8, n)).astype(np.int64),
        "v": np.round(rng.normal(50, 20, n), 3),
        "w": rng.integers(0, 100, n).astype(np.int64),
    })
    m = int(rng.integers(20, 60))
    t2 = pd.DataFrame({
        "k": rng.permutation(np.arange(8).repeat(m // 8 + 1))[:m]
        .astype(np.int64),
        "label": [f"L{i % 5}" for i in range(m)],
        "amt": np.round(rng.normal(10, 3, m), 3),
    }).groupby("k", as_index=False).first()  # unique join key
    return t1, t2


def _run_both(q, seed):
    t1, t2 = _tables(seed)
    from openmldb_ray.sql import sql
    got = sql(q, tables={
        "t1": ray.data.from_arrow(pa.Table.from_pandas(t1)),
        "t2": ray.data.from_arrow(pa.Table.from_pandas(t2)),
    }, dialect="ansi").to_pandas()
    con = duckdb.connect()
    con.register("t1", t1)
    con.register("t2", t2)
    want = con.execute(q).df()
    assert list(got.columns) == list(want.columns), q
    g = got.sort_values(list(got.columns)).reset_index(drop=True)
    w = want.sort_values(list(want.columns)).reset_index(drop=True)
    assert len(g) == len(w), (q, len(g), len(w))
    for c in g.columns:
        if g[c].dtype == object:
            assert (g[c].fillna("\0") == w[c].fillna("\0")).all(), (q, c)
        else:
            np.testing.assert_allclose(
                g[c].astype(float), w[c].astype(float),
                rtol=1e-9, atol=1e-9, err_msg=f"{q} :: {c}")


QUERIES = [
    # window over filter
    ("select id, k, ts, round(sum(v) over win, 6) as s, "
     "count(*) over win as n from t1 where w > 20 window win as "
     "(partition by k order by ts rows between 9 preceding and "
     "current row)"),
    # group + having over a join
    ("select t1.k, count(*) as n, round(sum(t1.v + t2.amt), 6) as sva "
     "from t1 left join t2 on t1.k = t2.k "
     "group by t1.k having count(*) > 10"),
    # union of two filtered windows in subqueries
    ("select * from (select id, round(avg(v) over win, 6) as a from t1 "
     "where k < 4 window win as (partition by k order by ts rows "
     "between 4 preceding and current row)) u1 union all "
     "select id, round(v, 6) as a from t1 where k >= 6"),
    # case + order + limit determinism (unique id tiebreak)
    ("select id, case when v > 50 then 'hi' else 'lo' end as bucket, "
     "round(v, 3) as v from t1 order by v desc, id limit 25"),
    # distinct over expression + in-list
    ("select distinct k, w % 5 as wm from t1 where k in (1, 3, 5)"),
]


@pytest.mark.parametrize("seed", [11, 23])
@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_random_query_matches_duckdb(ray_session, seed, qi):
    _run_both(QUERIES[qi], seed)
