"""LAST JOIN semantics: broadcast and shuffle paths vs DuckDB oracles."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data

from openmldb_ray.joins import last_join

SF = "/root/testdata/sf0.001"


def _duck(sql):
    con = duckdb.connect()
    for t in ("events", "orders", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.execute(sql).df()


@pytest.fixture(scope="module", params=["broadcast", "shuffle"])
def mode(request):
    return request.param


def test_asof_self_join(ray_session, mode):
    """For each click event: most recent prior-or-equal purchase by the
    same user (point-in-time, right.ts <= left.ts)."""
    left = ray.data.read_parquet(
        f"{SF}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"]) \
        .filter(expr="event_type == 'click'") \
        .select_columns(["event_id", "user_id", "ts"])
    right = ray.data.read_parquet(
        f"{SF}/events.parquet",
        columns=["user_id", "ts", "value", "event_type"]) \
        .filter(expr="event_type == 'purchase'") \
        .select_columns(["user_id", "ts", "value"])
    got = last_join(left, right, on="user_id", order_by="ts",
                    left_ts="ts", payload=["value"],
                    broadcast=(mode == "broadcast"),
                    num_buckets=4).to_pandas()
    exp = _duck("""
      SELECT l.event_id, l.user_id, l.ts, r.value AS value
      FROM (SELECT event_id, user_id, ts FROM events
            WHERE event_type='click') l
      ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                      WHERE event_type='purchase') r
        ON l.user_id = r.user_id AND l.ts >= r.ts""")
    got = got.sort_values("event_id").reset_index(drop=True)
    exp = exp.sort_values("event_id").reset_index(drop=True)
    assert len(got) == len(exp)
    np.testing.assert_allclose(got["value"].astype(float),
                               exp["value"].astype(float), rtol=1e-12)


def test_last_join_unique_key(ray_session, mode):
    """Unique right keys -> LAST JOIN == plain left join."""
    left = ray.data.read_parquet(f"{SF}/orders.parquet",
                                 columns=["o_orderkey", "o_custkey",
                                          "o_totalprice"])
    right = ray.data.read_parquet(f"{SF}/customer.parquet",
                                  columns=["c_custkey", "c_name", "c_acctbal"])
    got = last_join(left, right, on="o_custkey", right_on="c_custkey",
                    payload=["c_name", "c_acctbal"],
                    broadcast=(mode == "broadcast"), num_buckets=4).to_pandas()
    exp = _duck("""
      SELECT o_orderkey, o_custkey, o_totalprice, c_name, c_acctbal
      FROM orders LEFT JOIN customer ON o_custkey = c_custkey""")
    got = got.sort_values("o_orderkey").reset_index(drop=True)
    exp = exp.sort_values("o_orderkey").reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["c_name"].fillna("") == exp["c_name"].fillna("")).all()
    np.testing.assert_allclose(got["c_acctbal"].astype(float),
                               exp["c_acctbal"].astype(float))


def test_last_join_orderby_argmax(ray_session, mode):
    """Duplicate right keys + ORDER BY ts -> argmax-ts row picked; left
    outer NULLs for unmatched keys (runner.cc:1931-1976)."""
    left = ray.data.from_items([{"k": "a", "x": 1}, {"k": "b", "x": 2},
                                {"k": "z", "x": 3}])
    right = ray.data.from_items([
        {"k": "a", "ts": 1, "p": 10}, {"k": "a", "ts": 5, "p": 50},
        {"k": "a", "ts": 3, "p": 30}, {"k": "b", "ts": 2, "p": 20}])
    got = last_join(left, right, on="k", order_by="ts", payload=["p"],
                    broadcast=(mode == "broadcast"),
                    num_buckets=2).to_pandas().sort_values("x")
    assert got["p"].tolist()[:2] == [50, 20]
    assert pd.isna(got["p"].tolist()[2])


def test_last_join_no_order_first_storage_row(ray_session):
    """Without ORDER BY: first right row in storage order (broadcast)."""
    left = ray.data.from_items([{"k": "a", "x": 1}])
    right = ray.data.from_items([{"k": "a", "p": 7}, {"k": "a", "p": 9}])
    got = last_join(left, right, on="k", payload=["p"],
                    broadcast=True).to_pandas()
    assert got["p"].tolist() == [7]


def test_asof_descending_picks_min_qualifying(ray_session):
    """ORDER BY ts DESC + left_ts: LAST row of the desc-ordered right
    table that satisfies ts <= left_ts is the MIN qualifying ts."""
    import ray.data

    from openmldb_ray.joins import last_join
    left = ray.data.from_items([{"k": 1, "lts": 25}, {"k": 1, "lts": 5},
                                {"k": 2, "lts": 100}])
    right = ray.data.from_items([{"k": 1, "ts": 10, "v": "a"},
                                 {"k": 1, "ts": 20, "v": "b"},
                                 {"k": 1, "ts": 30, "v": "c"}])
    for bcast in (True, False):
        out = last_join(left, right, on="k", order_by="ts", left_ts="lts",
                        descending=True, payload=["v"],
                        broadcast=bcast).to_pandas() \
            .sort_values("lts").reset_index(drop=True)
        assert out["v"].tolist() == [None, "a", None]
        # ascending picks the max qualifying instead
        out2 = last_join(left, right, on="k", order_by="ts", left_ts="lts",
                         payload=["v"], broadcast=bcast).to_pandas() \
            .sort_values("lts").reset_index(drop=True)
        assert out2["v"].tolist() == [None, "b", None]


def test_last_join_non_equi_condition(ray_session):
    """Extra non-equi predicate over candidate pairs (reference runs
    these as a JIT row UDF, JoinPlan.scala:108-143)."""
    import ray.data

    from openmldb_ray.joins import last_join
    left = ray.data.from_items([{"k": 1, "lts": 50, "cap": 15},
                                {"k": 1, "lts": 50, "cap": 100}])
    right = ray.data.from_items([{"k": 1, "ts": 10, "amt": 12},
                                 {"k": 1, "ts": 20, "amt": 30},
                                 {"k": 1, "ts": 30, "amt": 99}])

    def cond(lc, rc):
        return rc["amt"] <= lc["cap"]

    for bcast in (True, False):
        out = last_join(left, right, on="k", order_by="ts", left_ts="lts",
                        payload=["amt"], condition=cond,
                        broadcast=bcast).to_pandas() \
            .sort_values("cap").reset_index(drop=True)
        # cap=15: only amt=12 qualifies; cap=100: last qualifying = 99
        assert out["amt"].tolist() == [12, 99]


def test_composite_key_asof(ray_session, mode):
    """Multi-column equi-keys (JoinPlan.scala:39-202) through the
    vectorized Arrow key fusion: as-of pick over a two-column key,
    NULL key components match NULL per column but (1,NULL)!=(2,NULL),
    and unmatched left rows keep NULL payloads."""
    lrows = pd.DataFrame({
        "lid": np.arange(8),
        "k1": [1, 1, 2, 2, None, 1, 3, None],
        "k2": ["a", "b", "a", "a", "a", None, "a", None],
        "lts": [10, 10, 10, 5, 10, 10, 10, 10],
    })
    rrows = pd.DataFrame({
        "k1": [1, 1, 1, 2, None, 1, 9, None],
        "k2": ["a", "a", "b", "a", "a", None, "a", None],
        "rts": [1, 7, 3, 6, 2, 4, 1, 9],
        "pay": [100., 101., 102., 103., 104., 105., 106., 107.],
    })
    left = ray.data.from_pandas(lrows)
    right = ray.data.from_pandas(rrows)
    got = last_join(left, right, on=["k1", "k2"], order_by="rts",
                    left_ts="lts", payload=["pay"],
                    broadcast=(mode == "broadcast"),
                    num_buckets=4).to_pandas()
    got = got.sort_values("lid").reset_index(drop=True)
    # expected: latest rts <= lts per composite key, NULL==NULL per col
    exp = [101., 102., 103., None, 104., 105., None, 107.]
    for i, e in enumerate(exp):
        g = got.loc[i, "pay"]
        if e is None:
            assert pd.isnull(g), (i, g)
        else:
            assert g == e, (i, g, e)
