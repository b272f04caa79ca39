"""Nested aggregate-in-aggregate window expressions vs a brute-force
pandas evaluator (reference semantics per test_udaf_function.yaml
43/47-49/53: inner aggregates are per-instance scalars over the same
frame; the outer aggregate reduces the per-frame-row expression)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data


def _brute(df, frame_rows, expr_fn):
    """Per-row brute evaluation: expr_fn(frame_df, inst_row) -> value;
    frames = last `frame_rows`+1 rows per key, ts ascending."""
    out = []
    for _, g in df.groupby("k", sort=False):
        g = g.sort_values("ts", kind="stable").reset_index(drop=True)
        for i in range(len(g)):
            lo = max(0, i - frame_rows)
            out.append((g["id"].iloc[i],
                        expr_fn(g.iloc[lo:i + 1], g.iloc[i])))
    return dict(out)


def _run_sql(df, q):
    from openmldb_ray.sql import sql
    t = ray.data.from_arrow(pa.Table.from_pandas(df))
    return sql(q, tables={"t": t}, dialect="ansi").to_pandas()


def _rand_df(n=400, keys=5, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "id": np.arange(n),
        "k": rng.integers(0, keys, n),
        "ts": np.sort(rng.integers(0, 10_000, n)),
        "v": np.round(rng.normal(50, 10, n), 3),
    })


def test_sum_of_value_minus_count(ray_session):
    df = _rand_df()
    got = _run_sql(df, (
        "select id, sum(v - count(v)) over w as r from t window w as "
        "(partition by k order by ts rows between 7 preceding and "
        "current row)"))
    want = _brute(df, 7, lambda f, _:
                  float((f["v"] - f["v"].count()).sum()))
    for i, r in zip(got["id"], got["r"]):
        assert abs(r - want[i]) < 1e-6, i


def test_count_where_vs_inner_min(ray_session):
    df = _rand_df(seed=11)
    got = _run_sql(df, (
        "select id, count_where(id, v >= min(v) + 5) over w as m "
        "from t window w as (partition by k order by ts rows between "
        "6 preceding and current row)"))
    want = _brute(df, 6, lambda f, _:
                  int((f["v"] >= f["v"].min() + 5).sum()))
    for i, m in zip(got["id"], got["m"]):
        assert m == want[i], i


def test_doubly_nested(ray_session):
    # sum(v + sum(v * count(v))): innermost count -> scalar s1,
    # sum(v * s1) -> scalar s2, outer sum over frame of (v + s2)
    df = _rand_df(n=200, seed=3)
    got = _run_sql(df, (
        "select id, sum(v + sum(v * count(v))) over w as r from t "
        "window w as (partition by k order by ts rows between 4 "
        "preceding and current row)"))

    def ref(f, _):
        s1 = f["v"].count()
        s2 = float((f["v"] * s1).sum())
        return float((f["v"] + s2).sum())
    want = _brute(df, 4, ref)
    for i, r in zip(got["id"], got["r"]):
        assert abs(r - want[i]) < 1e-5, i


def test_variable_topn_cate(ray_session):
    # top_n_key_sum_cate_where with a per-instance (column) n
    rng = np.random.default_rng(5)
    n = 120
    df = pd.DataFrame({
        "id": np.arange(n),
        "k": rng.integers(0, 3, n),
        "ts": np.sort(rng.integers(0, 5_000, n)),
        "v": rng.integers(1, 9, n).astype(np.int64),
        "cate": rng.integers(0, 4, n).astype(np.int64),
        "nn": rng.integers(1, 4, n).astype(np.int64),
    })
    got = _run_sql(df, (
        "select id, top_n_key_sum_cate_where(v, v > 2, cate, nn) "
        "over w as s from t window w as (partition by k order by ts "
        "rows between 5 preceding and current row)"))

    def ref(f, inst):
        groups: dict = {}
        for _, r in f.iterrows():
            if r["v"] > 2:
                groups.setdefault(int(r["cate"]), 0)
                groups[int(r["cate"])] += int(r["v"])
        keys = sorted(groups, reverse=True)[: int(inst["nn"])]
        return ",".join(f"{c}:{groups[c]}" for c in keys)
    want = _brute(df, 5, ref)
    for i, s in zip(got["id"], got["s"]):
        assert s == want[i], (i, s, want[i])
