"""Generic zero-shuffle window (window.blockwise.blockwise_window_agg)
vs the shuffle plan (window_agg) — identical results on time-ordered
layouts, refusal on violations."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from openmldb_ray.window import Agg, WindowSpec


def _cmp(a: pd.DataFrame, b: pd.DataFrame, key=("user", "ts", "eid")):
    keys = [k for k in key if k in a.columns]
    a = a.sort_values(keys).reset_index(drop=True)
    b = b.sort_values(keys).reset_index(drop=True)
    assert len(a) == len(b)
    assert set(a.columns) == set(b.columns)
    for c in a.columns:
        if a[c].dtype == object:
            assert (a[c].fillna("\0") == b[c].fillna("\0")).all(), c
        else:
            np.testing.assert_allclose(
                a[c].astype(float), b[c].astype(float),
                rtol=1e-9, err_msg=c)


def _events(n=6000, users=7, seed=3, with_null_ts=False):
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.integers(0, 500_000, n))
    df = pd.DataFrame({
        "eid": np.arange(n),
        "user": rng.integers(0, users, n).astype(np.int64),
        "ts": ts.astype(np.int64),
        "v": np.round(rng.normal(100, 25, n), 3),
        "cat": rng.choice(["x", "y", "z"], n),
    })
    if with_null_ts:
        df.loc[rng.choice(n, 50, replace=False), "ts"] = -5
    return df


SPECS = lambda: [
    (WindowSpec("user", "ts", preceding_rows=30), [
        Agg("sum", "v", "s30"), Agg("avg", "v", "a30"),
        Agg("count", None, "n30"), Agg("min", "v", "mn30"),
        Agg("lag", "cat", "prev_cat", k=1)]),
    (WindowSpec("user", "ts", preceding_range=40_000), [
        Agg("sum", "v", "s40k"), Agg("max", "v", "mx40k"),
        Agg("distinct_count", "cat", "dc")]),
]


def _both(df, blocks=8):
    from openmldb_ray.window.blockwise import blockwise_window_agg
    from openmldb_ray.window.runner import window_agg_multi
    ds = ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)) \
        .map_batches(lambda b: b, batch_format="pyarrow",
                     batch_size=max(1, len(df) // blocks)).materialize()
    pt = ["eid", "user", "ts", "v", "cat"]
    base = window_agg_multi(ds, SPECS(), passthrough=pt,
                            num_buckets=4).to_pandas()
    got = blockwise_window_agg(ds, SPECS(), passthrough=pt).to_pandas()
    return base, got


def test_matches_shuffle_plan(ray_session):
    base, got = _both(_events())
    _cmp(base, got)


def test_matches_with_null_order_keys(ray_session):
    """NULL/negative ORDER BY rows are dropped in both plans."""
    base, got = _both(_events(with_null_ts=True))
    _cmp(base, got)


def test_single_spec_form(ray_session):
    from openmldb_ray.window.blockwise import blockwise_window_agg
    from openmldb_ray.window.runner import window_agg
    df = _events(n=2000, users=3, seed=9)
    ds = ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False))
    spec = WindowSpec("user", "ts", preceding_rows=10)
    aggs = [Agg("sum", "v", "s"), Agg("count", None, "n")]
    base = window_agg(ds, spec, aggs, passthrough=["eid", "user", "ts"],
                      num_buckets=4).to_pandas()
    got = blockwise_window_agg(ds, spec, aggs,
                               passthrough=["eid", "user", "ts"]) \
        .to_pandas()
    _cmp(base, got, key=("eid",))


def test_modifiers_exclude_current_time_and_maxsize(ray_session):
    from openmldb_ray.window.blockwise import blockwise_window_agg
    from openmldb_ray.window.runner import window_agg_multi
    rng = np.random.default_rng(4)
    n = 3000
    # duplicate timestamps exercise EXCLUDE CURRENT_TIME ties
    df = pd.DataFrame({
        "eid": np.arange(n),
        "user": rng.integers(0, 4, n).astype(np.int64),
        "ts": np.sort(rng.integers(0, 800, n)).astype(np.int64),
        "v": rng.integers(0, 50, n).astype(np.float64),
    })
    specs = [
        (WindowSpec("user", "ts", preceding_range=100,
                    exclude_current_time=True),
         [Agg("sum", "v", "s_ect"), Agg("count", None, "n_ect")]),
        (WindowSpec("user", "ts", preceding_rows=50, max_size=8),
         [Agg("sum", "v", "s_cap")]),
    ]
    # cut blocks at tie-safe positions (a tie group swallowing a whole
    # per-entity block segment is refused as ambiguous — correct but
    # not what this test exercises)
    t = pa.Table.from_pandas(df, preserve_index=False)
    tsv = df["ts"].to_numpy()
    cuts = [0]
    for target in range(500, n, 500):
        p = target
        while p < n and tsv[p] == tsv[p - 1]:
            p += 1
        if p > cuts[-1] and p < n:
            cuts.append(p)
    cuts.append(n)
    ds = ray.data.from_arrow(
        [t.slice(a, b - a) for a, b in zip(cuts, cuts[1:])]) \
        .materialize()
    pt = ["eid", "user", "ts"]
    base = window_agg_multi(ds, specs, passthrough=pt,
                            num_buckets=4).to_pandas()
    got = blockwise_window_agg(ds, specs, passthrough=pt).to_pandas()
    _cmp(base, got, key=("eid",))


def test_multi_key_partition(ray_session):
    """Composite PARTITION BY (user, cat): segmentation runs on a
    derived key; the kernel groups on the real columns."""
    from openmldb_ray.window.blockwise import blockwise_window_agg
    from openmldb_ray.window.runner import window_agg_multi
    df = _events(n=5000, users=3, seed=12)
    ds = ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)) \
        .map_batches(lambda b: b, batch_format="pyarrow",
                     batch_size=700).materialize()
    spec = WindowSpec(("user", "cat"), "ts", preceding_rows=15)
    aggs = [Agg("sum", "v", "s"), Agg("count", None, "n")]
    pt = ["eid", "user", "cat", "ts"]
    base = window_agg_multi(ds, [(spec, aggs)], passthrough=pt,
                            num_buckets=4).to_pandas()
    got = blockwise_window_agg(ds, spec, aggs,
                               passthrough=pt).to_pandas()
    _cmp(base, got, key=("eid",))


def test_refuses_unsorted_layout(ray_session):
    from openmldb_ray.skew import _NotPresorted
    from openmldb_ray.window.blockwise import blockwise_window_agg
    df = _events(n=3000)
    df = df.sample(frac=1.0, random_state=1)  # destroy the order
    ds = ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)) \
        .map_batches(lambda b: b, batch_format="pyarrow",
                     batch_size=300).materialize()
    spec = WindowSpec("user", "ts", preceding_rows=10)
    with pytest.raises(_NotPresorted):
        blockwise_window_agg(ds, spec, [Agg("sum", "v", "s")])


def test_sql_presorted_flag(ray_session):
    """sql(..., presorted=True) routes window stages through the
    zero-shuffle plan (with automatic fallback) — same results."""
    from openmldb_ray.sql import sql
    SF = "/root/testdata/sf0.001"
    q = ("select event_id, user_id % 4 as ub, ts, "
         "sum(value) over w as s, count(*) over w as n from events "
         "window w as (partition by user_id % 4 order by ts "
         "rows between 10 preceding and current row)")
    a = sql(q, SF).to_pandas().sort_values("event_id") \
        .reset_index(drop=True)
    b = sql(q, SF, presorted=True).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])


@pytest.mark.parametrize("seed", [31, 47, 59])
def test_random_specs_match_shuffle_plan(ray_session, seed):
    """Property: random frame kinds / depths / modifiers / agg mixes
    evaluate identically on both plans (or refuse)."""
    from openmldb_ray.skew import _NotPresorted
    from openmldb_ray.window.blockwise import blockwise_window_agg
    from openmldb_ray.window.runner import window_agg_multi
    rng = np.random.default_rng(seed)
    df = _events(n=int(rng.integers(2000, 5000)),
                 users=int(rng.integers(2, 9)), seed=seed)
    specs = []
    for si in range(int(rng.integers(1, 3))):
        kind = rng.choice(["rows", "range", "both"])
        kw = {}
        if kind in ("rows", "both"):
            kw["preceding_rows"] = int(rng.integers(1, 60))
        if kind in ("range", "both"):
            kw["preceding_range"] = int(rng.integers(500, 80_000))
        if rng.random() < 0.3:
            kw["max_size"] = int(rng.integers(2, 12))
        if rng.random() < 0.3:
            kw["exclude_current_time"] = True
        aggs = [Agg("sum", "v", f"s{si}"), Agg("count", None, f"n{si}")]
        if rng.random() < 0.5:
            aggs.append(Agg("min", "v", f"mn{si}"))
        if rng.random() < 0.4:
            aggs.append(Agg("distinct_count", "cat", f"dc{si}"))
        specs.append((WindowSpec("user", "ts", **kw), aggs))
    ds = ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)) \
        .map_batches(lambda b: b, batch_format="pyarrow",
                     batch_size=int(rng.integers(300, 1200))) \
        .materialize()
    pt = ["eid", "user", "ts", "v", "cat"]
    base = window_agg_multi(ds, specs, passthrough=pt,
                            num_buckets=4).to_pandas()
    try:
        got = blockwise_window_agg(ds, specs,
                                   passthrough=pt).to_pandas()
    except _NotPresorted:
        return  # refusal is a correct outcome
    _cmp(base, got, key=("eid",))


def test_sql_skew_opt_flag(ray_session):
    """sql(..., skew_opt=True) = the reference's
    openmldb.window.skew.opt: identical results on a skewed table
    (one key holds ~60% of rows)."""
    from openmldb_ray.sql import sql
    rng = np.random.default_rng(6)
    n = 4000
    hot = rng.random(n) < 0.6
    df = pd.DataFrame({
        "k": np.where(hot, 0, rng.integers(1, 20, n)).astype(np.int64),
        "ts": np.sort(rng.integers(0, 100_000, n)).astype(np.int64),
        "v": rng.integers(0, 50, n).astype(np.float64),
        "i": np.arange(n)})
    t = ray.data.from_arrow(pa.Table.from_pandas(df))
    q = ("select i, k, ts, sum(v) over w as s, count(*) over w as n "
         "from t window w as (partition by k order by ts "
         "rows_range between 5000 preceding and current row)")
    a = sql(q, tables={"t": t}, dialect="openmldb").to_pandas() \
        .sort_values("i").reset_index(drop=True)
    b = sql(q, tables={"t": t}, dialect="openmldb", skew_opt=True,
            skew_min_rows=500).to_pandas() \
        .sort_values("i").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_refuses_unbounded_frames(ray_session):
    from openmldb_ray.skew import _NotPresorted
    from openmldb_ray.window.blockwise import blockwise_window_agg
    ds = ray.data.from_items([{"user": 1, "ts": 1, "v": 1.0}])
    spec = WindowSpec("user", "ts", preceding_rows=1 << 40)  # unbounded
    with pytest.raises(_NotPresorted):
        blockwise_window_agg(ds, spec, [Agg("sum", "v", "s")])
