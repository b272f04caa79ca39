"""percentile_approx / approx_count_distinct: exact below capacity,
bounded error above it, and the distributed partial-merge path
(reference surface: java/openmldb-batch udf/PercentileApprox.scala)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from openmldb_ray.functions.sketches import (HLLSketch, QuantileSketch,
                                             hash_column)

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------ quantile sketch

def test_quantile_exact_matches_duckdb_disc():
    rng = np.random.default_rng(7)
    vals = rng.normal(size=999)
    sk = QuantileSketch(capacity=4096)
    sk.add(vals)
    assert not sk.compressed
    con = duckdb.connect()
    df = pd.DataFrame({"v": vals})
    con.register("t", df)
    for q in (0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0):
        exp = con.execute(
            f"SELECT quantile_disc(v, {q}) FROM t").fetchone()[0]
        assert sk.quantile(q) == pytest.approx(exp, abs=0), q


def test_quantile_compressed_rank_error_bounded():
    rng = np.random.default_rng(11)
    vals = rng.exponential(size=200_000)
    sk = QuantileSketch(capacity=1024)
    for chunk in np.array_split(vals, 20):
        sk.add(chunk)
    assert sk.compressed
    s = np.sort(vals)
    for q in (0.1, 0.5, 0.9, 0.99):
        got = sk.quantile(q)
        # rank of the answer must be within ~1% of the true rank
        rank = np.searchsorted(s, got) / len(s)
        assert abs(rank - q) < 0.01, (q, rank)


def test_quantile_merge_equals_single():
    rng = np.random.default_rng(3)
    vals = rng.normal(size=3000)
    whole = QuantileSketch(capacity=8192)
    whole.add(vals)
    parts = [QuantileSketch(capacity=8192) for _ in range(4)]
    for p, chunk in zip(parts, np.array_split(vals, 4)):
        p.add(chunk)
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    for q in (0.25, 0.5, 0.75):
        assert merged.quantile(q) == whole.quantile(q)


def test_quantile_serialization_roundtrip():
    sk = QuantileSketch(capacity=64)
    sk.add(np.arange(500, dtype=float))
    b = sk.to_bytes()
    back = QuantileSketch.from_bytes(b)
    assert back.quantile(0.5) == sk.quantile(0.5)
    assert back.compressed == sk.compressed


# ----------------------------------------------------------- HLL sketch

def test_hll_sparse_exact():
    sk = HLLSketch(sparse_limit=4096)
    import pyarrow as pa
    h = hash_column(pa.array([f"u{i}" for i in range(1000)] * 3))
    sk.add_hashes(h)
    assert sk.sparse is not None
    assert sk.estimate() == 1000


def test_hll_dense_error_within_bounds():
    # stderr at p=14 is ~0.81%; assert 4 sigma
    sk = HLLSketch(sparse_limit=256)
    import pyarrow as pa
    n = 200_000
    sk.add_hashes(hash_column(pa.array(np.arange(n, dtype=np.int64))))
    assert sk.sparse is None
    est = sk.estimate()
    assert abs(est - n) / n < 0.033, est


def test_hll_merge_sparse_dense_mix():
    import pyarrow as pa
    a = HLLSketch(sparse_limit=128)
    b = HLLSketch(sparse_limit=128)
    a.add_hashes(hash_column(pa.array(np.arange(0, 50_000))))      # dense
    b.add_hashes(hash_column(pa.array(np.arange(40_000, 50_100))))  # dense
    c = HLLSketch(sparse_limit=128)
    c.add_hashes(hash_column(pa.array(np.arange(50_100, 50_150))))  # sparse
    a.merge(b)
    a.merge(c)
    n = 50_150
    assert abs(a.estimate() - n) / n < 0.033


def test_hll_serialization_roundtrip():
    import pyarrow as pa
    for limit in (10, 100_000):     # force dense and sparse paths
        sk = HLLSketch(sparse_limit=limit)
        sk.add_hashes(hash_column(pa.array([f"x{i}" for i in range(500)])))
        back = HLLSketch.from_bytes(sk.to_bytes(), sparse_limit=limit)
        assert back.estimate() == sk.estimate()


def test_hash_column_type_coverage():
    import pyarrow as pa
    # distinct inputs must produce distinct hashes; nulls drop
    for arr in (pa.array([1, 2, 3, None]),
                pa.array([1.5, 2.5, np.nan]),
                pa.array(["a", "b", None, "c"]),
                pa.array([True, False])):
        h = hash_column(arr)
        assert len(h) == len(arr.drop_null())
        assert len(np.unique(h)) == len(h)


def test_hash_column_temporal_and_uint64():
    import datetime

    import pyarrow as pa
    # 32-bit temporals refuse a direct int64 cast in Arrow — they must
    # hop through int32 (regression: crashed with ArrowNotImplemented).
    d = pa.array([datetime.date(2024, 1, i + 1) for i in range(5)],
                 type=pa.date32())
    t32 = pa.array([1000 * i for i in range(5)], type=pa.time32("ms"))
    # uint64 above 2^63-1 fails a checked int64 cast — bit reinterpret.
    u64 = pa.array([1, 2**63, 2**64 - 1], type=pa.uint64())
    ts = pa.array([datetime.datetime(2024, 1, 1, 0, 0, i)
                   for i in range(4)], type=pa.timestamp("ms"))
    for arr in (d, t32, u64, ts):
        h = hash_column(arr)
        assert len(h) == len(arr)
        assert len(np.unique(h)) == len(h)


# ---------------------------------------------------- distributed path

def test_sql_approx_agg_exact_at_small_scale(ray_session):
    import sys
    sys.path.insert(0, "/root/repo")
    from openmldb_ray.sql import sql
    got = sql("""select user_id, percentile_approx(value, 0.5) as p50,
                 approx_count_distinct(event_type) as adc
                 from events group by user_id""",
              SF, dialect="ansi").to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{SF}/events.parquet'")
    exp = con.execute("""select user_id, quantile_disc(value, 0.5) as p50,
                         count(distinct event_type) as adc
                         from events group by user_id""").df()
    g = got.sort_values("user_id").reset_index(drop=True)
    e = exp.sort_values("user_id").reset_index(drop=True)
    assert (g["p50"].to_numpy() == e["p50"].to_numpy()).all()
    assert (g["adc"].to_numpy() == e["adc"].to_numpy()).all()


def test_grouped_aggregate_sketch_mixed_kinds(ray_session):
    import ray.data

    from openmldb_ray.functions.aggregates import grouped_aggregate
    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "k": np.repeat(["a", "b"], 5000),
        "v": rng.normal(size=10000),
        "u": rng.integers(0, 800, size=10000),
    })
    ds = ray.data.from_pandas(df).repartition(8)
    out = grouped_aggregate(ds, ["k"], {
        "p50": ("percentile_approx", "v", 0.5),
        "adc": ("approx_count_distinct", "u"),
        "total": ("sum", "v"),
        "n": ("count", None),
    }).to_pandas().sort_values("k").reset_index(drop=True)
    for i, k in enumerate(["a", "b"]):
        sub = df[df["k"] == k]
        s = np.sort(sub["v"].to_numpy())
        # exact: group size 5000 < capacity, distinct 800 < sparse limit
        assert out["p50"][i] == s[int(np.searchsorted(
            np.arange(1, len(s) + 1), 0.5 * len(s)))]
        assert out["adc"][i] == sub["u"].nunique()
        assert out["total"][i] == pytest.approx(sub["v"].sum())
        assert out["n"][i] == 5000
